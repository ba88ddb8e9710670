package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quantile normalization: exact ppm ranks per group, endpoints, ties,
 * singleton groups, single-exchange plan. */
class QuantileNormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact endpoints, ties by tiebreak, singleton zero") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 20.0), ("a", 4L, 40.0),
      ("b", 9L, 5.0)).toDF("g", "id", "s").repartition(3)
    val got = Curation.quantileNormalize(df, col("g"), col("s"), col("id"))
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got(1L) === 0L)
    assert(got(2L) === 333333L)  // tie broken by id: rank 2 of 4
    assert(got(3L) === 666666L)  // rank 3 of 4
    assert(got(4L) === 1000000L)
    assert(got(9L) === 0L)       // singleton group
  }

  test("one exchange: both windows share the group partitioning") {
    val df = (0 until 100).map(i => (s"g${i % 4}", i.toLong, i * 1.0))
      .toDF("g", "id", "s")
    val plan = Curation.quantileNormalize(df, col("g"), col("s"), col("id"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected one exchange:\n$plan")
  }
}
