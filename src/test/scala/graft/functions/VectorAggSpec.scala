package graft.functions

import graft.TestSpark
import graft.functions.dsl.vector_mean
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("vector_mean is element-wise across partitions, null rows ignored") {
    val df = Seq(
      (1, Some(Seq(1.0, 2.0, 3.0))),
      (1, Some(Seq(3.0, 4.0, 5.0))),
      (1, None),
      (2, Some(Seq(10.0, 20.0)))
    ).toDF("g", "v").repartition(4)
    val out = df.groupBy("g").agg(vector_mean(col("v")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(out(1) == Seq(2.0, 3.0, 4.0))
    assert(out(2) == Seq(10.0, 20.0))
  }

  test("vector_mean zero-pads ragged rows and works from SQL") {
    Seq(Seq(2.0), Seq(4.0, 6.0)).toDF("v").createOrReplaceTempView("graft_vm_t")
    val out = spark.sql("SELECT vector_mean(v) AS m FROM graft_vm_t")
      .collect().head.getSeq[Double](0).toSeq
    assert(out == Seq(3.0, 3.0))
  }
}
