package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cohort retention: hand-built activity matrix, duplicate events collapse,
 * offset-0 is the cohort size, exact ppm, partition invariance. */
class CohortSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Long, h: Int = 3) =
    new java.sql.Timestamp((day * 86400L + h * 3600L) * 1000L)

  test("matrix, duplicates, denominators") {
    // cohort day 0: users 1,2,3 — day1: 1,2 return; day2: 1 returns
    // cohort day 1: user 4 — never returns
    val ev = Seq(
      (1L, ts(0)), (1L, ts(0, 9)), (2L, ts(0)), (3L, ts(0)),
      (1L, ts(1)), (2L, ts(1)), (4L, ts(1)),
      (1L, ts(2))).toDF("u", "t").repartition(4)
    val got = Curation.cohortRetention(ev, col("u"), col("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === Map(
      (0L, 0L) -> ((3L, 3L, 1000000L)),
      (0L, 1L) -> ((2L, 3L, 666666L)),
      (0L, 2L) -> ((1L, 3L, 333333L)),
      (1L, 0L) -> ((1L, 1L, 1000000L))))
  }

  test("weekly periods coarsen the matrix") {
    val ev = Seq((1L, ts(0)), (1L, ts(6)), (1L, ts(8))).toDF("u", "t")
    val got = Curation.cohortRetention(ev, col("u"), col("t"), periodSeconds = 604800L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((0L, 0L) -> 1L, (0L, 1L) -> 1L))
  }
}
