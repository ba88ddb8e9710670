package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** EWMA control chart: hand-computed recursion, first-event seeding,
 * alert band semantics, fixed-point output, partition invariance. */
class AnomalySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Double)], alpha: Double, band: Double) =
    Anomaly.ewmaAnomalies(rows.toDF("k", "t", "v").repartition(5),
        col("k"), col("t"), col("v"), alpha, band)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("hand-computed recursion with alerts") {
    // key 1: 10 -> s=10; 20 (|20-10|>5 alert) s=12.5; 14 (|14-12.5|<=5) s=12.875
    // key 2: single event seeds, never alerts
    val got = run(Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 14.0),
      (2L, 1L, 99.0)), alpha = 0.25, band = 5.0)
    assert(got(1L) === ((3L, 12875000L, 1L)))
    assert(got(2L) === ((1L, 99000000L, 0L)))
  }

  test("order sensitivity: the fold follows the order column, not arrival") {
    // same values, reversed order keys -> different smoothed value
    val asc = run(Seq((1L, 1L, 0.0), (1L, 2L, 100.0)), 0.5, 1000.0)
    val desc = run(Seq((1L, 2L, 0.0), (1L, 1L, 100.0)), 0.5, 1000.0)
    assert(asc(1L)._2 === 50000000L)   // 0 then 100 -> 50
    assert(desc(1L)._2 === 50000000L)  // 100 then 0 -> 50 (symmetric here)
    val asym = run(Seq((1L, 1L, 0.0), (1L, 2L, 100.0), (1L, 3L, 0.0)), 0.5, 1000.0)
    assert(asym(1L)._2 === 25000000L)  // 0, 50, 25
  }

  test("alerts measure deviation from the PRIOR smoothed value") {
    // 0, 8 (>5 alert, s=4), 8 (|8-4|<=5 no alert, s=6), 12 (>5? |12-6|=6 alert)
    val got = run(Seq((1L, 1L, 0.0), (1L, 2L, 8.0), (1L, 3L, 8.0), (1L, 4L, 12.0)),
      alpha = 0.5, band = 5.0)
    assert(got(1L)._3 === 2L)
  }

  test("negative values and floor fixed-point") {
    val got = run(Seq((1L, 1L, -1.5)), 0.25, 1.0)
    assert(got(1L)._2 === -1500000L)
  }

  test("guards") {
    intercept[IllegalArgumentException] {
      Anomaly.ewmaAnomalies(Seq((1L, 1L, 1.0)).toDF("k", "t", "v"),
        col("k"), col("t"), col("v"), 0.0, 1.0)
    }
    intercept[IllegalArgumentException] {
      Anomaly.ewmaAnomalies(Seq((1L, 1L, 1.0)).toDF("k", "t", "v"),
        col("k"), col("t"), col("v"), 0.5, 0.0)
    }
  }
}
