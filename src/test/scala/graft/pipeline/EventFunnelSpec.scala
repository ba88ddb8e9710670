package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ordered event funnel: strict ordering, earliest-chain semantics,
 * window cut, exact ppm, out-of-order events never count. */
class EventFunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, String)], window: Long = Long.MaxValue) =
    Curation.eventFunnel(rows.toDF("u", "ts", "t").repartition(4),
        col("u"), col("ts"), col("t"), Seq("view", "click", "buy"), window)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap

  test("strict ordering and conversion ppm") {
    val rows = Seq(
      // u1 completes in order
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "buy"),
      // u2 clicks BEFORE viewing: click never counts; buys after view but
      // with no click in between -> stalls at view
      (2L, 10L, "click"), (2L, 20L, "view"), (2L, 30L, "buy"),
      // u3 views only
      (3L, 5L, "view"),
      // u4 full chain but the buy is simultaneous with the click -> strict
      (4L, 1L, "view"), (4L, 2L, "click"), (4L, 2L, "buy"))
    val got = run(rows)
    assert(got(0L) === (("view", 4L, 1000000L, 1000000L)))
    assert(got(1L) === (("click", 2L, 500000L, 500000L)))   // u1, u4
    assert(got(2L) === (("buy", 1L, 250000L, 500000L)))     // u1 only
  }

  test("window cut measures from the FIRST step") {
    val rows = Seq(
      (1L, 0L, "view"), (1L, 50L, "click"), (1L, 90L, "buy"),
      (2L, 0L, "view"), (2L, 50L, "click"), (2L, 200L, "buy"))
    val got = run(rows, window = 100L)
    assert(got(2L)._2 === 1L) // u2's buy lands outside the window
  }

  test("earliest chain wins: a later re-view cannot resurrect a dead chain") {
    // first view at 0, click at 5; the second view at 10 does not reset t0
    val rows = Seq((1L, 0L, "view"), (1L, 5L, "click"), (1L, 10L, "view"),
      (1L, 12L, "buy"))
    val got = run(rows, window = 6L)
    assert(got(1L)._2 === 1L)  // click at 5 within window of t0=0
    assert(got(2L)._2 === 0L)  // buy at 12 outside window from t0=0
  }
}
