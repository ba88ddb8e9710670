package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asof join picks the latest right row at-or-before each left ts") {
    val trades = Seq(
      (1L, 10L, "t1"), (1L, 20L, "t2"), (1L, 5L, "t0"),
      (2L, 15L, "t3")).toDF("k", "ts", "trade")
    val quotes = Seq(
      (1L, 8L, 100.0), (1L, 10L, 101.0), (1L, 19L, 102.0),
      (2L, 16L, 200.0)).toDF("k", "ts", "px")
    val out = AsOf.asofJoin(trades, quotes, Seq("k"), "ts", "ts")
      .select("trade", "px").collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("t0").isEmpty)               // no quote at or before ts=5
    assert(out("t1").contains(101.0))       // inclusive: quote at exactly 10
    assert(out("t2").contains(102.0))       // latest quote <= 20
    assert(out("t3").isEmpty)               // quote arrives after the trade
  }

  test("asof join plan has no cartesian/nested-loop and one key shuffle shape") {
    val left = (0L until 100L).map(i => (i % 5, i, s"l$i")).toDF("k", "ts", "lv")
    val right = (0L until 100L).map(i => (i % 5, i, i * 1.0)).toDF("k", "ts", "rv")
    val plan = AsOf.asofJoin(left, right, Seq("k"), "ts", "ts", rightPrefix = "r_")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("Window"), s"expected window-based asof:\n$plan")
  }

  test("null right values do not tear columns across right rows") {
    // latest quote (ts=10) has px=null, sz=7: a true asof join returns THAT
    // row's values (null px), never an older row's non-null px
    val trades = Seq((1L, 20L, "t1")).toDF("k", "ts", "trade")
    val quotes = Seq(
      (1L, 5L, Some(100.0), Some(3L)),
      (1L, 10L, None: Option[Double], Some(7L))).toDF("k", "ts", "px", "sz")
    val row = AsOf.asofJoin(trades, quotes, Seq("k"), "ts", "ts")
      .select("px", "sz").collect().head
    assert(row.isNullAt(0), "px must be the latest row's null, not an older non-null")
    assert(row.getLong(1) == 7L)
  }

  test("a right row whose values are all null still matches (row-level, not value-level)") {
    val trades = Seq((1L, 20L, "t1"), (2L, 20L, "t2")).toDF("k", "ts", "trade")
    val quotes = Seq(
      (1L, 10L, None: Option[Double]),
      (2L, 30L, Some(5.0))).toDF("k", "ts", "px")
    val out = AsOf.asofJoin(trades, quotes, Seq("k"), "ts", "ts")
      .select("trade", "px").collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("t1").isEmpty) // matched the ts=10 row, whose px IS null
    assert(out("t2").isEmpty) // no preceding row at all
  }

  test("rightPrefix resolves column collisions") {
    val l = Seq((1L, 10L, 1.0)).toDF("k", "ts", "value")
    val r = Seq((1L, 9L, 2.0)).toDF("k", "ts", "value")
    val out = AsOf.asofJoin(l, r, Seq("k"), "ts", "ts", rightPrefix = "prev_")
    assert(out.columns.toSet == Set("k", "ts", "value", "prev_value"))
    assert(out.select("prev_value").as[Double].collect().toSeq == Seq(2.0))
    val e = intercept[IllegalArgumentException] {
      AsOf.asofJoin(l, r, Seq("k"), "ts", "ts")
    }
    assert(e.getMessage.contains("collide"))
  }

  test("forward asof picks the earliest right row at-or-after each left ts") {
    val orders = Seq(
      (1L, 10L, "o1"), (1L, 20L, "o2"), (1L, 25L, "o3"),
      (2L, 5L, "o4")).toDF("k", "ts", "o")
    val fills = Seq(
      (1L, 10L, 100.0), (1L, 22L, 102.0), (2L, 3L, 200.0)).toDF("k", "ts", "px")
    val out = AsOf.asofJoinForward(orders, fills, Seq("k"), "ts", "ts")
      .select("o", "px").collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("o1").contains(100.0))  // inclusive at equal ts
    assert(out("o2").contains(102.0))  // earliest fill >= 20
    assert(out("o3").isEmpty)          // nothing after 25
    assert(out("o4").isEmpty)          // fill precedes the order
  }

  test("nearest asof: min |delta|, ties backward, tolerance cuts") {
    val reads = Seq(
      (1L, 10L, "r1"),  // candidates at 7 (d=3) and 12 (d=2) -> 12
      (1L, 30L, "r2"),  // candidates at 28 (d=2) and 32 (d=2) -> tie -> 28
      (1L, 100L, "r3"), // nearest is 32 (d=68) -> outside tolerance 10
      (2L, 50L, "r4")   // exact match at 50 -> d=0
    ).toDF("k", "ts", "r")
    val snaps = Seq(
      (1L, 7L, 7.0), (1L, 12L, 12.0), (1L, 28L, 28.0), (1L, 32L, 32.0),
      (2L, 50L, 50.0)).toDF("k", "ts", "v")
    val out = AsOf.asofJoinNearest(reads, snaps, Seq("k"), "ts", "ts",
        toleranceSeconds = 10.0)
      .select("r", "v").collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("r1").contains(12.0))
    assert(out("r2").contains(28.0))
    assert(out("r3").isEmpty)
    assert(out("r4").contains(50.0))
  }

  test("nearest asof reuses one exchange for both window passes") {
    val left = (0L until 100L).map(i => (i % 5, i, s"l$i")).toDF("k", "ts", "lv")
    val right = (0L until 100L).map(i => (i % 5, i, i * 1.0)).toDF("k", "ts", "rv")
    val plan = AsOf.asofJoinNearest(left, right, Seq("k"), "ts", "ts",
        rightPrefix = "r_").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected a single key exchange:\n$plan")
  }
}
