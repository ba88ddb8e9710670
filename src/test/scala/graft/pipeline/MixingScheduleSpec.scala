package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Water-filling epoch-mixing planner: proportional fill below caps, exact
 * redistribution past saturated sources, the all-capped shortfall case,
 * agreement with an independent scalar implementation, and the kappa
 * gate-agreement report. */
class MixingScheduleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plan(rows: Seq[(String, Long, Double)], budget: Long, maxEpochs: Double) =
    Curation.mixingSchedule(rows.toDF("domain", "tokens", "w"),
        col("domain"), col("tokens"), col("w"), budget, maxEpochs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap

  /** Independent scalar water-fill (same closed form, plain Scala). */
  private def reference(rows: Seq[(String, Long, Double)], budget: Long,
      maxEpochs: Double): Map[String, Long] = {
    val base = rows.filter(r => r._2 > 0 && r._3 > 0)
      .map { case (d, t, w) => (d, math.floor(t * maxEpochs).toLong, w) }
    val sorted = base.sortBy { case (d, cap, w) => (cap / w, d) }
    val totalW = base.map(_._3).sum
    val totalCap = base.map(_._2).sum
    val s: Double =
      if (totalCap <= budget) -1.0
      else {
        var pcap = 0L
        var sw = totalW
        var found = budget.toDouble / totalW
        var ok = found <= sorted.head._2 / sorted.head._3
        var i = 0
        while (!ok && i < sorted.length) {
          val (_, cap, w) = sorted(i)
          pcap += cap; sw -= w
          if (sw > 0) {
            val cand = (budget - pcap).toDouble / sw
            val rThis = cap / w
            val rNext = if (i + 1 < sorted.length)
              sorted(i + 1)._2 / sorted(i + 1)._3 else Double.MaxValue
            if (cand >= rThis && cand <= rNext) { found = cand; ok = true }
          }
          i += 1
        }
        found
      }
    base.map { case (d, cap, w) =>
      d -> (if (s < 0) cap else math.min(cap, math.floor(w * s).toLong))
    }.toMap
  }

  test("no source saturates: budget splits proportionally to weight") {
    val rows = Seq(("web", 10000000L, 7.0), ("wiki", 10000000L, 2.0), ("code", 10000000L, 1.0))
    val p = plan(rows, 1000000L, 2.0)
    assert(p("web")._3 == 700000L && p("wiki")._3 == 200000L && p("code")._3 == 100000L)
    assert(p.values.forall(!_._5), "nothing should be exhausted")
  }

  test("saturated source redistributes its unmet share exactly") {
    // wiki caps at 60k (30k tokens x 2 epochs); its leftover demand flows
    // to web and code in 7:1 weight ratio
    val rows = Seq(("web", 10000000L, 7.0), ("wiki", 30000L, 2.0), ("code", 10000000L, 1.0))
    val p = plan(rows, 1000000L, 2.0)
    assert(p("wiki")._3 == 60000L && p("wiki")._5, "wiki must cap at 60k and flag exhausted")
    val ref = reference(rows, 1000000L, 2.0)
    rows.foreach { case (d, _, _) => assert(p(d)._3 == ref(d), s"$d: ${p(d)._3} vs ${ref(d)}") }
    // budget conserved up to per-domain floor rounding
    val total = p.values.map(_._3).sum
    assert(total <= 1000000L && total >= 1000000L - rows.size)
    // epochs_ppm: wiki used 2.0 epochs = 2,000,000 ppm
    assert(p("wiki")._4 == 2000000L)
  }

  test("budget above total capacity: everything caps, shortfall visible") {
    val rows = Seq(("a", 100L, 1.0), ("b", 200L, 5.0))
    val p = plan(rows, 10000L, 3.0)
    assert(p("a")._3 == 300L && p("b")._3 == 600L)
    assert(p.values.forall(_._5))
  }

  test("matches the independent scalar reference across shapes") {
    val shapes = Seq(
      Seq(("a", 1000L, 1.0), ("b", 2000L, 1.0), ("c", 50L, 10.0), ("d", 7L, 0.5)),
      Seq(("a", 123L, 3.3), ("b", 456L, 1.1), ("c", 789L, 2.2)),
      Seq(("one", 5L, 1.0)),
      Seq(("x", 100L, 1.0), ("y", 100L, 1.0), ("z", 100L, 1.0)))
    for (rows <- shapes; budget <- Seq(10L, 500L, 2000L, 100000L)) {
      val p = plan(rows, budget, 2.0)
      val ref = reference(rows, budget, 2.0)
      rows.foreach { case (d, _, _) =>
        assert(p(d)._3 == ref(d), s"rows=$rows budget=$budget domain=$d") }
    }
  }

  test("zero-token and zero-weight sources drop out") {
    val p = plan(Seq(("a", 0L, 1.0), ("b", 100L, 0.0), ("c", 100L, 1.0)), 1000L, 1.0)
    assert(p.keySet == Set("c"))
  }

  test("gateAgreement: hand-checked kappa, perfect agreement, degenerate marginal") {
    // 2x2 table: both=40, neither=30, onlyA=20, onlyB=10 -> po=.7
    // pe = .6*.5 + .4*.5 = .5 -> kappa = .4
    val df = spark.range(100).select(
      (col("id") < 60).as("a"),
      (col("id") < 40 || (col("id") >= 60 && col("id") < 70)).as("b"))
    val r = Curation.gateAgreement(df, col("a"), col("b")).collect().head
    assert(r.getLong(0) == 100 && r.getLong(1) == 40 && r.getLong(2) == 30 &&
      r.getLong(3) == 20 && r.getLong(4) == 10)
    assert(r.getLong(5) == 700000L && r.getLong(6) == 500000L)
    assert(r.getLong(7) == 400000L, s"kappa was ${r.getLong(7)}")
    // identical gates agree perfectly
    val perfect = Curation.gateAgreement(
      spark.range(10).select((col("id") % 2 === 0).as("g"), (col("id") % 2 === 0).as("h")),
      col("g"), col("h")).collect().head
    assert(perfect.getLong(7) == 1000000L)
    // both gates constant-true: pe = 1, kappa defined as 0
    val degen = Curation.gateAgreement(
      spark.range(10).select(lit(true).as("g"), lit(true).as("h")),
      col("g"), col("h")).collect().head
    assert(degen.getLong(7) == 0L)
  }
}
