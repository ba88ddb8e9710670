package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential property tests for the staged-weight retention funnel:
 * on seeded random corpora (hand-rolled generation — offline cache has
 * no scalatest↔scalacheck bridge) the distributed one-aggregate funnel
 * must equal a trivial single-threaded reference, conserve weight mass
 * at every stage boundary, and reduce to retentionFunnel when every
 * stage weight is equal — including adversarial cases (equal bucket
 * sums, the Set-collapse bug's trigger; all-dropped; all-survive;
 * zero/NULL weights). */
class FunnelPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val rng = new scala.util.Random(20260816L)

  /** (id, gate pass/fail vector, per-stage-entry weights w0..wk). */
  private def randomCorpus(k: Int): Seq[(Long, Seq[Boolean], Seq[Long])] = {
    val n = rng.nextInt(90) + 1
    (0 until n).map { i =>
      // weights shrink monotonically stage to stage (the redact shape);
      // small value range on purpose: equal bucket sums must be COMMON
      val w0 = rng.nextInt(6).toLong
      val ws = (0 until k).scanLeft(w0)((w, _) =>
        math.max(0L, w - rng.nextInt(3)))
      (i.toLong, Seq.fill(k)(rng.nextInt(4) > 0), ws)
    }
  }

  /** Single-threaded reference: first-fail charging + staged weights. */
  private def reference(corpus: Seq[(Long, Seq[Boolean], Seq[Long])],
      k: Int): Seq[(Long, Long, Long, Long, Long, Long)] = {
    def ff(passes: Seq[Boolean]): Int = passes.indexWhere(!_) match {
      case -1 => k
      case i => i
    }
    (0 until k).map { s =>
      val reaching = corpus.filter(c => ff(c._2) >= s)
      val passing = corpus.filter(c => ff(c._2) >= s + 1)
      val rowsIn = reaching.size.toLong
      val rowsDropped = reaching.count(c => ff(c._2) == s).toLong
      val wIn = reaching.map(_._3(s)).sum
      val wDropped = reaching.filter(c => ff(c._2) == s).map(_._3(s)).sum +
        passing.map(c => c._3(s) - c._3(s + 1)).sum
      (rowsIn, rowsDropped, rowsIn - rowsDropped, wIn, wDropped, wIn - wDropped)
    }
  }

  test("staged funnel equals the single-threaded reference on random corpora") {
    (1 to 10).foreach { round =>
      val k = rng.nextInt(4) + 1
      val corpus = randomCorpus(k)
      val rows = corpus.map { case (id, ps, ws) =>
        (id, ps.mkString(","), ws.mkString(","))
      }
      val df = rows.toDF("id", "ps", "ws")
        .withColumn("psa", split(col("ps"), ","))
        .withColumn("wsa", split(col("ws"), ","))
      val gates = (0 until k).map(i =>
        s"g$i" -> (element_at(col("psa"), i + 1) === "true"))
      val weights = (0 to k).map(i =>
        element_at(col("wsa"), i + 1).cast("long"))
      val got = Curation.retentionFunnelStaged(df, gates, weights)
        .orderBy("stage").collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))
      val want = reference(corpus, k)
      assert(got.toSeq == want,
        s"round $round (k=$k, n=${corpus.size}):\n got  ${got.toSeq}\n want $want")
      // conservation at every boundary (k=1 has no interior boundary)
      got.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 == b._1 && a._6 == b._4, s"round $round leaked mass")
        case _ =>
      }
      // all-equal weights reduce exactly to retentionFunnel
      val flat = Curation.retentionFunnel(df, gates, weights.head)
        .orderBy("stage").collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))
      val flatStaged = Curation.retentionFunnelStaged(
          df, gates, Seq.fill(k + 1)(weights.head))
        .orderBy("stage").collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))
      assert(flat.toSeq == flatStaged.toSeq, s"round $round flat-reduction broke")
    }
  }

  test("degenerate shapes: all dropped, all survive, zero and NULL weights") {
    val gates = Seq("g" -> col("pass"))
    val allDrop = Seq((1L, false, 5L), (2L, false, 7L)).toDF("id", "pass", "w")
    val d = Curation.retentionFunnelStaged(allDrop, gates,
      Seq(col("w"), col("w"))).head()
    assert(d.getLong(4) == 0L && d.getLong(6) == 12L && d.getLong(7) == 0L)
    val allPass = Seq((1L, true, 5L), (2L, true, 7L)).toDF("id", "pass", "w")
    val p = Curation.retentionFunnelStaged(allPass, gates,
      Seq(col("w"), col("w") * 0L)).head()
    // rewrite stage scrubs ALL mass while keeping both rows
    assert(p.getLong(3) == 0L && p.getLong(6) == 12L && p.getLong(7) == 0L)
    // NULL weights coalesce to 0, never NPE
    val withNull = Seq[(Long, Boolean, java.lang.Long)](
      (1L, true, null), (2L, true, 3L)).toDF("id", "pass", "w")
    val n = Curation.retentionFunnelStaged(withNull, gates,
      Seq(col("w"), col("w"))).head()
    assert(n.getLong(5) == 3L && n.getLong(7) == 3L)
  }
}
