package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Gale–Church sentence alignment — the step that turns bitext document
 * PAIRS (the [[Curation.translationPairs]] hreflang output, or any
 * mined/crawled parallel documents) into aligned SENTENCE pairs, the
 * actual training unit for translation and cross-lingual models. Pure
 * length-based dynamic programming (Gale & Church 1993): sentence-length
 * ratios between translations are tightly distributed, so beads of type
 * 1-1 / 1-0 / 0-1 / 2-1 / 1-2 / 2-2 are scored by a Gaussian model of
 * character-count ratios plus the bead-type prior, and the best global
 * alignment is the min-cost monotone path.
 *
 * Distribution: the DP is per-PAIR imperative work with O(n·m) state —
 * exactly the "genuine per-row algorithm" case (like greedy packing):
 * one typed flatMap over pair rows, each emitting its beads; everything
 * before it (pairing, sentence split) is columnar. Work per pair is
 * bounded by `maxSentences`² (pairs over the cap are SKIPPED, counted to
 * the caller via the `skipped` flag rows, never silently dropped) —
 * book-length outliers belong to a chunking pass, not this aligner.
 */
object Bitext {

  /** Bead-type priors from Gale & Church (1993), table 5. */
  private val priors: Seq[((Int, Int), Double)] = Seq(
    (1, 1) -> 0.89, (1, 0) -> 0.0099, (0, 1) -> 0.0099,
    (2, 1) -> 0.089, (1, 2) -> 0.089, (2, 2) -> 0.011)

  /** Φ(z) via Abramowitz & Stegun 26.2.17 (the standard 7-digit poly). */
  private def pnorm(z: Double): Double = {
    val t = 1.0 / (1.0 + 0.2316419 * z)
    val d = 0.3989422804014327 * math.exp(-z * z / 2.0)
    1.0 - d * t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 +
      t * (-1.821255978 + t * 1.330274429))))
  }

  /** −log P(lengths | bead is a translation): delta = (l2 − c·l1)/√(mean·s²)
   * with c = 1, s² = 6.8 (the paper's cross-language constants). */
  private def matchCost(l1: Int, l2: Int): Double = {
    if (l1 == 0 && l2 == 0) return 0.0
    val c = 1.0
    val s2 = 6.8
    val mean = (l1 + l2 / c) / 2.0
    val delta = math.abs((l2 - l1 * c) / math.sqrt(mean * s2))
    val lik = math.max(2.0 * (1.0 - pnorm(delta)), 1e-300)
    -math.log(lik)
  }

  /** One pair's min-cost alignment over sentence char-lengths: beads as
   * (aStart, aN, bStart, bN) in order. Exposed for the spec's scalar
   * cross-check. */
  private[pipeline] def alignPair(a: Array[Int], b: Array[Int]): Seq[(Int, Int, Int, Int)] = {
    val n = a.length
    val m = b.length
    val INF = Double.MaxValue / 4
    val cost = Array.fill(n + 1, m + 1)(INF)
    val back = Array.fill[(Int, Int)](n + 1, m + 1)(null)
    cost(0)(0) = 0.0
    var i = 0
    while (i <= n) {
      var j = 0
      while (j <= m) {
        if (cost(i)(j) < INF) {
          for (((di, dj), p) <- priors) {
            if (i + di <= n && j + dj <= m) {
              val l1 = (i until i + di).map(a).sum
              val l2 = (j until j + dj).map(b).sum
              val c2 = cost(i)(j) + matchCost(l1, l2) - math.log(p)
              if (c2 < cost(i + di)(j + dj)) {
                cost(i + di)(j + dj) = c2
                back(i + di)(j + dj) = (di, dj)
              }
            }
          }
        }
        j += 1
      }
      i += 1
    }
    // reconstruct (empty input pairs have the trivial empty alignment)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Int)]
    var (ci, cj) = (n, m)
    while (ci > 0 || cj > 0) {
      val (di, dj) = back(ci)(cj)
      out += ((ci - di, di, cj - dj, dj))
      ci -= di; cj -= dj
    }
    out.reverse.toSeq
  }

  final case class Bead(pair_id: Long, a_start: Int, a_n: Int,
    b_start: Int, b_n: Int, kind: String, skipped: Boolean)

  /**
   * Align each pair row: `(pairIdCol, aSentsCol: array<string>,
   * bSentsCol: array<string>)` → one row per bead `(pair_id, a_start,
   * a_n, b_start, b_n, kind, skipped)`. Pairs beyond `maxSentences` on
   * either side emit ONE `skipped = true` marker row instead of beads.
   */
  def galeChurchAlign(
      pairs: DataFrame, pairIdCol: Column, aSentsCol: Column, bSentsCol: Column,
      maxSentences: Int = 512): DataFrame = {
    require(maxSentences >= 1, s"maxSentences must be positive, got $maxSentences")
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs
      .select(pairIdCol.cast("long").as("graft_id"),
        aSentsCol.cast("array<string>").as("graft_a"),
        bSentsCol.cast("array<string>").as("graft_b"))
      .as[(Long, Seq[String], Seq[String])]
      .flatMap { case (id, aRaw, bRaw) =>
        val a = Option(aRaw).getOrElse(Seq.empty)
        val b = Option(bRaw).getOrElse(Seq.empty)
        if (a.length > maxSentences || b.length > maxSentences)
          Iterator.single(Bead(id, -1, 0, -1, 0, "skipped", skipped = true))
        else
          alignPair(a.map(_.length).toArray, b.map(_.length).toArray).iterator
            .map { case (as, an, bs, bn) =>
              Bead(id, as, an, bs, bn, s"$an-$bn", skipped = false)
            }
      }
      .toDF()
  }
}
