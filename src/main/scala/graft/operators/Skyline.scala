package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Pareto-front (skyline) selection: the rows not dominated by any other
 * row across d "bigger is better" dimensions — multi-objective curation
 * without collapsing objectives into one weighted score (pick documents
 * maximizing quality AND freshness AND diversity; keep the efficient
 * frontier, drop everything strictly worse on all axes).
 *
 * Dominance: s dominates r iff s ≥ r on every dimension and s > r on at
 * least one. Rows equal on all dimensions don't dominate each other —
 * both stay on the front. Rows with a null dimension are excluded (no
 * total order to compare under).
 *
 * EXACT result, two-phase plan built for scale (never all-pairs over the
 * corpus):
 *  1. PIVOT PRUNE — bucket the first dimension equi-width (one min/max
 *     aggregate), take per (bucket × dimension) the argmax row (real
 *     rows, so they are legitimate dominating witnesses), broadcast the
 *     ≤ buckets·d pivots, and anti-join: any row strictly dominated by a
 *     pivot leaves. This is a BroadcastNestedLoopJoin BY DESIGN — the
 *     broadcast side is bounded by construction, the stream side passes
 *     once.
 *  2. EXACT FINISH — the survivors (≈ front size + bucket-boundary
 *     stragglers; `maxCandidates` guards the degenerate anti-correlated
 *     worst case loudly) self-anti-join under the dominance predicate
 *     with the broadcast side again bounded.
 *
 * Pruning only ever removes provably-dominated rows, so phase ordering
 * cannot change the result — spec-pinned against the quadratic oracle.
 */
object Skyline {

  def pareto(df: DataFrame, dims: Seq[Column], buckets: Int = 64,
      maxCandidates: Long = 2000000L): DataFrame = {
    require(dims.size >= 2, "pareto needs at least 2 dimensions")
    require(buckets >= 2 && buckets <= 100000, s"bad bucket count $buckets")
    val d = dims.size
    val named = df.select(col("*") +:
      dims.zipWithIndex.map { case (c, j) => c.cast("double").as(s"graft_d$j") }: _*)
      .where((0 until d).map(j => col(s"graft_d$j").isNotNull).reduce(_ && _))
    val Array(lo, hi) = named.agg(min(col("graft_d0")), max(col("graft_d0")))
      .collect()(0) match {
        case r if r.isNullAt(0) => return named.drop((0 until d).map(j => s"graft_d$j"): _*)
        case r => Array(r.getDouble(0), r.getDouble(1))
      }
    val span = if (hi > lo) hi - lo else 1.0
    val bucket = least(greatest(
      floor((col("graft_d0") - lit(lo)) / lit(span) * buckets).cast("int"),
      lit(0)), lit(buckets - 1))
    // one argmax row per (bucket, dim): real dominating witnesses
    val dimStruct = struct((0 until d).map(j => col(s"graft_d$j")): _*)
    val pivotAggs = (0 until d).map(j =>
      max_by(dimStruct, col(s"graft_d$j")).as(s"graft_p$j"))
    val pivotRows = named.groupBy(bucket.as("graft_b"))
      .agg(pivotAggs.head, pivotAggs.tail: _*)
      .select(explode(array((0 until d).map(j => col(s"graft_p$j")): _*)).as("graft_p"))
      .select((0 until d).map(j => col(s"graft_p.graft_d$j").as(s"graft_q$j")): _*)
      .distinct()
    def dominates(pre: String): Column =
      (0 until d).map(j => col(s"$pre$j") >= col(s"graft_d$j")).reduce(_ && _) &&
        (0 until d).map(j => col(s"$pre$j") > col(s"graft_d$j")).reduce(_ || _)
    val survivors = named.join(broadcast(pivotRows), dominates("graft_q"), "left_anti")
    val nCand = survivors.count()
    require(nCand <= maxCandidates,
      s"$nCand skyline candidates exceed maxCandidates=$maxCandidates — " +
        "an anti-correlated dimension pair makes the front itself corpus-sized; " +
        "raise the cap knowingly or reduce dimensions")
    val candDims = survivors
      .select((0 until d).map(j => col(s"graft_d$j").as(s"graft_q$j")): _*)
    survivors.join(broadcast(candDims), dominates("graft_q"), "left_anti")
      .drop((0 until d).map(j => s"graft_d$j"): _*)
  }
}
