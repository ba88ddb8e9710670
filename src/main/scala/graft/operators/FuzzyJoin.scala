package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Fuzzy (edit-distance) similarity self-join — the entity-resolution /
 * near-identical-title workhorse: all pairs of rows whose strings are
 * within `maxDist` Levenshtein edits, WITHOUT the |n|² cross product.
 *
 * Blocking is segment-based (the PassJoin family): partition the SHORTER
 * string of a candidate pair into `maxDist + 1` contiguous segments — at
 * most `maxDist` edits can touch at most `maxDist` segments, so BY
 * PIGEONHOLE at least one segment survives verbatim as a substring of the
 * longer string, displaced by at most `maxDist` positions. So each string
 * emits its own `d+1` segments as index keys, plus — in the probe role —
 * every substring that could equal segment `i` of a partner of length
 * `len-d .. len` at a displacement ≤ d; candidates are a plain equi-join on
 * `(partnerLen, segmentIndex, segmentText)` and only candidates pay the
 * exact Levenshtein check (early-exit threshold form, codegen'd). Cost is
 * linear in rows × O(d²) short keys, never quadratic; the join shuffles
 * segment keys, not documents, and the exact verify joins candidate ids
 * back to the corpus by id.
 *
 * Completeness: exact for every pair whose shorter side has at least
 * `maxDist + 1` characters (each segment nonempty). Shorter strings — the
 * degenerate tail where ANY partner of length ≤ 2·maxDist qualifies — are
 * handled by a separate tiny bucket (`len ≤ d` × `len ≤ 2d`, exact verify);
 * a corpus drowning in near-empty strings should gate those upstream.
 *
 * Count filter (always on, zero recall trade): every string carries a
 * packed 8-bucket character histogram (counts clamped at 255, 8 bits per
 * bucket in one LONG). One edit moves at most 2 units of L1 mass between
 * histogram buckets (substitution ±1 twice, insert/delete ±1 once), and
 * clamping only shrinks differences, so ED ≤ d ⟹ clamped-L1 ≤ 2d —
 * candidate rows failing that die INSIDE the join condition, before the
 * pair-distinct shuffle and the exact verify. This is what keeps common
 * boilerplate segments ("the ", "ing ") from flooding verification: their
 * bucket joins still pair up, but the histogram kills non-near pairs for
 * the price of 8 codegen'd subtractions instead of a DP.
 *
 * Skew guard (`maxBucketSize`, DEFAULT 2000): a segment shared by millions
 * of rows still makes its bucket-join quadratic before any filter runs;
 * buckets whose side exceeds the cap are skipped — a RECALL trade
 * documented like the minhash LSH cap (the same posture: the pairs a
 * >2000-row boilerplate bucket would add are near-duplicates of each
 * other en masse, exactly what [[graft.pipeline.Dedup.exact]] should have
 * collapsed first). Pass 0 to uncap for guaranteed-complete runs; use
 * [[skippedBuckets]] to SEE what a cap would drop before trusting it.
 *
 * Requires unique, non-null ids. Output: one row per matched pair,
 * `(id_a, id_b, dist)` with `id_a < id_b`, each unordered pair exactly once.
 */
object FuzzyJoin {

  /** Even partition of a length-l string into k segments: the first l%k
   * segments carry the extra character. 0-based; substr() is 1-based. */
  private def segLen(l: Column, i: Int, k: Int): Column =
    floor(l / k).cast("int") + when(lit(i) < l % k, 1).otherwise(0)
  private def segStart(l: Column, i: Int, k: Int): Column =
    (lit(i) * floor(l / k).cast("int") + least(lit(i), l % k)).cast("int")

  private def cappedBy(side: DataFrame, maxBucketSize: Int): DataFrame =
    if (maxBucketSize <= 0) side
    else side.withColumn("graft_bsz",
        count(lit(1)).over(Window.partitionBy("graft_l", "graft_i", "graft_seg")))
      .where(col("graft_bsz") <= maxBucketSize).drop("graft_bsz")

  private def baseOf(df: DataFrame, idCol: Column, strCol: Column): DataFrame =
    df.select(idCol.as("graft_id"), strCol.cast("string").as("graft_s"))
      .where(col("graft_id").isNotNull && col("graft_s").isNotNull)
      .withColumn("graft_len", length(col("graft_s")))
      .withColumn("graft_cf", charSig(col("graft_s")))

  /** Packed 8-bucket character histogram: bits 8k..8k+7 hold
   * min(count of chars hashing to bucket k, 255). Computed once per
   * string, carried on every key row (one LONG). */
  private[graft] def charSig(s: Column): Column = {
    val chars = split(s, "")
    (0 until 8).map { k =>
      shiftleft(least(size(filter(chars, c => pmod(hash(c), lit(8)) === k)),
        lit(255)).cast("long"), 8 * k)
    }.reduce(_ bitwiseOR _)
  }

  /** L1 distance between two packed histograms (8 codegen'd terms). */
  private[graft] def sigL1(a: Column, b: Column): Column =
    (0 until 8).map { k =>
      abs(shiftright(a, 8 * k).bitwiseAND(lit(255L)) -
        shiftright(b, 8 * k).bitwiseAND(lit(255L)))
    }.reduce(_ + _)

  /** Index-role keys of one string as array<struct<gl,gi,gseg>>: its own
   * k segments keyed by (myLen, i, segment). Empty below length k. */
  private[graft] def segKeyArray(s: Column, len: Column, d: Int): Column = {
    val k = d + 1
    val arr = array((0 until k).map { i =>
      struct(len.as("gl"), lit(i).as("gi"),
        s.substr(segStart(len, i, k) + 1, segLen(len, i, k)).as("gseg"))
    }: _*)
    when(len >= k, arr).otherwise(slice(arr, 1, 0))
  }

  /** Probe-role keys of one string: for each partner length l2 in
   * [len-d, len] with l2 >= k, every substring that could be segment i of
   * that partner — length segLen(l2,i), start within ±d of segStart(l2,i).
   * Within the valid branch lo <= segStart(l2,i) <= hi always (the segment
   * fits in l2 <= len), so sequence() never runs descending. Invalid l2
   * branches yield NULL, array_compact drops them; array_distinct
   * collapses the same key found at several displacements. */
  private[graft] def subKeyArray(s: Column, len: Column, d: Int): Column = {
    val k = d + 1
    val subKeys: Seq[Column] = for { e <- 0 to d; i <- 0 until k } yield {
      val l2 = len - e
      val m = segLen(l2, i, k)
      val p = segStart(l2, i, k)
      val lo = greatest(lit(0), p - d)
      val hi = least(len - m, p + d)
      when(l2 >= k,
        transform(sequence(lo, hi), j =>
          struct(l2.as("gl"), lit(i).as("gi"), s.substr(j + 1, m).as("gseg"))))
    }
    array_distinct(flatten(array_compact(array(subKeys: _*))))
  }

  /** Index role over a corpus: one row per (id, len, key). */
  private[graft] def segKeyRows(base: DataFrame, d: Int): DataFrame =
    base.where(col("graft_len") >= d + 1)
      .select(col("graft_id").as("graft_aid"), col("graft_len").as("graft_alen"),
        col("graft_cf").as("graft_cfa"),
        explode(segKeyArray(col("graft_s"), col("graft_len"), d)).as("graft_k"))
      .select(col("graft_aid"), col("graft_alen").as("graft_l"), col("graft_cfa"),
        col("graft_k.gi").as("graft_i"), col("graft_k.gseg").as("graft_seg"))

  /** Probe role over a corpus: one row per (id, len, key). */
  private[graft] def subKeyRows(base: DataFrame, d: Int): DataFrame =
    base
      .select(col("graft_id").as("graft_bid"), col("graft_len").as("graft_blen"),
        col("graft_cf").as("graft_cfb"),
        explode(subKeyArray(col("graft_s"), col("graft_len"), d)).as("graft_k"))
      .select(col("graft_bid"), col("graft_blen"), col("graft_cfb"),
        col("graft_k.gl").as("graft_l"), col("graft_k.gi").as("graft_i"),
        col("graft_k.gseg").as("graft_seg"))

  def editDistancePairs(
      df: DataFrame, idCol: Column, strCol: Column,
      maxDist: Int, maxBucketSize: Int = 2000): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val d = maxDist
    val base = baseOf(df, idCol, strCol)
    val segSide = segKeyRows(base, d)
    val subSide = subKeyRows(base, d)

    def capped(side: DataFrame): DataFrame = cappedBy(side, maxBucketSize)

    // Equi-join on the segment key; the shorter string is always the index
    // side (graft_l == partner length <= probe length), equal lengths
    // deduped by id order — each unordered pair survives exactly once.
    val candidates = capped(segSide)
      .join(capped(subSide), Seq("graft_l", "graft_i", "graft_seg"))
      .where((col("graft_l") < col("graft_blen") ||
        (col("graft_l") === col("graft_blen") && col("graft_aid") < col("graft_bid"))) &&
        sigL1(col("graft_cfa"), col("graft_cfb")) <= 2 * d)
      .select(col("graft_aid"), col("graft_bid")).distinct()

    val sa = base.select(col("graft_id").as("graft_aid"), col("graft_s").as("graft_sa"))
    val sb = base.select(col("graft_id").as("graft_bid"), col("graft_s").as("graft_sb"))
    val mainPairs = candidates.join(sa, "graft_aid").join(sb, "graft_bid")
      .withColumn("graft_dist", levenshtein(col("graft_sa"), col("graft_sb"), d))
      .where(col("graft_dist") >= 0)
      .select(col("graft_aid"), col("graft_bid"), col("graft_dist"))

    // Near-empty tail: len <= d matches nothing longer than 2d. Disjoint
    // from the main path (which needs BOTH sides >= d+1); pairs with both
    // sides short are kept once by id order.
    val shortA = base.where(col("graft_len") <= d)
      .select(col("graft_id").as("graft_aid"), col("graft_s").as("graft_sa"),
        col("graft_len").as("graft_al"))
    val shortB = base.where(col("graft_len") <= 2 * d)
      .select(col("graft_id").as("graft_bid"), col("graft_s").as("graft_sb"),
        col("graft_len").as("graft_bl"))
    val shortPairs = shortA.join(shortB,
        col("graft_aid") =!= col("graft_bid") &&
        (col("graft_bl") > d || col("graft_aid") < col("graft_bid")))
      .withColumn("graft_dist", levenshtein(col("graft_sa"), col("graft_sb"), d))
      .where(col("graft_dist") >= 0)
      .select(col("graft_aid"), col("graft_bid"), col("graft_dist"))

    mainPairs.unionByName(shortPairs)
      .select(least(col("graft_aid"), col("graft_bid")).as("id_a"),
        greatest(col("graft_aid"), col("graft_bid")).as("id_b"),
        col("graft_dist").as("dist"))
  }

  /**
   * Cross-corpus (A×B) edit-distance join — incoming batch vs frozen
   * reference, query titles vs catalog, the entity-resolution shape.
   * Same segment blocking; each corpus plays BOTH roles (its strings may
   * be the shorter or the longer of a pair), candidates from the two
   * directed role joins dedupe before the single verify. Output one row
   * per matched (id_l, id_r) pair with the exact distance.
   */
  def editDistanceJoin(
      left: DataFrame, lIdCol: Column, lStrCol: Column,
      right: DataFrame, rIdCol: Column, rStrCol: Column,
      maxDist: Int, maxBucketSize: Int = 2000): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val d = maxDist
    val lb = baseOf(left, lIdCol, lStrCol)
    val rb = baseOf(right, rIdCol, rStrCol)
    val keys = Seq("graft_l", "graft_i", "graft_seg")
    // left indexes / right probes, then the reverse; equal-length pairs
    // surface in both directions — the distinct below is the dedup
    val candLR = cappedBy(segKeyRows(lb, d), maxBucketSize)
      .join(cappedBy(subKeyRows(rb, d), maxBucketSize), keys)
      .where(sigL1(col("graft_cfa"), col("graft_cfb")) <= 2 * d)
      .select(col("graft_aid").as("graft_lid"), col("graft_bid").as("graft_rid"))
    val candRL = cappedBy(segKeyRows(rb, d), maxBucketSize)
      .join(cappedBy(subKeyRows(lb, d), maxBucketSize), keys)
      .where(sigL1(col("graft_cfa"), col("graft_cfb")) <= 2 * d)
      .select(col("graft_bid").as("graft_lid"), col("graft_aid").as("graft_rid"))
    // near-empty tails, both directions (min side <= d forces max <= 2d)
    val shortLR = lb.where(col("graft_len") <= d)
      .select(col("graft_id").as("graft_lid"))
      .crossJoin(rb.where(col("graft_len") <= 2 * d)
        .select(col("graft_id").as("graft_rid")))
    val shortRL = lb.where(col("graft_len") <= 2 * d)
      .select(col("graft_id").as("graft_lid"))
      .crossJoin(rb.where(col("graft_len") <= d)
        .select(col("graft_id").as("graft_rid")))
    val candidates = candLR.unionByName(candRL)
      .unionByName(shortLR).unionByName(shortRL).distinct()
    val sl = lb.select(col("graft_id").as("graft_lid"), col("graft_s").as("graft_sl"))
    val sr = rb.select(col("graft_id").as("graft_rid"), col("graft_s").as("graft_sr"))
    candidates.join(sl, "graft_lid").join(sr, "graft_rid")
      .withColumn("graft_dist", levenshtein(col("graft_sl"), col("graft_sr"), d))
      .where(col("graft_dist") >= 0)
      .select(col("graft_lid").as("id_l"), col("graft_rid").as("id_r"),
        col("graft_dist").as("dist"))
  }

  /** Diagnostic: the segment buckets a given cap WOULD skip — run this
   * before trusting a capped join on a new corpus. One row per
   * over-cap (partnerLen, segIdx, segment) with its index-side row count,
   * largest first. */
  def skippedBuckets(df: DataFrame, idCol: Column, strCol: Column,
      maxDist: Int, maxBucketSize: Int): DataFrame = {
    require(maxBucketSize > 0, "maxBucketSize must be > 0 to report skips")
    segKeyRows(baseOf(df, idCol, strCol), maxDist)
      .groupBy(col("graft_l").as("partner_len"), col("graft_i").as("seg_idx"),
        col("graft_seg").as("segment"))
      .agg(count(lit(1)).as("bucket_rows"))
      .where(col("bucket_rows") > maxBucketSize)
      .orderBy(col("bucket_rows").desc)
  }
}
