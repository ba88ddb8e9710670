package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

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
 * Plan shape: BOTH roles' keys of a corpus are exploded in ONE pass (one
 * scan, one charSig per string, one explode) and land behind ONE explicit
 * `repartition(partnerLen, segIdx, segment)` exchange; the index-role and
 * probe-role branches are filters above that exchange, so the self-join —
 * and both role directions of the cross-corpus join — read the SAME
 * materialized shuffle (ReusedExchange), and the bucket-cap window and the
 * candidate equi-join both reuse its partitioning (no further exchanges
 * until the pair-distinct).
 *
 * Completeness: exact for every pair whose shorter side has at least
 * `maxDist + 1` characters (each segment nonempty). Shorter strings — the
 * degenerate tail where ANY partner of length ≤ 2·maxDist qualifies — are
 * handled by a separate tiny bucket (`len ≤ d` × `len ≤ 2d`, exact verify);
 * a corpus drowning in near-empty strings should gate those upstream.
 *
 * Count filter (always on, zero recall trade): every string carries a
 * packed 8-bucket character histogram (counts clamped at 255, 8 bits per
 * bucket in one LONG, computed by a single-pass codegen'd static call).
 * One edit moves at most 2 units of L1 mass between histogram buckets
 * (substitution ±1 twice, insert/delete ±1 once), and clamping only
 * shrinks differences, so ED ≤ d ⟹ clamped-L1 ≤ 2d — candidate rows
 * failing that die INSIDE the join condition, before the pair-distinct
 * shuffle and the exact verify. This is what keeps common boilerplate
 * segments ("the ", "ing ") from flooding verification: their bucket joins
 * still pair up, but the histogram kills non-near pairs for the price of 8
 * codegen'd subtractions instead of a DP.
 *
 * Skew guard (`maxBucketSize`, DEFAULT 2000): a segment shared by millions
 * of rows still makes its bucket-join quadratic before any filter runs;
 * buckets whose side exceeds the cap are skipped — a RECALL trade
 * documented like the minhash LSH cap (the same posture: the pairs a
 * >2000-row boilerplate bucket would add are near-duplicates of each
 * other en masse, exactly what [[graft.pipeline.Dedup.exact]] should have
 * collapsed first). The trade is NEVER silent: whenever the cap is active
 * the plan carries an `observe` metric per role branch
 * (`graft_fuzzy_cap_*`: key rows dropped + buckets hit) surfaced through
 * the standard `QueryExecutionListener` / `observedMetrics` machinery, so
 * a run that actually lost recall says so in its metrics. One AQE caveat
 * (spec-pinned in FuzzyJoinSpec): if the WHOLE result is empty,
 * empty-relation propagation replaces the subtree under the
 * CollectMetrics nodes — the metric keys still appear in
 * `observedMetrics` but their values read NULL instead of the true drop
 * counts, so in the all-empty regime treat null cap metrics as "unknown,
 * possibly lossy" and audit with [[skippedBuckets]]. Pass 0 to uncap
 * for guaranteed-complete runs ("each unordered pair exactly once" holds
 * only then); use [[skippedBuckets]] to SEE what a cap would drop before
 * trusting it.
 *
 * Requires unique, non-null ids. Output: one row per matched pair,
 * `(id_a, id_b, dist)` with `id_a < id_b`.
 */
object FuzzyJoin {

  /** Monotone per-call suffix so two fuzzy joins composed into one query
   * don't collide on observe-metric names (must be query-unique). */
  private val capMetricSeq = new AtomicLong(0L)

  /** One role branch of a keyed frame, bucket-cap guarded. The cap count
   * is a conditional sum over a window partitioned by the JOIN key only
   * (l, i, seg) — NOT by role — deliberately: the window reuses the keyed
   * exchange's partitioning (no new shuffle), and because `graft_role` is
   * not in the partitionSpec the role predicate cannot be pushed below the
   * window, so both role branches keep reading the ONE materialized
   * exchange instead of re-planning the key-explosion pass each
   * (ReusedExchange — plan-spec'd). Over-cap drops are reported as
   * observe metrics (key rows + buckets), never silent. With cap <= 0
   * (complete mode) there is no window barrier and Catalyst pushes each
   * role filter below its own exchange copy — the uncapped spec/audit
   * path trades the reuse for guaranteed completeness. */
  private def roleBranch(keyed: DataFrame, role: Int, cap: Int, metric: String): DataFrame = {
    val filtered =
      if (cap <= 0) keyed.where(col("graft_role") === role)
      else keyed.withColumn("graft_bsz",
          sum(when(col("graft_role") === role, 1L).otherwise(0L))
            .over(Window.partitionBy("graft_l", "graft_i", "graft_seg")))
        .where(col("graft_role") === role)
        .observe(metric,
          sum(when(col("graft_bsz") > cap, 1L).otherwise(0L))
            .as("dropped_key_rows"),
          sum(when(col("graft_bsz") > cap, lit(1.0) / col("graft_bsz"))
            .otherwise(lit(0.0))).as("dropped_buckets"))
        .where(col("graft_bsz") <= cap).drop("graft_bsz")
    if (role == 0)
      filtered.select(col("graft_id").as("graft_aid"),
        col("graft_slen").as("graft_alen"), col("graft_cf").as("graft_cfa"),
        col("graft_l"), col("graft_i"), col("graft_seg"))
    else
      filtered.select(col("graft_id").as("graft_bid"),
        col("graft_slen").as("graft_blen"), col("graft_cf").as("graft_cfb"),
        col("graft_l"), col("graft_i"), col("graft_seg"))
  }

  private def baseOf(df: DataFrame, idCol: Column, strCol: Column): DataFrame =
    df.select(idCol.as("graft_id"), strCol.cast("string").as("graft_s"))
      .where(col("graft_id").isNotNull && col("graft_s").isNotNull)
      .withColumn("graft_len", length(col("graft_s")))
      .withColumn("graft_cf", charSig(col("graft_s")))

  /** Packed 8-bucket character histogram: bits 8k..8k+7 hold
   * min(count of chars hashing to bucket k, 255). ONE pass over the
   * string per row (codegen'd static call), carried on every key row. */
  private[graft] def charSig(s: Column): Column =
    Bridge.column(CharSigExpression(Bridge.expression(s)))

  /** L1 distance between two packed histograms (8 codegen'd terms). */
  private[graft] def sigL1(a: Column, b: Column): Column =
    (0 until 8).map { k =>
      abs(shiftright(a, 8 * k).bitwiseAND(lit(255L)) -
        shiftright(b, 8 * k).bitwiseAND(lit(255L)))
    }.reduce(_ + _)

  /** Index-role keys of one string as array<struct<gl,gi,gseg>>: its own
   * k segments keyed by (myLen, i, segment). Empty below length k.
   * ONE imperative codegen'd static call per row (see [[FuzzyAlgos.keys]]). */
  private[graft] def segKeyArray(s: Column, len: Column, d: Int): Column =
    Bridge.column(FuzzyKeysExpression(Bridge.expression(s), d, FuzzyAlgos.ModeSeg))

  /** Probe-role keys of one string: for each partner length l2 in
   * [len-d, len] with l2 >= k, every substring that could be segment i of
   * that partner — length segLen(l2,i), start displaced s = j−p from
   * segStart(l2,i) by AT MOST the position-aware PassJoin bound: a match
   * at shift s forces ≥|s| edits in the prefix (prefix lengths differ by
   * s) and ≥|Δ−s| in the suffix (Δ = len−l2), so |s|+|Δ−s| ≤ d ⟹
   * s ∈ [−⌊(d−Δ)/2⌋, +⌊(d+Δ)/2⌋] — width d+1 instead of the loose ±d's
   * 2d+1, ~2× fewer probe keys with ZERO recall trade (any witnessing
   * match position satisfies the inequality). Duplicate keys collapse
   * (first occurrence kept). ONE imperative codegen'd static call per row
   * — the composed transform/sequence/array_distinct Catalyst stack this
   * replaces was 85% of the join's wall time at the 10× soak. */
  private[graft] def subKeyArray(s: Column, len: Column, d: Int): Column =
    Bridge.column(FuzzyKeysExpression(Bridge.expression(s), d, FuzzyAlgos.ModeSub))

  /** BOTH roles' key rows of one corpus in ONE pass, behind ONE explicit
   * segment-key exchange: role 0 = index (gl is own length), role 1 =
   * probe (gl is the candidate partner's length, own length in
   * graft_slen). Every consumer — the cap window, both role filters of a
   * self-join, both directions of a cross join — reads this single
   * materialized shuffle (ReusedExchange). */
  private[graft] def keyRows(base: DataFrame, d: Int): DataFrame =
    base.select(col("graft_id"), col("graft_len"), col("graft_cf"),
        explode(Bridge.column(FuzzyKeysExpression(
          Bridge.expression(col("graft_s")), d, FuzzyAlgos.ModeBoth)))
          .as("graft_k"))
      .select(col("graft_id"), col("graft_len").as("graft_slen"), col("graft_cf"),
        col("graft_k.grole").as("graft_role"), col("graft_k.gl").as("graft_l"),
        col("graft_k.gi").as("graft_i"), col("graft_k.gseg").as("graft_seg"))
      .repartition(col("graft_l"), col("graft_i"), col("graft_seg"))

  /** Index role over a corpus: one row per (id, len, key). Kept for the
   * [[skippedBuckets]] diagnostic and spec-level key inspection. */
  private[graft] def segKeyRows(base: DataFrame, d: Int): DataFrame =
    base.where(col("graft_len") >= d + 1)
      .select(col("graft_id").as("graft_aid"), col("graft_len").as("graft_alen"),
        col("graft_cf").as("graft_cfa"),
        explode(segKeyArray(col("graft_s"), col("graft_len"), d)).as("graft_k"))
      .select(col("graft_aid"), col("graft_alen").as("graft_l"), col("graft_cfa"),
        col("graft_k.gi").as("graft_i"), col("graft_k.gseg").as("graft_seg"))

  def editDistancePairs(
      df: DataFrame, idCol: Column, strCol: Column,
      maxDist: Int, maxBucketSize: Int = 2000): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val d = maxDist
    val base = baseOf(df, idCol, strCol)
    val keyed = keyRows(base, d)
    val seq = capMetricSeq.incrementAndGet()

    // Equi-join on the segment key; the shorter string is always the index
    // side (graft_l == partner length <= probe length), equal lengths
    // deduped by id order — each unordered pair survives exactly once.
    // Both branches read the ONE keyed exchange.
    val candidates = roleBranch(keyed, 0, maxBucketSize, s"graft_fuzzy_cap_idx_$seq")
      .join(roleBranch(keyed, 1, maxBucketSize, s"graft_fuzzy_cap_probe_$seq"),
        Seq("graft_l", "graft_i", "graft_seg"))
      .where((col("graft_alen") < col("graft_blen") ||
        (col("graft_alen") === col("graft_blen") && col("graft_aid") < col("graft_bid"))) &&
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
   * be the shorter or the longer of a pair), and since both roles' keys
   * of a corpus live behind one exchange, the two directed role joins
   * read TWO materialized shuffles total (one per side, each reused),
   * not four. Candidates from the two directions dedupe before the
   * single verify. Output one row per matched (id_l, id_r) pair with the
   * exact distance.
   */
  def editDistanceJoin(
      left: DataFrame, lIdCol: Column, lStrCol: Column,
      right: DataFrame, rIdCol: Column, rStrCol: Column,
      maxDist: Int, maxBucketSize: Int = 2000): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val d = maxDist
    val lb = baseOf(left, lIdCol, lStrCol)
    val rb = baseOf(right, rIdCol, rStrCol)
    val kl = keyRows(lb, d)
    val kr = keyRows(rb, d)
    val seq = capMetricSeq.incrementAndGet()
    val keys = Seq("graft_l", "graft_i", "graft_seg")
    // left indexes / right probes, then the reverse; equal-length pairs
    // surface in both directions — the distinct below is the dedup
    val candLR = roleBranch(kl, 0, maxBucketSize, s"graft_fuzzy_cap_lidx_$seq")
      .join(roleBranch(kr, 1, maxBucketSize, s"graft_fuzzy_cap_rprobe_$seq"), keys)
      .where(sigL1(col("graft_cfa"), col("graft_cfb")) <= 2 * d)
      .select(col("graft_aid").as("graft_lid"), col("graft_bid").as("graft_rid"))
    val candRL = roleBranch(kr, 0, maxBucketSize, s"graft_fuzzy_cap_ridx_$seq")
      .join(roleBranch(kl, 1, maxBucketSize, s"graft_fuzzy_cap_lprobe_$seq"), keys)
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

/** Scalar twins of the fuzzy-join expressions — single-pass packed
 * character histogram and the PassJoin key generator. Code-point
 * granularity throughout (matches Spark `levenshtein`'s unit of edit and
 * the builtin `length`/`substr` the original Column forms used). */
object FuzzyAlgos {
  /** Key-emission modes of [[keys]]. */
  final val ModeSeg = 0   // index role: own d+1 segments, struct<gl,gi,gseg>
  final val ModeSub = 1   // probe role: bounded-displacement substrings
  final val ModeBoth = 2  // both, tagged: struct<grole,gl,gi,gseg>

  /** All PassJoin keys of one string in ONE imperative pass. Seg role:
   * the k = d+1 even segments keyed by (ownLen, i). Sub role: for each
   * partner length l2 = len−e (e ≤ d, l2 ≥ k) and segment i, the
   * substrings of length segLen(l2,i) starting within the position-aware
   * displacement window s ∈ [−⌊(d−e)/2⌋, +⌊(d+e)/2⌋] of segStart(l2,i);
   * duplicate (gl,gi,seg) keys collapse keeping first occurrence (the
   * array_distinct semantics of the Column form this replaces). */
  def keys(s: UTF8String, d: Int, mode: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val str = s.toString
    // code-point array: segment arithmetic and substrings count code
    // points, matching builtin length()/substr()/levenshtein units
    val n = str.codePointCount(0, str.length)
    val cps = new Array[Int](n)
    var ci = 0
    var oi = 0
    while (oi < str.length) {
      val cp = str.codePointAt(oi)
      cps(ci) = cp; ci += 1; oi += Character.charCount(cp)
    }
    def sub(start: Int, m: Int): UTF8String =
      UTF8String.fromString(new String(cps, start, m))
    val k = d + 1
    val tagged = mode == ModeBoth
    val out = new scala.collection.mutable.ArrayBuffer[Any](if (mode == ModeSeg) k else 4 * k)
    def row(role: Int, gl: Int, gi: Int, seg: UTF8String) =
      if (tagged)
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](role, gl, gi, seg))
      else
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](gl, gi, seg))
    if ((mode == ModeSeg || tagged) && n >= k) {
      var i = 0
      while (i < k) {
        val start = i * (n / k) + math.min(i, n % k)
        val m = n / k + (if (i < n % k) 1 else 0)
        out += row(0, n, i, sub(start, m))
        i += 1
      }
    }
    if (mode == ModeSub || tagged) {
      val seen = new java.util.HashSet[String]()
      var e = 0
      while (e <= d) {
        val l2 = n - e
        if (l2 >= k) {
          var i = 0
          while (i < k) {
            val m = l2 / k + (if (i < l2 % k) 1 else 0)
            val p = i * (l2 / k) + math.min(i, l2 % k)
            var j = math.max(0, p - (d - e) / 2)
            val hi = math.min(n - m, p + (d + e) / 2)
            while (j <= hi) {
              val seg = new String(cps, j, m)
              if (seen.add(l2 + "|" + i + "|" + seg))
                out += row(1, l2, i, UTF8String.fromString(seg))
              j += 1
            }
            i += 1
          }
        }
        e += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  def charSig(s: UTF8String): Long = {
    val str = s.toString
    val counts = new Array[Int](8)
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      val b = (cp * 0x9E3779B9) >>> 29
      if (counts(b) < 255) counts(b) += 1
    }
    var sig = 0L
    var k = 0
    while (k < 8) { sig |= counts(k).toLong << (8 * k); k += 1 }
    sig
  }
}

/** All PassJoin keys of a string as an array of structs — ONE imperative
 * codegen'd static call per row (see [[FuzzyAlgos.keys]]); replaces a
 * composed transform/sequence/flatten/array_distinct Catalyst stack that
 * was 85% of the fuzzy join's wall time at the 10× soak. */
case class FuzzyKeysExpression(child: Expression, maxDist: Int, mode: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.types._
  private def segFields = Seq(
    StructField("gl", IntegerType, nullable = false),
    StructField("gi", IntegerType, nullable = false),
    StructField("gseg", StringType, nullable = false))
  override def dataType: DataType = ArrayType(StructType(
    if (mode == FuzzyAlgos.ModeBoth)
      StructField("grole", IntegerType, nullable = false) +: segFields
    else segFields), containsNull = false)
  override def nullSafeEval(s: Any): Any =
    FuzzyAlgos.keys(s.asInstanceOf[UTF8String], maxDist, mode)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.operators.FuzzyAlgos.keys($c, $maxDist, $mode);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Packed 8-bucket character histogram of a string as one LONG — ONE
 * pass per row via a codegen'd static call (replaces an 8×filter HOF
 * stack over a per-char split array). See [[FuzzyAlgos.charSig]]. */
case class CharSigExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(s: Any): Any =
    FuzzyAlgos.charSig(s.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.operators.FuzzyAlgos.charSig($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
