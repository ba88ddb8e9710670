package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Exact set-similarity self-join via prefix filtering — the AllPairs /
 * PPJoin family (Bayardo et al. 2007, "Scaling Up All Pairs Similarity
 * Search"; Xiao et al. 2008). The exact complement to the MinHash LSH tier
 * ([[Dedup.minhashNearDups]]): every pair with Jaccard ≥ threshold is
 * returned, no probabilistic misses and no banding tuning, at the cost of
 * candidate counts that grow with how self-similar the corpus actually is.
 *
 * Filter stack (each provably keeps every qualifying pair):
 *  - size filter: J(x,y) ≥ t forces t·|y| ≤ |x| (for |x| ≤ |y|), so pairs
 *    whose sizes differ by more than the ratio t never verify;
 *  - prefix filter: order every set by ascending global document frequency
 *    (rarest token first, ties by token). J ≥ t forces overlap
 *    o ≥ ceil(t·|s|) for BOTH sets, so any qualifying pair must collide on
 *    at least one token inside each side's first |s| − ceil(t·|s|) + 1
 *    ordered tokens. Candidates are generated ONLY from prefix-token
 *    collisions — and because prefixes hold each set's globally rarest
 *    tokens, the per-token join fan-out is the smallest any token-keyed
 *    plan can achieve. ceil() is ε-relaxed (1e-9) so IEEE rounding of
 *    t·|s| can only ever LENGTHEN a prefix (safe), never shorten it;
 *  - positional filter (PPJoin, Xiao et al. 2008): each prefix row carries
 *    its token's 1-based position p in the canonical order. Both sides
 *    order by the SAME global total order, so for a pair's FIRST common
 *    token all common tokens sit at or after its position on both sides:
 *    overlap ≤ 1 + min(|x| − pₓ, |y| − p_y). J ≥ t needs overlap
 *    ≥ t/(1+t)·(|x|+|y|), so collision rows whose positional upper bound
 *    misses that are dropped INSIDE the join condition, before the
 *    pair-distinct shuffle. Zero recall trade: the first-common-token row
 *    has the max bound over a pair's collisions and always survives for a
 *    qualifying pair — later-collision rows of the same pair may die, the
 *    pair cannot.
 *
 * Scale design (100 TB): three key-partitioned shuffles build the ordered
 * sets (token df aggregate with map-side combine, token-keyed order join,
 * regroup by id); the candidate join shuffles prefix rows keyed by token
 * (rare by construction — a token of global df f contributes at most f
 * prefix rows, and frequent tokens fall outside most prefixes); exact
 * verification re-joins the token arrays for CANDIDATE pairs only. Nothing
 * is ever all-pairs. Exact duplicates should be collapsed first
 * ([[Dedup.exact]]) — a corpus of N identical documents has N²/2
 * qualifying pairs, and no exact algorithm can return fewer rows than the
 * answer.
 */
object PrefixJoin {

  /**
   * All pairs (id_a < id_b) whose exact Jaccard over the distinct-token
   * sets meets `threshold`. Returns (id_a, id_b, overlap, jaccard).
   *
   * EAGER: the call fully materializes the pair set before returning (the
   * tokenized-set subtree feeds five plan consumers, so it is cached for
   * the run and released behind an eager `localCheckpoint` of the — tiny —
   * output; r19 opt). The returned frame is therefore a checkpointed RDD
   * scan: cheap to reuse, but NOT recomputable from source lineage — on a
   * real cluster a lost executor invalidates its blocks and downstream
   * reads fail rather than recompute (the standing localCheckpoint caveat;
   * persist the result to storage if you need durability across executor
   * loss).
   *
   * @param docs      input frame
   * @param idCol     64-bit id column
   * @param tokensCol array column of set members (deduplicated internally);
   *                  rows with empty/null sets are dropped (no self-pairs)
   * @param threshold Jaccard threshold in (0, 1]
   */
  def similarityJoin(
      docs: DataFrame, idCol: Column, tokensCol: Column,
      threshold: Double): DataFrame =
    similarityJoin(docs, idCol, tokensCol, threshold, materialize = true)

  /** `materialize = false` keeps the returned frame fully lazy (no token
    * cache, no eager checkpoint) — the plan-inspection seam; the default
    * caches the tokenized sets for the five consumers and releases them
    * behind an eager checkpoint of the (tiny) pair output. */
  private[pipeline] def similarityJoin(
      docs: DataFrame, idCol: Column, tokensCol: Column,
      threshold: Double, materialize: Boolean): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    // persist the tokenized sets: the subtree feeds FIVE consumers (df
    // aggregate, the order join, and — via the self-join's duplicated
    // branches — both candidate sides and both verification sides), and
    // without the cache each one re-runs the tokenizer + array_distinct
    // over the corpus (r19 opt: the q_similarity_join plan showed 12
    // parquet scans / 6 shingle explodes of the same documents)
    val base = docs
      .select(idCol.cast("long").as("id"),
        array_distinct(tokensCol).as("graft_ts"))
      .where(col("graft_ts").isNotNull)
      .withColumn("graft_sz", size(col("graft_ts")))
      .where(col("graft_sz") >= 1)
    if (materialize)
      base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ascending (document frequency, token) is the canonical total order;
    // the hash aggregate + per-group array sort beats the tempting
    // per-doc rank window at scale: the window needs a SORT-based
    // shuffle of every (id, df, token) row, the aggregate only hashes —
    // measured 72s (agg) vs 133s (window) on the 50k-doc 10x soak, with
    // the window ahead only at sf0.1 (10.9s vs 14.6s fixed-overhead win)
    val tok = base.select(col("id"), col("graft_sz"),
      explode(col("graft_ts")).as("graft_t"))
    val dfreq = tok.groupBy(col("graft_t"))
      .agg(count(lit(1)).as("graft_df"))
    val prefixLen =
      greatest(lit(1), col("graft_sz") -
        ceil(lit(threshold) * col("graft_sz") - lit(1e-9)).cast("int") + lit(1))
    val prefixes = tok.join(dfreq, Seq("graft_t"))
      .groupBy(col("id"), col("graft_sz"))
      .agg(sort_array(collect_list(struct(col("graft_df"), col("graft_t"))))
        .as("graft_ord"))
      .select(col("id"), col("graft_sz"),
        posexplode(slice(transform(col("graft_ord"), s => s("graft_t")),
          lit(1), prefixLen)))
      .withColumnRenamed("pos", "graft_p") // 0-based prefix position
      .withColumnRenamed("col", "graft_t")
    val cand = prefixes.as("a")
      .join(prefixes.as("b"),
        col("a.graft_t") === col("b.graft_t") &&
          col("a.id") < col("b.id") &&
          least(col("a.graft_sz"), col("b.graft_sz")).cast("double") >=
            lit(threshold) *
              greatest(col("a.graft_sz"), col("b.graft_sz")).cast("double") -
              lit(1e-9) &&
          // positional upper bound ≥ required overlap t/(1+t)·(szₐ+sz_b)
          (lit(1) + least(col("a.graft_sz") - col("a.graft_p") - 1,
            col("b.graft_sz") - col("b.graft_p") - 1)).cast("double") >=
            lit(threshold / (1.0 + threshold)) *
              (col("a.graft_sz") + col("b.graft_sz")).cast("double") -
              lit(1e-9))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val sets = base.select(col("id"), col("graft_ts"), col("graft_sz"))
    val out = cand
      .join(sets.select(col("id").as("id_a"), col("graft_ts").as("graft_ta"),
        col("graft_sz").as("graft_sa")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("graft_ts").as("graft_tb"),
        col("graft_sz").as("graft_sb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("graft_ta"), col("graft_tb"))).as("overlap"),
        col("graft_sa"), col("graft_sb"))
      .where(col("overlap") > 0)
      .select(col("id_a"), col("id_b"), col("overlap"),
        (col("overlap").cast("double") /
          (col("graft_sa") + col("graft_sb") - col("overlap")).cast("double"))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
    if (!materialize) out
    else
      // materialize-then-release (r15 #8 posture): the pair set is tiny
      // next to the cached token sets it frees; finally-released so a
      // failed checkpoint job can't leak the cache (ADVICE r19)
      try out.localCheckpoint(true)
      finally base.unpersist(blocking = false)
  }

  /**
   * Cross-corpus exact set-similarity JOIN (A × B): every pair
   * (id_a from `left`, id_b from `right`) whose exact Jaccard meets
   * `threshold` — the "attribute the new crawl against the frozen
   * reference" shape, zero-miss like the self-join. The canonical token
   * order comes from the UNION's document frequencies (one shared order —
   * prefix completeness needs both sides cut by the same total order);
   * candidates join left prefixes to right prefixes on the token, sizes
   * pre-filtered by the ratio bound, verification exact. Same scale
   * posture as [[similarityJoin]] — including the EAGER materialization
   * contract documented there: the call computes the pairs at call time
   * and returns a checkpointed (non-lineage-recomputable) frame; ids need
   * not be disjoint (sides are tagged internally).
   */
  def similarityJoinBetween(
      left: DataFrame, leftIdCol: Column, leftTokensCol: Column,
      right: DataFrame, rightIdCol: Column, rightTokensCol: Column,
      threshold: Double): DataFrame =
    similarityJoinBetween(left, leftIdCol, leftTokensCol,
      right, rightIdCol, rightTokensCol, threshold, materialize = true)

  /** Lazy seam twin of [[similarityJoin]]'s — see there. */
  private[pipeline] def similarityJoinBetween(
      left: DataFrame, leftIdCol: Column, leftTokensCol: Column,
      right: DataFrame, rightIdCol: Column, rightTokensCol: Column,
      threshold: Double, materialize: Boolean): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    // persist per side (see similarityJoin): each side's tokenized sets
    // feed the union df aggregate, the side's order join, and its
    // verification join — three tokenizer passes each without the cache
    def baseOf(df: DataFrame, id: Column, ts: Column): DataFrame = df
      .select(id.cast("long").as("id"), array_distinct(ts).as("graft_ts"))
      .where(col("graft_ts").isNotNull)
      .withColumn("graft_sz", size(col("graft_ts")))
      .where(col("graft_sz") >= 1)
    def cached(df: DataFrame): DataFrame = {
      if (materialize)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df
    }
    val lbase = cached(baseOf(left, leftIdCol, leftTokensCol))
    val rbase = cached(baseOf(right, rightIdCol, rightTokensCol))
    def tokOf(base: DataFrame): DataFrame = base
      .select(col("id"), col("graft_sz"), explode(col("graft_ts")).as("graft_t"))
    // the SHARED canonical order comes from the UNION's document
    // frequencies (prefix completeness needs one total order across both
    // corpora); dfreq is the only union-derived frame
    val dfreq = tokOf(lbase).unionAll(tokOf(rbase))
      .groupBy(col("graft_t")).agg(count(lit(1)).as("graft_df"))
    val prefixLen =
      greatest(lit(1), col("graft_sz") -
        ceil(lit(threshold) * col("graft_sz") - lit(1e-9)).cast("int") + lit(1))
    // ONE canonical-order aggregate PER SIDE over that side's rows only
    // (total aggregate work |L|+|R|), both joining the SAME dfreq subtree
    // (its exchange is reused). The r12 shape aggregated the tagged UNION
    // once and filtered by side above a token exchange — but side is a
    // grouping column, so Catalyst legally pushed each side filter below
    // the repartition AND the aggregate, silently re-planning the union
    // aggregate per side (2·(|L|+|R|) — caught by the r14 plan spec).
    // Per-side builds make the pushdown trap structurally impossible.
    def prefixesOf(base: DataFrame): DataFrame = tokOf(base)
      .join(dfreq, Seq("graft_t"))
      .groupBy(col("id"), col("graft_sz"))
      .agg(sort_array(collect_list(struct(col("graft_df"), col("graft_t"))))
        .as("graft_ord"))
      .select(col("id"), col("graft_sz"),
        posexplode(slice(transform(col("graft_ord"), s => s("graft_t")),
          lit(1), prefixLen)))
      .withColumnRenamed("pos", "graft_p") // 0-based prefix position
      .withColumnRenamed("col", "graft_t")
      .repartition(col("graft_t"))
    val cand = prefixesOf(lbase).as("a")
      .join(prefixesOf(rbase).as("b"),
        col("a.graft_t") === col("b.graft_t") &&
          least(col("a.graft_sz"), col("b.graft_sz")).cast("double") >=
            lit(threshold) *
              greatest(col("a.graft_sz"), col("b.graft_sz")).cast("double") -
              lit(1e-9) &&
          // PPJoin positional upper bound (see similarityJoin) — the union
          // df order is shared, so the first-common-token argument holds
          (lit(1) + least(col("a.graft_sz") - col("a.graft_p") - 1,
            col("b.graft_sz") - col("b.graft_p") - 1)).cast("double") >=
            lit(threshold / (1.0 + threshold)) *
              (col("a.graft_sz") + col("b.graft_sz")).cast("double") -
              lit(1e-9))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val out = cand
      .join(lbase.select(col("id").as("id_a"), col("graft_ts").as("graft_ta"),
        col("graft_sz").as("graft_sa")), Seq("id_a"))
      .join(rbase.select(col("id").as("id_b"), col("graft_ts").as("graft_tb"),
        col("graft_sz").as("graft_sb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("graft_ta"), col("graft_tb"))).as("overlap"),
        col("graft_sa"), col("graft_sb"))
      .where(col("overlap") > 0)
      .select(col("id_a"), col("id_b"), col("overlap"),
        (col("overlap").cast("double") /
          (col("graft_sa") + col("graft_sb") - col("overlap")).cast("double"))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
    if (!materialize) out
    else
      // materialize-then-release (r15 #8); finally-released so a failed
      // checkpoint job can't leak the two side caches (ADVICE r19)
      try out.localCheckpoint(true)
      finally {
        lbase.unpersist(blocking = false)
        rbase.unpersist(blocking = false)
      }
  }

  /** [[similarityJoin]] over whitespace word sets of a text column —
   * the common call shape for near-dup mining on documents. */
  def similarityJoinWords(
      docs: DataFrame, idCol: Column, textCol: Column,
      threshold: Double): DataFrame =
    similarityJoin(docs, idCol,
      filter(split(trim(lower(textCol)), "\\s+"), t => t =!= lit("")),
      threshold)
}
