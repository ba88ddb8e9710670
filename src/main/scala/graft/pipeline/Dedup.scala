package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Deduplication operators for training-data pipelines.
 *
 * Scale design (100 TB):
 *  - exact: one shuffle on the content hash (not the content), keep-first
 *    deterministic via min(id) — map-side partial aggregation applies.
 *  - minhash LSH: signatures are a narrow projection; the only shuffle is on
 *    (band, bucket) keys whose cardinality ≈ docs × bands; candidate
 *    verification joins only bucket-colliding pairs, never the full cross
 *    product.
 *  - simhash: same banding idea over 16-bit chunks of a 64-bit signature.
 */
object Dedup {

  /** Exact dedup on content: keeps the lowest id per distinct content.
   * Fingerprint is 128 bits (two independent xxhash64 seeds, both codegen) —
   * a single 64-bit hash collides with ~50% probability around 5 billion
   * distinct rows, which a 100 TB corpus exceeds; 128 bits keeps the
   * collision odds negligible while the shuffle still carries only
   * (fingerprint, id), never the content. */
  /** 128-bit content fingerprint (two independent xxhash64 seeds, codegen). */
  private[graft] def fingerprint(contentCols: Seq[Column]): Column = {
    import org.apache.spark.sql.graft.Bridge
    struct(
      Bridge.column(new org.apache.spark.sql.catalyst.expressions.XxHash64(
        contentCols.map(Bridge.expression), 42L)).as("h1"),
      Bridge.column(new org.apache.spark.sql.catalyst.expressions.XxHash64(
        contentCols.map(Bridge.expression), 43L)).as("h2"))
  }

  def exact(df: DataFrame, idCol: Column, contentCols: Column*): DataFrame = {
    def fp: Column = fingerprint(contentCols)
    val keep = df.select(fp.as("graft_fp"), idCol.as("graft_id"))
      .groupBy(col("graft_fp")).agg(min(col("graft_id")).as("graft_keep"))
    df.join(keep, fp === col("graft_fp") && idCol === col("graft_keep"), "leftsemi")
  }

  /**
   * [[exact]] with a PROVENANCE priority: when the same content appears in
   * several sources, keep the copy from the most trusted one — multi-source
   * corpus assembly wants the curated-wiki copy, not the crawl's. Same
   * shape: the shuffle carries (fingerprint, priority, id), never content.
   *
   * PRIORITY CONVENTION (shared with [[dropNearDupsPreferring]] — ONE
   * direction across the dedup tiers): `trustCol` is a TRUST WEIGHT — the
   * HIGHEST value wins, ties go to the lowest id, and NULL trust loses
   * to any labeled copy (an unlabeled source never outranks a labeled
   * one). Trust must not be Long.MinValue (negated internally). Sources
   * ranked "1 = best" should pass the negated rank.
   *
   * MIGRATION — this method was `exactPrioritized(df, id, priorityCol,
   * content*)`. History matters for porting: the semantics flipped to
   * highest-wins at commit f8e7dc6 UNDER THE OLD NAME (callers that
   * recompiled against intermediate versions already got highest-wins
   * silently); the rename to `exactPreferring` came later so that any
   * caller still holding the original lowest-wins convention (d52a484
   * era, "1 = best") fails to compile here instead of keeping the wrong
   * copy. Negation is only needed for callers porting from that original
   * lowest-wins version: `exactPreferring(df, id, -rank, content*)`;
   * callers already on post-f8e7dc6 semantics just rename the call.
   */
  def exactPreferring(
      df: DataFrame, idCol: Column, trustCol: Column,
      contentCols: Column*): DataFrame = {
    def fp: Column = fingerprint(contentCols)
    // min(struct) is lexicographic over (-priority, id): highest priority
    // first, ties to lowest id; NULL maps to the max long so it loses to
    // every labeled source — identical encoding to dropNearDupsPreferring
    def negp: Column = when(trustCol.isNull, lit(Long.MaxValue))
      .otherwise(-trustCol.cast("long"))
    val keep = df
      .select(fp.as("graft_fp"), negp.as("graft_p"), idCol.as("graft_id"))
      .groupBy(col("graft_fp"))
      .agg(min(struct(col("graft_p"), col("graft_id"))).as("graft_keep"))
    df.join(keep,
        fp === col("graft_fp") &&
          struct(negp, idCol) === col("graft_keep"), "leftsemi")
  }

  /** (id, rep) membership of exact-content groups: rep = min id of the group.
   * One shuffle on the 128-bit fingerprint; content never shuffles. */
  private def exactMembership(base: DataFrame): DataFrame = {
    val repOf = base.groupBy(col("graft_fp")).agg(min(col("id")).as("rep"))
    base.join(repOf, "graft_fp").select(col("id"), col("rep"))
  }

  /** Candidate pairs whose exact shingle-Jaccard ≥ threshold, found via
   * MinHash + LSH banding. Returns (id_a, id_b, jaccard), id_a < id_b.
   *
   * WARNING — `maxBucketSize` defaults to 0 (uncapped) so no true pair is
   * ever dropped. On a raw corpus with large exact-duplicate clusters this
   * produces O(cluster²·bands) candidate pairs: pre-collapse exact
   * duplicates first (see [[nearDupClusters]], which does this and caps by
   * default) or pass an explicit `maxBucketSize`. */
  def minhashNearDups(
      df: DataFrame, idCol: Column, textCol: Column,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, maxBucketSize: Int = 0): DataFrame = {
    val docs = df.select(idCol.as("id"), textCol.as("text"))
    minhashPairsOverDocs(docs, shingleSize, numHashes, bands, threshold, maxBucketSize)
  }

  /** LSH pipeline over a (id, text) frame. The expensive full-corpus pass
   * (shingle → minhash signatures) appears ONLY under the band-bucket
   * exchange, which the self-join reuses (one computation, Spark
   * ReusedExchange); verification re-derives shingles from text for
   * CANDIDATE rows only, so corpus-wide shingle work happens exactly once. */
  /** LSH band rows (id, band, bucket) for an (id, text) frame.
   *
   * The explicit repartition on the candidate-join key materializes the
   * corpus signature pass behind ONE exchange that every downstream
   * consumer (bucket-size cap, both self-join sides) reads — the same
   * exchange a sort-merge join would demand anyway, so no extra shuffle at
   * scale, and a broadcast-demoted join can no longer recompute the
   * signature subtree per side.
   *
   * Skew guard (maxBucketSize > 0): a corpus with massive exact-duplicate
   * clusters puts whole clusters into one bucket in EVERY band →
   * O(cluster²·bands) candidate pairs; a 100 TB web corpus WILL contain
   * million-copy boilerplate. Buckets over the cap are skipped — a RECALL
   * change, so the pair-level default is 0 (uncapped, complete pairs) and
   * the cap is opt-in; nearDupClusters/dropNearDups collapse exact groups
   * first and then cap, which loses nothing for clustering/curation. */
  private def lshBandRows(
      docs: DataFrame, shingleSize: Int, numHashes: Int, bands: Int,
      maxBucketSize: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val rowsPerBand = numHashes / bands
    val rawBandRows = docs
      .select(col("id"),
        Text.minhash(Text.shingles(col("text"), shingleSize), numHashes).as("sig"))
      .select(col("id"), explode(sequence(lit(0), lit(bands - 1))).as("band"), col("sig"))
      .select(col("id"), col("band"),
        xxhash64(col("band"), slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))).as("bucket"))
      .repartition(col("band"), col("bucket"))
    if (maxBucketSize <= 0) rawBandRows
    else {
      val sizes = rawBandRows.groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("graft_bsz"))
        .where(col("graft_bsz") <= maxBucketSize)
        .select(col("band"), col("bucket"))
      rawBandRows.join(sizes, Seq("band", "bucket"), "leftsemi")
    }
  }

  /** Exact-Jaccard verification of an (id_a, id_b) candidate frame: texts
   * re-derived for candidate rows only via two id-keyed equi-joins (the
   * candidate side is small, AQE broadcasts it). */
  private def verifyCandidates(
      candidates: DataFrame, ldocs: DataFrame, rdocs: DataFrame,
      shingleSize: Int, threshold: Double): DataFrame =
    candidates
      .join(ldocs.select(col("id").as("id_a"), col("text").as("text_a")), "id_a")
      .join(rdocs.select(col("id").as("id_b"), col("text").as("text_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        Text.shingles(col("text_a"), shingleSize).as("sh_a"),
        Text.shingles(col("text_b"), shingleSize).as("sh_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  private def minhashPairsOverDocs(
      docs: DataFrame, shingleSize: Int, numHashes: Int, bands: Int,
      threshold: Double, maxBucketSize: Int): DataFrame = {
    // SAME bandRows instance on both join sides → Spark ReusedExchange:
    // one corpus signature pass (plan-spec'd)
    val bandRows = lshBandRows(docs, shingleSize, numHashes, bands, maxBucketSize)
    val l = bandRows.as("l")
    val r = bandRows.as("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    verifyCandidates(candidates, docs, docs, shingleSize, threshold)
  }

  /**
   * Cross-corpus near-duplicate JOIN: (id_a from `left`, id_b from `right`,
   * jaccard) for pairs whose exact shingle Jaccard meets `threshold`, with
   * candidates from minhash LSH band buckets — the "dedup the new crawl
   * against the frozen reference corpus, with ATTRIBUTION" operator
   * ([[Incremental.minhashIncremental]] answers drop-or-keep against an
   * index; this returns the matched PAIRS, e.g. for contamination reports
   * or provenance audits, and verifies with exact Jaccard since both texts
   * are at hand).
   *
   * Scale: each side makes one shingle→signature pass; the candidate join
   * is an equi-join on (band, bucket) — both sides shuffle once on that
   * key, NEVER an all-pairs product; verification re-derives shingles for
   * candidate rows only via two id-keyed joins (candidate side is small,
   * AQE broadcasts it). `maxBucketSize` caps boilerplate buckets on each
   * side independently (opt-in recall trade, as in [[minhashNearDups]]).
   */
  def minhashNearDupJoin(
      left: DataFrame, leftId: Column, leftText: Column,
      right: DataFrame, rightId: Column, rightText: Column,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, maxBucketSize: Int = 0): DataFrame = {
    val ldocs = left.select(leftId.as("id"), leftText.as("text"))
    val rdocs = right.select(rightId.as("id"), rightText.as("text"))
    val l = lshBandRows(ldocs, shingleSize, numHashes, bands, maxBucketSize).as("l")
    val r = lshBandRows(rdocs, shingleSize, numHashes, bands, maxBucketSize).as("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    verifyCandidates(candidates, ldocs, rdocs, shingleSize, threshold)
  }

  /**
   * Host-level MIRROR detection: pairs of hosts whose distinct-content
   * sets overlap at Jaccard ≥ `threshold` — re-hosted sites, CDN clones
   * and scraper mirrors that doc-level dedup sees only as a million
   * scattered pairs. The set elements are 64-bit content fingerprints, so
   * a host's identity is what it SERVES, not how its URLs look.
   *
   * Shape at scale: one (host, content-hash) distinct (the only pass over
   * text); host signatures from k min-aggregations over the hash set
   * (map-side combining — a 10⁸-host corpus aggregates to one row per
   * host); LSH banding over the signature exactly as the doc tier; exact
   * set-overlap verification computed ONLY for candidate pairs via two
   * hash-keyed joins (candidates are few, AQE broadcasts them). Never
   * all-pairs in hosts or in docs.
   *
   * Output: (host_a < host_b, jaccard_ppm) with exact integer ppm —
   * estimated-similarity candidates, exact-verified. Completeness: full
   * mirrors (Jaccard 1) collide in every band; at the default 16×4
   * banding a true 0.8-Jaccard pair is caught with p ≈ 1 − (1−0.8⁴)¹⁶ ≈
   * 0.9998 per the S-curve ([[lshBandingAdvisor]] prices other shapes).
   */
  def hostMirrors(df: DataFrame, hostCol: Column, textCol: Column,
      numHashes: Int = 64, bands: Int = 16, threshold: Double = 0.8,
      maxBucketSize: Int = 0): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    require(threshold > 0.0 && threshold <= 1.0, s"bad threshold $threshold")
    val rowsPerBand = numHashes / bands
    val sets = df.select(hostCol.as("graft_host"), xxhash64(textCol).as("graft_h"))
      .where(col("graft_host").isNotNull).distinct()
    // per-host minhash signature: element i = min over the hash set of an
    // independent re-key (xxhash64 of (hash, i)); min is mergeable, so the
    // signature builds with map-side combine in ONE aggregation
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(col("graft_h"), lit(i))).as(s"graft_m$i"))
    val sig = sets.groupBy(col("graft_host"))
      .agg(mins.head, mins.tail: _*)
      .select(col("graft_host"),
        array((0 until numHashes).map(i => col(s"graft_m$i")): _*).as("graft_sig"))
    val bandRows = sig
      .select(col("graft_host"), explode(sequence(lit(0), lit(bands - 1))).as("band"),
        col("graft_sig"))
      .select(col("graft_host"), col("band"),
        xxhash64(col("band"),
          slice(col("graft_sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand)))
          .as("bucket"))
      .repartition(col("band"), col("bucket"))
    val capped =
      if (maxBucketSize <= 0) bandRows
      else bandRows.join(
        bandRows.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("graft_bsz"))
          .where(col("graft_bsz") <= maxBucketSize)
          .select(col("band"), col("bucket")),
        Seq("band", "bucket"), "leftsemi")
    val l = capped.as("l")
    val r = capped.as("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.graft_host") < col("r.graft_host"))
      .select(col("l.graft_host").as("host_a"), col("r.graft_host").as("host_b"))
      .distinct()
    // exact verification for candidates only: shared-hash count via two
    // hash-keyed joins, sizes from one per-host count
    val sizes = sets.groupBy(col("graft_host")).agg(count(lit(1)).as("graft_n"))
    val inter = candidates
      .join(sets.select(col("graft_host").as("host_a"), col("graft_h")), Seq("host_a"))
      .join(sets.select(col("graft_host").as("host_b"), col("graft_h")), Seq("host_b", "graft_h"))
      .groupBy(col("host_a"), col("host_b"))
      .agg(count(lit(1)).as("graft_inter"))
    inter
      .join(sizes.select(col("graft_host").as("host_a"), col("graft_n").as("graft_na")), Seq("host_a"))
      .join(sizes.select(col("graft_host").as("host_b"), col("graft_n").as("graft_nb")), Seq("host_b"))
      // gate on the EXACT double ratio (>= keeps threshold-equal pairs,
      // same convention as PrefixJoin/Wminhash — a floor-truncated ppm
      // compare would drop a pair whose exact Jaccard equals a threshold
      // not representable in ppm, e.g. 2/3); ppm stays output-only
      .where(col("graft_inter").cast("double") /
        (col("graft_na") + col("graft_nb") - col("graft_inter")) >= threshold)
      .select(col("host_a"), col("host_b"),
        expr("graft_inter * 1000000L div (graft_na + graft_nb - graft_inter)")
          .as("jaccard_ppm"))
  }

  /**
   * Exact shingle-CONTAINMENT join: (id_q, id_c, containment) for every
   * (query, corpus) pair with |shingles(q) ∩ shingles(c)| / |shingles(q)|
   * ≥ `threshold` — the ASYMMETRIC overlap Jaccard near-dup machinery
   * can't see. The motivating case is decontamination: a 50-word benchmark
   * item quoted inside a 5000-word train document has Jaccard ~0.01 (LSH
   * on full-doc signatures never even buckets them together) but
   * containment ~1.0. Exact-span matching ([[decontaminateSpans]]) catches
   * verbatim quotes only; shingle containment survives paraphrase-level
   * edits, reflowing and truncation (Broder 1997's containment measure).
   *
   * No sketching is needed: candidates come from an inverted shingle join
   * — each SHARED shingle yields a candidate row, so a pair with zero
   * overlap costs nothing, and the per-pair shared count is exact. Plan at
   * scale: one shingle pass per side; both sides shuffle once on the
   * 8-byte shingle hash (never the shingle text); pair counts partial-
   * aggregate map-side before one (id_q, id_c) shuffle; the ≥ threshold
   * cut happens inside the aggregate's output projection. Σ df_q(s)·df_c(s)
   * bounds the join fan-out — web-scale corpora MUST cap ubiquitous
   * boilerplate shingles via `maxShingleDf` (drops corpus-side shingles
   * appearing in more than that many corpus docs; a RECALL trade that
   * biases containment downward, so opt-in, 0 = uncapped) and should use
   * shingleSize ≥ 5 (rarer shingles, smaller fan-out).
   */
  def containmentJoin(
      queries: DataFrame, queryId: Column, queryText: Column,
      corpus: DataFrame, corpusId: Column, corpusText: Column,
      shingleSize: Int = 5, threshold: Double = 0.8,
      maxShingleDf: Int = 0): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"containment threshold must be in (0, 1], got $threshold")
    val qsh = queries
      .select(queryId.as("id_q"), Text.shingles(queryText, shingleSize).as("graft_shs"))
      .select(col("id_q"), size(col("graft_shs")).as("graft_nq"),
        explode(col("graft_shs")).as("graft_g"))
      .select(col("id_q"), col("graft_nq"), xxhash64(col("graft_g")).as("graft_h"))
    val cshAll = corpus
      .select(corpusId.as("id_c"), explode(Text.shingles(corpusText, shingleSize)).as("graft_g"))
      .select(col("id_c"), xxhash64(col("graft_g")).as("graft_h"))
    val csh =
      if (maxShingleDf <= 0) cshAll
      else {
        val rare = cshAll.groupBy(col("graft_h"))
          .agg(count(lit(1)).as("graft_df"))
          .where(col("graft_df") <= maxShingleDf)
          .select(col("graft_h"))
        cshAll.join(rare, Seq("graft_h"), "leftsemi")
      }
    qsh.join(csh, "graft_h")
      .groupBy(col("id_q"), col("id_c"), col("graft_nq"))
      .agg(count(lit(1)).as("graft_shared"))
      .select(col("id_q"), col("id_c"),
        (col("graft_shared").cast("double") / col("graft_nq").cast("double")).as("containment"))
      .where(col("containment") >= threshold)
  }

  /** Containment-based decontamination: drop every `df` document that
   * CONTAINS any benchmark item at ≥ `threshold` shingle containment —
   * the fuzzy complement of [[decontaminateSpans]] (which excises exact
   * 20-word windows but passes a lightly-paraphrased quote). One anti-join
   * against the flagged ids from [[containmentJoin]]. */
  def decontaminateByContainment(
      df: DataFrame, idCol: Column, textCol: Column,
      bench: DataFrame, benchId: Column, benchTextCol: Column,
      shingleSize: Int = 5, threshold: Double = 0.8,
      maxShingleDf: Int = 0): DataFrame = {
    val hits = containmentJoin(bench, benchId, benchTextCol, df, idCol, textCol,
        shingleSize, threshold, maxShingleDf)
      .select(col("id_c"))
      .distinct()
    df.join(hits, idCol === col("id_c"), "left_anti")
  }

  /** URL-level dedup by the page's SELF-DECLARED canonical
   * ([[Text.htmlCanonical]]): AMP/print/mobile/tracking variants of one
   * article collapse to the lowest-id member of their canonical family
   * even when their renderings share no content hash. Pages without a
   * canonical fall back to their own URL (each its own family). A
   * canonical pointing OFF-SITE (its registrable domain differs from the
   * page's own) is ignored — a hostile or misconfigured page must not be
   * able to join another site's family and, by carrying a lower id,
   * evict the legitimate page from the corpus. The
   * cheapest dedup tier there is — one codegen'd parse + one keyed min +
   * a semi-join, no signatures — run it BEFORE the content tiers so they
   * never pay for variants the pages already related for us. */
  def dropCanonicalDups(
      df: DataFrame, idCol: Column, urlCol: Column, htmlCol: Column): DataFrame = {
    val keyed = df.select(idCol.as("graft_cid"),
        Text.htmlCanonical(htmlCol).as("graft_canon"), urlCol.as("graft_url"))
      .select(col("graft_cid"),
        when(col("graft_canon") =!= lit("") &&
            Text.registrableDomain(col("graft_canon")) ===
              Text.registrableDomain(col("graft_url")), col("graft_canon"))
          .otherwise(col("graft_url")).as("graft_fam"))
    val keep = keyed.groupBy(col("graft_fam"))
      .agg(min(col("graft_cid")).as("graft_keep_id"))
      .select(col("graft_keep_id"))
    df.join(keep, idCol === col("graft_keep_id"), "left_semi")
  }

  /** One candidate banding: b bands of r rows over b·r hashes, with the
   * S-curve facts an operator tunes by — the similarity where candidate
   * probability crosses 1/2 (`crossover` ≈ (1/b)^(1/r)) and the exact
   * candidate probabilities 1−(1−s^r)^b at the target threshold and ±0.1
   * around it (recall at threshold; leakage below it). */
  case class LshPlan(bands: Int, rowsPerBand: Int, crossover: Double,
      pAtThreshold: Double, pBelow: Double, pAbove: Double)

  /** Rank every valid banding of `numHashes` for a Jaccard `threshold` —
   * driver-side MATH, no data: the standard LSH S-curve analysis (Leskovec
   * et al., MMDS ch.3) that turns "which bands setting?" into a printed
   * table instead of folklore. Sorted by |crossover − threshold| (the
   * banding whose steep region sits ON the threshold first); pick the
   * first entry with acceptable pBelow (false-candidate mass) — more
   * bands = more recall AND more candidate pairs. [[evalPairs]] then
   * measures what the choice actually did. */
  def lshPlans(numHashes: Int, threshold: Double): Seq[LshPlan] = {
    require(numHashes > 0, "numHashes must be positive")
    require(threshold > 0 && threshold < 1, "threshold must be in (0,1)")
    def p(s: Double, r: Int, b: Int) = 1.0 - math.pow(1.0 - math.pow(s, r), b)
    (1 to numHashes).filter(numHashes % _ == 0).map { b =>
      val r = numHashes / b
      LshPlan(b, r, math.pow(1.0 / b, 1.0 / r),
        p(threshold, r, b),
        p(math.max(threshold - 0.1, 0.01), r, b),
        p(math.min(threshold + 0.1, 0.99), r, b))
    }.sortBy(pl => math.abs(pl.crossover - threshold))
  }

  /**
   * Precision/recall/F1 of a predicted near-dup PAIR set against labeled
   * (or exactly-computed) truth pairs — the QA harness that turns "we
   * switched simhash bands" into a measured recall delta instead of a
   * hope. Pairs are canonicalized (unordered, deduped) on both sides;
   * counts come from ONE full-outer join + one combining aggregate, and
   * the ratios are exact parts-per-million (integer division), so the
   * whole report is oracle-reproducible: (tp, fp, fn, precision_ppm,
   * recall_ppm, f1_ppm) — ppm null when the denominator is empty.
   */
  def evalPairs(
      predicted: DataFrame, predA: Column, predB: Column,
      truth: DataFrame, truthA: Column, truthB: Column): DataFrame = {
    def canon(df: DataFrame, a: Column, b: Column, flag: String): DataFrame =
      df.select(least(a, b).as("pa"), greatest(a, b).as("pb"))
        .distinct().withColumn(flag, lit(true))
    canon(predicted, predA, predB, "graft_p")
      .join(canon(truth, truthA, truthB, "graft_t"), Seq("pa", "pb"), "full_outer")
      .agg(
        count(when(col("graft_p") && col("graft_t"), 1)).as("tp"),
        count(when(col("graft_p") && col("graft_t").isNull, 1)).as("fp"),
        count(when(col("graft_p").isNull && col("graft_t"), 1)).as("fn"))
      .select(col("tp"), col("fp"), col("fn"),
        expr("tp * 1000000L div nullif(tp + fp, 0L)").as("precision_ppm"),
        expr("tp * 1000000L div nullif(tp + fn, 0L)").as("recall_ppm"),
        expr("2L * tp * 1000000L div nullif(2L * tp + fp + fn, 0L)").as("f1_ppm"))
  }

  /** SimHash near-dups: pairs with Hamming distance ≤ maxHamming, candidates
   * from 16-bit bands of the 64-bit signature. */
  def simhashNearDups(
      df: DataFrame, idCol: Column, textCol: Column,
      shingleSize: Int = 3, maxHamming: Int = 8): DataFrame = {
    val base = df.select(idCol.as("id"),
      Text.simhash(Text.shingles(textCol, shingleSize)).as("sig"))
    hammingBandPairs(base, maxHamming)
  }

  /** The 64-bit Hamming band join shared by text simhash and image pHash:
   * candidates from `nBands` equal-width band collisions (Hamming ≤
   * nBands-1 caught exactly by pigeonhole — simhash's 4×16 catches ≤ 3,
   * pHash's 8×8 catches ≤ 7), verified by bit_count over the full
   * signature. `base` is (id, sig BIGINT); returns (id_a, id_b,
   * hamming ≤ maxHamming). */
  private[pipeline] def hammingBandPairs(
      base: DataFrame, maxHamming: Int, nBands: Int = 4): DataFrame = {
    require(64 % nBands == 0, "nBands must divide 64")
    val width = 64 / nBands
    val mask = if (width == 64) -1L else (1L << width) - 1
    // explicit shuffle on the join key: the band self-join's two sides then
    // read ONE materialized exchange (the same exchange a sort-merge join
    // would demand anyway), so the corpus-wide signature pass is computed
    // exactly once in every regime — without this, a broadcast-demoted
    // join recomputes the signature subtree per side
    val bandRows = base.select(col("id"), col("sig"),
        explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .select(col("id"), col("sig"), col("band"),
        expr(s"shiftrightunsigned(sig, band * $width)").bitwiseAND(lit(mask)).as("bucket"))
      .repartition(col("band"), col("bucket"))
    val l = bandRows.as("l")
    val r = bandRows.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        bit_count(col("l.sig").bitwiseXOR(col("r.sig"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Two-table Hamming band join (query side vs a persisted signature
   * table): same banding/verify as [[hammingBandPairs]] but without the
   * self-join ordering constraint — (id_q, id_c, hamming ≤ maxHamming).
   * No explicit repartition: the query side is typically small and AQE's
   * broadcast choice is exactly right here. */
  private[pipeline] def hammingBandJoin(
      left: DataFrame, right: DataFrame, maxHamming: Int,
      nBands: Int = 4): DataFrame = {
    require(64 % nBands == 0, "nBands must divide 64")
    val width = 64 / nBands
    val mask = if (width == 64) -1L else (1L << width) - 1
    def bandRows(df: DataFrame) = df.select(col("id"), col("sig"),
        explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .select(col("id"), col("sig"), col("band"),
        expr(s"shiftrightunsigned(sig, band * $width)").bitwiseAND(lit(mask)).as("bucket"))
    val l = bandRows(left).as("l")
    val r = bandRows(right).as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket"))
      .select(col("l.id").as("id_q"), col("r.id").as("id_c"),
        bit_count(col("l.sig").bitwiseXOR(col("r.sig"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /**
   * Near-duplicate CLUSTERS via connected components over the verified pair
   * graph: iterative min-label propagation (each round every node takes the
   * minimum label among itself and its neighbours), converging in
   * O(component diameter) rounds — the standard distributed CC shape, each
   * round one join + one aggregation, no driver-side graph state. Returns
   * (id, cluster_id) for every input row; singletons cluster to themselves.
   *
   * `checkpointInterval` is accepted for source compatibility but IGNORED
   * since the r19 job-count optimization: every round's label frame now
   * localCheckpoints unconditionally (the convergence count rides that one
   * materializing action as an observed metric, so checkpointing IS the
   * round's only job — skipping rounds would re-add a probe pass, not
   * remove one).
   */
  def nearDupClusters(
      df: DataFrame, idCol: Column, textCol: Column,
      shingleSize: Int = 3, threshold: Double = 0.7,
      maxIterations: Int = 20, checkpointInterval: Int = 2,
      maxBucketSize: Int = 1000): DataFrame = {
    // exact-content pre-collapse: LSH runs over unique contents only, so a
    // million-copy boilerplate cluster contributes ONE doc to the bucket
    // join instead of an O(cluster²·bands) pair explosion; members rejoin
    // their representative through direct (member, rep) edges.
    val base = df.select(idCol.as("id"), textCol.as("text"))
      .withColumn("graft_fp", fingerprint(Seq(col("text"))))
    // (id, rep) is two longs per row — persist so the LSH pipeline (which
    // references the rep-doc subtree three times: signatures + both verify
    // joins) doesn't recompute the fingerprint groupBy per occurrence
    val membership = exactMembership(base)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the unique-content corpus backs every LSH occurrence: persist it
    // (spills to executor disk — the staging write any 100 TB dedup does)
    val repDocs = base.join(
        membership.where(col("id") === col("rep")).select(col("id").as("rep_id")),
        col("id") === col("rep_id"), "leftsemi")
      .select(col("id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = minhashNearDups(repDocs, col("id"), col("text"),
        shingleSize = shingleSize, threshold = threshold,
        maxBucketSize = maxBucketSize)
      .select(col("id_a"), col("id_b"))
    // localCheckpoint (not cache): truncates the whole LSH pipeline out of the
    // loop's lineage — every iteration otherwise embeds it twice, growing the
    // plan exponentially, and a late executor loss would recompute it all
    val edges = pairs
      .unionAll(pairs.select(col("id_b"), col("id_a")))
      .toDF("src", "dst").localCheckpoint(true)
    repDocs.unpersist()
    // label propagation runs over PAIR-GRAPH NODES ONLY — corpus rows outside
    // the near-dup graph never change label, so iterating over them is pure
    // waste (at 100 TB the pair graph is a tiny fraction of the corpus);
    // everyone else rejoins through their exact-group representative below
    // ONE eager job per round (r19 opt, was two: a cached probe pass for
    // the convergence check plus the materializing count): the changed
    // count rides the round's checkpoint as an observed metric, and every
    // round checkpoints — same truncation posture, one action
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    var converged = labels.isEmpty
    var iter = 0
    while (!converged && iter < maxIterations) {
      val neighborMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("id2")).agg(min(col("label")).as("nlabel"))
      val obs = org.apache.spark.sql.Observation()
      val nextP = labels.join(neighborMin, labels("id") === col("id2"), "left")
        .select(col("id"), col("label"),
          coalesce(col("nlabel"), col("label")).as("nl"))
        .select(col("id"), least(col("label"), col("nl")).as("label"),
          (col("nl") < col("label")).as("graft_chg"))
        .observe(obs, sum(when(col("graft_chg"), 1L).otherwise(0L)).as("graft_n"))
        .localCheckpoint(true)
      // bounded metric read (ADVICE r19): if the listener bus dropped the
      // execution-end event, recount directly off the checkpointed frame
      val changed = Observed.long(obs, "graft_n") {
        nextP.agg(coalesce(sum(when(col("graft_chg"), 1L).otherwise(0L)),
          lit(0L))).head().getLong(0)
      }
      iter += 1
      labels = nextP.select(col("id"), col("label"))
      converged = changed == 0
    }
    edges.unpersist()
    // every row's cluster: its rep's pair-graph label when the rep is in the
    // graph, otherwise the rep itself (exact groups + singletons).
    // Materialized (localCheckpoint) so every internal frame can be
    // unpersisted here instead of leaking into the caller's session.
    val out = membership
      .join(labels.withColumnRenamed("id", "graft_lbl_id"),
        col("rep") === col("graft_lbl_id"), "left")
      .select(col("id"), coalesce(col("label"), col("rep")).as("cluster_id"))
      .localCheckpoint(true)
    labels.unpersist()
    membership.unpersist()
    out
  }

  /** Curation: remove near-duplicates keeping the lowest id of each group.
   * Exact-content groups collapse to their representative first (skew-safe:
   * LSH never sees a duplicate cluster), then LSH losers among the unique
   * contents are dropped. One anti-join against the (small) drop set. */
  def dropNearDups(
      df: DataFrame, idCol: Column, textCol: Column,
      shingleSize: Int = 3, threshold: Double = 0.7,
      maxBucketSize: Int = 1000): DataFrame = {
    val base = df.select(idCol.as("id"), textCol.as("text"))
      .withColumn("graft_fp", fingerprint(Seq(col("text"))))
    val membership = exactMembership(base)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nonReps = membership.where(col("id") =!= col("rep")).select(col("id"))
    val repDocs = base.join(
        membership.where(col("id") === col("rep")).select(col("id").as("rep_id")),
        col("id") === col("rep_id"), "leftsemi")
      .select(col("id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val losers = minhashNearDups(repDocs, col("id"), col("text"),
        shingleSize = shingleSize, threshold = threshold,
        maxBucketSize = maxBucketSize)
      .select(col("id_b").as("id")).distinct()
    // materialize the (small) drop set so the persisted intermediates can be
    // released before returning; the result is a lazy anti-join against it
    val dropIds = nonReps.unionAll(losers)
      .withColumnRenamed("id", "graft_drop_id").localCheckpoint(true)
    repDocs.unpersist()
    membership.unpersist()
    df.join(dropIds, idCol === col("graft_drop_id"), "left_anti")
  }

  /**
   * PAIRWISE near-dup removal keeping the MORE COMPLETE member of each
   * verified pair: for every candidate pair with shingle-Jaccard ≥
   * `threshold`, the member with the LOWER `sizeCol` (a token/char count —
   * a truncated scrape loses to the full page) is dropped; ties go to the
   * higher id, matching [[dropNearDups]]'s keep-lowest direction. Same
   * cost shape as [[dropNearDups]] — one LSH pass plus one slim
   * (id → size) join onto the verified pairs, no connected-components
   * fixpoint; use [[dropNearDupsPreferring]] when transitive FAMILIES
   * must elect one canonical member (A~B~C with A≁C keeps only the best
   * of the family there, while the pairwise rule here can drop both B's
   * neighbors and keep B). The composed batch pipeline's near tier.
   */
  def dropNearDupsKeepLargest(
      df: DataFrame, idCol: Column, textCol: Column, sizeCol: Column,
      shingleSize: Int = 3, threshold: Double = 0.7,
      maxBucketSize: Int = 1000): DataFrame = {
    val pairs = minhashNearDups(df, idCol, textCol,
      shingleSize = shingleSize, threshold = threshold,
      maxBucketSize = maxBucketSize)
    val sizes = df.select(idCol.as("graft_sid"), sizeCol.as("graft_sz"))
    val losers = pairs
      .join(sizes.select(col("graft_sid").as("id_a"), col("graft_sz").as("graft_sz_a")), "id_a")
      .join(sizes.select(col("graft_sid").as("id_b"), col("graft_sz").as("graft_sz_b")), "id_b")
      .select(when(col("graft_sz_a") < col("graft_sz_b"), col("id_a"))
        .when(col("graft_sz_b") < col("graft_sz_a"), col("id_b"))
        .otherwise(greatest(col("id_a"), col("id_b"))).as("graft_drop_id"))
      .distinct()
    df.join(losers, idCol === col("graft_drop_id"), "left_anti")
  }

  /**
   * Near-dup removal keeping the BEST-PRIORITY member of each cluster —
   * rank-aware canonical selection: with a host-rank / trust / length
   * prior as the priority, the canonical source survives and the scraper
   * copy drops, instead of [[dropNearDups]]' lowest-id-wins (which keeps
   * whichever copy happened to be ingested first). PRIORITY CONVENTION
   * (shared with [[exactPreferring]] — ONE direction across the dedup
   * tiers): higher priority wins; ties go to the lowest id; NULL priority
   * loses to any non-null (priority must not be Long.MinValue — it is
   * negated internally).
   * Clusters come from [[nearDupClusters]] (exact pre-collapse + CC);
   * selection is ONE combining min-of-struct per cluster + one semi-join,
   * no window over the corpus.
   */
  def dropNearDupsPreferring(
      df: DataFrame, idCol: Column, textCol: Column, priorityCol: Column,
      shingleSize: Int = 3, threshold: Double = 0.7,
      maxIterations: Int = 20, maxBucketSize: Int = 1000): DataFrame = {
    val clusters = nearDupClusters(df, idCol, textCol, shingleSize, threshold,
      maxIterations, maxBucketSize = maxBucketSize)
    val prio = df.select(idCol.as("graft_jid"),
      when(priorityCol.isNull, lit(Long.MaxValue))
        .otherwise(-priorityCol.cast("long")).as("graft_negp"))
    val winners = clusters
      .join(prio, col("id") === col("graft_jid"))
      .groupBy(col("cluster_id"))
      .agg(min(struct(col("graft_negp"), col("id"))).as("graft_w"))
      .select(col("graft_w.id").as("graft_keep_id"))
    df.join(winners, idCol === col("graft_keep_id"), "left_semi")
  }

  /**
   * CLUSTER-TRUE keep-most-complete near-dedup: each connected near-dup
   * FAMILY elects its single largest member (`sizeCol` — token/char
   * count; ties go to the lowest id). The family-transitive complement
   * of the pairwise [[dropNearDupsKeepLargest]]: in a chain A~B~C with
   * A≁C, the pairwise rule's survivors depend on which pairs LSH
   * verifies (it can drop both of B's neighbours and keep mid-size B),
   * while this elects exactly one canonical member per family —
   * [[dropNearDupsPreferring]] with completeness as the priority. Costs
   * the connected-components fixpoint the pairwise tier avoids; the
   * composed batch pipeline exposes both as config
   * ([[graft.pipeline.BatchConfig]] near-tier kinds `near_keep_largest`
   * / `near_keep_largest_cc`).
   */
  def dropNearDupsKeepLargestCC(
      df: DataFrame, idCol: Column, textCol: Column, sizeCol: Column,
      shingleSize: Int = 3, threshold: Double = 0.7,
      maxIterations: Int = 20, maxBucketSize: Int = 1000): DataFrame =
    dropNearDupsPreferring(df, idCol, textCol, sizeCol,
      shingleSize, threshold, maxIterations, maxBucketSize)

  /**
   * Cross-document line deduplication (RefinedWeb/CCNet-style boilerplate
   * removal): a line occurring in at least `minDocs` DISTINCT documents is
   * dropped from EVERY document — nav menus, cookie banners, license
   * footers. Returns (id, text) with the surviving lines re-joined in their
   * original order; a document made entirely of boilerplate comes back as
   * the empty string (the row is preserved, callers gate on length). Blank
   * lines count as lines: once two documents share one, blank lines vanish
   * corpus-wide — the usual, desired behaviour for layout chrome.
   *
   * Scale: two corpus shuffles, both keyed fine-grained, NEITHER carrying
   * line text. (1) The duplicate-line census is two-phase: a hashed census
   * groups (xxhash64(line), id) — ~16 bytes per line instead of the line
   * itself, a ~10× shuffle cut on prose-length lines — and an exact verify
   * pass then re-counts ONLY the hash-flagged candidate lines by their full
   * text. Collision safety: a unique line colliding with a boilerplate
   * line's hash merely enters the candidate set, where its true per-text
   * doc count (< minDocs) keeps it — a hash collision can never drop a
   * unique line, the drop decision is always exact. The candidate set is
   * small by nature (boilerplate + ~N²/2⁶⁴ collisions), so the verify
   * census shuffles a negligible byte volume. (2) Surviving lines regroup
   * by doc id for reassembly — unavoidable for order-preserving rebuild.
   * The dup set after the >= minDocs filter is small; AQE turns the
   * anti-join into a broadcast when it fits.
   */
  def dedupLines(
      df: DataFrame, idCol: Column, textCol: Column, minDocs: Int = 2): DataFrame =
    dedupUnits(df, idCol, textCol, minDocs, "\n", "\n")

  /** [[dedupLines]] at PARAGRAPH granularity (RefinedWeb runs both): units
   * are runs split on 2+ newlines, so a cookie-consent or subscription
   * paragraph repeated across ≥ minDocs documents vanishes corpus-wide
   * while single-doc paragraphs survive. Rebuild joins with exactly one
   * blank line (3+ newline runs normalize to a paragraph break — the
   * cleanText contract). */
  def dedupParagraphs(
      df: DataFrame, idCol: Column, textCol: Column, minDocs: Int = 2): DataFrame =
    dedupUnits(df, idCol, textCol, minDocs, "\n\n+", "\n\n")

  /** WITHIN-document repeated-unit removal: a line repeated inside one page
   * (nav menus, share bars, pagination chrome stamped between sections)
   * keeps its first occurrence only. Complements the cross-document
   * [[dedupLines]]: that one needs a unit in ≥ minDocs docs, this one fires
   * on repetition inside a single doc. Pure narrow projection —
   * `array_distinct` keeps first-occurrence order, so there is NO shuffle
   * at any corpus size. */
  def dedupLinesWithinDoc(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    dedupUnitsWithinDoc(df, idCol, textCol, "\n", "\n")

  /** [[dedupLinesWithinDoc]] at paragraph granularity. */
  def dedupParagraphsWithinDoc(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    dedupUnitsWithinDoc(df, idCol, textCol, "\n\n+", "\n\n")

  /** [[dedupLines]] at SENTENCE granularity ([[Text.sentences]] units):
   * boilerplate that shares a LINE with real content ("Subscribe now! Real
   * paragraph text…") survives line- and paragraph-level dedup because the
   * full unit differs per doc — sentence units catch it. Rebuild joins the
   * surviving sentences with a single space (the segmentation consumed the
   * original separators). Same 2-phase hashed census as the line tier. */
  def dedupSentences(
      df: DataFrame, idCol: Column, textCol: Column, minDocs: Int = 2): DataFrame =
    dedupUnitsOf(df, idCol, Text.sentences(textCol), minDocs, " ")

  /** WITHIN-document repeated-sentence removal (first occurrence kept) —
   * the sentence-granularity [[dedupLinesWithinDoc]]. */
  def dedupSentencesWithinDoc(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val Bridge = org.apache.spark.sql.graft.Bridge
    df.select(idCol.as("id"),
      array_join(
        Bridge.column(FirstOccurrencesExpression(
          Bridge.expression(Text.sentences(textCol)))),
        " ").as("text"))
  }

  private def dedupUnitsWithinDoc(
      df: DataFrame, idCol: Column, textCol: Column,
      splitRe: String, joinSep: String): DataFrame = {
    val Bridge = org.apache.spark.sql.graft.Bridge
    // NOT array_distinct: that would dedup EMPTY units too, collapsing
    // every paragraph boundary after the first (split on \n leaves "" at
    // each blank line). Empty units are structure, not content — exempt.
    df.select(idCol.as("id"),
      array_join(
        Bridge.column(FirstOccurrencesExpression(
          Bridge.expression(split(textCol, splitRe)))),
        joinSep).as("text"))
  }

  private def dedupUnits(
      df: DataFrame, idCol: Column, textCol: Column, minDocs: Int,
      splitRe: String, joinSep: String): DataFrame =
    dedupUnitsOf(df, idCol, split(textCol, splitRe), minDocs, joinSep)

  /** Cross-doc unit-census dedup over an ALREADY-EXTRACTED unit array
   * column — the shared engine behind line / paragraph / sentence tiers. */
  private def dedupUnitsOf(
      df: DataFrame, idCol: Column, unitsCol: Column, minDocs: Int,
      joinSep: String): DataFrame = {
    require(minDocs >= 2, "minDocs must be at least 2 — 1 would drop every line")
    val lines = df.select(idCol.as("id"), unitsCol.as("graft_units"))
      .select(col("id"), posexplode(col("graft_units")).as(Seq("graft_pos", "graft_line")))
    // phase 1: hashed census — the corpus-wide shuffle carries (hash, id)
    val flaggedHashes = lines
      .select(xxhash64(col("graft_line")).as("graft_lh"), col("id"))
      .groupBy(col("graft_lh"))
      .agg(countDistinct(col("id")).as("graft_hdocs"))
      .where(col("graft_hdocs") >= minDocs)
      .select(col("graft_lh"))
    // phase 2: exact verify over hash-flagged candidates only (semi-join is
    // a broadcast — the flagged-hash set is small); grouping by the line
    // TEXT makes the final >= minDocs decision collision-proof
    val dups = lines
      .join(flaggedHashes, xxhash64(col("graft_line")) === col("graft_lh"), "leftsemi")
      .groupBy(col("graft_line"))
      .agg(countDistinct(col("id")).as("graft_docs"))
      .where(col("graft_docs") >= minDocs)
      .select(col("graft_line"))
    val rebuilt = lines.join(dups, Seq("graft_line"), "left_anti")
      .groupBy(col("id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("graft_pos"), col("graft_line")))),
          s => s("graft_line")),
        joinSep).as("graft_clean"))
    df.select(idCol.as("id")).join(rebuilt, Seq("id"), "left")
      .select(col("id"), coalesce(col("graft_clean"), lit("")).as("text"))
  }

  /** Exact n-gram Jaccard for a pair frame carrying two text columns. */
  def ngramJaccard(textA: Column, textB: Column, n: Int = 3): Column = {
    val a = Text.shingles(textA, n)
    val b = Text.shingles(textB, n)
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")
  }

  /**
   * Exact-substring span deduplication (the distributed shape of Lee et al.
   * 2021, "Deduplicating Training Data Makes Language Models Better"):
   * every `windowWords`-word window whose content occurs more than once in
   * the corpus — across documents or within one — keeps only its FIRST
   * occurrence (minimum (id, position)); all other occurrences are removed
   * from their documents, with overlapping flagged windows merging into one
   * span. Text is canonicalized to single-space word joins (the window
   * grammar requires it); returns (id, text, n_words, n_removed) for every
   * input row, untouched docs included.
   *
   * Scale design: windows are keyed by a 64-bit xxhash of the window
   * content, so the corpus-wide shuffle carries (id, pos, hash) — ~16 bytes
   * per word, never the window text (which would inflate the shuffle by
   * `windowWords`×). First-occurrence ranking is a mergeable
   * `min(struct(id,pos))` aggregate (map-side partials — a hyper-duplicated
   * boilerplate window never becomes a hot reducer key) followed by a
   * join-back against the duplicated hashes only. Flagged positions regroup by
   * doc (second shuffle, O(duplicated windows) rows) and a codegen'd
   * single-pass expression merges spans and rebuilds the text. Hash
   * collisions conflating distinct windows are possible in principle
   * (~N²/2⁶⁵) and accepted; the DuckDB oracle groups by the window string
   * itself, so a collision would surface as a correctness mismatch.
   */
  def dedupSpans(
      df: DataFrame, idCol: Column, textCol: Column, windowWords: Int = 20): DataFrame = {
    require(windowWords >= 2, "windowWords must be at least 2")
    val w = windowWords
    // null text behaves like empty (same contract as dedupLines's "")
    val base = df.select(idCol.as("id"),
      coalesce(Text.words(textCol),
        array().cast("array<string>")).as("graft_ws"))
    // window hashing is ONE codegen'd O(words) rolling pass per doc — the
    // transform(sequence(...)) + concat_ws + xxhash64 formulation it
    // replaced cost O(words × windowWords) byte work per doc in an
    // interpreted HOF tree. Hash identity is internal-only (equal windows
    // collide by construction, distinct windows at ~2⁻⁶⁴; the oracle groups
    // by the window STRING, so any collision surfaces as a mismatch).
    val Bridge0 = org.apache.spark.sql.graft.Bridge
    val wins = base
      .where(size(col("graft_ws")) >= w)
      .select(col("id"), posexplode(Bridge0.column(WindowHashesExpression(
        Bridge0.expression(col("graft_ws")), w))).as(Seq("pos", "h")))
    // first-occurrence ranking is a MERGEABLE aggregate, never a window: a
    // row_number over partitionBy(h) funnels every occurrence of one window
    // content through a single task — web-corpus boilerplate puts 10⁷+ rows
    // on one hash. min(struct(id,pos)) builds map-side partials instead
    // (struct ordering is lexicographic, so the minimum IS the (id, pos)
    // first occurrence); only hashes seen more than once survive to the
    // join-back, so the build side is O(distinct duplicated windows) — AQE
    // broadcasts it — and flagged rows are every occurrence except the min.
    val firsts = wins.groupBy(col("h"))
      .agg(min(struct(col("id"), col("pos"))).as("graft_first"),
        count(lit(1)).as("graft_cnt"))
      .where(col("graft_cnt") > 1L)
      .select(col("h"), col("graft_first"))
    val flagged = wins.join(firsts, Seq("h"))
      .where(struct(col("id"), col("pos")) =!= col("graft_first"))
    val spans = flagged.groupBy(col("id"))
      .agg(sort_array(collect_list(col("pos"))).as("graft_starts"))
    rebuildWithoutSpans(base, spans, w)
  }

  /**
   * The audit artifact Lee et al.-style span-dedup pipelines print
   * (VERDICT r15 next-round #9): the MERGED duplicated-span LENGTH
   * distribution per group — how long are the corpus's verbatim
   * duplicated regions and which domains carry them. [[dedupSpans]]
   * removes fixed `windowWords`-word windows; this reports the length of
   * each maximal run of overlapping/adjacent flagged windows (the true
   * duplicated-region length in words) for every non-first occurrence,
   * as (group, span_words, n_spans).
   *
   * Scale: identical flag side to [[dedupSpans]] (rolling window hashes,
   * mergeable min(struct) first-occurrence ranking, join-back against
   * duplicated hashes only), then the merge is a per-doc fold over the
   * SORTED flagged positions — O(duplicated windows) rows, never the
   * corpus — and one small (group, length) count.
   */
  def spanLengthReport(
      df: DataFrame, idCol: Column, textCol: Column, groupCol: Column,
      windowWords: Int = 20): DataFrame = {
    require(windowWords >= 2, "windowWords must be at least 2")
    val w = windowWords
    val Bridge0 = org.apache.spark.sql.graft.Bridge
    val base = df.select(idCol.as("id"), groupCol.as("graft_grp"),
      coalesce(Text.words(textCol), array().cast("array<string>")).as("graft_ws"))
    val wins = base
      .where(size(col("graft_ws")) >= w)
      .select(col("id"), col("graft_grp"),
        posexplode(Bridge0.column(WindowHashesExpression(
          Bridge0.expression(col("graft_ws")), w))).as(Seq("pos", "h")))
    val firsts = wins.groupBy(col("h"))
      .agg(min(struct(col("id"), col("pos"))).as("graft_first"),
        count(lit(1)).as("graft_cnt"))
      .where(col("graft_cnt") > 1L)
      .select(col("h"), col("graft_first"))
    val flagged = wins.join(firsts, Seq("h"))
      .where(struct(col("id"), col("pos")) =!= col("graft_first"))
    val spans = flagged.groupBy(col("id"), col("graft_grp"))
      .agg(sort_array(collect_list(col("pos"))).as("graft_starts"))
    // gaps-and-islands fold over the sorted starts: windows at p cover
    // [p, p+w); overlapping OR adjacent (p <= end) extend the open span
    def s(acc: Column) = acc.getField("s")
    def e(acc: Column) = acc.getField("e")
    def ls(acc: Column) = acc.getField("ls")
    val merged = spans.select(col("graft_grp"),
      explode(aggregate(
        col("graft_starts"),
        struct(lit(-1).as("s"), lit(-1).as("e"),
          array().cast("array<int>").as("ls")),
        (acc, p) => when(s(acc) === -1,
            struct(p.as("s"), (p + w).as("e"), ls(acc).as("ls")))
          .when(p <= e(acc),
            struct(s(acc).as("s"), greatest(e(acc), p + w).as("e"), ls(acc).as("ls")))
          .otherwise(struct(p.as("s"), (p + w).as("e"),
            concat(ls(acc), array(e(acc) - s(acc))).as("ls"))),
        acc => when(s(acc) === -1, ls(acc))
          .otherwise(concat(ls(acc), array(e(acc) - s(acc))))
      )).as("span_words"))
    merged.groupBy(col("graft_grp"), col("span_words"))
      .agg(count(lit(1)).as("n_spans"))
      .withColumnRenamed("graft_grp", "group")
  }

  /**
   * Exact-substring DECONTAMINATION with removal (the cross-set face of
   * [[dedupSpans]], per Lee et al. 2021's eval-hygiene use): every
   * `windowWords`-word window of a corpus document that appears VERBATIM
   * anywhere in the benchmark set is removed (overlapping matches merge
   * into spans), and the document rebuilds around the holes — n-gram
   * counting ([[Curation.decontaminate]]) flags leaks, this one excises
   * them. Returns (id, text, n_words, n_removed).
   *
   * Scale: corpus windows are the same O(words) codegen'd rolling-hash
   * pass as dedupSpans; the benchmark's distinct window hashes (bench sets
   * are small) broadcast into a semi-join, so the corpus never shuffles
   * its text — only flagged (id, pos) rows regroup for the rebuild. Hash
   * identity is internal-only; at 2⁻⁶⁴ a collision could excise an
   * innocent window (the oracle matches window STRINGS, so any collision
   * surfaces as a hash mismatch there).
   */
  def decontaminateSpans(
      df: DataFrame, idCol: Column, textCol: Column,
      bench: DataFrame, benchTextCol: Column, windowWords: Int = 20): DataFrame = {
    require(windowWords >= 2, "windowWords must be at least 2")
    val w = windowWords
    val Bridge0 = org.apache.spark.sql.graft.Bridge
    val base = df.select(idCol.as("id"),
      coalesce(Text.words(textCol),
        array().cast("array<string>")).as("graft_ws"))
    val wins = base
      .where(size(col("graft_ws")) >= w)
      .select(col("id"), posexplode(Bridge0.column(WindowHashesExpression(
        Bridge0.expression(col("graft_ws")), w))).as(Seq("pos", "h")))
    val benchH = bench
      .select(coalesce(Text.words(benchTextCol),
        array().cast("array<string>")).as("graft_ws"))
      .where(size(col("graft_ws")) >= w)
      .select(explode(Bridge0.column(WindowHashesExpression(
        Bridge0.expression(col("graft_ws")), w))).as("h"))
      .distinct()
    val flagged = wins.join(broadcast(benchH), Seq("h"), "leftsemi")
    val spans = flagged.groupBy(col("id"))
      .agg(sort_array(collect_list(col("pos"))).as("graft_starts"))
    rebuildWithoutSpans(base, spans, w)
  }

  /** Shared rebuild tail: remove the merged w-word spans at the flagged
   * starts from each doc's word array in one codegen pass. */
  private def rebuildWithoutSpans(
      base: DataFrame, spans: DataFrame, w: Int): DataFrame = {
    val Bridge = org.apache.spark.sql.graft.Bridge
    base.join(spans, Seq("id"), "left")
      .select(col("id"),
        Bridge.column(RemoveWordSpansExpression(
          Bridge.expression(col("graft_ws")),
          Bridge.expression(coalesce(col("graft_starts"), array().cast("array<int>"))),
          w)).as("graft_out"))
      .select(col("id"), col("graft_out.text").as("text"),
        col("graft_out.n_words").as("n_words"),
        col("graft_out.n_removed").as("n_removed"))
  }
}

/** Single-pass span merge + text rebuild for [[Dedup.dedupSpans]]: walks the
 * word array once with a pointer into the SORTED flagged starts, tracking the
 * running cover end — O(words + spans), no interval list materialized. */
object SpanAlgos {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.unsafe.types.UTF8String

  /** All w-word window hashes of a word array in one O(words) pass:
   * per-word 64-bit hashes combined by a position-weighted polynomial
   * rolling hash (odd multiplier, 2⁶⁴ wraparound), each window value run
   * through a bijective SplitMix finisher so downstream groupBy keys
   * distribute well. Equal windows hash equal by construction; distinct
   * windows collide at ~2⁻⁶⁴ per pair — internal-only identity, the same
   * contract as the string-concat xxhash it replaced. */
  def windowHashes(ws: ArrayData, w: Int): ArrayData = {
    val n = ws.numElements()
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val wh = new Array[Long](n)
    var i = 0
    while (i < n) { wh(i) = TextHash.hash64(ws.getUTF8String(i), 0x5eedL); i += 1 }
    val R = 0x100000001b3L // odd multiplier (FNV prime)
    var rw = 1L // R^(w-1) for the rolling eviction
    var j = 0
    while (j < w - 1) { rw *= R; j += 1 }
    val out = new Array[Long](n - w + 1)
    var h = 0L
    i = 0
    while (i < w) { h = h * R + wh(i); i += 1 }
    out(0) = mix(h)
    var pos = 1
    while (pos <= n - w) {
      h = (h - wh(pos - 1) * rw) * R + wh(pos + w - 1)
      out(pos) = mix(h)
      pos += 1
    }
    new GenericArrayData(out)
  }

  /** SplitMix64 finisher — bijective, so it preserves hash equality. */
  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def removeSpans(ws: ArrayData, starts: ArrayData, w: Int): InternalRow = {
    val n = ws.numElements()
    val m = starts.numElements()
    val sb = new java.lang.StringBuilder()
    var removed = 0
    var ptr = 0
    var coverEnd = -1
    var i = 0
    while (i < n) {
      while (ptr < m && starts.getInt(ptr) <= i) {
        val e = starts.getInt(ptr) + w
        if (e > coverEnd) coverEnd = e
        ptr += 1
      }
      if (i < coverEnd) removed += 1
      else {
        if (sb.length > 0) sb.append(' ')
        sb.append(ws.getUTF8String(i).toString)
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](UTF8String.fromString(sb.toString), n, removed))
  }
}

/** All w-word window hashes (array<long>) of a word array.
 * Codegen: one static call per row, O(words) total. */
case class WindowHashesExpression(
    child: org.apache.spark.sql.catalyst.expressions.Expression, windowWords: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    SpanAlgos.windowHashes(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], windowWords)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.SpanAlgos.windowHashes($c, $windowWords);")
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
}

/** struct<text, n_words, n_removed> of the span-cleaned word array.
 * Codegen: one static call per row. */
case class RemoveWordSpansExpression(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression,
    windowWords: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types._
  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_removed", IntegerType, nullable = false)))
  override def nullSafeEval(ws: Any, st: Any): Any =
    SpanAlgos.removeSpans(
      ws.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      st.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], windowWords)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.pipeline.SpanAlgos.removeSpans($a, $b, $windowWords);")
  override protected def withNewChildrenInternal(
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression) = copy(left = l, right = r)
}

/** First occurrence of each NON-EMPTY unit, order preserved, empty units
 * kept verbatim (they are structure — blank lines between paragraphs —
 * not repeatable content). O(units) with a per-row seen-set; codegen:
 * one static call. */
case class FirstOccurrencesExpression(
    child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullSafeEval(v: Any): Any =
    DedupAlgos.firstOccurrences(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.DedupAlgos.firstOccurrences($c);")
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
}

object DedupAlgos {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.unsafe.types.UTF8String

  def firstOccurrences(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val seen = new java.util.HashSet[UTF8String]()
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) out.add(null)
      else {
        val s = arr.getUTF8String(i)
        if (s.numBytes() == 0) out.add(s)          // empties always kept
        else if (seen.add(s.clone())) out.add(s)   // first occurrence only
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
