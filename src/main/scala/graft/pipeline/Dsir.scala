package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * DSIR-style targeted data selection (Data Selection via Importance
 * Resampling, Xie et al. 2023 — public knowledge): score every raw-corpus
 * document by how much its hashed n-gram distribution looks like a TARGET
 * corpus (e.g. wiki/books) versus the raw crawl, then resample the corpus
 * proportionally. The importance weight of a document is
 *
 *   w(d) = Σ_{feature f ∈ d}  ln( p_target(f) / p_raw(f) )
 *
 * over hashed unigram+bigram features with add-k smoothing on both sides —
 * the bag-of-hashed-ngrams log-likelihood ratio the paper uses.
 *
 * Scale design (100 TB): the model is ONE aggregate per corpus — bucket
 * counts over exploded hashed n-grams (map-side partial combine, shuffle
 * keyed on the bucket, ≤ nBuckets rows out). Scoring explodes each doc's
 * n-grams, joins the nBuckets-row log-ratio table (always a broadcast) and
 * sums per doc — one shuffle keyed on the doc id. Nothing driver-side
 * scales with the corpus; the target corpus is typically tiny next to the
 * raw crawl and never joins against it directly.
 *
 * Exactness contract (the [[Lm]] pattern): per-bucket log-ratios are
 * deterministic doubles rounded once to integer micro-units
 * (round(ln·10⁶) as long); per-doc weights are then exact integer sums —
 * order-independent and engine-portable, so the DuckDB oracle hash-matches
 * (a raw double sum would differ in the last ulps with partition order).
 */
object Dsir {

  /** The trained selector: (bucket, llr_e6) for every bucket in [0, nBuckets)
   * — llr_e6 = round(1e6 · ln(p_target/p_raw)) — plus the params that shaped
   * it. ≤ nBuckets rows, broadcast at every use. */
  case class DsirModel(llr: DataFrame, nBuckets: Int, k: Double)

  /** Hashed unigram + bigram features of one text column, as an array of
   * bucket ids in [0, nBuckets). The md5-first-8-hex bucket recipe is
   * [[Curation.hashBucketN]] — the single definition the oracles mirror. */
  private[pipeline] def featureBuckets(text: Column, nBuckets: Int): Column = {
    val ws = Text.words(text, lowercase = true)
    val bis = when(size(ws) >= 2,
      zip_with(
        slice(ws, lit(1), size(ws) - 1),
        slice(ws, lit(2), size(ws) - 1),
        (a, b) => concat(a, lit(" "), b))).otherwise(array())
    transform(concat(ws, bis), f => Curation.hashBucketN(f, nBuckets))
  }

  /**
   * Train the selector: bucket-count both corpora, smooth, take the
   * per-bucket log ratio. Two aggregates (one per corpus) + one join of two
   * ≤ nBuckets-row frames against the bucket spine — nothing else.
   */
  def train(
      raw: DataFrame, rawText: Column,
      target: DataFrame, targetText: Column,
      nBuckets: Int = 4096, k: Double = 1.0): DsirModel = {
    require(nBuckets > 0, "nBuckets must be positive")
    val spark = raw.sparkSession

    // each count frame is consumed twice (the llr join + its own total);
    // persisting the ≤ nBuckets-row aggregates keeps each corpus's explode
    // pass single instead of once per consumer
    def bucketCounts(df: DataFrame, text: Column): DataFrame =
      df.select(explode(featureBuckets(text, nBuckets)).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val rawC = bucketCounts(raw, rawText)
    val tgtC = bucketCounts(target, targetText)
    // bucket spine: scored docs may hit buckets unseen in either corpus;
    // those get the pure smoothing ratio instead of falling out of the join
    val spine = spark.range(nBuckets).select(col("id").as("bucket"))
    val joined = spine
      .join(rawC.withColumnRenamed("c", "graft_cr"), Seq("bucket"), "left")
      .join(tgtC.withColumnRenamed("c", "graft_ct"), Seq("bucket"), "left")
      .crossJoin(broadcast(rawC.agg(sum(col("c")).as("graft_nr"))))
      .crossJoin(broadcast(tgtC.agg(sum(col("c")).as("graft_nt"))))
    // fixed operation order, mirrored token-for-token by the DuckDB oracle
    val pT = (coalesce(col("graft_ct"), lit(0L)).cast("double") + lit(k)) /
      (col("graft_nt").cast("double") + lit(k) * nBuckets)
    val pR = (coalesce(col("graft_cr"), lit(0L)).cast("double") + lit(k)) /
      (col("graft_nr").cast("double") + lit(k) * nBuckets)
    // the model is re-broadcast by every weight() call — persist the
    // ≤ nBuckets-row table (lazily: caches fill on first use, so training
    // stays one pipelined job instead of serialized materialization jobs)
    val llr = joined.select(col("bucket"),
      round(log(pT / pR) * lit(1e6)).cast("long").as("llr_e6"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    DsirModel(llr, nBuckets, k)
  }

  /**
   * Importance weights: (id, n_feats, weight_e6) per document, where
   * weight_e6 is the exact long sum of the per-feature micro-unit
   * log-ratios and n_feats the feature count (weight_e6 / n_feats / 1e6 is
   * the length-normalized mean some selection recipes prefer). Featureless
   * docs (empty/whitespace text) score (0, 0).
   */
  def weight(
      model: DsirModel, df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val ids = df.select(idCol.as("id"))
    val scored = df
      .select(idCol.as("id"), explode(featureBuckets(textCol, model.nBuckets)).as("bucket"))
      .join(broadcast(model.llr), Seq("bucket"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("llr_e6")).as("weight_e6"))
    ids.join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("weight_e6"), lit(0L)).as("weight_e6"))
  }

  /**
   * Gumbel-top-n importance resampling (the paper's sampling-without-
   * replacement step): keep the n docs with the largest
   * weight/τ + Gumbel(content-hash) — equivalent to sampling n docs
   * without replacement with probability ∝ exp(weight/τ). The noise is
   * content-addressed ([[Curation.hashFraction]] of the id), so the sample
   * is deterministic across runs and engines. One TakeOrderedAndProject —
   * no global sort, driver holds n rows only.
   */
  def resample(
      weighted: DataFrame, n: Int, temperature: Double = 1.0): DataFrame = {
    require(n > 0, "n must be positive")
    require(temperature > 0, "temperature must be positive")
    val u = Curation.hashFraction(concat(col("id").cast("string"), lit("#gumbel")))
    // u ∈ [0,1): -ln(-ln(u)) is infinite only at u=0, which the 2^-32
    // fraction grid hits with probability 2^-32; clamp for safety
    val gumbel = -log(-log(greatest(u, lit(1e-12))))
    weighted
      .withColumn("graft_key",
        col("weight_e6").cast("double") / lit(1e6) / lit(temperature) + gumbel)
      .orderBy(col("graft_key").desc, col("id"))
      .limit(n)
      .drop("graft_key")
  }
}
