package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
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
  case class DsirModel(llr: DataFrame, nBuckets: Int, k: Double) {
    /** Releases the persisted llr table — the model's ONLY pinned cache
     * ([[train]] materializes llr eagerly and releases its staging
     * bucket-count caches before returning). Long-lived drivers training
     * many models call this when a model retires; weight() after release
     * stays correct, just recomputes. */
    def release(): Unit = llr.unpersist(blocking = false)
  }

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
    // ≤ nBuckets-row table and materialize it NOW so the staging
    // bucket-count caches can be released before train returns (r15: the
    // cache-residue sweep found three pinned entries per model; now it is
    // ONE, owned by the model and released via [[DsirModel.release]])
    val llr = joined.select(col("bucket"),
      round(log(pT / pR) * lit(1e6)).cast("long").as("llr_e6"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    llr.count()
    rawC.unpersist(blocking = false)
    tgtC.unpersist(blocking = false)
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
   * The collected model: llr_e6 by bucket index — nBuckets longs (32 KB at
   * the 4096 default), bounded driver state that rides along executors as
   * a codegen reference object (the CentroidMatrix pattern).
   */
  def collectModel(model: DsirModel): DsirArrayModel = {
    val arr = new Array[Long](model.nBuckets)
    model.llr.collect().foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    DsirArrayModel(arr)
  }

  /**
   * Stateless per-row scoring against a collected model: ONE codegen'd
   * projection emitting struct(n_feats, weight_e6) — no explode, no join,
   * no shuffle, so it drops into a streaming gate or fuses into any batch
   * projection. Bit-identical to [[weight]] (same md5 bucket recipe, same
   * exact integer sum; spec-pinned), just with the nBuckets-row table held
   * as an array instead of joined as a frame. Use [[weight]] only when
   * nBuckets is too large to collect — at the paper's 10⁴–10⁵ buckets,
   * this path is always right.
   */
  def weightColumn(text: Column, model: DsirArrayModel): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(DsirWeightExpression(Bridge.expression(text), model))
  }

  /** [[weight]] via the collected-model projection: same output contract
   * (id, n_feats, weight_e6), zero shuffle. */
  def weightInline(
      model: DsirArrayModel, df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.select(idCol.as("id"), weightColumn(textCol, model).as("graft_w"))
      // NULL text -> NULL struct from the null-safe expression; the join
      // path scores those rows (0, 0) - coalesce keeps the contract
      // bit-identical across both paths
      .select(col("id"),
        coalesce(col("graft_w.n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("graft_w.weight_e6"), lit(0L)).as("weight_e6"))

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

/** Collected DSIR model: llr_e6 indexed by bucket (length = nBuckets). */
case class DsirArrayModel(llrE6: Array[Long]) {
  def nBuckets: Int = llrE6.length
}

object DsirAlgos {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray

  /** EXACTLY Curation.hashBucketN: md5 of the UTF-8 bytes, first 8 hex
   * chars as a long, mod nBuckets. */
  private def bucket(bytes: Array[Byte], off: Int, len: Int, n: Int): Int = {
    val d = md5.get()
    d.reset()
    d.update(bytes, off, len)
    val h = d.digest()
    // first 8 hex chars = first 4 bytes, parsed big-endian as unsigned
    var v = 0L
    var i = 0
    while (i < 4) { v = (v << 8) | (h(i) & 0xFFL); i += 1 }
    (v % n).toInt
  }

  /** struct(n_feats, weight_e6) over hashed unigrams + space-joined
   * bigrams of the lowercased whitespace words — bit-identical to the
   * distributed weight() join path. */
  def score(
      text: org.apache.spark.unsafe.types.UTF8String,
      m: DsirArrayModel): InternalRow = {
    val ws = TextAlgos.splitWords(text, lowercase = true)
    val nW = ws.numElements()
    var nFeats = 0L
    var weight = 0L
    var i = 0
    while (i < nW) {
      val b = ws.getUTF8String(i).getBytes
      weight += m.llrE6(bucket(b, 0, b.length, m.nBuckets))
      nFeats += 1L
      if (i + 1 < nW) {
        val b2 = ws.getUTF8String(i + 1).getBytes
        val joined = new Array[Byte](b.length + 1 + b2.length)
        System.arraycopy(b, 0, joined, 0, b.length)
        joined(b.length) = ' '
        System.arraycopy(b2, 0, joined, b.length + 1, b2.length)
        weight += m.llrE6(bucket(joined, 0, joined.length, m.nBuckets))
        nFeats += 1L
      }
      i += 1
    }
    InternalRow(nFeats, weight)
  }
}

/** Stateless DSIR weight of one text against a collected model — one
 * codegen'd static call per row. */
case class DsirWeightExpression(child: Expression, m: DsirArrayModel)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_feats", LongType, nullable = false),
    StructField("weight_e6", LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    DsirAlgos.score(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], m)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val mRef = ctx.addReferenceObj("graftDsirModel", m, "graft.pipeline.DsirArrayModel")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.DsirAlgos.score($c, $mRef);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
