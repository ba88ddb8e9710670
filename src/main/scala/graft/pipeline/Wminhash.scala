package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/**
 * Weighted-Jaccard near-duplicate detection via Improved Consistent
 * Weighted Sampling (Ioffe 2010, "Improved Consistent Sampling, Weighted
 * Minhash and L1 Sketching"). Plain minhash treats a document as a token
 * SET — a page that repeats one boilerplate sentence 100 times and a page
 * that says it once are identical to it. ICWS sketches the token
 * MULTISET: two docs collide on a signature slot with probability exactly
 * their weighted Jaccard J_w = Σ_t min(a_t, b_t) / Σ_t max(a_t, b_t)
 * over term frequencies, so repetition-heavy near-dups collapse and
 * distribution-different docs don't.
 *
 * Per (token, slot) the ICWS sample derives Gamma(2,1) variates r, c and
 * a Uniform β from five SplitMix64-remixed uniforms of the token's
 * 64-bit hash — deterministic across partitions and engines, no RNG
 * state. With weight w: t_k = ⌊ln w / r + β⌋, ln y = r(t_k − β),
 * ln a = ln c − ln y − r; the slot keeps the token minimizing ln a and
 * emits hash(token, t_k) as one 64-bit signature element, so banding and
 * bucket joins reuse the exact minhash machinery shape.
 *
 * Scale: one codegen'd signature pass per doc (O(distinct tokens ×
 * numHashes) flops, no shuffle), banded (band, bucket) self-join for
 * candidates, exact weighted-Jaccard verification on candidate pairs
 * only — the [[Dedup.minhashNearDups]] posture with tf semantics.
 */
object Wminhash {

  /** ICWS signature of a word array (repeats = weights): array<long>,
   * slot i equal across docs with P = weighted Jaccard. */
  def icwsSignature(words: Column, numHashes: Int = 64): Column =
    Bridge.column(IcwsSignatureExpression(Bridge.expression(words), numHashes))

  /** Exact weighted (multiset) Jaccard of two word arrays:
   * Σ min(tf) / Σ max(tf); 1.0 when both are empty. */
  def weightedJaccard(wordsA: Column, wordsB: Column): Column =
    Bridge.column(WeightedJaccardExpression(
      Bridge.expression(wordsA), Bridge.expression(wordsB)))

  /**
   * All pairs (id_a < id_b) whose exact weighted Jaccard over the doc's
   * token MULTISET meets `threshold`: (id_a, id_b, w_jaccard). The
   * universe is word n-gram shingles WITH repeats (`shingleSize`, default
   * 3; pass 0 for bare word frequencies). Shingle multisets are the
   * production default for the same reason the set-minhash tier uses
   * them: bare word-tf similarity between UNRELATED same-domain docs is
   * routinely 0.5+, which floods any banding with candidates (measured:
   * 11.9M candidate pairs on a 5.5k-doc corpus at sf0.1 word-level vs
   * only true near-dups shingle-level) — shingles keep the multiset
   * semantics while collapsing the organic-overlap mass.
   *
   * Candidates from ICWS banding (recall 1−(1−t^r)^b per pair — size
   * numHashes/bands so the S-curve clears your threshold), verification
   * exact, so false candidates never leak. `maxBucketSize` caps
   * degenerate buckets exactly like [[Dedup.minhashNearDups]] (opt-in
   * recall trade; collapse exact dups first).
   */
  def weightedNearDups(
      df: DataFrame, idCol: Column, textCol: Column,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, maxBucketSize: Int = 0): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val rowsPerBand = numHashes / bands
    def toks(c: Column): Column =
      if (shingleSize <= 1) Text.words(c, lowercase = true)
      else Text.shinglesMultiset(c, shingleSize)
    val docs = df.select(idCol.as("id"), textCol.as("text"))
    // the emptiness guard runs on the cheap word split BEFORE the signature
    // projection — filtering on size(sig) AFTER it pushes the predicate
    // below the project and evaluates the whole ICWS pass twice per row
    // (the same double-eval trap the pHash decode guards fixed)
    val bandRows = docs
      .where(size(Text.words(col("text"), lowercase = true)) >=
        math.max(1, shingleSize))
      .select(col("id"), icwsSignature(toks(col("text")), numHashes).as("sig"))
      .select(col("id"), explode(sequence(lit(0), lit(bands - 1))).as("band"), col("sig"))
      .select(col("id"), col("band"),
        xxhash64(col("band"),
          slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))).as("bucket"))
      .repartition(col("band"), col("bucket"))
    val capped =
      if (maxBucketSize <= 0) bandRows
      else bandRows.join(
        bandRows.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("graft_bsz"))
          .where(col("graft_bsz") <= maxBucketSize)
          .select(col("band"), col("bucket")),
        Seq("band", "bucket"), "leftsemi")
    val candidates = capped.as("l").join(capped.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    candidates
      .join(docs.select(col("id").as("id_a"), col("text").as("text_a")), "id_a")
      .join(docs.select(col("id").as("id_b"), col("text").as("text_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        weightedJaccard(toks(col("text_a")), toks(col("text_b"))).as("w_jaccard"))
      .where(col("w_jaccard") >= threshold)
  }
  /**
   * Curation face of the weighted tier: drop every doc that is a weighted
   * near-dup of a lower-id doc, transitive families included — pairs from
   * [[weightedNearDups]] collapse through the checkpointed min-label
   * components of [[Graphs.connectedComponents]], each family keeps its
   * minimum id. Returns the surviving (id, text) rows.
   */
  def dropWeightedNearDups(
      df: DataFrame, idCol: Column, textCol: Column,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, maxBucketSize: Int = 0): DataFrame = {
    val docs = df.select(idCol.as("id"), textCol.as("text"))
    val pairs = weightedNearDups(df, idCol, textCol,
      shingleSize, numHashes, bands, threshold, maxBucketSize)
    val comp = Graphs.connectedComponents(pairs, col("id_a"), col("id_b"))
    val keepers = comp.groupBy(col("component"))
      .agg(min(col("id")).as("graft_keep"))
      .select(col("graft_keep").as("id"))
    val inPairs = comp.select(col("id"))
    docs.join(inPairs, Seq("id"), "left_anti") // untouched docs survive
      .unionAll(docs.join(keepers, Seq("id"), "leftsemi"))
  }
}

object WminhashAlgos {
  private final val TwoToMinus53 = 1.0 / (1L << 53).toDouble

  @inline private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 53-bit uniform in (0, 1) — the +0.5 keeps ln() finite. */
  @inline private def toU(h: Long): Double = ((h >>> 11) + 0.5) * TwoToMinus53

  /** ICWS signature of a word multiset. Empty input → empty signature. */
  def icwsSignature(words: ArrayData, numHashes: Int): ArrayData = {
    val n = words.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val tf = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Int](n * 2)
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i); tf.put(w, tf.getOrDefault(w, 0) + 1)
      i += 1
    }
    val sig = new Array[Long](numHashes)
    val bestLnA = Array.fill(numHashes)(Double.PositiveInfinity)
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val th = TextHash.hash64(e.getKey, 0L)
      val lnW = math.log(e.getValue.toDouble)
      var j = 0
      while (j < numHashes) {
        val base = th ^ (j.toLong * 0x2545f4914f6cdd1dL)
        val r = -math.log(toU(mix(base)) * toU(mix(base + 1)))
        val c = -math.log(toU(mix(base + 2)) * toU(mix(base + 3)))
        val beta = toU(mix(base + 4))
        val tk = math.floor(lnW / r + beta)
        val lnY = r * (tk - beta)
        val lnA = math.log(c) - lnY - r
        if (lnA < bestLnA(j) || (lnA == bestLnA(j) && mix(th + tk.toLong) < sig(j))) {
          bestLnA(j) = lnA
          sig(j) = mix(th + tk.toLong)
        }
        j += 1
      }
    }
    new GenericArrayData(sig)
  }

  /** Exact multiset Jaccard: Σ min(tf) / Σ max(tf); 1.0 for two empties.
   * Computed as smin / (|a| + |b| − smin) over long sums, the same integer
   * arithmetic an external oracle uses, so doubles match bit for bit. */
  def weightedJaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 1.0
    if (na == 0 || nb == 0) return 0.0
    val tfa = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Int](na * 2)
    var i = 0
    while (i < na) { val w = a.getUTF8String(i); tfa.put(w, tfa.getOrDefault(w, 0) + 1); i += 1 }
    var smin = 0L
    val tfb = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Int](nb * 2)
    i = 0
    while (i < nb) { val w = b.getUTF8String(i); tfb.put(w, tfb.getOrDefault(w, 0) + 1); i += 1 }
    val it = tfb.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val ca = tfa.getOrDefault(e.getKey, 0)
      smin += math.min(ca, e.getValue).toLong
    }
    smin.toDouble / (na.toLong + nb.toLong - smin).toDouble
  }
}

/** ICWS signature (see WminhashAlgos). Codegen: one static call. */
case class IcwsSignatureExpression(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    WminhashAlgos.icwsSignature(v.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.WminhashAlgos.icwsSignature($c, $numHashes);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Exact weighted Jaccard (see WminhashAlgos). Codegen: one static call. */
case class WeightedJaccardExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    WminhashAlgos.weightedJaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.pipeline.WminhashAlgos.weightedJaccard($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
