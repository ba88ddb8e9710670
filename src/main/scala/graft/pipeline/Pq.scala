package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * IVF-PQ: product-quantized cell storage for the persisted IVF index — the
 * standard FAISS shape (Jégou et al. 2011, "Product Quantization for
 * Nearest Neighbor Search") that makes 100 TB of embeddings fit a probe
 * budget. Vectors are L2-normalized, split into `m` subvectors, and each
 * subvector quantized to its nearest entry of a per-subspace codebook
 * learned by k-means — a dim×8-byte vector becomes `m` bytes (dim 64
 * doubles = 512 B → 8 B at m=8, a 64× cut before parquet compression).
 *
 * Search is asymmetric distance computation (ADC): each query precomputes
 * ONE lookup table of subvector·codebook-entry partial dots (m×ksub
 * doubles, a codegen'd expression on the query side), and scoring a corpus
 * code is then m table lookups — no vector arithmetic per candidate at all.
 * The ADC top `k × rerankFactor` shortlist is optionally reranked with
 * exact cosine against a full-vector frame, recovering uncompressed recall
 * while the big scan stays on the compressed codes.
 *
 * Design notes vs the uncompressed [[Similarity.ivfBuild]] path:
 *  - codes quantize the normalized vector directly (no coarse-residual
 *    encoding); cosine is scale-invariant, so normalize-then-dot makes ADC
 *    approximate cosine with no per-cell recentering.
 *  - all per-row math (encode / LUT / ADC) is codegen'd static calls, same
 *    pattern as CentroidMatrix/HyperplaneMatrix.
 *  - undersized training sets pad codebooks by repeating the first
 *    centroid, keeping every codebook exactly `ksub` entries so the LUT
 *    layout is fixed — argmin ties break to the lowest code, deterministic.
 */
object Pq {

  /** Per-subspace k-means codebooks over the normalized corpus: m × ksub ×
   * dsub. ALL subspaces train together over ONE cached (sub, subvector)
   * frame — assignment for every subspace is one codegen'd expression and
   * the centroid update is ONE keyed aggregate per Lloyd's iteration
   * (grouped by (sub, code), map-side vector_mean partials), not one scan
   * per subspace: at 100 TB that is the difference between iters and
   * m × iters corpus passes. Assignment is L2 argmin (ties to the lowest
   * code) — the same metric [[PqAlgos.encode]] uses, so training and
   * encoding are consistent. Init per subspace: the ksub lowest-xxhash
   * subvectors (deterministic). Empty cells keep their previous centroid.
   * Train on a sample at 100 TB — standard PQ practice. */
  def trainCodebook(
      df: DataFrame, vecCol: String, mSub: Int, ksub: Int = 16,
      iters: Int = 4): PqCodebook = {
    require(mSub > 0 && ksub > 1 && ksub <= 256,
      "need 0 < mSub and 1 < ksub <= 256 (codes are single bytes)")
    val Bridge = org.apache.spark.sql.graft.Bridge
    val normed = df.select(Bridge.column(NormalizeVectorExpression(
        Bridge.expression(col(vecCol).cast("array<double>")))).as("graft_nv"))
      .where(size(col("graft_nv")) > 0)
    val dimRow = normed.select(size(col("graft_nv"))).limit(1).collect()
    require(dimRow.nonEmpty,
      "cannot train a PQ codebook on an empty corpus (no non-empty vectors)")
    val dim = dimRow(0).getInt(0)
    require(dim % mSub == 0, s"vector dim $dim must divide into $mSub subvectors")
    val dsub = dim / mSub
    val subv = normed.select(
        posexplode(transform(sequence(lit(0), lit(mSub - 1)),
          s => slice(col("graft_nv"), s * dsub + 1, lit(dsub)))).as(Seq("sub", "sv")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // deterministic init, ONE pass (r8, VERDICT r7 #9): the ksub lowest-hash
    // subvectors of EVERY subspace via one grouped bounded top-k aggregate
    // (map-side partials ship ≤ ksub subvectors per (partition, sub)) —
    // build cost is now strictly iters+1 corpus passes, not m extra
    // TakeOrdered scans. Ordering: hash asc as a negated double (53-bit
    // rounding can only permute near-equal hashes; ties break on the
    // subvector ordering, so init stays deterministic under repartitioning).
    var books: Array[Array[Array[Double]]] = {
      val top = subv.groupBy(col("sub"))
        .agg(graft.functions.dsl.top_k_by(
          -xxhash64(col("sv")).cast("double"), col("sv"), ksub).as("graft_top"))
        .collect()
      val bySub = top.map { r =>
        r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(_.getSeq[Double](0).toArray).toArray
      }.toMap
      (0 until mSub).map { s =>
        val cents = bySub.getOrElse(s, Array.empty[Array[Double]])
        require(cents.nonEmpty, "cannot train a PQ codebook on an empty corpus")
        if (cents.length >= ksub) cents.take(ksub)
        else cents ++ Array.fill(ksub - cents.length)(cents.head)
      }.toArray
    }
    var iter = 0
    while (iter < iters) {
      val cb = PqCodebook(mSub, dsub, ksub, books)
      val updated = subv.groupBy(col("sub"),
          Bridge.column(SubspaceBestCodeExpression(
            Bridge.expression(col("sub")), Bridge.expression(col("sv")), cb)).as("code"))
        .agg(graft.functions.dsl.vector_mean(col("sv")).as("cv"))
        .collect()
      val next = books.map(_.clone())
      updated.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
      }
      books = next
      iter += 1
    }
    subv.unpersist()
    PqCodebook(mSub, dsub, ksub, books)
  }

  private def codebookToDf(spark: SparkSession, cb: PqCodebook): DataFrame = {
    import spark.implicits._
    (for (s <- 0 until cb.m; c <- 0 until cb.ksub)
      yield (s, c, cb.cents(s)(c).toSeq)).toDF("sub", "code", "cv")
  }

  private def codebookFromDf(df: DataFrame): PqCodebook = {
    val rows = df.collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val m = rows.map(_._1).max + 1
    val ksub = rows.map(_._2).max + 1
    val cents = Array.ofDim[Array[Double]](m, ksub)
    rows.foreach { case (s, c, v) => cents(s)(c) = v }
    PqCodebook(m, cents(0)(0).length, ksub, cents)
  }

  /**
   * Build a persisted IVF-PQ index at `path`: coarse centroids (same layout
   * as [[Similarity.ivfBuild]]), the PQ codebook, and a cells table of
   * (neighbor_id, code: binary) PARTITIONED BY cid — the compressed
   * replacement for the full-vector cells table, ≥4× smaller on disk and
   * the only thing a probe scans.
   */
  def ivfPqBuild(
      corpus: DataFrame, idCol: String, vecCol: String, path: String,
      nlist: Int = 16, mSub: Int = 8, ksub: Int = 16, iters: Int = 4,
      modelFrom: Option[String] = None): Unit = {
    // modelFrom: rebuild the cells table against an EXISTING index's frozen
    // coarse centroids AND PQ codebooks instead of retraining either — codes
    // and cell assignment stay deterministic across the two builds (the
    // append==rebuild parity contract, same shape as Sq.ivfSqBuild). NOTE:
    // with modelFrom set, nlist/mSub/ksub/iters are NOT consulted — the
    // loaded model's geometry wins (the point of a frozen-model rebuild)
    require(!modelFrom.contains(path),
      "ivfPqBuild: modelFrom must point at a different index (read-then-overwrite)")
    val spark = corpus.sparkSession
    val centroids = modelFrom match {
      case Some(src) => spark.read.parquet(s"$src/centroids")
      case None => Similarity.kmeansCentroids(corpus, vecCol, nlist, iters)
    }
    centroids.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val cents = centroids.collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    val cb = modelFrom match {
      case Some(src) => codebookFromDf(spark.read.parquet(s"$src/pq_codebook"))
      case None => trainCodebook(corpus, vecCol, mSub, ksub, iters)
    }
    codebookToDf(spark, cb).coalesce(1).write.mode("overwrite").parquet(s"$path/pq_codebook")
    val Bridge = org.apache.spark.sql.graft.Bridge
    corpus.select(
        col(idCol).as("neighbor_id"),
        Bridge.column(PqEncodeExpression(
          Bridge.expression(col(vecCol).cast("array<double>")), cb)).as("code"),
        Similarity.bestCid(col(vecCol).cast("array<double>"), cents).as("cid"))
      // degenerate rows (wrong dim / zero norm) encode to NULL — keep them
      // out of the index entirely, consistent with every exact-cosine path
      .where(col("code").isNotNull)
      .write.mode("overwrite").partitionBy("cid").parquet(s"$path/cells")
  }

  /**
   * Append a new batch to a persisted IVF-PQ index WITHOUT retraining:
   * vectors encode with the EXISTING per-subspace codebooks and assign to
   * the EXISTING coarse centroids (both frozen at build time), so
   * search-after-append equals search-after-rebuild over the same model
   * (spec-pinned, mirroring [[Sq.ivfSqAppend]]). Retry-idempotent via the
   * same pruned anti-join: deterministic assignment means a retried batch
   * lands in the same cells, so only those cid partitions are scanned —
   * O(batch + matching cells), never a full index pass.
   */
  def ivfPqAppend(
      spark: SparkSession, path: String,
      newBatch: DataFrame, idCol: String, vecCol: String): Unit = {
    val cents = spark.read.parquet(s"$path/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    val cb = codebookFromDf(spark.read.parquet(s"$path/pq_codebook"))
    val Bridge = org.apache.spark.sql.graft.Bridge
    val assigned = newBatch.select(
        col(idCol).as("neighbor_id"),
        Bridge.column(PqEncodeExpression(
          Bridge.expression(col(vecCol).cast("array<double>")), cb)).as("code"),
        Similarity.bestCid(col(vecCol).cast("array<double>"), cents).as("cid"))
      .where(col("code").isNotNull)
      .localCheckpoint(true) // one encode+assign pass feeds cid-list + append
    val cids = assigned.select(col("cid")).distinct().collect().map(_.getInt(0))
    val existing = spark.read.parquet(s"$path/cells")
      .where(col("cid").isin(cids.map(Integer.valueOf).toSeq: _*))
      .select(col("neighbor_id"))
    assigned.join(existing, Seq("neighbor_id"), "left_anti")
      .write.mode("append").partitionBy("cid").parquet(s"$path/cells")
  }

  /**
   * Search a persisted IVF-PQ index: queries probe their nprobe cells, ADC
   * scores the cell codes against each query's precomputed LUT, the top
   * `k × rerankFactor` ADC shortlist per query is exact-cosine reranked
   * against `rerankVectors` (an (idCol, vecCol) frame, usually the corpus)
   * when provided — the shortlist is O(queries × k × rerankFactor), so the
   * rerank join touches full vectors for a vanishing fraction of the
   * corpus. Without `rerankVectors`, returns ADC-ranked results directly.
   */
  def ivfPqSearch(
      spark: SparkSession, path: String,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nprobe: Int = 4, rerankFactor: Int = 4,
      rerankVectors: Option[DataFrame] = None,
      broadcastQueries: Boolean = true,
      maxBroadcastQueries: Int = Similarity.MaxBroadcastQueries): DataFrame = {
    require(rerankFactor >= 1, "rerankFactor must be >= 1")
    if (broadcastQueries)
      Similarity.requireBroadcastable(queries, maxBroadcastQueries, "ivfPqSearch")
    val cents = spark.read.parquet(s"$path/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    val cb = codebookFromDf(spark.read.parquet(s"$path/pq_codebook"))
    val cellsRaw = spark.read.parquet(s"$path/cells")
    val Bridge = org.apache.spark.sql.graft.Bridge
    val probesBase = queries.select(
      col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"),
      Bridge.column(PqLutExpression(
        Bridge.expression(col(vecCol).cast("array<double>")), cb)).as("graft_lut"),
      explode(Similarity.probeCids(col(vecCol).cast("array<double>"), cents, nprobe)).as("cid"))
    val probes = if (broadcastQueries) broadcast(probesBase) else probesBase
    // same pruning contract as ivfSearch: the broadcast join gets dynamic
    // partition pruning; the shuffle-join path (corpus-sized query frames)
    // collects the ≤ nlist distinct probed cids and prunes statically
    val cells =
      if (broadcastQueries) cellsRaw
      else {
        val cids = probesBase.select(col("cid")).distinct().collect().map(_.getInt(0))
        cellsRaw.where(col("cid").isin(cids.map(Integer.valueOf).toSeq: _*))
      }
    val adcScored = probes.join(cells, "cid")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"),
        Bridge.column(PqAdcExpression(
          Bridge.expression(col("graft_lut")),
          Bridge.expression(col("code")), cb.ksub)).as("sim"))
    rerankVectors match {
      case None => Similarity.topKPerQuery(adcScored, k)
      case Some(full) =>
        val shortlist = Similarity.topKPerQuery(
            adcScored.select(col("query_id"), col("neighbor_id"), col("sim")),
            k * rerankFactor)
          .select(col("query_id"), col("neighbor_id"))
        val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("graft_qv"))
        val c = full.select(col(idCol).as("neighbor_id"), col(vecCol).as("graft_cv"))
        Similarity.topKPerQuery(
          shortlist.join(q, "query_id").join(c, "neighbor_id")
            .select(col("query_id"), col("neighbor_id"),
              Similarity.cosine(col("graft_qv"), col("graft_cv")).as("sim")),
          k)
    }
  }
}

/** PQ codebook carried into generated code as one reference object:
 * cents(sub)(code) is the dsub-dim centroid of `code` in subspace `sub`. */
final case class PqCodebook(m: Int, dsub: Int, ksub: Int, cents: Array[Array[Array[Double]]])

object PqAlgos {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  /** L2-normalized copy; zero-norm and empty vectors come back as-is
   * (their cosine against anything is NaN-guarded upstream). */
  def normalize(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = vec.getDouble(i); ss += x * x; i += 1 }
    val norm = math.sqrt(ss)
    val out = new Array[Double](n)
    i = 0
    if (norm == 0.0) while (i < n) { out(i) = vec.getDouble(i); i += 1 }
    else while (i < n) { out(i) = vec.getDouble(i) / norm; i += 1 }
    new GenericArrayData(out)
  }

  /** Norm of a double-array column value; NaN if any element is NULL, so
   * the degenerate guards (`normOf(v) == 0.0` is false for NaN — callers
   * also check `!isWellFormed`) treat null-element vectors like every
   * exact-cosine path does (cosineBoxed NULLs them). */
  private def normOf(vec: ArrayData): Double = {
    val n = vec.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return Double.NaN
      val x = vec.getDouble(i); ss += x * x; i += 1
    }
    math.sqrt(ss)
  }

  /** Length matches and no element is NULL and norm is positive. */
  private def isWellFormed(vec: ArrayData, cb: PqCodebook): Boolean = {
    if (vec.numElements() != cb.m * cb.dsub) return false
    val nrm = normOf(vec)
    !java.lang.Double.isNaN(nrm) && nrm != 0.0
  }

  /** m-byte PQ code of the normalized vector: per subspace, the argmin-L2
   * codebook entry (ties to the lowest code — deterministic). Degenerate
   * vectors (length != m·dsub, or zero norm) encode to NULL instead of a
   * plausible zero-padded code, so ADC-only search excludes them exactly
   * like the exact-cosine paths (where cosine yields NULL/NaN and
   * topKPerQuery drops the row). */
  def encode(vec: ArrayData, cb: PqCodebook): Array[Byte] = {
    if (!isWellFormed(vec, cb)) return null
    val nv = normalize(vec)
    val out = new Array[Byte](cb.m)
    var s = 0
    while (s < cb.m) {
      val base = s * cb.dsub
      var bestCode = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.ksub) {
        val cent = cb.cents(s)(c)
        var d = 0.0
        var j = 0
        while (j < cb.dsub) {
          val diff = nv.getDouble(base + j) - cent(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; bestCode = c }
        c += 1
      }
      out(s) = bestCode.toByte
      s += 1
    }
    out
  }

  /** ADC lookup table for one query: lut(s·ksub + c) = normalizedQuery_s ·
   * codebook(s)(c) — after this, scoring any corpus code is m adds.
   * Degenerate queries (length != m·dsub, or zero norm) get an all-NaN
   * table: every ADC sum is then NaN and topKPerQuery's NaN drop applies
   * uniformly, matching the exact-cosine paths. */
  def lut(vec: ArrayData, cb: PqCodebook): ArrayData = {
    val out = new Array[Double](cb.m * cb.ksub)
    if (!isWellFormed(vec, cb)) {
      java.util.Arrays.fill(out, Double.NaN)
      return new GenericArrayData(out)
    }
    val nv = normalize(vec)
    var s = 0
    while (s < cb.m) {
      val base = s * cb.dsub
      var c = 0
      while (c < cb.ksub) {
        val cent = cb.cents(s)(c)
        var dot = 0.0
        var j = 0
        while (j < cb.dsub) {
          dot += nv.getDouble(base + j) * cent(j)
          j += 1
        }
        out(s * cb.ksub + c) = dot
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** L2-argmin code of ONE subvector against its subspace codebook (ties
   * to the lowest code) — the training-assignment twin of [[encode]]. */
  def bestSubCode(sub: Int, sv: ArrayData, cb: PqCodebook): Int = {
    val n = sv.numElements()
    var bestCode = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cb.ksub) {
      val cent = cb.cents(sub)(c)
      var d = 0.0
      var j = 0
      while (j < cb.dsub && j < n) {
        val diff = sv.getDouble(j) - cent(j)
        d += diff * diff
        j += 1
      }
      if (d < bestD) { bestD = d; bestCode = c }
      c += 1
    }
    bestCode
  }

  /** Approximate cosine: Σ_s lut(s·ksub + code(s)). */
  def adc(lut: ArrayData, code: Array[Byte], ksub: Int): Double = {
    var sim = 0.0
    var s = 0
    while (s < code.length) {
      sim += lut.getDouble(s * ksub + (code(s) & 0xff))
      s += 1
    }
    sim
  }
}

/** L2 normalization as one codegen'd static call per row. */
case class NormalizeVectorExpression(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    PqAlgos.normalize(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.PqAlgos.normalize($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** PQ encode as one codegen'd static call per row; NULL for degenerate
 * vectors (wrong dimension / zero norm) — see [[PqAlgos.encode]]. */
case class PqEncodeExpression(child: Expression, cb: PqCodebook)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    PqAlgos.encode(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], cb)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val cbRef = ctx.addReferenceObj("graftPqCb", cb, "graft.pipeline.PqCodebook")
    // nullable=true forces the isNull-variable template, so the helper's
    // null return propagates as SQL NULL instead of a null-valued non-null
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.pipeline.PqAlgos.encode($c, $cbRef);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-query ADC lookup table as one codegen'd static call per row. */
case class PqLutExpression(child: Expression, cb: PqCodebook)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    PqAlgos.lut(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], cb)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val cbRef = ctx.addReferenceObj("graftPqCb", cb, "graft.pipeline.PqCodebook")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.PqAlgos.lut($c, $cbRef);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Training-time L2-argmin code of a (sub, subvector) row; codegen'd. */
case class SubspaceBestCodeExpression(left: Expression, right: Expression, cb: PqCodebook)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types._
  override def dataType: DataType = IntegerType
  override def nullSafeEval(s: Any, v: Any): Any =
    PqAlgos.bestSubCode(s.asInstanceOf[Int],
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], cb)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val cbRef = ctx.addReferenceObj("graftPqCb", cb, "graft.pipeline.PqCodebook")
    nullSafeCodeGen(ctx, ev, (s, v) =>
      s"${ev.value} = graft.pipeline.PqAlgos.bestSubCode($s, $v, $cbRef);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ADC score (lut, code) → approximate cosine; codegen'd static call. */
case class PqAdcExpression(left: Expression, right: Expression, ksub: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types._
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    PqAlgos.adc(
      l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      r.asInstanceOf[Array[Byte]], ksub)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.pipeline.PqAlgos.adc($l, $r, $ksub);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
