package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Trained SQ8 quantizer: per-dimension minima and (max - min) ranges.
 * Constant dims (range 0) decode to their min. Top-level (not nested in
 * [[Sq]]) so generated code can name the class. */
case class SqParams(mins: Array[Double], ranges: Array[Double]) {
  require(mins.length == ranges.length, "mins/ranges length mismatch")
  def dim: Int = mins.length
}

/**
 * SQ8 scalar quantization for embeddings — the light compression tier
 * between raw float32 (4 bytes/dim) and IVF-PQ (sub-byte/dim): one byte
 * per dimension, per-dimension [min, max] ranges learned from the corpus
 * in a single mergeable aggregate. Dequantized ("asymmetric") cosine
 * against the exact query recovers near-uncompressed recall at 4× less
 * index memory — the standard first stop when a float32 index stops
 * fitting (FAISS's SQ8, public knowledge).
 *
 * Scale design (100 TB): training is ONE aggregate whose state is two
 * dim-length arrays (element-wise min/max, map-side partials — the
 * [[graft.functions.VectorMinMaxAggregate]] shape, never an explode);
 * driver state is 2·dim doubles. Encode is a codegen'd narrow projection
 * (the params ride along as a reference object); search mirrors
 * [[Similarity.bruteForceTopK]] — broadcast-guarded query side, one
 * codegen'd dequantizing cosine per (query, code) pair, and the mergeable
 * bounded-heap top-k. The encoded corpus column is dim bytes/row, so the
 * scan side of a search reads 4× less than the float path.
 *
 * Degenerate-input contract (matches the PQ hardening): vectors whose
 * length differs from the trained dim, or with null elements, encode to
 * NULL and are dropped from the encoded corpus; zero-norm codes produce
 * NaN sims that the top-k aggregate drops.
 */
object Sq {

  /** Learn per-dimension ranges: one aggregate, state = 2·dim doubles.
   * The trained dim is the corpus's MODAL vector length (one extra tiny
   * aggregate), not the longest seen — a single over-length corrupt row
   * must not make every well-formed vector encode to NULL and silently
   * empty the index; wrong-length rows are the ones dropped instead. */
  def train(df: DataFrame, vecCol: Column): SqParams = {
    val v = vecCol.cast("array<double>")
    val modal = df.where(v.isNotNull)
      .groupBy(size(v).as("graft_d")).agg(count(lit(1)).as("graft_n"))
      .orderBy(col("graft_n").desc, col("graft_d").asc).limit(1)
      .collect()
    require(modal.nonEmpty, "Sq.train: no non-null vectors to train on")
    val dim = modal.head.getInt(0)
    val row = df.where(size(v) === dim)
      .select(graft.functions.dsl.vector_minmax(v).as("mm"))
      .select(col("mm.mins").as("mins"), col("mm.maxs").as("maxs"))
      .head()
    require(!row.isNullAt(0), "Sq.train: no non-null vectors to train on")
    val mins = row.getSeq[Double](0).toArray
    val maxs = row.getSeq[Double](1).toArray
    SqParams(mins, maxs.zip(mins).map { case (hi, lo) => hi - lo })
  }

  private def bridge(c: Column): Expression =
    org.apache.spark.sql.graft.Bridge.expression(c)
  private def column(e: Expression): Column =
    org.apache.spark.sql.graft.Bridge.column(e)

  /** Byte-per-dimension code of a vector column (BinaryType, dim bytes);
   * NULL for wrong-dimension or null-element vectors. */
  def encode(vec: Column, params: SqParams): Column =
    column(SqEncodeExpression(bridge(vec.cast("array<double>")), params))

  /** Dequantizing cosine between an exact query vector and a code. */
  def sqCosine(query: Column, code: Column, params: SqParams): Column =
    column(SqCosineExpression(bridge(query.cast("array<double>")), bridge(code), params))

  /** The encoded corpus: (id, code). Degenerate rows drop here, like the
   * PQ cells table, so search can never return them. */
  def encodeDf(df: DataFrame, idCol: Column, vecCol: Column, params: SqParams): DataFrame =
    df.select(idCol.as("id"), encode(vecCol, params).as("code"))
      .where(col("code").isNotNull)

  /**
   * Top-k search against an encoded corpus: (query_id, neighbor_id, sim,
   * rank), sim = cosine(query, dequantize(code)). Same broadcast guard and
   * top-k shape as [[Similarity.bruteForceTopK]].
   */
  def search(
      encoded: DataFrame, params: SqParams,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      maxBroadcastQueries: Int = Similarity.MaxBroadcastQueries): DataFrame = {
    Similarity.requireBroadcastable(queries, maxBroadcastQueries, "Sq.search")
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val scored = q.crossJoin(encoded.select(col("id").as("neighbor_id"), col("code")))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", sqCosine(col("qv"), col("code"), params))
    Similarity.topKPerQuery(scored, k)
  }

  /**
   * Persisted IVF-SQ8 index (FAISS's "IVF,SQ8" — the middle point of the
   * quantization matrix: cell-pruned search like IVF, 4× less cell I/O
   * than float, milder accuracy loss than PQ): k-means cells + byte codes
   * partitioned by cid, quantizer params and centroids alongside.
   * Degenerate vectors drop at encode (the PQ cells contract).
   */
  def ivfSqBuild(
      corpus: DataFrame, idCol: String, vecCol: String, path: String,
      nlist: Int = 16, iters: Int = 4,
      modelFrom: Option[String] = None): Unit = {
    // modelFrom: rebuild the cells table against an EXISTING index's frozen
    // centroids AND quantizer ranges instead of retraining either — code
    // bytes and cell assignment stay deterministic across the two builds.
    // NOTE: with modelFrom set, nlist/iters are NOT consulted — the loaded
    // model's geometry wins (the point of a frozen-model rebuild)
    require(!modelFrom.contains(path),
      "ivfSqBuild: modelFrom must point at a different index (read-then-overwrite)")
    val spark = corpus.sparkSession
    val centroids = modelFrom match {
      case Some(src) => spark.read.parquet(s"$src/centroids")
      case None => Similarity.kmeansCentroids(corpus, vecCol, nlist, iters)
    }
    centroids.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val cents = centroids.collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    val params = modelFrom match {
      case Some(src) => Models.loadSq(spark, s"$src/sq")
      case None => train(corpus, col(vecCol))
    }
    Models.saveSq(spark, s"$path/sq", params)
    corpus.select(
        col(idCol).as("neighbor_id"),
        encode(col(vecCol), params).as("code"),
        Similarity.bestCid(col(vecCol).cast("array<double>"), cents).as("cid"))
      .where(col("code").isNotNull)
      .write.mode("overwrite").partitionBy("cid").parquet(s"$path/cells")
  }

  /**
   * Append a new batch to a persisted IVF-SQ8 index WITHOUT retraining:
   * vectors encode with the EXISTING quantizer ranges and assign to the
   * EXISTING centroids (both frozen at build time — out-of-range components
   * clamp, exactly as any post-train vector does), so search-after-append
   * equals search-after-rebuild over the same model (spec-pinned).
   * Retry-idempotent via the same pruned anti-join as
   * [[Similarity.ivfAppend]]: deterministic assignment means a retried
   * batch lands in the same cells, so only those partitions are scanned.
   */
  def ivfSqAppend(
      spark: SparkSession, path: String,
      newBatch: DataFrame, idCol: String, vecCol: String): Unit = {
    val cents = spark.read.parquet(s"$path/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    val params = Models.loadSq(spark, s"$path/sq")
    val assigned = newBatch.select(
        col(idCol).as("neighbor_id"),
        encode(col(vecCol), params).as("code"),
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
   * Search a persisted IVF-SQ8 index: probe `nprobe` cells (same dynamic/
   * static partition-pruning contract as ivfSearch on both join regimes),
   * score with the dequantizing cosine, optionally rerank the
   * k×rerankFactor shortlist with exact cosine against `rerankVectors`.
   */
  def ivfSqSearch(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nprobe: Int = 4, rerankFactor: Int = 4,
      rerankVectors: Option[DataFrame] = None,
      broadcastQueries: Boolean = true,
      maxBroadcastQueries: Int = Similarity.MaxBroadcastQueries): DataFrame = {
    require(rerankFactor >= 1, "rerankFactor must be >= 1")
    if (broadcastQueries)
      Similarity.requireBroadcastable(queries, maxBroadcastQueries, "ivfSqSearch")
    val cents = spark.read.parquet(s"$path/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    val params = Models.loadSq(spark, s"$path/sq")
    val cellsRaw = spark.read.parquet(s"$path/cells")
    val probesBase = queries.select(
      col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"),
      explode(Similarity.probeCids(
        col(vecCol).cast("array<double>"), cents, nprobe)).as("cid"))
    val probes = if (broadcastQueries) broadcast(probesBase) else probesBase
    val cells =
      if (broadcastQueries) cellsRaw
      else {
        val cids = probesBase.select(col("cid")).distinct().collect().map(_.getInt(0))
        cellsRaw.where(col("cid").isin(cids.map(Integer.valueOf).toSeq: _*))
      }
    val scored = probes.join(cells, "cid")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        sqCosine(col("qv"), col("code"), params).as("sim"))
    rerankVectors match {
      case None => Similarity.topKPerQuery(scored, k)
      case Some(full) =>
        val shortlist = Similarity.topKPerQuery(scored, k * rerankFactor)
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

object SqAlgos {
  /** Encode one vector; null on dimension mismatch or null element. */
  def encode(v: ArrayData, p: SqParams): Array[Byte] = {
    val dim = p.dim
    if (v.numElements() != dim) return null
    val out = new Array[Byte](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      val r = p.ranges(i)
      val c =
        if (r <= 0.0) 0
        else {
          val s = math.round((v.getDouble(i) - p.mins(i)) / r * 255.0)
          if (s < 0L) 0 else if (s > 255L) 255 else s.toInt
        }
      out(i) = c.toByte
      i += 1
    }
    out
  }

  /** Cosine(query, dequantized code); null on degenerate inputs, NaN on a
   * zero norm (dropped by the top-k aggregate, like every other path). */
  def cosine(q: ArrayData, code: Array[Byte], p: SqParams): java.lang.Double = {
    val dim = p.dim
    if (q.numElements() != dim || code.length != dim) return null
    var dot = 0.0
    var nq = 0.0
    var nx = 0.0
    var i = 0
    while (i < dim) {
      if (q.isNullAt(i)) return null
      val qd = q.getDouble(i)
      val xd = p.mins(i) + (code(i) & 0xFF).toDouble / 255.0 * p.ranges(i)
      dot += qd * xd
      nq += qd * qd
      nx += xd * xd
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(nq) * math.sqrt(nx)))
  }
}

/** Byte-per-dim SQ8 code of an embedding, one codegen'd static call;
 * NULL for wrong-dimension or null-element vectors. */
case class SqEncodeExpression(child: Expression, p: SqParams)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    SqAlgos.encode(v.asInstanceOf[ArrayData], p)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val pRef = ctx.addReferenceObj("graftSqParams", p, "graft.pipeline.SqParams")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      byte[] ${ev.value} = null;
      if (!${c.isNull}) {
        ${ev.value} = graft.pipeline.SqAlgos.encode(${c.value}, $pRef);
        ${ev.isNull} = (${ev.value} == null);
      }""")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Dequantizing cosine(query, code), one codegen'd static call per pair. */
case class SqCosineExpression(left: Expression, right: Expression, p: SqParams)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    SqAlgos.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[Array[Byte]], p)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val pRef = ctx.addReferenceObj("graftSqParams", p, "graft.pipeline.SqParams")
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val boxed = ctx.freshName("graftSqSim")
    ev.copy(code = code"""
      ${l.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${l.isNull}) {
        ${r.code}
        if (!${r.isNull}) {
          java.lang.Double $boxed = graft.pipeline.SqAlgos.cosine(
            ${l.value}, ${r.value}, $pRef);
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
        }
      }""")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
