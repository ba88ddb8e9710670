package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Content-defined chunking (the Gear-hash / FastCDC family — public
 * algorithms: Xia et al., FAST'16) for BINARY payload dedup — the storage
 * half of the media-dedup matrix: perceptual hashes collapse re-encodes,
 * CDC collapses byte-identical REGIONS across blobs whose alignment
 * differs (an insertion shifts everything after it, so fixed-size blocks
 * never line up again; content-defined boundaries resynchronize within
 * one chunk). The operator family:
 *
 *  - [[chunksOf]] — column face: binary → array<struct<off,len,hash>>,
 *    a codegen'd static call per row (like the image/audio hashes);
 *  - [[chunkStats]] — corpus dedup report (total vs unique chunk bytes,
 *    the "what would dedup save" number);
 *  - [[sharedPairs]] — blobs sharing ≥ minShared chunks, via one
 *    equi-join on chunk hash (bucket-capped like every banded join here).
 *
 * Boundaries: gear rolling hash `h = (h<<1) + G[b]`, cut when
 * `(h & mask) == 0` with mask = 2^avgBits − 1, min/max clamps; the gear
 * table is SplitMix64(seed) — fully deterministic, partition-invariant.
 * Chunk identity is FNV-1a 64 over the chunk bytes.
 */
object Cdc {

  def chunksOf(data: Column, minSize: Int = 256, avgBits: Int = 10,
      maxSize: Int = 8192): Column = {
    require(minSize >= 16, s"minSize must be >= 16, got $minSize")
    require(avgBits >= 4 && avgBits <= 28, s"avgBits must be in 4..28, got $avgBits")
    require(maxSize > minSize, s"maxSize must exceed minSize")
    Bridge.column(CdcChunksExpression(Bridge.expression(data), minSize, avgBits, maxSize))
  }

  /** One-row corpus report: blobs, total_bytes, total_chunks,
   * unique_chunks, unique_bytes, dedup_ratio_ppm (unique/total bytes). */
  def chunkStats(df: DataFrame, dataCol: Column,
      minSize: Int = 256, avgBits: Int = 10, maxSize: Int = 8192): DataFrame = {
    val ch = df.select(explode(chunksOf(dataCol, minSize, avgBits, maxSize)).as("graft_c"))
      .select(col("graft_c.hash").as("graft_h"), col("graft_c.len").as("graft_l"))
    ch.groupBy(col("graft_h"))
      .agg(count(lit(1)).as("graft_n"), first(col("graft_l")).as("graft_len"))
      .agg(
        sum(col("graft_n") * col("graft_len")).as("total_bytes"),
        sum(col("graft_n")).as("total_chunks"),
        count(lit(1)).as("unique_chunks"),
        sum(col("graft_len")).as("unique_bytes"))
      .select(col("total_bytes"), col("total_chunks"), col("unique_chunks"),
        col("unique_bytes"),
        expr("unique_bytes * 1000000L div nullif(total_bytes, 0L)").as("dedup_ratio_ppm"))
  }

  /** Blob pairs sharing at least `minShared` distinct chunk hashes:
   * (id_a, id_b, shared_chunks), id_a < id_b. One distinct per blob, one
   * equi-join on hash; `maxBucketSize` caps boilerplate chunks (all-zero
   * runs, shared headers) exactly like the LSH band cap — a recall trade,
   * 0 = uncapped. */
  def sharedPairs(df: DataFrame, idCol: Column, dataCol: Column,
      minShared: Int = 2, maxBucketSize: Int = 0,
      minSize: Int = 256, avgBits: Int = 10, maxSize: Int = 8192): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val ch = df.select(idCol.as("graft_id"),
        explode(chunksOf(dataCol, minSize, avgBits, maxSize)).as("graft_c"))
      .select(col("graft_id"), col("graft_c.hash").as("graft_h"))
      .distinct()
    val capped =
      if (maxBucketSize <= 0) ch
      else ch.withColumn("graft_bsz",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy("graft_h")))
        .where(col("graft_bsz") <= maxBucketSize).drop("graft_bsz")
    capped.as("a").join(capped.as("b"),
        col("a.graft_h") === col("b.graft_h") &&
        col("a.graft_id") < col("b.graft_id"))
      .groupBy(col("a.graft_id").as("id_a"), col("b.graft_id").as("id_b"))
      .agg(count(lit(1)).as("shared_chunks"))
      .where(col("shared_chunks") >= minShared)
  }
}

object CdcAlgos {

  /** 256-entry gear table from SplitMix64 (public mixing constants). */
  private val Gear: Array[Long] = {
    var x = 0x9E3779B97F4A7C15L
    Array.fill(256) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }

  private def fnv1a(data: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    while (i < until) {
      h ^= (data(i) & 0xFFL)
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  /** Chunk [from..n) boundaries; returns a catalyst array of
   * struct<off: long, len: long, hash: long> rows (called from codegen). */
  def chunkArrayData(data: Array[Byte], minSize: Int, avgBits: Int,
      maxSize: Int): ArrayData = {
    val n = data.length
    val mask = (1L << avgBits) - 1L
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    var start = 0
    while (start < n) {
      var h = 0L
      var i = start
      var cut = math.min(start + maxSize, n)
      val earliest = start + minSize
      var found = false
      while (i < cut && !found) {
        h = (h << 1) + Gear(data(i) & 0xFF)
        i += 1
        if (i >= earliest && (h & mask) == 0L) { cut = i; found = true }
      }
      out += org.apache.spark.sql.catalyst.InternalRow(
        start.toLong, (cut - start).toLong, fnv1a(data, start, cut))
      start = cut
    }
    new GenericArrayData(out.toArray)
  }
}

case class CdcChunksExpression(child: Expression, minSize: Int, avgBits: Int,
    maxSize: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("off", LongType, nullable = false),
    StructField("len", LongType, nullable = false),
    StructField("hash", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else CdcAlgos.chunkArrayData(v.asInstanceOf[Array[Byte]], minSize, avgBits, maxSize)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = ${c.isNull};
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = graft.pipeline.CdcAlgos.chunkArrayData(
          ${c.value}, $minSize, $avgBits, $maxSize);
      }""")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
