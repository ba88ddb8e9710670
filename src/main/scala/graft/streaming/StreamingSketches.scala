package graft.streaming

import graft.functions.dsl
import graft.pipeline.Incremental
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}

/**
 * Streaming sketch-table maintenance: grow a per-key sketch table (HLL
 * distinct counts, theta set algebra, count-min frequencies) from an
 * unbounded stream — the streaming face of the batch "sketch the new
 * batch, merge into the stored registers" telemetry contract, exactly as
 * [[StreamingBloom]] is the streaming face of the batch bloom build.
 *
 * Each micro-batch runs the sketch aggregate (map-side combining: only
 * per-key sketch bytes cross the shuffle, never values), merges with the
 * stored table through the monoidal merge function, and swaps the result
 * in with the [[Incremental]] manifest-guarded two-rename — readers heal a
 * mid-swap crash, and the committed-batch marker travels INSIDE the
 * swapped directory so the batch id and the data commit atomically.
 *
 * Exactly-once: `foreachBatch` replays batches on recovery. HLL/theta
 * unions are idempotent (max/min-set merges), but the count-min SUM merge
 * is NOT — a replayed batch would double-count — so every batch id at or
 * below the table's committed marker is skipped for all kinds.
 */
object StreamingSketches {

  private val BatchMarker = "_committed_batch"

  /**
   * Writer that maintains the sketch table at `tablePath` with schema
   * (key, s BINARY): one row per distinct `keyExpr`, `s` the sketch of
   * every `valueExpr` seen for that key since the table was created.
   * `kind` is "hll" (param = precision p), "theta" (param = k) or "cms"
   * (param = width; depth 4). Caller configures trigger/checkpoint and
   * calls `.start()`; restarts resume from the stored table.
   */
  def sketchTableBuilder(
      stream: DataFrame, keyExpr: Column, valueExpr: Column,
      tablePath: String, kind: String = "hll", param: Int = 0): DataStreamWriter[Row] = {
    requireKind(kind)
    val keyed = stream.select(keyExpr.as("key"), valueExpr.as("graft_v"))
    keyed.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      processBatch(batch, batchId, tablePath, kind, param)
    }
  }

  /** The per-batch body — exposed for the replay-protection spec. */
  private[streaming] def processBatch(
      batch: DataFrame, batchId: Long, tablePath: String,
      kind: String, param: Int): Unit = {
    val spark = batch.sparkSession
    if (batchId <= committedBatchId(spark, tablePath)) return // replayed batch
    val batchSketches = batch.groupBy(col("key"))
      .agg(sketchFn(kind, param)(col("graft_v")).as("s"))
    val stored = tableOrNone(spark, tablePath)
    val merged = stored match {
      case Some(st) => st.unionAll(batchSketches)
        .groupBy(col("key")).agg(mergeFn(kind)(col("s")).as("s"))
      case None => batchSketches
    }
    swapIn(spark, tablePath, merged, batchId)
  }

  /** The current sketch table (healing any crashed swap first). */
  def sketchTable(spark: SparkSession, tablePath: String): DataFrame = {
    Incremental.repairDir(spark, tablePath)
    spark.read.parquet(tablePath)
  }

  private def requireKind(kind: String): Unit =
    require(kind == "hll" || kind == "theta" || kind == "cms",
      s"sketch kind must be hll, theta or cms, got $kind")

  private def sketchFn(kind: String, param: Int): Column => Column = kind match {
    case "hll" => c => dsl.hll_sketch(c, if (param > 0) param else 12)
    case "theta" => c => dsl.theta_sketch(c,
      if (param > 0) param else graft.functions.Theta.DefaultK)
    case "cms" => c => dsl.cms_sketch(c,
      if (param > 0) param else graft.functions.Cms.DefaultW)
  }

  private def mergeFn(kind: String): Column => Column = kind match {
    case "hll" => dsl.hll_merge
    case "theta" => dsl.theta_union
    case "cms" => dsl.cms_merge
  }

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def tableOrNone(spark: SparkSession, path: String): Option[DataFrame] = {
    Incremental.repairDir(spark, path)
    val (fs, p) = fsOf(spark, path)
    if (fs.exists(p)) Some(spark.read.parquet(path)) else None
  }

  private def committedBatchId(spark: SparkSession, path: String): Long = {
    Incremental.repairDir(spark, path)
    val (fs, p) = fsOf(spark, path)
    val marker = new org.apache.hadoop.fs.Path(p, BatchMarker)
    if (!fs.exists(marker)) -1L
    else {
      val in = fs.open(marker)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  /** Materialize `merged` (which READS the live table — the write must
   * finish before the live directory moves) into a tmp dir with the batch
   * marker inside, then the manifest-guarded two-rename swap. */
  private def swapIn(
      spark: SparkSession, path: String, merged: DataFrame, batchId: Long): Unit = {
    val (fs, p) = fsOf(spark, path)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    val old = new org.apache.hadoop.fs.Path(path + "__compact_old")
    val manifest = new org.apache.hadoop.fs.Path(path + "__compact_manifest")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    merged.write.mode("overwrite").parquet(tmp.toString)
    val mOut = fs.create(new org.apache.hadoop.fs.Path(tmp, BatchMarker), true)
    try mOut.write(batchId.toString.getBytes("UTF-8")) finally mOut.close()
    val out = fs.create(manifest, true)
    try out.write(Incremental.parquetFileCount(fs, tmp).toString.getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(p) && !fs.rename(p, old))
      throw new java.io.IOException(s"cannot move $path aside")
    if (!fs.rename(tmp, p)) {
      if (fs.exists(old)) fs.rename(old, p)
      throw new java.io.IOException(s"cannot move new sketch table into place at $path")
    }
    fs.delete(old, true)
    fs.delete(manifest, false)
  }
}
