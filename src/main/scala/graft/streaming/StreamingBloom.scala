package graft.streaming

import graft.bloom.{Bloom, BloomModel}
import graft.lookups.Lookups
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.{Column, DataFrame, Row}

/**
 * Streaming bloom build: grow a membership filter from an unbounded stream
 * (reference blooms are batch-built, docs/advanced/blooms.md — the streaming
 * shape is the natural extension for a feed of ids arriving 100 TB/day).
 *
 * Each micro-batch runs the `small_bloom` aggregate — partial filter buffers
 * OR together map-side on the executors, so only ONE filter's bytes per
 * batch cross to the driver regardless of batch size — and the result ORs
 * into the running filter (blooms are monoidal: arrival order and batch
 * boundaries don't change the final bitset). After every batch the running
 * filter re-registers under `name`, so concurrent `probability_in(x, name)`
 * probes see monotonically growing membership, and optionally persists via
 * [[graft.bloom.BloomModel]] so a restart resumes instead of rebuilding.
 */
object StreamingBloom {

  /**
   * Writer that folds `expr` of every streamed row into a bloom registered
   * under `name`. Caller configures trigger/checkpoint and calls `.start()`.
   * If `persistPath` is set, the current bytes are saved after every batch
   * and reloaded on build start (restart-safe resume).
   */
  def bloomBuilder(
      stream: DataFrame, expr: Column, name: String,
      expected: Long, fpp: Double,
      persistPath: Option[String] = None): DataStreamWriter[Row] = {
    val keyed = stream.select(expr.as("graft_bloom_key"))
    keyed.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      val batchBytes = batch
        .agg(graft.functions.dsl.small_bloom(
          org.apache.spark.sql.functions.col("graft_bloom_key"), expected, fpp).as("b"))
        .collect()(0).getAs[Array[Byte]](0)
      val previous = if (Lookups.isBloomRegistered(name)) Some(Lookups.bloom(name)) else None
      val current = previous.map(_.buckets.value(0)).getOrElse {
        // resume through the configured filesystem (hdfs://, s3://, local —
        // a java.io.File probe would always miss non-local paths and
        // silently restart from an empty filter). Only a MISSING path falls
        // through to a fresh filter; a corrupt or unreadable persisted
        // filter must propagate — swallowing it would turn every
        // previously-streamed id into a bloom false negative.
        persistPath.flatMap { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(hp)) Some(BloomModel.load(spark, p)._1(0)) else None
        }.getOrElse(Bloom.toBytes(Bloom.newFilter(expected, fpp)))
      }
      val merged = Bloom.orBytes(current, batchBytes)
      Lookups.registerBloom(spark, name, Array(merged), fpp)
      // drop the replaced batch's executor-side broadcast blocks — a
      // long-running stream would otherwise accumulate one filter-sized
      // broadcast per micro-batch (non-blocking: in-flight probes of the old
      // entry refetch from the driver if they race the unpersist)
      previous.foreach(_.buckets.unpersist(false))
      persistPath.foreach(p => BloomModel.save(spark, p, Array(merged), fpp))
    }
  }
}
