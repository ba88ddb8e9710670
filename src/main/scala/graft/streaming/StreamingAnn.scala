package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/**
 * Streaming ANN index maintenance — the streaming face of the incremental
 * ANN ingest tier, completing the symmetry the other streaming faces
 * already have (sketch tables, bloom, host edges, z-append): embeddings
 * arrive on an unbounded stream and fold into a persisted IVF /
 * IVF-SQ8 / IVF-PQ index as O(batch) appends against the FROZEN
 * coarse quantizer, so a similarity tier stays queryable while the
 * corpus it indexes is still being crawled.
 *
 * Each micro-batch calls the tier's batch append ([[graft.pipeline
 * .Similarity.ivfAppend]] / [[graft.pipeline.Sq.ivfSqAppend]] /
 * [[graft.pipeline.Pq.ivfPqAppend]] — append==rebuild parity is pinned by
 * their specs), which assigns the batch to existing centroids and
 * anti-joins already-indexed ids BEFORE any encode work. That anti-join
 * is also the exactly-once story: `foreachBatch` replays a batch after a
 * crash, the replay's ids are all present, the append is a no-op — no
 * batch-id marker needed, idempotence is structural (and the retried
 * scan prunes to the batch's own cell partitions, never the full index).
 *
 * The index must exist before the stream starts (build the initial tier
 * with its batch builder over whatever corpus is already on disk) — a
 * streaming-cold-start index would train centroids on the first
 * micro-batch's distribution, which is a modeling decision, not one a
 * stream should take silently.
 */
object StreamingAnn {

  val Tiers = Set("ivf", "ivfsq", "ivfpq")

  /** Writer that appends every micro-batch of (idCol, vecCol) rows to the
   * persisted `tier` index at `path`. Caller configures trigger +
   * checkpoint and calls `.start()`. */
  def indexAppendBuilder(
      stream: DataFrame, idCol: String, vecCol: String,
      path: String, tier: String = "ivf"): DataStreamWriter[Row] = {
    require(Tiers(tier), s"tier must be one of ${Tiers.mkString("/")}, got $tier")
    stream.select(col(idCol).as("graft_id"), col(vecCol).as("graft_vec"))
      .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, path, tier)
      }
  }

  /** The per-batch body — exposed for the replay/parity specs. */
  private[streaming] def processBatch(
      batch: DataFrame, path: String, tier: String): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    tier match {
      case "ivf" =>
        graft.pipeline.Similarity.ivfAppend(spark, path, batch, "graft_id", "graft_vec")
      case "ivfsq" =>
        graft.pipeline.Sq.ivfSqAppend(spark, path, batch, "graft_id", "graft_vec")
      case "ivfpq" =>
        graft.pipeline.Pq.ivfPqAppend(spark, path, batch, "graft_id", "graft_vec")
    }
  }

  /** Convenience starter: file-source or any streaming frame in, running
   * query out, checkpointed at `checkpoint`. */
  def start(stream: DataFrame, idCol: String, vecCol: String,
      path: String, checkpoint: String, tier: String = "ivf") =
    indexAppendBuilder(stream, idCol, vecCol, path, tier)
      .option("checkpointLocation", checkpoint).start()
}
