package graft.streaming

import graft.pipeline.Text
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/**
 * Streaming near-duplicate detection: minhash-LSH banding with per-bucket
 * state, the streaming counterpart of Dedup.minhashNearDups.
 *
 * Each arriving doc signs into `bands` (band, bucket) keys; a bucket's state
 * remembers the FIRST in-watermark doc that claimed it. A later doc colliding
 * in a bucket emits a candidate row (docId, firstId, band). Near-identical
 * docs collide in many bands, unrelated docs in none — so the count of
 * colliding bands per (docId, firstId) pair is the streaming analogue of the
 * LSH candidate criterion (consumers threshold it or verify exactly against
 * a doc store). State is bounded: event-time timeout clears buckets one
 * watermark-delay past the stream's progress, exactly like the batch bucket
 * cap bounds skew — an unbounded 100 TB/day stream cannot keep every bucket
 * forever.
 */
object StreamingDedup {

  // carries the watermark-tagged timestamp column through the grouping (the
  // streaming checker requires it present for event-time timeouts)
  final case class BandHit(bucketKey: Long, docId: Long, ts: java.sql.Timestamp)
  final case class Collision(docId: Long, firstId: Long, bucketKey: Long)

  def streamingNearDupCandidates(
      stream: DataFrame, idCol: String, textCol: String, tsCol: String,
      watermark: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16): Dataset[Collision] = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val rowsPerBand = numHashes / bands
    val spark = stream.sparkSession
    import spark.implicits._

    val bandRows = stream
      .withWatermark(tsCol, watermark)
      .select(col(idCol).cast("long").as("docId"),
        col(tsCol).as("ts"),
        Text.minhash(Text.shingles(col(textCol), shingleSize), numHashes).as("sig"))
      .select(col("docId"), col("ts"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"), col("sig"))
      .select(
        xxhash64(col("band"),
          slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))).as("bucketKey"),
        col("docId"),
        col("ts"))
      .as[BandHit]

    bandRows
      .groupByKey(_.bucketKey)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[BandHit], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // deterministic within a batch: lowest doc id claims the bucket
            val batch = rows.toSeq.sortBy(r => (r.docId, r.ts.getTime))
            var first = state.getOption
            val out = Seq.newBuilder[Collision]
            batch.foreach { r =>
              first match {
                case None => first = Some(r.docId)
                case Some(f) if f != r.docId => out += Collision(r.docId, f, key)
                case _ => ()
              }
            }
            first.foreach(f => state.update(f))
            // retire one FULL watermark-delay past the bucket's last
            // activity (wm+1 would expire it on the next stream progress
            // and silently drop cross-batch collisions)
            if (batch.nonEmpty)
              state.setTimeoutTimestamp(batch.map(_.ts.getTime).max, watermark)
            out.result().iterator
          }
      }
  }
}
