package graft.streaming

import graft.pipeline.Curation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/**
 * Streaming weighted sampling without replacement, k per key — the live
 * face of [[Curation.weightedSamplePerKey]], SAME sample by construction:
 * the A-ES exponential clock is content-addressed (md5 of the id), so the
 * k smallest clocks over a stream prefix equal the batch sample over the
 * same rows regardless of arrival order or batching. State per key is the
 * bounded top-k buffer (k ids + clocks, nothing else); each trigger emits
 * the key's refreshed sample. Keys are mixing domains (bounded set), so
 * state needs no timeout; rows with null/NaN/non-positive weights are
 * excluded exactly like the batch face.
 */
object StreamingSample {

  final case class ClockRow(key: String, id: Long, clock: Double)
  final case class SampleState(ids: Seq[Long], clocks: Seq[Double])
  final case class KeySample(key: String, n_sampled: Int, sample_ids: Seq[Long])

  def streamingWeightedSample(
      stream: DataFrame, keyCol: String, idCol: String, weightCol: String,
      k: Int): Dataset[KeySample] = {
    require(k > 0, "k must be positive")
    val spark = stream.sparkSession
    import spark.implicits._
    val w = col(weightCol).cast("double")
    stream
      .where(w.isNotNull && !isnan(w) && w > 0.0)
      .select(col(keyCol).cast("string").as("key"),
        col(idCol).cast("long").as("id"),
        Curation.samplingClock(col(idCol), col(weightCol)).as("clock"))
      .as[ClockRow]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[ClockRow], state: GroupState[SampleState]) =>
          val st = state.getOption.getOrElse(SampleState(Nil, Nil))
          var buf = st.ids.zip(st.clocks).map { case (i, c) => (c, i) }
          rows.foreach { r => buf = ((r.clock, r.id)) +: buf }
          val top = buf.distinct.sortBy(identity).take(k)
          state.update(SampleState(top.map(_._2), top.map(_._1)))
          Iterator.single(KeySample(key, top.size, top.map(_._2)))
      }
  }
}
