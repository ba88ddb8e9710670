package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/**
 * Streaming face of [[graft.pipeline.Curation.eventFunnel]]: the per-user
 * journey state machine carried incrementally — state is just (stage
 * reached, chain start, last conversion time), so an unbounded click
 * stream pays O(batch) per trigger and three numbers per live user.
 * Within a trigger events fold in event-time order; across triggers the
 * same in-order contract as the other carried-state faces (bound disorder
 * with the watermark upstream). Each trigger emits the key's refreshed
 * stage; idle users retire one watermark-delay past their last event.
 *
 * Semantics match the batch operator's earliest-chain rule exactly:
 * step i converts on the first step-i event STRICTLY AFTER the step-(i−1)
 * conversion and within `windowSeconds` of the chain start.
 */
object StreamingFunnel {

  final case class FunnelEv(key: Long, ts: java.sql.Timestamp, t: String)
  final case class FunnelState(stage: Int, t0: Double, tPrev: Double, lastMs: Long)
  final case class KeyStage(key: Long, stage_reached: Int)

  def streamingEventFunnel(
      stream: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], windowSeconds: Long, watermark: String): Dataset[KeyStage] = {
    require(steps.size >= 2, "streamingEventFunnel needs at least two steps")
    require(windowSeconds > 0, "windowSeconds must be positive")
    val spark = stream.sparkSession
    import spark.implicits._
    val stepArr = steps.toArray
    stream
      .withWatermark(tsCol, watermark)
      .select(col(keyCol).cast("long").as("key"), col(tsCol).as("ts"),
        col(typeCol).cast("string").as("t"))
      .where(col("t").isin(steps: _*))
      .as[FunnelEv]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[FunnelEv], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toArray.sortBy(e => (e.ts.getTime, e.t))
            var st = state.getOption.getOrElse(FunnelState(0, 0.0, 0.0, 0L))
            batch.foreach { e =>
              val s = e.ts.getTime / 1000.0
              if (st.stage < stepArr.length && e.t == stepArr(st.stage)) {
                if (st.stage == 0)
                  st = FunnelState(1, s, s, math.max(st.lastMs, e.ts.getTime))
                else if (s > st.tPrev && s - st.t0 <= windowSeconds)
                  st = FunnelState(st.stage + 1, st.t0, s,
                    math.max(st.lastMs, e.ts.getTime))
              }
              if (e.ts.getTime > st.lastMs) st = st.copy(lastMs = e.ts.getTime)
            }
            state.update(st)
            state.setTimeoutTimestamp(st.lastMs, watermark)
            Iterator.single(KeyStage(key, st.stage))
          }
      }
  }
}
