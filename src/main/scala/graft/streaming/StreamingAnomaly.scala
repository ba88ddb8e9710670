package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/**
 * Streaming face of [[graft.pipeline.Anomaly.ewmaAnomalies]]: the same
 * order-sensitive EWMA recursion carried incrementally per key with
 * `flatMapGroupsWithState`, so an unbounded telemetry stream pays O(batch)
 * per trigger and O(keys) state — never a per-key sequence collect.
 *
 * Each trigger folds the key's in-batch events in event-time order into
 * the carried (ewma, n, alerts) state and emits the key's updated running
 * report — the same numbers the batch fold produces on the full prefix
 * (parity is spec-pinned, same doubles, same fold order). Correct running
 * totals need in-order arrival ACROSS triggers per key (within a trigger
 * the batch is sorted here); late events would fold late — bound
 * disorder with the watermark upstream, exactly like sessionization.
 * Event-time timeout retires idle keys one watermark-delay past stream
 * progress, so state stays bounded on key-churning streams.
 */
object StreamingAnomaly {

  final case class Ev(key: Long, ts: java.sql.Timestamp, v: Double)
  final case class EwmaState(s: Double, n: Long, a: Long, lastMs: Long)
  final case class KeyReport(key: Long, n_events: Long, ewma_fp: Long, n_alerts: Long)

  def streamingEwma(
      stream: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      watermark: String, alpha: Double, band: Double): Dataset[KeyReport] = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(band > 0, s"band must be positive, got $band")
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .withWatermark(tsCol, watermark)
      .select(col(keyCol).cast("long").as("key"), col(tsCol).as("ts"),
        col(valueCol).cast("double").as("v"))
      .as[Ev]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[Ev], state: GroupState[EwmaState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toArray.sortBy(e => (e.ts.getTime, e.v))
            var st = state.getOption.getOrElse(EwmaState(Double.NaN, 0L, 0L, 0L))
            sorted.foreach { e =>
              val alert = st.n > 0L && math.abs(e.v - st.s) > band
              val s2 = if (st.n == 0L) e.v else st.s + alpha * (e.v - st.s)
              st = EwmaState(s2, st.n + 1L, st.a + (if (alert) 1L else 0L),
                math.max(st.lastMs, e.ts.getTime))
            }
            state.update(st)
            state.setTimeoutTimestamp(st.lastMs, watermark)
            Iterator.single(
              KeyReport(key, st.n, math.floor(st.s * 1e6).toLong, st.a))
          }
      }
  }
}
