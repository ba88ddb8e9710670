package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/**
 * Per-key token-bucket rate limiting on a live stream — the ENFORCEMENT
 * half of the politeness story: [[graft.pipeline.Frontier]] plans a
 * polite schedule ahead of time; this gate decides, request by request,
 * whether an event is inside its key's budget (`allowed`) or over it
 * (`throttled`), with bursts absorbed up to the bucket capacity. The
 * same primitive rate-limits per-client API traffic and per-host fetch
 * streams.
 *
 * Token bucket in MICRO-tokens (integer arithmetic — the refill is
 * elapsed_ms × rate_per_sec, exactly reproducible): each key's bucket
 * starts full at `burst` tokens; an event spends one token if available,
 * otherwise it is marked throttled (nothing is dropped — downstream
 * decides). Refill accrues with event-time gaps, clamped at `burst`, and
 * never negative (a late event refills nothing but still gets judged
 * against the current bucket).
 *
 * Scale: O(batch) per trigger, O(keys) state, event-time timeout retires
 * idle keys — the [[StreamingAnomaly]] posture. In-batch events fold in
 * event-time order (tiebreak on the payload id); cross-trigger order is
 * the watermark's job, as with sessionization. Parity with a scalar
 * fold of the full prefix is spec-pinned.
 */
object StreamingThrottle {

  final case class Req(key: Long, ts: java.sql.Timestamp, id: Long)
  final case class BucketState(microTokens: Long, lastMs: Long)
  final case class Decision(key: Long, id: Long, allowed: Boolean)

  /** @param ratePerSec tokens refilled per second of event time
   *  @param burst bucket capacity in whole tokens (also the initial fill) */
  def tokenBucket(
      stream: DataFrame, keyCol: String, tsCol: String, idCol: String,
      watermark: String, ratePerSec: Long, burst: Long): Dataset[Decision] = {
    require(ratePerSec >= 1, s"ratePerSec must be >= 1, got $ratePerSec")
    require(burst >= 1, s"burst must be >= 1, got $burst")
    val spark = stream.sparkSession
    import spark.implicits._
    val capMicro = burst * 1000000L
    // any gap beyond this already fills the bucket; capping the elapsed
    // time BEFORE the multiply keeps refill = gap*rate*1000 inside Long
    // (uncapped, ratePerSec ~1e7 times a weeks-long idle gap overflows
    // negative and wrongly throttles)
    val refillCapMs = capMicro / (ratePerSec * 1000L) + 1L
    stream
      .withWatermark(tsCol, watermark)
      .select(col(keyCol).cast("long").as("key"), col(tsCol).as("ts"),
        col(idCol).cast("long").as("id"))
      .as[Req]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[Req], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toArray.sortBy(r => (r.ts.getTime, r.id))
            var st = state.getOption.getOrElse(BucketState(capMicro, Long.MinValue))
            val out = sorted.map { r =>
              val t = r.ts.getTime
              val refill =
                if (st.lastMs == Long.MinValue) 0L
                else math.min(math.max(0L, t - st.lastMs), refillCapMs) * ratePerSec * 1000L
              val filled = math.min(capMicro, st.microTokens + refill)
              val allowed = filled >= 1000000L
              st = BucketState(
                if (allowed) filled - 1000000L else filled,
                math.max(st.lastMs, t))
              Decision(key, r.id, allowed)
            }
            state.update(st)
            state.setTimeoutTimestamp(st.lastMs, watermark)
            out.iterator
          }
      }
  }

  /** Batch twin: the same fold over a bounded frame (per-key sequential
   * scan — baskets bounded by the sessionization contract). The parity
   * spec pins streamed == batch on the full prefix. */
  def tokenBucketBatch(
      df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      ratePerSec: Long, burst: Long): DataFrame = {
    require(ratePerSec >= 1 && burst >= 1, "ratePerSec and burst must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val capMicro = burst * 1000000L
    val refillCapMs = capMicro / (ratePerSec * 1000L) + 1L
    df.select(col(keyCol).cast("long").as("key"), col(tsCol).as("ts"),
        col(idCol).cast("long").as("id"))
      .as[Req]
      .groupByKey(_.key)
      .flatMapGroups { (key: Long, rows: Iterator[Req]) =>
        var tokens = capMicro
        var lastMs = Long.MinValue
        rows.toArray.sortBy(r => (r.ts.getTime, r.id)).iterator.map { r =>
          val t = r.ts.getTime
          val refill =
            if (lastMs == Long.MinValue) 0L
            else math.min(math.max(0L, t - lastMs), refillCapMs) * ratePerSec * 1000L
          val filled = math.min(capMicro, tokens + refill)
          val allowed = filled >= 1000000L
          tokens = if (allowed) filled - 1000000L else filled
          lastMs = math.max(lastMs, t)
          Decision(key, r.id, allowed)
        }
      }.toDF()
  }
}
