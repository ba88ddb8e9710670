package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * EWMA control-chart anomaly detection over per-key event sequences —
 * the classic telemetry question (is this user's / host's / pipeline
 * stage's metric drifting off its own recent behavior?) answered with an
 * exponentially-weighted moving average and a fixed alert band, exactly
 * and deterministically.
 *
 * The recursion `s ← s + α·(x − s)` is ORDER-SENSITIVE, so it cannot be a
 * combining aggregate; instead each key's (bounded) event sequence is
 * collected, sorted by the caller's order key, and folded with the
 * codegen'd `aggregate` higher-order function — one shuffle on the key,
 * one sequential fold per key, no window over the corpus and no UDF. The
 * per-key collect is the documented bound: sequences are sessions /
 * per-entity telemetry (thousands of events), not corpora; for unbounded
 * keys use the streaming face ([[graft.streaming.StreamingAnomaly]]),
 * which carries the same state incrementally.
 *
 * Pick α an exact binary fraction (0.25, 0.125) and the fold replays
 * bit-for-bit anywhere IEEE doubles do — the DuckDB oracle reproduces
 * every value with `list_reduce`.
 *
 * Output per key: n_events, ewma_fp (fixed-point ×10⁶ floor), n_alerts
 * (events landing outside ±band of the PRIOR smoothed value; the first
 * event seeds the average and never alerts).
 */
object Anomaly {

  def ewmaAnomalies(
      df: DataFrame, keyCol: Column, orderCol: Column, valueCol: Column,
      alpha: Double, band: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(band > 0, s"band must be positive, got $band")
    val evs = df
      .select(keyCol.as("key"), orderCol.as("graft_o"),
        valueCol.cast("double").as("graft_v"))
      .groupBy(col("key"))
      .agg(sort_array(collect_list(struct(col("graft_o"), col("graft_v")))).as("graft_evs"))
    val folded = aggregate(
      col("graft_evs"),
      struct(lit(null).cast("double").as("s"), lit(0L).as("n"), lit(0L).as("a")),
      (acc, e) => {
        val v = e.getField("graft_v")
        val s = acc.getField("s")
        val alert = s.isNotNull && abs(v - s) > band
        struct(
          when(s.isNull, v).otherwise(s + lit(alpha) * (v - s)).as("s"),
          (acc.getField("n") + 1L).as("n"),
          (acc.getField("a") + when(alert, 1L).otherwise(0L)).as("a"))
      })
    evs.select(col("key"),
        folded.getField("n").as("n_events"),
        floor(folded.getField("s") * lit(1e6)).cast("long").as("ewma_fp"),
        folded.getField("a").as("n_alerts"))
  }
}
