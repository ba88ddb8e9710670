package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Per-key time-grid regularization with gap fill — the step between raw
 * event streams and anything that assumes regular sampling (rate/drift
 * telemetry, control charts, seasonality models, feature windows):
 * bucket each key's events onto a fixed grid, materialize the MISSING
 * buckets between that key's first and last observation, and fill them.
 *
 * Bucket reducer is `max` — order-independent and exact, so results
 * hash-match any engine (an avg would sum doubles in partition order and
 * drift in the last bits). Fill modes: `locf` (last observation carried
 * forward), `zero`, `null`. Every row carries `filled` marking
 * synthesized buckets.
 *
 * Scale shape: one bucket aggregate (map-side combining), one per-key
 * min/max aggregate, grid synthesis via sequence+explode (rows bounded by
 * key-count × span/step, NOT corpus size), one left join back, and for
 * locf a per-key window ordered by bucket — each partition is one key's
 * grid, bounded by its time span; a million keys parallelize, a single
 * key's partition never exceeds span/step rows.
 */
object GapFill {

  def gapFill(df: DataFrame, keyCol: Column, tsCol: Column, valueCol: Column,
      stepSeconds: Long, fill: String = "locf"): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    require(Set("locf", "zero", "null")(fill), s"unknown fill mode '$fill'")
    val step = lit(stepSeconds)
    val bucket = (floor(unix_timestamp(tsCol) / step) * step).cast("long")
    val actual = df
      .where(keyCol.isNotNull && tsCol.isNotNull)
      .select(keyCol.as("key"), bucket.as("bucket_ts"), valueCol.as("graft_v"))
      .groupBy(col("key"), col("bucket_ts"))
      .agg(max(col("graft_v")).as("graft_v"))
    val grids = actual.groupBy(col("key"))
      .agg(min(col("bucket_ts")).as("graft_lo"), max(col("bucket_ts")).as("graft_hi"))
      .select(col("key"),
        explode(sequence(col("graft_lo"), col("graft_hi"), step)).as("bucket_ts"))
    val joined = grids.join(actual, Seq("key", "bucket_ts"), "left")
      .withColumn("filled", col("graft_v").isNull)
    val valued = fill match {
      case "null" => joined.withColumn("value", col("graft_v"))
      case "zero" => joined.withColumn("value", coalesce(col("graft_v"), lit(0.0)))
      case "locf" =>
        val w = Window.partitionBy(col("key")).orderBy(col("bucket_ts"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        joined.withColumn("value", last(col("graft_v"), ignoreNulls = true).over(w))
    }
    valued.select(col("key"), col("bucket_ts"), col("value"), col("filled"))
  }
}
