package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization: consecutive events of the same key belong to one
 * session until the inter-event gap exceeds `maxGap`. One window pass —
 * shuffle on the key, partition-local sort by time, running sum over the
 * gap-break flags. The standard event-pipeline operator; at 100 TB it costs
 * exactly one sort-merge per key like any windowed aggregation.
 */
object Sessionize {

  /** Adds `session_seq` (0-based per key) and `session_id`
   * (key-independent: xxhash of key + seq). `gapCol` units must match
   * `maxGap` (e.g. epoch seconds with a gap in seconds). */
  def addSessions(
      df: DataFrame, keyCol: String, tsCol: String, maxGap: Long,
      seqName: String = "session_seq", idName: String = "session_id"): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val break = when(
      col(tsCol) - lag(col(tsCol), 1).over(byKey) > maxGap, 1L).otherwise(0L)
    df.withColumn(seqName,
        sum(break).over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn(idName, xxhash64(col(keyCol), col(seqName)))
  }

  /** Per-session summary: event count, start/end, duration. */
  def sessionStats(
      df: DataFrame, keyCol: String, tsCol: String, maxGap: Long): DataFrame =
    addSessions(df, keyCol, tsCol, maxGap)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        count(lit(1)).as("events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (max(col(tsCol)) - min(col(tsCol))).as("duration"))
}
