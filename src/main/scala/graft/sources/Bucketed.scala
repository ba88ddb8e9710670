package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table helpers: pre-partition fact tables on their join/dedup keys
 * so repeated joins and aggregations are CO-LOCATED — Spark reads matching
 * buckets side by side and the Exchange disappears from the plan. At 100 TB
 * this converts every recurring key-join from a full shuffle into a local
 * merge; pay the bucketing once at write time, reuse it every query.
 *
 * (Bucketing metadata lives in the session catalog, so these write through
 * `saveAsTable`; plain parquet paths cannot carry bucket specs.)
 */
object Bucketed {

  /** Write `df` as a parquet-backed bucketed (and bucket-sorted) table. */
  def writeBucketed(
      df: DataFrame, table: String, numBuckets: Int, keyCol: String, moreKeys: String*): Unit =
    df.write
      .format("parquet")
      .bucketBy(numBuckets, keyCol, moreKeys: _*)
      .sortBy(keyCol, moreKeys: _*)
      .mode("overwrite")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True when the physical plan contains no shuffle exchange — the
   * co-location check for joins/aggregations over bucketed inputs.
   * Walks the plan (recursing into AQE's dynamically-planned subtree)
   * rather than string-matching, so AdaptiveSparkPlan/AQEShuffleRead
   * renderings can't mask an exchange. */
  def isShuffleFree(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def hasShuffle(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => hasShuffle(a.executedPlan)
      case q: QueryStageExec => hasShuffle(q.plan) // leaf node wrapping a materialized stage
      case _: ShuffleExchangeLike => true
      case other => other.children.exists(hasShuffle)
    }
    !hasShuffle(df.queryExecution.executedPlan)
  }
}
