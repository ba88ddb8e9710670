package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Scalable exact global ranking — the shared shape behind
 * [[Linkage.sortedNeighborhood]] and the concentration/Gini report: a
 * range repartition on the order key puts contiguous key ranges in
 * ordered partitions, per-partition row_numbers are offset by the
 * partition row counts (a frame with ONE ROW PER PARTITION —
 * cluster-sized, not data-sized), and no single-partition window ever
 * touches the data. The rank is a pure function of the order columns'
 * total order; pass a unique tie-break column to make it deterministic.
 */
object Ranks {

  /** Adds `rankCol` (1-based, dense in the row sense) ordering by
   * `orderCols` lexicographically. All other columns pass through.
   *
   * The ranged frame is MATERIALIZED (persist) before the per-partition
   * ranks and the partition-count offsets both read it: the two branches
   * must see the SAME partition assignment, and without the persist that
   * holds only while Catalyst's ReuseExchange collapses the two
   * exchanges — with reuse disabled (or the plans canonicalizing apart)
   * each branch would re-sample its own range boundaries and
   * spark_partition_id could differ between them, silently corrupting
   * ranks. One data-sized write+2 reads replaces two full range sorts.
   *
   * CACHE LIFECYCLE: the persisted ranged frame stays in the session's
   * storage until the session ends or `spark.catalog.clearCache()` runs —
   * the result is lazy, so this method cannot know when downstream has
   * materialized and it is safe to unpersist. One entry per call is fine
   * for job-shaped applications (the bench harness clears between suite
   * passes); a long-running service ranking many frames should use
   * [[withGlobalRankHandle]] and release each cache once its output is
   * materialized. */
  def withGlobalRank(df: DataFrame, rankCol: String, orderCols: Column*): DataFrame =
    withGlobalRankHandle(df, rankCol, orderCols: _*)._1

  /** [[withGlobalRank]] plus an unpersist handle: call the returned
   * thunk AFTER materializing the ranked result (write/collect/count) to
   * release the internal MEMORY_AND_DISK cache entry. Releasing earlier
   * is safe for liveness but re-exposes the recompute-divergence risk
   * the persist exists to close — don't. */
  def withGlobalRankHandle(df: DataFrame, rankCol: String,
      orderCols: Column*): (DataFrame, () => Unit) = {
    require(orderCols.nonEmpty, "at least one order column is required")
    val keyed = df
      .repartitionByRange(orderCols: _*)
      .withColumn("graft_rk_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val local = keyed.withColumn("graft_rk_lr",
      row_number().over(Window.partitionBy(col("graft_rk_pid"))
        .orderBy(orderCols: _*)))
    val offsets = keyed.groupBy(col("graft_rk_pid"))
      .agg(count(lit(1)).as("graft_rk_cnt"))
      .withColumn("graft_rk_off", coalesce(
        sum(col("graft_rk_cnt")).over(Window.orderBy(col("graft_rk_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("graft_rk_pid"), col("graft_rk_off"))
    val ranked = local.join(broadcast(offsets), Seq("graft_rk_pid"))
      .withColumn(rankCol, col("graft_rk_off") + col("graft_rk_lr"))
      .drop("graft_rk_pid", "graft_rk_lr", "graft_rk_off", "graft_rk_cnt")
    (ranked, () => { keyed.unpersist(blocking = false); () })
  }

}
