package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Per-client traffic profiling over access-log-shaped frames (what
 * [[graft.sources.Clf]] parses) — the crawl-infrastructure view of WHO is
 * fetching: separate declared bots, metronomic schedulers and hammering
 * clients from organic traffic before computing host budgets or abuse
 * blocks.
 *
 * Signals per client, all exact or fixed-point (oracle-replayable):
 *  - volume: n_requests, distinct paths, robots.txt hits, error ppm;
 *  - cadence: inter-arrival gaps from a per-client lag window ordered by
 *    (ts, path) — tie-stable because equal sort keys produce the same gap
 *    multiset under any tie order; cv²·1e6 of the gaps distinguishes a
 *    metronomic scheduler (cv² ≈ 0) from humans (cv² ≈ 1 for Poisson-ish
 *    arrivals); the cv² arithmetic runs in doubles computed from exact
 *    integer sums in one fixed op order, then floors;
 *  - declaration: UA substring match for self-identifying agents.
 *
 * Flags and score are transparent integer arithmetic, not a model: a
 * client is `metronomic` when cv² ≤ 1% over ≥ 10 requests, `hammering`
 * when the mean gap is under 2 s over ≥ 30 requests. The per-client
 * window partitions by client — bounded by one client's request count,
 * parallel across clients (the [[graft.operators.Sessionize]] shape).
 */
object Traffic {

  val BotUaRe = "(?i)(bot|crawler|spider|scrapy|curl|wget|python-requests)"

  def botReport(df: DataFrame, clientCol: Column, tsEpochCol: Column,
      pathCol: Column, statusCol: Column, uaCol: Column): DataFrame = {
    val base = df.select(clientCol.as("client"), tsEpochCol.cast("long").as("graft_ts"),
        pathCol.as("graft_path"), statusCol.cast("int").as("graft_st"),
        uaCol.as("graft_ua"))
      .where(col("client").isNotNull && col("graft_ts").isNotNull)
    val w = Window.partitionBy(col("client")).orderBy(col("graft_ts"), col("graft_path"))
    val withGap = base.withColumn("graft_gap",
      col("graft_ts") - lag(col("graft_ts"), 1).over(w))
    val agg = withGap.groupBy(col("client")).agg(
      count(lit(1)).as("n_requests"),
      countDistinct(col("graft_path")).as("distinct_paths"),
      count(when(col("graft_path") === "/robots.txt", 1)).as("robots_hits"),
      count(when(col("graft_st") >= 400, 1)).as("errors"),
      max(col("graft_ua").rlike(BotUaRe)).as("declared_bot"),
      count(col("graft_gap")).as("graft_m"),
      sum(col("graft_gap")).as("graft_sum"),
      sum(col("graft_gap") * col("graft_gap")).as("graft_sumsq"))
    val m = col("graft_m").cast("double")
    val s = col("graft_sum").cast("double")
    val s2 = col("graft_sumsq").cast("double")
    val cv2 = floor((m * s2 - s * s) / (s * s) * lit(1e6)).cast("long")
    agg.select(col("client"), col("n_requests"), col("distinct_paths"),
        col("robots_hits"),
        expr("errors * 1000000L div nullif(n_requests, 0L)").as("err_ppm"),
        col("declared_bot"),
        when(col("graft_m") >= 1,
            floor(col("graft_sum") / col("graft_m")).cast("long"))
          .otherwise(lit(null).cast("long")).as("mean_gap_s"),
        when(col("graft_sum") > 0, cv2).otherwise(lit(null).cast("long")).as("cv2_ppm"))
      .withColumn("metronomic",
        coalesce(col("cv2_ppm") <= 10000L && col("n_requests") >= 10L, lit(false)))
      .withColumn("hammering",
        coalesce(col("mean_gap_s") < 2L && col("n_requests") >= 30L, lit(false)))
      .withColumn("bot_score_ppm",
        when(col("declared_bot"), lit(500000L)).otherwise(lit(0L)) +
          when(col("metronomic"), lit(300000L)).otherwise(lit(0L)) +
          when(col("hammering"), lit(200000L)).otherwise(lit(0L)))
  }
}
