package graft

import graft.rules._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §5/§7. */
object SparkEntry {

  /** Shared demo DQ suite over lineitem: bool rules, int-token rule,
   * probability rule — exercises coercion + overall fold. */
  def lineitemSuite: RuleSuite = RuleSuite(
    Id(1, 1),
    Seq(
      RuleSet(Id(10, 1), Seq(
        Rule(Id(100, 1), "l_quantity <= 50"),
        Rule(Id(101, 1), "l_extendedprice > 0"))),
      RuleSet(Id(20, 1), Seq(
        Rule(Id(200, 1), "CASE WHEN l_discount <= 0.06 THEN 1 ELSE -1 END"),
        Rule(Id(201, 1), "CASE WHEN l_tax < 0.04 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.5 AS DOUBLE) END")))))

  private def lineitem(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RuleRunner
      .addDataQuality(lineitem(spark, "/root/testdata/sf0.001"), lineitemSuite)
      .select(explode(RuleRunner.flattenResults(col("DataQuality"))).as("r"))
      .select("r.*")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_flatten" -> ((s, dir) => {
      RuleRunner.addDataQuality(lineitem(s, dir), lineitemSuite)
        .select(explode(RuleRunner.flattenResults(col("DataQuality"))).as("r"))
        .groupBy(col("r.ruleId").as("ruleId"), col("r.ruleResult").as("ruleResult"))
        .agg(count(lit(1)).as("cnt"))
    }),
    "q_dq_overall" -> ((s, dir) => {
      RuleRunner.addDataQuality(lineitem(s, dir), lineitemSuite)
        .groupBy(col("DataQuality.overallResult").as("overallResult"))
        .agg(count(lit(1)).as("cnt"))
    }))

  /** DuckDB oracle SQL per query (same parquet tables). */
  def oracleSql: Map[String, String] = Map(
    "q_dq_flatten" ->
      """WITH r AS (
        |  SELECT 100 AS ruleId, CASE WHEN l_quantity <= 50 THEN 100000 ELSE 0 END AS ruleResult FROM lineitem
        |  UNION ALL SELECT 101, CASE WHEN l_extendedprice > 0 THEN 100000 ELSE 0 END FROM lineitem
        |  UNION ALL SELECT 200, CASE WHEN l_discount <= 0.06 THEN 100000 ELSE -1 END FROM lineitem
        |  UNION ALL SELECT 201, CASE WHEN l_tax < 0.04 THEN 100000 ELSE 50000 END FROM lineitem
        |) SELECT ruleId, ruleResult, count(*) AS cnt FROM r GROUP BY 1, 2""".stripMargin,
    "q_dq_overall" ->
      """SELECT CASE WHEN l_quantity <= 50 AND l_extendedprice > 0 AND l_tax < 0.04
        |            THEN 100000 ELSE 0 END AS overallResult,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY 1""".stripMargin)
}
