package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * Apache Common/Combined Log Format ingest — the fourth leg of the front
 * door next to [[Jsonl]], [[Warc]] and [[Csv]]: access logs are how crawl
 * infrastructure, CDN edges and origin servers describe what was actually
 * fetched, and feeding them back into the pipeline (recrawl scheduling,
 * host budgets, status-code health) starts with a reliable line parse.
 *
 * Same quarantine contract as the other three: a malformed line never
 * silently drops — it lands in the quarantine frame verbatim. One anchored
 * regex (Java ∩ RE2 subset, DuckDB-replicable) recognizes both the
 * 7-field common form and the 9-field combined form (referer/user-agent
 * null when absent); the timestamp parses strictly
 * (`dd/MMM/yyyy:HH:mm:ss Z`) and is ALSO surfaced as `ts_epoch` so
 * downstream joins don't depend on session-timezone rendering.
 *
 * Scale: text scans split by line; per-line work is a fixed set of
 * codegen'd regexp/extract expressions — no UDF, no shuffle. A bad
 * timestamp inside an otherwise well-shaped line quarantines too (the
 * parse is the contract, not the shape).
 */
object Clf {

  /** Anchored CLF recognizer; groups: 1 host, 2 ident, 3 authuser, 4 ts,
   * 5 method, 6 path, 7 protocol, 8 status, 9 bytes, 10 referer, 11 ua. */
  val LineRe: String =
    "^(\\S+) (\\S+) (\\S+) \\[([^\\]]+)\\] \"([A-Z]+) ([^ \"]+) (HTTP/[0-9.]+)\" " +
      "([0-9]{3}) (-|[0-9]{1,18})(?: \"([^\"]*)\" \"([^\"]*)\")?$"

  private val TsFormat = "dd/MMM/yyyy:HH:mm:ss Z"

  private def g(line: Column, i: Int): Column = regexp_extract(line, LineRe, i)

  private def parsedCols(line: Column): Seq[Column] = Seq(
    g(line, 1).as("host"),
    nullIfDash(g(line, 2)).as("ident"),
    nullIfDash(g(line, 3)).as("authuser"),
    // try_to_timestamp: a bad timestamp must quarantine, not throw (ANSI)
    unix_timestamp(try_to_timestamp(g(line, 4), lit(TsFormat))).as("ts_epoch"),
    g(line, 5).as("method"),
    g(line, 6).as("path"),
    g(line, 7).as("protocol"),
    g(line, 8).cast("int").as("status"),
    when(g(line, 9) === "-", lit(null).cast("long"))
      .otherwise(g(line, 9).cast("long")).as("bytes"),
    nullIfEmpty(g(line, 10)).as("referer"),
    nullIfEmpty(g(line, 11)).as("user_agent"))

  private def nullIfDash(c: Column): Column =
    when(c === "-", lit(null).cast("string")).otherwise(c)
  private def nullIfEmpty(c: Column): Column =
    when(c === "", lit(null).cast("string")).otherwise(c)

  /** (parsed rows, quarantined raw lines). A line quarantines when the
   * shape regex fails OR its timestamp doesn't parse. */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val lines = spark.read.text(path)
    val shaped = lines.where(col("value").rlike(LineRe))
      .select(parsedCols(col("value")) :+ col("value"): _*)
    val rows = shaped.where(col("ts_epoch").isNotNull).drop("value")
    val badTs = shaped.where(col("ts_epoch").isNull).select(col("value").as("raw_line"))
    val badShape = lines.where(!col("value").rlike(LineRe))
      .select(col("value").as("raw_line"))
    (rows, badShape.unionAll(badTs))
  }

  /** Ingest telemetry in one pass: (total, ok, corrupt) line counts. */
  def readStats(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
    val okExpr = col("value").rlike(LineRe) &&
      try_to_timestamp(regexp_extract(col("value"), LineRe, 4), lit(TsFormat)).isNotNull
    lines.agg(
      count(lit(1)).as("total_lines"),
      count(when(okExpr, 1)).as("ok_lines"),
      count(when(!okExpr, 1)).as("corrupt_lines"))
  }
}
