package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * JSONL crawl-dump ingest with corrupt-record quarantine — the file format
 * a web corpus actually arrives in (one JSON document per line, often
 * gzipped, frequently with truncated or malformed lines from interrupted
 * crawlers). Silent row drops at the front door are corpus-integrity bugs:
 * this reader makes every malformed line LOUD instead.
 *
 * Built on a text scan + `from_json` rather than `spark.read.json`:
 * Spark's json source refuses plans that reference only its corrupt-record
 * column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the
 * documented workaround is caching the whole parse, unacceptable at
 * ingest volume). As an expression, the parse carries the corrupt line
 * through any projection: both the rows frame and the quarantine frame
 * are plain narrow pipelines over line scans, no cache, no restriction.
 *
 * Scale: text scans split by line across executors (gzip parallelizes
 * per-file); `from_json` is one codegen'd parse per line. Schema is
 * REQUIRED — inference would scan the corpus twice and is banned here.
 */
object Jsonl {

  val CorruptCol = "graft_corrupt_record"

  private def parsed(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not define $CorruptCol")
    val withCorrupt = StructType(
      schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    spark.read.text(path)
      .select(col("value"), from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)).as("graft_j"))
  }

  /** (well-formed rows in `schema`, corrupt raw lines) — each side a plain
   * narrow pipeline over the line scan. */
  def read(spark: SparkSession, path: String, schema: StructType): (DataFrame, DataFrame) = {
    val p = parsed(spark, path, schema)
    val ok = col("graft_j").isNotNull && col(s"graft_j.$CorruptCol").isNull
    val rows = p.where(ok)
      .select(schema.fieldNames.map(f => col(s"graft_j.$f").as(f)).toSeq: _*)
    val corrupt = p.where(!ok || col("graft_j").isNull)
      .select(col("value").as("raw_line"))
    (rows, corrupt)
  }

  /** Ingest telemetry in one pass: (total, ok, corrupt) line counts. */
  def readStats(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val p = parsed(spark, path, schema)
    val ok = col("graft_j").isNotNull && col(s"graft_j.$CorruptCol").isNull
    p.agg(
      count(lit(1)).as("total_lines"),
      count(when(ok, 1)).as("ok_lines"),
      count(when(!ok or col("graft_j").isNull, 1)).as("corrupt_lines"))
  }
}
