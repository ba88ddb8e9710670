package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * CSV/TSV ingest with corrupt-record quarantine — the third leg of the
 * front door next to [[Jsonl]] and [[Warc]] (index dumps, metadata
 * sidecars and label files arrive as headerless TSV/CSV at corpus scale;
 * the Common Crawl URL index is exactly this shape). Same contract as the
 * other two: a malformed line (wrong arity, a non-numeric value in a
 * numeric field, truncation) never silently drops — it lands in the
 * quarantine frame verbatim.
 *
 * Built on a text scan + the `from_csv` EXPRESSION rather than
 * `spark.read.csv` for the same reason [[Jsonl]] avoids `spark.read.json`:
 * the csv source refuses plans referencing only its corrupt-record column
 * (the documented workaround is caching the whole parse), while the
 * expression carries the raw line through any projection — both frames
 * stay plain narrow pipelines over line scans. Headerless files only (the
 * corpus-scale norm; a header line would simply quarantine, loudly).
 *
 * Scale: text scans split by line across executors; one codegen'd parse
 * per line; schema REQUIRED (inference double-scans, banned at ingest).
 */
object Csv {

  val CorruptCol = "graft_corrupt_record"

  private def parsed(
      spark: SparkSession, path: String, schema: StructType,
      delimiter: String): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not define $CorruptCol")
    val withCorrupt = StructType(
      schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    spark.read.text(path)
      .select(col("value"), from_csv(col("value"),
        withCorrupt,
        Map("mode" -> "PERMISSIVE", "sep" -> delimiter,
          "columnNameOfCorruptRecord" -> CorruptCol)).as("graft_c"))
  }

  /** (well-formed rows in `schema`, corrupt raw lines) — each side a plain
   * narrow pipeline over the line scan. */
  def read(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ","): (DataFrame, DataFrame) = {
    val p = parsed(spark, path, schema, delimiter)
    val ok = col("graft_c").isNotNull && col(s"graft_c.$CorruptCol").isNull
    val rows = p.where(ok)
      .select(schema.fieldNames.map(f => col(s"graft_c.$f").as(f)).toSeq: _*)
    val corrupt = p.where(!ok || col("graft_c").isNull)
      .select(col("value").as("raw_line"))
    (rows, corrupt)
  }

  /** Ingest telemetry in one pass: (total, ok, corrupt) line counts. */
  def readStats(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ","): DataFrame = {
    val p = parsed(spark, path, schema, delimiter)
    val ok = col("graft_c").isNotNull && col(s"graft_c.$CorruptCol").isNull
    p.agg(
      count(lit(1)).as("total_lines"),
      count(when(ok, 1)).as("ok_lines"),
      count(when(!ok or col("graft_c").isNull, 1)).as("corrupt_lines"))
  }
}
