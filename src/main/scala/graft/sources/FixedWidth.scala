package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * Fixed-width (column-position) file ingest — the fifth leg of the front
 * door next to [[Jsonl]], [[Warc]], [[Csv]] and [[Clf]]: mainframe
 * extracts, bank/exchange feeds and legacy ERP dumps carry no delimiters
 * at all; every field lives at a byte range of the line.
 *
 * Same quarantine contract as the other four — a malformed line never
 * silently drops, it lands in the quarantine frame verbatim. A line
 * quarantines when it is SHORTER than the spec's extent, or when any
 * non-blank typed field fails its cast (`try_cast` — ANSI-safe). A field
 * that is all blanks is NULL, not an error (the standard fixed-width
 * convention for optional fields).
 *
 * Scale: text scans split by line; per-line work is a fixed set of
 * codegen'd substring/trim/try_cast expressions — no UDF, no shuffle, no
 * regex.
 */
object FixedWidth {

  /** One field: 1-based inclusive `start`, `length` chars, target type. */
  case class Field(name: String, start: Int, length: Int, dataType: DataType = StringType) {
    require(start >= 1 && length >= 1, s"bad field geometry for $name")
    def end: Int = start + length - 1
  }

  private def rawOf(f: Field): Column =
    trim(substring(col("value"), f.start, f.length))

  private def typedOf(f: Field): Column = {
    val raw = rawOf(f)
    val v = f.dataType match {
      case StringType => when(raw === "", lit(null).cast(StringType)).otherwise(raw)
      case dt => when(raw === "", lit(null).cast(dt))
        .otherwise(expr(s"try_cast(trim(substring(value, ${f.start}, ${f.length})) AS ${dt.sql})"))
    }
    v.as(f.name)
  }

  /** True when the non-blank raw value fails its typed cast. */
  private def badOf(f: Field): Column = f.dataType match {
    case StringType => lit(false)
    case _ => rawOf(f) =!= "" && typedOf(f).isNull
  }

  /** (parsed rows, quarantined raw lines). */
  def read(spark: SparkSession, path: String, fields: Seq[Field]): (DataFrame, DataFrame) = {
    require(fields.nonEmpty, "at least one field is required")
    val extent = fields.map(_.end).max
    val lines = spark.read.text(path)
    val ok = length(col("value")) >= extent &&
      !fields.map(badOf).reduce(_ || _)
    (lines.where(ok).select(fields.map(typedOf): _*),
      lines.where(!ok).select(col("value").as("raw")))
  }

  /** One-row ingest telemetry: total/ok/corrupt line counts. */
  def readStats(spark: SparkSession, path: String, fields: Seq[Field]): DataFrame = {
    val extent = fields.map(_.end).max
    val ok = length(col("value")) >= extent &&
      !fields.map(badOf).reduce(_ || _)
    spark.read.text(path).agg(
      count(lit(1)).as("total_lines"),
      count(when(ok, 1)).as("ok_lines"),
      count(when(!ok, 1)).as("corrupt_lines"))
  }
}
