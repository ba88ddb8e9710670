package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.SerializableConfiguration

/**
 * File-level corrupt-shard quarantine for columnar tables — the third leg
 * of the ingest front door. [[Jsonl]]/[[Csv]]/[[Warc]] quarantine at ROW
 * granularity because their formats fail per record; parquet/ORC fail per
 * FILE (a truncated upload, a half-written shard from a preempted
 * executor, a shard from a writer with a drifted schema). At 100 TB a
 * table is ~10^5 shards and the two stock answers are both wrong:
 * default behavior aborts the whole read on the one bad footer;
 * `spark.sql.files.ignoreCorruptFiles` silently drops data — the exact
 * corpus-integrity bug the row-level readers exist to prevent.
 *
 * [[probe]] reads every shard's metadata tail (parquet footer / ORC
 * postscript) ON EXECUTORS — the file list parallelizes like any dataset,
 * so a 10^5-shard audit is one short all-cluster wave, not a driver loop —
 * and returns one row per file: readable?, row count, byte size, Spark
 * schema DDL, error. [[read]] then scans ONLY the readable,
 * schema-compatible files (explicit per-file list to the normal
 * vectorized reader, so pushdown/pruning are untouched) and returns the
 * quarantine manifest beside the rows — bad shards are LOUD, good shards
 * still read, the job never aborts.
 *
 * Schema drift counts as quarantine, not merge fodder: a shard missing an
 * expected field (or carrying it at another type) would surface as silent
 * NULLs under `mergeSchema`; here it lands in the manifest with
 * `error = schema_drift:…`. Extra columns are fine — the projection
 * prunes them.
 */
object Shards {

  /** One row per data file under `dir` (non-recursive, `_`/`.` files
   * skipped): (path, bytes, ok, rows, schema_ddl, error). Footer probes
   * run distributed via mapPartitions — per-file imperative IO, the
   * documented exception where the RDD layer is the right tool. */
  def probe(spark: SparkSession, dir: String, format: String = "parquet"): DataFrame = {
    import spark.implicits._
    require(format == "parquet" || format == "orc", s"unsupported format $format")
    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf.value)
    val files = fs.listStatus(root)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(s => (s.getPath.toString, s.getLen))
    val fmt = format
    spark.createDataset(files.toSeq)
      .repartition(math.min(files.length max 1, 2 * spark.sparkContext.defaultParallelism))
      .mapPartitions { it =>
        val c = conf.value
        it.map { case (path, bytes) =>
          val (ok, rows, ddl, err) =
            try {
              val (r, s) = if (fmt == "parquet") probeParquet(c, path)
                           else probeOrc(c, path)
              (true, r, s.toDDL, null: String)
            } catch { case e: Throwable =>
              (false, -1L, null: String,
                s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
            }
          (path, bytes, ok, rows, ddl, err)
        }
      }.toDF("path", "bytes", "ok", "rows", "schema_ddl", "error")
  }

  private def probeParquet(conf: org.apache.hadoop.conf.Configuration,
      path: String): (Long, StructType) = {
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      conf, new org.apache.hadoop.fs.Path(path),
      org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
    var rows = 0L
    footer.getBlocks.forEach(b => rows += b.getRowCount)
    val schema = new org.apache.spark.sql.execution.datasources.parquet
      .ParquetToSparkSchemaConverter()
      .convert(footer.getFileMetaData.getSchema)
    (rows, schema)
  }

  private def probeOrc(conf: org.apache.hadoop.conf.Configuration,
      path: String): (Long, StructType) = {
    val reader = org.apache.orc.OrcFile.createReader(
      new org.apache.hadoop.fs.Path(path),
      org.apache.orc.OrcFile.readerOptions(conf))
    try {
      val dt = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseDataType(reader.getSchema.toString)
      (reader.getNumberOfRows, dt.asInstanceOf[StructType])
    } finally reader.close()
  }

  /** (rows read from every healthy shard, quarantine manifest). The rows
   * side passes the explicit good-file list to the stock vectorized
   * reader with the expected schema — pushdown, pruning and codegen are
   * exactly what a plain `spark.read` gets; the manifest carries every
   * unreadable or schema-drifted file with its reason. */
  def read(spark: SparkSession, dir: String, expected: StructType,
      format: String = "parquet"): (DataFrame, DataFrame) = {
    val probed = probe(spark, dir, format)
    // schema compatibility is decided from the probe's DDL on the driver:
    // the manifest is O(files) — tiny next to the data — and the verdict
    // needs file names anyway. Collect is bounded by the shard count.
    val rows = probed.select("path", "ok", "schema_ddl", "error").collect()
    val (good, bad) = rows.partition { r =>
      r.getBoolean(1) && {
        val ddl = r.getString(2)
        val actual = try StructType.fromDDL(ddl) catch { case _: Exception => null }
        actual != null && expected.fields.forall { f =>
          actual.fields.exists(a =>
            a.name.equalsIgnoreCase(f.name) && a.dataType == f.dataType)
        }
      }
    }
    import spark.implicits._
    val manifest = spark.createDataset(bad.toSeq.map { r =>
      val reason =
        if (!r.getBoolean(1)) r.getString(3)
        else s"schema_drift: file has [${r.getString(2)}], expected [${expected.toDDL}]"
      (r.getString(0), reason)
    }).toDF("path", "reason")
    val data =
      if (good.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], expected)
      else spark.read.schema(expected).format(format)
        .load(good.map(_.getString(0)).toIndexedSeq: _*)
        .select(expected.fieldNames.map(col).toIndexedSeq: _*)
    (data, manifest)
  }

  /** Ingest telemetry in one line: healthy/corrupt/drifted file counts and
   * the healthy-row total — the audit a 10^5-shard table gets before a
   * training run commits to it. */
  def auditStats(spark: SparkSession, dir: String, expected: StructType,
      format: String = "parquet"): DataFrame = {
    val probed = probe(spark, dir, format)
    val expectedDdl = expected.toDDL
    val fieldChecks = expected.fields.map(f => (f.name.toLowerCase, f.dataType))
    import spark.implicits._
    val flagged = probed.as[(String, Long, Boolean, Long, String, String)]
      .map { case (path, bytes, ok, rows, ddl, err) =>
        val drift = ok && {
          val actual = try StructType.fromDDL(ddl) catch { case _: Exception => null }
          actual == null || !fieldChecks.forall { case (n, dt) =>
            actual.fields.exists(a => a.name.equalsIgnoreCase(n) && a.dataType == dt) }
        }
        (path, bytes, ok, drift, if (ok && !drift) rows else 0L)
      }.toDF("path", "bytes", "ok", "drift", "good_rows")
    flagged.agg(
      count(when(col("ok") && !col("drift"), 1)).as("healthy_files"),
      count(when(!col("ok"), 1)).as("corrupt_files"),
      count(when(col("ok") && col("drift"), 1)).as("drifted_files"),
      sum("good_rows").as("healthy_rows"))
  }
}
