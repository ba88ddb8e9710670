package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * Z-order clustered layout — multi-dimensional data skipping for the
 * write side (the shape behind Delta/Iceberg `OPTIMIZE ZORDER BY`,
 * public algorithm: Morton 1966 bit interleaving over quantile-bucketed
 * dimensions; absent from OSS Spark's writer).
 *
 * Why it matters at 100 TB: parquet row-group and file min/max stats
 * prune scans only when the data is CLUSTERED on the filtered column. A
 * sort on one column gives perfect pruning on it and none on any other;
 * interleaving the bits of per-column quantile-bucket ranks gives every
 * z-ordered column locality proportional to its bit share, so selective
 * filters on ANY of them skip most files — the difference between
 * reading 100 TB and reading 1 TB for a two-predicate query.
 *
 * Plan shape (all one pass + one range shuffle):
 *  1. per-column bucket boundaries from `approxQuantile` (one distributed
 *     Greenwald–Khanna pass, driver gets ≤ 2^bits doubles per column —
 *     a bounded artifact);
 *  2. `graft_z` = codegen'd binary-search bucket + bit-interleave per row
 *     (one narrow projection, no shuffle);
 *  3. `repartitionByRange(numFiles, graft_z)` (sampled range exchange —
 *     the only shuffle) + `sortWithinPartitions` → parquet.
 *
 * Nulls bucket to 0 (the low corner): null-filtering queries still prune,
 * and rows are never dropped. Quantile bucketing (not min/max linear
 * scaling) makes the curve robust to skew and outliers — each bucket
 * holds ~equal row mass, so z-ranges split into ~equal files.
 */
object Layout {

  /** Interior cut points (length 2^bits - 1) per column, from one
   * distributed quantile pass. Columns must be numeric. */
  def zorderBoundaries(
      df: DataFrame, cols: Seq[String], bits: Int = 8,
      relativeError: Double = 0.001): Seq[Array[Double]] = {
    require(cols.nonEmpty, "zorder needs at least one column")
    require(bits >= 1 && cols.size * bits <= 63,
      s"${cols.size} cols x $bits bits exceeds the 63-bit z capacity")
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt.isInstanceOf[NumericType],
        s"zorder column '$c' is $dt; cast to a numeric type first") }
    val nCuts = (1 << bits) - 1
    val probes = (1 to nCuts).map(_.toDouble / (1 << bits)).toArray
    val casted = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
    casted.stat.approxQuantile(cols.toArray, probes, relativeError).toSeq
  }

  /** The interleaved z-value column for precomputed boundaries —
   * deterministic, codegen'd, shuffle-free. */
  def zvalue(cols: Seq[Column], boundaries: Seq[Array[Double]],
      curve: String = "morton"): Column = {
    require(cols.size == boundaries.size, "one boundary array per column")
    require(curve == "morton" || curve == "hilbert", s"unknown curve '$curve'")
    Bridge.column(ZValueExpression(
      cols.map(c => Bridge.expression(c.cast("double"))),
      boundaries.map(_.clone).toArray, hilbert = curve == "hilbert"))
  }

  /** Add `graft_z` from a fresh quantile pass over `df`. */
  def zorder(df: DataFrame, cols: Seq[String], bits: Int = 8,
      curve: String = "morton"): DataFrame = {
    val bs = zorderBoundaries(df, cols, bits)
    df.withColumn("graft_z", zvalue(cols.map(col), bs, curve))
  }

  /**
   * Cluster-and-write: z-value, range-partition into `numFiles`
   * ~equal-mass files, sort within each, write parquet (the `graft_z`
   * cluster key is kept in the files — it documents the layout and costs
   * 8 bytes/row). Equal row COUNTS per file, not equal bytes — for the
   * usual roughly-uniform row widths that is equal-sized files; wildly
   * variable widths (huge text blobs) should use [[zorderWriteWeighted]].
   */
  def zorderWrite(
      df: DataFrame, cols: Seq[String], path: String, numFiles: Int,
      bits: Int = 8, mode: String = "overwrite",
      curve: String = "morton", bloomCols: Seq[String] = Nil,
      bloomNdv: Long = 0L): Unit = {
    require(numFiles >= 1, "numFiles must be positive")
    var writer = zorder(df, cols, bits, curve)
      .repartitionByRange(numFiles, col("graft_z"))
      .sortWithinPartitions("graft_z")
      .write.mode(mode)
    // Per-column parquet bloom filters: min/max envelopes prune RANGE
    // probes, but a point lookup on a high-cardinality key (doc_id, url
    // hash) overlaps almost every file's envelope — the bloom filter is
    // what lets a 10⁵-file table answer "is this one id here" by skipping
    // row groups without decoding them. Write cost is one filter per
    // column chunk; size with bloomNdv (expected distinct values per row
    // group) or let parquet default.
    for (c <- bloomCols) {
      writer = writer.option(s"parquet.bloom.filter.enabled#$c", "true")
      if (bloomNdv > 0L)
        writer = writer.option(s"parquet.bloom.filter.expected.ndv#$c", bloomNdv.toString)
    }
    writer.parquet(path)
    // append batches must NOT clobber the base manifest (its numFiles is
    // the table's compaction target, not the batch size)
    if (mode != "append")
      writeLayoutManifest(df.sparkSession, path, cols, bits, numFiles, curve,
        bloomCols, bloomNdv)
    writeFileStats(df.sparkSession, path, cols) // covers base + all appends
  }

  /**
   * Append a batch to a z-ordered dataset: the batch clusters on ITS OWN
   * quantiles (z-values are a per-write clustering device — pruning reads
   * the DATA columns' min/max, which stay comparable across batches), so
   * an append is one small clustered write, never a table rewrite. Each
   * append adds `numFiles` files whose envelopes overlap the base's;
   * pruning selectivity decays with batch count — run [[zorderCompact]]
   * on the usual maintenance cadence, like any parquet table.
   */
  def zorderAppend(df: DataFrame, path: String, numFiles: Int = 1): Unit = {
    val (cols, bits, _, curve) = readLayoutManifest(df.sparkSession, path)
    val (bloomCols, bloomNdv) = readBloomConfig(df.sparkSession, path)
    zorderWrite(df, cols, path, numFiles, bits, mode = "append", curve = curve,
      bloomCols = bloomCols, bloomNdv = bloomNdv)
  }

  /**
   * Streaming face of the lifecycle: append each micro-batch z-clustered
   * via foreachBatch — the live table keeps the layout manifest's curve
   * and columns, every batch is one small clustered write, and the stats
   * sidecar stays fresh (O(batch) per micro-batch). Run [[zorderCompact]]
   * on the usual cadence, exactly like the batch append path. The target
   * must already be a [[zorderWrite]] dataset (the manifest is the
   * contract). Caller starts/stops the returned query.
   */
  def streamingAppend(stream: DataFrame, path: String, checkpoint: String,
      numFilesPerBatch: Int = 1): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        if (!batch.isEmpty) zorderAppend(batch.toDF(), path, numFilesPerBatch)
      }
      .start()

  /**
   * Re-cluster the whole dataset (manifest-guarded two-rename swap — a
   * crash mid-swap is detected and rolled forward, see
   * [[Incremental.guardedRewrite]]): restores post-append pruning
   * selectivity. Layout parameters come from the dataset's own
   * `_graft_layout.yaml`; `numFiles = 0` keeps the recorded value.
   */
  def zorderCompact(spark: SparkSession, path: String, numFiles: Int = 0): Unit = {
    val (cols, bits, recorded, curve) = readLayoutManifest(spark, path)
    val (bloomCols, bloomNdv) = readBloomConfig(spark, path)
    val target = if (numFiles > 0) numFiles else recorded
    Incremental.guardedRewrite(spark, path) { tmp =>
      zorderWrite(spark.read.parquet(path).drop("graft_z"), cols, tmp, target,
        bits, curve = curve, bloomCols = bloomCols, bloomNdv = bloomNdv)
    }
  }

  /**
   * File-skipping read from the stats sidecar — the metadata-layer win:
   * at 10⁵–10⁶ files, even deciding which files to open costs a footer
   * read per file per query; the sidecar (written once per write, a
   * driver-bounded YAML of per-file column envelopes harvested from the
   * parquet FOOTERS, no data scan) answers the pruning question with one
   * small file. Returns the rows with `lo <= col <= hi` reading ONLY
   * files whose envelope overlaps — exact, because the residual filter
   * still applies; a file with no stats for `col` is kept conservatively.
   * Falls back to a full filtered read when no sidecar exists.
   */
  def prunedRead(spark: SparkSession, path: String, colName: String,
      lo: Double, hi: Double): DataFrame = {
    val cond = col(colName).cast("double").between(lo, hi)
    readFileStats(spark, path) match {
      case None => spark.read.parquet(path).where(cond)
      case Some(stats) =>
        val keep = stats.collect {
          case (file, cols) if cols.get(colName).forall {
            case (mn, mx) => mx >= lo && mn <= hi } => file
        }.toSeq
        if (keep.isEmpty)
          spark.read.parquet(path).where(cond).limit(0)
        else spark.read.parquet(keep: _*).where(cond)
    }
  }

  /** Harvest per-file min/max envelopes for `cols` from the parquet
   * footers (row-group statistics — metadata only, no data scan) and
   * write the `_graft_stats.yaml` sidecar. INCREMENTAL: files already in
   * the sidecar keep their recorded envelope (parquet files are
   * immutable), so an append pays one footer read per NEW file, not per
   * table file — O(batch), like the data write itself. */
  /**
   * Small-file health report — the ops question every parquet table
   * eventually asks ("is this table fragmented enough that listing and
   * footer overhead dominate?"), answered from FS METADATA only (one
   * directory listing, no file opened): file count, byte totals and
   * extremes, how many files sit under half the target size, and the
   * recommended [[zorderCompact]] file count `ceil(total / target)`.
   * Driver-bounded by the file count — the same class as the footer
   * harvest, an audit artifact, not a data path.
   */
  def fileReport(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): DataFrame = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sizes = fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getLen)
    import spark.implicits._
    val nSmall = sizes.count(_ < targetFileBytes / 2)
    val total = sizes.sum
    Seq((sizes.size.toLong, total,
      if (sizes.isEmpty) 0L else sizes.min,
      if (sizes.isEmpty) 0L else sizes.max,
      nSmall.toLong,
      math.max(1L, (total + targetFileBytes - 1) / targetFileBytes),
      if (total == 0L) 0L
      else sizes.filter(_ < targetFileBytes / 2).sum * 1000000L / total))
      .toDF("n_files", "total_bytes", "min_file_bytes", "max_file_bytes",
        "n_small_files", "recommended_files", "fragmented_ppm")
  }

  /**
   * Concrete compaction plan for the small files [[fileReport]] counts:
   * first-fit-decreasing bin packing of every file under
   * `targetFileBytes / 2` into target-sized merge groups. Returns one row
   * per planned file: (file, bin, bin_bytes, bin_files) — feed each bin's
   * file list to a coalesce(1) rewrite (or [[zorderCompact]] for a full
   * re-cluster). Files at or above half-target are left alone (rewriting
   * them buys nothing); bins hold at least two files (a lone small file
   * has nothing to merge with).
   *
   * FFD is sequential by nature and runs DRIVER-side over the file
   * LISTING — cluster-metadata-sized (the [[fileReport]]/manifest
   * contract), never data-sized; determinism pinned by the
   * (size desc, name) placement order.
   */
  def compactionPlan(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): DataFrame = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val small = fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.getName, s.getLen))
      .filter(_._2 < targetFileBytes / 2)
      .sortBy { case (name, len) => (-len, name) }
    val bins = scala.collection.mutable.ArrayBuffer.empty[
      (scala.collection.mutable.ArrayBuffer[(String, Long)], Long)]
    small.foreach { case (name, len) =>
      bins.indexWhere(_._2 + len <= targetFileBytes) match {
        case -1 => bins += ((scala.collection.mutable.ArrayBuffer((name, len)), len))
        case i => bins(i) = ((bins(i)._1 += ((name, len)), bins(i)._2 + len))
      }
    }
    import spark.implicits._
    bins.zipWithIndex.toSeq
      .filter(_._1._1.size >= 2)
      .flatMap { case ((files, total), bin) =>
        files.map { case (name, len) =>
          (name, len, bin.toLong, total, files.size.toLong)
        }
      }
      .toDF("file", "file_bytes", "bin", "bin_bytes", "bin_files")
  }

  private def writeFileStats(spark: SparkSession, path: String,
      cols: Seq[String]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    val files = fs.listStatus(dir).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
    val prior: Map[String, Any] = readFileStatsRaw(spark, path).getOrElse(Map.empty)
    val root = new java.util.LinkedHashMap[String, Any]()
    files.sortBy(_.getName).foreach { f =>
      prior.get(f.getName) match {
        case Some(recorded) => root.put(f.getName, recorded)
        case None => harvestOne(conf, f, cols, root)
      }
    }
    val yaml = new org.yaml.snakeyaml.Yaml().dump(root)
    val p = new org.apache.hadoop.fs.Path(path, "_graft_stats.yaml")
    val out = fs.create(p, true)
    try out.write(yaml.getBytes("UTF-8")) finally out.close()
  }

  private def harvestOne(conf: org.apache.hadoop.conf.Configuration,
      f: org.apache.hadoop.fs.Path, cols: Seq[String],
      root: java.util.LinkedHashMap[String, Any]): Unit = {
      val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
        conf, f, org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
      val m = new java.util.LinkedHashMap[String, Any]()
      cols.foreach { c =>
        var mn = Double.PositiveInfinity
        var mx = Double.NegativeInfinity
        var ok = true
        footer.getBlocks.forEach { b =>
          b.getColumns.forEach { cc =>
            if (cc.getPath.toDotString == c) {
              val st = cc.getStatistics
              if (st == null || !st.hasNonNullValue) () // all-null chunk adds nothing
              else st.genericGetMin match {
                case n: java.lang.Number =>
                  mn = math.min(mn, n.doubleValue)
                  mx = math.max(mx, st.genericGetMax.asInstanceOf[java.lang.Number].doubleValue)
                case _ => ok = false // non-numeric physical type: no envelope
              }
            }
          }
        }
        if (ok && mn != Double.PositiveInfinity) {
          val l = new java.util.ArrayList[Any](); l.add(mn); l.add(mx); m.put(c, l)
        }
      }
      root.put(f.getName, m)
  }

  /** Sidecar as raw snakeyaml objects (file name → per-col map) so an
   * incremental rewrite re-dumps recorded entries unchanged. */
  private def readFileStatsRaw(spark: SparkSession, path: String)
      : Option[Map[String, Any]] = {
    val p = new org.apache.hadoop.fs.Path(path, "_graft_stats.yaml")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val bytes = try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Any]](new String(bytes, "UTF-8"))
    val b = Map.newBuilder[String, Any]
    root.forEach { (file, v) => b += file -> v }
    Some(b.result())
  }

  /** Sidecar → (absolute file path → col → (min, max)); None if absent. */
  private def readFileStats(spark: SparkSession, path: String)
      : Option[Seq[(String, Map[String, (Double, Double)])]] =
    readFileStatsRaw(spark, path).map(_.toSeq.map { case (file, v) =>
      val cm = Map.newBuilder[String, (Double, Double)]
      v.asInstanceOf[java.util.Map[String, Any]].forEach { (c, mm) =>
        val l = mm.asInstanceOf[java.util.List[Any]]
        cm += c -> (l.get(0).asInstanceOf[Number].doubleValue,
          l.get(1).asInstanceOf[Number].doubleValue)
      }
      s"$path/$file" -> cm.result()
    })

  /** Self-describing layout: `_graft_layout.yaml` beside the data
   * (underscore-prefixed — parquet readers skip it) records cols/bits/
   * numFiles so append and compact need no re-specification. */
  private def writeLayoutManifest(spark: SparkSession, path: String,
      cols: Seq[String], bits: Int, numFiles: Int,
      curve: String = "morton", bloomCols: Seq[String] = Nil,
      bloomNdv: Long = 0L): Unit = {
    val m = new java.util.LinkedHashMap[String, Any]()
    m.put("version", 1)
    val cl = new java.util.ArrayList[String](); cols.foreach(cl.add); m.put("cols", cl)
    m.put("bits", bits)
    m.put("numFiles", numFiles)
    m.put("curve", curve)
    // optional keys — absent on pre-bloom manifests, readers default
    if (bloomCols.nonEmpty) {
      val bl = new java.util.ArrayList[String](); bloomCols.foreach(bl.add)
      m.put("bloomCols", bl)
      if (bloomNdv > 0L) m.put("bloomNdv", bloomNdv)
    }
    val yaml = new org.yaml.snakeyaml.Yaml().dump(m)
    val p = new org.apache.hadoop.fs.Path(path, "_graft_layout.yaml")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(yaml.getBytes("UTF-8")) finally out.close()
  }

  private def readManifestMap(
      spark: SparkSession, path: String): java.util.Map[String, Any] = {
    val p = new org.apache.hadoop.fs.Path(path, "_graft_layout.yaml")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no _graft_layout.yaml under $path — not a zorderWrite dataset")
    val in = fs.open(p)
    val bytes = try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
    new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Any]](new String(bytes, "UTF-8"))
  }

  private[pipeline] def readLayoutManifest(
      spark: SparkSession, path: String): (Seq[String], Int, Int, String) = {
    val m = readManifestMap(spark, path)
    val cols = m.get("cols") match {
      case l: java.util.List[_] => (0 until l.size).map(i => l.get(i).toString)
      case other => throw new IllegalArgumentException(s"bad layout manifest cols: $other")
    }
    (cols, m.get("bits").asInstanceOf[Number].intValue,
      m.get("numFiles").asInstanceOf[Number].intValue,
      Option(m.get("curve")).map(_.toString).getOrElse("morton"))
  }

  /** Bloom-filter columns recorded in the layout manifest — appends and
   * compactions re-apply them so every file of the table carries the
   * filters, not just the base write. Absent on pre-bloom manifests. */
  private[pipeline] def readBloomConfig(
      spark: SparkSession, path: String): (Seq[String], Long) = {
    val m = readManifestMap(spark, path)
    val cols = m.get("bloomCols") match {
      case l: java.util.List[_] => (0 until l.size).map(i => l.get(i).toString)
      case _ => Nil
    }
    (cols, Option(m.get("bloomNdv")).map(_.asInstanceOf[Number].longValue).getOrElse(0L))
  }

  /**
   * [[zorderWrite]] for variable row widths: `repartitionByRange` balances
   * row COUNTS, so a corpus where 5% of rows carry 100× the bytes (long
   * documents, embedded media) writes wildly unequal files. This variant
   * splits on cumulative BYTE mass instead: group weight per z-value, a
   * prefix-sum over the z-ordered groups, and `file = floor(bytesBefore ×
   * numFiles / totalBytes)` — each file gets ~equal bytes, z-ranges stay
   * disjoint (the assignment is monotone in z), so pruning is unchanged.
   *
   * All distributed: the per-z weight table is ≤ 2^(bits×cols) rows
   * (required ≤ 2^20 — resolution, not correctness), its prefix sum is one
   * bounded single-partition window over that GROUP table (never over the
   * data), and the z→file map broadcast-joins back. Nothing is collected.
   *
   * `sizeCol` is the byte estimate — `length(text)` or
   * `octet_length(blob)`; anything summable.
   */
  def zorderWriteWeighted(
      df: DataFrame, cols: Seq[String], path: String, numFiles: Int,
      sizeCol: Column, bits: Int = 8, mode: String = "overwrite",
      curve: String = "morton"): Unit = {
    require(numFiles >= 1, "numFiles must be positive")
    require(cols.size * bits <= 20,
      s"weighted writer caps z resolution at 2^20 groups (${cols.size} x $bits bits)")
    val zdf = zorder(df, cols, bits, curve)
      .withColumn("graft_w", coalesce(sizeCol.cast("long"), lit(0L)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      zdf.count() // materialize once; the weight pass and the write both read it
      val wByZ = zdf.groupBy(col("graft_z")).agg(sum(col("graft_w")).as("graft_zw"))
      val win = org.apache.spark.sql.expressions.Window
        .orderBy(col("graft_z"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val totalRow = wByZ.agg(sum(col("graft_zw"))).head
      val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
      val fileOfZ = wByZ.select(col("graft_z"),
        least(
          floor(coalesce(sum(col("graft_zw")).over(win), lit(0L)) * numFiles /
            greatest(lit(total), lit(1L))),
          lit(numFiles - 1L)).cast("int").as("graft_file"))
      val joined = zdf.join(broadcast(fileOfZ), Seq("graft_z"))
      // EXACT placement: file ids must map 1:1 onto output partitions.
      // repartitionByRange would re-balance by ROW COUNT (its sampler
      // can't see bytes), merging the few-row/heavy-byte files back
      // together — the identity partitioner is the rare case where the
      // RDD hop is the correct tool (terminal stage, write follows
      // immediately; the row-codec shuffle is the price of exactness).
      val schema = joined.schema
      val fileIdx = schema.fieldIndex("graft_file")
      val placed = joined.rdd
        .map(r => (r.getInt(fileIdx), r))
        .partitionBy(new org.apache.spark.Partitioner {
          override def numPartitions: Int = numFiles
          override def getPartition(key: Any): Int = key.asInstanceOf[Int]
        })
        .map(_._2)
      df.sparkSession.createDataFrame(placed, schema)
        .sortWithinPartitions("graft_z")
        .drop("graft_file", "graft_w")
        .write.mode(mode).parquet(path)
      writeLayoutManifest(df.sparkSession, path, cols, bits, numFiles, curve)
      writeFileStats(df.sparkSession, path, cols)
    } finally zdf.unpersist()
  }
}

/** Quantile-bucket each (double-cast) child by binary search, interleave
 * the bucket bits (column i's bit j lands at z bit j*nCols + i). Null →
 * bucket 0. Codegen: children evaluate inline, one static combine call. */
case class ZValueExpression(children: Seq[Expression], boundaries: Array[Array[Double]],
    hilbert: Boolean = false) extends Expression {
  require(children.nonEmpty && children.size == boundaries.length)
  require(!hilbert || boundaries.map(_.length).distinct.length == 1,
    "hilbert curve needs the same bits per dimension")
  @transient private lazy val hilbertBits =
    32 - Integer.numberOfLeadingZeros(boundaries(0).length) // cuts = 2^bits - 1
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Any](children.size)
    var i = 0
    while (i < children.size) { vals(i) = children(i).eval(input); i += 1 }
    combine(vals)
  }

  /** Codegen entry point: already-evaluated children (null = SQL null). */
  def combine(vals: Array[Any]): Long = {
    val n = vals.length
    if (hilbert) {
      val bs = new Array[Int](n)
      var i = 0
      while (i < n) {
        bs(i) = vals(i) match {
          case null => 0
          case d: java.lang.Double => ZValueExpression.bucket(d.doubleValue(), boundaries(i))
        }
        i += 1
      }
      return ZValueExpression.hilbertIndex(bs, hilbertBits)
    }
    var z = 0L
    var i = 0
    while (i < n) {
      val b = vals(i) match {
        case null => 0
        case d: java.lang.Double => ZValueExpression.bucket(d.doubleValue(), boundaries(i))
      }
      // spread bucket bits: bit j -> z bit j*n + i
      var j = 0
      var bb = b
      while (bb != 0) {
        if ((bb & 1) != 0) z |= 1L << (j * n + i)
        bb >>>= 1
        j += 1
      }
      i += 1
    }
    z
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.{Block, EmptyBlock}
    val gens = children.map(_.genCode(ctx))
    val ref = ctx.addReferenceObj("graftZv", this, classOf[ZValueExpression].getName)
    val arr = ctx.freshName("graftZVals")
    val fill = gens.zipWithIndex.map { case (g, i) =>
      s"$arr[$i] = ${g.isNull} ? null : (Object) ${g.value};"
    }.mkString("\n")
    val childCode = gens.map(_.code).foldLeft(EmptyBlock: Block)(_ + _)
    ev.copy(code = code"""
      $childCode
      Object[] $arr = new Object[${gens.length}];
      $fill
      long ${ev.value} = $ref.combine($arr);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(children = cs)
}

object ZValueExpression {
  /** Bucket = number of cut points ≤ v (NaN sorts high, like Spark). */
  def bucket(v: Double, cuts: Array[Double]): Int = {
    if (java.lang.Double.isNaN(v)) return cuts.length
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /**
   * n-dimensional Hilbert index of a bucket vector (Skilling 2004,
   * "Programming the Hilbert curve", AIP Conf. Proc. 707 — the standard
   * public axes→transpose formulation): unlike Morton interleave, every
   * consecutive pair of Hilbert indexes is one unit step in ONE dimension,
   * so equal-index-range files have strictly tighter per-column envelopes
   * — measurably better stats pruning on range predicates. Pure integer
   * bit ops; `bits` per dimension, n·bits ≤ 63.
   */
  def hilbertIndex(buckets: Array[Int], bits: Int): Long = {
    val n = buckets.length
    val x = buckets.clone()
    // inverse undo excess work
    var q = 1 << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0
    q = 1 << (bits - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transpose → index (MSB-first across dimensions)
    var h = 0L
    var bit = bits - 1
    while (bit >= 0) {
      var d = 0
      while (d < n) { h = (h << 1) | ((x(d) >> bit) & 1); d += 1 }
      bit -= 1
    }
    h
  }
}
