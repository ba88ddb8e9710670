package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * WebDataset-style tar-shard export and ingest — the handoff format GPU
 * data loaders stream (one POSIX tar per shard; each sample is a run of
 * adjacent entries sharing a key prefix: `<key>.txt` + `<key>.json`).
 * The training side of [[graft.pipeline.Curation.writeShards]]: same
 * content-addressed shard assignment (md5 bucket — stable across runs,
 * engines and corpus growth) and the same within-shard content-hash
 * pseudo-shuffle, so a trainer gets reproducible global-shuffle order
 * without a global sort, in the format its loader already consumes.
 *
 * Layout contract (deterministic to the BYTE, so shard files can be
 * content-addressed and diffed across runs): ustar headers with zeroed
 * mtime/uid/gid and mode 0644; sample key = the row id as a zero-padded
 * 20-digit unsigned decimal; per sample `<key>.txt` (UTF-8 text) then
 * `<key>.json` ({"id":…,"tok":…} plus any `metaCols`; NULL meta
 * values are omitted per to_json).
 *
 * Scale: the export is ONE shuffle keyed on the shard (exactly
 * [[graft.pipeline.Curation.writeShards]]'s cost shape) with each task
 * streaming its tar(s) through the Hadoop FileSystem API — works on
 * HDFS/S3, never buffers a shard in memory. Ingest is a per-file
 * streaming parse over `binaryFiles` (the [[Warc]] posture: RDD API only
 * for genuinely per-file imperative logic); malformed tars quarantine
 * whole-file, loudly.
 */
object Wds {

  /** Sample key: zero-padded 20-digit unsigned decimal of the id —
   * lexicographic order == unsigned numeric order, and replicable in SQL
   * as printf('%020d', id) for non-negative ids. */
  def key(id: Long): String = {
    val s = java.lang.Long.toUnsignedString(id)
    "0" * (20 - s.length) + s
  }

  /**
   * Export `df` as WebDataset tar shards under `path`
   * (`shard-%06d.tar`). Returns the manifest (shard, docs, tokens)
   * READ BACK from the written tars, so it can never drift from the
   * artifact. `tokensCol` must be evaluable over `df`'s columns.
   * `metaCols` (name → expr) ride each sample's `.json` sidecar next to
   * the fixed `id`/`tok` fields — the url/domain/source provenance a
   * data loader filters on; serialized with `to_json`, so escaping is
   * exact and the bytes stay deterministic.
   */
  def write(df: DataFrame, idCol: Column, textCol: Column,
      tokensCol: Column, path: String, nShards: Int,
      metaCols: Seq[(String, Column)] = Nil): DataFrame = {
    require(!metaCols.exists(m => m._1 == "id" || m._1 == "tok"),
      "metaCols must not shadow the fixed id/tok sidecar fields")
    require(nShards > 0, "nShards must be positive")
    import graft.pipeline.Curation.{hashBucketN, hashFraction}
    val spark = df.sparkSession
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // truncate stale shards first (a shrunk corpus or smaller nShards must
    // not leak a previous run's tars into the re-read manifest — the
    // parquet writeShards gets this from mode("overwrite"))
    val root = new org.apache.hadoop.fs.Path(path)
    val rootFs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (rootFs.exists(root))
      rootFs.globStatus(new org.apache.hadoop.fs.Path(root, "shard-*.tar"))
        .foreach(st => rootFs.delete(st.getPath, false))
    // the sidecar json is built over df's ORIGINAL columns (metaCols may
    // reference any of them), before the narrowing select
    val metaJson = to_json(struct(
      (idCol.cast("long").as("id") +: tokensCol.cast("long").as("tok") +:
        metaCols.map { case (n, c) => c.as(n) }): _*))
    df.select(idCol.cast("long").as("graft_id"),
        textCol.cast("string").as("graft_text"),
        tokensCol.cast("long").as("graft_tok"),
        metaJson.as("graft_meta"))
      .withColumn("graft_shard", hashBucketN(col("graft_id"), nShards).cast("int"))
      .withColumn("graft_ord",
        hashFraction(concat(col("graft_id").cast("string"), lit("#ord"))))
      .repartition(col("graft_shard"))
      .sortWithinPartitions(col("graft_shard"), col("graft_ord"), col("graft_id"))
      .select(col("graft_shard"), col("graft_id"), col("graft_text"), col("graft_meta"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        // a partition holds zero or more WHOLE shards (the repartition
        // routes every row of a shard here); leading sort groups them.
        // Poor-man's commit protocol: write to an attempt-suffixed temp
        // name the manifest glob can never match, fsync-close, then
        // delete+rename into place — a speculative or zombie attempt
        // can't interleave bytes into the final tar, and identical
        // deterministic content makes last-wins safe.
        val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
        var cur = -1
        var out: java.io.OutputStream = null
        var tmp: org.apache.hadoop.fs.Path = null
        var fs: org.apache.hadoop.fs.FileSystem = null
        val seen = new java.util.HashSet[java.lang.Long]()
        def commit(): Unit = if (out != null) {
          TarAlgos.finish(out); out.close(); out = null
          val dst = new org.apache.hadoop.fs.Path(path, f"shard-$cur%06d.tar")
          if (fs.exists(dst)) fs.delete(dst, false)
          if (!fs.rename(tmp, dst))
            throw new java.io.IOException(s"could not commit $tmp -> $dst")
        }
        try {
          it.foreach { r =>
            val shard = r.getInt(0)
            if (shard != cur) {
              commit()
              cur = shard
              tmp = new org.apache.hadoop.fs.Path(path,
                f"_tmp-$attempt%d.shard-$cur%06d.tar")
              fs = tmp.getFileSystem(hconf.value)
              out = fs.create(tmp, true)
              seen.clear()
            }
            val id = r.getLong(1)
            // duplicate ids would sort adjacent and silently merge into
            // ONE WebDataset sample (adjacent same-key parts) — data loss
            // the parquet path doesn't have; fail loudly instead
            if (!seen.add(id))
              throw new IllegalArgumentException(
                s"duplicate id $id in wds export: sample keys must be " +
                  "unique — dedupe upstream or use a collision-free id")
            val k = key(id)
            val text = Option(r.getString(2)).getOrElse("")
            TarAlgos.addEntry(out, s"$k.txt", text.getBytes("UTF-8"))
            TarAlgos.addEntry(out, s"$k.json", r.getString(3).getBytes("UTF-8"))
          }
          commit()
        } finally if (out != null) { out.close(); fs.delete(tmp, false) }
      }
    val (rows, bad) = read(spark, path)
    // a write that cannot re-ingest cleanly is a corrupt artifact
    val badRows = bad.limit(1).collect()
    require(badRows.isEmpty,
      s"tar shard re-ingest quarantined ${badRows.head}")
    rows.groupBy(col("shard"))
      .agg(count(lit(1)).as("docs"),
        sum(get_json_object(col("meta"), "$.tok").cast("long")).as("tokens"))
  }

  /** (samples, quarantined files): samples are (shard, key, text, meta)
   * with `meta` the raw json sidecar (null if absent); `bad` is
   * (file, reason) for tars that fail the strict ustar parse. */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    // zero matching shards (an empty-but-valid export: every row gated
    // out upstream) is an empty corpus, not a job failure — binaryFiles'
    // FileInputFormat would throw on a 0-file glob
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val any = fs.exists(root) &&
      fs.globStatus(new org.apache.hadoop.fs.Path(root, "shard-*.tar")).nonEmpty
    if (!any)
      return (emptyFrame(spark),
        Seq.empty[(String, String)].toDF("file", "reason"))
    val tagged = spark.sparkContext
      .binaryFiles(s"$path/shard-*.tar")
      .flatMap { case (file, pds) =>
        val shard = "shard-(\\d+)\\.tar$".r.findFirstMatchIn(file)
          .map(_.group(1).toInt).getOrElse(-1)
        try {
          val in = pds.open()
          try TarAlgos.samples(TarAlgos.entries(in)).map {
            case (k, parts) => WdsTagged(file, ok = true, null, shard, k,
              parts.get("txt").map(new String(_, "UTF-8")).orNull,
              parts.get("json").map(new String(_, "UTF-8")).orNull)
          }.toVector
          finally in.close()
        } catch {
          case e: Exception =>
            Vector(WdsTagged(file, ok = false, e.getMessage, shard, null, null, null))
        }
      }.toDS().toDF()
    (tagged.where(col("ok"))
       .select(col("shard"), col("key"), col("text"), col("meta")),
     tagged.where(!col("ok")).select(col("file"), col("reason")))
  }

  /** Empty frame with [[read]]'s sample-side schema — lets config
   * validation (BatchConfig.validate) dry-resolve a wds source without
   * touching any path. */
  def emptyFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[WdsSample].toDF()
  }

  private case class WdsSample(shard: Int, key: String, text: String, meta: String)

  private case class WdsTagged(file: String, ok: Boolean, reason: String,
      shard: Int, key: String, text: String, meta: String)
}

/** Minimal deterministic ustar codec — plain JVM, no Spark types, so it
 * unit-tests without a session (the [[WarcAlgos]] posture). Writer emits
 * byte-stable archives (zeroed mtime/uid/gid); reader is strict: bad
 * magic, truncated content or a malformed size field throw (whole-file
 * quarantine upstream). */
object TarAlgos {

  private val BlockSize = 512

  /** Append one file entry (header + padded content). */
  def addEntry(out: java.io.OutputStream, name: String, data: Array[Byte]): Unit = {
    require(name.getBytes("UTF-8").length <= 100, s"tar name too long: $name")
    val h = new Array[Byte](BlockSize)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("UTF-8"); System.arraycopy(b, 0, h, off, b.length)
    }
    put(0, name)
    put(100, "0000644\u0000")            // mode
    put(108, "0000000\u0000")            // uid
    put(116, "0000000\u0000")            // gid
    put(124, f"${data.length}%011o ")    // size (octal)
    put(136, "00000000000 ")             // mtime: zero for byte-stable output
    put(148, "        ")                 // chksum placeholder (8 spaces)
    h(156) = '0'                         // typeflag: regular file
    put(257, "ustar\u0000")              // magic
    put(263, "00")                       // version
    var sum = 0
    h.foreach(b => sum += b & 0xff)
    put(148, f"$sum%06o\u0000 ")
    out.write(h)
    out.write(data)
    val pad = (BlockSize - data.length % BlockSize) % BlockSize
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  /** Terminate the archive (two zero blocks). */
  def finish(out: java.io.OutputStream): Unit =
    out.write(new Array[Byte](2 * BlockSize))

  /** Strict streaming entry iterator: (name, content) until the zero
   * terminator; throws on malformed headers or truncated content. */
  def entries(in: java.io.InputStream): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private var nextEntry: (String, Array[Byte]) = null
      private var done = false
      private def readFully(n: Int): Array[Byte] = {
        val b = new Array[Byte](n)
        var off = 0
        while (off < n) {
          val r = in.read(b, off, n - off)
          if (r < 0) throw new java.io.EOFException(
            s"truncated tar: wanted $n bytes, got $off")
          off += r
        }
        b
      }
      private def advance(): Unit = {
        if (done || nextEntry != null) return
        val h = readFully(BlockSize)
        if (h.forall(_ == 0)) { done = true; return }
        val magic = new String(h, 257, 5, "UTF-8")
        if (magic != "ustar")
          throw new java.io.IOException(s"bad tar magic '$magic'")
        val nul = h.indexOf(0.toByte)
        val name = new String(h, 0, if (nul < 0 || nul > 100) 100 else nul, "UTF-8")
        val sizeStr = new String(h, 124, 12, "UTF-8")
          .takeWhile(c => c >= '0' && c <= '7')
        if (sizeStr.isEmpty)
          throw new java.io.IOException(s"malformed tar size for '$name'")
        val size = java.lang.Long.parseLong(sizeStr, 8)
        if (size > Int.MaxValue)
          throw new java.io.IOException(s"oversized tar entry '$name'")
        val data = readFully(size.toInt)
        val pad = ((BlockSize - size % BlockSize) % BlockSize).toInt
        if (pad > 0) readFully(pad)
        nextEntry = (name, data)
      }
      def hasNext: Boolean = { advance(); !done && nextEntry != null }
      def next(): (String, Array[Byte]) = {
        advance()
        if (nextEntry == null) throw new NoSuchElementException
        val e = nextEntry; nextEntry = null; e
      }
    }

  /** Group ADJACENT entries by key prefix (the WebDataset sample
   * contract): `<key>.<ext>` runs become (key, ext → bytes). */
  def samples(es: Iterator[(String, Array[Byte])]): Iterator[(String, Map[String, Array[Byte]])] =
    new Iterator[(String, Map[String, Array[Byte]])] {
      private val buf = es.buffered
      private def split(name: String): (String, String) = {
        val i = name.lastIndexOf('.')
        if (i <= 0) (name, "") else (name.substring(0, i), name.substring(i + 1))
      }
      def hasNext: Boolean = buf.hasNext
      def next(): (String, Map[String, Array[Byte]]) = {
        val (name, data) = buf.next()
        val (k, ext) = split(name)
        var parts = Map(ext -> data)
        while (buf.hasNext && split(buf.head._1)._1 == k) {
          val (n2, d2) = buf.next()
          parts += (split(n2)._2 -> d2)
        }
        (k, parts)
      }
    }
}
