package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * Incremental ingest deduplication — production corpora grow batch by batch,
 * and re-running whole-corpus dedup on every ingest is O(corpus) per batch.
 * These variants keep a persisted index (parquet, hashes only — content
 * never lands in the index) and dedup each NEW batch against it in
 * O(batch + matching-index-slices):
 *
 *  - [[exactIncremental]]: a (h1, h2, id) fingerprint index; a new doc drops
 *    iff its 128-bit content fingerprint is already indexed under a
 *    DIFFERENT id (the same-id guard makes a retried batch a no-op instead
 *    of deduping against itself).
 *  - [[minhashIncremental]]: a persisted LSH band table + minhash signature
 *    table; a new doc drops if it shares a band bucket with an indexed doc
 *    AND the signature agreement fraction (an unbiased Jaccard estimator
 *    over numHashes components) meets the threshold. Within-batch near-dups
 *    collapse through the exact-verify [[Dedup.dropNearDups]] first. NOTE:
 *    the cross-batch verify is ESTIMATED Jaccard (the index stores
 *    signatures, not text — by design at 100 TB); at 64 hashes the estimate
 *    has σ ≈ 0.06, so thresholds well inside a corpus's similarity gap
 *    behave exactly like the batch path.
 *
 * Both append the surviving batch's rows to the index AFTER materializing
 * the result (localCheckpoint), and the append set is anti-joined against
 * the index first — a retried batch appends nothing, so retries are
 * idempotent. Earlier-indexed documents always win; within a batch the
 * lowest id wins (the whole-corpus keep-first rule). Document ids must be
 * globally unique and stable across batches.
 */
object Incremental {

  /** The index at `path`, or an empty frame with its schema on first use —
   * resolved through the Hadoop filesystem of the path, so object stores
   * work the same as local disk. */
  private def indexOrEmpty(spark: SparkSession, path: String, schemaDdl: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))
  }

  /** Exact incremental dedup of `newBatch` against the fingerprint index at
   * `indexPath`. Returns the surviving rows of `newBatch` (original
   * columns), already materialized; appends their fingerprints to the
   * index. */
  def exactIncremental(
      newBatch: DataFrame, idCol: Column, indexPath: String,
      contentCols: Column*): DataFrame = {
    val spark = newBatch.sparkSession
    val fp = Dedup.fingerprint(contentCols)
    val index = indexOrEmpty(spark, indexPath, "h1 BIGINT, h2 BIGINT, id BIGINT")
    // within-batch keep-first, against the same fingerprint the index stores
    val keep = newBatch.select(fp.as("graft_fp"), idCol.cast("long").as("graft_id"))
      .groupBy(col("graft_fp")).agg(min(col("graft_id")).as("graft_keep"))
    val inBatch = newBatch.join(keep,
      fp === col("graft_fp") && idCol.cast("long") === col("graft_keep"), "leftsemi")
    // cross-batch: drop when the fingerprint is indexed under a different id
    // (same id = this very doc on a retried batch — keep it)
    val survivors = inBatch.join(index,
        fp.getField("h1") === index("h1") && fp.getField("h2") === index("h2") &&
          idCol.cast("long") =!= index("id"),
        "left_anti")
      .localCheckpoint(true)
    // idempotent append: only fingerprints the index has never seen
    val newRows = survivors.select(
        fp.getField("h1").as("h1"), fp.getField("h2").as("h2"),
        idCol.cast("long").as("id"))
      .join(index, Seq("h1", "h2"), "left_anti")
    newRows.write.mode("append").parquet(indexPath)
    survivors
  }

  /** MinHash incremental near-dedup of `newBatch` (idCol, textCol) against
   * the LSH index at `indexPath` (bands table + signature table). Returns
   * surviving rows (id, text), materialized; appends their band rows and
   * signatures. See the object doc for the estimated-verify contract. */
  def minhashIncremental(
      newBatch: DataFrame, idCol: Column, textCol: Column, indexPath: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, maxBucketSize: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val spark = newBatch.sparkSession
    val rowsPerBand = numHashes / bands
    val bandsIdx = indexOrEmpty(spark, s"$indexPath/bands", "band INT, bucket BIGINT, id BIGINT")
    val sigsIdx = indexOrEmpty(spark, s"$indexPath/sigs", "id BIGINT, sig ARRAY<BIGINT>")

    // within-batch near-dedup first (exact-verify, keep lowest id)
    val docs = newBatch.select(idCol.cast("long").as("id"), textCol.as("text"))
    val inBatch = Dedup.dropNearDups(docs, col("id"), col("text"),
      shingleSize = shingleSize, threshold = estimateToExactThreshold(threshold),
      maxBucketSize = maxBucketSize)

    val sigs = inBatch.select(col("id"), col("text"),
      Text.minhash(Text.shingles(col("text"), shingleSize), numHashes).as("sig"))
    val bandRows = sigs
      .select(col("id"), explode(sequence(lit(0), lit(bands - 1))).as("band"), col("sig"))
      .select(col("id"), col("band"),
        xxhash64(col("band"),
          slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))).as("bucket"))

    // cross-batch candidates: batch band rows colliding with indexed buckets.
    // BOTH guards are retry-idempotence guards: the same id never dedups
    // against itself, and an indexed id that belongs to the CURRENT batch is
    // this batch's own earlier (crashed) append — those pairs were already
    // adjudicated by the within-batch EXACT verify, and re-judging them with
    // the ESTIMATED agreement could drop rows run 1 kept (σ ≈ 0.06 at 64
    // hashes straddles thresholds the exact verify resolved).
    val batchIds = sigs.select(col("id"))
    val candidates = bandRows
      .join(bandsIdx.select(col("band"), col("bucket"), col("id").as("graft_old_id")),
        Seq("band", "bucket"))
      .where(col("id") =!= col("graft_old_id"))
      .join(batchIds.select(col("id").as("graft_old_id")), Seq("graft_old_id"), "left_anti")
      .select(col("id"), col("graft_old_id")).distinct()
    // estimated-Jaccard verify: agreement fraction of signature components
    val drops = candidates
      .join(sigs.select(col("id"), col("sig")), "id")
      .join(sigsIdx.select(col("id").as("graft_old_id"), col("sig").as("graft_old_sig")),
        Seq("graft_old_id"))
      .where(
        aggregate(zip_with(col("sig"), col("graft_old_sig"),
            (a, b) => when(a === b, 1L).otherwise(0L)),
          lit(0L), (acc, x) => acc + x).cast("double") / lit(numHashes.toDouble)
          >= threshold)
      .select(col("id")).distinct()

    val survivors = sigs.join(drops, Seq("id"), "left_anti")
      .select(col("id"), col("text"), col("sig"))
      .localCheckpoint(true)
    // idempotent append: only ids the signature table has never seen
    val freshIds = survivors.select(col("id"))
      .join(sigsIdx.select(col("id")), Seq("id"), "left_anti")
      .localCheckpoint(true)
    // bands FIRST, sigs second: the idempotency key is the sigs table, so
    // a crash between the two appends must leave the retry able to heal.
    // Crash after bands: retry still sees the ids as fresh (sigs missing),
    // re-appends bands (duplicates are harmless — candidate generation
    // dedups pairs) and then sigs. The reverse order left ids in sigs but
    // never in bands — permanently invisible to candidate generation,
    // unfixable by retry. Band rows for the append derive from the
    // CHECKPOINTED survivors' sig column (a cheap projection of
    // materialized data) — the pre-dedup bandRows lineage would re-run the
    // whole within-batch LSH pass a second time.
    val freshSurvivors = survivors.join(freshIds, Seq("id"), "leftsemi")
    freshSurvivors
      .select(col("id"), explode(sequence(lit(0), lit(bands - 1))).as("band"), col("sig"))
      .select(col("band"),
        xxhash64(col("band"),
          slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))).as("bucket"),
        col("id"))
      .write.mode("append").parquet(s"$indexPath/bands")
    freshSurvivors.select(col("id"), col("sig"))
      .write.mode("append").parquet(s"$indexPath/sigs")
    survivors.select(col("id"), col("text"))
  }

  /** The batch path verifies with EXACT Jaccard; the estimated threshold
   * maps one-to-one here (same scale) — kept as a named hook so the two
   * verify regimes stay explicitly aligned. */
  private def estimateToExactThreshold(t: Double): Double = t

  /**
   * Compact an incremental index: every batch appends its own small
   * parquet files, and after thousands of batches the file count — not the
   * byte count — dominates index-read planning time. Rewrites each index
   * table to `targetFilesPerTable` files via a temp directory + rename
   * (the rename window is the only non-atomic moment; run compaction when
   * no ingest batch is in flight, like any parquet maintenance job).
   * Content is untouched — row counts and dedup results are identical
   * before and after (spec-pinned).
   */
  def compact(
      spark: SparkSession, indexPath: String, targetFilesPerTable: Int = 8): Unit = {
    require(targetFilesPerTable > 0, "targetFilesPerTable must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    def compactDir(dir: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) return
      val tmp = new org.apache.hadoop.fs.Path(dir + "__compact_tmp")
      val old = new org.apache.hadoop.fs.Path(dir + "__compact_old")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      if (fs.exists(old)) fs.delete(old, true)
      spark.read.parquet(dir).repartition(targetFilesPerTable)
        .write.mode("overwrite").parquet(tmp.toString)
      if (!fs.rename(p, old)) throw new java.io.IOException(s"cannot move $dir aside")
      if (!fs.rename(tmp, p)) {
        fs.rename(old, p) // restore on failure
        throw new java.io.IOException(s"cannot move compacted $dir into place")
      }
      fs.delete(old, true)
    }
    // a bare fingerprint index is the path itself; the minhash index is the
    // sigs/bands pair underneath
    val sub = Seq(s"$indexPath/sigs", s"$indexPath/bands")
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(conf)
    val hasSub = sub.exists(d => fs.exists(new org.apache.hadoop.fs.Path(d)))
    if (hasSub) sub.foreach(compactDir) else compactDir(indexPath)
  }
}
