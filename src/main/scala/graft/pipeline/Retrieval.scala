package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * BM25 batch retrieval over a persisted inverted index — the retrieval tier
 * of a curation/decontamination stack ([[Curation.bm25]] scores every doc
 * against ONE term list; this answers a BATCH of queries with top-k docs
 * each, against an index built once per corpus).
 *
 * Index layout at `path` (all parquet, all distributed):
 *  - `postings/` (term, id, tf, dl) — one row per distinct (term, doc),
 *    denormalized with the doc length so scoring never joins a doc table;
 *    repartitioned BY TERM and sorted within partitions, so a term-set
 *    predicate prunes row groups via parquet min/max stats.
 *  - `dfs/` (term, df) — document frequency PARTIALS (summed per term at
 *    read; a single-batch index has one row per term).
 *  - `stats/` — (n_docs, sum_dl) rows, summed at read.
 *  - `docs/` (id) — indexed doc ids, the [[appendToIndex]] idempotence set.
 *  - `dropped/` (term) — the maxDfFraction stopword cut, if one was made
 *    (appended batches keep honoring the build-time cut).
 *  - `batches/<token>/{postings,dfs,stats,docs}` + `_COMMITTED` — one
 *    staged-then-committed directory per appended batch; readers see ONLY
 *    committed batches, so a crash mid-append is invisible and the retry
 *    (same deterministic token) overwrites the stage and commits.
 *
 * Search cost is O(postings of the query's terms), never O(corpus): the
 * distinct query terms (bounded by the query batch, guarded broadcastable)
 * become an IN filter pushed into BOTH parquet scans before the joins.
 *
 * Scoring is the standard BM25 (Robertson–Spärck Jones idf, k1/b length
 * normalization) with each per-term partial floored to 1e-9 fixed point
 * BEFORE the per-(query, doc) sum — the [[Lm]] contract: identical IEEE
 * ops in a fixed order, then an exact order-independent integer aggregate,
 * so scores AND top-k ranks (score desc, id asc) hash-match the DuckDB
 * oracle. Query term frequency is set semantics (distinct terms), matching
 * what the oracle can express.
 */
object Retrieval {

  private def toks(text: org.apache.spark.sql.Column) =
    filter(split(trim(lower(text)), "\\s+"), t => t =!= lit(""))

  /** Build the inverted index at `path`: one tokenize pass, one (term, id)
   * count aggregate, one keyed df aggregate — content never shuffles, only
   * terms and counts.
   *
   * Skew bound: the postings write repartitions on (term, pmod(hash(id),
   * saltBuckets)), NOT term alone — at web scale df("the") ~ n_docs, so a
   * term-only shuffle sends ~10^10 stopword rows to one task while the rest
   * idle. Salting caps any single term's share of a partition at ~df/salt
   * while files stay term-sorted, so the search side's term-IN predicate
   * still prunes row groups via parquet min/max stats.
   *
   * `maxDfFraction` < 1 additionally drops terms appearing in more than
   * that fraction of docs from postings AND dfs (standard IR stopword cut:
   * their idf = ln((n-df+.5)/(df+.5)+1) ≈ 0, so they cost index space and
   * scoring time while moving scores ~nothing). The dropped-term list is
   * bounded by avg_dl/maxDfFraction (each doc has avg_dl distinct-ish
   * terms; only so many can clear the df bar), so collecting it to the
   * driver is safe at any corpus size; past [[MaxIsinTerms]] terms the cut
   * switches from an `isin` literal predicate to a broadcast anti-join
   * (a thousand-entry isin list bloats the generated predicate and the
   * plan string, while an anti-join against a broadcast frame stays O(1)
   * in plan size). */
  def buildIndex(df: DataFrame, idCol: String, textCol: String, path: String,
      maxDfFraction: Double = 1.0, saltBuckets: Int = 16): Unit = {
    require(maxDfFraction > 0.0 && maxDfFraction <= 1.0,
      s"maxDfFraction must be in (0, 1], got $maxDfFraction")
    require(saltBuckets > 0, s"saltBuckets must be positive, got $saltBuckets")
    val spark = df.sparkSession
    val base = df.select(col(idCol).cast("long").as("id"), toks(col(textCol)).as("graft_toks"))
      .withColumn("dl", size(col("graft_toks")))
    val postingsAll = base
      .select(col("id"), col("dl"), explode(col("graft_toks")).as("term"))
      .groupBy(col("term"), col("id"), col("dl")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // (term, id) is unique in postings, so df is a plain count per term;
    // the partial-aggregate reduce side sees at most one row per (term,
    // input partition) — no stopword skew here
    val dfsAll = postingsAll.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE corpus-stats pass: the collected (n_docs, sum_dl) row feeds the
    // dropTerms threshold AND the stats/ table — not one tokenize pass each
    val statsRow = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .collect()(0)
    val nDocs = statsRow.getLong(0)
    val dropTerms: Seq[String] =
      if (maxDfFraction < 1.0)
        dfsAll.where(col("df") > maxDfFraction * nDocs)
          .select(col("term")).collect().map(_.getString(0)).toSeq
      else Nil
    def cut(t: DataFrame): DataFrame =
      if (dropTerms.isEmpty) t
      else if (dropTerms.length <= MaxIsinTerms) t.where(!col("term").isin(dropTerms: _*))
      else {
        import spark.implicits._
        t.join(broadcast(dropTerms.toDF("term")), Seq("term"), "left_anti")
      }
    cut(postingsAll)
      .repartition(col("term"), pmod(hash(col("id")), lit(saltBuckets)))
      .sortWithinPartitions(col("term"), col("id"))
      .write.mode("overwrite").parquet(s"$path/postings")
    cut(dfsAll).write.mode("overwrite").parquet(s"$path/dfs")
    writeStatsRow(spark, s"$path/stats",
      nDocs, if (statsRow.isNullAt(1)) null else statsRow.getLong(1))
    base.select(col("id")).write.mode("overwrite").parquet(s"$path/docs")
    if (dropTerms.nonEmpty) {
      import spark.implicits._
      dropTerms.toDF("term").coalesce(1).write.mode("overwrite").parquet(s"$path/dropped")
    }
    postingsAll.unpersist()
    dfsAll.unpersist()
  }

  private def writeStatsRow(spark: SparkSession, dir: String,
      nDocs: Long, sumDl: Any): Unit =
    spark.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(nDocs, sumDl)),
        org.apache.spark.sql.types.StructType.fromDDL("n_docs BIGINT, sum_dl BIGINT"))
      .coalesce(1).write.mode("overwrite").parquet(dir)

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Batch directories whose `_COMMITTED` marker exists — the only appended
   * state any reader consumes. A driver-side listing, never a data scan.
   * Heals a crashed [[compactIndex]] swap first (the [[Incremental]]
   * manifest convention), so a mid-swap crash can never read as an empty
   * index. */
  private[pipeline] def committedBatchDirs(spark: SparkSession, path: String): Seq[String] = {
    Incremental.repairDir(spark, path)
    val (fs, _) = fsOf(spark, path)
    val bp = new org.apache.hadoop.fs.Path(s"$path/batches")
    if (!fs.exists(bp)) Nil
    else fs.listStatus(bp).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d, "_COMMITTED")))
      .map(_.toString)
      .sorted
  }

  /** All existing copies of one index table: the base build's plus every
   * committed batch's. */
  private def tablePaths(spark: SparkSession, path: String, name: String): Seq[String] = {
    val (fs, _) = fsOf(spark, path)
    (s"$path/$name" +: committedBatchDirs(spark, path).map(d => s"$d/$name"))
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
  }

  /**
   * Append a document batch to the index at `path` in O(batch) — the
   * incremental-ingest posture of [[Incremental]] and the ANN appends
   * (Similarity.ivfAppend / Sq.ivfSqAppend / Pq.ivfPqAppend): a daily crawl
   * drop must not pay a full O(corpus) [[buildIndex]] rebuild.
   *
   * The batch anti-joins against the indexed `docs/` id set (already-
   * indexed ids contribute nothing — overlapping and retried batches are
   * idempotent), then writes its own postings/dfs/stats/docs under
   * `batches/<token>/` and finally creates the `_COMMITTED` marker. The
   * token is a deterministic digest of the surviving id set (bit_xor of
   * id hashes + count + min/max), so a crash ANYWHERE before the marker
   * leaves an invisible stage that the retry overwrites bit-for-bit and
   * commits — no partial state can double-count, which matters here
   * because duplicated (term, id) posting rows would inflate tf-side
   * scores silently. Readers sum `dfs` per term and `stats` across
   * batches, so search scores after append == scores of a fresh rebuild
   * over the union corpus (spec-pinned equality).
   *
   * A build-time `maxDfFraction` cut is honored: batch postings for terms
   * in `dropped/` stay out. Terms that only CROSS the df bar because of
   * later appends are not retroactively cut (that is a rebuild-time
   * decision — a cut list can only be computed against global dfs).
   * After many appends, run [[Incremental.compact]]-style maintenance by
   * rebuilding: file COUNT, not correctness, is the only degradation.
   */
  def appendToIndex(df: DataFrame, idCol: String, textCol: String, path: String,
      saltBuckets: Int = 16): Unit = {
    require(saltBuckets > 0, s"saltBuckets must be positive, got $saltBuckets")
    val spark = df.sparkSession
    val (fs, _) = fsOf(spark, path)
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$path/docs")),
      s"no docs/ table under $path — build the index with buildIndex first " +
        "(pre-append indexes need a rebuild once to gain the idempotence set)")
    val indexedIds = spark.read.parquet(tablePaths(spark, path, "docs"): _*)
    // anti-join BEFORE tokenizing: a retried (or mostly-indexed) batch then
    // pays an id-only scan, not a full tokenize pass over text it won't use
    val base = df.select(col(idCol).cast("long").as("id"), col(textCol).as("graft_text"))
      .join(indexedIds, Seq("id"), "left_anti")
      .select(col("id"), toks(col("graft_text")).as("graft_toks"))
      .withColumn("dl", size(col("graft_toks")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // deterministic batch token + stats in ONE pass over the survivors
      val digest = base.agg(
          count(lit(1)).as("n"), sum(col("dl")).as("sdl"),
          expr("bit_xor(xxhash64(id))").as("x"),
          min(col("id")).as("lo"), max(col("id")).as("hi"))
        .collect()(0)
      val nDocs = digest.getLong(0)
      if (nDocs == 0L) return // fully-indexed (or retried-after-commit) batch
      val token = f"b${digest.getLong(2)}%016x_${nDocs}_${digest.getLong(3)}_${digest.getLong(4)}"
      val batchDir = s"$path/batches/$token"
      val bp = new org.apache.hadoop.fs.Path(batchDir)
      if (fs.exists(new org.apache.hadoop.fs.Path(bp, "_COMMITTED"))) return // committed retry
      if (fs.exists(bp)) fs.delete(bp, true) // crashed stage: rewrite from scratch

      val postings = base
        .select(col("id"), col("dl"), explode(col("graft_toks")).as("term"))
        .groupBy(col("term"), col("id"), col("dl")).agg(count(lit(1)).as("tf"))
      val droppedPath = new org.apache.hadoop.fs.Path(s"$path/dropped")
      val kept =
        if (!fs.exists(droppedPath)) postings
        else postings.join(
          broadcast(spark.read.parquet(s"$path/dropped")), Seq("term"), "left_anti")
      val keptP = kept.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        keptP
          .repartition(col("term"), pmod(hash(col("id")), lit(saltBuckets)))
          .sortWithinPartitions(col("term"), col("id"))
          .write.mode("overwrite").parquet(s"$batchDir/postings")
        keptP.groupBy(col("term")).agg(count(lit(1)).as("df"))
          .write.mode("overwrite").parquet(s"$batchDir/dfs")
      } finally keptP.unpersist()
      writeStatsRow(spark, s"$batchDir/stats",
        nDocs, if (digest.isNullAt(1)) null else digest.getLong(1))
      base.select(col("id")).write.mode("overwrite").parquet(s"$batchDir/docs")
      fs.create(new org.apache.hadoop.fs.Path(bp, "_COMMITTED"), true).close()
    } finally base.unpersist()
  }

  /** Above this many dropped stopword terms, the df cut uses a broadcast
   * anti-join instead of an isin literal list. */
  private[pipeline] val MaxIsinTerms = 256

  /**
   * Fold every committed append batch back into the base tables — after
   * thousands of daily appends the FILE COUNT (per-batch postings/dfs/stats
   * dirs), not correctness, degrades read planning, exactly the
   * [[Incremental.compact]] motivation. Writes a complete new index
   * (postings re-salted and term-sorted, df partials summed, stats rows
   * summed, docs unioned, the dropped/ cut list carried over) to
   * `path__compact_tmp`, then swaps it in with the manifest-guarded
   * two-rename [[Incremental]] uses: a crash in the non-atomic window is
   * healed by the repair every reader runs ([[committedBatchDirs]]), rolling
   * forward iff the tmp copy is complete per its manifest file count.
   * Because batch dirs vanish in the SAME swap that folds their content,
   * no crash point can double-count. Run when no append is in flight, like
   * any parquet maintenance job. Search results are identical before and
   * after (spec-pinned), and append idempotence survives — the folded
   * docs/ set still repels re-appended ids.
   */
  def compactIndex(spark: SparkSession, path: String, saltBuckets: Int = 16): Unit = {
    require(saltBuckets > 0, s"saltBuckets must be positive, got $saltBuckets")
    val (fs, p) = fsOf(spark, path)
    if (committedBatchDirs(spark, path).isEmpty) return // heals, then no-op
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    val old = new org.apache.hadoop.fs.Path(path + "__compact_old")
    val manifest = new org.apache.hadoop.fs.Path(path + "__compact_manifest")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    // resolve EVERY source path before the first tmp write: tablePaths runs
    // the repair, and the repair scraps a tmp dir next to a live index —
    // calling it mid-build would delete our own in-progress copy
    val srcPostings = tablePaths(spark, path, "postings")
    val srcDfs = tablePaths(spark, path, "dfs")
    val srcStats = tablePaths(spark, path, "stats")
    val srcDocs = tablePaths(spark, path, "docs")
    spark.read.parquet(srcPostings: _*)
      .repartition(col("term"), pmod(hash(col("id")), lit(saltBuckets)))
      .sortWithinPartitions(col("term"), col("id"))
      .write.mode("overwrite").parquet(s"$tmp/postings")
    spark.read.parquet(srcDfs: _*)
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
      .write.mode("overwrite").parquet(s"$tmp/dfs")
    val st = spark.read.parquet(srcStats: _*)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
      .collect()(0)
    writeStatsRow(spark, s"$tmp/stats",
      st.getLong(0), if (st.isNullAt(1)) null else st.getLong(1))
    spark.read.parquet(srcDocs: _*)
      .write.mode("overwrite").parquet(s"$tmp/docs")
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/dropped")))
      spark.read.parquet(s"$path/dropped")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/dropped")
    val out = fs.create(manifest, true)
    try out.write(Incremental.parquetFileCount(fs, tmp).toString.getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(p, old)) throw new java.io.IOException(s"cannot move $path aside")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // restore on failure
      throw new java.io.IOException(s"cannot move compacted $path into place")
    }
    fs.delete(old, true)
    fs.delete(manifest, false)
  }

  /**
   * Top-k docs per query from the index at `path`. Returns
   * (query_id, id, score_e9, rank) — score in 1e-9 fixed-point units,
   * rank 1-based by (score desc, id asc). Queries with no matching term
   * return no rows.
   */
  def searchTopK(
      spark: SparkSession, path: String, queries: DataFrame,
      qidCol: String, textCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      maxBroadcastQueries: Int = Similarity.MaxBroadcastQueries): DataFrame = {
    require(k > 0, "searchTopK needs k > 0")
    Similarity.requireBroadcastable(queries, maxBroadcastQueries, "searchTopK")
    val qterms = queries
      .select(col(qidCol).cast("long").as("query_id"),
        explode(array_distinct(toks(col(textCol)))).as("term"))
    // the distinct term set is bounded by the (guarded) query batch — as a
    // driver-side IN list it prunes BOTH parquet scans' row groups before
    // any join runs
    val termList = qterms.select(col("term")).distinct().collect().map(_.getString(0))
    if (termList.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "query_id BIGINT, id BIGINT, score_e9 BIGINT, rank INT"))
    val inTerms = termList.toSeq
    // base tables + every committed append batch; df partials sum per term
    // and stats rows sum across batches, so a single-batch index reads
    // exactly as before and an appended one scores as if rebuilt
    val postings = spark.read.parquet(tablePaths(spark, path, "postings"): _*)
      .where(col("term").isin(inTerms: _*))
    val dfs = spark.read.parquet(tablePaths(spark, path, "dfs"): _*)
      .where(col("term").isin(inTerms: _*))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    val stats = spark.read.parquet(tablePaths(spark, path, "stats"): _*)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))

    // fixed operation order, mirrored token-for-token by the DuckDB oracle
    val nD = col("n_docs").cast("double")
    val avgdl = col("sum_dl").cast("double") / nD
    val dfT = col("df").cast("double")
    val tf = col("tf").cast("double")
    val idf = log((nD - dfT + lit(0.5)) / (dfT + lit(0.5)) + lit(1.0))
    val norm = tf * lit(k1 + 1.0) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    val partial = idf * norm

    val scored = broadcast(qterms.join(broadcast(dfs), Seq("term")))
      .join(postings, Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("id"),
        floor(partial * lit(1e9)).as("graft_p9"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("graft_p9")).as("score_e9"))
    Similarity.topKPerQuery(
        scored.select(col("query_id"), col("id").as("neighbor_id"),
          col("score_e9").cast("double").as("sim")), k)
      .select(col("query_id"), col("neighbor_id").as("id"),
        col("sim").cast("long").as("score_e9"), col("rank"))
  }

  /**
   * Positional inverted index at `path/postings`: (term, id, positions
   * sorted array<int>) — the structure exact-phrase and proximity queries
   * need that the tf-only BM25 index can't answer. Same tokenizer, same
   * salt-bucketed term-sorted layout (parquet min/max stats keep pruning
   * the search side's term-IN predicate); positions per (term, doc) are
   * bounded by that doc's term frequency, so rows stay small even for
   * stopwords.
   */
  def buildPositionalIndex(df: DataFrame, idCol: String, textCol: String,
      path: String, saltBuckets: Int = 16): Unit = {
    require(saltBuckets > 0, s"saltBuckets must be positive, got $saltBuckets")
    df.select(col(idCol).cast("long").as("id"), toks(col(textCol)).as("graft_toks"))
      .select(col("id"), posexplode(col("graft_toks")).as(Seq("pos", "term")))
      .groupBy(col("term"), col("id"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))
      .repartition(col("term"), pmod(hash(col("id")), lit(saltBuckets)))
      .sortWithinPartitions(col("term"), col("id"))
      .write.mode("overwrite").parquet(s"$path/postings")
  }

  /**
   * Exact-phrase search over a positional index: (query_id, id,
   * occurrences) for every document containing the query's token sequence
   * verbatim, with the exact start-position count.
   *
   * Plan: the (guarded-small) query batch explodes to (query_id, i,
   * term_i) rows; its distinct terms become an IN predicate pruning the
   * postings scan's row groups BEFORE the broadcast join; each joined
   * posting shifts its positions by −i, and a phrase occurrence at start
   * p is exactly p surviving the intersection of all m shifted lists —
   * counted per (query, doc) after requiring all m term slots matched.
   * The intersection folds over ≤ m collected position arrays (bounded by
   * the doc's tf), never over documents. Duplicate phrase terms are
   * handled by slot counting, not term counting.
   */
  def phraseSearch(
      spark: SparkSession, path: String, queries: DataFrame,
      qidCol: String, phraseCol: String,
      maxBroadcastQueries: Int = Similarity.MaxBroadcastQueries): DataFrame = {
    Similarity.requireBroadcastable(queries, maxBroadcastQueries, "phraseSearch")
    val q = queries
      .select(col(qidCol).cast("long").as("query_id"), toks(col(phraseCol)).as("graft_ts"))
      .withColumn("graft_m", size(col("graft_ts")))
      .where(col("graft_m") >= 1)
    val qTerms = q.select(col("query_id"), col("graft_m"),
      posexplode(col("graft_ts")).as(Seq("graft_i", "term")))
    val termList = qTerms.select(col("term")).distinct().collect().map(_.getString(0))
    if (termList.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "query_id BIGINT, id BIGINT, occurrences INT"))
    val postings = spark.read.parquet(s"$path/postings")
      .where(col("term").isin(termList.toSeq: _*))
    postings.join(broadcast(qTerms), Seq("term"))
      .select(col("query_id"), col("id"), col("graft_m"),
        transform(col("positions"), p => p - col("graft_i")).as("graft_sh"))
      .groupBy(col("query_id"), col("id"), col("graft_m"))
      .agg(count(lit(1)).as("graft_slots"),
        collect_list(col("graft_sh")).as("graft_arrs"))
      .where(col("graft_slots") === col("graft_m"))
      .select(col("query_id"), col("id"),
        size(expr("aggregate(slice(graft_arrs, 2, size(graft_arrs) - 1), " +
          "graft_arrs[0], (acc, x) -> array_intersect(acc, x))")).as("occurrences"))
      .where(col("occurrences") > 0)
  }

  /**
   * Proximity (NEAR/slop) search over the positional index: documents
   * where EVERY query term occurs within `slop` token positions of some
   * occurrence of the first term (the anchor) — unordered, the classic
   * NEAR operator. Returns (query_id, id, anchors): how many anchor
   * positions witness the co-occurrence (0 rows when none).
   *
   * Same plan as [[phraseSearch]] up to the per-(query, doc) grouping;
   * the proximity test folds over the slot-ordered position arrays with
   * array HOFs — cost bounded by the document's term frequencies, never
   * by the corpus. Slot order is pinned by sorting the collected
   * (slot, positions) structs, so the anchor is deterministically the
   * query's first token.
   */
  def proximitySearch(
      spark: SparkSession, path: String, queries: DataFrame,
      qidCol: String, termsCol: String, slop: Int,
      maxBroadcastQueries: Int = Similarity.MaxBroadcastQueries): DataFrame = {
    require(slop >= 0, s"slop must be >= 0, got $slop")
    Similarity.requireBroadcastable(queries, maxBroadcastQueries, "proximitySearch")
    val q = queries
      .select(col(qidCol).cast("long").as("query_id"),
        array_distinct(toks(col(termsCol))).as("graft_ts"))
      .withColumn("graft_m", size(col("graft_ts")))
      .where(col("graft_m") >= 1)
    val qTerms = q.select(col("query_id"), col("graft_m"),
      posexplode(col("graft_ts")).as(Seq("graft_i", "term")))
    val termList = qTerms.select(col("term")).distinct().collect().map(_.getString(0))
    if (termList.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "query_id BIGINT, id BIGINT, anchors INT"))
    val postings = spark.read.parquet(s"$path/postings")
      .where(col("term").isin(termList.toSeq: _*))
    postings.join(broadcast(qTerms), Seq("term"))
      .groupBy(col("query_id"), col("id"), col("graft_m"))
      .agg(count(lit(1)).as("graft_slots"),
        array_sort(collect_list(struct(col("graft_i"), col("positions"))))
          .as("graft_sl"))
      .where(col("graft_slots") === col("graft_m"))
      .select(col("query_id"), col("id"),
        size(filter(col("graft_sl")(0)("positions"), p0 =>
          forall(slice(col("graft_sl"), lit(2), size(col("graft_sl")) - 1), sl =>
            exists(sl("positions"), pj =>
              abs(pj - p0) <= slop)))).as("anchors"))
      .where(col("anchors") > 0)
  }

  /**
   * Best-window snippet selection over the positional index: for every
   * document sharing at least one term with the query, the `window`-token
   * span covering the MOST distinct query terms — (query_id, id,
   * snippet_start, matched_terms), ties broken to the earliest start so
   * the result is a pure function of the index. The presentation layer of
   * retrieval: BM25/RRF pick the documents, this picks what to show.
   *
   * Candidate starts are exactly the matched term positions (an optimal
   * window can always shift left until it begins at one), so the per-doc
   * work is O(tf² · terms) over position ARRAYS via codegen'd HOFs —
   * bounded by the document's own term frequencies, never by the corpus.
   * Same pruned-scan + broadcast-join plan as [[phraseSearch]].
   */
  def bestSnippets(
      spark: SparkSession, path: String, queries: DataFrame,
      qidCol: String, termsCol: String, window: Int,
      maxBroadcastQueries: Int = Similarity.MaxBroadcastQueries): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    Similarity.requireBroadcastable(queries, maxBroadcastQueries, "bestSnippets")
    val q = queries
      .select(col(qidCol).cast("long").as("query_id"),
        array_distinct(toks(col(termsCol))).as("graft_ts"))
      .where(size(col("graft_ts")) >= 1)
    val qTerms = q.select(col("query_id"), explode(col("graft_ts")).as("term"))
    val termList = qTerms.select(col("term")).distinct().collect().map(_.getString(0))
    if (termList.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "query_id BIGINT, id BIGINT, snippet_start INT, matched_terms INT"))
    val postings = spark.read.parquet(s"$path/postings")
      .where(col("term").isin(termList.toSeq: _*))
    postings.join(broadcast(qTerms), Seq("term"))
      .groupBy(col("query_id"), col("id"))
      .agg(collect_list(col("positions")).as("graft_sl"))
      .select(col("query_id"), col("id"),
        array_max(transform(
          array_distinct(flatten(col("graft_sl"))),
          s => struct(
            size(filter(col("graft_sl"), ps =>
              exists(ps, p => p >= s && p < s + window))).as("m"),
            (-s).as("negs")))).as("graft_best"))
      .select(col("query_id"), col("id"),
        (-col("graft_best")("negs")).cast("int").as("snippet_start"),
        col("graft_best")("m").cast("int").as("matched_terms"))
  }

  /**
   * Prefix (trailing-wildcard) term search over the positional index:
   * documents containing any term starting with `prefix`, with the
   * distinct matching term count and total occurrence count per doc.
   * The scan predicate is a plain StartsWith, so it pushes down to the
   * parquet reader and — because [[buildPositionalIndex]] sorts postings
   * by term — row groups outside the prefix range prune on min/max stats
   * without being read (spec-pinned PushedFilters).
   */
  def prefixSearch(spark: SparkSession, path: String, prefix: String): DataFrame = {
    require(prefix.nonEmpty, "prefix must be non-empty")
    spark.read.parquet(s"$path/postings")
      .where(col("term").startsWith(prefix))
      .groupBy(col("id"))
      .agg(count_distinct(col("term")).as("matched_terms"),
        sum(size(col("positions"))).as("occurrences"))
  }

  /**
   * SymSpell-style spelling suggestions from the positional index's own
   * vocabulary: for each query term NOT in the vocabulary, the vocabulary
   * terms within levenshtein distance 1, top-k by document frequency
   * (ties by suggestion — deterministic). The retrieval front door's
   * "did you mean": correct the query against what the corpus actually
   * contains, weighted by how common each candidate is.
   *
   * Candidate generation is the delete-1 key join (Garbe's SymSpell): a
   * term of length L yields L+1 keys (itself plus each single-character
   * deletion), and any two strings within edit distance 1 share at least
   * one key — so the equi-join is COMPLETE for ED ≤ 1 and the exact
   * levenshtein verify only prunes collisions, never loses a suggestion.
   * Vocabulary key rows are Σ(len+1): linear in vocabulary bytes, shuffled
   * once on the key — never an all-pairs product against the vocabulary.
   */
  def spellCorrections(
      spark: SparkSession, path: String, queries: DataFrame,
      qidCol: String, termsCol: String, topK: Int = 3,
      maxBroadcastQueries: Int = Similarity.MaxBroadcastQueries): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    Similarity.requireBroadcastable(queries, maxBroadcastQueries, "spellCorrections")
    import graft.functions.dsl.top_k_by
    val del1 = (c: String) => expr(
      s"concat(array($c), transform(sequence(1, length($c)), i -> " +
        s"concat(substr($c, 1, i - 1), substr($c, i + 1, length($c) - i))))")
    val vocab = spark.read.parquet(s"$path/postings")
      .groupBy(col("term")).agg(count(lit(1)).as("graft_df"))
    val qterms = queries
      .select(col(qidCol).cast("long").as("query_id"),
        explode(array_distinct(toks(col(termsCol)))).as("term"))
      .join(vocab.select(col("term")), Seq("term"), "left_anti") // OOV only
    val qkeys = broadcast(qterms
      .select(col("query_id"), col("term"), explode(del1("term")).as("graft_key")))
    val vkeys = vocab.select(col("term").as("suggestion"), col("graft_df"),
      explode(del1("term")).as("graft_key"))
    qkeys.join(vkeys, Seq("graft_key"))
      .where(levenshtein(col("term"), col("suggestion")) <= 1)
      .select(col("query_id"), col("term"), col("suggestion"), col("graft_df"))
      .distinct()
      .groupBy(col("query_id"), col("term"))
      .agg(top_k_by(col("graft_df").cast("double"), col("suggestion"), topK)
        .as("graft_top"))
      .select(col("query_id"), col("term"),
        posexplode(col("graft_top")).as(Seq("graft_pos", "graft_t")))
      .select(col("query_id"), col("term"),
        col("graft_t.item").as("suggestion"),
        col("graft_t.ord").cast("long").as("suggestion_df"),
        (col("graft_pos") + 1).cast("int").as("rank"))
  }

  /** Rank one retrieval list for [[rrfFuse]]: 1-based rank per query by
   * (score desc, id asc) — the id tie-break makes ranks a pure function of
   * the (query_id, id, score) set, so fusion stays reproducible. The
   * window partitions by query: lists fed to fusion are top-k truncated
   * (that is what a retrieval list IS — [[searchTopK]] and
   * [[Similarity.topKPerQuery]] both bound them), so each partition is k
   * rows and the window never concentrates a corpus on one task. */
  def rrfRank(df: DataFrame, qidCol: Column, idCol: Column, scoreCol: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("graft_s").desc, col("id").asc)
    df.select(qidCol.cast("long").as("query_id"), idCol.cast("long").as("id"),
        scoreCol.as("graft_s"))
      .withColumn("rank", row_number().over(w))
      .drop("graft_s")
  }

  /**
   * Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of retrieval
   * lists — the standard way to combine BM25 with a dense/ANN list or a
   * static quality prior (PageRank, freshness) WITHOUT calibrating their
   * incomparable score scales: only ranks enter, each list contributes
   * 1/(kRrf + rank) per (query, doc).
   *
   * Deterministic fixed-point: the contribution is `scale div (kRrf +
   * rank)` on longs and the combine is an exact long SUM, so fused scores
   * are a pure function of the input ranks — partitioning- and
   * summation-order-independent, SQL-oracle-reproducible (the engine-wide
   * fixed-point convention). Inputs are (query_id, id, rank) frames from
   * [[rrfRank]] / [[searchTopK]]. Plan: one unionAll (no shuffle), one
   * map-side-combining aggregate on (query_id, id) — with L lists of k
   * rows per query that is L·k rows per query into a single shuffle. */
  def rrfFuse(
      lists: Seq[DataFrame], kRrf: Int = 60,
      scale: Long = 1000000000000L): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(kRrf >= 1, s"kRrf must be >= 1, got $kRrf")
    lists.map(_.select(col("query_id"), col("id"),
        expr(s"${scale}L div (${kRrf}L + rank)").as("graft_c")))
      .reduce(_ unionAll _)
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("graft_c")).as("rrf_fp"), count(lit(1)).as("n_lists"))
  }
}
