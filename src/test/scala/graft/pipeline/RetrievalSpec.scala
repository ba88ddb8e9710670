package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25 batch retrieval over the persisted inverted index: hand-checked
 * ranking, term-filter pushdown into the postings scan, and edge cases. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_retr").toString

  private lazy val corpus = Seq(
    (1L, "spark shuffles data across the cluster"),
    (2L, "spark spark spark tuning guide"),
    (3L, "a completely unrelated cooking recipe"),
    (4L, "cluster sizing and data layout"),
    (5L, "the spark cluster handles data")).toDF("doc_id", "text")

  test("top-k ranking: tf boosts, rare terms outweigh common, ties by id") {
    val idx = tmp()
    Retrieval.buildIndex(corpus, "doc_id", "text", idx)
    val queries = Seq((100L, "spark cluster")).toDF("qid", "q")
    val out = Retrieval.searchTopK(spark, idx, queries, "qid", "q", k = 3)
      .orderBy("rank").collect()
    assert(out.length == 3)
    assert(out.forall(_.getLong(0) == 100L))
    // doc 5 matches both terms; doc 2 has tf=3 on one term; doc 1 both? no:
    // doc 1 has spark+cluster too. The exact order is pinned by the scores:
    val ids = out.map(_.getLong(1)).toSeq
    val scores = out.map(_.getLong(2)).toSeq
    assert(scores == scores.sorted.reverse, "ranks must follow descending score")
    assert(ids.toSet.subsetOf(Set(1L, 2L, 4L, 5L)))
    assert(!ids.contains(3L), "non-matching doc must not appear")
    // both-term docs beat the single-term doc 4
    assert(out.take(2).map(_.getLong(1)).toSet.subsetOf(Set(1L, 2L, 5L)))
  }

  test("scores match a direct BM25 computation on a tiny fixture") {
    val idx = tmp()
    val docs = Seq((1L, "a b"), (2L, "a a"), (3L, "c d")).toDF("doc_id", "text")
    Retrieval.buildIndex(docs, "doc_id", "text", idx)
    val out = Retrieval.searchTopK(spark, idx,
        Seq((9L, "a")).toDF("qid", "q"), "qid", "q", k = 10)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // n=3, avgdl=2, df(a)=2; idf = ln((3-2+0.5)/(2+0.5)+1) = ln(1.6)
    // doc1: tf=1, dl=2 → norm = 2.2/(1+1.2*1) = 1.0; doc2: tf=2 → 4.4/(2+1.2)
    val idf = math.log((3.0 - 2.0 + 0.5) / (2.0 + 0.5) + 1.0)
    def e9(norm: Double) = math.floor(idf * norm * 1e9).toLong
    assert(out(1L) == e9(1.0 * (1.2 + 1.0) / (1.0 + 1.2 * ((1.0 - 0.75) + 0.75 * 2.0 / 2.0))))
    assert(out(2L) == e9(2.0 * (1.2 + 1.0) / (2.0 + 1.2 * ((1.0 - 0.75) + 0.75 * 2.0 / 2.0))))
    assert(out(2L) > out(1L), "higher tf must score higher at equal dl")
    assert(!out.contains(3L))
  }

  test("the query term set pushes into the postings parquet scan") {
    val idx = tmp()
    Retrieval.buildIndex(corpus, "doc_id", "text", idx)
    val queries = Seq((1L, "spark")).toDF("qid", "q")
    val plan = Retrieval.searchTopK(spark, idx, queries, "qid", "q", k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("term"),
      s"postings scan must carry a pushed term filter:\n$plan")
  }

  test("no matching terms / empty query text return empty, typed frames") {
    val idx = tmp()
    Retrieval.buildIndex(corpus, "doc_id", "text", idx)
    val noHit = Retrieval.searchTopK(spark, idx,
      Seq((1L, "zzzqqq vvvkkk")).toDF("qid", "q"), "qid", "q", k = 3)
    assert(noHit.count() == 0)
    val empty = Retrieval.searchTopK(spark, idx,
      Seq((1L, "   ")).toDF("qid", "q"), "qid", "q", k = 3)
    assert(empty.columns.toSeq == Seq("query_id", "id", "score_e9", "rank"))
    assert(empty.count() == 0)
  }

  test("hot-term postings spread across partitions: no file exceeds 2x the mean") {
    // planted stopword corpus: "the" appears in EVERY doc, so a term-only
    // repartition would land all 2000 of its postings in one task; the
    // salted build must spread them while keeping files term-sorted
    val idx = tmp()
    val docs = spark.range(2000)
      .select(col("id").as("doc_id"),
        concat(lit("the w"), col("id")).as("text"))
    // AQE rightly coalesces this tiny shuffle to one partition; disable it
    // here so the test observes the salted layout a real-size build gets
    val prior = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try Retrieval.buildIndex(docs, "doc_id", "text", idx)
    finally spark.conf.set("spark.sql.adaptive.enabled", prior)
    val perFile = spark.read.parquet(s"$idx/postings")
      .groupBy(input_file_name().as("f")).count()
      .collect().map(_.getLong(1))
    val mean = perFile.sum.toDouble / perFile.length
    assert(perFile.length > 1, "expected a multi-file postings layout")
    assert(perFile.max < 2000, s"stopword postings all in one file: ${perFile.toSeq}")
    assert(perFile.max <= 2.0 * mean,
      s"skew bound violated: max=${perFile.max} mean=$mean files=${perFile.toSeq}")
    // search across the salted layout still finds and ranks correctly
    val hits = Retrieval.searchTopK(spark, idx,
        Seq((1L, "w42 the")).toDF("qid", "q"), "qid", "q", k = 1).collect()
    assert(hits.length == 1 && hits(0).getLong(1) == 42L)
  }

  test("maxDfFraction cuts stopword postings from the index, scores unchanged for rare terms") {
    val idxFull = tmp(); val idxCut = tmp()
    Retrieval.buildIndex(corpus, "doc_id", "text", idxFull)
    // "spark" df=3/5, "the" df=2/5, "data" df=3/5 — cut at 0.5 drops df>2.5
    Retrieval.buildIndex(corpus, "doc_id", "text", idxCut, maxDfFraction = 0.5)
    val cutTerms = spark.read.parquet(s"$idxCut/dfs")
      .select("term").collect().map(_.getString(0)).toSet
    assert(!cutTerms.contains("spark") && !cutTerms.contains("data"))
    assert(cutTerms.contains("cooking"), "rare terms must survive the cut")
    assert(spark.read.parquet(s"$idxCut/postings")
      .where(col("term") === "spark").count() == 0)
    // a rare-term query scores IDENTICALLY on both indexes: the cut keeps
    // full corpus stats (n_docs, sum_dl, surviving dfs), only drops terms
    val q = Seq((7L, "cooking recipe")).toDF("qid", "q")
    val full = Retrieval.searchTopK(spark, idxFull, q, "qid", "q", k = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val cut = Retrieval.searchTopK(spark, idxCut, q, "qid", "q", k = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(full == cut)
    // a cut term in the query contributes nothing instead of erroring
    val sparkQ = Retrieval.searchTopK(spark, idxCut,
      Seq((8L, "spark")).toDF("qid", "q"), "qid", "q", k = 5)
    assert(sparkQ.count() == 0)
  }

  test("an aggressive cut past the isin bound takes the anti-join path, same semantics") {
    // >256 terms above the df bar: every doc shares 300 planted stopwords,
    // plus one rare term per doc — the drop list (300) exceeds MaxIsinTerms
    // so the cut runs as a broadcast anti-join, and must behave exactly like
    // the literal-isin path does on a small list
    assert(Retrieval.MaxIsinTerms == 256)
    val stop = (0 until 300).map(i => s"stop$i").mkString(" ")
    val docs = spark.range(40)
      .select(col("id").as("doc_id"),
        concat(lit(stop + " rare"), col("id")).as("text"))
    val idx = tmp()
    Retrieval.buildIndex(docs, "doc_id", "text", idx, maxDfFraction = 0.5)
    val kept = spark.read.parquet(s"$idx/dfs")
      .select("term").collect().map(_.getString(0)).toSet
    assert(kept.size == 40 && kept.forall(_.startsWith("rare")),
      s"only the 40 rare terms may survive, got ${kept.size}")
    assert(spark.read.parquet(s"$idx/postings").count() == 40)
    // stats keep FULL corpus figures (dl includes cut terms), so rare-term
    // scores are the same as an uncut index would give
    val stats = spark.read.parquet(s"$idx/stats").collect().head
    assert(stats.getLong(0) == 40 && stats.getLong(1) == 40L * 301)
    val hit = Retrieval.searchTopK(spark, idx,
      Seq((1L, "rare7")).toDF("qid", "q"), "qid", "q", k = 1).collect()
    assert(hit.length == 1 && hit(0).getLong(1) == 7L)
  }

  test("multi-query batch keeps queries independent") {
    val idx = tmp()
    Retrieval.buildIndex(corpus, "doc_id", "text", idx)
    val queries = Seq((1L, "cooking recipe"), (2L, "spark")).toDF("qid", "q")
    val out = Retrieval.searchTopK(spark, idx, queries, "qid", "q", k = 2)
      .collect().groupBy(_.getLong(0))
    assert(out(1L).map(_.getLong(1)).toSet == Set(3L))
    assert(out(2L).length == 2 && !out(2L).map(_.getLong(1)).contains(3L))
  }

  // ------------------------------------------------- incremental append

  private def searchAll(idx: String): Set[(Long, Long, Long, Int)] = {
    val queries = Seq((1L, "spark cluster"), (2L, "cooking"), (3L, "data layout"))
      .toDF("qid", "q")
    Retrieval.searchTopK(spark, idx, queries, "qid", "q", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
  }

  test("append == rebuild: identical scores and ranks over the union corpus") {
    val grown = tmp(); val rebuilt = tmp()
    val more = Seq(
      (6L, "spark data data pipelines"),
      (7L, "another cooking blog about recipes")).toDF("doc_id", "text")
    Retrieval.buildIndex(corpus, "doc_id", "text", grown)
    Retrieval.appendToIndex(more, "doc_id", "text", grown)
    Retrieval.buildIndex(corpus.unionAll(more), "doc_id", "text", rebuilt)
    assert(searchAll(grown) == searchAll(rebuilt),
      "appended index must score exactly like a rebuild on the union")
    // df partials really did split across batches and sum back at read:
    // "spark" appears in base docs 1,2,5 and appended doc 6
    val dfRows = spark.read.parquet(
        (s"$grown/dfs" +: Retrieval.committedBatchDirs(spark, grown).map(_ + "/dfs")): _*)
      .where(col("term") === "spark").collect().map(_.getLong(1))
    assert(dfRows.sorted.toSeq == Seq(1L, 3L) && dfRows.sum == 4L)
  }

  test("retried and overlapping appends are no-ops") {
    val grown = tmp(); val rebuilt = tmp()
    val more = Seq((6L, "spark data pipelines")).toDF("doc_id", "text")
    Retrieval.buildIndex(corpus, "doc_id", "text", grown)
    Retrieval.appendToIndex(more, "doc_id", "text", grown)
    val after = searchAll(grown)
    Retrieval.appendToIndex(more, "doc_id", "text", grown) // exact retry
    // overlap: docs 5 and 6 already indexed, only 8 is new
    Retrieval.appendToIndex(
      Seq((5L, "the spark cluster handles data"),
        (6L, "spark data pipelines"),
        (8L, "fresh new document")).toDF("doc_id", "text"),
      "doc_id", "text", grown)
    Retrieval.buildIndex(
      corpus.unionAll(more).unionAll(Seq((8L, "fresh new document")).toDF("doc_id", "text")),
      "doc_id", "text", rebuilt)
    assert(searchAll(grown) == searchAll(rebuilt))
    assert(Retrieval.committedBatchDirs(spark, grown).size == 2,
      "retry must not create a third batch")
    // n_docs across batches sums to the union corpus size
    val n = spark.read.parquet(
        (s"$grown/stats" +: Retrieval.committedBatchDirs(spark, grown).map(_ + "/stats")): _*)
      .agg(sum(col("n_docs"))).collect().head.getLong(0)
    assert(n == 7L)
    val fresh = Retrieval.searchTopK(spark, grown,
      Seq((1L, "fresh")).toDF("qid", "q"), "qid", "q", k = 1).collect()
    assert(fresh.length == 1 && fresh(0).getLong(1) == 8L,
      "the genuinely-new doc must be searchable")
  }

  test("an uncommitted (crashed) stage is invisible; the retry completes it") {
    val grown = tmp(); val rebuilt = tmp()
    Retrieval.buildIndex(corpus, "doc_id", "text", grown)
    val before = searchAll(grown)
    val more = Seq((6L, "spark data pipelines")).toDF("doc_id", "text")
    Retrieval.appendToIndex(more, "doc_id", "text", grown)
    // simulate a crash just before commit: remove the marker
    val batch = Retrieval.committedBatchDirs(spark, grown).head
    val fs = new org.apache.hadoop.fs.Path(grown)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(batch, "_COMMITTED"), false)
    assert(Retrieval.committedBatchDirs(spark, grown).isEmpty)
    assert(searchAll(grown) == before, "uncommitted data must not score")
    // the retry rebuilds the same deterministic stage and commits it
    Retrieval.appendToIndex(more, "doc_id", "text", grown)
    Retrieval.buildIndex(corpus.unionAll(more), "doc_id", "text", rebuilt)
    assert(Retrieval.committedBatchDirs(spark, grown) == Seq(batch))
    assert(searchAll(grown) == searchAll(rebuilt))
  }

  test("compaction folds batches into the base: same results, idempotence survives") {
    val grown = tmp(); val rebuilt = tmp()
    val more = Seq(
      (6L, "spark data data pipelines"),
      (7L, "another cooking blog about recipes")).toDF("doc_id", "text")
    Retrieval.buildIndex(corpus, "doc_id", "text", grown)
    Retrieval.appendToIndex(more.where(col("doc_id") === 6L), "doc_id", "text", grown)
    Retrieval.appendToIndex(more.where(col("doc_id") === 7L), "doc_id", "text", grown)
    val before = searchAll(grown)
    Retrieval.compactIndex(spark, grown)
    assert(Retrieval.committedBatchDirs(spark, grown).isEmpty, "batches must fold away")
    assert(searchAll(grown) == before, "compaction must not change results")
    Retrieval.buildIndex(corpus.unionAll(more), "doc_id", "text", rebuilt)
    assert(searchAll(grown) == searchAll(rebuilt))
    // dfs partials really merged: one row per term now
    val dfs = spark.read.parquet(s"$grown/dfs")
    assert(dfs.groupBy("term").count().where(col("count") > 1).count() == 0)
    // the folded docs/ set still repels a re-appended batch
    Retrieval.appendToIndex(more, "doc_id", "text", grown)
    assert(Retrieval.committedBatchDirs(spark, grown).isEmpty,
      "re-appending folded docs must be a no-op")
    // compacting an un-appended index is a no-op
    Retrieval.compactIndex(spark, rebuilt)
    assert(searchAll(rebuilt) == searchAll(grown))
  }

  test("compaction carries the stopword cut list forward") {
    val idx = tmp()
    Retrieval.buildIndex(corpus, "doc_id", "text", idx, maxDfFraction = 0.5)
    Retrieval.appendToIndex(
      Seq((6L, "keyword9 something")).toDF("doc_id", "text"), "doc_id", "text", idx)
    Retrieval.compactIndex(spark, idx)
    // a post-compaction append still honors the original cut
    Retrieval.appendToIndex(
      Seq((7L, "spark spark keyword8")).toDF("doc_id", "text"), "doc_id", "text", idx)
    val batch = Retrieval.committedBatchDirs(spark, idx).head
    val terms = spark.read.parquet(s"$batch/postings")
      .select("term").collect().map(_.getString(0)).toSet
    assert(!terms.contains("spark") && terms.contains("keyword8"))
  }

  test("appended batches honor the build-time stopword cut") {
    val idx = tmp()
    // "spark" df=3/5 and "data" df=3/5 get cut at 0.5
    Retrieval.buildIndex(corpus, "doc_id", "text", idx, maxDfFraction = 0.5)
    Retrieval.appendToIndex(
      Seq((6L, "spark spark spark keyword7")).toDF("doc_id", "text"),
      "doc_id", "text", idx)
    val batch = Retrieval.committedBatchDirs(spark, idx).head
    val batchTerms = spark.read.parquet(s"$batch/postings")
      .select("term").collect().map(_.getString(0)).toSet
    assert(!batchTerms.contains("spark"), "cut terms must stay out of appended postings")
    assert(batchTerms.contains("keyword7"))
    val hit = Retrieval.searchTopK(spark, idx,
      Seq((1L, "keyword7")).toDF("qid", "q"), "qid", "q", k = 1).collect()
    assert(hit.length == 1 && hit(0).getLong(1) == 6L)
    assert(Retrieval.searchTopK(spark, idx,
      Seq((1L, "spark")).toDF("qid", "q"), "qid", "q", k = 5).count() == 0)
  }

  test("rrfRank ranks per query by (score desc, id asc)") {
    val ranked = Retrieval.rrfRank(
        Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (1L, 12L, 0.5), (2L, 10L, 0.1))
          .toDF("q", "doc", "s"),
        col("q"), col("doc"), col("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(ranked((1L, 11L)) == 1)
    assert(ranked((1L, 10L)) == 2) // 0.5 tie broken by id: 10 before 12
    assert(ranked((1L, 12L)) == 3)
    assert(ranked((2L, 10L)) == 1) // ranks restart per query
  }

  test("rrfFuse sums exact fixed-point contributions across lists") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "id", "rank")
    val b = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("query_id", "id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), kRrf = 60)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    val S = 1000000000000L
    assert(got(10L) == (S / 61, 1L))
    assert(got(11L) == (S / 62 + S / 61, 2L)) // rank 2 in a, rank 1 in b
    assert(got(12L) == (S / 62, 1L))
  }

  test("rrf end-to-end is partition-invariant (pure function of the lists)") {
    val scores = (0L until 300L).map(i => (i % 3, i, ((i * 37) % 100).toDouble))
    val df1 = scores.toDF("q", "doc", "s").repartition(1)
    val df5 = scores.toDF("q", "doc", "s").repartition(5, col("doc"))
    def fuse(df: org.apache.spark.sql.DataFrame) =
      Retrieval.rrfFuse(Seq(Retrieval.rrfRank(df, col("q"), col("doc"), col("s"))))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fuse(df1) == fuse(df5))
  }
}
