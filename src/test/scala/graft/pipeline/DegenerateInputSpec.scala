package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Empty frames, empty strings, and single rows through every pipeline
 * operator — the "zero rules crashed the runner" class of bug (round-3
 * ADVICE) applied to the pipeline surface. Everything must return an empty
 * or sensible frame, never throw. */
class DegenerateInputSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def oneDoc = Seq((1L, "just one lonely document here")).toDF("doc_id", "text")

  test("dedup family on empty and single-row corpora") {
    assert(Dedup.exact(emptyDocs, col("doc_id"), col("text")).count() == 0)
    assert(Dedup.exact(oneDoc, col("doc_id"), col("text")).count() == 1)
    assert(Dedup.minhashNearDups(emptyDocs, col("doc_id"), col("text")).count() == 0)
    assert(Dedup.minhashNearDups(oneDoc, col("doc_id"), col("text")).count() == 0)
    assert(Dedup.simhashNearDups(emptyDocs, col("doc_id"), col("text")).count() == 0)
    assert(Dedup.nearDupClusters(emptyDocs, col("doc_id"), col("text")).count() == 0)
    val single = Dedup.nearDupClusters(oneDoc, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toSeq
    assert(single == Seq((1L, 1L))) // singleton clusters to itself
    assert(Dedup.dropNearDups(emptyDocs, col("doc_id"), col("text")).count() == 0)
    assert(Dedup.dropNearDups(oneDoc, col("doc_id"), col("text")).count() == 1)
    assert(Dedup.dropNearDupsKeepLargest(
      emptyDocs, col("doc_id"), col("text"), lit(1L)).count() == 0)
    assert(Dedup.dropNearDupsKeepLargest(
      oneDoc, col("doc_id"), col("text"), lit(5L)).count() == 1)
    assert(Dedup.spanLengthReport(
      emptyDocs, col("doc_id"), col("text"), lit("g")).count() == 0)
    assert(Dedup.spanLengthReport(
      oneDoc, col("doc_id"), col("text"), lit("g")).count() == 0)
  }

  test("containment index on empty/degenerate benchmark and probe sides") {
    try {
      // an EMPTY benchmark registers and probes as 0.0 everywhere
      graft.lookups.Lookups.registerContainmentFrom(
        spark, "graft_degen_contain", emptyDocs, col("text"))
      val probed = oneDoc.select(graft.lookups.Lookups
        .containmentIn(col("text"), "graft_degen_contain").as("c"))
        .as[Double].collect()
      assert(probed.toSeq == Seq(0.0))
      // the shingles contract gives a short doc ONE sub-n shingle, so a
      // short benchmark item still matches its exact copy (containment 1.0)
      // while empty/whitespace probes trim to the empty shingle and miss
      graft.lookups.Lookups.registerContainmentFrom(
        spark, "graft_degen_contain", Seq(Tuple1("ab")).toDF("text"), col("text"))
      val p2 = Seq(Tuple1(""), Tuple1("ab"), Tuple1("   ")).toDF("text")
        .select(graft.lookups.Lookups
          .containmentIn(col("text"), "graft_degen_contain").as("c"))
        .as[Double].collect()
      assert(p2.toSeq == Seq(0.0, 1.0, 0.0), p2.toSeq.toString)
      // a NULL-text benchmark row registers (skipped, not NPE — ADVICE
      // r16) and the non-null items still gate their exact copies
      graft.lookups.Lookups.registerContainmentFrom(
        spark, "graft_degen_contain",
        Seq(Tuple1(null: String), Tuple1("ab")).toDF("text"), col("text"))
      val p3 = Seq(Tuple1("ab"), Tuple1(null: String)).toDF("text")
        .select(graft.lookups.Lookups
          .containmentIn(col("text"), "graft_degen_contain").as("c"))
        .as[Double].collect()
      assert(p3.toSeq == Seq(1.0, 0.0), p3.toSeq.toString)
    } finally graft.lookups.Lookups.unregisterContainment("graft_degen_contain")
  }

  test("packing and sampling on empty corpora and zero-token docs") {
    assert(Curation.packSequences(emptyDocs, col("doc_id"), lit(0L), 512).count() == 0)
    assert(Curation.packGreedy(emptyDocs, col("doc_id"), lit(0L), 512).count() == 0)
    // zero-token docs pack without dividing or overflowing
    val zeros = Seq((1L, 0L), (2L, 0L), (3L, 5L)).toDF("id", "tok")
    val packed = Curation.packSequences(zeros, col("id"), col("tok"), 512, numBuckets = 1)
      .select("id", "seq_start", "seq_end").as[(Long, Long, Long)].collect().toSeq.sorted
    assert(packed == Seq((1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 0L)))
    assert(Curation.packGreedy(zeros, col("id"), col("tok"), 512, 1).count() == 3)
    // sampling: a budget for a domain absent from the data is a no-op;
    // empty input stays empty
    assert(Curation.sampleToTokenBudget(
      emptyDocs.withColumn("d", lit("x")), col("doc_id"), col("d"), lit(1L),
      Map("x" -> 10L)).count() == 0)
    val out = Curation.sampleToTokenBudget(
      oneDoc.withColumn("d", lit("present")), col("doc_id"), col("d"), lit(5L),
      Map("absent" -> 1L))
    assert(out.count() == 1) // unbudgeted domain keeps everything
  }

  test("text functions on empty and whitespace-only strings") {
    val out = Seq("", "   ", "\t\n", "word").toDF("text")
      .select(
        Text.tokenCount(col("text")).as("n"),
        Text.langId(col("text")).as("lang"),
        Text.qualityScore(col("text")).as("q"),
        Text.repetitionRatio(col("text")).as("r"),
        Text.gopherQuality(col("text")).as("g"),
        Text.shingles(col("text"), 3).as("sh"),
        Text.simhash(Text.shingles(col("text"), 3)).as("sig"),
        size(Text.minhash(Text.shingles(col("text"), 3))).as("mh"),
        size(Text.fingerprint(col("text"))).as("fp"))
      .collect()
    assert(out.length == 4) // nothing throws; values are defined
    assert(out.forall(r => r.getInt(7) == 64))
    assert(!out(0).getStruct(4).getBoolean(5)) // empty text fails the gopher gate
  }

  test("r11 operators on empty, null and whitespace-only input") {
    // langIdFull / sentences: nothing throws; null text → null result
    val out = Seq(Some(""), Some("   "), Some("\t\n"), Some("word. next!"), None)
      .toDF("text")
      .select(
        Text.langIdFull(col("text")).as("lid"),
        Text.sentences(col("text")).as("s"))
      .collect()
    assert(out.length == 5)
    assert(out(0).getStruct(0).getString(0) == "und") // empty → und/none
    assert(out(0).getStruct(0).getString(1) == "none")
    assert(out(3).getStruct(0).getString(0) == "und") // "word next" has no profile hits
    assert(out(3).getSeq[String](1) == Seq("word.", "next!"))
    assert(out(4).isNullAt(0) && out(4).isNullAt(1)) // null in → null out
    // whitespace-only → zero sentence units
    assert(out(1).getSeq[String](1).isEmpty && out(2).getSeq[String](1).isEmpty)
    // sentence dedup on empty corpus and all-junk docs
    assert(Dedup.dedupSentences(emptyDocs, col("doc_id"), col("text")).count() == 0)
    val junk = Seq((1L, "!!! ..."), (2L, "??")).toDF("doc_id", "text")
    val dj = Dedup.dedupSentences(junk, col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    assert(dj == Map(1L -> "", 2L -> "")) // rows preserved, text empty
    // hll on empty input and all-null column
    import graft.functions.dsl
    val nulls = Seq[Option[String]](None, None).toDF("x")
    assert(nulls.agg(dsl.hll_estimate(dsl.hll_sketch(col("x"))))
      .as[Long].collect().head == 0L)
    assert(emptyDocs.agg(dsl.hll_estimate(dsl.hll_sketch(col("text"))))
      .as[Long].collect().head == 0L)
  }

  test("curation scoring on empty corpora") {
    assert(Curation.splitByHash(emptyDocs, col("doc_id")).count() == 0)
    assert(Curation.bm25(emptyDocs, col("doc_id"), col("text"), Seq("term")).count() == 0)
    assert(Curation.decontaminate(
      emptyDocs, col("doc_id"), col("text"), oneDoc, col("text")).count() == 0)
    // empty BENCHMARK side: nothing can overlap, corpus passes through clean
    assert(Curation.decontaminate(
      oneDoc, col("doc_id"), col("text"), emptyDocs, col("text")).count() == 0)
  }

  test("similarity search with empty corpus or empty queries") {
    val embs = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val noEmbs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Similarity.bruteForceTopK(noEmbs, embs, "vec_id", "embedding", 3).count() == 0)
    assert(Similarity.bruteForceTopK(embs, noEmbs, "vec_id", "embedding", 3).count() == 0)
    assert(Similarity.lshTopK(noEmbs, embs, "vec_id", "embedding", 3, dim = 2).count() == 0)
    assert(Similarity.embeddingNearDups(noEmbs, "vec_id", "embedding", 0.9, dim = 2).count() == 0)
  }

  test("round-6 operators on empty, whitespace and single-row inputs") {
    // line/span dedup: empty corpus -> empty; whitespace-only docs survive
    assert(Dedup.dedupLines(emptyDocs, col("doc_id"), col("text")).count() == 0)
    assert(Dedup.dedupSpans(emptyDocs, col("doc_id"), col("text")).count() == 0)
    val ws = Seq((1L, "   "), (2L, "\t\n")).toDF("doc_id", "text")
    assert(Dedup.dedupSpans(ws, col("doc_id"), col("text")).count() == 2)
    // LM: empty training corpus still scores (everything OOV on the floor);
    // guard requires only that nothing throws and rows survive
    val emptyLm = Lm.train(emptyDocs, col("text"))
    assert(Lm.score(emptyLm, oneDoc, col("doc_id"), col("text")).count() == 1)
    assert(Lm.collocations(emptyLm).count() == 0)
    // repetition/PII on degenerate strings (nothing throws, values defined)
    val sigs = Seq("", "   ", "\n\n\n", "a").toDF("text")
      .select(Text.repetitionSignals(col("text")).as("r"),
        Pii.piiSignals(col("text")).as("p"),
        Pii.redactPii(col("text")).as("red"),
        Pii.piiDensity(col("text")).as("d"))
      .collect()
    assert(sigs.length == 4)
    // semantic dedup over an empty embedding frame
    val noEmbs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Similarity.semanticDedupWithCentroids(noEmbs, "vec_id", "embedding",
      Array(0 -> Array(1.0, 0.0)), 0.9).count() == 0)
    // bloom decontamination with an empty benchmark: no doc can be flagged
    assert(Curation.decontaminateBloom(
      oneDoc, col("doc_id"), col("text"), emptyDocs, col("text"),
      bloomName = "graft_decontam_degen").count() == 0)
    // temperature sampling: empty input; single zero-token domain keeps all
    assert(Curation.temperatureSample(
      emptyDocs.withColumn("d", lit("x")), col("doc_id"), col("d"), lit(1L),
      totalBudget = 10L).count() == 0)
    assert(Curation.temperatureSample(
      oneDoc.withColumn("d", lit("x")), col("doc_id"), col("d"), lit(0L),
      totalBudget = 10L).count() == 1)
    // BPE from an empty corpus: empty merge table, counts fall back to chars
    val m = Bpe.learnMerges(emptyDocs, col("text"), numMerges = 5, minCount = 1)
    assert(m.merges.isEmpty)
    val bpeOut = Seq("ab", "").toDF("t")
      .select(Bpe.tokenCount(m, col("t"))).as[Int].collect().toSeq
    assert(bpeOut == Seq(2, 0))
    // classifier training on a single-class frame converges without NaNs
    val single = Seq(("only positive docs", 1.0)).toDF("text", "y")
    val clf = Classifier.train(single, col("text"), col("y"), dim = 32, iters = 3)
    assert(!clf.weights.exists(_.isNaN))
  }

  test("round-7 operators on empty and degenerate inputs") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val nullish = Seq((1L, Option.empty[String]), (2L, Some(""))).toDF("doc_id", "text")
    // top-ngram report: empty corpus → empty report; null/empty text → the
    // single empty shingle, never a crash
    assert(Curation.topNgrams(emptyDocs, col("text")).count() == 0)
    val tn = Curation.topNgrams(nullish, col("text"), n = 3, k = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tn == Map("" -> 1L)) // null text yields no shingles, "" yields [""]
    // paragraph dedup: empty corpus, null text, whitespace-only
    assert(Dedup.dedupParagraphs(emptyDocs, col("doc_id"), col("text")).count() == 0)
    val dp = Dedup.dedupParagraphs(nullish, col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    assert(dp(1L) == "" && dp(2L) == "")
    // quality gate on an empty frame and a null-text frame: no rows pass,
    // nothing throws
    assert(graft.streaming.StreamingGate.gate(emptyDocs, col("text")).count() == 0)
    assert(graft.streaming.StreamingGate.gate(nullish, col("text")).count() == 0)
    // PQ training on an empty corpus fails loudly, not with an opaque head()
    val noEmbs = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pq.trainCodebook(noEmbs, "embedding", mSub = 2, ksub = 4)
    }
    assert(e.getMessage.contains("empty corpus"))
    // codegen word splitter: null → null (guarded by coalesce at call sites)
    val w = nullish.select(Text.words(col("text")).as("w")).collect()
    assert(w(0).isNullAt(0) && w(1).getSeq[String](0).isEmpty)
  }

  test("r8 surface: nulls and empties through every new operator") {
    val nullish = Seq((1L, null: String), (2L, ""), (3L, "real text here with words"))
      .toDF("doc_id", "text")

    // blocklist gate: null text → null hits/blocked (can never PASS a
    // where(blocked) or where(!blocked) filter — the null-can't-pass rule)
    val bl = Curation.blocklistGate(nullish, col("text"), Seq("words"))
      .collect().map(r => r.getLong(0) -> (Option(r.get(2)), Option(r.get(3)))).toMap
    assert(bl(1L) == (None, None))
    assert(bl(2L) == (Some(0), Some(false)))
    assert(bl(3L) == (Some(1), Some(true)))

    // tfidf: null/empty docs contribute no terms and vanish from the output
    val tk = Curation.tfidfKeywords(nullish, col("doc_id"), col("text"), topK = 3, minDf = 1)
    assert(tk.select("id").distinct().as[Long].collect().toSet == Set(3L))
    assert(Curation.tfidfKeywords(emptyDocs, col("doc_id"), col("text")).count() == 0)

    // percentile report: empty input → empty report, not a crash
    assert(Curation.percentileReport(emptyDocs, col("text"), col("doc_id")).count() == 0)

    // within-doc dedup: null text → empty-ish row preserved, nothing throws
    val wd = Dedup.dedupLinesWithinDoc(nullish, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(wd(2L) == Some("") && wd(3L) == Some("real text here with words"))
    assert(wd.contains(1L)) // row survives (null or "" both acceptable)

    // LM paragraph filter: null text behaves like empty (row kept, text "")
    val lm = Lm.train(Seq("the quick brown fox").toDF("text"), col("text"))
    val lf = Lm.filterParagraphs(lm, nullish, col("doc_id"), col("text"), 0L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lf(1L) == "" && lf.contains(3L))

    // DSIR: null text scores (0, 0) on BOTH scoring paths
    val dm = Dsir.train(nullish, col("text"), nullish.where(col("doc_id") === 3), col("text"), 64)
    val dw = Dsir.weight(dm, nullish, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(dw(1L) == (0L, 0L) && dw(2L) == (0L, 0L))
    val di = Dsir.weightInline(Dsir.collectModel(dm), nullish, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // inline projection matches the join path on NULL text too: (0, 0)
    assert(di.size == 3 && di(1L) == (0L, 0L) && di(2L) == (0L, 0L))

    // hashed BoW: null → null vector; empty → zero vector
    val hb = nullish.select(Text.hashedBow(col("text"), 32).as("v")).collect()
    assert(hb(0).isNullAt(0))
    assert(hb(1).getSeq[Double](0).forall(_ == 0.0))

    // SQ: training on an empty corpus fails loudly
    val noEmbs = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](Sq.train(noEmbs, col("embedding")))
    assert(e.getMessage.contains("no non-null vectors"))

    // embeddingOutliers: empty frame → empty, not a crash
    val cents = Array(0 -> Array(1.0, 0.0))
    assert(Similarity.embeddingOutliers(noEmbs, "vec_id", "embedding", cents, 0.5).count() == 0)
  }

  test("graph tier on empty, null and degenerate inputs") {
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    // rank over an empty graph fails loudly (no node universe to seed)
    intercept[IllegalArgumentException](
      Graphs.pageRankFixed(noEdges, col("src"), col("dst")).count())
    // empty edges but a real node universe: everyone settles at base rank
    val lonely = Graphs.pageRankFixed(noEdges, col("src"), col("dst"),
        Seq(1L, 2L).toDF("id"), col("id"))
      .as[(Long, Long)].collect().toMap
    assert(lonely.values.toSet == Set(((100L - 85L) * (1000000000000L / 2)) / 100L))
    // html extractors: null html → null, empty html → empty results
    val nul = Seq(Tuple1(null: String), Tuple1(""), Tuple1("plain text, no tags"))
      .toDF("h")
    val lk = nul.select(Text.htmlLinks(col("h")).as("l")).collect()
    assert(lk(0).isNullAt(0))
    assert(lk(1).getSeq[String](0).isEmpty && lk(2).getSeq[String](0).isEmpty)
    val mt = nul.select(Text.htmlMeta(col("h")).as("m")).collect()
    assert(mt(0).isNullAt(0))
    assert(mt(1).getStruct(0).getString(0) == "")
    // hostEdges/anchorTerms on empty frames → empty frames
    val noPages = Seq.empty[(String, String)].toDF("url", "html")
    assert(Graphs.hostEdges(noPages, col("url"), col("html")).count() == 0)
    assert(Graphs.anchorTerms(noPages, col("html")).count() == 0)
    assert(Graphs.reciprocalLinkRatio(noEdges, col("src"), col("dst")).count() == 0)
    assert(Graphs.coCitations(noEdges, col("src"), col("dst")).count() == 0)
  }

  test("robots/sitemap tier on empty and malformed inputs") {
    // empty / comment-only / garbage robots bodies parse to zero rules
    assert(Robots.parse("").isEmpty)
    assert(Robots.parse("# only comments\n\n:::\nno colon line").isEmpty)
    val noRules = Robots.parseDf(
      Seq.empty[(String, String)].toDF("host", "txt"), col("host"), col("txt"))
    // zero rules → every URL fetchable (the default-allow contract)
    val got = Robots.isAllowed(noRules,
        Seq("https://x.com/a").toDF("u"), col("u"), "bot")
      .collect().map(r => r.getBoolean(1)).toSeq
    assert(got == Seq(true))
    // null robots body → no rules, not a crash
    assert(Robots.parseDf(Seq(("h", null: String)).toDF("host", "txt"),
      col("host"), col("txt")).count() == 0)
    // sitemap extraction on null/empty/non-XML text
    val sm = Seq(Tuple1(null: String), Tuple1(""), Tuple1("not xml at all"))
      .toDF("x").select(Sitemaps.entries(col("x")).as("e")).collect()
    assert(sm(0).isNullAt(0))
    assert(sm(1).getSeq[Any](0).isEmpty && sm(2).getSeq[Any](0).isEmpty)
  }
}
