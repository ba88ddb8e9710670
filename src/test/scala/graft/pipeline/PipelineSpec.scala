package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today"),
    (1L, "the quick brown fox jumps over the lazy dog again and again"),     // near-dup of 0
    (2L, "completely different content about spark sql engines and shuffles here"),
    (3L, "the quick brown fox jumps over the lazy dog again and again today") // exact dup of 0
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id per content") {
    val out = Dedup.exact(docs, col("doc_id"), col("text"))
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L))
  }

  test("minhash LSH finds near and exact dups, not unrelated docs") {
    val pairs = Dedup.minhashNearDups(docs, col("doc_id"), col("text"), shingleSize = 2, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)))
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("cross-corpus near-dup join: attribution pairs across two frames, no self pairs") {
    val reference = Seq(
      (1L, "the quick brown fox jumps over the lazy dog in the meadow"),
      (2L, "an entirely different reference document about engines and parts"),
      (3L, "shared exact content that appears verbatim in both corpora")).toDF("id", "t")
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog in the"), // near-dup of 1
      (102L, "completely novel incoming content with its own words"),
      (103L, "shared exact content that appears verbatim in both corpora") // exact dup of 3
    ).toDF("id", "t")
    val pairs = Dedup.minhashNearDupJoin(
        reference, col("id"), col("t"), batch, col("id"), col("t"),
        shingleSize = 2, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair.contains((1L, 101L)), s"near-dup pair missing: ${byPair.keys}")
    assert(byPair((3L, 103L)) == 1.0, "exact cross-corpus dup must verify at 1.0")
    // no within-corpus pairs, nothing touching the novel/unrelated docs
    assert(pairs.forall(p => p._1 <= 3L && p._2 >= 101L))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 102L))
    // disjoint corpora → empty
    assert(Dedup.minhashNearDupJoin(
      reference.where(col("id") === 2L), col("id"), col("t"),
      batch.where(col("id") === 102L), col("id"), col("t"),
      shingleSize = 2, threshold = 0.5).count() == 0)
  }

  test("minhash bucket cap bounds mega-cluster blowup") {
    // 30 exact copies + 1 outlier: capped buckets drop the flood but the
    // operator still terminates with pairs only from small buckets
    val flood = (0L until 30L).map(i => (i, "same text repeated for everyone here today"))
    val floodDf = (flood :+ (99L, "an entirely different document about engines")).toDF("doc_id", "text")
    val uncapped = Dedup.minhashNearDups(floodDf, col("doc_id"), col("text"), shingleSize = 2).count()
    assert(uncapped == 30L * 29 / 2)
    val capped = Dedup.minhashNearDups(floodDf, col("doc_id"), col("text"), shingleSize = 2,
      maxBucketSize = 10).count()
    assert(capped == 0)
  }

  private def planNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    p match {
      case a: AdaptiveSparkPlanExec => planNodes(a.executedPlan)
      case q: QueryStageExec => q +: planNodes(q.plan)
      case other => other +: other.children.flatMap(planNodes)
    }
  }

  test("minhash plan, no-broadcast regime: exactly one corpus signature pass via exchange reuse") {
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    // with broadcasting disabled (the shape every join takes once the corpus
    // outgrows the threshold — i.e. at 100 TB) the band self-join must reuse
    // ONE shuffle exchange over the signature projection, not compute the
    // corpus-wide shingle→minhash pass per side
    val dir = java.nio.file.Files.createTempDirectory("graft_mh_plan").toString
    docs.write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir) // non-local source: projections can't constant-fold
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pairs = Dedup.minhashNearDups(src, col("doc_id"), col("text"), shingleSize = 2, threshold = 0.5)
      pairs.collect() // finalize AQE stages
      val all = planNodes(pairs.queryExecution.executedPlan)
      // count compute sites (projections) only — pushed-down null filters
      // and scans echo the expression without evaluating the corpus pass
      val sigNodes = all.count {
        case p: org.apache.spark.sql.execution.ProjectExec =>
          p.expressions.exists(_.exists(_.isInstanceOf[MinHashExpression]))
        case _ => false
      }
      assert(sigNodes == 1,
        s"corpus signature pass planned $sigNodes times:\n${pairs.queryExecution.executedPlan}")
      assert(all.exists(_.isInstanceOf[ReusedExchangeExec]),
        s"no reused exchange:\n${pairs.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("minhash plan, default regime: broadcast candidate verify, no window") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val pairs = Dedup.minhashNearDups(docs, col("doc_id"), col("text"), shingleSize = 2, threshold = 0.5)
    pairs.collect() // finalize AQE stages
    val all = planNodes(pairs.queryExecution.executedPlan)
    // the candidate side is tiny vs the corpus: verify joins must broadcast,
    // and nothing may funnel the corpus through a single-partition window
    val bhj = all.collect { case b: BroadcastHashJoinExec => b }
    assert(bhj.size >= 2, s"candidate-verify joins not broadcast:\n${pairs.queryExecution.executedPlan}")
    assert(!all.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]))
  }

  test("simhash plan: one corpus signature pass in any regime (explicit band shuffle)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sh_plan").toString
    docs.write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    val pairs = Dedup.simhashNearDups(src, col("doc_id"), col("text"), shingleSize = 2)
    pairs.collect() // finalize AQE stages
    val all = planNodes(pairs.queryExecution.executedPlan)
    // the explicit repartition on (band, bucket) materializes the signature
    // projection behind one exchange both self-join sides read — even a
    // broadcast-demoted join cannot recompute the corpus pass. Count compute
    // sites (projections) only: the pushed-down isnotnull filter and the
    // scan echo the expression without evaluating it per consumer.
    val sigNodes = all.count {
      case p: org.apache.spark.sql.execution.ProjectExec =>
        p.expressions.exists(_.exists(_.isInstanceOf[SimHashExpression]))
      case _ => false
    }
    assert(sigNodes == 1,
      s"corpus simhash pass planned $sigNodes times:\n${pairs.queryExecution.executedPlan}")
  }

  test("nearDupClusters handles long chains (diameter > 10) with checkpointing") {
    // sliding windows over distinct words: adjacent docs share 37/39 shingles
    // (J≈0.95 ≥ 0.93) but offset-2 pairs only 36/40 (0.9 < 0.93) — a 15-node
    // path graph, diameter 14, needing >10 label-propagation rounds with
    // repeated localCheckpoint lineage truncation
    val words = (0 until 60).map(i => s"w$i")
    val chain = (0 until 15).map(i => (i.toLong, words.slice(i, i + 40).mkString(" ")))
    val clusters = Dedup.nearDupClusters(chain.toDF("doc_id", "text"),
        col("doc_id"), col("text"), threshold = 0.93)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.size == 15)
    assert(clusters.values.toSet == Set(0L), s"chain did not converge to one cluster: $clusters")
  }

  test("planted exact-dup flood: clusters and curation stay correct via exact pre-collapse") {
    // 2000 identical docs would explode the LSH bucket join (bucket cap would
    // silently drop them at pair level); the exact pre-collapse sends ONE
    // representative to LSH and rejoins members by direct edges
    val flood = (0L until 2000L).map(i => (i, "the same exact boilerplate text for every single row here"))
    val extras = Seq(
      (5000L, "the same exact boilerplate text for every single row here today"), // near-dup of flood
      (6000L, "an entirely unrelated document about distributed query engines"))
    val df = (flood ++ extras).toDF("doc_id", "text")
    val clusters = Dedup.nearDupClusters(df, col("doc_id"), col("text"), threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 2000L).forall(clusters(_) == 0L), "flood members must join rep's cluster")
    assert(clusters(5000L) == 0L, "near-dup of the flood rep must join the cluster")
    assert(clusters(6000L) == 6000L)
    val kept = Dedup.dropNearDups(df, col("doc_id"), col("text"), threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 6000L), s"curation must keep one flood rep + the unrelated doc: $kept")
  }

  test("nearDupClusters: all-distinct corpus yields singleton clusters") {
    val distinct = Seq(
      (10L, "first entirely unique document about parquet readers"),
      (11L, "second text concerning watermark semantics in streams"),
      (12L, "third unrelated piece on broadcast hash joins")).toDF("doc_id", "text")
    val clusters = Dedup.nearDupClusters(distinct, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(10L -> 10L, 11L -> 11L, 12L -> 12L))
  }

  test("simhash finds near dups") {
    val pairs = Dedup.simhashNearDups(docs, col("doc_id"), col("text"), shingleSize = 2, maxHamming = 12)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("connected-component clusters chain transitively") {
    // 0≈1≈3 form one cluster through pairwise similarity; 2 is a singleton
    val clusters = Dedup.nearDupClusters(docs, col("doc_id"), col("text"),
        shingleSize = 2, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(0L) == 0L && clusters(1L) == 0L && clusters(3L) == 0L)
    assert(clusters(2L) == 2L)
  }

  test("ngram jaccard: identical=1, disjoint=0") {
    val out = docs.as("a").join(docs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        Dedup.ngramJaccard(col("a.text"), col("b.text"), 2).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((0L, 3L)) == 1.0)
    assert(out((0L, 2L)) == 0.0)
  }

  test("bpe-style regex token count splits like a GPT-2 pre-tokenizer") {
    val out = Seq(
      "Hello world",            // 2 word tokens
      "I'm fine, thanks!",      // I + 'm + fine + , + thanks + ! = 6
      "a1b2 33")                // a + 1 + b + 2 + 33 = 5
      .toDF("text").select(Text.bpeTokenCount(col("text")).as("n")).as[Int].collect()
    assert(out.toSeq == Seq(2, 6, 5))
  }

  test("url parsing: host/path/tld incl. ports, bare hosts, schemeless") {
    val rows = Seq(
      "https://a.example.com/x/y?q=1",
      "http://example.org",
      "https://sub.example.co.uk:8080/p",
      "https://user:pw@example.com/secret",
      "ftp://10.0.0.1/f.txt",
      "not a url at all").toDF("u")
      .select(Text.urlHost(col("u")).as("h"), Text.urlPath(col("u")).as("p"),
        Text.urlTld(col("u")).as("t"))
      .as[(String, String, String)].collect().toSeq
    assert(rows == Seq(
      ("a.example.com", "/x/y", "com"),
      ("example.org", "", "org"),
      // port and userinfo strip: one domain regardless of authority variant
      ("sub.example.co.uk", "/p", "uk"),
      ("example.com", "/secret", "com"),
      ("10.0.0.1", "/f.txt", "1"), // naive TLD on IPs: documented simple split
      ("", "", "")))
  }

  test("registrableDomain groups subdomains without lumping public suffixes") {
    val got = Seq(
      "https://a.b.example.co.uk/x",   // multi-part suffix: keep 3 labels
      "https://shop.example.co.uk/y",  // same site, different subdomain
      "https://www.example.com/z",     // plain suffix: keep 2
      "https://example.com/w",
      "https://deep.sub.mart.com.au/v",
      "https://localhost/p",           // dotless host passes through
      "https://co.uk/",                // host IS the suffix: pass through
      "https://A.Example.CO.UK/x")     // DNS is case-insensitive: must
                                       // still see the co.uk suffix
      .toDF("u").select(Text.registrableDomain(col("u")))
      .as[String].collect().toSeq
    assert(got == Seq(
      "example.co.uk", "example.co.uk", "example.com", "example.com",
      "mart.com.au", "localhost", "co.uk", "example.co.uk"))
    // cap keyed on registrableDomain cannot be dodged with subdomains
    assert(got.take(2).distinct.size == 1)
  }

  test("evalTopK: exact-ppm recall of predicted lists vs truth") {
    val pred = Seq((1L, 10L), (1L, 11L), (1L, 11L), (2L, 20L)).toDF("query_id", "neighbor_id")
    val truth = Seq((1L, 10L), (1L, 12L), (2L, 20L), (2L, 21L)).toDF("query_id", "neighbor_id")
    val r = Similarity.evalTopK(pred, truth).collect()(0)
    // hits: (1,10) and (2,20); dup (1,11) rows dedup before counting
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 4L, 500000L)))
    val empty = Similarity.evalTopK(
      Seq.empty[(Long, Long)].toDF("query_id", "neighbor_id"), truth).collect()(0)
    assert(empty.getLong(0) == 0L && empty.getLong(2) == 0L)
  }

  test("lshPlans: S-curve math ranks bandings around the threshold") {
    val plans = Dedup.lshPlans(64, threshold = 0.7)
    assert(plans.map(p => (p.bands, p.rowsPerBand)).toSet ==
      Set((1, 64), (2, 32), (4, 16), (8, 8), (16, 4), (32, 2), (64, 1)))
    val best = plans.head
    // the default 16x4 banding's crossover (1/16)^(1/4) = 0.5 sits nearest
    // 0.7 among divisors of 64... verify analytically rather than assume:
    assert(plans.forall(p => math.abs(best.crossover - 0.7) <=
      math.abs(p.crossover - 0.7) + 1e-12))
    // S-curve sanity: recall above threshold beats leakage below, always
    plans.foreach { p =>
      assert(p.pAbove >= p.pAtThreshold && p.pAtThreshold >= p.pBelow)
      assert(p.pAtThreshold >= 0.0 && p.pAtThreshold <= 1.0)
    }
    // the shipped default (16 bands x 4 rows) catches >= 93% at s = 0.7
    val shipped = plans.find(p => p.bands == 16 && p.rowsPerBand == 4).get
    assert(shipped.pAtThreshold > 0.93)
  }

  test("creditCardCount: Luhn separates cards from digit runs; redact is shape-based") {
    val rows = Seq(
      "visa 4111 1111 1111 1111 ok",          // valid, spaced
      "visa 4111-1111-1111-1112 broken",      // check digit off by one
      "amex 378282246310005 inline",          // 15-digit valid
      "phone 555-867-5309 and order 123456789012", // too short / luhn-fail
      "bare 5500000000000004 mastercard")     // valid, unseparated
      .toDF("t").select(Pii.creditCardCount(col("t")).as("n"))
      .as[Int].collect().toSeq
    assert(rows == Seq(1, 0, 1, 0, 1))
    val red = Seq(Tuple1("pay 4111 1111 1111 1111 or order 123456789012345 now"))
      .toDF("t").select(Pii.redactCreditCards(col("t"))).as[String].head()
    // shape-based: the order number redacts too — safe direction for privacy
    assert(red == "pay <CARD> or order <CARD> now")
  }

  test("ibanCount: mod-97 verification, structural regex") {
    val rows = Seq(
      "valid DE89370400440532013000 here",
      "broken DE89370400440532013001 checksum",
      "GB82WEST12345698765432 letters in body",
      "lowercase de89370400440532013000 skipped",
      "short DE8912345 not an iban")
      .toDF("t").select(Pii.ibanCount(col("t")).as("n"))
      .as[Int].collect().toSeq
    assert(rows == Seq(1, 0, 1, 0, 0))
    assert(Seq(Tuple1("pay DE89370400440532013000 now")).toDF("t")
      .select(Pii.redactIbans(col("t"))).as[String].head() == "pay <IBAN> now")
  }

  test("pseudonymize: deterministic joinable keys, unlinkable across keys") {
    val a = Seq(("u1", 1), ("u2", 2), (null, 3)).toDF("user", "x")
      .select(Pii.pseudonymize(col("user"), "k2024").as("p"), col("x"))
    val b = Seq(("u1", 10), ("u3", 30)).toDF("user", "y")
      .select(Pii.pseudonymize(col("user"), "k2024").as("p"), col("y"))
    // joins keep working on pseudonyms — same value, same key, same hash
    val joined = a.join(b, "p").select("x", "y").as[(Int, Int)].collect().toSeq
    assert(joined == Seq((1, 10)))
    // null passes through; different keys are unlinkable namespaces
    assert(a.where(col("p").isNull).select("x").as[Int].collect().toSeq == Seq(3))
    val rekeyed = Seq(Tuple1("u1")).toDF("user")
      .select(Pii.pseudonymize(col("user"), "k2025").as("p")).as[String].head()
    assert(!a.where(col("p") === rekeyed).isEmpty == false)
    // exact digest pinned (sha256("k2024:u1")) — the SQL-replicability contract
    assert(a.orderBy("x").select("p").as[String].head() ==
      java.security.MessageDigest.getInstance("SHA-256")
        .digest("k2024:u1".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    // SQL-callable
    graft.functions.Registry.registerAll(spark)
    assert(spark.sql("SELECT pseudonymize('u1', 'k2024') = sha2('k2024:u1', 256) AS ok")
      .as[Boolean].head())
  }

  test("dropNearDupsPreferring keeps the canonical (high-priority) copy") {
    val base = "the quick brown fox jumped over the extremely lazy sleeping dog today"
    val near = "the quick brown fox jumped over the extremely lazy sleeping dog"
    val corpus = Seq(
      (1L, base, Some(0L)),    // scraper copy, low priority, LOWER id
      (2L, near, Some(9L)),    // canonical source, high priority
      (3L, "a completely different and unrelated document body here", Some(5L)),
      (4L, base, None: Option[Long])) // exact dup of 1, NULL prio loses
      .toDF("doc_id", "text", "prio")
    val kept = Dedup.dropNearDupsPreferring(
        corpus, col("doc_id"), col("text"), col("prio"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L)) // 2 beats 1 and 4 despite higher id
    // contrast: lowest-id-wins would keep 1
    assert(Dedup.dropNearDups(corpus, col("doc_id"), col("text"))
      .select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("evalPairs: canonicalization, exact ppm metrics, empty-side nulls") {
    // (2,3) and (3,2) are ONE pair after canonicalization; dup rows dedup
    val pred = Seq((1L, 2L), (2L, 3L), (3L, 2L), (4L, 5L)).toDF("a", "b")
    val truth = Seq((2L, 1L), (4L, 5L), (6L, 7L)).toDF("a", "b")
    val r = Dedup.evalPairs(pred, col("a"), col("b"), truth, col("a"), col("b"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 1L, 1L)))
    assert(r.getLong(3) == 666666L) // 2/3 precision, exact ppm floor
    assert(r.getLong(4) == 666666L)
    assert(r.getLong(5) == 666666L) // 2·2e6 / (4+1+1)
    val empty = Dedup.evalPairs(
        Seq.empty[(Long, Long)].toDF("a", "b"), col("a"), col("b"),
        truth, col("a"), col("b"))
      .collect()(0)
    assert(empty.getLong(0) == 0L && empty.getLong(2) == 3L)
    assert(empty.isNullAt(3) && empty.getLong(4) == 0L) // no preds → precision null
  }

  test("readability: counts and Flesch formula, degenerate texts null out") {
    val r = Seq(
      "The cat sat. The dog ran.",  // 6 words, 2 sentences, 6 vowel groups
      "",                           // no words → null flesch
      "!!! ...").toDF("t")          // punctuation only: 2 "words", 0 sentences
      .select(Text.readability(col("t")).as("r"))
      .select(col("r.words"), col("r.sentences"), col("r.syllables"), col("r.flesch"))
      .collect()
    assert(r(0).getInt(0) == 6 && r(0).getInt(1) == 2 && r(0).getInt(2) == 6)
    // 206.835 - 1.015*(6/2) - 84.6*(6/6) = 206.835 - 3.045 - 84.6
    assert(math.abs(r(0).getDouble(3) - 119.19) < 1e-9)
    assert(r(1).getInt(0) == 0 && r(1).isNullAt(3))
    assert(r(2).getInt(1) == 0 && r(2).isNullAt(3))
  }

  test("gopher quality heuristics measure and gate documents") {
    val good = ("the data should be part of " * 10).trim // 60 words, clean
    val symbols = "the be of ### and ... ### that ... have #" // symbol-heavy
    val numeric = "the be 111 222 333 444 555 666 777 888"   // low alpha ratio
    // each symbol's ratio is 5/70 ≈ 0.07 ≤ 0.1 though combined is 0.14:
    // Gopher table A1 gates the symbols independently, so this passes
    val mixedSymbols = good + (" #" * 5) + (" ..." * 5)
    val out = Seq(good, symbols, numeric, mixedSymbols).toDF("text")
      .select(Text.gopherQuality(col("text"), minWords = 5).as("g"))
      .select("g.word_count", "g.mean_word_len", "g.symbol_ratio",
        "g.alpha_word_ratio", "g.stopword_hits", "g.pass")
      .collect()
    assert(out(0).getInt(0) == 60 && out(0).getBoolean(5),
      s"clean doc should pass: ${out(0)}")
    assert(out(0).getDouble(3) == 1.0 && out(0).getInt(4) >= 2)
    assert(!out(1).getBoolean(5) && out(1).getDouble(2) > 0.1,
      s"symbol-heavy doc should fail on symbol_ratio: ${out(1)}")
    assert(!out(2).getBoolean(5) && out(2).getDouble(3) < 0.8,
      s"numeric doc should fail on alpha_word_ratio: ${out(2)}")
    assert(out(3).getBoolean(5) && out(3).getDouble(2) > 0.1,
      s"per-symbol gates pass though the combined ratio exceeds 0.1: ${out(3)}")
  }

  test("text functions: tokens, lang, quality") {
    val out = Seq("the cat and the dog", "der hund und die katze und")
      .toDF("text")
      .select(
        Text.tokenCount(col("text")).as("n"),
        Text.langId(col("text")).as("lang"),
        Text.qualityScore(col("text")).as("q"))
      .collect()
    assert(out(0).getInt(0) == 5 && out(0).getString(1) == "en")
    assert(out(1).getInt(0) == 6 && out(1).getString(1) == "de")
    assert(out(0).getDouble(2) > 1.0)
  }

  test("sentence split: terminator runs, unterminated tail, junk units dropped") {
    def sents(t: String): Seq[String] =
      Seq(Tuple1(t)).toDF("t").select(Text.sentences(col("t")).as("s"))
        .as[Seq[String]].collect().head
    assert(sents("First one. Second two! Third three?") ==
      Seq("First one.", "Second two!", "Third three?"))
    // terminator RUNS stay attached; the unterminated tail is a sentence
    assert(sents("Really?! Yes... and the tail goes on") ==
      Seq("Really?!", "Yes...", "and the tail goes on"))
    // pure punctuation / whitespace / empty → no units
    assert(sents("") == Seq.empty)
    assert(sents("... !!! ???") == Seq.empty)
    assert(sents("one") == Seq("one"))
    // FULL whitespace trim: a sentence led by the previous line's newline
    // must hash identically to its space-led twin (line-initial boilerplate
    // would otherwise escape the cross-doc census)
    assert(sents("Para one.\nSubscribe now!\tTail text here") ==
      Seq("Para one.", "Subscribe now!", "Tail text here"))
  }

  test("sentence dedup: cross-doc pitch sentences drop, within-doc repeats keep first") {
    val d = Seq(
      (1L, "Subscribe now! Alpha fact one. Visit us."),
      (2L, "Subscribe now! Beta fact two. Visit us."),
      (3L, "Gamma only fact. Gamma only fact. Other gamma news.")).toDF("id", "t")
    val cross = Dedup.dedupSentences(d, col("id"), col("t"))
      .as[(Long, String)].collect().toMap
    // "Subscribe now!" and "Visit us." appear in 2 docs → dropped there;
    // doc 3's internal repeat is NOT cross-doc and survives both copies
    assert(cross(1L) == "Alpha fact one.")
    assert(cross(2L) == "Beta fact two.")
    assert(cross(3L) == "Gamma only fact. Gamma only fact. Other gamma news.")
    val within = Dedup.dedupSentencesWithinDoc(d, col("id"), col("t"))
      .as[(Long, String)].collect().toMap
    assert(within(3L) == "Gamma only fact. Other gamma news.")
    assert(within(1L) == "Subscribe now! Alpha fact one. Visit us.")
  }

  test("langIdFull: script breadth, mixed scripts, kana rule, pinned latin four") {
    def lid(texts: String*): Array[(String, String, Double)] =
      texts.toDF("text")
        .select(Text.langIdFull(col("text")).as("l"))
        .select(col("l.lang"), col("l.script"), col("l.confidence"))
        .as[(String, String, Double)].collect()
    // script-determined languages
    val Array(zh, ko, ru, ar, hi, el, he, th) = lid(
      "这是中文文本", "한국어 문장입니다", "русский текст тут", "نص عربي هنا",
      "हिंदी पाठ यहां", "ελληνικό κείμενο εδώ", "טקסט בעברית כאן", "ข้อความภาษาไทย")
    assert(zh == (("zh", "han", 1.0)))
    assert(ko._1 == "ko" && ko._2 == "hangul" && ko._3 == 1.0)
    assert(ru == (("ru", "cyrillic", 1.0)) && ar == (("ar", "arabic", 1.0)))
    assert(hi == (("hi", "devanagari", 1.0)) && el == (("el", "greek", 1.0)))
    assert(he == (("he", "hebrew", 1.0)) && th == (("th", "thai", 1.0)))
    // the kana rule: Han-dominant text with ANY kana is ja, not zh
    val Array(jaHan, jaKana) = lid("日本語の文章漢字多め", "これはひらがなだけ")
    assert(jaHan._1 == "ja" && jaHan._2 == "han" && jaHan._3 < 1.0)
    assert(jaKana == (("ja", "hiragana", 1.0)))
    // pinned four classify identically to langId's marker lists
    val Array(en, de, es, fr) = lid(
      "the cat and the dog is here", "der hund und die katze",
      "el perro y la casa los dos que", "le chien et les chats est la")
    assert(en._1 == "en" && de._1 == "de" && es._1 == "es" && fr._1 == "fr")
    assert(en._2 == "latin" && en._3 == 1.0)
    // breadth: one per added Latin language
    val added = lid(
      "uma frase para testar com mais palavras", "di prova che serve il per noi",
      "het is een tekst voor niet veel", "to jest nie tekst w probie",
      "och att det som en test", "bir ve bu metin ile deneme",
      "este cu din pentru un test", "yang dan untuk ini teks uji")
    assert(added.map(_._1).toSeq == Seq("pt", "it", "nl", "pl", "sv", "tr", "ro", "id"))
    // mixed Latin + Cyrillic: majority script wins; confidence is its share
    val Array(mixed) = lid("слово and слово here слово слово слово ок")
    assert(mixed._2 == "cyrillic" && mixed._1 == "ru" && mixed._3 > 0.5 && mixed._3 < 1.0)
    // degenerate: no tracked script, latin with no stopword hits, ties
    val Array(und, undLatin) = lid("12345 !!!", "zzz qqq xyz")
    assert(und == (("und", "none", 0.0)))
    assert(undLatin == (("und", "latin", 0.0)))
    // nl "is" overlap: en hit loses to 4 nl hits, confidence 4/5
    val Array(nl) = lid("het is een tekst voor niet veel")
    assert(nl._1 == "nl" && nl._3 == 0.8)
    // astral codepoints (emoji, surrogate pairs) are outside every tracked
    // range: never counted, never split mid-surrogate, never crash
    val Array(emoji, emojiOnly) = lid("the cat and dog is 🚀🧪 here", "🚀🧪💡")
    assert(emoji._1 == "en" && emoji._2 == "latin")
    assert(emojiOnly == (("und", "none", 0.0)))
  }

  test("fingerprint: identical docs match, different docs do not") {
    val fp = docs.select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fp(0L) == fp(3L))
    assert(fp(0L) != fp(2L))
    assert(fp(0L).nonEmpty && fp(0L) == fp(0L).sorted)
  }

  val embs: Seq[(Long, Array[Float])] = {
    val rng = new scala.util.Random(7)
    (0L until 50L).map { i =>
      val base = Array.fill(16)(rng.nextGaussian().toFloat)
      i -> base
    }
  }

  test("brute force topk is self-consistent and complete") {
    val df = embs.toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(df, df.where(col("vec_id") < 5), "vec_id", "embedding", 3)
    assert(out.count() == 15)
    assert(out.groupBy("query_id").count().select("count").as[Long].collect().forall(_ == 3))
  }

  test("brute-force topk plan: bounded partial aggregation before the shuffle, no per-query window") {
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.catalyst.expressions.aggregate.Partial
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = embs.toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(df, df.where(col("vec_id") < 5), "vec_id", "embedding", 3)
    out.collect() // finalize AQE stages
    // flatten the adaptively-planned tree (same walk as Bucketed.isShuffleFree)
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec => q +: nodes(q.plan)
      case other => other +: other.children.flatMap(nodes)
    }
    val all = nodes(out.queryExecution.executedPlan)
    // no window funnels scored corpus rows into one task per query
    assert(!all.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      s"window survived:\n${out.queryExecution.executedPlan}")
    // every shuffle sits above a Partial top-k aggregate: ≤ k candidates per
    // query leave each map-side partition
    def hasPartialTopK(p: SparkPlan): Boolean = nodes(p).exists {
      case a: ObjectHashAggregateExec =>
        a.aggregateExpressions.exists(ae => ae.mode == Partial &&
          ae.aggregateFunction.isInstanceOf[graft.functions.TopKAggregate])
      case _ => false
    }
    val shuffles = all.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.nonEmpty)
    assert(shuffles.forall(s => hasPartialTopK(s.child)),
      s"shuffle without partial top-k below it:\n${out.queryExecution.executedPlan}")
  }

  test("lsh topk recall vs brute force is reasonable") {
    val df = embs.toDF("vec_id", "embedding")
    val q = df.where(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(df, q, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(df, q, "vec_id", "embedding", 3, nPlanes = 4, dim = 16, tables = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf & lsh).size.toDouble / bf.size
    assert(recall > 0.6, s"recall $recall")
  }

  test("query-side broadcast is guarded; broadcastQueries=false keeps a shuffle join") {
    val df = embs.toDF("vec_id", "embedding")
    // over-cap query frame + broadcast path → loud require, not a driver OOM
    val big = df // 60 rows; cap of 10 makes it "too big"
    intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(df, big, "vec_id", "embedding", 3, maxBroadcastQueries = 10)
    }
    intercept[IllegalArgumentException] {
      Similarity.lshTopK(df, big, "vec_id", "embedding", 3, dim = 16,
        maxBroadcastQueries = 10)
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfTopK(df, big, "vec_id", "embedding", 3, nlist = 4,
        maxBroadcastQueries = 10)
    }
    // the scale path: no broadcast hint — the bucket-keyed join shuffles both
    // sides instead of collecting the query frame to the driver (broadcast
    // thresholds off so AQE can't re-promote the tiny test frame)
    val prevT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", prevT)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val out = Similarity.lshTopK(df, big, "vec_id", "embedding", 3,
        nPlanes = 4, dim = 16, tables = 8, broadcastQueries = false,
        maxBroadcastQueries = 10)
      out.collect()
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"broadcastQueries=false must not broadcast the query side:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prevA)
    }
  }

  test("codegen gopher gate replicates the Column formulation value-for-value") {
    def hofGopher(text: org.apache.spark.sql.Column, minWords: Int, maxWords: Int) = {
      val ws = split(trim(text), "\\s+")
      val wc = size(ws)
      val wcD = wc.cast("double")
      val meanWordLen = length(regexp_replace(text, "\\s+", "")).cast("double") / wcD
      val hashRatio = regexp_count(text, lit("#")).cast("double") / wcD
      val ellipsisRatio = regexp_count(text, lit("\\.\\.\\.")).cast("double") / wcD
      val symbolRatio = hashRatio + ellipsisRatio
      val alphaRatio = size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("double") / wcD
      val stops = regexp_count(lower(text), lit("\\b(the|be|to|of|and|that|have|with)\\b"))
      struct(wc.as("word_count"), meanWordLen.as("mean_word_len"),
        symbolRatio.as("symbol_ratio"), alphaRatio.as("alpha_word_ratio"),
        stops.as("stopword_hits"),
        (wc >= minWords && wc <= maxWords && meanWordLen >= 3.0 && meanWordLen <= 10.0 &&
          hashRatio <= 0.1 && ellipsisRatio <= 0.1 &&
          alphaRatio >= 0.8 && stops >= 2).as("pass"))
    }
    val edge = Seq("", "   ", "# ### x", "a... b... c...", "\tTabbed start THE the of",
      "the be to of and that have with words more here ok fine good yes")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text")).limit(200).union(edge.toDF("text"))
    val rows = docs.select(hofGopher(col("text"), 20, 100000).as("h"),
      Text.gopherQuality(col("text"), 20).as("c")).collect()
    rows.foreach { r =>
      val (h, c) = (r.getStruct(0), r.getStruct(1))
      assert(h.getInt(0) == c.getInt(0))
      for (i <- Seq(1, 2, 3))
        assert(java.lang.Double.doubleToLongBits(h.getDouble(i)) ==
          java.lang.Double.doubleToLongBits(c.getDouble(i)), s"field $i: $h vs $c")
      assert(h.getInt(4) == c.getInt(4))
      assert(h.getBoolean(5) == c.getBoolean(5))
    }
  }

  test("codegen shingles replicate the HOF formulation string-for-string") {
    def hofShingles(text: org.apache.spark.sql.Column, n: Int) = {
      val sh = transform(array(split(trim(lower(text)), "\\s+")), ws =>
        transform(sequence(lit(0), greatest(size(ws) - n, lit(0))),
          i => concat_ws(" ", slice(ws, i + 1, lit(n)))))
      array_distinct(element_at(sh, 1))
    }
    val edge = Seq("", "   ", "a", "a b", "A\tB\nC  d", "one two three four five",
      "Dup dup DUP dup", "Ünïcode ÉDGE Ünïcode ÉDGE x")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text")).limit(200)
      .union(edge.toDF("text"))
    for (n <- Seq(1, 3, 5)) {
      val rows = docs.select(hofShingles(col("text"), n).as("hof"),
        Text.shingles(col("text"), n).as("cg")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n mismatch:\n${r.getSeq[String](0)}\nvs\n${r.getSeq[String](1)}")
      }
    }
  }

  test("codegen cosine is bit-identical to the zip_with formulation it replaced") {
    // the HOF formulation: float×float products are FLOAT multiplies before
    // the double-widened fold — the codegen expression must reproduce the
    // exact bits so thresholded oracles and recall specs are unaffected
    def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
      dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
    }
    val f = embs.toDF("vec_id", "embedding") // array<float>
    val pairsF = f.as("l").crossJoin(f.as("r")).limit(500)
      .select(hofCosine(col("l.embedding"), col("r.embedding")).as("hof"),
        Similarity.cosine(col("l.embedding"), col("r.embedding")).as("cg"))
      .collect()
    pairsF.foreach { row =>
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(1)),
        s"float-array mismatch: ${row.getDouble(0)} vs ${row.getDouble(1)}")
    }
    val d = f.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val pairsD = d.as("l").crossJoin(d.as("r")).limit(500)
      .select(hofCosine(col("l.embedding"), col("r.embedding")).as("hof"),
        Similarity.cosine(col("l.embedding"), col("r.embedding")).as("cg"))
      .collect()
    pairsD.foreach { row =>
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(1)),
        s"double-array mismatch: ${row.getDouble(0)} vs ${row.getDouble(1)}")
    }
    // NULL contract: mismatched lengths and null arrays stay NULL
    val odd = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)), (null, Seq(1.0))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c")).collect()
    assert(odd.forall(_.isNullAt(0)))
  }

  test("lsh signatures evaluate with codegen fallback disabled (no interpreted HOFs)") {
    // the hyperplane projection used to be tables × nPlanes interpreted
    // aggregate(zip_with(...)) trees; it is now one codegen'd static call,
    // so the whole bucket pipeline must survive fallback=false
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = embs.toDF("vec_id", "embedding")
      val out = Similarity.lshTopK(df, df.where(col("vec_id") < 3),
        "vec_id", "embedding", 3, nPlanes = 4, dim = 16, tables = 8)
      assert(out.count() > 0)
    } finally prev.foreach(spark.conf.set("spark.sql.codegen.fallback", _))
  }

  test("ivf topk recall vs brute force on clustered vectors") {
    // three well-separated clusters + noise: IVF with nprobe=2 of nlist=4
    // must recover most of brute force's neighbours
    val rng = new scala.util.Random(7)
    val base = Seq(
      Array.tabulate(16)(i => if (i < 5) 1.0f else 0.0f),
      Array.tabulate(16)(i => if (i >= 5 && i < 10) 1.0f else 0.0f),
      Array.tabulate(16)(i => if (i >= 10) 1.0f else 0.0f))
    val rows = (0L until 90L).map { id =>
      val b = base((id % 3).toInt)
      (id, b.map(x => x + rng.nextFloat() * 0.2f).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.where(col("vec_id") < 6)
    val bf = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(df, queries, "vec_id", "embedding", 5,
        nlist = 4, nprobe = 2, iters = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.8, s"ivf recall too low: $recall")
  }

  test("ivf with exhaustive probing equals brute force EXACTLY (random vectors)") {
    // the algebraic pin behind the rows-only ANN gates: nprobe = nlist
    // degrades IVF to an exact scan partitioned by cell, so its top-k must
    // be IDENTICAL to brute force — not merely high-recall — on vectors
    // with no cluster structure at all (random floats: ties have measure
    // zero). Any candidate lost to cell assignment, partition pruning or
    // the top-k merge would break set equality here.
    val rng = new scala.util.Random(99)
    val rows = (0L until 60L).map(id => (id, Seq.fill(8)(rng.nextFloat())))
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.where(col("vec_id") < 8)
    val bf = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(df, queries, "vec_id", "embedding", 4,
        nlist = 5, nprobe = 5, iters = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf == bf, s"exhaustive IVF diverged: missing=${bf -- ivf} extra=${ivf -- bf}")
    // the PERSISTED path must satisfy the same pin independently — its
    // candidate set flows through the cid-partitioned parquet index and
    // static partition pruning, either of which could drop a cell the
    // in-memory path keeps
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_exact").toString
    Similarity.ivfBuild(df, "vec_id", "embedding", dir, nlist = 5, iters = 2)
    val persisted = Similarity.ivfSearch(spark, dir, queries,
        "vec_id", "embedding", 4, nprobe = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(persisted == bf,
      s"exhaustive persisted IVF diverged: missing=${bf -- persisted} extra=${persisted -- bf}")
  }

  test("ivf persisted index: search without retraining, cells partition-pruned") {
    val rng = new scala.util.Random(11)
    val base = Seq(
      Array.tabulate(16)(i => if (i < 5) 1.0f else 0.0f),
      Array.tabulate(16)(i => if (i >= 5 && i < 10) 1.0f else 0.0f),
      Array.tabulate(16)(i => if (i >= 10) 1.0f else 0.0f))
    val rows = (0L until 90L).map { id =>
      (id, base((id % 3).toInt).map(x => x + rng.nextFloat() * 0.2f).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.where(col("vec_id") < 6)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Similarity.ivfBuild(df, "vec_id", "embedding", dir, nlist = 4, iters = 3)
    val res = Similarity.ivfSearch(spark, dir, queries, "vec_id", "embedding", 5, nprobe = 2)
    val ivf = res.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val bf = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.8, s"persisted-ivf recall too low: $recall")
    // the cells scan must be partitioned by cid so probes prune directories
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("dynamicpruning"),
      s"no partition pruning on cells scan:\n$plan")
  }

  test("ivf nprobe auto-tune finds the smallest probe count hitting the recall target") {
    val rng = new scala.util.Random(13)
    val base = Seq(
      Array.tabulate(16)(i => if (i < 5) 1.0f else 0.0f),
      Array.tabulate(16)(i => if (i >= 5 && i < 10) 1.0f else 0.0f),
      Array.tabulate(16)(i => if (i >= 10) 1.0f else 0.0f))
    val rows = (0L until 90L).map { id =>
      (id, base((id % 3).toInt).map(x => x + rng.nextFloat() * 0.2f).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_tune").toString
    Similarity.ivfBuild(df, "vec_id", "embedding", dir, nlist = 4, iters = 3)
    val sample = df.where(col("vec_id") < 8)
    val (nprobe, recall) = Similarity.ivfAutoTuneNprobe(
      spark, dir, sample, "vec_id", "embedding", k = 5, targetRecall = 0.9)
    assert(nprobe >= 1 && nprobe <= 4)
    assert(recall >= 0.9, s"auto-tune returned nprobe=$nprobe with recall=$recall")
    // the tuned nprobe reproduces that recall through the public search path
    val got = Similarity.ivfSearch(spark, dir, sample, "vec_id", "embedding", 5, nprobe)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val cells = spark.read.parquet(s"$dir/cells")
      .select(col("neighbor_id").as("vec_id"), col("cv0").as("embedding"))
    val bf = Similarity.bruteForceTopK(cells, sample, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert((bf intersect got).size.toDouble / bf.size >= 0.9)
  }

  test("embedding near dups finds duplicated vectors") {
    val withDup = (embs :+ (999L -> embs.head._2)).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDups(withDup, "vec_id", "embedding", 0.999, dim = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 999L)))
  }

  test("multimodal: real ImageIO/AudioSystem decode, flagged fallback otherwise") {
    val media = Multimodal.mediaFromText(docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 4)
    assert(feats.forall(_.feature.length == 16))
    assert(feats.forall(f => math.abs(f.feature.sum - 1.0f) < 1e-3))
    // ids 0 and 3 are kind=image (id % 3 == 0) and carry real PNGs; id 1 is
    // kind=audio and carries a real WAV — both must decode for real. id 2 is
    // kind=video (no codec in the JDK): falls back, flagged false
    val byId = feats.map(f => f.media_id -> f).toMap
    assert(byId(0L).decodedOk && byId(3L).decodedOk && byId(1L).decodedOk)
    assert(!byId(2L).decodedOk)
    // deterministic: same text → same PNG → same luminance histogram
    assert(byId(0L).feature.toSeq == byId(3L).feature.toSeq)
    val frames = Multimodal.sampleFrames(media, stride = 16, frameSize = 8).collect()
    assert(frames.forall(_.frame.length <= 8))
  }

  test("multimodal audio: WAV decode histograms PCM amplitudes, not container bytes") {
    // decode must route through AudioSystem: the amplitude histogram of the
    // synthetic LCG noise differs from the byte histogram of the WAV bytes
    val wav = Multimodal.syntheticWav(42L)
    val (ok, feat) = Multimodal.decode(wav, "audio")
    assert(ok && feat.length == 16 && math.abs(feat.sum - 1.0f) < 1e-3)
    val (fb, byteFeat) = Multimodal.decode(wav, "video")
    assert(!fb && feat.toSeq != byteFeat.toSeq)
    // determinism + corrupt input falls back flagged
    assert(Multimodal.decode(Multimodal.syntheticWav(42L), "audio")._2.toSeq == feat.toSeq)
    val (okBad, _) = Multimodal.decode("not audio at all".getBytes, "audio")
    assert(!okBad)
  }

  test("multimodal resize: images re-encode at the target size and still decode") {
    val media = Multimodal.mediaFromText(docs, "doc_id", "text")
    val resized = Multimodal.resizeImages(media, 4, 4).collect()
    val img = resized.find(_.kind == "image").get
    assert(img.meta.width == 4 && img.meta.height == 4)
    val decoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(img.data))
    assert(decoded.getWidth == 4 && decoded.getHeight == 4)
    // non-image rows pass through untouched
    val audio = resized.find(_.kind == "audio").get
    assert(audio.meta.format == "audio/wav")
  }

  test("line dedup drops cross-doc boilerplate, keeps per-doc content in order") {
    val d = Seq(
      (0L, "COOKIE BANNER\nunique alpha content\nfooter text"),
      (1L, "COOKIE BANNER\nunique beta content\nfooter text"),
      (2L, "COOKIE BANNER\nfooter text"), // all boilerplate → empty
      (3L, "solo document with its own lines\nsecond line")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(d, col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    assert(out(0L) == "unique alpha content")
    assert(out(1L) == "unique beta content")
    assert(out(2L) == "") // row preserved, text emptied
    assert(out(3L) == "solo document with its own lines\nsecond line")
    // minDocs=3: footer+banner appear in 3 docs → dropped; a 2-doc line survives
    val d2 = d.union(Seq((4L, "unique alpha content\nCOOKIE BANNER")).toDF("doc_id", "text"))
    val out3 = Dedup.dedupLines(d2, col("doc_id"), col("text"), minDocs = 4)
      .as[(Long, String)].collect().toMap
    assert(out3(0L) == "unique alpha content\nfooter text")
    assert(out3(4L) == "unique alpha content")
  }

  test("within-doc line dedup keeps first occurrences, never needs a shuffle") {
    val d = Seq(
      (0L, "NAV\nalpha\nNAV\nbeta\nNAV"),       // chrome stamped 3× in one page
      (1L, "unique one\nunique two"),            // untouched
      (2L, "")                                   // empty passes through
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLinesWithinDoc(d, col("doc_id"), col("text"))
    assert(out.as[(Long, String)].collect().toMap ==
      Map(0L -> "NAV\nalpha\nbeta", 1L -> "unique one\nunique two", 2L -> ""))
    // blank lines are paragraph STRUCTURE, never deduped: both boundaries
    // survive even though "" repeats
    val para = Seq((9L, "intro\n\nsection one\n\nsection two")).toDF("doc_id", "text")
    assert(Dedup.dedupLinesWithinDoc(para, col("doc_id"), col("text"))
      .as[(Long, String)].collect().head._2 == "intro\n\nsection one\n\nsection two")
    // narrow projection: no exchange anywhere in the plan
    val exchanges = out.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "within-doc dedup must not shuffle")
    // paragraph flavour: repeated consent paragraph collapses within the doc
    val p = Seq((0L, "We use cookies.\n\nbody text\n\nWe use cookies.")).toDF("doc_id", "text")
    assert(Dedup.dedupParagraphsWithinDoc(p, col("doc_id"), col("text"))
      .as[(Long, String)].collect().head._2 == "We use cookies.\n\nbody text")
  }

  test("paragraph dedup drops cross-doc chrome paragraphs, keeps per-doc content") {
    val consent = "We use cookies.\nSee our policy."  // multi-line paragraph
    val d = Seq(
      (0L, s"$consent\n\nalpha body text"),
      (1L, s"$consent\n\nbeta body text"),
      (2L, s"$consent\n\n\n\ngamma body text"), // 4-newline run still splits
      (3L, "solo paragraph\n\nwith another")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(d, col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    assert(out(0L) == "alpha body text")
    assert(out(1L) == "beta body text")
    assert(out(2L) == "gamma body text")
    assert(out(3L) == "solo paragraph\n\nwith another")
  }

  test("pii: signals count each category disjointly and redaction tokenizes them") {
    val rows = Seq(
      "write to alice.smith+x@mail.example.org today",
      "server at 192.168.0.12 responded",
      "ssn 123-45-6789 on file",
      "call +1 (555) 123-4567 or 555.123.4567",
      "dates 2026-08-12 and ranges 10-20-30 stay; price 1234 stays",
      "").toDF("text")
      .select(Pii.piiSignals(col("text")).as("s"), Pii.redactPii(col("text")).as("r"))
      .select("s.emails", "s.ipv4s", "s.ssns", "s.phones", "s.has_pii", "r")
      .collect()
    assert(rows(0).getInt(0) == 1 && rows(0).getBoolean(4) &&
      rows(0).getString(5) == "write to <EMAIL> today")
    assert(rows(1).getInt(1) == 1 && rows(1).getString(5) == "server at <IP> responded")
    // the SSN shape must NOT also count as a phone (3-2-4 vs 3-3-4)
    assert(rows(2).getInt(2) == 1 && rows(2).getInt(3) == 0 &&
      rows(2).getString(5) == "ssn <SSN> on file")
    assert(rows(3).getInt(3) == 2 && rows(3).getString(5) == "call <PHONE> or <PHONE>")
    assert(!rows(4).getBoolean(4), s"false positives: ${rows(4)}")
    assert(!rows(5).getBoolean(4) && rows(5).getString(5) == "")
  }

  test("pii: hasPii is exactly redactPii-would-change (overlap cases included)") {
    // the r20 drop-policy gate swaps redactPii(t) === t for the match-only
    // !hasPii(t) — pin the equivalence on every category, the documented
    // overlap traps (digit-run emails, SSN-inside-email, SSN-vs-phone,
    // version-number lookalikes), and clean text
    val texts = Seq(
      "write to alice.smith+x@mail.example.org today",
      "server at 192.168.0.12 responded",
      "ssn 123-45-6789 on file",
      "call +1 (555) 123-4567 or 555.123.4567",
      "dates 2026-08-12 and ranges 10-20-30 stay; price 1234 stays",
      "",
      "123-45-6789@mail.example.org embeds an ssn in an email",
      "v1.2.3.4 is a version not an ip? 999.999.999.999 too",
      "plain prose with no personal data at all",
      "<EMAIL> literal marker already present")
    val got = texts.toDF("text").select(
        Pii.hasPii(col("text")).as("h"),
        (Pii.redactPii(col("text")) =!= col("text")).as("c"))
      .collect()
    got.zip(texts).foreach { case (r, t) =>
      assert(r.getBoolean(0) == r.getBoolean(1),
        s"hasPii diverged from redact-changed on: '$t'")
    }
  }

  test("pii: density gates on hits per word and is callable from SQL") {
    val d = Seq(("a@b.co x y z", 4), ("clean words only here", 0)).toDF("text", "n")
      .select(Pii.piiDensity(col("text")).as("d")).as[Double].collect()
    assert(math.abs(d(0) - 0.25) < 1e-9 && d(1) == 0.0)
    graft.functions.Registry.registerAll(spark)
    val sql = spark.sql(
      "SELECT pii_signals('mail me@x.io').emails AS e, redact_pii('at 10.0.0.1') AS r")
      .collect().head
    assert(sql.getInt(0) == 1 && sql.getString(1) == "at <IP>")
  }

  test("cjk-aware word split: ideographs tokenize per character, default unchanged") {
    val mixed = "Spark 处理数据 fast ドラゴン 2024"
    def split(cjk: Boolean) = Seq(Tuple1(mixed)).toDF("t")
      .select(Text.words(col("t"), cjk = cjk).as("w"))
      .collect()(0).getSeq[String](0).toSeq
    // default: whitespace only — the unspaced runs stay single "words"
    assert(split(cjk = false) == Seq("Spark", "处理数据", "fast", "ドラゴン", "2024"))
    // cjk: each ideograph its own token; kana/latin/digits keep the
    // whitespace rule (katakana is not ideographic — a segmenter concern)
    assert(split(cjk = true) ==
      Seq("Spark", "处", "理", "数", "据", "fast", "ドラゴン", "2024"))
    // token counts follow: SQL-callable cjk count sees morpheme-grain units
    val r = spark.sql(s"SELECT token_count('$mixed') AS a, token_count_cjk('$mixed') AS b")
      .collect()(0)
    assert(r.getInt(0) == 5 && r.getInt(1) == 8)
    // degenerate: empty and pure-whitespace yield no tokens in cjk mode
    assert(Seq(Tuple1("")).toDF("t").select(Text.words(col("t"), cjk = true))
      .collect()(0).getSeq[String](0).isEmpty)
  }

  test("malformed vectors get the inert all-zero lsh signature, not plausible buckets") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val m = HyperplaneMatrix(Array(Array(
      Array(1.0, -1.0, 1.0, -1.0), Array(-1.0, 1.0, 1.0, 1.0))))
    def sig(xs: Array[Any]): Long =
      HyperplaneAlgos.signatures(new GenericArrayData(xs), m, isFloat = false).getLong(0)
    // well-formed: at least one vector sets a bit (sanity that zero isn't universal)
    assert(sig(Array[Any](1.0, 0.0, 1.0, 0.0)) != 0L)
    // wrong dimension (short and long) and null elements → all-zero signature,
    // the prior zip_with HOF semantics: malformed rows collapse into one inert
    // bucket where the exact-cosine verify nulls them out
    assert(sig(Array[Any](1.0, 0.0)) == 0L)
    assert(sig(Array[Any](1.0, 0.0, 1.0, 0.0, 1.0)) == 0L)
    assert(sig(Array[Any](1.0, null, 1.0, 0.0)) == 0L)
    // end to end: a planted wrong-dimension row never appears in lshTopK output
    val bad = (0L until 40L).map(i => (i, Seq.fill(16)(scala.util.Random.nextFloat()))) :+
      (99L, Seq(1.0f, 2.0f))
    val df = bad.toDF("vec_id", "embedding")
    val out = Similarity.lshTopK(df, df.where(col("vec_id") < 3),
      "vec_id", "embedding", 5, nPlanes = 4, dim = 16, tables = 8)
    assert(!out.select("neighbor_id").as[Long].collect().contains(99L))
  }
}
