package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("splitByHash is deterministic, content-addressed, and complete") {
    val ids = spark.range(1000).toDF("id")
    val a = Curation.splitByHash(ids, col("id")).as[(Long, String)].collect().toMap
    val b = Curation.splitByHash(ids, col("id")).as[(Long, String)].collect().toMap
    assert(a == b) // rerun → identical assignment
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    // growing the corpus never reassigns existing rows
    val grown = Curation.splitByHash(spark.range(2000).toDF("id"), col("id"))
      .as[(Long, String)].collect().toMap
    assert(a.forall { case (k, v) => grown(k) == v })
    // roughly 80/10/10 (content-addressed, so only approximately)
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
  }

  test("splitByHash custom percentages and validation") {
    val ids = spark.range(500).toDF("id")
    val out = Curation.splitByHash(ids, col("id"), trainPct = 100, valPct = 0)
      .select("split").distinct().as[String].collect().toSeq
    assert(out == Seq("train"))
    intercept[IllegalArgumentException] {
      Curation.splitByHash(ids, col("id"), trainPct = 80, valPct = 30)
    }
  }

  test("bm25 ranks docs by term relevance with length normalization") {
    val docs = Seq(
      (0L, "spark spark spark spark"),       // high tf, short
      (1L, "spark engine running a query"),  // one hit
      (2L, "nothing relevant here at all"),  // zero hits
      (3L, "spark spark engine engine query query word word word word word word") // hits but long
    ).toDF("doc_id", "text")
    val scores = Curation.bm25(docs, col("doc_id"), col("text"), Seq("spark"))
      .as[(Long, Double)].collect().toMap
    assert(scores(2L) == 0.0)
    assert(scores(0L) > scores(1L)) // more occurrences → higher
    assert(scores(0L) > scores(3L)) // same-ish tf but longer doc → lower
    // IDF sanity: a term in every doc scores below a term in one doc (per hit)
    val rare = Curation.bm25(docs, col("doc_id"), col("text"), Seq("nothing"))
      .as[(Long, Double)].collect().toMap
    assert(rare(2L) > 0.0)
    intercept[IllegalArgumentException] {
      Curation.bm25(docs, col("doc_id"), col("text"), Seq.empty)
    }
  }

  test("bm25 matches the closed-form formula on a tiny corpus") {
    // two docs, one term: verify against hand computation
    val docs = Seq((0L, "a b"), (1L, "a a a b")).toDF("doc_id", "text")
    val out = Curation.bm25(docs, col("doc_id"), col("text"), Seq("a"))
      .as[(Long, Double)].collect().toMap
    val n = 2.0; val avgdl = 3.0
    def score(tf: Double, dl: Double, df: Double): Double = {
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      BigDecimal(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out(0L) == score(1.0, 2.0, 2.0))
    assert(out(1L) == score(3.0, 4.0, 2.0))
  }

  test("capPerKey keeps the N lowest ids per key, no per-key window") {
    val df = (0L until 300L).map(i => (i, s"dom${i % 3}")).toDF("id", "dom")
    val out = Curation.capPerKey(df, col("dom"), col("id"), 10)
    val byDom = out.as[(Long, String)].collect().groupBy(_._2).view.mapValues(_.map(_._1).sorted.toSeq)
    assert(byDom.values.forall(_.size == 10))
    // lowest ids win: dom0 holds multiples of 3 → first ten are 0,3,...,27
    assert(byDom("dom0") == (0L until 30L by 3).toSeq)
    // cap above the group size keeps everything
    assert(Curation.capPerKey(df, col("dom"), col("id"), 1000).count() == 300)
    // plan: no window funnels a whole key into one task
    import org.apache.spark.sql.execution.window.WindowExec
    assert(out.queryExecution.executedPlan.collect { case w: WindowExec => w }.isEmpty)
  }

  test("capPerKey rejects non-numeric id columns instead of silently dropping rows") {
    val df = Seq(("doc-1", "web"), ("doc-2", "web")).toDF("id", "dom")
    val e = intercept[IllegalArgumentException] {
      Curation.capPerKey(df, col("dom"), col("id"), 10)
    }
    assert(e.getMessage.contains("numeric id column"))
    // null ids are dropped by documented contract (no deterministic order)
    val withNull = Seq((Some(1L), "a"), (None, "a"), (Some(2L), "a"))
      .toDF("id", "dom")
    assert(Curation.capPerKey(withNull, col("dom"), col("id"), 10)
      .select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("weightedSamplePerKey: exact E-S selection, weight bias, degenerate weights") {
    import spark.implicits._
    // reference computation of the same exponential-clock formula
    def md5frac(id: Long): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = d.take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16).toDouble + 1.0) / 4294967296.0
    }
    val rows = (0L until 200L).map(i => (i, if (i < 100) "a" else "b", (i % 7 + 1).toDouble))
    val df = rows.toDF("id", "key", "w")
    val expected = rows.groupBy(_._2).flatMap { case (_, rs) =>
      rs.map(r => (r._1, -math.log(md5frac(r._1)) / r._3))
        .sortBy(_._2).take(5).map(_._1)
    }.toSet
    val got = Curation.weightedSamplePerKey(df, col("key"), col("id"), col("w"), 5)
      .select("id").as[Long].collect().toSet
    assert(got == expected, s"selection must replay the clock formula: got $got")
    // heavy weights dominate: ids 0-9 carry 1000x the weight of the rest
    val skewed = (0L until 100L).map(i => (i, "k", if (i < 10) 1000.0 else 1.0)).toDF("id", "key", "w")
    val heavy = Curation.weightedSamplePerKey(skewed, col("key"), col("id"), col("w"), 10)
      .select("id").as[Long].collect()
    assert(heavy.count(_ < 10) >= 8, s"heavy ids should dominate the sample: ${heavy.toSeq}")
    // zero/negative/null/NaN weights never sampled (NaN compares greater
    // than every number — unguarded it would hijack every sample slot);
    // k >= group keeps all positive
    val degenerate = Seq((1L, "k", Some(0.0)), (2L, "k", Some(-3.0)),
      (3L, "k", None), (4L, "k", Some(2.0)),
      (5L, "k", Some(Double.NaN))).toDF("id", "key", "w")
    val kept = Curation.weightedSamplePerKey(degenerate, col("key"), col("id"), col("w"), 10)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(4L))
    // ...and with k smaller than the group, NaN must not crowd out real rows
    val nanFlood = ((0L until 5L).map(i => (i, "k", Double.NaN)) :+ ((9L, "k", 1.0)))
      .toDF("id", "key", "w")
    assert(Curation.weightedSamplePerKey(nanFlood, col("key"), col("id"), col("w"), 3)
      .select("id").as[Long].collect().toSeq == Seq(9L))
  }

  test("sampleToTokenBudget keeps null-domain rows and survives zero-token domains") {
    val docs = Seq(
      (1L, Some("web"), 100L), (2L, Some("web"), 100L),
      (3L, None, 50L),                   // null domain: no budget → keep
      (4L, Some("empty"), 0L), (5L, Some("empty"), 0L)) // budgeted, 0 total tokens
      .toDF("id", "dom", "tok")
    val out = Curation.sampleToTokenBudget(
      docs, col("id"), col("dom"), col("tok"), Map("empty" -> 10L, "other" -> 1L))
      .select("id").as[Long].collect().toSet
    // web unbudgeted → kept; null domain → kept; zero-token budgeted domain →
    // budget >= total, kept (and no ANSI divide-by-zero)
    assert(out == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("sampleToTokenBudget hits budgets in expectation, keeps unbudgeted domains whole") {
    val docs = (0L until 2000L).map { i =>
      val dom = if (i % 2 == 0) "web" else "code"
      (i, dom, 100L) // 1000 docs x 100 tokens per domain
    }.toDF("id", "dom", "tok")
    val out = Curation.sampleToTokenBudget(
      docs, col("id"), col("dom"), col("tok"), Map("web" -> 25000L))
    val byDom = out.groupBy("dom").agg(sum("tok").as("t"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // code has no budget: all 100k tokens survive
    assert(byDom("code") == ((100000L, 1000L)))
    // web budget 25k of 100k → keep-fraction 0.25; md5 uniform ⇒ ±5σ ≈ ±68
    val kept = byDom("web")._2
    assert(kept > 180 && kept < 320, s"web kept $kept of 1000 at fraction 0.25")
    // content-addressed: identical resample, and budget ≥ total keeps all
    val again = Curation.sampleToTokenBudget(
      docs.repartition(7), col("id"), col("dom"), col("tok"), Map("web" -> 25000L))
    assert(out.select("id").as[Long].collect().toSet ==
      again.select("id").as[Long].collect().toSet)
    val all = Curation.sampleToTokenBudget(
      docs, col("id"), col("dom"), col("tok"), Map("web" -> 500000L))
    assert(all.count() == 2000)
  }

  test("packSequences chunks the per-bucket token stream at context boundaries") {
    // one bucket so the layout is a single stream: tokens 300, 300, 600, 10
    val df = Seq((1L, 300L), (2L, 300L), (3L, 600L), (4L, 10L)).toDF("id", "tok")
    val out = Curation.packSequences(df, col("id"), col("tok"), contextLen = 512, numBuckets = 1)
      .orderBy("id")
      .select("id", "seq_start", "offset", "seq_end", "tokens")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 0L, 300L),     // [0, 300)
      (2L, 0L, 300L, 1L, 300L),   // [300, 600) — crosses the 512 boundary
      (3L, 1L, 88L, 2L, 600L),    // [600, 1200) — crosses 1024
      (4L, 2L, 176L, 2L, 10L)))   // [1200, 1210)
    // bucketed layout is deterministic and independent of input partitioning
    val big = spark.range(500).select(col("id"), (col("id") % 37 + 1).as("tok"))
    val p1 = Curation.packSequences(big, col("id"), col("tok"), 128, 8).collect().toSet
    val p2 = Curation.packSequences(big.repartition(13), col("id"), col("tok"), 128, 8)
      .collect().toSet
    assert(p1 == p2)
  }

  test("packGreedy keeps docs atomic, bins under budget, oversize flagged") {
    val df = Seq((1L, 300L), (2L, 300L), (3L, 600L), (4L, 10L), (5L, 100L))
      .toDF("id", "tok")
    val out = Curation.packGreedy(df, col("id"), col("tok"), budget = 512, numBuckets = 1)
      .orderBy("id")
      .select("id", "seq", "offset", "oversize")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 0L, false),   // bin 0: 300
      (2L, 1L, 0L, false),   // 300+300 > 512 → bin 1: 300
      (3L, 2L, 0L, true),    // 600 > budget → bin 2 alone, oversize
      (4L, 3L, 0L, false),   // bin 3: 10
      (5L, 3L, 10L, false))) // bin 3: 10+100
    // invariant on a larger corpus: no bin exceeds budget unless oversize,
    // and assignment is independent of input partitioning
    val big = spark.range(800).select(col("id"), (col("id") % 97 + 1).as("tok"))
    val packed = Curation.packGreedy(big, col("id"), col("tok"), 256, 8)
    val bins = packed.groupBy("bucket", "seq")
      .agg(sum("tokens").as("t"), max(when(col("oversize"), 1).otherwise(0)).as("os"))
      .as[(Int, Long, Long, Int)].collect()
    assert(bins.forall { case (_, _, t, os) => t <= 256 || os == 1 })
    val again = Curation.packGreedy(big.repartition(11), col("id"), col("tok"), 256, 8)
      .collect().toSet
    assert(packed.collect().toSet == again)
  }

  test("decontaminate flags docs overlapping benchmark n-grams") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),  // contains the bench 4-gram
      (1L, "beta gamma delta epsilon different tail words here"), // shares shifted 4-gram
      (2L, "totally unrelated text with zero shared phrases at all")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("bid", "btext")
    val hits = Curation.decontaminate(
        corpus, col("doc_id"), col("text"), bench, col("btext"), n = 4)
      .as[(Long, Long)].collect().toMap
    assert(hits.contains(0L)) // shares "alpha beta gamma delta" + "beta gamma delta epsilon"
    assert(hits(0L) == 2L)
    assert(hits(1L) == 1L)    // shares "beta gamma delta epsilon"
    assert(!hits.contains(2L))
    // minShared filters the single-overlap doc
    val strict = Curation.decontaminate(
        corpus, col("doc_id"), col("text"), bench, col("btext"), n = 4, minShared = 2)
      .as[(Long, Long)].collect().toMap
    assert(strict.keySet == Set(0L))
  }

  test("decontaminate plan broadcasts the benchmark side (no corpus shuffle join)") {
    val corpus = Seq((0L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val bench = Seq((1L, "a b c d e f g h")).toDF("bid", "btext")
    val plan = Curation.decontaminate(
        corpus, col("doc_id"), col("text"), bench, col("btext"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"expected broadcast join in plan:\n$plan")
  }

  test("decontaminateBloom matches the exact screen and stays join-free") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = docs.where(col("doc_id") % 25 === 0)
    val exact = Curation.decontaminate(
        docs, col("doc_id"), col("text"), bench, col("text"))
      .as[(Long, Long)].collect().toMap
    val bloom = Curation.decontaminateBloom(
        docs, col("doc_id"), col("text"), bench, col("text"),
        expectedNgrams = 100000L, fpp = 0.001, bloomName = "graft_decontam_spec")
      .as[(Long, Long)].collect().toMap
    // blooms can only over-report: exact hits must survive with counts >=,
    // and at this fpp over this set the screen is exactly the exact answer
    exact.foreach { case (id, c) => assert(bloom.getOrElse(id, 0L) >= c) }
    assert(bloom == exact, "fpp=0.001 screen expected to be exact on this corpus")
    // the bloom path is a narrow projection: no join at all in the corpus plan
    val plan = Curation.decontaminateBloom(
        docs, col("doc_id"), col("text"), bench, col("text"),
        bloomName = "graft_decontam_spec2")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected join-free bloom screen:\n$plan")
  }

  test("chunkDocs: overlapping word windows, no redundant tail, edge docs") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val rows = Seq((1L, ten), (2L, "a b"), (3L, ""))
      .toDF("doc_id", "text")
    val out = Curation.chunkDocs(rows, col("doc_id"), col("text"),
        maxWords = 8, overlapWords = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getString(3)))).toMap
    // 10 words, stride 4: chunk 0 = w1..w8, chunk 1 = w5..w10 — no chunk 2
    assert(out((1L, 0)) == ((8, (1 to 8).map(i => s"w$i").mkString(" "))))
    assert(out((1L, 1)) == ((6, (5 to 10).map(i => s"w$i").mkString(" "))))
    assert(!out.contains((1L, 2)))
    assert(out((2L, 0)) == ((2, "a b"))) // short doc: one chunk
    assert(out((3L, 0)) == ((0, "")))    // empty doc: one empty chunk
    // zero overlap: disjoint cover
    val flat = Curation.chunkDocs(rows.where(col("doc_id") === 1), col("doc_id"),
        col("text"), maxWords = 4)
      .collect().map(r => r.getInt(1) -> r.getString(3)).toMap
    assert(flat == Map(0 -> "w1 w2 w3 w4", 1 -> "w5 w6 w7 w8", 2 -> "w9 w10"))
  }

  test("corpusReport aggregates all signals in one pass over one scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_report").toString
    Seq(("a", "the quick brown fox email a@b.com goes to of and that have with words"),
      ("a", "1 2 3"), ("b", "clean text of and the that have with here and more tokens everywhere"))
      .toDF("source", "text").write.mode("overwrite").parquet(dir)
    val out = Curation.corpusReport(spark.read.parquet(dir), col("text"), col("source"),
      gopherMinWords = 5)
    val rows = out.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows("a") == ((2L, 17L, 1L, 1L))) // one doc with PII, one gopher pass
    assert(rows("b") == ((1L, 13L, 0L, 1L)))
    // one scan, one aggregation exchange — the whole report is a single pass
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      p match {
        case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case q: QueryStageExec => q +: nodes(q.plan)
        case other => other +: other.children.flatMap(nodes)
      }
    }
    val plan = nodes(out.queryExecution.executedPlan)
    assert(plan.count(_.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]) == 1)
    val exchanges = plan.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    assert(exchanges == 1, s"expected one aggregation exchange, got $exchanges")
  }

  test("temperatureSample rebalances toward tail domains, alpha=1 is proportional") {
    val rows = ((0L until 900L).map(i => (i, "big", 10L)) ++
      (1000L until 1100L).map(i => (i, "small", 10L))).toDF("id", "dom", "toks")
    // budget = half the corpus tokens
    val out5 = Curation.temperatureSample(rows, col("id"), col("dom"), col("toks"),
      totalBudget = 5000L, alpha = 0.5)
    val kept5 = out5.groupBy("dom").count().as[(String, Long)].collect().toMap
    // alpha=0.5: w_big/w_small = 3 -> big gets 3/4 of budget = 3750 of 9000
    // tokens (keep ~0.417), small gets 1250 of 1000 -> capped at 1.0
    assert(kept5("small") == 100L, s"tail domain should keep everything: $kept5")
    assert(kept5("big") < 500L && kept5("big") > 300L, s"head domain downsampled: $kept5")
    // alpha=1: both domains keep at the same global rate (budget/total)
    val out1 = Curation.temperatureSample(rows, col("id"), col("dom"), col("toks"),
      totalBudget = 5000L, alpha = 1.0)
    val kept1 = out1.groupBy("dom").count().as[(String, Long)].collect().toMap
    val rateBig = kept1("big") / 900.0
    val rateSmall = kept1("small") / 100.0
    assert(math.abs(rateBig - rateSmall) < 0.15, s"proportional rates: $kept1")
    // content-addressed: identical output across runs
    assert(out5.select("id").as[Long].collect().sorted.toSeq ==
      Curation.temperatureSample(rows, col("id"), col("dom"), col("toks"), 5000L, 0.5)
        .select("id").as[Long].collect().sorted.toSeq)
  }

  test("temperatureSample budgets NULL-domain rows like any other domain") {
    // 900 null-domain rows vs 100 'small' rows, budget far below the corpus:
    // null rows must be SAMPLED by their computed fraction, not kept
    // wholesale through a dropped equi-join match
    val rows = ((0L until 900L).map(i => (i, Option.empty[String], 10L)) ++
      (1000L until 1100L).map(i => (i, Some("small"), 10L))).toDF("id", "dom", "toks")
    val kept = Curation.temperatureSample(rows, col("id"), col("dom"), col("toks"),
        totalBudget = 2000L, alpha = 0.5)
      .groupBy("dom").count().as[(Option[String], Long)].collect().toMap
    val keptNull = kept.getOrElse(None, 0L)
    // w_null/w_small = 3 → null budget = 1500 of 9000 tokens ≈ keep 1/6
    assert(keptNull < 400L && keptNull > 50L,
      s"null domain must be downsampled toward its budget, kept $keptNull of 900")
  }

  test("chunkDocs null text behaves like empty: one chunk, n_words 0") {
    val out = Curation.chunkDocs(
        Seq((1L, Option.empty[String]), (2L, Some("a b c"))).toDF("doc_id", "text"),
        col("doc_id"), col("text"), maxWords = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getString(3)))).toMap
    assert(out((1L, 0)) == ((0, "")))
    assert(out((2L, 0)) == ((2, "a b")))
    assert(out((2L, 1)) == ((1, "c")))
  }

  test("topNgrams ranks by doc frequency with deterministic ties, plan is top-k") {
    val docs = Seq(
      (1L, "share this post now ok"),
      (2L, "share this post again yes"),
      (3L, "share this post maybe"),
      (4L, "totally different words here"),
      (5L, "share this post share this post")  // distinct per doc: counts once
    ).toDF("doc_id", "text")
    val out = Curation.topNgrams(docs, col("text"), n = 3, k = 3)
    val rows = out.collect().map(r => r.getString(0) -> r.getLong(1))
    assert(rows.head == ("share this post" -> 4L)) // doc 5 counts once
    assert(rows.length == 3)
    // ties at doc_freq=1 break lexicographically
    assert(rows(1)._1 < rows(2)._1)
    // distributed top-k: the plan is TakeOrderedAndProject, not a global sort
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
  }

  test("decontaminateBloom calls don't alias: earlier lazy result keeps its own bloom") {
    val corpus = Seq((0L, "a b c d e f g h i j"), (1L, "p q r s t u v w x y"))
      .toDF("doc_id", "text")
    val benchA = Seq(Tuple1("a b c d e f g h i j")).toDF("btext")
    val benchB = Seq(Tuple1("p q r s t u v w x y")).toDF("btext")
    // build BOTH screens before evaluating EITHER: with a fixed registry
    // name the second registration would overwrite the first's filter
    val hitsA = Curation.decontaminateBloom(
      corpus, col("doc_id"), col("text"), benchA, col("btext"), n = 3)
    val hitsB = Curation.decontaminateBloom(
      corpus, col("doc_id"), col("text"), benchB, col("btext"), n = 3)
    assert(hitsA.select("id").as[Long].collect().toSet == Set(0L))
    assert(hitsB.select("id").as[Long].collect().toSet == Set(1L))
  }

  test("writeShards: deterministic shard files, reproducible order, honest manifest") {
    val docsDf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val p1 = java.nio.file.Files.createTempDirectory("graft_shards1").toString
    val p2 = java.nio.file.Files.createTempDirectory("graft_shards2").toString
    val m1 = Curation.writeShards(docsDf, col("doc_id"), Text.tokenCount(col("text")), p1, 4)
      .orderBy("shard").as[(Int, Long, Long)].collect().toSeq
    val m2 = Curation.writeShards(
        docsDf.repartition(13), col("doc_id"), Text.tokenCount(col("text")), p2, 4)
      .orderBy("shard").as[(Int, Long, Long)].collect().toSeq
    // manifest identical regardless of input partitioning; covers all docs
    assert(m1 == m2)
    assert(m1.map(_._2).sum == docsDf.count())
    assert(m1.map(_._1) == Seq(0, 1, 2, 3))
    // within-shard training order is content-addressed: byte-identical
    // row sequence across the two runs
    def shardIds(p: String) = spark.read.parquet(s"$p/shard=0")
      .select("doc_id").as[Long].collect().toSeq
    val order1 = shardIds(p1)
    assert(order1 == shardIds(p2))
    // pseudo-shuffled: not ingest order
    assert(order1 != order1.sorted)
    // an epoch re-seeds the within-shard order WITHOUT moving membership
    val p3 = java.nio.file.Files.createTempDirectory("graft_shards3").toString
    val m3 = Curation.writeShards(docsDf, col("doc_id"),
        Text.tokenCount(col("text")), p3, 4, epoch = 1)
      .orderBy("shard").as[(Int, Long, Long)].collect().toSeq
    assert(m3 == m1, "epoch must not change the per-shard manifest")
    val order3 = shardIds(p3)
    assert(order3.toSet == order1.toSet && order3 != order1,
      "epoch 1 must reshuffle shard 0 over identical membership")
  }

  test("auto-named decontaminateBloom frees its bloom registration (no registry leak)") {
    val corpus = Seq((0L, "a b c d e f g h i j"), (1L, "p q r s t u v w x y"))
      .toDF("doc_id", "text")
    val bench = Seq(Tuple1("a b c d e f g h i j")).toDF("btext")
    val before = Curation.bloomNameCounter.get()
    val hits = Curation.decontaminateBloom(
      corpus, col("doc_id"), col("text"), bench, col("btext"), n = 3)
    val after = Curation.bloomNameCounter.get()
    // results are already materialized and correct...
    assert(hits.select("id").as[Long].collect().toSet == Set(0L))
    // ...and every auto-generated name this call minted is unregistered again
    (before + 1 to after).foreach { i =>
      assert(!graft.lookups.Lookups.isBloomRegistered(s"graft_decontam_$i"),
        s"auto bloom graft_decontam_$i leaked")
    }
  }

  test("filterBlockedDomains: subdomains drop, lookalikes and hostless rows stay") {
    val d = Seq(
      (1L, "https://tracker.com/a"),        // exact → drop
      (2L, "https://ads.TRACKER.com/b"),    // subdomain, case-folded → drop
      (3L, "https://nottracker.com/c"),     // suffix lookalike → keep
      (4L, "https://example.com/d"),        // unrelated → keep
      (5L, "not a url at all")              // no host → keep
    ).toDF("doc_id", "url")
    val kept = Curation.filterBlockedDomains(d, col("url"), Seq("Tracker.com"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L, 5L))
  }

  test("blocklistGate: word boundaries, phrases across whitespace, case-insensitive") {
    val docsDf = Seq(
      (1L, "the slow train"),            // single word hit
      (2L, "slowly is not slow-ness"),   // boundary: 'slowly' no, 'slow-ness' yes ('slow' before '-')
      (3L, "a HASH   value appears"),    // phrase across runs of spaces, case-folded
      (4L, "hash values differ"),        // 'values' != 'value' at the boundary
      (5L, "clean text entirely"),
      (6L, "slow and slow and slow")     // count = 3
    ).toDF("doc_id", "text")
    val out = Curation.blocklistGate(
        docsDf, col("text"), Seq("slow", "hash value", "broken pipe"))
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getBoolean(3))).toMap
    assert(out == Map(1L -> (1, true), 2L -> (1, true), 3L -> (1, true),
      4L -> (0, false), 5L -> (0, false), 6L -> (3, true)))
  }

  test("mixCorpora: full copies exact, fractional copy content-addressed, mix_id collision-free") {
    val a = (1L to 40L).map(i => (i, s"alpha doc $i")).toDF("doc_id", "text")
    val b = (101L to 140L).map(i => (i, s"beta doc $i")).toDF("doc_id", "text")
    val mixed = Curation.mixCorpora(
      Seq(("wiki", a, 2.5), ("cc", b, 0.375)), col("doc_id"))
    val rows = mixed.select(col("mix_source"), col("mix_copy"), col("doc_id"),
      col("mix_id")).as[(String, Long, Long, Long)].collect()
    val byKey = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).toSet).toMap
    // floor(2.5) = 2 full wiki copies, each complete
    assert(byKey(("wiki", 0L)) == (1L to 40L).toSet)
    assert(byKey(("wiki", 1L)) == (1L to 40L).toSet)
    // the fractional copies follow the documented hash rule exactly
    def frac(ids: Seq[Long], name: String, copy: Long, f: Double): Set[Long] = {
      val keep = ids.toDF("id").select(col("id"),
          Curation.hashFraction(concat(col("id").cast("string"),
            lit(s"#mix#$name#c"), lit(copy.toString))).as("h"))
        .as[(Long, Double)].collect()
      keep.filter(_._2 < f).map(_._1).toSet
    }
    assert(byKey(("wiki", 2L)) == frac(1L to 40L, "wiki", 2L, 0.5))
    assert(byKey(("cc", 0L)) == frac(101L to 140L, "cc", 0L, 0.375))
    assert(byKey.keySet == Set(("wiki", 0L), ("wiki", 1L), ("wiki", 2L), ("cc", 0L)))
    // mix_id is unique across every (source, copy, id) triple
    assert(rows.map(_._4).distinct.length == rows.length)
    // full 64-bit width (r19): the signed two's-complement reading puts
    // roughly half of all keys below zero — a 60-bit truncation (the r18
    // shape) could never produce a negative key
    assert(rows.map(_._4).exists(_ < 0L), "no negative mix_id: not 64-bit")
    // weights must be positive, names unique
    intercept[IllegalArgumentException] {
      Curation.mixCorpora(Seq(("x", a, 0.0)), col("doc_id"))
    }
    intercept[IllegalArgumentException] {
      Curation.mixCorpora(Seq(("x", a, 1.0), ("x", b, 1.0)), col("doc_id"))
    }
    // the handoff composes: mix_id is a collision-free wds export key,
    // so an oversampled mixture round-trips as tar shards (the duplicate
    // original ids across copies would refuse the export without it)
    val dir = java.nio.file.Files.createTempDirectory("graft_mix_wds").toString
    val manifest = graft.sources.Wds.write(mixed, col("mix_id"), col("text"),
      lit(1L), dir, 2, metaCols = Seq("source" -> col("mix_source")))
    assert(manifest.agg(sum(col("docs"))).head().getLong(0) == rows.length.toLong)
  }

  test("mix_id: exact 64-bit md5-prefix derivation, distinct on a copy-heavy mixture") {
    val d = (1L to 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val m = Curation.mixCorpora(Seq(("w", d, 10.0)), col("doc_id"))
    // 10 full epochs over 500 docs = 5000 samples, every key distinct —
    // the copy-heavy shape where a narrowed key would first collide
    assert(m.count() == 5000L)
    assert(m.select(col("mix_id")).distinct().count() == 5000L)
    // byte-for-byte pin of the derivation, independent of Spark's conv:
    // the first 8 md5 bytes of "w#0#1" read big-endian as a signed long
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("w#0#1".getBytes("UTF-8"))
    val expect = java.nio.ByteBuffer.wrap(md).getLong
    val got = m.where(col("mix_copy") === 0L && col("doc_id") === 1L)
      .select(col("mix_id")).head().getLong(0)
    assert(got == expect, s"mix_id $got != md5-prefix long $expect")
  }

  test("writeShardsByTokens sizes shard count from the token budget") {
    val d = (0L until 100L).map(i => (i, 10L)).toDF("doc_id", "tok") // 1000 tokens
    val p1 = java.nio.file.Files.createTempDirectory("graft_wsbt1").toString
    val m1 = Curation.writeShardsByTokens(d, col("doc_id"), col("tok"), p1, 250L)
      .collect().map(r => r.getInt(0) -> r.getLong(2))
    assert(m1.length == 4 && m1.map(_._2).sum == 1000L) // ceil(1000/250)
    val p2 = java.nio.file.Files.createTempDirectory("graft_wsbt2").toString
    val m2 = Curation.writeShardsByTokens(d, col("doc_id"), col("tok"), p2, 5000L)
    assert(m2.count() == 1) // budget above total → one shard
  }

  test("tfidfKeywords: hand-computed scores, minDf cut, term-asc ties") {
    val d = Seq(
      (1L, "apple apple banana cherry"),
      (2L, "banana cherry cherry"),
      (3L, "apple date")).toDF("doc_id", "text")
    // df: apple 2, banana 2, cherry 2, date 1 (cut by minDf=2); N=3
    val out = Curation.tfidfKeywords(d, col("doc_id"), col("text"), topK = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getString(1), r.getDouble(2))).toMap
    def s(tf: Int, df: Int) =
      BigDecimal(tf * math.log(3.0 / df)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: apple tf=2 beats banana/cherry tf=1 (banana wins the tie lex-asc)
    assert(out((1L, 1)) == ("apple", s(2, 2)))
    assert(out((1L, 2)) == ("banana", s(1, 2)))
    // doc 2: cherry tf=2 first, banana second
    assert(out((2L, 1)) == ("cherry", s(2, 2)))
    assert(out((2L, 2)) == ("banana", s(1, 2)))
    // doc 3: date is hapax (df=1 < minDf) → only apple remains
    assert(out((3L, 1)) == ("apple", s(1, 2)))
    assert(!out.contains((3L, 2)))
  }

  test("exactPreferring keeps the trusted copy; null priority loses") {
    import graft.pipeline.Dedup
    // priority is a TRUST WEIGHT: higher wins, ties to lowest id, NULL
    // loses — the ONE convention shared with dropNearDupsPreferring
    val d = Seq(
      (1L, "same content", Some(1)),   // crawl
      (2L, "same content", Some(2)),   // curated wins despite higher id
      (3L, "other content", Some(1)),
      (4L, "other content", None),     // unlabeled loses
      (5L, "third content", Some(7)),
      (6L, "third content", Some(7))   // tie -> lowest id
    ).toDF("id", "text", "prio")
    val kept = Dedup.exactPreferring(d, col("id"), col("prio"), col("text"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 5L))
  }

  test("corpusDiff classifies added, removed, changed and unchanged") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val v2 = Seq((1L, "a"), (2L, "B2"), (4L, "d")).toDF("id", "text")
    val out = Curation.corpusDiff(v1, v2, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("gateByQuantile keeps the top fraction, ties inclusive, empty survives") {
    val d = (1 to 10).map(i => (i.toLong, i)).toDF("id", "score")
    // keep top 50%: threshold = percentile(0.5) over 1..10 = 5.5 → ids 6..10
    val kept = Curation.gateByQuantile(d, col("score"), 0.5)
      .select("id").as[Long].collect().toSet
    assert(kept == (6L to 10L).toSet)
    // ties at the threshold are kept (can exceed the fraction)
    val ties = Seq((1L, 1), (2L, 5), (3L, 5), (4L, 5)).toDF("id", "score")
    assert(Curation.gateByQuantile(ties, col("score"), 0.5)
      .count() == 3) // threshold 5.0; all three 5s kept
    assert(Curation.gateByQuantile(
      Seq.empty[(Long, Int)].toDF("id", "score"), col("score"), 0.5).count() == 0)
    // all-NULL scores: the gate must not silently disable itself — the
    // null-can't-pass rule drops every row
    val allNull = Seq((1L, None: Option[Int]), (2L, None)).toDF("id", "score")
    assert(Curation.gateByQuantile(allNull, col("score"), 0.5).count() == 0)
  }

  test("percentileReport: hand-computed interpolation, approx mode same shape") {
    val d = Seq(("a", 10), ("a", 20), ("a", 30), ("a", 40), ("b", 5))
      .toDF("dom", "n")
    val out = Curation.percentileReport(d, col("dom"), col("n"), Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // a: sorted [10,20,30,40]; p50 at (4-1)*0.5=1.5 → 25.0; p90 at 2.7 → 37.0
    assert(out("a") == (4L, 25.0, 37.0))
    assert(out("b") == (1L, 5.0, 5.0))
    val approx = Curation.percentileReport(d, col("dom"), col("n"), Seq(0.5, 0.9), exact = false)
    assert(approx.columns.toSeq == Seq("domain", "n_docs", "p50", "p90"))
    assert(approx.count() == 2)
  }

  test("blocklistGate escapes regex metacharacters in phrases") {
    val docsDf = Seq((1L, "price is $9.99 today"), (2L, "price is $9x99")).toDF("doc_id", "text")
    val out = Curation.blocklistGate(docsDf, col("text"), Seq("$9.99"))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out == Map(1L -> 1, 2L -> 0))
  }

  test("blocklistGate matches phrases with non-ASCII letters (no dead \\b anchors)") {
    // \b next to é/ß/CJK can never match in ASCII-boundary regex engines;
    // such phrases must fall back to substring semantics, not silently
    // never block
    val docsDf = Seq(
      (1L, "total scheiße content"),
      (2L, "café reviews"),
      (3L, "clean text")).toDF("doc_id", "text")
    val out = Curation.blocklistGate(docsDf, col("text"),
        Seq("scheiße", "café"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out == Map(1L -> true, 2L -> true, 3L -> false))
  }

  test("distributionDrift: identical corpora score 0, shifts score high") {
    val base = (1L to 400L).map(i => Tuple1((i % 50 + 10).toDouble)).toDF("v")
    val same = Curation.distributionDrift(base, base, col("v")).collect()(0)
    assert(same.getLong(0) == 0L) // p == q in every bucket → exactly zero
    assert(same.getLong(2) == 400L && same.getLong(3) == 400L)
    // 10x the values: mass moves a full decade of buckets — PSI explodes
    val shifted = base.select((col("v") * 10).as("v"))
    val drift = Curation.distributionDrift(base, shifted, col("v")).collect()(0)
    assert(drift.getLong(0) > 250000000L) // >> the 0.25 investigate line
    // nonpositive values land in the reserved bucket, not an error
    val withZeros = base.unionAll(Seq(Tuple1(0.0), Tuple1(-5.0)).toDF("v"))
    assert(Curation.distributionDrift(base, withZeros, col("v"))
      .collect()(0).getLong(0) >= 0L)
    // NaN joins them in the underflow bucket (NOT bucket 0 via the
    // non-ANSI cast): NaN-vs-zeros corpora bucket identically → PSI 0
    val withNans = base.unionAll(Seq(Tuple1(Double.NaN), Tuple1(Double.NaN)).toDF("v"))
    assert(Curation.distributionDrift(withZeros, withNans, col("v"))
      .collect()(0).getLong(0) == 0L)
  }

  test("distributionDrift with NaN values still EQUALS histogramPsi on sketches") {
    import graft.functions.dsl.log_histogram
    val a = ((1L to 200L).map(i => Tuple1((i % 50 + 10).toDouble))
      :+ Tuple1(Double.NaN)).toDF("v")
    val b = ((1L to 150L).map(i => Tuple1((i % 23 + 7).toDouble * 3))
      :+ Tuple1(Double.NaN) :+ Tuple1(Double.NaN)).toDF("v")
    val raw = Curation.distributionDrift(a, b, col("v")).collect()(0).getLong(0)
    val sketch = a.agg(log_histogram(col("v")).as("h"))
      .crossJoin(b.agg(log_histogram(col("v")).as("hb")))
      .select(Curation.histogramPsi(col("h"), col("hb")))
      .collect()(0).getLong(0)
    assert(sketch == raw && raw > 0L)
  }

  test("histogramPsi on sketches EQUALS distributionDrift on raw frames") {
    import graft.functions.dsl.log_histogram
    val a = (1L to 400L).map(i => Tuple1((i % 50 + 10).toDouble)).toDF("v")
    val b = (1L to 300L).map(i => Tuple1((i % 23 + 7).toDouble * 3)).toDF("v")
    val raw = Curation.distributionDrift(a, b, col("v")).collect()(0).getLong(0)
    val ha = a.agg(log_histogram(col("v")).as("h"))
    val hb = b.agg(log_histogram(col("v")).as("hb"))
    val sketch = ha.crossJoin(hb)
      .select(Curation.histogramPsi(col("h"), col("hb")).as("psi"))
      .collect()(0).getLong(0)
    assert(sketch == raw && raw > 0L)
    // identical sketches → exactly zero; null sketch → empty map, finite
    assert(ha.crossJoin(ha.select(col("h").as("h2")))
      .select(Curation.histogramPsi(col("h"), col("h2"))).collect()(0).getLong(0) == 0L)
    assert(ha.select(Curation.histogramPsi(col("h"), lit(null)))
      .collect()(0).getLong(0) >= 0L)
  }

  test("distributionDrift is partition-invariant (fixed-point sum)") {
    val a = (1L to 300L).map(i => Tuple1((i % 37 + 3).toDouble)).toDF("v")
    val b = (1L to 300L).map(i => Tuple1((i % 23 + 7).toDouble)).toDF("v")
    val r1 = Curation.distributionDrift(a.repartition(1), b.repartition(1), col("v"))
      .collect()(0).getLong(0)
    val r7 = Curation.distributionDrift(a.repartition(7), b.repartition(3), col("v"))
      .collect()(0).getLong(0)
    assert(r1 == r7 && r1 > 0L)
  }

  test("robustOutliers: exact median/MAD, planted outlier flagged per group") {
    // group a: {10,11,12,13,1000} → med 12, devs {2,1,0,1,988} → MAD 1
    //   threshold 3.5·1.4826·1 ≈ 5.19 → only 1000 flags
    // group b: tight {5,5,5} → MAD 0 → any deviation would flag; none does
    val rows = Seq(
      ("a", 1L, 10.0), ("a", 2L, 11.0), ("a", 3L, 12.0), ("a", 4L, 13.0), ("a", 5L, 1000.0),
      ("b", 6L, 5.0), ("b", 7L, 5.0), ("b", 8L, 5.0)).toDF("g", "id", "v")
    val out = Curation.robustOutliers(rows, col("g"), col("id"), col("v"))
      .collect().map(r => r.getLong(1) -> ((r.getDouble(3), r.getDouble(4), r.getBoolean(5))))
      .toMap
    assert(out(5L) == ((12.0, 1.0, true)))
    assert(Seq(1L, 2L, 3L, 4L).forall(!out(_)._3))
    assert(out(6L) == ((5.0, 0.0, false)))
  }

  test("robustOutliers: a NULL key is a group like any other, not dropped") {
    // with plain equi-joins the null-key rows would silently vanish from
    // the report (r15 null-safe-join sweep) — they must flag within their
    // own group, and every input row must appear in the output
    val rows = Seq(
      (Some("a"), 1L, 10.0), (Some("a"), 2L, 11.0), (Some("a"), 3L, 12.0),
      (None, 4L, 5.0), (None, 5L, 6.0), (None, 6L, 5.5), (None, 7L, 900.0))
      .toDF("g", "id", "v")
    val out = Curation.robustOutliers(rows, col("g"), col("id"), col("v"))
      .collect().map(r => r.getLong(1) -> ((Option(r.getString(0)), r.getBoolean(5))))
      .toMap
    assert(out.size == 7, s"rows vanished: $out")
    assert(out(7L) == ((None, true)))          // outlier within the NULL group
    assert(Seq(4L, 5L, 6L).forall(i => out(i) == ((None, false))))
  }

  test("robustOutliers survives the stddev-breaker a z-score check misses") {
    // 20 values at 100 plus TWO at 1e6: the outliers inflate stddev to
    // ~3e5, putting themselves within 3.3σ — a z-score check at 3.5σ
    // misses them; median/MAD flags both
    val vals = (1L to 20L).map(i => ("g", i, 100.0 + (i % 3))) ++
      Seq(("g", 98L, 1000000.0), ("g", 99L, 1000000.0))
    val flagged = Curation.robustOutliers(vals.toDF("g", "id", "v"),
        col("g"), col("id"), col("v"))
      .where(col("outlier")).collect().map(_.getLong(1)).toSet
    assert(flagged == Set(98L, 99L))
    val mean = vals.map(_._3).sum / vals.size
    val std = math.sqrt(vals.map(v => (v._3 - mean) * (v._3 - mean)).sum / vals.size)
    assert((1000000.0 - mean) / std < 3.5) // the z-score check really does miss it
  }

  test("rfmScores: equal-frequency buckets, deterministic ties, composite code") {
    def ts(d: Long) = new java.sql.Timestamp(1700000000000L + d * 86400000L)
    // 5 users with strictly increasing recency/frequency/monetary
    val rows = (1 to 5).flatMap { u =>
      (1 to u).map(i => (s"u$u", ts(u.toLong), 10.0 * u))
    }
    val got = Curation.rfmScores(rows.toDF("k", "ts", "v"),
        col("k"), col("ts"), col("v"))
      .as[(String, java.sql.Timestamp, Long, Long, Int, Int, Int, Int)]
      .collect().map(r => r._1 -> ((r._3, r._5, r._6, r._7, r._8))).toMap
    // user u: n_events = u, every dimension rank = u → all scores = u
    for (u <- 1 to 5)
      assert(got(s"u$u") == ((u.toLong, u, u, u, u * 111)), s"u$u: ${got(s"u$u")}")
    // ceil bucketing: 7 keys at k=5 → bucket sizes follow ceil(rank*5/7)
    val seven = (1 to 7).map(i => (s"w$i", ts(i.toLong), 1.0 * i))
    val b = Curation.rfmScores(seven.toDF("k", "ts", "v"),
        col("k"), col("ts"), col("v"))
      .select("key", "r_score").as[(String, Int)].collect().toMap
    assert(b == Map("w1" -> 1, "w2" -> 2, "w3" -> 3, "w4" -> 3,
      "w5" -> 4, "w6" -> 5, "w7" -> 5))
  }

  test("concentrationReport: exact Gini, inverse Simpson, top shares") {
    // masses 1,1,2,4 over 4 keys: ascending ranks 1..4 with (count, key)
    // order → Σi·c = 1+2+6+16 = 25; gini = (50 − 5·8)/(4·8) = 10/32
    val df = (Seq.fill(1)("a") ++ Seq.fill(1)("b") ++ Seq.fill(2)("c") ++
      Seq.fill(4)("d")).toDF("k")
    val r = Curation.concentrationReport(df, col("k"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    // top1 = 4/8; top10 covers all = 1e6; inv simpson = 64e6/22
    assert(r == ((4L, 8L, 500000L, 1000000L, 312500L, 2909090L)))
    // uniform masses: gini 0, effective keys = n
    val u = (1 to 30).flatMap(i => Seq.fill(3)(s"k$i")).toDF("k")
    val ru = Curation.concentrationReport(u, col("k"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(ru._5 == 0L && ru._6 == 30000000L)
    // partitioning invariance of the distributed rank
    val rp = Curation.concentrationReport(df.repartition(7), col("k"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(rp == r)
  }

  test("rfmScores/concentrationReport release rank caches (no residue)") {
    // r14 VERDICT what's-wrong #3: three rfm stages + the report used to
    // pin one MEMORY_AND_DISK entry each for the session. Both are eager
    // (count()/collect() inside), so the registry must already be clean
    // when they return.
    spark.catalog.clearCache()
    def ts(d: Long) = new java.sql.Timestamp(1700000000000L + d * 86400000L)
    val rows = (1 to 9).map(i => (s"u$i", ts(i.toLong), 1.0 * i))
    Curation.rfmScores(rows.toDF("k", "ts", "v"),
      col("k"), col("ts"), col("v")).count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "rfmScores must not leave persisted Dataset entries behind")
    Curation.concentrationReport(rows.toDF("k", "ts", "v"), col("k")).count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "concentrationReport must not leave persisted Dataset entries behind")
  }

  test("vocabCoverage: top-k by (freq desc, word asc), exact token mass") {
    // freqs: the 4, cat 2, dog 2, emu 1 → vocab 2 = {the, cat} (tie cat<dog)
    val df = Seq("the cat the dog", "THE cat dog emu the").toDF("t")
    val r = Curation.vocabCoverage(df, col("t"), 2)
      .as[(Long, Long, Long, Long)].head()
    assert(r == ((9L, 2L, 6L, 666666L)))
    // vocab bigger than the vocabulary: full coverage, actual size reported
    val all = Curation.vocabCoverage(df, col("t"), 100)
      .as[(Long, Long, Long, Long)].head()
    assert(all == ((9L, 4L, 9L, 1000000L)))
  }

  test("neymanAllocation: heterogeneous strata earn samples, caps redistribute") {
    // A: values {0, 2} → sd 1e6 micro, weight 2e6; B: constant → weight 0
    val df = Seq(("a", 0.0), ("a", 2.0), ("b", 5.0), ("b", 5.0), ("b", 5.0))
      .toDF("st", "v")
    val got = Curation.neymanAllocation(df, col("st"), col("v"), budget = 4)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._5))).toMap
    // A takes its cap (2 of 2 rows); surplus redistributes to B
    assert(got("a") == ((2L, 1000000L, 2L)))
    assert(got("b") == ((3L, 0L, 2L)))
    // proportionality: equal sizes, sd ratio 1:3 → allocation 1:3
    val rnd = new scala.util.Random(3)
    val prop = (1 to 400).map(i => ("lo", 10.0 + (i % 2))) ++ // sd 0.5
      (1 to 400).map(i => ("hi", 10.0 + 3.0 * (i % 2))) // sd 1.5
    val a2 = Curation.neymanAllocation(prop.toDF("st", "v"), col("st"), col("v"), 80)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(a2 == Map("lo" -> 20L, "hi" -> 60L), a2.toString)
    // all-constant strata: zero weights, budget still fully (and
    // deterministically) handed out up to the row counts
    val const = Seq(("x", 1.0), ("x", 1.0), ("y", 2.0)).toDF("st", "v")
    val a3 = Curation.neymanAllocation(const, col("st"), col("v"), 3)
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r._5).toMap
    assert(a3 == Map("x" -> 2L, "y" -> 1L))
  }

  test("transitionMatrix: per-key steps, tiebroken order, ppm rows sum to <= 1e6") {
    // user 1: a→b→a ; user 2: a→b ; user 3 same-ts pair tiebroken by id
    val df = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "a"),
      (2L, 10L, 4L, "a"), (2L, 15L, 5L, "b"),
      (3L, 50L, 6L, "b"), (3L, 50L, 7L, "c"), // ties: id 6 before 7 → b→c
      (4L, 99L, 8L, "z")) // singleton: no transitions
      .toDF("u", "ts", "id", "t")
    val got = Curation.transitionMatrix(df, col("u"), col("ts"), col("id"), col("t"))
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == Map(
      ("a", "b") -> ((2L, 1000000L)),
      ("b", "a") -> ((1L, 500000L)),
      ("b", "c") -> ((1L, 500000L))))
  }
}
