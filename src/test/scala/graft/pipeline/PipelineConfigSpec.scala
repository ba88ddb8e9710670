package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineConfigSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val yaml =
    """version: 1
      |name: test_curation
      |steps:
      |  - kind: with_column
      |    name: add_tokens
      |    column: toks
      |    expr: "token_count(text)"
      |  - kind: filter
      |    name: min_tokens
      |    where: "toks >= 3"
      |  - kind: blocklist
      |    name: badwords
      |    column: text
      |    phrases: [sell now, spam]
      |  - kind: dedup_exact
      |    name: exact
      |    id: doc_id
      |    content: [lower(text)]
      |  - kind: drop_columns
      |    name: cleanup
      |    columns: [toks]
      |""".stripMargin

  private def corpus = Seq(
    (1L, "a good long document body"),
    (2L, "A GOOD long document body"),  // case-dup of 1 after lower()
    (3L, "please sell now cheap"),      // blocked phrase
    (4L, "too short"),                  // under token gate
    (5L, "another fine piece of text"))
    .toDF("doc_id", "text")

  test("yaml parse → apply equals the hand-built chain") {
    val p = PipelineConfig.fromYaml(yaml)
    assert(p.name == "test_curation" && p.steps.size == 5)
    val got = p(corpus).select("doc_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 5L))
    // hand-built equivalent
    val hand = Dedup.exact(
      Curation.blocklistGate(
        corpus.withColumn("toks", Text.tokenCount(col("text")))
          .where(col("toks") >= 3),
        col("text"), Seq("sell now", "spam"))
        .where(!col("blocked")).drop("blocked", "n_blocklist_hits"),
      col("doc_id"), lower(col("text"))).drop("toks")
    assert(hand.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 5L))
    assert(p(corpus).columns.toSeq == Seq("doc_id", "text"))
  }

  test("round trip: toYaml → fromYaml is identity") {
    val p = PipelineConfig.fromYaml(yaml)
    val p2 = PipelineConfig.fromYaml(p.toYaml)
    assert(p2 == p)
    assert(PipelineConfig.fromYaml(p2.toYaml) == p2)
  }

  test("blocklist engine auto switches to the automaton above 64 phrases") {
    val small = PipelineConfig.BlocklistStep("s", "text", Seq("a b"))
    val big = PipelineConfig.BlocklistStep("b", "text",
      (1 to 65).map(i => s"phrase$i"))
    assert(!small.useAutomaton && big.useAutomaton)
    // both engines agree on the data
    val auto = PipelineConfig.BlocklistStep("x", "text",
      Seq("sell now", "spam"), engine = "automaton")(corpus)
    val re = PipelineConfig.BlocklistStep("x", "text",
      Seq("sell now", "spam"), engine = "regex")(corpus)
    assert(auto.select("doc_id").as[Long].collect().sorted.toSeq ==
      re.select("doc_id").as[Long].collect().sorted.toSeq)
    intercept[IllegalArgumentException](
      PipelineConfig.BlocklistStep("x", "text", Seq("a"), engine = "nope"))
  }

  test("validate reports per-step analysis errors without running") {
    val p = PipelineConfig.fromYaml(
      """version: 1
        |name: broken
        |steps:
        |  - {kind: filter, name: ok, where: "doc_id > 0"}
        |  - {kind: filter, name: bad_col, where: "no_such_column > 1"}
        |  - {kind: with_column, name: bad_fn, column: x, expr: "no_such_fn(text)"}
        |""".stripMargin)
    val errs = p.validate(spark, corpus.schema)
    assert(errs.map(_._1) == Seq("bad_col", "bad_fn"))
    val clean = PipelineConfig.fromYaml(yaml)
    assert(clean.validate(spark, corpus.schema).isEmpty)
  }

  test("dedup_near and cap_per_key steps compose") {
    val p = PipelineConfig.fromYaml(
      """version: 1
        |name: near
        |steps:
        |  - {kind: dedup_near, name: nd, id: doc_id, text: text, threshold: 0.6}
        |  - {kind: cap_per_key, name: cap, key: "doc_id % 2", id: doc_id, max: 1}
        |""".stripMargin)
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today!"), // near-dup
      (3L, "completely different content lives here"),
      (6L, "yet another unrelated document"))
      .toDF("doc_id", "text")
    val out = p(df).select("doc_id").as[Long].collect().sorted
    // near-dup 2 drops; cap keeps 1 doc per parity class (lowest id wins)
    assert(out.length == 2 && out.contains(1L))
  }

  test("pipeline funnel matches the sequential run's drops") {
    val p = PipelineConfig.fromYaml(yaml)
    val f = p.funnel(corpus).collect()
    assert(f.map(_.getString(1)).toSeq == Seq("min_tokens", "badwords"))
    // last gate's rows_out == rows surviving the row-local prefix
    val prefixOut = PipelineConfig.BlocklistStep("b", "text", Seq("sell now", "spam"))(
      corpus.withColumn("toks", Text.tokenCount(col("text")))
        .where(col("toks") >= 3)).count()
    assert(f.last.getAs[Long]("rows_out") == prefixOut)
    // dedup (corpus-level) is NOT part of the funnel
    assert(f.last.getAs[Long]("rows_out") != p(corpus).count())
  }

  test("funnel rejects shadowing enrichments and gate-free pipelines") {
    val shadow = PipelineConfig.fromYaml(
      """version: 1
        |name: sh
        |steps:
        |  - {kind: filter, name: g, where: "doc_id > 0"}
        |  - {kind: with_column, name: w, column: text, expr: "upper(text)"}
        |  - {kind: filter, name: g2, where: "length(text) > 3"}
        |""".stripMargin)
    intercept[IllegalArgumentException](shadow.funnel(corpus))
    val noGates = PipelineConfig.fromYaml(
      "version: 1\nname: ng\nsteps: [{kind: dedup_exact, name: d, id: doc_id, content: [text]}]")
    intercept[IllegalArgumentException](noGates.funnel(corpus))
  }

  test("quantile_gate / temperature_sample / sample_budget steps: parse, round-trip, apply") {
    val y =
      """version: 1
        |name: selection
        |steps:
        |  - {kind: with_column, name: toks, column: toks, expr: "token_count(text)"}
        |  - {kind: quantile_gate, name: qg, score: toks, keepFraction: 0.5}
        |  - {kind: temperature_sample, name: ts, id: doc_id, domain: src,
        |     tokens: toks, totalBudget: 1000000, alpha: 0.5}
        |  - {kind: sample_budget, name: sb, id: doc_id, domain: src,
        |     tokens: toks, budgets: {web: 1000000, wiki: 500}}
        |""".stripMargin
    val p = PipelineConfig.fromYaml(y)
    assert(PipelineConfig.fromYaml(p.toYaml) == p)
    assert(p.steps.collect { case s: PipelineConfig.SampleBudgetStep => s.budgets }
      .head == Map("web" -> 1000000L, "wiki" -> 500L))
    val df = (1 to 40).map(i =>
      (i.toLong, if (i % 2 == 0) "web" else "wiki",
        Seq.fill(10 + i)("w").mkString(" "))).toSeq.toDF("doc_id", "src", "text")
    val out = p(df)
    // quantile gate halves the corpus by token count; budgets are generous
    // (web) or tight (wiki) — the chain runs and keeps a sane subset
    val n = out.count()
    assert(n > 0 && n <= 20, s"kept $n of 40")
    // hand-built equivalence for the quantile stage
    val handQ = Curation.gateByQuantile(
      df.withColumn("toks", Text.tokenCount(col("text"))), col("toks"), 0.5)
    assert(handQ.count() == 20)
  }

  test("applyStreaming: row-local config gates a live stream; corpus steps rejected") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val p = PipelineConfig.fromYaml(
      """version: 1
        |name: live_gate
        |steps:
        |  - {kind: with_column, name: toks, column: toks, expr: "token_count(text)"}
        |  - {kind: filter, name: min_tokens, where: "toks >= 3"}
        |  - {kind: blocklist, name: bad, column: text, phrases: [spam]}
        |  - {kind: drop_columns, name: clean, columns: [toks]}
        |""".stripMargin)
    val mem = MemoryStream[(Long, String)]
    val q = p.applyStreaming(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cfg_gate_rows")
      .outputMode("append").start()
    try {
      mem.addData((1L, "a perfectly fine document"), (2L, "pure spam offer here"),
        (3L, "too short"))
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM cfg_gate_rows").as[Long].collect().toSet
      assert(kept == Set(1L))
    } finally q.stop()
    // batch parity: the SAME config on the same rows
    val batch = p(Seq((1L, "a perfectly fine document"), (2L, "pure spam offer here"),
      (3L, "too short")).toDF("doc_id", "text"))
    assert(batch.select("doc_id").as[Long].collect().toSet == Set(1L))
    // corpus-level steps refuse to stream, naming the offender
    val e = intercept[IllegalArgumentException](
      PipelineConfig.fromYaml(yaml).applyStreaming(mem.toDF().toDF("doc_id", "text")))
    assert(e.getMessage.contains("exact (dedup_exact)"))
  }

  test("funnelWindowed: config gates account per window, batch == streaming shape") {
    import java.sql.Timestamp
    val p = PipelineConfig.fromYaml(
      """version: 1
        |name: win_funnel
        |steps:
        |  - {kind: with_column, name: toks, column: toks, expr: "token_count(text)"}
        |  - {kind: filter, name: min_tokens, where: "toks >= 3"}
        |  - {kind: blocklist, name: bad, column: text, phrases: [spam]}
        |""".stripMargin)
    val df = Seq(
      (Timestamp.valueOf("2026-01-01 00:00:10"), "a perfectly fine document"),
      (Timestamp.valueOf("2026-01-01 00:00:20"), "pure spam offer here"),
      (Timestamp.valueOf("2026-01-01 00:00:30"), "too short"))
      .toDF("ts", "text")
    val w = p.funnelWindowed(df, col("ts"), "1 minute").orderBy("stage").collect()
    assert(w.length == 2)
    assert(w(0).getAs[String]("gate") == "min_tokens"
      && w(0).getAs[Long]("rows_dropped") == 1L)
    assert(w(1).getAs[String]("gate") == "bad"
      && w(1).getAs[Long]("rows_dropped") == 1L && w(1).getAs[Long]("rows_out") == 1L)
    // agrees with the un-windowed funnel on the single window
    val b = p.funnel(df).orderBy("stage").collect()
    w.zip(b).foreach { case (wr, br) =>
      assert(wr.getAs[Long]("rows_out") == br.getAs[Long]("rows_out")) }
  }

  test("redact step scrubs in place, streams, and guards funnel ordering") {
    val p = PipelineConfig.fromYaml(
      """version: 1
        |name: scrub
        |steps:
        |  - {kind: redact, name: scrub_terms, column: text,
        |     phrases: [secret token], replacement: "[X]"}
        |  - {kind: filter, name: keep_all, where: "doc_id >= 0"}
        |""".stripMargin)
    assert(PipelineConfig.fromYaml(p.toYaml) == p)
    val out = p(Seq((1L, "a secret token leaked"), (2L, "clean"))
      .toDF("doc_id", "text")).select("text").as[String].collect().toSet
    assert(out == Set("a [X] leaked", "clean"))
    assert(p.steps.head.rowLocal)
    // redact BEFORE gates participates in the funnel frame; AFTER gates it
    // would diverge from the sequential run and is rejected
    assert(p.funnel(Seq((1L, "x secret token")).toDF("doc_id", "text"))
      .collect().head.getAs[Long]("rows_out") == 1L)
    val after = PipelineConfig.Pipeline(1, "bad", Seq(
      PipelineConfig.FilterStep("g", "doc_id >= 0"),
      PipelineConfig.RedactStep("r", "text", Seq("x"))))
    intercept[IllegalArgumentException](
      after.funnel(Seq((1L, "x")).toDF("doc_id", "text")))
  }

  test("malformed configs fail with located errors") {
    def msg(y: String) =
      intercept[IllegalArgumentException](PipelineConfig.fromYaml(y)).getMessage
    assert(msg("version: 2\nname: x\nsteps: [{kind: filter, name: f, where: a}]")
      .contains("version"))
    assert(msg("version: 1\nname: x\nsteps: [{kind: wat, name: f}]")
      .contains("unknown step kind"))
    assert(msg("version: 1\nname: x\nsteps: [{kind: filter, name: f}]")
      .contains("missing required field 'where'"))
    intercept[IllegalArgumentException](
      PipelineConfig.fromYaml("version: 1\nname: x\nsteps: []"))
    // duplicate step names rejected
    intercept[IllegalArgumentException](PipelineConfig.fromYaml(
      "version: 1\nname: x\nsteps: [{kind: filter, name: f, where: \"1=1\"}, " +
        "{kind: filter, name: f, where: \"2=2\"}]"))
  }

  test("r11 SQL functions compose into config pipelines (readability band, eTLD+1 cap)") {
    graft.functions.Registry.registerAll(spark)
    val p = PipelineConfig.fromYaml(
      """version: 1
        |name: edu_band
        |steps:
        |  - kind: with_column
        |    name: flesch
        |    column: fl
        |    expr: "readability(text).flesch"
        |  - kind: filter
        |    name: band
        |    where: "fl IS NOT NULL AND fl >= 0"
        |  - kind: with_column
        |    name: domain
        |    column: dom
        |    expr: "registrable_domain(url)"
        |  - kind: cap_per_key
        |    name: domain_cap
        |    key: dom
        |    id: doc_id
        |    max: 1
        |""".stripMargin)
    val docsDf = Seq(
      (1L, "The cat sat here. A dog ran by.", "https://a.shop.co.uk/1"),
      (2L, "More plain words sit here today.", "https://b.shop.co.uk/2"), // same eTLD+1
      (3L, "zzzz bcdfg hjklm npqrs tvwxz qqqq wwww rrrr tttt yyyy uuuu " * 20,
        "https://other.com/3")) // consonant soup: flesch deeply negative
      .toDF("doc_id", "text", "url")
    val kept = p(docsDf).select("doc_id").as[Long].collect().toSet
    // 3 fails the band; 1 and 2 share registrable domain shop.co.uk → cap 1 keeps lowest id
    assert(kept == Set(1L))
  }
}
