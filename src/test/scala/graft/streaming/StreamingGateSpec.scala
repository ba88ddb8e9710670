package graft.streaming

import graft.TestSpark
import graft.pipeline.Classifier
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** The streaming quality gate must (a) be the same fused one-projection
 * tier the batch side guarantees (CurationFusionSpec), and (b) gate and
 * report correctly under a watermark on a live stream. */
class StreamingGateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val goodText =
    ("the quick brown fox jumps over the lazy dog and then wanders " +
      "through a long meadow describing many different things with " +
      "plenty of unique words that have reasonable lengths and the " +
      "usual function words like of and that with here to be found").trim

  test("gate signals fuse into one codegen stage over one scan, fallback disabled") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gate").toString
    Seq((1L, goodText), (2L, "spam spam spam spam spam spam spam spam spam spam"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val model = Classifier.train(
      Seq((goodText, 1.0), ("zz11 buy now spam", 0.0)).toDF("text", "y"),
      col("text"), col("y"), dim = 128, iters = 2)
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.read.parquet(dir).select(
        col("doc_id"),
        StreamingGate.qualitySignals(col("text"), gopherMinWords = 10,
          classifier = Some(model)).as("sig"))
      assert(df.collect().length == 2) // evaluates with fallback disabled
      val plan = df.queryExecution.executedPlan
      val wscs = plan.collect { case w: WholeStageCodegenExec => w }
      assert(wscs.size == 1, s"expected ONE fused codegen stage, got ${wscs.size}:\n$plan")
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.size == 1, s"expected one scan:\n$plan")
    } finally prev.foreach(spark.conf.set("spark.sql.codegen.fallback", _))
  }

  test("gate filters failing docs; per-signal report counts under a watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val stream = mem.toDF().toDF("ts", "text")

    // repeated-phrase doc trips the repetition signal; the word-soup doc
    // trips the Gopher gate (too few words); the good doc passes
    val repText = Array.fill(30)("one two three four five six").mkString(" ")
    val shortText = "too short"

    val gated = StreamingGate.gate(stream, col("text"), gopherMinWords = 10)
    val gq = gated.writeStream.format("memory").queryName("gate_rows")
      .outputMode("append").start()
    val report = StreamingGate.windowedGateReport(
      stream, "ts", col("text"), "10 minutes", "5 minutes", gopherMinWords = 10)
    val rq = report.writeStream.format("memory").queryName("gate_report")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2026-01-01 10:01:00")
      val late = Timestamp.valueOf("2026-01-01 11:00:00")
      mem.addData((t0, goodText), (t0, repText), (t0, shortText), (t0, null))
      gq.processAllAvailable(); rq.processAllAvailable()
      mem.addData((late, goodText)) // advance watermark, close the window
      gq.processAllAvailable(); rq.processAllAvailable()

      val kept = spark.sql("SELECT text FROM gate_rows").as[String].collect()
      assert(kept.count(_ == goodText) >= 1)
      assert(!kept.contains(repText) && !kept.contains(shortText))
      assert(!kept.contains(null)) // null text can never pass the gate

      val r = spark.sql(
        """SELECT rows, passed, gopher_fail, repetition_fail, pii_fail
          |FROM gate_report ORDER BY window_start LIMIT 1""".stripMargin).collect().head
      // null-text row counts in rows, never in passed, and (documented
      // contract) in no per-signal failure bucket — signals are null for it
      assert(r.getLong(0) == 4 && r.getLong(1) == 1)
      // shortText fails the word-count gate; repText also fails gopher (its
      // six-word loop has zero stopwords) AND the repetition cap — failure
      // buckets overlap by design
      assert(r.getLong(2) == 2)
      assert(r.getLong(3) == 1)
      assert(r.getLong(4) == 0)
    } finally { gq.stop(); rq.stop() }
  }

  test("benchmark-bloom decontamination gates a stream, agreeing with the batch path") {
    implicit val sqlCtx = spark.sqlContext
    val benchSent = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val bench = Seq(Tuple1(benchSent)).toDF("text")
    // register the eval-set 8-gram bloom ONCE, batch-side
    graft.lookups.Lookups.registerBloomFrom(spark, "graft_stream_decontam",
      bench.select(explode(graft.pipeline.Text.shingles(col("text"), 8)).as("ng")),
      col("ng"), expected = 1000L, fpp = 0.001)
    val contaminated = s"intro words then $benchSent and a tail"
    val clean = "totally different content with many of its own unique words here"
    val mem = MemoryStream[(Long, String)]
    val gated = StreamingGate.decontaminationGate(
      mem.toDF().toDF("id", "text"), col("text"), "graft_stream_decontam")
    val q = gated.writeStream.format("memory").queryName("decontam_rows")
      .outputMode("append").start()
    try {
      mem.addData((1L, contaminated), (2L, clean), (3L, "short"))
      q.processAllAvailable()
      val kept = spark.sql("SELECT id FROM decontam_rows").as[Long].collect().toSet
      // contaminated doc shares 8-grams with the benchmark → dropped; the
      // clean and too-short-to-shingle docs pass
      assert(kept == Set(2L, 3L), s"kept $kept")
      // batch parity: decontaminateBloom flags exactly the dropped doc
      val flagged = graft.pipeline.Curation.decontaminateBloom(
          Seq((1L, contaminated), (2L, clean)).toDF("id", "text"),
          col("id"), col("text"), bench, col("text"))
        .select("id").as[Long].collect().toSet
      assert(flagged == Set(1L))
    } finally {
      q.stop()
      graft.lookups.Lookups.unregisterBloom("graft_stream_decontam")
    }
  }

  test("containment gate drops containing docs on a live stream, exact batch parity") {
    implicit val sqlCtx = spark.sqlContext
    // asymmetric contamination: the benchmark item is a SLICE of a longer
    // doc — Jaccard is low (the bloom/minhash regime misses the shape) but
    // shingle containment is ~1.0
    val benchSent = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val bench = Seq(Tuple1(benchSent)).toDF("text")
    graft.lookups.Lookups.registerContainmentFrom(
      spark, "graft_stream_contain", bench, col("text"), shingleSize = 5)
    val containing = s"a very long introduction before the quote $benchSent " +
      "and then a long tail of unrelated words follows here afterwards"
    val partial = "alpha beta gamma delta epsilon something entirely different " +
      "continues from here with its own words and no further overlap at all"
    val clean = "totally different content with many of its own unique words " +
      "spread across the whole document and nothing shared with the benchmark"
    try {
      val mem = MemoryStream[(Long, String)]
      val gated = StreamingGate.containmentGate(
        mem.toDF().toDF("id", "text"), col("text"), "graft_stream_contain",
        shingleSize = 5, threshold = 0.8)
      val q = gated.writeStream.format("memory").queryName("contain_rows")
        .outputMode("append").start()
      try {
        mem.addData((1L, containing), (2L, partial), (3L, clean), (4L, "short"))
        q.processAllAvailable()
        val kept = spark.sql("SELECT id FROM contain_rows").as[Long].collect().toSet
        // only the doc CONTAINING the whole benchmark item drops: the
        // partial overlap sits far under the 0.8 containment threshold
        assert(kept == Set(2L, 3L, 4L), s"kept $kept")
      } finally q.stop()
      // EXACT batch parity: decontaminateByContainment keeps the same set
      val batch = Seq((1L, containing), (2L, partial), (3L, clean), (4L, "short"))
        .toDF("id", "text")
      val batchKept = graft.pipeline.Dedup.decontaminateByContainment(
          batch, col("id"), col("text"), bench.selectExpr("1L AS bid", "text"),
          col("bid"), col("text"), shingleSize = 5, threshold = 0.8)
        .select("id").as[Long].collect().toSet
      assert(batchKept == Set(2L, 3L, 4L), s"batch kept $batchKept")
      // and the SQL face agrees with the column face
      graft.functions.Registry.registerAll(spark)
      val viaSql = batch.where(
        expr("containment_in(text, 'graft_stream_contain', 5) < 0.8D"))
        .select("id").as[Long].collect().toSet
      assert(viaSql == Set(2L, 3L, 4L), s"sql face kept $viaSql")
    } finally graft.lookups.Lookups.unregisterContainment("graft_stream_contain")
  }

  test("a collected DSIR model gates a stream statelessly") {
    import graft.pipeline.Dsir
    implicit val sqlCtx = spark.sqlContext
    val raw = Seq(Tuple1(goodText), Tuple1("buy cheap pills online now")).toDF("text")
    val target = Seq(Tuple1(goodText)).toDF("text")
    val model = Dsir.collectModel(Dsir.train(raw, col("text"), target, col("text"), 256))
    val mem = MemoryStream[String]
    // stateless projection → works as a plain where() on an append stream
    val gated = mem.toDF().toDF("text")
      .where(Dsir.weightColumn(col("text"), model).getField("weight_e6") > 0L)
    val q = gated.writeStream.format("memory").queryName("dsir_rows")
      .outputMode("append").start()
    try {
      mem.addData(goodText, "buy cheap pills online now")
      q.processAllAvailable()
      val kept = spark.sql("SELECT text FROM dsir_rows").as[String].collect().toSet
      assert(kept.contains(goodText) && !kept.exists(_.contains("pills")))
    } finally q.stop()
  }

  test("blocklist signal gates a stream and reports its own failure bucket") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val stream = mem.toDF().toDF("ts", "text")
    val badText = goodText + " casino jackpot"

    val gated = StreamingGate.gate(stream, col("text"), gopherMinWords = 10,
      blocklist = Seq("casino jackpot"))
    val gq = gated.writeStream.format("memory").queryName("bl_rows")
      .outputMode("append").start()
    val report = StreamingGate.windowedGateReport(
      stream, "ts", col("text"), "10 minutes", "5 minutes", gopherMinWords = 10,
      blocklist = Seq("casino jackpot"))
    val rq = report.writeStream.format("memory").queryName("bl_report")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2026-01-01 10:01:00")
      val late = Timestamp.valueOf("2026-01-01 11:00:00")
      mem.addData((t0, goodText), (t0, badText))
      gq.processAllAvailable(); rq.processAllAvailable()
      mem.addData((late, goodText))
      gq.processAllAvailable(); rq.processAllAvailable()

      val kept = spark.sql("SELECT text FROM bl_rows").as[String].collect()
      assert(kept.contains(goodText) && !kept.contains(badText))
      val r = spark.sql(
        """SELECT rows, passed, blocklist_fail
          |FROM bl_report ORDER BY window_start LIMIT 1""".stripMargin).collect().head
      assert(r.getLong(0) == 2 && r.getLong(1) == 1 && r.getLong(2) == 1)
    } finally { gq.stop(); rq.stop() }
  }
}
