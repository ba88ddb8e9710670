package graft.streaming

import graft.TestSpark
import graft.pipeline.{Classifier, Pii, Text}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The per-row curation tier (PII redaction, repetition signals, classifier
 * scoring) is stateless, so it composes onto Structured Streaming
 * unchanged — the property that lets one curation definition serve both the
 * 100 TB batch backfill and the live ingest path. */
class StreamingCurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("windowed corpus report closes per (window, domain) at the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    val mem = MemoryStream[(Timestamp, String, String)]
    val out = StreamingDq.streamingCorpusReport(
      mem.toDF().toDF("ts", "source", "text"),
      "ts", "text", "source", "10 minutes", "10 minutes", "5 minutes",
      gopherMinWords = 2)
    val q = out.writeStream.format("memory").queryName("corpus_report_stream")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2026-01-01 10:01:00")
      mem.addData(
        (t0, "web", "the cat and the dog have fun with that"),
        (t0, "web", "short"),
        (t0, "code", "email me at a@b.com about the code that we have with us"))
      q.processAllAvailable()
      mem.addData((Timestamp.valueOf("2026-01-01 11:00:00"), "web", "late doc"))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT domain, n_docs, n_tokens, pii_docs FROM corpus_report_stream")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(rows("web") == ((2L, 10L, 0L)))
      assert(rows("code") == ((1L, 12L, 1L)))
    } finally q.stop()
  }

  test("PII redaction + repetition + classifier score on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val model = Classifier.train(
      Seq(("clean useful words here", 1.0), ("zz11 buy now $$$", 0.0)).toDF("text", "y"),
      col("text"), col("y"), dim = 256, iters = 5)
    val mem = MemoryStream[(Long, String)]
    val out = mem.toDF().toDF("id", "text").select(
      col("id"),
      Pii.redactPii(col("text")).as("clean"),
      Text.repetitionSignals(col("text")).getField("dup_line_frac").as("dlf"),
      Classifier.score(model, col("text")).as("quality"))
    val q = out.writeStream.format("memory").queryName("curation_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, "mail me at a@b.com\nx\nx"), (2L, "clean useful words here"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT id, clean, dlf, quality FROM curation_stream ORDER BY id")
        .collect()
      assert(rows.length == 2)
      assert(rows(0).getString(1) == "mail me at <EMAIL>\nx\nx")
      assert(rows(0).getDouble(2) == 2.0 / 3.0)
      assert(rows(1).getDouble(3) > 0.5)
    } finally q.stop()
  }
}
