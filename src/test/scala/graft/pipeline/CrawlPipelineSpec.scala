package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The whole front door, end to end: a JSONL crawl dump with malformed
 * lines and duplicate fetches goes in; deduped, gated, shard-exported
 * training data comes out. Every stage is an operator this library ships —
 * the spec proves they compose. */
class CrawlPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("jsonl dump → quarantine → front door → dedup → gate → shards") {
    // --- a crawl dump: html pages, URL variants of the same fetch, one
    // mojibake page, one spam page, two malformed lines
    val body = "the quick brown fox jumps over the lazy dog and keeps going " +
      "with plenty of ordinary words that the gates consider entirely fine " +
      "because the sentence runs long enough to pass the word count easily " +
      "and the stopwords of the language appear with the usual frequency"
    def page(i: Long, url: String, text: String) =
      s"""{"doc_id": $i, "url": "$url", "text": "<html><body><h1>T$i</h1><p>$text</p></body></html>"}"""
    val dir = Files.createTempDirectory("graft_e2e")
    Files.writeString(dir.resolve("dump.jsonl"), Seq(
      page(1, "https://a.com/x?utm_source=f", body),
      page(2, "HTTPS://A.COM:443/x", body + " slightly varied"), // same canonical URL as 1
      page(3, "https://b.com/y", body + " alpha"),
      page(4, "https://c.com/z", "Don\\u00E2\\u0080\\u0099t stop " + body), // mojibake
      page(5, "https://d.com/s", "buy now buy now buy now"),     // fails gates
      """{"doc_id": 6, "url": "https://e.com/t"""               // truncated line
    ).mkString("", "\n", "\nnot json\n"))

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("url", StringType),
      StructField("text", StringType)))
    val (rows, corrupt) = graft.sources.Jsonl.read(spark, dir.toString, schema)
    assert(corrupt.count() == 2)

    // --- front door: extract, repair, canonicalize; dedup on canonical URL
    val front = rows.select(col("doc_id"),
      Text.urlCanonicalize(col("url")).as("url"),
      Text.fixEncoding(Text.extractHtml(col("text"), maxLinkDensity = 0.5)).as("text"))
    val deduped = Dedup.exact(front, col("doc_id"), col("url"))
    assert(deduped.count() == 4) // 1 and 2 collapse to 1

    // --- gates: word count + repaired text intact
    val gated = graft.streaming.StreamingGate.gate(
      deduped, col("text"), gopherMinWords = 20)
    val kept = gated.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L)) // spam page 5 fails, dup 2 gone
    val repaired = gated.where(col("doc_id") === 4).select("text").as[String].head()
    assert(repaired.contains("Don't stop")) // mojibake repaired end to end

    // --- shards: deterministic export + honest manifest
    val out = Files.createTempDirectory("graft_e2e_out").toString
    val manifest = Curation.writeShards(
      gated, col("doc_id"), Text.tokenCount(col("text")), out, nShards = 2)
    assert(manifest.agg(sum("docs")).head().getLong(0) == 3L)
    assert(spark.read.parquet(out).count() == 3)
  }
}
