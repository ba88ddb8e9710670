package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** WARC/WET ingest: record framing, HTTP response unwrapping, charset
 * sniffing, per-record-gzip members, and the quarantine/resync contract —
 * nothing silently drops, and the parsed text chains straight into the
 * HTML front door. */
class WarcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeFixture(dir: Path, gzip: Boolean): Unit = {
    val fileOut = new java.io.FileOutputStream(
      dir.resolve(if (gzip) "crawl-00.warc.gz" else "crawl-00.warc").toFile)
    val out: java.io.OutputStream =
      if (gzip) new java.util.zip.GZIPOutputStream(fileOut) else fileOut
    // a WET-style conversion record
    WarcAlgos.writeRecord(out, "conversion", "https://example.com/a",
      "2024-01-01T00:00:10Z", "text/plain",
      "alpha body text".getBytes("UTF-8"), "<urn:uuid:1>")
    // an HTTP response record, utf-8 html
    WarcAlgos.writeRecord(out, "response", "https://example.com/b",
      "2024-01-01T00:00:20Z", "application/http; msgtype=response",
      WarcAlgos.httpResponsePayload(200, "text/html; charset=utf-8",
        "<html><body><p>bravo café</p></body></html>".getBytes("UTF-8")))
    // an HTTP response whose body is latin-1 — charset sniff must decode it
    WarcAlgos.writeRecord(out, "response", "https://example.com/c",
      "2024-01-01T00:00:30Z", "application/http; msgtype=response",
      WarcAlgos.httpResponsePayload(200, "text/html; charset=ISO-8859-1",
        "<html><body><p>charlie café</p></body></html>".getBytes("ISO-8859-1")))
    // a binary response: payload survives byte-exact, text stays null
    WarcAlgos.writeRecord(out, "response", "https://example.com/d.png",
      "2024-01-01T00:00:40Z", "application/http; msgtype=response",
      WarcAlgos.httpResponsePayload(200, "image/png",
        Array[Byte](0x89.toByte, 'P', 'N', 'G', 0, 1, 2, 3)))
    // a warcinfo record — carried through with its own type, not dropped
    WarcAlgos.writeRecord(out, "warcinfo", "", "2024-01-01T00:00:00Z",
      "application/warc-fields", "software: graft-test\r\n".getBytes("UTF-8"))
    out.close()
  }

  private def writeGarbageFile(dir: Path): Unit = {
    val out = new java.io.FileOutputStream(dir.resolve("crawl-01.warc").toFile)
    // garbage before the first record — must quarantine then resync
    out.write("NOT A WARC\r\njunk line\r\n".getBytes("UTF-8"))
    WarcAlgos.writeRecord(out, "conversion", "https://example.com/e",
      "2024-01-01T00:00:50Z", "text/plain", "echo body".getBytes("UTF-8"))
    // a record with no Content-Length — quarantined, resyncs to the next
    out.write(("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: https://example.com/bad\r\n\r\n").getBytes("UTF-8"))
    WarcAlgos.writeRecord(out, "conversion", "https://example.com/f",
      "2024-01-01T00:01:00Z", "text/plain", "foxtrot body".getBytes("UTF-8"))
    // truncated payload at EOF — a crashed crawler's final record
    out.write(("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: https://example.com/trunc\r\n" +
      "Content-Type: text/plain\r\nContent-Length: 100000\r\n\r\nonly ten b").getBytes("UTF-8"))
    out.close()
  }

  test("parses conversion + response records, plain and gzipped identically") {
    for (gzip <- Seq(false, true)) {
      val dir = Files.createTempDirectory("graft_warc")
      writeFixture(dir, gzip)
      val (rows, bad) = Warc.read(spark, dir.toString)
      val got = rows.orderBy("url")
        .select("url", "warc_type", "mime", "charset", "http_status", "text", "fetch_epoch")
        .collect()
      assert(bad.count() == 0)
      assert(got.length == 5)
      val byUrl = got.map(r => r.getString(0) -> r).toMap
      assert(byUrl("https://example.com/a").getString(5) == "alpha body text")
      assert(byUrl("https://example.com/a").getString(1) == "conversion")
      assert(byUrl("https://example.com/a").getLong(6) == 1704067210L)
      assert(byUrl("https://example.com/b").getString(2) == "text/html")
      assert(byUrl("https://example.com/b").getInt(4) == 200)
      assert(byUrl("https://example.com/b").getString(5).contains("bravo café"))
      // latin-1 sniffed from the HTTP header, é decoded correctly
      assert(byUrl("https://example.com/c").getString(3).equalsIgnoreCase("ISO-8859-1"))
      assert(byUrl("https://example.com/c").getString(5).contains("charlie café"))
      assert(byUrl("https://example.com/d.png").getString(5) == null)
      assert(byUrl("").getString(1) == "warcinfo")
    }
  }

  test("binary payload survives byte-exact") {
    val dir = Files.createTempDirectory("graft_warc_bin")
    writeFixture(dir, gzip = false)
    val png = Warc.read(spark, dir.toString)._1
      .where(col("url") === "https://example.com/d.png")
      .select("payload").as[Array[Byte]].collect().head
    assert(png.toSeq == Seq[Byte](0x89.toByte, 'P', 'N', 'G', 0, 1, 2, 3))
  }

  test("garbage, missing length and truncation quarantine with resync — nothing drops") {
    val dir = Files.createTempDirectory("graft_warc_bad")
    writeGarbageFile(dir)
    val (rows, bad) = Warc.read(spark, dir.toString)
    assert(rows.select("url").as[String].collect().sorted.toSeq ==
      Seq("https://example.com/e", "https://example.com/f"))
    val reasons = bad.select("reason").as[String].collect().sorted.toSeq
    assert(reasons == Seq("missing_content_length", "not_a_warc_record", "truncated_payload"))
    val prefix = bad.where(col("reason") === "not_a_warc_record")
      .select("raw_prefix").as[Array[Byte]].collect().head
    assert(new String(prefix, "UTF-8").contains("NOT A WARC"))
    val stats = Warc.readStats(spark, dir.toString).collect().head
    assert((stats.getLong(0), stats.getLong(1), stats.getLong(2)) == ((5L, 2L, 3L)))
  }

  test("one parse per action: read sides, stats and tagged all single-pass") {
    val dir = Files.createTempDirectory("graft_warc_once")
    writeFixture(dir, gzip = false)
    writeGarbageFile(dir)
    val nFiles = 2L
    def parses(action: => Unit): Long = {
      val before = WarcAlgos.filesParsed.get()
      action
      WarcAlgos.filesParsed.get() - before
    }
    val (rows, bad) = Warc.read(spark, dir.toString)
    assert(parses(rows.count()) == nFiles, "ok side must parse each file once")
    assert(parses(bad.count()) == nFiles, "bad side must parse each file once")
    assert(parses(Warc.readStats(spark, dir.toString).collect()) == nFiles,
      "stats must be ONE pass, not one per side")
    // the tagged primitive: both sides + stats derivable from one action
    val tagged = Warc.readTagged(spark, dir.toString)
    val agg = new Array[org.apache.spark.sql.Row](1)
    assert(parses { agg(0) = tagged.agg(
        count(lit(1)), count(when(col("ok"), 1)), count(when(!col("ok"), 1))).collect().head
      } == nFiles)
    assert((agg(0).getLong(0), agg(0).getLong(1), agg(0).getLong(2)) == ((10L, 7L, 3L)))
  }

  test("e2e: WARC response chains into extractHtml + fixEncoding") {
    val dir = Files.createTempDirectory("graft_warc_e2e")
    val out = new java.io.FileOutputStream(dir.resolve("c.warc").toFile)
    WarcAlgos.writeRecord(out, "response", "https://example.com/page",
      "2024-01-01T00:00:00Z", "application/http; msgtype=response",
      WarcAlgos.httpResponsePayload(200, "text/html; charset=utf-8",
        ("<html><head><script>no()</script></head><body><h1>Title</h1>" +
          "<p>Donât panic body</p></body></html>").getBytes("UTF-8")))
    out.close()
    val (rows, _) = Warc.read(spark, dir.toString)
    val cleaned = rows.where(col("mime") === "text/html")
      .select(col("url"),
        graft.pipeline.Text.fixEncoding(
          graft.pipeline.Text.extractHtml(col("text"), maxLinkDensity = 0.5)).as("t"))
      .as[(String, String)].collect().head
    assert(cleaned._1 == "https://example.com/page")
    assert(cleaned._2.contains("Title"))
    assert(cleaned._2.contains("Don't panic body"))
    assert(!cleaned._2.contains("script"))
  }
}
