package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * WARC/WET crawl-archive ingest — the format raw web corpora (Common Crawl)
 * actually arrive in: length-prefixed WARC/1.x records (a CRLF-terminated
 * header block, a `Content-Length` octet payload, a blank-line trailer),
 * usually gzipped per record so the archive is a stream of concatenated
 * gzip members. `response` records carry a full HTTP message whose own
 * header block yields status / mime / charset; `conversion` (WET) records
 * carry extracted text directly.
 *
 * Quarantine contract matches [[Jsonl]]: a malformed record (garbage where
 * a version line should be, unparseable headers, missing Content-Length,
 * payload truncated by a crashed crawler) never silently drops — it lands
 * in the quarantine frame with a reason and a capped verbatim prefix, the
 * parser resyncs on the next `WARC/` version line, and [[readStats]] gives
 * one-pass telemetry.
 *
 * Scale: WARC is not line-splittable (records are length-prefixed and the
 * per-record gzip members of a .warc.gz defeat byte-range splits), so the
 * unit of parallelism is the FILE — exactly how Common Crawl shards its
 * dumps (~1 GB per file; a 100 TB crawl is ~100k files, far more than any
 * cluster's cores). Each task streams one file through a constant-memory
 * parser (`binaryFiles` hands a stream, not a byte array); payloads stay
 * binary-safe, text is decoded only for text-bearing mimes using the
 * charset sniffed from the HTTP headers (→ chain [[graft.pipeline.Text.fixEncoding]]
 * for the mojibake the sniff can't fix).
 */
object Warc {

  /** One well-formed record. `payload` is the HTTP BODY for `response`
   * records (status/mime/charset lifted into their own columns) and the
   * raw record payload otherwise; `text` is the charset-decoded payload
   * for text-bearing mimes, null for binary ones. `fetch_epoch` is
   * WARC-Date as epoch seconds (null when absent/unparseable). */
  case class WarcRow(
      file: String, offset: Long, record_id: String, warc_type: String,
      url: String, fetch_epoch: Option[Long], mime: String, charset: String,
      http_status: Option[Int], payload: Array[Byte], text: String)

  /** One malformed region: where it started, why it failed, and up to
   * `QuarantineCap` verbatim bytes so the operator can inspect it. */
  case class WarcBad(file: String, offset: Long, reason: String, raw_prefix: Array[Byte])

  private[sources] val QuarantineCap = 4096

  /** Every record of every archive — well-formed AND quarantined — from ONE
   * `binaryFiles` parse, tagged by `ok`. ok=true rows carry the [[WarcRow]]
   * fields; ok=false rows carry (reason, raw_prefix). This is the primitive
   * the other readers filter/aggregate over: a caller that needs both sides
   * in one job (split-and-route, stats alongside content) reads THIS frame
   * and each action decompresses + parses every archive exactly once — at
   * 100 TB of .warc.gz the parse is the job, so a second pass is a 2×. */
  case class WarcTagged(
      file: String, offset: Long, ok: Boolean, reason: String,
      record_id: String, warc_type: String, url: String, fetch_epoch: Option[Long],
      mime: String, charset: String, http_status: Option[Int],
      payload: Array[Byte], text: String, raw_prefix: Array[Byte])

  def readTagged(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        WarcAlgos.parseFile(file, pds.open()).map {
          case Right(r) => WarcTagged(r.file, r.offset, ok = true, null,
            r.record_id, r.warc_type, r.url, r.fetch_epoch, r.mime, r.charset,
            r.http_status, r.payload, r.text, null)
          case Left(b) => WarcTagged(b.file, b.offset, ok = false, b.reason,
            null, null, null, None, null, null, None, null, null, b.raw_prefix)
        }
      }.toDS().toDF()
  }

  /** (well-formed records, quarantined malformed regions) — filters over the
   * single-parse [[readTagged]] frame; an action on either side streams each
   * file through the parser once, no shuffle. */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val tagged = readTagged(spark, path)
    val rows = tagged.where(col("ok")).select(
      "file", "offset", "record_id", "warc_type", "url", "fetch_epoch",
      "mime", "charset", "http_status", "payload", "text")
    val bad = tagged.where(!col("ok"))
      .select(col("file"), col("offset"), col("reason"), col("raw_prefix"))
    (rows, bad)
  }

  /** Empty frame with [[read]]'s ok-side schema — lets config validation
   * (BatchConfig.validate) dry-resolve a WARC source without touching
   * any path. */
  def emptyFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[WarcRow].toDF()
  }

  /** Ingest telemetry in one pass: (total_records, ok_records,
   * quarantined_records) — an aggregate over the single-parse frame. */
  def readStats(spark: SparkSession, path: String): DataFrame =
    readTagged(spark, path).agg(
      count(lit(1)).as("total_records"),
      count(when(col("ok"), 1)).as("ok_records"),
      count(when(!col("ok"), 1)).as("quarantined_records"))
}

/** The streaming record parser — plain JVM code called once per file from
 * the executor task; no Spark types so it unit-tests without a session. */
object WarcAlgos {
  import Warc.{QuarantineCap, WarcBad, WarcRow}

  /** Files handed to [[parseFile]] in this JVM — the test hook behind the
   * one-parse-per-action contract (local mode shares the JVM, so a spec can
   * diff it around an action; a metrics-free counter, not used in planning). */
  val filesParsed = new java.util.concurrent.atomic.AtomicLong(0)

  /** Byte-counting stream so quarantine offsets refer to the (uncompressed)
   * record stream position. */
  private final class Counted(in: java.io.InputStream) extends java.io.InputStream {
    var pos: Long = 0L
    override def read(): Int = { val b = in.read(); if (b >= 0) pos += 1; b }
    override def read(buf: Array[Byte], off: Int, len: Int): Int = {
      val n = in.read(buf, off, len); if (n > 0) pos += n; n
    }
    override def close(): Unit = in.close()
  }

  /** Parse one WARC/WET file (plain or gzipped — sniffed from the magic
   * bytes; java's GZIPInputStream reads the concatenated per-record members
   * of a .warc.gz transparently). Streaming and constant-memory apart from
   * the current record's payload. */
  def parseFile(file: String, raw: java.io.InputStream): Iterator[Either[WarcBad, WarcRow]] = {
    filesParsed.incrementAndGet()
    val buffered = new java.io.BufferedInputStream(raw, 1 << 16)
    buffered.mark(2)
    val b0 = buffered.read(); val b1 = buffered.read()
    buffered.reset()
    val in = new Counted(
      if (b0 == 0x1f && b1 == 0x8b)
        new java.io.BufferedInputStream(new java.util.zip.GZIPInputStream(buffered, 1 << 16), 1 << 16)
      else buffered)

    new Iterator[Either[WarcBad, WarcRow]] {
      private var nextItem: Either[WarcBad, WarcRow] = null
      private var done = false
      // the resync loop may find the next version line while quarantining —
      // it parks here so the following next() starts from it, not the stream
      private var pendingVersion: String = null
      private var pendingVersionOffset = 0L

      // `done` means "don't read the stream again" — parseOne can set it
      // WHILE returning a final item (truncated payload at EOF), so the
      // end-of-iteration signal is the parked item, never `done` itself
      private def advance(): Unit = {
        if (nextItem != null) return
        if (done) return
        nextItem = parseOne()
        if (done || nextItem == null) { done = true; in.close() }
      }
      override def hasNext: Boolean = { advance(); nextItem != null }
      override def next(): Either[WarcBad, WarcRow] = {
        advance()
        if (nextItem == null) throw new NoSuchElementException("end of WARC stream")
        val r = nextItem; nextItem = null; r
      }

      /** null at clean EOF. */
      private def parseOne(): Either[WarcBad, WarcRow] = {
        // version line: either parked by a previous resync or read fresh
        var version: String = null
        var start = 0L
        if (pendingVersion != null) {
          version = pendingVersion; start = pendingVersionOffset
          pendingVersion = null
        } else {
          var line = readLine(in)
          // records are separated by a blank-line trailer; skip those
          while (line != null && line.isEmpty) line = readLine(in)
          if (line == null) return null
          start = in.pos - line.length
          if (!line.startsWith("WARC/")) return quarantineAndResync(start, "not_a_warc_record", line)
          version = line
        }
        // header block up to the blank line
        val headers = new java.util.HashMap[String, String]()
        var line = readLine(in)
        while (line != null && line.nonEmpty) {
          val colonAt = line.indexOf(':')
          if (colonAt <= 0) return quarantineAndResync(start, "malformed_header", version + "\r\n" + line)
          headers.put(
            line.substring(0, colonAt).trim.toLowerCase(java.util.Locale.ROOT),
            line.substring(colonAt + 1).trim)
          line = readLine(in)
        }
        if (line == null) return Left(WarcBad(file, start, "truncated_headers", capBytes(version.getBytes("UTF-8"))))
        val lenStr = headers.get("content-length")
        val len = try { if (lenStr == null) -1L else lenStr.toLong } catch { case _: NumberFormatException => -1L }
        if (len < 0) return quarantineAndResync(start, "missing_content_length", version)
        // payload: exactly len octets
        val payload = new Array[Byte](math.min(len, Int.MaxValue.toLong).toInt)
        var filled = 0
        var n = 0
        while (filled < payload.length && n >= 0) {
          n = in.read(payload, filled, payload.length - filled)
          if (n > 0) filled += n
        }
        if (filled < payload.length) {
          done = true // truncated payload IS the end of the stream
          return Left(WarcBad(file, start, "truncated_payload", capBytes(java.util.Arrays.copyOf(payload, filled))))
        }
        Right(toRow(file, start, headers, payload))
      }

      /** Quarantine from `start`, scanning forward line-by-line for the next
       * `WARC/` version line (parked for the next call). Capped capture. */
      private def quarantineAndResync(start: Long, reason: String, firstLine: String): Either[WarcBad, WarcRow] = {
        val captured = new java.io.ByteArrayOutputStream()
        captured.write(firstLine.getBytes("UTF-8"))
        var line = readLine(in)
        while (line != null && !line.startsWith("WARC/")) {
          if (captured.size() < QuarantineCap) {
            captured.write('\n'); captured.write(line.getBytes("UTF-8"))
          }
          line = readLine(in)
        }
        if (line != null) { pendingVersion = line; pendingVersionOffset = in.pos - line.length }
        Left(WarcBad(file, start, reason, capBytes(captured.toByteArray)))
      }
    }
  }

  private def capBytes(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length <= QuarantineCap) bytes else java.util.Arrays.copyOf(bytes, QuarantineCap)

  private def toRow(
      file: String, start: Long,
      headers: java.util.HashMap[String, String], payload: Array[Byte]): WarcRow = {
    val warcType = Option(headers.get("warc-type")).getOrElse("")
    val rawUri = Option(headers.get("warc-target-uri")).getOrElse("")
    // the WARC 1.0 spec wrapped the URI in <>; 1.1 dropped it — accept both
    val url = if (rawUri.startsWith("<") && rawUri.endsWith(">") && rawUri.length >= 2)
      rawUri.substring(1, rawUri.length - 1) else rawUri
    val epoch = try {
      Option(headers.get("warc-date")).map(d => java.time.Instant.parse(d).getEpochSecond)
    } catch { case _: java.time.format.DateTimeParseException => None }
    val recordId = Option(headers.get("warc-record-id")).getOrElse("")
    val recordCt = Option(headers.get("content-type")).getOrElse("")

    if (warcType == "response" && recordCt.toLowerCase(java.util.Locale.ROOT).startsWith("application/http")) {
      val (status, mime, charset, body) = parseHttp(payload)
      WarcRow(file, start, recordId, warcType, url, epoch, mime, charset,
        status, body, decodeText(mime, charset, body))
    } else {
      val (mime, charset) = splitContentType(recordCt)
      WarcRow(file, start, recordId, warcType, url, epoch, mime, charset,
        None, payload, decodeText(mime, charset, payload))
    }
  }

  /** "type/subtype; charset=x" → (mime lowercased, charset or ""). */
  private def splitContentType(ct: String): (String, String) = {
    val semi = ct.indexOf(';')
    val mime = (if (semi < 0) ct else ct.substring(0, semi)).trim.toLowerCase(java.util.Locale.ROOT)
    var charset = ""
    if (semi >= 0) ct.substring(semi + 1).split(";").foreach { p =>
      val eq = p.indexOf('=')
      if (eq > 0 && p.substring(0, eq).trim.equalsIgnoreCase("charset"))
        charset = p.substring(eq + 1).trim.stripPrefix("\"").stripSuffix("\"")
    }
    (mime, charset)
  }

  private def textBearing(mime: String): Boolean =
    mime.startsWith("text/") || mime == "application/json" ||
      mime == "application/xml" || mime.endsWith("+xml") || mime.endsWith("+json")

  /** Lenient decode (bad sequences → U+FFFD, never a throw); unknown or
   * missing charset falls back to UTF-8 — the crawl default. */
  private def decodeText(mime: String, charset: String, body: Array[Byte]): String = {
    if (!textBearing(mime)) return null
    val cs = try {
      if (charset.isEmpty) java.nio.charset.StandardCharsets.UTF_8
      else java.nio.charset.Charset.forName(charset)
    } catch { case _: Exception => java.nio.charset.StandardCharsets.UTF_8 }
    new String(body, cs)
  }

  /** HTTP response payload → (status, mime, charset, body after the first
   * blank line). A payload with no parseable status line comes back whole
   * as the body with null status — tolerated, not quarantined (the WARC
   * framing was sound; the inner HTTP is the crawler's problem). */
  private def parseHttp(payload: Array[Byte]): (Option[Int], String, String, Array[Byte]) = {
    val headerEnd = indexOfDoubleCrlf(payload)
    if (headerEnd < 0) return (None, "", "", payload)
    val head = new String(payload, 0, headerEnd, java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = head.split("\r\n")
    if (lines.isEmpty || !lines(0).startsWith("HTTP/")) return (None, "", "", payload)
    val statusParts = lines(0).split(" ", 3)
    val status = try { if (statusParts.length >= 2) Some(statusParts(1).toInt) else None }
                 catch { case _: NumberFormatException => None }
    var mime = ""; var charset = ""
    lines.drop(1).foreach { l =>
      val colonAt = l.indexOf(':')
      if (colonAt > 0 && l.substring(0, colonAt).trim.equalsIgnoreCase("content-type")) {
        val (m, c) = splitContentType(l.substring(colonAt + 1))
        mime = m; charset = c
      }
    }
    val body = java.util.Arrays.copyOfRange(payload, headerEnd + 4, payload.length)
    (status, mime, charset, body)
  }

  private def indexOfDoubleCrlf(bytes: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < bytes.length) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n' && bytes(i + 2) == '\r' && bytes(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** CRLF- (or bare-LF-) terminated line as a string, null at EOF. Header
   * lines are ASCII per spec; ISO-8859-1 keeps garbage bytes inspectable. */
  private def readLine(in: java.io.InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(128)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') { buf.write(b); b = in.read() }
    val arr = buf.toByteArray
    val len = if (arr.nonEmpty && arr(arr.length - 1) == '\r') arr.length - 1 else arr.length
    new String(arr, 0, len, java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  // ----------------------------------------------------------- fixture writer

  /** Serialize one WARC record (the writer half, used by fixtures and by
   * exports): headers + Content-Length framing + blank-line trailer. */
  def writeRecord(
      out: java.io.OutputStream, warcType: String, url: String, date: String,
      contentType: String, payload: Array[Byte], recordId: String = ""): Unit = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    if (url.nonEmpty) sb.append("WARC-Target-URI: ").append(url).append("\r\n")
    if (date.nonEmpty) sb.append("WARC-Date: ").append(date).append("\r\n")
    if (recordId.nonEmpty) sb.append("WARC-Record-ID: ").append(recordId).append("\r\n")
    if (contentType.nonEmpty) sb.append("Content-Type: ").append(contentType).append("\r\n")
    sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    out.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
  }

  /** An HTTP/1.1 response payload for a `response` record. */
  def httpResponsePayload(status: Int, contentType: String, body: Array[Byte]): Array[Byte] = {
    val head = s"HTTP/1.1 $status OK\r\nContent-Type: $contentType\r\nContent-Length: ${body.length}\r\n\r\n"
    val out = new java.io.ByteArrayOutputStream(head.length + body.length)
    out.write(head.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    out.write(body)
    out.toByteArray
  }
}
