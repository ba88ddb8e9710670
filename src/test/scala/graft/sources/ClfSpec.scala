package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** CLF ingest: field-exact parsing of common and combined forms, the
 * quarantine contract (bad shape AND bad timestamp), dash/null
 * semantics, and one-pass telemetry. */
class ClfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def write(lines: String*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_clf").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "access.log"), lines.mkString("\n") + "\n")
    dir
  }

  private val common =
    """127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326"""
  private val combined =
    """10.1.2.3 - - [01/Jan/2024:00:00:07 +0000] "POST /submit HTTP/1.1" 404 - "http://ref.example/x" "Mozilla/5.0""""

  test("common and combined forms parse field-exact, with epoch timestamps") {
    val (rows, bad) = Clf.read(spark, write(common, combined))
    assert(bad.count() == 0)
    val byHost = rows.collect().map(r => r.getAs[String]("host") -> r).toMap
    val a = byHost("127.0.0.1")
    assert(a.getAs[String]("authuser") == "frank" && a.getAs[String]("ident") == null)
    assert(a.getAs[String]("method") == "GET" && a.getAs[String]("path") == "/apache_pb.gif")
    assert(a.getAs[String]("protocol") == "HTTP/1.0" && a.getAs[Int]("status") == 200)
    assert(a.getAs[Long]("bytes") == 2326L)
    // 2000-10-10T13:55:36-07:00 == 2000-10-10T20:55:36Z
    assert(a.getAs[Long]("ts_epoch") ==
      java.time.OffsetDateTime.parse("2000-10-10T13:55:36-07:00").toEpochSecond)
    assert(a.getAs[String]("referer") == null && a.getAs[String]("user_agent") == null)
    val b = byHost("10.1.2.3")
    assert(b.getAs[Int]("status") == 404 && b.isNullAt(b.fieldIndex("bytes")))
    assert(b.getAs[String]("referer") == "http://ref.example/x")
    assert(b.getAs[String]("user_agent") == "Mozilla/5.0")
    assert(b.getAs[Long]("ts_epoch") == 1704067207L)
  }

  test("bad shape and bad timestamp both quarantine verbatim") {
    val badShape = "not a log line at all"
    val badQuote = """1.2.3.4 - - [01/Jan/2024:00:00:07 +0000] "GET /x HTTP/1.1" 200"""
    val badTs =
      """1.2.3.4 - - [99/Zzz/2024:99:99:99 +0000] "GET /x HTTP/1.1" 200 10"""
    val (rows, bad) = Clf.read(spark, write(common, badShape, badQuote, badTs))
    assert(rows.count() == 1)
    assert(bad.as[String].collect().toSet == Set(badShape, badQuote, badTs))
  }

  test("readStats counts ok and corrupt in one pass") {
    val dir = write(common, combined, "garbage",
      """9.9.9.9 - - [99/Zzz/2024:00:00:00 +0000] "GET /x HTTP/1.1" 200 1""")
    val r = Clf.readStats(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 2L, 2L)))
  }
}
