package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crawl-ingest normalization: URL canonicalization and encoding repair —
 * the documented contracts, edge cases, and SQL registration. */
class IngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(u: String): String =
    Seq(Tuple1(u)).toDF("u").select(Text.urlCanonicalize(col("u")).as("c"))
      .collect()(0).getString(0)

  private def fix(t: String): String =
    Seq(Tuple1(t)).toDF("t").select(Text.fixEncoding(col("t")).as("f"))
      .collect()(0).getString(0)

  test("url canonicalization: scheme/host case, ports, fragments, tracking params") {
    assert(canon("HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&q=1&fbclid=z#frag")
      == "https://www.example.com/A/b?q=1")
    assert(canon("http://Host.com:80/") == "http://host.com")
    assert(canon("http://host.com:8080/x/") == "http://host.com:8080/x")
    // path and query stay case-sensitive; non-default port kept
    assert(canon("https://H.io/CaseSensitive?Q=V") == "https://h.io/CaseSensitive?Q=V")
    // all params tracking → '?' drops; '&'-order of survivors preserved
    assert(canon("https://h.io/p?utm_a=1&UTM_b=2&gclid=3") == "https://h.io/p")
    assert(canon("https://h.io/p?b=2&a=1&utm_x=0") == "https://h.io/p?b=2&a=1")
    // no scheme → trimmed passthrough, no guessing
    assert(canon("  example.com/path  ") == "example.com/path")
    assert(canon("not a url") == "not a url")
    assert(canon("") == "")
  }

  test("encoding repair: latin-1 and cp1252 mojibake, raw smart punctuation") {
    // latin-1 double-decode of ’ “ ” – … (the â + C1-control sequences)
    assert(fix("Don\u00E2\u0080\u0099t") == "Don't")
    assert(fix("\u00E2\u0080\u009Cq\u00E2\u0080\u009D") == "\"q\"")
    assert(fix("a \u00E2\u0080\u0093 b \u00E2\u0080\u00A6") == "a - b ...")
    // cp1252 double-decode (the familiar â€™ sequences)
    assert(fix("It\u00E2\u20AC\u2122s \u00E2\u20AC\u0153ok\u00E2\u0080\u009D") == "It's \"ok\"")
    // accented-letter mojibake repairs to the real letter
    assert(fix("cafÃ© maÃ±ana") == "café mañana")
    // raw unicode punctuation normalizes to ASCII
    assert(fix("‘a’ “b” – — …") == "'a' \"b\" - - ...")
    // NBSP (raw and mojibake) → space; zero-widths and BOM vanish
    assert(fix("a b c\u00C2\u00A0d") == "a b c d")
    assert(fix("\uFEFFx\u200By\u200Cz") == "xyz")
    // clean text is untouched
    assert(fix("plain ascii, nothing to fix.") == "plain ascii, nothing to fix.")
    assert(fix("") == "")
  }

  test("both are SQL-callable and fuse with the ingest tier") {
    val r = spark.sql(
      """SELECT url_canonicalize('HTTP://A.B:80/x/?utm_s=1&k=2#f') AS u,
        |       fix_encoding('a\u00E2\u0080\u0099b') AS t""".stripMargin).collect()(0)
    assert(r.getString(0) == "http://a.b/x?k=2")
    assert(r.getString(1) == "a'b")
    // chains inside one codegen stage with the rest of the front door
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq((1L, "<p>cafÃ©</p>")).toDF("id", "html")
        .select(col("id"),
          Text.cleanText(Text.fixEncoding(Text.extractHtml(col("html")))).as("text"))
      assert(df.collect()(0).getString(1) == "café")
    } finally prev.foreach(spark.conf.set("spark.sql.codegen.fallback", _))
  }

  test("unicode normalization: NFC unifies compositions, NFKC folds compatibility") {
    val composed = "caf\u00e9"           // é as one code point
    val decomposed = "cafe\u0301"        // e + combining acute
    val compat = "\uFB01le \uFF11\uFF12"   // fi ligature + full-width digits
    val d = Seq((1L, composed), (2L, decomposed), (3L, compat)).toDF("doc_id", "text")
    val nfc = d.select(col("doc_id"), Text.normalizeUnicode(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(nfc(1L) == composed && nfc(2L) == composed) // both collapse to NFC
    assert(nfc(3L) == compat)                          // NFC leaves compatibility alone
    val nfkc = d.select(Text.normalizeUnicode(col("text"), "NFKC").as("t"))
      .collect().map(_.getString(0))
    assert(nfkc(2) == "file 12")                       // ligature + digits folded
    // the dedup-key payoff: composed and decomposed forms of the same text
    // fingerprint identically only after normalization
    val deduped = Dedup.exact(
      d.select(col("doc_id"), Text.normalizeUnicode(col("text")).as("t")),
      col("doc_id"), col("t"))
    assert(deduped.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
    assert(Dedup.exact(d, col("doc_id"), col("text")).count() == 3) // without: missed
    // SQL-registered
    d.createOrReplaceTempView("graft_norm")
    assert(spark.sql("SELECT unicode_normalize(text, 'NFKC') FROM graft_norm WHERE doc_id = 3")
      .collect().head.getString(0) == "file 12")
    // null passes through
    assert(Seq(Tuple1(null: String)).toDF("t")
      .select(Text.normalizeUnicode(col("t"))).collect().head.isNullAt(0))
  }
}
