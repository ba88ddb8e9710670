package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("parse: groups, multi-agent runs, comments, empty disallow, unknown fields") {
    val txt =
      """# global
        |User-agent: *
        |Disallow: /private
        |Allow: /private/ok   # inline comment
        |Crawl-delay: 10
        |
        |User-agent: GoodBot
        |User-agent: OtherBot
        |Disallow:
        |Allow: /only-good
        |
        |User-agent: BadBot
        |Disallow: /
        |""".stripMargin
    val rules = Robots.parse(txt)
    assert(rules.map(r => (r.agent, r.allow, r.pattern)) == Seq(
      ("*", false, "/private"),
      ("*", true, "/private/ok"),
      ("goodbot", true, "/only-good"),   // empty disallow emits nothing
      ("otherbot", true, "/only-good"),  // rule attaches to BOTH agents
      ("badbot", false, "/")))
  }

  test("parse: rules before any user-agent attach to *; new group resets agents") {
    val rules = Robots.parse("Disallow: /a\nUser-agent: x\nDisallow: /b\nUser-agent: y\nDisallow: /c")
    assert(rules.map(r => (r.agent, r.pattern)) == Seq(
      ("*", "/a"), ("x", "/b"), ("y", "/c"))) // y's group does NOT include x
  }

  test("pattern wildcards: * spans, $ anchors, plain patterns are prefixes") {
    // evaluate through the engine exactly as isAllowed does
    val rules = Robots.parseDf(Seq(
      ("h", "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*x\nDisallow: /plain"))
      .toDF("host", "txt"), col("host"), col("txt"))
    val urls = Seq(
      "https://h/a/b/c.pdf",     // *.pdf$ blocks any depth
      "https://h/a/b/c.pdfx",    // $ anchor: NOT blocked
      "https://h/tmp123x",       // * spans
      "https://h/plainer",       // prefix semantics: blocked
      "https://h/ok").toDF("u")
    val got = Robots.isAllowed(rules, urls, col("u"), "anybot")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("https://h/a/b/c.pdf") == false)
    assert(got("https://h/a/b/c.pdfx") == true)
    assert(got("https://h/tmp123x") == false)
    assert(got("https://h/plainer") == false)
    assert(got("https://h/ok") == true)
  }

  test("precedence: longest match wins, allow beats disallow on ties") {
    val rules = Robots.parseDf(Seq(
      ("h", "User-agent: *\nDisallow: /dir\nAllow: /dir/open\nDisallow: /tie\nAllow: /tie"))
      .toDF("host", "txt"), col("host"), col("txt"))
    val got = Robots.isAllowed(rules,
        Seq("https://h/dir/x", "https://h/dir/open/x", "https://h/tie/z").toDF("u"),
        col("u"), "bot")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("https://h/dir/x") == false)       // /dir wins
    assert(got("https://h/dir/open/x") == true)   // longer allow overrides
    assert(got("https://h/tie/z") == true)        // equal length: allow wins
  }

  test("root URL with no path evaluates as '/' (RFC 9309 2.2.2)") {
    val rules = Robots.parseDf(Seq(
      ("closed", "User-agent: *\nDisallow: /"),
      ("open", "User-agent: *\nDisallow: /private"))
      .toDF("host", "txt"), col("host"), col("txt"))
    val got = Robots.isAllowed(rules,
        Seq("https://closed", "https://closed/", "https://open").toDF("u"),
        col("u"), "bot")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // 'Disallow: /' blocks the bare-root URL too — an empty extracted
    // path must match as "/" rather than prefix-matching nothing
    assert(got("https://closed") == false)
    assert(got("https://closed/") == false)
    assert(got("https://open") == true)
  }

  test("group selection: exact agent beats *, missing host allows") {
    val rules = Robots.parseDf(Seq(
      ("h1", "User-agent: *\nDisallow: /\nUser-agent: mybot\nDisallow: /only-this"),
      ("h2", "User-agent: *\nDisallow: /all"))
      .toDF("host", "txt"), col("host"), col("txt"))
    val urls = Seq(
      "https://h1/anything",   // mybot group applies, not the * catch-all
      "https://h1/only-this/x",
      "https://h2/all/x",      // falls to * group
      "https://h3/no-robots").toDF("u")
    val got = Robots.isAllowed(rules, urls, col("u"), "MyBot")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("https://h1/anything") == true)
    assert(got("https://h1/only-this/x") == false)
    assert(got("https://h2/all/x") == false)
    assert(got("https://h3/no-robots") == true) // no robots.txt → fetchable
  }

  test("robots fuzz: 300 random bodies parse totally with sane rules") {
    val rng = new scala.util.Random(0xBEEF)
    val lines = Array(
      "User-agent: *", "User-agent: bot1", "user-AGENT: Bot2", "User-agent:",
      "Disallow: /a", "Allow: /a/b", "Disallow:", "Allow:", "Disallow: /*.pdf$",
      "Crawl-delay: 5", "Sitemap: https://x/s.xml", "# comment", "",
      ":", ":::", "no colon here", "Disallow : /spaced", "Garbage: value")
    (1 to 300).foreach { _ =>
      val body = (0 until 20).map(_ => lines(rng.nextInt(lines.length))).mkString("\n")
      val rules = Robots.parse(body)
      rules.foreach { r =>
        assert(r.pattern.nonEmpty)         // empty values never emit rules
        assert(r.agent == r.agent.toLowerCase(java.util.Locale.ROOT))
        if (r.wild) assert(r.regex.startsWith("^")) // anchored translation
      }
    }
  }

  test("sitemaps: urlset + sitemapindex entries, lastmod optional, entities decode") {
    val xml =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>https://e.com/a?x=1&amp;y=2</loc><lastmod>2024-01-05</lastmod></url>
        |  <url><loc>
        |    https://e.com/b
        |  </loc></url>
        |  <url><priority>0.5</priority></url>
        |</urlset>""".stripMargin
    val idx =
      """<sitemapindex><sitemap><loc>https://e.com/s1.xml</loc>
        |<lastmod>2024-02-01</lastmod></sitemap></sitemapindex>""".stripMargin
    val got = Seq(Tuple1(xml), Tuple1(idx)).toDF("x")
      .select(explode(Sitemaps.entries(col("x"))).as("e"))
      .select(col("e.loc"), col("e.lastmod"))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(
      ("https://e.com/a?x=1&y=2", "2024-01-05"), // entity decoded, lastmod kept
      ("https://e.com/b", ""),                   // whitespace trimmed, no lastmod
      ("https://e.com/s1.xml", "2024-02-01")))   // index entries too; loc-less dropped
  }

  test("crawl-delay: per-group extraction, fractional seconds, bounds") {
    val body =
      """User-agent: graftbot
        |Crawl-delay: 2.5
        |Disallow: /x
        |User-agent: *
        |Crawl-delay: 10
        |User-agent: slowbot
        |Crawl-delay: 999999
        |User-agent: junkbot
        |Crawl-delay: soon""".stripMargin
    val got = Robots.parseCrawlDelays(body).toMap
    assert(got === Map("graftbot" -> 2500L, "*" -> 10000L))
  }

  test("crawlDelaysDf: exact-agent group beats *, absent hosts absent") {
    val bodies = Seq(
      ("a.com", "User-agent: graftbot\nCrawl-delay: 2\nUser-agent: *\nCrawl-delay: 9"),
      ("b.com", "User-agent: *\nCrawl-delay: 4"),
      ("c.com", "User-agent: otherbot\nCrawl-delay: 1"),
      ("d.com", "User-agent: *\nDisallow: /")).toDF("h", "txt")
    val got = Robots.crawlDelaysDf(bodies, col("h"), col("txt"), "GraftBot")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a.com" -> 2000L, "b.com" -> 4000L))
  }

  test("crawl delays feed the politeness scheduler end to end") {
    val bodies = Seq(
      ("a.com", "User-agent: *\nCrawl-delay: 2")).toDF("h", "txt")
    val delays = Robots.crawlDelaysDf(bodies, col("h"), col("txt"), "graftbot")
    val frontier = Seq(("https://a.com/1", 2.0), ("https://a.com/2", 1.0),
      ("https://z.com/q", 1.0)).toDF("url", "pri")
    val got = Frontier.crawlSchedule(frontier, col("url"), col("pri"),
        delays, col("host"), col("delay_ms"), defaultDelayMs = 500L,
        horizonMs = 10000L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got("https://a.com/1") === 0L)
    assert(got("https://a.com/2") === 2000L)  // robots-declared 2 s
    assert(got("https://z.com/q") === 0L)     // default host, rank 1
  }

  test("parseSitemapUrls: case-insensitive field, comments, dupes, group-independent") {
    val txt =
      """User-agent: *
        |Disallow: /x
        |Sitemap: https://a.com/sitemap.xml # primary
        | sitemap :	https://a.com/News.xml
        |SITEMAP: https://cdn.example/idx.xml
        |Sitemap: https://a.com/sitemap.xml
        |Sitemap:
        |NotSitemap: https://nope.example/s.xml
        |""".stripMargin
    assert(Robots.parseSitemapUrls(txt) == Seq(
      "https://a.com/sitemap.xml", "https://a.com/News.xml",
      "https://cdn.example/idx.xml"))
    assert(Robots.parseSitemapUrls("") == Seq.empty)
    assert(Robots.parseSitemapUrls("User-agent: *\nDisallow: /") == Seq.empty)
    // '#' inside the URL value is part of the URL; only line-start or
    // whitespace-preceded '#' opens a comment
    assert(Robots.parseSitemapUrls(
      "Sitemap: https://a.com/s.xml#frag\nSitemap: https://b.com/t.xml #tail\n# all comment\nSitemap: https://c.com/u.xml#d # note") ==
      Seq("https://a.com/s.xml#frag", "https://b.com/t.xml",
        "https://c.com/u.xml#d"))
    // rfc9309Comments = true: spec-conformant anywhere-'#' truncation —
    // what a Google-style fetcher would record for the same body
    assert(Robots.parseSitemapUrls(
      "Sitemap: https://a.com/s.xml#frag\nSitemap: https://b.com/t.xml #tail\n# all comment\nSitemap: https://c.com/u.xml#d # note",
      rfc9309Comments = true) ==
      Seq("https://a.com/s.xml", "https://b.com/t.xml", "https://c.com/u.xml"))
  }

  test("sitemapsDf + discoverSitemapEntries: the full discovery chain") {
    val robots = Seq(
      ("a.com", "Sitemap: https://a.com/s1.xml\nSitemap: https://a.com/s2.xml"),
      ("b.com", "User-agent: *\nDisallow: /\nsitemap: https://b.com/sm.xml"),
      ("c.com", "User-agent: *\nAllow: /")).toDF("h", "t")
    val declared = Robots.sitemapsDf(robots, col("h"), col("t"))
      .as[(String, String)].collect().toSet
    assert(declared == Set(
      ("a.com", "https://a.com/s1.xml"), ("a.com", "https://a.com/s2.xml"),
      ("b.com", "https://b.com/sm.xml")))
    // fetched bodies: s1 has two urls, sm has one, s2 never fetched
    val fetched = Seq(
      ("https://a.com/s1.xml",
        "<urlset><url><loc>https://a.com/p1</loc><lastmod>2026-01-02</lastmod></url>" +
          "<url><loc>https://a.com/p2</loc></url></urlset>"),
      ("https://b.com/sm.xml",
        "<urlset><url><loc>https://b.com/only</loc></url></urlset>"),
      ("https://unrelated.example/x.xml",
        "<urlset><url><loc>https://unrelated.example/u</loc></url></urlset>"))
      .toDF("u", "x")
    val got = Robots.discoverSitemapEntries(robots, col("h"), col("t"),
        fetched, col("u"), col("x"))
      .as[(String, String, String, String)].collect().toSet
    assert(got == Set(
      ("a.com", "https://a.com/s1.xml", "https://a.com/p1", "2026-01-02"),
      ("a.com", "https://a.com/s1.xml", "https://a.com/p2", ""),
      ("b.com", "https://b.com/sm.xml", "https://b.com/only", "")))
  }
}
