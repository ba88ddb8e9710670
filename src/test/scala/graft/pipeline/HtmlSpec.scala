package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HTML → text extraction: the state-machine contract HtmlAlgos documents,
 * pinned case by case — raw-text element skipping, comments, entities,
 * block boundaries, inline-tag removal, link-density boilerplate cut, and
 * the degenerate tag-soup inputs every crawl corpus contains. */
class HtmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ex(html: String, maxLinkDensity: Double = 1.0): String = {
    val r = Seq(Tuple1(html)).toDF("h")
      .select(Text.extractHtml(col("h"), maxLinkDensity).as("t"))
      .collect()(0)
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("block tags become newlines, inline tags vanish, words stay joined") {
    assert(ex("<p>one</p><p>two</p>") == "one\ntwo")
    assert(ex("a<b>b</b>c") == "abc")
    assert(ex("<div>x<span>y</span></div><div>z</div>") == "xy\nz")
    assert(ex("line<br>break") == "line\nbreak")
    assert(ex("<h1>Title</h1>body text") == "Title\nbody text")
    // raw newlines in source HTML are whitespace inside a block, not breaks
    assert(ex("<p>one\ntwo</p>") == "one two")
  }

  test("script/style raw text is removed entirely, markup inside ignored") {
    assert(ex("""a<script>var x = "<p>no</p>";</script>b""") == "ab")
    assert(ex("a<style>p { color: red }</style>b") == "ab")
    assert(ex("a<SCRIPT>x</SCRIPT>b") == "ab")
    // unterminated raw text swallows the rest; a name PREFIX is not a match
    assert(ex("a<script>forever") == "a")
    assert(ex("<scripty>not raw</scripty>x") == "not rawx")
  }

  test("comments are removed, unterminated to end of input") {
    assert(ex("a<!-- <p>gone</p> -->b") == "ab")
    assert(ex("a<!-- no end") == "a")
  }

  test("entities decode; unknown or malformed keep their literal ampersand") {
    assert(ex("Tom &amp; Jerry &lt;3 &#65;&#x42;C") == "Tom & Jerry <3 ABC")
    assert(ex("a&nbsp;b") == "a b")
    assert(ex("AT&T and R&amp;D") == "AT&T and R&D")
    assert(ex("&unknown; &amp &#xZZ; &#0; trailing&") ==
      "&unknown; &amp &#xZZ; &#0; trailing&")
    // decoded '<' is text, never re-parsed as markup
    assert(ex("&lt;p&gt;literal&lt;/p&gt;") == "<p>literal</p>")
  }

  test("tag soup: bare '<', unterminated tags, attribute noise") {
    assert(ex("1 < 2 and 2 > 1") == "1 < 2 and 2 > 1")
    assert(ex("a<p") == "a")
    assert(ex("""<a href="x" class="y">link</a> text""") == "link text")
    assert(ex("") == "")
    assert(ex("   \n\t  ") == "")
    assert(ex(null) == null)
  }

  test("literal '<' before a digit is text, not a tag (math, prices, <3)") {
    assert(ex("<p>5<6 and 7>8</p>") == "5<6 and 7>8")
    assert(ex("<p>i <3 this</p>") == "i <3 this")
  }

  test("raw-text close needs a name boundary: </styleguide does not end <style>") {
    assert(ex("<style>/* </styleguide */ p{x}</style>visible") == "visible")
    assert(ex("<script>var s = '</scripty>';</script>shown") == "shown")
  }

  test("whitespace collapses per block; empty blocks vanish") {
    assert(ex("<p>  a   b  </p><p>   </p><p>c</p>") == "a b\nc")
    assert(ex("<div></div><div></div>x") == "x")
  }

  test("link-density cut drops all-link nav blocks, keeps prose with links") {
    val page = """<div><a href="/">Home</a> <a href="/b">Blog</a></div>""" +
      """<p>Read our <a href="/p">paper</a> for details on the method</p>"""
    // no cut: both blocks survive
    assert(ex(page) == "Home Blog\nRead our paper for details on the method")
    // 0.5 cut: the nav (100% link chars) drops, the prose (~14%) stays
    assert(ex(page, 0.5) == "Read our paper for details on the method")
    // self-closed <a/> opens nothing; unmatched </a> clamps at zero depth
    assert(ex("""<p><a href="x"/>t</a>u</p>""", 0.5) == "tu")
    // an UNCLOSED <a> (everyday tag soup — browsers auto-close at block
    // boundaries) must not mark the whole rest of the document as link
    // text: the article body after the malformed nav survives the cut
    val soup = """<div class="nav"><a href="/">Home</div>""" +
      """<p>the article body with many ordinary words to keep</p>"""
    assert(ex(soup, 0.5) == "the article body with many ordinary words to keep")
  }

  test("extract_html is SQL-callable with the optional density argument") {
    val r = spark.sql(
      """SELECT extract_html('<p><a href="/">x</a></p><p>body text</p>', 0.5) AS t,
        |       extract_html('<p>a &amp; b</p>') AS u""".stripMargin).collect()(0)
    assert(r.getString(0) == "body text")
    assert(r.getString(1) == "a & b")
  }

  test("extraction chains into dedupLines units: one line per block") {
    val docsDf = Seq(
      (1L, "<div>SUBSCRIBE NOW</div><p>alpha beta</p>"),
      (2L, "<div>SUBSCRIBE NOW</div><p>gamma delta</p>"),
      (3L, "<div>SUBSCRIBE NOW</div><p>epsilon zeta</p>")).toDF("doc_id", "html")
      .select(col("doc_id"), Text.extractHtml(col("html")).as("text"))
    val out = Dedup.dedupLines(docsDf, col("doc_id"), col("text"), minDocs = 3)
      .orderBy("id").as[(Long, String)].collect()
    assert(out.map(_._2).toSeq ==
      Seq("alpha beta", "gamma delta", "epsilon zeta"))
  }

  private def links(html: String): Seq[String] =
    Seq(Tuple1(html)).toDF("h")
      .select(Text.htmlLinks(col("h")).as("l"))
      .collect()(0).getSeq[String](0)

  test("htmlLinks: quote styles, attribute order, case, missing href") {
    assert(links("""<a href="https://a.com/x">t</a>""") == Seq("https://a.com/x"))
    assert(links("""<a class="z" HREF='https://b.com/'>t</a>""") == Seq("https://b.com/"))
    assert(links("""<a href=https://c.com/p>t</a>""") == Seq("https://c.com/p"))
    assert(links("""<a name="anchor">no link</a><a id=x>none</a>""") == Seq.empty)
    assert(links("""<A href="/rel">up</A> then <a data-x="1" href="#frag">f</a>""") ==
      Seq("/rel", "#frag"))
  }

  test("htmlLinks: script/style/comment decoys never become links") {
    val html =
      """<script>var s = "<a href=\"https://decoy.invalid/\">";</script>""" +
      """<style>a[href="https://css.invalid/"] {}</style>""" +
      """<!-- <a href="https://comment.invalid/">c</a> -->""" +
      """<p>5<6 and <3</p><a href="https://real.com/">r</a>"""
    assert(links(html) == Seq("https://real.com/"))
  }

  test("htmlLinks: document order, duplicates kept, closing tags ignored") {
    assert(links("""<a href="x">1</a><a href="y">2</a><a href="x">3</a></a>""") ==
      Seq("x", "y", "x"))
    // <abbr> starts with 'a' but is not an anchor
    assert(links("""<abbr href="nope">z</abbr><area href="also-not-a">""") == Seq.empty)
  }

  private def anchors(html: String): Seq[(String, String)] =
    Seq(Tuple1(html)).toDF("h")
      .select(explode(Text.htmlAnchors(col("h"))).as("a"))
      .select(col("a.href"), col("a.anchor"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))

  test("htmlAnchors: text capture, nested inline tags, entities, collapse") {
    assert(anchors("""<a href="x">Click <b>here</b> &amp; now</a>""") ==
      Seq(("x", "Click here & now")))
    assert(anchors("""<a href="x">  spaced   out  </a>""") == Seq(("x", "spaced out")))
    assert(anchors("""<a href="x"></a><a href="y">t</a>""") ==
      Seq(("x", ""), ("y", "t")))
  }

  test("htmlAnchors: auto-close at block tags and at a new anchor") {
    // unclosed <a> must not claim the rest of the document
    assert(anchors("""<a href="x">one<p>paragraph text</p><a href="y">two</a>""") ==
      Seq(("x", "one"), ("y", "two")))
    // no-href anchor is an inline no-op for OPENING, but the first </a>
    // still ends the open capture — "post" is outside any anchor
    assert(anchors("""<a href="x">pre <a name="n">mid</a> post</a>""") ==
      Seq(("x", "pre mid")))
  }

  test("htmlAnchors: same href sequence as htmlLinks, capture capped") {
    val html = """<script>var s="<a href=\"d\">";</script>""" +
      """<a href="u">""" + ("word " * 300) + "</a><a href='v'>tail</a>"
    val a = anchors(html)
    assert(a.map(_._1) == links(html))
    assert(a(0)._2.length <= 500 && a(0)._2.startsWith("word word"))
    assert(a(1) == ("v", "tail"))
  }

  test("html_links / html_anchors / html_meta are SQL-callable") {
    graft.functions.Registry.registerAll(spark)
    val r = spark.sql(
      """SELECT html_links('<a href="/a">x</a>') AS l,
        |       html_anchors('<a href="/a">x</a>')[0].anchor AS a,
        |       html_meta('<title>T</title><meta name="k" content="v">') AS m""".stripMargin)
      .collect()(0)
    assert(r.getSeq[String](0) == Seq("/a"))
    assert(r.getString(1) == "x")
    val m = r.getStruct(2)
    assert(m.getString(0) == "T")
    assert(m.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getString(0), x.getString(1))) ==
      Seq(("k", "v")))
  }

  private def meta(html: String): (String, Seq[(String, String)]) = {
    val r = Seq(Tuple1(html)).toDF("h")
      .select(Text.htmlMeta(col("h")).as("m"))
      .select(col("m.title"), col("m.metas"))
      .collect()(0)
    (r.getString(0),
      r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getString(0), x.getString(1))))
  }

  test("htmlMeta: title rcdata, entity decode, first title wins") {
    assert(meta("<head><title>My &amp; Page</title></head>") == ("My & Page", Seq.empty))
    assert(meta("<title>  spaced   title </title><title>second</title>")._1 == "spaced title")
    // rcdata: a '<' inside the title that is not </title> stays text
    assert(meta("<title>a < b</title>")._1 == "a < b")
    assert(meta("<p>no title here</p>")._1 == "")
  }

  test("htmlMeta: name/property/http-equiv keys, content, doc order, quotes") {
    val html = """<meta name="Description" content="A &quot;great&quot; page">""" +
      """<meta property='og:title' content='OG Title'>""" +
      """<meta http-equiv=refresh content=30>""" +
      """<meta charset="utf-8"><meta name="keywords">""" // no content → dropped
    assert(meta(html)._2 == Seq(
      ("description", "A \"great\" page"),
      ("og:title", "OG Title"),
      ("refresh", "30")))
  }

  test("htmlMeta: script/comment decoys skipped, literal '<' tolerated") {
    val html = """<script>var t = "<title>decoy</title>";</script>""" +
      """<!-- <meta name="x" content="y"> --><p>5<6</p>""" +
      """<title>Real</title><meta name="a" content="b">"""
    assert(meta(html) == ("Real", Seq(("a", "b"))))
  }

  test("tag-soup fuzz: 400 random soups — no throw, anchors.href == links") {
    // deterministic seed: the corpus front door sees adversarial-grade
    // garbage; every extractor must stay total, and the two link scanners
    // must agree on the href sequence no matter how broken the markup is
    val rng = new scala.util.Random(0xC0FFEE)
    val pieces = Array(
      "<a href=\"u1\">", "<a href='u2'>", "<a href=u3>", "</a>", "<a name=x>",
      "<p>", "</p>", "<div>", "</div>", "<script>", "</script>", "var x=\"<a href=\\\"d\\\">\";",
      "<style>", "a{color:red}", "<!--", "-->", "<title>", "</title>",
      "<meta name=\"k\" content=\"v\">", "<meta charset=utf-8>", "&amp;", "&#65;", "&bogus;",
      "plain text ", "5<6 ", "<3 ", "<", ">", "\"", "'", "<b>", "</b>", "<a ", "href=", "=\"", "\n")
    val soups = (1 to 400).map { i =>
      (i.toLong, (0 until 30).map(_ => pieces(rng.nextInt(pieces.length))).mkString)
    }.toDF("id", "h")
    val out = soups.select(col("id"),
        Text.htmlLinks(col("h")).as("l"),
        Text.htmlAnchors(col("h")).as("a"),
        Text.htmlMeta(col("h")).as("m"),
        Text.extractHtml(col("h"), 0.5).as("t"))
      .collect()
    assert(out.length == 400)
    out.foreach { r =>
      val links = r.getSeq[String](1)
      val anchors = r.getSeq[org.apache.spark.sql.Row](2).map(_.getString(0))
      assert(links == anchors, s"href mismatch on soup ${r.getLong(0)}")
      assert(r.getStruct(3).getString(0) != null) // title is never null
      assert(r.getString(4) != null)              // extraction is total
    }
  }

  private def canon(html: String): String =
    Seq(Tuple1(html)).toDF("h")
      .select(Text.htmlCanonical(col("h"))).collect()(0).getString(0)

  test("htmlCanonical: first rel=canonical link, decoys skipped, absent is empty") {
    assert(canon("""<link rel="canonical" href="https://e.com/a"><link rel="canonical" href="https://e.com/b">""")
      == "https://e.com/a")
    assert(canon("""<link href='https://e.com/x' rel=CANONICAL>""") == "https://e.com/x")
    assert(canon("""<link rel="stylesheet" href="/s.css"><p>no canonical</p>""") == "")
    assert(canon("""<script>var l='<link rel="canonical" href="https://d.invalid/">';</script>""" +
      """<link rel="canonical" href="https://real.com/">""") == "https://real.com/")
    assert(canon("""<link rel="canonical">missing href""") == "")
  }

  test("dropCanonicalDups: same-domain families collapse, off-site canonicals ignored") {
    // ids 1-3: one family on a.com (www/amp subdomain variants OK — the
    // guard is registrable-domain); id 4: a hostile page on evil.com
    // declaring a.com's article as ITS canonical — it must NOT join the
    // family (nor, carrying the lower id 0, evict the legitimate pages)
    val pages = Seq(
      (0L, "https://evil.com/steal",
        """<link rel="canonical" href="https://a.com/article/1">"""),
      (1L, "https://a.com/article/1",
        """<link rel="canonical" href="https://a.com/article/1">"""),
      (2L, "https://www.a.com/amp/1",
        """<link rel="canonical" href="https://a.com/article/1">"""),
      (3L, "https://a.com/print/1",
        """<link rel="canonical" href="https://a.com/article/1">"""),
      (4L, "https://b.com/own", "<p>no canonical</p>"))
      .toDF("id", "url", "html")
    val kept = Dedup.dropCanonicalDups(pages, col("id"), col("url"), col("html"))
      .select("id").as[Long].collect().toSet
    // family {1,2,3} → 1; evil page falls back to its own URL and survives
    // alone; so does the canonical-less page
    assert(kept == Set(0L, 1L, 4L))
  }

  test("translationPairs: reciprocal hreflang only; forged one-way links drop") {
    def page(url: String, alts: (String, String)*) =
      (url, alts.map { case (l, h) =>
        s"""<link rel="alternate" hreflang="$l" href="$h">""" }.mkString +
        s"""<link rel="alternate" hreflang="xx" href="$url">""") // self-link drops
    val pages = Seq(
      page("https://s/en", "de" -> "https://s/de", "fr" -> "https://s/fr"),
      page("https://s/de", "en" -> "https://s/en"),
      // fr never links back to en → (en, fr) must NOT pair
      page("https://s/fr"),
      // forger declares an alternate nobody reciprocates
      page("https://evil/x", "en" -> "https://s/en"))
      .toDF("url", "html")
    val got = Curation.translationPairs(pages, col("url"), col("html"))
      .as[(String, String, String, String)].collect().toSet
    assert(got == Set(("https://s/de", "de", "https://s/en", "en")))
  }

  test("htmlAlternates: pairs in order, missing attrs dropped, lang lowercased") {
    val a = Seq(Tuple1(
      """<link rel="alternate" hreflang="DE" href="https://s/de">""" +
      """<link rel="alternate" href="https://s/no-lang">""" +
      """<link rel="alternate" hreflang="fr">""" +
      """<link rel="stylesheet" hreflang="es" href="https://s/css">"""))
      .toDF("h").select(explode(Text.htmlAlternates(col("h"))).as("a"))
      .select(col("a.hreflang"), col("a.href"))
      .as[(String, String)].collect().toSeq
    assert(a == Seq(("de", "https://s/de")))
  }

  test("htmlJsonLd: ld+json bodies kept verbatim, plain scripts skipped") {
    val html =
      """<script>var x = 1;</script>""" +
      """<script type="application/ld+json">{"@type":"Article","headline":"A</p>B"}</script>""" +
      """<script type='APPLICATION/LD+JSON' async>{"n":2}</script>""" +
      """<script type="text/javascript">{"not":"ld"}</script>"""
    val got = Seq(Tuple1(html)).toDF("h")
      .select(Text.htmlJsonLd(col("h")).as("j")).collect()(0).getSeq[String](0)
    // "</p>" inside a JSON string survives — only </script> closes the block
    assert(got == Seq("""{"@type":"Article","headline":"A</p>B"}""", """{"n":2}"""))
    // downstream from_json integration
    val head = Seq(Tuple1(html)).toDF("h")
      .select(explode(Text.htmlJsonLd(col("h"))).as("j"))
      .select(from_json(col("j"),
        org.apache.spark.sql.types.StructType.fromDDL("headline STRING"))
        .getField("headline"))
      .as[String].collect().toSeq
    assert(head == Seq("A</p>B", null))
  }

  test("htmlRobotsDirectives: cumulative generic+agent tags, none, case/space") {
    def flags(html: String, agent: String = "robots") =
      Seq(html).toDF("h")
        .select(Text.htmlRobotsDirectives(col("h"), agent).as("d"))
        .select("d.noindex", "d.nofollow").as[(Boolean, Boolean)].head()
    assert(flags("""<meta name="robots" content="noindex, follow">""") == ((true, false)))
    assert(flags("""<meta name="ROBOTS" content=" NONE ">""") == ((true, true)))
    assert(flags("<p>no metas</p>") == ((false, false)))
    // agent-specific tag only honored for that agent; directives cumulate
    val both = """<meta name="robots" content="noindex">""" +
      """<meta name="googlebot" content="nofollow">"""
    assert(flags(both) == ((true, false)))
    assert(flags(both, agent = "googlebot") == ((true, true)))
    // decoy inside a script never parses as a meta
    assert(flags("""<script>var m='<meta name="robots" content="none">';</script>""")
      == ((false, false)))
  }

  test("hostEdges: real parse + host extraction, relative/self links drop") {
    val pages = Seq(
      ("https://s.com/1",
        """<a href="https://t.com/a">x</a><a href="/rel">y</a>""" +
        """<a href="https://s.com/self">self</a><a href="https://t.com/b">again</a>"""),
      ("https://u.com/2", """<script>var z="<a href=\"https://d.invalid/\">";</script>""" +
        """<a href='https://s.com/'>back</a>"""))
      .toDF("url", "html")
    val edges = Graphs.hostEdges(pages, col("url"), col("html"))
      .as[(String, String)].collect().toSeq.sorted
    // parallel s.com→t.com kept twice; relative and same-host links dropped
    assert(edges == Seq(("s.com", "t.com"), ("s.com", "t.com"), ("u.com", "s.com")))
  }
}
