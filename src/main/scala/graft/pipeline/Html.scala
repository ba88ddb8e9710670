package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * HTML → text extraction — the front door of a crawl-corpus pipeline: real
 * corpora arrive as tag soup, and every downstream gate (line/paragraph
 * dedup, Gopher, PII, token counts) needs the visible text with real block
 * boundaries. One linear state-machine pass per document (no DOM, no
 * backtracking), codegen'd like every other per-row text operator, so the
 * whole ingest tier stays a narrow fused projection at any scale.
 *
 * Contract (deterministic, mirrored by the q_html_extract oracle fixture):
 *  - `<!-- … -->` comments are removed (unterminated → rest of input).
 *  - `<script …>…</script>` / `<style …>…</style>` raw-text elements are
 *    removed entirely, case-insensitive, markup inside them ignored
 *    (unterminated → rest of input).
 *  - Tags are `<` `/`? name `…` `>` with the name a letter/digit run; the
 *    tag body is skipped to the next `>` (a literal `>` inside a quoted
 *    attribute value is out of scope for this extractor, as for every
 *    regex-class HTML stripper). A `<` that does not start a tag is text.
 *  - Block-level tags (p, div, br, h1..h6, li, table/tr/td, header, footer,
 *    nav, title, …) start a new output block; inline tags (a, b, span, …)
 *    vanish so words they wrap stay joined.
 *  - Entities decode: the HTML core set (&amp; &lt; &gt; &quot; &apos;) plus
 *    &nbsp; (to a plain space) and numeric &#NN; / &#xHH; for valid
 *    non-surrogate code points; anything else keeps its literal `&`.
 *    Decoded characters are text — they are never re-parsed as markup.
 *  - Per block: whitespace runs (including raw newlines in the source)
 *    collapse to one space and the block is trimmed; empty blocks vanish.
 *  - Link-density boilerplate cut (jusText-style, Pomikálek 2011): with
 *    `maxLinkDensity` < 1, a block whose non-whitespace characters sit
 *    inside `<a>…</a>` in a fraction exceeding the threshold is dropped —
 *    nav bars and footer link farms disappear without a DOM.
 *  - Output: surviving blocks joined with single `\n`, so dedupLines /
 *    dedupParagraphs see one real unit per block.
 */
object HtmlAlgos {

  private val BlockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](64)
    Seq(
      "html", "head", "body", "title", "p", "div", "br", "hr",
      "h1", "h2", "h3", "h4", "h5", "h6",
      "ul", "ol", "li", "dl", "dt", "dd",
      "table", "thead", "tbody", "tfoot", "tr", "td", "th", "caption",
      "blockquote", "pre", "section", "article", "header", "footer",
      "nav", "aside", "main", "form", "fieldset", "legend", "figure",
      "figcaption", "address", "center", "option", "select", "textarea"
    ).foreach(s.add)
    s
  }

  private def isNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** True when s matches `word` case-insensitively at `at` AND the match is
   * a complete tag name (next char is whitespace, '>', '/', or end). */
  private def tagNameAt(s: String, at: Int, word: String): Boolean = {
    if (!s.regionMatches(true, at, word, 0, word.length)) return false
    val after = at + word.length
    after >= s.length || {
      val c = s.charAt(after)
      Character.isWhitespace(c) || c == '>' || c == '/'
    }
  }

  /** Skip a raw-text element (`script`/`style`): past the opening tag's `>`,
   * through the matching case-insensitive `</name`, past its `>`.
   * Unterminated at any step → end of input. */
  private def skipRawText(s: String, start: Int, name: String): Int = {
    val n = s.length
    val open = s.indexOf('>', start)
    if (open < 0) return n
    var i = open + 1
    while (i < n) {
      if (s.charAt(i) == '<' && i + 1 < n && s.charAt(i + 1) == '/' &&
          s.regionMatches(true, i + 2, name, 0, name.length) &&
          // name boundary: '</styleguide' must NOT close <style> — the
          // next char has to end the tag name (browser raw-text rule)
          (i + 2 + name.length >= n || !isNameChar(s.charAt(i + 2 + name.length)))) {
        val gt = s.indexOf('>', i + 2 + name.length)
        return if (gt < 0) n else gt + 1
      }
      i += 1
    }
    n
  }

  /** Decoded entity body (between '&' and ';'), or null if unknown/invalid. */
  private def decodeEntity(ent: String): String = ent match {
    case "amp" => "&"
    case "lt" => "<"
    case "gt" => ">"
    case "quot" => "\""
    case "apos" => "'"
    case "nbsp" => " " // plain space so whitespace collapsing applies
    case _ if ent.length >= 2 && ent.charAt(0) == '#' =>
      try {
        val cp =
          if (ent.charAt(1) == 'x' || ent.charAt(1) == 'X')
            Integer.parseInt(ent.substring(2), 16)
          else Integer.parseInt(ent.substring(1), 10)
        if (cp <= 0 || cp > 0x10FFFF || Character.isSurrogate(cp.toChar) && cp <= 0xFFFF) null
        else new String(Character.toChars(cp))
      } catch { case _: NumberFormatException => null }
    case _ => null
  }

  def extract(html: UTF8String, maxLinkDensity: Double): UTF8String = {
    val s = html.toString
    val n = s.length
    val out = new java.lang.StringBuilder(math.min(n, 1 << 16))
    val block = new java.lang.StringBuilder(256)
    var linkDepth = 0
    var linkChars = 0
    var totalChars = 0

    def appendChar(c: Char): Unit = {
      block.append(c)
      if (!Character.isWhitespace(c)) {
        totalChars += 1
        if (linkDepth > 0) linkChars += 1
      }
    }

    def endBlock(): Unit = {
      // collapse whitespace runs to one space + trim, in place over the block
      val b = new java.lang.StringBuilder(block.length)
      var i = 0
      var pendingSpace = false
      while (i < block.length) {
        val c = block.charAt(i)
        if (Character.isWhitespace(c)) { if (b.length > 0) pendingSpace = true }
        else {
          if (pendingSpace) { b.append(' '); pendingSpace = false }
          b.append(c)
        }
        i += 1
      }
      if (b.length > 0 &&
          (maxLinkDensity >= 1.0 || totalChars == 0 ||
            linkChars.toDouble / totalChars <= maxLinkDensity)) {
        if (out.length > 0) out.append('\n')
        out.append(b)
      }
      block.setLength(0)
      linkChars = 0
      totalChars = 0
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (tagNameAt(s, i + 1, "script")) {
          i = skipRawText(s, i, "script")
        } else if (tagNameAt(s, i + 1, "style")) {
          i = skipRawText(s, i, "style")
        } else {
          var j = i + 1
          var closing = false
          if (j < n && s.charAt(j) == '/') { closing = true; j += 1 }
          // HTML5 rule: a tag opens only on an ASCII LETTER. "5<6 and 7>8"
          // (math, prices, "<3") must render verbatim — treating "<6…>" as
          // a tag silently deletes visible text at the corpus front door.
          val startsName = j < n && {
            val c0 = s.charAt(j)
            (c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z')
          }
          var k = j
          if (startsName) while (k < n && isNameChar(s.charAt(k))) k += 1
          if (k == j && !(j < n && s.charAt(j) == '!')) {
            // '<' not followed by a tag name, '/name', or '<!…': literal text
            appendChar(c)
            i += 1
          } else {
            val name = s.substring(j, k).toLowerCase(java.util.Locale.ROOT)
            val gt = s.indexOf('>', k)
            val selfClosed = gt > 0 && s.charAt(gt - 1) == '/'
            if (BlockTags.contains(name)) {
              endBlock()
              // browsers auto-close inline elements at block boundaries;
              // without this an UNCLOSED <a> (everyday tag soup) marks the
              // whole rest of the document as link text and the density
              // cut silently eats every later block
              linkDepth = 0
            }
            if (name == "a") {
              if (closing) { if (linkDepth > 0) linkDepth -= 1 }
              else if (!selfClosed) linkDepth += 1
            }
            i = if (gt < 0) n else gt + 1
          }
        }
      } else if (c == '&') {
        // entity: a '#'-optional letter/digit run of ≤ 10 chars ending in ';'
        val limit = math.min(n, i + 12)
        var k = i + 1
        if (k < limit && s.charAt(k) == '#') k += 1
        while (k < limit && Character.isLetterOrDigit(s.charAt(k))) k += 1
        val decoded =
          if (k > i + 1 && k < n && s.charAt(k) == ';') decodeEntity(s.substring(i + 1, k))
          else null
        if (decoded != null) {
          var d = 0
          while (d < decoded.length) { appendChar(decoded.charAt(d)); d += 1 }
          i = k + 1
        } else {
          appendChar('&')
          i += 1
        }
      } else {
        appendChar(c)
        i += 1
      }
    }
    endBlock()
    UTF8String.fromString(out.toString)
  }

  /**
   * `href` values of anchor tags, in document order — the outlink side of
   * a host-graph build ([[Graphs.pageRankFixed]] wants (src_host,
   * dst_host) edges, and the hrefs ARE the dst side). Same tag discipline
   * as [[extract]]: script/style raw text and comments are skipped (a
   * decoy `<a href=…>` inside a JS string literal must NOT become an
   * edge), tags open only on ASCII letters. Attribute parsing accepts
   * double-quoted, single-quoted and unquoted values and a
   * case-insensitive attribute name; values come back verbatim (no entity
   * decode, no base-URL resolution — chain [[Text.urlCanonicalize]] /
   * [[Text.urlHost]] downstream). Anchors with no href contribute
   * nothing. One linear pass, codegen'd via [[HtmlLinksExpression]].
   */
  def links(html: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = html.toString
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      if (s.charAt(i) == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (tagNameAt(s, i + 1, "script")) {
          i = skipRawText(s, i, "script")
        } else if (tagNameAt(s, i + 1, "style")) {
          i = skipRawText(s, i, "style")
        } else {
          var j = i + 1
          var closing = false
          if (j < n && s.charAt(j) == '/') { closing = true; j += 1 }
          val startsName = j < n && {
            val c0 = s.charAt(j)
            (c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z')
          }
          var k = j
          if (startsName) while (k < n && isNameChar(s.charAt(k))) k += 1
          if (k == j) i += 1 // literal '<' (math, "<3") or <!doctype — no link here
          else {
            val gt = s.indexOf('>', k)
            val end = if (gt < 0) n else gt
            if (!closing && k - j == 1 &&
                (s.charAt(j) == 'a' || s.charAt(j) == 'A')) {
              val href = findHref(s, k, end)
              if (href != null) out += UTF8String.fromString(href)
            }
            i = if (gt < 0) n else gt + 1
          }
        }
      } else i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  private val AnchorTextCap = 500

  /**
   * (href, anchor_text) pairs of anchor tags, in document order — anchor
   * text is the classic relevance signal a link-graph build wants next to
   * the edge itself (what OTHER pages call a target). Emits exactly the
   * hrefs [[links]] emits, one struct each (spec-pinned invariant), with
   * the visible text between `<a href=…>` and its close: nested inline
   * tags vanish, entities decode, whitespace collapses to single spaces,
   * capture caps at 500 chars so an unclosed `<a>` swallowing the rest of
   * a tag-soup page stays O(1) per anchor. An anchor auto-closes at a
   * block tag or a new `<a>` (browser behavior — an unclosed anchor must
   * not claim the whole document); `<a>` without href is an inline no-op.
   */
  def anchors(html: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = html.toString
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var openHref: String = null
    val text = new java.lang.StringBuilder(64)

    def appendText(c: Char): Unit =
      if (openHref != null && text.length < AnchorTextCap) {
        if (Character.isWhitespace(c)) {
          if (text.length > 0 && text.charAt(text.length - 1) != ' ') text.append(' ')
        } else text.append(c)
      }

    def emit(): Unit = if (openHref != null) {
      var len = text.length
      while (len > 0 && text.charAt(len - 1) == ' ') len -= 1 // trailing collapse-space
      out += org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(openHref), UTF8String.fromString(text.substring(0, len)))
      openHref = null
      text.setLength(0)
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (tagNameAt(s, i + 1, "script")) {
          i = skipRawText(s, i, "script")
        } else if (tagNameAt(s, i + 1, "style")) {
          i = skipRawText(s, i, "style")
        } else {
          var j = i + 1
          var closing = false
          if (j < n && s.charAt(j) == '/') { closing = true; j += 1 }
          val startsName = j < n && {
            val c0 = s.charAt(j)
            (c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z')
          }
          var k = j
          if (startsName) while (k < n && isNameChar(s.charAt(k))) k += 1
          if (k == j) { appendText(c); i += 1 }
          else {
            val name = s.substring(j, k).toLowerCase(java.util.Locale.ROOT)
            val gt = s.indexOf('>', k)
            val end = if (gt < 0) n else gt
            if (BlockTags.contains(name)) emit()
            if (name == "a") {
              if (closing) emit()
              else {
                val href = findHref(s, k, end)
                if (href != null) { emit(); openHref = href }
              }
            }
            i = if (gt < 0) n else gt + 1
          }
        }
      } else if (c == '&') {
        val limit = math.min(n, i + 12)
        var k = i + 1
        if (k < limit && s.charAt(k) == '#') k += 1
        while (k < limit && Character.isLetterOrDigit(s.charAt(k))) k += 1
        val decoded =
          if (k > i + 1 && k < n && s.charAt(k) == ';') decodeEntity(s.substring(i + 1, k))
          else null
        if (decoded != null) {
          var d = 0
          while (d < decoded.length) { appendText(decoded.charAt(d)); d += 1 }
          i = k + 1
        } else { appendText('&'); i += 1 }
      } else { appendText(c); i += 1 }
    }
    emit() // tag soup: an anchor left open at EOF still reports
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /**
   * JSON-LD blocks — the bodies of `<script type="application/ld+json">`
   * elements, verbatim and in document order: schema.org structured data
   * (headline, datePublished, author, articleBody) that news and
   * commerce sites ship as machine-readable metadata richer than any
   * meta tag. This is the ONE script content worth keeping, so the
   * extractor inverts the usual skip-scripts rule for exactly that type
   * attribute (case-insensitive, quoting-agnostic); parse the returned
   * strings downstream with `from_json` and the schema you expect.
   */
  def jsonLd(html: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = html.toString
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      if (s.charAt(i) == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (tagNameAt(s, i + 1, "script")) {
          val k = i + 8
          val gt = s.indexOf('>', k)
          val tagEnd = if (gt < 0) n else gt
          val typ = findAttr(s, k, tagEnd, "type")
          val bodyStart = if (gt < 0) n else gt + 1
          val next = skipRawText(s, i, "script") // past </script>'s '>'
          if (typ != null && typ.equalsIgnoreCase("application/ld+json") && bodyStart < n) {
            val close = s.lastIndexOf("</", next - 1)
            val bodyEnd = if (close >= bodyStart) close else math.min(next, n)
            out += UTF8String.fromString(s.substring(bodyStart, bodyEnd).trim)
          }
          i = next
        } else if (tagNameAt(s, i + 1, "style")) {
          i = skipRawText(s, i, "style")
        } else {
          val c1 = if (i + 1 < n) s.charAt(i + 1) else ' '
          val isTag = c1 == '/' || c1 == '!' ||
            (c1 >= 'a' && c1 <= 'z') || (c1 >= 'A' && c1 <= 'Z')
          if (isTag) {
            val gt = s.indexOf('>', i + 1)
            i = if (gt < 0) n else gt + 1
          } else i += 1
        }
      } else i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /**
   * hreflang alternates — `<link rel="alternate" hreflang=… href=…>` pairs
   * in document order: the page's own list of its language versions, the
   * signal hreflang-mined PARALLEL CORPORA start from (cluster the
   * alternates, pair the texts, and you have bitext candidates without
   * any content alignment). Values verbatim; entries missing either
   * attribute are dropped; script/style/comment regions skipped.
   */
  def alternates(html: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = html.toString
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      if (s.charAt(i) == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (tagNameAt(s, i + 1, "script")) {
          i = skipRawText(s, i, "script")
        } else if (tagNameAt(s, i + 1, "style")) {
          i = skipRawText(s, i, "style")
        } else if (tagNameAt(s, i + 1, "link")) {
          val k = i + 5
          val gt = s.indexOf('>', k)
          val end = if (gt < 0) n else gt
          val rel = findAttr(s, k, end, "rel")
          if (rel != null && rel.equalsIgnoreCase("alternate")) {
            val lang = findAttr(s, k, end, "hreflang")
            val href = findAttr(s, k, end, "href")
            if (lang != null && href != null)
              out += org.apache.spark.sql.catalyst.InternalRow(
                UTF8String.fromString(lang.toLowerCase(java.util.Locale.ROOT)),
                UTF8String.fromString(href))
          }
          i = if (gt < 0) n else gt + 1
        } else {
          val c1 = if (i + 1 < n) s.charAt(i + 1) else ' '
          val isTag = c1 == '/' || c1 == '!' ||
            (c1 >= 'a' && c1 <= 'z') || (c1 >= 'A' && c1 <= 'Z')
          if (isTag) {
            val gt = s.indexOf('>', i + 1)
            i = if (gt < 0) n else gt + 1
          } else i += 1
        }
      } else i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** First href attribute value in the tag body [from, to). */
  private def findHref(s: String, from: Int, to: Int): String =
    findAttr(s, from, to, "href")

  /**
   * The page's self-declared canonical URL — the FIRST
   * `<link rel="canonical" href=…>` (case-insensitive rel, any quoting),
   * "" when absent. THE url-level dedup signal: AMP/print/mobile/
   * tracking-parameter variants all point at one canonical, so grouping
   * by it collapses page families whose RENDERINGS differ enough that no
   * content hash relates them. Script/style/comment regions skipped with
   * the usual discipline; value verbatim (chain [[Text.urlCanonicalize]]).
   */
  def canonical(html: UTF8String): UTF8String = {
    val s = html.toString
    val n = s.length
    var i = 0
    while (i < n) {
      if (s.charAt(i) == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (tagNameAt(s, i + 1, "script")) {
          i = skipRawText(s, i, "script")
        } else if (tagNameAt(s, i + 1, "style")) {
          i = skipRawText(s, i, "style")
        } else if (tagNameAt(s, i + 1, "link")) {
          val k = i + 5
          val gt = s.indexOf('>', k)
          val end = if (gt < 0) n else gt
          val rel = findAttr(s, k, end, "rel")
          if (rel != null && rel.equalsIgnoreCase("canonical")) {
            val href = findAttr(s, k, end, "href")
            if (href != null) return UTF8String.fromString(href)
          }
          i = if (gt < 0) n else gt + 1
        } else {
          val c1 = if (i + 1 < n) s.charAt(i + 1) else ' '
          val isTag = c1 == '/' || c1 == '!' ||
            (c1 >= 'a' && c1 <= 'z') || (c1 >= 'A' && c1 <= 'Z')
          if (isTag) {
            val gt = s.indexOf('>', i + 1)
            i = if (gt < 0) n else gt + 1
          } else i += 1
        }
      } else i += 1
    }
    UTF8String.fromString("")
  }

  /** First value of the case-insensitive attribute `attr` in the tag body
   * [from, to); double-quoted, single-quoted and unquoted values. Known
   * limitation (documented, browser-divergent): a literal '>' inside a
   * quoted attribute value ends the tag early — vanishingly rare in crawl
   * attributes and not worth a second scan. */
  private def findAttr(s: String, from: Int, to: Int, attr: String): String = {
    var i = from
    while (i < to) {
      while (i < to && (Character.isWhitespace(s.charAt(i)) || s.charAt(i) == '/')) i += 1
      if (i >= to) return null
      val ns = i
      while (i < to && !Character.isWhitespace(s.charAt(i)) &&
             s.charAt(i) != '=' && s.charAt(i) != '/') i += 1
      val name = s.substring(ns, i)
      while (i < to && Character.isWhitespace(s.charAt(i))) i += 1
      var value: String = null
      if (i < to && s.charAt(i) == '=') {
        i += 1
        while (i < to && Character.isWhitespace(s.charAt(i))) i += 1
        if (i < to && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
          val q = s.charAt(i); i += 1
          val vs = i
          while (i < to && s.charAt(i) != q) i += 1
          value = s.substring(vs, i)
          if (i < to) i += 1
        } else {
          val vs = i
          while (i < to && !Character.isWhitespace(s.charAt(i))) i += 1
          value = s.substring(vs, i)
        }
      }
      if (name.equalsIgnoreCase(attr) && value != null) return value
    }
    null
  }

  /** Decode entities + collapse whitespace runs to one space + trim — the
   * text normalization [[extract]] applies per block, for short captured
   * fragments (titles, meta content). Capped at `cap` INPUT chars. */
  private def cleanFragment(s: String, cap: Int): String = {
    val in = if (s.length <= cap) s else s.substring(0, cap)
    val b = new java.lang.StringBuilder(in.length)
    var i = 0
    var pendingSpace = false
    def app(c: Char): Unit =
      if (Character.isWhitespace(c)) { if (b.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { b.append(' '); pendingSpace = false }
        b.append(c)
      }
    val n = in.length
    while (i < n) {
      val c = in.charAt(i)
      if (c == '&') {
        val limit = math.min(n, i + 12)
        var k = i + 1
        if (k < limit && in.charAt(k) == '#') k += 1
        while (k < limit && Character.isLetterOrDigit(in.charAt(k))) k += 1
        val decoded =
          if (k > i + 1 && k < n && in.charAt(k) == ';') decodeEntity(in.substring(i + 1, k))
          else null
        if (decoded != null) {
          var d = 0
          while (d < decoded.length) { app(decoded.charAt(d)); d += 1 }
          i = k + 1
        } else { app('&'); i += 1 }
      } else { app(c); i += 1 }
    }
    b.toString
  }

  /**
   * Page metadata in one pass: struct(title, metas array<struct<name,
   * content>>). `title` is the FIRST `<title>` element's text
   * (entity-decoded, whitespace-collapsed, 500-char input cap; "" when
   * absent — title is rcdata, so the capture runs to the literal
   * `</title>`). `metas` is every `<meta>` tag carrying BOTH a
   * `name`/`property`/`http-equiv` key and a `content` value, in document
   * order, keys lowercased, duplicates kept (downstream chooses a
   * first/last-wins policy); content is entity-decoded and collapsed.
   * Comments and script/style raw text are skipped with the same
   * discipline as [[extract]].
   */
  def meta(html: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = html.toString
    val n = s.length
    var title: String = null
    val metas = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      if (s.charAt(i) == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (tagNameAt(s, i + 1, "script")) {
          i = skipRawText(s, i, "script")
        } else if (tagNameAt(s, i + 1, "style")) {
          i = skipRawText(s, i, "style")
        } else if (title == null && tagNameAt(s, i + 1, "title")) {
          val gt = s.indexOf('>', i + 1)
          if (gt < 0) i = n
          else {
            // rcdata: runs to the literal close tag, tags inside are text
            var e = gt + 1
            var found = -1
            while (found < 0 && e < n) {
              val lt = s.indexOf('<', e)
              if (lt < 0) e = n
              else if (lt + 1 < n && s.charAt(lt + 1) == '/' &&
                       tagNameAt(s, lt + 2, "title")) found = lt
              else e = lt + 1
            }
            val end = if (found < 0) n else found
            title = cleanFragment(s.substring(gt + 1, end), 500)
            i = if (found < 0) n else {
              val close = s.indexOf('>', found)
              if (close < 0) n else close + 1
            }
          }
        } else if (tagNameAt(s, i + 1, "meta")) {
          val k = i + 5
          val gt = s.indexOf('>', k)
          val end = if (gt < 0) n else gt
          var key = findAttr(s, k, end, "name")
          if (key == null) key = findAttr(s, k, end, "property")
          if (key == null) key = findAttr(s, k, end, "http-equiv")
          val content = findAttr(s, k, end, "content")
          if (key != null && content != null)
            metas += org.apache.spark.sql.catalyst.InternalRow(
              UTF8String.fromString(key.toLowerCase(java.util.Locale.ROOT)),
              UTF8String.fromString(cleanFragment(content, 2000)))
          i = if (gt < 0) n else gt + 1
        } else {
          // only skip as a tag when one opens here (letter, '/', or '!');
          // literal '<' in text ("5<6", "<3") advances one char
          val c1 = if (i + 1 < n) s.charAt(i + 1) else ' '
          val isTag = c1 == '/' || c1 == '!' ||
            (c1 >= 'a' && c1 <= 'z') || (c1 >= 'A' && c1 <= 'Z')
          if (isTag) {
            val gt = s.indexOf('>', i + 1)
            i = if (gt < 0) n else gt + 1
          } else i += 1
        }
      } else i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      UTF8String.fromString(if (title == null) "" else title),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(metas.toArray))
  }
}

/** HTML → visible text as one codegen'd static call per row (see
 * [[HtmlAlgos.extract]] for the exact contract). */
case class HtmlExtractExpression(child: Expression, maxLinkDensity: Double)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    HtmlAlgos.extract(v.asInstanceOf[UTF8String], maxLinkDensity)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.HtmlAlgos.extract($c, $maxLinkDensity);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** href values of `<a>` tags as array<string>, one codegen'd static call
 * per row (see [[HtmlAlgos.links]] for the exact contract). */
case class HtmlLinksExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HtmlAlgos.links(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.HtmlAlgos.links($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** struct(title, metas array<struct<name,content>>) in one codegen'd pass
 * (see [[HtmlAlgos.meta]] for the exact contract). */
case class HtmlMetaExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("title", StringType, nullable = false),
    org.apache.spark.sql.types.StructField("metas", org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("name", StringType, nullable = false),
        org.apache.spark.sql.types.StructField("content", StringType, nullable = false))),
      containsNull = false), nullable = false)))
  override def nullSafeEval(v: Any): Any =
    HtmlAlgos.meta(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.HtmlAlgos.meta($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** JSON-LD script bodies as array<string>, one codegen'd static call per
 * row (see [[HtmlAlgos.jsonLd]]). */
case class HtmlJsonLdExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HtmlAlgos.jsonLd(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.HtmlAlgos.jsonLd($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** (hreflang, href) alternate pairs as array<struct>, one codegen'd static
 * call per row (see [[HtmlAlgos.alternates]]). */
case class HtmlAlternatesExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("hreflang", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("href", StringType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HtmlAlgos.alternates(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.HtmlAlgos.alternates($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** First rel=canonical link href as string ("" when absent), one codegen'd
 * static call per row (see [[HtmlAlgos.canonical]]). */
case class HtmlCanonicalExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    HtmlAlgos.canonical(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.HtmlAlgos.canonical($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** (href, anchor) structs of `<a>` tags as array<struct>, one codegen'd
 * static call per row (see [[HtmlAlgos.anchors]] for the exact contract). */
case class HtmlAnchorsExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("href", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("anchor", StringType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HtmlAlgos.anchors(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.HtmlAlgos.anchors($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
