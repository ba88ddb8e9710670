package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Crawl-ingest normalization operators: URL canonicalization (so per-URL /
 * per-page dedup and domain stats group variants of the same address) and
 * text encoding repair (mojibake from latin-1/cp1252 double decoding plus
 * unicode punctuation normalization). Both are single linear codegen'd
 * passes per row — narrow projections, no shuffle at any scale — with
 * deterministic contracts the DuckDB oracles replicate exactly.
 */
object IngestAlgos {

  // ------------------------------------------------------------------ URLs

  /**
   * Canonical URL form (the standard crawl-dedup normalization):
   *  - surrounding whitespace trimmed;
   *  - scheme and host lowercased (path/query stay case-sensitive);
   *  - default ports stripped (`:80` for http, `:443` for https);
   *  - the `#fragment` dropped;
   *  - tracking query parameters removed: keys starting `utm_` (any case)
   *    and `gclid` / `fbclid` / `msclkid` / `mc_eid`; remaining params keep
   *    their order; an emptied query drops its `?`;
   *  - a trailing `/` dropped from non-root paths (`/a/` → `/a`; a bare
   *    `http://h/` → `http://h`).
   * Strings without a `scheme://` prefix come back trimmed but otherwise
   * untouched (relative links and junk are not guessed at).
   */
  def canonicalizeUrl(url: UTF8String): UTF8String = {
    val s0 = url.toString.trim
    val schemeEnd = s0.indexOf("://")
    if (schemeEnd <= 0) return UTF8String.fromString(s0)
    var i = 0
    while (i < schemeEnd) {
      val c = s0.charAt(i)
      val okStart = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
      val ok = okStart || (i > 0 &&
        ((c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'))
      if (!ok) return UTF8String.fromString(s0)
      i += 1
    }
    val scheme = s0.substring(0, schemeEnd).toLowerCase(java.util.Locale.ROOT)
    val rest = s0.substring(schemeEnd + 3)
    // authority ends at the first of / ? #
    var aEnd = rest.length
    var j = 0
    var found = false
    while (j < rest.length && !found) {
      val c = rest.charAt(j)
      if (c == '/' || c == '?' || c == '#') { aEnd = j; found = true }
      j += 1
    }
    // lowercase the HOST only — userinfo is case-sensitive per RFC 3986
    // (folding User:SeCrEt would both corrupt the credential and collapse
    // semantically distinct URLs into one dedup key)
    val rawAuthority = rest.substring(0, aEnd)
    val at = rawAuthority.lastIndexOf('@')
    var authority =
      if (at < 0) rawAuthority.toLowerCase(java.util.Locale.ROOT)
      else rawAuthority.substring(0, at + 1) +
        rawAuthority.substring(at + 1).toLowerCase(java.util.Locale.ROOT)
    if (scheme == "http" && authority.endsWith(":80"))
      authority = authority.substring(0, authority.length - 3)
    else if (scheme == "https" && authority.endsWith(":443"))
      authority = authority.substring(0, authority.length - 4)
    val afterAuth = rest.substring(aEnd)
    // drop fragment
    val hash = afterAuth.indexOf('#')
    val noFrag = if (hash < 0) afterAuth else afterAuth.substring(0, hash)
    // split path / query
    val q = noFrag.indexOf('?')
    var path = if (q < 0) noFrag else noFrag.substring(0, q)
    val query = if (q < 0) "" else noFrag.substring(q + 1)
    // tracking-param filter, order preserved
    val keptQuery =
      if (query.isEmpty) ""
      else query.split("&", -1).filter { p =>
        val eq = p.indexOf('=')
        val key = (if (eq < 0) p else p.substring(0, eq)).toLowerCase(java.util.Locale.ROOT)
        !(key.startsWith("utm_") || key == "gclid" || key == "fbclid" ||
          key == "msclkid" || key == "mc_eid")
      }.mkString("&")
    // trailing slash off non-root paths; bare "/" drops entirely
    if (path == "/") path = ""
    else if (path.length > 1 && path.endsWith("/")) path = path.substring(0, path.length - 1)
    val sb = new java.lang.StringBuilder(s0.length)
    sb.append(scheme).append("://").append(authority).append(path)
    if (keptQuery.nonEmpty) sb.append('?').append(keptQuery)
    UTF8String.fromString(sb.toString)
  }

  // ------------------------------------------------------- encoding repair

  /** Longest-match-first replacement table: common latin-1/cp1252 mojibake
   * of UTF-8 punctuation mapped straight to its ASCII-normalized form,
   * plus the raw unicode punctuation itself. Accented letters repair to
   * their real form (é stays é — that is text, not chrome). */
  private val Repairs: Array[(String, String)] = Array(
    // mojibake of smart punctuation (latin-1 decode keeps C1 controls)
    "â" -> "'", // â€™  = ’
    "â" -> "'", // â€˜  = ‘
    "â" -> "\"", // â€œ = “
    "â" -> "\"", // â€[9d] = ”
    "â" -> "-", // â€“  = –
    "â" -> "-", // â€”  = —
    "â¦" -> "...", // â€¦ = …
    "â¢" -> "-", // â€¢  = • (list chrome → dash)
    // cp1252-decoded mojibake of the same (0x80→\u20AC, 0x99→\u2122,
    // 0x98→\u02DC, 0x9C→\u0153, 0x93→\u201C, 0x94→\u201D — the familiar
    // "â€™"-style sequences; written as escapes so the table is unambiguous)
    "\u00E2\u20AC\u2122" -> "'", // cp1252 ’
    "\u00E2\u20AC\u02DC" -> "'", // cp1252 ‘
    "\u00E2\u20AC\u0153" -> "\"", // cp1252 “
    "\u00E2\u20AC\u201C" -> "-", // cp1252 –
    "\u00E2\u20AC\u201D" -> "-", // cp1252 —
    "\u00E2\u20AC\u00A6" -> "...", // cp1252 …
    "\u00E2\u20AC\u00A2" -> "-", // cp1252 •
    // mojibake of common accented letters (Ã + second byte)
    "Ã©" -> "é", "Ã¨" -> "è", "Ã¡" -> "á",
    "Ã­" -> "í", "Ã³" -> "ó", "Ãº" -> "ú",
    "Ã±" -> "ñ", "Ã¼" -> "ü", "Ã¶" -> "ö",
    "Ã¤" -> "ä", "Ã§" -> "ç", "Ã£" -> "ã",
    // mojibake of NBSP (Â + A0) and the stray Â from (Â«, Â»)
    "Â " -> " ",
    "Â«" -> "\"", "Â»" -> "\"",
    // raw unicode punctuation → ASCII
    "’" -> "'", "‘" -> "'", "“" -> "\"", "”" -> "\"",
    "–" -> "-", "—" -> "-", "…" -> "...",
    "«" -> "\"", "»" -> "\"", "‚" -> ",", "„" -> "\"",
    " " -> " ", " " -> " ", "　" -> " ",
    // zero-widths and BOM vanish
    "​" -> "", "‌" -> "", "‍" -> "", "﻿" -> "")

  /** Entries that can start at char c, longest first (tiny per-char probe). */
  private val RepairsByFirst: java.util.HashMap[Character, Array[(String, String)]] = {
    val m = new java.util.HashMap[Character, Array[(String, String)]]()
    Repairs.groupBy(_._1.charAt(0)).foreach { case (c, es) =>
      m.put(Character.valueOf(c), es.sortBy(-_._1.length))
    }
    m
  }

  /**
   * Mojibake + punctuation repair in ONE left-to-right longest-match pass:
   * at each position the longest matching table entry is replaced and the
   * scan continues AFTER the replacement (replacements are never re-matched
   * — no cascading). Characters outside the table copy through untouched,
   * so already-clean text is a no-op.
   */
  def fixEncoding(text: UTF8String): UTF8String = {
    val s = text.toString
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val candidates = RepairsByFirst.get(Character.valueOf(c))
      var matched = false
      if (candidates != null) {
        var e = 0
        while (!matched && e < candidates.length) {
          val (from, to) = candidates(e)
          if (s.startsWith(from, i)) {
            out.append(to)
            i += from.length
            matched = true
          }
          e += 1
        }
      }
      if (!matched) { out.append(c); i += 1 }
    }
    UTF8String.fromString(out.toString)
  }
}

/** Canonical URL as one codegen'd static call per row (see
 * [[IngestAlgos.canonicalizeUrl]] for the contract). */
case class UrlCanonicalizeExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    IngestAlgos.canonicalizeUrl(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.IngestAlgos.canonicalizeUrl($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Encoding repair as one codegen'd static call per row (see
 * [[IngestAlgos.fixEncoding]] for the contract). */
case class FixEncodingExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    IngestAlgos.fixEncoding(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.IngestAlgos.fixEncoding($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
