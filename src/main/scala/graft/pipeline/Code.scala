package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Code-corpus curation — the source-code leg of a pretraining pipeline
 * (The Stack: Kocetkov et al. 2022; StarCoder: Li et al. 2023). All the
 * existing text-analysis gates are natural-language shaped; code corpora
 * need their own front door: language routing (by path, then shebang),
 * license detection (SPDX tags + distinctive license phrases → the
 * permissive-only training cut), comment stripping (the dedup-key
 * normalization that collapses re-licensed/re-headered copies), and the
 * line-shape quality signals published for The Stack's filters (long-line
 * and alphanumeric-ratio cuts, auto-generated-file detection).
 *
 * Every operator is one codegen'd static call per row (no shuffle, no
 * fallback) — at 100 TB these run inside the scan's WholeStageCodegen
 * span exactly like the Gopher/langid tier.
 */
object Code {

  /** Language from path extension first, `#!` shebang second (The Stack
   * routes by extension and falls back to interpreter directives for
   * extensionless scripts). Unknown → "unknown". */
  def codeLanguage(path: Column, text: Column): Column =
    Bridge.column(CodeLanguageExpression(Bridge.expression(path), Bridge.expression(text)))

  /** struct(license, permissive): `SPDX-License-Identifier:` tag verbatim
   * when present (the machine-readable convention), else first matching
   * distinctive phrase in the header region (first 2000 chars); permissive
   * = membership in the published permissive training set (MIT, Apache-2.0,
   * BSD-2/3-Clause, ISC, Unlicense). */
  def detectLicense(text: Column): Column =
    Bridge.column(DetectLicenseExpression(Bridge.expression(text)))

  /** Comment-stripped source, string-literal-safe: `lang` routes to the
   * C family (`//` + non-nesting slash-star blocks), the hash family
   * (`#`), or SQL (`--` + slash-star blocks); unknown languages pass
   * through verbatim. Line comments drop to (not including) the newline;
   * block comments drop entirely, newlines inside included; unterminated
   * blocks drop to EOF; quote characters inside string literals never
   * open comments, and a backslash escapes one character inside any
   * string. */
  def stripComments(text: Column, lang: Column): Column =
    Bridge.column(StripCommentsExpression(Bridge.expression(text), Bridge.expression(lang)))

  /** Line-shape quality signals, one pass: struct(n_lines, max_line_len,
   * mean_line_len, frac_long_lines (>100 chars), alnum_ratio (ASCII
   * alphanumeric / all chars), autogen (header carries an
   * auto-generated / do-not-edit marker)). */
  def codeStats(text: Column): Column =
    Bridge.column(CodeStatsExpression(Bridge.expression(text)))
}

object CodeAlgos {

  /** Extension → language. Keys lowercase; lookup lowercases. */
  private val ExtLang: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    val pairs = Seq(
      "py" -> "python", "scala" -> "scala", "sc" -> "scala",
      "js" -> "javascript", "mjs" -> "javascript", "ts" -> "typescript",
      "java" -> "java", "c" -> "c", "h" -> "c",
      "cpp" -> "cpp", "cc" -> "cpp", "cxx" -> "cpp", "hpp" -> "cpp",
      "go" -> "go", "rs" -> "rust", "rb" -> "ruby", "php" -> "php",
      "cs" -> "csharp", "sh" -> "shell", "bash" -> "shell",
      "sql" -> "sql", "md" -> "markdown", "json" -> "json",
      "yaml" -> "yaml", "yml" -> "yaml", "xml" -> "xml",
      "html" -> "html", "htm" -> "html", "css" -> "css", "txt" -> "text")
    pairs.foreach { case (k, v) => m.put(k, v) }
    m
  }

  /** C-comment family: `//` + slash-star blocks; strings with `\` escapes. */
  private val CFamily: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("c", "cpp", "java", "javascript", "typescript", "scala", "go",
      "rust", "csharp", "css").foreach(s.add)
    s
  }

  /** Hash-comment family: `#` line comments, same string handling. */
  private val HashFamily: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("python", "shell", "ruby", "yaml", "r", "perl").foreach(s.add)
    s
  }

  def codeLanguage(path: UTF8String, text: UTF8String): UTF8String = {
    val p = path.toString
    val seg = p.substring(p.lastIndexOf('/') + 1)
    val dot = seg.lastIndexOf('.')
    if (dot > 0 && dot < seg.length - 1) {
      val hit = ExtLang.get(seg.substring(dot + 1).toLowerCase(java.util.Locale.ROOT))
      if (hit != null) return UTF8String.fromString(hit)
    }
    val t = text.toString
    if (t.startsWith("#!")) {
      val nl = t.indexOf('\n')
      val line = (if (nl >= 0) t.substring(0, nl) else t).trim
      val lang =
        if (line.contains("python")) "python"
        else if (line.contains("node")) "javascript"
        else if (line.contains("ruby")) "ruby"
        else if (line.contains("perl")) "perl"
        else if (line.contains("php")) "php"
        else if (line.contains("bash") || line.endsWith("sh")) "shell"
        else "unknown"
      return UTF8String.fromString(lang)
    }
    UTF8String.fromString("unknown")
  }

  private val Permissive: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("MIT", "Apache-2.0", "BSD-2-Clause", "BSD-3-Clause", "ISC",
      "Unlicense").foreach(s.add)
    s
  }

  /** Phrase table, FIRST match wins; LGPL before GPL (substring). */
  private val Phrases: Array[(String, String)] = Array(
    "Permission is hereby granted, free of charge" -> "MIT",
    "Apache License" -> "Apache-2.0",
    "Redistribution and use in source and binary forms" -> "BSD-3-Clause",
    "GNU Lesser General Public License" -> "LGPL-3.0-only",
    "GNU General Public License" -> "GPL-3.0-only",
    "Mozilla Public License" -> "MPL-2.0",
    "free and unencumbered software released into the public domain" -> "Unlicense")

  private val SpdxTag = "SPDX-License-Identifier:"

  def detectLicense(text: UTF8String): InternalRow = {
    val full = text.toString
    val header = if (full.length > 2000) full.substring(0, 2000) else full
    var license = "none"
    val at = header.indexOf(SpdxTag)
    if (at >= 0) {
      var i = at + SpdxTag.length
      while (i < header.length && header.charAt(i) == ' ') i += 1
      var j = i
      while (j < header.length && !Character.isWhitespace(header.charAt(j))) j += 1
      if (j > i) license = header.substring(i, j)
    } else {
      var k = 0
      while (k < Phrases.length && license == "none") {
        if (header.contains(Phrases(k)._1)) license = Phrases(k)._2
        k += 1
      }
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(license), Permissive.contains(license)))
  }

  def stripComments(text: UTF8String, lang: UTF8String): UTF8String = {
    val l = lang.toString.toLowerCase(java.util.Locale.ROOT)
    val (lineA, lineB, blocks) =
      if (CFamily.contains(l)) ('/', '/', true)
      else if (HashFamily.contains(l)) ('#', '\u0000', false)
      else if (l == "sql") ('-', '-', true)
      else return text
    val s = text.toString
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    var quote = '\u0000' // current string delimiter; \u0000 = outside strings
    while (i < n) {
      val c = s.charAt(i)
      if (quote != '\u0000') {
        out.append(c)
        if (c == '\\' && i + 1 < n) { out.append(s.charAt(i + 1)); i += 1 }
        else if (c == quote) quote = '\u0000'
        i += 1
      } else if (c == '"' || c == '\'') {
        quote = c; out.append(c); i += 1
      } else if (c == lineA && (lineB == '\u0000' || (i + 1 < n && s.charAt(i + 1) == lineB))) {
        // line comment: drop to just before the newline (newline survives)
        val nl = s.indexOf('\n', i)
        i = if (nl >= 0) nl else n
      } else if (blocks && c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        // block comment: drop through the closing */, or to EOF if unterminated
        val end = s.indexOf("*/", i + 2)
        i = if (end >= 0) end + 2 else n
      } else {
        out.append(c); i += 1
      }
    }
    UTF8String.fromString(out.toString)
  }

  private val AutogenMarkers: Array[String] =
    Array("auto-generated", "autogenerated", "generated by", "do not edit")

  def codeStats(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = s.length
    var nLines = 1
    var lineLen = 0
    var maxLine = 0
    var totalLineChars = 0L
    var longLines = 0
    var alnum = 0L
    var total = 0L
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      if (cp == '\n') {
        if (lineLen > maxLine) maxLine = lineLen
        if (lineLen > 100) longLines += 1
        totalLineChars += lineLen
        lineLen = 0
        nLines += 1
      } else {
        lineLen += 1
        total += 1
        if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
            (cp >= '0' && cp <= '9')) alnum += 1
      }
      i += Character.charCount(cp)
    }
    if (lineLen > maxLine) maxLine = lineLen
    if (lineLen > 100) longLines += 1
    totalLineChars += lineLen
    // '\n' characters count toward alnum_ratio's denominator (they ARE
    // document characters) but not toward any line's length
    val allChars = total + (nLines - 1)
    val header = s.substring(0, math.min(n, 500)).toLowerCase(java.util.Locale.ROOT)
    var autogen = false
    var k = 0
    while (k < AutogenMarkers.length && !autogen) {
      if (header.contains(AutogenMarkers(k))) autogen = true
      k += 1
    }
    new GenericInternalRow(Array[Any](
      nLines, maxLine, totalLineChars.toDouble / nLines,
      longLines.toDouble / nLines,
      if (allChars == 0) 0.0 else alnum.toDouble / allChars,
      autogen))
  }
}

/** Language routing (see [[CodeAlgos.codeLanguage]]). Codegen: one static
 * call per row. */
case class CodeLanguageExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(p: Any, t: Any): Any =
    CodeAlgos.codeLanguage(p.asInstanceOf[UTF8String], t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, (p, t) =>
      s"${ev.value} = graft.pipeline.CodeAlgos.codeLanguage($p, $t);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** License detection (see [[CodeAlgos.detectLicense]]). Codegen: one
 * static call per row. */
case class DetectLicenseExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("license", StringType, nullable = false),
    StructField("permissive", BooleanType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    CodeAlgos.detectLicense(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.CodeAlgos.detectLicense($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Comment stripping (see [[CodeAlgos.stripComments]]). Codegen: one
 * static call per row. */
case class StripCommentsExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(t: Any, l: Any): Any =
    CodeAlgos.stripComments(t.asInstanceOf[UTF8String], l.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, (t, l) =>
      s"${ev.value} = graft.pipeline.CodeAlgos.stripComments($t, $l);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Line-shape quality signals (see [[CodeAlgos.codeStats]]). Codegen: one
 * static call per row. */
case class CodeStatsExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("max_line_len", IntegerType, nullable = false),
    StructField("mean_line_len", DoubleType, nullable = false),
    StructField("frac_long_lines", DoubleType, nullable = false),
    StructField("alnum_ratio", DoubleType, nullable = false),
    StructField("autogen", BooleanType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    CodeAlgos.codeStats(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.CodeAlgos.codeStats($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
