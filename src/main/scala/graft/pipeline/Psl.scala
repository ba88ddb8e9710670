package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Full Public Suffix List support for [[Text.registrableDomain]]'s config
 * path: parse the standard `public_suffix_list.dat` format (publicsuffix
 * .org/list — `//` comments, literal rules, leftmost `*.` wildcard rules,
 * leading-`!` exception rules) and evaluate eTLD+1 with the list's own
 * precedence algorithm — exception rules beat everything, otherwise the
 * rule with the most labels prevails, no match falls back to the implicit
 * `*` rule (the bare TLD is the suffix).
 *
 * The built-in [[Text.registrableDomain]] stays the zero-config default
 * (46 high-traffic multi-part suffixes, pure codegen'd regex/CASE that
 * the DuckDB oracle replicates); THIS is the tenant-supplied long-tail
 * path — ~10k rules held once per executor behind a reference object,
 * matched per row in O(host labels) hash probes. No join, no shuffle, no
 * fan-out: the whole evaluation stays inside whole-stage codegen as one
 * instance call, so keying 10^10 URLs by PSL domain costs exactly one
 * narrow projection.
 *
 * Engine convention (deliberately diverging from the PSL algorithm's
 * "null when the host IS a public suffix"): degenerate hosts — bare
 * suffixes, dotless intranet names, empty — pass through unchanged, the
 * same total behavior the built-in has; a cap/budget key must never be
 * null.
 */
object Psl {

  /** Parsed, immutable rule set; serializes to executors with the plan.
   * `exact`/`exceptions` hold full rule strings, `wildTails` holds the
   * labels after `*.` (the real list only ever uses a leftmost wildcard;
   * interior `*` is unsupported and refused at parse). */
  case class Rules private[Psl] (
      exact: Set[String], wildTails: Set[String], exceptions: Set[String],
      maxLabels: Int) extends Serializable {

    private def labelCount(s: String): Int = s.count(_ == '.') + 1

    /** eTLD+1 of an already-extracted host, lowercased here for DNS case-
     * insensitivity; trailing dot (DNS root form `example.com.`) ignored. */
    def domainOf(host: String): String = {
      if (host == null || host.isEmpty) return host
      val h0 = host.toLowerCase(java.util.Locale.ROOT)
      val h = if (h0.endsWith(".")) h0.dropRight(1) else h0
      if (h.isEmpty || h.indexOf('.') < 0) return host // dotless: pass through
      val labels = h.split('.')
      val n = labels.length
      // suffix strings of the last 1..maxI labels, built right-to-left once
      // (maxLabels already counts a wildcard rule's `*` label, so no rule
      // can match a longer host suffix than maxLabels)
      val maxI = math.min(n, maxLabels)
      val sufs = new Array[String](maxI + 1)
      sufs(1) = labels(n - 1)
      var i = 2
      while (i <= maxI) {
        sufs(i) = labels(n - i) + "." + sufs(i - 1)
        i += 1
      }
      // exception rules prevail over ALL normal rules regardless of length,
      // then the longest normal match; no match -> implicit '*' (1 label)
      var excBest = 0
      var normBest = 0
      i = maxI
      while (i >= 1) {
        val s = sufs(i)
        if (excBest == 0 && exceptions.contains(s)) excBest = i
        if (normBest == 0 &&
            (exact.contains(s) || (i >= 2 && wildTails.contains(sufs(i - 1)))))
          normBest = i
        i -= 1
      }
      val psLabels =
        if (excBest > 0) excBest - 1
        else if (normBest > 0) normBest
        else 1
      if (n <= psLabels) host // host IS a suffix: pass through (see header)
      else {
        // last psLabels+1 labels of the ORIGINAL-case host (the key should
        // be stable, but don't rewrite the tenant's casing beyond grouping —
        // lowercase the OUTPUT too so mixed-case twins share one bucket)
        var idx = h.length
        var take = psLabels + 1
        while (take > 0) { idx = h.lastIndexOf('.', idx - 1); take -= 1 }
        h.substring(idx + 1)
      }
    }

    /** UTF8String face for codegen. */
    def domain(host: UTF8String): UTF8String = {
      val r = domainOf(host.toString)
      if (r == null) null else UTF8String.fromString(r)
    }
  }

  /** Parse `public_suffix_list.dat` content. Comments (`//`), blank lines
   * and the ICANN/PRIVATE section markers are skipped; rules are trimmed,
   * lowercased, and anything after the first whitespace ignored — all per
   * the published format. Punycode/IDN canonicalization is the caller's
   * concern (feed the list's punycode form and punycode hosts). */
  def parse(text: String): Rules = parseLines(text.linesIterator.iterator)

  def parseLines(lines: Iterator[String]): Rules = {
    val exact = Set.newBuilder[String]
    val wild = Set.newBuilder[String]
    val exc = Set.newBuilder[String]
    var maxLabels = 1
    lines.foreach { raw =>
      val line = raw.trim.takeWhile(!_.isWhitespace)
      if (line.nonEmpty && !line.startsWith("//")) {
        val rule = line.toLowerCase(java.util.Locale.ROOT)
        val labels = rule.count(_ == '.') + 1
        if (rule.startsWith("!")) {
          val r = rule.drop(1)
          require(!r.contains("*"), s"wildcard in exception rule unsupported: $line")
          exc += r
          maxLabels = math.max(maxLabels, labels)
        } else if (rule.startsWith("*.")) {
          val tail = rule.drop(2)
          require(!tail.contains("*"), s"non-leftmost wildcard unsupported: $line")
          wild += tail
          maxLabels = math.max(maxLabels, labels)
        } else {
          require(!rule.contains("*"), s"non-leftmost wildcard unsupported: $line")
          exact += rule
          maxLabels = math.max(maxLabels, labels)
        }
      }
    }
    Rules(exact.result(), wild.result(), exc.result(), maxLabels)
  }

  /** Registrable domain of a URL column under a full PSL — the drop-in
   * long-tail upgrade of [[Text.registrableDomain]]. One codegen'd host
   * extraction + one codegen'd rule probe per row. */
  def registrableDomain(url: Column, rules: Rules): Column =
    Bridge.column(PslDomainExpression(
      Bridge.expression(Text.urlHost(url)), rules))

  /** Same, over a column that already holds a bare host. */
  def registrableDomainOfHost(host: Column, rules: Rules): Column =
    Bridge.column(PslDomainExpression(Bridge.expression(host), rules))
}

/** PSL eTLD+1 probe. Codegen: one instance call against the rule set held
 * as a plan reference object (the InSet idiom — the ~10k-entry set rides
 * the serialized plan once per executor, never per row/partition). */
case class PslDomainExpression(child: Expression, rules: Psl.Rules)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    rules.domain(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("graftPslRules", rules, classOf[Psl.Rules].getName)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = ${c.isNull};
      ${CodeGenerator.javaType(dataType)} ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
      if (!${ev.isNull}) {
        ${ev.value} = $ref.domain(${c.value});
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
