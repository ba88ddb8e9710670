package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Aho–Corasick multi-pattern matching (Aho & Corasick 1975) — the scale
 * path for large literal dictionaries. [[Curation.blocklistGate]]'s single
 * alternation regex is the right plan for a dozen phrases, but Java's
 * regex engine is a backtracking NFA: a K-phrase alternation costs O(K·n)
 * per row in the worst case and the compiled pattern grows with the list.
 * A real curation kill list (UT1-style category lists, contamination
 * phrase banks) runs 10⁴–10⁵ phrases; at that size the automaton is the
 * only shape whose scan cost is independent of the dictionary:
 * O(n + matches) per row over a driver-compiled, once-per-executor
 * artifact (bounded like the GPT-2 merges table — see [[GptBpe]]).
 *
 * Matching semantics (deliberately simple and oracle-expressible):
 *  - exact char-by-char substring matching — the caller normalizes case
 *    (`lower(text)`) and whitespace (`\s+` → single space), mirroring the
 *    regex gate's preprocessing, so the automaton itself stays exact;
 *  - EVERY (phrase, end-position) occurrence is counted, overlapping and
 *    nested included — a superset of `regexp_count`'s non-overlapping
 *    scan (the automaton sees all of them for free; discarding overlaps
 *    would throw signal away). With `maxHits = 0` the `blocked` flag is
 *    identical to the regex gate's whenever any hit exists;
 *  - optional word-boundary mode checks the char before the match start
 *    and after the match end against Java's ASCII word class
 *    `[A-Za-z0-9_]`, anchoring only at edges whose own pattern char is an
 *    ASCII word char (the same rule as
 *    [[Curation.blocklistPattern]] — a `\b` next to é/ß/CJK never
 *    matches, so non-ASCII edges fall back to substring semantics, the
 *    safe direction for a blocklist).
 *
 * Scale: compile on the driver (O(total pattern chars)), ship once per
 * executor as a codegen reference object, scan as a codegen'd narrow
 * projection — no shuffle, no UDF, cost independent of dictionary size.
 */
object MultiMatch {

  /** Driver-bounded artifact guard: 10M total pattern chars ≈ 80 MB of
   * automaton worst-case — far beyond any published blocklist (UT1's
   * largest category is ~4M chars) but small enough to broadcast. */
  private val MaxTotalPatternChars = 10 * 1000 * 1000

  /**
   * Compiled automaton. Frozen to flat arrays: per-node children as a
   * parallel (sorted char[], int[]) pair probed by binary search, BFS
   * fail links, per-node own-pattern-id lists (offset-indexed flat
   * array), and an output link (nearest proper-suffix node that ends at
   * least one pattern) so match enumeration walks only productive nodes.
   * Serializable — shipped once per executor.
   */
  class AcAutomaton(
      val childChar: Array[Array[Char]],
      val childNode: Array[Array[Int]],
      val fail: Array[Int],
      val outLink: Array[Int],
      val endsOff: Array[Int],
      val endsIds: Array[Int],
      val patLen: Array[Int],
      val wordBoundary: Boolean,
      val anchorLead: Array[Boolean],
      val anchorTrail: Array[Boolean]) extends Serializable {
    def nPatterns: Int = patLen.length
    def nNodes: Int = fail.length
  }

  /**
   * Compile a phrase list. `wordBoundary = true` reproduces the regex
   * gate's anchoring rule per edge. Patterns are matched verbatim — pass
   * them pre-normalized (the gate helpers do).
   */
  def compile(patterns: Seq[String], wordBoundary: Boolean = false): AcAutomaton = {
    require(patterns.nonEmpty, "pattern list must not be empty")
    patterns.zipWithIndex.foreach { case (p, i) =>
      require(p.nonEmpty, s"empty pattern at index $i") }
    val total = patterns.iterator.map(_.length.toLong).sum
    require(total <= MaxTotalPatternChars,
      s"pattern list totals $total chars; automaton capped at $MaxTotalPatternChars " +
        "to stay a bounded driver artifact")

    // growable trie
    val children = scala.collection.mutable.ArrayBuffer(
      new java.util.TreeMap[Character, Integer]())
    val ends = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var node = 0
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        val nxt = children(node).get(c)
        if (nxt == null) {
          children += new java.util.TreeMap[Character, Integer]()
          ends += scala.collection.mutable.ArrayBuffer.empty[Int]
          children(node).put(c, children.size - 1)
          node = children.size - 1
        } else node = nxt
        i += 1
      }
      ends(node) += pid
    }

    val n = children.size
    val fail = new Array[Int](n)
    val outLink = new Array[Int](n)
    java.util.Arrays.fill(outLink, -1)
    // BFS fail links (root's children fail to root)
    val queue = new java.util.ArrayDeque[Int]()
    children(0).forEach { (_, v) => fail(v) = 0; queue.add(v) }
    while (!queue.isEmpty) {
      val u = queue.poll()
      outLink(u) = if (ends(fail(u)).nonEmpty) fail(u) else outLink(fail(u))
      children(u).forEach { (c, v) =>
        var f = fail(u)
        var t: Integer = children(f).get(c)
        while (t == null && f != 0) { f = fail(f); t = children(f).get(c) }
        fail(v) = if (t == null || t == v) 0 else t
        queue.add(v)
      }
    }

    // freeze
    val childChar = new Array[Array[Char]](n)
    val childNode = new Array[Array[Int]](n)
    var i = 0
    while (i < n) {
      val m = children(i)
      val cc = new Array[Char](m.size); val cn = new Array[Int](m.size)
      var j = 0
      val it = m.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); cc(j) = e.getKey; cn(j) = e.getValue; j += 1 }
      childChar(i) = cc; childNode(i) = cn
      i += 1
    }
    val endsOff = new Array[Int](n + 1)
    i = 0
    while (i < n) { endsOff(i + 1) = endsOff(i) + ends(i).size; i += 1 }
    val endsIds = new Array[Int](endsOff(n))
    i = 0
    while (i < n) {
      var j = 0
      while (j < ends(i).size) { endsIds(endsOff(i) + j) = ends(i)(j); j += 1 }
      i += 1
    }
    def asciiWord(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'
    new AcAutomaton(
      childChar, childNode, fail, outLink, endsOff, endsIds,
      patterns.map(_.length).toArray, wordBoundary,
      patterns.map(p => asciiWord(p.head)).toArray,
      patterns.map(p => asciiWord(p.last)).toArray)
  }

  /** Total occurrence count (all positions, overlaps included). */
  def acCount(text: Column, ac: AcAutomaton): Column =
    Bridge.column(AcCountExpression(Bridge.expression(text), ac))

  /** Sorted distinct matched pattern ids (indexes into the compiled list). */
  def acTerms(text: Column, ac: AcAutomaton): Column =
    Bridge.column(AcTermsExpression(Bridge.expression(text), ac))

  /** Redact every matched span: overlapping/adjacent-overlapping match
   * intervals MERGE and each merged region is replaced by `replacement`
   * once — the scrub-list face of the automaton (names, secrets, terms):
   * a 10⁴-entry dictionary redacts in O(text + matches) where the
   * alternation `regexp_replace` degrades toward O(dict × text). */
  def acRedact(text: Column, ac: AcAutomaton, replacement: String): Column =
    Bridge.column(AcRedactExpression(Bridge.expression(text), ac, replacement))
}

/** Static match kernels — stable call targets for generated code. */
object MultiMatchAlgos {
  import MultiMatch.AcAutomaton

  private def asciiWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'

  /** Core scan. `hits` null → count only; else marks matched pattern ids. */
  private def scan(t: String, ac: AcAutomaton, hits: java.util.BitSet): Int = {
    var count = 0
    var state = 0
    var i = 0
    val n = t.length
    while (i < n) {
      val c = t.charAt(i)
      // follow fail links until a goto exists (root absorbs misses)
      var nxt = -1
      var s = state
      while (nxt < 0) {
        val cc = ac.childChar(s)
        val j = java.util.Arrays.binarySearch(cc, c)
        if (j >= 0) nxt = ac.childNode(s)(j)
        else if (s == 0) nxt = 0
        else s = ac.fail(s)
      }
      state = nxt
      // enumerate matches ending at i via the output chain
      var o = if (ac.endsOff(state + 1) > ac.endsOff(state)) state else ac.outLink(state)
      while (o >= 0) {
        var k = ac.endsOff(o)
        val end = ac.endsOff(o + 1)
        while (k < end) {
          val pid = ac.endsIds(k)
          val len = ac.patLen(pid)
          val ok = !ac.wordBoundary || {
            val start = i - len + 1
            (!ac.anchorLead(pid) || start == 0 || !asciiWord(t.charAt(start - 1))) &&
              (!ac.anchorTrail(pid) || i == n - 1 || !asciiWord(t.charAt(i + 1)))
          }
          if (ok) { count += 1; if (hits != null) hits.set(pid) }
          k += 1
        }
        o = ac.outLink(o)
      }
      i += 1
    }
    count
  }

  def count(v: UTF8String, ac: AcAutomaton): Int = scan(v.toString, ac, null)

  /** Merged-span redaction: collect every (boundary-valid) match interval,
   * merge overlaps, substitute each merged region once. One automaton scan
   * + one output build — O(text + matches). */
  def redact(v: UTF8String, ac: AcAutomaton, replacement: UTF8String): UTF8String = {
    val t = v.toString
    // collect intervals (start, end) inclusive, in end order
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var state = 0
    var i = 0
    val n = t.length
    while (i < n) {
      val c = t.charAt(i)
      var nxt = -1
      var s = state
      while (nxt < 0) {
        val cc = ac.childChar(s)
        val j = java.util.Arrays.binarySearch(cc, c)
        if (j >= 0) nxt = ac.childNode(s)(j)
        else if (s == 0) nxt = 0
        else s = ac.fail(s)
      }
      state = nxt
      var o = if (ac.endsOff(state + 1) > ac.endsOff(state)) state else ac.outLink(state)
      while (o >= 0) {
        var k = ac.endsOff(o)
        val end = ac.endsOff(o + 1)
        while (k < end) {
          val pid = ac.endsIds(k)
          val len = ac.patLen(pid)
          val start = i - len + 1
          val ok = !ac.wordBoundary || {
            (!ac.anchorLead(pid) || start == 0 || !asciiWord(t.charAt(start - 1))) &&
              (!ac.anchorTrail(pid) || i == n - 1 || !asciiWord(t.charAt(i + 1)))
          }
          if (ok) { starts.add(start); ends.add(i) }
          k += 1
        }
        o = ac.outLink(o)
      }
      i += 1
    }
    if (starts.isEmpty) return v
    // intervals arrive sorted by end; merge any that overlap. A later
    // interval can start before an earlier one (longer pattern ending
    // later), so track the running min-start of the open merged region.
    val m = starts.size
    val rep = replacement.toString
    val sb = new java.lang.StringBuilder(t.length)
    // build merged regions left-to-right: sort by start (stable, bounded
    // by match count)
    val idx = (0 until m).sortBy(starts.get(_).intValue)
    var written = 0 // next source char not yet emitted
    var regionStart = -1
    var regionEnd = -1
    def flush(): Unit = if (regionStart >= 0) {
      if (regionStart > written) sb.append(t, written, regionStart)
      sb.append(rep)
      written = regionEnd + 1
      regionStart = -1
    }
    idx.foreach { q =>
      val s0 = starts.get(q).intValue
      val e0 = ends.get(q).intValue
      if (regionStart < 0) { regionStart = s0; regionEnd = e0 }
      else if (s0 <= regionEnd) { if (e0 > regionEnd) regionEnd = e0 } // overlap: extend
      else { flush(); regionStart = s0; regionEnd = e0 }
    }
    flush()
    if (written < t.length) sb.append(t, written, t.length)
    UTF8String.fromString(sb.toString)
  }

  def terms(v: UTF8String, ac: AcAutomaton): GenericArrayData = {
    val hits = new java.util.BitSet(ac.nPatterns)
    scan(v.toString, ac, hits)
    val out = new Array[Int](hits.cardinality())
    var pid = hits.nextSetBit(0)
    var j = 0
    while (pid >= 0) { out(j) = pid; j += 1; pid = hits.nextSetBit(pid + 1) }
    new GenericArrayData(out.map(x => x: Any))
  }
}

/** Merged-span automaton redaction. Codegen: one static call per row. */
case class AcRedactExpression(child: Expression, ac: MultiMatch.AcAutomaton,
    replacement: String) extends UnaryExpression {
  @transient private lazy val repU = UTF8String.fromString(replacement)
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    MultiMatchAlgos.redact(v.asInstanceOf[UTF8String], ac, repU)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val aRef = ctx.addReferenceObj("graftAc", ac, "graft.pipeline.MultiMatch.AcAutomaton")
    val rRef = ctx.addReferenceObj("graftAcRep", repU,
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.MultiMatchAlgos.redact($c, $aRef, $rRef);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Total automaton match count. Codegen: one static call per row. */
case class AcCountExpression(child: Expression, ac: MultiMatch.AcAutomaton)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    MultiMatchAlgos.count(v.asInstanceOf[UTF8String], ac)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val aRef = ctx.addReferenceObj("graftAc", ac, "graft.pipeline.MultiMatch.AcAutomaton")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.MultiMatchAlgos.count($c, $aRef);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Sorted distinct matched pattern ids. Codegen: one static call per row. */
case class AcTermsExpression(child: Expression, ac: MultiMatch.AcAutomaton)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    MultiMatchAlgos.terms(v.asInstanceOf[UTF8String], ac)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val aRef = ctx.addReferenceObj("graftAc", ac, "graft.pipeline.MultiMatch.AcAutomaton")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.MultiMatchAlgos.terms($c, $aRef);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
