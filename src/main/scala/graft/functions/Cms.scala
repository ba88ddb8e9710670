package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.types._

/**
 * Count-min sketches (Cormode & Muthukrishnan 2005) as FIRST-CLASS mergeable
 * BINARY values — the per-key FREQUENCY member of the sketch family
 * ([[Hll]] counts distincts, [[Theta]] does set algebra, LogHistogram holds
 * quantiles, Misra–Gries `approx_heavy_hitters` keeps the top-k): "how many
 * times has THIS url/domain/shingle appeared, cumulative across every batch
 * ever ingested" for keys you pick AFTER the scan. Misra–Gries answers that
 * only for keys that finished in its top-k; a CMS answers any point query
 * with a one-sided error bound and never stores keys at all.
 *
 * d×w long counters; each of the d rows hashes the value with a distinct
 * seed and increments one counter; the estimate is the MIN across rows —
 * always ≥ the true count, overshooting by more than 2N/w with probability
 * at most (1/2)^d (N = total increments). Merge = element-wise SUM, so the
 * sketch is a commutative monoid: batch splits and partition layouts are
 * byte-identical (spec-pinned), and a stored sketch table updates in
 * O(batch) per ingest.
 *
 * Operators (all registered for SQL):
 *  - `cms_sketch(expr[, w[, d]])` — aggregate → binary (default w=4096,
 *    d=4 → 128 KiB, error ≤ 2N/4096 ≈ 0.05% of stream mass at 1/16 miss
 *    probability)
 *  - `cms_merge(sketch)`          — aggregate: element-wise sum rollup
 *  - `cms_estimate(sketch, key)`  — long point estimate (min over rows)
 *
 * Wire format (big-endian): int w, int d, then d*w longs row-major. Empty
 * byte array = merge identity (estimates 0 for every key). Width/depth
 * mismatches in a merge are an ERROR, never a silent wrong answer (same
 * contract as [[Hll]] precision mixing — counters at different geometry
 * are not comparable).
 */
object Cms {

  val DefaultW: Int = 4096
  val DefaultD: Int = 4

  def requireGeometry(w: Int, d: Int): Unit = {
    require(w >= 16 && w <= (1 << 24), s"cms width must be in 16..${1 << 24}, got $w")
    require(d >= 1 && d <= 16, s"cms depth must be in 1..16, got $d")
  }

  private val SeedBase = 0xC3135EEDL

  def add(counters: Array[Long], w: Int, d: Int, v: Any, dt: DataType): Unit = {
    var r = 0
    while (r < d) {
      val h = XxHash64Function.hash(v, dt, SeedBase + r)
      counters(r * w + (((h % w) + w) % w).toInt) += 1L
      r += 1
    }
  }

  def sumInto(a: Array[Long], b: Array[Long]): Unit = {
    require(a.length == b.length,
      s"cannot merge cms sketches of different geometry (${a.length} vs ${b.length} counters)")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
  }

  def serialize(w: Int, d: Int, counters: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * counters.length)
    bb.putInt(w).putInt(d)
    counters.foreach(bb.putLong)
    bb.array()
  }

  /** Point estimate: min over the d rows; empty/identity sketch → 0. */
  def estimate(bytes: Array[Byte], v: Any, dt: DataType): Long = {
    if (bytes.isEmpty) return 0L
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val w = bb.getInt()
    val d = bb.getInt()
    var min = Long.MaxValue
    var r = 0
    while (r < d) {
      val h = XxHash64Function.hash(v, dt, SeedBase + r)
      val c = bb.getLong(8 + 8 * (r * w + (((h % w) + w) % w).toInt))
      if (c < min) min = c
      r += 1
    }
    min
  }

  /** Mutable aggregate state; w == -1 is the merge-identity sentinel. */
  final class Buf(var w: Int, var d: Int, var counters: Array[Long]) {
    def mergeBytes(bytes: Array[Byte]): Unit = if (bytes.nonEmpty) {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val bw = bb.getInt()
      val bd = bb.getInt()
      if (w == -1) { w = bw; d = bd; counters = new Array[Long](bw * bd) }
      else require(w == bw && d == bd,
        s"cannot merge cms sketches of different geometry (${w}x$d vs ${bw}x$bd)")
      var i = 0
      while (i < counters.length) { counters(i) += bb.getLong(8 + 8 * i); i += 1 }
    }
    def serialize(): Array[Byte] =
      if (w == -1) Array.emptyByteArray else Cms.serialize(w, d, counters)
  }

  def emptyBuf(): Buf = new Buf(-1, -1, null)

  def newBuf(w: Int, d: Int): Buf = {
    requireGeometry(w, d)
    new Buf(w, d, new Array[Long](w * d))
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val b = emptyBuf()
    b.mergeBytes(bytes)
    b
  }
}

/** cms_sketch(expr[, w[, d]]) → binary; map-side combining. */
case class CmsSketchAggregate(
    child: Expression,
    w: Int = Cms.DefaultW,
    d: Int = Cms.DefaultD,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Cms.Buf] {
  Cms.requireGeometry(w, d)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Cms.Buf = Cms.newBuf(w, d)

  override def update(buf: Cms.Buf, input: InternalRow): Cms.Buf = {
    val v = child.eval(input)
    if (v != null) Cms.add(buf.counters, buf.w, buf.d, v, child.dataType)
    buf
  }

  override def merge(a: Cms.Buf, b: Cms.Buf): Cms.Buf = {
    a.mergeBytes(b.serialize())
    a
  }

  override def eval(buf: Cms.Buf): Any = buf.serialize()
  override def serialize(buf: Cms.Buf): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): Cms.Buf = Cms.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): CmsSketchAggregate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsSketchAggregate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** cms_merge(sketchCol) → binary: element-wise-sum rollup of stored
 * sketches (the cross-batch path). */
case class CmsMergeAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Cms.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Cms.Buf = Cms.emptyBuf()

  override def update(buf: Cms.Buf, input: InternalRow): Cms.Buf = {
    val v = child.eval(input)
    if (v != null) buf.mergeBytes(v.asInstanceOf[Array[Byte]])
    buf
  }

  override def merge(a: Cms.Buf, b: Cms.Buf): Cms.Buf = {
    a.mergeBytes(b.serialize())
    a
  }

  override def eval(buf: Cms.Buf): Any = buf.serialize()
  override def serialize(buf: Cms.Buf): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): Cms.Buf = Cms.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): CmsMergeAggregate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsMergeAggregate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** cms_estimate(sketch, key) → long; one codegen'd static call per row.
 * The key's hash uses ITS OWN Spark type — estimate with the same type the
 * sketch was built over (int vs long vs string hash differently, exactly
 * as in every other hash-keyed graft function). */
case class CmsEstimateExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(sketch: Any, key: Any): Any =
    Cms.estimate(sketch.asInstanceOf[Array[Byte]], key, right.dataType)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val dtRef = ctx.addReferenceObj("cmsKeyType", right.dataType)
    nullSafeCodeGen(ctx, ev, (s, k) =>
      s"${ev.value} = graft.functions.Cms.estimate($s, $k, $dtRef);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
