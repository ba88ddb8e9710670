package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.types._

/**
 * HyperLogLog distinct-count sketches (Flajolet et al. 2007; the HLL++
 * bias regime follows Heule et al. 2013's practical guidance) as FIRST-CLASS
 * mergeable values — the piece Spark's own `approx_count_distinct` keeps
 * internal: here the sketch is a plain BINARY column you can persist to
 * parquet, ship between jobs, and union across ingest batches.
 *
 * Why it matters at 100 TB: corpus telemetry ("distinct URLs per domain,
 * cumulative across every batch ever ingested") must not rescan the corpus
 * per batch. With a persisted sketch table the update is O(batch) — sketch
 * the new batch, element-wise-max with the stored registers, write back.
 * 2^p one-byte registers (p=12 → 4 KiB) per key give a ~1.04/√(2^p)
 * relative standard error (~1.6% at p=12) regardless of cardinality.
 *
 * Operators (all registered for SQL, all map-side-combining aggregates):
 *  - `hll_sketch(expr[, p])` → binary registers over the values' xxhash64
 *  - `hll_merge(sketch)`     → binary, element-wise max of sketches
 *  - `hll_estimate(sketch)`  → long, the bias-corrected HLL estimate
 *    (linear counting below 2.5·m — exact-ish at small cardinalities)
 *
 * Determinism: the sketch bytes and the estimate are pure functions of the
 * input SET (max is commutative/associative/idempotent), so incremental
 * union across any batch split is byte-identical to a full-corpus sketch —
 * spec-pinned. Estimates are approximate by construction → rows-only at the
 * driver gate, with error-bound and split-invariance specs.
 */
object Hll {

  /** Register count must be a power of two with 4 <= p <= 18 (16 B–256 KiB
   * per sketch); p > 18 is past the point where a byte register and this
   * estimator family are the right tool. */
  def requireP(p: Int): Unit =
    require(p >= 4 && p <= 18, s"hll precision p must be in 4..18, got $p")

  private[functions] def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Fold one 64-bit hash into the registers: top p bits pick the register,
   * the rank is 1 + leading zeros of the remaining 64-p bits. */
  def add(regs: Array[Byte], hash: Long): Unit = {
    val p = Integer.numberOfTrailingZeros(regs.length)
    val idx = (hash >>> (64 - p)).toInt
    val w = hash << p
    val rank = if (w == 0L) (64 - p + 1) else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (rank > (regs(idx) & 0xff)) regs(idx) = rank.toByte
  }

  /** Element-wise max of b into a (register union = set union). */
  def maxInto(a: Array[Byte], b: Array[Byte]): Unit = {
    require(a.length == b.length,
      s"cannot merge hll sketches of different precisions (${a.length} vs ${b.length} registers)")
    var i = 0
    while (i < a.length) {
      if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
      i += 1
    }
  }

  /** Bias-corrected estimate: harmonic-mean raw estimate, linear counting
   * below 2.5·m when empty registers remain (the small-range regime where
   * the raw estimator biases high). The zero-length identity sketch (an
   * hll_merge over only-null inputs) estimates 0. */
  def estimate(regs: Array[Byte]): Long = {
    if (regs.isEmpty) return 0L
    val m = regs.length
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = regs(i) & 0xff
      invSum += java.lang.Math.pow(2.0, -r)
      if (r == 0) zeros += 1
      i += 1
    }
    val raw = alpha(m) * m * m / invSum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.round(est)
  }
}

/** hll_sketch(expr[, p]) → binary registers; map-side combining. */
case class HllSketchAggregate(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {
  Hll.requireP(p)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.add(buf, XxHash64Function.hash(v, child.dataType, 42L))
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = { Hll.maxInto(a, b); a }
  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(n: Int): HllSketchAggregate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllSketchAggregate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** hll_merge(sketchCol) → binary: union of already-built sketches (the
 * cross-batch rollup). Buffer starts empty and adopts the first sketch's
 * precision; mixing precisions is an error, never a silent wrong answer. */
case class HllMergeAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val s = v.asInstanceOf[Array[Byte]]
      // a zero-length sketch is the merge identity (a persisted rollup of
      // only-null inputs) — skip it instead of tripping the precision check
      if (s.isEmpty) buf
      else if (buf.isEmpty) s.clone()
      else { Hll.maxInto(buf, s); buf }
    }
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else { Hll.maxInto(a, b); a }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(n: Int): HllMergeAggregate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllMergeAggregate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** hll_estimate(sketch) → long; one codegen'd static call per row. */
case class HllEstimateExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Hll.estimate(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hll.estimate($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
