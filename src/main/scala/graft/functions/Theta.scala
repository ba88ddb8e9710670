package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.types._

/**
 * KMV/theta distinct-value sketches (Bar-Yossef et al. 2002's k-minimum-values
 * estimator; the union/intersection/difference algebra follows Dasgupta et
 * al. 2016, "Theta-Sketch Framework", as popularized by Apache DataSketches)
 * as FIRST-CLASS mergeable BINARY values — the set-EXPRESSION piece
 * [[Hll]] cannot provide: an HLL register array supports union only, so
 * "how many 5-gram shingles do crawl A and crawl B SHARE" (overlap before a
 * cross-corpus dedup, contamination mass between a benchmark and a train
 * corpus, month-over-month novelty) has no HLL answer. A theta sketch keeps
 * the k smallest 63-bit hashes of the value set plus a threshold theta;
 * intersection and a-not-b operate on the retained samples directly.
 *
 * Why it matters at 100 TB: overlap telemetry between corpus snapshots must
 * not join the corpora. Sketch each side in one pass (mergeable across
 * batches and partitions, O(k) bytes), persist next to the data, and every
 * pairwise overlap/difference question afterwards is O(k) driver math on two
 * ~32 KiB blobs — no rescan, no shuffle.
 *
 * Operators (all registered for SQL):
 *  - `theta_sketch(expr[, k])` — aggregate → binary sketch (default k 4096,
 *    relative std error ~1/sqrt(k) ≈ 1.6%)
 *  - `theta_union(sketch)`     — aggregate rollup of sketches (cross-batch);
 *    mixed k unions fine (result adopts the smallest)
 *  - `theta_intersect(a, b)`   — scalar → binary sketch of the set overlap
 *  - `theta_a_not_b(a, b)`     — scalar → binary sketch of the difference
 *  - `theta_estimate(sketch)`  — long; EXACT whenever the distinct count
 *    never exceeded k (theta still at its max — the small-set regime)
 *
 * Wire format (BinaryType, big-endian): int k, long theta, int n, n sorted
 * ascending distinct longs, all in [0, theta). The empty byte array is the
 * merge identity (estimate 0). The bytes are a pure function of the input
 * SET and k — retained entries are the k smallest hashes and theta the
 * (k+1)-th smallest (or the incoming-theta minimum), both order-free — so
 * any batch/partition split unions to byte-identical sketches (spec-pinned,
 * mirroring [[Hll]]'s split-invariance contract).
 */
object Theta {

  /** Exclusive hash domain bound: hashes live in [0, 2^63). */
  val MaxTheta: Long = Long.MaxValue

  val DefaultK: Int = 4096

  def requireK(k: Int): Unit =
    require(k >= 16 && k <= (1 << 22),
      s"theta sketch k must be in 16..${1 << 22}, got $k")

  /** 63-bit value hash (sign bit cleared; seed differs from the HLL seed so
   * co-sketching the same column never correlates the two estimators). */
  def hash63(v: Any, dt: DataType): Long =
    XxHash64Function.hash(v, dt, 0xA17E7A5EEDL) & Long.MaxValue

  /** Mutable sketch state: the k smallest distinct hashes below theta.
   * `k == Int.MaxValue` is the union-identity sentinel (no input seen). */
  final class Buf(var k: Int, var theta: Long,
      val set: java.util.TreeSet[java.lang.Long]) {

    def add(h: Long): Unit =
      if (h < theta && set.add(h) && set.size > k)
        theta = set.pollLast() // evicted (k+1)-th smallest → exclusive bound

    /** Adopt a smaller nominal k (mixed-k union), re-trimming. */
    def shrinkK(nk: Int): Unit = if (nk < k) {
      k = nk
      while (set.size > k) theta = set.pollLast()
    }

    /** Adopt a smaller theta, dropping now-out-of-range entries. */
    def dropGE(t: Long): Unit = if (t < theta) {
      theta = t
      set.tailSet(t).clear()
    }

    def mergeBytes(bytes: Array[Byte]): Unit = if (bytes.nonEmpty) {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      shrinkK(bb.getInt())
      dropGE(bb.getLong())
      var n = bb.getInt()
      while (n > 0) { add(bb.getLong()); n -= 1 }
    }

    def serialize(): Array[Byte] =
      if (k == Int.MaxValue) Array.emptyByteArray
      else {
        val bb = java.nio.ByteBuffer.allocate(16 + 8 * set.size)
        bb.putInt(k).putLong(theta).putInt(set.size)
        val it = set.iterator()
        while (it.hasNext) bb.putLong(it.next())
        bb.array()
      }
  }

  def emptyBuf(): Buf = new Buf(Int.MaxValue, MaxTheta, new java.util.TreeSet)

  def newBuf(k: Int): Buf = { requireK(k); new Buf(k, MaxTheta, new java.util.TreeSet) }

  def deserialize(bytes: Array[Byte]): Buf = {
    val b = emptyBuf()
    b.mergeBytes(bytes)
    b
  }

  /** Parse to (k, theta, sorted entries); empty bytes → identity sketch. */
  private def parse(bytes: Array[Byte]): (Int, Long, Array[Long]) =
    if (bytes.isEmpty) (Int.MaxValue, MaxTheta, Array.emptyLongArray)
    else {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val k = bb.getInt()
      val theta = bb.getLong()
      val n = bb.getInt()
      val es = new Array[Long](n)
      var i = 0
      while (i < n) { es(i) = bb.getLong(); i += 1 }
      (k, theta, es)
    }

  private def emit(k: Int, theta: Long, es: Array[Long]): Array[Byte] =
    if (k == Int.MaxValue) Array.emptyByteArray
    else {
      val bb = java.nio.ByteBuffer.allocate(16 + 8 * es.length)
      bb.putInt(k).putLong(theta).putInt(es.length)
      es.foreach(bb.putLong)
      bb.array()
    }

  /** Sketch of the set intersection: min theta, retained samples present on
   * BOTH sides (entries are sorted, so a linear merge-walk suffices). */
  def intersect(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (ka, ta, ea) = parse(a)
    val (kb, tb, eb) = parse(b)
    val theta = math.min(ta, tb)
    val out = Array.newBuilder[Long]
    var i = 0
    var j = 0
    while (i < ea.length && j < eb.length && ea(i) < theta) {
      if (ea(i) == eb(j)) { out += ea(i); i += 1; j += 1 }
      else if (ea(i) < eb(j)) i += 1
      else j += 1
    }
    emit(math.min(ka, kb), theta, out.result())
  }

  /** Sketch of the set difference A \ B: A's retained samples below the min
   * theta that do not appear in B's retained set. */
  def aNotB(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (ka, ta, ea) = parse(a)
    val (_, tb, eb) = parse(b)
    val theta = math.min(ta, tb)
    val out = Array.newBuilder[Long]
    var i = 0
    var j = 0
    while (i < ea.length && ea(i) < theta) {
      while (j < eb.length && eb(j) < ea(i)) j += 1
      if (j >= eb.length || eb(j) != ea(i)) out += ea(i)
      i += 1
    }
    emit(ka, theta, out.result())
  }

  /** n/theta estimate; exact (just n) while theta never moved. */
  def estimate(bytes: Array[Byte]): Long = {
    val (_, theta, es) = parse(bytes)
    if (theta == MaxTheta) es.length.toLong
    else math.round(es.length.toDouble * (Long.MaxValue.toDouble / theta))
  }
}

/** theta_sketch(expr[, k]) → binary; map-side combining aggregate. */
case class ThetaSketchAggregate(
    child: Expression,
    k: Int = Theta.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Theta.Buf] {
  Theta.requireK(k)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Theta.Buf = Theta.newBuf(k)

  override def update(buf: Theta.Buf, input: InternalRow): Theta.Buf = {
    val v = child.eval(input)
    if (v != null) buf.add(Theta.hash63(v, child.dataType))
    buf
  }

  override def merge(a: Theta.Buf, b: Theta.Buf): Theta.Buf = {
    a.mergeBytes(b.serialize())
    a
  }

  override def eval(buf: Theta.Buf): Any = buf.serialize()
  override def serialize(buf: Theta.Buf): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): Theta.Buf = Theta.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchAggregate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchAggregate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** theta_union(sketchCol) → binary: rollup of already-built sketches (the
 * cross-batch path). Mixed-k inputs are legal — the union adopts the
 * smallest k, matching every retained entry's inclusion probability. */
case class ThetaUnionAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Theta.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Theta.Buf = Theta.emptyBuf()

  override def update(buf: Theta.Buf, input: InternalRow): Theta.Buf = {
    val v = child.eval(input)
    if (v != null) buf.mergeBytes(v.asInstanceOf[Array[Byte]])
    buf
  }

  override def merge(a: Theta.Buf, b: Theta.Buf): Theta.Buf = {
    a.mergeBytes(b.serialize())
    a
  }

  override def eval(buf: Theta.Buf): Any = buf.serialize()
  override def serialize(buf: Theta.Buf): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): Theta.Buf = Theta.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): ThetaUnionAggregate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaUnionAggregate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** theta_intersect(a, b) → binary; one codegen'd static call per row. */
case class ThetaIntersectExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any, b: Any): Any =
    Theta.intersect(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Theta.intersect($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** theta_a_not_b(a, b) → binary; one codegen'd static call per row. */
case class ThetaANotBExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any, b: Any): Any =
    Theta.aNotB(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Theta.aNotB($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** theta_estimate(sketch) → long; one codegen'd static call per row. */
case class ThetaEstimateExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Theta.estimate(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Theta.estimate($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
