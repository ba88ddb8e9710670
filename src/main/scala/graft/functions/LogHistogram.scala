package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._

/**
 * Log-bucketed histograms as persistable, mergeable MAP values — the
 * quantile-telemetry partner of [[Hll]]: where Spark's `approx_percentile`
 * computes a one-shot answer and discards its state, `log_histogram`
 * returns the state itself (map<int,bigint> of bucket → count) so
 * per-domain length/score distributions accumulate across ingest batches
 * in O(batch): sketch the new batch, `histogram_merge` with the stored
 * maps, write back, ask `histogram_quantile` any time.
 *
 * Buckets are log10-spaced: value x > 0 lands in bucket
 * floor(log10(x) · bucketsPerDecade + 1e-9) — the HdrHistogram-style
 * constant RELATIVE resolution that suits heavy-tailed pipeline signals
 * (doc lengths, token counts): relative quantile error is bounded by the
 * bucket width, 10^(1/bpd) - 1 (~12% at bpd=20, ~2.3% at bpd=100),
 * independent of the value range. The 1e-9 nudge makes the floor robust to
 * last-ulp libm differences at exact bucket boundaries, so the DuckDB
 * oracle reproduces every bucket id exactly. Values <= 0 count under the
 * reserved [[LogHistogram.UnderflowBucket]] — nothing silently drops —
 * and a quantile landing there reads 0.0.
 *
 * `histogram_quantile(map, q[, bpd])` walks buckets ascending to the
 * ceil(q·n)-th value and returns the bucket's geometric midpoint
 * 10^((b + 0.5)/bpd). Counts are exact longs and the map is emitted
 * key-sorted, so sketch bytes and estimates are pure functions of the
 * input MULTISET — merge across any batch split equals the full scan,
 * spec-pinned.
 */
object LogHistogram {

  val UnderflowBucket: Int = Int.MinValue

  def bucketOf(x: Double, bpd: Int): Int =
    if (java.lang.Double.isNaN(x) || x <= 0.0) UnderflowBucket
    else math.floor(math.log10(x) * bpd + 1e-9).toInt

  /** Approximate q-quantile from a bucket→count map (entries in any
   * order): the ceil(q·n)-th smallest value's bucket midpoint. Empty or
   * all-underflow histograms and q=0 landing in underflow read 0.0. */
  def quantile(keys: Array[Int], counts: Array[Long], q: Double, bpd: Int): Double = {
    require(q >= 0.0 && q <= 1.0, s"quantile q must be in [0, 1], got $q")
    val order = keys.indices.sortBy(keys(_))
    var n = 0L
    counts.foreach(n += _)
    if (n == 0L) return 0.0
    val target = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    var i = 0
    while (i < order.length) {
      val idx = order(i)
      cum += counts(idx)
      if (cum >= target) {
        val b = keys(idx)
        return if (b == UnderflowBucket) 0.0
        else math.pow(10.0, (b + 0.5) / bpd)
      }
      i += 1
    }
    0.0
  }

  private[functions] def sortedMap(m: java.util.HashMap[Integer, java.lang.Long]): MapData = {
    val keys = new Array[Int](m.size)
    val it = m.keySet().iterator()
    var i = 0
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys)
    new ArrayBasedMapData(
      new GenericArrayData(keys.map(k => k: Any)),
      new GenericArrayData(keys.map(k => m.get(Integer.valueOf(k)).longValue(): Any)))
  }

  private[functions] def serializeMap(m: java.util.HashMap[Integer, java.lang.Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(8 + m.size * 12)
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(m.size)
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      dos.writeInt(e.getKey)
      dos.writeLong(e.getValue)
    }
    out.toByteArray
  }

  private[functions] def deserializeMap(b: Array[Byte]): java.util.HashMap[Integer, java.lang.Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(b))
    val n = in.readInt()
    val m = new java.util.HashMap[Integer, java.lang.Long](n * 2)
    var i = 0
    while (i < n) { m.put(in.readInt(), in.readLong()); i += 1 }
    m
  }

  private[functions] def addInto(
      a: java.util.HashMap[Integer, java.lang.Long], key: Int, c: Long): Unit = {
    val prev = a.get(key)
    a.put(key, if (prev == null) c else prev + c)
  }
}

/** log_histogram(x[, bucketsPerDecade]) → map<int,bigint>; map-side
 * combining; nulls ignored, non-positives in the underflow bucket. */
case class LogHistogramAggregate(
    child: Expression,
    bpd: Int = 20,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[Integer, java.lang.Long]] {
  require(bpd >= 1 && bpd <= 1000, s"bucketsPerDecade must be in 1..1000, got $bpd")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(IntegerType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[Integer, java.lang.Long] =
    new java.util.HashMap[Integer, java.lang.Long]()

  override def update(
      buf: java.util.HashMap[Integer, java.lang.Long],
      input: InternalRow): java.util.HashMap[Integer, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v match {
        case d: java.lang.Double => d.doubleValue()
        case f: java.lang.Float => f.doubleValue()
        case l: java.lang.Long => l.doubleValue()
        case i: java.lang.Integer => i.doubleValue()
        case s: java.lang.Short => s.doubleValue()
        case b: java.lang.Byte => b.doubleValue()
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case other => throw new IllegalArgumentException(
          s"log_histogram needs a numeric column, got ${other.getClass.getName}")
      }
      LogHistogram.addInto(buf, LogHistogram.bucketOf(x, bpd), 1L)
    }
    buf
  }

  override def merge(
      a: java.util.HashMap[Integer, java.lang.Long],
      b: java.util.HashMap[Integer, java.lang.Long]): java.util.HashMap[Integer, java.lang.Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      LogHistogram.addInto(a, e.getKey, e.getValue)
    }
    a
  }

  override def eval(buf: java.util.HashMap[Integer, java.lang.Long]): Any =
    LogHistogram.sortedMap(buf)
  override def serialize(buf: java.util.HashMap[Integer, java.lang.Long]): Array[Byte] =
    LogHistogram.serializeMap(buf)
  override def deserialize(b: Array[Byte]): java.util.HashMap[Integer, java.lang.Long] =
    LogHistogram.deserializeMap(b)

  override def withNewMutableAggBufferOffset(n: Int): LogHistogramAggregate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): LogHistogramAggregate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** histogram_merge(map) → map<int,bigint>: monoidal sum of histograms —
 * the cross-batch rollup aggregate. */
case class HistogramMergeAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[Integer, java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(IntegerType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[Integer, java.lang.Long] =
    new java.util.HashMap[Integer, java.lang.Long]()

  override def update(
      buf: java.util.HashMap[Integer, java.lang.Long],
      input: InternalRow): java.util.HashMap[Integer, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val m = v.asInstanceOf[MapData]
      val ks = m.keyArray()
      val vs = m.valueArray()
      var i = 0
      while (i < m.numElements()) {
        LogHistogram.addInto(buf, ks.getInt(i), vs.getLong(i))
        i += 1
      }
    }
    buf
  }

  override def merge(
      a: java.util.HashMap[Integer, java.lang.Long],
      b: java.util.HashMap[Integer, java.lang.Long]): java.util.HashMap[Integer, java.lang.Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      LogHistogram.addInto(a, e.getKey, e.getValue)
    }
    a
  }

  override def eval(buf: java.util.HashMap[Integer, java.lang.Long]): Any =
    LogHistogram.sortedMap(buf)
  override def serialize(buf: java.util.HashMap[Integer, java.lang.Long]): Array[Byte] =
    LogHistogram.serializeMap(buf)
  override def deserialize(b: Array[Byte]): java.util.HashMap[Integer, java.lang.Long] =
    LogHistogram.deserializeMap(b)

  override def withNewMutableAggBufferOffset(n: Int): HistogramMergeAggregate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HistogramMergeAggregate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** histogram_quantile(map, q[, bpd]) → double; codegen'd static call. */
case class HistogramQuantileExpression(left: Expression, right: Expression, bpd: Int = 20)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(m: Any, q: Any): Any = {
    val md = m.asInstanceOf[MapData]
    val keys = new Array[Int](md.numElements())
    val counts = new Array[Long](md.numElements())
    var i = 0
    while (i < md.numElements()) {
      keys(i) = md.keyArray().getInt(i)
      counts(i) = md.valueArray().getLong(i)
      i += 1
    }
    LogHistogram.quantile(keys, counts, q.asInstanceOf[Double], bpd)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (m, q) => {
      val keys = ctx.freshName("graftHkeys")
      val counts = ctx.freshName("graftHcnts")
      val i = ctx.freshName("graftHi")
      s"""int[] $keys = new int[$m.numElements()];
         |long[] $counts = new long[$m.numElements()];
         |for (int $i = 0; $i < $m.numElements(); $i++) {
         |  $keys[$i] = $m.keyArray().getInt($i);
         |  $counts[$i] = $m.valueArray().getLong($i);
         |}
         |${ev.value} = graft.functions.LogHistogram.quantile($keys, $counts, $q, $bpd);
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
