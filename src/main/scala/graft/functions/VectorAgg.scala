package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Running element-wise sum + row count. */
final class VecSumState(var count: Long, var sums: Array[Double])

/**
 * vector_mean(arr) — element-wise mean of array<double> rows as ONE mergeable
 * aggregate: the state is a single (count, sums[dim]) pair per group, updated
 * in place and merged element-wise, so each partition ships one dim-length
 * array per group. The alternative — posexplode to (pos, x) rows and
 * groupBy(group, pos) — shuffles rows × dim exploded rows; at k-means
 * training over a 100 TB corpus that is the difference between a k×dim
 * shuffle and re-shuffling the corpus once per Lloyd iteration.
 *
 * Rows shorter than the longest seen are zero-padded; null rows are ignored.
 * Returns null for empty groups.
 */
case class VectorMeanAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecSumState] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_mean needs array<double>, got ${other.sql}")
    }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): VecSumState = new VecSumState(0L, Array.emptyDoubleArray)

  private def grow(s: VecSumState, n: Int): Unit =
    if (s.sums.length < n) s.sums = java.util.Arrays.copyOf(s.sums, n)

  override def update(buf: VecSumState, input: InternalRow): VecSumState = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      grow(buf, n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) buf.sums(i) += arr.getDouble(i)
        i += 1
      }
      buf.count += 1L
    }
    buf
  }

  override def merge(a: VecSumState, b: VecSumState): VecSumState = {
    grow(a, b.sums.length)
    var i = 0
    while (i < b.sums.length) { a.sums(i) += b.sums(i); i += 1 }
    a.count += b.count
    a
  }

  override def eval(buf: VecSumState): Any =
    if (buf.count == 0L) null
    else {
      val out = new Array[Any](buf.sums.length)
      var i = 0
      while (i < buf.sums.length) { out(i) = buf.sums(i) / buf.count; i += 1 }
      new GenericArrayData(out)
    }

  override def serialize(buf: VecSumState): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + 8 * buf.sums.length)
    bb.putLong(buf.count)
    bb.putInt(buf.sums.length)
    buf.sums.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val count = bb.getLong
    val n = bb.getInt
    val sums = new Array[Double](n)
    var i = 0
    while (i < n) { sums(i) = bb.getDouble; i += 1 }
    new VecSumState(count, sums)
  }

  override def withNewMutableAggBufferOffset(n: Int): VectorMeanAggregate = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): VectorMeanAggregate = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** Running element-wise min + max. */
final class VecMinMaxState(var count: Long, var mins: Array[Double], var maxs: Array[Double])

/**
 * vector_minmax(arr) — element-wise min and max of array<double> rows as ONE
 * mergeable aggregate (state: two dim-length arrays per group), the same
 * no-explode shape as [[VectorMeanAggregate]]. Feeds SQ8 scalar-quantizer
 * training, where the alternative per-dimension explode would shuffle
 * rows × dim. Rows shorter than the longest seen contribute only to the
 * dimensions they have; null rows and null elements are ignored. Returns
 * struct(mins, maxs), null for empty groups.
 */
case class VectorMinMaxAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecMinMaxState] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_minmax needs array<double>, got ${other.sql}")
    }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("mins", ArrayType(DoubleType, containsNull = false)),
    StructField("maxs", ArrayType(DoubleType, containsNull = false))))

  override def createAggregationBuffer(): VecMinMaxState =
    new VecMinMaxState(0L, Array.emptyDoubleArray, Array.emptyDoubleArray)

  private def grow(s: VecMinMaxState, n: Int): Unit =
    if (s.mins.length < n) {
      val old = s.mins.length
      s.mins = java.util.Arrays.copyOf(s.mins, n)
      s.maxs = java.util.Arrays.copyOf(s.maxs, n)
      java.util.Arrays.fill(s.mins, old, n, Double.PositiveInfinity)
      java.util.Arrays.fill(s.maxs, old, n, Double.NegativeInfinity)
    }

  override def update(buf: VecMinMaxState, input: InternalRow): VecMinMaxState = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      grow(buf, n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val x = arr.getDouble(i)
          if (x < buf.mins(i)) buf.mins(i) = x
          if (x > buf.maxs(i)) buf.maxs(i) = x
        }
        i += 1
      }
      buf.count += 1L
    }
    buf
  }

  override def merge(a: VecMinMaxState, b: VecMinMaxState): VecMinMaxState = {
    grow(a, b.mins.length)
    var i = 0
    while (i < b.mins.length) {
      if (b.mins(i) < a.mins(i)) a.mins(i) = b.mins(i)
      if (b.maxs(i) > a.maxs(i)) a.maxs(i) = b.maxs(i)
      i += 1
    }
    a.count += b.count
    a
  }

  override def eval(buf: VecMinMaxState): Any =
    if (buf.count == 0L) null
    else {
      // a dimension no row reached keeps ±Inf sentinels; clamp to 0-width
      val n = buf.mins.length
      val mins = new Array[Any](n)
      val maxs = new Array[Any](n)
      var i = 0
      while (i < n) {
        val lo = if (buf.mins(i).isPosInfinity) 0.0 else buf.mins(i)
        val hi = if (buf.maxs(i).isNegInfinity) lo else buf.maxs(i)
        mins(i) = lo
        maxs(i) = hi
        i += 1
      }
      InternalRow(new GenericArrayData(mins), new GenericArrayData(maxs))
    }

  override def serialize(buf: VecMinMaxState): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + 16 * buf.mins.length)
    bb.putLong(buf.count)
    bb.putInt(buf.mins.length)
    buf.mins.foreach(bb.putDouble)
    buf.maxs.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecMinMaxState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val count = bb.getLong
    val n = bb.getInt
    val mins = new Array[Double](n)
    val maxs = new Array[Double](n)
    var i = 0
    while (i < n) { mins(i) = bb.getDouble; i += 1 }
    i = 0
    while (i < n) { maxs(i) = bb.getDouble; i += 1 }
    new VecMinMaxState(count, mins, maxs)
  }

  override def withNewMutableAggBufferOffset(n: Int): VectorMinMaxAggregate = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): VectorMinMaxAggregate = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}
