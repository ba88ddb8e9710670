package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** One candidate held by the top-k heap. */
final class TopKEntry(val ord: Double, val item: Any)

/**
 * top_k_by(ord, item, k) — bounded top-k as a mergeable aggregate: the state
 * is a k-entry min-heap (worst surviving candidate at the head), updated in
 * O(log k) per row and merged associatively, so map-side partial aggregation
 * reduces every partition to ≤ k candidates per group BEFORE the shuffle.
 * This is the scale shape for per-query nearest-neighbour top-k: a
 * `row_number() over (partition by query)` window instead funnels every
 * scored corpus row of a query through one reducer — O(|corpus|) rows into a
 * single task — where this aggregate ships O(partitions × k).
 *
 * Returns array<struct<item, ord>> sorted best-first (ord desc, item asc);
 * ties broken by the item ordering so results are deterministic. Null or NaN
 * ord values and null items are ignored.
 */
case class TopKAggregate(
    ord: Expression,
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[TopKEntry]] {

  require(k > 0, "top_k_by needs k > 0")

  // atomic item types (or arrays of them): they compare via the interpreted
  // ordering and serialize without a full schema walk (same envelope as
  // HeavyHittersAggregate). Arrays exist for grouped vector selections like
  // the PQ codebook init (top-k subvectors per subspace in one pass).
  private def supportedAtomic(dt: DataType): Boolean = dt match {
    case StringType | BooleanType | ByteType | ShortType | IntegerType |
         LongType | FloatType | DoubleType | DateType | TimestampType => true
    case _ => false
  }
  private def supported(dt: DataType): Boolean = dt match {
    case ArrayType(et, _) => supportedAtomic(et)
    case other => supportedAtomic(other)
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (ord.dataType != DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_by needs a double ordering expression, got ${ord.dataType.sql}")
    else if (!supported(item.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_by supports atomic (or array-of-atomic) item types, got ${item.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(ord, item)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", item.dataType, nullable = false),
      StructField("ord", DoubleType, nullable = false))),
    containsNull = false)

  @transient private lazy val itemOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(item.dataType)

  // heap comparator: WORST candidate first — lower ord, then larger item
  @transient private lazy val worstFirst: java.util.Comparator[TopKEntry] =
    new java.util.Comparator[TopKEntry] {
      override def compare(a: TopKEntry, b: TopKEntry): Int = {
        val c = java.lang.Double.compare(a.ord, b.ord)
        if (c != 0) c else itemOrdering.compare(b.item, a.item)
      }
    }

  override def createAggregationBuffer(): java.util.PriorityQueue[TopKEntry] =
    new java.util.PriorityQueue[TopKEntry](k + 1, worstFirst)

  private def copyItem(v: Any): Any = v match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.copy()
    case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
    case other => other
  }

  private def offer(buf: java.util.PriorityQueue[TopKEntry], e: TopKEntry): Unit =
    if (buf.size < k) buf.add(e)
    else if (worstFirst.compare(buf.peek(), e) < 0) { // e beats current worst
      buf.poll()
      buf.add(e)
    }

  override def update(
      buf: java.util.PriorityQueue[TopKEntry], input: InternalRow): java.util.PriorityQueue[TopKEntry] = {
    val o = ord.eval(input)
    val v = item.eval(input)
    if (o != null && v != null) {
      val d = o.asInstanceOf[Double]
      if (!java.lang.Double.isNaN(d)) offer(buf, new TopKEntry(d, copyItem(v)))
    }
    buf
  }

  override def merge(
      a: java.util.PriorityQueue[TopKEntry],
      b: java.util.PriorityQueue[TopKEntry]): java.util.PriorityQueue[TopKEntry] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next())
    a
  }

  override def eval(buf: java.util.PriorityQueue[TopKEntry]): Any = {
    val n = buf.size
    val entries = new Array[TopKEntry](n)
    var i = n - 1
    while (i >= 0) { entries(i) = buf.poll(); i -= 1 } // heap drains worst-first
    // refill the buffer (eval must not destroy it — Spark may reuse)
    entries.foreach(buf.add)
    val rows = new Array[Any](n)
    i = 0
    while (i < n) {
      rows(i) = new GenericInternalRow(Array[Any](entries(i).item, entries(i).ord))
      i += 1
    }
    new GenericArrayData(rows)
  }

  private def writeAtomic(dos: java.io.DataOutputStream, dt: DataType, v: Any): Unit = dt match {
    case StringType =>
      val b = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      dos.writeInt(b.length); dos.write(b)
    case BooleanType => dos.writeBoolean(v.asInstanceOf[Boolean])
    case ByteType => dos.writeByte(v.asInstanceOf[Byte].toInt)
    case ShortType => dos.writeShort(v.asInstanceOf[Short].toInt)
    case IntegerType | DateType => dos.writeInt(v.asInstanceOf[Int])
    case LongType | TimestampType => dos.writeLong(v.asInstanceOf[Long])
    case FloatType => dos.writeFloat(v.asInstanceOf[Float])
    case DoubleType => dos.writeDouble(v.asInstanceOf[Double])
    case other => throw new IllegalStateException(s"unreachable item type $other")
  }

  private def readAtomic(in: java.io.DataInputStream, dt: DataType): Any = dt match {
    case StringType =>
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      org.apache.spark.unsafe.types.UTF8String.fromBytes(b)
    case BooleanType => in.readBoolean()
    case ByteType => in.readByte()
    case ShortType => in.readShort()
    case IntegerType | DateType => in.readInt()
    case LongType | TimestampType => in.readLong()
    case FloatType => in.readFloat()
    case DoubleType => in.readDouble()
    case other => throw new IllegalStateException(s"unreachable item type $other")
  }

  private def writeItem(dos: java.io.DataOutputStream, v: Any): Unit = item.dataType match {
    case ArrayType(et, _) =>
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = arr.numElements()
      dos.writeInt(n)
      var i = 0
      while (i < n) {
        val isNull = arr.isNullAt(i)
        dos.writeBoolean(isNull)
        if (!isNull) writeAtomic(dos, et, arr.get(i, et))
        i += 1
      }
    case dt => writeAtomic(dos, dt, v)
  }

  private def readItem(in: java.io.DataInputStream): Any = item.dataType match {
    case ArrayType(et, _) =>
      val n = in.readInt()
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) = if (in.readBoolean()) null else readAtomic(in, et)
        i += 1
      }
      new GenericArrayData(out)
    case dt => readAtomic(in, dt)
  }

  override def serialize(buf: java.util.PriorityQueue[TopKEntry]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val e = it.next()
      dos.writeDouble(e.ord)
      writeItem(dos, e.item)
    }
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[TopKEntry] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val q = new java.util.PriorityQueue[TopKEntry](math.max(n, k) + 1, worstFirst)
    var i = 0
    while (i < n) { q.add(new TopKEntry(in.readDouble(), readItem(in))); i += 1 }
    q
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKAggregate = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKAggregate = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(ord = cs(0), item = cs(1))
}
