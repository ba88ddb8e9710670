package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * approx_heavy_hitters(expr, k) — mergeable Misra–Gries frequency sketch
 * (Misra & Gries 1982; merge rule per Agarwal et al., "Mergeable summaries",
 * PODS'12): at most k counters; an unseen value decrements all counters when
 * the sketch is full, merge sums both sketches then subtracts the (k+1)-th
 * largest count. Guarantee: every value with true frequency > n/(k+1)
 * survives, and reported counts undercount by at most n/(k+1).
 *
 * Returns map<value, approxCount>. Distributed shape: constant-size state
 * per partition, map-side partial aggregation, one merge per partition — the
 * heavy-hitter query over 100 TB never shuffles raw values, only k-entry
 * sketches.
 */
case class HeavyHittersAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[Any, Long]] {

  require(k > 0, "approx_heavy_hitters needs k > 0")

  // atomic key types only: they hash/compare correctly in the java.util map
  // and serialize without a schema walk
  private def supported(dt: DataType): Boolean = dt match {
    case StringType | BooleanType | ByteType | ShortType | IntegerType |
         LongType | FloatType | DoubleType | DateType | TimestampType => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (supported(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"approx_heavy_hitters supports atomic key types, got ${child.dataType.sql}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(child.dataType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[Any, Long] =
    new java.util.HashMap[Any, Long]()

  private def copyKey(v: Any): Any = v match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.copy()
    case a: Array[Byte] => a.clone()
    case r: InternalRow => r.copy()
    case other => other
  }

  override def update(buf: java.util.HashMap[Any, Long], input: InternalRow): java.util.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val existing = buf.get(v)
      if (existing != 0L || buf.containsKey(v)) buf.put(copyKey(v), existing + 1L)
      else if (buf.size < k) buf.put(copyKey(v), 1L)
      else {
        // decrement-all; drop zeros (classic MG step)
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[Any, Long], b: java.util.HashMap[Any, Long]): java.util.HashMap[Any, Long] = {
    b.forEach { (key, cnt) =>
      val existing = a.get(key)
      a.put(key, (if (a.containsKey(key)) existing else 0L) + cnt)
    }
    if (a.size > k) {
      // subtract the (k+1)-th largest count, drop <= 0 (mergeable-MG rule)
      val counts = new Array[Long](a.size)
      var i = 0
      a.forEach { (_, c) => counts(i) = c; i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(a.size - k - 1)
      val it = a.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= sub) it.remove() else e.setValue(e.getValue - sub)
      }
    }
    a
  }

  override def eval(buf: java.util.HashMap[Any, Long]): Any = {
    val keys = new Array[Any](buf.size)
    val vals = new Array[Any](buf.size)
    var i = 0
    buf.forEach { (key, c) => keys(i) = key; vals(i) = c; i += 1 }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  private def writeKey(dos: java.io.DataOutputStream, v: Any): Unit = child.dataType match {
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
    case other => throw new IllegalStateException(s"unreachable key type $other")
  }

  private def readKey(in: java.io.DataInputStream): Any = child.dataType match {
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
    case other => throw new IllegalStateException(s"unreachable key type $other")
  }

  override def serialize(buf: java.util.HashMap[Any, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.writeInt(buf.size)
    buf.forEach { (key, c) => writeKey(dos, key); dos.writeLong(c) }
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Any, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[Any, Long](n * 2)
    var i = 0
    while (i < n) { m.put(readKey(in), in.readLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(n: Int): HeavyHittersAggregate = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HeavyHittersAggregate = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}
