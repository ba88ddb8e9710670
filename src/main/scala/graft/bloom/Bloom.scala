package graft.bloom

import graft.functions.ValueBytes
import org.apache.parquet.column.values.bloomfilter.BlockSplitBloomFilter
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/**
 * Bloom filters (reference: impl/bloom (docs/advanced/blooms.md)) built on
 * parquet's BlockSplitBloomFilter — the same algorithm family the reference
 * wraps, already on every Spark classpath, SIMD-friendly block layout.
 *
 * small_bloom(expr, expectedItems, fpp) → binary, a standard aggregate with
 * map-side partial aggregation (buffers OR together). big_bloom additionally
 * buckets across an array of filters so capacity isn't limited by a single
 * byte[] (reference caps ~1.5b items; buckets scale linearly).
 */
object Bloom {
  def hashOf(value: Any, dt: DataType, filter: BlockSplitBloomFilter): Long = {
    val buf = new java.io.ByteArrayOutputStream(32)
    ValueBytes.append(buf, value, dt)
    filter.hash(Binary.fromConstantByteArray(buf.toByteArray))
  }

  def newFilter(expected: Long, fpp: Double): BlockSplitBloomFilter = {
    val bits = BlockSplitBloomFilter.optimalNumOfBits(expected, fpp)
    new BlockSplitBloomFilter(bits / 8)
  }

  def toBytes(f: BlockSplitBloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(f.getBitsetSize)
    f.writeTo(out)
    out.toByteArray
  }

  def orBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length, s"cannot merge blooms of different size: ${a.length} vs ${b.length}")
    val out = new Array[Byte](a.length)
    var i = 0
    while (i < a.length) { out(i) = (a(i) | b(i)).toByte; i += 1 }
    out
  }
}

/** small_bloom: single-filter aggregate → binary. */
case class BloomAggregate(
    child: Expression,
    expected: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BlockSplitBloomFilter] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BlockSplitBloomFilter = Bloom.newFilter(expected, fpp)

  override def update(buf: BlockSplitBloomFilter, input: InternalRow): BlockSplitBloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.insertHash(Bloom.hashOf(v, child.dataType, buf))
    buf
  }

  override def merge(a: BlockSplitBloomFilter, b: BlockSplitBloomFilter): BlockSplitBloomFilter =
    new BlockSplitBloomFilter(Bloom.orBytes(Bloom.toBytes(a), Bloom.toBytes(b)))

  override def eval(buf: BlockSplitBloomFilter): Any = Bloom.toBytes(buf)
  override def serialize(buf: BlockSplitBloomFilter): Array[Byte] = Bloom.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): BlockSplitBloomFilter =
    new BlockSplitBloomFilter(bytes)

  override def withNewMutableAggBufferOffset(n: Int): BloomAggregate = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomAggregate = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** big_bloom: bucketed array of filters → array<binary>; capacity scales with
 * bucket count instead of a single row-size-bound byte[]. */
case class BigBloomAggregate(
    child: Expression,
    expected: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[BlockSplitBloomFilter]] {

  // cap each bucket at ~64 MiB of bitset
  private val MaxBucketBytes = 64 * 1024 * 1024
  private lazy val numBuckets: Int = {
    val totalBytes = BlockSplitBloomFilter.optimalNumOfBits(expected, fpp) / 8
    math.max(1, math.ceil(totalBytes.toDouble / MaxBucketBytes).toInt)
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override def createAggregationBuffer(): Array[BlockSplitBloomFilter] =
    Array.fill(numBuckets)(Bloom.newFilter(math.max(1, expected / numBuckets), fpp))

  override def update(buf: Array[BlockSplitBloomFilter], input: InternalRow): Array[BlockSplitBloomFilter] = {
    val v = child.eval(input)
    if (v != null) {
      val h = Bloom.hashOf(v, child.dataType, buf(0))
      val bucket = ((h >>> 33) % numBuckets).toInt
      buf(bucket).insertHash(h)
    }
    buf
  }

  override def merge(a: Array[BlockSplitBloomFilter], b: Array[BlockSplitBloomFilter]): Array[BlockSplitBloomFilter] =
    a.zip(b).map { case (x, y) => new BlockSplitBloomFilter(Bloom.orBytes(Bloom.toBytes(x), Bloom.toBytes(y))) }

  override def eval(buf: Array[BlockSplitBloomFilter]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.map(Bloom.toBytes))

  override def serialize(buf: Array[BlockSplitBloomFilter]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(buf.length)
    buf.foreach { f => val b = Bloom.toBytes(f); dos.writeInt(b.length); dos.write(b) }
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[BlockSplitBloomFilter] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    Array.fill(in.readInt()) {
      val b = new Array[Byte](in.readInt()); in.readFully(b); new BlockSplitBloomFilter(b)
    }
  }

  override def withNewMutableAggBufferOffset(n: Int): BigBloomAggregate = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BigBloomAggregate = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}
