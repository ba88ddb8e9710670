package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Deterministic byte serialization of Catalyst values for hashing
 * (reference behavior: impl/hash/MessageDigestHashExpression.scala — ours is
 * an independent, documented layout: type-stable, null-tagged, big-endian).
 */
object ValueBytes {
  def append(buf: java.io.ByteArrayOutputStream, v: Any, dt: DataType): Unit = {
    if (v == null) { buf.write(0); return }
    buf.write(1)
    dt match {
      case BooleanType => buf.write(if (v.asInstanceOf[Boolean]) 1 else 0)
      case ByteType => buf.write(v.asInstanceOf[Byte].toInt)
      case ShortType => writeLong(buf, v.asInstanceOf[Short].toLong)
      case IntegerType | DateType => writeLong(buf, v.asInstanceOf[Int].toLong)
      case LongType | TimestampType => writeLong(buf, v.asInstanceOf[Long])
      case FloatType => writeLong(buf, java.lang.Float.floatToIntBits(v.asInstanceOf[Float]).toLong)
      case DoubleType => writeLong(buf, java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
      case StringType =>
        val b = v.asInstanceOf[UTF8String].getBytes
        writeLong(buf, b.length.toLong); buf.write(b, 0, b.length)
      case BinaryType =>
        val b = v.asInstanceOf[Array[Byte]]
        writeLong(buf, b.length.toLong); buf.write(b, 0, b.length)
      case d: DecimalType =>
        val b = v.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue.toByteArray
        writeLong(buf, b.length.toLong); buf.write(b, 0, b.length)
      case s: StructType =>
        val row = v.asInstanceOf[InternalRow]
        s.fields.zipWithIndex.foreach { case (f, i) =>
          append(buf, if (row.isNullAt(i)) null else row.get(i, f.dataType), f.dataType)
        }
      case a: ArrayType =>
        val arr = v.asInstanceOf[ArrayData]
        writeLong(buf, arr.numElements().toLong)
        var i = 0
        while (i < arr.numElements()) {
          append(buf, if (arr.isNullAt(i)) null else arr.get(i, a.elementType), a.elementType)
          i += 1
        }
      case m: MapType =>
        val md = v.asInstanceOf[MapData]
        writeLong(buf, md.numElements().toLong)
        var i = 0
        while (i < md.numElements()) {
          append(buf, md.keyArray().get(i, m.keyType), m.keyType)
          append(buf, if (md.valueArray().isNullAt(i)) null else md.valueArray().get(i, m.valueType), m.valueType)
          i += 1
        }
      case other =>
        val s = v.toString.getBytes(StandardCharsets.UTF_8)
        writeLong(buf, s.length.toLong); buf.write(s, 0, s.length)
    }
  }

  private def writeLong(buf: java.io.ByteArrayOutputStream, l: Long): Unit = {
    var i = 56
    while (i >= 0) { buf.write(((l >>> i) & 0xff).toInt); i -= 8 }
  }

  def serialize(row: InternalRow, exprs: Seq[Expression]): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream(64)
    exprs.foreach { e => append(buf, e.eval(row), e.dataType) }
    buf.toByteArray
  }
}

/** MurmurHash3 x64 128-bit over the serialized bytes — public-domain
 * algorithm (Austin Appleby), fresh implementation. */
object Murmur3x128 {
  @inline private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))
  @inline private def fmix(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33; k
  }

  def hash(data: Array[Byte], seed: Long = 0L): (Long, Long) = {
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ad432745937fL
    var h1 = seed
    var h2 = seed
    val nblocks = data.length / 16
    val bb = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < nblocks) {
      var k1 = bb.getLong(i * 16)
      var k2 = bb.getLong(i * 16 + 8)
      k1 *= c1; k1 = rotl(k1, 31); k1 *= c2; h1 ^= k1
      h1 = rotl(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= c2; k2 = rotl(k2, 33); k2 *= c1; h2 ^= k2
      h2 = rotl(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }
    var k1 = 0L
    var k2 = 0L
    val tail = nblocks * 16
    val rem = data.length & 15
    var j = rem
    while (j > 8) { k2 ^= (data(tail + j - 1) & 0xffL) << ((j - 9) * 8); j -= 1 }
    if (rem > 8) { k2 *= c2; k2 = rotl(k2, 33); k2 *= c1; h2 ^= k2 }
    j = math.min(rem, 8)
    while (j > 0) { k1 ^= (data(tail + j - 1) & 0xffL) << ((j - 1) * 8); j -= 1 }
    if (rem > 0) { k1 *= c1; k1 = rotl(k1, 31); k1 *= c2; h1 ^= k1 }
    h1 ^= data.length; h2 ^= data.length
    h1 += h2; h2 += h1
    h1 = fmix(h1); h2 = fmix(h2)
    h1 += h2; h2 += h1
    (h1, h2)
  }
}

/**
 * digest_to_longs('SHA-256', f1, f2, …) → array<long> (reference:
 * impl/hash/MessageDigestHashExpression.scala). `asStruct` yields
 * struct<i0..iN> instead. Algo `MURMUR3_128` uses the local murmur;
 * anything else resolves through JDK MessageDigest.
 */
case class DigestToLongsExpression(children: Seq[Expression], algo: String, asStruct: Boolean)
    extends Expression with CodegenFallback {

  @transient private lazy val isMurmur = algo.equalsIgnoreCase("MURMUR3_128")
  @transient private lazy val digestLongs: Int =
    if (isMurmur) 2
    else (MessageDigest.getInstance(algo).getDigestLength + 7) / 8

  override def nullable: Boolean = false
  override def dataType: DataType =
    if (asStruct)
      StructType((0 until digestLongs).map(i => StructField(s"i$i", LongType, nullable = false)))
    else ArrayType(LongType, containsNull = false)

  override def eval(input: InternalRow): Any = {
    val bytes = ValueBytes.serialize(input, children)
    val longs: Array[Long] =
      if (isMurmur) { val (a, b) = Murmur3x128.hash(bytes); Array(a, b) }
      else {
        val md = MessageDigest.getInstance(algo)
        val d = md.digest(bytes)
        val padded = java.util.Arrays.copyOf(d, digestLongs * 8)
        val bb = java.nio.ByteBuffer.wrap(padded)
        Array.fill(digestLongs)(bb.getLong)
      }
    if (asStruct) InternalRow.fromSeq(longs.toSeq) else new GenericArrayData(longs)
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(children = cs)
}

/** 128-bit murmur3 of fields → struct<i0,i1> — backing for murmur3_id/hash_with. */
case class Murmur128Expression(children: Seq[Expression], seed: Long = 0L)
    extends Expression with CodegenFallback {
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("i0", LongType, nullable = false), StructField("i1", LongType, nullable = false)))
  override def eval(input: InternalRow): Any = {
    val (a, b) = Murmur3x128.hash(ValueBytes.serialize(input, children), seed)
    InternalRow(a, b)
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(children = cs)
}
