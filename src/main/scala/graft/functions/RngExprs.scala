package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression, Nondeterministic}
import org.apache.spark.sql.types._

/**
 * Partition-seeded PRNG streams (reference: impl/rng/RngExpression.scala,
 * docs/advanced/prng.md). The reference delegates to commons-rng; we ship a
 * fresh xoroshiro128++ (public algorithm, Blackman & Vigna) seeded through
 * SplitMix64, with one independent stream per (seed, partition) so executors
 * never coordinate — the 100 TB-safe layout.
 */
final class Xoroshiro128PP(seed0: Long) {
  private var s0 = 0L
  private var s1 = 0L
  locally {
    var x = seed0
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    s0 = next(); s1 = next()
    if (s0 == 0 && s1 == 0) s0 = 1
  }
  @inline private def rotl(v: Long, r: Int): Long = (v << r) | (v >>> (64 - r))
  def nextLong(): Long = {
    val r = rotl(s0 + s1, 17) + s0
    val t = s1 ^ s0
    s0 = rotl(s0, 49) ^ t ^ (t << 21)
    s1 = rotl(t, 28)
    r
  }
  def nextBytes(n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      var l = nextLong()
      var j = 0
      while (j < 8 && i < n) { out(i) = (l & 0xff).toByte; l >>>= 8; i += 1; j += 1 }
    }
    out
  }
}

trait RngBase extends Nondeterministic { self: Expression =>
  def seed: Long
  @transient protected var rng: Xoroshiro128PP = _
  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new Xoroshiro128PP(seed ^ (partitionIndex.toLong * 0x9e3779b97f4a7c15L + 1))
  override def nullable: Boolean = false
}

/** rng([algo[, seed]]) → struct<lower: long, higher: long>. */
case class RandomLongsExpression(seed: Long) extends LeafExpression with RngBase with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("lower", LongType, nullable = false),
    StructField("higher", LongType, nullable = false)))
  override protected def evalInternal(input: InternalRow): Any =
    InternalRow(rng.nextLong(), rng.nextLong())
}

/** rng_bytes([algo[, seed[, len]]]) → binary(len), default 16. */
case class RandomBytesExpression(numBytes: Int, seed: Long) extends LeafExpression with RngBase with CodegenFallback {
  override def dataType: DataType = BinaryType
  override protected def evalInternal(input: InternalRow): Any = rng.nextBytes(numBytes)
}
