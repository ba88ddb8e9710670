package graft.functions

import graft.TestSpark
import graft.rules.Id
import org.scalatest.funsuite.AnyFunSuite

/** Property-style checks over seeded random samples (the offline cache has
 * no scalatest↔scalacheck bridge, so sampling is hand-rolled). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val rng = new scala.util.Random(20260812L)

  test("pack/unpack round-trips int pairs incl. extremes") {
    val samples = Seq(Int.MinValue, -1, 0, 1, Int.MaxValue)
    for (id <- samples; v <- samples)
      assert(Id.unpack(Id.pack(Id(id, v))) == Id(id, v))
    (1 to 1000).foreach { _ =>
      val (id, v) = (rng.nextInt(), rng.nextInt())
      assert(Id.unpack(Id.pack(Id(id, v))) == Id(id, v))
    }
  }

  test("long coercion is total with only documented outputs") {
    (Seq(Long.MinValue, -2L, -1L, 0L, 1L, 100000L, Long.MaxValue) ++
      Seq.fill(1000)(rng.nextLong())).foreach { l =>
      val r = RuleResultCoercion.toInt(l)
      assert(r == 0 || r == 100000 || r == -1 || r == -2, s"$l -> $r")
    }
  }

  test("fractional coercion scales to PassedInt basis") {
    (1 to 1000).foreach { _ =>
      val d = rng.nextDouble() * 0.9998 + 0.0001
      assert(RuleResultCoercion.toInt(d) == (d * 100000).toInt)
    }
  }

  test("murmur3-128 deterministic + sensitive to single-bit flips") {
    (1 to 500).foreach { _ =>
      val bytes = new Array[Byte](rng.nextInt(64) + 1)
      rng.nextBytes(bytes)
      assert(Murmur3x128.hash(bytes) == Murmur3x128.hash(bytes))
      val flipped = bytes.clone(); flipped(0) = (flipped(0) ^ 1).toByte
      assert(Murmur3x128.hash(flipped) != Murmur3x128.hash(bytes))
    }
  }

  test("xoroshiro streams deterministic per seed, divergent across seeds") {
    (1 to 200).foreach { _ =>
      val seed = rng.nextLong()
      val a = new Xoroshiro128PP(seed)
      val b = new Xoroshiro128PP(seed)
      val c = new Xoroshiro128PP(seed + 1)
      val as = Seq.fill(8)(a.nextLong())
      assert(as == Seq.fill(8)(b.nextLong()))
      assert(as != Seq.fill(8)(c.nextLong()))
    }
  }

  test("uuid string round-trips long pairs") {
    (1 to 1000).foreach { _ =>
      val (lo, hi) = (rng.nextLong(), rng.nextLong())
      val s = UuidUtils.uuid(lo, hi).toString
      val row = UuidUtils.toLongs(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(row.getLong(0) == lo && row.getLong(1) == hi)
    }
  }

  test("id base64 round-trips random ids") {
    (1 to 200).foreach { _ =>
      val bb = java.nio.ByteBuffer.allocate(20)
      val base = rng.nextInt(); val i0 = rng.nextLong(); val i1 = rng.nextLong()
      bb.putInt(base).putLong(i0).putLong(i1)
      val enc = java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(bb.array())
      val dec = java.util.Base64.getUrlDecoder.decode(enc)
      val rb = java.nio.ByteBuffer.wrap(dec)
      assert(rb.getInt == base && rb.getLong == i0 && rb.getLong == i1)
    }
  }
}
