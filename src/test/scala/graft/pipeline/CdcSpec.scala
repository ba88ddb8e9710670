package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Content-defined chunking: boundary determinism, min/max clamps,
 * resynchronization after insertion (the property fixed-size blocking
 * lacks), corpus stats, shared-pair discovery, codegen. */
class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def blob(seed: Int, n: Int): Array[Byte] = {
    val r = new scala.util.Random(seed)
    val b = new Array[Byte](n); r.nextBytes(b); b
  }

  private def chunksLocal(data: Array[Byte], minSize: Int = 256,
      avgBits: Int = 10, maxSize: Int = 8192): Seq[(Long, Long, Long)] = {
    val df = Seq(Tuple1(data)).toDF("d")
      .select(explode(Cdc.chunksOf(col("d"), minSize, avgBits, maxSize)).as("c"))
      .select("c.off", "c.len", "c.hash")
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("chunks tile the blob exactly; min/max sizes respected") {
    val d = blob(1, 50000)
    val cs = chunksLocal(d)
    assert(cs.head._1 === 0L)
    assert(cs.map(_._2).sum === d.length.toLong)
    cs.sliding(2).foreach { case Seq(a, b) => assert(a._1 + a._2 === b._1); case _ => }
    cs.dropRight(1).foreach { c =>
      assert(c._2 >= 256L && c._2 <= 8192L, s"chunk size ${c._2}")
    }
  }

  test("insertion resynchronizes: most chunk hashes survive the shift") {
    val base = blob(2, 40000)
    val mutated = base.take(20000) ++ "INSERTED BYTES".getBytes ++ base.drop(20000)
    val a = chunksLocal(base).map(_._3).toSet
    val b = chunksLocal(mutated).map(_._3).toSet
    val shared = a.intersect(b).size
    assert(shared >= a.size * 6 / 10, s"only $shared of ${a.size} chunks survived")
  }

  test("sharedPairs finds the planted shifted duplicate and nothing else") {
    val base = blob(3, 30000)
    val shifted = "PREFIX".getBytes ++ base
    val unrelated = blob(4, 30000)
    val df = Seq((1L, base), (2L, shifted), (3L, unrelated)).toDF("id", "d")
      .repartition(3)
    val pairs = Cdc.sharedPairs(df, col("id"), col("d"), minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("chunkStats prices the duplication") {
    val base = blob(5, 20000)
    val df = Seq(Tuple1(base), Tuple1(base)).toDF("d")
    val r = Cdc.chunkStats(df, col("d")).collect().head
    assert(r.getLong(0) === 40000L)               // total bytes
    assert(r.getLong(3) === 20000L)               // unique bytes
    assert(r.getLong(4) === 500000L)              // 50% dedup ratio
  }

  test("deterministic across partitionings and under codegen-fallback off") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val d = blob(6, 10000)
      val a = chunksLocal(d)
      val b = chunksLocal(d)
      assert(a === b && a.nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }
}
