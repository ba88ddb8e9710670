package graft.streaming

import graft.TestSpark
import graft.operators.FuzzyJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming fuzzy dedup: inline-verified hits are a sound subset of the
 * batch join, cross-batch planted near-pairs are found, and the bounded
 * DP agrees with the full DP. */
class StreamingFuzzySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ed(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("boundedDistance agrees with the full DP and early-exits") {
    val rnd = new scala.util.Random(5)
    for (_ <- 0 until 200) {
      val a = (0 until rnd.nextInt(10)).map(_ => "abc"(rnd.nextInt(3))).mkString
      val b = (0 until rnd.nextInt(10)).map(_ => "abc"(rnd.nextInt(3))).mkString
      val full = ed(a, b)
      for (d <- 0 to 4) {
        val got = StreamingFuzzy.boundedDistance(a, b, d)
        assert(got === (if (full <= d) full else -1), s"'$a' '$b' d=$d")
      }
    }
  }

  test("cross-batch near-pairs found, all hits true, subset of batch join") {
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Long) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val strs = Map(
      0L -> "the quick brown fox jumps over the lazy dog",
      1L -> "the quick brown fox jumped over the lazy dog", // d=2 to 0
      2L -> "an entirely different headline about databases",
      3L -> "an entirely different headline about databases!", // d=1 to 2
      4L -> "short str", 5L -> "short sty")                    // d=1 pair
    val b1 = Seq((0L, strs(0L), ts(0)), (2L, strs(2L), ts(1)))
    val b2 = Seq((1L, strs(1L), ts(2)), (4L, strs(4L), ts(3)))
    val b3 = Seq((3L, strs(3L), ts(4)), (5L, strs(5L), ts(5)))

    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = StreamingFuzzy.streamingFuzzyPairs(
      mem.toDF().toDF("id", "s", "ts"), "id", "s", "ts",
      watermark = "1 hour", maxDist = 2)
    val q = out.writeStream.format("memory").queryName("graft_sfuzzy")
      .outputMode("append").start()
    try {
      Seq(b1, b2, b3).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val hits = spark.table("graft_sfuzzy")
      .select("id_a", "id_b", "dist").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // every hit is a true <= 2 pair with the exact distance
    hits.foreach { case (a, b, dd) => assert(ed(strs(a), strs(b)) === dd) }
    // the planted cross-batch pairs are all found
    assert(hits.contains((0L, 1L, 2)) && hits.contains((2L, 3L, 1)) &&
      hits.contains((4L, 5L, 1)))
    // sound subset of the complete batch sweep
    val batch = FuzzyJoin.editDistancePairs(
        strs.toSeq.toDF("id", "s"), col("id"), col("s"), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(hits.subsetOf(batch))
  }
}
