package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Token-bucket throttling: exact micro-token arithmetic, burst
 * absorption, refill clamping, and stream == batch parity across
 * triggers. */
class StreamingThrottleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)

  test("batch twin: refill by event-time gap, clamp at burst, spend one per event") {
    val rows = Seq(
      (7L, ts(0), 1L),    // full bucket (2) → allowed, 1.0 left
      (7L, ts(100), 2L),  // +0.1 → 1.1 → allowed, 0.1 left
      (7L, ts(200), 3L),  // +0.1 → 0.2 → THROTTLED
      (7L, ts(2000), 4L), // +1.8 → 2.0 (capped) → allowed
      (8L, ts(0), 5L))    // other key: independent bucket
      .toDF("k", "ts", "id")
    val got = StreamingThrottle.tokenBucketBatch(rows, "k", "ts", "id",
        ratePerSec = 1L, burst = 2L)
      .as[(Long, Long, Boolean)].collect().map(r => r._2 -> r._3).toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> false, 4L -> true, 5L -> true))
  }

  test("burst absorbs same-instant volleys in id order") {
    val rows = (1L to 5L).map(i => (1L, ts(0), i)).toDF("k", "ts", "id")
    val got = StreamingThrottle.tokenBucketBatch(rows, "k", "ts", "id", 10L, 3L)
      .as[(Long, Long, Boolean)].collect().map(r => r._2 -> r._3).toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> true, 4L -> false, 5L -> false))
  }

  test("huge rate x weeks-long idle gap does not overflow the refill (stays allowed)") {
    // pre-fix, (t - lastMs) * ratePerSec * 1000 overflowed Long negative for
    // ratePerSec ~1e7 and a multi-week gap, wrongly throttling everything after
    val weekMs = 7L * 24 * 3600 * 1000
    val rows = Seq(
      (1L, ts(0), 1L),             // spends the initial token
      (1L, ts(0), 2L),             // bucket empty → throttled
      (1L, ts(3 * weekMs), 3L))    // 3-week gap, refill must saturate, not overflow
      .toDF("k", "ts", "id")
    val got = StreamingThrottle.tokenBucketBatch(rows, "k", "ts", "id",
        ratePerSec = 10000000L, burst = 1L)
      .as[(Long, Long, Boolean)].collect().map(r => r._2 -> r._3).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("streamed decisions equal the batch fold on the full prefix") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    val all = (1L to 120L).map { i =>
      (rnd.nextInt(4).toLong, ts(i * 37 + rnd.nextInt(5)), i)
    }.sortBy(_._2.getTime)
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val out = StreamingThrottle.tokenBucket(
      mem.toDF().toDF("k", "ts", "id"), "k", "ts", "id",
      watermark = "10 seconds", ratePerSec = 5L, burst = 2L)
    val q = out.writeStream.format("memory").queryName("graft_throttle")
      .outputMode("append").start()
    try {
      all.grouped(40).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val streamed = spark.table("graft_throttle")
      .as[(Long, Long, Boolean)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val batch = StreamingThrottle.tokenBucketBatch(
        all.toDF("k", "ts", "id"), "k", "ts", "id", 5L, 2L)
      .as[(Long, Long, Boolean)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(streamed == batch)
    assert(streamed.values.exists(_ == false) && streamed.values.exists(_ == true))
  }
}
