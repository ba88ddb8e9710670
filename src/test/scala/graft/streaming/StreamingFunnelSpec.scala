package graft.streaming

import graft.TestSpark
import graft.pipeline.Curation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming funnel == batch funnel on the full prefix: per-stage user
 * counts agree after in-order micro-batches, including out-of-order
 * step types, window cuts and mid-chain stalls. */
class StreamingFunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stage counts equal the batch funnel") {
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Long) = new java.sql.Timestamp(1700000000000L + m * 1000L)
    val rnd = new scala.util.Random(17)
    val steps = Seq("view", "click", "buy")
    // 40 users with random journeys; some complete, some stall, some
    // click before viewing
    val all = (0 until 40).flatMap { u =>
      val n = 2 + rnd.nextInt(6)
      (0 until n).map { i =>
        (u.toLong, ts(u * 100 + i * rnd.nextInt(20)), steps(rnd.nextInt(3)))
      }
    }.sortBy(_._2.getTime)
    val batches = all.grouped(all.size / 3 + 1).toSeq

    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = StreamingFunnel.streamingEventFunnel(
      mem.toDF().toDF("u", "ts", "t"), "u", "ts", "t", steps,
      windowSeconds = 60L, watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("graft_sfunnel")
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val finalStage = spark.table("graft_sfunnel")
      .groupBy(col("key")).agg(max(col("stage_reached")).as("stage"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val streamedCounts = (1 to 3).map(i => finalStage.values.count(_ >= i).toLong)

    val batch = Curation.eventFunnel(all.toDF("u", "ts", "t"),
        col("u"), col("ts"), col("t"), steps, windowSeconds = 60L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val batchCounts = (0 until 3).map(i => batch(i.toLong))

    assert(streamedCounts === batchCounts)
    assert(streamedCounts.head > 0)
  }
}
