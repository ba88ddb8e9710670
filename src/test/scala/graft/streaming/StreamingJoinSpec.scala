package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join: inner parity with the batch join,
 * right-outer "conversion with no touch" rows after watermark close, and
 * the missing-watermark refusal. */
class StreamingJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)

  // clicks (user, ts, page) and buys (user, ts, amount); buy at +40s and
  // +400s of the click, lookback 60s — only the first attributes
  private val clicks = Seq(
    (1L, ts(0), "a"), (1L, ts(30), "b"), (2L, ts(10), "c"), (4L, ts(500), "d"))
  private val buys = Seq(
    (1L, ts(40), 9.0), (2L, ts(410), 5.0), (3L, ts(50), 7.0))

  private def batchJoin(joinType: String) =
    StreamingJoin.intervalJoin(
      clicks.toDF("user", "ts", "page"), buys.toDF("user", "ts", "amount"),
      "user", "ts", "ts", "60 seconds", joinType)

  test("inner stream result equals the batch interval join") {
    implicit val sqlCtx = spark.sqlContext
    val mc = MemoryStream[(Long, java.sql.Timestamp, String)]
    val mb = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val out = StreamingJoin.intervalJoin(
      mc.toDF().toDF("user", "ts", "page").withWatermark("ts", "10 seconds"),
      mb.toDF().toDF("user", "ts", "amount").withWatermark("ts", "10 seconds"),
      "user", "ts", "ts", "60 seconds")
    val q = out.writeStream.format("memory").queryName("graft_ssjoin")
      .outputMode("append").start()
    try {
      mc.addData(clicks: _*); mb.addData(buys.take(2): _*); q.processAllAvailable()
      mb.addData(buys.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("graft_ssjoin")
      .select("l_user", "l_page", "r_amount")
      .as[(Long, String, Double)].collect().toSet
    val batch = batchJoin("inner").select("l_user", "l_page", "r_amount")
      .as[(Long, String, Double)].collect().toSet
    assert(streamed == batch)
    assert(batch == Set((1L, "a", 9.0), (1L, "b", 9.0))) // only in-window pairs
  }

  test("right_outer emits conversion-without-touch rows once watermark closes") {
    implicit val sqlCtx = spark.sqlContext
    val mc = MemoryStream[(Long, java.sql.Timestamp, String)]
    val mb = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val out = StreamingJoin.intervalJoin(
      mc.toDF().toDF("user", "ts", "page").withWatermark("ts", "5 seconds"),
      mb.toDF().toDF("user", "ts", "amount").withWatermark("ts", "5 seconds"),
      "user", "ts", "ts", "60 seconds", joinType = "right_outer")
    val q = out.writeStream.format("memory").queryName("graft_ssjoin_ro")
      .outputMode("append").start()
    try {
      mc.addData(clicks: _*); mb.addData(buys: _*); q.processAllAvailable()
      // watermark-advancing flush events, filtered out of the assertions
      mc.addData((99L, ts(100000), "zz")); mb.addData((99L, ts(100000), 0.0))
      q.processAllAvailable()
      mc.addData((98L, ts(200000), "zz")); mb.addData((98L, ts(200000), 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val unmatched = spark.table("graft_ssjoin_ro")
      .where(col("r_user") < 90 && col("l_user").isNull)
      .select("r_user").as[Long].collect().toSet
    assert(unmatched == Set(2L, 3L)) // late buy and never-clicked user
    val batch = batchJoin("right_outer")
      .where(col("l_user").isNull).select("r_user").as[Long].collect().toSet
    assert(unmatched == batch)
  }

  test("streaming input without a watermark is refused") {
    implicit val sqlCtx = spark.sqlContext
    val mc = MemoryStream[(Long, java.sql.Timestamp, String)]
    intercept[IllegalArgumentException] {
      StreamingJoin.intervalJoin(
        mc.toDF().toDF("user", "ts", "page"),
        buys.toDF("user", "ts", "amount"),
        "user", "ts", "ts", "60 seconds")
    }
  }
}
