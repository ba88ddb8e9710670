package graft.streaming

import graft.TestSpark
import graft.pipeline.Anomaly
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming EWMA == batch EWMA on the full prefix: the carried state
 * folds micro-batches into the same doubles, alerts and counts the
 * batch operator computes in one pass. */
class StreamingAnomalySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Long) = new java.sql.Timestamp(1700000000000L + m * 60000L)

  test("three micro-batches land on the batch numbers; idle keys stay quiet") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    // 3 keys x 30 in-order events, values with jumps to trip the band
    val all = (0 until 90).map { i =>
      val k = i % 3
      (k.toLong, ts(i / 3), 50.0 + k * 10 + rnd.nextDouble() * 4 +
        (if (i % 17 == 0) 40.0 else 0.0))
    }
    val batches = all.grouped(30).toSeq

    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val out = StreamingAnomaly.streamingEwma(
      mem.toDF().toDF("key", "ts", "v"), "key", "ts", "v",
      watermark = "10 minutes", alpha = 0.25, band = 20.0)
    val q = out.writeStream.format("memory").queryName("graft_sewma")
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    // last emitted report per key == the batch fold over everything
    val streamed = spark.table("graft_sewma")
      .groupBy(col("key"))
      .agg(max_by(struct(col("n_events"), col("ewma_fp"), col("n_alerts")),
        col("n_events")).as("r"))
      .select(col("key"), col("r.*"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val batch = Anomaly.ewmaAnomalies(all.toDF("key", "ts", "v"),
        col("key"), col("ts"), col("v"), alpha = 0.25, band = 20.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(streamed === batch)
    assert(batch.values.exists(_._3 > 0L), "the jumps should have tripped alerts")
  }
}
