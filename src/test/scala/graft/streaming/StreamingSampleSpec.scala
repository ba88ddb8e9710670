package graft.streaming

import graft.TestSpark
import graft.pipeline.Curation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming weighted sample == batch weighted sample on the full prefix,
 * independent of batching and arrival order; replayed rows are no-ops
 * (content-addressed clocks are idempotent). */
class StreamingSampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("final per-key sample equals the batch sample; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(31)
    val rows = (0 until 300).map { i =>
      (s"dom${i % 3}", i.toLong, 0.5 + rnd.nextDouble() * 4)
    }
    val batches = rnd.shuffle(rows).grouped(100).toSeq

    val mem = MemoryStream[(String, Long, Double)]
    val out = StreamingSample.streamingWeightedSample(
      mem.toDF().toDF("dom", "id", "w"), "dom", "id", "w", k = 7)
    val q = out.writeStream.format("memory").queryName("graft_ssample")
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      // replay the first batch: idempotent, sample unchanged
      mem.addData(batches.head: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("graft_ssample")
      .withColumn("rn", monotonically_increasing_id())
      .groupBy(col("key"))
      .agg(max_by(col("sample_ids"), col("rn")).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap

    val batch = Curation.weightedSamplePerKey(
        rows.toDF("dom", "id", "w"), col("dom"), col("id"), col("w"), k = 7)
      .select(col("dom"), col("id")).collect()
      .groupBy(_.getString(0)).map { case (d, rs) => d -> rs.map(_.getLong(1)).toSet }

    assert(streamed === batch)
    assert(streamed.values.forall(_.size === 7))
  }
}
