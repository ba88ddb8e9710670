package graft.streaming

import graft.TestSpark
import graft.functions.{Cms, Theta, dsl}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sketch-table maintenance: stream==batch byte identity,
 * replayed-batch protection (the count-min sum is not idempotent),
 * restart resume from the stored table, theta overlap queries over
 * stream-built sketches. */
class StreamingSketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_ssk").toString

  test("streamed HLL table is byte-identical to a batch-built one") {
    implicit val sqlCtx = spark.sqlContext
    val table = tmp() + "/t"
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingSketches.sketchTableBuilder(
        mem.toDF().toDF("domain", "url"), col("domain"), col("url"), table)
      .outputMode("update").start()
    try {
      mem.addData((0L until 2000L).map(i => (i % 3, i)): _*)
      q.processAllAvailable()
      mem.addData((1500L until 5000L).map(i => (i % 3, i)): _*) // overlap: union semantics
      q.processAllAvailable()
    } finally q.stop()
    val streamed = StreamingSketches.sketchTable(spark, table)
      .select(col("key"), col("s")).as[(Long, Array[Byte])].collect()
      .map { case (k, s) => k -> s.toSeq }.toMap
    val batch = spark.range(5000).select((col("id") % 3).as("k"), col("id"))
      .groupBy(col("k")).agg(dsl.hll_sketch(col("id")).as("s"))
      .as[(Long, Array[Byte])].collect().map { case (k, s) => k -> s.toSeq }.toMap
    assert(streamed == batch,
      "stream-built sketches must equal the batch build byte-for-byte")
  }

  test("replayed batch ids are skipped — the count-min sum cannot double-count") {
    val table = tmp() + "/t"
    val batch = spark.range(100).select((col("id") % 2).as("key"), (col("id") % 5).as("graft_v"))
    StreamingSketches.processBatch(batch, 0L, table, "cms", 1024)
    val once = StreamingSketches.sketchTable(spark, table)
      .select(col("key"), col("s")).as[(Long, Array[Byte])].collect()
      .map { case (k, s) => k -> s.toSeq }.toMap
    // at-least-once delivery replays the same batch id
    StreamingSketches.processBatch(batch, 0L, table, "cms", 1024)
    val twice = StreamingSketches.sketchTable(spark, table)
      .select(col("key"), col("s")).as[(Long, Array[Byte])].collect()
      .map { case (k, s) => k -> s.toSeq }.toMap
    assert(twice == once, "replayed batch must be a no-op")
    // a NEW batch id still merges
    StreamingSketches.processBatch(batch, 1L, table, "cms", 1024)
    val est = StreamingSketches.sketchTable(spark, table)
      .where(col("key") === 0L)
      .select(dsl.cms_estimate(col("s"), lit(0L))).as[Long].collect().head
    // key 0: graft_v==0 rows are ids ending 0 (10 per batch) x 2 batches
    assert(est == 20L, s"got $est")
  }

  test("restart resumes from the stored table; theta tables answer overlap") {
    val table = tmp() + "/t"
    def b(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(lit(1L).as("key"), concat(lit("u"), col("id")).as("graft_v"))
    StreamingSketches.processBatch(b(0, 600), 0L, table, "theta", 1 << 16)
    // "restart": a fresh builder continues at the next batch id
    StreamingSketches.processBatch(b(400, 900), 1L, table, "theta", 1 << 16)
    val s = StreamingSketches.sketchTable(spark, table)
      .select(col("s")).as[Array[Byte]].collect().head
    assert(Theta.estimate(s) == 900L) // union of 0..899, exact regime
    // overlap vs an independently built sketch — set algebra on two blobs
    val other = spark.range(850, 1000)
      .agg(dsl.theta_sketch(concat(lit("u"), col("id")), 1 << 16))
      .as[Array[Byte]].collect().head
    assert(Theta.estimate(Theta.intersect(s, other)) == 50L) // 850..899
  }

  test("unknown kinds are refused") {
    intercept[IllegalArgumentException] {
      StreamingSketches.sketchTableBuilder(
        spark.readStream.format("rate").load(), col("value"), col("value"),
        tmp(), kind = "bogus")
    }
  }
}
