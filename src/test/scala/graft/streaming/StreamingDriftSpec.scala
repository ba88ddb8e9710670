package graft.streaming

import graft.TestSpark
import graft.pipeline.Curation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamingDriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("windowed PSI vs a reference sketch: matching window 0, shifted window high") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.dsl.log_histogram
    // the reference: a "past release" histogram of values 10..59
    val refVals = (1L to 200L).map(i => (i % 50 + 10).toDouble)
    val ref = refVals.toDF("v").agg(log_histogram(col("v")).as("h"))
      .collect()(0).getMap[Int, Long](0).toMap

    val mem = MemoryStream[(Timestamp, Double)]
    val out = StreamingDrift.windowedDrift(
      mem.toDF().toDF("ts", "v"), "ts", col("v"), ref, "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("drift_stream")
      .outputMode("append").start()
    try {
      val w1 = Timestamp.valueOf("2026-01-01 10:01:00")
      val w2 = Timestamp.valueOf("2026-01-01 10:15:00")
      // window 1: the same distribution as the reference
      refVals.foreach(v => mem.addData((w1, v)))
      // window 2: everything 100x — a decade shift
      refVals.foreach(v => mem.addData((w2, v * 100)))
      // late tick far ahead closes both windows past the watermark
      mem.addData((Timestamp.valueOf("2026-01-01 11:00:00"), 30.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM drift_stream ORDER BY window_start")
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      assert(rows.length == 2)
      assert(rows(0) == ((200L, 0L))) // identical distribution → PSI exactly 0
      assert(rows(1)._1 == 200L && rows(1)._2 > 250000000L) // way past 0.25
      // the streamed window scores the SAME PSI the batch release check would
      val batch = Curation.distributionDrift(
          refVals.toDF("v"), refVals.map(_ * 100).toDF("v"), col("v"))
        .collect()(0).getLong(0)
      assert(rows(1)._2 == batch)
    } finally q.stop()
  }

  test("windowed per-rule stats on a stream match the batch ruleStats math") {
    implicit val sqlCtx = spark.sqlContext
    import graft.rules._
    val suite = RuleSuite(Id(1, 1), Seq(RuleSet(Id(10, 1), Seq(
      Rule(Id(100, 1), "v >= 0"),
      Rule(Id(101, 1), "CASE WHEN v < 100 THEN 1 ELSE -1 END"),
      Rule(Id(102, 1), "disabled_rule()")))))
    val mem = MemoryStream[(Timestamp, Double)]
    val out = StreamingDq.windowedRuleStats(
      mem.toDF().toDF("ts", "v"), suite, "ts", "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("rule_stats_stream")
      .outputMode("append").start()
    try {
      val w = Timestamp.valueOf("2026-01-01 10:01:00")
      Seq(5.0, -3.0, 150.0, 42.0).foreach(v => mem.addData((w, v)))
      mem.addData((Timestamp.valueOf("2026-01-01 11:00:00"), 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
          "SELECT ruleId, evaluated, passed, failed, soft_failed, disabled, pass_rate_ppm " +
          "FROM rule_stats_stream WHERE window_start = '2026-01-01 10:00:00' ORDER BY ruleId")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), if (r.isNullAt(6)) -1L else r.getLong(6)))
      assert(rows(0) == ((100, 4L, 3L, 1L, 0L, 0L, 750000L))) // -3 fails v >= 0
      assert(rows(1) == ((101, 4L, 3L, 0L, 1L, 0L, 750000L))) // 150 soft-fails
      // a fully-disabled rule reports NULL pass rate (denominator
      // evaluated - disabled = 0), matching batch ruleStats — not 0%
      assert(rows(2) == ((102, 4L, 0L, 0L, 0L, 4L, -1L)))
    } finally q.stop()
  }
}
