package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Log-bucketed histograms as mergeable map values: exact bucket counts,
 * quantile error bounds, split-invariant merge, underflow contract,
 * parquet roll-up, SQL registration. */
class LogHistogramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("buckets are exact log10 cells; counts are exact; map is key-sorted") {
    val m = Seq(1.0, 9.9, 10.0, 99.0, 100.0, 0.5).toDF("x")
      .agg(dsl.log_histogram(col("x"), 1).as("h"))
      .select("h").as[Map[Int, Long]].collect().head
    // bpd=1: [1,10) → 0, [10,100) → 1, [100,1000) → 2, (0,1) → -1
    assert(m == Map(-1 -> 1L, 0 -> 2L, 1 -> 2L, 2 -> 1L))
    assert(m.keys.toSeq == m.keys.toSeq.sorted, "emitted map must be key-sorted")
  }

  test("quantile estimates carry the bucket-width relative error bound") {
    val n = 20000
    // deterministic heavy-tailed values: x = i^2 / 1000
    val df = spark.range(1, n + 1).select((col("id") * col("id") / 1000.0).as("x"))
    val bpd = 100 // ~2.3% bucket width
    val h = df.agg(dsl.log_histogram(col("x"), bpd).as("h"))
    val est = h.select(
        dsl.histogram_quantile(col("h"), lit(0.5), bpd).as("p50"),
        dsl.histogram_quantile(col("h"), lit(0.9), bpd).as("p90"),
        dsl.histogram_quantile(col("h"), lit(0.99), bpd).as("p99"))
      .as[(Double, Double, Double)].collect().head
    val xs = (1 to n).map(i => i.toDouble * i / 1000.0).sorted
    def truth(q: Double) = xs(math.max(0, math.ceil(q * n).toInt - 1))
    for ((e, q) <- Seq(est._1 -> 0.5, est._2 -> 0.9, est._3 -> 0.99)) {
      val rel = math.abs(e - truth(q)) / truth(q)
      assert(rel < 0.03, f"q=$q est $e vs ${truth(q)} — $rel%.3f rel err")
    }
  }

  test("merge across any batch split equals the full scan exactly") {
    val full = spark.range(1, 30000).select(col("id").cast("double").as("x"))
    def hist(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
      df.agg(dsl.log_histogram(col("x")).as("h")).select("h")
        .as[Map[Int, Long]].collect().head
    val parts = Seq(
      full.where(col("x") < 9000), full.where(col("x") >= 9000 && col("x") < 21000),
      full.where(col("x") >= 21000))
    val merged = parts.map(hist).map(m => Tuple1(m)).toDF("h")
      .agg(dsl.histogram_merge(col("h")).as("m")).select("m")
      .as[Map[Int, Long]].collect().head
    assert(merged == hist(full), "histogram union must equal the full-corpus histogram")
  }

  test("underflow: non-positives counted, quantiles there read 0.0; nulls ignored") {
    val m = Seq(Some(-5.0), Some(0.0), Some(2.0), None).toDF("x")
      .agg(dsl.log_histogram(col("x")).as("h"))
    val (hist, p25, p99) = m.select(col("h"),
        dsl.histogram_quantile(col("h"), lit(0.25)),
        dsl.histogram_quantile(col("h"), lit(0.99)))
      .as[(Map[Int, Long], Double, Double)].collect().head
    assert(hist(LogHistogram.UnderflowBucket) == 2L)
    assert(hist.values.sum == 3L) // null ignored
    assert(p25 == 0.0) // lands in underflow
    assert(p99 > 1.0 && p99 < 4.0) // the bucket holding 2.0
    // empty histogram → 0.0
    val empty = Seq.empty[Double].toDF("x")
      .agg(dsl.histogram_quantile(dsl.log_histogram(col("x")), lit(0.5)))
      .as[Double].collect().head
    assert(empty == 0.0)
  }

  test("per-key histograms persist to parquet and roll up across batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lh").toString
    def batch(lo: Long, hi: Long) = spark.range(lo, hi)
      .select((col("id") % 3).as("k"), (col("id") + 1).cast("double").as("x"))
    batch(0, 5000).groupBy(col("k")).agg(dsl.log_histogram(col("x")).as("h"))
      .write.mode("overwrite").parquet(s"$dir/v1")
    val rolled = spark.read.parquet(s"$dir/v1")
      .unionAll(batch(5000, 12000).groupBy(col("k")).agg(dsl.log_histogram(col("x")).as("h")))
      .groupBy(col("k")).agg(dsl.histogram_merge(col("h")).as("h"))
      .select(col("k"), dsl.histogram_quantile(col("h"), lit(0.5)).as("p50"))
      .as[(Long, Double)].collect().toMap
    // true median of 1..12000 is ~6000; 12% bucket width at bpd=20
    (0L until 3L).foreach { k =>
      assert(math.abs(rolled(k) - 6000.0) / 6000.0 < 0.13, s"k=$k p50 ${rolled(k)}")
    }
  }

  test("registered for plain SQL") {
    spark.range(1, 1001).createOrReplaceTempView("graft_lh_ids")
    val p50 = spark.sql(
      "SELECT histogram_quantile(log_histogram(id), 0.5) FROM graft_lh_ids")
      .as[Double].collect().head
    assert(math.abs(p50 - 500.0) / 500.0 < 0.13, s"p50 $p50")
    val p50b = spark.sql(
      """SELECT histogram_quantile(histogram_merge(h), 0.5, 100) FROM
        |(SELECT log_histogram(id, 100) AS h FROM graft_lh_ids GROUP BY id % 4)""".stripMargin)
      .as[Double].collect().head
    assert(math.abs(p50b - 500.0) / 500.0 < 0.03, s"p50b $p50b")
  }
}
