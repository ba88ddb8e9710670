package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HLL sketches as persistable mergeable values: error bounds, exact
 * small-range (linear counting) regime, byte-identical incremental union
 * vs full scan, parquet round-trip, SQL registration. */
class HllSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("estimate error stays within the p=12 bound on 100k distinct longs") {
    val n = 100000L
    val est = spark.range(n)
      .agg(dsl.hll_sketch(col("id")).as("s"))
      .select(dsl.hll_estimate(col("s"))).as[Long].collect().head
    val relErr = math.abs(est - n).toDouble / n
    // 1.04/sqrt(4096) ~ 1.6% standard error; 5% is > 3 sigma
    assert(relErr < 0.05, s"estimate $est for $n distinct: ${relErr * 100}%% off")
  }

  test("small cardinalities hit linear counting and are near-exact; duplicates don't count") {
    val est = Seq("a", "b", "c", "a", "b", "a").toDF("x")
      .agg(dsl.hll_estimate(dsl.hll_sketch(col("x"))).as("e"))
      .as[Long].collect().head
    assert(est == 3L, s"expected exactly 3, got $est")
    // nulls are ignored, empty input estimates 0
    val withNull = Seq(Some("a"), None, Some("b")).toDF("x")
      .agg(dsl.hll_estimate(dsl.hll_sketch(col("x")))).as[Long].collect().head
    assert(withNull == 2L)
    val empty = Seq.empty[String].toDF("x")
      .agg(dsl.hll_estimate(dsl.hll_sketch(col("x")))).as[Long].collect().head
    assert(empty == 0L)
  }

  test("incremental union across batches is byte-identical to the full scan") {
    val full = spark.range(50000).toDF("id")
    val b1 = full.where(col("id") < 20000)
    val b2 = full.where(col("id") >= 15000) // overlapping batches — a retry shape
    def sketch(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      df.agg(dsl.hll_sketch(col("id")).as("s")).select("s").as[Array[Byte]].collect().head
    val merged = Seq(sketch(b1), sketch(b2)).toDF("s")
      .agg(dsl.hll_merge(col("s")).as("m")).select("m").as[Array[Byte]].collect().head
    assert(merged.toSeq == sketch(full).toSeq,
      "sketch union must equal the full-corpus sketch byte-for-byte")
  }

  test("per-key sketches persist to parquet and roll up across batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString
    def batch(lo: Long, hi: Long) = spark.range(lo, hi)
      .select((col("id") % 4).as("domain"), col("id"))
    // batch 1 sketches written as a plain parquet table
    batch(0, 8000).groupBy(col("domain")).agg(dsl.hll_sketch(col("id")).as("s"))
      .write.mode("overwrite").parquet(s"$dir/v1")
    // batch 2 rolls up against the stored sketches — O(batch), no rescan
    val rolled = spark.read.parquet(s"$dir/v1")
      .unionAll(batch(8000, 20000).groupBy(col("domain")).agg(dsl.hll_sketch(col("id")).as("s")))
      .groupBy(col("domain")).agg(dsl.hll_merge(col("s")).as("s"))
      .select(col("domain"), dsl.hll_estimate(col("s")).as("est"))
      .as[(Long, Long)].collect().toMap
    // truth: 5000 distinct ids per domain residue
    (0L until 4L).foreach { d =>
      val err = math.abs(rolled(d) - 5000L).toDouble / 5000.0
      assert(err < 0.05, s"domain $d estimate ${rolled(d)} too far from 5000")
    }
  }

  test("the empty identity sketch merges as a no-op and estimates 0") {
    // a rollup over only-null sketch rows emits a ZERO-LENGTH sketch; a
    // later cross-batch merge must treat it as identity, not a precision
    // mismatch crash
    val emptySketch = Seq[Option[Array[Byte]]](None).toDF("s")
      .agg(dsl.hll_merge(col("s")).as("m")).select("m").as[Array[Byte]].collect().head
    assert(emptySketch.isEmpty)
    assert(Seq(emptySketch).toDF("s")
      .agg(dsl.hll_estimate(dsl.hll_merge(col("s")))).as[Long].collect().head == 0L)
    val real = spark.range(1000).agg(dsl.hll_sketch(col("id")).as("s"))
      .select("s").as[Array[Byte]].collect().head
    // identity on either side, any order
    for (batch <- Seq(Seq(emptySketch, real), Seq(real, emptySketch))) {
      val merged = batch.toDF("s").coalesce(1)
        .agg(dsl.hll_merge(col("s")).as("m")).select("m").as[Array[Byte]].collect().head
      assert(merged.toSeq == real.toSeq, "empty sketch must merge as identity")
    }
  }

  test("mixed precisions refuse to merge; p is validated") {
    val s8 = spark.range(100).agg(dsl.hll_sketch(col("id"), 8).as("s"))
      .select("s").as[Array[Byte]].collect().head
    val s12 = spark.range(100).agg(dsl.hll_sketch(col("id"), 12).as("s"))
      .select("s").as[Array[Byte]].collect().head
    assert(s8.length == 256 && s12.length == 4096)
    val ex = intercept[Exception] {
      Seq(s8, s12).toDF("s").agg(dsl.hll_merge(col("s"))).collect()
    }
    assert(ex.getMessage != null)
    intercept[IllegalArgumentException] { dsl.hll_sketch(col("x"), 3) }
    intercept[IllegalArgumentException] { dsl.hll_sketch(col("x"), 19) }
  }

  test("registered for plain SQL") {
    spark.range(1000).createOrReplaceTempView("graft_hll_ids")
    val est = spark.sql(
      "SELECT hll_estimate(hll_sketch(id)) FROM graft_hll_ids")
      .as[Long].collect().head
    assert(math.abs(est - 1000L) <= 50)
    val estP = spark.sql(
      "SELECT hll_estimate(hll_merge(s)) FROM (SELECT hll_sketch(id, 10) AS s FROM graft_hll_ids GROUP BY id % 8)")
      .as[Long].collect().head
    assert(math.abs(estP - 1000L) <= 100)
  }
}
