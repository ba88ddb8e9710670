package graft.functions

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-min sketches as persistable mergeable values: one-sided error,
 * collision-free exactness at generous width, byte-identical split-invariant
 * merges, parquet roll-up, geometry-mismatch refusal, SQL registration. */
class CmsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Zipf-ish stream: key i appears i+1 times, i in 0..99. */
  private def stream: DataFrame =
    spark.range(100).select(col("id"), expr("sequence(0, cast(id as int))").as("r"))
      .select(col("id"), explode(col("r")))
      .select(concat(lit("key"), col("id")).as("k"))

  test("generous width: point estimates are exactly the true counts") {
    val sk = stream.agg(dsl.cms_sketch(col("k"), 65536, 4).as("s"))
      .select("s").as[Array[Byte]].collect().head
    val est = spark.range(100)
      .select(col("id"), concat(lit("key"), col("id")).as("k"))
      .select(col("id"), dsl.cms_estimate(lit(sk), col("k")).as("e"))
      .as[(Long, Long)].collect().toMap
    (0L until 100L).foreach { i =>
      assert(est(i) == i + 1, s"key$i: ${est(i)} vs ${i + 1}")
    }
    // a key never seen estimates 0 at this width
    val unseen = Seq("nope").toDF("k")
      .select(dsl.cms_estimate(lit(sk), col("k"))).as[Long].collect().head
    assert(unseen == 0L)
  }

  test("tight width: estimates one-sided (>= true) and within the 2N/w bound") {
    val n = 100 * 101 / 2 // total increments
    val w = 64
    val sk = stream.agg(dsl.cms_sketch(col("k"), w, 4).as("s"))
      .select("s").as[Array[Byte]].collect().head
    val est = spark.range(100)
      .select(col("id"), dsl.cms_estimate(lit(sk), concat(lit("key"), col("id"))).as("e"))
      .as[(Long, Long)].collect().toMap
    (0L until 100L).foreach { i =>
      assert(est(i) >= i + 1, s"cms must never undercount: key$i ${est(i)} < ${i + 1}")
      // 2N/w with a wide safety factor; deterministic seeds, so not flaky
      assert(est(i) <= i + 1 + 8L * n / w, s"key$i overshoot ${est(i) - i - 1}")
    }
  }

  test("merge across arbitrary batch splits is byte-identical to the full scan") {
    def sk(df: DataFrame): Array[Byte] =
      df.agg(dsl.cms_sketch(col("k"), 256, 4).as("s")).select("s").as[Array[Byte]].collect().head
    val full = sk(stream)
    val parts = Seq( // deterministic disjoint split of the same multiset
      sk(stream.where(xxhash64(col("k")) % 2 === 0)),
      sk(stream.where(xxhash64(col("k")) % 2 =!= 0)))
    val merged = parts.toDF("s").agg(dsl.cms_merge(col("s")).as("m"))
      .select("m").as[Array[Byte]].collect().head
    assert(merged.toSeq == full.toSeq, "sum-merge must equal the full-scan sketch")
    val shuffled = sk(stream.repartition(13))
    assert(shuffled.toSeq == full.toSeq, "partition layout must not change the bytes")
  }

  test("per-key sketch table persists to parquet and rolls up across batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cms").toString
    def batch(lo: Long, hi: Long) = spark.range(lo, hi)
      .select((col("id") % 3).as("domain"), concat(lit("u"), col("id") % 50).as("url"))
    batch(0, 3000).groupBy(col("domain")).agg(dsl.cms_sketch(col("url"), 1024, 4).as("s"))
      .write.mode("overwrite").parquet(s"$dir/v1")
    val rolled = spark.read.parquet(s"$dir/v1")
      .unionAll(batch(3000, 9000).groupBy(col("domain"))
        .agg(dsl.cms_sketch(col("url"), 1024, 4).as("s")))
      .groupBy(col("domain")).agg(dsl.cms_merge(col("s")).as("s"))
    val est = rolled
      .select(col("domain"), dsl.cms_estimate(col("s"), lit("u0")).as("e"))
      .as[(Long, Long)].collect().toMap
    // u0 comes from id % 50 == 0 rows: ids 0,50,...,8950 → 180 total, 60/domain
    assert(est == Map(0L -> 60L, 1L -> 60L, 2L -> 60L), s"got $est")
  }

  test("geometry mismatches refuse to merge; identity and nulls behave") {
    val a = stream.agg(dsl.cms_sketch(col("k"), 256, 4).as("s")).select("s").as[Array[Byte]].collect().head
    val b = stream.agg(dsl.cms_sketch(col("k"), 512, 4).as("s")).select("s").as[Array[Byte]].collect().head
    val ex = intercept[Exception] {
      Seq(a, b).toDF("s").agg(dsl.cms_merge(col("s"))).collect()
    }
    assert(ex.getMessage != null)
    val idOnly = Seq.empty[Array[Byte]].toDF("s")
      .agg(dsl.cms_merge(col("s"))).as[Array[Byte]].collect().head
    assert(idOnly.isEmpty)
    assert(Cms.estimate(idOnly, org.apache.spark.unsafe.types.UTF8String.fromString("x"),
      org.apache.spark.sql.types.StringType) == 0L)
    val withNulls = Seq(Some("a"), None, Some("a")).toDF("k")
      .agg(dsl.cms_estimate(dsl.cms_sketch(col("k"), 1024, 4), lit("a")))
      .as[Long].collect().head
    assert(withNulls == 2L)
  }

  test("registered for plain SQL including width/depth arguments") {
    Registry.registerAll(spark)
    spark.range(500).select((col("id") % 5).as("k")).createOrReplaceTempView("graft_cms_sql")
    val r = spark.sql(
      """SELECT cms_estimate(cms_sketch(k, 8192, 4), 3L) AS e
        |FROM graft_cms_sql""".stripMargin).as[Long].collect().head
    assert(r == 100L, s"got $r")
  }
}
