package graft.functions

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Theta/KMV sketches: exact small-set regime (estimate, intersect, a-not-b
 * all equal the true set ops while n <= k), estimation error in the trimmed
 * regime, byte-identical split-invariant unions, mixed-k unions, parquet
 * persistence, SQL registration, null/empty identities. */
class ThetaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sketchOf(df: DataFrame, c: String, k: Int = Theta.DefaultK): Array[Byte] =
    df.agg(dsl.theta_sketch(col(c), k).as("s")).select("s").as[Array[Byte]].collect().head

  test("exact regime: estimate, intersect and a_not_b equal true set operations") {
    // two overlapping string sets, both far below k
    val a = (0 until 600).map(i => s"tok_$i").toDF("x")
    val b = (400 until 900).map(i => s"tok_$i").toDF("x")
    val sa = sketchOf(a, "x")
    val sb = sketchOf(b, "x")
    assert(Theta.estimate(sa) == 600L)
    assert(Theta.estimate(sb) == 500L)
    assert(Theta.estimate(Theta.intersect(sa, sb)) == 200L) // 400..599
    assert(Theta.estimate(Theta.aNotB(sa, sb)) == 400L)     // 0..399
    assert(Theta.estimate(Theta.aNotB(sb, sa)) == 300L)     // 600..899
    // duplicates and nulls don't count
    val dup = Seq(Some("a"), Some("a"), None, Some("b")).toDF("x")
    assert(Theta.estimate(sketchOf(dup, "x")) == 2L)
  }

  test("trimmed regime: k=1024 estimate within 15% on 200k distinct (deterministic hash)") {
    val n = 200000L
    val est = spark.range(n).agg(
      dsl.theta_estimate(dsl.theta_sketch(col("id"), 1024))).as[Long].collect().head
    val relErr = math.abs(est - n).toDouble / n
    // 1/sqrt(1024) ~ 3.1% std error; 15% is ~5 sigma and the hash is seeded,
    // so this is a fixed deterministic reading, not a flake surface
    assert(relErr < 0.15, s"estimate $est for $n distinct: ${relErr * 100}%% off")
  }

  test("trimmed intersect: overlap of two 100k sets sharing 50k within 20%") {
    val a = spark.range(0, 100000)
    val b = spark.range(50000, 150000)
    val sa = sketchOf(a.toDF("id"), "id", 4096)
    val sb = sketchOf(b.toDF("id"), "id", 4096)
    val est = Theta.estimate(Theta.intersect(sa, sb)).toDouble
    assert(math.abs(est - 50000) / 50000 < 0.2, s"overlap estimate $est vs 50000")
    val diff = Theta.estimate(Theta.aNotB(sa, sb)).toDouble
    assert(math.abs(diff - 50000) / 50000 < 0.2, s"difference estimate $diff vs 50000")
  }

  test("union across arbitrary batch splits is byte-identical to the full-corpus sketch") {
    val full = spark.range(30000).toDF("id")
    val fullBytes = sketchOf(full, "id", 256) // trimmed regime: theta has moved
    // three overlapping batches in a different order, unioned as sketches
    val batches = Seq(
      sketchOf(full.where(col("id") >= 20000), "id", 256),
      sketchOf(full.where(col("id") < 12000), "id", 256),
      sketchOf(full.where(col("id").between(8000, 23000)), "id", 256))
    val merged = batches.toDF("s").agg(dsl.theta_union(col("s")).as("m"))
      .select("m").as[Array[Byte]].collect().head
    assert(merged.toSeq == fullBytes.toSeq,
      "theta union must equal the full-corpus sketch byte-for-byte")
    // and the sketch itself is partition-order invariant
    val shuffled = sketchOf(full.repartition(7, col("id")), "id", 256)
    assert(shuffled.toSeq == fullBytes.toSeq)
  }

  test("mixed-k union adopts the smaller k and stays a valid sketch") {
    val big = sketchOf(spark.range(50000).toDF("id"), "id", 2048)
    val small = sketchOf(spark.range(40000, 90000).toDF("id"), "id", 256)
    val merged = Seq(big, small).toDF("s").agg(dsl.theta_union(col("s")).as("m"))
      .select("m").as[Array[Byte]].collect().head
    val est = Theta.estimate(merged).toDouble
    assert(math.abs(est - 90000) / 90000 < 0.25, s"mixed-k union estimate $est vs 90000")
    // result k is the min — inclusion probability matches every retained entry
    val bb = java.nio.ByteBuffer.wrap(merged)
    assert(bb.getInt() == 256)
    // and the mixed-k union is merge-order invariant byte-for-byte
    val reversed = Seq(small, big).toDF("s").coalesce(1)
      .agg(dsl.theta_union(col("s")).as("m")).select("m").as[Array[Byte]].collect().head
    assert(reversed.toSeq == merged.toSeq, "mixed-k union must not depend on merge order")
  }

  test("identities: empty input, null-only input, empty-sketch operands") {
    val empty = Seq.empty[String].toDF("x")
      .agg(dsl.theta_sketch(col("x"))).as[Array[Byte]].collect().head
    assert(Theta.estimate(empty) == 0L)
    val nullOnly = Seq.empty[Array[Byte]].toDF("s")
      .agg(dsl.theta_union(col("s"))).as[Array[Byte]].collect().head
    assert(nullOnly.isEmpty && Theta.estimate(nullOnly) == 0L)
    val sa = sketchOf(Seq("a", "b").toDF("x"), "x")
    // intersect/diff against the identity sketch: empty-set semantics
    assert(Theta.estimate(Theta.intersect(sa, Array.emptyByteArray)) == 0L)
    assert(Theta.estimate(Theta.aNotB(sa, Array.emptyByteArray)) == 2L)
    assert(Theta.estimate(Theta.aNotB(Array.emptyByteArray, sa)) == 0L)
  }

  test("sketches persist to parquet and answer overlap questions without a rescan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_theta").toString
    def month(lo: Long, hi: Long) = spark.range(lo, hi)
      .select((col("id") % 3).as("domain"), concat(lit("u"), col("id")).as("url"))
    month(0, 9000).groupBy(col("domain"))
      .agg(dsl.theta_sketch(col("url"), 65536).as("s"))
      .write.mode("overwrite").parquet(s"$dir/jan")
    month(6000, 15000).groupBy(col("domain"))
      .agg(dsl.theta_sketch(col("url"), 65536).as("s"))
      .write.mode("overwrite").parquet(s"$dir/feb")
    val jan = spark.read.parquet(s"$dir/jan").withColumnRenamed("s", "sa")
    val feb = spark.read.parquet(s"$dir/feb").withColumnRenamed("s", "sb")
    val rows = jan.join(feb, "domain")
      .select(col("domain"),
        dsl.theta_estimate(dsl.theta_intersect(col("sa"), col("sb"))).as("shared"),
        dsl.theta_estimate(dsl.theta_a_not_b(col("sb"), col("sa"))).as("novel"))
      .as[(Long, Long, Long)].collect().map { case (d, s, _) => d -> s }.toMap
    val expectShared = (6000L until 9000L).groupBy(_ % 3).view.mapValues(_.size.toLong).toMap
    val expectNovel = (9000L until 15000L).groupBy(_ % 3).view.mapValues(_.size.toLong).toMap
    val novel = jan.join(feb, "domain")
      .select(col("domain"), dsl.theta_estimate(dsl.theta_a_not_b(col("sb"), col("sa"))))
      .as[(Long, Long)].collect().toMap
    (0L until 3L).foreach { d =>
      assert(rows(d) == expectShared(d), s"domain $d shared: ${rows(d)} vs ${expectShared(d)}")
      assert(novel(d) == expectNovel(d), s"domain $d novel: ${novel(d)} vs ${expectNovel(d)}")
    }
  }

  test("registered for plain SQL, including the k argument") {
    Registry.registerAll(spark)
    spark.range(1000).createOrReplaceTempView("graft_theta_sql")
    val one = spark.sql(
      """SELECT theta_estimate(theta_sketch(id)) AS n,
        |       theta_estimate(theta_sketch(id, 64)) AS approx
        |FROM graft_theta_sql""".stripMargin).as[(Long, Long)].collect().head
    assert(one._1 == 1000L)
    assert(one._2 > 300L && one._2 < 3000L)
    val pair = spark.sql(
      """SELECT theta_estimate(theta_intersect(a, b)) AS i,
        |       theta_estimate(theta_a_not_b(a, b)) AS d,
        |       theta_estimate(theta_union(s)) AS u
        |FROM (SELECT theta_sketch(CASE WHEN id < 600 THEN id END) AS a,
        |             theta_sketch(CASE WHEN id >= 400 THEN id END) AS b
        |      FROM graft_theta_sql) t,
        |     LATERAL (SELECT explode(array(a, b)) AS s) e
        |GROUP BY a, b""".stripMargin)
    // 0..599 vs 400..999: overlap 200, a-not-b 400, union 1000
    val r = pair.as[(Long, Long, Long)].collect().head
    assert(r == ((200L, 400L, 1000L)), s"got $r")
  }

  test("k bounds are refused, mismatched sketches still union (k is data, not shape)") {
    intercept[IllegalArgumentException](Theta.requireK(8))
    intercept[IllegalArgumentException](Theta.requireK((1 << 22) + 1))
  }
}
