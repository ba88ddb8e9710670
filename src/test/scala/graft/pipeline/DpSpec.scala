package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Geometric-mechanism DP releases: exact scalar replication of the noise
 * derivation, two-sided-geometric shape, determinism/seed separation,
 * partition invariance, and the clamped-sum contract. */
class DpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Scalar reference: the same md5 → 52-bit → leading-zeros → floor/k
   * pipeline, straight from MessageDigest. */
  private def refNoise(key: String, kLog2: Int, seed: Long): Long = {
    def geom(sub: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$key:$seed:$sub".getBytes("UTF-8"))
      val hex = d.map(b => f"$b%02x").mkString.substring(0, 13)
      val u = java.lang.Long.parseLong(hex, 16)
      val lead = if (u == 0L) 52 else 52 - (64 - java.lang.Long.numberOfLeadingZeros(u))
      lead / kLog2
    }
    geom(0) - geom(1)
  }

  test("dpNoise replicates the scalar md5 derivation exactly") {
    val keys = (0 until 200).map(_.toString)
    val out = keys.toDF("k")
      .select(col("k"), Pii.dpNoise(col("k"), 1, 42L).as("n1"),
        Pii.dpNoise(col("k"), 3, 7L).as("n3"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    keys.foreach { k =>
      assert(out(k)._1 == refNoise(k, 1, 42L), s"k=$k kLog2=1")
      assert(out(k)._2 == refNoise(k, 3, 7L), s"k=$k kLog2=3")
    }
  }

  test("noise is two-sided geometric: symmetric, P(0)≈1/3 at α=1/2, tighter at α=1/8") {
    val n = 20000
    val noise1 = (0 until n).map(i => refNoise(s"key$i", 1, 0L))
    assert(math.abs(noise1.sum.toDouble / n) < 0.05) // unbiased
    val p0 = noise1.count(_ == 0L).toDouble / n
    assert(math.abs(p0 - 1.0 / 3.0) < 0.02, s"P(0)=$p0") // (1-α)/(1+α), α=1/2
    val p1 = noise1.count(v => math.abs(v) == 1L).toDouble / n
    assert(math.abs(p1 - 1.0 / 3.0) < 0.02, s"P(|1|)=$p1") // 2·α·(1−α)/(1+α)
    val noise3 = (0 until n).map(i => refNoise(s"key$i", 3, 0L))
    val q0 = noise3.count(_ == 0L).toDouble / n
    assert(math.abs(q0 - 7.0 / 9.0) < 0.02, s"α=1/8 P(0)=$q0")
  }

  test("dpCounts: deterministic, seed-separated, partition-invariant") {
    val df = (0 until 1000).map(i => (i % 7, i)).toDF("g", "v")
    def run(d: org.apache.spark.sql.DataFrame, seed: Long) =
      Pii.dpCounts(d, Seq(col("g")), kLog2 = 1, seed = seed)
        .as[(Int, Long)].collect().toMap
    val a = run(df, 42L)
    assert(run(df, 42L) == a)
    assert(run(df.repartition(17), 42L) == a) // partition-invariant
    assert(run(df, 43L) != a) // the seed is the secret
    // noise is bounded and centered: every release within ±52 of truth
    val truth = (0 until 1000).groupBy(_ % 7).view.mapValues(_.size.toLong).toMap
    a.foreach { case (g, c) => assert(math.abs(c - truth(g)) <= 52L) }
  }

  test("dp_noise is callable from plain spark.sql") {
    graft.functions.Registry.registerAll(spark)
    val n = spark.sql("SELECT dp_noise('5', 1, 42)").as[Long].collect()(0)
    assert(n == refNoise("5", 1, 42L))
  }

  test("distinct seeds never share a geometric substream (s and s+1 are independent)") {
    // pre-fix, noise(s) and noise(s+1) shared G_{s+1}: corr(noise(s), noise(s+1)) = -1/2.
    // With :seed:0/:seed:1 substream keying the sample correlation is ~0.
    val n = 20000
    val pairs = (0 until n).map(i => (refNoise(s"k$i", 1, 9L).toDouble,
      refNoise(s"k$i", 1, 10L).toDouble))
    val (xs, ys) = (pairs.map(_._1), pairs.map(_._2))
    val mx = xs.sum / n; val my = ys.sum / n
    val cov = pairs.map { case (x, y) => (x - mx) * (y - my) }.sum / n
    val sx = math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum / n)
    val sy = math.sqrt(ys.map(y => (y - my) * (y - my)).sum / n)
    val corr = cov / (sx * sy)
    assert(math.abs(corr) < 0.05, s"corr(seed 9, seed 10) = $corr")
  }

  test("release-id front door: different ids draw independent noise, same id replays") {
    val df = (0 until 500).map(i => (i % 5, i)).toDF("g", "v")
    def run(rel: String) =
      Pii.dpCounts(df, Seq(col("g")), 1, rel).as[(Int, Long)].collect().toMap
    val a = run("customers-2026-08")
    assert(run("customers-2026-08") == a) // replayable per release
    assert(run("customers-2026-09") != a) // fresh noise per release
    assert(Pii.releaseSeed("customers-2026-08") != Pii.releaseSeed("customers-2026-09"))
    val sums = Pii.dpSums(df, Seq(col("g")), col("v"), 100L, 1, "customers-2026-08")
      .as[(Int, Long)].collect().toMap
    val direct = Pii.dpSums(df, Seq(col("g")), col("v"), cap = 100L, kLog2 = 1,
      seed = Pii.releaseSeed("customers-2026-08")).as[(Int, Long)].collect().toMap
    assert(sums == direct)
  }

  test("null vs absent group parts draw distinct noise keys") {
    val df = Seq((Option("a"), Option.empty[String], 1),
      (Option.empty[String], Option("a"), 1)).toDF("x", "y", "v")
    val out = Pii.dpCounts(df, Seq(col("x"), col("y")), kLog2 = 1, seed = 0L)
      .select(col("dp_count")).as[Long].collect()
    // concat_ws alone would render both keys "a" and give identical noise;
    // the \u0000 sentinel separates them — both counts are 1 + noise but
    // the draws come from the distinct rendered keys
    val kA = refNoise("a\u0001\u0000", 1, 0L)
    val kB = refNoise("\u0000\u0001a", 1, 0L)
    assert(out.toSet == Set(1L + kA, 1L + kB))
  }

  test("dpSums clamps contributions to [0, cap] before noising") {
    val df = Seq((1, -50L), (1, 10L), (1, 999L), (2, 3L)).toDF("g", "v")
    val out = Pii.dpSums(df, Seq(col("g")), col("v"), cap = 100L, kLog2 = 1, seed = 5L)
      .as[(Int, Long)].collect().toMap
    // group 1: -50→0, 10→10, 999→100 ⇒ 110 + noise("1")
    assert(out(1) == 110L + refNoise("1", 1, 5L))
    assert(out(2) == 3L + refNoise("2", 1, 5L))
  }

  /** Scalar reference of the full exponential-mechanism quantile draw:
   * clamp → bucket → cum → utility → md5 Gumbel → argmax. */
  private def refQuantile(values: Seq[Double], q: Double, lo: Double,
      hi: Double, bins: Int, kLog2: Int, seed: Long): (Double, Long) = {
    val hist = new Array[Long](bins)
    values.foreach { v0 =>
      val v = math.min(math.max(v0, lo), hi)
      val b = math.min(math.floor((v - lo) / (hi - lo) * bins).toLong, bins - 1L)
      hist(b.toInt) += 1
    }
    val n = values.size.toDouble
    val target = math.floor(q * n)
    val scale = kLog2 * 0.6931471805599453 / 2.0
    var cum = 0L
    var bestScore = Double.NegativeInfinity
    var bestB = -1L
    for (b <- 0 until bins) {
      cum += hist(b)
      val u = -math.abs(cum.toDouble - target)
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dpq:$seed:$b".getBytes("UTF-8"))
      val hex = d.map(x => f"$x%02x").mkString.substring(0, 13)
      val u52 = java.lang.Long.parseLong(hex, 16)
      val gum = -math.log(-math.log((u52.toDouble + 0.5) / 4503599627370496.0))
      val score = scale * u + gum
      if (score > bestScore) { bestScore = score; bestB = b }
    }
    (lo + (bestB.toDouble + 0.5) * ((hi - lo) / bins), bestB)
  }

  test("dpQuantile replicates the scalar exponential-mechanism draw exactly") {
    val rnd = new scala.util.Random(7)
    val values = (0 until 500).map(_ => rnd.nextGaussian() * 100 + 300)
    val df = values.toDF("v").repartition(7)
    for ((q, seed) <- Seq((0.5, 42L), (0.9, 42L), (0.5, 43L), (0.1, 7L))) {
      val got = graft.pipeline.Pii.dpQuantile(
        df, col("v"), q, lo = -200.0, hi = 800.0, bins = 50,
        kLog2 = 4, seed = seed).collect().head
      val (ev, eb) = refQuantile(values, q, -200.0, 800.0, 50, 4, seed)
      assert(got.getLong(2) == eb, s"bucket q=$q seed=$seed")
      assert(got.getDouble(1) == ev, s"value q=$q seed=$seed")
    }
  }

  test("dpQuantiles: per-group draws replicate the scalar reference with group-keyed uniforms") {
    val rnd = new scala.util.Random(13)
    val rows = for (g <- Seq("a", "b", "c"); _ <- 0 until 200)
      yield (g, rnd.nextGaussian() * 50 + (if (g == "a") 100 else 400))
    val df = rows.toDF("g", "v").repartition(5)
    val got = graft.pipeline.Pii.dpQuantiles(
        df, Seq(col("g")), col("v"), 0.5, lo = 0.0, hi = 600.0, bins = 40,
        kLog2 = 4, seed = 9L)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getLong(3))).toMap
    // scalar reference: group key is the (escaped) group string itself
    def ref(g: String): (Double, Long) = {
      val values = rows.filter(_._1 == g).map(_._2)
      val bins = 40; val lo = 0.0; val hi = 600.0
      val hist = new Array[Long](bins)
      values.foreach { v0 =>
        val v = math.min(math.max(v0, lo), hi)
        hist(math.min(math.floor((v - lo) / (hi - lo) * bins).toLong, bins - 1L).toInt) += 1
      }
      val target = math.floor(0.5 * values.size.toDouble)
      val scale = 4 * 0.6931471805599453 / 2.0
      var cum = 0L; var bestScore = Double.NegativeInfinity; var bestB = -1L
      for (b <- 0 until bins) {
        cum += hist(b)
        val u = -math.abs(cum.toDouble - target)
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"dpq:$g:9:$b".getBytes("UTF-8"))
        val hex = d.map(x => f"$x%02x").mkString.substring(0, 13)
        val u52 = java.lang.Long.parseLong(hex, 16)
        val gum = -math.log(-math.log((u52.toDouble + 0.5) / 4503599627370496.0))
        val s = scale * u + gum
        if (s > bestScore) { bestScore = s; bestB = b }
      }
      (lo + (bestB.toDouble + 0.5) * ((hi - lo) / bins), bestB)
    }
    for (g <- Seq("a", "b", "c")) assert(got(g) == ref(g), s"group $g")
    // groups a (centered 100) and b (centered 400) must land far apart
    assert(math.abs(got("a")._1 - got("b")._1) > 100.0)
  }

  test("dpQuantile: high epsilon concentrates on the true quantile bucket") {
    // k=30 (ε ≈ 20.8): the utility term dwarfs any Gumbel draw, so the
    // released bucket must contain the true median
    val values = (1 to 1000).map(_.toDouble)
    val out = graft.pipeline.Pii.dpQuantile(
      values.toDF("v"), col("v"), 0.5, lo = 0.0, hi = 1000.0, bins = 100,
      kLog2 = 30, seed = 11L).collect().head
    assert(math.abs(out.getDouble(1) - 500.0) <= 10.0, out.toString)
    // out-of-range values clamp to the public bounds instead of leaking
    val clamped = graft.pipeline.Pii.dpQuantile(
      (values ++ Seq(1e12, -1e12)).toDF("v"), col("v"), 0.5,
      lo = 0.0, hi = 1000.0, bins = 100, kLog2 = 30, seed = 11L).collect().head
    assert(math.abs(clamped.getDouble(1) - 500.0) <= 10.0, clamped.toString)
  }

  test("dpQuantile/dpQuantiles exclude NULL values from the histogram") {
    // Pins the documented posture (Pii scaladoc "WHICH ROWS COUNT"): a
    // null value neither clamps to a range edge nor shifts any bucket,
    // so a frame with nulls mixed in releases EXACTLY what the
    // null-filtered frame releases — same bucket, same dp_value, same
    // draw (the mechanism is deterministic under one seed, so bit
    // equality is the strongest possible form of "nulls did not count").
    val vals = (1 to 100).map(i => Some(i * 7.0 % 1000.0))
    val mixed = (vals ++ (1 to 91).map(_ => Option.empty[Double])).toDF("v")
    val dense = vals.toDF("v")
    def rel(df: org.apache.spark.sql.DataFrame) = graft.pipeline.Pii
      .dpQuantile(df, col("v"), 0.5, lo = 0.0, hi = 1000.0, bins = 100,
        kLog2 = 2, seed = 3L).collect().toSeq
    assert(rel(mixed) == rel(dense))
    // per-group: the whole release must be IDENTICAL — per-group draws
    // unchanged by null rows, and a group with zero non-null rows absent
    // (indistinguishable from a group absent from the data)
    val gm = (vals.map(v => ("g", v)) ++ (1 to 40).map(i => ("h", Some(i * 3.0))) ++
      (1 to 9).map(_ => ("g", Option.empty[Double])) ++
      (1 to 5).map(_ => ("allnull", Option.empty[Double]))).toDF("k", "v")
    val gd = (vals.map(v => ("g", v)) ++
      (1 to 40).map(i => ("h", Some(i * 3.0)))).toDF("k", "v")
    def grel(df: org.apache.spark.sql.DataFrame) = graft.pipeline.Pii
      .dpQuantiles(df, Seq(col("k")), col("v"), 0.5,
        lo = 0.0, hi = 1000.0, bins = 100, kLog2 = 2, seed = 3L)
      .collect().map(r => r.getString(0) -> ((r.getDouble(2), r.getLong(3)))).toMap
    assert(grel(gm) == grel(gd))
  }

  test("dpQuantiles: a NULL group key is a group like any other") {
    // Pins the null-safe grid join: a plain using-columns join drops
    // every histogram row whose group key is NULL (NULL = NULL is not
    // true), which would make a null-keyed group "release" pure noise
    // over an all-zero histogram. With values spread over buckets, high
    // epsilon must recover each group's true median — including NULL's.
    val rows = (1 to 50).map(i => (Option.empty[String], 800.0 + i * 2.0)) ++
      (1 to 50).map(i => (Some("g"), 100.0 + i * 2.0))
    val got = graft.pipeline.Pii.dpQuantiles(
      rows.toDF("k", "v"), Seq(col("k")), col("v"), 0.5,
      lo = 0.0, hi = 1000.0, bins = 100, kLog2 = 30, seed = 5L)
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(2)).toMap
    assert(math.abs(got(None) - 850.0) <= 15.0, got.toString)
    assert(math.abs(got(Some("g")) - 150.0) <= 15.0, got.toString)
  }

  test("dpHistograms: scalar noise replication, full grid, exclusions") {
    // 40 rows in bucket 1 ([100,200)), 10 in bucket 8, group "h" only in
    // bucket 0; null values excluded; bins=10 over [0,1000)
    val rows = (1 to 40).map(_ => ("g", Some(150.0))) ++
      (1 to 10).map(_ => ("g", Some(850.0))) ++
      (1 to 7).map(_ => ("h", Some(50.0))) ++
      (1 to 9).map(_ => ("g", Option.empty[Double]))
    val out = graft.pipeline.Pii.dpHistograms(
      rows.toDF("k", "v"), Seq(col("k")), col("v"),
      lo = 0.0, hi = 1000.0, bins = 10, kLog2 = 2, seed = 11L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getLong(3)))).toMap
    // full grid: every observed group releases ALL bins buckets
    assert(out.size == 20)
    assert(out(("g", 3L))._1 == 300.0)
    // the released count is true count + the EXACT scalar-reference noise
    // under the dph: domain-separated key (escape-free group values
    // encode to themselves in noiseKey)
    def noise(k: String, b: Long) = refNoise(s"dph:$k:$b", 2, 11L)
    assert(out(("g", 1L))._2 == 40L + noise("g", 1L))
    assert(out(("g", 8L))._2 == 10L + noise("g", 8L))
    assert(out(("h", 0L))._2 == 7L + noise("h", 0L))
    // a zero bucket carries noise like any other (support hides emptiness)
    assert(out(("h", 5L))._2 == 0L + noise("h", 5L))
    // null values excluded: bucket 0 of g counts 0 true rows
    assert(out(("g", 0L))._2 == 0L + noise("g", 0L))
    // composition: a different seed draws different noise somewhere
    val other = graft.pipeline.Pii.dpHistograms(
      rows.toDF("k", "v"), Seq(col("k")), col("v"),
      lo = 0.0, hi = 1000.0, bins = 10, kLog2 = 2, seed = 12L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(other != out.map { case (k, v) => k -> v._2 })
  }
}
