package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ICWS weighted minhash: exact weighted-Jaccard arithmetic, the
 * collision-probability estimator property, word-order invariance,
 * repetition discrimination (the reason this tier exists), and the
 * banded near-dup pipeline with exact verification. */
class WminhashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def wj(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b").select(
      Wminhash.weightedJaccard(
        Text.words(col("a"), lowercase = true),
        Text.words(col("b"), lowercase = true)).as("j"))
      .as[Double].head()

  private def sig(doc: String, n: Int): Seq[Long] =
    Seq(doc).toDF("t").select(
      Wminhash.icwsSignature(Text.words(col("t"), lowercase = true), n).as("s"))
      .as[Seq[Long]].head()

  test("weightedJaccard: exact multiset arithmetic") {
    assert(wj("a a b", "a b b") == 0.5) // smin 2 / (3+3-2)
    assert(wj("x y z", "x y z") == 1.0)
    assert(wj("x y", "p q") == 0.0)
    assert(wj("", "") == 1.0)
    assert(wj("x", "") == 0.0)
    assert(math.abs(wj("x y z", ("x " * 100) + "y z") - 3.0 / 102.0) < 1e-15)
  }

  test("slot agreement estimates weighted Jaccard (256 hashes, ±0.12)") {
    val pairs = Seq(
      ("a a a a b b c c", "a a b b d d d d", 4.0 / 12.0),
      ((1 to 10).map(i => s"t$i").mkString(" "),
        ((1 to 9).map(i => s"t$i") :+ "zz").mkString(" "), 9.0 / 11.0),
      ("p p q q", "p q q q", 3.0 / 5.0))
    for ((a, b, expected) <- pairs) {
      val sa = sig(a, 256); val sb = sig(b, 256)
      val est = sa.zip(sb).count { case (x, y) => x == y } / 256.0
      assert(math.abs(est - expected) < 0.12, s"est $est vs $expected for ($a | $b)")
      assert(math.abs(wj(a, b) - expected) < 1e-15)
    }
  }

  test("signature is word-order invariant and deterministic") {
    val words = Seq("alpha", "beta", "beta", "gamma", "alpha", "alpha")
    val a = sig(words.mkString(" "), 64)
    val b = sig(scala.util.Random.shuffle(words).mkString(" "), 64)
    assert(a == b)
    assert(sig("", 64).isEmpty)
  }

  test("repetition-heavy boilerplate is NOT a weighted near-dup of its source") {
    // identical token SETS — plain set semantics calls these duplicates;
    // the tf distribution says otherwise (J_w ≈ 0.03)
    val spammy = ("buy " * 200) + "cheap pills here"
    val plain = "buy cheap pills here"
    val est = {
      val sa = sig(spammy, 256); val sb = sig(plain, 256)
      sa.zip(sb).count { case (x, y) => x == y } / 256.0
    }
    assert(est < 0.15)
    assert(wj(spammy, plain) < 0.05)
  }

  test("weightedNearDups (word mode): planted tf-near-dups, exact scores, partition-invariant") {
    val base = (1 to 40).map(i => s"w$i w$i tok$i").mkString(" ") // tf-2 heavy doc
    val docs = Seq(
      (1L, base),
      (2L, base.split(" ").dropRight(4).mkString(" ")), // near-dup: J_w = 116/120
      (3L, (1 to 60).map(i => s"other$i").mkString(" ")),
      (4L, ""))
    for (parts <- Seq(1, 7)) {
      val out = Wminhash.weightedNearDups(
          docs.toDF("id", "text").repartition(parts), col("id"), col("text"),
          shingleSize = 0, numHashes = 128, bands = 32, threshold = 0.8)
        .as[(Long, Long, Double)].collect().toSet
      assert(out == Set((1L, 2L, 116.0 / 120.0)), s"parts=$parts")
    }
  }

  test("dropWeightedNearDups: transitive families keep min id, untouched docs survive") {
    // chain A≈B≈C (transitive family via B) + a distinct doc + an empty doc
    val base = (1 to 30).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (10L, base),
      (2L, base.split(" ").dropRight(2).mkString(" ")), // ≈ 10
      (30L, base.split(" ").drop(2).mkString(" ")), // ≈ 10 (and 2 via 10)
      (4L, (100 to 160).map(i => s"z$i").mkString(" ")),
      (5L, ""))
    val out = Wminhash.dropWeightedNearDups(
        docs.toDF("id", "text"), col("id"), col("text"), threshold = 0.7)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(out == Set(2L, 4L, 5L)) // family {10,2,30} keeps min id 2
  }

  test("plan, no-broadcast regime: ONE corpus ICWS pass via exchange reuse") {
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def planNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a +: planNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: planNodes(q.plan)
      case other => other +: other.children.flatMap(planNodes)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_wmh_plan").toString
    // real near-dup pairs: an empty result would let AQE collapse the plan
    // to EmptyRelationExec and the assert would inspect nothing
    (1L to 30L).flatMap(i => Seq(
      (i, s"w$i x$i y$i z$i unique prose for doc $i"),
      (i + 100L, s"w$i x$i y$i z$i unique prose for doc")))
      .toDF("id", "text").write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pairs = Wminhash.weightedNearDups(src, col("id"), col("text"), threshold = 0.5)
      pairs.collect()
      val all = planNodes(pairs.queryExecution.executedPlan)
      val sigNodes = all.count {
        case p: org.apache.spark.sql.execution.ProjectExec =>
          p.expressions.exists(_.exists(_.isInstanceOf[IcwsSignatureExpression]))
        case _ => false
      }
      assert(sigNodes == 1,
        s"corpus ICWS pass planned $sigNodes times:\n${pairs.queryExecution.executedPlan}")
      assert(all.exists(_.isInstanceOf[ReusedExchangeExec]),
        s"no reused exchange:\n${pairs.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("SQL faces: icws_signature / weighted_jaccard / shingles_multiset") {
    graft.functions.Registry.registerAll(spark)
    val r = spark.sql(
      """SELECT weighted_jaccard(shingles_multiset('a b c d', 3),
        |                        shingles_multiset('a b c d e', 3)) AS j,
        |       size(icws_signature(array('x', 'x', 'y'), 32)) AS n""".stripMargin)
      .as[(Double, Int)].head()
    assert(r == ((2.0 / 3.0, 32)))
  }

  test("weightedNearDups (shingle default): repeats counted, sub-n docs sit out") {
    // 1 vs 2: trigram multisets {abc,bcd} vs {abc,bcd,cde} → smin 2, J = 2/3
    // 5 vs 6: SAME trigram set, repeat counts differ → tf {xyz:2,yzx:2,zxy:2}
    //   vs {xyz:2,yzx:1,zxy:1}: smin 4, J = 4/(6+4−4) = 2/3 — set J would be 1
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d e"),
      (3L, "a b"), (4L, "a b"), // shorter than n: no multiset, no pair
      (5L, "x y z x y z x y"), (6L, "x y z x y z"))
    val out = Wminhash.weightedNearDups(
        docs.toDF("id", "text"), col("id"), col("text"), threshold = 0.6)
      .as[(Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 2L, 2.0 / 3.0), (5L, 6L, 2.0 / 3.0)))
    assert(Wminhash.weightedNearDups(
      docs.toDF("id", "text"), col("id"), col("text"), threshold = 0.7).count() == 0)
  }
}
