package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact prefix-filtered similarity join: equality with brute-force
 * all-pairs on randomized corpora (the prefix/size filters must never drop
 * a qualifying pair), boundary thresholds, and the word-set face. */
class PrefixJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(docs: Seq[(Long, Seq[String])], t: Double) = {
    val sets = docs.map { case (id, ts) => (id, ts.distinct.toSet) }
      .filter(_._2.nonEmpty)
    (for {
      (ia, a) <- sets; (ib, b) <- sets if ia < ib
      o = (a & b).size if o > 0
      j = o.toDouble / (a.size + b.size - o) if j >= t
    } yield (ia, ib, o, j)).toSet
  }

  private def run(docs: Seq[(Long, Seq[String])], t: Double) =
    PrefixJoin.similarityJoin(docs.toDF("id", "ts"), col("id"), col("ts"), t)
      .as[(Long, Long, Int, Double)].collect().toSet

  test("matches brute force on randomized corpora at several thresholds") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 30).map(i => s"w$i")
    // many same-size sets so the epsilon-relaxed ceil(t*sz) path is hit
    val docs = (0L until 60L).map { id =>
      val sz = 3 + rnd.nextInt(6)
      (id, Seq.fill(sz)(vocab(rnd.nextInt(vocab.size))))
    }
    for (t <- Seq(0.3, 0.5, 0.6, 0.8, 1.0)) {
      val expected = brute(docs, t)
      assert(run(docs, t) == expected, s"threshold $t")
      assert(t > 0.55 || expected.nonEmpty) // the low thresholds must be non-vacuous
    }
  }

  test("identical sets at threshold 1.0; empty and null sets dropped") {
    val docs = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("c", "b", "a", "a")), // duplicate member: same SET
      (3L, Seq("a", "b")),
      (4L, Seq.empty[String]))
    assert(run(docs, 1.0) == Set((1L, 2L, 3, 1.0)))
    val withNull = spark.sql(
      "SELECT * FROM VALUES (1L, array('x')), (2L, CAST(NULL AS ARRAY<STRING>)) t(id, ts)")
    assert(PrefixJoin.similarityJoin(withNull, col("id"), col("ts"), 0.5).count() == 0)
  }

  test("size filter alone cannot drop qualifying pairs (skewed sizes)") {
    // |x|=6 subset of |y|=10: J = 6/10 = 0.6 — right at the size-ratio edge
    val x = (0 until 6).map(i => s"t$i")
    val y = (0 until 10).map(i => s"t$i")
    val docs = Seq((1L, x), (2L, y))
    assert(run(docs, 0.6) == Set((1L, 2L, 6, 0.6)))
    assert(run(docs, 0.61).isEmpty)
  }

  test("cross-corpus join matches brute force A x B; within-side pairs never emitted") {
    val rnd = new scala.util.Random(5)
    val vocab = (0 until 25).map(i => s"w$i")
    def corpus(n: Int, off: Long) = (0L until n.toLong).map { i =>
      (i + off, Seq.fill(3 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size))))
    }
    val l = corpus(25, 0L)
    val r = corpus(30, 1000L)
    for (t <- Seq(0.4, 0.7)) {
      val expected = (for {
        (ia, a0) <- l; (ib, b0) <- r
        a = a0.distinct.toSet; b = b0.distinct.toSet
        o = (a & b).size if o > 0
        j = o.toDouble / (a.size + b.size - o) if j >= t
      } yield (ia, ib, o, j)).toSet
      val got = PrefixJoin.similarityJoinBetween(
          l.toDF("id", "ts"), col("id"), col("ts"),
          r.toDF("id", "ts"), col("id"), col("ts"), t)
        .as[(Long, Long, Int, Double)].collect().toSet
      assert(got == expected, s"threshold $t")
      assert(t > 0.5 || expected.nonEmpty)
      assert(got.forall { case (a, b, _, _) => a < 1000L && b >= 1000L })
    }
  }

  test("plan: every join is an equi-join — no cartesian, no nested loop") {
    val docs = (0L until 20L).map(i => (i, Seq(s"a$i", s"b${i % 3}", "common")))
    // materialize = false: inspect the LAZY plan (the default's eager
    // checkpoint would truncate it to an RDD scan)
    val df = PrefixJoin.similarityJoin(
      docs.toDF("id", "ts"), col("id"), col("ts"), 0.5, materialize = false)
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val plan = df.queryExecution.executedPlan
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty)
    assert(plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty)
  }

  test("plan: cross-corpus prefix join reuses ONE token-keyed exchange (filter intact)") {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec => q +: nodes(q.plan)
      case other => other +: other.children.flatMap(nodes)
    }
    // r14 shape: per-side canonical-order aggregates (total work |L|+|R|)
    // over ONE shared union-dfreq subtree whose exchange is reused — the
    // r12 union-aggregate-with-side-filters shape let Catalyst push each
    // side filter below the token exchange and the aggregate, silently
    // planning the union aggregate twice (2·(|L|+|R|))
    val dir = java.nio.file.Files.createTempDirectory("graft_pj_plan").toString
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 40).map(i => s"w$i")
    (0L until 400L).map { i =>
      (i, Seq.fill(4 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size))))
    }.toDF("id", "ts").write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // materialize = false: inspect the LAZY plan (see self-join spec)
      val out = PrefixJoin.similarityJoinBetween(
        src, col("id"), col("ts"),
        src.select(col("id") + 10000 as "id", col("ts")), col("id"), col("ts"),
        0.6, materialize = false)
      out.collect()
      val all = nodes(out.queryExecution.executedPlan)
      assert(all.exists(_.isInstanceOf[ReusedExchangeExec]),
        s"shared dfreq exchange not reused:\n${out.queryExecution.executedPlan}")
      // the UNION may be planned at most ONCE (dfreq's input — its second
      // reference must be a ReusedExchange): a second/third union means a
      // side filter sank below the token exchange and the whole-union
      // canonical-order aggregate was re-planned per side (the r12 trap)
      val unions = all.count(_.isInstanceOf[org.apache.spark.sql.execution.UnionExec])
      assert(unions <= 1,
        s"union planned ${unions}x — per-side re-plan of the union subtree:\n" +
          out.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("word face tokenizes like the corpus passes (lower, trim, ws-split)") {
    val df = Seq(
      (1L, "  The quick Brown fox  "),
      (2L, "the quick brown fox"),
      (3L, "something else entirely")).toDF("id", "text")
    val out = PrefixJoin.similarityJoinWords(df, col("id"), col("text"), 0.9)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(out == Set((1L, 2L, 4, 1.0)))
  }
}
