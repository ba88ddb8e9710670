package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PassJoin-style edit-distance self-join vs a brute-force DP oracle:
 * exact pair sets (ids AND distances) across random corpora, repeated-char
 * adversaries, the short-string bucket, unicode, partition invariance and
 * the opt-in bucket cap. */
class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ed(a: String, b: String): Int = {
    val (n, m) = (a.length, b.length)
    val dp = Array.tabulate(n + 1)(i => i)
    for (j <- 1 to m) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to n) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(n)
  }

  private def bruteForce(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      dist = ed(sa, sb) if dist <= d
    } yield (ia, ib, dist)).toSet

  private def run(rows: Seq[(Long, String)], d: Int, cap: Int = 0,
      parts: Int = 1): Set[(Long, Long, Int)] = {
    val df0 = rows.toDF("id", "s")
    val df = if (parts > 1) df0.repartition(parts) else df0
    FuzzyJoin.editDistancePairs(df, col("id"), col("s"), d, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("random corpus over a tiny alphabet matches brute force for d = 0..3") {
    val rnd = new scala.util.Random(42)
    val rows = (0L until 70L).map { i =>
      i -> (0 until rnd.nextInt(9)).map(_ => "abc" (rnd.nextInt(3))).mkString
    }
    for (d <- 0 to 3)
      assert(run(rows, d, parts = 7) === bruteForce(rows, d), s"d=$d")
  }

  test("repeated-character adversaries (every segment identical) stay exact") {
    val rows = Seq(0L -> "aaaaaaaa", 1L -> "aaaaaaa", 2L -> "aaaaaaaaaa",
      3L -> "aabaaaaa", 4L -> "bbbbbbbb", 5L -> "abababab", 6L -> "babababa")
    for (d <- 1 to 3) assert(run(rows, d) === bruteForce(rows, d), s"d=$d")
  }

  test("short-string bucket: empties and near-empties pair exactly once") {
    val rows = Seq(0L -> "", 1L -> "", 2L -> "a", 3L -> "ab", 4L -> "abcd",
      5L -> "b", 6L -> "xyzw")
    for (d <- 0 to 2) assert(run(rows, d) === bruteForce(rows, d), s"d=$d")
  }

  test("longer realistic strings: only true near-titles survive") {
    val rows = Seq(
      10L -> "the quick brown fox jumps over the lazy dog",
      11L -> "the quick brown fox jumped over the lazy dog",
      12L -> "the quick brown cat jumps over the lazy dog",
      13L -> "a completely different sentence about spark joins",
      14L -> "the quick brown fox jumps over the lazy dogs!")
    val got = run(rows, 3, parts = 3)
    assert(got === bruteForce(rows, 3))
    assert(got.contains((10L, 11L, 2)) && got.contains((10L, 12L, 3)) &&
      got.contains((10L, 14L, 2)))
    assert(!got.exists(p => p._1 == 13L || p._2 == 13L))
  }

  test("unicode: multi-byte characters count as single edits") {
    val rows = Seq(0L -> "héllo wörld", 1L -> "hello world", 2L -> "héllo wörld!")
    val got = run(rows, 2)
    assert(got === Set((0L, 1L, 2), (0L, 2L, 1)))
  }

  test("cross-corpus join matches brute force A x B, both role directions") {
    val rnd = new scala.util.Random(99)
    def corp(n: Int, off: Long) = (0 until n).map { i =>
      (off + i) -> (0 until rnd.nextInt(8)).map(_ => "ab" (rnd.nextInt(2))).mkString
    }
    val l = corp(40, 0L)
    val r = corp(40, 1000L)
    for (d <- 0 to 2) {
      val expect = (for {
        (il, sl) <- l; (ir, sr) <- r
        dist = ed(sl, sr) if dist <= d
      } yield (il, ir, dist)).toSet
      val got = FuzzyJoin.editDistanceJoin(
          l.toDF("id", "s").repartition(5), col("id"), col("s"),
          r.toDF("id", "s").repartition(3), col("id"), col("s"), d)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
      assert(got === expect, s"d=$d")
    }
  }

  private def planNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    p match {
      case a: AdaptiveSparkPlanExec => planNodes(a.executedPlan)
      case q: QueryStageExec => q +: planNodes(q.plan)
      case other => other +: other.children.flatMap(planNodes)
    }
  }

  test("plan: one key pass + one reused exchange per side, single-pass charSig") {
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    // at 100 TB the key-explosion pass IS the cost: each corpus must emit
    // both roles' keys in ONE projection behind ONE exchange, with the two
    // role directions of the cross join reading it via ReusedExchange —
    // 2 key passes / 2 exchanges, not 4 + 4 window shuffles
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzzy_plan").toString
    val rnd = new scala.util.Random(7)
    (0L until 300L).map(i => i -> (0 until 8 + rnd.nextInt(8))
        .map(_ => "abcdef"(rnd.nextInt(6))).mkString).toDF("id", "s")
      .write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pairs = FuzzyJoin.editDistanceJoin(
        src, col("id"), col("s"), src.select(col("id") + 10000 as "id", col("s")),
        col("id"), col("s"), 2)
      pairs.collect() // finalize AQE stages
      val all = planNodes(pairs.queryExecution.executedPlan)
      val sigNodes = all.count {
        case p: org.apache.spark.sql.execution.ProjectExec =>
          p.expressions.exists(_.exists(_.isInstanceOf[CharSigExpression]))
        case g: org.apache.spark.sql.execution.GenerateExec =>
          (g.generator +: g.requiredChildOutput)
            .exists(_.exists(_.isInstanceOf[CharSigExpression]))
        case _ => false
      }
      assert(sigNodes <= 2, // one key-generation pass per corpus
        s"charSig planned $sigNodes times:\n${pairs.queryExecution.executedPlan}")
      assert(all.count(_.isInstanceOf[ReusedExchangeExec]) >= 2,
        s"expected both key exchanges reused:\n${pairs.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("charSig: single-pass static call matches a counted histogram, L1 bound holds") {
    import org.apache.spark.unsafe.types.UTF8String
    def brute(s: String): Long = {
      val counts = new Array[Int](8)
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i); i += Character.charCount(cp)
        val b = (cp * 0x9E3779B9) >>> 29
        if (counts(b) < 255) counts(b) += 1
      }
      (0 until 8).map(k => counts(k).toLong << (8 * k)).reduce(_ | _)
    }
    def l1(a: Long, b: Long): Int = (0 until 8).map { k =>
      math.abs(((a >> (8 * k)) & 255L) - ((b >> (8 * k)) & 255L)).toInt
    }.sum
    val rnd = new scala.util.Random(3)
    val strs = Seq("", "a", "héllo wörld", "😀smile", "a" * 300) ++
      (0 until 50).map(_ => (0 until rnd.nextInt(20)).map(_ => "abxyz"(rnd.nextInt(5))).mkString)
    strs.foreach { s =>
      assert(FuzzyAlgos.charSig(UTF8String.fromString(s)) === brute(s), s"sig($s)")
    }
    // one edit moves at most 2 units of clamped L1 mass (code-point edits:
    // restrict to BMP strings so updated() doesn't split surrogate pairs)
    for (s <- strs.filter(x => x.nonEmpty && x.codePointCount(0, x.length) == x.length);
         _ <- 0 until 3) {
      val pos = rnd.nextInt(s.length)
      val edited = s.updated(pos, "qrs"(rnd.nextInt(3)))
      assert(l1(brute(s), brute(edited)) <= 2, s"'$s' -> '$edited'")
      val deleted = s.substring(0, pos) + s.substring(pos + 1)
      assert(l1(brute(s), brute(deleted)) <= 2, s"'$s' -> del@$pos")
    }
  }

  test("active cap emits observe metrics: drops counted, zero when nothing dropped") {
    // the surviving "kept pair" keeps the result non-empty: AQE's
    // empty-relation propagation would otherwise collapse the whole plan
    // INCLUDING the CollectMetrics nodes (metrics of a fully-empty query
    // vanish — the skippedBuckets diagnostic covers that regime)
    val rows = (0L until 40L).map(i => i -> "boilerplate") ++
      Seq(100L -> "kept pair aa", 101L -> "kept pair ab", 102L -> "unique string")
    val df = rows.toDF("id", "s")
    // cap 5 on a 40-way identical bucket: the idx-role branch must report
    // dropped key rows through the observe channel — recall loss is never
    // silent (the r14 cap-visibility contract)
    val capped = FuzzyJoin.editDistancePairs(df, col("id"), col("s"), 1, 5)
    capped.collect()
    val m = capped.queryExecution.observedMetrics
    val idx = m.collectFirst { case (k, v) if k.startsWith("graft_fuzzy_cap_idx_") => v }
    assert(idx.nonEmpty, s"no idx cap metric in ${m.keys}")
    assert(idx.get.getAs[Long]("dropped_key_rows") > 0L)
    assert(idx.get.getAs[Double]("dropped_buckets") > 0.0)
    // generous cap: metrics present, zero drops
    val loose = FuzzyJoin.editDistancePairs(df, col("id"), col("s"), 1, 100000)
    loose.collect()
    val m2 = loose.queryExecution.observedMetrics
    val drops = m2.collect { case (k, v) if k.startsWith("graft_fuzzy_cap_") =>
      v.getAs[Long]("dropped_key_rows") }
    assert(drops.nonEmpty && drops.forall(_ == 0L), s"unexpected drops: $m2")
  }

  test("empty capped result: cap metrics read NULL under AQE, skippedBuckets reports") {
    // Pins the CollectMetrics caveat (FuzzyJoin scaladoc / r14 VERDICT
    // what's-wrong #4), with the EXACT observed Spark 4.1 behavior: when
    // the capped join returns ZERO rows, AQE empty-relation propagation
    // replaces the subtree under the CollectMetrics nodes, so the metric
    // KEYS still appear in observedMetrics but their values are NULL —
    // not the true drop counts (this fixture really drops a 40-row
    // bucket). Recall loss IS silent in the all-empty regime, detectable
    // only as nulls; the skippedBuckets audit is the documented
    // substitute and must still report the over-cap bucket. If a Spark
    // upgrade changes empty-relation propagation, THIS test fails loudly
    // and the scaladoc caveat gets rewritten with it.
    val rows = (0L until 40L).map(i => i -> "boilerplate") ++
      Seq(100L -> "a completely unrelated string")
    val df = rows.toDF("id", "s")
    // cap 5 kills the only bucket that pairs; nothing else is within 1
    val capped = FuzzyJoin.editDistancePairs(df, col("id"), col("s"), 1, 5)
    assert(capped.count() == 0L, "fixture must produce an empty result")
    val m = capped.queryExecution.observedMetrics
      .filter { case (k, _) => k.startsWith("graft_fuzzy_cap_") }
    assert(m.nonEmpty, "metric keys themselves should survive")
    assert(m.values.forall(r => r.isNullAt(0) && r.isNullAt(1)),
      s"empty-relation propagation no longer nulls CollectMetrics — " +
        s"got $m; update the FuzzyJoin scaladoc caveat and this pin")
    val skips = FuzzyJoin.skippedBuckets(df, col("id"), col("s"), 1, 5)
      .collect()
    assert(skips.nonEmpty && skips.forall(_.getAs[Long]("bucket_rows") > 5L),
      "skippedBuckets must surface the over-cap bucket in the empty regime")
  }

  test("bucket cap drops only pairs, never invents them; uncapped is complete") {
    val rows = (0L until 40L).map(i => i -> "boilerplate") ++
      Seq(100L -> "boilerplatx", 101L -> "unique string")
    val full = run(rows, 1)
    assert(full === bruteForce(rows, 1))
    val capped = run(rows, 1, cap = 5)
    assert(capped.subsetOf(full))
    assert(capped.size < full.size) // the 40-way identical bucket was cut
  }
}
