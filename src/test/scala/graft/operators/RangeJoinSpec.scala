package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("interval overlap join equals the naive overlap join, no duplicates") {
    val rng = new scala.util.Random(11)
    val a = (0 until 120).map { i =>
      val lo = rng.nextDouble() * 900
      (i.toLong, lo, lo + rng.nextDouble() * 120)
    }.toDF("a_id", "a_lo", "a_hi")
    val b = (0 until 150).map { i =>
      val lo = rng.nextDouble() * 900
      (i.toLong, lo, lo + rng.nextDouble() * 60)
    }.toDF("b_id", "b_lo", "b_hi")
    val got = graft.operators.RangeJoin.intervalOverlap(
        a, b, "a_lo", "a_hi", "b_lo", "b_hi", binWidth = 50.0)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    val naive = a.join(b, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size, "first-shared-bin emitted duplicates")
    assert(got.toSet == naive.toSet)
    assert(naive.nonEmpty)
    // equi-key variant restricts to matching keys
    val ak = a.withColumn("k", col("a_id") % 3)
    val bk = b.withColumn("k", col("b_id") % 3)
    val keyed = graft.operators.RangeJoin.intervalOverlap(
        ak, bk, "a_lo", "a_hi", "b_lo", "b_hi", 50.0, on = Seq("k"))
      .select("a_id", "b_id").as[(Long, Long)].collect()
    val expectedK = ak.as("x").join(bk.as("y"),
        col("x.k") === col("y.k") &&
          col("x.a_lo") <= col("y.b_hi") && col("y.b_lo") <= col("x.a_hi"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(keyed.toSet == expectedK && keyed.length == keyed.toSet.size)
  }

  test("bin-bucketed range join equals the naive BETWEEN join") {
    val rng = new scala.util.Random(3)
    val points = (0 until 500).map(_ => rng.nextDouble() * 1000).toDF("p")
    val intervals = (0 until 60).map { i =>
      val lo = rng.nextDouble() * 950
      (i.toLong, lo, lo + rng.nextDouble() * 80)
    }.toDF("iv_id", "lo", "hi")
    val naive = points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("p", "iv_id").collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val binned = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", binWidth = 50)
      .select("p", "iv_id").collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(binned == naive)
  }

  test("range join with equi-keys and negative values; plan is an equi-join") {
    val points = Seq(("a", -15.0), ("a", 5.0), ("b", 5.0)).toDF("k", "p")
    val intervals = Seq(("a", -20.0, -10.0, 1L), ("a", 0.0, 10.0, 2L), ("b", 100.0, 200.0, 3L))
      .toDF("k", "lo", "hi", "iv_id")
    val out = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 10, on = Seq("k"))
      .select("k", "p", "iv_id").as[(String, Double, Long)].collect().toSet
    assert(out == Set(("a", -15.0, 1L), ("a", 5.0, 2L)))
    val plan = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 10, on = Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }
}
