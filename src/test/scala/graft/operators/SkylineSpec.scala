package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skyline: exact parity with the quadratic reference in 2D/3D, tie and
 * null semantics, prune-invariance across bucket counts, and the loud
 * anti-correlated guard. */
class SkylineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def refFront(rows: Seq[(Long, Array[Double])]): Set[Long] =
    rows.filter { case (_, a) =>
      !rows.exists { case (_, b) =>
        a.indices.forall(j => b(j) >= a(j)) && a.indices.exists(j => b(j) > a(j))
      }
    }.map(_._1).toSet

  test("matches the quadratic reference on 500 deterministic points, 2D and 3D") {
    val pts = (0 until 500).map { i =>
      (i.toLong, Array((mix(i) % 1000).abs.toDouble, (mix(i + 9999) % 1000).abs.toDouble,
        (mix(i + 77777) % 1000).abs.toDouble))
    }
    val df = pts.map(p => (p._1, p._2(0), p._2(1), p._2(2))).toDF("id", "x", "y", "z")
    val got2 = Skyline.pareto(df, Seq(col("x"), col("y")))
      .select("id").as[Long].collect().toSet
    assert(got2 == refFront(pts.map(p => (p._1, p._2.take(2)))))
    val got3 = Skyline.pareto(df, Seq(col("x"), col("y"), col("z")), buckets = 7)
      .select("id").as[Long].collect().toSet
    assert(got3 == refFront(pts))
    assert(got3.size > got2.size) // more dims → wider front (sanity)
    // prune-invariance: bucket count cannot change the exact result
    assert(Skyline.pareto(df, Seq(col("x"), col("y")), buckets = 3)
      .select("id").as[Long].collect().toSet == got2)
  }

  test("equal rows stay on the front together; null dims are excluded") {
    val df = Seq((1L, Some(5.0), 5.0), (2L, Some(5.0), 5.0), (3L, Some(4.0), 6.0),
      (4L, Some(4.0), 4.0), (5L, None, 99.0)).toDF("id", "x", "y")
    val got = Skyline.pareto(df, Seq(col("x"), col("y")))
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L))
  }

  test("anti-correlated worst case trips the candidate guard loudly") {
    val df = (0 until 100).map(i => (i.toLong, i.toDouble, -i.toDouble)).toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException](
      Skyline.pareto(df, Seq(col("x"), col("y")), maxCandidates = 10L).collect())
    assert(e.getMessage.contains("skyline candidates"))
    // with the cap raised the full anti-chain comes back (all 100 on the front)
    assert(Skyline.pareto(df, Seq(col("x"), col("y")), maxCandidates = 1000L).count() == 100)
  }

  test("original columns survive; graft working columns do not") {
    val df = Seq((1L, "keep", 3.0, 4.0)).toDF("id", "tag", "x", "y")
    val out = Skyline.pareto(df, Seq(col("x"), col("y")))
    assert(out.columns.toSeq == Seq("id", "tag", "x", "y"))
    assert(out.collect()(0).getAs[String]("tag") == "keep")
  }
}
