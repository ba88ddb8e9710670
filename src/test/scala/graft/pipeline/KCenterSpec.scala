package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** k-center greedy: exact agreement with a scalar reference, the coverage
 * property vs hash sampling, degenerate sizes. */
class KCenterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def reference(rows: Seq[(Long, Seq[Double])], k: Int): Seq[Long] = {
    if (rows.isEmpty) return Nil
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val first = rows.minBy(_._1)
    var picks = Vector(first._1)
    var mind = rows.map(r => r._1 -> d2(r._2, first._2)).toMap
    while (picks.size < math.min(k, rows.size)) {
      val cand = rows.filterNot(r => picks.contains(r._1))
        .maxBy(r => (mind(r._1), -r._1))
      picks :+= cand._1
      mind = rows.map(r => r._1 -> math.min(mind(r._1), d2(r._2, cand._2))).toMap
    }
    picks
  }

  private def vecs(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(6)(rnd.nextGaussian())))
  }

  test("matches the scalar reference exactly, in pick order") {
    val rows = vecs(80, 5)
    val got = Similarity.kCenterGreedy(rows.toDF("id", "v").repartition(7),
        "id", "v", k = 10)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(got === reference(rows, 10))
  }

  test("covers skewed clusters a prefix sample misses") {
    val rnd = new scala.util.Random(9)
    // one dominant cluster (ids 0..149) + three tiny distant ones, ids
    // CONSECUTIVE per cluster — any prefix/budget-ordered selection sits
    // entirely in the big cluster, the coverage objective does not
    def cluster(i: Long): Int =
      if (i < 150) 0 else if (i < 153) 1 else if (i < 156) 2 else 3
    val rows = (0L until 159L).map { i =>
      val c = cluster(i)
      (i, Seq(c * 80.0 + rnd.nextGaussian(), (c % 2) * 80.0 + rnd.nextGaussian()))
    }
    def coverRadius(centers: Seq[Long]): Double = {
      val cs = rows.filter(r => centers.contains(r._1)).map(_._2)
      rows.map(r => cs.map(c =>
        r._2.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum).min).max
    }
    val greedy = Similarity.kCenterGreedy(rows.toDF("id", "v"), "id", "v", 6)
      .collect().map(_.getLong(1)).toSeq
    val prefix = rows.take(6).map(_._1)
    assert(coverRadius(greedy) < coverRadius(prefix) / 100.0,
      s"greedy ${coverRadius(greedy)} vs prefix ${coverRadius(prefix)}")
    assert(greedy.map(cluster).distinct.size === 4) // every cluster hit
  }

  test("k larger than the corpus returns everything; empty returns none") {
    val rows = vecs(3, 1)
    assert(Similarity.kCenterGreedy(rows.toDF("id", "v"), "id", "v", 10)
      .count() === 3L)
    assert(Similarity.kCenterGreedy(rows.toDF("id", "v").where(lit(false)),
      "id", "v", 5).count() === 0L)
  }
}
