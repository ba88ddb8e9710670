package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SemanticDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("explicit centroids: near pair collapses to lowest id, clusters kept apart") {
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.999f, 0.001f)), // near-dup of 1 -> dropped
      (3L, Seq(0.0f, 1.0f)),
      (4L, Seq(0.3f, 0.8f))) // same cluster as 3, cosine ≈ 0.936 < 0.999 -> kept
      .toDF("vec_id", "embedding")
    val cents = Array(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0))
    val out = Similarity.semanticDedupWithCentroids(rows, "vec_id", "embedding", cents, 0.999)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 0, 3L -> 1, 4L -> 1))
  }

  test("near pair in DIFFERENT clusters is not dropped (cluster-local search)") {
    // two near-identical vectors straddling the centroid boundary stay: the
    // within-cluster search never compares them — the documented recall
    // trade SemDeDup makes for tractability
    val rows = Seq(
      (1L, Seq(1.0f, 0.999f)),
      (2L, Seq(0.999f, 1.0f))).toDF("vec_id", "embedding")
    val cents = Array(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0))
    val out = Similarity.semanticDedupWithCentroids(rows, "vec_id", "embedding", cents, 0.9)
    assert(out.count() == 2)
  }

  test("kmeans path drops planted duplicates, keeps cluster structure") {
    // members fan out 1° apart (adjacent cosine 0.99985 < threshold); only
    // the planted exact copies reach cosine 1.0
    def at(deg: Double) = Seq(
      (10.0 * math.cos(math.toRadians(deg))).toFloat,
      (10.0 * math.sin(math.toRadians(deg))).toFloat)
    val cluster1 = (0L until 20L).map(i => (i, at(i.toDouble)))
    val cluster2 = (100L until 120L).map(i => (i, at(90.0 + (i - 100L).toDouble)))
    val planted = Seq((500L, cluster1.head._2), (501L, cluster2.head._2)) // exact copies
    val df = (cluster1 ++ cluster2 ++ planted).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(df, "vec_id", "embedding", 0.99999, nlist = 2)
      .select("id").as[Long].collect().toSet
    assert(!out.contains(500L) && !out.contains(501L))
    assert(out.contains(0L) && out.contains(100L))
    assert(out.size == 40)
  }

  test("deterministic across runs") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = (0 until 4).map(i =>
      i -> Array.tabulate(64)(j => if (j == i) 1.0 else 0.0)).toArray
    def run() = Similarity.semanticDedupWithCentroids(e, "vec_id", "embedding", cents, 0.999)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(run() == run())
  }
}
