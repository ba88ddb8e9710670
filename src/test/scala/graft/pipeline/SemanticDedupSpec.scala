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

  test("embeddingOutliers flags far-from-every-centroid and degenerate rows") {
    val rows = Seq(
      (1L, Seq(1.0f, 0.01f, 0.0f, 0.0f)),   // on centroid 0 → inlier
      (2L, Seq(0.5f, 0.5f, 0.5f, 0.5f)),    // equidistant, sim 0.5 < 0.9 → outlier
      (3L, Seq.fill(4)(0.0f)),              // zero norm → NaN cosine → outlier
      (4L, Seq(1.0f, 2.0f)),                // wrong dimension → NULL cosine → outlier
      (5L, null.asInstanceOf[Seq[Float]])   // NULL embedding → reported, cid -1
    ).toDF("vec_id", "embedding")
    val cents = (0 until 4).map(i =>
      i -> Array.tabulate(4)(j => if (j == i) 1.0 else 0.0)).toArray
    val out = Similarity.embeddingOutliers(rows, "vec_id", "embedding", cents, 0.9)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(out.view.mapValues(_._2).toMap ==
      Map(1L -> false, 2L -> true, 3L -> true, 4L -> true, 5L -> true))
    assert(out(5L)._1 == -1) // a fully-NULL row must appear, not vanish
  }

  test("auto-split survives a large null-embedding group (no NPE on null cid)") {
    val rows = ((1L to 40L).map(i => (i, Seq(1.0f, 0.0f))) ++
      (100L to 160L).map(i => (i, null.asInstanceOf[Seq[Float]])))
      .toDF("vec_id", "embedding")
    val cents = Array(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0))
    // null-cid group (61 rows) exceeds maxCellSize: must be skipped by the
    // sub-cluster pass, not NPE the oversized-cell collect
    val out = Similarity.semanticDedupWithCentroids(
      rows, "vec_id", "embedding", cents, 0.999, maxCellSize = 30)
    assert(out.where(col("id") === 1L).count() == 1) // near-dups still collapse
  }

  test("oversized-cell auto-split bounds the pair join on a one-cell flood") {
    // 2000 diverse vectors that ALL land in centroid 0's cell (dominant
    // first component), plus planted near-identical pairs that must still
    // collapse after the split. Without the cap this cell self-joins 2000²
    // pairs; with maxCellSize=200 the per-cell k-means re-clusters it and
    // Σ|cell|² must drop by an order of magnitude.
    val rng = new scala.util.Random(13)
    val base = (0L until 1000L).map { i =>
      val tail = Array.fill(7)((rng.nextDouble() - 0.5).toFloat)
      (i, (5.0f +: tail).toSeq)
    }
    // near-dup of every 100th vector (tiny perturbation, cosine ~1)
    val dups = base.collect { case (i, v) if i % 100 == 0 =>
      (i + 100000L, v.updated(1, v(1) + 1e-5f))
    }
    val flood = (base ++ dups).toDF("vec_id", "embedding")
    val cents = Array(0 -> Array(1.0, 0, 0, 0, 0, 0, 0, 0), 1 -> Array(-1.0, 0, 0, 0, 0, 0, 0, 0))
    val cellSizes = Similarity.semanticCellAssignment(
        flood, "vec_id", "embedding", cents, maxCellSize = 200)
      .groupBy(col("cid"), col("graft_sub")).count()
      .select(col("count")).as[Long].collect()
    val n = cellSizes.sum
    val sumSq = cellSizes.map(s => s * s).sum
    assert(n == flood.count())
    assert(cellSizes.length >= 5, s"flood cell did not split: ${cellSizes.length} cells")
    assert(sumSq <= n * n / 4,
      s"pair-join bound not improved: sum(|cell|^2)=$sumSq vs n^2=${n * n}")
    // correctness: the planted near-identical pairs still collapse (they
    // share the argmax sub-centroid), nothing else is dropped
    val kept = Similarity.semanticDedupWithCentroids(
        flood, "vec_id", "embedding", cents, 0.9999999, maxCellSize = 200)
      .select(col("id")).as[Long].collect().toSet
    dups.foreach { case (dupId, _) =>
      assert(!kept.contains(dupId) || !kept.contains(dupId - 100000L),
        s"planted near-dup pair ${dupId - 100000L}/$dupId survived intact")
    }
    assert(kept.size >= base.size - dups.size,
      s"over-dropped: kept ${kept.size} of ${base.size + dups.size}")
    // cap off: behavior unchanged (single-level cells, one per centroid side)
    val flatCells = Similarity.semanticCellAssignment(
        flood, "vec_id", "embedding", cents, maxCellSize = 0)
      .groupBy(col("cid"), col("graft_sub")).count().count()
    assert(flatCells == 1)
  }
}
