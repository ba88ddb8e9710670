package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Two-level coarse quantization (the r7 verdict's nlist-ceiling fix):
 * above SimilarityAlgos.TwoLevelThreshold centroids, per-row assignment
 * scores ≈√nlist group reps then argmaxes inside the top groups.
 *
 * The parity claim is RECALL parity, not per-row assignment equality:
 * corpus rows and queries share one quantizer, so a boundary row that lands
 * in a different cell than the flat argmax is still found — its cell is
 * probed by the same two-level probe rule. (On near-uniform vectors the
 * argmax is near-tied across many centroids and assignment genuinely
 * differs; what must hold is that search through the two-level index
 * retrieves the same neighbors.) */
class TwoLevelIvfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def arr(v: Array[Double]) = new GenericArrayData(v)

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private lazy val rows: Array[Array[Double]] =
    spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)

  /** Driver-replayed IVF recall@10 for 20 queries: assign every row with
   * `m`, probe each query's nprobe cells with `m`, exact-rank candidates. */
  private def recallOf(m: CentroidMatrix, nprobe: Int): Double = {
    val cellOf = rows.map(v => SimilarityAlgos.best(arr(v), m))
    val queries = 0 until 20
    queries.map { qi =>
      val probes = SimilarityAlgos.probes(arr(rows(qi)), m, nprobe).toIntArray().toSet
      val cands = rows.indices.filter(i => i != qi && probes.contains(cellOf(i)))
      val top = cands.sortBy(i => (-cos(rows(qi), rows(i)), i)).take(10).toSet
      val truth = rows.indices.filter(_ != qi)
        .sortBy(i => (-cos(rows(qi), rows(i)), i)).take(10).toSet
      truth.intersect(top).size.toDouble / truth.size
    }.sum / queries.size
  }

  test("small matrices stay flat; threshold boundary honored") {
    val cents = (0 until 255).map(i => i -> Array.tabulate(8)(j => math.sin(i * 8 + j))).toArray
    assert(SimilarityAlgos.matrix(cents).groupMembers.isEmpty, "below threshold must stay flat")
    val big = (0 until 256).map(i => i -> Array.tabulate(8)(j => math.sin(i * 8 + j))).toArray
    val m = SimilarityAlgos.matrix(big)
    assert(m.groupMembers.nonEmpty, "at threshold goes two-level")
    // partition property: every centroid in exactly one group
    assert(m.groupMembers.map(_.length).sum == 256)
    assert(m.groupMembers.flatten.distinct.length == 256)
  }

  test("recall parity vs flat assignment at nlist=1024 on sf0.1 embeddings") {
    assert(rows.length >= 1024, "sf0.1 embeddings must cover nlist=1024")
    val cents = rows.take(1024).zipWithIndex.map { case (v, i) => i -> v }
    val two = SimilarityAlgos.matrix(cents)
    val flat = SimilarityAlgos.matrix(cents, twoLevel = false)
    assert(two.groupMembers.nonEmpty && flat.groupMembers.isEmpty)
    val rTwo = recallOf(two, nprobe = 64)
    val rFlat = recallOf(flat, nprobe = 64)
    assert(rTwo >= rFlat - 0.05,
      s"two-level recall $rTwo fell below flat recall $rFlat - 0.05")
  }

  test("nlist=1024 index builds at sf0.1 and search recall holds end to end") {
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val queries = e.where(col("vec_id") < 20)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf1024").toString
    Similarity.ivfBuild(e, "vec_id", "embedding", path, nlist = 1024, iters = 2)
    // cells that end Lloyd's empty drop out of the table; the overwhelming
    // majority must survive (1024 cells over 2000 rows leaves ~2 rows/cell)
    val nCells = spark.read.parquet(s"$path/centroids").count()
    assert(nCells >= 950, s"expected ~1024 cells, got $nCells")
    val truth = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = Similarity.ivfSearch(spark, path, queries, "vec_id", "embedding", 10,
        nprobe = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = truth.intersect(got).size.toDouble / truth.size
    assert(recall >= 0.7, s"two-level nlist=1024 recall collapsed: $recall")
  }

  test("centroid-aligned probes agree with the flat argmax on separated centroids") {
    // 300 near-orthogonal centroid directions (64-dim gaussians): a probe
    // drawn AROUND one centroid has cosine ≈ 1/√|group| with that centroid's
    // group rep and ≈ 0 with the others, so the top-2-group argmax must
    // agree with flat nearly always. (With near-tied centroids agreement is
    // meaningless — the recall-parity tests above cover that regime.)
    val rng = new scala.util.Random(7)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val cents = (0 until 300).map(i => i -> unit()).toArray
    val two = SimilarityAlgos.matrix(cents)
    val flat = SimilarityAlgos.matrix(cents, twoLevel = false)
    assert(two.groupMembers.nonEmpty)
    val trials = 200
    val agree = (0 until trials).count { t =>
      val base = cents(t % 300)._2
      val v = base.map(x => x + rng.nextGaussian() * 0.05)
      SimilarityAlgos.best(arr(v), two) == SimilarityAlgos.best(arr(v), flat)
    }
    assert(agree >= (trials * 0.95).toInt, s"aligned-probe agreement too low: $agree/$trials")
  }

  test("two-level argmax never indexes ids(-1): duplicate centroids + zero-norm query") {
    // 300 near-duplicate centroids leave most centroid-groups empty after
    // the driver-side k-means; a zero-norm query scores every group -2.0
    // and probes blindly — best() must fall back to the flat argmax, not
    // throw ArrayIndexOutOfBounds
    val cents = Array.tabulate(300)(i => i -> Array(1.0, 0.0, 0.0, 1e-9 * i))
    val m = SimilarityAlgos.matrix(cents)
    val zero = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(0.0, 0.0, 0.0, 0.0))
    val cid = SimilarityAlgos.best(zero, m)
    assert(cents.exists(_._1 == cid)) // a real cid, no crash
    val dup = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(1.0, 0.0, 0.0, 0.0))
    assert(cents.exists(_._1 == SimilarityAlgos.best(dup, m)))
  }

  test("two-level probes survive duplicate centroids and zero-norm queries") {
    val cents = Array.tabulate(300)(i => i -> Array(1.0, 0.0, 0.0, 1e-9 * i))
    val m = SimilarityAlgos.matrix(cents)
    for (v <- Seq(Array(0.0, 0.0, 0.0, 0.0), Array(1.0, 0.0, 0.0, 0.0))) {
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v)
      val out = SimilarityAlgos.probes(arr, m, 4)
      assert(out.numElements() > 0, "probes must yield at least one cell")
      (0 until out.numElements()).foreach { i =>
        assert(cents.exists(_._1 == out.getInt(i)))
      }
    }
  }
}
