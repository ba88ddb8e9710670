package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Matryoshka truncation: unit norms, ordering invariance under re-norm,
 * usable recall at quarter dimension on structured vectors. */
class MatryoshkaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(n: Int, dim: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      // leading dims carry the cluster structure, tail is noise — the MRL
      // premise the truncation exploits
      val base = Array.tabulate(dim)(d =>
        if (d < dim / 4) math.sin((i % 5 + 1) * (d + 1)) else rnd.nextGaussian() * 0.2)
      (i.toLong, base.toSeq)
    }.toDF("id", "v")
  }

  test("truncated vectors are unit length; zero vectors pass through") {
    val df = Seq((1L, Seq(3.0, 4.0, 9.0, 9.0)), (2L, Seq(0.0, 0.0, 5.0, 5.0)))
      .toDF("id", "v")
      .select(col("id"), Similarity.truncateNormalize(col("v"), 2).as("t"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(1L) === Seq(0.6, 0.8))
    assert(got(2L) === Seq(0.0, 0.0))
  }

  test("re-norm never changes the top-k ordering") {
    val corpus = vecs(200, 32, 1)
    val queries = vecs(8, 32, 2).withColumn("id", col("id") + 1000L)
    def top(c: org.apache.spark.sql.DataFrame, q: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(c, q, "id", "v", 5)
        .select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val tc = corpus.select(col("id"), Similarity.truncateNormalize(col("v"), 8).as("v"))
    val tq = queries.select(col("id"), Similarity.truncateNormalize(col("v"), 8).as("v"))
    val rawC = corpus.select(col("id"),
      transform(slice(col("v"), 1, 8), x => x).as("v"))
    val rawQ = queries.select(col("id"),
      transform(slice(col("v"), 1, 8), x => x).as("v"))
    assert(top(tc, tq) === top(rawC, rawQ))
  }

  test("quarter-dimension recall stays high on energy-concentrated vectors") {
    // per-vector random directions with 3x energy in the leading quarter —
    // neighborhoods are decided mostly by the dims truncation keeps
    def heavyHead(n: Int, seed: Int) = {
      val rnd = new scala.util.Random(seed)
      (0 until n).map { i =>
        (i.toLong, Array.tabulate(32)(d =>
          rnd.nextGaussian() * (if (d < 8) 3.0 else 0.5)).toSeq)
      }.toDF("id", "v")
    }
    val corpus = heavyHead(300, 3)
    val queries = heavyHead(10, 4).withColumn("id", col("id") + 1000L)
    val truth = Similarity.bruteForceTopK(corpus, queries, "id", "v", 5)
    val tc = corpus.select(col("id"), Similarity.truncateNormalize(col("v"), 8).as("v"))
    val tq = queries.select(col("id"), Similarity.truncateNormalize(col("v"), 8).as("v"))
    val pred = Similarity.bruteForceTopK(tc, tq, "id", "v", 5)
    val recall = Similarity.evalTopK(pred, truth).collect().head.getLong(2)
    assert(recall > 700000L, s"recall@5 too low: $recall")
  }
}
