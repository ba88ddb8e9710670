package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-probe LSH: recall dominates single-probe at equal tables,
 * exhaustive probing equals brute force, probe lists are well-formed. */
class MultiprobeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(n: Int, dim: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val base = Array.tabulate(dim)(d => math.sin(d * (i % 7 + 1)))
      (i.toLong, base.map(x => x + rnd.nextGaussian() * 0.3).toSeq)
    }.toDF("id", "v")
  }

  private def recall(pred: org.apache.spark.sql.DataFrame,
      truth: org.apache.spark.sql.DataFrame): Long =
    Similarity.evalTopK(pred, truth).collect().head.getLong(2)

  test("multi-probe recall >= single-probe at the same table count") {
    val corpus = vecs(400, 16, 1)
    val queries = vecs(20, 16, 2).withColumn("id", col("id") + 10000L)
    val truth = Similarity.bruteForceTopK(corpus, queries, "id", "v", k = 5)
    val single = Similarity.lshTopK(corpus, queries, "id", "v", k = 5,
      nPlanes = 10, dim = 16, tables = 2)
    val multi = Similarity.lshTopKMultiprobe(corpus, queries, "id", "v", k = 5,
      nPlanes = 10, dim = 16, tables = 2, nProbe = 6)
    val rs = recall(single, truth)
    val rm = recall(multi, truth)
    assert(rm >= rs, s"multiprobe $rm < single $rs")
    assert(rm > 600000L, s"multiprobe recall too low: $rm")
  }

  test("probing every bucket equals brute force") {
    val corpus = vecs(150, 8, 3)
    val queries = vecs(10, 8, 4).withColumn("id", col("id") + 10000L)
    val truth = Similarity.bruteForceTopK(corpus, queries, "id", "v", k = 4)
      .select("query_id", "neighbor_id", "sim")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = Similarity.lshTopKMultiprobe(corpus, queries, "id", "v", k = 4,
        nPlanes = 4, dim = 8, tables = 1, nProbe = 16)
      .select("query_id", "neighbor_id", "sim")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all === truth)
  }
}
