package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hashed-BoW pseudo-embeddings: deterministic unit vectors whose cosine
 * tracks lexical overlap, degenerate-zero for empty text, and good enough
 * to drive the embedding tier (near-dup detection) without a model. */
class HashedBowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vec(texts: String*) =
    texts.toSeq.toDF("text")
      .select(Text.hashedBow(col("text"), 256).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)

  private def cos(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("unit-norm, deterministic, zero for empty text") {
    val Array(v1, v2, empty) = vec("the quick brown fox", "the quick brown fox", "   ")
    assert(v1.toSeq == v2.toSeq)
    assert(math.abs(cos(v1, v1) - 1.0) < 1e-12)
    assert(empty.forall(_ == 0.0))
    assert(v1.length == 256)
  }

  test("cosine tracks lexical overlap") {
    val Array(a, b, c) = vec(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over a sleepy dog",   // one-word change
      "stock market prices fell sharply after the announcement")
    assert(cos(a, b) > 0.8, s"near-identical texts: ${cos(a, b)}")
    assert(cos(a, c) < 0.5, s"unrelated texts: ${cos(a, c)}")
    assert(cos(a, b) > cos(a, c))
  }

  test("drives model-free semantic dedup end to end") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog today"), // near-dup of 1
      (3L, "stock market prices fell sharply after the announcement"),
      (4L, "completely different gardening advice about tomato plants")
    ).toDF("doc_id", "text")
    val withVecs = docs.select(col("doc_id"),
      Text.hashedBow(col("text"), 256).as("embedding"))
    val kept = Similarity.semanticDedup(
        withVecs, "doc_id", "embedding", threshold = 0.8, nlist = 2, iters = 3)
      .select("id").as[Long].collect().toSet
    assert(!kept.contains(2L), "near-dup must collapse onto doc 1")
    assert(kept.contains(1L) && kept.contains(3L) && kept.contains(4L))
  }

  test("SQL-registered as hashed_bow") {
    Seq(Tuple1("a b c")).toDF("t").createOrReplaceTempView("graft_hbow")
    val v = spark.sql("SELECT hashed_bow(t, 64) AS v FROM graft_hbow")
      .collect().head.getSeq[Double](0)
    assert(v.length == 64 && math.abs(v.map(x => x * x).sum - 1.0) < 1e-12)
  }
}
