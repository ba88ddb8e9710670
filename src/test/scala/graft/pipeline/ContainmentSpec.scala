package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shingle-containment join and containment decontamination: the asymmetric
 * overlap Jaccard machinery cannot see (short query quoted inside a long
 * doc), paraphrase tolerance, the hot-shingle cap's recall trade, and the
 * no-cartesian plan shape. */
class ContainmentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val benchItem =
    "the quick brown fox jumps over the lazy dog while seven wizards brew strong potions at midnight"
  private val filler = (1 to 300).map(i => s"filler$i").mkString(" ")

  test("short query inside a long doc: containment 1.0 where Jaccard LSH sees nothing") {
    val corpus = Seq(
      (1L, s"$filler $benchItem more trailing words here"),
      (2L, filler)).toDF("id", "text")
    val bench = Seq((100L, benchItem)).toDF("id", "text")
    val hits = Dedup.containmentJoin(
        bench, col("id"), col("text"), corpus, col("id"), col("text"),
        shingleSize = 5, threshold = 0.8)
      .as[(Long, Long, Double)].collect()
    assert(hits.toSeq == Seq((100L, 1L, 1.0)), s"got ${hits.toSeq}")
    // the symmetric machinery genuinely misses this pair at dedup thresholds
    val jaccardPairs = Dedup.minhashNearDupJoin(
      bench, col("id"), col("text"), corpus, col("id"), col("text"),
      threshold = 0.5).count()
    assert(jaccardPairs == 0L, "jaccard near-dup join should NOT see the containment pair")
  }

  test("paraphrase tolerance: light edits drop containment below 1 but above the gate") {
    // corrupt one word mid-item: every shingle crossing the edit dies (5 of
    // the 12), a verbatim-span matcher loses every window crossing it too;
    // shingle containment lands at 7/12 — degraded, not destroyed
    val edited = benchItem.split(" ").zipWithIndex
      .map { case (w, i) => if (i == 11) w + "x" else w }
      .mkString(" ")
    val corpus = Seq((1L, s"$filler $edited $filler")).toDF("id", "text")
    val bench = Seq((100L, benchItem)).toDF("id", "text")
    val c = Dedup.containmentJoin(
        bench, col("id"), col("text"), corpus, col("id"), col("text"),
        shingleSize = 5, threshold = 0.3)
      .select(col("containment")).as[Double].collect()
    assert(c.length == 1 && c.head > 0.3 && c.head < 1.0,
      s"expected partial containment, got ${c.toSeq}")
  }

  test("decontaminateByContainment drops exactly the containing docs") {
    val corpus = Seq(
      (1L, s"$filler $benchItem"),
      (2L, filler),
      (3L, s"$benchItem $filler"),
      (4L, "completely unrelated text about databases and sorting algorithms")
    ).toDF("id", "text")
    val bench = Seq((100L, benchItem)).toDF("id", "text")
    val kept = Dedup.decontaminateByContainment(
        corpus, col("id"), col("text"), bench, col("id"), col("text"),
        shingleSize = 5, threshold = 0.8)
      .select(col("id")).as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 4L))
  }

  test("maxShingleDf caps boilerplate fan-out; the recall bias is real and opt-in") {
    // a boilerplate sentence present in EVERY corpus doc + one real quote
    val boiler = "subscribe to our newsletter for daily updates and exclusive offers today friends"
    val corpus = (1L to 50L).map(i => (i, s"$boiler doc$i specific tail words ${i * 7}"))
      .toDF("id", "text")
    val benchBoiler = Seq((100L, boiler)).toDF("id", "text")
    // uncapped: the boilerplate query "contaminates" all 50 docs
    val uncapped = Dedup.containmentJoin(
      benchBoiler, col("id"), col("text"), corpus, col("id"), col("text"),
      shingleSize = 5, threshold = 0.8).count()
    assert(uncapped == 50L)
    // capped at df<=10: boilerplate shingles drop from the index → unseen
    val capped = Dedup.containmentJoin(
      benchBoiler, col("id"), col("text"), corpus, col("id"), col("text"),
      shingleSize = 5, threshold = 0.8, maxShingleDf = 10).count()
    assert(capped == 0L, "capped index must not see boilerplate-only queries")
  }

  test("plan is an equi-join on the shingle hash — no cartesian, no broadcast of the corpus") {
    val corpus = (1L to 20L).map(i => (i, s"unique words for document number $i " * 3))
      .toDF("id", "text")
    val bench = Seq((100L, "unique words for document number 7")).toDF("id", "text")
    val plan = Dedup.containmentJoin(
      bench, col("id"), col("text"), corpus, col("id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop join in plan:\n$plan")
  }

  test("degenerate inputs: empty texts, sub-shingle docs, empty frames") {
    val corpus = Seq((1L, ""), (2L, "one two"), (3L, "a b c d e f g")).toDF("id", "text")
    val bench = Seq((100L, ""), (101L, "a b c d e f g")).toDF("id", "text")
    val hits = Dedup.containmentJoin(
        bench, col("id"), col("text"), corpus, col("id"), col("text"),
        shingleSize = 5, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    // empty bench text shingles to the empty shingle, which only matches the
    // empty corpus doc; the 7-word docs share all their 5-shingles
    assert(hits == Set((100L, 1L, 1.0), (101L, 3L, 1.0)), s"got $hits")
    val none = Dedup.containmentJoin(
      Seq.empty[(Long, String)].toDF("id", "text"), col("id"), col("text"),
      corpus, col("id"), col("text")).count()
    assert(none == 0L)
  }
}
