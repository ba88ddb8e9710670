package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Positional phrase search: exact occurrence counts (overlaps included),
 * duplicate-term phrases, slot counting vs term counting, and scan-side
 * term pruning. */
class PhraseSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def index(docs: Seq[(Long, String)]): String = {
    val path = java.nio.file.Files.createTempDirectory("graft_phrase").toString
    Retrieval.buildPositionalIndex(docs.toDF("id", "text"), "id", "text", path)
    path
  }

  private def search(path: String, qs: Seq[(Long, String)]) =
    Retrieval.phraseSearch(spark, path, qs.toDF("qid", "p"), "qid", "p")
      .as[(Long, Long, Int)].collect().toSet

  test("counts every start position, overlapping matches included") {
    val path = index(Seq(
      (1L, "a a a a"), (2L, "the quick brown fox"), (3L, "quick brown shoes"),
      (4L, "The QUICK brown fox and the quick brown dog")))
    assert(search(path, Seq((10L, "a a"))) == Set((10L, 1L, 3)))
    assert(search(path, Seq((11L, "quick brown"))) ==
      Set((11L, 2L, 1), (11L, 3L, 1), (11L, 4L, 2))) // case-folded, twice in doc 4
    assert(search(path, Seq((12L, "brown fox"), (13L, "quick brown fox"))) ==
      Set((12L, 2L, 1), (12L, 4L, 1), (13L, 2L, 1), (13L, 4L, 1)))
    // all terms present but never adjacent → no hit
    assert(search(path, Seq((14L, "fox quick"))).isEmpty)
    // term absent entirely → no hit, and single-token phrase = tf positions
    assert(search(path, Seq((15L, "zebra"))).isEmpty)
    assert(search(path, Seq((16L, "a"))) == Set((16L, 1L, 4)))
  }

  test("duplicate-term phrases count slots, not distinct terms") {
    val path = index(Seq((1L, "x y x y x"), (2L, "x y z")))
    assert(search(path, Seq((1L, "x y x"))) == Set((1L, 1L, 2)))
    // doc 2 has x and y but not the second x slot's adjacency
    assert(search(path, Seq((2L, "y x y"))) == Set((2L, 1L, 1)))
  }

  private def near(path: String, qs: Seq[(Long, String)], slop: Int) =
    Retrieval.proximitySearch(spark, path, qs.toDF("qid", "p"), "qid", "p", slop)
      .as[(Long, Long, Int)].collect().toSet

  test("proximity: anchored NEAR semantics, slop boundary inclusive, unordered") {
    val path = index(Seq(
      (1L, "alpha x x x beta"), // distance 4
      (2L, "beta x alpha"), // distance 2, reversed order
      (3L, "alpha x x x x x beta"), // distance 6
      (4L, "alpha only here")))
    assert(near(path, Seq((1L, "alpha beta")), 4) ==
      Set((1L, 1L, 1), (1L, 2L, 1)))
    assert(near(path, Seq((2L, "alpha beta")), 6) ==
      Set((2L, 1L, 1), (2L, 2L, 1), (2L, 3L, 1)))
    assert(near(path, Seq((3L, "alpha beta")), 1).isEmpty)
    // single-term query degenerates to tf positions
    assert(near(path, Seq((4L, "alpha")), 0) ==
      Set((4L, 1L, 1), (4L, 2L, 1), (4L, 3L, 1), (4L, 4L, 1)))
  }

  test("proximity: every anchor witnessing ALL terms counts; missing term kills the doc") {
    val path = index(Seq(
      (1L, "a b c a b c a"), // anchors for (a,b,c) at slop 2: every a
      (2L, "a x x x x b c")))
    assert(near(path, Seq((1L, "a b c")), 2) == Set((1L, 1L, 3)))
    // doc 2: anchor a sits 5 from b and 6 from c — slop 6 is the first
    // window containing BOTH witnesses
    assert(near(path, Seq((2L, "a b c")), 5).map(_._2) == Set(1L))
    assert(near(path, Seq((3L, "a b c")), 6).map(_._2) == Set(1L, 2L))
    assert(near(path, Seq((4L, "a b zebra")), 99).isEmpty)
  }

  test("spellCorrections: ED<=1 complete via delete-1 keys, df ranking, OOV only") {
    val path = index(Seq(
      (1L, "hello world cat"), (2L, "hello cat"), (3L, "car")))
    def sugg(qs: Seq[(Long, String)]) =
      Retrieval.spellCorrections(spark, path, qs.toDF("qid", "t"), "qid", "t")
        .as[(Long, String, String, Long, Int)].collect().toSet
    // insertion, substitution, deletion all reachable; in-vocab terms silent
    assert(sugg(Seq((1L, "helo wurld cat"))) == Set(
      (1L, "helo", "hello", 2L, 1),
      (1L, "wurld", "world", 1L, 1)))
    // df ranks: caz -> cat (df 2) before car (df 1); ED 2 yields nothing
    assert(sugg(Seq((2L, "caz"), (3L, "wxrldz"))) == Set(
      (2L, "caz", "cat", 2L, 1),
      (2L, "caz", "car", 1L, 2)))
  }

  test("bestSnippets: max distinct terms per window, earliest tie, partial docs kept") {
    val path = index(Seq(
      (1L, "a x b x x a c"), // a:[0,5] b:[2] c:[6] x:[1,3,4]
      (2L, "b only here"),
      (3L, "nothing matches")))
    def run(w: Int) =
      Retrieval.bestSnippets(spark, path,
          Seq((9L, "a b c")).toDF("qid", "t"), "qid", "t", w)
        .as[(Long, Long, Int, Int)].collect().toSet
    // w=3: windows from 0 and 5 both cover 2 terms → earliest start wins
    assert(run(3) == Set((9L, 1L, 0, 2), (9L, 2L, 0, 1)))
    // w=7: the whole doc fits → all 3 terms from start 0
    assert(run(7) == Set((9L, 1L, 0, 3), (9L, 2L, 0, 1)))
    // w=1: every window is one token → best is the first matched position
    assert(run(1) == Set((9L, 1L, 0, 1), (9L, 2L, 0, 1)))
  }

  test("query terms prune the postings scan") {
    val path = index(Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta")))
    val df = Retrieval.phraseSearch(spark, path,
      Seq((1L, "alpha beta")).toDF("qid", "p"), "qid", "p")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"term IN not pushed to the postings scan:\n$plan")
  }

  test("prefixSearch: distinct-term and occurrence counts; StartsWith pushed down") {
    val path = index(Seq(
      (1L, "alpha alphabet beta alpha"), // alpha x2 + alphabet x1
      (2L, "alpine gamma"),
      (3L, "beta delta")))
    val df = Retrieval.prefixSearch(spark, path, "alp")
    assert(df.as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 2L, 3L), (2L, 1L, 1L)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("StringStartsWith(term,alp"),
      s"StartsWith not pushed to the postings scan:\n$plan")
    intercept[IllegalArgumentException] { Retrieval.prefixSearch(spark, path, "") }
  }
}
