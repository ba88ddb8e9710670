package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DataCardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    ("web", "the quick brown fox jumps over the lazy dog and keeps running far"),
    ("web", "the quick brown fox jumps over the lazy dog and keeps running far"),
    ("wiki", "a reference article with many careful words describing the topic at hand"),
    ("wiki", "contact me at first.last@example.com for all the gory details today"))
    .toDF("src", "text")

  test("card renders totals, domains, languages and ngrams deterministically") {
    val card = DataCard.generate(corpus, col("text"), col("src"), title = "Test corpus")
    assert(card.startsWith("# Test corpus"))
    assert(card.contains("- documents: 4"))
    assert(card.contains("## Composition by domain"))
    // sorted domain order and per-domain doc counts
    val webIdx = card.indexOf("| web |")
    val wikiIdx = card.indexOf("| wiki |")
    assert(webIdx > 0 && wikiIdx > 0 && webIdx < wikiIdx)
    assert(card.contains("| web | 2 |"))
    // the planted email marks exactly one wiki doc as PII
    assert(card.linesIterator.exists(l => l.startsWith("| wiki | 2 |") &&
      l.split('|')(4).trim == "1"))
    assert(card.contains("## Language mix") && card.contains("| en | 4 |"))
    assert(card.contains("trigrams by document frequency"))
    assert(card.contains("| brown fox jumps | 2 |"))
    // deterministic: identical corpus → identical card
    assert(card == DataCard.generate(corpus, col("text"), col("src"),
      title = "Test corpus"))
  }

  test("high-cardinality domains: card stays bounded with an exact (other) rollup") {
    // 60 distinct hosts, 1-2 docs each; cap at 5 → the driver sees 5 rows
    // plus one rollup, never 60
    val many = (1 to 60).flatMap { i =>
      val docs = if (i <= 3) 2 else 1 // three heavy hosts take the top slots
      Seq.fill(docs)((f"h$i%03d.example.com", s"document body number $i with several plain words"))
    }.toDF("src", "text")
    val card = DataCard.generate(many, col("text"), col("src"),
      title = "Big corpus", maxDomains = 5)
    val compLines = card.linesIterator
      .dropWhile(!_.startsWith("## Composition")).drop(4)
      .takeWhile(_.startsWith("|")).toSeq
    assert(compLines.size == 6) // 5 domains + the rollup row
    assert(compLines.last.startsWith("| (other: 55 domains) |"))
    // rollup doc count is exact: 63 total docs - (3*2 + 2*1) shown = 55
    assert(card.contains("- documents: 63"))
    assert(compLines.last.split('|')(2).trim == "55")
    // the three heavy hosts made the cut (top-N is by docs, not name)
    assert(card.contains("| h001.example.com | 2 |"))
    assert(card.contains("| h003.example.com | 2 |"))
    // deterministic under the cap too
    assert(card == DataCard.generate(many, col("text"), col("src"),
      title = "Big corpus", maxDomains = 5))
  }

  test("empty corpus renders an empty-but-valid card") {
    val card = DataCard.generate(
      Seq.empty[(String, String)].toDF("src", "text"), col("text"), col("src"))
    assert(card.contains("- documents: 0"))
    assert(card.contains("## Language mix"))
  }
}
