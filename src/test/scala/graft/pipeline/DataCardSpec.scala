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

  test("empty corpus renders an empty-but-valid card") {
    val card = DataCard.generate(
      Seq.empty[(String, String)].toDF("src", "text"), col("text"), col("src"))
    assert(card.contains("- documents: 0"))
    assert(card.contains("## Language mix"))
  }
}
