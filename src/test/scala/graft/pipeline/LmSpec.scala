package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interpolated bigram LM: hand-computed probabilities, OOV floor,
 * perplexity ordering (fluent text scores better than gibberish). */
class LmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed transition probability") {
    // corpus: "a b", "a c" -> N=4, V=3; c(a)=2, c(b)=c(c)=1; c(a,b)=c(a,c)=1
    val corpus = Seq("a b", "a c").toDF("text")
    val model = Lm.train(corpus, col("text"))
    val out = Lm.score(model, Seq((1L, "a b")).toDF("id", "text"),
      col("id"), col("text")).collect().head
    assert(out.getLong(1) == 1) // one transition
    // P = 0.5*(1/2) + 0.5*((1+1)/(4+3)) = 0.25 + 1/7, floored to e12 units
    val expected = math.floor((0.25 + 1.0 / 7.0) * 1e12).toLong
    assert(out.getLong(2) == expected)
    assert(out.getLong(3) == 0)
  }

  test("OOV transitions fall to the smoothed unigram floor and are counted") {
    val corpus = Seq("a b", "a c").toDF("text")
    val model = Lm.train(corpus, col("text"))
    val out = Lm.score(model, Seq((1L, "a zzz")).toDF("id", "text"),
      col("id"), col("text")).collect().head
    // P = 0.5*0 + 0.5*((0+1)/(4+3)) = 1/14, floored to e12 units
    assert(out.getLong(2) == math.floor(0.5 * (1.0 / 7.0) * 1e12).toLong)
    assert(out.getLong(3) == 1)
  }

  test("docs with fewer than two words score zero, rows preserved") {
    val corpus = Seq("a b").toDF("text")
    val model = Lm.train(corpus, col("text"))
    val out = Lm.score(model, Seq((1L, "a"), (2L, "")).toDF("id", "text"),
      col("id"), col("text")).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getLong(1) == 0 && r.getLong(2) == 0 && r.getLong(3) == 0)
    }
  }

  test("PMI collocations: hand-computed value, hapax suppressed by minCount") {
    // unigrams: new=3 york=3 city=1, N=7; bigram (new,york)=3
    val corpus = Seq("new york new york", "new york city").toDF("text")
    val model = Lm.train(corpus, col("text"))
    val out = Lm.collocations(model, minCount = 2L).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getLong(2)) == (("new", "york", 3L)))
    assert(r.getDouble(3) == BigDecimal(math.log(7.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("perplexity ranks in-distribution text below shuffled gibberish") {
    val corpus = (1 to 50).map(_ => "the quick brown fox jumps over the lazy dog").toDF("text")
    val model = Lm.train(corpus, col("text"))
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "dog the over fox quick")).toDF("id", "text")
    val out = Lm.score(model, docs, col("id"), col("text"), includeLogScores = true)
      .select(col("id"), col("ppl")).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) < out(2L), s"fluent ppl ${out(1L)} should beat shuffled ${out(2L)}")
  }

  test("perplexity buckets: fluent text lands above gibberish, short docs in the tail") {
    val corpus = (1 to 50).map(_ => "the quick brown fox jumps over the lazy dog").toDF("text")
    val model = Lm.train(corpus, col("text"))
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // in-distribution
      (2L, "fox the dog brown jumps lazy the over"),       // shuffled
      (3L, "zzq9 vvk7 qqx3 wwy5 aab1 ccd2"),               // gibberish
      (4L, "hi")                                           // no transitions → tail
    ).toDF("id", "text")
    val out = Lm.perplexityBuckets(model, docs, col("id"), col("text"), nBuckets = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(1L) > out(3L), s"fluent ${out(1L)} must outrank gibberish ${out(3L)}")
    assert(out(4L) == 0)
    assert(out.values.toSet.subsetOf(Set(0, 1, 2)))
  }

  test("paragraph filter drops gibberish paragraphs, keeps order and short units") {
    val corpus = (1 to 50).map(_ => "the quick brown fox jumps over the lazy dog").toDF("text")
    val model = Lm.train(corpus, col("text"))
    val docs = Seq(
      (1L, "the quick brown fox\n\nzzq9 vvk7 qqx3 wwy5\n\nover the lazy dog"),
      (2L, "the quick brown fox jumps"),       // single good paragraph
      (3L, "zzq9 vvk7 qqx3\n\nvvk7 zzq9 wwy5"), // all gibberish → empty
      (4L, "hi\n\nthe quick brown fox")         // 1-word para: n_trans=0, kept
    ).toDF("id", "text")
    // in-distribution transitions score ~0.5e12 (dominant bigram); the OOV
    // floor is orders of magnitude below 1e10
    val out = Lm.filterParagraphs(model, docs, col("id"), col("text"),
        minMeanProbE12 = 10000000000L)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "the quick brown fox\n\nover the lazy dog")
    assert(out(2L) == "the quick brown fox jumps")
    assert(out(3L) == "")
    assert(out(4L) == "hi\n\nthe quick brown fox")
  }
}
