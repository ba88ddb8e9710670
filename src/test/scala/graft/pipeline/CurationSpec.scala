package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("splitByHash is deterministic, content-addressed, and complete") {
    val ids = spark.range(1000).toDF("id")
    val a = Curation.splitByHash(ids, col("id")).as[(Long, String)].collect().toMap
    val b = Curation.splitByHash(ids, col("id")).as[(Long, String)].collect().toMap
    assert(a == b) // rerun → identical assignment
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    // growing the corpus never reassigns existing rows
    val grown = Curation.splitByHash(spark.range(2000).toDF("id"), col("id"))
      .as[(Long, String)].collect().toMap
    assert(a.forall { case (k, v) => grown(k) == v })
    // roughly 80/10/10 (content-addressed, so only approximately)
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
  }

  test("splitByHash custom percentages and validation") {
    val ids = spark.range(500).toDF("id")
    val out = Curation.splitByHash(ids, col("id"), trainPct = 100, valPct = 0)
      .select("split").distinct().as[String].collect().toSeq
    assert(out == Seq("train"))
    intercept[IllegalArgumentException] {
      Curation.splitByHash(ids, col("id"), trainPct = 80, valPct = 30)
    }
  }

  test("bm25 ranks docs by term relevance with length normalization") {
    val docs = Seq(
      (0L, "spark spark spark spark"),       // high tf, short
      (1L, "spark engine running a query"),  // one hit
      (2L, "nothing relevant here at all"),  // zero hits
      (3L, "spark spark engine engine query query word word word word word word") // hits but long
    ).toDF("doc_id", "text")
    val scores = Curation.bm25(docs, col("doc_id"), col("text"), Seq("spark"))
      .as[(Long, Double)].collect().toMap
    assert(scores(2L) == 0.0)
    assert(scores(0L) > scores(1L)) // more occurrences → higher
    assert(scores(0L) > scores(3L)) // same-ish tf but longer doc → lower
    // IDF sanity: a term in every doc scores below a term in one doc (per hit)
    val rare = Curation.bm25(docs, col("doc_id"), col("text"), Seq("nothing"))
      .as[(Long, Double)].collect().toMap
    assert(rare(2L) > 0.0)
    intercept[IllegalArgumentException] {
      Curation.bm25(docs, col("doc_id"), col("text"), Seq.empty)
    }
  }

  test("bm25 matches the closed-form formula on a tiny corpus") {
    // two docs, one term: verify against hand computation
    val docs = Seq((0L, "a b"), (1L, "a a a b")).toDF("doc_id", "text")
    val out = Curation.bm25(docs, col("doc_id"), col("text"), Seq("a"))
      .as[(Long, Double)].collect().toMap
    val n = 2.0; val avgdl = 3.0
    def score(tf: Double, dl: Double, df: Double): Double = {
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      BigDecimal(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out(0L) == score(1.0, 2.0, 2.0))
    assert(out(1L) == score(3.0, 4.0, 2.0))
  }

  test("decontaminate flags docs overlapping benchmark n-grams") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),  // contains the bench 4-gram
      (1L, "beta gamma delta epsilon different tail words here"), // shares shifted 4-gram
      (2L, "totally unrelated text with zero shared phrases at all")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("bid", "btext")
    val hits = Curation.decontaminate(
        corpus, col("doc_id"), col("text"), bench, col("btext"), n = 4)
      .as[(Long, Long)].collect().toMap
    assert(hits.contains(0L)) // shares "alpha beta gamma delta" + "beta gamma delta epsilon"
    assert(hits(0L) == 2L)
    assert(hits(1L) == 1L)    // shares "beta gamma delta epsilon"
    assert(!hits.contains(2L))
    // minShared filters the single-overlap doc
    val strict = Curation.decontaminate(
        corpus, col("doc_id"), col("text"), bench, col("btext"), n = 4, minShared = 2)
      .as[(Long, Long)].collect().toMap
    assert(strict.keySet == Set(0L))
  }

  test("decontaminate plan broadcasts the benchmark side (no corpus shuffle join)") {
    val corpus = Seq((0L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val bench = Seq((1L, "a b c d e f g h")).toDF("bid", "btext")
    val plan = Curation.decontaminate(
        corpus, col("doc_id"), col("text"), bench, col("btext"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"expected broadcast join in plan:\n$plan")
  }
}
