package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Empty frames, empty strings, and single rows through every pipeline
 * operator — the "zero rules crashed the runner" class of bug (round-3
 * ADVICE) applied to the pipeline surface. Everything must return an empty
 * or sensible frame, never throw. */
class DegenerateInputSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def oneDoc = Seq((1L, "just one lonely document here")).toDF("doc_id", "text")

  test("dedup family on empty and single-row corpora") {
    assert(Dedup.exact(emptyDocs, col("doc_id"), col("text")).count() == 0)
    assert(Dedup.exact(oneDoc, col("doc_id"), col("text")).count() == 1)
    assert(Dedup.minhashNearDups(emptyDocs, col("doc_id"), col("text")).count() == 0)
    assert(Dedup.minhashNearDups(oneDoc, col("doc_id"), col("text")).count() == 0)
    assert(Dedup.simhashNearDups(emptyDocs, col("doc_id"), col("text")).count() == 0)
    assert(Dedup.nearDupClusters(emptyDocs, col("doc_id"), col("text")).count() == 0)
    val single = Dedup.nearDupClusters(oneDoc, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toSeq
    assert(single == Seq((1L, 1L))) // singleton clusters to itself
    assert(Dedup.dropNearDups(emptyDocs, col("doc_id"), col("text")).count() == 0)
    assert(Dedup.dropNearDups(oneDoc, col("doc_id"), col("text")).count() == 1)
  }

  test("packing and sampling on empty corpora and zero-token docs") {
    assert(Curation.packSequences(emptyDocs, col("doc_id"), lit(0L), 512).count() == 0)
    assert(Curation.packGreedy(emptyDocs, col("doc_id"), lit(0L), 512).count() == 0)
    // zero-token docs pack without dividing or overflowing
    val zeros = Seq((1L, 0L), (2L, 0L), (3L, 5L)).toDF("id", "tok")
    val packed = Curation.packSequences(zeros, col("id"), col("tok"), 512, numBuckets = 1)
      .select("id", "seq_start", "seq_end").as[(Long, Long, Long)].collect().toSeq.sorted
    assert(packed == Seq((1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 0L)))
    assert(Curation.packGreedy(zeros, col("id"), col("tok"), 512, 1).count() == 3)
    // sampling: a budget for a domain absent from the data is a no-op;
    // empty input stays empty
    assert(Curation.sampleToTokenBudget(
      emptyDocs.withColumn("d", lit("x")), col("doc_id"), col("d"), lit(1L),
      Map("x" -> 10L)).count() == 0)
    val out = Curation.sampleToTokenBudget(
      oneDoc.withColumn("d", lit("present")), col("doc_id"), col("d"), lit(5L),
      Map("absent" -> 1L))
    assert(out.count() == 1) // unbudgeted domain keeps everything
  }

  test("text functions on empty and whitespace-only strings") {
    val out = Seq("", "   ", "\t\n", "word").toDF("text")
      .select(
        Text.tokenCount(col("text")).as("n"),
        Text.langId(col("text")).as("lang"),
        Text.qualityScore(col("text")).as("q"),
        Text.repetitionRatio(col("text")).as("r"),
        Text.gopherQuality(col("text")).as("g"),
        Text.shingles(col("text"), 3).as("sh"),
        Text.simhash(Text.shingles(col("text"), 3)).as("sig"),
        size(Text.minhash(Text.shingles(col("text"), 3))).as("mh"),
        size(Text.fingerprint(col("text"))).as("fp"))
      .collect()
    assert(out.length == 4) // nothing throws; values are defined
    assert(out.forall(r => r.getInt(7) == 64))
    assert(!out(0).getStruct(4).getBoolean(5)) // empty text fails the gopher gate
  }

  test("curation scoring on empty corpora") {
    assert(Curation.splitByHash(emptyDocs, col("doc_id")).count() == 0)
    assert(Curation.bm25(emptyDocs, col("doc_id"), col("text"), Seq("term")).count() == 0)
    assert(Curation.decontaminate(
      emptyDocs, col("doc_id"), col("text"), oneDoc, col("text")).count() == 0)
    // empty BENCHMARK side: nothing can overlap, corpus passes through clean
    assert(Curation.decontaminate(
      oneDoc, col("doc_id"), col("text"), emptyDocs, col("text")).count() == 0)
  }

  test("similarity search with empty corpus or empty queries") {
    val embs = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val noEmbs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Similarity.bruteForceTopK(noEmbs, embs, "vec_id", "embedding", 3).count() == 0)
    assert(Similarity.bruteForceTopK(embs, noEmbs, "vec_id", "embedding", 3).count() == 0)
    assert(Similarity.lshTopK(noEmbs, embs, "vec_id", "embedding", 3, dim = 2).count() == 0)
    assert(Similarity.embeddingNearDups(noEmbs, "vec_id", "embedding", 0.9, dim = 2).count() == 0)
  }
}
