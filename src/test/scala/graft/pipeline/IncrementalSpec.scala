package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental ingest dedup: batch-by-batch results must equal the
 * whole-corpus rerun, and a retried batch must be a no-op (idempotent
 * index append, same-id guards). */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_incr").toString

  test("exactIncremental over two batches equals the full-corpus exact dedup") {
    val b1 = Seq(
      (1L, "alpha beta gamma"), (2L, "delta epsilon"), (3L, "alpha beta gamma"),
      (4L, "unique one")).toDF("doc_id", "text")
    val b2 = Seq(
      (11L, "delta epsilon"),        // exact dup of doc 2 (cross-batch)
      (12L, "fresh content here"),   // new
      (13L, "fresh content here"),   // in-batch dup of 12
      (14L, "alpha beta gamma")      // cross-batch dup of 1
    ).toDF("doc_id", "text")
    val idx = s"${tmp()}/fp"
    val k1 = Incremental.exactIncremental(b1, col("doc_id"), idx, col("text"))
      .select("doc_id").as[Long].collect().toSet
    val k2 = Incremental.exactIncremental(b2, col("doc_id"), idx, col("text"))
      .select("doc_id").as[Long].collect().toSet
    val full = Dedup.exact(b1.unionAll(b2), col("doc_id"), col("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(k1 ++ k2 == full, s"incremental ${k1 ++ k2} != full rerun $full")
    assert(k2 == Set(12L))
  }

  test("exactIncremental retry is idempotent: same result, index unchanged") {
    val b = Seq((1L, "one"), (2L, "two"), (3L, "one")).toDF("doc_id", "text")
    val idx = s"${tmp()}/fp"
    val first = Incremental.exactIncremental(b, col("doc_id"), idx, col("text"))
      .select("doc_id").as[Long].collect().toSet
    val rowsAfterFirst = spark.read.parquet(idx).count()
    val retry = Incremental.exactIncremental(b, col("doc_id"), idx, col("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(first == Set(1L, 2L) && retry == first)
    assert(spark.read.parquet(idx).count() == rowsAfterFirst, "retry appended rows")
  }

  test("minhashIncremental over two batches equals the full-corpus near-dedup") {
    // 20-word docs; near-dups share all but the last word (trigram-shingle
    // jaccard ≈ 0.9, far above the 0.8 threshold; estimated and exact verify
    // agree decisively at this separation)
    def doc(seed: Int) =
      (0 until 20).map(i => s"w${seed}_$i").mkString(" ")
    def nearDoc(seed: Int) =
      ((0 until 19).map(i => s"w${seed}_$i") :+ "changed").mkString(" ")
    val b1 = Seq(
      (1L, doc(1)), (2L, doc(2)), (3L, nearDoc(1)), (4L, doc(4)))
      .toDF("doc_id", "text")
    val b2 = Seq(
      (11L, nearDoc(2)),  // near-dup of doc 2 (cross-batch) -> dropped
      (12L, doc(12)),     // new -> kept
      (13L, nearDoc(12)), // in-batch near-dup of 12 -> dropped
      (14L, doc(14))      // new -> kept
    ).toDF("doc_id", "text")
    val idx = tmp()
    val k1 = Incremental.minhashIncremental(b1, col("doc_id"), col("text"), idx,
      threshold = 0.8).select("id").as[Long].collect().toSet
    val k2 = Incremental.minhashIncremental(b2, col("doc_id"), col("text"), idx,
      threshold = 0.8).select("id").as[Long].collect().toSet
    val full = Dedup.dropNearDups(
        b1.unionAll(b2).select(col("doc_id").as("id"), col("text")),
        col("id"), col("text"), threshold = 0.8)
      .select("id").as[Long].collect().toSet
    assert(k1 ++ k2 == full, s"incremental ${k1 ++ k2} != full rerun $full")
    assert(k2 == Set(12L, 14L))
  }

  test("minhashIncremental retry is idempotent: same result, index unchanged") {
    def doc(seed: Int) = (0 until 20).map(i => s"r${seed}_$i").mkString(" ")
    val b = Seq((1L, doc(1)), (2L, doc(2))).toDF("doc_id", "text")
    val idx = tmp()
    val first = Incremental.minhashIncremental(b, col("doc_id"), col("text"), idx)
      .select("id").as[Long].collect().toSet
    val sigRows = spark.read.parquet(s"$idx/sigs").count()
    val bandRows = spark.read.parquet(s"$idx/bands").count()
    val retry = Incremental.minhashIncremental(b, col("doc_id"), col("text"), idx)
      .select("id").as[Long].collect().toSet
    assert(first == Set(1L, 2L) && retry == first)
    assert(spark.read.parquet(s"$idx/sigs").count() == sigRows, "retry appended sigs")
    assert(spark.read.parquet(s"$idx/bands").count() == bandRows, "retry appended bands")
  }

  test("compact shrinks index files, leaves results and counts identical") {
    def doc(i: Long) = s"document number $i with plenty of distinct words " +
      s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i"
    val idx = tmp() + "/minhash_idx"
    // several small batches -> many small files
    (0 until 4).foreach { b =>
      val batch = (b * 10L until b * 10L + 10L).map(i => (i, doc(i))).toDF("doc_id", "text")
      Incremental.minhashIncremental(batch, col("doc_id"), col("text"), idx, threshold = 0.8)
    }
    def files(d: String) = {
      val f = new java.io.File(d)
      Option(f.listFiles()).map(_.count(x => x.getName.endsWith(".parquet"))).getOrElse(0)
    }
    def counts() = (
      spark.read.parquet(s"$idx/sigs").count(),
      spark.read.parquet(s"$idx/bands").count())
    val before = counts()
    val filesBefore = files(s"$idx/sigs")
    Incremental.compact(spark, idx, targetFilesPerTable = 1)
    assert(counts() == before)
    assert(files(s"$idx/sigs") == 1 && files(s"$idx/sigs") < filesBefore)
    // the compacted index still dedups: a near-dup of an indexed doc drops
    val probe = Seq((999L, doc(5) + " slight tail")).toDF("doc_id", "text")
    val kept = Incremental.minhashIncremental(probe, col("doc_id"), col("text"), idx,
      threshold = 0.8)
    assert(kept.count() == 0)

    // bare fingerprint index compacts too
    val fpIdx = tmp() + "/fp_idx"
    (0 until 3).foreach { b =>
      val batch = (b * 5L until b * 5L + 5L).map(i => (i, doc(i))).toDF("doc_id", "text")
      Incremental.exactIncremental(batch, col("doc_id"), fpIdx, col("text"))
    }
    val fpBefore = spark.read.parquet(fpIdx).count()
    Incremental.compact(spark, fpIdx, targetFilesPerTable = 1)
    assert(spark.read.parquet(fpIdx).count() == fpBefore)
    assert(files(fpIdx) == 1)
  }

  test("retry never re-judges within-batch pairs via the estimated verify") {
    // two docs with HIGH but below-threshold overlap: the within-batch
    // EXACT verify keeps both; on retry they are already indexed under
    // each other's ids, and without the batch-id guard the ESTIMATED
    // agreement (sigma ~0.06) could drop one — the guard makes the retry
    // structurally identical to run 1
    val words = (1 to 40).map(i => s"w$i")
    val a = words.mkString(" ")                       // w1..w40
    val b = (words.drop(8) ++ Seq("x1", "x2", "x3", "x4", "x5", "x6", "x7", "x8"))
      .mkString(" ")                                  // ~0.6 exact jaccard
    val batch = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val idx = tmp()
    val k1 = Incremental.minhashIncremental(batch, col("doc_id"), col("text"), idx,
      threshold = 0.8).select("id").as[Long].collect().toSet
    val k2 = Incremental.minhashIncremental(batch, col("doc_id"), col("text"), idx,
      threshold = 0.8).select("id").as[Long].collect().toSet
    assert(k1 == Set(1L, 2L) && k2 == k1, s"run1 $k1 retry $k2")
  }
}
