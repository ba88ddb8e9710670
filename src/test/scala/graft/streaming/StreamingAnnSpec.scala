package graft.streaming

import graft.TestSpark
import graft.pipeline.{Pq, Similarity, Sq}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ANN index maintenance: stream-appended index == the batch
 * append over the same rows for every tier, replayed batches are
 * structural no-ops (id anti-join), and search over a live-appended
 * index finds the streamed points. */
class StreamingAnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  /** Deterministic 8-dim clustered vectors (IvfAppendSpec's shape). */
  private def mkVecs(ids: Range, seed: Int) = {
    val rng = new scala.util.Random(seed)
    val base = Seq(
      Array.tabulate(8)(i => if (i < 3) 1.0 else 0.0),
      Array.tabulate(8)(i => if (i >= 3 && i < 6) 1.0 else 0.0),
      Array.tabulate(8)(i => if (i >= 6) 1.0 else 0.0))
    ids.map { id =>
      val b = base(id % 3)
      (id.toLong, b.map(x => x + rng.nextDouble() * 0.2).toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def cells(path: String) =
    spark.read.parquet(s"$path/cells").select("neighbor_id", "cid")
      .as[(Long, Int)].collect().toSet

  test("streamed IVF appends equal the batch appends; search finds streamed points") {
    implicit val sqlCtx = spark.sqlContext
    val streamIdx = tmp("graft_sann_s")
    val batchIdx = tmp("graft_sann_b")
    val base = mkVecs(0 until 300, 11)
    Similarity.ivfBuild(base, "vec_id", "embedding", streamIdx, nlist = 4, iters = 3)
    Similarity.ivfBuild(base, "vec_id", "embedding", batchIdx, nlist = 4, iters = 3)

    val b1 = mkVecs(300 until 400, 13)
    val b2 = mkVecs(400 until 450, 17)
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = StreamingAnn.indexAppendBuilder(
        mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", streamIdx)
      .option("checkpointLocation", tmp("graft_sann_ck")).start()
    try {
      mem.addData(b1.as[(Long, Seq[Double])].collect(): _*)
      q.processAllAvailable()
      mem.addData(b2.as[(Long, Seq[Double])].collect(): _*)
      q.processAllAvailable()
    } finally q.stop()

    Similarity.ivfAppend(spark, batchIdx, b1, "vec_id", "embedding")
    Similarity.ivfAppend(spark, batchIdx, b2, "vec_id", "embedding")
    assert(cells(streamIdx) == cells(batchIdx),
      "stream-appended cells must equal the batch appends")

    // a query near the streamed points must retrieve them from the live index
    val queries = mkVecs(430 until 431, 17).toDF("vec_id", "embedding")
    val hits = Similarity.ivfSearch(spark, streamIdx, queries,
        "vec_id", "embedding", k = 5)
      .select("neighbor_id").as[Long].collect()
    assert(hits.nonEmpty && hits.forall(id => id >= 0 && id < 450))
  }

  test("replayed micro-batch is a structural no-op for every tier") {
    val batch = mkVecs(300 until 350, 13).toDF("graft_id", "graft_vec")
    for (tier <- Seq("ivf", "ivfsq", "ivfpq")) {
      val idx = tmp(s"graft_sann_$tier")
      val base = mkVecs(0 until 300, 11)
      tier match {
        case "ivf" => Similarity.ivfBuild(base, "vec_id", "embedding", idx, nlist = 4, iters = 3)
        case "ivfsq" => Sq.ivfSqBuild(base, "vec_id", "embedding", idx, nlist = 4, iters = 3)
        case "ivfpq" => Pq.ivfPqBuild(base, "vec_id", "embedding", idx,
          nlist = 4, mSub = 4, ksub = 8, iters = 3)
      }
      StreamingAnn.processBatch(batch, idx, tier)
      val once = spark.read.parquet(s"$idx/cells").count()
      StreamingAnn.processBatch(batch, idx, tier) // at-least-once replay
      val twice = spark.read.parquet(s"$idx/cells").count()
      assert(once == 350L && twice == once, s"$tier: replay must not duplicate")
    }
  }

  test("unknown tier and empty batch are handled") {
    intercept[IllegalArgumentException] {
      StreamingAnn.indexAppendBuilder(
        spark.readStream.format("rate").load(), "value", "value", "/tmp/x", "hnsw")
    }
    val idx = tmp("graft_sann_e")
    Similarity.ivfBuild(mkVecs(0 until 30, 7), "vec_id", "embedding", idx,
      nlist = 2, iters = 2)
    val before = cells(idx)
    StreamingAnn.processBatch(
      mkVecs(0 until 0, 7).toDF("graft_id", "graft_vec"), idx, "ivf")
    assert(cells(idx) == before)
  }
}
