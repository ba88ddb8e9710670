package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental ANN index append: appending a batch against the frozen
 * centroids (and SQ ranges) must search identically to a full rebuild over
 * the same model, retries must be no-ops, and the manifest-guarded
 * compaction swap must survive a simulated mid-swap crash. */
class IvfAppendSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

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
  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

  test("ivfAppend == full rebuild over the same centroids; retry is a no-op") {
    val b1 = mkVecs(0 until 300, 11)
    val b2 = mkVecs(300 until 450, 13)
    val queries = mkVecs(9000 until 9010, 17)
    val incr = tmp("graft_ivf_incr")
    val full = tmp("graft_ivf_full")
    Similarity.ivfBuild(b1, "vec_id", "embedding", incr, nlist = 4, iters = 3)
    Similarity.ivfAppend(spark, incr, b2, "vec_id", "embedding")
    Similarity.ivfBuild(b1.unionAll(b2), "vec_id", "embedding", full,
      centroidsFrom = Some(incr))
    def search(p: String) = pairs(
      Similarity.ivfSearch(spark, p, queries, "vec_id", "embedding", 5, nprobe = 2))
    assert(search(incr) == search(full),
      "append-then-search must equal rebuild-then-search on frozen centroids")
    // retried append: deterministic assignment + pruned anti-join → no new rows
    val before = spark.read.parquet(s"$incr/cells").count()
    Similarity.ivfAppend(spark, incr, b2, "vec_id", "embedding")
    assert(spark.read.parquet(s"$incr/cells").count() == before, "retry appended rows")
    assert(search(incr) == search(full))
  }

  test("ivfSqAppend == full rebuild over the same centroids and quantizer") {
    val b1 = mkVecs(0 until 300, 19)
    val b2 = mkVecs(300 until 450, 23)
    val queries = mkVecs(9000 until 9010, 29)
    val incr = tmp("graft_ivfsq_incr")
    val full = tmp("graft_ivfsq_full")
    Sq.ivfSqBuild(b1, "vec_id", "embedding", incr, nlist = 4, iters = 3)
    Sq.ivfSqAppend(spark, incr, b2, "vec_id", "embedding")
    Sq.ivfSqBuild(b1.unionAll(b2), "vec_id", "embedding", full, modelFrom = Some(incr))
    def search(p: String) = pairs(
      Sq.ivfSqSearch(spark, p, queries, "vec_id", "embedding", 5, nprobe = 2))
    assert(search(incr) == search(full),
      "sq append-then-search must equal rebuild-then-search on the frozen model")
    val before = spark.read.parquet(s"$incr/cells").count()
    Sq.ivfSqAppend(spark, incr, b2, "vec_id", "embedding")
    assert(spark.read.parquet(s"$incr/cells").count() == before, "retry appended rows")
  }

  test("ivfPqAppend == full rebuild over the same centroids and codebooks") {
    val b1 = mkVecs(0 until 300, 43)
    val b2 = mkVecs(300 until 450, 47)
    val queries = mkVecs(9000 until 9010, 53)
    val incr = tmp("graft_ivfpq_incr")
    val full = tmp("graft_ivfpq_full")
    Pq.ivfPqBuild(b1, "vec_id", "embedding", incr, nlist = 4, mSub = 4, ksub = 8, iters = 3)
    Pq.ivfPqAppend(spark, incr, b2, "vec_id", "embedding")
    Pq.ivfPqBuild(b1.unionAll(b2), "vec_id", "embedding", full, modelFrom = Some(incr))
    def search(p: String) = pairs(
      Pq.ivfPqSearch(spark, p, queries, "vec_id", "embedding", 5, nprobe = 2))
    assert(search(incr) == search(full),
      "pq append-then-search must equal rebuild-then-search on the frozen model")
    val before = spark.read.parquet(s"$incr/cells").count()
    Pq.ivfPqAppend(spark, incr, b2, "vec_id", "embedding")
    assert(spark.read.parquet(s"$incr/cells").count() == before, "retry appended rows")
    assert(search(incr) == search(full))
  }

  test("ivfPqAppend into a cell EMPTY at build time creates its partition") {
    // force the empty cell deterministically: centroids + codebooks train
    // on the FULL 3-direction corpus, but the live index's cells rebuild
    // (modelFrom) over direction-1 rows only — the other directions' cells
    // have no cid= partition dir on disk; an appended batch from a missing
    // direction must land in such a cell and be findable afterwards
    val all = mkVecs(0 until 300, 107)
    val b1 = all.where(col("vec_id") % 3 === 0) // one base direction only
    val b2 = mkVecs(500 until 560, 109).where(col("vec_id") % 3 === 1)
    val trained = tmp("graft_ivfpq_newcell_model")
    val idx = tmp("graft_ivfpq_newcell")
    Pq.ivfPqBuild(all, "vec_id", "embedding", trained, nlist = 4, mSub = 4, ksub = 8, iters = 3)
    Pq.ivfPqBuild(b1, "vec_id", "embedding", idx, modelFrom = Some(trained))
    val cellsBefore = spark.read.parquet(s"$idx/cells")
      .select("cid").distinct().collect().map(_.getInt(0)).toSet
    Pq.ivfPqAppend(spark, idx, b2, "vec_id", "embedding")
    val cellsAfter = spark.read.parquet(s"$idx/cells")
      .select("cid").distinct().collect().map(_.getInt(0)).toSet
    assert(cellsAfter.size > cellsBefore.size,
      s"append should populate a previously-empty cell: $cellsBefore -> $cellsAfter")
    val queries = mkVecs(9000 until 9003, 103)
    val hits = pairs(
      Pq.ivfPqSearch(spark, idx, queries, "vec_id", "embedding", 5, nprobe = 4))
    assert(hits.exists(_._2 >= 500L), "appended-direction vectors must be findable")
    // retry still a no-op across the new partition layout
    val count = spark.read.parquet(s"$idx/cells").count()
    Pq.ivfPqAppend(spark, idx, b2, "vec_id", "embedding")
    assert(spark.read.parquet(s"$idx/cells").count() == count)
  }

  test("ivfPqAppend drops degenerate vectors and appended codes match rebuild bytes") {
    val b1 = mkVecs(0 until 200, 59)
    val degenerate = Seq(
      (9901L, Seq(1.0, 2.0)),                    // wrong dimension
      (9902L, Seq.fill(8)(0.0))                  // zero norm
    ).toDF("vec_id", "embedding")
    val b2 = mkVecs(200 until 260, 61).unionAll(degenerate)
    val incr = tmp("graft_ivfpq_degen")
    Pq.ivfPqBuild(b1, "vec_id", "embedding", incr, nlist = 4, mSub = 4, ksub = 8, iters = 3)
    Pq.ivfPqAppend(spark, incr, b2, "vec_id", "embedding")
    val ids = spark.read.parquet(s"$incr/cells")
      .select("neighbor_id").as[Long].collect().toSet
    assert(!ids.contains(9901L) && !ids.contains(9902L),
      "degenerate vectors must not enter the index")
    assert(ids == ((0 until 260).map(_.toLong)).toSet)
    // byte-identical codes vs a rebuild over the frozen model: appends are
    // not just set-equal on ids, the compressed payloads agree too
    val full = tmp("graft_ivfpq_degen_full")
    Pq.ivfPqBuild(b1.unionAll(b2), "vec_id", "embedding", full, modelFrom = Some(incr))
    def codes(p: String) = spark.read.parquet(s"$p/cells")
      .select(col("neighbor_id"), hex(col("code")).as("h"), col("cid"))
      .as[(Long, String, Int)].collect().toSet
    assert(codes(incr) == codes(full), "appended (id, code, cid) must match rebuild")
  }

  test("compact handles the PQ cells layout, search unchanged") {
    val b1 = mkVecs(0 until 200, 67)
    val queries = mkVecs(9000 until 9006, 71)
    val idx = tmp("graft_ivfpq_compact")
    Pq.ivfPqBuild(b1, "vec_id", "embedding", idx, nlist = 4, mSub = 4, ksub = 8, iters = 3)
    (0 until 3).foreach { i =>
      Pq.ivfPqAppend(spark, idx,
        mkVecs((200 + 50 * i) until (250 + 50 * i), 73 + i), "vec_id", "embedding")
    }
    def fileCount(d: java.io.File): Int =
      if (d.isFile) (if (d.getName.endsWith(".parquet")) 1 else 0)
      else Option(d.listFiles()).map(_.map(fileCount).sum).getOrElse(0)
    val cellsDir = new java.io.File(s"$idx/cells")
    def search() = pairs(
      Pq.ivfPqSearch(spark, idx, queries, "vec_id", "embedding", 5, nprobe = 2))
    val before = search()
    val filesBefore = fileCount(cellsDir)
    Incremental.compact(spark, idx, targetFilesPerTable = 2)
    assert(fileCount(cellsDir) < filesBefore,
      s"compaction should shrink ${filesBefore} pq cell files")
    assert(cellsDir.listFiles().exists(_.getName.startsWith("cid=")),
      "pq cells must stay partitioned by cid after compaction")
    assert(search() == before, "compaction changed pq search results")
  }

  test("compact handles the cid-partitioned cells table, search unchanged") {
    val b1 = mkVecs(0 until 200, 31)
    val queries = mkVecs(9000 until 9006, 37)
    val idx = tmp("graft_ivf_compact")
    Similarity.ivfBuild(b1, "vec_id", "embedding", idx, nlist = 4, iters = 3)
    // several appends → many small files per cell
    (0 until 3).foreach { i =>
      Similarity.ivfAppend(spark, idx,
        mkVecs((200 + 50 * i) until (250 + 50 * i), 41 + i), "vec_id", "embedding")
    }
    def fileCount(d: java.io.File): Int =
      if (d.isFile) (if (d.getName.endsWith(".parquet")) 1 else 0)
      else Option(d.listFiles()).map(_.map(fileCount).sum).getOrElse(0)
    val cellsDir = new java.io.File(s"$idx/cells")
    val before = pairs(
      Similarity.ivfSearch(spark, idx, queries, "vec_id", "embedding", 5, nprobe = 2))
    val filesBefore = fileCount(cellsDir)
    Incremental.compact(spark, idx, targetFilesPerTable = 2)
    assert(fileCount(cellsDir) < filesBefore,
      s"compaction should shrink ${filesBefore} cell files")
    // cid partition dirs survive (pruned search still plans against them)
    assert(cellsDir.listFiles().exists(_.getName.startsWith("cid=")),
      "cells must stay partitioned by cid after compaction")
    val after = pairs(
      Similarity.ivfSearch(spark, idx, queries, "vec_id", "embedding", 5, nprobe = 2))
    assert(after == before, "compaction changed search results")
  }

  test("a crash that leaves the index aside is repaired on the next load") {
    val idx = s"${tmp("graft_repair")}/fp"
    val b1 = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    Incremental.exactIncremental(b1, col("doc_id"), idx, col("text"))
    // simulate the mid-swap crash: live table renamed aside, no tmp yet —
    // without repair the next load would silently see an EMPTY index
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(idx),
      new org.apache.hadoop.fs.Path(idx + "__compact_old")))
    val b2 = Seq((11L, "alpha"), (12L, "fresh")).toDF("doc_id", "text")
    val kept = Incremental.exactIncremental(b2, col("doc_id"), idx, col("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(12L), s"repaired index must still drop the dup, kept $kept")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idx + "__compact_old")))
  }

  test("a complete compacted copy rolls FORWARD from the crash window") {
    val dir = s"${tmp("graft_repair_fwd")}/fp"
    val b1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha")).toDF("doc_id", "text")
    Incremental.exactIncremental(b1, col("doc_id"), dir, col("text"))
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    // hand-build the exact crash state: compacted tmp + manifest written,
    // live dir renamed aside, second rename never happened
    spark.read.parquet(dir).repartition(1)
      .write.parquet(dir + "__compact_tmp")
    val nFiles = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir + "__compact_tmp"), true)
      var n = 0L
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    val out = fs.create(new org.apache.hadoop.fs.Path(dir + "__compact_manifest"), true)
    out.write(nFiles.toString.getBytes("UTF-8")); out.close()
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "__compact_old")))
    // next batch load repairs forward to the compacted copy and dedups
    val kept = Incremental.exactIncremental(
        Seq((21L, "beta"), (22L, "new")).toDF("doc_id", "text"),
        col("doc_id"), dir, col("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(22L), s"rolled-forward index must drop the dup, kept $kept")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "__compact_tmp")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "__compact_old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "__compact_manifest")))
  }
}
