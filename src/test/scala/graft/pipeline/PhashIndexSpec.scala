package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The decoded-feature cache: pHash dedup over a PERSISTED signature
 * table must equal the direct decode path, appends must be O(batch) and
 * idempotent, search must find the planted near-dups without re-decoding
 * the corpus. */
class PhashIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media(lo: Int, hi: Int) =
    Multimodal.imageDupTable(
      spark.range(lo, hi).toDF("doc_id"), "doc_id")

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("index dedup equals the direct decode path") {
    val m = media(0, 40)
    val idx = java.nio.file.Files.createTempDirectory("graft_phidx").toString
    Phash.buildIndex(m, col("id"), col("data"), idx)
    val direct = pairSet(Phash.nearDups(m, col("id"), col("data")))
    val cached = pairSet(Phash.nearDupsFromIndex(spark, idx))
    assert(direct.nonEmpty, "fixture must plant near-dups")
    assert(cached == direct)
  }

  test("append == rebuild; retry is an id-scan no-op") {
    val idx = java.nio.file.Files.createTempDirectory("graft_phidx2").toString
    Phash.buildIndex(media(0, 20), col("id"), col("data"), idx)
    Phash.appendToIndex(spark, idx, media(20, 40), col("id"), col("data"))
    val appended = spark.read.parquet(idx).as[(Long, Long)].collect().toSet
    val full = java.nio.file.Files.createTempDirectory("graft_phidx3").toString
    Phash.buildIndex(media(0, 40), col("id"), col("data"), full)
    assert(appended == spark.read.parquet(full).as[(Long, Long)].collect().toSet)
    // retried batch: no duplicate rows, same signature set
    Phash.appendToIndex(spark, idx, media(20, 40), col("id"), col("data"))
    val retried = spark.read.parquet(idx).as[(Long, Long)].collect()
    assert(retried.length == retried.toSet.size && retried.toSet == appended)
  }

  test("searchIndex finds the planted variants; compact preserves results") {
    val idx = java.nio.file.Files.createTempDirectory("graft_phidx4").toString
    Phash.buildIndex(media(0, 40), col("id"), col("data"), idx)
    // query with the resized variants (id % 5 == 0 → id + 1000000 copies);
    // each must hit its original in the index
    val queries = media(0, 40).where(col("id") >= 1000000L && col("id") < 2000000L)
    val hits = Phash.searchIndex(spark, idx, queries, col("id"), col("data"))
      .where(col("id_q") === col("id_c") + 1000000L)
      .select("id_q").as[Long].collect().toSet
    val expected = (0 until 40).filter(_ % 5 == 0).map(_ + 1000000L).toSet
    assert(hits == expected, s"missing ${expected -- hits}")

    Incremental.compact(spark, idx, targetFilesPerTable = 2)
    assert(pairSet(Phash.nearDupsFromIndex(spark, idx)) ==
      pairSet(Phash.nearDupsFromIndex(spark, {
        val p = java.nio.file.Files.createTempDirectory("graft_phidx5").toString
        Phash.buildIndex(media(0, 40), col("id"), col("data"), p); p
      })))
  }

  test("undecodable rows are excluded; append prunes before decoding") {
    val junk = Seq((900L, Array[Byte](1, 2, 3))).toDF("id", "data")
    val idx = java.nio.file.Files.createTempDirectory("graft_phidx6").toString
    Phash.buildIndex(media(0, 5).unionAll(junk), col("id"), col("data"), idx)
    val ids = spark.read.parquet(idx).select("id").as[Long].collect().toSet
    assert(!ids.contains(900L) && ids.nonEmpty)
    // the append plan decodes ABOVE the anti-join: the hash projection must
    // not appear below the join in the optimized plan
    val indexed = spark.read.parquet(idx).select(col("id"))
    val appendPlan = media(0, 5).select(col("id"), col("data").as("graft_data"))
      .join(indexed, Seq("id"), "left_anti")
      .select(col("id"), Phash.imagePhash(col("graft_data")).as("sig"))
      .queryExecution.optimizedPlan
    val joinNode = appendPlan.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joinNode.isDefined)
    assert(!joinNode.get.toString.toLowerCase.contains("imagephash"),
      "decode was pushed below the anti-join")
    assert(appendPlan.toString.toLowerCase.contains("imagephash"))
  }
}
