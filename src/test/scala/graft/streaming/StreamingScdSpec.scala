package graft.streaming

import graft.TestSpark
import graft.operators.Scd
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming SCD2: stream-maintained dimension == batch rebuild over the
 * concatenated log; replayed batches leave the dimension bit-identical. */
class StreamingScdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dimSet(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "tier", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4))).toSet

  test("maintained dimension equals the batch rebuild; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft_sscd").toString + "/dim"
    val ck = java.nio.file.Files.createTempDirectory("graft_sscd_ck").toString
    val b1 = Seq((1L, "bronze", 10L), (2L, "bronze", 5L), (3L, "x", 1L))
    val b2 = Seq((1L, "silver", 30L), (2L, "bronze", 9L)) // re-observation collapses
    val b3 = Seq((1L, "gold", 40L), (4L, "new", 50L))

    val mem = MemoryStream[(Long, String, Long)]
    val q = StreamingScd.dimensionMaintainer(
      mem.toDF().toDF("id", "tier", "ts"), path, ck, Seq("id"), "ts")
    try {
      Seq(b1, b2, b3).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val afterAll = dimSet(spark.read.parquet(path))
      // replay batch 2: algebraically a no-op
      mem.addData(b2: _*); q.processAllAvailable()
      assert(dimSet(spark.read.parquet(path)) === afterAll)
      val rebuilt = dimSet(Scd.fromChangeLog(
        (b1 ++ b2 ++ b3).toDF("id", "tier", "ts"), Seq("id"), "ts"))
      assert(afterAll === rebuilt)
      assert(afterAll.exists(v => v._1 == 1L && v._2 == "gold" && v._5))
    } finally q.stop()
  }
}
