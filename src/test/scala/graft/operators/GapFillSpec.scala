package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gap fill: grid synthesis between each key's first and last bucket,
 * fill-mode semantics, max bucket reducer, and partition invariance. */
class GapFillSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(epoch: Long) = new java.sql.Timestamp(epoch * 1000L)

  // key a: buckets 0, 30, 90 (gap at 60); key b: single bucket
  private def events = Seq(
    ("a", ts(5L), 1.0), ("a", ts(20L), 3.0), // same bucket 0 → max 3.0
    ("a", ts(35L), 2.0), ("a", ts(95L), 9.0),
    ("b", ts(65L), 5.0)
  ).toDF("k", "t", "v")

  private def run(mode: String) =
    GapFill.gapFill(events, col("k"), col("t"), col("v"), 30L, mode)
      .as[(String, Long, Option[Double], Boolean)].collect().toSet

  test("locf fills gaps forward; grid spans each key's own range") {
    assert(run("locf") == Set(
      ("a", 0L, Some(3.0), false), // max of the two bucket-0 events
      ("a", 30L, Some(2.0), false),
      ("a", 60L, Some(2.0), true), // carried forward
      ("a", 90L, Some(9.0), false),
      ("b", 60L, Some(5.0), false))) // no synthetic buckets beyond b's span
  }

  test("zero and null modes fill differently, same grid") {
    assert(run("zero").exists(r => r == (("a", 60L, Some(0.0), true))))
    assert(run("null").exists(r => r == (("a", 60L, None, true))))
    assert(run("null").size == 5)
  }

  test("partition invariance and null key/ts exclusion") {
    val noisy = events.unionAll(Seq((null.asInstanceOf[String], ts(1L), 1.0))
      .toDF("k", "t", "v")).repartition(13)
    assert(GapFill.gapFill(noisy, col("k"), col("t"), col("v"), 30L, "locf")
      .as[(String, Long, Option[Double], Boolean)].collect().toSet == run("locf"))
    intercept[IllegalArgumentException](
      GapFill.gapFill(events, col("k"), col("t"), col("v"), 0L))
  }
}
