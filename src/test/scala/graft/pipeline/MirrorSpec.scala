package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Host-level mirror detection: exact ppm arithmetic, full-vs-partial
 * mirror separation, within-host duplicate collapse, threshold and cap
 * semantics. */
class MirrorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("host_a", "host_b", "jaccard_ppm")
      .as[(String, String, Long)].collect().toSet

  test("full mirrors land at exactly 1e6 ppm; one-third partials stay below 0.8") {
    val base = (0 until 30).map(i => ("orig", s"document number $i body"))
    val full = (0 until 30).map(i => ("clone", s"document number $i body"))
    val third = (0 until 30 by 3).map(i => ("partial", s"document number $i body"))
    val df = (base ++ full ++ third).toDF("host", "text")
    val out = pairs(Dedup.hostMirrors(df, col("host"), col("text"), threshold = 0.8))
    assert(out == Set(("clone", "orig", 1000000L)))
    // at a 0.2 gate the partial shows up with exact 10/30 ppm (64 1-row
    // bands: the S-curve catches a 0.33 pair all but surely there, where
    // the default 16×4 would usually skip it — the advisor's trade)
    val low = pairs(Dedup.hostMirrors(df, col("host"), col("text"),
      numHashes = 64, bands = 64, threshold = 0.2))
    assert(low == Set(("clone", "orig", 1000000L),
      ("clone", "partial", 333333L), ("orig", "partial", 333333L)))
  }

  test("overlap arithmetic is exact set Jaccard over distinct texts") {
    val df = Seq(
      ("a", "t1"), ("a", "t2"), ("a", "t3"), ("a", "t3"), // dup collapses
      ("b", "t2"), ("b", "t3"), ("b", "t4")
    ).toDF("host", "text")
    val out = pairs(Dedup.hostMirrors(df, col("host"), col("text"),
      numHashes = 64, bands = 64, threshold = 0.5))
    assert(out == Set(("a", "b", 500000L))) // |∩|=2, |∪|=4
    assert(pairs(Dedup.hostMirrors(df, col("host"), col("text"),
      numHashes = 64, bands = 64, threshold = 0.51)).isEmpty)
  }

  test("null hosts sit out; bucket cap drops oversized buckets") {
    val df = Seq(("a", "x"), ("b", "x"), (null, "x")).toDF("host", "text")
    val out = pairs(Dedup.hostMirrors(df, col("host"), col("text"), threshold = 0.5))
    assert(out == Set(("a", "b", 1000000L)))
    // identical signatures put a and b in the same bucket in every band;
    // cap 1 drops all of them → no candidates survive
    assert(pairs(Dedup.hostMirrors(df, col("host"), col("text"),
      threshold = 0.5, maxBucketSize = 1)).isEmpty)
  }

  test("disjoint hosts never pair, even with many docs") {
    val df = (0 until 200).map(i => (s"h${i % 4}", s"text $i")).toDF("host", "text")
    assert(pairs(Dedup.hostMirrors(df, col("host"), col("text"), threshold = 0.1)).isEmpty)
  }
}
