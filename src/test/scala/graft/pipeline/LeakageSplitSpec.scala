package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Leakage-safe split: near-dup clusters never straddle splits, singletons
 * assign exactly like splitByHash, all rows kept. */
class LeakageSplitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val phrases = Seq(
    "the quick brown fox jumps over the lazy dog and runs far away tonight",
    "spark pipelines shuffle data between executors across the cluster network",
    "language models train on deduplicated corpora for better generalization",
    "completely unrelated text about cooking pasta with garlic and olive oil")

  test("near-dup families land whole; singletons match splitByHash") {
    // 40 singletons + 10 planted families of 3 near-identical docs
    val singles = (0 until 40).map(i => (i.toLong, phrases(i % 4) + s" tail$i extra words here"))
    val fams = (0 until 10).flatMap { f =>
      val base = s"family $f shares this long common sentence body " + phrases(f % 4)
      Seq((1000L + f * 10, base), (1001L + f * 10, base + " x"), (1002L + f * 10, base + " y z"))
    }
    val df = (singles ++ fams).toDF("doc_id", "text").repartition(7)
    val got = Curation.leakageSafeSplit(df, col("doc_id"), col("text"))
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size === 70)
    // every family is split-homogeneous
    for (f <- 0 until 10) {
      val s = Set(got(1000L + f * 10), got(1001L + f * 10), got(1002L + f * 10))
      assert(s.size === 1, s"family $f straddles splits: $s")
    }
    // singletons: identical to the plain id-hash split
    val plain = Curation.splitByHash(df.where(col("doc_id") < 40L), col("doc_id"))
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    plain.foreach { case (id, s) => assert(got(id) === s, s"singleton $id") }
  }
}
