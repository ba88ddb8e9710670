package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Confusable-skeleton normalization: homoglyph folding across scripts,
 * zero-width stripping, case routing through each script's own
 * lowercasing, and the dedup face seeing through spoofed copies. */
class ConfusablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sk(s: String): String =
    Seq(s).toDF("t").select(Text.confusableSkeleton(col("t"))).as[String].collect()(0)

  test("Cyrillic, Greek and fullwidth homoglyphs fold to the Latin skeleton") {
    assert(sk("раypаl") == "paypal") // Cyrillic р/а
    assert(sk("ＰａｙＰａｌ") == "paypal") // fullwidth, via its own lowercasing
    assert(sk("gοοgle") == "google") // Greek omicron
    // uppercase Cyrillic folds through its own lowercasing; only the
    // letters whose LOWERCASE is a Latin lookalike reach the skeleton
    // (в к м н т stay Cyrillic — conservative by design)
    assert(sk("АВЕКМНОРСТУХ") == "aвeкмнopcтyx")
    assert(sk("１２３") == "123")
  }

  test("zero-width characters vanish; honest text is just lowercased") {
    assert(sk("pay​pal‍﻿") == "paypal")
    assert(sk("soft­hyphen") == "softhyphen")
    assert(sk("Plain ASCII text.") == "plain ascii text.")
    // genuinely different Cyrillic words stay distinct (non-lookalikes keep script)
    assert(sk("блог") == "блoг") // only о maps; б л г are not Latin lookalikes
  }

  test("SQL face: confusable_skeleton callable from spark.sql") {
    graft.functions.Registry.registerAll(spark)
    assert(spark.sql("SELECT confusable_skeleton('раypаl')").as[String].collect()(0)
      == "paypal")
  }

  test("spoofed copies collapse with originals under skeleton dedup") {
    val docs = Seq((1L, "free money at example"), (2L, "normal document here"))
      .toDF("doc_id", "text")
    val spoof = docs.where(col("doc_id") === 1).select(
      (col("doc_id") + 100).as("doc_id"),
      translate(col("text"), "aeo", "аео").as("text"))
    val survivors = docs.unionAll(spoof)
      .select(col("doc_id"), Text.confusableSkeleton(col("text")).as("s"))
      .groupBy("s").agg(min("doc_id").as("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 2L)) // 101 collapsed onto 1
  }
}
