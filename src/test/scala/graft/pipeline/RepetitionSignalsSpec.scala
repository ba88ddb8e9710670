package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the Gopher repetition-signal family —
 * the driver oracle covers the SQL-expressible subset (line fracs +
 * top n-gram fracs) at corpus scale; this spec pins the coverage
 * metrics (dup {5..10}-gram char fractions) and the edge cases. */
class RepetitionSignalsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def signals(text: String): org.apache.spark.sql.Row =
    Seq(text).toDF("t")
      .select(Text.repetitionSignals(col("t")).as("r"))
      .select("r.*").collect().head

  test("duplicate line fraction by count and by char mass") {
    // lines: "a b a b", "x", "x", "c d e" -> 2 of 4 lines duplicated,
    // dup chars 2 of 14
    val r = signals("a b a b\nx\nx\nc d e")
    assert(r.getDouble(0) == 2.0 / 4) // dup_line_frac
    assert(r.getDouble(1) == 2.0 / 14) // dup_line_char_frac
    assert(r.getDouble(2) == 0.0) // one paragraph, no dup
  }

  test("duplicate paragraph fraction") {
    val r = signals("A\n\nB\n\nA")
    assert(r.getDouble(2) == 2.0 / 3) // dup_para_frac
    assert(r.getDouble(3) == 2.0 / 3) // dup_para_char_frac (all len 1)
  }

  test("top n-gram char fractions with count/length/lex tie-breaks") {
    // words: a b a b x x c d e (9 words, 9 chars)
    val r = signals("a b a b\nx\nx\nc d e")
    // "a b" occurs twice, 2 chars -> 2*2/9
    assert(r.getDouble(4) == 4.0 / 9)
    // all 3-grams unique -> lex-smallest "a b a", 3 chars -> 3/9
    assert(r.getDouble(5) == 3.0 / 9)
    // all 4-grams unique -> "a b a b", 4 chars -> 4/9
    assert(r.getDouble(6) == 4.0 / 9)
  }

  test("dup n-gram coverage marks positions once, overlapping grams merge") {
    // words: p q r s t u p q r s t u z — the 6-gram "p q r s t u" repeats,
    // covering positions 0..11 of 13 single-char words
    val r = signals("p q r s t u p q r s t u z")
    assert(r.getDouble(7) == 12.0 / 13) // dup_5gram (two overlapping dup 5-grams)
    assert(r.getDouble(8) == 12.0 / 13) // dup_6gram
    assert(r.getDouble(9) == 0.0) // no 7-gram repeats
    assert(r.getDouble(12) == 0.0) // no 10-gram repeats
  }

  test("empty and degenerate inputs score zero everywhere") {
    for (t <- Seq("", " ", "one")) {
      val r = signals(t)
      (0 until 13).foreach(i => assert(r.getDouble(i) == 0.0, s"field $i of '$t'"))
    }
  }

  test("null text yields null struct") {
    val r = Seq[Option[String]](None).toDF("t")
      .select(Text.repetitionSignals(col("t")).as("r")).collect().head
    assert(r.isNullAt(0))
  }

  test("cleanText normalizes controls, tab runs, ragged spacing, blank floods") {
    val out = Seq("  \u0007a\t\tb   \nc  \n\n\n\nd  ", "", "ok").toDF("t")
      .select(Text.cleanText(col("t"))).as[String].collect().toSeq
    assert(out == Seq("a b\nc\n\nd", "", "ok"))
    val lower = Seq("A\tB").toDF("t")
      .select(Text.cleanText(col("t"), lowercase = true)).as[String].collect().head
    assert(lower == "a b")
  }

  test("SQL-registered and codegen-compiled") {
    graft.functions.Registry.registerAll(spark)
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = spark.sql(
        "select repetition_signals('x\ny\nx\ny').dup_line_frac as f").collect().head
      assert(r.getDouble(0) == 1.0)
    } finally prev.foreach(spark.conf.set("spark.sql.codegen.fallback", _))
  }
}
