package graft.rules

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Constraint suggestion: exact suggestion sets on a known profile, the
 * suggested predicates actually hold on the profiled data, quoting, the
 * in_set cardinality cutoff, column selection, and the empty corpus. */
class SuggestionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows: Seq[(Long, Option[Long], String, Option[String])] =
    Seq((1L, Some(5L), "alpha", Some("x")), (2L, Some(-3L), "beta", None),
      (3L, Some(9L), "alpha", Some("y'z")), (4L, None, "gamma", Some("x")))
  private lazy val df = rows.toDF("id", "score", "tag", "note")

  private def suggest(cols: String*) =
    Suggestions.suggestRules(df, cols).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        Option(r.getString(3)))).toSet

  test("full suggestion set on a known profile") {
    val got = suggest()
    assert(got === Set(
      ("id", "not_null", "id IS NOT NULL", Some("null_ppm=0")),
      ("id", "unique", "id IS UNIQUE", None),
      ("id", "non_negative", "id >= 0", None),
      ("id", "range", "id BETWEEN 1 AND 4", None),
      // score: one null of four -> 250000 ppm, capped up to 250000; min -3
      // kills non_negative but range still pins the observed interval
      ("score", "completeness", "null_ppm(score) <= 250000", Some("observed_null_ppm=250000")),
      ("score", "unique", "score IS UNIQUE", None),
      ("score", "range", "score BETWEEN -3 AND 9", None),
      ("tag", "not_null", "tag IS NOT NULL", Some("null_ppm=0")),
      ("tag", "in_set", "tag IN ('alpha','beta','gamma')", Some("n_distinct=3")),
      ("tag", "max_length", "length(tag) <= 5", None),
      // note: embedded quote doubled, null present, distinct < non-null
      ("note", "completeness", "null_ppm(note) <= 250000", Some("observed_null_ppm=250000")),
      ("note", "in_set", "note IN ('x','y''z')", Some("n_distinct=2")),
      ("note", "max_length", "length(note) <= 3", None)))
  }

  test("row-expressible suggested rules all hold on the profiled data") {
    val rowRules = suggest().collect {
      case (_, k, rule, _) if k != "completeness" && k != "unique" => rule
    }
    assert(rowRules.nonEmpty)
    rowRules.foreach { rule =>
      // a suggested predicate may only fail on NULL input (SQL three-valued
      // logic), never be false on a non-null value it was derived from
      val bad = df.where(expr(rule) === false).count()
      assert(bad === 0L, rule)
    }
  }

  test("in_set respects the cardinality cutoff") {
    val wide = (0 until 50).map(i => (i.toLong, s"v$i")).toDF("id", "tag")
    val got = Suggestions.suggestRules(wide).collect().map(_.getString(1))
    assert(!got.contains("in_set"))
    val narrow = Suggestions.suggestRules(wide, Seq("tag"), inSetMaxDistinct = 50)
      .collect().map(r => (r.getString(1), r.getString(2))).toMap
    assert(narrow("in_set").startsWith("tag IN ('v0','v1',"))
  }

  test("cols selection profiles only the requested columns") {
    val got = suggest("tag")
    assert(got.map(_._1) === Set("tag"))
  }

  test("empty corpus suggests nothing") {
    assert(Suggestions.suggestRules(df.where(lit(false))).count() === 0L)
  }

  test("partition invariance") {
    val a = Suggestions.suggestRules(df.repartition(7)).collect().toSet
    val b = Suggestions.suggestRules(df).collect().toSet
    assert(a === b)
  }
}
