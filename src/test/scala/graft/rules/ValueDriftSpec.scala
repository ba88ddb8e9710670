package graft.rules

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Column-level snapshot drift: null-safe change counting, only matched
 * rows compared, column selection by shared names. */
class ValueDriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("null-safe change accounting over matched rows only") {
    val old = Seq(
      (1L, Some("a"), 10), (2L, Some("b"), 20), (3L, None: Option[String], 30),
      (4L, Some("gone"), 40)).toDF("id", "s", "n")
    val neu = Seq(
      (1L, Some("a"), 11),            // n changed
      (2L, None: Option[String], 20), // s value->null
      (3L, None: Option[String], 30), // null->null: no change
      (9L, Some("new"), 0)).toDF("id", "s", "n")
    val got = DatasetChecks.valueDrift(old, neu, Seq("id"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got("s") === ((3L, 1L, 333333L)))
    assert(got("n") === ((3L, 1L, 333333L)))
  }

  test("extra columns on either side are ignored; no shared columns rejects") {
    val old = Seq((1L, "a", true)).toDF("id", "s", "only_old")
    val neu = Seq((1L, "b", 9.9)).toDF("id", "s", "only_new")
    val got = DatasetChecks.valueDrift(old, neu, Seq("id")).collect()
    assert(got.map(_.getString(0)).toSeq === Seq("s"))
    intercept[IllegalArgumentException] {
      DatasetChecks.valueDrift(
        Seq((1L, true)).toDF("id", "x"), Seq((1L, 2.0)).toDF("id", "y"), Seq("id"))
    }
  }
}
