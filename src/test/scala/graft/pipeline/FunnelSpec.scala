package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gates = Seq(
    "len"  -> (length(col("t")) >= 5),
    "vowel" -> col("t").rlike("[aeiou]"),
    "no_z" -> !col("t").contains("z"))

  test("stage outputs equal sequential filtering") {
    val df = Seq("alpha", "brrr", "zebra crossing", "xyz", "quiet one", "bz")
      .toDF("t")
    val f = Curation.retentionFunnel(df, gates).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val s1 = df.filter(gates(0)._2)
    val s2 = s1.filter(gates(1)._2)
    val s3 = s2.filter(gates(2)._2)
    assert(f(0) == ((1, "len", df.count(), df.count() - s1.count(), s1.count())))
    assert(f(1) == ((2, "vowel", s1.count(), s1.count() - s2.count(), s2.count())))
    assert(f(2) == ((3, "no_z", s2.count(), s2.count() - s3.count(), s3.count())))
  }

  test("row charged to FIRST failing gate only") {
    // "bz": fails len (first) AND vowel AND no_z — must count once, at len
    val df = Seq("bz").toDF("t")
    val f = Curation.retentionFunnel(df, gates).collect()
    assert(f(0).getAs[Long]("rows_dropped") == 1L)
    assert(f(1).getAs[Long]("rows_in") == 0L && f(1).getAs[Long]("rows_dropped") == 0L)
    assert(f(2).getAs[Long]("rows_dropped") == 0L)
  }

  test("null predicate drops the row (decidability is the gate's job)") {
    val df = Seq[(String, java.lang.Integer)](("ok row here", null), ("ok other", 3))
      .toDF("t", "score")
    val f = Curation.retentionFunnel(df, Seq("scored" -> (col("score") > 1)))
      .collect()
    assert(f(0).getAs[Long]("rows_dropped") == 1L)
    assert(f(0).getAs[Long]("rows_out") == 1L)
  }

  test("weight accounting: token mass in/dropped/out per stage") {
    val df = Seq("one two three four five", "a b", "keep me here too now yes")
      .toDF("t")
    val w = size(split(trim(col("t")), "\\s+"))
    val f = Curation.retentionFunnel(df, Seq("min5" -> (w >= 5)), w).collect()
    assert(f(0).getAs[Long]("weight_in") == 13L)
    assert(f(0).getAs[Long]("weight_dropped") == 2L)
    assert(f(0).getAs[Long]("weight_out") == 11L)
  }

  test("empty input: all-zero funnel, stages preserved") {
    val df = Seq.empty[String].toDF("t")
    val f = Curation.retentionFunnel(df, gates).collect()
    assert(f.length == 3)
    assert(f.forall(r => r.getAs[Long]("rows_in") == 0L
      && r.getAs[Long]("rows_dropped") == 0L && r.getAs[Long]("weight_out") == 0L))
  }

  test("validation: at least one gate") {
    intercept[IllegalArgumentException](
      Curation.retentionFunnel(Seq("x").toDF("t"), Seq.empty))
  }
}
