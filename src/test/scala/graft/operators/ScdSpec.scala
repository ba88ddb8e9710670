package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SCD2: interval chaining, no-change collapse, duplicate-instant
 * dedup, incremental merge == full rebuild, partition invariance. */
class ScdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4))).toSet

  test("versions chain, re-observations collapse, dup instants dedup") {
    val log = Seq(
      (1L, 10L, "bronze"), (1L, 20L, "bronze"),   // re-observation collapses
      (1L, 30L, "silver"), (1L, 40L, "gold"),
      (2L, 5L, "bronze"),
      (3L, 7L, "a"), (3L, 7L, "b")                // same instant: last by attr
    ).toDF("id", "ts", "tier").select("id", "tier", "ts")
    val got = collect(Scd.fromChangeLog(log.repartition(4), Seq("id"), "ts")
      .select("id", "tier", "valid_from", "valid_to", "is_current"))
    assert(got === Set(
      (1L, "bronze", 10L, Some(30L), false),
      (1L, "silver", 30L, Some(40L), false),
      (1L, "gold", 40L, None, true),
      (2L, "bronze", 5L, None, true),
      (3L, "b", 7L, None, true)))
  }

  test("merge equals full rebuild; untouched keys carry verbatim") {
    val first = Seq((1L, "bronze", 10L), (1L, "silver", 30L),
      (2L, "bronze", 5L), (4L, "x", 1L)).toDF("id", "tier", "ts")
    val second = Seq((1L, "gold", 40L), (3L, "new", 8L),
      (1L, "silver", 20L) // late duplicate observation inside v1's run
    ).toDF("id", "tier", "ts")
    val dim1 = Scd.fromChangeLog(first, Seq("id"), "ts")
    val merged = collect(Scd.merge(dim1, second, Seq("id"), "ts")
      .select("id", "tier", "valid_from", "valid_to", "is_current"))
    val rebuilt = collect(
      Scd.fromChangeLog(first.unionByName(second), Seq("id"), "ts")
        .select("id", "tier", "valid_from", "valid_to", "is_current"))
    assert(merged === rebuilt)
    assert(merged.exists(v => v._1 == 4L && v._5)) // untouched key intact
  }

  test("asof enrichment against the dimension answers point-in-time") {
    val log = Seq((1L, "bronze", 10L), (1L, "gold", 30L)).toDF("id", "tier", "ts")
    val dim = Scd.fromChangeLog(log, Seq("id"), "ts")
      .select(col("id"), col("tier"), col("valid_from"))
    val facts = Seq((1L, 15L, "f1"), (1L, 35L, "f2")).toDF("id", "fts", "fact")
    val out = AsOf.asofJoin(facts, dim, Seq("id"), "fts", "valid_from")
      .select("fact", "tier").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out === Map("f1" -> "bronze", "f2" -> "gold"))
  }
}
