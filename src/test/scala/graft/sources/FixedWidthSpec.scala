package graft.sources

import graft.TestSpark
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-width ingest: positional typed parse, blank→NULL, trim, and the
 * quarantine contract (short lines, failed casts — verbatim capture). */
class FixedWidthSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fields = Seq(
    FixedWidth.Field("id", 1, 5, LongType),
    FixedWidth.Field("name", 6, 8),
    FixedWidth.Field("amt", 14, 7, LongType))

  // right-aligned numerics, left-aligned text — the classic layout
  private def row(id: String, name: String, amt: String): String =
    String.format("%5s%-8s%7s", id, name, amt)

  private def stage(lines: String*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_fw").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "data.txt"), lines.mkString("\n") + "\n")
    dir
  }

  test("positional parse with trims; blank typed field is NULL, not corrupt") {
    val dir = stage(
      row("123", "alice", "999"),
      row("456", "bob", ""), // amt all blank → NULL
      row("789", "carol", "-  7")) // inner spaces fail the cast → quarantine
    val (rows, bad) = FixedWidth.read(spark, dir, fields)
    assert(rows.as[(Long, String, Option[Long])].collect().toSet ==
      Set((123L, "alice", Some(999L)), (456L, "bob", None)))
    assert(bad.as[String].collect().toSeq == Seq(row("789", "carol", "-  7")))
  }

  test("short lines quarantine verbatim; stats add up") {
    val dir = stage(row("123", "alice", "999"), "oops")
    val (rows, bad) = FixedWidth.read(spark, dir, fields)
    assert(rows.count() == 1 && bad.as[String].head() == "oops")
    val st = FixedWidth.readStats(spark, dir, fields)
      .as[(Long, Long, Long)].head()
    assert(st == ((2L, 1L, 1L)))
  }

  test("overlong lines are fine (trailing junk ignored); geometry validated") {
    val dir = stage(row("123", "alice", "999") + " trailing junk")
    val (rows, bad) = FixedWidth.read(spark, dir, fields)
    assert(rows.count() == 1 && bad.count() == 0)
    intercept[IllegalArgumentException] { FixedWidth.Field("x", 0, 3) }
    intercept[IllegalArgumentException] {
      FixedWidth.read(spark, dir, Seq.empty)
    }
  }
}
