package graft.sources

import graft.TestSpark
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

class CsvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", LongType)))

  private def fixture(delim: String = ","): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv")
    java.nio.file.Files.writeString(dir.resolve("part-0.csv"), Seq(
      Seq("1", "alpha", "10").mkString(delim),
      Seq("2", "beta", "20").mkString(delim),
      Seq("3", "gamma", "not-a-number").mkString(delim), // type failure
      Seq("4", "delta").mkString(delim),                 // wrong arity
      "garbage line with no structure at all",
      Seq("5", "epsilon", "50").mkString(delim)).mkString("\n") + "\n")
    dir.toString
  }

  test("well-formed rows parse; malformed lines quarantine verbatim") {
    val (rows, bad) = Csv.read(spark, fixture(), schema)
    val ok = rows.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(ok == Set((1L, "alpha", 10L), (2L, "beta", 20L), (5L, "epsilon", 50L)))
    val quarantined = bad.collect().map(_.getString(0)).toSet
    assert(quarantined.exists(_.contains("not-a-number")))
    assert(quarantined.exists(_.startsWith("4,delta")))
    assert(quarantined.exists(_.startsWith("garbage line")))
  }

  test("tab delimiter (the index-dump norm) works identically") {
    val (rows, bad) = Csv.read(spark, fixture("\t"), schema, delimiter = "\t")
    assert(rows.count() == 3 && bad.count() == 3)
  }

  test("readStats counts every line exactly once") {
    val s = Csv.readStats(spark, fixture(), schema).collect().head
    assert((s.getLong(0), s.getLong(1), s.getLong(2)) == ((6L, 3L, 3L)))
  }

  test("schema colliding with the corrupt column is rejected loudly") {
    intercept[IllegalArgumentException](Csv.read(spark, fixture(),
      StructType(Seq(StructField(Csv.CorruptCol, StringType)))))
  }
}
