package graft.sources

import graft.TestSpark
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** JSONL ingest: well-formed lines bind to the schema, malformed lines land
 * in the quarantine frame verbatim — nothing is silently dropped. */
class JsonlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def fixture(): String = {
    val dir = Files.createTempDirectory("graft_jsonl")
    Files.writeString(dir.resolve("part0.jsonl"),
      """{"doc_id": 1, "text": "alpha body"}
        |{"doc_id": 2, "text": "beta body"}
        |{"doc_id": 3, "text": "gamma tru
        |not json at all
        |{"doc_id": 4, "text": "delta body"}
        |""".stripMargin)
    dir.toString
  }

  test("well-formed rows parse, corrupt lines quarantine verbatim") {
    val (rows, corrupt) = Jsonl.read(spark, fixture(), schema)
    assert(rows.orderBy("doc_id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "alpha body"), (2L, "beta body"), (4L, "delta body")))
    val bad = corrupt.as[String].collect().toSet
    assert(bad.size == 2)
    assert(bad.exists(_.contains("gamma tru")))
    assert(bad.contains("not json at all"))
  }

  test("readStats counts every line exactly once") {
    val stats = Jsonl.readStats(spark, fixture(), schema).collect().head
    assert((stats.getLong(0), stats.getLong(1), stats.getLong(2)) == ((5L, 3L, 2L)))
  }

  test("schema colliding with the corrupt column is rejected loudly") {
    val badSchema = StructType(Seq(StructField(Jsonl.CorruptCol, StringType)))
    intercept[IllegalArgumentException](Jsonl.read(spark, fixture(), badSchema))
  }
}
