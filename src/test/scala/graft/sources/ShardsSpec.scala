package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths, StandardCopyOption}

/** File-level shard quarantine: corrupt and schema-drifted files land in
 * the manifest with reasons, healthy files all read, extra columns prune,
 * the probe runs distributed, and ORC gets the same treatment. */
class ShardsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType.fromDDL("id BIGINT, body STRING")

  /** A table dir with two healthy shards (ids 0-99), one truncated shard,
   * one garbage shard, one schema-drifted shard (id re-typed STRING), and
   * one healthy shard carrying an extra column (ids 100-109). */
  private def fixture(format: String): (String, Set[Long]) = {
    val dir = Files.createTempDirectory(s"graft_shards_$format").toString
    def write(df: org.apache.spark.sql.DataFrame, path: String): Unit =
      df.coalesce(1).write.mode("overwrite").format(format).save(path)
    val stage = Files.createTempDirectory("graft_shards_stage").toString
    write(spark.range(0, 50).select(col("id"), concat(lit("b"), col("id")).as("body")),
      s"$stage/a")
    write(spark.range(50, 100).select(col("id"), concat(lit("b"), col("id")).as("body")),
      s"$stage/b")
    write(spark.range(100, 110).select(col("id"),
      concat(lit("b"), col("id")).as("body"), lit(7).as("extra")), s"$stage/c")
    write(spark.range(200, 210).select(col("id").cast("string").as("id"),
      lit("drifted").as("body")), s"$stage/d")
    def stagedFile(sub: String): java.nio.file.Path = {
      val found = Files.list(Paths.get(stage, sub)).toArray.map(_.toString)
        .find(p => p.endsWith(s".$format") || (format == "orc" && p.endsWith(".orc")))
      Paths.get(found.get)
    }
    Files.copy(stagedFile("a"), Paths.get(dir, s"good_a.$format"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.copy(stagedFile("b"), Paths.get(dir, s"good_b.$format"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.copy(stagedFile("c"), Paths.get(dir, s"good_extra.$format"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.copy(stagedFile("d"), Paths.get(dir, s"drifted.$format"),
      StandardCopyOption.REPLACE_EXISTING)
    val goodBytes = Files.readAllBytes(Paths.get(dir, s"good_a.$format"))
    Files.write(Paths.get(dir, s"truncated.$format"),
      goodBytes.take(goodBytes.length / 2))
    Files.write(Paths.get(dir, s"garbage.$format"),
      s"this is not a $format file".getBytes("UTF-8"))
    // hidden/meta names must be ignored, like the stock reader does
    Files.write(Paths.get(dir, "_SUCCESS"), Array.emptyByteArray)
    (dir, (0L until 110L).toSet)
  }

  test("parquet: corrupt + drifted shards quarantine with reasons; healthy rows all read") {
    val (dir, expectIds) = fixture("parquet")
    val (rows, manifest) = Shards.read(spark, dir, schema)
    assert(rows.schema.toDDL == schema.toDDL) // extra column pruned
    assert(rows.select("id").as[Long].collect().toSet == expectIds)
    val m = manifest.as[(String, String)].collect().toMap
    assert(m.size == 3, s"manifest: $m")
    assert(m.keys.count(_.contains("truncated")) == 1)
    assert(m.keys.count(_.contains("garbage")) == 1)
    val driftReason = m.find(_._1.contains("drifted")).get._2
    assert(driftReason.startsWith("schema_drift:") && driftReason.contains("expected"))
  }

  test("parquet: probe reports per-file rows/bytes and runs distributed (not a driver loop)") {
    val (dir, _) = fixture("parquet")
    val probed = Shards.probe(spark, dir)
    // the probe itself is a Spark job over the file list
    assert(probed.rdd.getNumPartitions > 1)
    val byName = probed.collect().map(r =>
      Paths.get(r.getString(0)).getFileName.toString ->
        (r.getBoolean(2), r.getLong(3))).toMap
    assert(byName("good_a.parquet") == (true, 50L))
    assert(byName("good_b.parquet") == (true, 50L))
    assert(byName("good_extra.parquet") == (true, 10L))
    assert(byName("drifted.parquet")._1) // readable, just drifted
    assert(!byName("truncated.parquet")._1 && !byName("garbage.parquet")._1)
    assert(!byName.contains("_SUCCESS"))
  }

  test("parquet: auditStats one-line telemetry") {
    val (dir, _) = fixture("parquet")
    val s = Shards.auditStats(spark, dir, schema)
      .as[(Long, Long, Long, Long)].head()
    assert(s == ((3L, 2L, 1L, 110L)), s"got $s")
  }

  test("orc: same quarantine contract through the ORC probe") {
    val (dir, expectIds) = fixture("orc")
    val (rows, manifest) = Shards.read(spark, dir, schema, format = "orc")
    assert(rows.select("id").as[Long].collect().toSet == expectIds)
    val m = manifest.as[(String, String)].collect().toMap
    assert(m.size == 3, s"manifest: $m")
    assert(m.find(_._1.contains("drifted")).get._2.startsWith("schema_drift:"))
  }

  test("empty good set still returns an empty typed frame, every file in the manifest") {
    val dir = Files.createTempDirectory("graft_shards_empty").toString
    Files.write(Paths.get(dir, "junk.parquet"), "junk".getBytes("UTF-8"))
    val (rows, manifest) = Shards.read(spark, dir, schema)
    assert(rows.schema.toDDL == schema.toDDL && rows.count() == 0)
    assert(manifest.count() == 1)
  }
}
