package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed batch pipeline as CONFIG (BatchConfig): the YAML twin of
 * BatchPipeline's hand-coded chain must round-trip, validate before
 * touching data, and replay the chain to a bit-identical funnel. */
class BatchConfigSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  private val src = "/root/testdata/sf0.001"

  /** The YAML equivalent of BatchPipeline.runChain over the same staged
   * front door — the shared twin (also driven per round by the
   * q_pipeline_yaml correctness gate). */
  private def batchSpec(warcDir: String, jsonlDir: String): BatchConfig.BatchSpec =
    graft.BatchPipeline.configTwin(src, warcDir, jsonlDir)

  test("yaml round-trip: fromYaml(toYaml) reproduces the spec exactly") {
    val s = batchSpec("/tmp/w", "/tmp/j")
    val back = BatchConfig.fromYaml(s.toYaml)
    assert(back == s, s"\n--- yaml ---\n${s.toYaml}")
  }

  test("validate dry-resolves the whole chain and localizes errors") {
    val good = batchSpec("/tmp/does_not_exist_w", "/tmp/does_not_exist_j")
    assert(good.validate(spark).isEmpty,
      s"good config must validate clean: ${good.validate(spark)}")
    val bad = good.copy(
      prepare = good.prepare :+ ("broken" -> "no_such_function(text)"),
      gates = good.gates :+ ("ghost" -> "no_such_column > 1"))
    val errs = bad.validate(spark)
    assert(errs.exists(_._1 == "prepare broken"), errs.toString)
    assert(errs.exists(_._1 == "gate ghost"), errs.toString)
    // validation never touched the (nonexistent) source paths
  }

  test("config run replays the hand-coded chain to a bit-identical funnel") {
    val (warcDir, jsonlDir) = graft.BatchPipeline.stagedOnce(spark, src)
    val qDir = java.nio.file.Files.createTempDirectory("graft_bcfg_q").toString
    val s0 = batchSpec(warcDir, jsonlDir)
    val yaml = s0.copy(sources = s0.sources.map {
      case s if s.format == "jsonl" => s.copy(quarantineDir = Some(s"$qDir/jsonl"))
      case s => s
    }).toYaml
    val parsed = BatchConfig.fromYaml(yaml) // run what a reviewer reads
    val work = java.nio.file.Files.createTempDirectory("graft_bcfg").toString
    val res = parsed.run(spark, work)
    assert(res.quarantined == 4L)
    // the configured quarantine dir holds the 3 corrupt JSONL lines verbatim
    assert(spark.read.parquet(s"$qDir/jsonl").count() == 3L)

    val work2 = java.nio.file.Files.createTempDirectory("graft_bcfg_ref").toString
    val chain = graft.BatchPipeline.runChain(spark, src, work2,
      staged = Some((warcDir, jsonlDir)))
    val expected = Curation
      .retentionFunnel(chain.flagged, chain.gateCols, weight = col("tok"))
      .collect().sortBy(_.getInt(0))
    val got = res.funnel.collect().sortBy(_.getInt(0))
    chain.base.unpersist(blocking = false)
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g == e, s"funnel diverged:\n config: $g\n coded:  $e")
    }
    assert(res.ingested == chain.ingested)
    // the optional legs ran: shard manifest re-read from disk, docs > 0
    val manifest = res.shardManifest.get
    assert(manifest.agg(sum(col("docs"))).head().getLong(0) > 0L)
    // funnel artifact landed
    assert(spark.read.parquet(s"$work/funnel.parquet").count() == 8L)
  }
}
