package graft.lookups

import graft.TestSpark
import graft.rules.{Id, RuleSuite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LookupsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def c(sql: String) = graft.rules.RuleRunner.parseRule(sql, RuleSuite(Id(0, 0), Nil))

  test("map_lookup / map_contains over a broadcast map") {
    Lookups.registerMapLookups(spark, Map(
      "ccy" -> (() => {
        val df = Seq(("CH", "CHF"), ("GB", "GBP"), ("US", "USD")).toDF("country", "ccy")
        (df, col("country"), col("ccy"))
      })))
    val out = Seq("CH", "US", "XX").toDF("ctry")
      .select(c("map_lookup(ctry, 'ccy')").as("ccy"), c("map_contains(ctry, 'ccy')").as("has"))
      .collect()
    assert(out.map(r => (r.getString(0), r.getBoolean(1))).toSeq ==
      Seq(("CHF", true), ("USD", true), (null, false)))
  }

  test("broadcast probes stay inside whole-stage codegen") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    Lookups.registerMapLookups(spark, Map(
      "ccy_cg" -> (() => {
        val df = Seq(("CH", "CHF"), ("US", "USD")).toDF("country", "ccy")
        (df, col("country"), col("ccy"))
      })))
    Lookups.registerBloomFrom(spark, "ids_cg", spark.range(100).toDF("id"),
      col("id"), 1000, 0.01)
    // non-local source so the projection can't constant-fold away
    val df = spark.range(3)
      .select(when(col("id") === 0, "CH").when(col("id") === 1, "US").otherwise("XX").as("ctry"),
        col("id"))
      .select(
        c("map_lookup(ctry, 'ccy_cg')").as("ccy"),
        c("map_contains(ctry, 'ccy_cg')").as("has"),
        c("probability_in(id, 'ids_cg')").as("p"))
    val plan = df.queryExecution.executedPlan
    assert(plan.collectFirst { case w: WholeStageCodegenExec => w }.nonEmpty,
      s"lookup probes fell out of codegen:\n$plan")
    val rows = df.collect().map(r => (r.getString(0), r.getBoolean(1), r.getDouble(2))).toSeq
    assert(rows == Seq(("CHF", true, 0.99), ("USD", true, 0.99), (null, false, 0.99)))
  }

  test("map_lookup with struct values") {
    Lookups.registerMapLookups(spark, Map(
      "cc2" -> (() => {
        val df = Seq(("CH", 1, "CHF")).toDF("country", "chk", "ccy")
        (df, col("country"), struct(col("chk"), col("ccy")))
      })))
    val out = Seq("CH").toDF("ctry").select(c("map_lookup(ctry, 'cc2')").as("s")).select("s.*")
    assert(out.collect()(0).toSeq == Seq(1, "CHF"))
  }

  test("small_bloom build + probability_in") {
    val ids = spark.range(0, 1000).toDF("id")
    Lookups.registerBloomFrom(spark, "ids", ids, col("id"), 1000, 0.01)
    val out = Seq(5L, 999L, 123456L, 998877L).toDF("x")
      .select(c("probability_in(x, 'ids')").as("p")).as[Double].collect()
    assert(out(0) == 0.99 && out(1) == 0.99) // hit → confidence 1 - fpp
    // absent keys: overwhelmingly 0.0 (allow the fpp edge)
    assert(out.drop(2).count(_ == 0.0) >= 1)
  }

  test("small_bloom merges across partitions; no false negatives") {
    val ids = spark.range(0, 5000).toDF("id").repartition(8)
    Lookups.registerBloomFrom(spark, "ids2", ids, col("id"), 5000, 0.01)
    val hits = spark.range(0, 5000).toDF("x")
      .select(c("probability_in(x, 'ids2')").as("p")).where("p = 0.0").count()
    assert(hits == 0) // bloom guarantees no false negatives
  }

  test("bloom persistence: save, reload and probe without rebuilding") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    val ids = spark.range(0, 3000).toDF("id")
    graft.bloom.BloomModel.buildSaveAndRegister(
      spark, "persisted_ids", s"$dir/bloom", ids, col("id"), 3000, 0.01)
    // wipe the registry: reload must come purely from the files
    Lookups.clear()
    graft.bloom.BloomModel.loadAndRegister(spark, "persisted_ids", s"$dir/bloom")
    val misses = spark.range(0, 3000).toDF("x")
      .select(c("probability_in(x, 'persisted_ids')").as("p")).where("p = 0.0").count()
    assert(misses == 0) // no false negatives through the save/load round-trip
    val absent = Seq(987654321L, 123456789L).toDF("x")
      .select(c("probability_in(x, 'persisted_ids')").as("p")).as[Double].collect()
    assert(absent.count(_ == 0.0) >= 1)
  }

  test("big_bloom via SQL aggregate returns buckets") {
    val out = spark.range(0, 100).toDF("id")
      .select(c("big_bloom(id, 100, 0.01)").as("b"))
      .collect()(0).getSeq[Array[Byte]](0)
    assert(out.nonEmpty)
  }

  test("loadMapConfigs + loadMaps from a config table") {
    Seq((10, "ten"), (20, "twenty")).toDF("k", "v").createOrReplaceTempView("graft_kv")
    val cfg = Seq(("numbers", null: String, null: String, "SELECT * FROM graft_kv", "k", "upper(v)"))
      .toDF("name", "token", "filter", "sql", "key", "value")
    val (configs, bad) = Lookups.loadMapConfigs(cfg,
      col("name"), col("token"), col("filter"), col("sql"), col("key"), col("value"))
    assert(bad.isEmpty)
    Lookups.loadMaps(spark, configs)
    val out = Seq(10, 99).toDF("x").select(c("map_lookup(x, 'numbers')").as("v"))
      .as[String].collect()
    assert(out.toSeq == Seq("TEN", null))
  }

  test("map_lookup with STRUCT keys (unsafe-row canonicalization)") {
    Lookups.registerMapLookups(spark, Map(
      "pairkey" -> (() => {
        val df = Seq((1, "a", "one-a"), (2, "b", "two-b")).toDF("n", "s", "v")
        (df, struct(col("n"), col("s")), col("v"))
      })))
    val out = Seq((1, "a"), (2, "x")).toDF("n", "s")
      .select(c("map_lookup(struct(n, s), 'pairkey')").as("v"))
      .as[String].collect()
    assert(out.toSeq == Seq("one-a", null))
  }
}
