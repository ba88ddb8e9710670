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
