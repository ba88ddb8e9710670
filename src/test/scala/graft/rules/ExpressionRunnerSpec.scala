package graft.rules

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExpressionRunnerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val suite: RuleSuite = RuleSuite(Id(5, 1), Seq(RuleSet(Id(6, 1), Seq(
    Rule(Id(60, 1), "x + 1"),
    Rule(Id(61, 1), "concat('v:', cast(x as string))")))))

  test("expressionRunner stores string results with DDL") {
    val out = ExpressionRunner.addExpressionResults(Seq(41).toDF("x"), suite, "er")
    val r60 = out.select(
      element_at(element_at(col("er.ruleSetResults"), Id.pack(Id(6, 1))), Id.pack(Id(60, 1)))).collect()(0).getStruct(0)
    assert(r60.getString(0) == "42")
    assert(r60.getString(1) == "INT")
    val stripped = out.select(ExpressionRunner.stripResultDdl(col("er")).as("s"))
      .select(element_at(element_at(col("s.ruleSetResults"), Id.pack(Id(6, 1))), Id.pack(Id(61, 1))))
      .as[String].collect()
    assert(stripped(0) == "v:41")
  }

  test("yaml expression results round-trip via from_yaml") {
    val s = RuleSuite(Id(5, 1), Seq(RuleSet(Id(6, 1), Seq(Rule(Id(60, 1), "array(x, x + 1)")))))
    val out = ExpressionRunner.addExpressionResults(Seq(4).toDF("x"), s, "er", yamlResults = true)
      .select(element_at(element_at(col("er.ruleSetResults"), Id.pack(Id(6, 1))), Id.pack(Id(60, 1))).as("e"))
      .select(col("e.result"), col("e.resultDDL"))
    val row = out.collect()(0)
    assert(row.getString(1).toUpperCase.startsWith("ARRAY"))
    val back = Seq(row.getString(0)).toDF("y")
      .select(graft.rules.RuleRunner.parseRule("from_yaml(y, 'ARRAY<INT>')", RuleSuite(Id(0, 0), Nil)).as("v"))
      .as[Seq[Int]].collect()(0)
    assert(back == Seq(4, 5))
  }

  test("aggExpressionResults runs agg_expr rules in one pass") {
    val s = RuleSuite(Id(7, 1), Seq(RuleSet(Id(8, 1), Seq(
      Rule(Id(80, 1), "agg_expr('BIGINT', x > 1, sum_with(s -> s + x), return_sum())"),
      Rule(Id(81, 1), "agg_expr(x > 0, inc(), return_sum())")))))
    val out = ExpressionRunner.aggExpressionResults(
      Seq(1L, 2L, 3L).toDF("x"), s, "er")
    val r = out.select(
      element_at(element_at(col("er.ruleSetResults"), Id.pack(Id(8, 1))), Id.pack(Id(80, 1))).getField("result"),
      element_at(element_at(col("er.ruleSetResults"), Id.pack(Id(8, 1))), Id.pack(Id(81, 1))).getField("result"))
      .collect()(0)
    assert(r.getString(0) == "5")
    assert(r.getString(1) == "3")
  }

  test("rule_result works on expressionRunner results (docs parity)") {
    val out = ExpressionRunner.addExpressionResults(Seq(41).toDF("x"), suite, "er")
      .select(RuleRunner.ruleResult(col("er"),
        lit(Id.pack(Id(5, 1))), lit(Id.pack(Id(6, 1))), lit(Id.pack(Id(60, 1)))).as("r"))
      .select(col("r.result"), col("r.resultDDL"))
      .collect()(0)
    assert(out.getString(0) == "42" && out.getString(1) == "INT")
  }

  test("flat emission matches the nested shape and reassembles for persist") {
    val df = Seq(41).toDF("x")
    val flat = ExpressionRunner.addFlatExpressionResults(df, suite, "er")
    val c60 = ExpressionRunner.flatColumnName("er", Id(6, 1), Id(60, 1))
    val c61 = ExpressionRunner.flatColumnName("er", Id(6, 1), Id(61, 1))
    assert(flat.columns.toSeq == Seq("x", c60, c61))
    val r = flat.select(col(s"`$c60`.result"), col(s"`$c60`.resultDDL"), col(s"`$c61`.result"))
      .collect()(0)
    assert(r.getString(0) == "42" && r.getString(1) == "INT" && r.getString(2) == "v:41")
    // reassembled nested struct is byte-identical to the direct nested path
    val nested = ExpressionRunner.assembleExpressionResults(flat, suite, "er")
    assert(nested.columns.toSeq == Seq("x", "er"))
    val direct = ExpressionRunner.addExpressionResults(df, suite, "er")
    assert(nested.collect().toSeq == direct.collect().toSeq)
  }

  test("flat emission: single-rule extraction prunes the scan to that rule's inputs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_flat_er").toString
    Seq((1, 2, 3)).toDF("x", "y", "z").write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    val s = RuleSuite(Id(5, 1), Seq(RuleSet(Id(6, 1), Seq(
      Rule(Id(60, 1), "x + 1"),
      Rule(Id(61, 1), "y * 10")))))
    val one = ExpressionRunner.addFlatExpressionResults(src, s, "er")
      .select(col(s"`${ExpressionRunner.flatColumnName("er", Id(6, 1), Id(60, 1))}`.result"))
    val physical = one.queryExecution.executedPlan.toString
    assert(physical.contains("ReadSchema: struct<x:int>"),
      s"scan did not prune to the extracted rule's input:\n$physical")
    assert(one.as[String].collect().toSeq == Seq("2"))
  }

  test("typedExpressionRunner keeps typed results") {
    val s = RuleSuite(Id(5, 1), Seq(RuleSet(Id(6, 1), Seq(Rule(Id(60, 1), "x * 2.5")))))
    val out = ExpressionRunner.addTypedExpressionResults(Seq(4).toDF("x"), s, "double", "er")
      .select(element_at(element_at(col("er.ruleSetResults"), Id.pack(Id(6, 1))), Id.pack(Id(60, 1))))
      .as[Double].collect()
    assert(out(0) == 10.0)
  }
}
