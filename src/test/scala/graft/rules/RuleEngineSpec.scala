package graft.rules

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RuleEngineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def df = Seq((5.0, "A"), (15.0, "B"), (150.0, "C"), (-1.0, "D")).toDF("amount", "tag")

  val suite: RuleSuite = RuleSuite(Id(1, 1), Seq(RuleSet(Id(2, 1), Seq(
    Rule(Id(10, 1), "amount >= 100", Some(OutputExpression(30, Id(910, 1), "concat('big:', tag)"))),
    Rule(Id(11, 1), "amount >= 10", Some(OutputExpression(50, Id(911, 1), "concat('mid:', tag)"))),
    Rule(Id(12, 1), "amount >= 0", Some(OutputExpression(100, Id(912, 1), "concat('small:', tag)")))))))

  test("lowest salience passing rule fires; none → nulls") {
    val out = RuleEngine.addRuleEngine(df, suite, "re")
      .select(col("re.result"), col("re.salientRule.ruleId"), col("re.ruleSuiteResults.overallResult"))
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("small:A", "mid:B", "big:C", null))
    assert(out(2).getLong(1) == Id.pack(Id(10, 1)))
    assert(out(3).isNullAt(1))
  }

  test("debugMode returns all passing outputs with salience") {
    val out = RuleEngine.addRuleEngine(df, suite, "re", debugMode = true)
      .select(col("re.result"))
      .as[Seq[(Int, String)]].collect()
    assert(out(0) == Seq((100, "small:A")))
    assert(out(1) == Seq((50, "mid:B"), (100, "small:B")))
    assert(out(2) == Seq((30, "big:C"), (50, "mid:C"), (100, "small:C")))
    assert(out(3) == Seq())
  }

  test("flatten_rule_results carries salientRule and result") {
    val out = RuleEngine.addRuleEngine(df, suite, "re")
      .select(explode(RuleEngine.flattenRuleResults(col("re"))).as("r"))
      .select("r.ruleId", "r.result").where("r.ruleId = 10")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSeq == Seq((10, "small:A"), (10, "mid:B"), (10, "big:C"), (10, null)))
  }

  test("typed array-of-struct outputs with explicit output DDL") {
    // mirrors the reference's account_row example (docs/advanced/ruleEngine.md)
    val s = RuleSuite(Id(1, 1), Seq(RuleSet(Id(2, 1), Seq(
      Rule(Id(10, 1), "amount >= 100", Some(OutputExpression(1, Id(9, 1),
        "array(named_struct('transfer_type', 'from', 'account', tag), named_struct('transfer_type', 'to', 'account', 'other'))"))),
      Rule(Id(11, 1), "amount < 100", Some(OutputExpression(2, Id(8, 1),
        "array(named_struct('transfer_type', 'none', 'account', tag))")))))))
    val out = RuleEngine.addRuleEngine(df, s, "re",
        outputDdl = Some("ARRAY<STRUCT<transfer_type: STRING, account: STRING>>"))
      .select(col("re.result"))
      .as[Seq[(String, String)]].collect()
    assert(out(2) == Seq(("from", "C"), ("to", "other")))
    assert(out(0) == Seq(("none", "A")))
  }

  test("triggered rule with null output keeps salientRule, null result") {
    val s = RuleSuite(Id(1, 1), Seq(RuleSet(Id(2, 1), Seq(
      Rule(Id(10, 1), "amount > 0", Some(OutputExpression(1, Id(9, 1), "cast(null as string)")))))))
    val out = RuleEngine.addRuleEngine(df.limit(1), s, "re")
      .select(col("re.result"), col("re.salientRule")).collect()
    assert(out(0).isNullAt(0) && !out(0).isNullAt(1))
  }
}
