package graft.rules

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SerializationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val suite: RuleSuite = RuleSuite(
    Id(1, 2),
    Seq(
      RuleSet(Id(10, 1), Seq(
        Rule(Id(100, 1), "a > 0"),
        Rule(Id(101, 1), "b > 0", Some(OutputExpression(5, Id(700, 1), "concat('x', c)"))))),
      RuleSet(Id(20, 1), Seq(Rule(Id(200, 1), "myfun(a)")))),
    Seq(LambdaFunction("myfun", "v -> v * 2 > 1", Id(900, 1))))

  test("rule suite round-trips through DataFrames") {
    val ruleDf = Serialization.toRuleSuiteDF(spark, suite)
    val lambdaDf = Serialization.toLambdaDF(spark, suite)
    val outDf = Seq(("concat('x', c)", 700, 1, 1, 2)).toDF(
      "ruleExpr", "functionId", "functionVersion", "ruleSuiteId", "ruleSuiteVersion")

    val read = Serialization.readRulesFromDF(ruleDf,
      col("ruleSuiteId"), col("ruleSuiteVersion"), col("ruleSetId"), col("ruleSetVersion"),
      col("ruleId"), col("ruleVersion"), col("ruleExpr"),
      Some(col("ruleEngineSalience")), Some(col("ruleEngineId")), Some(col("ruleEngineVersion")))
    val lambdas = Serialization.readLambdasFromDF(lambdaDf,
      col("name"), col("ruleExpr"), col("functionId"), col("functionVersion"),
      col("ruleSuiteId"), col("ruleSuiteVersion"))
    val outputs = Serialization.readOutputExpressionsFromDF(outDf,
      col("ruleExpr"), col("functionId"), col("functionVersion"),
      col("ruleSuiteId"), col("ruleSuiteVersion"))
    val (withOutputs, missing) = Serialization.integrateOutputExpressions(
      Serialization.integrateLambdas(read, lambdas), outputs)

    assert(missing.isEmpty)
    val rt = withOutputs(Id(1, 2))
    assert(rt.ruleSets.map(_.id) == suite.ruleSets.map(_.id))
    assert(rt.ruleSets.flatMap(_.rules).map(_.sql).toSet ==
      suite.ruleSets.flatMap(_.rules).map(_.sql).toSet)
    assert(rt.lambdaFunctions == suite.lambdaFunctions)
    val withOut = rt.ruleSets.flatMap(_.rules).find(_.id == Id(101, 1)).get
    assert(withOut.output.contains(OutputExpression(5, Id(700, 1), "concat('x', c)")))
  }

  test("engine suite round-trips and runs end-to-end") {
    val engineSuite = RuleSuite(Id(4, 1), Seq(RuleSet(Id(41, 1), Seq(
      Rule(Id(410, 1), "x >= 10", Some(OutputExpression(1, Id(710, 1), "'big'"))),
      Rule(Id(411, 1), "x < 10", Some(OutputExpression(2, Id(711, 1), "'small'")))))))
    val ruleDf = Serialization.toRuleSuiteDF(spark, engineSuite)
    val outDf = Seq(("'big'", 710, 1, 4, 1), ("'small'", 711, 1, 4, 1)).toDF(
      "ruleExpr", "functionId", "functionVersion", "ruleSuiteId", "ruleSuiteVersion")
    val read = Serialization.readRulesFromDF(ruleDf,
      col("ruleSuiteId"), col("ruleSuiteVersion"), col("ruleSetId"), col("ruleSetVersion"),
      col("ruleId"), col("ruleVersion"), col("ruleExpr"),
      Some(col("ruleEngineSalience")), Some(col("ruleEngineId")), Some(col("ruleEngineVersion")))
    val outputs = Serialization.readOutputExpressionsFromDF(outDf,
      col("ruleExpr"), col("functionId"), col("functionVersion"),
      col("ruleSuiteId"), col("ruleSuiteVersion"))
    val (suites, missing) = Serialization.integrateOutputExpressions(read, outputs)
    assert(missing.isEmpty)
    val res = RuleEngine.addRuleEngine(Seq(5, 50).toDF("x"), suites(Id(4, 1)), "re")
      .select(col("re.result")).as[String].collect()
    assert(res.toSeq == Seq("small", "big"))
  }

  test("latestVersions keeps newest rule versions and drops DELETED") {
    val rows = Seq(
      (1, 1, 1, 1, 1, 1, "a > 0", -1, -1, -1),
      (1, 2, 1, 2, 1, 2, "a > 1", -1, -1, -1),        // supersedes
      (1, 1, 1, 1, 2, 1, "b > 0", -1, -1, -1),
      (1, 3, 1, 3, 2, 2, "DELETED", -1, -1, -1)       // tombstone
    ).toDF("ruleSuiteId", "ruleSuiteVersion", "ruleSetId", "ruleSetVersion",
      "ruleId", "ruleVersion", "ruleExpr", "ruleEngineSalience", "ruleEngineId", "ruleEngineVersion")
    val latest = Serialization.latestVersions(rows)
      .select("ruleId", "ruleExpr", "ruleSuiteVersion")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    // surviving rows report the max suite version (3) so readRulesFromDF
    // re-assembles them into ONE latest-version suite
    assert(latest == Set((1, "a > 1", 3)))
  }

  test("validation reports unresolvable rules and bad lambdas") {
    val bad = RuleSuite(Id(9, 1), Seq(RuleSet(Id(91, 1), Seq(
      Rule(Id(910, 1), "not_a_col > 0"),
      Rule(Id(911, 1), "a > 0")))))
    val issues = Validation.validate(Seq((1, 2)).toDF("a", "b"), bad)
    assert(issues.size == 1)
    assert(issues.head.message.contains("not_a_col"))
    assert(Validation.docs(suite).contains("RuleSet 10"))
  }

  test("view loader registers config-driven views") {
    val loader = new ViewLoader.DataFrameLoader {
      def load(token: String) = Seq((1, "x"), (2, "y")).toDF("id", "v")
    }
    val configs = Seq(
      ViewLoader.ViewConfig("base_view", Some("tok"), Some("id > 1"), None),
      ViewLoader.ViewConfig("derived_view", None, None, Some("SELECT v FROM base_view")),
      ViewLoader.ViewConfig("broken", None, None, None))
    val res = ViewLoader.loadViews(spark, loader, configs)
    assert(res.loadedViews == Set("base_view", "derived_view"))
    assert(res.notLoaded == Set("broken"))
    assert(spark.sql("SELECT * FROM derived_view").as[String].collect().toSeq == Seq("y"))
  }
}
