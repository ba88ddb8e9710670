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

  test("validation resolves engine and folder output expressions, not just parses them") {
    val df = Seq((1.0, 2.0)).toDF("price", "qty")
    val engineSuite = RuleSuite(Id(9, 1), Seq(RuleSet(Id(91, 1), Seq(
      Rule(Id(910, 1), "price > 0", Some(OutputExpression(10, Id(1, 1), "missing_col * 2"))),
      Rule(Id(911, 1), "qty > 0", Some(OutputExpression(20, Id(2, 1), "price * 2")))))))
    val engineIssues = Validation.validate(df, engineSuite)
    assert(engineIssues.size == 1 && engineIssues.head.isInstanceOf[Validation.OutputError])
    assert(engineIssues.head.message.contains("missing_col"))

    // folder outputs resolve against the supplied accumulator: a misspelled
    // currentResult field is caught at validation time
    val folderSuite = RuleSuite(Id(9, 2), Seq(RuleSet(Id(92, 1), Seq(
      Rule(Id(920, 1), "price > 0",
        Some(OutputExpression(10, Id(3, 1), "set(p = currentResult.pricee * 2)"))),
      Rule(Id(921, 1), "qty > 0",
        Some(OutputExpression(20, Id(4, 1), "acc -> update_field(acc, 'p', acc.p + 1)")))))))
    val start = org.apache.spark.sql.functions.struct(col("price").as("p"))
    val folderIssues = Validation.validate(df, folderSuite, Some(start))
    assert(folderIssues.size == 1 && folderIssues.head.isInstanceOf[Validation.OutputError])
    assert(folderIssues.head.ruleId.last == Id(3, 1))
    // without the accumulator context, folder outputs stay parse-checked only
    assert(Validation.validate(df, folderSuite).isEmpty)
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

  test("view loader resolves nested view dependencies in any config order") {
    val loader = new ViewLoader.DataFrameLoader {
      def load(token: String) = Seq((1, "x"), (2, "y"), (3, "z")).toDF("id", "v")
    }
    // chain c -> b -> a listed in REVERSE dependency order, plus one that can
    // never resolve
    val configs = Seq(
      ViewLoader.ViewConfig("chain_c", None, None, Some("SELECT v FROM chain_b WHERE id > 1")),
      ViewLoader.ViewConfig("chain_b", None, None, Some("SELECT id, v FROM chain_a WHERE id > 1")),
      ViewLoader.ViewConfig("never_resolves", None, None, Some("SELECT * FROM no_such_view_anywhere")),
      ViewLoader.ViewConfig("chain_a", Some("tok"), None, None))
    val res = ViewLoader.loadViews(spark, loader, configs)
    assert(res.loadedViews == Set("chain_a", "chain_b", "chain_c"))
    assert(res.notLoaded == Set("never_resolves"))
    assert(spark.sql("SELECT * FROM chain_c").as[String].collect().sorted.toSeq == Seq("y", "z"))
  }
}
