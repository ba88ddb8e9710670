package graft.rules

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DocsParsingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val documented: String =
    """/** Checks the discount band stays within policy.
      |  * @param d the discount column, a fraction
      |  * @return true when within policy
      |  */
      |d <= 0.06""".stripMargin

  test("parse extracts description, params and return from a leading doc comment") {
    val d = DocsParsing.parse(documented).get
    assert(d.description == "Checks the discount band stays within policy.")
    assert(d.params == Map("d" -> "the discount column, a fraction"))
    assert(d.returnDescription == "true when within policy")
    assert(DocsParsing.stripComments(documented) == "d <= 0.06")
  }

  test("undocumented sql passes through untouched") {
    assert(DocsParsing.parse("a > 0").isEmpty)
    assert(DocsParsing.stripComments("a > 0") == "a > 0")
    // markdown-style body (not all lines star-prefixed) keeps its text
    val md = "/** line one\nnot starred\n*/ x + 1"
    assert(DocsParsing.parse(md).get.description.contains("not starred"))
    assert(DocsParsing.stripComments(md) == "x + 1")
  }

  test("documented rules and lambdas run: comments are stripped in the parse pipeline") {
    val suite = RuleSuite(Id(70, 1),
      Seq(RuleSet(Id(71, 1), Seq(
        Rule(Id(710, 1), "/** doc'd rule @return pass/fail */ doubled(v) > 3")))),
      Seq(LambdaFunction("doubled",
        "/** doubles @param x input @return 2x */ x -> x * 2", Id(700, 1))))
    val out = RuleRunner.addDataQuality(Seq(1, 2).toDF("v"), suite)
      .select(col("DataQuality.overallResult")).as[Int].collect()
    assert(out.toSeq == Seq(RuleResults.FailedInt, RuleResults.PassedInt))
  }

  test("field-level docs survive a suite DataFrame round-trip into generated docs") {
    val suite = RuleSuite(Id(70, 2),
      Seq(RuleSet(Id(72, 1), Seq(Rule(Id(720, 1), documented)))),
      Seq(LambdaFunction("band", "/** band check @param p price @return band */ p -> p > 10", Id(701, 1))))
    val roundTripped = Serialization.readRulesFromDF(
      Serialization.toRuleSuiteDF(spark, suite),
      col("ruleSuiteId"), col("ruleSuiteVersion"), col("ruleSetId"), col("ruleSetVersion"),
      col("ruleId"), col("ruleVersion"), col("ruleExpr"))(Id(70, 2))
    val withLambdas = Serialization.integrateLambdas(
      Map(roundTripped.id -> roundTripped),
      Serialization.readLambdasFromDF(
        Serialization.toLambdaDF(spark, suite),
        col("name"), col("ruleExpr"), col("functionId"), col("functionVersion"),
        col("ruleSuiteId"), col("ruleSuiteVersion")))(Id(70, 2))
    val md = Validation.docs(withLambdas)
    assert(md.contains("Checks the discount band stays within policy."))
    assert(md.contains("| d | the discount column, a fraction |"))
    assert(md.contains("returns: true when within policy"))
    assert(md.contains("| p | price |"))
    assert(md.contains("d <= 0.06")) // stripped sql body present
  }
}
