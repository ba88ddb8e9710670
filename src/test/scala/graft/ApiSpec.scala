package graft

import graft.rules._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ApiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.api._

  test("reference-named entry points run end-to-end") {
    val suite = RuleSuite(Id(1, 1), Seq(RuleSet(Id(2, 1), Seq(Rule(Id(3, 1), "v > 0")))))
    val df = Seq(1, -1).toDF("v")
    assert(addDataQuality(df, suite).select("DataQuality.overallResult").as[Int].collect().toSeq
      == Seq(100000, 0))
    assert(addOverallResultsAndDetailsF(df, suite).columns.contains("DQ_overallResult"))
    assert(expressionRunner(df, suite).columns.contains("expressionResults"))
    assert(validate(df, suite).isEmpty)
    val rt = readRulesFromDF(toRuleSuiteDF(spark, suite),
      col("ruleSuiteId"), col("ruleSuiteVersion"), col("ruleSetId"), col("ruleSetVersion"),
      col("ruleId"), col("ruleVersion"), col("ruleExpr"))
    assert(rt(Id(1, 1)).ruleSets.head.rules.head.sql == "v > 0")
  }
}
