package graft

import graft.rules._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * Flat entry-point surface with the reference's top-level names
 * (reference: com.sparkutils.quality package object) so existing call sites
 * port by changing one import:
 *
 * {{{
 *   import graft.api._
 *   val out = addDataQuality(df, suite)
 * }}}
 */
object api {

  // ---- runners ----
  def addDataQuality(df: DataFrame, suite: RuleSuite, name: String = "DataQuality"): DataFrame =
    RuleRunner.addDataQuality(df, suite, name)
  def addOverallResultsAndDetailsF(
      df: DataFrame, suite: RuleSuite,
      overallName: String = "DQ_overallResult", detailsName: String = "DQ_details"): DataFrame =
    RuleRunner.addOverallResultsAndDetails(df, suite, overallName, detailsName)
  def ruleRunner(suite: RuleSuite): Column = RuleRunner.ruleRunner(suite)
  def ruleEngineRunner(
      df: DataFrame, suite: RuleSuite, name: String = "ruleEngine",
      outputDdl: Option[String] = None, debugMode: Boolean = false): DataFrame =
    RuleEngine.addRuleEngine(df, suite, name, outputDdl, debugMode)
  def ruleFolderRunner(
      df: DataFrame, suite: RuleSuite, start: Column,
      name: String = "ruleFolder", debugMode: Boolean = false): DataFrame =
    RuleFolder.addRuleFolder(df, suite, start, name, debugMode)
  def expressionRunner(df: DataFrame, suite: RuleSuite, name: String = "expressionResults"): DataFrame =
    ExpressionRunner.addExpressionResults(df, suite, name)
  def typedExpressionRunner(df: DataFrame, suite: RuleSuite, ddl: String,
      name: String = "expressionResults"): DataFrame =
    ExpressionRunner.addTypedExpressionResults(df, suite, ddl, name)

  // ---- registration ----
  def registerQualityFunctions(spark: SparkSession): Unit =
    functions.Registry.registerAll(spark)
  /** Reference registerLambdaFunctions: stored lambdas usable from any
   * spark.sql string (impl/imports/LambdaFunctionsImports.scala:17). */
  def registerLambdaFunctions(spark: SparkSession, fns: Seq[LambdaFunction]): Unit =
    Lambdas.registerLambdaFunctions(spark, fns)
  def processIfAttributeMissing(suite: RuleSuite, schema: StructType): RuleSuite =
    MissingAttributes.processIfAttributeMissing(suite, schema)

  // ---- serialization ----
  def toRuleSuiteDF(spark: SparkSession, suites: RuleSuite*): DataFrame =
    Serialization.toRuleSuiteDF(spark, suites: _*)
  def toLambdaDS(spark: SparkSession, suites: RuleSuite*): DataFrame =
    Serialization.toLambdaDF(spark, suites: _*)
  /** Reference's toDS: rule rows incl. the three ruleEngine fields. */
  def toDS(spark: SparkSession, suite: RuleSuite): DataFrame =
    Serialization.toRuleSuiteDF(spark, suite)
  def readRulesFromDF(df: DataFrame,
      ruleSuiteId: Column, ruleSuiteVersion: Column,
      ruleSetId: Column, ruleSetVersion: Column,
      ruleId: Column, ruleVersion: Column, ruleExpr: Column): Serialization.RuleSuiteMap =
    Serialization.readRulesFromDF(df, ruleSuiteId, ruleSuiteVersion,
      ruleSetId, ruleSetVersion, ruleId, ruleVersion, ruleExpr)
  def readLambdasFromDF(df: DataFrame,
      name: Column, ruleExpr: Column, functionId: Column, functionVersion: Column,
      ruleSuiteId: Column, ruleSuiteVersion: Column): Map[Id, Seq[LambdaFunction]] =
    Serialization.readLambdasFromDF(df, name, ruleExpr, functionId, functionVersion,
      ruleSuiteId, ruleSuiteVersion)
  def integrateLambdas(suites: Serialization.RuleSuiteMap,
      lambdas: Map[Id, Seq[LambdaFunction]]): Serialization.RuleSuiteMap =
    Serialization.integrateLambdas(suites, lambdas)
  def readOutputExpressionsFromDF(df: DataFrame,
      ruleExpr: Column, functionId: Column, functionVersion: Column,
      ruleSuiteId: Column, ruleSuiteVersion: Column): Map[Id, Map[Id, String]] =
    Serialization.readOutputExpressionsFromDF(df, ruleExpr, functionId, functionVersion,
      ruleSuiteId, ruleSuiteVersion)
  def integrateOutputExpressions(suites: Serialization.RuleSuiteMap,
      outputs: Map[Id, Map[Id, String]]): (Serialization.RuleSuiteMap, Map[Id, Set[Id]]) =
    Serialization.integrateOutputExpressions(suites, outputs)

  // ---- validation ----
  def validate(df: DataFrame, suite: RuleSuite): Seq[Validation.Issue] =
    Validation.validate(df, suite)
  def validate(spark: SparkSession, schema: StructType, suite: RuleSuite): Seq[Validation.Issue] =
    Validation.validate(spark, schema, suite)
  def ruleSuiteDocs(suite: RuleSuite): String = Validation.docs(suite)

  // ---- lookups ----
  def mapLookupsFromDFs(spark: SparkSession,
      creators: Map[String, () => (DataFrame, Column, Column)]): Unit =
    lookups.Lookups.registerMapLookups(spark, creators)
  def registerMapLookupsAndFunction(spark: SparkSession,
      creators: Map[String, () => (DataFrame, Column, Column)]): Unit = {
    lookups.Lookups.registerMapLookups(spark, creators)
    functions.Registry.registerAll(spark)
  }
  def registerBloomMapAndFunction(spark: SparkSession, name: String,
      buckets: Array[Array[Byte]], fpp: Double): Unit = {
    lookups.Lookups.registerBloom(spark, name, buckets, fpp)
    functions.Registry.registerAll(spark)
  }
  def bloomFrom(spark: SparkSession, name: String, df: DataFrame, col: Column,
      expected: Long, fpp: Double): Unit =
    lookups.Lookups.registerBloomFrom(spark, name, df, col, expected, fpp)
  def loadViews(spark: SparkSession, loader: ViewLoader.DataFrameLoader,
      configs: Seq[ViewLoader.ViewConfig]): ViewLoader.ViewLoadResults =
    ViewLoader.loadViews(spark, loader, configs)
  def loadMaps(spark: SparkSession, configs: Seq[lookups.Lookups.MapConfig],
      loader: ViewLoader.DataFrameLoader = null): Unit =
    lookups.Lookups.loadMaps(spark, configs, loader)
}
