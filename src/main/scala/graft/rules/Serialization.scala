package graft.rules

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * Rule suites ↔ DataFrames (reference: impl/util/serializing.scala,
 * docs/getting_started/serializing.md). Rules are versioned *data*: store
 * them in any table, read them back by naming the columns.
 */
object Serialization {

  type RuleSuiteMap = Map[Id, RuleSuite]

  /** Rows: one per rule, with engine fields (-1 salience ⇒ no output). */
  def toRuleSuiteDF(spark: SparkSession, suites: RuleSuite*): DataFrame = {
    import spark.implicits._
    suites.flatMap { suite =>
      suite.ruleSets.flatMap { rs =>
        rs.rules.map { r =>
          (suite.id.id, suite.id.version, rs.id.id, rs.id.version,
            r.id.id, r.id.version, r.sql,
            r.output.map(_.salience).getOrElse(-1),
            r.output.map(_.id.id).getOrElse(-1),
            r.output.map(_.id.version).getOrElse(-1))
        }
      }
    }.toDF("ruleSuiteId", "ruleSuiteVersion", "ruleSetId", "ruleSetVersion",
      "ruleId", "ruleVersion", "ruleExpr",
      "ruleEngineSalience", "ruleEngineId", "ruleEngineVersion")
  }

  def toLambdaDF(spark: SparkSession, suites: RuleSuite*): DataFrame = {
    import spark.implicits._
    suites.flatMap { suite =>
      suite.lambdaFunctions.map(l =>
        (l.name, l.sql, l.id.id, l.id.version, suite.id.id, suite.id.version))
    }.toDF("name", "ruleExpr", "functionId", "functionVersion", "ruleSuiteId", "ruleSuiteVersion")
  }

  /** DELETED tombstone marker (docs/getting_started/serializing.md §versioned). */
  val Deleted = "DELETED"

  /**
   * Read rule rows into suites. Output-expression references
   * (ruleEngine{Salience,Id,Version} columns, optional) are resolved against
   * `outputExpressions` read via readOutputExpressionsFromDF.
   */
  def readRulesFromDF(
      df: DataFrame,
      ruleSuiteId: Column, ruleSuiteVersion: Column,
      ruleSetId: Column, ruleSetVersion: Column,
      ruleId: Column, ruleVersion: Column,
      ruleExpr: Column,
      ruleEngineSalience: Option[Column] = None,
      ruleEngineId: Option[Column] = None,
      ruleEngineVersion: Option[Column] = None): RuleSuiteMap = {
    val base = Seq(ruleSuiteId.cast("int"), ruleSuiteVersion.cast("int"),
      ruleSetId.cast("int"), ruleSetVersion.cast("int"),
      ruleId.cast("int"), ruleVersion.cast("int"), ruleExpr)
    val engine = (ruleEngineSalience, ruleEngineId, ruleEngineVersion) match {
      case (Some(s), Some(i), Some(v)) => Seq(s.cast("int"), i.cast("int"), v.cast("int"))
      case _ => Seq(lit(-1), lit(-1), lit(-1))
    }
    val rows = df.select(base ++ engine: _*).collect()
    rows.groupBy(r => Id(r.getInt(0), r.getInt(1))).map { case (suiteId, suiteRows) =>
      val sets = suiteRows.groupBy(r => Id(r.getInt(2), r.getInt(3))).map { case (setId, setRows) =>
        RuleSet(setId, setRows.toSeq.map { r =>
          val out =
            if (r.getInt(7) >= 0 && r.getInt(8) >= 0)
              Some(OutputExpression(r.getInt(7), Id(r.getInt(8), r.getInt(9)), sql = ""))
            else None
          Rule(Id(r.getInt(4), r.getInt(5)), r.getString(6), out)
        })
      }.toSeq.sortBy(s => (s.id.id, s.id.version))
      suiteId -> RuleSuite(suiteId, sets)
    }
  }

  def readLambdasFromDF(
      df: DataFrame,
      name: Column, ruleExpr: Column,
      functionId: Column, functionVersion: Column,
      ruleSuiteId: Column, ruleSuiteVersion: Column): Map[Id, Seq[LambdaFunction]] =
    df.select(name, ruleExpr, functionId.cast("int"), functionVersion.cast("int"),
        ruleSuiteId.cast("int"), ruleSuiteVersion.cast("int"))
      .collect()
      .groupBy(r => Id(r.getInt(4), r.getInt(5)))
      .map { case (sid, rows) =>
        sid -> rows.toSeq.map(r => LambdaFunction(r.getString(0), r.getString(1), Id(r.getInt(2), r.getInt(3))))
      }

  def integrateLambdas(suites: RuleSuiteMap, lambdas: Map[Id, Seq[LambdaFunction]]): RuleSuiteMap =
    suites.map { case (id, s) => id -> s.copy(lambdaFunctions = lambdas.getOrElse(id, Seq.empty)) }

  /** Output expressions stored separately, keyed (suiteId, functionId). */
  def readOutputExpressionsFromDF(
      df: DataFrame,
      ruleExpr: Column, functionId: Column, functionVersion: Column,
      ruleSuiteId: Column, ruleSuiteVersion: Column): Map[Id, Map[Id, String]] =
    df.select(ruleExpr, functionId.cast("int"), functionVersion.cast("int"),
        ruleSuiteId.cast("int"), ruleSuiteVersion.cast("int"))
      .collect()
      .groupBy(r => Id(r.getInt(3), r.getInt(4)))
      .map { case (sid, rows) =>
        sid -> rows.map(r => Id(r.getInt(1), r.getInt(2)) -> r.getString(0)).toMap
      }

  /** Attach output texts; returns suites plus the (suiteId → missing output
   * ids) that could not be resolved (reference integrateOutputExpressions). */
  def integrateOutputExpressions(
      suites: RuleSuiteMap,
      outputs: Map[Id, Map[Id, String]]): (RuleSuiteMap, Map[Id, Set[Id]]) = {
    var missing = Map.empty[Id, Set[Id]]
    val integrated = suites.map { case (sid, suite) =>
      val byId = outputs.getOrElse(sid, Map.empty)
      sid -> suite.copy(ruleSets = suite.ruleSets.map(rs => rs.copy(rules = rs.rules.map { r =>
        r.output match {
          case Some(o) =>
            byId.get(o.id) match {
              case Some(sql) => r.copy(output = Some(o.copy(sql = sql)))
              case None =>
                missing += sid -> (missing.getOrElse(sid, Set.empty) + o.id)
                r.copy(output = None)
            }
          case None => r
        }
      })))
    }
    (integrated, missing)
  }

  /**
   * Simple versioning (reference: simpleVersioning package): per suite id,
   * keep the highest suite version's view of the world — a rule row at a
   * lower (ruleSetVersion, ruleVersion) is superseded by a higher one;
   * DELETED rule text removes the rule.
   */
  def latestVersions(rows: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bySuite = Window.partitionBy(col("ruleSuiteId"))
    val byRule = Window.partitionBy(col("ruleSuiteId"), col("ruleSetId"), col("ruleId"))
      .orderBy(col("ruleSuiteVersion").desc, col("ruleSetVersion").desc, col("ruleVersion").desc)
    rows
      .withColumn("graft_max_sv", max(col("ruleSuiteVersion")).over(bySuite))
      .withColumn("graft_rn", row_number().over(byRule))
      .where(col("graft_rn") === 1 && col("ruleExpr") =!= Serialization.Deleted)
      // surviving rows all report the latest suite version so the result
      // reads back (readRulesFromDF keys on (id, version)) as ONE suite
      .withColumn("ruleSuiteVersion", col("graft_max_sv"))
      .drop("graft_max_sv", "graft_rn")
  }
}
