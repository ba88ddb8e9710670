package graft.rules

import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/**
 * Rule-suite validation + docs (reference: impl/Validation.scala,
 * docs/advanced/validation.md): resolve every rule (and output expression)
 * against a schema without running anything; collect per-rule errors.
 */
object Validation {

  sealed trait Issue { def ruleId: Seq[Id]; def message: String }
  final case class RuleError(ruleId: Seq[Id], message: String) extends Issue
  final case class OutputError(ruleId: Seq[Id], message: String) extends Issue
  final case class LambdaError(ruleId: Seq[Id], message: String) extends Issue

  /** Validate against an empty frame of `schema`; returns all issues found. */
  def validate(spark: SparkSession, schema: StructType, suite: RuleSuite): Seq[Issue] = {
    val empty = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[Row]), schema)
    validate(empty, suite)
  }

  def validate(df: DataFrame, suite: RuleSuite): Seq[Issue] = {
    def tryResolve(sql: String, mk: String => Issue, path: Seq[Id]): Seq[Issue] =
      try {
        df.select(Parsing.parseCol(sql, suite)).queryExecution.assertAnalyzed()
        Seq.empty
      } catch {
        case t: Throwable => Seq(mk(t.getMessage))
      }

    val lambdaIssues = suite.lambdaFunctions.flatMap { l =>
      try { Lambdas.parse(l.sql); Seq.empty }
      catch { case t: Throwable =>
        Seq(LambdaError(Seq(suite.id, l.id), s"lambda ${l.name}: ${t.getMessage}")) }
    }

    val ruleIssues = suite.ruleSets.flatMap { rs =>
      rs.rules.flatMap { r =>
        val path = Seq(suite.id, rs.id, r.id)
        tryResolve(r.sql, m => RuleError(path, m), path) ++
          r.output.toSeq.flatMap { o =>
            try {
              // folder/engine outputs are validated as parseable; full
              // resolution needs the runner's accumulator context
              org.apache.spark.sql.graft.Bridge.parse(o.sql)
              Seq.empty
            } catch {
              case t: Throwable => Seq(OutputError(path :+ o.id, t.getMessage))
            }
          }
      }
    }
    lambdaIssues ++ ruleIssues
  }

  /** Markdown documentation of a suite (reference: impl/util/Docs.scala). */
  def docs(suite: RuleSuite): String = {
    val sb = new StringBuilder
    sb.append(s"# RuleSuite ${suite.id.id} v${suite.id.version}\n\n")
    if (suite.lambdaFunctions.nonEmpty) {
      sb.append("## Lambdas\n\n| name | id | expression |\n| --- | --- | --- |\n")
      suite.lambdaFunctions.foreach(l =>
        sb.append(s"| ${l.name} | ${l.id.id} v${l.id.version} | `${l.sql}` |\n"))
      sb.append("\n")
    }
    suite.ruleSets.foreach { rs =>
      sb.append(s"## RuleSet ${rs.id.id} v${rs.id.version}\n\n")
      sb.append("| rule | expression | output (salience) |\n| --- | --- | --- |\n")
      rs.rules.foreach { r =>
        val out = r.output.map(o => s"`${o.sql}` (${o.salience})").getOrElse("")
        sb.append(s"| ${r.id.id} v${r.id.version} | `${r.sql}` | $out |\n")
      }
      sb.append("\n")
    }
    sb.toString
  }
}
