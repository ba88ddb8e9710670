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

  /**
   * Validate rules AND output expressions against `df`'s schema.
   *
   * Output-expression depth (reference impl/Validation.scala resolves these
   * too, not just parse-checks):
   *  - engine-style outputs (plain expressions) resolve against the frame, so
   *    a typo'd column fails validation instead of run time;
   *  - folder-style outputs (`acc -> …` lambdas / `set(field = …)` sugar)
   *    resolve against the frame PLUS the folder's accumulator when
   *    `folderStart` is supplied — a misspelled `currentResult.field` is
   *    caught here. Without `folderStart` the accumulator schema is unknown
   *    and folder outputs fall back to a parse check.
   */
  def validate(
      df: DataFrame, suite: RuleSuite,
      folderStart: Option[org.apache.spark.sql.Column] = None): Seq[Issue] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
    import org.apache.spark.sql.catalyst.expressions.{LambdaFunction => CatalystLambda}

    def assertResolves(c: org.apache.spark.sql.Column): Unit =
      df.select(c).queryExecution.assertAnalyzed()

    def tryResolve(sql: String, mk: String => Issue): Seq[Issue] =
      try { assertResolves(Parsing.parseCol(sql, suite)); Seq.empty }
      catch { case t: Throwable => Seq(mk(t.getMessage)) }

    val lambdaIssues = suite.lambdaFunctions.flatMap { l =>
      try { Lambdas.parse(l.sql); Seq.empty }
      catch { case t: Throwable =>
        Seq(LambdaError(Seq(suite.id, l.id), s"lambda ${l.name}: ${t.getMessage}")) }
    }

    def validateOutput(o: OutputExpression, path: Seq[Id]): Seq[Issue] =
      try {
        val parsed = Lambdas.substitute(
          org.apache.spark.sql.graft.Bridge.parse(o.sql),
          Lambdas.toMap(suite.lambdaFunctions))
        val folderShaped = parsed match {
          case CatalystLambda(_, Seq(_), _) => true
          case uf: UnresolvedFunction if uf.nameParts.last.equalsIgnoreCase("set") => true
          case _ => false
        }
        (folderShaped, folderStart) match {
          case (true, Some(acc)) =>
            assertResolves(Parsing.applyFolderOutput(o.sql, suite, acc))
          case (true, None) => () // accumulator schema unknown: parse check only
          case (false, _) =>
            assertResolves(Parsing.parseCol(o.sql, suite))
        }
        Seq.empty
      } catch {
        case t: Throwable => Seq(OutputError(path :+ o.id, t.getMessage))
      }

    val ruleIssues = suite.ruleSets.flatMap { rs =>
      rs.rules.flatMap { r =>
        val path = Seq(suite.id, rs.id, r.id)
        tryResolve(r.sql, m => RuleError(path, m)) ++
          r.output.toSeq.flatMap(o => validateOutput(o, path))
      }
    }
    lambdaIssues ++ ruleIssues
  }

  /** Markdown documentation of a suite (reference: impl/util/Docs.scala).
   * Doc comments embedded in rule/lambda/output SQL (DocsParsing) become
   * descriptions, per-parameter tables, and return notes. */
  def docs(suite: RuleSuite): String = {
    import DocsParsing.{parse => docOf, stripComments}
    val sb = new StringBuilder
    def describe(sql: String, indentHeader: String): Unit =
      docOf(sql).filterNot(_.isEmpty).foreach { d =>
        if (d.description.nonEmpty) sb.append(s"${d.description.replaceAll("\\s+", " ")}\n\n")
        if (d.params.nonEmpty) {
          sb.append(s"$indentHeader| param | doc |\n| --- | --- |\n")
          d.params.foreach { case (n, t) => sb.append(s"| $n | ${t.replaceAll("\\s+", " ")} |\n") }
          sb.append("\n")
        }
        if (d.returnDescription.nonEmpty)
          sb.append(s"returns: ${d.returnDescription.replaceAll("\\s+", " ")}\n\n")
      }
    sb.append(s"# RuleSuite ${suite.id.id} v${suite.id.version}\n\n")
    if (suite.lambdaFunctions.nonEmpty) {
      sb.append("## Lambdas\n\n")
      suite.lambdaFunctions.foreach { l =>
        sb.append(s"### ${l.name} (${l.id.id} v${l.id.version})\n\n")
        describe(l.sql, "")
        sb.append(s"```sql\n${stripComments(l.sql)}\n```\n\n")
      }
    }
    suite.ruleSets.foreach { rs =>
      sb.append(s"## RuleSet ${rs.id.id} v${rs.id.version}\n\n")
      rs.rules.foreach { r =>
        sb.append(s"### Rule ${r.id.id} v${r.id.version}\n\n")
        describe(r.sql, "")
        sb.append(s"```sql\n${stripComments(r.sql)}\n```\n\n")
        r.output.foreach { o =>
          sb.append(s"Output ${o.id.id} v${o.id.version} (salience ${o.salience}):\n\n")
          describe(o.sql, "")
          sb.append(s"```sql\n${stripComments(o.sql)}\n```\n\n")
        }
      }
    }
    sb.toString
  }
}
