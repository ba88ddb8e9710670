package graft.rules

import graft.functions.Registry
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, LambdaFunction => CatalystLambda}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.graft.Bridge

/** Shared rule-text parsing pipeline: parse → expand suite lambdas →
 * expand graft functions. */
private[graft] object Parsing {

  def parse(sql: String, suite: RuleSuite): Expression = {
    val lambdas = Lambdas.toMap(suite.lambdaFunctions)
    Registry.rewrite(Lambdas.substitute(Bridge.parse(DocsParsing.stripComments(sql)), lambdas))
  }

  def parseCol(sql: String, suite: RuleSuite): Column =
    Bridge.column(parse(sql, suite))

  /**
   * Parse a folder output expression and apply it to the accumulator column.
   * Accepts `param -> body` lambdas and the `set(a = expr, …)` sugar
   * (reference: Rule.scala OutputExpression + docs/advanced/ruleFolder.md).
   * `set` values may reference `currentResult`.
   */
  def applyFolderOutput(sql: String, suite: RuleSuite, acc: Column): Column = {
    val lambdas = Lambdas.toMap(suite.lambdaFunctions)
    val parsed = Lambdas.substitute(Bridge.parse(DocsParsing.stripComments(sql)), lambdas)
    val accExpr = Bridge.expression(acc)
    val applied = parsed match {
      case CatalystLambda(body, Seq(param), _) =>
        Lambdas.bindParams(body, Map(param.name -> accExpr))
      case uf: UnresolvedFunction if uf.nameParts.last.equalsIgnoreCase("set") =>
        val pairs = uf.arguments.map {
          case EqualTo(attr: UnresolvedAttribute, value) =>
            attr.name -> Bridge.column(
              Lambdas.bindParams(value, Map("currentResult" -> accExpr)))
          case other =>
            throw new IllegalArgumentException(
              s"set(...) arguments must be `field = expression`, got $other")
        }
        return Registry.rewriteCol(
          graft.functions.Registry.updateField(acc, pairs))
      case other =>
        throw new IllegalArgumentException(
          s"folder output must be a single-arg lambda or set(...), got: $other")
    }
    Bridge.column(Registry.rewrite(applied))
  }
}
