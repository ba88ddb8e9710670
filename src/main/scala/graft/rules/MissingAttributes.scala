package graft.rules

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{NullType, StructType}

/**
 * coalesce_if_attributes_missing[_disable] preprocessing (reference:
 * impl/ReplaceWithIfMissingAttributesExpr.scala): rules written for evolving
 * schemas pick the first alternative whose attributes all exist; if none
 * match, null (or disabled_rule() for the _disable variant). MUST run before
 * the suite is planned — this is suite surgery, not a runtime function.
 */
object MissingAttributes {

  private val Names = Set("coalesceifattributesmissing")
  private val DisableNames = Set("coalesceifattributesmissingdisable")

  private def flat(s: String) = s.toLowerCase.replaceAll("_", "")

  def namesFromSchema(schema: StructType): Set[String] = {
    def walk(prefix: String, st: StructType): Seq[String] =
      st.fields.toSeq.flatMap { f =>
        val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        p +: (f.dataType match {
          case s: StructType => walk(p, s)
          case _ => Seq.empty
        })
      }
    walk("", schema).map(_.toLowerCase).toSet
  }

  private def attributesOf(e: Expression): Set[String] =
    e.collect { case UnresolvedAttribute(parts) => parts.mkString(".").toLowerCase }.toSet

  def processExpression(e: Expression, names: Set[String]): Expression = e.transformUp {
    case uf: UnresolvedFunction
        if Names(flat(uf.nameParts.last)) || DisableNames(flat(uf.nameParts.last)) =>
      val disabled = DisableNames(flat(uf.nameParts.last))
      // a dotted path counts as present if the full nested path is known OR its
      // root column exists (map/array element access isn't enumerable from the
      // schema) — but a missing root always counts as missing
      uf.arguments
        .find(a => attributesOf(a).forall(n =>
          names(n) || (n.contains(".") && names(n.substring(0, n.indexOf('.'))))))
        .getOrElse(
          if (disabled) Literal(graft.rules.RuleResults.DisabledRuleInt)
          else Literal(null, NullType))
  }

  /** Rewrite every rule / output / lambda in the suite against `schema`. */
  def processIfAttributeMissing(suite: RuleSuite, schema: StructType): RuleSuite = {
    val names = namesFromSchema(schema)
    def rw(sql: String): String = {
      val parsed = Bridge.parse(sql)
      val processed = processExpression(parsed, names)
      if (processed fastEquals parsed) sql else processed.sql
    }
    suite.copy(
      ruleSets = suite.ruleSets.map(rs => rs.copy(rules = rs.rules.map(r =>
        r.copy(sql = rw(r.sql), output = r.output.map(o => o.copy(sql = rw(o.sql))))))),
      lambdaFunctions = suite.lambdaFunctions.map(l => l.copy(sql = rw(l.sql))))
  }
}
