package graft.rules

/**
 * Core versioned-rule data model.
 *
 * Mirrors the semantics of sparkutils/quality's model (reference:
 * src/main/scala/com/sparkutils/quality/Rule.scala) — rules are SQL
 * expression strings stored as versioned *data*, grouped into rule sets and
 * suites. Nothing here touches Spark; runners turn a suite into Column trees.
 */
final case class Id(id: Int, version: Int)

object Id {
  /** Pack id+version into one long: high 32 bits id, low 32 bits version
   * (reference: impl/RuleRunner.scala:24-29). */
  def pack(i: Id): Long = (i.id.toLong << 32) | (i.version & 0xffffffffL)
  def unpack(l: Long): Id = Id((l >> 32).toInt, l.toInt)
}

/** Rule-result integer encoding (reference: impl/imports/RuleRunnerImports.scala:57-60). */
object RuleResults {
  val PassedInt: Int = 100000
  val FailedInt: Int = 0
  val SoftFailedInt: Int = -1
  val DisabledRuleInt: Int = -2
}

/**
 * Output action attached to a rule for the rule-engine / folder runners:
 * lowest salience wins (engine) or orders the fold (folder).
 */
final case class OutputExpression(salience: Int, id: Id, sql: String)

/** A single DQ rule: SQL expression evaluated per row, result coerced to the
 * rule-result int encoding. Optional output for engine/folder runners. */
final case class Rule(id: Id, sql: String, output: Option[OutputExpression] = None)

final case class RuleSet(id: Id, rules: Seq[Rule])

/** A SQL lambda stored as data, e.g. `LambdaFunction("plus", "(a, b) -> a + b", Id(1,1))`. */
final case class LambdaFunction(name: String, sql: String, id: Id)

final case class RuleSuite(
    id: Id,
    ruleSets: Seq[RuleSet],
    lambdaFunctions: Seq[LambdaFunction] = Seq.empty,
    probablePass: Double = 0.8) {
  def withProbablePass(p: Double): RuleSuite = copy(probablePass = p)
  def rules: Seq[(Id, Rule)] =
    ruleSets.flatMap(rs => rs.rules.map(rs.id -> _))
}
