package graft.plans

import graft.functions.{AsUuidExpr, Registry, UuidUtils}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Session extension (reference: impl/extension/SparkExtension.scala):
 *   spark.sql.extensions=graft.plans.GraftExtension
 * registers every graft SQL function and injects the asymmetric-filter
 * optimizer rewrites.
 */
class GraftExtension extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    Registry.functionDescriptions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => AsUuidRewrite)
    // runs inside the operator-optimization fixed point, interleaved with
    // SimplifyExtractValueOps/CollapseProject so unrolled constructors fold away
    ext.injectOptimizerRule(_ => StaticHofUnroll)
  }
}

/**
 * as_uuid(lower, higher) = '<uuid literal>'  ⇢  lower = L AND higher = H
 * (reference: impl/extension/AsymmetricFilterExpressions.scala AsUUIDFilter).
 *
 * The rewritten predicate compares the underlying long columns directly, so
 * it reaches the parquet scan as two pushable equality filters instead of a
 * string-building expression evaluated per row — the difference between a
 * full scan and rowgroup pruning at 100 TB.
 */
object AsUuidRewrite extends Rule[LogicalPlan] {
  private def longsOf(uuid: String): Option[(Long, Long)] =
    try {
      val u = java.util.UUID.fromString(uuid)
      Some((u.getLeastSignificantBits, u.getMostSignificantBits))
    } catch { case _: IllegalArgumentException => None }

  private def rewrite(e: Expression): Expression = e.transformUp {
    case EqualTo(AsUuidExpr(lower, higher), Literal(s: UTF8String, StringType)) =>
      longsOf(s.toString)
        .map { case (l, h) =>
          And(EqualTo(lower, Literal(l, LongType)), EqualTo(higher, Literal(h, LongType)))
        }
        .getOrElse(Literal.FalseLiteral)
    case EqualTo(lit @ Literal(_: UTF8String, StringType), au: AsUuidExpr) =>
      rewrite(EqualTo(au, lit))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, _) => f.copy(condition = rewrite(cond))
  }
}
