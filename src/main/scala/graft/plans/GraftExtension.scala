package graft.plans

import graft.functions.{AsUuidExpr, IdBase64Expression, Registry}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, GetStructField, In, Literal, Or}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Session extension (reference: impl/extension/SparkExtension.scala):
 *   spark.sql.extensions=graft.plans.GraftExtension
 * registers every graft SQL function and injects the asymmetric-filter
 * optimizer rewrites.
 *
 * Rules can be disabled via the `graft_disable_optimiser_rules` system
 * property or environment variable (reference SparkExtension.scala:17):
 * `*` disables all graft rules, otherwise a comma-separated list of rule
 * names — simple (`AsUuidRewrite`) or fully-qualified — is skipped. The
 * kill-switch exists for the day a rewrite misfires in production: one
 * property flip beats a redeploy.
 */
class GraftExtension extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    Registry.functionDescriptions.foreach(ext.injectFunction)
    // StaticHofUnroll runs inside the operator-optimization fixed point,
    // interleaved with SimplifyExtractValueOps/CollapseProject so unrolled
    // constructors fold away
    GraftExtension.activeOptimizerRules.foreach { case (_, r) =>
      ext.injectOptimizerRule(_ => r)
    }
  }
}

object GraftExtension {
  /** Underscores because dots are invalid in environment-variable names and
   * only env / system properties are readable at extension-apply time. */
  val DisableRulesConf = "graft_disable_optimiser_rules"

  def allOptimizerRules: Seq[(String, Rule[LogicalPlan])] = Seq(
    (AsUuidRewrite.getClass.getName.stripSuffix("$"), AsUuidRewrite),
    (IdBase64Rewrite.getClass.getName.stripSuffix("$"), IdBase64Rewrite),
    (StaticHofUnroll.getClass.getName.stripSuffix("$"), StaticHofUnroll))

  /** The rules that survive the `graft_disable_optimiser_rules` filter. */
  def activeOptimizerRules: Seq[(String, Rule[LogicalPlan])] = {
    val conf = sys.props.get(DisableRulesConf)
      .orElse(sys.env.get(DisableRulesConf)).getOrElse("").trim
    if (conf == "*") Seq.empty
    else {
      val disabled = conf.split(",").map(_.trim).filter(_.nonEmpty).toSet
      allOptimizerRules.filterNot { case (name, _) =>
        disabled.contains(name) || disabled.contains(name.split('.').last)
      }
    }
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
/** Shared traversal for the asymmetric-filter rewrites: a decomposed
 * equality returns FALSE where the original returned NULL (null id parts
 * short-circuit a multi-column AND), which is indistinguishable inside a
 * Filter/Join condition ONLY along And/Or spines — under Not, IsNull,
 * CASE WHEN etc. the difference is observable, so those subtrees are left
 * untouched. */
private[plans] trait MonotoneConditionRewrite {
  /** Rewrite one predicate leaf; return it unchanged when not applicable. */
  protected def rewriteLeaf(e: Expression): Expression

  protected final def rewriteMonotone(e: Expression): Expression = e match {
    case And(l, r) => And(rewriteMonotone(l), rewriteMonotone(r))
    case Or(l, r) => Or(rewriteMonotone(l), rewriteMonotone(r))
    case other => rewriteLeaf(other)
  }

  final def applyToConditions(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, _) => f.copy(condition = rewriteMonotone(cond))
    case j @ Join(_, _, _, Some(cond), _) => j.copy(condition = Some(rewriteMonotone(cond)))
  }
}

object AsUuidRewrite extends Rule[LogicalPlan] with MonotoneConditionRewrite {
  private def longsOf(uuid: String): Option[(Long, Long)] =
    try {
      val u = java.util.UUID.fromString(uuid)
      Some((u.getLeastSignificantBits, u.getMostSignificantBits))
    } catch { case _: IllegalArgumentException => None }

  override protected def rewriteLeaf(e: Expression): Expression = e match {
    case EqualTo(AsUuidExpr(lower, higher), Literal(s: UTF8String, StringType)) =>
      longsOf(s.toString)
        .map { case (l, h) =>
          And(EqualTo(lower, Literal(l, LongType)), EqualTo(higher, Literal(h, LongType)))
        }
        .getOrElse(Literal.FalseLiteral)
    case EqualTo(lit @ Literal(_: UTF8String, StringType), au: AsUuidExpr) =>
      rewriteLeaf(EqualTo(au, lit))
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = applyToConditions(plan)
}

/**
 * id_base64 comparison rewrites (reference: impl/extension/
 * AsymmetricFilterExpressions.scala IDBase64Filter, SparkExtension.scala:61).
 *
 *  - `id_base64(base, i0, i1) = '<literal>'` — decode the base64 literal
 *    once at plan time and compare the underlying int/long columns, so the
 *    predicate reaches the parquet scan (rowgroup pruning) instead of
 *    base64-encoding every row.
 *  - `id_base64(idStruct) = '<literal>'` — same, via GetStructField, which
 *    parquet pushes as nested-column filters.
 *  - `id_base64(a…) = id_base64(b…)` (join keys / filters) — compare the
 *    raw fields; a join keyed this way shuffles and compares longs, never
 *    materializing base64 strings.
 *  - `id_base64(…) IN ('l1','l2',…)` — OR of decoded conjunctions.
 *
 * A literal that fails to decode, or whose payload length disagrees with the
 * id arity, cannot equal any id → folds to FALSE.
 *
 * Rewrites apply only along And/Or spines of Filter/Join conditions (see
 * [[MonotoneConditionRewrite]]): the decomposed form returns FALSE where the
 * original returned NULL on null id parts, which only a negated or
 * null-inspecting context can distinguish.
 */
object IdBase64Rewrite extends Rule[LogicalPlan] with MonotoneConditionRewrite {

  /** The int/long slot expressions an id_base64 call renders, when its input
   * shape is statically known: (base:int, i0..iN:long). */
  private def slots(idb: IdBase64Expression): Option[Seq[Expression]] = idb.children match {
    case Seq(one) => one.dataType match {
      case st: StructType
          if st.fields.nonEmpty && st.fields.head.dataType == IntegerType &&
            st.fields.tail.forall(_.dataType == LongType) =>
        Some(st.fields.indices.map(i => GetStructField(one, i)))
      case _ => None
    }
    case more
        if more.nonEmpty && more.head.dataType == IntegerType &&
          more.tail.forall(_.dataType == LongType) =>
      Some(more)
    case _ => None
  }

  private def litEquals(ss: Seq[Expression], s: UTF8String): Expression = {
    val bytes =
      try java.util.Base64.getUrlDecoder.decode(s.toString)
      catch { case _: IllegalArgumentException => return Literal.FalseLiteral }
    if (bytes.length != 4 + 8 * (ss.length - 1)) return Literal.FalseLiteral
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val eqs = EqualTo(ss.head, Literal(bb.getInt(), IntegerType)) +:
      ss.tail.map(e => EqualTo(e, Literal(bb.getLong(), LongType)))
    eqs.reduce(And)
  }

  override protected def rewriteLeaf(e: Expression): Expression = e match {
    case eq @ EqualTo(idb: IdBase64Expression, Literal(s: UTF8String, StringType)) =>
      slots(idb).map(litEquals(_, s)).getOrElse(eq)
    case eq @ EqualTo(Literal(s: UTF8String, StringType), idb: IdBase64Expression) =>
      slots(idb).map(litEquals(_, s)).getOrElse(eq)
    case eq @ EqualTo(a: IdBase64Expression, b: IdBase64Expression) =>
      (slots(a), slots(b)) match {
        case (Some(sa), Some(sb)) if sa.length == sb.length =>
          sa.lazyZip(sb).map(EqualTo(_, _): Expression).reduce(And)
        case _ => eq
      }
    case in @ In(idb: IdBase64Expression, list)
        if list.nonEmpty && list.forall {
          case Literal(_: UTF8String, StringType) => true
          case _ => false
        } =>
      slots(idb).map { ss =>
        list.map { case Literal(s: UTF8String, StringType) => litEquals(ss, s) }
          .reduce(Or)
      }.getOrElse(in)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = applyToConditions(plan)
}
