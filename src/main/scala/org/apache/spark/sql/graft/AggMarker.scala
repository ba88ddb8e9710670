package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, HigherOrderFunction, LambdaFunction}
import org.apache.spark.sql.types.{AbstractDataType, AnyDataType, DataType, NullType}

/**
 * Parse/analysis-time carrier for graft's agg_expr lambda arguments
 * (sum_with / results_with / map_with). It must be a HigherOrderFunction so
 * the analyzer's NON_HIGHER_ORDER_FUNCTION check accepts lambda-valued
 * arguments when rules arrive via spark.sql; the enclosing agg_expr builder
 * consumes it in the same resolution pass, so it never survives to planning.
 * Lives under org.apache.spark.sql because HigherOrderFunction's members
 * reference private[sql] types.
 */
case class AggLambdaMarker(
    kind: String,                      // sum_with | results_with | map_with
    lambda: Expression,                // a Catalyst LambdaFunction
    declaredType: Option[DataType],
    keyExpr: Option[Expression] = None) // map_with grouping key
    extends Expression with HigherOrderFunction {

  override def arguments: Seq[Expression] = keyExpr.toSeq
  override def argumentTypes: Seq[AbstractDataType] = keyExpr.toSeq.map(_ => AnyDataType)
  override def functions: Seq[Expression] = Seq(lambda)
  override def functionTypes: Seq[AbstractDataType] = Seq(AnyDataType)
  override def children: Seq[Expression] = keyExpr.toSeq :+ lambda
  override def dataType: DataType = NullType
  // claims resolved so the ENCLOSING agg_expr's UnresolvedFunction resolves
  // (its builder consumes this marker); the lambda inside stays unbound by
  // design — misuse outside agg_expr fails with the eval message below
  override lazy val resolved: Boolean = true

  // binding is deferred: agg_expr swaps the lambda's variables for its own
  // buffer placeholders before any evaluation can happen
  override def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): HigherOrderFunction = this

  override def eval(input: InternalRow): Any =
    throw new UnsupportedOperationException(
      s"$kind(...) can only be used inside agg_expr(...)")
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    throw new UnsupportedOperationException(
      s"$kind(...) can only be used inside agg_expr(...)")

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    if (keyExpr.isDefined) copy(keyExpr = Some(cs(0)), lambda = cs(1))
    else copy(lambda = cs(0))
}
