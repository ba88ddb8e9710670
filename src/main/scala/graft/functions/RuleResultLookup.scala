package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{Block, CodeGenerator, CodegenContext, EmptyBlock, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types._

/**
 * rule_result(results, packedSuiteId, packedSetId, packedRuleId)
 * (reference: impl/RuleResultExpression.scala + docs/sqlfunctions.md):
 * navigates BOTH result shapes —
 *  - ruleRunner DQ: map<long, struct<overallResult, ruleResults: map<long,int>>> → int
 *  - expressionRunner: map<long, map<long, T>> → T
 * Null when any id misses or the suite id doesn't match.
 *
 * Extraction over a freshly-built struct constant-folds away entirely
 * (StaticHofUnroll); this expression executes for real only against
 * PERSISTED results, where it runs per row over whole tables — so it
 * codegens as one instance call instead of a CodegenFallback.
 */
case class RuleResultLookup(
    results: Expression, suiteId: Expression, setId: Expression, ruleId: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(results, suiteId, setId, ruleId)
  override def nullable: Boolean = true

  private lazy val setsMap: MapType = results.dataType match {
    case StructType(fields) =>
      fields.find(_.name == "ruleSetResults").map(_.dataType) match {
        case Some(m: MapType) => m
        case _ => throw new IllegalArgumentException(
          s"rule_result expects a runner result struct, got ${results.dataType.sql}")
      }
    case other => throw new IllegalArgumentException(
      s"rule_result expects a runner result struct, got ${other.sql}")
  }

  /** DQ shape: set value is struct(overallResult, ruleResults: map); the
   * expression-runner shape nests maps directly. */
  private lazy val dqShape: Boolean = setsMap.valueType.isInstanceOf[StructType]

  private lazy val rulesMap: MapType =
    if (dqShape)
      setsMap.valueType.asInstanceOf[StructType].apply("ruleResults").dataType.asInstanceOf[MapType]
    else setsMap.valueType.asInstanceOf[MapType]

  override def dataType: DataType = rulesMap.valueType

  private lazy val idOrdinal: Int =
    results.dataType.asInstanceOf[StructType].fieldIndex("id")
  private lazy val setsOrdinal: Int =
    results.dataType.asInstanceOf[StructType].fieldIndex("ruleSetResults")
  private lazy val ruleResultsOrdinal: Int =
    if (dqShape) setsMap.valueType.asInstanceOf[StructType].fieldIndex("ruleResults") else -1

  private def mapGet(m: MapData, key: Long, valueType: DataType): Any = {
    val keys = m.keyArray()
    var i = 0
    while (i < m.numElements()) {
      if (keys.getLong(i) == key)
        return if (m.valueArray().isNullAt(i)) null else m.valueArray().get(i, valueType)
      i += 1
    }
    null
  }

  /** Codegen entry point: all inputs already evaluated and non-null. */
  def lookup(row: InternalRow, s: Long, set: Long, r: Long): Any = {
    if (row.getLong(idOrdinal) != s) return null
    val sets = row.getMap(setsOrdinal)
    val setVal = mapGet(sets, set, setsMap.valueType)
    if (setVal == null) return null
    val rules =
      if (dqShape) setVal.asInstanceOf[InternalRow].getMap(ruleResultsOrdinal)
      else setVal.asInstanceOf[MapData]
    mapGet(rules, r, rulesMap.valueType)
  }

  override def eval(input: InternalRow): Any = {
    val row = results.eval(input).asInstanceOf[InternalRow]
    val (s, set, r) = (suiteId.eval(input), setId.eval(input), ruleId.eval(input))
    if (row == null || s == null || set == null || r == null) return null
    lookup(row, s.asInstanceOf[Number].longValue,
      set.asInstanceOf[Number].longValue, r.asInstanceOf[Number].longValue)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val ref = ctx.addReferenceObj("graftRuleResult", this, classOf[RuleResultLookup].getName)
    val res = ctx.freshName("graftRr")
    val childCode = gens.map(_.code).foldLeft(EmptyBlock: Block)(_ + _)
    val anyNull = gens.map(_.isNull).mkString(" || ")
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = true;
      ${CodeGenerator.javaType(dataType)} ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
      if (!($anyNull)) {
        Object $res = $ref.lookup(${gens(0).value},
          (long) ${gens(1).value}, (long) ${gens(2).value}, (long) ${gens(3).value});
        if ($res != null) {
          ${ev.isNull} = false;
          ${ev.value} = (${CodeGenerator.boxedType(dataType)}) $res;
        }
      }""")
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(results = cs(0), suiteId = cs(1), setId = cs(2), ruleId = cs(3))
}
