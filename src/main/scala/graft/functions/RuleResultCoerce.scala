package graft.functions

import graft.rules.RuleResults._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Runtime coercion of an arbitrary rule-expression output to the
 * rule-result int encoding. Semantics mirror the reference's
 * anyToRuleResultInt (impl/RuleImpl.scala:147-159):
 *  - boolean: true→Passed(100000), false→Failed(0)
 *  - exact 0/1/-1/-2 (any numeric width): Failed/Passed/SoftFailed/Disabled
 *  - other fractional values d: (d * 100000).toInt — probability encoding
 *  - strings: "passed"/"true"/… → Passed, "failed"/… → Failed,
 *    "softfail"/"maybe" → SoftFailed, "disabled…" → DisabledRule
 *  - null / anything else → Failed
 */
object RuleResultCoercion {
  def toInt(any: Any): Int = any match {
    case b: Boolean            => if (b) PassedInt else FailedInt
    case i: Int                => intToken(i.toLong)
    case l: Long               => intToken(l)
    case s: Short              => intToken(s.toLong)
    case b: Byte               => intToken(b.toLong)
    case d: Double             => fracToken(d)
    case f: Float              => fracToken(f.toDouble)
    case d: Decimal            => fracToken(d.toDouble)
    case d: java.math.BigDecimal => fracToken(d.doubleValue)
    case u: UTF8String         => stringToken(u.toString)
    case s: String             => stringToken(s)
    case _                     => FailedInt // includes null
  }

  def intToken(l: Long): Int = l match {
    case 0L  => FailedInt
    case 1L  => PassedInt
    case -1L => SoftFailedInt
    case -2L => DisabledRuleInt
    case _   => FailedInt
  }

  def fracToken(d: Double): Int = d match {
    case 0.0  => FailedInt
    case 1.0  => PassedInt
    case -1.0 => SoftFailedInt
    case -2.0 => DisabledRuleInt
    case _    => (d * PassedInt).toInt
  }

  def stringToken(s: String): Int = s.toLowerCase match {
    case "true" | "passed" | "pass" | "yes" | "1" | "1.0"  => PassedInt
    case "false" | "failed" | "fail" | "no" | "0" | "0.0"  => FailedInt
    case "softfail" | "maybe"                              => SoftFailedInt
    case "disabledrule" | "disabled"                       => DisabledRuleInt
    case _                                                 => FailedInt
  }
}

/**
 * Codegen'd coercion wrapper placed around every parsed rule expression.
 * Fast inline paths for boolean/numeric children keep rule evaluation inside
 * whole-stage codegen with no boxing; exotic types fall back to one static
 * call.
 */
case class RuleResultCoerce(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    RuleResultCoercion.toInt(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val obj = "graft.functions.RuleResultCoercion"
    val compute = child.dataType match {
      case BooleanType =>
        s"${ev.value} = ${c.value} ? $PassedInt : $FailedInt;"
      case ByteType | ShortType | IntegerType | LongType =>
        s"${ev.value} = $obj.intToken((long) ${c.value});"
      case FloatType | DoubleType =>
        s"${ev.value} = $obj.fracToken((double) ${c.value});"
      case _ =>
        s"${ev.value} = $obj.toInt(${c.value});"
    }
    ev.copy(
      code = code"""
        ${c.code}
        int ${ev.value} = $FailedInt;
        if (!${c.isNull}) { $compute }
        """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
