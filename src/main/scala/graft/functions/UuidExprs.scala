package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers referenced from generated code. */
object UuidUtils {
  def uuid(lower: Long, higher: Long): UTF8String =
    UTF8String.fromString(new java.util.UUID(higher, lower).toString)

  def toLongs(u: UTF8String): InternalRow = {
    val id = java.util.UUID.fromString(u.toString)
    InternalRow(id.getLeastSignificantBits, id.getMostSignificantBits)
  }

  def bytesToUuid(b: Array[Byte]): UTF8String = {
    require(b.length >= 16, s"rng_uuid needs 16 bytes, got ${b.length}")
    val bb = java.nio.ByteBuffer.wrap(b)
    UTF8String.fromString(new java.util.UUID(bb.getLong, bb.getLong).toString)
  }
}

/** as_uuid(lower, higher) → canonical UUID string
 * (reference: impl/longPair/AsUUID.scala — msb=higher, lsb=lower). */
case class AsUuidExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(lower: Any, higher: Any): Any =
    UuidUtils.uuid(lower.asInstanceOf[Long], higher.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, h) => s"graft.functions.UuidUtils.uuid($l, $h)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** long_pair_from_uuid(uuidString) → struct<lower, higher>. */
case class UuidToLongPairExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("lower", LongType), StructField("higher", LongType)))
  override protected def nullSafeEval(u: Any): Any =
    UuidUtils.toLongs(u.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UuidUtils.toLongs($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** rng_uuid(binary16) → canonical UUID string. */
case class BytesAsUuidExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(b: Any): Any =
    UuidUtils.bytesToUuid(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UuidUtils.bytesToUuid($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
