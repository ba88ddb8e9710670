package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData, TypeUtils}
import org.apache.spark.sql.types._

/**
 * comparable_maps / reverse_comparable_maps (reference: impl/util/
 * ComparableMapConverter.scala, docs/advanced/mapFunctions.md): maps are not
 * comparable/groupable in Spark; rewrite every MapType (recursively, at any
 * nesting depth) into a key-sorted array<struct<key,value>> and back.
 */
object ComparableMaps {
  def convertType(dt: DataType): DataType = dt match {
    case m: MapType => ArrayType(StructType(Seq(
      StructField("key", convertType(m.keyType), nullable = false),
      StructField("value", convertType(m.valueType), m.valueContainsNull))), containsNull = false)
    case s: StructType => StructType(s.fields.map(f => f.copy(dataType = convertType(f.dataType))))
    case a: ArrayType => a.copy(elementType = convertType(a.elementType))
    case other => other
  }

  def reverseType(dt: DataType): DataType = dt match {
    case ArrayType(StructType(Array(k, v)), _) if k.name == "key" && v.name == "value" =>
      MapType(reverseType(k.dataType), reverseType(v.dataType), v.nullable)
    case s: StructType => StructType(s.fields.map(f => f.copy(dataType = reverseType(f.dataType))))
    case a: ArrayType => a.copy(elementType = reverseType(a.elementType))
    case other => other
  }

  def convert(v: Any, dt: DataType): Any = {
    if (v == null) return null
    dt match {
      case m: MapType =>
        val md = v.asInstanceOf[MapData]
        val n = md.numElements()
        val entries = (0 until n).map { i =>
          val k = convert(md.keyArray().get(i, m.keyType), m.keyType)
          val vv = if (md.valueArray().isNullAt(i)) null
            else convert(md.valueArray().get(i, m.valueType), m.valueType)
          (k, vv)
        }
        val ord = TypeUtils.getInterpretedOrdering(convertType(m.keyType))
        new GenericArrayData(entries.sortBy(_._1)(ord.asInstanceOf[Ordering[Any]])
          .map { case (k, vv) => InternalRow(k, vv) })
      case s: StructType =>
        val row = v.asInstanceOf[InternalRow]
        InternalRow.fromSeq(s.fields.toSeq.zipWithIndex.map { case (f, i) =>
          convert(if (row.isNullAt(i)) null else row.get(i, f.dataType), f.dataType)
        })
      case a: ArrayType =>
        val arr = v.asInstanceOf[ArrayData]
        new GenericArrayData((0 until arr.numElements()).map(i =>
          convert(if (arr.isNullAt(i)) null else arr.get(i, a.elementType), a.elementType)))
      case _ => v
    }
  }

  def reverse(v: Any, dt: DataType): Any = {
    if (v == null) return null
    dt match {
      case ArrayType(st @ StructType(Array(k, valF)), _) if k.name == "key" && valF.name == "value" =>
        val arr = v.asInstanceOf[ArrayData]
        val n = arr.numElements()
        val keys = new Array[Any](n)
        val vals = new Array[Any](n)
        (0 until n).foreach { i =>
          val row = arr.get(i, st).asInstanceOf[InternalRow]
          keys(i) = reverse(row.get(0, k.dataType), k.dataType)
          vals(i) = if (row.isNullAt(1)) null else reverse(row.get(1, valF.dataType), valF.dataType)
        }
        new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
      case s: StructType =>
        val row = v.asInstanceOf[InternalRow]
        InternalRow.fromSeq(s.fields.toSeq.zipWithIndex.map { case (f, i) =>
          reverse(if (row.isNullAt(i)) null else row.get(i, f.dataType), f.dataType)
        })
      case a: ArrayType =>
        val arr = v.asInstanceOf[ArrayData]
        new GenericArrayData((0 until arr.numElements()).map(i =>
          reverse(if (arr.isNullAt(i)) null else arr.get(i, a.elementType), a.elementType)))
      case _ => v
    }
  }
}

/** Codegen is one static call against the plan-time source type — the
 * conversion is type-driven recursion, so there is nothing to specialize per
 * row; what matters is staying inside whole-stage codegen rather than
 * breaking the fused projection with a CodegenFallback. */
case class ComparableMapsExpression(child: Expression) extends UnaryExpression {
  override lazy val dataType: DataType = ComparableMaps.convertType(child.dataType)
  override def nullSafeEval(v: Any): Any = ComparableMaps.convert(v, child.dataType)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val dt = ctx.addReferenceObj("cmSrcType", child.dataType,
      "org.apache.spark.sql.types.DataType")
    val javaT = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.javaType(dataType)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ($javaT) graft.functions.ComparableMaps.convert($c, $dt);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class ReverseComparableMapsExpression(child: Expression) extends UnaryExpression {
  override lazy val dataType: DataType = ComparableMaps.reverseType(child.dataType)
  override def nullSafeEval(v: Any): Any = ComparableMaps.reverse(v, child.dataType)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val dt = ctx.addReferenceObj("cmSrcType", child.dataType,
      "org.apache.spark.sql.types.DataType")
    val javaT = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.javaType(dataType)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ($javaT) graft.functions.ComparableMaps.reverse($c, $dt);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
