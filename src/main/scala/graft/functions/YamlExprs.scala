package graft.functions

import java.util.{LinkedHashMap => JLinkedMap, ArrayList => JArrayList}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, ArrayBasedMapData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.yaml.snakeyaml.{DumperOptions, Yaml}

/**
 * to_yaml / from_yaml (reference: impl/yaml/Yaml{Encoder,Decoder}Expr.scala)
 * via snakeyaml (ships in /opt/spark/jars). Catalyst values round-trip
 * through plain Java structures; structs become ordered maps keyed by field
 * name.
 */
object YamlConv {
  def toJava(v: Any, dt: DataType): Any = v match {
    case null => null
    case _ => dt match {
      case StringType => v.asInstanceOf[UTF8String].toString
      case BinaryType => java.util.Base64.getEncoder.encodeToString(v.asInstanceOf[Array[Byte]])
      case d: DecimalType => v.asInstanceOf[Decimal].toJavaBigDecimal
      case DateType => java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString
      case TimestampType => java.time.Instant.ofEpochSecond(
        v.asInstanceOf[Long] / 1000000L, (v.asInstanceOf[Long] % 1000000L) * 1000L).toString
      case s: StructType =>
        val row = v.asInstanceOf[InternalRow]
        val m = new JLinkedMap[String, Any]()
        s.fields.zipWithIndex.foreach { case (f, i) =>
          m.put(f.name, toJava(if (row.isNullAt(i)) null else row.get(i, f.dataType), f.dataType))
        }
        m
      case a: ArrayType =>
        val arr = v.asInstanceOf[ArrayData]
        val out = new JArrayList[Any](arr.numElements())
        var i = 0
        while (i < arr.numElements()) {
          out.add(toJava(if (arr.isNullAt(i)) null else arr.get(i, a.elementType), a.elementType))
          i += 1
        }
        out
      case m: MapType =>
        val md = v.asInstanceOf[MapData]
        val out = new JLinkedMap[Any, Any]()
        var i = 0
        while (i < md.numElements()) {
          out.put(
            toJava(md.keyArray().get(i, m.keyType), m.keyType),
            toJava(if (md.valueArray().isNullAt(i)) null else md.valueArray().get(i, m.valueType), m.valueType))
          i += 1
        }
        out
      case _ => v // primitives pass through
    }
  }

  def toCatalyst(v: Any, dt: DataType): Any = {
    if (v == null) return null
    dt match {
      case StringType => UTF8String.fromString(v.toString)
      case BinaryType => java.util.Base64.getDecoder.decode(v.toString)
      case BooleanType => v.asInstanceOf[Boolean]
      case ByteType => num(v).byteValue()
      case ShortType => num(v).shortValue()
      case IntegerType => num(v).intValue()
      case LongType => num(v).longValue()
      case FloatType => num(v).floatValue()
      case DoubleType => num(v).doubleValue()
      case d: DecimalType => Decimal(new java.math.BigDecimal(v.toString), d.precision, d.scale)
      case DateType => java.time.LocalDate.parse(v.toString).toEpochDay.toInt
      case TimestampType =>
        val inst = java.time.Instant.parse(v.toString)
        inst.getEpochSecond * 1000000L + inst.getNano / 1000L
      case s: StructType =>
        val m = v.asInstanceOf[java.util.Map[String, Any]]
        InternalRow.fromSeq(s.fields.toSeq.map(f => toCatalyst(m.get(f.name), f.dataType)))
      case a: ArrayType =>
        val l = v.asInstanceOf[java.util.List[Any]]
        new GenericArrayData((0 until l.size()).map(i => toCatalyst(l.get(i), a.elementType)))
      case m: MapType =>
        val jm = v.asInstanceOf[java.util.Map[Any, Any]]
        val keys = new Array[Any](jm.size())
        val vals = new Array[Any](jm.size())
        var i = 0
        jm.forEach { (k, vv) => keys(i) = toCatalyst(k, m.keyType); vals(i) = toCatalyst(vv, m.valueType); i += 1 }
        new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
      case other => throw new IllegalArgumentException(s"from_yaml: unsupported type ${other.sql}")
    }
  }

  private def num(v: Any): Number = v match {
    case n: Number => n
    case s => new java.math.BigDecimal(s.toString)
  }
}

/** Representer tagging every scalar with its full Java class
 * (reference impl/yaml/YamlEncoderExpr.scala:43-51 useFullScalarType):
 * `!!java.lang.Long 5` instead of a plain `5`, so consumers outside
 * from_yaml keep exact types/precision. */
private[functions] class FullScalarRepresenter(opts: DumperOptions)
    extends org.yaml.snakeyaml.representer.Representer(opts) {
  import org.yaml.snakeyaml.nodes.{Node, Tag}
  import org.yaml.snakeyaml.representer.Represent
  private val full = new Represent {
    override def representData(data: Object): Node =
      representScalar(new Tag(data.getClass), data.toString)
  }
  Seq[Class[_]](classOf[java.lang.Boolean], classOf[java.lang.Byte], classOf[java.lang.Short],
    classOf[java.lang.Integer], classOf[java.lang.Long], classOf[java.lang.Float],
    classOf[java.lang.Double], classOf[java.math.BigDecimal], classOf[String])
    .foreach(c => this.representers.put(c, full))
}

/** to_yaml(expr[, map('useFullScalarType','true')]) → yaml string. snakeyaml
 * dominates the per-row cost, but the instance-call codegen keeps the
 * surrounding projection fused and the child codegen'd. */
case class YamlEncodeExpression(child: Expression, fullScalarType: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  @transient private lazy val yaml = {
    val opts = new DumperOptions()
    opts.setDefaultFlowStyle(DumperOptions.FlowStyle.BLOCK)
    if (fullScalarType) new Yaml(new FullScalarRepresenter(opts), opts) else new Yaml(opts)
  }
  override def eval(input: InternalRow): Any = encode(child.eval(input))
  /** Codegen entry point; accepts null (yaml renders it). */
  def encode(v: Any): UTF8String =
    UTF8String.fromString(yaml.dump(YamlConv.toJava(v, child.dataType)))
  override def nullable: Boolean = false
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("graftYamlEnc", this, classOf[YamlEncodeExpression].getName)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.unsafe.types.UTF8String ${ev.value} =
        $ref.encode(${c.isNull} ? null : (Object) ${c.value});""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** from_yaml(yamlString, 'ddl') → typed value. */
case class YamlDecodeExpression(child: Expression, ddl: String)
    extends UnaryExpression {
  override lazy val dataType: DataType = DataType.fromDDL(ddl)
  @transient private lazy val yaml = {
    // accept useFullScalarType output: permit global tags ONLY for the safe
    // boxed-scalar classes the encoder emits (snakeyaml 2.x rejects global
    // tags by default; never allow arbitrary class construction)
    val safe = Set("java.lang.Boolean", "java.lang.Byte", "java.lang.Short",
      "java.lang.Integer", "java.lang.Long", "java.lang.Float",
      "java.lang.Double", "java.math.BigDecimal", "java.lang.String")
    val lo = new org.yaml.snakeyaml.LoaderOptions()
    lo.setTagInspector(new org.yaml.snakeyaml.inspector.TagInspector {
      override def isGlobalTagAllowed(tag: org.yaml.snakeyaml.nodes.Tag): Boolean =
        safe.contains(tag.getClassName)
    })
    new Yaml(new org.yaml.snakeyaml.constructor.Constructor(lo))
  }
  override def nullSafeEval(v: Any): Any = decode(v.asInstanceOf[UTF8String])
  /** Codegen entry point. */
  def decode(v: UTF8String): Any =
    YamlConv.toCatalyst(yaml.load[Any](v.toString), dataType)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    val ref = ctx.addReferenceObj("graftYamlDec", this, classOf[YamlDecodeExpression].getName)
    val res = ctx.freshName("graftYaml")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $res = $ref.decode($c);
      if ($res == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (${CodeGenerator.boxedType(dataType)}) $res; }""")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
