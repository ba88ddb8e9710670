package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._

/**
 * The agg_expr aggregation family (reference: impl/aggregates/
 * ExpressionAggregates.scala, docs/advanced/aggregations.md):
 *
 *   agg_expr('DDL', filter, sum_with(sum -> …), results_with((sum,count) -> …))
 *   sugar: inc([x]) / meanF() / return_sum() / map_with(key, entry -> …)
 *
 * Spark-first design: one custom DeclarativeAggregate with buffer
 * (sum: T, count: bigint). User lambda bodies are embedded as *children* with
 * resolved NamedLambdaVariable placeholders standing in for sum/count/entry —
 * the analyzer resolves + type-coerces the bodies in place (they're ordinary
 * child expressions), and at physical planning the placeholders are swapped
 * for buffer attributes. Partial (map-side) aggregation therefore works
 * exactly like any built-in declarative aggregate.
 */
object AggMonoid {
  /** Monoidal zero per type (reference: RuleRegistrationFunctions.defaultZero). */
  def zeroLit(dt: DataType): Literal = dt match {
    case IntegerType => Literal(0, IntegerType)
    case LongType => Literal(0L, LongType)
    case DoubleType => Literal(0.0, DoubleType)
    case FloatType => Literal(0.0f, FloatType)
    case d: DecimalType => Literal(Decimal(0, d.precision, d.scale), d)
    case m: MapType => Literal(
      new ArrayBasedMapData(new GenericArrayData(Array.empty[Any]), new GenericArrayData(Array.empty[Any])), m)
    case other => throw new IllegalArgumentException(
      s"agg_expr has no monoidal zero for type ${other.sql}; use a supported sum type")
  }

  /** Monoidal add per type (reference: defaultAdd) — maps merge recursively. */
  def addExpr(dt: DataType, l: Expression, r: Expression): Expression = dt match {
    case _: MapType => MapMergeExpr(l, r)
    case _: NumericType => Add(l, r)
    case other => throw new IllegalArgumentException(
      s"agg_expr has no monoidal add for type ${other.sql}")
  }

  /** Runtime value adder for map merge (operates on raw catalyst values). */
  private[functions] def valueAdder(dt: DataType): (Any, Any) => Any = dt match {
    case IntegerType => (a, b) => a.asInstanceOf[Int] + b.asInstanceOf[Int]
    case LongType => (a, b) => a.asInstanceOf[Long] + b.asInstanceOf[Long]
    case DoubleType => (a, b) => a.asInstanceOf[Double] + b.asInstanceOf[Double]
    case FloatType => (a, b) => a.asInstanceOf[Float] + b.asInstanceOf[Float]
    case d: DecimalType => (a, b) =>
      a.asInstanceOf[Decimal] + b.asInstanceOf[Decimal]
    case m: MapType =>
      val inner = valueAdder(m.valueType)
      (a, b) => MapMergeExpr.merge(a.asInstanceOf[MapData], b.asInstanceOf[MapData], m, inner)
    case other => throw new IllegalArgumentException(
      s"map_with cannot merge values of type ${other.sql}")
  }
}

/** Merge two maps, value-adding on key collision (recursive for nested maps).
 * Codegen: one static call (the adder closure travels as a reference object),
 * so map_with's aggregate update stays codegen-compatible. */
case class MapMergeExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = left.dataType
  private lazy val mapType = left.dataType.asInstanceOf[MapType]
  private lazy val adder = AggMonoid.valueAdder(mapType.valueType)

  override def nullSafeEval(l: Any, r: Any): Any =
    MapMergeExpr.merge(l.asInstanceOf[MapData], r.asInstanceOf[MapData], mapType, adder)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val mtRef = ctx.addReferenceObj("graftMapType", mapType,
      "org.apache.spark.sql.types.MapType")
    val adderRef = ctx.addReferenceObj("graftAdder", adder, "scala.Function2")
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.MapMergeExpr.merge($l, $r, $mtRef, $adderRef);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object MapMergeExpr {
  def merge(l: MapData, r: MapData, mt: MapType, adder: (Any, Any) => Any): MapData = {
    val keys = scala.collection.mutable.LinkedHashMap.empty[Any, Any]
    val (lk, lv) = (l.keyArray(), l.valueArray())
    var i = 0
    while (i < l.numElements()) {
      keys.put(lk.get(i, mt.keyType), lv.get(i, mt.valueType)); i += 1
    }
    val (rk, rv) = (r.keyArray(), r.valueArray())
    i = 0
    while (i < r.numElements()) {
      val k = rk.get(i, mt.keyType)
      val v = rv.get(i, mt.valueType)
      keys.put(k, keys.get(k).map(adder(_, v)).getOrElse(v))
      i += 1
    }
    new ArrayBasedMapData(
      new GenericArrayData(keys.keys.toArray),
      new GenericArrayData(keys.values.toArray))
  }
}

/** Set/replace one key in a map (used for the map_with update step).
 * Codegen: one static call with explicitly boxed key/value. */
case class MapUpdateExpr(map: Expression, key: Expression, value: Expression)
    extends TernaryExpression {
  override def first: Expression = map
  override def second: Expression = key
  override def third: Expression = value
  override def dataType: DataType = map.dataType
  private lazy val mt = map.dataType.asInstanceOf[MapType]

  override def nullSafeEval(m: Any, k: Any, v: Any): Any =
    MapUpdateExpr.update(m.asInstanceOf[MapData], k, v, mt)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    val mtRef = ctx.addReferenceObj("graftMapType", mt,
      "org.apache.spark.sql.types.MapType")
    def boxed(term: String, dt: DataType): String =
      if (CodeGenerator.isPrimitiveType(dt)) s"((Object) ${CodeGenerator.boxedType(dt)}.valueOf($term))"
      else term
    nullSafeCodeGen(ctx, ev, (m, k, v) =>
      s"${ev.value} = graft.functions.MapUpdateExpr.update($m, " +
        s"${boxed(k, key.dataType)}, ${boxed(v, value.dataType)}, $mtRef);")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(map = f, key = s, value = t)
}

object MapUpdateExpr {
  def update(md: MapData, k: Any, v: Any, mt: MapType): MapData = {
    val n = md.numElements()
    val keys = new Array[Any](n + 1)
    val vals = new Array[Any](n + 1)
    var i = 0
    var found = -1
    val (ka, va) = (md.keyArray(), md.valueArray())
    while (i < n) {
      keys(i) = ka.get(i, mt.keyType)
      vals(i) = va.get(i, mt.valueType)
      if (found < 0 && keys(i) == k) found = i
      i += 1
    }
    if (found >= 0) {
      vals(found) = v
      new ArrayBasedMapData(new GenericArrayData(keys.take(n)), new GenericArrayData(vals.take(n)))
    } else {
      keys(n) = k; vals(n) = v
      new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
    }
  }
}

/**
 * agg_expr(filter, sumBody, resultBody) with placeholder lambda variables.
 * sumVar/countVar are NOT children — they appear *inside* sumBody/resultBody
 * (resolved, so the analyzer leaves them) and are swapped for buffer
 * attributes when update/merge/evaluate expressions are requested at
 * planning time.
 */
case class AggExpr(
    filter: Expression,
    sumBody: Expression,
    resultBody: Expression,
    sumVar: NamedLambdaVariable,
    countVar: NamedLambdaVariable)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(filter, sumBody, resultBody)
  override def nullable: Boolean = true
  override def dataType: DataType = resultBody.dataType

  // the placeholder lambda variables are internal, not real input attributes —
  // hide them from CheckAnalysis' missing-attribute scan
  override def references: AttributeSet =
    super.references.filter(a => a.exprId != sumVar.exprId && a.exprId != countVar.exprId)

  private lazy val sum = AttributeReference("agg_sum", sumVar.dataType, nullable = false)()
  private lazy val count = AttributeReference("agg_count", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(sum, count)

  override lazy val initialValues: Seq[Expression] =
    Seq(AggMonoid.zeroLit(sumVar.dataType), Literal(0L))

  private def swap(e: Expression, s: Expression, c: Expression): Expression = e.transformUp {
    case v: NamedLambdaVariable if v.exprId == sumVar.exprId => s
    case v: NamedLambdaVariable if v.exprId == countVar.exprId => c
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val updated = swap(sumBody, sum, count)
    // analyzer may have widened the body type; bring it back to the buffer type
    val fitted = if (updated.dataType == sum.dataType) updated else Cast(updated, sum.dataType)
    Seq(
      If(filter, fitted, sum),
      If(filter, Add(count, Literal(1L)), count))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    AggMonoid.addExpr(sumVar.dataType, sum.left, sum.right),
    Add(count.left, count.right))

  override lazy val evaluateExpression: Expression = {
    val res = swap(resultBody, sum, count)
    If(EqualTo(count, Literal(0L)), Literal.create(null, res.dataType), res)
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(filter = cs(0), sumBody = cs(1), resultBody = cs(2))
}

object AggExprBuilder {
  import graft.rules.Lambdas
  import org.apache.spark.sql.graft.AggLambdaMarker

  private def parseDdl(s: String): DataType = DataType.fromDDL(s)

  private def litStr(e: Expression): Option[String] = e match {
    case Literal(s, StringType) if s != null => Some(s.toString)
    case _ => None
  }

  /** Extract a lambda from a call argument: either an inline arrow lambda or
   * an already-built marker. */
  private def lambdaOf(e: Expression, kind: String): AggLambdaMarker = e match {
    case m: AggLambdaMarker => m
    case lf: LambdaFunction => AggLambdaMarker(kind, lf, None)
    case other => throw new IllegalArgumentException(
      s"expected a $kind lambda, got $other")
  }

  private def paramsOf(m: AggLambdaMarker): Seq[String] = m.lambda match {
    case LambdaFunction(_, args, _) => args.map(_.name)
  }

  private def bodyOf(m: AggLambdaMarker): Expression = m.lambda match {
    case LambdaFunction(body, _, _) => body
  }

  private def mk(params: Seq[String], body: Expression): LambdaFunction =
    LambdaFunction(body, params.map(p => UnresolvedNamedLambdaVariable(Seq(p))))

  /** Arrow-syntax bodies wrap ALL references as lambda variables; once the
   * marker params are bound, whatever remains is a real column reference —
   * convert it so the analyzer resolves it (ResolveLambdaVariables prunes
   * subtrees without LambdaFunction nodes and would never reach these). */
  private def attrify(e: Expression): Expression = e.transformUp {
    case UnresolvedNamedLambdaVariable(parts) =>
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(parts)
  }

  def sumWith(args: Seq[Expression]): Expression = args match {
    case Seq(l) => lambdaOf(l, "sum_with")
    case Seq(t, l) if litStr(t).isDefined =>
      lambdaOf(l, "sum_with").copy(declaredType = Some(parseDdl(litStr(t).get)))
    case _ => throw new IllegalArgumentException("sum_with([ddl,] lambda)")
  }

  def resultsWith(args: Seq[Expression]): Expression = args match {
    case Seq(l) => lambdaOf(l, "results_with")
    case Seq(t, l) if litStr(t).isDefined =>
      lambdaOf(l, "results_with").copy(declaredType = Some(parseDdl(litStr(t).get)))
    case _ => throw new IllegalArgumentException("results_with([ddl,] lambda)")
  }

  def mapWith(args: Seq[Expression]): Expression = args match {
    case Seq(k, l) =>
      lambdaOf(l, "map_with").copy(keyExpr = Some(k))
    case Seq(t, k, l) if litStr(t).isDefined =>
      lambdaOf(l, "map_with").copy(declaredType = Some(parseDdl(litStr(t).get)), keyExpr = Some(k))
    case _ => throw new IllegalArgumentException("map_with([ddl,] keyExpr, lambda)")
  }

  def inc(args: Seq[Expression]): Expression = args match {
    case Seq() => AggLambdaMarker("sum_with", mk(Seq("s"), Add(attr("s"), Literal(1L))), None)
    case Seq(e) => AggLambdaMarker("sum_with", mk(Seq("s"), Add(attr("s"), e)), None)
    case _ => throw new IllegalArgumentException("inc([expr])")
  }

  def meanF(args: Seq[Expression]): Expression =
    AggLambdaMarker("results_with", mk(Seq("s", "c"), Divide(attr("s"), attr("c"))), None)

  def returnSum(args: Seq[Expression]): Expression =
    AggLambdaMarker("results_with", mk(Seq("s", "c"), attr("s")), None)

  private def attr(n: String) =
    org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(n))

  /** agg_expr(['ddl',] filter, sumLambda, resultLambda) */
  def aggExpr(args: Seq[Expression]): Expression = {
    val (declared, filter, sumArg, resArg) = args match {
      case Seq(f, s, r) => (None, f, s, r)
      case Seq(t, f, s, r) if litStr(t).isDefined =>
        (Some(parseDdl(litStr(t).get)), f, s, r)
      case _ => throw new IllegalArgumentException(
        "agg_expr(['ddl',] filter, sum_with(...), results_with(...))")
    }
    val sumM = lambdaOf(sumArg, "sum_with")
    val resM = lambdaOf(resArg, "results_with")

    val sumType: DataType = declared
      .orElse(sumM.declaredType)
      .getOrElse(if (sumM.kind == "map_with") MapType(LongType, LongType) else LongType)

    val sumVar = NamedLambdaVariable("graft_agg_sum", sumType, nullable = false)
    val countVar = NamedLambdaVariable("graft_agg_count", LongType, nullable = false)

    val sumBody: Expression = sumM.kind match {
      case "map_with" =>
        val mt = sumType match {
          case m: MapType => m
          case o => throw new IllegalArgumentException(
            s"map_with requires a MAP sum type, got ${o.sql}")
        }
        val key = sumM.keyExpr.get
        val entryVar = NamedLambdaVariable("graft_agg_entry", mt.valueType, nullable = false)
        val current = Coalesce(Seq(
          org.apache.spark.sql.catalyst.expressions.GetMapValue(sumVar, key),
          AggMonoid.zeroLit(mt.valueType)))
        val valueBody = Lambdas.bindParams(bodyOf(sumM), paramsOf(sumM).map(_ -> (entryVar: Expression)).toMap)
          .transformUp { case v: NamedLambdaVariable if v.exprId == entryVar.exprId => current }
        MapUpdateExpr(sumVar, key, valueBody)
      case "sum_with" =>
        Lambdas.bindParams(bodyOf(sumM), Map(paramsOf(sumM).head -> (sumVar: Expression)))
      case other => throw new IllegalArgumentException(s"unexpected sum lambda kind $other")
    }

    val resBody: Expression = {
      require(resM.kind == "results_with", s"expected results_with, got ${resM.kind}")
      val m: Map[String, Expression] = paramsOf(resM) match {
        case Seq(s) => Map(s -> sumVar)
        case Seq(s, c) => Map(s -> sumVar, c -> countVar)
        case _ => throw new IllegalArgumentException("results_with lambda takes (sum[, count])")
      }
      Lambdas.bindParams(bodyOf(resM), m)
    }

    AggExpr(filter, sumBody, resBody, sumVar, countVar).toAggregateExpression()
  }
}
