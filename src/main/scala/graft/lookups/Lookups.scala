package graft.lookups

import graft.bloom.{BigBloomAggregate, Bloom, BloomAggregate}
import graft.functions.ValueBytes
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import org.apache.parquet.column.values.bloomfilter.BlockSplitBloomFilter
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * In-memory lookups (reference: impl/mapLookup and impl/bloom/
 * BloomFilterLookupImports — docs/advanced/mapFunctions.md, blooms.md):
 * broadcast maps / bloom filters consulted per row with zero joins.
 * At 100 TB these replace shuffling a dimension join for small reference
 * data; for big reference data use a real (broadcast) join instead.
 */
object Lookups {

  final case class MapLookup(
      data: Broadcast[Map[Any, Any]], keyType: DataType, valueType: DataType) {
    // struct/array/map keys arrive as UnsafeRow at eval time but were stored
    // as GenericInternalRow — equality fails across representations, so
    // complex keys are canonicalized to their type-stable byte serialization
    private[lookups] val complexKey: Boolean = keyType match {
      case _: StructType | _: ArrayType | _: MapType => true
      case _ => false
    }
    private[lookups] def canonical(k: Any): Any =
      if (!complexKey || k == null) k
      else {
        val buf = new java.io.ByteArrayOutputStream(32)
        ValueBytes.append(buf, k, keyType)
        // ArraySeq: serializable (broadcast) with structural equals/hashCode
        scala.collection.immutable.ArraySeq.unsafeWrapArray(buf.toByteArray)
      }
  }

  final case class BloomEntry(buckets: Broadcast[Array[Array[Byte]]], fpp: Double)

  private val maps = new java.util.concurrent.ConcurrentHashMap[String, MapLookup]()
  private val blooms = new java.util.concurrent.ConcurrentHashMap[String, BloomEntry]()

  /** mapLookupsFromDFs: name → (df, keyExpr, valueExpr); collects each to a
   * broadcast catalyst-value map (reference mapLookupsFromDFs). */
  def registerMapLookups(
      spark: SparkSession,
      creators: Map[String, () => (DataFrame, Column, Column)]): Unit =
    creators.foreach { case (name, mk) =>
      val (df, k, v) = mk()
      val pair = df.select(k.as("k"), v.as("v"))
      val schema = pair.schema
      val kConv = CatalystTypeConverters.createToCatalystConverter(schema(0).dataType)
      val vConv = CatalystTypeConverters.createToCatalystConverter(schema(1).dataType)
      val proto = MapLookup(null, schema(0).dataType, schema(1).dataType)
      val data = pair.collect()
        .map(r => proto.canonical(kConv(r.get(0))) -> vConv(r.get(1))).toMap
      maps.put(name, proto.copy(data = spark.sparkContext.broadcast(data)))
    }

  final case class MapConfig(
      name: String, token: Option[String], filter: Option[String],
      sql: Option[String], key: String, value: String)

  /** Config-table-driven map loading (reference loadMapConfigs): columns
   * name/token/filter/sql/key/value; token resolves through the loader,
   * sql runs against the session (views included). Returns configs plus the
   * names that had neither token nor sql. */
  def loadMapConfigs(
      df: DataFrame,
      name: Column, token: Column, filter: Column, sqlCol: Column,
      key: Column, value: Column): (Seq[MapConfig], Set[String]) = {
    val rows = df.select(name, token, filter, sqlCol, key, value).collect().map { r =>
      MapConfig(r.getString(0), Option(r.getString(1)), Option(r.getString(2)),
        Option(r.getString(3)), r.getString(4), r.getString(5))
    }.toSeq
    val bad = rows.filter(c => c.token.isEmpty && c.sql.isEmpty).map(_.name).toSet
    (rows.filterNot(c => bad(c.name)), bad)
  }

  /** Materialize + register each config as a broadcast map. */
  def loadMaps(
      spark: SparkSession,
      configs: Seq[MapConfig],
      loader: graft.rules.ViewLoader.DataFrameLoader = null): Unit =
    registerMapLookups(spark, configs.map { c =>
      c.name -> (() => {
        val base = (c.token, c.sql) match {
          case (Some(t), _) =>
            require(loader != null, s"map '${c.name}' needs a DataFrameLoader for token $t")
            c.filter.map(loader.load(t).where).getOrElse(loader.load(t))
          case (None, Some(s)) => spark.sql(s)
          case _ => throw new IllegalArgumentException(s"map '${c.name}' has neither token nor sql")
        }
        (base, org.apache.spark.sql.functions.expr(c.key), org.apache.spark.sql.functions.expr(c.value))
      })
    }.toMap)

  def mapLookup(name: String): MapLookup = {
    val m = maps.get(name)
    require(m != null, s"map lookup '$name' is not registered - call registerMapLookups first")
    m
  }

  /** registerBloomMapAndFunction equivalent: name → (bloom buckets, fpp). */
  def registerBloom(spark: SparkSession, name: String, buckets: Array[Array[Byte]], fpp: Double): Unit =
    blooms.put(name, BloomEntry(spark.sparkContext.broadcast(buckets), fpp))

  /** Build + register a bloom from a dataframe column in one pass. */
  def registerBloomFrom(spark: SparkSession, name: String, df: DataFrame, col: Column,
      expected: Long, fpp: Double): Unit = {
    import org.apache.spark.sql.graft.Bridge
    val agg = Bridge.column(
      BloomAggregate(Bridge.expression(col), expected, fpp).toAggregateExpression())
    val bytes = df.select(agg.as("b")).collect()(0).getAs[Array[Byte]](0)
    registerBloom(spark, name, Array(bytes), fpp)
  }

  /** Build + register a BUCKETED bloom (array-of-filters capacity scaling,
   * reference big_bloom): one distributed aggregation pass. */
  def registerBigBloomFrom(spark: SparkSession, name: String, df: DataFrame, col: Column,
      expected: Long, fpp: Double): Unit = {
    import org.apache.spark.sql.graft.Bridge
    val agg = Bridge.column(
      BigBloomAggregate(Bridge.expression(col), expected, fpp).toAggregateExpression())
    val buckets = df.select(agg.as("b")).collect()(0)
      .getSeq[Array[Byte]](0).toArray
    registerBloom(spark, name, buckets, fpp)
  }

  def bloom(name: String): BloomEntry = {
    val b = blooms.get(name)
    require(b != null, s"bloom '$name' is not registered - call registerBloom first")
    b
  }

  def isBloomRegistered(name: String): Boolean = blooms.containsKey(name)

  /** Remove a registered bloom and free its broadcast — the counterpart to
   * [[registerBloom]] for long-lived sessions that register many filters
   * (e.g. repeated decontamination screens). Callers must have consumed
   * every frame that probes the name; a later probe fails loudly with the
   * usual not-registered error. */
  def unregisterBloom(name: String): Unit = {
    val e = blooms.remove(name)
    if (e != null) e.buckets.destroy()
  }

  private[graft] def clear(): Unit = { maps.clear(); blooms.clear() }
}

/** map_lookup(expr, 'name') — broadcast map get, null when missing. These
 * probe expressions run per row over whole-table scans (they exist to
 * replace dimension joins), so they codegen as one instance call and keep
 * the projection inside whole-stage codegen instead of falling back. */
case class MapLookupExpression(child: Expression, name: String)
    extends UnaryExpression {
  @transient private lazy val lk = Lookups.mapLookup(name)
  override def dataType: DataType = lk.valueType
  override def nullable: Boolean = true
  override def nullSafeEval(k: Any): Any = probe(k)
  /** Codegen entry point. */
  def probe(k: Any): Any = lk.data.value.getOrElse(lk.canonical(k), null)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("graftMapLookup", this, classOf[MapLookupExpression].getName)
    val res = ctx.freshName("graftProbe")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      ${CodeGenerator.javaType(dataType)} ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
      if (!${c.isNull}) {
        Object $res = $ref.probe(${c.value});
        if ($res != null) {
          ${ev.isNull} = false;
          ${ev.value} = (${CodeGenerator.boxedType(dataType)}) $res;
        }
      }""")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** map_contains(expr, 'name'); null keys are simply not contained. */
case class MapContainsExpression(child: Expression, name: String)
    extends UnaryExpression {
  @transient private lazy val lk = Lookups.mapLookup(name)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = containsKey(child.eval(input))
  /** Codegen entry point. */
  def containsKey(k: Any): Boolean = k != null && lk.data.value.contains(lk.canonical(k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("graftMapContains", this, classOf[MapContainsExpression].getName)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.value} = false;
      if (!${c.isNull}) { ${ev.value} = $ref.containsKey(${c.value}); }""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** probability_in(expr, 'name') — 0.0 if definitely absent (null keys
 * included), else the registered filter's confidence (reference
 * probabilityIn). */
case class ProbabilityInExpression(child: Expression, name: String)
    extends UnaryExpression {
  @transient private lazy val entry = Lookups.bloom(name)
  @transient private lazy val filters: Array[BlockSplitBloomFilter] =
    entry.buckets.value.map(new BlockSplitBloomFilter(_))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = probe(child.eval(input))
  /** Codegen entry point. */
  def probe(v: Any): Double = {
    if (v == null) return 0.0
    val h = Bloom.hashOf(v, child.dataType, filters(0))
    val bucket = if (filters.length == 1) 0 else ((h >>> 33) % filters.length).toInt
    // probable hit → confidence = 1 - fpp (reference probabilityIn semantics:
    // "present" yields e.g. 0.99 at fpp=0.01, so probability_in(x,'ids') > 0.9 passes)
    if (filters(bucket).findHash(h)) 1.0 - entry.fpp else 0.0
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("graftProbIn", this, classOf[ProbabilityInExpression].getName)
    ev.copy(code = code"""
      ${c.code}
      double ${ev.value} = 0.0;
      if (!${c.isNull}) { ${ev.value} = $ref.probe(${c.value}); }""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
