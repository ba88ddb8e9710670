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

  /** A registered containment index: xxhash64'd distinct word shingles of
   * each benchmark item (hash → item indexes) plus each item's distinct-
   * shingle count — the broadcast-side of streaming/row-local containment
   * decontamination. Benchmarks are MB-scale by contract, like blooms. */
  final case class ContainmentEntry(
      index: Broadcast[Map[Long, Array[Int]]], sizes: Broadcast[Array[Int]])

  private val containments =
    new java.util.concurrent.ConcurrentHashMap[String, ContainmentEntry]()

  /**
   * Build + register a containment index from a benchmark frame: per
   * item, the distinct `shingleSize`-word shingles hashed with Spark's
   * xxhash64 (so probe-side hashes composed from `shingles` +
   * `xxhash64` agree bit-for-bit). One distributed pass, then a driver
   * collect of hash arrays — the exact [[graft.pipeline.Dedup
   * .containmentJoin]] query-side statistics, held broadcast so a
   * STREAM (or any row-local projection) can compute max containment
   * per document with zero shuffles and zero state: the fuzzy
   * complement of the bloom decontamination gate, which counts shared
   * n-grams but cannot express "≥ 80% of THIS item's shingles".
   * Re-registering a name replaces and frees the old broadcasts.
   */
  def registerContainmentFrom(spark: SparkSession, name: String,
      bench: DataFrame, textCol: Column, shingleSize: Int = 5): Unit = {
    import org.apache.spark.sql.functions.{transform, xxhash64}
    val items: Array[Array[Long]] = bench
      .select(transform(graft.pipeline.Text.shingles(textCol, shingleSize),
        s => xxhash64(s)).as("graft_hs"))
      // a NULL text shingles to NULL: such an item has no shingles and can
      // never gate anything, so skip it instead of NPEing the registration
      // (the probe side already treats null text as containment 0.0)
      .where(org.apache.spark.sql.functions.col("graft_hs").isNotNull)
      .collect().map(_.getSeq[Long](0).toArray)
    val idx = scala.collection.mutable.HashMap.empty[Long, List[Int]]
    items.zipWithIndex.foreach { case (hs, i) =>
      hs.foreach(h => idx(h) = i :: idx.getOrElse(h, Nil))
    }
    val entry = ContainmentEntry(
      spark.sparkContext.broadcast(idx.view.mapValues(_.toArray).toMap),
      spark.sparkContext.broadcast(items.map(_.length)))
    val old = containments.put(name, entry)
    if (old != null) { old.index.destroy(); old.sizes.destroy() }
  }

  private[graft] def containment(name: String): ContainmentEntry = {
    val c = containments.get(name)
    require(c != null,
      s"containment index '$name' is not registered - call registerContainmentFrom first")
    c
  }

  def isContainmentRegistered(name: String): Boolean = containments.containsKey(name)

  /** Free a registered containment index's broadcasts ([[unregisterBloom]]
   * posture: consume every probing frame first). */
  def unregisterContainment(name: String): Unit = {
    val e = containments.remove(name)
    if (e != null) { e.index.destroy(); e.sizes.destroy() }
  }

  /** Max shingle containment of any item of the registered index inside
   * `textCol` (0.0 when nothing matches): row-local, codegen'd, composes
   * the same distinct-shingle + xxhash64 statistics the index stores. */
  def containmentIn(textCol: Column, name: String, shingleSize: Int = 5): Column = {
    import org.apache.spark.sql.functions.{transform, xxhash64}
    import org.apache.spark.sql.graft.Bridge
    val hashes = transform(
      graft.pipeline.Text.shingles(textCol, shingleSize), s => xxhash64(s))
    Bridge.column(ContainmentInExpression(Bridge.expression(hashes), name))
  }

  /** Remove a registered bloom and free its broadcast — the counterpart to
   * [[registerBloom]] for long-lived sessions that register many filters
   * (e.g. repeated decontamination screens). Callers must have consumed
   * every frame that probes the name; a later probe fails loudly with the
   * usual not-registered error. */
  def unregisterBloom(name: String): Unit = {
    val e = blooms.remove(name)
    if (e != null) e.buckets.destroy()
  }

  private[graft] def clear(): Unit = {
    maps.clear(); blooms.clear(); containments.clear()
  }
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

/** containment_in(shingle_hashes, 'name') — MAX shingle containment of any
 * item of the registered benchmark index inside the row's shingle-hash
 * array (0.0 when nothing matches). Replaces the containment JOIN for the
 * broadcast-sized benchmark side, so a stream (or any row-local
 * projection) decontaminates with zero shuffles and zero state; codegens
 * as one instance call like the other probe expressions. Shingle hashes
 * must be distinct per row — compose `shingles(text, k)` (distinct by
 * contract) with `xxhash64`, which [[Lookups.containmentIn]] does. */
case class ContainmentInExpression(child: Expression, name: String)
    extends UnaryExpression {
  @transient private lazy val entry = Lookups.containment(name)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = probe(child.eval(input))
  /** Codegen entry point. */
  def probe(v: Any): Double = {
    if (v == null) return 0.0
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val idx = entry.index.value
    val sizes = entry.sizes.value
    if (sizes.length == 0) return 0.0
    val counts = new Array[Int](sizes.length)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      idx.getOrElse(arr.getLong(i), null) match {
        case null => ()
        case hits =>
          var j = 0
          while (j < hits.length) { counts(hits(j)) += 1; j += 1 }
      }
      i += 1
    }
    var best = 0.0
    i = 0
    while (i < counts.length) {
      if (sizes(i) > 0) {
        val c = counts(i).toDouble / sizes(i)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("graftContainIn", this,
      classOf[ContainmentInExpression].getName)
    ev.copy(code = code"""
      ${c.code}
      double ${ev.value} = 0.0;
      if (!${c.isNull}) { ${ev.value} = $ref.probe(${c.value}); }""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
