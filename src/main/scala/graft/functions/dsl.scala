package graft.functions

import graft.rules.RuleResults
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.IntegerType

/**
 * Typed Column DSL mirroring the reference's `com.sparkutils.quality.functions`
 * package — every SQL-registered graft function, usable without SQL strings:
 *
 * {{{
 *   import graft.functions.dsl._
 *   df.select(murmur3_id("id", $"a", $"b"), soft_fail($"x" > 0))
 * }}}
 */
object dsl {
  private def col(e: Expression): Column = Bridge.column(e)
  private def ex(c: Column): Expression = Bridge.expression(c)
  private def call(name: String, args: Column*): Column =
    col(Registry.lookup(name).get(args.map(ex)))
  private def lits(s: String): Expression = Literal(org.apache.spark.unsafe.types.UTF8String.fromString(s),
    org.apache.spark.sql.types.StringType)

  // rule results
  val passed: Column = col(Literal(RuleResults.PassedInt, IntegerType))
  val failed: Column = col(Literal(RuleResults.FailedInt, IntegerType))
  val soft_failed: Column = col(Literal(RuleResults.SoftFailedInt, IntegerType))
  val disabled_rule: Column = col(Literal(RuleResults.DisabledRuleInt, IntegerType))
  def probability(c: Column): Column = call("probability", c)
  def soft_fail(c: Column): Column = Registry.softFail(c)
  def rule_result(dq: Column, suiteId: Column, setId: Column, ruleId: Column): Column =
    graft.rules.RuleRunner.ruleResult(dq, suiteId, setId, ruleId)
  def rule_suite_result_details(dq: Column): Column = graft.rules.RuleRunner.details(dq)
  def flatten_results(dq: Column): Column = graft.rules.RuleRunner.flattenResults(dq)
  def flatten_rule_results(engine: Column): Column = graft.rules.RuleEngine.flattenRuleResults(engine)
  def flatten_folder_results(folder: Column): Column = graft.rules.RuleFolder.flattenFolderResults(folder)
  def strip_result_ddl(er: Column): Column = graft.rules.ExpressionRunner.stripResultDdl(er)

  // packing / uuid / pairs
  def pack_ints(id: Column, version: Column): Column = Registry.packInts(id, version)
  def unpack(packed: Column): Column = Registry.unpackCol(packed)
  def unpack_id_triple(t: Column): Column = Registry.unpackIdTripleCol(t)
  def as_uuid(lower: Column, higher: Column): Column =
    col(AsUuidExpr(ex(lower.cast("long")), ex(higher.cast("long"))))
  def long_pair(lower: Column, higher: Column): Column = Registry.longPair(lower, higher)
  def long_pair_from_uuid(uuid: Column): Column = col(UuidToLongPairExpr(ex(uuid)))
  def rng_uuid(bytes: Column): Column = col(BytesAsUuidExpr(ex(bytes)))
  def long_pair_equal(prefixA: String, prefixB: String): Column =
    col(Registry.lookup("long_pair_equal").get(Seq(lits(prefixA), lits(prefixB))))
  def id_equal(prefixA: String, prefixB: String): Column =
    col(Registry.lookup("id_equal").get(Seq(lits(prefixA), lits(prefixB))))

  // ids + hashing
  def unique_id(prefix: String): Column = col(GuaranteedUniqueIdExpression(prefix))
  def rng_id(prefix: String, seed: Long = 0L): Column = col(RngIdExpression(prefix, seed))
  def provided_id(prefix: String, payload: Column): Column =
    col(LongsIdExpression(prefix, IdModel.ProvidedHeader, ex(payload)))
  def murmur3_id(prefix: String, cols: Column*): Column =
    col(LongsIdExpression(prefix, IdModel.FieldBasedHeader, Murmur128Expression(cols.map(ex))))
  def field_based_id(prefix: String, algo: String, cols: Column*): Column =
    col(LongsIdExpression(prefix, IdModel.FieldBasedHeader,
      DigestToLongsExpression(cols.map(ex), algo, asStruct = true)))
  def digest_to_longs(algo: String, cols: Column*): Column =
    col(DigestToLongsExpression(cols.map(ex), algo, asStruct = false))
  def digest_to_longs_struct(algo: String, cols: Column*): Column =
    col(DigestToLongsExpression(cols.map(ex), algo, asStruct = true))
  def hash_with(algo: String, cols: Column*): Column = col(Murmur128Expression(cols.map(ex)))
  def za_hash_with(algo: String, cols: Column*): Column =
    col(new org.apache.spark.sql.catalyst.expressions.XxHash64(cols.map(ex), 42L))
  def id_size(id: Column): Column = col(IdSizeExpression(ex(id)))
  def id_base64(cols: Column*): Column = col(IdBase64Expression(cols.map(ex)))
  def id_from_base64(s: Column, nLongs: Int = 2): Column = col(IdFromBase64Expression(ex(s), nLongs))
  def id_raw_type(id: Column): Column = col(IdRawTypeExpression(ex(id)))
  def rng(seed: Long = 0L): Column = col(RandomLongsExpression(seed))
  def rng_bytes(numBytes: Int = 16, seed: Long = 0L): Column = col(RandomBytesExpression(numBytes, seed))

  // lookups + blooms
  def map_lookup(key: Column, mapName: String): Column =
    col(graft.lookups.MapLookupExpression(ex(key), mapName))
  def map_contains(key: Column, mapName: String): Column =
    col(graft.lookups.MapContainsExpression(ex(key), mapName))
  def probability_in(key: Column, bloomName: String): Column =
    col(graft.lookups.ProbabilityInExpression(ex(key), bloomName))
  def small_bloom(c: Column, expected: Long, fpp: Double): Column =
    col(graft.bloom.BloomAggregate(ex(c), expected, fpp).toAggregateExpression())
  def big_bloom(c: Column, expected: Long, fpp: Double): Column =
    col(graft.bloom.BigBloomAggregate(ex(c), expected, fpp).toAggregateExpression())

  // aggregate family — typed variants of the SQL agg_expr surface:
  //   df.select(agg_expr("BIGINT", $"v" > 0, sum_with(s => s + $"v"), return_sum))
  private def lamVar(n: String) =
    org.apache.spark.sql.catalyst.expressions.UnresolvedNamedLambdaVariable(Seq(n))
  private def marker(kind: String, params: Seq[String], body: Column,
      key: Option[Column] = None): Column =
    col(org.apache.spark.sql.graft.AggLambdaMarker(kind,
      org.apache.spark.sql.catalyst.expressions.LambdaFunction(
        ex(body), params.map(lamVar)),
      None, key.map(ex)))

  def sum_with(f: Column => Column): Column =
    marker("sum_with", Seq("graft_s"), f(col(lamVar("graft_s"))))
  def results_with(f: (Column, Column) => Column): Column =
    marker("results_with", Seq("graft_s", "graft_c"),
      f(col(lamVar("graft_s")), col(lamVar("graft_c"))))
  def map_with(key: Column, f: Column => Column): Column =
    marker("map_with", Seq("graft_e"), f(col(lamVar("graft_e"))), Some(key))
  def inc(): Column = col(AggExprBuilder.inc(Nil))
  def inc(c: Column): Column = col(AggExprBuilder.inc(Seq(ex(c))))
  def meanF: Column = col(AggExprBuilder.meanF(Nil))
  def return_sum: Column = col(AggExprBuilder.returnSum(Nil))
  def agg_expr(ddl: String, filter: Column, sum: Column, result: Column): Column =
    col(AggExprBuilder.aggExpr(Seq(lits(ddl), ex(filter), ex(sum), ex(result))))
  def agg_expr(filter: Column, sum: Column, result: Column): Column =
    col(AggExprBuilder.aggExpr(Seq(ex(filter), ex(sum), ex(result))))

  // structs, maps, yaml
  def update_field(struct: Column, pairs: (String, Column)*): Column =
    Registry.updateField(struct, pairs)
  def drop_field(struct: Column, paths: String*): Column = Registry.dropField(struct, paths)
  def top_k_by(ord: Column, item: Column, k: Int): Column =
    col(TopKAggregate(ex(ord.cast("double")), ex(item), k).toAggregateExpression())
  def log_histogram(c: Column, bpd: Int = 20): Column =
    col(LogHistogramAggregate(ex(c), bpd).toAggregateExpression())
  def histogram_merge(m: Column): Column =
    col(HistogramMergeAggregate(ex(m)).toAggregateExpression())
  def histogram_quantile(m: Column, q: Column, bpd: Int = 20): Column =
    col(HistogramQuantileExpression(ex(m), ex(q.cast("double")), bpd))
  def hll_sketch(c: Column, p: Int = 12): Column =
    col(HllSketchAggregate(ex(c), p).toAggregateExpression())
  def hll_merge(sketch: Column): Column =
    col(HllMergeAggregate(ex(sketch)).toAggregateExpression())
  def hll_estimate(sketch: Column): Column = col(HllEstimateExpression(ex(sketch)))
  def theta_sketch(c: Column, k: Int = Theta.DefaultK): Column =
    col(ThetaSketchAggregate(ex(c), k).toAggregateExpression())
  def theta_union(sketch: Column): Column =
    col(ThetaUnionAggregate(ex(sketch)).toAggregateExpression())
  def theta_intersect(a: Column, b: Column): Column =
    col(ThetaIntersectExpression(ex(a), ex(b)))
  def theta_a_not_b(a: Column, b: Column): Column =
    col(ThetaANotBExpression(ex(a), ex(b)))
  def theta_estimate(sketch: Column): Column = col(ThetaEstimateExpression(ex(sketch)))
  def cms_sketch(c: Column, w: Int = Cms.DefaultW, d: Int = Cms.DefaultD): Column =
    col(CmsSketchAggregate(ex(c), w, d).toAggregateExpression())
  def cms_merge(sketch: Column): Column =
    col(CmsMergeAggregate(ex(sketch)).toAggregateExpression())
  def cms_estimate(sketch: Column, key: Column): Column =
    col(CmsEstimateExpression(ex(sketch), ex(key)))
  def vector_mean(arr: Column): Column =
    col(VectorMeanAggregate(ex(arr)).toAggregateExpression())
  def vector_minmax(arr: Column): Column =
    col(VectorMinMaxAggregate(ex(arr)).toAggregateExpression())
  def comparable_maps(c: Column): Column = col(ComparableMapsExpression(ex(c)))
  def reverse_comparable_maps(c: Column): Column = col(ReverseComparableMapsExpression(ex(c)))
  def to_yaml(c: Column): Column = col(YamlEncodeExpression(ex(c)))
  def from_yaml(c: Column, ddl: String): Column = col(YamlDecodeExpression(ex(c), ddl))
}
