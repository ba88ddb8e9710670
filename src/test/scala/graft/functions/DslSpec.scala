package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DslSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.functions.dsl._

  test("column DSL smoke across families") {
    val df = Seq((1, "x")).toDF("a", "b")
    val row = df.select(
      pack_ints(col("a"), lit(2)).as("p"),
      as_uuid(lit(1L), lit(2L)).as("u"),
      soft_fail(col("a") > 5).as("sf"),
      murmur3_id("m", col("a"), col("b")).as("id"),
      digest_to_longs("MD5", col("b")).as("dl"),
      to_yaml(struct(col("a"))).as("y"),
      comparable_maps(map(col("b"), col("a"))).as("cm")
    ).collect()(0)
    assert(row.getLong(0) == (1L << 32 | 2L))
    assert(row.getString(1) == new java.util.UUID(2L, 1L).toString)
    assert(row.getDouble(2) == -1.0)
    assert(row.getStruct(3).length == 3)
    assert(row.getSeq[Long](4).size == 2)
    assert(row.getString(5).contains("a: 1"))
  }

  test("id_equal / long_pair_equal compare exploded prefixed columns") {
    val df = Seq((1L, 2L, 1L, 2L, 3L, 4L)).toDF(
      "a_lower", "a_higher", "b_lower", "b_higher", "c_lower", "c_higher")
    val out = df.select(
      long_pair_equal("a", "b").as("ab"),
      long_pair_equal("a", "c").as("ac")).collect()(0)
    assert(out.getBoolean(0) && !out.getBoolean(1))

    val ids = Seq(("x", 7)).toDF("s", "i").select(
      murmur3_id("m", col("s"), col("i")).as("m1"),
      murmur3_id("n", col("s"), col("i")).as("n1"))
      .select(col("m1.*"), col("n1.*"))
    // same fields different prefixes: m_base/m_i0/m_i1 vs n_*
    assert(ids.select(id_equal("m", "n")).collect()(0).getBoolean(0))
  }

  test("typed aggregate DSL matches the SQL path") {
    val df = spark.range(1, 20).toDF("id")
    val out = df.select(
      agg_expr("BIGINT", col("id") % 2 > 0,
        sum_with(s => s + col("id")),
        results_with((s, c) => s / c)).as("mean"),
      agg_expr(col("id") % 2 > 0, inc(), return_sum).as("n"),
      agg_expr("MAP<BOOLEAN,BIGINT>", lit(true),
        map_with(col("id") % 2 === 0, e => e + 1), return_sum).as("m"))
      .collect()(0)
    assert(out.getDouble(0) == 10.0)
    assert(out.getLong(1) == 10L)
    assert(out.getMap[Boolean, Long](2) == Map(true -> 9L, false -> 10L))
  }

  test("DSL aggregates work in groupBy") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "v")
    val out = df.groupBy("g").agg(small_bloom(col("v"), 10, 0.01).as("bloom"))
    assert(out.count() == 2)
  }

  test("processor_input_wrapper resolves and passes the right argument through") {
    graft.functions.Registry.registerAll(spark)
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, null.asInstanceOf[String])).toDF("a", "b")
    df.createOrReplaceTempView("graft_piw")
    // value is always the RIGHT argument; the left only forces resolution
    val got = spark.sql(
      "SELECT processor_input_wrapper(b, a * 10) AS v FROM graft_piw ORDER BY v")
      .as[Long].collect().toSeq
    assert(got == Seq(10L, 20L))
    // left may be any type, including one unrelated to the result type,
    // and null left must not null the output
    val s2 = spark.sql(
      "SELECT processor_input_wrapper(named_struct('k', a), b) AS v FROM graft_piw WHERE a = 1")
      .as[String].collect().toSeq
    assert(s2 == Seq("x"))
    // the left argument is NEVER evaluated (reference InputWrapper
    // semantics): a left that throws at runtime — here an ANSI cast
    // failure on a non-numeric string — must pass through untouched
    val s3 = spark.sql(
      "SELECT processor_input_wrapper(CAST(concat(b, 'oops') AS INT), a) AS v " +
        "FROM graft_piw WHERE a = 1")
      .as[Long].collect().toSeq
    assert(s3 == Seq(1L))
  }
}
