package graft.functions

import graft.TestSpark
import graft.rules.{Id, Rule, RuleSet, RuleSuite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AggExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def aggCol(sql: String) =
    graft.rules.RuleRunner.parseRule(sql, RuleSuite(Id(0, 0), Nil))

  test("agg_expr with sum_with and results_with (docs example)") {
    val df = spark.range(1, 20).toDF("id")
    val res = df.select(aggCol(
      "agg_expr('BIGINT', id % 2 > 0, sum_with(sum -> sum + id), results_with((sum, count) -> sum / count))").as("r"))
      .as[Double].collect()
    assert(res.toSeq == Seq(10.0))
  }

  test("inc and meanF sugar") {
    val df = spark.range(1, 20).toDF("id")
    val res = df.select(aggCol("agg_expr(id % 2 > 0, inc(id), meanF())").as("r")).as[Double].collect()
    assert(res.toSeq == Seq(10.0))
  }

  test("return_sum and plain inc") {
    val df = spark.range(0, 10).toDF("id")
    val res = df.select(aggCol("agg_expr(id >= 5, inc(), return_sum())").as("r")).as[Long].collect()
    assert(res.toSeq == Seq(5L))
  }

  test("map_with group-count") {
    val df = Seq("a", "b", "a", "a").toDF("k")
    val m = df.select(aggCol(
      "agg_expr('MAP<STRING,BIGINT>', 1 > 0, map_with(k, entry -> entry + 1), return_sum())").as("m"))
      .as[Map[String, Long]].collect()(0)
    assert(m == Map("a" -> 3L, "b" -> 1L))
  }

  test("map_with sum by key merges across partitions") {
    val df = Seq(("a", 1.0), ("b", 2.0), ("a", 3.5)).toDF("k", "v").repartition(3)
    val m = df.select(aggCol(
      "agg_expr('MAP<STRING,DOUBLE>', v > 0, map_with(k, entry -> entry + v), return_sum())").as("m"))
      .as[Map[String, Double]].collect()(0)
    assert(m == Map("a" -> 4.5, "b" -> 2.0))
  }

  test("agg_expr works in groupBy") {
    val df = Seq((1, 10L), (1, 20L), (2, 5L)).toDF("g", "v")
    val out = df.groupBy($"g")
      .agg(aggCol("agg_expr(v > 0, sum_with(s -> s + v), return_sum())").as("s"))
      .orderBy("g").as[(Int, Long)].collect()
    assert(out.toSeq == Seq((1, 30L), (2, 5L)))
  }
}
