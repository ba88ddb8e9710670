package graft.functions

import graft.TestSpark
import graft.rules.{Id, RuleSuite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class YamlAndMapsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def c(sql: String) = graft.rules.RuleRunner.parseRule(sql, RuleSuite(Id(0, 0), Nil))

  test("to_yaml / from_yaml round trip for structs") {
    val df = Seq((1, "x", 2.5)).toDF("a", "b", "c")
    val y = df.select(c("to_yaml(struct(a, b, c))").as("y")).as[String].collect()(0)
    assert(y.contains("a: 1") && y.contains("b: x"))
    val back = df.select(
      c(s"from_yaml(to_yaml(struct(a, b, c)), 'a INT, b STRING, c DOUBLE')").as("s"))
      .select("s.*").collect()(0)
    assert(back.toSeq == Seq(1, "x", 2.5))
  }

  test("to_yaml useFullScalarType tags scalars with java classes and still round-trips") {
    val df = Seq((1, "x", 2.5)).toDF("a", "b", "c")
    val y = df.select(
      c("to_yaml(struct(a, b, c), map('useFullScalarType', 'true'))").as("y"))
      .as[String].collect()(0)
    assert(y.contains("!!java.lang.Integer") && y.contains("!!java.lang.Double"),
      s"missing full scalar tags in:\n$y")
    val back = df.select(
      c("from_yaml(to_yaml(struct(a, b, c), map('useFullScalarType', 'true')), " +
        "'a INT, b STRING, c DOUBLE')").as("s"))
      .select("s.*").collect()(0)
    assert(back.toSeq == Seq(1, "x", 2.5))
    // default stays untagged
    val plain = df.select(c("to_yaml(struct(a))").as("y")).as[String].collect()(0)
    assert(!plain.contains("!!"))
  }

  test("from_yaml handles maps and arrays") {
    val df = Seq(1).toDF("x")
    val out = df.select(
      c("from_yaml(to_yaml(map('a', array(1, 2), 'b', array(3))), 'MAP<STRING, ARRAY<INT>>')").as("m"))
      .as[Map[String, Seq[Int]]].collect()(0)
    assert(out == Map("a" -> Seq(1, 2), "b" -> Seq(3)))
  }

  test("comparable_maps sorts keys and allows grouping; reverse round-trips") {
    val df = Seq(
      Map("b" -> 2, "a" -> 1),
      Map("a" -> 1, "b" -> 2),
      Map("z" -> 9)).toDF("m")
    val grouped = df.select(c("comparable_maps(m)").as("cm")).groupBy("cm").count()
    assert(grouped.count() == 2)
    val back = df.select(c("reverse_comparable_maps(comparable_maps(m))").as("m2"))
      .as[Map[String, Int]].collect()
    assert(back.toSet == Set(Map("a" -> 1, "b" -> 2), Map("z" -> 9)))
  }

  test("comparable_maps projections stay inside whole-stage codegen") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    // non-local source so the projection can't constant-fold away
    val df = spark.range(1).select(
        map(lit("b"), col("id") + 2, lit("a"), col("id") + 1).as("m"))
      .select(c("reverse_comparable_maps(comparable_maps(m))").as("m2"))
    val plan = df.queryExecution.executedPlan
    assert(plan.collectFirst { case w: WholeStageCodegenExec => w }.nonEmpty,
      s"comparable_maps fell out of codegen:\n$plan")
    assert(df.as[Map[String, Int]].collect().toSeq == Seq(Map("a" -> 1, "b" -> 2)))
  }

  test("comparable_maps handles nesting inside structs") {
    val df = Seq((1, Map("k" -> 2))).toDF("a", "m")
    val out = df.select(c("comparable_maps(struct(a, m))").as("s"))
    val schema = out.schema.fields(0).dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(schema.fields(1).dataType.typeName == "array")
  }
}
