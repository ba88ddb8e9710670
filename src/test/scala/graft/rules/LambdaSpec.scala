package graft.rules

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LambdaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def run(sql: String, lambdas: Seq[LambdaFunction], df: org.apache.spark.sql.DataFrame) =
    df.select(RuleRunner.parseRule(sql, RuleSuite(Id(0, 0), Nil, lambdas)).as("r"))

  test("nested lambdas expand recursively") {
    val ls = Seq(
      LambdaFunction("twice", "x -> x * 2", Id(1, 1)),
      LambdaFunction("quad", "x -> twice(twice(x))", Id(2, 1)))
    val out = run("quad(v)", ls, Seq(3).toDF("v")).as[Int].collect()
    assert(out.toSeq == Seq(12))
  }

  test("partial application with _() yields a usable higher-order lambda") {
    val ls = Seq(LambdaFunction("plus", "(a, b) -> a + b", Id(1, 1)))
    val out = run("aggregate(array(1L, 2L, 3L), 10L, plus(_(), _()))", ls, Seq(1).toDF("v"))
      .as[Long].collect()
    assert(out.toSeq == Seq(16L))
  }

  test("partial application binds fixed args") {
    val ls = Seq(LambdaFunction("addn", "(a, n) -> a + n", Id(1, 1)))
    val out = run("transform(array(1L, 2L), addn(_(), 10L))", ls, Seq(1).toDF("v"))
      .as[Seq[Long]].collect()
    assert(out(0) == Seq(11L, 12L))
  }

  test("recursive lambdas are rejected, not looped") {
    val ls = Seq(LambdaFunction("loop", "x -> loop(x)", Id(1, 1)))
    val e = intercept[IllegalArgumentException] {
      run("loop(v)", ls, Seq(1).toDF("v")).collect()
    }
    assert(e.getMessage.contains("depth"))
  }

  test("same-name lambdas overload by arity") {
    val ls = Seq(
      LambdaFunction("add", "(a, b) -> a + b", Id(1, 1)),
      LambdaFunction("add", "(a, b, c) -> a + b + c", Id(2, 1)))
    val out = run("add(v, 1) + add(v, 1, 2)", ls, Seq(10).toDF("v")).as[Int].collect()
    assert(out.toSeq == Seq(11 + 13))
    val e = intercept[IllegalArgumentException] {
      run("add(v)", ls, Seq(1).toDF("v")).collect()
    }
    assert(e.getMessage.contains("arities 2/3"))
  }

  test("callFun applies a lambda-valued partial from a curried lambda") {
    val ls = Seq(LambdaFunction("mult", "a -> b -> a * b", Id(1, 1)))
    val out = run("callFun(mult(2), v)", ls, Seq(5).toDF("v")).as[Int].collect()
    assert(out.toSeq == Seq(10))
  }

  test("lambda names are case-insensitive like Spark functions") {
    val ls = Seq(LambdaFunction("MyFun", "x -> x + 1", Id(1, 1)))
    assert(run("myfun(v)", ls, Seq(1).toDF("v")).as[Int].collect().toSeq == Seq(2))
  }

  test("registerLambdaFunctions makes lambdas callable from plain spark.sql") {
    Lambdas.registerLambdaFunctions(spark, Seq(
      LambdaFunction("g_disc", "(p, d) -> p * (1 - d)", Id(1, 1)),
      LambdaFunction("g_net", "(p, d, t) -> g_disc(p, d) * (1 + t)", Id(2, 1))))
    Seq((100.0, 0.1, 0.05)).toDF("p", "d", "t").createOrReplaceTempView("g_li")
    // nested lambda bodies expand; case-insensitive like any SQL function
    val out = spark.sql("SELECT G_NET(p, d, t) AS net FROM g_li").as[Double].collect()
    assert(math.abs(out(0) - 100.0 * 0.9 * 1.05) < 1e-9)
  }

  test("registered lambdas support _() placeholders in spark.sql") {
    Lambdas.registerLambdaFunctions(spark, Seq(
      LambdaFunction("g_addn", "(a, n) -> a + n", Id(1, 1))))
    val out = spark.sql("SELECT transform(array(1L, 2L), g_addn(_(), 10L)) AS r")
      .as[Seq[Long]].collect()
    assert(out(0) == Seq(11L, 12L))
  }

  test("registered lambdas report arity mismatches") {
    Lambdas.registerLambdaFunctions(spark, Seq(
      LambdaFunction("g_one", "x -> x + 1", Id(1, 1))))
    val e = intercept[Exception] { spark.sql("SELECT g_one(1, 2)").collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("arities")))
  }
}
