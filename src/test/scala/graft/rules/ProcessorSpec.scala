package graft.rules

import graft.TestSpark
import graft.rules.RuleResults._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ProcessorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("row-by-row processing without Spark jobs matches the runner semantics") {
    val schema = StructType(Seq(
      StructField("q", DoubleType), StructField("tag", StringType)))
    val suite = RuleSuite(Id(1, 1), Seq(RuleSet(Id(2, 1), Seq(
      Rule(Id(10, 1), "q <= 50"),
      Rule(Id(11, 1), "CASE WHEN tag = 'soft' THEN -1 ELSE 1 END"),
      Rule(Id(12, 1), "CASE WHEN q < 10 THEN CAST(0.5 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END")))))
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val process = Processor.create(spark, schema, suite)

    val ok = process(Row(20.0, "hard"))
    assert(ok.overall == PassedInt)
    assert(ok.rules.map(_.result) == Seq(PassedInt, PassedInt, PassedInt))

    val soft = process(Row(20.0, "soft"))
    assert(soft.overall == PassedInt && soft.rules(1).result == SoftFailedInt)

    val probFail = process(Row(5.0, "x"))
    assert(probFail.overall == FailedInt && probFail.rules(2).result == 50000)

    val hardFail = process(Row(99.0, "x"))
    assert(hardFail.overall == FailedInt)

    // evaluation itself must not have launched any Spark jobs
    val jobsAfter = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(jobsAfter == jobsBefore)
  }

  test("engine processor evaluates salience + outputs locally with zero jobs") {
    val schema = StructType(Seq(StructField("price", DoubleType)))
    val suite = RuleSuite(Id(3, 1), Seq(RuleSet(Id(30, 1), Seq(
      Rule(Id(300, 1), "price >= 100", Some(OutputExpression(10, Id(1, 1), "'high'"))),
      Rule(Id(301, 1), "price >= 0", Some(OutputExpression(20, Id(2, 1), "'low'")))))))
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val process = Processor.createEngine(spark, schema, suite)
    assert(process(Row(150.0)) == Processor.EngineOutcome(Some(Id(300, 1)), "high"))
    assert(process(Row(50.0)) == Processor.EngineOutcome(Some(Id(301, 1)), "low"))
    assert(process(Row(-5.0)) == Processor.EngineOutcome(None, null))
    val jobsAfter = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(jobsAfter == jobsBefore)
  }

  test("processor supports lambdas and registry functions") {
    val schema = StructType(Seq(StructField("v", IntegerType)))
    val suite = RuleSuite(Id(1, 1),
      Seq(RuleSet(Id(2, 1), Seq(Rule(Id(10, 1), "soft_fail(double_it(v) > 10)")))),
      Seq(LambdaFunction("double_it", "x -> x * 2", Id(9, 1))))
    val process = Processor.create(spark, schema, suite)
    assert(process(Row(6)).rules.head.result == PassedInt)
    assert(process(Row(2)).rules.head.result == SoftFailedInt)
  }
}
