package graft.rules

import graft.TestSpark
import graft.rules.RuleResults._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RuleRunnerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val suite: RuleSuite = RuleSuite(
    Id(1, 2),
    Seq(
      RuleSet(Id(10, 1), Seq(
        Rule(Id(100, 1), "q <= 50"),
        Rule(Id(101, 1), "p > 0"))),
      RuleSet(Id(20, 1), Seq(
        Rule(Id(200, 1), "CASE WHEN d <= 0.06 THEN 1 ELSE -1 END"),
        Rule(Id(201, 1), "CASE WHEN t < 0.04 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.5 AS DOUBLE) END")))))

  def df = Seq(
    // q, p, d, t
    (10.0, 5.0, 0.01, 0.01),  // all pass
    (60.0, 5.0, 0.01, 0.01),  // rule 100 fails
    (10.0, 5.0, 0.10, 0.01),  // rule 200 soft-fails
    (10.0, 5.0, 0.01, 0.05)   // rule 201 probability 0.5 < 0.8 => overall fail
  ).toDF("q", "p", "d", "t")

  test("addDataQuality builds packed nested struct with correct results") {
    val out = RuleRunner.addDataQuality(df, suite)
    val rows = out.select(
      col("DataQuality.id"),
      col("DataQuality.overallResult"),
      element_at(element_at(col("DataQuality.ruleSetResults"), Id.pack(Id(10, 1))).getField("ruleResults"), Id.pack(Id(100, 1))),
      element_at(element_at(col("DataQuality.ruleSetResults"), Id.pack(Id(20, 1))).getField("ruleResults"), Id.pack(Id(200, 1))),
      element_at(element_at(col("DataQuality.ruleSetResults"), Id.pack(Id(20, 1))).getField("ruleResults"), Id.pack(Id(201, 1)))
    ).collect()

    assert(rows.forall(_.getLong(0) == Id.pack(Id(1, 2))))
    assert(rows(0).getInt(1) == PassedInt)
    assert(rows(1).getInt(1) == FailedInt)     // bool fail dominates
    assert(rows(2).getInt(1) == PassedInt)     // soft fail is neutral
    assert(rows(3).getInt(1) == FailedInt)     // probability 0.5 < 0.8
    assert(rows(2).getInt(3) == SoftFailedInt)
    assert(rows(3).getInt(4) == 50000)         // probability encoding
  }

  test("flattenResults explodes to one row per rule with ids unpacked") {
    val out = RuleRunner.addDataQuality(df, suite)
      .select(explode(RuleRunner.flattenResults(col("DataQuality"))).as("r"))
      .select("r.*")
    assert(out.count() == 16)
    assert(out.columns.toSeq == Seq(
      "ruleSuiteId", "ruleSuiteVersion", "ruleSuiteResult", "ruleSetResult",
      "ruleSetId", "ruleSetVersion", "ruleId", "ruleVersion", "ruleResult"))
    val byRule = out.groupBy("ruleId").agg(sum(when(col("ruleResult") === PassedInt, 1).otherwise(0)).as("passes"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byRule(100) == 3)
    assert(byRule(101) == 4)
    assert(byRule(200) == 3)
  }

  test("addOverallResultsAndDetails splits overall to top level") {
    val out = RuleRunner.addOverallResultsAndDetails(df, suite)
    assert(out.columns.contains("DQ_overallResult"))
    val overall = out.select("DQ_overallResult").as[Int].collect()
    assert(overall.toSeq == Seq(PassedInt, FailedInt, PassedInt, FailedInt))
    assert(!out.select("DQ_details.*").columns.contains("overallResult"))
  }

  test("disabled and string coercions") {
    val s = RuleSuite(Id(1, 1), Seq(RuleSet(Id(2, 1), Seq(
      Rule(Id(3, 1), "-2"),
      Rule(Id(4, 1), "'passed'"),
      Rule(Id(5, 1), "'maybe'"),
      Rule(Id(6, 1), "cast(null as boolean)")))))
    val out = RuleRunner.addDataQuality(Seq(1).toDF("x"), s)
      .select(explode(RuleRunner.flattenResults(col("DataQuality"))).as("r"))
      .select("r.ruleId", "r.ruleResult")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(out(3) == DisabledRuleInt)
    assert(out(4) == PassedInt)
    assert(out(5) == SoftFailedInt)
    assert(out(6) == FailedInt)
  }

  test("addFlattenedResults matches explode(flattenResults)") {
    val viaStruct = RuleRunner.addDataQuality(df, suite)
      .select(explode(RuleRunner.flattenResults(col("DataQuality"))).as("r"))
      .select("r.*").collect().map(_.toSeq).toSet
    val direct = RuleRunner.addFlattenedResults(df, suite).collect().map(_.toSeq).toSet
    assert(direct == viaStruct)
  }

  test("wide suites (40 rules) plan and run without blowup") {
    val wide = RuleSuite(Id(1, 1), Seq(RuleSet(Id(2, 1),
      (1 to 40).map(i => Rule(Id(i, 1), s"q + $i > $i")))))
    val t0 = System.nanoTime()
    val out = RuleRunner.addDataQuality(df, wide)
      .select(col("DataQuality.overallResult")).as[Int].collect()
    assert(out.length == 4)
    val engineWide = RuleSuite(Id(1, 1), Seq(RuleSet(Id(2, 1),
      (1 to 40).map(i => Rule(Id(i, 1), s"q > $i",
        Some(OutputExpression(i, Id(100 + i, 1), s"'band$i'")))))))
    val eng = RuleEngine.addRuleEngine(df, engineWide, "re")
      .select(col("re.result")).as[String].collect()
    assert(eng.length == 4)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60, s"wide suite took ${secs}s")
  }

  test("coercion edge cases match the reference's token table") {
    // derived from reference qualityTests/BaseFunctionalityTest.scala:254-259
    val s = RuleSuite(Id(1, 1), Seq(RuleSet(Id(2, 1), Seq(
      Rule(Id(1, 1), "-1657899192881000L"),
      Rule(Id(2, 1), "-4"),
      Rule(Id(3, 1), "cast(-1.32 as float)"),
      Rule(Id(4, 1), "cast(-2 as short)"),
      Rule(Id(5, 1), "cast(-2 as byte)"),
      Rule(Id(6, 1), "cast(-1.32 as double)"),
      Rule(Id(7, 1), "0.75")))))
    val out = RuleRunner.addDataQuality(Seq(1).toDF("x"), s)
      .select(explode(RuleRunner.flattenResults(col("DataQuality"))).as("r"))
      .select("r.ruleId", "r.ruleResult")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(out(1) == FailedInt)            // arbitrary long → Failed
    assert(out(2) == FailedInt)            // -4 is not a token
    assert(out(3) == -131999 || out(3) == -132000) // float widening of -1.32
    assert(out(4) == DisabledRuleInt)
    assert(out(5) == DisabledRuleInt)
    assert(out(6) == -132000)              // probability encoding kept raw
    assert(out(7) == 75000)
  }

  test("empty suite and empty rule set are vacuously passed") {
    val empty = RuleSuite(Id(1, 1), Seq.empty)
    val out = RuleRunner.addDataQuality(Seq(1).toDF("x"), empty)
      .select(col("DataQuality.overallResult")).as[Int].collect()
    assert(out.toSeq == Seq(PassedInt))

    val emptySet = RuleSuite(Id(1, 1), Seq(RuleSet(Id(2, 1), Seq.empty)))
    val out2 = RuleRunner.addOverallResultsAndDetails(Seq(1).toDF("x"), emptySet)
      .select(
        col("DQ_overallResult"),
        element_at(col("DQ_details.ruleSetResults"), Id.pack(Id(2, 1))).getField("overallResult"))
      .collect()
    assert(out2.head.getInt(0) == PassedInt && out2.head.getInt(1) == PassedInt)

    val flat = RuleRunner.addFlattenedResults(Seq(1).toDF("x"), empty)
    assert(flat.count() == 0) // no rules → no flattened rows, but no crash
  }

  test("lambda substitution in rules") {
    val s = RuleSuite(Id(1, 1), Seq(RuleSet(Id(2, 1), Seq(
      Rule(Id(3, 1), "within(x, 1, 10)")))),
      Seq(LambdaFunction("within", "(v, lo, hi) -> v >= lo AND v <= hi", Id(9, 1))))
    val out = RuleRunner.addDataQuality(Seq(5, 50).toDF("x"), s)
      .select(col("DataQuality.overallResult")).as[Int].collect()
    assert(out.toSeq == Seq(PassedInt, FailedInt))
  }

  test("failureExamples: per-rule counts and k lowest failing ids") {
    val s = RuleSuite(Id(1, 1), Seq(RuleSet(Id(2, 1), Seq(
      Rule(Id(100, 1), "x <= 6"),     // fails for 7..9
      Rule(Id(101, 1), "x % 2 = 0"), // fails for odds
      Rule(Id(102, 1), "x >= 0"))))) // never fails → absent
    val df = (0 to 9).map(i => (i.toLong, i)).toDF("id", "x")
    val out = RuleRunner.failureExamples(df, s, col("id"), k = 2)
      .collect().map(r => (r.getInt(0), r.getInt(2)) -> (r.getLong(1), r.getLong(3))).toMap
    assert(out((100, 1)) == (3L, 7L) && out((100, 2)) == (3L, 8L))
    assert(out((101, 1)) == (5L, 1L) && out((101, 2)) == (5L, 3L))
    assert(!out.keys.exists(_._1 == 102))
  }

  test("compareSuites: shadow flip counts per rule; grid mismatch refused") {
    val df = Seq(10.0, 25.0, 40.0, 60.0).toDF("v")
    val a = RuleSuite(Id(1, 1), Seq(RuleSet(Id(10, 1), Seq(
      Rule(Id(100, 1), "v <= 50"),
      Rule(Id(101, 1), "v >= 0")))))
    val b = RuleSuite(Id(1, 2), Seq(RuleSet(Id(10, 1), Seq(
      Rule(Id(100, 2), "v <= 30"),   // tightened: 40 flips pass→fail
      Rule(Id(101, 2), "v >= 0"))))) // unchanged
    val got = RuleRunner.compareSuites(df, a, b)
      .collect().map(r => r.getInt(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got(100) == ((4L, 3L, 1L, 0L, 250000L))) // one of four rows flips
    assert(got(101) == ((4L, 4L, 0L, 0L, 0L)))
    val c = RuleSuite(Id(1, 3), Seq(RuleSet(Id(10, 1), Seq(
      Rule(Id(100, 3), "v <= 30"))))) // a rule REMOVED → different grid
    intercept[IllegalArgumentException](RuleRunner.compareSuites(df, a, c))
  }
}
