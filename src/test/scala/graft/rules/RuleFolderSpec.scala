package graft.rules

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RuleFolderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def df = Seq((5.0, "A"), (150.0, "B"), (-10.0, "C")).toDF("amount", "tag")

  val suite: RuleSuite = RuleSuite(Id(1, 1), Seq(RuleSet(Id(2, 1), Seq(
    Rule(Id(10, 1), "amount > 0",
      Some(OutputExpression(10, Id(910, 1), "acc -> update_field(acc, 'amount', acc.amount * 2)"))),
    Rule(Id(11, 1), "amount >= 100",
      Some(OutputExpression(20, Id(911, 1), "set(tag = concat(currentResult.tag, '!'), amount = currentResult.amount + 1)")))))))

  test("folds triggered outputs in salience order; none triggered → null") {
    val out = RuleFolder.addRuleFolder(df, suite, struct(col("amount"), col("tag")), "rf")
      .select(col("rf.result.amount"), col("rf.result.tag")).collect()
    // A: only rule10: 5*2=10
    assert(out(0).getDouble(0) == 10.0 && out(0).getString(1) == "A")
    // B: rule10 then rule11: 150*2=300 → set: 300+1=301, tag B!
    assert(out(1).getDouble(0) == 301.0 && out(1).getString(1) == "B!")
    // C: none → null struct
    assert(out(2).isNullAt(0) && out(2).isNullAt(1))
  }

  test("debugMode collects each fold step") {
    val out = RuleFolder.addRuleFolder(df, suite, struct(col("amount"), col("tag")), "rf", debugMode = true)
      .select(col("rf.result")).as[Seq[(Int, (Double, String))]].collect()
    assert(out(1) == Seq((10, (300.0, "B")), (20, (301.0, "B!"))))
  }

  test("flatten_folder_results appends result") {
    val out = RuleFolder.addRuleFolder(df, suite, struct(col("amount"), col("tag")), "rf")
      .select(explode(RuleFolder.flattenFolderResults(col("rf"))).as("r"))
      .select("r.ruleId", "r.result.amount")
    assert(out.count() == 6)
  }
}
