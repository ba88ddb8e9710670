package graft.functions

import graft.TestSpark
import graft.rules.{Id, RuleSuite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def c(sql: String) = graft.rules.RuleRunner.parseRule(sql, RuleSuite(Id(0, 0), Nil))

  test("misra-gries retains every value above the n/(k+1) guarantee across partitions") {
    // 10k rows: "hot" 4000, "warm" 2500, "cool" 1500, 40 distinct noise values 50 each
    val rows = Seq.fill(4000)("hot") ++ Seq.fill(2500)("warm") ++ Seq.fill(1500)("cool") ++
      (0 until 40).flatMap(i => Seq.fill(50)(s"noise$i"))
    val df = rows.toDF("v").repartition(8) // force partial buffers + merges
    val m = df.select(c("approx_heavy_hitters(v, 8)").as("hh"))
      .collect()(0).getMap[String, Long](0)
    // guarantee: freq > n/(k+1) = 10000/9 ≈ 1111 must survive
    assert(m.contains("hot") && m.contains("warm") && m.contains("cool"), s"lost a heavy hitter: $m")
    assert(m.size <= 8)
    // counts undercount by at most n/(k+1)
    assert(m("hot") >= 4000 - 1112 && m("hot") <= 4000)
    assert(m("warm") >= 2500 - 1112 && m("warm") <= 2500)
  }

  test("exact when distinct values fit in k") {
    val df = (Seq.fill(7)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L)).toDF("v").repartition(4)
    val m = df.select(c("approx_heavy_hitters(v, 10)").as("hh"))
      .collect()(0).getMap[Long, Long](0)
    assert(m == Map(1L -> 7L, 2L -> 3L, 3L -> 1L))
  }

  test("non-atomic key types are rejected") {
    val e = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(c("approx_heavy_hitters(struct(a, b), 4)")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("atomic")))
  }
}
