package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Frequent pair mining: exact counts vs a local model, presence
 * semantics (duplicates in a basket count once), lift arithmetic,
 * support cut, and the mega-basket cap. */
class ItemsetsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows: Seq[(Long, String)] = Seq(
    (1L, "milk"), (1L, "bread"), (1L, "milk"), // dup milk: counts once
    (2L, "milk"), (2L, "bread"),
    (3L, "milk"), (3L, "eggs"),
    (4L, "bread"), (4L, "eggs"),
    (5L, "milk"), (5L, "bread"), (5L, "eggs"))

  private def run(minCount: Long, cap: Int = 0) =
    Itemsets.frequentPairs(rows.toDF("b", "i"), col("b"), col("i"), minCount, cap)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

  test("pair counts and lift match the local model; presence semantics") {
    // N=5; n(milk)=4, n(bread)=4, n(eggs)=3
    // (bread,milk)=3 → lift 3e6·5/16 = 937500
    // (bread,eggs)=2 → 2e6·5/12 = 833333 ; (eggs,milk)=2 → 833333
    val got = run(1)
    assert(got == Map(
      ("bread", "milk") -> ((3L, 937500L)),
      ("bread", "eggs") -> ((2L, 833333L)),
      ("eggs", "milk") -> ((2L, 833333L))))
    assert(run(3).keySet == Set(("bread", "milk")))
  }

  test("mega-basket cap drops the basket before counting") {
    val got = run(1, cap = 2) // baskets 1,5 exceed... basket 1 has 2 distinct
    // distinct sizes: b1=2, b2=2, b3=2, b4=2, b5=3 → only b5 dropped; N=4
    // (bread,milk)=2, n(milk)=3, n(bread)=3 → lift 2e6·4/9 = 888888
    assert(got(("bread", "milk")) == ((2L, 888888L)))
    assert(!got.contains(("eggs", "milk")) || got(("eggs", "milk"))._1 == 1L)
  }

  test("null baskets/items sit out; minCount validated") {
    val df = spark.sql(
      """SELECT * FROM VALUES (1L, 'a'), (1L, CAST(NULL AS STRING)),
        | (CAST(NULL AS BIGINT), 'b'), (1L, 'c') t(b, i)""".stripMargin)
    val out = Itemsets.frequentPairs(df, col("b"), col("i"), 1)
      .as[(String, String, Long, Long)].collect().toSet
    assert(out.map(r => (r._1, r._2)) == Set(("a", "c")))
    intercept[IllegalArgumentException] {
      Itemsets.frequentPairs(df, col("b"), col("i"), 0)
    }
  }
}
