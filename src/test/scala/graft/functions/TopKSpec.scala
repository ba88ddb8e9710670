package graft.functions

import graft.TestSpark
import graft.functions.dsl.top_k_by
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("top_k_by keeps the k best with deterministic tie-breaks across partitions") {
    // scores with ties: item i scores i % 5 — best score 4 is shared by 0..19/5
    val df = spark.range(0, 100).toDF("id").repartition(7)
      .select(col("id"), (col("id") % 5).cast("double").as("s"))
    val out = df.groupBy(lit(1).as("g"))
      .agg(top_k_by(col("s"), col("id"), 7).as("t"))
      .select(posexplode(col("t")).as(Seq("pos", "e")))
      .select(col("e.item"), col("e.ord")).as[(Long, Double)].collect().toSeq
    // best-first: all score-4 items ascending (4, 9, 14, ...), then score-3
    assert(out == Seq(4L -> 4.0, 9L -> 4.0, 14L -> 4.0, 19L -> 4.0, 24L -> 4.0,
      29L -> 4.0, 34L -> 4.0))
  }

  test("top_k_by ignores null and NaN ordinates and returns fewer than k when scarce") {
    val df = Seq(
      (1L, Some(2.0)), (2L, None), (3L, Some(Double.NaN)), (4L, Some(1.0))
    ).toDF("id", "s").repartition(3)
    val out = df.groupBy(lit(1)).agg(top_k_by(col("s"), col("id"), 10).as("t"))
      .select(explode(col("t.item")).as("id")).as[Long].collect().toSeq
    assert(out == Seq(1L, 4L))
  }

  test("top_k_by handles array items (the grouped PQ-init shape) across partitions") {
    // per group, keep the 2 lowest-hash vectors — exactly how trainCodebook
    // selects initial codebook entries in one pass; array items must survive
    // buffer copy + partial-aggregate serialization across partitions
    val df = Seq(
      (0, Seq(1.0, 2.0)), (0, Seq(3.0, 4.0)), (0, Seq(5.0, 6.0)),
      (1, Seq(7.0, 8.0)), (1, Seq(9.0, 10.0))
    ).toDF("sub", "sv").repartition(5)
    val out = df.groupBy(col("sub"))
      .agg(top_k_by(-xxhash64(col("sv")).cast("double"), col("sv"), 2).as("t"))
      .select(col("sub"), explode(col("t.item")).as("sv"))
      .as[(Int, Seq[Double])].collect()
    assert(out.count(_._1 == 0) == 2 && out.count(_._1 == 1) == 2)
    // deterministic: same hash ordering on every run, no duplicated picks
    assert(out.toSet.size == 4)
    val again = df.repartition(2).groupBy(col("sub"))
      .agg(top_k_by(-xxhash64(col("sv")).cast("double"), col("sv"), 2).as("t"))
      .select(col("sub"), explode(col("t.item")).as("sv"))
      .as[(Int, Seq[Double])].collect()
    assert(out.toSet == again.toSet)
  }

  test("top_k_by works from SQL with string items") {
    Seq(("a", 1.0), ("b", 3.0), ("c", 2.0), ("d", 3.0)).toDF("w", "s")
      .createOrReplaceTempView("graft_topk_t")
    val out = spark.sql(
      "SELECT top_k_by(s, w, 2) AS t FROM graft_topk_t")
      .select(explode(col("t.item")).as("w")).as[String].collect().toSeq
    assert(out == Seq("b", "d")) // ties broken ascending on item
  }
}
