package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join matches the plain join on skewed data") {
    // 5000 rows of one hot key + a tail
    val left = ((0 until 5000).map(_ => (1L, "hot")) ++ (2L until 50L).map(k => (k, s"k$k")))
      .toDF("k", "lv")
    val right = (1L until 50L).map(k => (k, k * 10)).toDF("k", "rv")
    val plain = left.join(right, "k").select("k", "lv", "rv")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val salted = Skew.saltedJoin(left, right, "k", 8).select("k", "lv", "rv")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(salted == plain)
  }

  test("salted count matches plain groupBy count") {
    val df = ((0 until 3000).map(_ => 7L) ++ Seq(1L, 2L, 2L)).toDF("k")
    val plain = df.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, "k", 8).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
