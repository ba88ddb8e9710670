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

  test("keySkewReport: exact counts, ppm share, nulls, deterministic top-k") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        | ('a', 1), ('a', 2), ('a', 3), ('a', 4),
        | ('b', 1), ('b', 2), ('c', 1),
        | (CAST(NULL AS STRING), 9), (CAST(NULL AS STRING), 9),
        | ('d', 9) t(k, v)""".stripMargin)
    val r = Skew.keySkewReport(df, Seq("k"), topK = 3)
      .as[(String, Long, Long, Long, Long, Long, String)].head()
    // 10 rows, 4 distinct non-null keys, 2 nulls, max a=4 → 400000 ppm;
    // top 3 by (count desc, "key:count" asc): a:4, b:2, c:1
    assert(r == (("k", 10L, 4L, 2L, 4L, 400000L, "a:4,b:2,c:1")))
    val two = Skew.keySkewReport(df, Seq("k", "v"))
      .select("key_col").as[String].collect().toSeq
    assert(two == Seq("k", "v"))
    intercept[IllegalArgumentException] { Skew.keySkewReport(df, Seq.empty) }
  }
}
