package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Traffic/bot profiling: metronomic detection via exact cv², declared-UA
 * and hammering flags, error ppm, singleton/zero-gap edge cases, and
 * partition invariance. */
class TrafficSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def report(rows: Seq[(String, Long, String, Int, String)]) =
    Traffic.botReport(rows.toDF("c", "t", "p", "st", "ua"),
      col("c"), col("t"), col("p"), col("st"), col("ua"))

  test("metronomic scheduler flagged at cv2 zero; human-ish jitter is not") {
    val bot = (0 until 20).map(i => ("1.1.1.1", 1000L + 60L * i, s"/p${i % 3}", 200, "cron/1.0"))
    // jittered gaps: 10, 110, 10, 110... → cv² = 1/1.44... well over 1%
    val human = (0 until 20).map(i =>
      ("2.2.2.2", 1000L + 60L * i + (if (i % 2 == 0) 0L else 50L), s"/q$i", 200, "Mozilla/5.0"))
    val out = report(bot ++ human).collect().map(r => r.getAs[String]("client") -> r).toMap
    val b = out("1.1.1.1")
    assert(b.getAs[Long]("cv2_ppm") == 0L && b.getAs[Boolean]("metronomic"))
    assert(!b.getAs[Boolean]("declared_bot")) // cron/1.0 is not in the UA list
    assert(b.getAs[Long]("mean_gap_s") == 60L)
    assert(b.getAs[Long]("bot_score_ppm") == 300000L)
    val h = out("2.2.2.2")
    assert(h.getAs[Long]("cv2_ppm") > 100000L && !h.getAs[Boolean]("metronomic"))
    assert(h.getAs[Long]("bot_score_ppm") == 0L)
  }

  test("declared bots, hammering, errors and robots hits") {
    val hammer = (0 until 40).map(i => ("3.3.3.3", 1000L + i, "/x", 200, "scrapy/2.0"))
    val errs = Seq(("4.4.4.4", 1L, "/robots.txt", 200, "GoodBot"),
      ("4.4.4.4", 5L, "/a", 404, "GoodBot"), ("4.4.4.4", 9L, "/b", 500, "GoodBot"),
      ("4.4.4.4", 13L, "/a", 200, "GoodBot"))
    val out = report(hammer ++ errs).collect().map(r => r.getAs[String]("client") -> r).toMap
    val hm = out("3.3.3.3")
    assert(hm.getAs[Boolean]("hammering") && hm.getAs[Boolean]("metronomic"))
    assert(hm.getAs[Boolean]("declared_bot"))
    assert(hm.getAs[Long]("bot_score_ppm") == 1000000L)
    val e = out("4.4.4.4")
    assert(e.getAs[Long]("robots_hits") == 1L && e.getAs[Long]("err_ppm") == 500000L)
    assert(e.getAs[Boolean]("declared_bot")) // "GoodBot" matches (?i)bot
    assert(e.getAs[Long]("distinct_paths") == 3L)
  }

  test("singletons and zero-span clients don't divide by zero; repartition invariant") {
    val rows = Seq(("5.5.5.5", 7L, "/one", 200, "x"),
      ("6.6.6.6", 3L, "/a", 200, "y"), ("6.6.6.6", 3L, "/a", 200, "y"))
    val out = report(rows).collect().map(r => r.getAs[String]("client") -> r).toMap
    assert(out("5.5.5.5").isNullAt(out("5.5.5.5").fieldIndex("mean_gap_s")))
    assert(out("5.5.5.5").isNullAt(out("5.5.5.5").fieldIndex("cv2_ppm")))
    // two identical timestamps: gap 0, sum 0 → cv2 null (undefined), not NaN
    assert(out("6.6.6.6").getAs[Long]("mean_gap_s") == 0L)
    assert(out("6.6.6.6").isNullAt(out("6.6.6.6").fieldIndex("cv2_ppm")))
    val big = (0 until 200).map(i => (s"c${i % 5}", i.toLong * 7 % 977, s"/p$i", 200, "ua"))
    val a = report(big).collect().map(_.toSeq).toSet
    val b = Traffic.botReport(big.toDF("c", "t", "p", "st", "ua").repartition(17),
      col("c"), col("t"), col("p"), col("st"), col("ua")).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
