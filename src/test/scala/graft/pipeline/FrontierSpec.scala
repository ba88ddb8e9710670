package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Politeness scheduler: per-host serialization at the configured delay,
 * priority ordering with deterministic ties, default delay for
 * unconfigured hosts, horizon cut, partition invariance. */
class FrontierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val frontier = Seq(
    ("https://a.com/1", 5.0), ("https://a.com/2", 9.0), ("https://a.com/3", 9.0),
    ("https://b.com/x", 1.0), ("https://b.com/y", 2.0),
    ("https://c.com/only", 0.0)).toDF("url", "pri")
  private val delays = Seq(("a.com", 2000L), ("b.com", 100L)).toDF("h", "ms")

  private def run(horizon: Long = 10000L) =
    Frontier.crawlSchedule(frontier.repartition(5), col("url"), col("pri"),
        delays, col("h"), col("ms"), defaultDelayMs = 1000L, horizonMs = horizon)
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap

  test("per-host slots: priority desc, url tie-break, delay spacing") {
    val got = run()
    assert(got("https://a.com/2") === (("a.com", 1L, 0L, true)))     // 9.0, tie url asc
    assert(got("https://a.com/3") === (("a.com", 2L, 2000L, true)))
    assert(got("https://a.com/1") === (("a.com", 3L, 4000L, true)))
    assert(got("https://b.com/y") === (("b.com", 1L, 0L, true)))
    assert(got("https://b.com/x") === (("b.com", 2L, 100L, true)))
  }

  test("unconfigured host uses the default delay") {
    assert(run()("https://c.com/only") === (("c.com", 1L, 0L, true)))
  }

  test("horizon cuts the tick batch, keeps the carried-over frontier") {
    val got = run(horizon = 2001L)
    assert(got("https://a.com/3")._4 === true)   // 2000 < 2001
    assert(got("https://a.com/1")._4 === false)  // 4000 >= 2001
    assert(got.size === 6) // nothing dropped, just flagged
  }

  test("guards") {
    intercept[IllegalArgumentException] {
      Frontier.crawlSchedule(frontier, col("url"), col("pri"),
        delays, col("h"), col("ms"), 0L, 1L)
    }
  }
}
