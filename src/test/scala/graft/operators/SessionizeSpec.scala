package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gap-based sessions split exactly at gaps > maxGap") {
    val events = Seq(
      (1L, 100L), (1L, 150L), (1L, 200L),  // session 0 (gaps 50)
      (1L, 500L), (1L, 520L),              // session 1 (gap 300 > 100)
      (2L, 90L), (2L, 191L))               // user 2: gap 101 > 100 → two sessions
      .toDF("user_id", "ts")
    val out = Sessionize.addSessions(events, "user_id", "ts", maxGap = 100L)
      .select("user_id", "ts", "session_seq")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 100L, 0L), (1L, 150L, 0L), (1L, 200L, 0L),
      (1L, 500L, 1L), (1L, 520L, 1L),
      (2L, 90L, 0L), (2L, 191L, 1L)))
    val stats = Sessionize.sessionStats(events, "user_id", "ts", 100L)
      .where($"user_id" === 1L && $"session_seq" === 0L).collect()(0)
    assert(stats.getAs[Long]("events") == 3L)
    assert(stats.getAs[Long]("duration") == 100L)
  }

  test("boundary: gap exactly maxGap stays in the same session") {
    val out = Sessionize.addSessions(
        Seq((1L, 0L), (1L, 100L)).toDF("k", "ts"), "k", "ts", maxGap = 100L)
      .select("session_seq").as[Long].collect().toSet
    assert(out == Set(0L))
  }
}
