package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gates = Seq(
    "len"  -> (length(col("t")) >= 5),
    "vowel" -> col("t").rlike("[aeiou]"),
    "no_z" -> !col("t").contains("z"))

  test("stage outputs equal sequential filtering") {
    val df = Seq("alpha", "brrr", "zebra crossing", "xyz", "quiet one", "bz")
      .toDF("t")
    val f = Curation.retentionFunnel(df, gates).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val s1 = df.filter(gates(0)._2)
    val s2 = s1.filter(gates(1)._2)
    val s3 = s2.filter(gates(2)._2)
    assert(f(0) == ((1, "len", df.count(), df.count() - s1.count(), s1.count())))
    assert(f(1) == ((2, "vowel", s1.count(), s1.count() - s2.count(), s2.count())))
    assert(f(2) == ((3, "no_z", s2.count(), s2.count() - s3.count(), s3.count())))
  }

  test("row charged to FIRST failing gate only") {
    // "bz": fails len (first) AND vowel AND no_z — must count once, at len
    val df = Seq("bz").toDF("t")
    val f = Curation.retentionFunnel(df, gates).collect()
    assert(f(0).getAs[Long]("rows_dropped") == 1L)
    assert(f(1).getAs[Long]("rows_in") == 0L && f(1).getAs[Long]("rows_dropped") == 0L)
    assert(f(2).getAs[Long]("rows_dropped") == 0L)
  }

  test("null predicate drops the row (decidability is the gate's job)") {
    val df = Seq[(String, java.lang.Integer)](("ok row here", null), ("ok other", 3))
      .toDF("t", "score")
    val f = Curation.retentionFunnel(df, Seq("scored" -> (col("score") > 1)))
      .collect()
    assert(f(0).getAs[Long]("rows_dropped") == 1L)
    assert(f(0).getAs[Long]("rows_out") == 1L)
  }

  test("weight accounting: token mass in/dropped/out per stage") {
    val df = Seq("one two three four five", "a b", "keep me here too now yes")
      .toDF("t")
    val w = size(split(trim(col("t")), "\\s+"))
    val f = Curation.retentionFunnel(df, Seq("min5" -> (w >= 5)), w).collect()
    assert(f(0).getAs[Long]("weight_in") == 13L)
    assert(f(0).getAs[Long]("weight_dropped") == 2L)
    assert(f(0).getAs[Long]("weight_out") == 11L)
  }

  test("empty input: all-zero funnel, stages preserved") {
    val df = Seq.empty[String].toDF("t")
    val f = Curation.retentionFunnel(df, gates).collect()
    assert(f.length == 3)
    assert(f.forall(r => r.getAs[Long]("rows_in") == 0L
      && r.getAs[Long]("rows_dropped") == 0L && r.getAs[Long]("weight_out") == 0L))
  }

  test("staged weights: all-equal weights reduce exactly to retentionFunnel") {
    val df = Seq("alpha", "brrr", "zebra crossing", "xyz", "quiet one", "bz")
      .toDF("t")
    val w = size(split(trim(col("t")), "\\s+"))
    val plain = Curation.retentionFunnel(df, gates, w).collect().toSeq
    val staged = Curation.retentionFunnelStaged(
      df, gates, Seq.fill(gates.size + 1)(w)).collect().toSeq
    assert(staged == plain, s"\nstaged: $staged\nplain:  $plain")
  }

  test("staged weights: a rewrite stage charges scrubbed mass, totals conserved") {
    // three gates; content is rewritten at gate index 1 (the redact-and-
    // keep shape): weight entering stages 0-1 is raw, entering stage 2 and
    // the survivor tally is the rewritten weight
    val df = Seq(
      ("A", true, true, true, 10L, 7L),   // survives; 3 scrubbed at g1
      ("B", false, true, true, 5L, 4L),   // drops at g0, charged raw 5
      ("C", true, true, false, 8L, 6L))   // 2 scrubbed at g1, drops at g2
      .toDF("id", "g0", "g1", "g2", "raw", "red")
    val gs = Seq("g0" -> col("g0"), "g1" -> col("g1"), "g2" -> col("g2"))
    val f = Curation.retentionFunnelStaged(df, gs,
        Seq(col("raw"), col("raw"), col("red"), col("red")))
      .orderBy("stage").collect()
      .map(r => (r.getLong(5), r.getLong(6), r.getLong(7))) // in/dropped/out
    assert(f(0) == ((23L, 5L, 18L)), f.toSeq.toString)
    assert(f(1) == ((18L, 5L, 13L)), f.toSeq.toString) // 0 rows, 5 scrubbed
    assert(f(2) == ((13L, 6L, 7L)), f.toSeq.toString)
    // conservation: every stage's weight_out is the next stage's weight_in
    f.sliding(2).foreach { case Array(a, b) => assert(a._3 == b._1) }
  }

  test("windowed funnel: per-window stages equal the batch funnel on each slice") {
    import java.sql.Timestamp
    val rows = Seq(
      (Timestamp.valueOf("2026-01-01 00:00:10"), "alpha"),
      (Timestamp.valueOf("2026-01-01 00:00:40"), "bz"),
      (Timestamp.valueOf("2026-01-01 00:01:10"), "zebra crossing"),
      (Timestamp.valueOf("2026-01-01 00:01:20"), "quiet one"))
    val df = rows.toDF("ts", "t")
    val win = Curation.retentionFunnelWindowed(df, gates, col("ts"), "1 minute")
      .orderBy("window_start", "stage").collect()
    assert(win.length == 6) // 2 windows x 3 stages
    rows.groupBy(r => r._1.getTime / 60000).foreach { case (wk, slice) =>
      val batch = Curation.retentionFunnel(
        slice.toDF("ts", "t"), gates).orderBy("stage").collect()
      val wrows = win.filter(_.getAs[Timestamp]("window_start").getTime / 60000 == wk)
      batch.zip(wrows).foreach { case (b, w) =>
        Seq("rows_in", "rows_dropped", "rows_out").foreach { c =>
          assert(b.getAs[Long](c) == w.getAs[Long](c), s"$c drift in window $wk") }
      }
    }
  }

  test("windowed funnel runs on a live stream under a watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val out = Curation.retentionFunnelWindowed(
      mem.toDF().toDF("ts", "t").withWatermark("ts", "0 seconds"),
      gates, col("ts"), "1 minute")
    val q = out.writeStream.format("memory").queryName("funnel_win")
      .outputMode("append").start()
    try {
      mem.addData(
        (Timestamp.valueOf("2026-01-01 00:00:05"), "alpha"),
        (Timestamp.valueOf("2026-01-01 00:00:25"), "bz"))
      q.processAllAvailable()
      mem.addData((Timestamp.valueOf("2026-01-01 00:05:00"), "later row"))
      q.processAllAvailable() // watermark passes the first window -> emits
      val got = spark.sql(
        "SELECT stage, gate, rows_in, rows_dropped, rows_out FROM funnel_win " +
          "WHERE window_start = '2026-01-01 00:00:00' ORDER BY stage").collect()
      assert(got.length == 3)
      assert(got(0).getAs[Long]("rows_in") == 2L)   // len gate sees both
      assert(got(0).getAs[Long]("rows_dropped") == 1L) // 'bz' dies at len
      assert(got(2).getAs[Long]("rows_out") == 1L)  // 'alpha' survives all
    } finally q.stop()
  }

  test("validation: at least one gate") {
    intercept[IllegalArgumentException](
      Curation.retentionFunnel(Seq("x").toDF("t"), Seq.empty))
  }
}
