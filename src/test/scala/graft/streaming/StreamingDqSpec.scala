package graft.streaming

import graft.TestSpark
import graft.rules._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamingDqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val suite: RuleSuite = RuleSuite(Id(1, 1), Seq(RuleSet(Id(2, 1), Seq(
    Rule(Id(3, 1), "value >= 0")))))

  test("DQ column on a stream with windowed pass rate") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val stream = mem.toDF().toDF("ts", "value")

    val out = StreamingDq.windowedPassRate(stream, suite, "ts", "10 minutes", "5 minutes")
    val query = out.writeStream.format("memory").queryName("dq_stream")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2026-01-01 10:01:00")
      val t1 = Timestamp.valueOf("2026-01-01 10:05:00")
      val late = Timestamp.valueOf("2026-01-01 11:00:00") // advances watermark, closes window
      mem.addData((t0, 1.0), (t0, -2.0), (t1, 3.0))
      query.processAllAvailable()
      mem.addData((late, 5.0))
      query.processAllAvailable()
      val rows = spark.sql("SELECT rows, passed, pass_rate FROM dq_stream").collect()
      assert(rows.nonEmpty)
      val first = rows.head
      assert(first.getLong(0) == 3 && first.getLong(1) == 2)
      assert(math.abs(first.getDouble(2) - 2.0 / 3.0) < 1e-9)
    } finally query.stop()
  }

  test("file-source stream over the events parquet with engine runner") {
    // nanos timestamps read as long under the legacy flag; windowing uses
    // the converted micros column — same shape as the batch q_events_window
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file-source streams need a directory
    val dir = java.nio.file.Files.createTempDirectory("graft_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    val schema = spark.read.parquet(dir.toString).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val suite = RuleSuite(Id(7, 1), Seq(RuleSet(Id(8, 1), Seq(
      Rule(Id(80, 1), "value >= 0", Some(OutputExpression(1, Id(90, 1), "'ok'"))),
      Rule(Id(81, 1), "value < 0", Some(OutputExpression(2, Id(91, 1), "'neg'")))))))
    val out = RuleEngine.addRuleEngine(stream, suite, "re")
      .select(col("re.result").as("band"))
    val q = out.writeStream.format("memory").queryName("dq_files").outputMode("append").start()
    try {
      q.processAllAvailable()
      val bands = spark.sql("SELECT band, count(*) c FROM dq_files GROUP BY 1").collect()
      assert(bands.map(_.getString(0)).toSet.subsetOf(Set("ok", "neg")))
      assert(bands.map(_.getLong(1)).sum > 0)
    } finally q.stop()
  }

  test("streaming exact dedup keeps first arrival, bounded by watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val stream = mem.toDF().toDF("ts", "text")
    val out = StreamingDq.streamingExactDedup(stream, "ts", "10 minutes", col("text"))
    val query = out.writeStream.format("memory").queryName("dq_dedup")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2026-01-01 10:00:00")
      val t1 = Timestamp.valueOf("2026-01-01 10:02:00")
      mem.addData((t0, "alpha"), (t0, "beta"), (t1, "alpha")) // dup within watermark
      query.processAllAvailable()
      val texts = spark.sql("SELECT text FROM dq_dedup").as[String].collect().sorted
      assert(texts.toSeq == Seq("alpha", "beta"))
    } finally query.stop()
  }

  test("streaming minhash near-dup flags colliding docs with banded state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val stream = mem.toDF().toDF("ts", "doc_id", "text")
    val out = StreamingDedup.streamingNearDupCandidates(
      stream, "doc_id", "text", "ts", "10 minutes", shingleSize = 2)
    val query = out.writeStream.format("memory").queryName("nd_stream")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2026-01-01 10:00:00")
      val t1 = Timestamp.valueOf("2026-01-01 10:03:00")
      mem.addData(
        (t0, 1L, "the quick brown fox jumps over the lazy dog again and again"),
        (t0, 2L, "completely different content about spark sql engines and state"))
      query.processAllAvailable()
      mem.addData(
        (t1, 3L, "the quick brown fox jumps over the lazy dog again and again today"),
        (t1, 4L, "unrelated third text on streaming watermarks and bucket timeouts"))
      query.processAllAvailable()
      val hits = spark.sql("SELECT docId, firstId, count(*) AS nbands FROM nd_stream GROUP BY 1,2")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      // doc 3 near-duplicates doc 1: collides in many bands; 2 and 4 are clean
      assert(hits.keySet == Set((3L, 1L)), s"unexpected collisions: $hits")
      assert(hits((3L, 1L)) >= 2)
    } finally query.stop()
  }

  test("streaming sessionization closes gap-separated sessions at the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val stream = mem.toDF().toDF("ts", "user")
    val out = StreamingDq.streamingSessionStats(stream, "user", "ts", "5 minutes", "10 minutes")
    val query = out.writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      // u1: two events 2min apart (one session), then a 20-min gap → next
      // event opens a second session; u2: one event
      mem.addData(
        (Timestamp.valueOf("2026-01-01 10:00:00"), "u1"),
        (Timestamp.valueOf("2026-01-01 10:02:00"), "u1"),
        (Timestamp.valueOf("2026-01-01 10:22:00"), "u1"),
        (Timestamp.valueOf("2026-01-01 10:01:00"), "u2"))
      query.processAllAvailable()
      mem.addData((Timestamp.valueOf("2026-01-01 12:00:00"), "u1")) // advance watermark
      query.processAllAvailable()
      val rows = spark.sql(
        "SELECT user, events, duration_secs FROM sess_stream ORDER BY user, duration_secs DESC")
        .as[(String, Long, Long)].collect().toSeq
      assert(rows == Seq(("u1", 2L, 420L), ("u1", 1L, 300L), ("u2", 1L, 300L)),
        s"unexpected sessions: $rows")
    } finally query.stop()
  }

  test("streaming bloom build grows membership across batches and persists") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val stream = mem.toDF().toDF("k")
    val path = java.nio.file.Files.createTempDirectory("graft_sbloom").toString + "/bloom"
    val query = StreamingBloom.bloomBuilder(
        stream, col("k"), "stream_keys", expected = 10000, fpp = 0.01,
        persistPath = Some(path))
      .start()
    try {
      mem.addData(1L to 50L: _*)
      query.processAllAvailable()
      def probe(k: Long): Double = Seq(k).toDF("k")
        .select(graft.functions.dsl.probability_in(col("k"), "stream_keys").as("p"))
        .as[Double].collect()(0)
      assert(probe(7L) > 0.9)
      assert(probe(9999L) == 0.0) // not yet streamed
      mem.addData(9999L) // second batch ORs into the running filter
      query.processAllAvailable()
      assert(probe(9999L) > 0.9)
      assert(probe(7L) > 0.9, "earlier batch lost in merge")
      assert(probe(424242L) == 0.0)
      // persisted bytes reload to the same membership (restart resume)
      graft.bloom.BloomModel.loadAndRegister(spark, "stream_keys_reloaded", path)
      val p = Seq(7L).toDF("k")
        .select(graft.functions.dsl.probability_in(col("k"), "stream_keys_reloaded").as("p"))
        .as[Double].collect()(0)
      assert(p > 0.9)
    } finally query.stop()
  }

  test("heavy-hitters sketch aggregates inside a watermarked stream window") {
    implicit val sqlCtx = spark.sqlContext
    graft.functions.Registry.registerAll(spark)
    val mem = MemoryStream[(Timestamp, String)]
    val stream = mem.toDF().toDF("ts", "v")
    val out = stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(expr("approx_heavy_hitters(v, 4)").as("hh"))
      .select(col("window.start").as("ws"), col("hh"))
    val query = out.writeStream.format("memory").queryName("hh_stream")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2026-01-01 10:05:00")
      mem.addData(Seq.fill(30)((t0, "hot")) ++ Seq.fill(5)((t0, "warm")) :+ ((t0, "cold")): _*)
      query.processAllAvailable()
      mem.addData((Timestamp.valueOf("2026-01-01 12:00:00"), "later")) // close the window
      query.processAllAvailable()
      val m = spark.sql("SELECT hh FROM hh_stream LIMIT 1").collect()(0).getMap[String, Long](0)
      assert(m("hot") == 30L && m("warm") == 5L)
    } finally query.stop()
  }

  test("plain DQ column composes on streaming frames") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Double]
    val stream = mem.toDF().toDF("value")
    val out = StreamingDq.withDataQuality(stream, suite)
      .select(col("DataQuality.overallResult").as("o"))
    val query = out.writeStream.format("memory").queryName("dq_plain").outputMode("append").start()
    try {
      mem.addData(1.0, -1.0)
      query.processAllAvailable()
      val res = spark.sql("SELECT o FROM dq_plain").as[Int].collect().sorted
      assert(res.toSeq == Seq(0, 100000))
    } finally query.stop()
  }
}
