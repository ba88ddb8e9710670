package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact-substring span dedup: duplicated windows keep only their first
 * occurrence; spans merge; untouched docs pass through canonicalized. */
class DedupSpansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val shared = (1 to 25).map(i => s"s$i").mkString(" ")

  private def run(rows: Seq[(Long, String)], w: Int = 20) =
    Dedup.dedupSpans(rows.toDF("doc_id", "text"), col("doc_id"), col("text"), w)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3))))
      .toMap

  test("cross-doc shared run removed from the later doc only") {
    val a = s"u1 u2 u3 u4 u5 $shared"
    val b = s"v1 v2 v3 v4 v5 $shared"
    val out = run(Seq(0L -> a, 1L -> b))
    assert(out(0L) == ((a, 30, 0)))
    assert(out(1L) == (("v1 v2 v3 v4 v5", 30, 25)))
  }

  test("within-doc repeat keeps the first occurrence") {
    val run20 = (1 to 20).map(i => s"r$i").mkString(" ")
    val doc = s"$run20 middle words here $run20"
    val out = run(Seq(5L -> doc))
    // words 0..19 kept, 20..22 kept, 23..42 flagged (second occurrence)
    assert(out(5L) == ((s"$run20 middle words here", 43, 20)))
  }

  test("short and empty docs pass through with whitespace canonicalized") {
    val out = run(Seq(0L -> "only  a\tfew words", 1L -> "", 2L -> "   "))
    assert(out(0L) == (("only a few words", 4, 0)))
    assert(out(1L) == (("", 0, 0)))
    assert(out(2L) == (("", 0, 0)))
  }

  test("null text behaves like empty, same contract as dedupLines") {
    val out = Dedup.dedupSpans(
        Seq((1L, Option.empty[String]), (2L, Some("a b"))).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(1L) == (("", 0, 0)))
    assert(out(2L) == (("a b", 2, 0)))
  }

  test("three-way duplicate: first doc keeps, both later docs lose the span") {
    val docs = Seq(10L -> s"a1 a2 $shared", 11L -> s"b1 b2 $shared", 12L -> s"c1 c2 $shared")
    val out = run(docs)
    assert(out(10L)._3 == 0)
    assert(out(11L) == (("b1 b2", 27, 25)))
    assert(out(12L) == (("c1 c2", 27, 25)))
  }

  private def planNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    p match {
      case a: AdaptiveSparkPlanExec => planNodes(a.executedPlan)
      case q: QueryStageExec => q +: planNodes(q.plan)
      case other => other +: other.children.flatMap(planNodes)
    }
  }

  test("span decontamination excises verbatim benchmark passages only") {
    val passage = (1 to 6).map(i => s"bench$i").mkString(" ") // 6-word benchmark
    val d = Seq(
      (1L, s"clean words before $passage clean words after ok"),   // leak in the middle
      (2L, "totally unrelated document with its own words here"),  // untouched
      (3L, passage)                                                // pure leak → emptied
    ).toDF("doc_id", "text")
    val bench = Seq(Tuple1(s"some context $passage more context")).toDF("text")
    val out = Dedup.decontaminateSpans(d, col("doc_id"), col("text"), bench, col("text"),
        windowWords = 6)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(3))).toMap
    assert(out(1L)._1 == "clean words before clean words after ok")
    assert(out(1L)._2 == 6)
    assert(out(2L) == ("totally unrelated document with its own words here", 0))
    assert(out(3L) == ("", 6))
  }

  test("first-occurrence ranking is a mergeable aggregate — no window operator") {
    val df = Seq(0L -> shared, 1L -> shared).toDF("doc_id", "text")
    val out = Dedup.dedupSpans(df, col("doc_id"), col("text"), 3)
    out.collect() // finalize the adaptive plan
    val windows = planNodes(out.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty,
      "span dedup must rank first occurrences with min(struct(id,pos)) partial " +
        s"aggregation, never a per-hash window (hot-key funnel at scale):\n${windows.mkString}")
  }

  test("hyper-duplicated window floods stay bounded: 100k copies of one content") {
    // one window content occurring 100k times: with a per-hash window this is
    // a single 100k-row reducer key; the aggregate path pre-combines map-side
    val n = 100000
    val df = spark.range(n).select(col("id").as("doc_id"), lit("x1 x2 x3").as("text"))
    val out = Dedup.dedupSpans(df, col("doc_id"), col("text"), 3)
      .agg(sum(when(col("n_removed") > 0, 1).otherwise(0)).as("docs_hit"),
        sum(col("n_removed")).as("words_removed"))
      .collect()(0)
    assert(out.getLong(0) == n - 1)      // every copy but the (0,0) first loses its span
    assert(out.getLong(1) == 3L * (n - 1))
  }

  test("rolling window hashes: equal windows collide, distinct windows don't (randomized)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val rng = new scala.util.Random(99)
    val vocab = Vector("a", "b", "ab", "ba", "aa", "longword", "x1", "x2")
    for (_ <- 1 to 200) {
      val w = 2 + rng.nextInt(4)
      val n = w + rng.nextInt(30)
      val words = Array.fill(n)(vocab(rng.nextInt(vocab.size)))
      val arr = new GenericArrayData(words.map(UTF8String.fromString(_)): Array[Any])
      val hs = SpanAlgos.windowHashes(arr, w)
      assert(hs.numElements() == n - w + 1)
      // the rolling recurrence must agree with hash equality semantics:
      // equal word windows hash equal, distinct windows hash distinct
      // (2^-64 collisions would need ~2^32 windows to plausibly appear)
      val byContent = (0 until hs.numElements()).groupBy(i => words.slice(i, i + w).toSeq)
      byContent.foreach { case (_, idxs) =>
        assert(idxs.map(hs.getLong).distinct.size == 1, "equal windows must collide")
      }
      val distinctContents = byContent.keySet.size
      val distinctHashes = (0 until hs.numElements()).map(hs.getLong).distinct.size
      assert(distinctHashes == distinctContents,
        s"distinct windows must hash apart: $distinctHashes hashes for $distinctContents contents")
    }
  }

  test("overlapping flagged windows merge into one span (no double count)") {
    // doc 1 duplicates doc 0 entirely at w=3: every window flagged, whole
    // text removed, n_removed == n_words
    val t = "w1 w2 w3 w4 w5 w6"
    val out = run(Seq(0L -> t, 1L -> t), w = 3)
    assert(out(0L) == ((t, 6, 0)))
    assert(out(1L) == (("", 6, 6)))
  }

  test("spanLengthReport: islands merge when overlapping OR adjacent, split on gaps") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // shared 3-word runs planted inside unique filler (w=3):
    //   docB repeats docA's words 0..4  -> one merged 5-word span
    //   docC repeats docA's words 0..2 and 6..8 (gap) -> two 3-word spans
    //   docD repeats docA's words 0..2 and 3..5 (adjacent) -> ONE 6-word span
    val a = "s1 s2 s3 s4 s5 s6 s7 s8 s9"
    val docs = Seq(
      (0L, "ga", a),                                        // first occurrence: keeps all
      (1L, "gb", "s1 s2 s3 s4 s5 ub1 ub2 ub3 ub4"),         // 5-word overlap run
      (2L, "gc", "s1 s2 s3 uc1 uc2 uc3 s7 s8 s9"),          // two gapped 3-word runs
      (3L, "gd", "s1 s2 s3 s4 s5 s6 ud1 ud2 ud3")           // 6-word adjacent run
    ).toDF("id", "grp", "t")
    val rep = Dedup.spanLengthReport(docs, col("id"), col("t"), col("grp"),
        windowWords = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    // docD's windows at 0..3 flag (0,1,2,3): spans [0,3),[1,4),[2,5),[3,6)
    // chain into ONE island of length 6; docC's two runs stay separate
    assert(rep == Set(("gb", 5, 1L), ("gc", 3, 2L), ("gd", 6, 1L)),
      s"got $rep")
  }
}
