package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HITS fixed-point: agreement with an independent scalar implementation
 * of the same integer recursion, hub/authority structure recovery, and
 * partition invariance. */
class HitsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def reference(edges: Seq[(String, String)], iters: Int,
      scale: Long): Map[String, (Long, Long)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var hub = nodes.map(_ -> scale).toMap
    var auth = Map.empty[String, Long]
    for (_ <- 1 to iters) {
      val aRaw = nodes.map(v => v -> edges.collect {
        case (u, w) if w == v => hub(u) }.sum).toMap
      val aDiv = aRaw.values.max / scale + 1
      auth = aRaw.map { case (v, r) => v -> r / aDiv }
      val hRaw = nodes.map(u => u -> edges.collect {
        case (x, v) if x == u => auth(v) }.sum).toMap
      val hDiv = hRaw.values.max / scale + 1
      hub = hRaw.map { case (u, r) => u -> r / hDiv }
    }
    nodes.map(n => n -> (hub(n), auth(n))).toMap
  }

  private val web = Seq(
    // h1, h2, h3 are hubs pointing at authorities a1, a2; a1 also links h1
    ("h1", "a1"), ("h1", "a2"), ("h2", "a1"), ("h2", "a2"), ("h3", "a1"),
    ("a1", "h1"), ("x", "y"))

  test("matches the scalar reference exactly across iteration counts") {
    for (iters <- 1 to 4) {
      val got = Graphs.hitsFixed(web.toDF("s", "d").repartition(5),
          col("s"), col("d"), iterations = iters)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got === reference(web, iters, 1000000000L), s"iters=$iters")
    }
  }

  test("hubs and authorities separate: pure hubs high hub, zero auth") {
    val got = Graphs.hitsFixed(web.toDF("s", "d"), col("s"), col("d"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // h2 links both top authorities -> best hub; a1 is cited by all hubs
    assert(got("h2")._1 === got.values.map(_._1).max)
    assert(got("a1")._2 === got.values.map(_._2).max)
    assert(got("h3")._2 === 0L)  // nothing links to h3
    assert(got("a2")._1 === 0L)  // a2 links nothing
  }

  test("partition invariance") {
    val a = Graphs.hitsFixed(web.toDF("s", "d").repartition(7), col("s"), col("d"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b = Graphs.hitsFixed(web.toDF("s", "d"), col("s"), col("d"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }
}
