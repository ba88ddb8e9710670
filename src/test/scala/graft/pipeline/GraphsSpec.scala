package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Plain-Scala reference of the exact fixed-point semantics: same integer
   * truncations in the same places, no Spark. */
  private def refPageRank(
      edges: Seq[(Long, Long)], nodes: Seq[Long],
      iterations: Int, dampPct: Long = 85L, scale: Long = 1000000000000L): Map[Long, Long] = {
    val n = nodes.distinct.size
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val init = scale / n
    val base = ((100L - dampPct) * init) / 100L
    var ranks = nodes.distinct.map(_ -> init).toMap
    for (_ <- 1 to iterations) {
      val contrib = edges
        .map { case (s, d) => d -> ranks(s) / deg(s) }
        .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      ranks = ranks.map { case (id, _) =>
        id -> (base + dampPct * contrib.getOrElse(id, 0L) / 100L)
      }
    }
    ranks
  }

  private def run(
      edges: Seq[(Long, Long)], nodes: Seq[Long], iterations: Int): Map[Long, Long] =
    Graphs.pageRankFixed(
        edges.toDF("src", "dst"), col("src"), col("dst"),
        nodes = nodes.toDF("id"), nodeIdCol = col("id"),
        iterations = iterations)
      .as[(Long, Long)].collect().toMap

  test("matches the integer-exact reference on a cycle (symmetric ranks)") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    val got = run(edges, Seq(0L, 1L, 2L), iterations = 5)
    assert(got == refPageRank(edges, Seq(0L, 1L, 2L), 5))
    assert(got.values.toSet.size == 1) // cycle is symmetric: all equal
  }

  test("star graph: hub outranks leaves, exact vs reference") {
    // 5 leaves all pointing at the hub; hub points back at leaf 1
    val edges = Seq(1L, 2L, 3L, 4L, 5L).map(_ -> 0L) :+ (0L -> 1L)
    val nodes = 0L to 5L
    val got = run(edges, nodes, iterations = 4)
    assert(got == refPageRank(edges, nodes, 4))
    assert(got(0L) > got(2L) && got(1L) > got(2L)) // hub and its pick lead
    assert(Seq(2L, 3L, 4L, 5L).map(got).toSet.size == 1) // leaves identical
  }

  test("dangling node and edge-free node both settle at teleport-base rank") {
    // 0 -> 1 -> 2 (dangling, no out-edges); 3 has no edges at all
    val edges = Seq((0L, 1L), (1L, 2L))
    val nodes = Seq(0L, 1L, 2L, 3L)
    val got = run(edges, nodes, iterations = 6)
    assert(got == refPageRank(edges, nodes, 6))
    val base = ((100L - 85L) * (1000000000000L / 4)) / 100L
    assert(got(0L) == base) // nothing points at 0: base only
    assert(got(3L) == base) // edge-free node stays in the universe at base
    assert(got(2L) > base)  // dangling node still RECEIVES rank
  }

  test("result is exact under any partitioning of the edge list") {
    val edges = (0L until 200L).flatMap(i =>
      Seq((i, (i * 31 + 7) % 200), (i, (i * 97 + 13) % 200))).filter(p => p._1 != p._2)
    val nodes = 0L until 200L
    val expected = refPageRank(edges, nodes, 3)
    val df1 = edges.toDF("src", "dst").repartition(1)
    val df7 = edges.toDF("src", "dst").repartition(7, col("dst"))
    val r1 = Graphs.pageRankFixed(df1, col("src"), col("dst"),
      nodes.toDF("id"), col("id")).as[(Long, Long)].collect().toMap
    val r7 = Graphs.pageRankFixed(df7, col("src"), col("dst"),
      nodes.toDF("id"), col("id")).as[(Long, Long)].collect().toMap
    assert(r1 == expected)
    assert(r7 == expected)
  }

  test("mass only decreases (integer truncation), never grows") {
    val edges = (0L until 100L).map(i => (i, (i * 7 + 3) % 100)).filter(p => p._1 != p._2)
    val got = run(edges, 0L until 100L, iterations = 5)
    assert(got.values.sum <= 1000000000000L)
    assert(got.values.sum > 900000000000L) // and stays close to full mass
  }

  test("node universe defaults to edge endpoints when nodes is omitted") {
    val got = Graphs.pageRankFixed(
        Seq((10L, 20L), (20L, 10L), (20L, 30L)).toDF("src", "dst"),
        col("src"), col("dst"), iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(10L, 20L, 30L))
  }
}
