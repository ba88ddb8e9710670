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

  /** Reference TrustRank: teleport and init only on seeds, same integer
   * truncation points as the engine. */
  private def refTrustRank(
      edges: Seq[(Long, Long)], nodes: Seq[Long], seeds: Set[Long],
      iterations: Int, dampPct: Long = 85L, scale: Long = 1000000000000L): Map[Long, Long] = {
    val present = nodes.distinct.filter(seeds)
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val init = scale / present.size
    val base = ((100L - dampPct) * init) / 100L
    var ranks = nodes.distinct.map(id => id -> (if (seeds(id)) init else 0L)).toMap
    for (_ <- 1 to iterations) {
      val contrib = edges
        .map { case (s, d) => d -> ranks(s) / deg(s) }
        .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      ranks = ranks.map { case (id, _) =>
        id -> ((if (seeds(id)) base else 0L) + dampPct * contrib.getOrElse(id, 0L) / 100L)
      }
    }
    ranks
  }

  test("trustRank: trust flows from seeds; unreachable spam scores zero") {
    // seeds {0,1}; chain 0→2→3; spam ring {8,9} links itself and INTO 0
    val edges = Seq((0L, 2L), (2L, 3L), (1L, 2L), (8L, 9L), (9L, 8L), (8L, 0L))
    val nodes = Seq(0L, 1L, 2L, 3L, 8L, 9L)
    val got = Graphs.trustRankFixed(
        edges.toDF("src", "dst"), col("src"), col("dst"),
        Seq(0L, 1L).toDF("s"), col("s"),
        nodes.toDF("id"), col("id"), iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == refTrustRank(edges, nodes, Set(0L, 1L), 4))
    assert(got(8L) == 0L && got(9L) == 0L) // no seed path in → exactly zero
    assert(got(2L) > 0L && got(3L) > 0L)   // downstream of seeds → trusted
    // linking INTO a seed earns the spam ring nothing (teleport is seed-only)
  }

  test("trustRank: seeds outside the node universe are ignored") {
    val edges = Seq((0L, 1L))
    val got = Graphs.trustRankFixed(
        edges.toDF("src", "dst"), col("src"), col("dst"),
        Seq(0L, 777L).toDF("s"), col("s"), iterations = 2)
      .as[(Long, Long)].collect().toMap
    // universe {0,1}: only seed 0 is present → it gets the FULL seed mass
    assert(got == refTrustRank(Seq((0L, 1L)), Seq(0L, 1L), Set(0L), 2))
  }

  test("tolFp early stop: a loose tolerance stops after one iteration") {
    val edges = Seq(1L, 2L, 3L, 4L, 5L).map(_ -> 0L) :+ (0L -> 1L)
    val nodes = 0L to 5L
    def run(iters: Int, tol: Long) = Graphs.pageRankFixed(
        edges.toDF("src", "dst"), col("src"), col("dst"),
        nodes.toDF("id"), col("id"), iterations = iters, tolFp = tol)
      .as[(Long, Long)].collect().toMap
    // L1 delta is bounded by 2x total mass (mass leaves AND arrives), so
    // tol = 2·scale can never be exceeded → stops at iter 1
    assert(run(8, tol = 2000000000000L) == refPageRank(edges, nodes, 1))
    // tol = 0 semantics (disabled) run to the cap
    assert(run(8, tol = 0L) == refPageRank(edges, nodes, 8))
    // a 3-cycle is a fixed point of the iteration: delta is exactly 0
    // after the first step, so even tol = 1 stops immediately — and the
    // answer equals any deeper fixed-iteration run
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    val got = Graphs.pageRankFixed(cyc.toDF("src", "dst"), col("src"), col("dst"),
        iterations = 50, tolFp = 1L).as[(Long, Long)].collect().toMap
    assert(got == refPageRank(cyc, Seq(0L, 1L, 2L), 50))
  }

  test("anchorTerms: per-target-host term counts from real parses") {
    val pages = Seq(
      Tuple1("""<a href="https://t.com/a">Great Docs</a><a href="https://u.com/">docs</a>"""),
      Tuple1("""<a href="https://t.com/b">great docs here</a><a href="/rel">skip</a>"""))
      .toDF("html")
    val got = Graphs.anchorTerms(pages, col("html"))
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("t.com", "great", 2L), ("t.com", "docs", 2L), ("t.com", "here", 1L),
      ("u.com", "docs", 1L)))
  }

  test("hostProfile joins rank, reciprocation, degrees and optional trust") {
    val pages = Seq(
      ("https://a.com/1", """<a href="https://b.com/x">b</a><a href="https://b.com/y">b2</a>"""),
      ("https://b.com/1", """<a href="https://a.com/">a</a>"""),
      ("https://c.com/1", """<a href="https://a.com/">a</a>"""))
      .toDF("url", "html")
    val prof = Graphs.hostProfile(pages, col("url"), col("html"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // a↔b reciprocate; c links one-way; in_links counts multigraph edges
    assert(prof("a.com")._2 == 1L && prof("a.com")._4 == 1000000L) // out=|{b}|, full recip
    assert(prof("b.com")._5 == 2L)  // two parallel a→b links
    assert(prof("c.com")._2 == 1L && prof("c.com")._4 == 0L)
    assert(prof.values.forall(_._1 > 0L)) // everyone has rank mass
    val withTrust = Graphs.hostProfile(pages, col("url"), col("html"),
        seeds = Seq("a.com").toDF("h"), seedHostCol = col("h"))
      .collect().map(r => r.getString(0) -> r.getLong(6)).toMap
    assert(withTrust("b.com") > 0L)   // downstream of the seed
    assert(withTrust("c.com") == 0L)  // no seed path into c
  }

  test("streaming host-edge intake accumulates; rank refresh sees all batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_gstream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_gstream_ck").toString
    val mem = MemoryStream[(String, String)]
    val q = Graphs.streamingHostEdges(
      mem.toDF().toDF("url", "html"), col("url"), col("html"), out, ckpt)
    try {
      mem.addData(
        ("https://a.com/1", """<a href="https://b.com/x">b</a>"""),
        ("https://b.com/1", """<a href="https://c.com/">c</a><a href="/rel">r</a>"""))
      q.processAllAvailable()
      mem.addData(("https://c.com/1", """<a href="https://a.com/">a</a>"""))
      q.processAllAvailable()
      val edges = Graphs.edgeTable(spark, out)
        .as[(String, String)].collect().toSeq.sorted
      assert(edges == Seq(("a.com", "b.com"), ("b.com", "c.com"), ("c.com", "a.com")))
      // the refresh runs the plain fixed-point rank over the union: a
      // 3-cycle is symmetric, so all hosts rank equal
      val ranks = Graphs.rankEdgeTable(spark, out, iterations = 4)
        .as[(String, Long)].collect().toMap
      assert(ranks.keySet == Set("a.com", "b.com", "c.com"))
      assert(ranks.values.toSet.size == 1)
    } finally q.stop()
  }

  test("connectedComponents: chains, direction-blind, isolated nodes, strings") {
    // two chains (0→1→2→3, 10→11→12) with MIXED edge directions plus an
    // isolated node 99 supplied via the universe
    val edges = Seq((0L, 1L), (2L, 1L), (2L, 3L), (11L, 10L), (11L, 12L))
    val got = Graphs.connectedComponents(
        edges.toDF("src", "dst"), col("src"), col("dst"),
        nodes = (Seq(99L) ++ Seq(0L, 1L, 2L, 3L, 10L, 11L, 12L)).toDF("id"),
        nodeIdCol = col("id"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 99L -> 99L))
    // string keys: lexicographic min becomes the component label
    val hosts = Seq(("b.com", "a.com"), ("b.com", "c.com")).toDF("s", "t")
    val hc = Graphs.connectedComponents(hosts, col("s"), col("t"))
      .as[(String, String)].collect().toMap
    assert(hc == Map("a.com" -> "a.com", "b.com" -> "a.com", "c.com" -> "a.com"))
  }

  test("warm-start CC from previous labels equals a cold run on the union") {
    val oldEdges = Seq((0L, 1L), (1L, 2L), (10L, 11L), (20L, 21L))
    val prev = Graphs.connectedComponents(
      oldEdges.toDF("src", "dst"), col("src"), col("dst"))
    // a new crawl merges {10,11} into {0,1,2}, adds a fresh pair {30,31}
    val allEdges = oldEdges ++ Seq((2L, 10L), (30L, 31L))
    val warm = Graphs.connectedComponentsFrom(prev,
        allEdges.toDF("src", "dst"), col("src"), col("dst"))
      .as[(Long, Long)].collect().toMap
    val cold = Graphs.connectedComponents(
        allEdges.toDF("src", "dst"), col("src"), col("dst"))
      .as[(Long, Long)].collect().toMap
    assert(warm == cold)
    assert(warm(11L) == 0L && warm(30L) == 30L && warm(21L) == 20L)
    // previous-only nodes (dropped from the new edge set) keep their row
    val prunedWarm = Graphs.connectedComponentsFrom(prev,
        Seq((0L, 1L)).toDF("src", "dst"), col("src"), col("dst"))
      .as[(Long, Long)].collect().toMap
    assert(prunedWarm.keySet.contains(20L)) // still in the universe via prev
  }

  test("connectedComponents converges on a long chain (diameter iterations)") {
    val chain = (0L until 40L).map(i => (i, i + 1))
    val got = Graphs.connectedComponents(chain.toDF("src", "dst"), col("src"), col("dst"))
      .as[(Long, Long)].collect().toMap
    assert(got.size == 41 && got.values.toSet == Set(0L))
  }

  test("reciprocalLinkRatio: exchanges score high, one-way links score 0") {
    // ring a↔b, a↔c (full exchange); d links a,b,c one-way; parallel dup kept out
    val edges = Seq(
      ("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"), ("a", "b"), // dup distinct'd
      ("d", "a"), ("d", "b"), ("d", "c"), ("a", "a"))             // self-loop dropped
    val got = Graphs.reciprocalLinkRatio(edges.toDF("s", "t"), col("s"), col("t"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") == ((2L, 2L, 1000000L))) // both neighbors link back
    assert(got("b") == ((1L, 1L, 1000000L)))
    assert(got("d") == ((3L, 0L, 0L)))       // nobody links back to d
  }

  test("coCitations: canonical pairs, hub sources dropped by maxOutDeg") {
    val hub = (1 to 10).map(i => ("hub", s"t$i")) // outdeg 10 > cap → dropped
    val edges = Seq(
      ("s1", "x"), ("s1", "y"), ("s2", "x"), ("s2", "y"),
      ("s3", "y"), ("s3", "x"), ("s4", "x"), ("s4", "z")) ++ hub
    val got = Graphs.coCitations(edges.toDF("s", "t"), col("s"), col("t"),
        maxOutDeg = 5, minCount = 2L)
      .as[(String, String, Long)].collect().toSet
    // (x,y) co-cited by s1,s2,s3; (x,z) only once → cut by minCount
    assert(got == Set(("x", "y", 3L)))
  }

  test("seedDistances: exact min hops, directed, frontier settles, cap honored") {
    // 1→2→3→4→5 chain plus a shortcut 1→4 and an unreachable island 9→10
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L), (9L, 10L))
      .toDF("s", "d")
    def run(maxHops: Int, seeds: Seq[Long]) =
      Graphs.seedDistances(edges, col("s"), col("d"),
          seeds.toDF("id"), col("id"), maxHops)
        .as[(Long, Int)].collect().toMap
    assert(run(10, Seq(1L)) ==
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 2)) // shortcut wins
    assert(run(1, Seq(1L)) == Map(1L -> 0, 2L -> 1, 4L -> 1)) // cap
    // multi-seed: min over seeds; directed — nothing reaches 9
    assert(run(10, Seq(3L, 9L)) ==
      Map(3L -> 0, 9L -> 0, 4L -> 1, 10L -> 1, 5L -> 2))
  }

  test("triangleCounts: exact per-node counts, each triangle once, K4 and stars") {
    // K4 on 1..4 (4 triangles, 3 per node) + a star center 9 (no triangles)
    // + duplicate/reversed edges that must not double-count
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val edges = (k4 ++ Seq((2L, 1L), (9L, 10L), (9L, 11L), (9L, 12L)))
      .toDF("s", "d")
    val got = Graphs.triangleCounts(edges, col("s"), col("d"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(got.values.sum == 12L) // 4 triangles x 3 corners
  }

  test("clusteringCoefficients: K4 hits 1e6 ppm, stars 0, degree-1 guarded") {
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val edges = (k4 ++ Seq((9L, 10L), (9L, 11L), (9L, 12L))).toDF("s", "d")
    val got = Graphs.clusteringCoefficients(edges, col("s"), col("d"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((3L, 3L, 1000000L)))
    assert(got(9L) == ((3L, 0L, 0L)))
    assert(got(10L) == ((1L, 0L, 0L))) // C(1,2)=0: null-guarded to 0
  }

  test("pageRankWeighted: equal weights == unweighted bit for bit; heavy edges dominate") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (2L, 1L)).toDF("s", "d")
    val un = Graphs.pageRankFixed(edges, col("s"), col("d"), iterations = 4)
      .as[(Long, Long)].collect().toMap
    val eq = Graphs.pageRankWeighted(edges.withColumn("w", lit(7L)),
        col("s"), col("d"), col("w"), iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(eq == un) // ⌊r·k/(k·d)⌋ == ⌊r/d⌋ exactly
    val skew = Seq((1L, 2L, 9L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("s", "d", "w")
    val got = Graphs.pageRankWeighted(skew, col("s"), col("d"), col("w"))
      .as[(Long, Long)].collect().toMap
    assert(got(2L) > got(3L)) // 9x the share of node 1's rank
    intercept[IllegalArgumentException] {
      Graphs.pageRankWeighted(skew.withColumn("w", lit(0L)),
        col("s"), col("d"), col("w")).collect()
    }
  }

  test("kCore: cascading peel, star centers fall, K4 core survives") {
    // K4 (1..4) + a tail 4-5-6 + star 9->10,11,12: 2-core = exactly K4
    // (5 dies once 6 dies; the star evaporates entirely)
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L),
      (9L, 10L), (9L, 11L), (9L, 12L))).toDF("s", "d")
    val core2 = Graphs.kCore(edges, col("s"), col("d"), 2)
      .as[(Long, Long)].collect().toMap
    assert(core2 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val core3 = Graphs.kCore(edges, col("s"), col("d"), 3)
      .as[(Long, Long)].collect().toMap
    assert(core3.keySet == Set(1L, 2L, 3L, 4L)) // K4 is a 3-core
    assert(Graphs.kCore(edges, col("s"), col("d"), 4).isEmpty)
    intercept[IllegalArgumentException] {
      Graphs.kCore(edges, col("s"), col("d"), 0)
    }
  }

  test("node universe defaults to edge endpoints when nodes is omitted") {
    val got = Graphs.pageRankFixed(
        Seq((10L, 20L), (20L, 10L), (20L, 30L)).toDF("src", "dst"),
        col("src"), col("dst"), iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(10L, 20L, 30L))
  }
}
