package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gale–Church alignment: planted identity/deletion/merge structures
 * recovered, DP optimality vs exhaustive enumeration on small pairs,
 * skip marker, empty inputs, end-to-end over the DataFrame face. */
class BitextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // independent re-implementation of the cost model for the brute-force
  // optimality check (same published formulas, coded separately)
  private def refPnorm(z: Double): Double = {
    val t = 1.0 / (1.0 + 0.2316419 * z)
    1.0 - 0.3989422804014327 * math.exp(-z * z / 2.0) * t *
      (0.319381530 + t * (-0.356563782 + t * (1.781477937 +
        t * (-1.821255978 + t * 1.330274429))))
  }
  private def refCost(l1: Int, l2: Int): Double =
    if (l1 == 0 && l2 == 0) 0.0
    else {
      val delta = math.abs((l2 - l1) / math.sqrt((l1 + l2) / 2.0 * 6.8))
      -math.log(math.max(2.0 * (1.0 - refPnorm(delta)), 1e-300))
    }
  private val refPriors = Seq((1, 1) -> 0.89, (1, 0) -> 0.0099, (0, 1) -> 0.0099,
    (2, 1) -> 0.089, (1, 2) -> 0.089, (2, 2) -> 0.011)

  /** Exhaustive min-cost alignment by recursion (tiny inputs only). */
  private def brute(a: Array[Int], b: Array[Int]): (Double, List[(Int, Int, Int, Int)]) = {
    def go(i: Int, j: Int): (Double, List[(Int, Int, Int, Int)]) =
      if (i == a.length && j == b.length) (0.0, Nil)
      else refPriors.flatMap { case ((di, dj), p) =>
        if (i + di > a.length || j + dj > b.length) None
        else {
          val l1 = (i until i + di).map(a).sum
          val l2 = (j until j + dj).map(b).sum
          val (rest, beads) = go(i + di, j + dj)
          Some((refCost(l1, l2) - math.log(p) + rest, (i, di, j, dj) :: beads))
        }
      }.minBy(_._1)
    go(0, 0)
  }

  test("identity bitext aligns all 1-1") {
    val a = Array(50, 60, 55, 70, 42)
    assert(Bitext.alignPair(a, a) ===
      a.indices.map(i => (i, 1, i, 1)))
  }

  test("untranslated aside: absorbed as 2-1 (the model's documented optimum)") {
    // a 1-0 deletion pays its prior (~4.6 nats) PLUS the (l,0) length
    // likelihood, so absorbing a short aside into the neighboring bead as
    // 2-1 is cheaper — assert the DP lands on the enumerated optimum and
    // the aside is indeed folded into a multi-sentence bead
    val a = Array(50, 8, 55, 70)
    val b = Array(50, 55, 70) // the 8-char aside is untranslated
    val got = Bitext.alignPair(a, b)
    assert(got === brute(a, b)._2)
    assert(got.contains((1, 2, 1, 1)), s"expected the 2-1 absorption in $got")
  }

  test("planted merge shows as a 2-1 bead") {
    val a = Array(40, 35, 60, 50)
    val b = Array(40, 97, 50) // sentences 1+2 merged (35+60 ~ 97)
    assert(Bitext.alignPair(a, b) ===
      Seq((0, 1, 0, 1), (1, 2, 1, 1), (3, 1, 2, 1)))
  }

  test("DP matches exhaustive enumeration on random small pairs") {
    val rnd = new scala.util.Random(4242)
    for (_ <- 0 until 40) {
      val a = Array.fill(1 + rnd.nextInt(5))(10 + rnd.nextInt(90))
      val b = Array.fill(1 + rnd.nextInt(5))(10 + rnd.nextInt(90))
      val (_, beads) = brute(a, b)
      assert(Bitext.alignPair(a, b) === beads, s"a=${a.toSeq} b=${b.toSeq}")
    }
  }

  test("empty sides produce pure insertion/deletion beads") {
    assert(Bitext.alignPair(Array.empty, Array.empty) === Seq.empty)
    assert(Bitext.alignPair(Array(30, 40), Array.empty) ===
      Seq((0, 1, 0, 0), (1, 1, 0, 0)))
  }

  test("DataFrame face: beads per pair, skip marker over the cap") {
    val sents = (1 to 4).map(i => "x" * (30 + i * 7))
    val big = (1 to 20).map(_ => "y" * 30)
    val df = Seq(
      (1L, sents, sents),
      (2L, big, big)).toDF("pid", "a", "b")
    val got = Bitext.galeChurchAlign(df, col("pid"), col("a"), col("b"),
        maxSentences = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getString(5), r.getBoolean(6)))
    val p1 = got.filter(_._1 == 1L)
    assert(p1.length === 4 && p1.forall(b => b._6 == "1-1" && !b._7))
    val p2 = got.filter(_._1 == 2L)
    assert(p2.length === 1 && p2.head._6 === "skipped" && p2.head._7)
  }
}
