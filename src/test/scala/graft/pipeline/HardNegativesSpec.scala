package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hard-negative mining: exact wrong-group top-k vs a local model, null
 * group semantics, and candidate-path equality under over-fetch. */
class HardNegativesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // three tight clusters on axes; within-cluster sims ≈ 1, across ≈ 0
  private val rows: Seq[(Long, Seq[Float], Int)] = Seq(
    (1L, Seq(1f, 0f, 0f), 0), (2L, Seq(0.9f, 0.1f, 0f), 0),
    (3L, Seq(0f, 1f, 0f), 1), (4L, Seq(0.1f, 0.9f, 0f), 1),
    (5L, Seq(0f, 0f, 1f), 2), (6L, Seq(0f, 0.1f, 0.9f), 2))

  private def model(k: Int) = {
    def cos(a: Seq[Float], b: Seq[Float]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    (for ((qi, qv, qg) <- rows) yield qi ->
      rows.filter { case (ni, _, ng) => ni != qi && ng != qg }
        .map { case (ni, nv, _) => (ni, cos(qv, nv)) }
        .sortBy { case (ni, s) => (-s, ni) }.take(k).map(_._1)).toMap
  }

  test("exact wrong-group top-k matches the local model; no same-group leaks") {
    val df = rows.toDF("id", "vec", "grp")
    val out = Similarity.mineHardNegatives(df, df, "id", "vec", "grp", 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
    val got = out.groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    assert(got == model(2))
    val groups = rows.map(r => r._1 -> r._3).toMap
    assert(out.forall { case (q, n, _) => groups(q) != groups(n) })
  }

  test("candidate-path over-fetch equals brute once k' covers the same-group prefix") {
    val df = rows.toDF("id", "vec", "grp")
    val cand = Similarity.bruteForceTopK(df, df, "id", "vec", k = 5)
    val viaCand = Similarity.hardNegativesFromCandidates(
        cand, df, "id", "grp", k = 2)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)]
      .collect().toSet
    val direct = Similarity.mineHardNegatives(df, df, "id", "vec", "grp", 2)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)]
      .collect().toSet
    assert(viaCand == direct)
  }

  test("null groups are negatives for every non-null group and vice versa") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        | (1L, array(1.0F, 0.0F), 0),
        | (2L, array(0.9F, 0.1F), CAST(NULL AS INT)),
        | (3L, array(0.8F, 0.2F), CAST(NULL AS INT)) t(id, vec, grp)""".stripMargin)
    val pairs = Similarity.mineHardNegatives(df, df, "id", "vec", "grp", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // null<=>null is a SAME group (both unknown ≠ usable negative)
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)))
  }
}
