package graft.operators

import graft.TestSpark
import graft.operators.Linkage.LinkField
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fellegi–Sunter linkage: blocking-pass union + cap, agreement bits and
 * fixed-point scores, EM convergence on planted duplicates, thresholds,
 * and transitive entity resolution. */
class LinkageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (id, name, city, phone): 1↔2 same person (1-edit name, same city+phone),
  // 3 unrelated sharing the city block, 4↔5 same person across cities
  // (same name+phone), 6 alone in its city, null-city 7 sits out blocking
  private def people = Seq(
    (1L, "ada lovelace", "london", "111"),
    (2L, "ada lovelac", "london", "111"),
    (3L, "charles babbage", "london", "222"),
    (4L, "alan turing", "bletchley", "333"),
    (5L, "alan turing", "manchester", "333"),
    (6L, "grace hopper", "newyork", "444"),
    (7L, "ada lovelace", null, "111")
  ).toDF("id", "name", "city", "phone")

  private val fields = Seq(
    LinkField("name", col("name"), (a, b) => levenshtein(a, b) <= 1, 4000000L, -3000000L),
    LinkField("city", col("city"), (a, b) => a === b, 1000000L, -500000L),
    LinkField("phone", col("phone"), (a, b) => a === b, 3000000L, -1000000L))

  test("candidatePairs unions blocking passes, dedups, honors the cap") {
    val byCity = Linkage.candidatePairs(people, col("id"), Seq(col("city")))
      .as[(Long, Long)].collect().toSet
    assert(byCity == Set((1L, 2L), (1L, 3L), (2L, 3L))) // null city sits out
    val both = Linkage.candidatePairs(people, col("id"), Seq(col("city"), col("phone")))
      .as[(Long, Long)].collect().toSet
    assert(both == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (1L, 7L), (2L, 7L)))
    // cap 2: the 3-row london and 3-row phone-111 blocks are skipped;
    // only the 2-row phone-333 block survives
    val capped = Linkage.candidatePairs(people, col("id"), Seq(col("city"), col("phone")),
      maxBlockSize = 2).as[(Long, Long)].collect().toSet
    assert(capped == Set((4L, 5L)))
  }

  test("scoredPairs computes agreement bits and exact micro scores") {
    val out = Linkage.scoredPairs(people, col("id"), Seq(col("city"), col("phone")), fields)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getLong(5))).toMap
    assert(out((1L, 2L)) == ((true, true, true, 8000000L)))
    assert(out((1L, 3L)) == ((false, true, false, -3000000L)))
    assert(out((4L, 5L)) == ((true, false, true, 6500000L)))
    // null city on id 7 → city disagree, not null score
    assert(out((1L, 7L)) == ((true, false, true, 6500000L)))
  }

  test("classify splits match / possible / nonmatch on the thresholds") {
    val scored = Linkage.scoredPairs(people, col("id"), Seq(col("city"), col("phone")), fields)
    val d = Linkage.classify(scored, tUpperMicro = 7000000L, tLowerMicro = 0L)
      .select(col("id_a"), col("id_b"), col("decision"))
      .as[(Long, Long, String)].collect()
      .map { case (a, b, dec) => (a, b) -> dec }.toMap
    assert(d((1L, 2L)) == "match")
    assert(d((4L, 5L)) == "possible" && d((1L, 7L)) == "possible")
    assert(d((1L, 3L)) == "nonmatch" && d((2L, 3L)) == "nonmatch")
  }

  test("weightsMicro matches hand-computed log2 fixed-point") {
    val (wa, wd) = Linkage.weightsMicro(0.9, 0.1)
    assert(wa == math.round(math.log(9.0) / math.log(2.0) * 1e6))
    assert(wd == math.round(math.log(0.1 / 0.9) / math.log(2.0) * 1e6))
    intercept[IllegalArgumentException](Linkage.weightsMicro(0.1, 0.9))
  }

  test("estimateMU recovers discriminating fields on planted duplicates") {
    // 200 entities, each with a dup: name always agrees within the pair,
    // phone agrees for 90% of true pairs; across different entities both
    // mostly disagree but city collides often (weak field)
    val base = spark.range(0, 200).select(
      col("id"),
      concat(lit("person_"), col("id")).as("name"),
      (col("id") % 5).cast("string").as("city"),
      col("id").cast("string").as("phone"))
    val dups = base.select((col("id") + 1000).as("id"), col("name"),
      col("city"),
      // 10% of dups get a UNIQUE junk phone (a shared junk value would
      // form its own cluster and pull EM to a different local optimum)
      when(col("id") % 10 === 0, concat(lit("junk_"), col("id")))
        .otherwise(col("phone")).as("phone"))
    val all = base.unionAll(dups)
    val fs = Seq(
      LinkField("name", col("name"), (a, b) => a === b, 0L, 0L),
      LinkField("phone", col("phone"), (a, b) => a === b, 0L, 0L))
    val scored = Linkage.scoredPairs(all, col("id"), Seq(col("city")), fs)
    val est = Linkage.estimateMU(scored, Seq("name", "phone")).map {
      case (n, m, u) => n -> (m, u) }.toMap
    // name: perfect within true pairs, never across → m near 1, u near 0
    assert(est("name")._1 > 0.95, s"name m = ${est("name")._1}")
    assert(est("name")._2 < 0.05, s"name u = ${est("name")._2}")
    // phone: ~90% within true pairs
    assert(est("phone")._1 > 0.75 && est("phone")._1 < 0.99, s"phone m = ${est("phone")._1}")
    assert(est("phone")._2 < 0.05)
    // deterministic: same input, same estimates
    assert(Linkage.estimateMU(scored, Seq("name", "phone")).map {
      case (n, m, u) => n -> (m, u) }.toMap == est)
  }

  test("resolveEntities collapses transitive matches, leaves singletons alone") {
    // 1↔2 and 2↔8 match (name within 1 edit, same phone) but 1↔8 is 2 edits
    // apart — the entity must still merge transitively through 2
    val ppl = people.unionAll(Seq((8L, "ada lovela", "london", "111"))
      .toDF("id", "name", "city", "phone"))
    val ent = Linkage.resolveEntities(ppl, col("id"), Seq(col("city"), col("phone")),
        fields, tUpperMicro = 7000000L)
      .as[(Long, Long)].collect().toMap
    assert(ent(1L) == 1L && ent(2L) == 1L && ent(8L) == 1L)
    assert(ent(3L) == 3L && ent(6L) == 6L && ent(7L) == 7L)
    assert(ent(4L) == 4L && ent(5L) == 5L) // 4↔5 scored 6.5M, below tUpper
    assert(ent.size == 8)
  }

  test("blocking join moves ids and keys only; payloads join back by id") {
    val plan = Linkage.scoredPairs(people, col("id"), Seq(col("city")), fields)
      .queryExecution.optimizedPlan
    // the graft_key equi-join must not carry the compared value columns
    val keyJoin = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.exists(_.toString.contains("graft_key")) => j
    }
    assert(keyJoin.nonEmpty, s"no blocking join found:\n$plan")
    keyJoin.foreach { j =>
      val carried = j.children.flatMap(_.output).map(_.name)
      assert(!carried.exists(_.startsWith("graft_v")),
        s"blocking join carries payload columns: $carried")
    }
  }
}
