package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential property tests: the distributed packing/sampling operators
 * must equal a trivial single-threaded reference implementation on seeded
 * random corpora (hand-rolled sampling — offline cache has no
 * scalatest↔scalacheck bridge). */
class PackingPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val rng = new scala.util.Random(20260812L)

  /** Same content-addressed uniform the operators use: md5 first-8-hex / 2^32. */
  private def u(id: Long): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
  }
  private def bucketOf(id: Long, n: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    (java.lang.Long.parseLong(hex, 16) % n).toInt
  }

  private def randomCorpus(): Seq[(Long, Long)] = {
    val n = rng.nextInt(120)
    val ids = Seq.fill(n)(rng.nextLong().abs % 1000000L).distinct
    ids.map(id => id -> (rng.nextLong().abs % 5000L))
  }

  test("packSequences equals the single-threaded reference layout") {
    (1 to 8).foreach { _ =>
      val corpus = randomCorpus()
      val ctx = rng.nextInt(1999) + 1
      val buckets = rng.nextInt(7) + 1
      val expected = corpus.groupBy { case (id, _) => bucketOf(id, buckets) }
        .flatMap { case (b, docs) =>
          var start = 0L
          docs.sortBy(_._1).map { case (id, tok) =>
            val row = (id, b.toLong, start / ctx, start % ctx,
              (start + math.max(tok - 1, 0)) / ctx, tok)
            start += tok
            row
          }
        }.toSet
      val got = Curation.packSequences(
          corpus.toDF("id", "tok"), col("id"), col("tok"), ctx, buckets)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(got == expected, s"ctx=$ctx buckets=$buckets corpus=${corpus.size}")
    }
  }

  test("packGreedy equals the single-threaded greedy reference") {
    (1 to 8).foreach { _ =>
      val corpus = randomCorpus()
      val budget = rng.nextInt(1999) + 1
      val buckets = rng.nextInt(7) + 1
      val expected = corpus.groupBy { case (id, _) => bucketOf(id, buckets) }
        .flatMap { case (b, docs) =>
          var seq = 0L
          var fill = 0L
          docs.sortBy(_._1).map { case (id, tok) =>
            if (fill > 0 && fill + tok > budget) { seq += 1; fill = 0L }
            val row = (id, b, seq, fill, tok, tok > budget)
            fill += tok
            row
          }
        }.toSet
      val got = Curation.packGreedy(
          corpus.toDF("id", "tok"), col("id"), col("tok"), budget, buckets)
        .as[(Long, Int, Long, Long, Long, Boolean)].collect().toSet
      assert(got == expected, s"budget=$budget buckets=$buckets corpus=${corpus.size}")
    }
  }

  test("sampleToTokenBudget equals the content-addressed reference selection") {
    (1 to 5).foreach { _ =>
      val corpus = randomCorpus().map { case (id, tok) =>
        (id, Seq("a", "b", "c")(rng.nextInt(3)), tok + 1) // non-zero tokens
      }
      if (corpus.nonEmpty) {
        val totals = corpus.groupBy(_._2).view.mapValues(_.map(_._3.toLong).sum).toMap
        val budgets = Map("a" -> (rng.nextLong().abs % 50000L),
          "b" -> (rng.nextLong().abs % 50000L))
        val expected = corpus.filter { case (id, dom, _) =>
          budgets.get(dom) match {
            case Some(budget) =>
              u(id) < math.min(1.0, budget.toDouble / totals(dom).toDouble)
            case None => true
          }
        }.map(_._1).toSet
        val got = Curation.sampleToTokenBudget(
            corpus.toDF("id", "dom", "tok"), col("id"), col("dom"), col("tok"), budgets)
          .select("id").as[Long].collect().toSet
        assert(got == expected, s"budgets=$budgets corpus=${corpus.size}")
      }
    }
  }
}
