package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deflate compression-ratio quality signal: template spam compresses far
 * below prose, encoded junk refuses to compress, long-range repetition that
 * word-level signals miss is caught, degenerate inputs are neutral, and the
 * signal is deterministic across partition layouts. */
class CompressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ratioOf(text: String): Double =
    Seq(text).toDF("t").select(Text.compressionRatio(col("t"))).as[Double].collect().head

  // deterministic pseudo-random word salad (no java.util.Random state leaks)
  private def saladWords(n: Int): Seq[String] =
    (0 until n).map { i =>
      val h = graft.functions.Theta.hash63(i.toLong, org.apache.spark.sql.types.LongType)
      java.lang.Long.toString(h, 36)
    }

  test("ordering: template spam < prose < base64-ish junk") {
    val spam = "click here to win a free prize now " * 200
    val prose = ("the committee considered seventeen proposals during its morning " +
      "session and rejected most of them for lacking adequate funding detail " +
      "while the remainder advanced to a second reading next week ") * 8
    val junk = saladWords(1200).mkString("")
    val (rSpam, rProse, rJunk) = (ratioOf(spam), ratioOf(prose), ratioOf(junk))
    assert(rSpam < 0.05, s"template spam should collapse, got $rSpam")
    assert(rProse > rSpam && rProse < 0.6, s"prose in the healthy band, got $rProse")
    assert(rJunk > 0.6, s"high-entropy junk refuses to compress, got $rJunk")
  }

  test("long-range repetition invisible to word-level signals is caught") {
    // a 200-DISTINCT-word paragraph stamped 50 times: every word repeats 50x
    // at range ~200 words — dup-line/paragraph signals see it only if the
    // unit boundaries align; deflate collapses it regardless
    val para = saladWords(200).mkString(" ")
    val stamped = (para + " ") * 50
    val shuffledSameWords = {
      // same multiset of words in a hash-shuffled global order: no long-range
      // structure, so it must NOT collapse like the stamped version
      val all = (0 until 50).flatMap(rep => saladWords(200).map(w => (w, rep)))
      all.sortBy { case (w, rep) => graft.functions.Theta.hash63(
          org.apache.spark.unsafe.types.UTF8String.fromString(s"$w#$rep"),
          org.apache.spark.sql.types.StringType) }
        .map(_._1).mkString(" ")
    }
    val rStamped = ratioOf(stamped)
    val rShuffled = ratioOf(shuffledSameWords)
    assert(rStamped < 0.05, s"stamped template should collapse, got $rStamped")
    assert(rShuffled > 2 * rStamped,
      s"same words without structure must compress much worse: $rShuffled vs $rStamped")
  }

  test("degenerate inputs: empty is neutral 1.0, null propagates") {
    assert(ratioOf("") == 1.0)
    val r = Seq(Option.empty[String]).toDF("t")
      .select(Text.compressionRatio(col("t")).as("r")).collect().head
    assert(r.isNullAt(0))
  }

  test("deterministic across partition layouts and registered for SQL") {
    graft.functions.Registry.registerAll(spark)
    val docs = (1 to 500).map(i => (i.toLong, s"document number $i " * (i % 7 + 1))).toDF("id", "t")
    val one = docs.repartition(1).select(col("id"), Text.compressionRatio(col("t")).as("r"))
      .as[(Long, Double)].collect().toMap
    val many = docs.repartition(17).select(col("id"), Text.compressionRatio(col("t")).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(one == many)
    docs.createOrReplaceTempView("graft_zr_sql")
    val viaSql = spark.sql("SELECT id, compression_ratio(t) AS r FROM graft_zr_sql")
      .as[(Long, Double)].collect().toMap
    assert(viaSql == one)
  }
}
