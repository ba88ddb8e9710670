package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM subword tokenizer: segmentation coverage (round-trip),
 * frequent-substring pieces emerge, EM monotonicity, prune keeps coverage,
 * partition-invariant training, OOV fallback, persistence, codegen. */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A corpus where "ing"/"er"/"un" style sub-units repeat across words. */
  private lazy val corpus = Seq.fill(20)(
    "running jumping singing ringing hunter runner singer " +
      "unhappy unkind unfair happy kind fair").toDF("text")

  private lazy val model =
    Unigram.train(corpus, col("text"), vocabSize = 60, maxPieceLen = 6,
      seedSize = 400, emIters = 4, minCount = 1L)

  test("every word round-trips: concatenated pieces rebuild the word") {
    val words = "running jumping singing ringing hunter runner singer unhappy unkind unfair happy kind fair"
      .split(" ")
    words.foreach { w =>
      val pieces = UnigramAlgos.encodeWord(w, model)
      assert(pieces.mkString("") == w, s"$w -> ${pieces.toSeq}")
      assert(pieces.nonEmpty)
    }
  }

  test("frequent sub-units become pieces and compress the encoding") {
    val ps = model.pieces.toSet
    assert(ps.contains("ing") || ps.contains("ning") || ps.contains("sing"),
      s"expected an -ing family piece in ${model.pieces.toSeq.filter(_.length > 1)}")
    // multi-char pieces exist at all, and the encoding of a training word
    // is shorter than character-splitting
    val enc = UnigramAlgos.encodeWord("running", model)
    assert(enc.length < "running".length, s"got ${enc.toSeq}")
  }

  test("EM iterations never decrease the training likelihood") {
    val wordCounts = corpus
      .select(explode(Text.words(col("text"), lowercase = true)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val lls = (1 to 4).map { iters =>
      val m = Unigram.train(corpus, col("text"), vocabSize = 60, maxPieceLen = 6,
        seedSize = 400, emIters = iters, minCount = 1L)
      Unigram.likelihoodOf(wordCounts, m)
    }
    lls.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-6, s"likelihood decreased across EM iterations: $lls")
    }
  }

  test("pruning keeps every single character — no word becomes unencodable") {
    val tiny = Unigram.train(corpus, col("text"), vocabSize = 30, maxPieceLen = 6,
      seedSize = 400, emIters = 2, minCount = 1L)
    val chars = corpus.as[String].collect().mkString(" ")
      .toLowerCase.replaceAll("\\s+", "").toSet
    chars.foreach { c =>
      assert(tiny.pieces.contains(c.toString), s"char $c pruned away")
    }
    assert(tiny.pieces.length <= 30 + chars.size)
  }

  test("training is a pure function of the word counts: partition invariant") {
    val a = Unigram.train(corpus.repartition(1), col("text"), vocabSize = 60,
      maxPieceLen = 6, seedSize = 400, emIters = 3, minCount = 1L)
    val b = Unigram.train(corpus.repartition(17), col("text"), vocabSize = 60,
      maxPieceLen = 6, seedSize = 400, emIters = 3, minCount = 1L)
    assert(a.pieces.toSeq == b.pieces.toSeq)
    assert(a.logProbs.toSeq == b.logProbs.toSeq, "log probs must be bit-identical")
  }

  test("OOV characters fall back to unk-scored singles; empty/null behave") {
    val pieces = UnigramAlgos.encodeWord("zzzqqq", model) // unseen chars
    assert(pieces.mkString("") == "zzzqqq")
    assert(UnigramAlgos.encodeWord("", model).isEmpty)
    val out = Seq(("a b", 1), (null.asInstanceOf[String], 2)).toDF("t", "i")
      .select(col("i"), Unigram.tokenCount(model, col("t")).as("n")).collect()
    assert(out.find(_.getInt(0) == 2).get.isNullAt(1))
  }

  test("token count and tokens agree and run under disabled codegen fallback") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rows = corpus.limit(1).select(
        Unigram.tokenCount(model, col("text")).as("n"),
        size(Unigram.tokens(model, col("text"))).as("m")).collect().head
      assert(rows.getInt(0) == rows.getInt(1) && rows.getInt(0) > 0)
    } finally prev.foreach(spark.conf.set("spark.sql.codegen.fallback", _))
  }

  test("degenerate corpora: empty frame and all-unique words under minCount") {
    // empty corpus → empty model; encoding still covers via the unk floor
    val empty = Unigram.train(Seq.empty[String].toDF("text"), col("text"),
      vocabSize = 10, seedSize = 10, minCount = 1L)
    assert(empty.pieces.isEmpty)
    assert(UnigramAlgos.encodeWord("abc", empty).toSeq == Seq("a", "b", "c"))
    // minCount filters every word → same empty-model path, no crash
    val filtered = Unigram.train(Seq("each word appears once only").toDF("text"),
      col("text"), vocabSize = 10, seedSize = 10, minCount = 2L)
    assert(filtered.pieces.isEmpty)
  }

  test("model persists to parquet and scores bit-identically after load") {
    val dir = java.nio.file.Files.createTempDirectory("graft_unigram").toString
    Models.saveUnigram(spark, dir, model)
    val loaded = Models.loadUnigram(spark, dir)
    assert(loaded.pieces.toSeq == model.pieces.toSeq)
    assert(loaded.logProbs.toSeq == model.logProbs.toSeq)
    val before = corpus.select(Unigram.tokenCount(model, col("text"))).as[Int].collect()
    val after = corpus.select(Unigram.tokenCount(loaded, col("text"))).as[Int].collect()
    assert(before.toSeq == after.toSeq)
  }

  test("Viterbi segmentation is OPTIMAL: equals exhaustive best over all splits") {
    // independent-algorithm cross-check for the rows-only tokenizer gates:
    // enumerate EVERY segmentation of short words (2^(n-1) splits, n <= 10),
    // score each exactly as the model does (table pieces; single OOV chars
    // at unkLogProb; multi-char pieces must exist), and assert the
    // production Viterbi's path score matches the exhaustive maximum.
    def score(segs: Seq[String]): Option[Double] = {
      var t = 0.0
      for (p <- segs) {
        val lp = model.table.get(p)
        if (lp != null) t += lp
        else if (p.length == 1) t += model.unkLogProb
        else return None
      }
      Some(t)
    }
    def allSegs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to w.length).flatMap(k =>
        allSegs(w.drop(k)).map(rest => w.take(k) +: rest))
    val rnd = new scala.util.Random(17)
    val seen = Seq("running", "unkind", "singer", "happy", "fair")
    val random = (1 to 150).map(_ =>
      (0 until (1 + rnd.nextInt(9))).map(_ => "runigshe?" (rnd.nextInt(9))).mkString)
    (seen ++ random).foreach { w =>
      val best = allSegs(w).flatMap(score).max
      val got = score(UnigramAlgos.encodeWord(w, model).toSeq)
        .getOrElse(fail(s"viterbi emitted an unscorable piece for '$w'"))
      assert(math.abs(got - best) <= 1e-9,
        s"'$w': viterbi score $got vs exhaustive best $best")
    }
  }
}
