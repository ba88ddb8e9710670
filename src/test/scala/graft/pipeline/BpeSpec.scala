package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Classic BPE on the textbook low/lower/lowest corpus — merge order and
 * greedy encoding are hand-verifiable. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq("low lower lowest").toDF("text")

  test("merge order: count first, lexicographic pair on ties") {
    val m = Bpe.learnMerges(corpus, col("text"), numMerges = 4, minCount = 1)
    assert(m.merges.toSeq == Seq(("l", "o"), ("lo", "w"), ("low", "e"), ("lowe", "r")))
  }

  test("greedy encode follows merge ranks") {
    val m = Bpe.learnMerges(corpus, col("text"), numMerges = 4, minCount = 1)
    assert(BpeAlgos.encodeWord("low", m).toSeq == Seq("low"))
    assert(BpeAlgos.encodeWord("lower", m).toSeq == Seq("lower"))
    assert(BpeAlgos.encodeWord("lowest", m).toSeq == Seq("lowe", "s", "t"))
    // unseen characters stay single symbols
    assert(BpeAlgos.encodeWord("lox", m).toSeq == Seq("lo", "x"))
  }

  test("token count and token array columns, codegen enabled") {
    val m = Bpe.learnMerges(corpus, col("text"), numMerges = 4, minCount = 1)
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = Seq("low lower lowest", "").toDF("t")
        .select(Bpe.tokenCount(m, col("t")).as("n"), Bpe.tokens(m, col("t")).as("toks"))
        .collect()
      assert(r(0).getInt(0) == 5)
      assert(r(0).getSeq[String](1) == Seq("low", "lower", "lowe", "s", "t"))
      assert(r(1).getInt(0) == 0)
    } finally prev.foreach(spark.conf.set("spark.sql.codegen.fallback", _))
  }

  test("maxVocab caps the trainer dictionary at the most frequent words") {
    // vocab of 4; cap of 2 keeps {aaaa, bbbb} (top counts) and drops the
    // c/d words entirely — no learned merge may involve their symbols
    val docs = (Seq.fill(10)("aaaa") ++ Seq.fill(5)("bbbb") ++
      Seq.fill(2)("cccc") ++ Seq.fill(2)("dddd")).toDF("text")
    val capped = Bpe.learnMerges(docs, col("text"), numMerges = 50,
      minCount = 1, maxVocab = 2)
    assert(capped.merges.nonEmpty)
    assert(capped.merges.forall { case (a, b) =>
      !(a + b).exists(ch => ch == 'c' || ch == 'd') },
      s"capped trainer must never see c/d words: ${capped.merges.toSeq}")
    // uncapped control DOES learn c merges, proving the cap did the cutting
    val full = Bpe.learnMerges(docs, col("text"), numMerges = 50, minCount = 1)
    assert(full.merges.exists { case (a, b) => (a + b).contains('c') })
    // cap ties break lexicographically: cccc vs dddd tie at count 2, cap=3 keeps cccc
    val cap3 = Bpe.learnMerges(docs, col("text"), numMerges = 50,
      minCount = 1, maxVocab = 3)
    assert(cap3.merges.exists { case (a, b) => (a + b).contains('c') })
    assert(cap3.merges.forall { case (a, b) => !(a + b).contains('d') })
  }

  test("merges exhaust gracefully when no pairs remain") {
    val m = Bpe.learnMerges(Seq("ab ab").toDF("text"), col("text"),
      numMerges = 50, minCount = 1)
    assert(m.merges.toSeq == Seq(("a", "b"))) // one possible merge, then stop
  }

  test("learned table is deterministic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m1 = Bpe.learnMerges(docs, col("text"), numMerges = 30, minCount = 5)
    val m2 = Bpe.learnMerges(docs.repartition(7), col("text"), numMerges = 30, minCount = 5)
    assert(m1.merges.toSeq == m2.merges.toSeq)
  }

  test("token counts converge to word counts as the merge table grows") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def total(numMerges: Int) = {
      val m = Bpe.learnMerges(docs, col("text"), numMerges, minCount = 5)
      docs.select(sum(Bpe.tokenCount(m, col("text"))).as("exact"))
        .collect().head.getLong(0)
    }
    val words = docs.select(sum(Text.tokenCount(col("text"))).as("w"))
      .collect().head.getLong(0)
    val coarse = total(10)   // few merges: clearly subword
    val fine = total(100)    // this corpus's small vocab merges to whole words
    assert(coarse > fine, s"more merges must not increase counts ($coarse vs $fine)")
    assert(coarse > words, s"10-merge tokenization must be subword ($coarse vs $words)")
    assert(fine >= words, s"tokens can never undercut whitespace words ($fine vs $words)")
  }

  test("greedy rank encode == trainer-style rank-order replay on random words") {
    // cross-implementation property: the ENCODER merges the lowest-rank
    // pair repeatedly (leftmost on ties), the TRAINER rewrites the dict
    // with one left-to-right pass per merge in rank order — two different
    // algorithms whose segmentations must coincide (the GPT-2 style
    // equivalence). A divergence means token counts drift from the vocab
    // the trainer actually learned. Random 3-letter-alphabet words force
    // the overlap cases ("aaaa", "abab") where the algorithms could split.
    val rnd = new scala.util.Random(31)
    def word(): String =
      (0 until (1 + rnd.nextInt(8))).map(_ => "abc"(rnd.nextInt(3))).mkString
    val corpus = (1 to 300).map(_ => word())
    val df = corpus.grouped(10).map(_.mkString(" ")).toSeq.toDF("text")
    val m = Bpe.learnMerges(df, col("text"), numMerges = 40, minCount = 1)
    assert(m.merges.length == 40)
    def replay(w: String): Seq[String] = {
      var syms = w.map(_.toString).toVector
      m.merges.foreach { case (a, b) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toVector
      }
      syms
    }
    (corpus.distinct ++ (1 to 500).map(_ => word())).foreach { w =>
      assert(BpeAlgos.encodeWord(w, m).toSeq == replay(w), s"diverged on '$w'")
    }
  }
}
