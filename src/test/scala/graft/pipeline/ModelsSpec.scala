package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Model persistence round-trips: scores after load are bit-identical. */
class ModelsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("classifier round-trip scores bit-identically") {
    val train = Seq(("good words here", 1.0), ("zz11 qq22 spam", 0.0)).toDF("text", "y")
    val m = Classifier.train(train, col("text"), col("y"), dim = 128, iters = 5)
    val path = tmp("graft_clf")
    Models.saveClassifier(spark, path, m)
    val loaded = Models.loadClassifier(spark, path)
    assert(loaded.dim == m.dim && loaded.seed == m.seed)
    assert(loaded.weights.sameElements(m.weights))
    val docs = Seq("good words", "zz11 spam", "").toDF("t")
    val before = docs.select(Classifier.score(m, col("t"))).as[Double].collect().toSeq
    val after = docs.select(Classifier.score(loaded, col("t"))).as[Double].collect().toSeq
    assert(before == after)
  }

  test("bpe round-trip preserves merge ranks") {
    val m = Bpe.learnMerges(Seq("low lower lowest").toDF("text"), col("text"),
      numMerges = 4, minCount = 1)
    val path = tmp("graft_bpe")
    Models.saveBpe(spark, path, m)
    val loaded = Models.loadBpe(spark, path)
    assert(loaded.merges.toSeq == m.merges.toSeq)
    assert(BpeAlgos.encodeWord("lowest", loaded).toSeq == Seq("lowe", "s", "t"))
  }

  test("lm round-trip stays distributed and scores identically") {
    val corpus = Seq("a b", "a c", "b a c").toDF("text")
    val m = Lm.train(corpus, col("text"))
    val path = tmp("graft_lm")
    Models.saveLm(spark, path, m)
    val loaded = Models.loadLm(spark, path)
    val docs = Seq((1L, "a b c"), (2L, "c zzz")).toDF("id", "text")
    def run(mm: Lm.LmModel) = Lm.score(mm, docs, col("id"), col("text"))
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(run(m) == run(loaded))
  }

  test("order-3 lm round-trips via the trigrams directory, order preserved") {
    val corpus = Seq("a b c", "a b d", "b a c").toDF("text")
    val m = Lm.train(corpus, col("text"), order = 3)
    val path = tmp("graft_lm3")
    Models.saveLm(spark, path, m)
    val loaded = Models.loadLm(spark, path)
    assert(loaded.order == 3)
    val docs = Seq((1L, "a b c d"), (2L, "c b zzz")).toDF("id", "text")
    def run(mm: Lm.LmModel) = Lm.score(mm, docs, col("id"), col("text"))
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(run(m) == run(loaded))
    // an order-2 save must load back as order 2 even beside an order-3 dir
    val m2 = Lm.train(corpus, col("text"))
    val path2 = tmp("graft_lm2")
    Models.saveLm(spark, path2, m2)
    assert(Models.loadLm(spark, path2).order == 2)
  }

  test("order-5 lm round-trips via the ngrams4/ngrams5 directories, order preserved") {
    val corpus = Seq("a b c d e", "a b c d f", "b a c e d").toDF("text")
    val m = Lm.train(corpus, col("text"), order = 5)
    val path = tmp("graft_lm5")
    Models.saveLm(spark, path, m)
    val loaded = Models.loadLm(spark, path)
    assert(loaded.order == 5)
    val docs = Seq((1L, "a b c d e f"), (2L, "c b a d zzz")).toDF("id", "text")
    def run(mm: Lm.LmModel) = Lm.score(mm, docs, col("id"), col("text"))
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(run(m) == run(loaded))
    // order 4 loads back as 4 (no ngrams5 dir ends the contiguous scan)
    val m4 = Lm.train(corpus, col("text"), order = 4)
    val path4 = tmp("graft_lm4")
    Models.saveLm(spark, path4, m4)
    assert(Models.loadLm(spark, path4).order == 4)
    // re-saving a LOWER order over a higher one must clear the stale upper
    // tables — otherwise loadLm would stitch fresh low-order counts to the
    // old corpus's 4/5-gram counts and score silently wrong
    Models.saveLm(spark, path, m4) // order 5 dir downgraded to order 4
    assert(Models.loadLm(spark, path).order == 4)
    Models.saveLm(spark, path, Lm.train(corpus, col("text")))
    assert(Models.loadLm(spark, path).order == 2)
    assert(run(Models.loadLm(spark, path)) == run(Lm.train(corpus, col("text"))))
  }

  test("dsir round-trip scores bit-identically through the inline path") {
    val raw = Seq((1L, "cat dog bird"), (2L, "stock market crash")).toDF("doc_id", "text")
    val target = Seq(Tuple1("cat dog")).toDF("text")
    val m = Dsir.collectModel(Dsir.train(raw, col("text"), target, col("text"), 128))
    val path = tmp("graft_dsir")
    Models.saveDsir(spark, path, m)
    val loaded = Models.loadDsir(spark, path)
    assert(loaded.llrE6.toSeq == m.llrE6.toSeq)
    def run(mm: DsirArrayModel) = Dsir.weightInline(mm, raw, col("doc_id"), col("text"))
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(run(m) == run(loaded))
  }

  test("sq round-trip encodes bit-identically") {
    val embs = Seq((1L, Seq(0.1f, 0.9f)), (2L, Seq(0.5f, 0.2f))).toDF("vec_id", "embedding")
    val p = Sq.train(embs, col("embedding"))
    val path = tmp("graft_sq")
    Models.saveSq(spark, path, p)
    val loaded = Models.loadSq(spark, path)
    assert(loaded.mins.toSeq == p.mins.toSeq && loaded.ranges.toSeq == p.ranges.toSeq)
    def codes(pp: SqParams) = Sq.encodeDf(embs, col("vec_id"), col("embedding"), pp)
      .orderBy("id").collect().map(_.getAs[Array[Byte]](1).toSeq).toSeq
    assert(codes(p) == codes(loaded))
  }
}
