package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val raw = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "stock market prices fell sharply today"),
    (3L, "the dog sat on the log"),
    (4L, "buy cheap pills online now click here"),
    (5L, "the cat and the dog played"),
    (6L, "   "),
    (7L, "market prices rose today")).toDF("doc_id", "text")

  // target distribution: animal sentences
  private val target = Seq(
    "the cat sat quietly", "a dog sat near the cat", "the cat chased the dog")
    .toDF("text")

  test("target-like docs outweigh off-target docs; featureless doc scores (0,0)") {
    val model = Dsir.train(raw, col("text"), target, col("text"), nBuckets = 256)
    val w = Dsir.weight(model, raw, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(w(6L) == (0L, 0L))
    // every animal doc beats every finance/spam doc on mean feature llr
    def mean(id: Long) = w(id)._2.toDouble / w(id)._1
    for (a <- Seq(1L, 3L, 5L); b <- Seq(2L, 4L, 7L))
      assert(mean(a) > mean(b), s"doc $a should outweigh doc $b")
  }

  test("weight equals the hand-computed sum of per-bucket micro log-ratios") {
    val nB = 64
    val model = Dsir.train(raw, col("text"), target, col("text"), nBuckets = nB)
    val llr = model.llr.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // replicate featureBuckets in plain Scala: md5-first-8-hex % nB over
    // lowercased unigrams + space-joined bigrams
    def bucket(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16) % nB
    }
    def feats(text: String): Seq[String] = {
      val ws = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      ws ++ ws.zip(ws.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val w = Dsir.weight(model, raw, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((id, text) <- Seq(1L -> "the cat sat on the mat",
                           4L -> "buy cheap pills online now click here")) {
      val fs = feats(text)
      assert(w(id) == (fs.size.toLong, fs.map(f => llr(bucket(f))).sum))
    }
  }

  test("resample is deterministic, sized n, and biased toward heavy docs") {
    val model = Dsir.train(raw, col("text"), target, col("text"), nBuckets = 256)
    val w = Dsir.weight(model, raw, col("doc_id"), col("text"))
    def run() = Dsir.resample(w, 3, temperature = 0.25)
      .collect().map(_.getLong(0)).toSet
    val s = run()
    assert(s.size == 3 && s == run())
    // at low temperature the sample is dominated by the top-weight docs
    val top = w.orderBy(col("weight_e6").desc).limit(3)
      .collect().map(_.getLong(0)).toSet
    assert((s intersect top).size >= 2)
  }

  test("inline projection scoring is bit-identical to the distributed join path") {
    val model = Dsir.train(raw, col("text"), target, col("text"), nBuckets = 512)
    val arr = Dsir.collectModel(model)
    assert(arr.nBuckets == 512)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val joined = rows(Dsir.weight(model, raw, col("doc_id"), col("text")))
    val inline = rows(Dsir.weightInline(arr, raw, col("doc_id"), col("text")))
    assert(joined == inline)
    // and the inline plan has NO shuffle — stateless, streaming-safe
    val plan = Dsir.weightInline(arr, raw, col("doc_id"), col("text"))
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, s"inline scoring must not shuffle:\n$plan")
  }

  test("inline/join parity holds on randomized unicode text (property)") {
    val rng = new scala.util.Random(1234)
    val alphabets = Seq(
      ('a' to 'z').mkString, "äöüßéèêñç", "世界再见你好汉字文本",
      "СЛОВАрусский", "🙂🚀‼", "0123456789$%&")
    def word(): String = {
      val a = alphabets(rng.nextInt(alphabets.size))
      (0 until (1 + rng.nextInt(5))).map(_ => a(rng.nextInt(a.length))).mkString
    }
    val docsDf = (0L until 60L)
      .map(i => (i, (0 until rng.nextInt(12)).map(_ => word()).mkString(" ")))
      .toDF("doc_id", "text")
    val model = Dsir.train(docsDf, col("text"),
      docsDf.where(col("doc_id") < 20), col("text"), nBuckets = 128)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows(Dsir.weight(model, docsDf, col("doc_id"), col("text"))) ==
      rows(Dsir.weightInline(Dsir.collectModel(model), docsDf, col("doc_id"), col("text"))))
  }

  test("unseen-bucket features get the pure smoothing ratio, not a crash") {
    val model = Dsir.train(raw, col("text"), target, col("text"), nBuckets = 256)
    val other = Seq((9L, "zzqx9 vvkk7")).toDF("doc_id", "text")
    val w = Dsir.weight(model, other, col("doc_id"), col("text")).collect()
    assert(w.length == 1 && w.head.getLong(1) == 3L) // 2 unigrams + 1 bigram
  }

  test("train releases staging caches; DsirModel.release drops the llr pin") {
    spark.catalog.clearCache()
    val raw = (1L to 20L).map(i => (i, s"common words here ${i % 7}")).toDF("doc_id", "text")
    val target = (1L to 10L).map(i => (i, s"target phrasing there ${i % 3}")).toDF("doc_id", "text")
    val model = Dsir.train(raw, col("text"), target, col("text"), nBuckets = 128)
    // after eager training exactly ONE entry is pinned: the llr table
    assert(!spark.sharedState.cacheManager.isEmpty)
    model.release()
    assert(spark.sharedState.cacheManager.isEmpty,
      "release() must drop the llr cache entry (and train must have freed staging)")
    // weighting after release stays correct, just recomputes
    assert(Dsir.weight(model, raw, col("doc_id"), col("text")).count() == 20L)
  }
}
