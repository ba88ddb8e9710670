package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val goodVocab =
    "the quick brown fox jumps over lazy dog with bright morning sunshine".split(" ")
  private val junkVocab =
    "zz11 qq22 xx33 $$$ buy now click here free winner prize claim".split(" ")

  private def doc(vocab: Array[String], seed: Int) = {
    val r = new scala.util.Random(seed)
    Seq.fill(12)(vocab(r.nextInt(vocab.length))).mkString(" ")
  }

  test("separates clean text from junk and generalizes to held-out docs") {
    val train = ((0 until 40).map(i => (doc(goodVocab, i), 1.0)) ++
      (0 until 40).map(i => (doc(junkVocab, 1000 + i), 0.0))).toDF("text", "y")
    val model = Classifier.train(train, col("text"), col("y"),
      dim = 1024, iters = 40, lr = 1.0)
    val holdout = ((100 until 120).map(i => (doc(goodVocab, i), 1.0)) ++
      (1100 until 1120).map(i => (doc(junkVocab, i), 0.0))).toDF("text", "y")
    val scored = holdout
      .select(col("y"), Classifier.score(model, col("text")).as("p")).collect()
    val acc = scored.count(r => (r.getDouble(1) > 0.5) == (r.getDouble(0) > 0.5))
      .toDouble / scored.length
    assert(acc >= 0.95, s"holdout accuracy $acc")
  }

  test("training is bit-reproducible under repartitioning") {
    val base = ((0 until 20).map(i => (doc(goodVocab, i), 1.0)) ++
      (0 until 20).map(i => (doc(junkVocab, 2000 + i), 0.0))).toDF("text", "y")
    val m1 = Classifier.train(base.repartition(1), col("text"), col("y"),
      dim = 256, iters = 5)
    val m2 = Classifier.train(base.repartition(7), col("text"), col("y"),
      dim = 256, iters = 5)
    assert(m1.weights.sameElements(m2.weights))
  }

  test("null-label rows are excluded from training, not silently miscounted") {
    val base = Seq(("good words here", Some(1.0)), ("zz11 qq22 xx33", Some(0.0)))
    val withNulls = base ++ Seq(("ignored doc one", None), ("ignored doc two", None))
    val m1 = Classifier.train(base.toDF("text", "y"), col("text"), col("y"),
      dim = 64, iters = 4)
    val m2 = Classifier.train(withNulls.toDF("text", "y"), col("text"), col("y"),
      dim = 64, iters = 4)
    assert(m1.weights.sameElements(m2.weights))
  }

  test("empty text scores the intercept prior, no crash") {
    val train = Seq(("good words here", 1.0), ("zz11 qq22 xx33", 0.0)).toDF("text", "y")
    val model = Classifier.train(train, col("text"), col("y"), dim = 64, iters = 3)
    val p = Seq("").toDF("t")
      .select(Classifier.score(model, col("t"))).collect().head.getDouble(0)
    assert(p > 0.0 && p < 1.0)
  }

  test("scoring stays inside whole-stage codegen (fallback disabled)") {
    val train = Seq(("good words", 1.0), ("zz11 qq22", 0.0)).toDF("text", "y")
    val model = Classifier.train(train, col("text"), col("y"), dim = 64, iters = 2)
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = Seq("good words", "zz11 qq22").toDF("t")
        .select(Classifier.score(model, col("t")).as("p"),
          Classifier.hashedFeatures(col("t"), 64).as("f"))
        .collect()
      assert(out.length == 2)
    } finally prev.foreach(spark.conf.set("spark.sql.codegen.fallback", _))
  }
}
