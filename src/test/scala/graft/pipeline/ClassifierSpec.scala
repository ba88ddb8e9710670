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

  // buckets: 0 → {2 pos (0.05, clamped -0.2), 4 neg}, 5 → {1 pos},
  // 9 → {1 pos (0.95), 1 neg (clamped 1.7)}
  private def sweepFixture = Seq((0.05, false), (0.05, false), (0.05, false),
    (0.05, false), (0.05, true), (0.55, true), (0.95, true),
    (1.7, false), (-0.2, true)).toDF("s", "y")

  test("thresholdSweep: exact confusion counts, ppm ratios, clamped buckets") {
    val out = Classifier.thresholdSweep(sweepFixture, col("s"), col("y"), buckets = 10)
      .collect().map(r => r.getAs[Int]("bucket") -> r).toMap
    assert(out.keySet == Set(0, 5, 9))
    val b9 = out(9) // cut at 0.9: keeps 0.95(pos) + clamped 1.7(neg)
    assert(b9.getAs[Long]("tp") == 1L && b9.getAs[Long]("fp") == 1L &&
      b9.getAs[Long]("fn") == 3L)
    assert(b9.getAs[Long]("threshold_ppm") == 900000L)
    assert(b9.getAs[Long]("precision_ppm") == 500000L)
    assert(b9.getAs[Long]("recall_ppm") == 250000L)
    val b5 = out(5) // tp=2 fp=1 fn=2
    assert(b5.getAs[Long]("precision_ppm") == 666666L)
    assert(b5.getAs[Long]("recall_ppm") == 500000L)
    assert(b5.getAs[Long]("f1_ppm") == 2 * 2 * 1000000L / (2 * 2 + 1 + 2))
    val b0 = out(0) // keep everything
    assert(b0.getAs[Long]("tp") == 4L && b0.getAs[Long]("fp") == 5L &&
      b0.getAs[Long]("fn") == 0L)
    assert(b0.getAs[Long]("recall_ppm") == 1000000L)
    assert(b0.getAs[Long]("pos_rate_ppm") == 333333L) // bucket 0: 2 pos, 4 neg
  }

  test("thresholdFor picks the most-recall cut meeting target precision") {
    val sweep = Classifier.thresholdSweep(sweepFixture, col("s"), col("y"), buckets = 10)
    // precisions: b0 444444, b5 666666, b9 500000 — only b5 meets 0.6
    assert(Classifier.thresholdFor(sweep, 600000L) == Some(500000L))
    assert(Classifier.thresholdFor(sweep, 400000L) == Some(0L)) // everything qualifies
    assert(Classifier.thresholdFor(sweep, 999999L).isEmpty)
    // null scores and labels are excluded, not misbucketed
    val withNulls = Seq((Some(0.5), Some(true)), (None, Some(true)),
      (Some(0.5), None)).toDF("s", "y")
    val sw = Classifier.thresholdSweep(withNulls, col("s"), col("y"), buckets = 10)
    assert(sw.count() == 1 &&
      sw.collect()(0).getAs[Long]("tp") == 1L)
  }
}
