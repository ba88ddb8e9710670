package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Every round-8 custom expression must evaluate with codegen fallback
 * DISABLED: a doGenCode bug would otherwise silently drop the whole stage
 * to the interpreted path and read as a perf regression, not a failure. */
class R8CodegenGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("r8 expressions evaluate under disabled codegen fallback") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val embs = Seq((1L, Seq(0.1f, 0.9f, 0.3f, 0.5f))).toDF("vec_id", "embedding")
      val sq = Sq.train(embs, col("embedding"))
      val sqOut = embs.select(
        Sq.encode(col("embedding"), sq).as("code"),
        Sq.sqCosine(col("embedding"), Sq.encode(col("embedding"), sq), sq).as("sim"))
        .collect().head
      assert(sqOut.getAs[Array[Byte]](0).length == 4)
      assert(sqOut.getDouble(1) > 0.99) // self-similarity after quantization

      val raw = Seq((1L, "cat dog"), (2L, "stock market")).toDF("doc_id", "text")
      val dsir = Dsir.collectModel(
        Dsir.train(raw, col("text"), raw.where(col("doc_id") === 1), col("text"), 64))
      val w = raw.select(Dsir.weightColumn(col("text"), dsir).as("w"))
        .select(col("w.n_feats")).as[Long].collect()
      assert(w.toSeq == Seq(3L, 3L))

      val txt = Seq(Tuple1("café ﬁle words here")).toDF("t")
      val norm = txt.select(
        Text.normalizeUnicode(col("t")).as("nfc"),
        Text.normalizeUnicode(col("t"), "NFKC").as("nfkc"),
        Text.hashedBow(col("t"), 32).as("bow"))
        .collect().head
      assert(norm.getString(0).startsWith("caf\u00e9"))
      assert(norm.getString(1).contains("file"))
      assert(math.abs(norm.getSeq[Double](2).map(x => x * x).sum - 1.0) < 1e-12)
    } finally prev.foreach(spark.conf.set("spark.sql.codegen.fallback", _))
  }

  test("r11 langIdFull evaluates under disabled codegen fallback") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = Seq(("the cat and dog is here", 1), ("это русский текст", 2))
        .toDF("t", "i")
        .select(col("i"), Text.langIdFull(col("t")).as("l"))
        .select(col("i"), col("l.lang"), col("l.script"), col("l.confidence"))
        .as[(Int, String, String, Double)].collect().sortBy(_._1)
      assert(out(0) == ((1, "en", "latin", 1.0)))
      assert(out(1) == ((2, "ru", "cyrillic", 1.0)))
    } finally prev.foreach(spark.conf.set("spark.sql.codegen.fallback", _))
  }

  test("r11 sketch algebra + compression_ratio evaluate under disabled codegen fallback") {
    import graft.functions.dsl._
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val ta = spark.range(100).agg(theta_sketch(col("id")).as("s"))
        .select("s").as[Array[Byte]].collect().head
      val tb = spark.range(50, 150).agg(theta_sketch(col("id")).as("s"))
        .select("s").as[Array[Byte]].collect().head
      val cms = spark.range(100).select((col("id") % 10).as("k"))
        .agg(graft.functions.dsl.cms_sketch(col("k"), 1024, 4).as("s"))
        .select("s").as[Array[Byte]].collect().head
      // cms_estimate's key is a PRIMITIVE in generated code (long here,
      // UTF8String below) — this pins that the boxing path compiles
      val row = spark.range(3).select(col("id"),
          theta_estimate(theta_intersect(lit(ta), lit(tb))).as("i"),
          theta_estimate(theta_a_not_b(lit(ta), lit(tb))).as("d"),
          cms_estimate(lit(cms), col("id") % 10).as("c"),
          cms_estimate(lit(cms), concat(lit("k"), col("id"))).as("cs"),
          Text.compressionRatio(concat(lit("word word word word word "), col("id"))).as("z"))
        .collect().head
      assert(row.getLong(1) == 50L && row.getLong(2) == 50L)
      assert(row.getLong(3) == 10L) // each of 0..9 appears 10x
      assert(row.getLong(4) == 0L)  // string key never sketched
      assert(row.getDouble(5) > 0.0 && row.getDouble(5) < 1.0)
    } finally prev.foreach(spark.conf.set("spark.sql.codegen.fallback", _))
  }
}
