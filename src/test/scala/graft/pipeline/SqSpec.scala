package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQ8: byte codes must be 1/8 the double (1/4 the float32) footprint,
 * dequantized cosine must recover brute-force recall on separated
 * clusters, and degenerate vectors must stay inert. */
class SqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = {
    val rng = new scala.util.Random(7)
    val base = Seq(
      Array.tabulate(16)(i => if (i < 5) 1.0f else 0.0f),
      Array.tabulate(16)(i => if (i >= 5 && i < 10) 1.0f else 0.0f),
      Array.tabulate(16)(i => if (i >= 10) 1.0f else 0.0f))
    (0L until 900L).map { id =>
      val b = base((id % 3).toInt)
      (id, b.map(x => x + rng.nextFloat() * 0.2f).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("codes are one byte per dimension and deterministic") {
    val p = Sq.train(corpus, col("embedding"))
    assert(p.dim == 16)
    def codes = Sq.encodeDf(corpus, col("vec_id"), col("embedding"), p)
      .orderBy("id").collect().map(_.getAs[Array[Byte]](1).toSeq)
    val c1 = codes
    assert(c1.length == 900 && c1.forall(_.length == 16))
    assert(c1.toSeq == codes.toSeq)
  }

  test("quantization error is bounded by half a step per dimension") {
    val p = Sq.train(corpus, col("embedding"))
    val rows = corpus.select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    for (v <- rows.take(100)) {
      val code = SqAlgos.encode(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v), p)
      var i = 0
      while (i < p.dim) {
        val deq = p.mins(i) + (code(i) & 0xFF).toDouble / 255.0 * p.ranges(i)
        val step = p.ranges(i) / 255.0
        assert(math.abs(deq - v(i)) <= step / 2 + 1e-12,
          s"dim $i: |$deq - ${v(i)}| > ${step / 2}")
        i += 1
      }
    }
  }

  test("sq search recovers brute-force recall on separated clusters") {
    val queries = corpus.where(col("vec_id") < 6)
    val k = 5
    val bf = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val p = Sq.train(corpus, col("embedding"))
    val enc = Sq.encodeDf(corpus, col("vec_id"), col("embedding"), p)
    val sq = Sq.search(enc, p, queries, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect sq).size.toDouble / bf.size
    assert(recall >= 0.9, s"sq recall $recall < 0.9")
  }

  test("one over-length corrupt vector cannot empty the index (modal-dim training)") {
    val poisoned = corpus.union(
      Seq((9100L, Seq.fill(128)(0.5f))).toDF("vec_id", "embedding"))
    val p = Sq.train(poisoned, col("embedding"))
    assert(p.dim == 16) // modal length, not the corrupt max
    val enc = Sq.encodeDf(poisoned, col("vec_id"), col("embedding"), p)
    assert(enc.count() == 900)                         // well-formed rows all encode
    assert(enc.where(col("id") === 9100L).count() == 0) // the corrupt row drops
  }

  test("degenerate vectors encode to null and never reach search results") {
    val p = Sq.train(corpus, col("embedding"))
    val bad = Seq(
      (9001L, Seq(1.0f, 2.0f)),                 // wrong dimension
      (9002L, Seq.fill(16)(0.0f))               // zero norm: encodes, sim NaN
    ).toDF("vec_id", "embedding")
    val enc = Sq.encodeDf(corpus.union(bad), col("vec_id"), col("embedding"), p)
    assert(enc.where(col("id") === 9001L).count() == 0) // dropped at encode
    val out = Sq.search(enc, p, corpus.where(col("vec_id") < 3), "vec_id", "embedding", 10)
    assert(out.where(col("neighbor_id") === 9002L).count() == 0) // NaN dropped
  }

  test("ivf-sq8 index: cell-pruned search recovers recall, cells shrink 4x-ish") {
    val queries = corpus.where(col("vec_id") < 6)
    val k = 5
    val bf = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val path = java.nio.file.Files.createTempDirectory("graft_ivfsq").toString
    Sq.ivfSqBuild(corpus, "vec_id", "embedding", path, nlist = 4, iters = 3)
    // ADC-only search
    val adc = Sq.ivfSqSearch(spark, path, queries, "vec_id", "embedding", k, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val adcRecall = (bf intersect adc).size.toDouble / bf.size
    assert(adcRecall >= 0.85, s"ivf-sq adc recall $adcRecall")
    // exact rerank should match or beat ADC-only
    val rr = Sq.ivfSqSearch(spark, path, queries, "vec_id", "embedding", k, nprobe = 2,
        rerankVectors = Some(corpus))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rrRecall = (bf intersect rr).size.toDouble / bf.size
    assert(rrRecall >= adcRecall, s"rerank $rrRecall < adc $adcRecall")
    // the byte cells are materially smaller than a float index would be:
    // 16 dims × 1 B vs 16 × 8 B doubles — compare against the raw vectors
    val cellBytes = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(s"$path/cells"))
    }
    val flatPath = java.nio.file.Files.createTempDirectory("graft_ivfflat").toString
    Similarity.ivfBuild(corpus, "vec_id", "embedding", flatPath, nlist = 4, iters = 3)
    val flatBytes = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(s"$flatPath/cells"))
    }
    assert(cellBytes.toDouble < flatBytes * 0.5,
      s"sq cells $cellBytes should be well under half the flat $flatBytes")
  }

  test("vector_minmax is SQL-registered and ignores nulls / short rows") {
    val df = Seq(
      Seq[java.lang.Double](1.0, 5.0),
      Seq[java.lang.Double](3.0, null, 7.0),
      null).toDF("v")
    df.createOrReplaceTempView("graft_sq_mm")
    val r = spark.sql(
      "SELECT vector_minmax(CAST(v AS ARRAY<DOUBLE>)) AS mm FROM graft_sq_mm")
      .select(col("mm.mins"), col("mm.maxs")).head()
    assert(r.getSeq[Double](0) == Seq(1.0, 5.0, 7.0))
    assert(r.getSeq[Double](1) == Seq(3.0, 5.0, 7.0))
  }
}
