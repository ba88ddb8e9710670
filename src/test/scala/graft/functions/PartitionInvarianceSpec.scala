package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r11 mergeable aggregates must be pure functions of the input
 * multiset — identical results under ANY partitioning, because partition
 * count changes merge ORDER and a non-commutative/associative merge would
 * silently drift between local[32] and a 1000-executor cluster. */
class PartitionInvarianceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val parts = Seq(1, 3, 17, 32)

  test("hll_sketch bytes are identical under any partitioning") {
    val base = spark.range(20000).select((col("id") * 31 % 7919).as("x"))
    val sketches = parts.map { p =>
      base.repartition(p).agg(dsl.hll_sketch(col("x")).as("s"))
        .select("s").as[Array[Byte]].collect().head.toSeq
    }
    assert(sketches.distinct.size == 1,
      s"sketch bytes drifted across partitionings: ${sketches.map(_.hashCode)}")
  }

  test("log_histogram maps are identical under any partitioning") {
    val base = spark.range(1, 20000).select((col("id") % 4).as("k"), col("id").as("x"))
    val hists = parts.map { p =>
      base.repartition(p).groupBy(col("k"))
        .agg(dsl.log_histogram(col("x")).as("h"))
        .select(col("k"), col("h")).as[(Long, Map[Int, Long])]
        .collect().sortBy(_._1).toSeq
    }
    assert(hists.distinct.size == 1, "histogram maps drifted across partitionings")
  }

  test("weightedSamplePerKey selections are identical under any partitioning") {
    import graft.pipeline.Curation
    val base = spark.range(2000).select(
      (col("id") % 5).as("k"), col("id"), (col("id") % 13 + 1).cast("double").as("w"))
    val samples = parts.map { p =>
      Curation.weightedSamplePerKey(base.repartition(p), col("k"), col("id"), col("w"), 7)
        .select("id").as[Long].collect().sorted.toSeq
    }
    assert(samples.distinct.size == 1, "sample selection drifted across partitionings")
    assert(samples.head.size == 5 * 7)
  }

  test("theta_sketch bytes are identical under any partitioning (trimmed regime)") {
    val base = spark.range(20000).select((col("id") * 31 % 7919).as("x"))
    val sketches = parts.map { p =>
      base.repartition(p).agg(dsl.theta_sketch(col("x"), 256).as("s"))
        .select("s").as[Array[Byte]].collect().head.toSeq
    }
    assert(sketches.distinct.size == 1,
      s"theta bytes drifted across partitionings: ${sketches.map(_.hashCode)}")
  }

  test("cms_sketch bytes are identical under any partitioning") {
    val base = spark.range(20000).select((col("id") % 997).as("x"))
    val sketches = parts.map { p =>
      base.repartition(p).agg(dsl.cms_sketch(col("x"), 256, 4).as("s"))
        .select("s").as[Array[Byte]].collect().head.toSeq
    }
    assert(sketches.distinct.size == 1,
      s"cms bytes drifted across partitionings: ${sketches.map(_.hashCode)}")
  }

  test("theta_union and cms_merge are associative across uneven splits") {
    val base = spark.range(30000).toDF("id")
    def tsk(lo: Long, hi: Long) = base.where(col("id") >= lo && col("id") < hi)
      .agg(dsl.theta_sketch(col("id"), 256).as("s")).select("s").as[Array[Byte]].collect().head
    def csk(lo: Long, hi: Long) = base.where(col("id") >= lo && col("id") < hi)
      .agg(dsl.cms_sketch(col("id") % 100, 128, 4).as("s")).select("s").as[Array[Byte]].collect().head
    val tFull = tsk(0, 30000).toSeq
    val cFull = csk(0, 30000).toSeq
    val tParts = Seq(tsk(0, 100), tsk(100, 29000), tsk(29000, 30000))
    val cParts = Seq(csk(0, 100), csk(100, 29000), csk(29000, 30000))
    def mergeT(xs: Seq[Array[Byte]]) = xs.map(Tuple1(_)).toDF("s").coalesce(1)
      .agg(dsl.theta_union(col("s")).as("m")).select("m").as[Array[Byte]].collect().head.toSeq
    def mergeC(xs: Seq[Array[Byte]]) = xs.map(Tuple1(_)).toDF("s").coalesce(1)
      .agg(dsl.cms_merge(col("s")).as("m")).select("m").as[Array[Byte]].collect().head.toSeq
    assert(mergeT(tParts) == tFull && mergeT(tParts.reverse) == tFull)
    assert(mergeC(cParts) == cFull && mergeC(cParts.reverse) == cFull)
  }

  test("hll_merge and histogram_merge are associative across uneven splits") {
    val base = spark.range(30000).toDF("id")
    def sk(lo: Long, hi: Long) = base.where(col("id") >= lo && col("id") < hi)
      .agg(dsl.hll_sketch(col("id")).as("s")).select("s").as[Array[Byte]].collect().head
    val full = sk(0, 30000).toSeq
    // ((a+b)+c) vs (a+(b+c)) via two different grouping frames
    val abc = Seq(sk(0, 100), sk(100, 29000), sk(29000, 30000))
    def mergeAll(xs: Seq[Array[Byte]]) = xs.map(Tuple1(_)).toDF("s").coalesce(1)
      .agg(dsl.hll_merge(col("s")).as("m")).select("m").as[Array[Byte]].collect().head.toSeq
    assert(mergeAll(abc) == full)
    assert(mergeAll(abc.reverse) == full)
  }
}
