package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence + guard cases for the HOF unroll rule (active in TestSpark
 * via GraftExtension). */
class StaticHofUnrollSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = {
    val dir = java.nio.file.Files.createTempDirectory("graft_hof").toString
    Seq((1, 10), (2, 20)).toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("transform over literal array unrolls and matches element-wise semantics") {
    val out = df.select(transform(array(col("a"), col("b"), lit(7)), x => x * 2).as("r"))
    assert(!out.queryExecution.optimizedPlan.toString.contains("transform("))
    assert(out.as[Seq[Int]].collect().toSet == Set(Seq(2, 20, 14), Seq(4, 40, 14)))
  }

  test("transform with index lambda unrolls with correct indices") {
    val out = df.select(transform(array(col("a"), col("b")), (x, i) => x + i).as("r"))
    assert(!out.queryExecution.optimizedPlan.toString.contains("transform("))
    assert(out.as[Seq[Int]].collect().toSet == Set(Seq(1, 11), Seq(2, 21)))
  }

  test("map_entries over literal map unrolls; flatten of literal arrays concatenates") {
    val out = df.select(
      transform(map_entries(map(lit("x"), col("a"), lit("y"), col("b"))),
        e => e.getField("value")).as("vals"),
      flatten(array(array(col("a")), array(col("b"), lit(5)))).as("flat"))
    val opt = out.queryExecution.optimizedPlan.toString
    assert(!opt.contains("map_entries(") && !opt.contains("flatten("))
    val rows = out.collect().map(r => (r.getSeq[Int](0), r.getSeq[Int](1))).toSet
    assert(rows == Set((Seq(1, 10), Seq(1, 10, 5)), (Seq(2, 20), Seq(2, 20, 5))))
  }

  test("let-binding survives: multi-referenced non-constructor element is NOT inlined") {
    // the single-element-transform 'let' (Text.shingles pattern): ws bound
    // once, referenced twice — unrolling would duplicate the split
    val out = df.select(element_at(
      transform(array(split(concat(lit("p q r "), col("a").cast("string")), " ")),
        ws => size(ws) + size(ws)), 1).as("r"))
    val opt = out.queryExecution.optimizedPlan.toString
    assert(opt.contains("transform("), s"let was unrolled:\n$opt")
    assert("split\\(".r.findAllIn(opt).length == 1, s"split duplicated:\n$opt")
    assert(out.as[Int].collect().toSeq == Seq(8, 8))
  }

  test("nondeterministic elements referenced twice are not duplicated") {
    val out = df.select(element_at(
      transform(array(rand()), x => x - x), 1).as("r"))
    // rand() bound once and subtracted from itself must be exactly 0 — if the
    // unroll duplicated it, two different draws would differ
    assert(out.as[Double].collect().forall(_ == 0.0))
  }

  test("generator CSE does not hoist subtrees referencing a sibling nondeterministic alias") {
    // nd survives substitution as an attribute ref (nondeterministic aliases
    // are never inlined); the repeated abs(nd*100) subtree must NOT be hoisted
    // into the child Project, where nd is not visible
    val out = df.withColumn("nd", rand())
      .select(explode(transform(array(lit(1), lit(2)),
        x => abs(col("nd") * 100) + abs(col("nd") * 100) + x)).as("e"))
    val rows = out.as[Double].collect() // would fail attribute binding pre-fix
    assert(rows.length == 4)
  }

  test("dynamic (non-literal) arrays keep the runtime transform") {
    val arr = df.select(array(col("a"), col("b")).as("arr"))
    val dir = java.nio.file.Files.createTempDirectory("graft_hof2").toString
    arr.write.mode("overwrite").parquet(dir)
    val out = spark.read.parquet(dir).select(transform(col("arr"), x => x + 1).as("r"))
    assert(out.queryExecution.optimizedPlan.toString.contains("transform("))
    assert(out.as[Seq[Int]].collect().toSet == Set(Seq(2, 11), Seq(3, 21)))
  }
}
