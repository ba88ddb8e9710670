package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** k-anonymity and l-diversity release gates: exact class accounting,
 * NULL quasi/sensitive handling, the homogeneity case k-anonymity misses
 * and l-diversity catches, partition invariance. */
class KAnonymitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (zip, age-band, diagnosis): one size-4 homogeneous class, one size-2
  // class, one singleton, one NULL-quasi pair
  private val rows = Seq(
    ("02139", "20-30", "flu"), ("02139", "20-30", "flu"),
    ("02139", "20-30", "flu"), ("02139", "20-30", "flu"),
    ("02141", "30-40", "flu"), ("02141", "30-40", "cold"),
    ("02142", "40-50", "rare"),
    (null, "20-30", "flu"), (null, "20-30", "cold")).toDF("zip", "age", "dx")
      .repartition(4)

  test("k-anonymity: rows in classes below k are the re-identifiable mass") {
    val r = Pii.kAnonymityReport(rows, 3, col("zip"), col("age")).collect().head
    assert(r.getLong(0) === 9L)        // rows
    assert(r.getLong(1) === 4L)        // classes (NULL zip is a class)
    assert(r.getLong(2) === 1L)        // min class size
    assert(r.getLong(3) === 3L)        // below 3: the 2, the 1, the NULL pair
    assert(r.getLong(4) === 5L)        // rows below k
    assert(r.getLong(5) === 555555L)   // risk ppm
  }

  test("l-diversity catches the homogeneous class k-anonymity passes") {
    val r = Pii.lDiversityReport(rows, 2, col("dx"), col("zip"), col("age"))
      .collect().head
    assert(r.getLong(0) === 9L)
    assert(r.getLong(1) === 4L)
    assert(r.getLong(2) === 1L)        // min diversity: the size-4 all-flu class
    assert(r.getLong(3) === 2L)        // below l: all-flu(4) + singleton(1)
    assert(r.getLong(4) === 5L)
    assert(r.getLong(5) === 555555L)
  }

  test("fully diverse data reports zero risk") {
    val clean = Seq(("a", "x"), ("a", "y"), ("a", "z")).toDF("q", "s")
    val k = Pii.kAnonymityReport(clean, 3, col("q")).collect().head
    assert(k.getLong(4) === 0L && k.getLong(5) === 0L)
    val l = Pii.lDiversityReport(clean, 3, col("s"), col("q")).collect().head
    assert(l.getLong(3) === 0L && l.getLong(5) === 0L)
  }

  test("guards reject degenerate parameters") {
    intercept[IllegalArgumentException] { Pii.kAnonymityReport(rows, 1, col("zip")) }
    intercept[IllegalArgumentException] { Pii.lDiversityReport(rows, 2, col("dx")) }
  }
}
