package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Jaro-Winkler: canonical literature pairs, the 0.7 boost threshold,
 * byte-level semantics, degenerate inputs, and the SQL face. */
class StringSimSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(StringSim.jaroWinkler(col("a"), col("b"))).as[Double].head()
  private def j(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(StringSim.jaro(col("a"), col("b"))).as[Double].head()

  test("canonical pairs match the published values exactly") {
    assert(j("MARTHA", "MARHTA") == 0.9444444444444445) // (1 + 5/6 + 1)/3, DuckDB-identical
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(jw("JELLYFISH", "SMELLYFISH") == 0.8962962962962964)
    assert(jw("CRATE", "TRACE") == 0.7333333333333334)
  }

  test("boost only above jaro 0.7; prefix capped at 4") {
    assert(jw("abcdxxxxxx", "abcdyyyyyy") == 0.6) // jaro 0.6, no boost
    assert(jw("aaaaa", "aaaaa ") == 0.9666666666666667) // prefix 5 capped at 4
  }

  test("byte-level semantics and degenerate inputs") {
    assert(jw("josé", "jose") == 0.8483333333333334) // é is two bytes
    assert(jw("", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window 0: no positional matches
    assert(jw("same", "same") == 1.0)
  }

  test("SQL faces registered") {
    graft.functions.Registry.registerAll(spark)
    val r = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS w, jaro('MARTHA', 'MARHTA') AS p")
      .as[(Double, Double)].head()
    assert(r == ((0.9611111111111111, 0.9444444444444445)))
  }
}
