package graft.rules

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Benford conformity: log-uniform data conforms, uniform data deviates,
 * zeros/nulls/NaN excluded, magnitude invariance. */
class BenfordSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def deviation(vals: Seq[Double]): Long =
    DatasetChecks.benfordReport(vals.map(Tuple1(_)).toDF("v"), col("v"))
      .agg(sum(col("deviation_ppm"))).collect().head.getLong(0)

  test("log-uniform conforms, uniform deviates") {
    val rnd = new scala.util.Random(8)
    val logUniform = (0 until 20000).map(_ => math.pow(10.0, rnd.nextDouble() * 6))
    val uniform = (0 until 20000).map(_ => 1.0 + rnd.nextDouble() * 8.999)
    val dLog = deviation(logUniform)
    val dUni = deviation(uniform)
    assert(dLog < 30000L, s"log-uniform should conform, got $dLog")
    assert(dUni > 300000L, s"uniform should deviate, got $dUni")
  }

  test("magnitude invariance and exclusions") {
    val base = Seq(1.2, 23.0, 345.0, 4567.0, 5.1, 678.0, 789.0, 89.0, 9.9)
    val scaled = base.map(_ * 1e4) ++ Seq(0.0, Double.NaN)
    val a = DatasetChecks.benfordReport(base.map(Tuple1(_)).toDF("v"), col("v"))
      .select("digit", "n").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val b = DatasetChecks.benfordReport(scaled.map(Tuple1(_)).toDF("v"), col("v"))
      .select("digit", "n").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a.values.sum === 9L) // zeros and NaN never counted
  }
}
