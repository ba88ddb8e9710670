package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for equi-joins: when a handful of hot keys dominate the
 * left side, a plain shuffle join lands every hot-key row on one task. A
 * salted join spreads each left key over `saltBuckets` sub-keys and
 * replicates the (small-per-key) right side across the same sub-keys, so hot
 * keys fan out over `saltBuckets` tasks. Complements AQE's skew-join
 * splitting (which needs post-shuffle statistics); salting works on the
 * first shuffle and on aggregations too.
 */
object Skew {

  /** Inner equi-join on `key` with the LEFT side salted and the RIGHT side
   * replicated `saltBuckets` times. Result rows equal the plain join's. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val salted = left.withColumn("graft_salt",
      (rand(42) * saltBuckets).cast("int"))
    val replicated = right.withColumn("graft_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "graft_salt")).drop("graft_salt")
  }

  /** Two-phase skew-safe count per key: pre-aggregate on (key, salt), then
   * merge — the classic hot-key groupBy shape when map-side partial
   * aggregation alone can't absorb the skew (e.g. high-cardinality
   * aggregation buffers). */
  def saltedCount(df: DataFrame, key: String, saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    df.withColumn("graft_salt", (rand(42) * saltBuckets).cast("int"))
      .groupBy(col(key), col("graft_salt")).agg(count(lit(1)).as("graft_partial"))
      .groupBy(col(key)).agg(sum(col("graft_partial")).as("cnt"))
  }
}
