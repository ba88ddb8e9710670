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

  /**
   * Key-skew report — the diagnostic that tells you whether you NEED the
   * salting above before you pay for it: one row per key column with
   * total rows, distinct keys, null rows, the heaviest key and its corpus
   * share in ppm, and the top-k heaviest keys with counts. Everything is
   * exact-integer (hash-stable across engines); the per-column pass is a
   * map-side-combining count + a bounded top-k cut, so the report costs
   * one aggregation per column regardless of key cardinality.
   */
  def keySkewReport(df: DataFrame, keys: Seq[String], topK: Int = 5): DataFrame = {
    require(keys.nonEmpty, "at least one key column is required")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    import graft.functions.dsl.top_k_by
    keys.map { k =>
      df.select(col(k).cast("string").as("graft_k"))
        .groupBy(col("graft_k")).agg(count(lit(1)).as("graft_c"))
        .agg(
          sum(col("graft_c")).as("total_rows"),
          count(when(col("graft_k").isNotNull, 1)).as("distinct_keys"),
          coalesce(sum(when(col("graft_k").isNull, col("graft_c"))), lit(0L))
            .as("null_rows"),
          max(when(col("graft_k").isNotNull, col("graft_c"))).as("max_key_rows"),
          top_k_by(col("graft_c"),
            when(col("graft_k").isNotNull,
              concat(col("graft_k"), lit(":"), col("graft_c"))), topK)
            .as("graft_top"))
        .select(lit(k).as("key_col"), col("total_rows"), col("distinct_keys"),
          col("null_rows"), col("max_key_rows"),
          expr("max_key_rows * 1000000L div total_rows").as("max_share_ppm"),
          array_join(col("graft_top.item"), ",").as("top_keys"))
    }.reduce(_ unionAll _)
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
