package graft.bloom

import graft.lookups.Lookups
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * File-backed bloom persistence (reference: package.scala:26-40 BloomModel,
 * impl/bloom/parquet/Bucketed.scala): a built (bucketed) bloom saves as a
 * small parquet dataset — one row per bucket — and reloads into the session
 * registry without rebuilding, so a filter over billions of keys is paid for
 * once and reused across jobs.
 *
 * Layout: rows (bucket: int, bits: binary, fpp: double) written with one
 * file per bucket-set; buckets reassemble ordered by index at load.
 */
object BloomModel {

  /** Persist raw buckets + fpp at `path` (overwrites). */
  def save(spark: SparkSession, path: String, buckets: Array[Array[Byte]], fpp: Double): Unit = {
    import spark.implicits._
    buckets.zipWithIndex
      .map { case (bits, i) => (i, bits, fpp) }.toSeq
      .toDF("bucket", "bits", "fpp")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load buckets + fpp persisted by `save`. */
  def load(spark: SparkSession, path: String): (Array[Array[Byte]], Double) = {
    val rows = spark.read.parquet(path)
      .select("bucket", "bits", "fpp")
      .collect()
      .sortBy(_.getInt(0))
    require(rows.nonEmpty, s"no bloom buckets found at $path")
    (rows.map(_.getAs[Array[Byte]](1)), rows.head.getDouble(2))
  }

  /** Save a bloom already registered under `name`. */
  def saveRegistered(spark: SparkSession, name: String, path: String): Unit = {
    val entry = Lookups.bloom(name)
    save(spark, path, entry.buckets.value, entry.fpp)
  }

  /** Load a persisted bloom and register it under `name` — no rebuild. */
  def loadAndRegister(spark: SparkSession, name: String, path: String): Unit = {
    val (buckets, fpp) = load(spark, path)
    Lookups.registerBloom(spark, name, buckets, fpp)
  }

  /** Build a bucketed big-bloom from a column, register it AND persist it in
   * one pass (the aggregation is distributed; only the final bucket bytes
   * land on the driver, which broadcast lookups need anyway). */
  def buildSaveAndRegister(
      spark: SparkSession, name: String, path: String,
      df: DataFrame, col: Column, expected: Long, fpp: Double): Unit = {
    Lookups.registerBigBloomFrom(spark, name, df, col, expected, fpp)
    saveRegistered(spark, name, path)
  }
}
