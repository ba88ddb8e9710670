package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary profiling probe — delete after use
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtension")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMER $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm the session/codegen with an unrelated query
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    val d = spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text"))
    val words = split(col("text"), " ")
    val mutated = d.where(col("doc_id") % 10 === 0).select(
      (col("doc_id") + 10000).as("doc_id"),
      array_join(slice(words, lit(1), size(words) - 2), " ").as("text"))
    val corpus = d.unionAll(mutated)

    time("fingerprint+membership") {
      val base = corpus.withColumn("graft_fp",
        graft.pipeline.Dedup.fingerprint(Seq(col("text"))))
      base.groupBy(col("graft_fp")).agg(min(col("doc_id"))).count()
    }
    (1 to 2).foreach { rep =>
      time(s"lsh_pairs_capped_$rep") {
        graft.pipeline.Dedup.minhashNearDups(corpus, col("doc_id"), col("text"),
          maxBucketSize = 1000).count()
      }
      time(s"lsh_pairs_uncapped_$rep") {
        graft.pipeline.Dedup.minhashNearDups(corpus, col("doc_id"), col("text")).count()
      }
      time(s"clusters_full_$rep") {
        graft.pipeline.Dedup.nearDupClusters(corpus, col("doc_id"), col("text")).count()
      }
    }
    spark.stop()
  }
}
