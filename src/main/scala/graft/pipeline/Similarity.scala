package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Similarity search over embedding columns (array<float>).
 *
 * Scale design: brute force broadcasts the (small) query set and scans the
 * corpus once — no corpus shuffle, no cross-partition state; per-query top-k
 * via window over (query, sim). The LSH variant buckets by random-hyperplane
 * signature so each query only scans its bucket — the 100 TB path, trading
 * recall for a corpus-partition-local scan.
 */
object Similarity {

  /** Cosine similarity of two float-array columns, double accumulation in
   * index order (deterministic). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Brute-force top-k: for each query row, the k nearest corpus rows.
   * Returns (query_id, neighbor_id, sim, rank). */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.crossJoin(c)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      // zero-norm vectors give NaN, which sorts ABOVE every real sim
      .where(!isnan(col("sim")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** Deterministic random hyperplanes: ±1 components seeded by (plane, dim). */
  private def planes(nPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(if (rng.nextBoolean()) 1.0 else -1.0))
  }

  /** LSH signature bucket for an embedding: sign bits against nPlanes fixed
   * hyperplanes. */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int, seed: Long = 42L): Column = {
    val ps = planes(nPlanes, dim, seed)
    ps.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      val d = aggregate(zip_with(vec, planeLit, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Multi-table bucketed ANN: L independent hyperplane tables; a candidate
   * only needs to collide with the query in ONE table (standard LSH recall
   * boost). Corpus cost is ×tables rows in the bucket shuffle — still linear,
   * no cross product; exact rerank only within collided candidates. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nPlanes: Int = 8, dim: Int = 64, tables: Int = 8): DataFrame = {
    def bucketed(df: DataFrame, id: String, vec: String) = {
      val buckets = array((0 until tables).map(t =>
        lshBucket(col(vec), nPlanes, dim, seed = 42L + t * 1000L)): _*)
      df.select(col(id), col(vec), posexplode(buckets).as(Seq("table", "bucket")))
    }
    val cb = bucketed(corpus, idCol, vecCol)
      .withColumnRenamed(idCol, "neighbor_id").withColumnRenamed(vecCol, "cv")
    val qb = broadcast(bucketed(queries, idCol, vecCol)
      .withColumnRenamed(idCol, "query_id").withColumnRenamed(vecCol, "qv"))
    qb.join(cb, Seq("table", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      // score before dedup: recomputing a dot product on multi-table repeats
      // is far cheaper than shuffling the vectors through a distinct
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("sim"))
      .where(!isnan(col("sim")))
      .distinct()
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /**
   * Embedding near-duplicate pairs: cosine ≥ threshold, id_a < id_b.
   * Candidates come from multi-table LSH buckets (high thresholds ⇒ near-
   * identical vectors ⇒ identical signatures in some table with overwhelming
   * probability), then exact cosine verification — the bucket join replaces
   * the O(n²) cross product with a per-bucket product, which at 100 TB is the
   * difference between feasible and not.
   */
  def embeddingNearDups(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      dim: Int = 64, nPlanes: Int = 16, tables: Int = 4): DataFrame = {
    val buckets = array((0 until tables).map(t =>
      lshBucket(col(vecCol), nPlanes, dim, seed = 42L + t * 1000L)): _*)
    val banded = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      posexplode(buckets).as(Seq("table", "bucket")))
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r, col("l.table") === col("r.table") && col("l.bucket") === col("r.bucket") &&
        col("l.id") < col("r.id"))
      // score before dedup — cheaper than shuffling vectors through distinct
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        cosine(col("l.v"), col("r.v")).as("sim"))
      .where(!isnan(col("sim")) && col("sim") >= threshold)
      .distinct()
  }
}
