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

  // ---------------------------------------------------------------- IVF ANN

  /** Cosine against a constant centroid (array literal). */
  private def cosineLit(vec: Column, c: Array[Double]): Column =
    cosine(vec, array(c.map(lit): _*))

  /** Array of struct(sim, cid) against every centroid — the building block
   * for inline (no-shuffle) nearest-centroid selection: centroids are tiny
   * and live in the plan as literals, so assignment is a pure projection. */
  private def centroidSims(vec: Column, cents: Array[(Int, Array[Double])]): Column = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.catalyst.expressions.{CreateNamedStruct, Literal}
    array(cents.map { case (cid, cv) =>
      // nan-safe: zero-norm vectors rank below everything
      val sim = coalesce(nanvl(cosineLit(vec, cv), lit(null).cast("double")), lit(-2.0))
      Bridge.column(CreateNamedStruct(Seq(
        Literal("s"), Bridge.expression(sim),
        Literal("negc"), Literal(-cid))))
    }: _*)
  }

  /** cid of the best (highest-sim, lowest-cid on ties) centroid. */
  private def bestCid(vec: Column, cents: Array[(Int, Array[Double])]): Column =
    -array_max(centroidSims(vec, cents)).getField("negc")

  /** Top `nprobe` centroid ids by similarity. */
  private def probeCids(vec: Column, cents: Array[(Int, Array[Double])], nprobe: Int): Column =
    transform(
      slice(reverse(array_sort(centroidSims(vec, cents))), 1, nprobe),
      s => -s.getField("negc"))

  /**
   * Lloyd's k-means over an embedding column, expressed as DataFrame
   * aggregations: assignment is a broadcast-centroid projection (bestCid),
   * the centroid update one groupBy per iteration — no MLlib, no driver
   * iteration over rows. Returns (cid, cv: array<double>).
   * Init: the nlist rows with the lowest vector hash (deterministic).
   */
  def kmeansCentroids(
      df: DataFrame, vecCol: String, nlist: Int, iters: Int = 4): DataFrame = {
    val v = df.select(col(vecCol).cast("array<double>").as("v")).where(size(col("v")) > 0)
    var cents: Array[(Int, Array[Double])] = v
      .withColumn("h", xxhash64(col("v")))
      .orderBy(col("h")).limit(nlist)
      .collect().zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Double](0).toArray }
    var iter = 0
    while (iter < iters) {
      cents = v.select(bestCid(col("v"), cents).as("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("x")).as("m"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("cv"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
        .sortBy(_._1)
      iter += 1
    }
    val spark = df.sparkSession
    import spark.implicits._
    cents.map { case (cid, cv) => (cid, cv.toSeq) }.toSeq.toDF("cid", "cv")
  }

  /**
   * IVF (inverted-file) ANN top-k — the index-based scale path beyond LSH:
   * corpus vectors partition into nlist centroid cells (one projection, one
   * shuffle on cid), queries probe only their nprobe nearest cells, exact
   * cosine rerank inside the probed cells. At 100 TB the cell assignment is
   * write-once (persist the assigned table partitioned by cid) and each
   * query touches nprobe/nlist of the corpus.
   */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 4): DataFrame = {
    val cents = kmeansCentroids(corpus, vecCol, nlist, iters)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    val assigned = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv0"),
      bestCid(col(vecCol).cast("array<double>"), cents).as("cid"))
    val probes = broadcast(queries.select(
        col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"),
        explode(probeCids(col(vecCol).cast("array<double>"), cents, nprobe)).as("cid")))
    probes.join(assigned, "cid")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv0")).as("sim"))
      .where(!isnan(col("sim")))
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
