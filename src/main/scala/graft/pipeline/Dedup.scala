package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Deduplication operators for training-data pipelines.
 *
 * Scale design (100 TB):
 *  - exact: one shuffle on the content hash (not the content), keep-first
 *    deterministic via min(id) — map-side partial aggregation applies.
 *  - minhash LSH: signatures are a narrow projection; the only shuffle is on
 *    (band, bucket) keys whose cardinality ≈ docs × bands; candidate
 *    verification joins only bucket-colliding pairs, never the full cross
 *    product.
 *  - simhash: same banding idea over 16-bit chunks of a 64-bit signature.
 */
object Dedup {

  /** Exact dedup on content: keeps the lowest id per distinct content.
   * Fingerprint is 128 bits (two independent xxhash64 seeds, both codegen) —
   * a single 64-bit hash collides with ~50% probability around 5 billion
   * distinct rows, which a 100 TB corpus exceeds; 128 bits keeps the
   * collision odds negligible while the shuffle still carries only
   * (fingerprint, id), never the content. */
  def exact(df: DataFrame, idCol: Column, contentCols: Column*): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    def fp: Column = struct(
      Bridge.column(new org.apache.spark.sql.catalyst.expressions.XxHash64(
        contentCols.map(Bridge.expression), 42L)).as("h1"),
      Bridge.column(new org.apache.spark.sql.catalyst.expressions.XxHash64(
        contentCols.map(Bridge.expression), 43L)).as("h2"))
    val keep = df.select(fp.as("graft_fp"), idCol.as("graft_id"))
      .groupBy(col("graft_fp")).agg(min(col("graft_id")).as("graft_keep"))
    df.join(keep, fp === col("graft_fp") && idCol === col("graft_keep"), "leftsemi")
  }

  /** Candidate pairs whose exact shingle-Jaccard ≥ threshold, found via
   * MinHash + LSH banding. Returns (id_a, id_b, jaccard), id_a < id_b. */
  def minhashNearDups(
      df: DataFrame, idCol: Column, textCol: Column,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, maxBucketSize: Int = 0): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val rowsPerBand = numHashes / bands
    val base = df.select(idCol.as("id"), Text.shingles(textCol, shingleSize).as("sh"))
      .withColumn("sig", Text.minhash(col("sh"), numHashes))

    // band rows: (band, bucket=hash of the band's signature slice, id)
    val rawBandRows = base.select(col("id"), col("sig"))
      .select(col("id"), explode(sequence(lit(0), lit(bands - 1))).as("band"), col("sig"))
      .select(col("id"), col("band"),
        xxhash64(col("band"), slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))).as("bucket"))

    // skew guard: a corpus with massive exact-duplicate clusters puts whole
    // clusters into one bucket in EVERY band → O(cluster²·bands) candidate
    // pairs. Capping bucket size bounds the join (run `exact` dedup first to
    // keep recall); 0 = uncapped.
    val bandRows =
      if (maxBucketSize <= 0) rawBandRows
      else {
        val sizes = rawBandRows.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("graft_bsz"))
          .where(col("graft_bsz") <= maxBucketSize)
          .select(col("band"), col("bucket"))
        rawBandRows.join(sizes, Seq("band", "bucket"), "leftsemi")
      }

    val l = bandRows.as("l")
    val r = bandRows.as("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()

    // verify candidates with exact Jaccard over shingle sets
    val sh = base.select(col("id"), col("sh"))
    candidates
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-dups: pairs with Hamming distance ≤ maxHamming, candidates
   * from 16-bit bands of the 64-bit signature. */
  def simhashNearDups(
      df: DataFrame, idCol: Column, textCol: Column,
      shingleSize: Int = 3, maxHamming: Int = 8): DataFrame = {
    val base = df.select(idCol.as("id"),
      Text.simhash(Text.shingles(textCol, shingleSize)).as("sig"))
    val bandRows = base.select(col("id"), col("sig"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .select(col("id"), col("sig"), col("band"),
        expr("shiftrightunsigned(sig, band * 16)").bitwiseAND(lit(0xffffL)).as("bucket"))
    val l = bandRows.as("l")
    val r = bandRows.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        bit_count(col("l.sig").bitwiseXOR(col("r.sig"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /**
   * Near-duplicate CLUSTERS via connected components over the verified pair
   * graph: iterative min-label propagation (each round every node takes the
   * minimum label among itself and its neighbours), converging in
   * O(component diameter) rounds — the standard distributed CC shape, each
   * round one join + one aggregation, no driver-side graph state. Returns
   * (id, cluster_id) for every input row; singletons cluster to themselves.
   */
  def nearDupClusters(
      df: DataFrame, idCol: Column, textCol: Column,
      shingleSize: Int = 3, threshold: Double = 0.7,
      maxIterations: Int = 20): DataFrame = {
    val pairs = minhashNearDups(df, idCol, textCol, shingleSize = shingleSize, threshold = threshold)
      .select(col("id_a"), col("id_b"))
    val edges = pairs.unionAll(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .toDF("src", "dst").cache()
    var labels = df.select(idCol.as("id")).withColumn("label", col("id")).cache()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      val neighborMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("id2")).agg(min(col("label")).as("nlabel"))
      val next = labels.join(neighborMin, labels("id") === col("id2"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .cache()
      val changed = next.join(labels.withColumnRenamed("label", "old"), "id")
        .where(col("label") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Curation: remove near-duplicates keeping the lowest id of each pair
   * (every doc that appears as the higher id of a verified pair is dropped).
   * One anti-join against the (small) pair frame. */
  def dropNearDups(
      df: DataFrame, idCol: Column, textCol: Column,
      shingleSize: Int = 3, threshold: Double = 0.7): DataFrame = {
    val losers = minhashNearDups(df, idCol, textCol, shingleSize = shingleSize, threshold = threshold)
      .select(col("id_b").as("graft_drop_id")).distinct()
    df.join(losers, idCol === col("graft_drop_id"), "left_anti")
  }

  /** Exact n-gram Jaccard for a pair frame carrying two text columns. */
  def ngramJaccard(textA: Column, textB: Column, n: Int = 3): Column = {
    val a = Text.shingles(textA, n)
    val b = Text.shingles(textB, n)
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")
  }
}
