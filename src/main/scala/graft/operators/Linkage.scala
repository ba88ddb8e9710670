package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Probabilistic record linkage (Fellegi–Sunter): find record pairs that
 * refer to the same real-world entity across dirty, key-less data —
 * customer files, crawl metadata, supplier masters — and resolve them to
 * entity ids. The missing piece between [[FuzzyJoin]] (one string field)
 * and full entity resolution: multi-field evidence, each field weighted
 * by how discriminating agreement on it actually is.
 *
 * Model: each field comparison contributes log2(m/u) when it agrees and
 * log2((1−m)/(1−u)) when it doesn't, where m = P(agree | same entity)
 * and u = P(agree | different entities). Weights are carried as integer
 * MICRO-bits (`round(log2(·) * 1e6)`) so pair scores sum exactly and
 * results hash-match across engines — same fixed-point discipline as the
 * PageRank/PSI tiers. Thresholds split pairs into match / possible
 * (clerical review) / nonmatch.
 *
 * Scale shape (the 100 TB posture):
 *  - candidate generation is BLOCKED, never all-pairs: each blocking pass
 *    is an equi-join on its key; passes union and pairs deduplicate as
 *    bare (id_a, id_b) — field values rejoin by id afterwards, so the
 *    shuffle moves ids + block keys, not record payloads;
 *  - an optional per-block cap skips degenerate blocks (the boilerplate-
 *    bucket guard the LSH and PassJoin tiers already document) — a recall
 *    trade, off by default;
 *  - m/u estimation ([[estimateMU]]) aggregates pairs to ≤ 2^k comparison-
 *    pattern counts (k = #fields) and runs EM driver-side over that
 *    bounded table — the classic trick that makes FS training a single
 *    distributed count, not an iterative corpus scan;
 *  - entity resolution feeds match pairs into the checkpointed
 *    min-label-propagation components of [[graft.pipeline.Graphs]].
 *
 * Reference has no linkage tier; this follows the published FS model
 * (Fellegi & Sunter 1969; Winkler's EM formulation).
 */
object Linkage {

  /** One compared field: its value column, an agreement predicate over
   * two sides' values (null-unsafe predicates are coalesced to false),
   * and the agreement / disagreement weights in micro-bits. */
  case class LinkField(
      name: String, value: Column,
      agree: (Column, Column) => Column,
      wAgreeMicro: Long, wDisagreeMicro: Long)

  /** log2(m/u) and log2((1−m)/(1−u)) in micro-bits — the bridge from
   * [[estimateMU]] output (or published priors) to [[LinkField]] weights. */
  def weightsMicro(m: Double, u: Double): (Long, Long) = {
    require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
      s"need 0 < u < m < 1, got m=$m u=$u")
    def log2(x: Double) = math.log(x) / math.log(2.0)
    (math.round(log2(m / u) * 1e6), math.round(log2((1 - m) / (1 - u)) * 1e6))
  }

  /** Candidate pairs (id_a < id_b, distinct) from one or more blocking
   * passes. Ids must be unique and non-null; rows with a null block key
   * sit out that pass. `maxBlockSize > 0` skips blocks larger than the
   * cap in that pass (skew guard, recall trade). */
  def candidatePairs(df: DataFrame, idCol: Column, blockKeys: Seq[Column],
      maxBlockSize: Int = 0): DataFrame = {
    require(blockKeys.nonEmpty, "at least one blocking pass is required")
    val passes = blockKeys.map { key =>
      val side0 = df.select(idCol.as("graft_id"), key.as("graft_key"))
        .where(col("graft_key").isNotNull)
      val side =
        if (maxBlockSize <= 0) side0
        else side0.withColumn("graft_bsz",
            count(lit(1)).over(Window.partitionBy("graft_key")))
          .where(col("graft_bsz") <= maxBlockSize).drop("graft_bsz")
      val a = side.select(col("graft_id").as("id_a"), col("graft_key"))
      val b = side.select(col("graft_id").as("id_b"), col("graft_key"))
      a.join(b, Seq("graft_key")).where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
    }
    passes.reduce(_ unionAll _).distinct()
  }

  /**
   * Sorted-neighborhood candidate pairs (Hernández & Stolfo 1995,
   * merge/purge): order the file by `sortKey` (ties by id) and pair every
   * record with the `window − 1` records that follow it in that order.
   * The complement to key-equality blocking ([[candidatePairs]]): typo-ed
   * or truncated keys that no longer HASH together still SORT together,
   * and the candidate count is exactly `(window − 1) · n` minus the tail —
   * linear by construction, immune to block-size skew. Returns
   * (id_a, id_b, dist) with id_a < id_b and dist = rank distance ∈
   * [1, window); rows with a null sort key sit out, ids must be unique.
   *
   * Scale shape: the global order is realized as a range repartition on
   * (sortKey, id) + per-partition ranks offset by partition row counts —
   * the counts frame is one row per partition (cluster-sized, not
   * data-sized), so no single-partition window ever sees the data. Pair
   * generation explodes each row into `window − 1` (rank + d) probes and
   * equi-joins on rank: one narrow shuffle of (rank, id), never a sort
   * re-run, never all-pairs.
   */
  def sortedNeighborhood(df: DataFrame, idCol: Column, sortKey: Column,
      window: Int): DataFrame = {
    require(window >= 2, s"window must be at least 2, got $window")
    val keyed = df.select(idCol.as("graft_id"), sortKey.as("graft_key"))
      .where(col("graft_key").isNotNull)
    // delegate to the shared materialized-rank shape (Ranks scaladoc: the
    // offsets and local ranks must read ONE partition assignment), then
    // EAGERLY localCheckpoint the slim (id, rank) frame and release the
    // wide rank cache via the handle — a long-running session calling
    // this repeatedly no longer accumulates one pinned cache entry per
    // call (the checkpoint blocks are ContextCleaner-managed: they die
    // with the returned frame's reference, not with the session).
    // Tradeoffs, deliberate: the rank computes at CALL time, not at the
    // first downstream action, and localCheckpoint truncates lineage (an
    // executor loss during downstream reads fails the job rather than
    // recomputing — the standard localCheckpoint contract; candidate
    // generation is a re-runnable batch step). The checkpoint also means
    // the rank is computed ONCE even though both join sides below read it.
    val (rankedRaw, releaseRankCache) = Ranks
      .withGlobalRankHandle(keyed, "graft_rank", col("graft_key"), col("graft_id"))
    val ranked =
      try rankedRaw.select(col("graft_id"), col("graft_rank")).localCheckpoint()
      finally releaseRankCache()
    val probes = ranked
      .select(col("graft_id").as("graft_ida"), col("graft_rank").as("graft_ar"),
        explode(sequence(lit(1), lit(window - 1))).as("graft_d"))
      .select(col("graft_ida"), col("graft_d"),
        (col("graft_ar") + col("graft_d")).as("graft_rank"))
    probes.join(ranked, Seq("graft_rank"))
      .select(
        least(col("graft_ida"), col("graft_id")).as("id_a"),
        greatest(col("graft_ida"), col("graft_id")).as("id_b"),
        col("graft_d").cast("int").as("dist"))
  }

  /** Candidate pairs with per-field agreement bits (`<name>_agree`) and
   * the summed `score_micro`. Values join back by id — the blocking join
   * itself never carries payloads. */
  def scoredPairs(df: DataFrame, idCol: Column, blockKeys: Seq[Column],
      fields: Seq[LinkField], maxBlockSize: Int = 0): DataFrame = {
    require(fields.nonEmpty, "at least one compared field is required")
    val pairs = candidatePairs(df, idCol, blockKeys, maxBlockSize)
    val values = df.select(idCol.as("graft_id") +:
      fields.zipWithIndex.map { case (f, i) => f.value.as(s"graft_v$i") }: _*)
    def side(role: String) = values.select(
      col("graft_id").as(s"id_$role") +:
        fields.indices.map(i => col(s"graft_v$i").as(s"graft_${role}$i")): _*)
    val joined = pairs
      .join(side("a"), Seq("id_a"))
      .join(side("b"), Seq("id_b"))
    val agreements = fields.zipWithIndex.map { case (f, i) =>
      coalesce(f.agree(col(s"graft_a$i"), col(s"graft_b$i")), lit(false))
        .as(s"${f.name}_agree")
    }
    val withBits = joined.select(col("id_a") +: col("id_b") +: agreements: _*)
    val score = fields.map { f =>
      when(col(s"${f.name}_agree"), lit(f.wAgreeMicro))
        .otherwise(lit(f.wDisagreeMicro))
    }.reduce(_ + _)
    withBits.withColumn("score_micro", score)
  }

  /** Adds the FS `decision`: match (≥ tUpper), possible (> tLower),
   * nonmatch. Callers usually filter nonmatch straight off. */
  def classify(scored: DataFrame, tUpperMicro: Long, tLowerMicro: Long): DataFrame = {
    require(tLowerMicro < tUpperMicro, "tLower must be below tUpper")
    scored.withColumn("decision",
      when(col("score_micro") >= tUpperMicro, lit("match"))
        .when(col("score_micro") > tLowerMicro, lit("possible"))
        .otherwise(lit("nonmatch")))
  }

  /**
   * EM estimation of per-field (m, u) from a [[scoredPairs]] frame (only
   * the `<name>_agree` bits are read). The pair table aggregates to one
   * count per comparison pattern — at most 2^k rows for k fields — and
   * EM iterates driver-side over that bounded table; the distributed work
   * is exactly one groupBy-count. Deterministic: fixed initialization
   * (p=0.1, m=0.8, u=0.1), fixed iteration count, no randomness.
   * Returns fields in input order with their converged (m, u), clamped
   * to (1e-6, 1−1e-6) so degenerate all-agree fields stay finite.
   */
  def estimateMU(scored: DataFrame, fieldNames: Seq[String],
      iterations: Int = 30): Seq[(String, Double, Double)] = {
    val k = fieldNames.size
    require(k >= 1 && k <= 20, s"1..20 fields supported, got $k")
    val pattern = fieldNames.zipWithIndex.map { case (n, i) =>
      when(col(s"${n}_agree"), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val counts = scored.groupBy(pattern.as("graft_pat"))
      .agg(count(lit(1)).as("graft_n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    require(counts.nonEmpty, "no candidate pairs to estimate from")
    val total = counts.map(_._2).sum.toDouble
    def clamp(x: Double) = math.min(1 - 1e-6, math.max(1e-6, x))
    var p = 0.1
    var m = Array.fill(k)(0.8)
    var u = Array.fill(k)(0.1)
    var iter = 0
    while (iter < iterations) {
      // E-step: P(match | pattern) per pattern
      val w = counts.map { case (pat, _) =>
        var pm = p; var pu = 1 - p
        var i = 0
        while (i < k) {
          val g = ((pat >> i) & 1L) == 1L
          pm *= (if (g) m(i) else 1 - m(i))
          pu *= (if (g) u(i) else 1 - u(i))
          i += 1
        }
        if (pm + pu == 0) 0.0 else pm / (pm + pu)
      }
      // M-step
      val wm = counts.zip(w).map { case ((_, n), wi) => n * wi }.sum
      val nm = Array.fill(k)(0.0); val nu = Array.fill(k)(0.0)
      counts.zip(w).foreach { case ((pat, n), wi) =>
        var i = 0
        while (i < k) {
          if (((pat >> i) & 1L) == 1L) { nm(i) += n * wi; nu(i) += n * (1 - wi) }
          i += 1
        }
      }
      p = clamp(wm / total)
      m = Array.tabulate(k)(i => clamp(if (wm == 0) 0.5 else nm(i) / wm))
      u = Array.tabulate(k)(i => clamp(if (total == wm) 0.5 else nu(i) / (total - wm)))
      iter += 1
    }
    fieldNames.indices.map(i => (fieldNames(i), m(i), u(i)))
  }

  /** Full resolution: score, threshold at `tUpperMicro`, and collapse
   * match pairs to entities via min-label connected components. Output:
   * every input id with its `entity_id` (= least id in its match
   * component; unmatched records are their own entity). */
  def resolveEntities(df: DataFrame, idCol: Column, blockKeys: Seq[Column],
      fields: Seq[LinkField], tUpperMicro: Long, maxBlockSize: Int = 0): DataFrame = {
    val matches = scoredPairs(df, idCol, blockKeys, fields, maxBlockSize)
      .where(col("score_micro") >= tUpperMicro)
      .select(col("id_a"), col("id_b"))
    graft.pipeline.Graphs.connectedComponents(
        matches, col("id_a"), col("id_b"),
        nodes = df.select(idCol.as("graft_id")), nodeIdCol = col("graft_id"))
      .withColumnRenamed("component", "entity_id")
  }
}
