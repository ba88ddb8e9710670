package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Corpus-curation operators a training-data pipeline runs after dedup:
 * deterministic dataset splitting, relevance scoring, and benchmark
 * decontamination.
 *
 * Scale design (100 TB):
 *  - splitByHash is a pure narrow projection — content-addressed, so the
 *    assignment is reproducible across runs/clusters and never shuffles.
 *  - bm25 needs one corpus-level aggregate (N, Σdl, per-term df) — a single
 *    reduce to ONE row, broadcast back; the scoring pass is narrow.
 *  - decontaminate explodes n-grams only on the (small) benchmark side into
 *    a broadcast set; the corpus side streams one projection + one
 *    broadcast-hash semi-ish join, grouped by doc. No corpus self-join.
 */
object Curation {

  /** Content-addressed bucket in [0, 100): first 8 hex chars of md5 of the
   * key rendered as a string. Stable across engines (the DuckDB oracle
   * reproduces it exactly) and across runs — re-running a grown corpus
   * keeps every existing row's assignment. */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % 100

  /** Deterministic train/val/test split: train gets [0, trainPct), val gets
   * [trainPct, trainPct+valPct), test the rest. */
  def splitByHash(
      df: DataFrame, idCol: Column,
      trainPct: Int = 80, valPct: Int = 10, name: String = "split"): DataFrame = {
    require(trainPct + valPct <= 100, "trainPct + valPct must be <= 100")
    val b = hashBucket(idCol)
    df.withColumn(name,
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /**
   * BM25 relevance of every document to a fixed query-term list
   * (Robertson/Sparck Jones; k1/b defaults per the literature). Corpus
   * statistics (N, total length, per-term document frequency) come from one
   * single-row aggregate cross-joined back (broadcast of one row — not a
   * shuffle of the corpus). Scores round to 6 decimals so the distributed
   * and oracle evaluations agree bit-for-bit despite libm ln differences.
   */
  def bm25(
      df: DataFrame, idCol: Column, textCol: Column, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, name: String = "bm25"): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = split(trim(lower(textCol)), "\\s+")
    val base = df.select(idCol.as("id"), toks.as("graft_toks"))
      .withColumn("graft_dl", size(col("graft_toks")))
    val aggs =
      count(lit(1)).as("graft_n") +:
      sum(col("graft_dl")).as("graft_sumdl") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("graft_toks"), t), 1L).otherwise(0L)).as(s"graft_df_$i")
      }
    val stats = base.agg(aggs.head, aggs.tail: _*)
    val scored = base.crossJoin(broadcast(stats))
    val nD = col("graft_n").cast("double")
    val avgdl = col("graft_sumdl").cast("double") / nD
    val score = terms.zipWithIndex.map { case (t, i) =>
      val dfT = col(s"graft_df_$i").cast("double")
      val tf = size(filter(col("graft_toks"), x => x === lit(t))).cast("double")
      val idf = log((nD - dfT + 0.5) / (dfT + 0.5) + 1.0)
      idf * (tf * (k1 + 1.0)) / (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("graft_dl").cast("double") / avgdl))
    }.reduce(_ + _)
    scored.select(col("id"), round(score, 6).as(name))
  }

  /**
   * Benchmark decontamination: for every corpus document, how many of its
   * distinct word n-grams appear in ANY benchmark document. Standard
   * pre-training hygiene — a doc overlapping an eval benchmark leaks test
   * data. Returns (id, shared_ngrams) for docs with at least `minShared`
   * overlapping n-grams.
   *
   * The benchmark n-gram set is broadcast (benchmarks are small); corpus
   * n-grams stream through explode → broadcast join → per-doc count, so the
   * corpus never self-joins or shuffles its text.
   */
  def decontaminate(
      df: DataFrame, idCol: Column, textCol: Column,
      bench: DataFrame, benchTextCol: Column,
      n: Int = 8, minShared: Int = 1): DataFrame = {
    val benchNgrams = bench
      .select(explode(Text.shingles(benchTextCol, n)).as("graft_ng")).distinct()
    val docNgrams = df.select(idCol.as("id"), explode(Text.shingles(textCol, n)).as("graft_ng"))
    docNgrams
      .join(broadcast(benchNgrams), "graft_ng")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("shared_ngrams")) // doc n-grams are pre-distinct
      .where(col("shared_ngrams") >= minShared)
  }
}
