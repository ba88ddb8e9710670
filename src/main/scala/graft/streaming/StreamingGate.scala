package graft.streaming

import graft.pipeline.{Classifier, Pii, Text, TextClassifierModel}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Streaming counterpart of the batch per-row curation tier: the fused
 * quality signals (Gopher gate, repetition fraction, PII density, optional
 * classifier score) evaluated as ONE stateless projection per arriving
 * document — the CurationFusionSpec guarantee, live. Two operators share the
 * projection shape:
 *
 *  - [[gate]]: filters a (streaming or batch) frame to passing documents —
 *    append mode, zero state, survives any 100 TB/day ingest because it is
 *    a pure codegen'd map.
 *  - [[windowedGateReport]]: watermarked per-window pass rate WITH
 *    per-signal failure counts — the live dashboard that tells an ingest
 *    operator WHICH filter started eating the corpus when a crawl goes bad.
 *
 * All thresholds are explicit parameters so the gate is a pure function of
 * (text, config) — reproducible across engines, no session state.
 */
object StreamingGate {

  /** One fused struct of per-signal verdicts + overall pass. Every signal
   * is a codegen'd scalar, so any plan containing this struct stays inside
   * one WholeStageCodegen span over one scan (spec-pinned with fallback
   * disabled, mirroring CurationFusionSpec). */
  def qualitySignals(
      textCol: Column,
      gopherMinWords: Int = 50,
      maxDup5gramCharFrac: Double = 0.30,
      maxPiiDensity: Double = 0.05,
      classifier: Option[TextClassifierModel] = None,
      minClassifierScore: Double = 0.5,
      blocklist: Seq[String] = Nil,
      blocklistMaxHits: Int = 0): Column = {
    val gopherPass = Text.gopherQuality(textCol, gopherMinWords).getField("pass")
    val repPass =
      Text.repetitionSignals(textCol).getField("dup_5gram_char_frac") <= maxDup5gramCharFrac
    val piiPass = Pii.piiDensity(textCol) <= maxPiiDensity
    val clsPass = classifier
      .map(m => Classifier.score(m, textCol) >= minClassifierScore)
      .getOrElse(lit(true))
    val blockPass =
      if (blocklist.isEmpty) lit(true)
      else regexp_count(lower(textCol),
        lit(graft.pipeline.Curation.blocklistPattern(blocklist))) <= blocklistMaxHits
    struct(
      gopherPass.as("gopher_pass"),
      repPass.as("repetition_pass"),
      piiPass.as("pii_pass"),
      clsPass.as("classifier_pass"),
      blockPass.as("blocklist_pass"),
      (gopherPass && repPass && piiPass && clsPass && blockPass).as("pass"))
  }

  /** Documents passing every signal — stateless, append-safe, identical on
   * batch and streaming frames. */
  def gate(
      stream: DataFrame, textCol: Column,
      gopherMinWords: Int = 50,
      maxDup5gramCharFrac: Double = 0.30,
      maxPiiDensity: Double = 0.05,
      classifier: Option[TextClassifierModel] = None,
      minClassifierScore: Double = 0.5,
      blocklist: Seq[String] = Nil,
      blocklistMaxHits: Int = 0): DataFrame =
    stream.where(qualitySignals(textCol, gopherMinWords, maxDup5gramCharFrac,
      maxPiiDensity, classifier, minClassifierScore, blocklist,
      blocklistMaxHits).getField("pass"))

  /**
   * Watermarked per-window gate telemetry: one append-mode row per closed
   * window — (window_start, rows, passed, pass_rate, gopher_fail,
   * repetition_fail, pii_fail, classifier_fail). Failure counts are
   * per-signal (a document failing two signals counts in both), so a rate
   * regression points at the responsible filter directly. A null-text row
   * counts in `rows` and never in `passed` (it can't pass), but appears in
   * no per-signal bucket — signals are null, not failed, for null input.
   */
  def windowedGateReport(
      stream: DataFrame, tsCol: String, textCol: Column,
      windowDuration: String, watermark: String,
      gopherMinWords: Int = 50,
      maxDup5gramCharFrac: Double = 0.30,
      maxPiiDensity: Double = 0.05,
      classifier: Option[TextClassifierModel] = None,
      minClassifierScore: Double = 0.5,
      blocklist: Seq[String] = Nil,
      blocklistMaxHits: Int = 0): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .select(col(tsCol),
        qualitySignals(textCol, gopherMinWords, maxDup5gramCharFrac,
          maxPiiDensity, classifier, minClassifierScore, blocklist,
          blocklistMaxHits).as("graft_sig"))
      .groupBy(window(col(tsCol), windowDuration))
      .agg(
        count(lit(1)).as("rows"),
        sum(when(col("graft_sig.pass"), 1L).otherwise(0L)).as("passed"),
        sum(when(!col("graft_sig.gopher_pass"), 1L).otherwise(0L)).as("gopher_fail"),
        sum(when(!col("graft_sig.repetition_pass"), 1L).otherwise(0L)).as("repetition_fail"),
        sum(when(!col("graft_sig.pii_pass"), 1L).otherwise(0L)).as("pii_fail"),
        sum(when(!col("graft_sig.classifier_pass"), 1L).otherwise(0L)).as("classifier_fail"),
        sum(when(!col("graft_sig.blocklist_pass"), 1L).otherwise(0L)).as("blocklist_fail"))
      .select(col("window.start").as("window_start"), col("rows"), col("passed"),
        (col("passed").cast("double") / col("rows")).as("pass_rate"),
        col("gopher_fail"), col("repetition_fail"), col("pii_fail"),
        col("classifier_fail"), col("blocklist_fail"))

  /**
   * Streaming benchmark decontamination: drop arriving documents sharing
   * >= `minShared` word `n`-grams with a benchmark set whose n-gram bloom
   * was registered (batch-side, once) under `bloomName` — see
   * [[graft.lookups.Lookups.registerBloomFrom]] /
   * [[graft.pipeline.Curation.decontaminateBloom]], which share the exact
   * probe semantics, so batch and stream agree on what is contaminated
   * (modulo the bloom's one-sided fpp: false positives over-drop, never
   * under-drop — the safe direction for eval hygiene).
   *
   * Stateless codegen'd projection + filter, append-safe: the bloom rides
   * the registry broadcast, so a 100 TB/day ingest pays one shingle pass
   * per doc and ZERO shuffles or state stores. The eval-set bloom is MB-
   * scale (benchmarks are small) — broadcast is the right regime at any
   * corpus size.
   */
  def decontaminationGate(
      stream: DataFrame, textCol: Column, bloomName: String,
      n: Int = 8, minShared: Int = 1): DataFrame = {
    require(minShared >= 1, "minShared must be at least 1")
    val Bridge = org.apache.spark.sql.graft.Bridge
    def probe(c: Column): Column =
      Bridge.column(graft.lookups.ProbabilityInExpression(Bridge.expression(c), bloomName))
    stream.where(
      size(filter(Text.shingles(textCol, n), s => probe(s) > 0.0)) < minShared)
  }

  /**
   * Streaming CONTAINMENT decontamination — the live twin of
   * [[graft.pipeline.Dedup.decontaminateByContainment]] (which had no
   * streaming face; the bloom gate above counts shared n-grams but cannot
   * express "≥ `threshold` of THIS benchmark item's shingles"): drop
   * arriving documents that CONTAIN any item of the containment index
   * registered (batch-side, once) under `indexName` — see
   * [[graft.lookups.Lookups.registerContainmentFrom]]. EXACT, not
   * sketched: the index holds every item's distinct shingle hashes, so
   * batch and stream agree bit-for-bit on what is contaminated
   * (spec-pinned), unlike the bloom gate's one-sided fpp.
   *
   * Stateless codegen'd projection + filter, append-safe: the index rides
   * the registry broadcast (benchmarks are MB-scale by contract), so a
   * 100 TB/day ingest pays one shingle pass per doc and ZERO shuffles or
   * state stores. Use the same `shingleSize` the index was built with.
   */
  def containmentGate(
      stream: DataFrame, textCol: Column, indexName: String,
      shingleSize: Int = 5, threshold: Double = 0.8): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"containment threshold must be in (0, 1], got $threshold")
    stream.where(
      graft.lookups.Lookups.containmentIn(textCol, indexName, shingleSize)
        < threshold)
  }
}
