package graft.streaming

import graft.pipeline.Curation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Live distribution-drift telemetry: per event-time window, the PSI of the
 * incoming signal against a REFERENCE histogram (a past release's
 * log-histogram sketch, read from the stats table) — the streaming twin of
 * [[Curation.distributionDrift]], answering "did the intake's length/
 * quality distribution move away from what we trained the gates on?"
 * while the intake is still running, instead of at the next release.
 *
 * The reference is a driver-side map (a bounded sketch — hundreds of
 * buckets) baked into the plan as a literal, so each window costs ONE
 * windowed log-histogram aggregate and a narrow [[Curation.histogramPsi]]
 * projection; same math as the batch path to the bit, so a window over
 * the same rows scores the same PSI the release check would.
 */
object StreamingDrift {

  /** (window_start, rows, psi_e9) per watermark-closed window. */
  def windowedDrift(
      stream: DataFrame, tsCol: String, valueCol: Column,
      referenceHist: Map[Int, Long],
      windowDuration: String, watermark: String,
      bucketsPerDecade: Int = 20): DataFrame = {
    require(referenceHist.nonEmpty, "windowedDrift needs a non-empty reference histogram")
    import graft.functions.dsl.log_histogram
    val ref = typedLit(referenceHist)
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(count(lit(1)).as("rows"),
        log_histogram(valueCol, bucketsPerDecade).as("graft_h"))
      .select(col("window.start").as("window_start"), col("rows"),
        Curation.histogramPsi(ref, col("graft_h")).as("psi_e9"))
  }
}
