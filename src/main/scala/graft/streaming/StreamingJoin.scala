package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Watermarked stream-stream interval join — the attribution shape: every
 * right-side event (a conversion, a label arrival, a DQ verdict) joined to
 * the left-side events (impressions, intake rows) of the same key whose
 * event time falls inside a bounded lookback window ending at the right
 * event. The time bound is what makes an unbounded stream-stream join
 * runnable at all: Spark derives the state-eviction horizon from the
 * watermarks PLUS the join's time constraint, so each side's state store
 * holds only `lookback + watermark` of history instead of the whole
 * stream — the only viable posture for a 100 TB/day intake.
 *
 * Works identically on batch frames (the condition is plain column
 * algebra), which is what the parity spec pins.
 */
object StreamingJoin {

  /**
   * Join `left` and `right` on key equality with
   * `rightTs - lookback <= leftTs <= rightTs`.
   *
   * Columns are disambiguated by prefixing every left column with `l_` and
   * every right column with `r_` (the key keeps both copies — equal by
   * construction). For streaming inputs, call `withWatermark` on BOTH
   * sides first (Spark requires it for state cleanup; inner joins run
   * without but grow state forever — this method refuses that footgun by
   * requiring the watermarks to already be set when either side streams).
   *
   * @param joinType "inner", "left_outer" (impressions that never
   *                 converted keep a null right side) or "right_outer"
   *                 (conversions with no preceding touch keep a null left
   *                 side); outer nulls are emitted only once the watermark
   *                 closes the window — standard Structured Streaming
   *                 outer-join semantics
   */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTsCol: String, rightTsCol: String,
      lookback: String, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_outer", "right_outer").contains(joinType),
      s"joinType must be inner, left_outer or right_outer, got $joinType")
    if (left.isStreaming || right.isStreaming)
      require(left.queryExecution.analyzed.collectFirst {
          case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => e
        }.isDefined == left.isStreaming &&
        right.queryExecution.analyzed.collectFirst {
          case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => e
        }.isDefined == right.isStreaming,
        "streaming inputs must carry withWatermark before intervalJoin " +
          "(unbounded join state otherwise)")
    val l = left.select(left.columns.map(c => col(c).as(s"l_$c")).toSeq: _*)
    val r = right.select(right.columns.map(c => col(c).as(s"r_$c")).toSeq: _*)
    // the left event must precede (or equal) the right event, at most
    // `lookback` earlier — expr() so the interval literal parses once
    val cond = col(s"l_$keyCol") === col(s"r_$keyCol") &&
      col(s"l_$leftTsCol") <= col(s"r_$rightTsCol") &&
      col(s"l_$leftTsCol") >= col(s"r_$rightTsCol") - expr(s"INTERVAL $lookback")
    l.join(r, cond, joinType)
  }
}
