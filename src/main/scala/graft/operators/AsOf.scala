package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) join: for every left row, the latest right row with
 * the same key and right.ts <= left.ts — the standard event-enrichment /
 * trades-quotes operator Spark lacks natively.
 *
 * Spark-first shape: tag + union both sides, one window pass per key ordered
 * by (ts, side) carrying the right values forward with last(ignoreNulls).
 * ONE shuffle on the key and a partition-local sort — no range-condition
 * join (which plans as a per-key cross product and explodes on hot keys).
 * This is the composition that survives 100 TB: cost is a sort-merge over
 * (key, ts), identical to any windowed aggregation.
 */
object AsOf {

  /**
   * @param on          equi-key columns (present in both frames)
   * @param leftTsCol   left event-time column
   * @param rightTsCol  right event-time column
   * @param rightPrefix prefix for right value columns in the output (use it
   *                    when names collide with left columns)
   *
   * Output: every left column, plus each right non-key/non-ts column
   * (prefixed), null when no right row precedes the left row. Ties on
   * (key, ts): the right row at exactly left.ts matches (inclusive).
   */
  def asofJoin(
      left: DataFrame, right: DataFrame, on: Seq[String],
      leftTsCol: String, rightTsCol: String, rightPrefix: String = ""): DataFrame = {
    val leftOther = left.columns.filterNot(on.contains).toSeq
    val rightVals = right.columns.filterNot(c => on.contains(c) || c == rightTsCol).toSeq
    val outRight = rightVals.map(rightPrefix + _)
    require(outRight.intersect(left.columns.toSeq).isEmpty,
      s"right value columns ${outRight.mkString(",")} collide with left columns - set rightPrefix")
    val lTypes = left.schema.map(f => f.name -> f.dataType).toMap
    val rTypes = right.schema.map(f => f.name -> f.dataType).toMap

    // All right values travel as ONE struct: null for left rows, non-null
    // (even when every field is null) for right rows. last(ignoreNulls) then
    // picks the latest right ROW atomically — per-column last would tear
    // columns across different right rows whenever a right value is null
    // (matching DuckDB/pandas ASOF semantics, which return the whole row).
    val rStruct = struct(rightVals.zip(outRight).map { case (c, o) => col(c).as(o) }: _*)
    val rStructType = org.apache.spark.sql.types.StructType(
      rightVals.zip(outRight).map { case (c, o) =>
        org.apache.spark.sql.types.StructField(o, rTypes(c))
      })
    val lAligned = left.select(
      on.map(col) ++ leftOther.map(col) ++
        Seq(col(leftTsCol).as("graft_ts"), lit(1).as("graft_side"),
          lit(null).cast(rStructType).as("graft_rvals")): _*)
    val rAligned = right.select(
      on.map(col) ++ leftOther.map(c => lit(null).cast(lTypes(c)).as(c)) ++
        Seq(col(rightTsCol).as("graft_ts"), lit(0).as("graft_side"),
          rStruct.as("graft_rvals")): _*)

    // right rows sort BEFORE left rows at equal ts (side 0 < 1) → inclusive
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("graft_ts").asc, col("graft_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lAligned.unionAll(rAligned)
      .select(
        (on ++ leftOther).map(col) ++ Seq(col("graft_side")) ++
          Seq(last(col("graft_rvals"), ignoreNulls = true).over(w).as("graft_rvals")): _*)
      .where(col("graft_side") === 1)
      .select(
        (on ++ leftOther).map(col) ++
          outRight.map(o => col("graft_rvals").getField(o).as(o)): _*)
  }

  /**
   * Forward as-of: for every left row, the EARLIEST right row with the
   * same key and right.ts >= left.ts (inclusive) — "the next quote after
   * the order", recovery-event attribution. Mirror of [[asofJoin]]: same
   * one-shuffle union + window shape, the window looks forward and left
   * rows sort before right at equal ts so equal-ts rights stay inside the
   * inclusive window.
   */
  def asofJoinForward(
      left: DataFrame, right: DataFrame, on: Seq[String],
      leftTsCol: String, rightTsCol: String, rightPrefix: String = ""): DataFrame = {
    val leftOther = left.columns.filterNot(on.contains).toSeq
    val rightVals = right.columns.filterNot(c => on.contains(c) || c == rightTsCol).toSeq
    val outRight = rightVals.map(rightPrefix + _)
    require(outRight.intersect(left.columns.toSeq).isEmpty,
      s"right value columns ${outRight.mkString(",")} collide with left columns - set rightPrefix")
    val lTypes = left.schema.map(f => f.name -> f.dataType).toMap
    val rTypes = right.schema.map(f => f.name -> f.dataType).toMap
    val rStruct = struct(rightVals.zip(outRight).map { case (c, o) => col(c).as(o) }: _*)
    val rStructType = org.apache.spark.sql.types.StructType(
      rightVals.zip(outRight).map { case (c, o) =>
        org.apache.spark.sql.types.StructField(o, rTypes(c))
      })
    val lAligned = left.select(
      on.map(col) ++ leftOther.map(col) ++
        Seq(col(leftTsCol).as("graft_ts"), lit(0).as("graft_side"),
          lit(null).cast(rStructType).as("graft_rvals")): _*)
    val rAligned = right.select(
      on.map(col) ++ leftOther.map(c => lit(null).cast(lTypes(c)).as(c)) ++
        Seq(col(rightTsCol).as("graft_ts"), lit(1).as("graft_side"),
          rStruct.as("graft_rvals")): _*)
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("graft_ts").asc, col("graft_side").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    lAligned.unionAll(rAligned)
      .select(
        (on ++ leftOther).map(col) ++ Seq(col("graft_side")) ++
          Seq(first(col("graft_rvals"), ignoreNulls = true).over(w).as("graft_rvals")): _*)
      .where(col("graft_side") === 0)
      .select(
        (on ++ leftOther).map(col) ++
          outRight.map(o => col("graft_rvals").getField(o).as(o)): _*)
  }

  /**
   * Nearest as-of with tolerance: the right row minimizing |right.ts −
   * left.ts| within `toleranceSeconds`, ties to the EARLIER (backward)
   * row — sensor alignment, nearest-snapshot enrichment. One union, one
   * shuffle, TWO window passes over the same partitioning (Catalyst
   * reuses the exchange): the backward pass carries the latest preceding
   * right row, the forward pass the earliest following one, and a final
   * projection picks by delta. Timestamps compare as epoch seconds
   * (timestamp or numeric ts columns both work). An equal-ts right row is
   * claimed by the backward pass (Δ=0 — already optimal, so the forward
   * pass's exclusive window never matters).
   */
  def asofJoinNearest(
      left: DataFrame, right: DataFrame, on: Seq[String],
      leftTsCol: String, rightTsCol: String, rightPrefix: String = "",
      toleranceSeconds: Double = Double.PositiveInfinity): DataFrame = {
    require(toleranceSeconds > 0, "toleranceSeconds must be positive")
    val leftOther = left.columns.filterNot(on.contains).toSeq
    val rightVals = right.columns.filterNot(c => on.contains(c) || c == rightTsCol).toSeq
    val outRight = rightVals.map(rightPrefix + _)
    require(outRight.intersect(left.columns.toSeq).isEmpty,
      s"right value columns ${outRight.mkString(",")} collide with left columns - set rightPrefix")
    val lTypes = left.schema.map(f => f.name -> f.dataType).toMap
    val rTypes = right.schema.map(f => f.name -> f.dataType).toMap
    // right rows travel with their own ts (epoch seconds) for the delta
    val rStruct = struct(
      (Seq(col(rightTsCol).cast("double").as("graft_rts")) ++
        rightVals.zip(outRight).map { case (c, o) => col(c).as(o) }): _*)
    val rStructType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("graft_rts",
        org.apache.spark.sql.types.DoubleType) +:
      rightVals.zip(outRight).map { case (c, o) =>
        org.apache.spark.sql.types.StructField(o, rTypes(c))
      })
    val lAligned = left.select(
      on.map(col) ++ leftOther.map(col) ++
        Seq(col(leftTsCol).as("graft_ts"), lit(1).as("graft_side"),
          lit(null).cast(rStructType).as("graft_rvals")): _*)
    val rAligned = right.select(
      on.map(col) ++ leftOther.map(c => lit(null).cast(lTypes(c)).as(c)) ++
        Seq(col(rightTsCol).as("graft_ts"), lit(0).as("graft_side"),
          rStruct.as("graft_rvals")): _*)
    val wb = Window.partitionBy(on.map(col): _*)
      .orderBy(col("graft_ts").asc, col("graft_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(on.map(col): _*)
      .orderBy(col("graft_ts").asc, col("graft_side").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val lts = col("graft_ts").cast("double")
    val back = last(col("graft_rvals"), ignoreNulls = true).over(wb)
    val fwd = first(col("graft_rvals"), ignoreNulls = true).over(wf)
    val bDelta = lts - col("graft_back.graft_rts")
    val fDelta = col("graft_fwd.graft_rts") - lts
    val bOk = col("graft_back").isNotNull && bDelta <= toleranceSeconds
    val fOk = col("graft_fwd").isNotNull && fDelta <= toleranceSeconds
    val chosen = when(bOk && (!fOk || bDelta <= fDelta), col("graft_back"))
      .when(fOk, col("graft_fwd"))
    lAligned.unionAll(rAligned)
      .select(
        (on ++ leftOther).map(col) ++
          Seq(col("graft_ts"), col("graft_side"),
            back.as("graft_back"), fwd.as("graft_fwd")): _*)
      .where(col("graft_side") === 1)
      .withColumn("graft_pick", chosen)
      .select(
        (on ++ leftOther).map(col) ++
          outRight.map(o => col("graft_pick").getField(o).as(o)): _*)
  }
}
