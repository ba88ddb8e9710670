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
}
