package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Range (interval) join: points matched to intervals containing them
 * (start <= p <= end, optional extra equi-keys). Spark plans a raw range
 * condition as a broadcast-nested-loop / per-key cross product; this
 * composition bins the number line instead — intervals replicate to the
 * buckets they span, points probe exactly ONE bucket, and the join is a
 * plain equi-join on (keys…, bucket) followed by the exact containment
 * filter. At 100 TB the cost is linear in points + interval-span/binWidth,
 * never |points|×|intervals|.
 *
 * Pick binWidth near the typical interval span: much smaller multiplies the
 * interval replication, much larger packs unrelated rows into one bucket.
 */
object RangeJoin {

  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      binWidth: Double, on: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = intervals.columns.toSet.intersect(points.columns.toSet) -- on
    require(overlap.isEmpty,
      s"column collision between points and intervals: ${overlap.mkString(",")}")
    val pb = points.withColumn("graft_bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val ib = intervals.withColumn("graft_bin",
      explode(sequence(
        floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    pb.join(ib, on :+ "graft_bin")
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("graft_bin")
  }

  /**
   * Interval × interval OVERLAP join (closed intervals: `a.start <= b.end
   * AND b.start <= a.end`, optional equi-keys) — meetings×outages,
   * sessions×incidents, any two event-span tables. Same binning idea as
   * [[pointInInterval]], plus the first-shared-bin trick: both sides
   * replicate to spanned bins, and a candidate pair is kept ONLY in the
   * bin containing `max(a.start, b.start)` — the first bin the two
   * intervals share — so every overlapping pair emits exactly once and
   * the plan needs NO distinct (a pair sharing k bins would otherwise
   * produce k duplicates and a full dedup shuffle). Cost stays linear in
   * rows × span/binWidth, never |A|×|B|.
   */
  def intervalOverlap(
      left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binWidth: Double, on: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet) -- on
    require(overlap.isEmpty,
      s"column collision between sides: ${overlap.mkString(",")}")
    def binned(df: DataFrame, s: String, e: String) =
      df.withColumn("graft_bin", explode(sequence(
        floor(col(s) / binWidth).cast("long"),
        floor(col(e) / binWidth).cast("long"))))
    binned(left, lStart, lEnd).join(binned(right, rStart, rEnd), on :+ "graft_bin")
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("graft_bin") ===
          floor(greatest(col(lStart), col(rStart)) / binWidth).cast("long"))
      .drop("graft_bin")
  }
}
