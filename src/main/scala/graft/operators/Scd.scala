package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * SCD Type-2 (slowly-changing dimension) history maintenance — the
 * versioned-dimension pattern every warehouse keeps for entities whose
 * attributes drift (customer segment, host quality tier, document
 * license): one row per (key, version) with `valid_from` / `valid_to`
 * effective intervals and `is_current` on the open row. Joining facts
 * point-in-time is then [[AsOf.asofJoin]] against `valid_from`.
 *
 * Two faces:
 *  - [[fromChangeLog]] — full rebuild from an event log, with NO-CHANGE
 *    COLLAPSE: consecutive observations with identical attribute values
 *    extend the existing version instead of opening a redundant one
 *    (idempotent re-observations don't fragment history);
 *  - [[merge]] — incremental: ONLY keys present in the new batch pay the
 *    window (semi-join restricted), untouched keys' history is carried
 *    verbatim; merge == rebuild is spec-pinned.
 *
 * Plan: one window partitioned BY KEY ordered by ts (never global), one
 * lag for the collapse, one lead for the interval close. Ties on
 * (key, ts) must not exist (two versions can't start at the same
 * instant) — duplicated (key, ts) rows keep the LAST by attribute order
 * deterministically, documented rather than silent.
 */
object Scd {

  /** Rebuild the full SCD2 table from a change log `(keyCols…, tsCol,
   * attribute columns = everything else)`. Output: key and attribute
   * columns plus (valid_from, valid_to, is_current). */
  def fromChangeLog(log: DataFrame, keyCols: Seq[String], tsCol: String): DataFrame = {
    require(keyCols.nonEmpty, "fromChangeLog needs at least one key column")
    val attrs = log.columns.filterNot(c => keyCols.contains(c) || c == tsCol).toSeq
    require(attrs.nonEmpty, "fromChangeLog needs at least one attribute column")
    val key = keyCols.map(col)
    val wOrd = Window.partitionBy(key: _*).orderBy(col(tsCol).asc)
    // (key, ts) duplicates: keep one deterministic winner (max by the
    // attribute struct) so history never has zero-length versions
    val dedup = log
      .withColumn("graft_attrs", struct(attrs.map(col): _*))
      .withColumn("graft_rn", row_number().over(
        Window.partitionBy(key :+ col(tsCol): _*)
          .orderBy(col("graft_attrs").desc)))
      .where(col("graft_rn") === 1).drop("graft_rn")
    // no-change collapse: a row opens a version only when its attributes
    // differ from the previous observation (struct equality is null-safe
    // via <=>)
    val opens = dedup
      .withColumn("graft_prev", lag(col("graft_attrs"), 1).over(wOrd))
      .where(!(col("graft_attrs") <=> col("graft_prev")))
    opens
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(wOrd))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols.map(col) ++ attrs.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current"))): _*)
  }

  /**
   * Incremental merge: fold a new change batch into an existing SCD2
   * table (a [[fromChangeLog]] output). Keys absent from the batch carry
   * over untouched; affected keys rebuild from their existing OPEN-ROW
   * observation plus closed-version starts plus the batch — equivalent to
   * a full rebuild over the concatenated log (spec-pinned), but the
   * window only runs over the affected slice.
   */
  def merge(dim: DataFrame, batch: DataFrame, keyCols: Seq[String],
      tsCol: String): DataFrame = {
    val key = keyCols.map(col)
    val attrs = dim.columns
      .filterNot(c => keyCols.contains(c) ||
        Seq("valid_from", "valid_to", "is_current").contains(c)).toSeq
    val batchKeys = batch.select(key: _*).distinct()
    val untouched = dim.join(batchKeys, keyCols, "left_anti")
    val affectedLog = dim.join(batchKeys, keyCols, "left_semi")
      .select((keyCols.map(col) ++ attrs.map(col) :+
        col("valid_from").as(tsCol)): _*)
      .unionByName(batch.select((keyCols.map(col) ++ attrs.map(col) :+
        col(tsCol)): _*))
    untouched.unionByName(fromChangeLog(affectedLog, keyCols, tsCol))
  }
}
