package graft.rules

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Dataset-LEVEL data-quality checks — the constraints a row-local rule
 * (one row in, one result out — the whole [[RuleRunner]] model) cannot
 * express, because they quantify over the dataset: key uniqueness,
 * referential integrity between tables, and column completeness. Each
 * returns a small report frame with exact parts-per-million rates (the
 * engine-wide integer convention), ready to gate a release on or to land
 * in the same dashboard as [[RuleRunner.ruleStats]].
 */
object DatasetChecks {

  /** Key uniqueness: (rows, distinct_keys, rows_in_dup_keys, max_per_key,
   * dup_ppm) for the composite key `keyCols`. Rows whose key appears more
   * than once ALL count as duplicates (a release gate wants the affected
   * mass, not dup_count−1 bookkeeping). NULL key parts group like values
   * (two all-NULL keys are the same key — loud, not invisible). One keyed
   * count + one combining aggregate. */
  def uniquenessReport(df: DataFrame, keyCols: Column*): DataFrame = {
    require(keyCols.nonEmpty, "uniquenessReport needs at least one key column")
    df.select(struct(keyCols: _*).as("graft_k"))
      .groupBy(col("graft_k")).agg(count(lit(1)).as("graft_c"))
      .agg(
        sum(col("graft_c")).as("rows"),
        count(lit(1)).as("distinct_keys"),
        sum(when(col("graft_c") > 1, col("graft_c")).otherwise(0L)).as("rows_in_dup_keys"),
        max(col("graft_c")).as("max_per_key"))
      .select(col("rows"), col("distinct_keys"), col("rows_in_dup_keys"),
        col("max_per_key"),
        expr("rows_in_dup_keys * 1000000L div nullif(rows, 0L)").as("dup_ppm"))
  }

  /** Referential integrity: child rows whose non-null foreign key has no
   * match in the parent's key set — (child_rows, null_fk, orphans,
   * orphan_ppm over the non-null keys; NULL fks are reported, not counted
   * as orphans — absent-by-design is a different defect than dangling).
   * Plan: the parent side reduces to DISTINCT keys before the join (at
   * any scale the key set ≪ the parent table), one left join carrying
   * only key columns, one combining aggregate. */
  def referentialReport(
      child: DataFrame, fkCol: Column, parent: DataFrame, pkCol: Column): DataFrame = {
    val keys = parent.select(pkCol.as("graft_pk")).where(col("graft_pk").isNotNull)
      .distinct().withColumn("graft_hit", lit(true))
    child.select(fkCol.as("graft_fk"))
      .join(keys, col("graft_fk") === col("graft_pk"), "left")
      .agg(
        count(lit(1)).as("child_rows"),
        count(when(col("graft_fk").isNull, 1)).as("null_fk"),
        count(when(col("graft_fk").isNotNull && col("graft_hit").isNull, 1)).as("orphans"))
      .select(col("child_rows"), col("null_fk"), col("orphans"),
        expr("orphans * 1000000L div nullif(child_rows - null_fk, 0L)").as("orphan_ppm"))
  }

  /** Functional dependency A → B: does the determinant `detCols` uniquely
   * decide `depCol`? Violations are determinant groups carrying MORE than
   * one distinct dependent value — denormalization drift, mixed-source
   * merges, casing bugs ("one customer id, two names"). Returns
   * (determinants, violating_determinants, violation_ppm, max_variants).
   * One keyed exact count-distinct + one combining aggregate; NULL
   * dependents count as a value (a null among non-nulls IS a violation). */
  def functionalDependencyReport(
      df: DataFrame, depCol: Column, detCols: Column*): DataFrame = {
    require(detCols.nonEmpty, "functionalDependencyReport needs determinant columns")
    df.select(struct(detCols: _*).as("graft_det"), depCol.as("graft_dep"))
      .groupBy(col("graft_det"))
      .agg(count_distinct(struct(col("graft_dep"))).as("graft_v"))
      .agg(
        count(lit(1)).as("determinants"),
        count(when(col("graft_v") > 1, 1)).as("violating_determinants"),
        max(col("graft_v")).as("max_variants"))
      .select(col("determinants"), col("violating_determinants"),
        expr("violating_determinants * 1000000L div nullif(determinants, 0L)")
          .as("violation_ppm"),
        col("max_variants"))
  }

  /**
   * Functional-dependency DISCOVERY — the Deequ-style profiling twin of
   * [[functionalDependencyReport]] (which checks one GIVEN dependency):
   * test every ordered column pair (A → B) of `cols` and report how badly
   * each fails. The output is the map a schema-drift reviewer or a
   * constraint-suggestion pass reads: `holds` rows are invariants worth
   * pinning as rules; high-violation rows are keys that LOOK like ids but
   * aren't.
   *
   * One grouped pass per determinant column (schema-bounded, not
   * data-bounded): groupBy(A) computes count_distinct(struct(B)) for all
   * other columns at once — NULL dependents count as a variant (struct
   * wrapping, same convention as the single-FD report). Returns one row
   * per ordered pair: (determinant, dependent, n_keys,
   * violating_keys, holds).
   */
  def discoverFunctionalDependencies(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "FD discovery needs at least two columns")
    require(cols.distinct.size == cols.size, "columns must be distinct")
    cols.map { a =>
      val deps = cols.filterNot(_ == a)
      val aggs = deps.map(b => count_distinct(struct(col(b))).as(s"graft_d_$b"))
      val grouped = df.groupBy(col(a).as("graft_k")).agg(aggs.head, aggs.tail: _*)
      val stats = grouped.agg(
        count(lit(1)).as("graft_nk"),
        deps.map(b => count(when(col(s"graft_d_$b") > 1, 1)).as(s"graft_v_$b")): _*)
      stats.select(lit(a).as("determinant"), col("graft_nk"),
          explode(map(deps.flatMap(b =>
            Seq(lit(b), col(s"graft_v_$b"))): _*)).as(Seq("dependent", "violating_keys")))
        .select(col("determinant"), col("dependent"),
          col("graft_nk").as("n_keys"), col("violating_keys"),
          (col("violating_keys") === 0).as("holds"))
    }.reduce(_ unionAll _)
  }

  /** Per-key ordering health — streaming-intake hygiene: of the
   * consecutive event pairs within each key (ordered by a tiebroken
   * (ts, seq) so the answer is a pure function of the data, not of
   * arrival order), how many arrive with a ts REGRESSION? Returns
   * (keys, pairs, regressions, regression_ppm). High regression rates
   * mean the upstream's clocks or partitioning are lying — sessionizers
   * and watermarks will silently drop or misgroup. The window partitions
   * by key (bounded per-key event counts, the [[graft.operators
   * .Sessionize]] contract), never by the whole frame. */
  def orderingReport(
      df: DataFrame, keyCol: Column, tsCol: Column, seqCol: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("graft_k")).orderBy(col("graft_seq"))
    df.select(keyCol.as("graft_k"), tsCol.as("graft_ts"), seqCol.as("graft_seq"))
      .withColumn("graft_prev", lag(col("graft_ts"), 1).over(w))
      .agg(
        count_distinct(col("graft_k")).as("keys"),
        count(when(col("graft_prev").isNotNull, 1)).as("pairs"),
        count(when(col("graft_prev") > col("graft_ts"), 1)).as("regressions"))
      .select(col("keys"), col("pairs"), col("regressions"),
        expr("regressions * 1000000L div nullif(pairs, 0L)").as("regression_ppm"))
  }

  /** Schema diff between two frames — release QA's metadata side: one row
   * per column that was added, removed, or changed type (DDL strings
   * compared). Pure driver-side metadata, no job. */
  def schemaDiff(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val spark = oldDf.sparkSession
    import spark.implicits._
    val o = oldDf.schema.fields.map(f => f.name -> f.dataType.sql).toMap
    val n = newDf.schema.fields.map(f => f.name -> f.dataType.sql).toMap
    val rows =
      (n.keySet -- o.keySet).toSeq.sorted.map(c => (c, "added", "", n(c))) ++
      (o.keySet -- n.keySet).toSeq.sorted.map(c => (c, "removed", o(c), "")) ++
      (o.keySet & n.keySet).toSeq.sorted.collect {
        case c if o(c) != n(c) => (c, "type_changed", o(c), n(c))
      }
    rows.toDF("column", "change", "old_type", "new_type")
  }

  /** Column completeness: (column, rows, nulls, null_ppm) for each named
   * column — the missing-data profile. ONE pass over the frame (a single
   * aggregate computes every column's null count; stack unpivots the one
   * result row), not a scan per column. */
  def completenessReport(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "completenessReport needs at least one column")
    val aggs = count(lit(1)).as("graft_rows") +:
      columns.zipWithIndex.map { case (c, i) =>
        count(when(col(c).isNull, 1)).as(s"graft_n_$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = columns.zipWithIndex
      .map { case (c, i) => s"'${c.replace("'", "''")}', graft_n_$i" }
      .mkString(", ")
    one.selectExpr("graft_rows",
        s"stack(${columns.size}, $stackArgs) as (column, nulls)")
      .select(col("column"), col("graft_rows").as("rows"), col("nulls"),
        expr("nulls * 1000000L div nullif(graft_rows, 0L)").as("null_ppm"))
  }

  /**
   * Column-level change report between two keyed snapshots — the drill-in
   * after [[schemaDiff]] (what columns exist) and
   * [[graft.pipeline.Curation.corpusDiff]] (which rows appeared/vanished):
   * for rows present in BOTH snapshots, how many changed PER COLUMN.
   * Null-safe equality (`<=>`): null→value and value→null both count as
   * changes, null→null doesn't. One inner join on the key + one combining
   * aggregate + a stack to rows. Output per compared column:
   * (column, matched_rows, changed, changed_ppm).
   */
  def valueDrift(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "valueDrift needs at least one key column")
    val compared = oldDf.columns.filterNot(keyCols.contains)
      .filter(newDf.columns.contains).toSeq
    require(compared.nonEmpty, "no shared non-key columns to compare")
    val o = oldDf.select((keyCols ++ compared).map(c => col(c).as(s"graft_o_$c")): _*)
    val n = newDf.select((keyCols ++ compared).map(c => col(c).as(s"graft_n_$c")): _*)
    val joined = o.join(n,
      keyCols.map(k => col(s"graft_o_$k") === col(s"graft_n_$k")).reduce(_ && _))
    val aggs = count(lit(1)).as("graft_rows") +:
      compared.zipWithIndex.map { case (c, i) =>
        count(when(!(col(s"graft_o_$c") <=> col(s"graft_n_$c")), 1)).as(s"graft_c_$i")
      }
    val one = joined.agg(aggs.head, aggs.tail: _*)
    val stackArgs = compared.zipWithIndex
      .map { case (c, i) => s"'${c.replace("'", "''")}', graft_c_$i" }
      .mkString(", ")
    one.selectExpr("graft_rows",
        s"stack(${compared.size}, $stackArgs) as (column, changed)")
      .select(col("column"), col("graft_rows").as("matched_rows"), col("changed"),
        expr("changed * 1000000L div nullif(graft_rows, 0L)").as("changed_ppm"))
  }

  /**
   * Snapshot delta attribution (Adtributor-style root-cause slicing):
   * a metric moved between two snapshots — WHICH dimension values moved
   * it? Per value of `dimCol`: the metric in each snapshot, its delta,
   * and the delta's share of the total movement in ppm (signed; shares
   * of offsetting movements can exceed ±10⁶, which is itself the
   * "mix shift" signal). Metric = row count by default, or Σ`weightCol`
   * in integer units when given. Values present in only one snapshot
   * appear with the other side at 0 — disappearance is attribution too.
   *
   * One aggregate per snapshot + an outer join on the dimension value +
   * a broadcast total — exact integers end to end.
   */
  def deltaAttribution(
      oldDf: DataFrame, newDf: DataFrame, dimCol: Column,
      weightCol: Column = null): DataFrame = {
    def side(df: DataFrame, out: String): DataFrame = {
      val m = if (weightCol == null) count(lit(1))
        else coalesce(sum(weightCol.cast("long")), lit(0L))
      df.groupBy(dimCol.cast("string").as("dim_value")).agg(m.as(out))
    }
    val o = side(oldDf, "graft_old")
    val n = side(newDf, "graft_new")
    val joined = o.join(n, Seq("dim_value"), "full_outer")
      .select(col("dim_value"),
        coalesce(col("graft_old"), lit(0L)).as("metric_old"),
        coalesce(col("graft_new"), lit(0L)).as("metric_new"))
      .withColumn("delta", col("metric_new") - col("metric_old"))
    val total = joined.agg(sum(col("delta")).as("graft_total"))
    joined.crossJoin(broadcast(total))
      .select(col("dim_value"), col("metric_old"), col("metric_new"), col("delta"),
        expr("delta * 1000000L div nullif(graft_total, 0L)").as("share_ppm"))
  }

  /** Expected Benford first-digit shares in ppm: floor(log10(1 + 1/d)·10⁶). */
  private val benfordPpm: Map[Int, Long] =
    (1 to 9).map(d => d -> math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong).toMap

  /**
   * Benford's-law conformity — the forensic DQ check for "organically
   * grown" numeric columns (amounts, populations, trade sizes): their
   * first significant digits should follow P(d) = log₁₀(1 + 1/d), and a
   * fabricated or truncated column visibly doesn't. One aggregate over
   * the first significant digit of |value| (zeros/NaN/null excluded,
   * magnitude-independent); per digit: observed count, observed ppm, the
   * Benford expectation, and |obs − exp| in ppm; total_deviation_ppm =
   * Σ|obs − exp| is the scale-free statistic to gate on (uniform digits
   * score ~584,000; conforming data near 0). Everything exact integers
   * over one pass — no window, no collect.
   */
  def benfordReport(df: DataFrame, valueCol: Column): DataFrame = {
    val v = abs(valueCol.cast("double"))
    // first significant digit: shift |v| into [1, 10) by its own log10
    val digit = floor(v / pow(lit(10.0), floor(log10(v)))).cast("int")
    val counted = df
      .where(v.isNotNull && !isnan(v) && v > 0.0)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val expected = df.sparkSession.createDataFrame(
      benfordPpm.toSeq.sortBy(_._1).map { case (d, p) => (d, p) })
      .toDF("digit", "expected_ppm")
    val total = counted.agg(sum(col("n")).as("graft_tot"))
    counted.join(broadcast(expected), Seq("digit"), "right")
      .crossJoin(broadcast(total))
      .select(col("digit"),
        coalesce(col("n"), lit(0L)).as("n"),
        expr("coalesce(n, 0L) * 1000000L div nullif(graft_tot, 0L)").as("observed_ppm"),
        col("expected_ppm"))
      .withColumn("deviation_ppm", abs(col("observed_ppm") - col("expected_ppm")))
  }

  /**
   * Mutual information between two categorical columns — the
   * feature-relevance / leakage detector: MI(label, metadata) near H
   * means the metadata GIVES AWAY the label (train/test leakage through
   * a join key, a source column that determines the class); MI near 0
   * means independent. Numeric columns should be bucketed by the caller
   * (floor/width or [[graft.functions.LogHistogram]] buckets) — the cell
   * census is bounded by |X|·|Y|, and that bound is the caller's choice.
   *
   * Fixed-point contract (the [[graft.pipeline.Lm]] discipline): each
   * cell's MI term and each marginal's entropy term computes in one fixed
   * IEEE order and floors to 1e-9 units BEFORE the order-independent
   * integer sum, so the report hash-matches any engine. NULL is a
   * category (grouped, not dropped — a null-correlated label is exactly
   * the leak you want caught). One census aggregate, two marginal
   * aggregates, joins on the marginal keys; nothing quadratic, nothing
   * collected.
   *
   * Returns one row: (n, x_values, y_values, cells, mi_e9, hx_e9, hy_e9,
   * nmi_ppm = 2·MI/(Hx+Hy) — 0 when both entropies are 0).
   */
  def mutualInformation(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val cells = df.select(xCol.cast("string").as("graft_x"), yCol.cast("string").as("graft_y"))
      .groupBy(col("graft_x"), col("graft_y")).agg(count(lit(1)).as("graft_nxy"))
    // marginal keys renamed + null-SAFE join conditions: NULL is a real
    // category here and a plain equi-join would silently drop its cells
    val mx = cells.groupBy(col("graft_x")).agg(sum(col("graft_nxy")).as("graft_nx"))
      .withColumnRenamed("graft_x", "graft_xk")
    val my = cells.groupBy(col("graft_y")).agg(sum(col("graft_nxy")).as("graft_ny"))
      .withColumnRenamed("graft_y", "graft_yk")
    val tot = cells.agg(sum(col("graft_nxy")).as("graft_n"))
    val nn = col("graft_n").cast("double")
    val nxy = col("graft_nxy").cast("double")
    val nx = col("graft_nx").cast("double")
    val ny = col("graft_ny").cast("double")
    val miTerm = floor((nxy / nn) * log((nxy * nn) / (nx * ny)) * lit(1e9))
    val joined = cells
      .join(mx, col("graft_x") <=> col("graft_xk"))
      .join(my, col("graft_y") <=> col("graft_yk"))
      .crossJoin(broadcast(tot))
    val mi = joined.agg(
      max(col("graft_n")).as("n"),
      count(lit(1)).as("cells"),
      sum(miTerm).as("mi_e9"))
    def entropy(m: DataFrame, nCol: Column, values: String, out: String) =
      m.crossJoin(broadcast(tot))
        .agg(count(lit(1)).as(values),
          sum(floor(-(nCol.cast("double") / nn) *
            log(nCol.cast("double") / nn) * lit(1e9))).as(out))
    val hx = entropy(mx, col("graft_nx"), "x_values", "hx_e9")
    val hy = entropy(my, col("graft_ny"), "y_values", "hy_e9")
    mi.crossJoin(hx).crossJoin(hy)
      .select(col("n"), col("x_values"), col("y_values"), col("cells"),
        col("mi_e9"), col("hx_e9"), col("hy_e9"),
        coalesce(expr("2 * mi_e9 * 1000000L div nullif(hx_e9 + hy_e9, 0L)"), lit(0L))
          .as("nmi_ppm"))
  }
}
