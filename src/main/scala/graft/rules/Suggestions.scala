package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Constraint SUGGESTION — profile a table and propose the data-quality
 * rules it already satisfies (the Deequ-style "generate the suite from the
 * data you trust, then pin it" workflow). The output is a planning table:
 * one row per (column, suggestion) with the ready-to-use rule predicate in
 * `rule_sql`, feedable straight into the [[RuleRunner]] / dataset-check
 * gates after human review.
 *
 * Suggested kinds, all from exact observed stats (ppm integer convention,
 * no sampling — the suite you pin should be the one the data provably
 * passes today):
 *  - `not_null`      — column had zero NULLs
 *  - `completeness`  — column has NULLs; pin the observed null rate,
 *                      rounded UP to the next 1% (10,000 ppm), as a ceiling
 *  - `unique`        — all non-null values distinct
 *  - `in_set`        — string column with ≤ `inSetMaxDistinct` distinct
 *                      values: membership in the observed (sorted) set
 *  - `non_negative`  — integral column with min ≥ 0
 *  - `range`         — integral column: BETWEEN observed min AND max
 *  - `max_length`    — string column: length ceiling
 * (Fractional columns get no embedded-literal suggestions — double→text
 * formatting is engine-dependent; their null/unique kinds still apply.)
 *
 * Cost at scale: one combining aggregate for counts/min/max/maxlen (no
 * shuffle beyond the single-row agg) plus ONE exchange of (column, value)
 * pairs for exact distinctness — the honest price of exact profiles
 * (approx sketches can't back a rule you'll enforce exactly). Profile only
 * the columns you intend to gate via `cols`; the value sets collected for
 * `in_set` are bounded by `inSetMaxDistinct × columns` by construction.
 */
object Suggestions {

  def suggestRules(
      df: DataFrame, cols: Seq[String] = Nil,
      inSetMaxDistinct: Int = 10): DataFrame = {
    val columns = if (cols.nonEmpty) cols else df.columns.toSeq
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    columns.foreach(c => require(fields.contains(c), s"no such column: $c"))
    def integral(c: String) = fields(c) match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    def stringy(c: String) = fields(c) == StringType

    // Pass A: one combining aggregate — per-column non-null counts,
    // integral min/max (as long), string max length.
    val aggs: Seq[Column] = columns.flatMap { c =>
      Seq(count(col(c)).as(s"graft_nn_$c")) ++
        (if (integral(c))
          Seq(min(col(c)).cast("long").as(s"graft_mn_$c"),
            max(col(c)).cast("long").as(s"graft_mx_$c"))
        else Nil) ++
        (if (stringy(c)) Seq(max(length(col(c))).as(s"graft_ml_$c")) else Nil)
    }
    val nullLong = lit(null).cast("long")
    val profile = df.agg(count(lit(1)).as("graft_n"), aggs: _*)
      .select(col("graft_n"), explode(array(columns.map { c =>
        struct(lit(c).as("column_name"),
          col(s"graft_nn_$c").as("graft_nn"),
          (if (integral(c)) col(s"graft_mn_$c") else nullLong).as("graft_mn"),
          (if (integral(c)) col(s"graft_mx_$c") else nullLong).as("graft_mx"),
          (if (stringy(c)) col(s"graft_ml_$c").cast("long") else nullLong).as("graft_ml"))
      }: _*)).as("graft_p"))
      .select(col("graft_n"), col("graft_p.*"))

    // Pass B: exact distinctness — one exchange of (column, value) pairs.
    val melted = df
      .select(explode(array(columns.map(c =>
        struct(lit(c).as("column_name"), col(c).cast("string").as("graft_v"))): _*)).as("graft_m"))
      .select(col("graft_m.*")).where(col("graft_v").isNotNull)
      .distinct()
    val dcounts = melted.groupBy("column_name").agg(count(lit(1)).as("graft_nd"))
    val stringCols = columns.filter(stringy)
    val sets =
      if (stringCols.isEmpty) dcounts.where(lit(false))
        .select(col("column_name"), array().cast("array<string>").as("graft_vals"))
      else melted
        .join(broadcast(dcounts.where(col("graft_nd") <= inSetMaxDistinct)
          .where(col("column_name").isin(stringCols: _*)).select("column_name")), "column_name")
        .groupBy("column_name")
        .agg(sort_array(collect_list(col("graft_v"))).as("graft_vals"))

    val p = profile
      .join(dcounts, Seq("column_name"), "left")
      .join(sets, Seq("column_name"), "left")
      .withColumn("graft_nd", coalesce(col("graft_nd"), lit(0L)))

    val nullPpm = expr("(graft_n - graft_nn) * 1000000L div nullif(graft_n, 0L)")
    val cappedPpm = expr(
      "((graft_n - graft_nn) * 1000000L div nullif(graft_n, 0L) + 9999L) div 10000L * 10000L")
    val noDetail = lit(null).cast("string")
    def sug(cond: Column, kind: String, rule: Column, details: Column) =
      when(cond, struct(lit(kind).as("kind"), rule.as("rule_sql"), details.as("details")))
    val inSetRule = concat(col("column_name"), lit(" IN ('"),
      array_join(transform(col("graft_vals"), v => regexp_replace(v, "'", "''")), "','"),
      lit("')"))
    val suggestions = array(
      sug(col("graft_nn") === col("graft_n") && col("graft_n") > 0,
        "not_null", concat(col("column_name"), lit(" IS NOT NULL")), lit("null_ppm=0")),
      sug(col("graft_nn") < col("graft_n"),
        "completeness",
        concat(lit("null_ppm("), col("column_name"), lit(") <= "), cappedPpm),
        concat(lit("observed_null_ppm="), nullPpm)),
      sug(col("graft_nn") > 0 && col("graft_nd") === col("graft_nn"),
        "unique", concat(col("column_name"), lit(" IS UNIQUE")), noDetail),
      sug(col("graft_vals").isNotNull && col("graft_nd") > 0,
        "in_set", inSetRule, concat(lit("n_distinct="), col("graft_nd"))),
      sug(col("graft_mn").isNotNull && col("graft_mn") >= 0 && col("graft_nn") > 0,
        "non_negative", concat(col("column_name"), lit(" >= 0")), noDetail),
      sug(col("graft_mn").isNotNull && col("graft_nn") > 0,
        "range",
        concat(col("column_name"), lit(" BETWEEN "), col("graft_mn"),
          lit(" AND "), col("graft_mx")), noDetail),
      sug(col("graft_ml").isNotNull && col("graft_nn") > 0,
        "max_length",
        concat(lit("length("), col("column_name"), lit(") <= "), col("graft_ml")), noDetail))
    p.select(col("column_name"), explode(array_compact(suggestions)).as("graft_s"))
      .select(col("column_name"), col("graft_s.kind"), col("graft_s.rule_sql"),
        col("graft_s.details"))
  }
}
