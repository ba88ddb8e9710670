package graft.rules

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.{Column, DataFrame}

/**
 * The expression runner (reference: impl/ExpressionRunner.scala,
 * docs/advanced/expressionRunner.md): run arbitrary expressions (including
 * agg_expr aggregations) per rule, keeping results as strings plus their
 * DDL type:
 *   struct<id: bigint, ruleSetResults:
 *          map<bigint, map<bigint, struct<result: string, resultDDL: string>>>>
 * The typed variant keeps results as a caller-supplied type instead.
 */
object ExpressionRunner {

  /** Analyze the suite's expressions against the frame to learn result types. */
  private def ddls(df: DataFrame, suite: RuleSuite): Seq[String] = {
    val probe = df.select(suite.rules.zipWithIndex.map { case ((_, r), i) =>
      Parsing.parseCol(r.sql, suite).as(s"e$i")
    }: _*)
    probe.schema.fields.map(_.dataType.sql).toSeq
  }

  private def assemble(suite: RuleSuite, value: (Rule, Int) => Column): Column = {
    var i = -1
    val setEntries = suite.ruleSets.flatMap { rs =>
      val ruleEntries = rs.rules.flatMap { r =>
        i += 1
        Seq(lit(Id.pack(r.id)), value(r, i))
      }
      Seq(lit(Id.pack(rs.id)), map(ruleEntries: _*))
    }
    struct(
      lit(Id.pack(suite.id)).as("id"),
      map(setEntries: _*).as("ruleSetResults"))
  }

  /** String+DDL results (the reference's default expressionRunner shape).
   * `yamlResults=true` stores to_yaml renderings instead of plain casts —
   * the newer reference encoding, round-trippable via from_yaml. */
  def addExpressionResults(
      df: DataFrame, suite: RuleSuite, name: String = "expressionResults",
      yamlResults: Boolean = false,
      renderOptions: Map[String, String] = Map.empty): DataFrame = {
    val types = ddls(df, suite)
    val fullScalar = renderOptions.get("useFullScalarType").exists(_.toBoolean)
    def render(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      if (yamlResults)
        org.apache.spark.sql.graft.Bridge.column(
          graft.functions.YamlEncodeExpression(
            org.apache.spark.sql.graft.Bridge.expression(c), fullScalar))
      else c.cast(StringType)
    val out = assemble(suite, (r, i) =>
      struct(
        render(Parsing.parseCol(r.sql, suite)).as("result"),
        lit(types(i)).as("resultDDL")))
    df.withColumn(name, out)
  }

  /** Typed results: every expression cast to `ddl`. */
  def addTypedExpressionResults(
      df: DataFrame, suite: RuleSuite, ddl: String,
      name: String = "expressionResults"): DataFrame =
    df.withColumn(name, assemble(suite, (r, _) => Parsing.parseCol(r.sql, suite).cast(ddl)))

  /**
   * Aggregate-rule variant (reference: docs/advanced/expressionRunner.md —
   * "manage multiple agg_expr aggregations in a single pass"): every rule is
   * an aggregate (agg_expr/sum_with/…); returns the one-row result frame.
   * One pass over the data, all aggregations partial-aggregated map-side.
   */
  def aggExpressionResults(
      df: DataFrame, suite: RuleSuite, name: String = "expressionResults"): DataFrame = {
    val probe = df.groupBy().agg(
      Parsing.parseCol(suite.rules.head._2.sql, suite).as("e0"),
      suite.rules.tail.zipWithIndex.map { case ((_, r), i) =>
        Parsing.parseCol(r.sql, suite).as(s"e${i + 1}")
      }: _*)
    val types = probe.schema.fields.map(_.dataType.sql)
    var i = -1
    val flat = probe.columns
    val renamed = probe // single row of aggregate results
    val setEntries = suite.ruleSets.flatMap { rs =>
      val ruleEntries = rs.rules.flatMap { r =>
        i += 1
        Seq(lit(Id.pack(r.id)),
          struct(col(flat(i)).cast(StringType).as("result"), lit(types(i)).as("resultDDL")))
      }
      Seq(lit(Id.pack(rs.id)), map(ruleEntries: _*))
    }
    renamed.select(struct(
      lit(Id.pack(suite.id)).as("id"),
      map(setEntries: _*).as("ruleSetResults")).as(name))
  }

  /** Column name for one rule's flat result: `<name>_<rsId>_<rsV>_<rId>_<rV>`. */
  def flatColumnName(name: String, ruleSet: Id, rule: Id): String =
    s"${name}_${ruleSet.id}_${ruleSet.version}_${rule.id}_${rule.version}"

  /**
   * Flat-column emission: one `struct<result, resultDDL>` column per rule
   * instead of the single nested map struct. Extracting one rule's result
   * downstream is then a plain column reference — Catalyst prunes the scan to
   * exactly that rule's input columns with no optimizer fold in the loop
   * (the nested shape needs StaticHofUnroll's `rule_result` constant-fold to
   * prune). Assemble the reference's nested shape only at persist time via
   * [[assembleExpressionResults]].
   */
  def addFlatExpressionResults(
      df: DataFrame, suite: RuleSuite, name: String = "expressionResults",
      yamlResults: Boolean = false,
      renderOptions: Map[String, String] = Map.empty): DataFrame = {
    val types = ddls(df, suite)
    val fullScalar = renderOptions.get("useFullScalarType").exists(_.toBoolean)
    def render(c: Column): Column =
      if (yamlResults)
        org.apache.spark.sql.graft.Bridge.column(
          graft.functions.YamlEncodeExpression(
            org.apache.spark.sql.graft.Bridge.expression(c), fullScalar))
      else c.cast(StringType)
    var i = -1
    val flatCols = suite.ruleSets.flatMap { rs =>
      rs.rules.map { r =>
        i += 1
        struct(
          render(Parsing.parseCol(r.sql, suite)).as("result"),
          lit(types(i)).as("resultDDL")).as(flatColumnName(name, rs.id, r.id))
      }
    }
    df.select(df.columns.map(col) ++ flatCols: _*)
  }

  /** Fold flat per-rule columns back into the reference's nested struct
   * (dropping the flat columns) — the persist-time counterpart of
   * [[addFlatExpressionResults]]. */
  def assembleExpressionResults(
      df: DataFrame, suite: RuleSuite, name: String = "expressionResults"): DataFrame = {
    val flatNames = suite.ruleSets.flatMap(rs =>
      rs.rules.map(r => flatColumnName(name, rs.id, r.id))).toSet
    val setEntries = suite.ruleSets.flatMap { rs =>
      val ruleEntries = rs.rules.flatMap { r =>
        Seq(lit(Id.pack(r.id)), col(flatColumnName(name, rs.id, r.id)))
      }
      Seq(lit(Id.pack(rs.id)), map(ruleEntries: _*))
    }
    val nested = struct(
      lit(Id.pack(suite.id)).as("id"),
      map(setEntries: _*).as("ruleSetResults"))
    df.select(df.columns.filterNot(flatNames).map(col) :+ nested.as(name): _*)
  }

  /** strip_result_ddl: drop the DDL field, keeping result strings
   * (reference: impl/ExpressionRunner.scala StripResultTypes). */
  def stripResultDdl(c: Column): Column =
    struct(
      c.getField("id").as("id"),
      transform_values(c.getField("ruleSetResults"), (_, rules) =>
        transform_values(rules, (_, v) => v.getField("result"))).as("ruleSetResults"))
}
