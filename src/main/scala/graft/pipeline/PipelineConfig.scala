package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Curation pipeline as CONFIG — the reference's rules-as-data philosophy
 * (rule suites serialized to frames / external stores, versioned,
 * validated before running: reference impl/util/Serializing.scala and
 * Validation.scala) applied to the pipeline tier. A curation run at
 * 100 TB is an auditable artifact: the exact gate order, thresholds and
 * dictionaries belong in reviewable, diffable config, not in code
 * rebuilt per run.
 *
 * v1 step vocabulary (all compose to the same operators the code path
 * uses — config adds NO new execution semantics):
 *
 * {{{
 * version: 1
 * name: crawl_curation
 * steps:
 *   - {kind: with_column, name: add_tokens, column: toks, expr: "token_count(text)"}
 *   - {kind: filter,      name: min_tokens, where: "toks >= 40"}
 *   - {kind: blocklist,   name: badwords, column: text,
 *      phrases: [bad phrase, worse phrase], maxHits: 0, engine: auto}
 *   - {kind: dedup_exact, name: exact, id: doc_id, content: [text]}
 *   - {kind: dedup_near,  name: near, id: doc_id, text: text,
 *      shingleSize: 3, threshold: 0.8, maxBucketSize: 1000}
 *   - {kind: cap_per_key, name: domain_cap, key: "url_host(url)", id: doc_id, max: 100}
 *   - {kind: drop_columns, name: cleanup, columns: [toks]}
 * }}}
 *
 * SQL expressions in `expr` / `where` / `key` / `priority` resolve with
 * the session parser, so every registered graft function (langid, gopher,
 * token_count, pii, …) is available — the whole scalar tier is already
 * config-reachable. `validate(schema)` dry-resolves every step against an
 * empty frame (exactly the reference's validate-before-run posture) and
 * returns per-step errors without touching data.
 */
object PipelineConfig {

  sealed trait PipeStep {
    def name: String
    def kind: String
    def apply(df: DataFrame): DataFrame
    /** Row-local steps (no corpus-wide state) compose onto Structured
     * Streaming unchanged; corpus-level steps (dedup, caps, quantiles,
     * sampling) are batch-only. */
    def rowLocal: Boolean
    /** Field map for serialization (insertion-ordered). */
    private[pipeline] def fields: Seq[(String, Any)]
  }

  case class WithColumnStep(name: String, column: String, expr: String) extends PipeStep {
    def kind = "with_column"
    def rowLocal = true
    def apply(df: DataFrame): DataFrame = df.withColumn(column, expr_(expr))
    private[pipeline] def fields = Seq("column" -> column, "expr" -> expr)
  }

  case class FilterStep(name: String, where: String) extends PipeStep {
    def kind = "filter"
    def rowLocal = true
    def apply(df: DataFrame): DataFrame = df.where(expr_(where))
    private[pipeline] def fields = Seq("where" -> where)
  }

  case class DropColumnsStep(name: String, columns: Seq[String]) extends PipeStep {
    def kind = "drop_columns"
    def rowLocal = true
    def apply(df: DataFrame): DataFrame = df.drop(columns: _*)
    private[pipeline] def fields = Seq("columns" -> columns)
  }

  /** engine: "regex" | "automaton" | "auto" (automaton above 64 phrases —
   * the crossover where the alternation regex stops being the right plan). */
  case class BlocklistStep(name: String, column: String, phrases: Seq[String],
      maxHits: Int = 0, engine: String = "auto") extends PipeStep {
    def kind = "blocklist"
    def rowLocal = true
    require(Seq("auto", "regex", "automaton").contains(engine),
      s"blocklist step '$name': unknown engine '$engine'")
    def useAutomaton: Boolean =
      engine == "automaton" || (engine == "auto" && phrases.size > 64)
    def apply(df: DataFrame): DataFrame = {
      val gated =
        if (useAutomaton) Curation.blocklistGateAc(df, col(column), phrases, maxHits)
        else Curation.blocklistGate(df, col(column), phrases, maxHits)
      gated.where(!col("blocked")).drop("blocked", "n_blocklist_hits")
    }
    /** The gate as a bare keep-predicate (for funnel accounting) —
     * identical hit semantics to apply() without the helper columns. */
    private[pipeline] def keepPredicate: org.apache.spark.sql.Column =
      if (useAutomaton) {
        val normalized = phrases.map(_.trim.toLowerCase(java.util.Locale.ROOT)
          .split("\\s+").filter(_.nonEmpty).mkString(" "))
        val ac = MultiMatch.compile(normalized, wordBoundary = true)
        MultiMatch.acCount(
          regexp_replace(lower(col(column)), lit("\\s+"), lit(" ")), ac) <= maxHits
      } else
        regexp_count(lower(col(column)),
          lit(Curation.blocklistPattern(phrases))) <= maxHits
    private[pipeline] def fields = Seq("column" -> column, "phrases" -> phrases,
      "maxHits" -> maxHits, "engine" -> engine)
  }

  case class DedupExactStep(name: String, id: String, content: Seq[String],
      priority: Option[String] = None) extends PipeStep {
    def kind = "dedup_exact"
    def rowLocal = false
    def apply(df: DataFrame): DataFrame = priority match {
      case Some(p) =>
        Dedup.exactPreferring(df, col(id), expr_(p), content.map(expr_): _*)
      case None => Dedup.exact(df, col(id), content.map(expr_): _*)
    }
    private[pipeline] def fields = Seq("id" -> id, "content" -> content) ++
      priority.map("priority" -> _)
  }

  case class DedupNearStep(name: String, id: String, text: String,
      shingleSize: Int = 3, threshold: Double = 0.7,
      maxBucketSize: Int = 1000) extends PipeStep {
    def kind = "dedup_near"
    def rowLocal = false
    def apply(df: DataFrame): DataFrame =
      Dedup.dropNearDups(df, col(id), col(text), shingleSize, threshold, maxBucketSize)
    private[pipeline] def fields = Seq("id" -> id, "text" -> text,
      "shingleSize" -> shingleSize, "threshold" -> threshold,
      "maxBucketSize" -> maxBucketSize)
  }

  case class CapPerKeyStep(name: String, key: String, id: String, max: Int)
      extends PipeStep {
    def kind = "cap_per_key"
    def rowLocal = false
    def apply(df: DataFrame): DataFrame =
      Curation.capPerKey(df, expr_(key), col(id), max)
    private[pipeline] def fields = Seq("key" -> key, "id" -> id, "max" -> max)
  }

  /** Scrub-list redaction in place: replace every dictionary match in
   * `column` (merged overlapping spans, exact substring semantics —
   * normalize case upstream with a with_column if wanted) via the
   * Aho–Corasick automaton. Row-local: streams. */
  case class RedactStep(name: String, column: String, phrases: Seq[String],
      replacement: String = "█") extends PipeStep {
    def kind = "redact"
    def rowLocal = true
    def apply(df: DataFrame): DataFrame = {
      val ac = MultiMatch.compile(phrases)
      df.withColumn(column, MultiMatch.acRedact(col(column), ac, replacement))
    }
    private[pipeline] def fields = Seq("column" -> column,
      "phrases" -> phrases, "replacement" -> replacement)
  }

  /** Adaptive threshold: keep the top `keepFraction` of rows by `score`
   * (exact interpolated percentile — one stats pass + broadcast). */
  case class QuantileGateStep(name: String, score: String, keepFraction: Double)
      extends PipeStep {
    def kind = "quantile_gate"
    def rowLocal = false
    def apply(df: DataFrame): DataFrame =
      Curation.gateByQuantile(df, expr_(score), keepFraction)
    private[pipeline] def fields =
      Seq("score" -> score, "keepFraction" -> keepFraction)
  }

  case class TemperatureSampleStep(name: String, id: String, domain: String,
      tokens: String, totalBudget: Long, alpha: Double = 0.5) extends PipeStep {
    def kind = "temperature_sample"
    def rowLocal = false
    def apply(df: DataFrame): DataFrame =
      Curation.temperatureSample(df, col(id), expr_(domain), expr_(tokens),
        totalBudget, alpha)
    private[pipeline] def fields = Seq("id" -> id, "domain" -> domain,
      "tokens" -> tokens, "totalBudget" -> totalBudget, "alpha" -> alpha)
  }

  case class SampleBudgetStep(name: String, id: String, domain: String,
      tokens: String, budgets: Map[String, Long]) extends PipeStep {
    def kind = "sample_budget"
    def rowLocal = false
    require(budgets.nonEmpty, s"sample_budget step '$name': empty budgets map")
    def apply(df: DataFrame): DataFrame =
      Curation.sampleToTokenBudget(df, col(id), expr_(domain), expr_(tokens), budgets)
    private[pipeline] def fields = {
      val bm = new java.util.LinkedHashMap[String, Any]() // key-sorted: deterministic yaml
      budgets.toSeq.sortBy(_._1).foreach { case (k, v) => bm.put(k, v) }
      Seq("id" -> id, "domain" -> domain, "tokens" -> tokens, "budgets" -> bm)
    }
  }

  case class Pipeline(version: Int, name: String, steps: Seq[PipeStep]) {
    require(steps.nonEmpty, "pipeline has no steps")
    require(steps.map(_.name).distinct.size == steps.size,
      s"duplicate step names in pipeline '$name'")

    def apply(df: DataFrame): DataFrame = steps.foldLeft(df)((d, s) => s(d))

    /** Apply to a STREAMING frame: row-local steps (filter / blocklist /
     * with_column / drop_columns) are stateless projections and compose
     * onto Structured Streaming unchanged — the same config drives the
     * batch backfill and the live gate. Corpus-level steps are rejected
     * up front with the offending step names (their streaming
     * counterparts — streaming dedup, windowed caps — carry watermark
     * semantics a batch config can't imply). */
    def applyStreaming(df: DataFrame): DataFrame = {
      val corpus = steps.filterNot(_.rowLocal)
      require(corpus.isEmpty,
        s"pipeline '$name' is not streamable; corpus-level steps: " +
          corpus.map(s => s"${s.name} (${s.kind})").mkString(", "))
      apply(df)
    }

    /**
     * Loss accounting for the pipeline's ROW-LOCAL prefix: with_column
     * enrichments apply (they never drop rows), filter/blocklist steps
     * become [[Curation.retentionFunnel]] gates in order, and the walk
     * stops at the first corpus-level step (dedup/cap — those report
     * their own drops). One aggregation pass, same first-fail charging
     * as the sequential run. Caveat: a with_column that SHADOWS a name an
     * earlier gate reads would make gate predicates see the final value;
     * shadowing enrichments are rejected.
     */
    def funnel(df: DataFrame, weight: org.apache.spark.sql.Column = lit(1L)): DataFrame = {
      val (cur, gates) = rowLocalGatePrefix(df)
      Curation.retentionFunnel(cur, gates, weight)
    }

    /** [[funnel]]'s streaming face: the same config-derived gates through
     * [[Curation.retentionFunnelWindowed]] — live per-window loss
     * accounting from the exact reviewed config that drives the gate.
     * Same prefix walk and shadowing rules as [[funnel]]; apply the
     * watermark upstream. */
    def funnelWindowed(df: DataFrame, tsCol: org.apache.spark.sql.Column,
        windowDuration: String,
        weight: org.apache.spark.sql.Column = lit(1L)): DataFrame = {
      val (cur, gates) = rowLocalGatePrefix(df)
      Curation.retentionFunnelWindowed(cur, gates, tsCol, windowDuration, weight)
    }

    /** The shared funnel prefix walk: apply enrichments (rejecting any
     * that rewrite a column a gate already read — accounting would
     * diverge from the sequential run), collect filter/blocklist keep
     * predicates in order, stop at the first corpus-level step. */
    private def rowLocalGatePrefix(df: DataFrame)
        : (DataFrame, Seq[(String, org.apache.spark.sql.Column)]) = {
      var cur = df
      val gates = scala.collection.mutable.ArrayBuffer.empty[(String, org.apache.spark.sql.Column)]
      var done = false
      steps.foreach {
        case _ if done => ()
        case w: WithColumnStep =>
          require(gates.isEmpty || !cur.columns.contains(w.column),
            s"funnel: with_column '${w.name}' shadows existing column " +
              s"'${w.column}' after a gate — accounting would diverge from " +
              "the sequential run")
          cur = w(cur)
        case r: RedactStep =>
          require(gates.isEmpty,
            s"funnel: redact '${r.name}' rewrites '${r.column}' after a gate " +
              "read it — accounting would diverge from the sequential run")
          cur = r(cur)
        case f: FilterStep => gates += f.name -> expr(f.where)
        case b: BlocklistStep => gates += b.name -> b.keepPredicate
        case _: DropColumnsStep => () // row-local, drops no rows
        case _ => done = true // corpus-level step: funnel covers the prefix
      }
      require(gates.nonEmpty, s"pipeline '$name' has no row-local gates to account")
      (cur, gates.toSeq)
    }

    /** Dry-resolve every step against an empty frame of `schema` —
     * analysis errors per step before any data is touched (steps that
     * materialize intermediates run trivial empty-frame jobs). */
    def validate(spark: SparkSession, schema: StructType): Seq[(String, String)] = {
      var df = spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
      val errs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      steps.foreach { s =>
        try df = { val out = s(df); out.schema; out }
        catch { case e: Exception =>
          errs += s.name -> e.getMessage.linesIterator.take(2).mkString(" ") }
      }
      errs.toSeq
    }

    def toYaml: String = {
      val root = new java.util.LinkedHashMap[String, Any]()
      root.put("version", version)
      root.put("name", name)
      val ss = new java.util.ArrayList[Any]()
      steps.foreach { s =>
        val m = new java.util.LinkedHashMap[String, Any]()
        m.put("kind", s.kind)
        m.put("name", s.name)
        s.fields.foreach {
          case (k, v: Seq[_]) =>
            val l = new java.util.ArrayList[Any](); v.foreach(x => l.add(x)); m.put(k, l)
          case (k, v: java.util.Map[_, _]) => m.put(k, v)
          case (k, v) => m.put(k, v)
        }
        ss.add(m)
      }
      root.put("steps", ss)
      val opts = new org.yaml.snakeyaml.DumperOptions()
      opts.setDefaultFlowStyle(org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
      new org.yaml.snakeyaml.Yaml(opts).dump(root)
    }
  }

  def fromYaml(yaml: String): Pipeline = {
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Any]](yaml)
    require(root != null, "empty pipeline yaml")
    val version = int(root, "version", "pipeline")
    require(version == 1, s"unsupported pipeline version $version")
    val name = str(root, "name", "pipeline")
    val rawSteps = root.get("steps") match {
      case l: java.util.List[_] => l
      case _ => fail("pipeline", "steps must be a list")
    }
    val steps = (0 until rawSteps.size).map { i =>
      rawSteps.get(i) match {
        case m: java.util.Map[_, _] => parseStep(m.asInstanceOf[java.util.Map[String, Any]], i)
        case other => fail(s"step $i", s"expected a map, got $other")
      }
    }
    Pipeline(version, name, steps)
  }

  private def parseStep(m: java.util.Map[String, Any], i: Int): PipeStep = {
    val kind = str(m, "kind", s"step $i")
    val where = s"step $i ($kind)"
    val name = str(m, "name", where)
    kind match {
      case "with_column" =>
        WithColumnStep(name, str(m, "column", where), str(m, "expr", where))
      case "filter" => FilterStep(name, str(m, "where", where))
      case "drop_columns" => DropColumnsStep(name, strList(m, "columns", where))
      case "blocklist" => BlocklistStep(name, str(m, "column", where),
        strList(m, "phrases", where), intOr(m, "maxHits", 0, where),
        strOr(m, "engine", "auto"))
      case "dedup_exact" => DedupExactStep(name, str(m, "id", where),
        strList(m, "content", where),
        Option(m.get("priority")).map(_.toString))
      case "dedup_near" => DedupNearStep(name, str(m, "id", where),
        str(m, "text", where), intOr(m, "shingleSize", 3, where),
        doubleOr(m, "threshold", 0.7, where), intOr(m, "maxBucketSize", 1000, where))
      case "cap_per_key" => CapPerKeyStep(name, str(m, "key", where),
        str(m, "id", where), int(m, "max", where))
      case "redact" => RedactStep(name, str(m, "column", where),
        strList(m, "phrases", where), strOr(m, "replacement", "█"))
      case "quantile_gate" => QuantileGateStep(name, str(m, "score", where),
        dbl(m, "keepFraction", where))
      case "temperature_sample" => TemperatureSampleStep(name,
        str(m, "id", where), str(m, "domain", where), str(m, "tokens", where),
        lng(m, "totalBudget", where), doubleOr(m, "alpha", 0.5, where))
      case "sample_budget" => SampleBudgetStep(name, str(m, "id", where),
        str(m, "domain", where), str(m, "tokens", where),
        longMap(m, "budgets", where))
      case other => fail(where, s"unknown step kind '$other'")
    }
  }

  // ---- yaml field helpers (snakeyaml hands back untyped java maps) ----
  private def fail(where: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"pipeline config: $where: $msg")
  private def str(m: java.util.Map[String, Any], k: String, where: String): String =
    m.get(k) match {
      case s: String if s.nonEmpty => s
      case null => fail(where, s"missing required field '$k'")
      case other => fail(where, s"field '$k' must be a non-empty string, got $other")
    }
  private def strOr(m: java.util.Map[String, Any], k: String, dflt: String): String =
    m.get(k) match { case s: String => s; case _ => dflt }
  private def int(m: java.util.Map[String, Any], k: String, where: String): Int =
    m.get(k) match {
      case n: java.lang.Number => n.intValue
      case null => fail(where, s"missing required field '$k'")
      case other => fail(where, s"field '$k' must be an integer, got $other")
    }
  private def intOr(m: java.util.Map[String, Any], k: String, dflt: Int, where: String): Int =
    m.get(k) match {
      case n: java.lang.Number => n.intValue
      case null => dflt
      case other => fail(where, s"field '$k' must be an integer, got $other")
    }
  private def doubleOr(m: java.util.Map[String, Any], k: String, dflt: Double,
      where: String): Double =
    m.get(k) match {
      case n: java.lang.Number => n.doubleValue
      case null => dflt
      case other => fail(where, s"field '$k' must be a number, got $other")
    }
  private def dbl(m: java.util.Map[String, Any], k: String, where: String): Double =
    m.get(k) match {
      case n: java.lang.Number => n.doubleValue
      case null => fail(where, s"missing required field '$k'")
      case other => fail(where, s"field '$k' must be a number, got $other")
    }
  private def lng(m: java.util.Map[String, Any], k: String, where: String): Long =
    m.get(k) match {
      case n: java.lang.Number => n.longValue
      case null => fail(where, s"missing required field '$k'")
      case other => fail(where, s"field '$k' must be an integer, got $other")
    }
  private def longMap(m: java.util.Map[String, Any], k: String,
      where: String): Map[String, Long] =
    m.get(k) match {
      case mm: java.util.Map[_, _] if !mm.isEmpty =>
        val b = Map.newBuilder[String, Long]
        mm.forEach { (kk, vv) => vv match {
          case n: java.lang.Number => b += kk.toString -> n.longValue
          case other => fail(where, s"budget '$kk' must be an integer, got $other")
        }}
        b.result()
      case null => fail(where, s"missing required field '$k'")
      case other => fail(where, s"field '$k' must be a non-empty map, got $other")
    }
  private def strList(m: java.util.Map[String, Any], k: String, where: String): Seq[String] =
    m.get(k) match {
      case l: java.util.List[_] if !l.isEmpty =>
        (0 until l.size).map(i => l.get(i).toString)
      case null => fail(where, s"missing required field '$k'")
      case other => fail(where, s"field '$k' must be a non-empty list, got $other")
    }

  /** Session-parsed SQL expression (registered graft functions included). */
  private def expr_(sql: String): org.apache.spark.sql.Column = expr(sql)
}
