package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Corpus-trained interpolated n-gram language-model scoring — the CCNet-style
 * "perplexity filter" tier of a pre-training pipeline, expressed without any
 * external LM artifact: the model IS the count aggregates over the corpus.
 *
 * Bigram model (order = 2):
 *
 *   P(w | prev) = λ · c(prev,w)/c(prev)  +  (1-λ) · (c(w)+k)/(N + k·V)
 *
 * Trigram model (order = 3, recursive Jelinek–Mercer — each order backs off
 * into the fully interpolated lower order, so every transition has P > 0):
 *
 *   P(w | w1 w2) = λ₃ · c(w1,w2,w)/c(w1,w2)
 *                + (1-λ₃) · [ λ · c(w2,w)/c(w2) + (1-λ) · (c(w)+k)/(N + k·V) ]
 *
 * (CCNet used a 5-gram KenLM; the interpolated trigram is the practical
 * Spark-aggregate step up from the bigram and materially sharpens the
 * perplexity signal — a seen trigram continuation is strong evidence the
 * text is fluent, while gibberish never finds a trigram OR bigram match and
 * falls to the unigram floor.)
 *
 * Scale design (100 TB): training is two (three) groupBy counts over
 * exploded words / word n-grams — map-side partial aggregation, shuffle
 * keyed on the n-gram, no driver state. Scoring explodes each doc into
 * transitions and equi-joins the count tables — model tables are
 * DataFrames, so a small model broadcasts under AQE and a huge one
 * shuffle-joins; the single-row (N, V) stats frame is broadcast like the
 * BM25 stats row. Per-transition probabilities are bit-deterministic doubles
 * (fixed operation order) floored to 1e-12 fixed-point longs before the
 * per-doc SUM, so the aggregate is exact, order-independent, and the DuckDB
 * oracle hash-matches — for the trigram exactly as for the bigram.
 */
object Lm {

  /** The trained model: unigram counts (w, c), bigram counts (w1, w2, c),
   * the single-row stats frame (n_tokens, vocab), optional trigram counts
   * (w1, w2, w3, c) and — for orders 4–5, the CCNet 5-gram shape — the
   * `higher` n-gram tables (index 0 = 4-grams, 1 = 5-grams; columns
   * w1..wN, c). Scoring, bucketing and paragraph filtering dispatch on
   * [[order]], so every downstream operator is parameterized over the
   * model order by construction. */
  case class LmModel(
      unigrams: DataFrame, bigrams: DataFrame, stats: DataFrame,
      trigrams: Option[DataFrame] = None,
      higher: Seq[DataFrame] = Nil) {
    require(higher.isEmpty || trigrams.isDefined,
      "higher-order tables require the trigram table")
    def order: Int = if (trigrams.isEmpty) 2 else 3 + higher.length
    /** The arity-m count table (1-based; columns w1..wm, c). */
    def table(m: Int): DataFrame = m match {
      case 1 => unigrams.select(col("w").as("w1"), col("c"))
      case 2 => bigrams
      case 3 => trigrams.get
      case _ => higher(m - 4)
    }
    /** Releases the model's persisted count tables ([[train]] pins one
     * MEMORY_AND_DISK entry per count table so repeated consumers don't
     * re-run the corpus counting pass). The model OWNS that cache: a
     * job-shaped application lets the session end reclaim it; a
     * long-lived driver training many models must call this when a model
     * retires. Scoring after release stays correct (the plans
     * recompute), just unmemoized. */
    def release(): Unit = {
      unigrams.unpersist(blocking = false)
      bigrams.unpersist(blocking = false)
      trigrams.foreach(_.unpersist(blocking = false))
      higher.foreach(_.unpersist(blocking = false))
    }
  }

  private def words(text: Column): Column =
    Text.words(text, lowercase = true)

  /** Explode a word-array column into adjacent n-gram structs of the given
   * arity (columns w1..wN) — one arrays_zip of shifted slices, no join. */
  private def ngrams(ws: Column, n: Int): Column = {
    val names = (1 to n).map(i => s"w$i")
    explode(arrays_zip(
      names.zipWithIndex.map { case (nm, i) =>
        slice(ws, lit(i + 1), size(ws) - (n - 1)).as(nm)
      }: _*))
  }

  /** Count unigrams + bigrams (+ tri/4/5-grams as `order` asks, the CCNet
   * 5-gram shape at order 5) over the corpus. One shuffle per count table,
   * each keyed on the n-gram — the model stays distributed end to end.
   * The returned model PINS one cache entry per count table (see
   * [[LmModel.release]] for the lifecycle in long-lived drivers). */
  def train(df: DataFrame, textCol: Column, order: Int = 2): LmModel = {
    require(order >= 2 && order <= 5, s"order must be in 2..5, got $order")
    val ws = df.select(words(textCol).as("graft_ws"))
    // the model tables are consumed repeatedly (score joins unigrams on
    // BOTH transition sides, stats derives from them, collocations joins
    // twice more) — persist the vocab-sized aggregates so the corpus-wide
    // counting pass runs once, not once per consumer.
    // (r19 opt note: fusing all orders into ONE null-padded (m, w1..wN)
    // aggregate — one tokenize, one shuffle — was tried and MEASURED no
    // faster to train (3.8 s → 3.4-4.4 s at the gate SF) and ~40% slower
    // to score: every downstream broadcast build then filter-scans the
    // whole combined cache instead of its own small per-order table.
    // Per-order tables keep each consumer's scan proportional to the
    // table it actually needs; reverted.)
    val uni = ws.select(explode(col("graft_ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def countN(n: Int): DataFrame =
      ws.where(size(col("graft_ws")) >= n)
        .select(ngrams(col("graft_ws"), n).as("t"))
        .select((1 to n).map(i => col(s"t.w$i")): _*)
        .groupBy((1 to n).map(i => col(s"w$i")): _*).agg(count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bi = countN(2)
    val stats = uni.agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("vocab"))
    val tri = if (order < 3) None else Some(countN(3))
    val higher = (4 to order).map(countN)
    LmModel(uni, bi, stats, tri, higher)
  }

  /**
   * Collocation extraction: bigrams ranked by pointwise mutual information
   * PMI = ln(c(ab)·N / (c(a)·c(b))), the standard phrase-mining signal.
   * `minCount` suppresses the low-count PMI explosion (hapax bigrams max
   * out PMI by construction). Returns (w1, w2, c, pmi) with pmi rounded to
   * 6 dp — deterministic across engines, and a stable secondary sort key.
   *
   * Scale: one join of the bigram table against the unigram table on each
   * side (both keyed shuffles or broadcasts under AQE) plus the broadcast
   * stats row — never touches the corpus again.
   */
  def collocations(model: LmModel, minCount: Long = 5L): DataFrame = {
    model.bigrams.where(col("c") >= minCount)
      .withColumnRenamed("c", "graft_cab")
      .join(model.unigrams.select(col("w").as("w1"), col("c").as("graft_ca")), Seq("w1"))
      .join(model.unigrams.select(col("w").as("w2"), col("c").as("graft_cb")), Seq("w2"))
      .crossJoin(broadcast(model.stats))
      .select(col("w1"), col("w2"), col("graft_cab").as("c"),
        round(log(col("graft_cab").cast("double") * col("n_tokens").cast("double") /
          (col("graft_ca").cast("double") * col("graft_cb").cast("double"))), 6).as("pmi"))
  }

  /**
   * Score every doc: (id, n_trans, sum_prob_e12, n_oov) where sum_prob_e12
   * is the exact long sum of floor(P · 10¹²) over the n_trans transition
   * probabilities (fixed-point micro-units: per-transition doubles are
   * bit-identical across engines, and floor of an identical double is
   * engine-independent, unlike double→decimal casts which round through
   * the shortest string representation on the JVM) and n_oov counts
   * transitions whose target word is outside the model vocabulary. Docs
   * with fewer than `order` words score (0, 0, 0). With `includeLogScores`,
   * adds avg_logp (mean natural-log probability) and ppl (exp(-avg_logp))
   * — double aggregates whose value is order-of-summation dependent in
   * the last ulps, so they're spec-tested rather than oracle-hashed.
   *
   * For an order-n model (n up to 5) the transition unit is the n-gram
   * (n-(n-1) per doc; the target word is wN, so n_oov counts unseen TARGETS
   * exactly as the bigram path does) and the probability is the recursive
   * Jelinek–Mercer interpolation — each order m contributes
   * λ_m · c(suffix m-gram)/c(its prefix) and backs off into the fully
   * interpolated order below, down to the smoothed unigram floor. Weights:
   * λ₂ = `lambda`, λ₃ = `lambda3`, λ₄ = λ₅ = `lambdaN`. Same fixed
   * operation order at every order, same 1e-12 fixed-point contract,
   * oracle-hashable.
   */
  def score(
      model: LmModel, df: DataFrame, idCol: Column, textCol: Column,
      lambda: Double = 0.5, k: Double = 1.0,
      includeLogScores: Boolean = false, lambda3: Double = 0.5,
      lambdaN: Double = 0.5): DataFrame = {
    val base = df.select(idCol.as("id"), words(textCol).as("graft_ws"))
    // fixed operation order, mirrored token-for-token by the DuckDB oracle:
    // identical IEEE ops on identical inputs → bit-identical doubles
    def pUni(target: Column) = (coalesce(target.cast("double"), lit(0.0)) + lit(k)) /
      (col("n_tokens").cast("double") + lit(k) * col("vocab").cast("double"))
    def lambdaOf(m: Int): Double = m match {
      case 2 => lambda; case 3 => lambda3; case _ => lambdaN
    }
    // (graft_p, graft_cw) per transition; graft_cw null ⇔ OOV target.
    // General n: join, for each order m = n..2, the count of the LAST m
    // words (numerator) and of its (m-1)-word prefix (denominator) — the
    // 2(n-1) model-table joins of a backoff LM — plus the target unigram
    // and the broadcast stats row. The probability folds inside-out from
    // the unigram floor, so orders 2 and 3 produce the exact expression
    // (and bits) the dedicated paths always produced.
    // (r19 opt note: pre-joining each table(m) with its table(m−1) prefix
    // count — halving the transition-side joins — was tried and MEASURED
    // SLOWER at the gate SF: the persisted count tables broadcast-probe
    // the transitions in fused codegen for near-zero marginal cost, while
    // the model-side enrichment join re-shuffles two n-gram type tables
    // per order; q_lm5_score 4.95 s → 7.05 s, reverted.)
    val n = model.order
    val scoredTrans = {
      val trans = base.where(size(col("graft_ws")) >= n)
        .select(col("id"), ngrams(col("graft_ws"), n).as("t"))
        .select(col("id") +: (1 to n).map(i => col(s"t.w$i")): _*)
      var joined = trans
      for (m <- n to 2 by -1) {
        val p = n - m + 1 // start position of the m-gram suffix
        val num = model.table(m).select(
          (1 to m).map(i => col(s"w$i").as(s"w${p + i - 1}")) :+
            col("c").as(s"graft_cn_$m"): _*)
        joined = joined.join(num, (p until p + m).map(i => s"w$i").toSeq, "left")
        val den = model.table(m - 1).select(
          (1 until m).map(i => col(s"w$i").as(s"w${p + i - 1}")) :+
            col("c").as(s"graft_cd_$m"): _*)
        joined = joined.join(den, (p until p + m - 1).map(i => s"w$i").toSeq, "left")
      }
      joined = joined
        .join(model.unigrams.select(col("w").as(s"w$n"), col("c").as("graft_cw")),
          Seq(s"w$n"), "left")
        .crossJoin(broadcast(model.stats))
      val pFull = (2 to n).foldLeft(pUni(col("graft_cw"))) { (lower, m) =>
        val pm = coalesce(
          col(s"graft_cn_$m").cast("double") / col(s"graft_cd_$m").cast("double"), lit(0.0))
        lit(lambdaOf(m)) * pm + lit(1.0 - lambdaOf(m)) * lower
      }
      joined.select(col("id"), pFull.as("graft_p"), col("graft_cw"))
    }
    val aggs = Seq(
      count(lit(1)).as("n_trans"),
      sum(floor(col("graft_p") * lit(1e12))).as("sum_prob_e12"),
      count(when(col("graft_cw").isNull, 1)).as("n_oov")) ++
      (if (includeLogScores) Seq(avg(log(col("graft_p"))).as("avg_logp")) else Nil)
    val scored = scoredTrans.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    val out = base.select(col("id")).join(scored, Seq("id"), "left")
      .select(Seq(col("id"),
        coalesce(col("n_trans"), lit(0L)).as("n_trans"),
        coalesce(col("sum_prob_e12"), lit(0L)).as("sum_prob_e12"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov")) ++
        (if (includeLogScores) Seq(col("avg_logp")) else Nil): _*)
    if (includeLogScores) out.withColumn("ppl", exp(-col("avg_logp"))) else out
  }

  /**
   * Interpolated Kneser–Ney scoring — the smoothing CCNet's actual KenLM
   * filter uses (absolute discounting + CONTINUATION counts), as an
   * alternative to the Jelinek–Mercer [[score]]:
   *
   *   P(w | h)  = max(c(h,w) − D, 0)/c(h) + D·N₁₊(h·)/c(h) · P_cont(w | h′)
   *   P_cont(w | h′) = max(N₁₊(·h′w) − D, 0)/N₁₊(·h′·)
   *                  + D·N₁₊(h′·)/N₁₊(·h′·) · P_cont(w | h″)   (middle orders)
   *   P_cont(w) = (N₁₊(·w) + k)/(B + k·V)                      (unigram floor)
   *
   * where N₁₊(·h′w) counts DISTINCT left extensions (how many contexts a
   * word continues, not how often — the "san Francisco" correction: a
   * frequent word glued to one context gets a LOW continuation count, so
   * unseen-context transitions to it stop inheriting its raw frequency),
   * B = distinct bigram types, and the unigram floor is add-k smoothed so
   * OOV targets keep P > 0 (k as in [[score]]). A context with no observed
   * continuation (possible when it only ever ends documents) backs off
   * entirely to the lower order instead of zeroing the product. JM
   * separates fluent from gibberish; KN additionally ranks correctly NEAR
   * the decision boundary, where JM's raw-frequency backoff overpays
   * context-bound words.
   *
   * Same contracts as [[score]]: fixed IEEE operation order mirrored by
   * the oracle, floor(P·10¹²) fixed-point sums, (id, n_trans,
   * sum_prob_e12, n_oov) output, docs shorter than the order score zeros.
   * The continuation tables are small keyed aggregates OVER THE MODEL
   * COUNT TABLES (types, not tokens) — nothing rescans the corpus; the
   * transition join adds the same 2(n−1)+1 model joins as [[score]].
   * `discount` is the absolute discount D ∈ [0, 1) applied at every order
   * (0.75 is the classic default; [[knDiscount]] estimates the
   * Ney–Essen–Kneser value from the count-of-counts if wanted).
   */
  def scoreKn(
      model: LmModel, df: DataFrame, idCol: Column, textCol: Column,
      discount: Double = 0.75, k: Double = 1.0): DataFrame = {
    require(discount >= 0.0 && discount < 1.0,
      s"discount must be in [0,1), got $discount")
    val n = model.order
    val d = discount
    val base = df.select(idCol.as("id"), words(textCol).as("graft_ws"))
    val trans = base.where(size(col("graft_ws")) >= n)
      .select(col("id"), ngrams(col("graft_ws"), n).as("t"))
      .select(col("id") +: (1 to n).map(i => col(s"t.w$i")): _*)
    var joined = trans
    // top level: raw counts, plus ONE context join carrying both the
    // context count and its distinct-continuation weight (same key
    // w1..w_{n-1}; a context with extensions always exists in table(n-1),
    // so the model-side left join loses nothing — knf stays null exactly
    // when the context never extends, as before)
    joined = joined.join(
      model.table(n).select((1 to n).map(i => col(s"w$i")) :+
        col("c").as("graft_kn_top"): _*),
      (1 to n).map(i => s"w$i").toSeq, "left")
    val ctxTop = model.table(n - 1)
      .select((1 until n).map(i => col(s"w$i")) :+
        col("c").as("graft_kd_top"): _*)
      .join(
        model.table(n).groupBy((1 until n).map(i => col(s"w$i")): _*)
          .agg(count(lit(1)).as("graft_knf_top")),
        (1 until n).map(i => s"w$i").toSeq, "left")
    joined = joined.join(ctxTop, (1 until n).map(i => s"w$i").toSeq, "left")
    // middle orders m = 2..n-1: continuation counts from table(m+1);
    // suffix m-gram sits at transition positions p..n, p = n-m+1
    for (m <- 2 until n) {
      val p = n - m + 1
      val cc = model.table(m + 1)
        .groupBy((2 to m + 1).map(j => col(s"w$j")): _*)
        .agg(count(lit(1)).as(s"graft_kc_$m"))
        .select((2 to m + 1).map(j => col(s"w$j").as(s"w${p + j - 2}")) :+
          col(s"graft_kc_$m"): _*)
      joined = joined.join(cc, (p to n).map(i => s"w$i").toSeq, "left")
      val ctx = model.table(m + 1)
        .groupBy((2 to m).map(j => col(s"w$j")): _*)
        .agg(count(lit(1)).as(s"graft_kcd_$m"),
          countDistinct(col(s"w${m + 1}")).as(s"graft_knf_$m"))
        .select((2 to m).map(j => col(s"w$j").as(s"w${p + j - 2}")) :+
          col(s"graft_kcd_$m") :+ col(s"graft_knf_$m"): _*)
      joined = joined.join(ctx, (p until n).map(i => s"w$i").toSeq, "left")
    }
    // unigram continuation floor + OOV flag + type stats: ONE join on the
    // target word (unigrams left-joined to the continuation counts on the
    // model side — a word that continues a bigram is always in the vocab,
    // so kc1 null ⇔ the word never follows anything OR is OOV; in the OOV
    // case the old independent join read kc1 null too: a bigram's w2 is
    // by construction a corpus word)
    val uniFloor = model.unigrams
      .select(col("w").as(s"w$n"), col("c").as("graft_cw"))
      .join(model.bigrams.groupBy(col("w2").as(s"w$n"))
        .agg(count(lit(1)).as("graft_kc1")), Seq(s"w$n"), "left")
    joined = joined
      .join(uniFloor, Seq(s"w$n"), "left")
      .crossJoin(broadcast(
        model.bigrams.agg(count(lit(1)).as("graft_B"))))
      .crossJoin(broadcast(model.stats.select(col("vocab"))))
    val p1 = (coalesce(col("graft_kc1").cast("double"), lit(0.0)) + lit(k)) /
      (col("graft_B").cast("double") + lit(k) * col("vocab").cast("double"))
    val pMid = (2 until n).foldLeft(p1) { (lower, m) =>
      when(col(s"graft_kcd_$m").isNull, lower).otherwise(
        greatest(coalesce(col(s"graft_kc_$m").cast("double"), lit(0.0)) - lit(d),
          lit(0.0)) / col(s"graft_kcd_$m").cast("double") +
          lit(d) * col(s"graft_knf_$m").cast("double") /
            col(s"graft_kcd_$m").cast("double") * lower)
    }
    val pFull = when(col("graft_kd_top").isNull || col("graft_knf_top").isNull, pMid)
      .otherwise(
        greatest(coalesce(col("graft_kn_top").cast("double"), lit(0.0)) - lit(d),
          lit(0.0)) / col("graft_kd_top").cast("double") +
          lit(d) * col("graft_knf_top").cast("double") /
            col("graft_kd_top").cast("double") * pMid)
    val scored = joined.select(col("id"), pFull.as("graft_p"), col("graft_cw"))
      .groupBy(col("id")).agg(
        count(lit(1)).as("n_trans"),
        sum(floor(col("graft_p") * lit(1e12))).as("sum_prob_e12"),
        count(when(col("graft_cw").isNull, 1)).as("n_oov"))
    base.select(col("id")).join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_trans"), lit(0L)).as("n_trans"),
        coalesce(col("sum_prob_e12"), lit(0L)).as("sum_prob_e12"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
  }

  /**
   * MODIFIED Kneser–Ney scoring — the KenLM default (Chen & Goodman's
   * refinement of [[scoreKn]]): instead of one absolute discount D per
   * order, three count-dependent discounts
   *
   *   D(c) = 0 if c = 0;  D₁ if c = 1;  D₂ if c = 2;  D₃₊ if c ≥ 3
   *
   * estimated per order from that order's count-of-counts
   * ([[mknDiscounts]]): Y = n₁/(n₁+2n₂), D₁ = 1 − 2Y·n₂/n₁,
   * D₂ = 2 − 3Y·n₃/n₂, D₃₊ = 3 − 4Y·n₄/n₃ (clamped at 0; any empty
   * count-of-count bucket falls back to the flat 0.75 triple). The
   * backoff mass becomes γ(h) = (D₁N₁(h·) + D₂N₂(h·) + D₃₊N₃₊(h·))/c(h)
   * where N_k(h·) counts extensions of h seen exactly k times (top
   * order: raw counts; middle orders: continuation counts — the same
   * adjusted-count tables [[scoreKn]] builds, with per-context
   * count-bucket tallies replacing the single N₁₊ distinct count).
   * Singleton-heavy orders get discounted harder than well-attested
   * ones — the refinement that wins near the CCNet decision boundary.
   *
   * Same contracts as [[scoreKn]]: fixed IEEE operation order mirrored
   * by the oracle, floor(P·10¹²) fixed-point sums, (id, n_trans,
   * sum_prob_e12, n_oov) output. The discount scalars are four bounded
   * one-row aggregates over the model type tables (collected once,
   * embedded as literals); everything else is the same 2(n−1)+1 keyed
   * model joins — nothing rescans the corpus, nothing is driver-sized.
   */
  def scoreMkn(
      model: LmModel, df: DataFrame, idCol: Column, textCol: Column,
      k: Double = 1.0): DataFrame = {
    val n = model.order
    val ds: Map[Int, (Double, Double, Double)] =
      (2 to n).map(m => m -> mknDiscounts(model, m)).toMap
    def disc(c: Column, d: (Double, Double, Double)): Column =
      when(c >= 3L, lit(d._3)).when(c === 2L, lit(d._2))
        .when(c === 1L, lit(d._1)).otherwise(lit(0.0))
    val base = df.select(idCol.as("id"), words(textCol).as("graft_ws"))
    val trans = base.where(size(col("graft_ws")) >= n)
      .select(col("id"), ngrams(col("graft_ws"), n).as("t"))
      .select(col("id") +: (1 to n).map(i => col(s"t.w$i")): _*)
    var joined = trans
    // top level: raw counts, plus ONE context join carrying the context
    // count AND its per-count-bucket tallies (same key w1..w_{n-1}; the
    // model-side left join is lossless — see scoreKn's ctxTop argument)
    joined = joined.join(
      model.table(n).select((1 to n).map(i => col(s"w$i")) :+
        col("c").as("graft_kn_top"): _*),
      (1 to n).map(i => s"w$i").toSeq, "left")
    val ctxTop = model.table(n - 1)
      .select((1 until n).map(i => col(s"w$i")) :+
        col("c").as("graft_kd_top"): _*)
      .join(
        model.table(n).groupBy((1 until n).map(i => col(s"w$i")): _*)
          .agg(count(when(col("c") === 1L, 1)).as("graft_m1_top"),
            count(when(col("c") === 2L, 1)).as("graft_m2_top"),
            count(when(col("c") >= 3L, 1)).as("graft_m3_top")),
        (1 until n).map(i => s"w$i").toSeq, "left")
    joined = joined.join(ctxTop, (1 until n).map(i => s"w$i").toSeq, "left")
    // middle orders m = 2..n-1: continuation counts from table(m+1) with
    // per-context count-bucket tallies; suffix m-gram at positions p..n
    for (m <- 2 until n) {
      val p = n - m + 1
      val cc0 = model.table(m + 1)
        .groupBy((2 to m + 1).map(j => col(s"w$j")): _*)
        .agg(count(lit(1)).as("graft_a"))
      val cc = cc0.select((2 to m + 1).map(j => col(s"w$j").as(s"w${p + j - 2}")) :+
        col("graft_a").as(s"graft_kc_$m"): _*)
      joined = joined.join(cc, (p to n).map(i => s"w$i").toSeq, "left")
      val ctx = cc0.groupBy((2 to m).map(j => col(s"w$j")): _*)
        .agg(sum(col("graft_a")).as(s"graft_kcd_$m"),
          count(when(col("graft_a") === 1L, 1)).as(s"graft_m1_$m"),
          count(when(col("graft_a") === 2L, 1)).as(s"graft_m2_$m"),
          count(when(col("graft_a") >= 3L, 1)).as(s"graft_m3_$m"))
        .select((2 to m).map(j => col(s"w$j").as(s"w${p + j - 2}")) :+
          col(s"graft_kcd_$m") :+ col(s"graft_m1_$m") :+
          col(s"graft_m2_$m") :+ col(s"graft_m3_$m"): _*)
      joined = joined.join(ctx, (p until n).map(i => s"w$i").toSeq, "left")
    }
    // unigram continuation floor + OOV flag — identical to scoreKn (one
    // merged join on the target word; see scoreKn's uniFloor argument)
    val uniFloor = model.unigrams
      .select(col("w").as(s"w$n"), col("c").as("graft_cw"))
      .join(model.bigrams.groupBy(col("w2").as(s"w$n"))
        .agg(count(lit(1)).as("graft_kc1")), Seq(s"w$n"), "left")
    joined = joined
      .join(uniFloor, Seq(s"w$n"), "left")
      .crossJoin(broadcast(
        model.bigrams.agg(count(lit(1)).as("graft_B"))))
      .crossJoin(broadcast(model.stats.select(col("vocab"))))
    val p1 = (coalesce(col("graft_kc1").cast("double"), lit(0.0)) + lit(k)) /
      (col("graft_B").cast("double") + lit(k) * col("vocab").cast("double"))
    val pMid = (2 until n).foldLeft(p1) { (lower, m) =>
      val d = ds(m)
      val a = coalesce(col(s"graft_kc_$m"), lit(0L))
      val den = col(s"graft_kcd_$m").cast("double")
      when(col(s"graft_kcd_$m").isNull, lower).otherwise(
        greatest(a.cast("double") - disc(a, d), lit(0.0)) / den +
          (lit(d._1) * col(s"graft_m1_$m").cast("double") +
            lit(d._2) * col(s"graft_m2_$m").cast("double") +
            lit(d._3) * col(s"graft_m3_$m").cast("double")) / den * lower)
    }
    val dTop = ds(n)
    val cTop = coalesce(col("graft_kn_top"), lit(0L))
    val pFull = when(col("graft_kd_top").isNull || col("graft_m1_top").isNull, pMid)
      .otherwise(
        greatest(cTop.cast("double") - disc(cTop, dTop), lit(0.0)) /
          col("graft_kd_top").cast("double") +
          (lit(dTop._1) * col("graft_m1_top").cast("double") +
            lit(dTop._2) * col("graft_m2_top").cast("double") +
            lit(dTop._3) * col("graft_m3_top").cast("double")) /
            col("graft_kd_top").cast("double") * pMid)
    val scored = joined.select(col("id"), pFull.as("graft_p"), col("graft_cw"))
      .groupBy(col("id")).agg(
        count(lit(1)).as("n_trans"),
        sum(floor(col("graft_p") * lit(1e12))).as("sum_prob_e12"),
        count(when(col("graft_cw").isNull, 1)).as("n_oov"))
    base.select(col("id")).join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_trans"), lit(0L)).as("n_trans"),
        coalesce(col("sum_prob_e12"), lit(0L)).as("sum_prob_e12"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
  }

  /** Modified-KN count-dependent discounts (D₁, D₂, D₃₊) for order `m`:
   * Y = n₁/(n₁+2n₂), D₁ = 1 − 2Y·(n₂/n₁), D₂ = 2 − 3Y·(n₃/n₂),
   * D₃₊ = 3 − 4Y·(n₄/n₃), each clamped at 0, from the count-of-counts of
   * the order-m count table (top order: raw counts; below: continuation
   * counts, the same adjusted-count tables the scorer joins). Any empty
   * n₁..n₄ bucket → the flat (0.75, 0.75, 0.75) fallback (KenLM aborts
   * there; a scoring filter prefers a defined answer). One one-row
   * aggregate; the single bounded collect is a scalar triple. */
  def mknDiscounts(model: LmModel, m: Int): (Double, Double, Double) = {
    val cnts =
      if (m == model.order) model.table(m).select(col("c"))
      else model.table(m + 1)
        .groupBy((2 to m + 1).map(j => col(s"w$j")): _*)
        .agg(count(lit(1)).as("c")).select(col("c"))
    val r = cnts.agg(
      count(when(col("c") === 1L, 1)).as("n1"),
      count(when(col("c") === 2L, 1)).as("n2"),
      count(when(col("c") === 3L, 1)).as("n3"),
      count(when(col("c") === 4L, 1)).as("n4")).head()
    val (n1, n2, n3, n4) = (r.getLong(0).toDouble, r.getLong(1).toDouble,
      r.getLong(2).toDouble, r.getLong(3).toDouble)
    if (n1 == 0.0 || n2 == 0.0 || n3 == 0.0 || n4 == 0.0) (0.75, 0.75, 0.75)
    else {
      val y = n1 / (n1 + 2.0 * n2)
      (math.max(0.0, 1.0 - 2.0 * y * (n2 / n1)),
        math.max(0.0, 2.0 - 3.0 * y * (n3 / n2)),
        math.max(0.0, 3.0 - 4.0 * y * (n4 / n3)))
    }
  }

  /** Ney–Essen–Kneser discount estimate D = n₁/(n₁ + 2n₂) from the
   * count-of-counts of the arity-`m` model table — the value modified-KN
   * derives its discounts from. One two-row aggregate over a type table;
   * the single bounded collect is a scalar. */
  def knDiscount(model: LmModel, m: Int): Double = {
    val r = model.table(m).agg(
      count(when(col("c") === 1L, 1)).as("n1"),
      count(when(col("c") === 2L, 1)).as("n2")).head()
    val (n1, n2) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    if (n1 == 0.0) 0.75 else n1 / (n1 + 2.0 * n2)
  }

  /**
   * CCNet head/middle/tail bucketing: documents split into `nBuckets`
   * groups by LM score quantiles (bucket nBuckets-1 = highest mean
   * transition probability = "head"; bucket 0 = "tail" — CCNet trains on
   * head+middle and drops the tail). Thresholds are exact interpolated
   * percentiles of the mean transition probability (an integer ratio, so
   * the doubles are engine-identical and the oracle hash-matches); docs
   * with no transitions land in bucket 0. One scoring pass + one
   * single-row percentile aggregate broadcast back. Returns (id, bucket).
   */
  def perplexityBuckets(
      model: LmModel, df: DataFrame, idCol: Column, textCol: Column,
      nBuckets: Int = 3, lambda: Double = 0.5, k: Double = 1.0,
      lambda3: Double = 0.5, lambdaN: Double = 0.5): DataFrame = {
    require(nBuckets >= 2, "nBuckets must be at least 2")
    val scored = score(model, df, idCol, textCol, lambda, k,
      lambda3 = lambda3, lambdaN = lambdaN)
    val mean = when(col("n_trans") === 0L, lit(0.0))
      .otherwise(col("sum_prob_e12").cast("double") / col("n_trans").cast("double"))
    // materialized: the percentile aggregate AND the final projection both
    // consume it — without the staging the full LM scoring pipeline
    // (transition explode + three model joins) runs twice per call.
    // localCheckpoint (not persist): the (id, mean) frame is slim, the
    // checkpoint blocks die with the returned frame's reference instead of
    // pinning a session cache entry per call (r15 residue sweep), and the
    // truncated-lineage contract (executor loss → job retry) is acceptable
    // for a re-runnable bucketing pass.
    val base = scored.select(col("id"), mean.as("graft_mean"))
      .localCheckpoint()
    val pcts = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val thr = base.agg(
      expr(s"percentile(graft_mean, array(${pcts.mkString(",")}))").as("graft_thr"))
    base.crossJoin(broadcast(thr))
      .select(col("id"),
        pcts.indices
          .map(i => when(col("graft_mean") >= element_at(col("graft_thr"), i + 1), 1)
            .otherwise(0))
          .reduce(_ + _).as("bucket"))
  }

  /**
   * CCNet-style paragraph-level LM filter: split each document into
   * paragraphs, score every paragraph with the corpus-trained model, DROP
   * paragraphs whose mean transition probability falls below
   * `minMeanProbE12` (1e-12 fixed-point units — gibberish, OOV floods,
   * wrong-language fragments), and rebuild the survivors in order. CCNet
   * filters on perplexity; mean transition probability is its monotone
   * inverse proxy, and in fixed point the keep rule is the exact integer
   * comparison `sum_prob_e12 >= minMeanProbE12 · n_trans` — engine-portable,
   * so the DuckDB oracle hash-matches. Paragraphs with fewer than two words
   * (n_trans = 0) are kept: too short to judge.
   *
   * Scale: the paragraph explode shuffles (id, pos) keyed rows through the
   * [[score]] joins (model tables broadcast under AQE when small) and one
   * rebuild aggregation keyed on the doc id — content shuffles once, as any
   * order-preserving rebuild requires.
   */
  def filterParagraphs(
      model: LmModel, df: DataFrame, idCol: Column, textCol: Column,
      minMeanProbE12: Long, lambda: Double = 0.5, k: Double = 1.0,
      splitRe: String = "\n\n+", joinSep: String = "\n\n",
      lambda3: Double = 0.5, lambdaN: Double = 0.5): DataFrame = {
    val units = df.select(idCol.as("id"),
      posexplode(split(textCol, splitRe)).as(Seq("graft_pos", "graft_unit")))
    val scored = score(model, units,
      struct(col("id"), col("graft_pos")).as("graft_uid"), col("graft_unit"),
      lambda, k, lambda3 = lambda3, lambdaN = lambdaN)
    val keep = scored.where(col("n_trans") === 0L ||
        col("sum_prob_e12") >= lit(minMeanProbE12) * col("n_trans"))
      .select(col("id.id").as("id"), col("id.graft_pos").as("graft_pos"))
    val rebuilt = units.join(keep, Seq("id", "graft_pos"), "leftsemi")
      .groupBy(col("id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("graft_pos"), col("graft_unit")))),
          s => s("graft_unit")),
        joinSep).as("graft_clean"))
    df.select(idCol.as("id")).join(rebuilt, Seq("id"), "left")
      .select(col("id"), coalesce(col("graft_clean"), lit("")).as("text"))
  }
}
