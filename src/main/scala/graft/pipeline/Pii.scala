package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * PII detection and redaction for training-data curation: emails, IPv4
 * addresses, SSN-shaped ids and phone numbers, the categories every
 * pre-training scrub pass covers first.
 *
 * The patterns live in the Java-regex ∩ RE2 common subset (no lookaround,
 * no backreferences) so Spark and the DuckDB oracle match byte-for-byte;
 * they favour determinism and engine parity over exhaustive recall — a
 * production scrub would layer NER on top, but the regex tier is what runs
 * over all 100 TB.
 *
 * Scale: both [[piiSignals]] and [[redactPii]] are narrow projections of
 * codegen'd regexp expressions — no shuffle, no UDF, safe at any scale.
 */
object Pii {

  /** user@host.tld with at least one dot in the host part. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(?:\\.[A-Za-z0-9-]+)+"

  /** Dotted quad (unvalidated octet range — deterministic over precise). */
  val ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** 3-2-4 digit SSN shape. */
  val ssnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** NANP-ish phone: optional +CC with separator, then 3-3-4 digits with
   * optional separators. The 3-3-4 grouping cannot match the 3-2-4 SSN
   * shape or dotted quads, so the categories count disjointly. */
  val phoneRe =
    "(?:\\+?[0-9]{1,3}[-. ])?\\(?[0-9]{3}\\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}\\b"

  /** Per-category match counts over the raw text plus a combined flag.
   * Counts are independent (each pattern scans the original text). */
  def piiSignals(text: Column): Column = {
    val emails = regexp_count(text, lit(emailRe))
    val ipv4s = regexp_count(text, lit(ipv4Re))
    val ssns = regexp_count(text, lit(ssnRe))
    val phones = regexp_count(text, lit(phoneRe))
    struct(
      emails.as("emails"),
      ipv4s.as("ipv4s"),
      ssns.as("ssns"),
      phones.as("phones"),
      (emails + ipv4s + ssns + phones > 0).as("has_pii"))
  }

  /** Replace every match with a category token. Order matters and is part
   * of the contract: emails first (an address can embed digit runs), then
   * SSNs (3-2-4 must win over the looser phone shape), then IPv4, then
   * phones. The tokens contain no digits, so later passes never re-match
   * earlier redactions. */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, lit(emailRe), lit("<EMAIL>"))
    val s = regexp_replace(e, lit(ssnRe), lit("<SSN>"))
    val i = regexp_replace(s, lit(ipv4Re), lit("<IP>"))
    regexp_replace(i, lit(phoneRe), lit("<PHONE>"))
  }

  /** True iff [[redactPii]] would change `text` — the DETECTION face of
   * the same contract, as four short-circuiting match tests instead of
   * four full regexp_replace passes. `redactPii(t) === t` materializes
   * four progressively-redacted copies of every document and compares
   * the final copy byte-for-byte just to learn "did anything match";
   * this form allocates nothing and stops at the first hit (r20 opt —
   * at 100 TB the drop-policy pii gate runs over every surviving doc).
   *
   * Equivalence with `redactPii(t) =!= t` is exact, not heuristic:
   * (a) a replacement can never leave the text unchanged — every marker
   * (`<EMAIL>`…) lacks a character class its matched span must contain
   * (@ / digits); (b) a later pattern matches the PARTIALLY-REDACTED
   * text iff it matches the original OR an earlier pattern already fired
   * (markers carry no digits, so earlier redactions never CREATE a later
   * match, and a destroyed later match means the earlier pattern matched
   * — inequality already established either way). Spec-pinned on the
   * overlap cases (digit-run emails, SSN-inside-email, phone-vs-SSN).
   */
  def hasPii(text: Column): Column =
    text.rlike(emailRe) || text.rlike(ssnRe) ||
      text.rlike(ipv4Re) || text.rlike(phoneRe)

  /** Card-shaped digit runs (13–19 digits, single space/dash separators). */
  val cardRe = "\\b(?:\\d[ -]?){12,18}\\d\\b"

  /** Luhn-VERIFIED payment-card count — the check-digit pass separates real
   * card numbers from phone-length digit runs (a random 16-digit string
   * passes Luhn 10% of the time; an invoice/order number fails it), kept
   * SEPARATE from [[piiSignals]] so that struct's schema stays stable for
   * existing consumers. Pure built-ins: the candidate regexp scan is
   * codegen'd; the digit fold is a higher-order function (interpreted, as
   * every Spark HOF is) over the usually-EMPTY candidate array, so the
   * scan dominates at corpus scale. DuckDB-replicable
   * list-comprehension-for-list-comprehension. */
  def creditCardCount(text: Column): Column = {
    val cands = regexp_extract_all(text, lit(cardRe), lit(0))
    size(filter(cands, c => {
      val ds = reverse(transform(
        filter(split(c, ""), ch => ch.rlike("[0-9]")), ch => ch.cast("int")))
      val total = aggregate(
        transform(ds, (d, i) => when(i % 2 === 1,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)),
        lit(0), (acc, x) => acc + x)
      size(ds).between(13, 19) && total % 10 === 0
    }))
  }

  /** IBAN-shaped runs: two uppercase country letters, two check digits,
   * 11–30 alphanumerics (structural 15–34 length; country-specific length
   * registries are out of scope — the mod-97 checksum is the signal). */
  val ibanRe = "\\b[A-Z]{2}\\d{2}[A-Z0-9]{11,30}\\b"

  /** mod-97-VERIFIED IBAN count (ISO 13616: rotate the first four chars to
   * the end, A..Z → 10..35, the resulting number ≡ 1 mod 97) — computed
   * as an incremental fold so no big-integer ever materializes; same
   * verified-count / shape-redaction asymmetry as the card pair. */
  def ibanCount(text: Column): Column = {
    val cands = regexp_extract_all(text, lit(ibanRe), lit(0))
    size(filter(cands, c => {
      val rearr = concat(substring(c, 5, 1000000), substring(c, 1, 4))
      val chars = filter(split(rearr, ""), ch => ch =!= lit(""))
      aggregate(chars, lit(0L), (a, ch) => {
        val code = ascii(ch)
        when(code.between(48, 57), (a * 10 + (code - 48)) % 97)
          .otherwise((a * 100 + (code - 55)) % 97)
      }) === 1L
    }))
  }

  /** Shape-based IBAN redaction (see [[redactCreditCards]] for why
   * redaction does not checksum-gate). */
  def redactIbans(text: Column): Column =
    regexp_replace(text, lit(ibanRe), lit("<IBAN>"))

  /** Replace every CARD-SHAPED run with a token. Deliberately shape-based
   * (no Luhn gate): for redaction a false positive (a masked order
   * number) is the safe direction, while for COUNTING ([[creditCardCount]])
   * verification is — the two defaults differ on purpose. */
  def redactCreditCards(text: Column): Column =
    regexp_replace(text, lit(cardRe), lit("<CARD>"))

  /**
   * Deterministic keyed pseudonymization: sha256(key ":" value) as lowercase
   * hex — the privacy-preserving JOIN KEY for identifier columns (user ids,
   * emails, hosts): the same value pseudonymizes identically across frames
   * and batches (joins, dedup and per-key caps keep working on the
   * pseudonyms), while different keys yield unlinkable namespaces per
   * tenant/release. This is a keyed HASH, not an HMAC — fine for
   * pseudonymization (an attacker without the key cannot reverse values
   * beyond dictionary attacks on low-entropy inputs; rotate the key per
   * release to break cross-release linkage), NOT a MAC for
   * integrity/authentication. Null passes through (absent stays absent).
   * One codegen'd digest per row, narrow at any scale; SQL-replicable
   * exactly (both engines emit lowercase-hex sha256). */
  def pseudonymize(value: Column, key: String): Column = {
    require(key.nonEmpty, "pseudonymize needs a non-empty key")
    when(value.isNull, lit(null).cast("string"))
      .otherwise(sha2(concat(lit(key), lit(":"), value.cast("string")), 256))
  }

  /** Fraction of whitespace tokens that are (part of) a PII match —
   * a cheap "drop the whole document" gate (many pipelines drop docs
   * above ~5% rather than redact). */
  def piiDensity(text: Column): Column = {
    val words = size(split(trim(text), "\\s+")).cast(DoubleType)
    val hits = (regexp_count(text, lit(emailRe)) + regexp_count(text, lit(ipv4Re)) +
      regexp_count(text, lit(ssnRe)) + regexp_count(text, lit(phoneRe))).cast(DoubleType)
    when(words > 0, hits / words).otherwise(lit(0.0))
  }

  /**
   * k-anonymity re-identification risk over a quasi-identifier combination
   * — the release gate for datasets that are "anonymized" by dropping
   * direct identifiers: a row is k-anonymous when at least k−1 OTHER rows
   * share its full quasi-identifier tuple (zip+age+segment style), so the
   * re-identifiable mass is exactly the rows in classes smaller than k.
   * One keyed count + one combining aggregate (the [[graft.rules.DatasetChecks]]
   * shape); NULL quasi parts group like values — an all-NULL tuple is a
   * class, not invisible. Returns one summary row: (rows, classes,
   * min_class_size, classes_below_k, rows_below_k, risk_ppm).
   */
  def kAnonymityReport(df: org.apache.spark.sql.DataFrame, k: Int,
      quasiCols: Column*): org.apache.spark.sql.DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(quasiCols.nonEmpty, "kAnonymityReport needs at least one quasi-identifier")
    df.select(struct(quasiCols: _*).as("graft_q"))
      .groupBy(col("graft_q")).agg(count(lit(1)).as("graft_c"))
      .agg(
        sum(col("graft_c")).as("rows"),
        count(lit(1)).as("classes"),
        min(col("graft_c")).as("min_class_size"),
        count(when(col("graft_c") < k, 1)).as("classes_below_k"),
        sum(when(col("graft_c") < k, col("graft_c")).otherwise(0L)).as("rows_below_k"))
      .select(col("rows"), col("classes"), col("min_class_size"),
        col("classes_below_k"), col("rows_below_k"),
        expr("rows_below_k * 1000000L div nullif(rows, 0L)").as("risk_ppm"))
  }

  /**
   * l-diversity — the attribute-disclosure companion to
   * [[kAnonymityReport]]: a k-anonymous class still leaks when every row
   * in it shares the same SENSITIVE value (homogeneity attack), so each
   * quasi-identifier class must carry at least l distinct sensitive
   * values. Two-level aggregate: distinct (quasi, sensitive) census, then
   * per-class diversity, then the one-row summary (rows counted from the
   * class sizes of the full frame). NULL sensitive counts as a value.
   */
  /**
   * ε-differential-privacy noise for integer releases — the geometric
   * mechanism (Ghosh–Roughgarden–Sundararajan), the discrete analogue of
   * Laplace: noise = G₁ − G₂ with G₁, G₂ iid Geometric(α), α = 2^−kLog2;
   * the difference is the two-sided geometric (discrete Laplace), giving
   * ε-DP for sensitivity-1 counts at ε = kLog2 · ln 2.
   *
   * The noise is DETERMINISTIC given (key, seed): uniform bits come from
   * md5(key:seed) (the one digest every engine computes identically), the
   * geometric from exact integer bit-length arithmetic over the first 52
   * hash bits — no doubles, no platform RNG, so a release is
   * reproducible, partition-invariant, and replayable bit-for-bit by an
   * external auditor holding the seed. Magnitudes cap at 52/kLog2 (a
   * 2⁻⁵² tail event, merged into the top bucket identically everywhere).
   * THE SEED IS THE SECRET: publish the noisy counts, never the seed —
   * and NEVER REUSE a seed across releases of a growing table: noise is
   * a pure function of (key, seed), so two releases under the same seed
   * differ by exactly the true delta (zero fresh randomness on the
   * difference — the ε accounting composes only across INDEPENDENT
   * draws). Derive each release's seed from a release identifier via
   * [[releaseSeed]]. The two geometric substreams are keyed
   * `key:seed:0` / `key:seed:1` WITHIN one seed, so distinct seeds never
   * share a substream (seeds s and s+1 draw fully independent noise).
   * O(1) codegen'd arithmetic per group on top of the count.
   */
  def dpNoise(key: Column, kLog2: Int = 1, seed: Long = 0L): Column = {
    require(kLog2 >= 1 && kLog2 <= 30, s"kLog2 must be in 1..30, got $kLog2")
    def geometric(sub: Int): Column = {
      val u = conv(substring(md5(concat(key.cast("string"), lit(s":$seed:$sub"))), 1, 13), 16, 10)
        .cast("long")
      // leading zeros of a 52-bit uniform: P(lead >= g) = 2^-g exactly;
      // floor(lead / k) is then Geometric(2^-k)
      val lead = when(u === 0L, lit(52)).otherwise(lit(52) - length(bin(u)))
      floor(lead.cast("double") / kLog2).cast("long")
    }
    geometric(0) - geometric(1)
  }

  /** Deterministic seed for one named release: the first 8 bytes of
   * md5(releaseId) as a big-endian long. Give every release of a
   * statistic its own id ("customers-2026-08") so repeated releases of a
   * growing table draw independent noise — reusing one seed leaks the
   * exact delta (see [[dpNoise]]). The id is not secret; the derived
   * seed inherits the id's unpredictability only if the id is, so treat
   * the (id → seed) map like the seed itself. */
  def releaseSeed(releaseId: String): Long = {
    require(releaseId.nonEmpty, "releaseId must be non-empty")
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(releaseId.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  /** Per-group ε-DP counts (ε = kLog2·ln 2): one count aggregate plus
   * [[dpNoise]] keyed on the group values. Counts may come back negative
   * — the pure mechanism is unbiased; clamp downstream if presentation
   * needs it. Group keys sharing a rendered string would share noise;
   * the \u0001 separator plus a \u0000 NULL sentinel (concat_ws drops
   * null parts, so ("a", NULL) and (NULL, "a") would otherwise render
   * the same string) keeps multi-column keys unambiguous. */
  def dpCounts(df: org.apache.spark.sql.DataFrame, groupCols: Seq[Column],
      kLog2: Int = 1, seed: Long = 0L): org.apache.spark.sql.DataFrame = {
    require(groupCols.nonEmpty, "dpCounts needs at least one group column")
    val g = df.groupBy(groupCols: _*).agg(count(lit(1)).as("graft_n"))
    val names = g.columns.dropRight(1)
    val key = noiseKey(names)
    g.select(names.map(col) :+
      (col("graft_n") + dpNoise(key, kLog2, seed)).as("dp_count"): _*)
  }

  /** [[dpCounts]] with the seed derived from a mandatory release id —
   * the composition-safe front door (see [[releaseSeed]]). */
  def dpCounts(df: org.apache.spark.sql.DataFrame, groupCols: Seq[Column],
      kLog2: Int, releaseId: String): org.apache.spark.sql.DataFrame =
    dpCounts(df, groupCols, kLog2, releaseSeed(releaseId))

  /** INJECTIVE noise key: NULL parts render the bare \u0000 sentinel;
   * non-null parts escape the sentinel and separator characters
   * (\u0000 -> \u0000\u0002, \u0001 -> \u0000\u0003) before the
   * \u0001 join. No encoded value can equal the bare sentinel (escapes
   * always emit pairs) and none contains a raw separator, so distinct
   * group tuples -- including values that ARE the literal sentinel or
   * separator strings -- always render distinct keys and never share
   * (correlate) their noise draws. Values without those control
   * characters (every realistic key) encode to themselves, so existing
   * releases and the driver oracle are byte-identical. */
  private def noiseKey(names: Seq[String]): Column =
    concat_ws("\u0001",
      names.map { n =>
        val s = col(n).cast("string")
        when(s.isNull, lit("\u0000")).otherwise(
          replace(replace(s, lit("\u0000"), lit("\u0000\u0002")),
            lit("\u0001"), lit("\u0000\u0003")))
      }: _*)

  /** Per-group ε-DP sums of a clamped integer contribution: each value
   * clamps to [0, cap] (bounding one row's influence), sums, and adds the
   * same two-sided-geometric noise — ε = kLog2·ln 2 / cap for one-row-
   * per-individual data. NULL values contribute 0 (Spark's null-skipping
   * greatest/least clamps NULL to the lower bound, which for a sum is
   * identical to excluding the row — stated here so the posture is
   * explicit, as for [[dpQuantile]]'s exclusion). */
  def dpSums(df: org.apache.spark.sql.DataFrame, groupCols: Seq[Column],
      valueCol: Column, cap: Long, kLog2: Int = 1,
      seed: Long = 0L): org.apache.spark.sql.DataFrame = {
    require(groupCols.nonEmpty, "dpSums needs at least one group column")
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val clamped = least(greatest(valueCol.cast("long"), lit(0L)), lit(cap))
    val g = df.groupBy(groupCols: _*).agg(sum(clamped).as("graft_s"))
    val names = g.columns.dropRight(1)
    val key = noiseKey(names)
    g.select(names.map(col) :+
      (coalesce(col("graft_s"), lit(0L)) + dpNoise(key, kLog2, seed)).as("dp_sum"): _*)
  }

  /** [[dpSums]] with the seed derived from a mandatory release id —
   * the composition-safe front door (see [[releaseSeed]]). */
  def dpSums(df: org.apache.spark.sql.DataFrame, groupCols: Seq[Column],
      valueCol: Column, cap: Long, kLog2: Int, releaseId: String): org.apache.spark.sql.DataFrame =
    dpSums(df, groupCols, valueCol, cap, kLog2, releaseSeed(releaseId))

  /**
   * ε-DP QUANTILE release via the exponential mechanism — the third leg of
   * the release family (counts, sums, now order statistics): values clamp
   * to the public range [lo, hi] and bucket onto a `bins`-cell grid; each
   * bucket's utility is −|cumCount(bucket) − ⌊q·n⌋| (sensitivity 1 — one
   * row moves any cumulative count by at most 1), and the released bucket
   * is drawn with P(b) ∝ exp(ε·u(b)/2) at ε = kLog2·ln 2, reported as its
   * grid midpoint.
   *
   * The draw is the Gumbel-max trick made DETERMINISTIC the [[dpNoise]]
   * way: bucket b's uniform comes from md5("dpq:" + seed + ":" + b) (52
   * hash bits, the one digest every engine computes identically), so a
   * release is reproducible, partition-invariant and replayable
   * bit-for-bit by an auditor holding the seed — and THE SEED IS THE
   * SECRET, exactly as for the geometric mechanism: never reuse one
   * across releases of a growing table ([[releaseSeed]] front door
   * below). Privacy holds because the per-bucket randomness is
   * data-independent (keys are seed:bucket, never values).
   *
   * Scale shape: one clamp+bucket projection (codegen), one bins-sized
   * histogram aggregate, then cumulative/score/argmax over the GRID frame
   * — bins rows, driver-bounded by the caller's grid, never the corpus.
   * Output: one row (q, dp_value, bucket). Grid resolution is the
   * accuracy floor: the mechanism never reports finer than (hi−lo)/bins.
   *
   * WHICH ROWS COUNT: NULL values are EXCLUDED from the histogram — a
   * null never clamps to the range edge; it simply does not participate,
   * so the released quantile is a quantile of the NON-NULL rows only
   * (standard statistics posture, but for a privacy release it must be
   * explicit: the protected population is the non-null rows, and a row
   * with a null value neither spends ε here nor shifts any bucket).
   * Filter-or-impute upstream if nulls should count.
   *
   * API SURFACE: the DP release family (dpCounts/dpSums/dpQuantile/
   * dpQuantiles) is DataFrame-level BY DESIGN — there is deliberately no
   * registered SQL face, unlike the mechanism primitive `dp_noise`
   * (Registry): a release needs the clamp/seed/release-id discipline
   * these signatures force, and a free-floating SQL function would make
   * seed reuse across releases (the classic composition mistake) one
   * typo away.
   */
  def dpQuantile(df: org.apache.spark.sql.DataFrame, valueCol: Column,
      q: Double, lo: Double, hi: Double, bins: Int,
      kLog2: Int = 1, seed: Long = 0L): org.apache.spark.sql.DataFrame = {
    require(q > 0.0 && q < 1.0, s"q must be in (0,1), got $q")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    require(bins >= 2 && bins <= 65536, s"bins must be in 2..65536, got $bins")
    require(kLog2 >= 1 && kLog2 <= 30, s"kLog2 must be in 1..30, got $kLog2")
    val spark = df.sparkSession
    val width = (hi - lo) / bins
    // 17-significant-digit literal so Spark and the auditor's engine use
    // the IDENTICAL scale double (ln(2) may differ in the last ulp
    // between libms; a shared literal cannot)
    val scale = kLog2 * 0.6931471805599453 / 2.0
    // the null filter is load-bearing, not belt-and-braces: Spark's
    // greatest/least SKIP nulls (greatest(NULL, lo) = lo), so without it
    // a null value would silently clamp to the LEFT EDGE and count in
    // bucket 0 — the documented posture is exclusion
    val x = least(greatest(valueCol.cast("double"), lit(lo)), lit(hi))
    val hist = df.where(valueCol.isNotNull).select(
        least(floor((x - lit(lo)) / lit(hi - lo) * lit(bins)), lit(bins - 1L))
          .cast("long").as("graft_b"))
      .groupBy(col("graft_b")).agg(count(lit(1)).as("graft_n"))
    val grid = spark.range(0, bins).select(col("id").as("graft_b"))
      .join(hist, Seq("graft_b"), "left")
      .select(col("graft_b"), coalesce(col("graft_n"), lit(0L)).as("graft_n"))
    // bins-sized frame from here on: the single-partition window is over
    // the GRID, not the corpus
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("graft_b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = sum(col("graft_n")).over(
      org.apache.spark.sql.expressions.Window.partitionBy())
    val u52 = conv(substring(md5(concat(lit(s"dpq:$seed:"),
      col("graft_b").cast("string"))), 1, 13), 16, 10).cast("long")
    val gumbel = -log(-log((u52.cast("double") + lit(0.5)) / lit(4503599627370496.0)))
    grid
      .withColumn("graft_cum", sum(col("graft_n")).over(w))
      .withColumn("graft_u",
        -abs(col("graft_cum").cast("double") - floor(lit(q) * tot)))
      .withColumn("graft_score", lit(scale) * col("graft_u") + gumbel)
      .orderBy(col("graft_score").desc, col("graft_b").asc).limit(1)
      .select(lit(q).as("q"),
        (lit(lo) + (col("graft_b").cast("double") + lit(0.5)) * lit(width))
          .as("dp_value"),
        col("graft_b").cast("long").as("bucket"))
  }

  /** [[dpQuantile]] with the seed derived from a mandatory release id —
   * the composition-safe front door (see [[releaseSeed]]). */
  def dpQuantile(df: org.apache.spark.sql.DataFrame, valueCol: Column,
      q: Double, lo: Double, hi: Double, bins: Int, kLog2: Int,
      releaseId: String): org.apache.spark.sql.DataFrame =
    dpQuantile(df, valueCol, q, lo, hi, bins, kLog2, releaseSeed(releaseId))

  /**
   * PER-GROUP [[dpQuantile]] — the same exponential-mechanism release,
   * one drawn bucket per group (the dpCounts/dpSums shape: quantile of
   * balance per nation, of doc length per source). Each group's
   * per-bucket uniforms key `dpq:<injective group key>:<seed>:<bucket>`
   * ([[noiseKey]] escaping, so sentinel-valued groups never share draws
   * with NULL groups), making every group's draw independent under one
   * seed while the whole release stays deterministic and replayable.
   * Scale: one (group, bucket) histogram aggregate over the corpus, then
   * cumulative/score/argmax windows over the groups × bins GRID —
   * |groups|·bins rows, never the corpus. Output: one row per group
   * (groupCols…, q, dp_value, bucket). Same privacy caveats as
   * [[dpQuantile]] — including the NULL posture: null VALUES are excluded
   * from every group's histogram (each group's release covers its
   * non-null rows only, and a group with ZERO non-null rows is absent
   * from the release — indistinguishable from a group absent from the
   * data), while a null GROUP KEY is a group like any other (the
   * [[noiseKey]] sentinel keeps its draws distinct); ε is consumed PER
   * GROUP (a row influences only its group's histogram).
   */
  def dpQuantiles(df: org.apache.spark.sql.DataFrame, groupCols: Seq[Column],
      valueCol: Column, q: Double, lo: Double, hi: Double, bins: Int,
      kLog2: Int = 1, seed: Long = 0L): org.apache.spark.sql.DataFrame = {
    require(groupCols.nonEmpty, "dpQuantiles needs at least one group column")
    require(q > 0.0 && q < 1.0, s"q must be in (0,1), got $q")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    require(bins >= 2 && bins <= 65536, s"bins must be in 2..65536, got $bins")
    require(kLog2 >= 1 && kLog2 <= 30, s"kLog2 must be in 1..30, got $kLog2")
    val spark = df.sparkSession
    val width = (hi - lo) / bins
    val scale = kLog2 * 0.6931471805599453 / 2.0
    // load-bearing null filter — greatest/least skip nulls, see dpQuantile
    val x = least(greatest(valueCol.cast("double"), lit(lo)), lit(hi))
    val bCol = least(floor((x - lit(lo)) / lit(hi - lo) * lit(bins)), lit(bins - 1L))
      .cast("long").as("graft_b")
    val hist = df.where(valueCol.isNotNull)
      .groupBy(groupCols :+ bCol: _*).agg(count(lit(1)).as("graft_n"))
    val names = hist.columns.dropRight(2).toSeq
    val grid = completedGrid(hist, names, bins)
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(names.map(col): _*).orderBy(col("graft_b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wTot = org.apache.spark.sql.expressions.Window
      .partitionBy(names.map(col): _*)
    val u52 = conv(substring(md5(concat(lit("dpq:"), noiseKey(names),
      lit(s":$seed:"), col("graft_b").cast("string"))), 1, 13), 16, 10)
      .cast("long")
    val gumbel = -log(-log((u52.cast("double") + lit(0.5)) / lit(4503599627370496.0)))
    val wPick = org.apache.spark.sql.expressions.Window
      .partitionBy(names.map(col): _*)
      .orderBy(col("graft_score").desc, col("graft_b").asc)
    grid
      .withColumn("graft_cum", sum(col("graft_n")).over(wCum))
      .withColumn("graft_u", -abs(col("graft_cum").cast("double") -
        floor(lit(q) * sum(col("graft_n")).over(wTot))))
      .withColumn("graft_score", lit(scale) * col("graft_u") + gumbel)
      .withColumn("graft_rk", row_number().over(wPick))
      .where(col("graft_rk") === 1)
      .select(names.map(col) :+ lit(q).as("q") :+
        (lit(lo) + (col("graft_b").cast("double") + lit(0.5)) * lit(width))
          .as("dp_value") :+
        col("graft_b").cast("long").as("bucket"): _*)
  }

  /** [[dpQuantiles]] with the seed derived from a mandatory release id —
   * the composition-safe front door (see [[releaseSeed]]). */
  def dpQuantiles(df: org.apache.spark.sql.DataFrame, groupCols: Seq[Column],
      valueCol: Column, q: Double, lo: Double, hi: Double, bins: Int,
      kLog2: Int, releaseId: String): org.apache.spark.sql.DataFrame =
    dpQuantiles(df, groupCols, valueCol, q, lo, hi, bins, kLog2,
      releaseSeed(releaseId))

  /** Completes a per-group bucket histogram onto the full `bins`-cell
   * grid: every group observed in `hist` (group columns `names`, then
   * `graft_b`, then `graft_n`) gets ALL bucket rows 0..bins−1 with
   * zero-filled counts. The grid↔hist join is NULL-SAFE (`<=>`) on
   * aliased sides — a plain using-columns join silently drops every
   * histogram row whose group key is NULL (NULL = NULL is not true), so a
   * null-keyed group would "release" an all-zero histogram; `<=>` plans
   * as an ordinary hash join, so the shape stays one broadcast cross of
   * groups × bins plus one keyed join, never a cartesian. */
  private def completedGrid(hist: org.apache.spark.sql.DataFrame,
      names: Seq[String], bins: Int): org.apache.spark.sql.DataFrame = {
    val spark = hist.sparkSession
    val gridKeys = hist.select(names.map(col): _*).distinct()
      .crossJoin(broadcast(
        spark.range(0, bins).select(col("id").as("graft_b"))))
      .alias("graft_grid")
    val h = hist.alias("graft_hist")
    // backtick-quote: a group column named with a dot (or backtick) must
    // resolve as one field, not a struct path (ADVICE r15)
    def q(n: String) = s"`${n.replace("`", "``")}`"
    val cond = (names :+ "graft_b")
      .map(n => col(s"graft_grid.${q(n)}") <=> col(s"graft_hist.${q(n)}"))
      .reduce(_ && _)
    gridKeys.join(h, cond, "left")
      .select(names.map(n => col(s"graft_grid.${q(n)}")) :+
        col("graft_grid.graft_b").as("graft_b") :+
        coalesce(col("graft_hist.graft_n"), lit(0L)).as("graft_n"): _*)
  }

  /**
   * Per-group ε-DP HISTOGRAM release — the artifact [[dpQuantiles]]
   * implies: per (group, bucket) counts over the same public clamped grid
   * ([lo, hi] × bins), each noised with the [[dpNoise]] two-sided
   * geometric under the [[dpCounts]] contract (ε = kLog2·ln 2 per group:
   * one row lands in exactly one bucket of its group's histogram, so the
   * whole per-group histogram is one sensitivity-1 release, not bins of
   * them). Every observed group releases ALL `bins` buckets — zero
   * buckets carry noise like any other, so the released support never
   * reveals which buckets were truly empty. Noise keys are
   * `dph:<injective group key>:<bucket>` ([[noiseKey]] escaping, domain-
   * separated from dpCounts/dpQuantiles draws under the same seed — but
   * still give each release its OWN seed via the releaseId front door).
   *
   * NULL posture (matches [[dpQuantiles]]): null VALUES are excluded —
   * each group's histogram counts its non-null rows only, a group with
   * zero non-null rows is absent; a null GROUP KEY is a group like any
   * other. Counts may come back negative (the pure mechanism is
   * unbiased); clamp downstream if presentation needs it.
   *
   * Scale shape: one clamp+bucket projection (codegen), one
   * (group, bucket) aggregate over the corpus, then the groups × bins
   * grid completion — |groups|·bins rows, never the corpus. Output: one
   * row per (group, bucket): (groupCols…, bucket, bucket_lo, dp_count).
   */
  def dpHistograms(df: org.apache.spark.sql.DataFrame, groupCols: Seq[Column],
      valueCol: Column, lo: Double, hi: Double, bins: Int,
      kLog2: Int = 1, seed: Long = 0L): org.apache.spark.sql.DataFrame = {
    require(groupCols.nonEmpty, "dpHistograms needs at least one group column")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    require(bins >= 2 && bins <= 65536, s"bins must be in 2..65536, got $bins")
    require(kLog2 >= 1 && kLog2 <= 30, s"kLog2 must be in 1..30, got $kLog2")
    val width = (hi - lo) / bins
    // load-bearing null filter — greatest/least skip nulls, see dpQuantile
    val x = least(greatest(valueCol.cast("double"), lit(lo)), lit(hi))
    val bCol = least(floor((x - lit(lo)) / lit(hi - lo) * lit(bins)), lit(bins - 1L))
      .cast("long").as("graft_b")
    val hist = df.where(valueCol.isNotNull)
      .groupBy(groupCols :+ bCol: _*).agg(count(lit(1)).as("graft_n"))
    val names = hist.columns.dropRight(2).toSeq
    val key = concat(lit("dph:"), noiseKey(names), lit(":"),
      col("graft_b").cast("string"))
    completedGrid(hist, names, bins)
      .select(names.map(col) :+
        col("graft_b").cast("long").as("bucket") :+
        (lit(lo) + col("graft_b").cast("double") * lit(width)).as("bucket_lo") :+
        (col("graft_n") + dpNoise(key, kLog2, seed)).as("dp_count"): _*)
  }

  /** [[dpHistograms]] with the seed derived from a mandatory release id —
   * the composition-safe front door (see [[releaseSeed]]). */
  def dpHistograms(df: org.apache.spark.sql.DataFrame, groupCols: Seq[Column],
      valueCol: Column, lo: Double, hi: Double, bins: Int,
      kLog2: Int, releaseId: String): org.apache.spark.sql.DataFrame =
    dpHistograms(df, groupCols, valueCol, lo, hi, bins, kLog2,
      releaseSeed(releaseId))

  def lDiversityReport(df: org.apache.spark.sql.DataFrame, l: Int,
      sensitiveCol: Column, quasiCols: Column*): org.apache.spark.sql.DataFrame = {
    require(l >= 2, s"l must be >= 2, got $l")
    require(quasiCols.nonEmpty, "lDiversityReport needs at least one quasi-identifier")
    df.select(struct(quasiCols: _*).as("graft_q"),
        sensitiveCol.cast("string").as("graft_s"))
      .groupBy(col("graft_q"), col("graft_s")).agg(count(lit(1)).as("graft_c"))
      .groupBy(col("graft_q")).agg(
        sum(col("graft_c")).as("graft_rows"),
        count(lit(1)).as("graft_div"))
      .agg(
        sum(col("graft_rows")).as("rows"),
        count(lit(1)).as("classes"),
        min(col("graft_div")).as("min_diversity"),
        count(when(col("graft_div") < l, 1)).as("classes_below_l"),
        sum(when(col("graft_div") < l, col("graft_rows")).otherwise(0L)).as("rows_below_l"))
      .select(col("rows"), col("classes"), col("min_diversity"),
        col("classes_below_l"), col("rows_below_l"),
        expr("rows_below_l * 1000000L div nullif(rows, 0L)").as("risk_ppm"))
  }
}
