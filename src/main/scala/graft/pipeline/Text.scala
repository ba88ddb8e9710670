package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Text-analysis operators for training-data pipelines: token counting,
 * language id, quality scoring, shingling, minhash/simhash signatures,
 * winnowing fingerprints. Everything scalar is a narrow projection — no
 * shuffle, safe at any scale; the heuristics are deliberately simple,
 * deterministic SQL so the DuckDB oracle can replicate them exactly.
 */
object Text {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish size estimate: ~4 chars/token heuristic. */
  def bpeTokenEstimate(text: Column): Column =
    ceil(length(text) / lit(4.0)).cast(IntegerType)

  /** BPE-style regex pre-tokenizer count (GPT-2-family splitting: common
   * contractions, space-prefixed letter runs, digit runs, punctuation runs).
   * Counts pre-merge tokens — an upper bound on BPE tokens that tracks real
   * tokenizer counts far closer than chars/4 on natural text. */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text,
      lit("""('s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+)"""))

  /** Stopword-majority language id over a fixed marker table; ties resolve
   * in the declared language order. */
  def langId(text: Column): Column = {
    val markers = Seq(
      "en" -> "\\b(the|and|of|is)\\b",
      "de" -> "\\b(der|die|das|und)\\b",
      "es" -> "\\b(el|la|los|que)\\b",
      "fr" -> "\\b(le|les|et|est)\\b")
    val hits = markers.map { case (l, p) => l -> regexp_count(lower(text), lit(p)) }
    // argmax with first-declared-wins ties: fold in reverse so earlier
    // languages overwrite later ones at equal counts
    val maxHits = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.reverse.foldLeft(lit("und")) { case (acc, (l, h)) =>
      when(h > 0 && h === maxHits, lit(l)).otherwise(acc)
    }
  }

  /**
   * Full-breadth language ID: struct(lang, script, confidence) in ONE
   * codegen'd pass per row — no UDF, no per-language scans. Two tiers:
   *
   *  1. Unicode-script census over the tracked BMP ranges (Latin, Han,
   *     Hiragana, Katakana, Hangul, Cyrillic, Arabic, Devanagari, Greek,
   *     Hebrew, Thai). The dominant script (argmax, earlier-declared wins
   *     ties) decides the language outright for single-language scripts
   *     (Hangul → ko, Cyrillic → ru, Arabic → ar, Devanagari → hi,
   *     Greek → el, Hebrew → he, Thai → th, any Kana → ja, Han alone → zh);
   *     confidence is dominant-script codepoints / tracked codepoints.
   *  2. Latin-dominant text falls to stopword profiles for the 12 biggest
   *     Latin-script web languages (en, de, es, fr, pt, it, nl, pl, sv, tr,
   *     ro, id) — whole-token hits on the lowercased text, argmax with
   *     earlier-declared tie-break (en/de/es/fr lists identical to
   *     [[langId]], so the four pinned languages classify unchanged);
   *     confidence is winner hits / total profile hits.
   *
   * Zero tracked codepoints → ("und", "none", 0.0); Latin with zero profile
   * hits → ("und", "latin", 0.0). Every rule is range counts + integer
   * argmax + one IEEE division, so a DuckDB oracle replicates it exactly
   * (script ranges as RE2 character classes, profiles as `\b(...)\b`
   * counts).
   */
  def langIdFull(text: Column): Column =
    Bridge.column(LangIdFullExpression(Bridge.expression(text)))

  /** Simple quality score: whitespace ratio + alpha ratio - digit ratio,
   * computed with a fixed operation order so oracles match bit-for-bit.
   * Empty text scores 0.0 — without the guard the ratio divisions raise
   * DIVIDE_BY_ZERO under ANSI mode (Spark 4 default). */
  def qualityScore(text: Column): Column = {
    val n = length(text).cast(DoubleType)
    val spaces = (length(text) - length(regexp_replace(text, " ", ""))).cast(DoubleType)
    val digits = (length(text) - length(regexp_replace(text, "[0-9]", ""))).cast(DoubleType)
    when(n === 0.0, lit(0.0))
      .otherwise((spaces / n) + (lit(1.0) - (digits / n)))
  }

  /** Repetition ratio: 1 - distinct_words/words (lowercased whitespace
   * tokens). 0 = no repetition; boilerplate/spam scores high. */
  def repetitionRatio(text: Column): Column = {
    val ws = split(trim(lower(text)), "\\s+")
    lit(1.0) - size(array_distinct(ws)).cast(DoubleType) / size(ws).cast(DoubleType)
  }

  /** Deflate compression ratio (compressed bytes / raw UTF-8 bytes) — the
   * information-density gate used alongside the Gopher heuristics in
   * published pipelines (Dolma, Rae et al. 2021 §A1.2 use repetition
   * proxies; zlib length is the standard cheap entropy stand-in): machine-
   * generated or template-stamped text compresses far below prose
   * (ratio < ~0.3), while binary-ish/encoded junk refuses to compress
   * (ratio near or above 1). Catches LONG-RANGE repetition that the
   * distinct-word and dup-n-gram signals miss — a 200-line template
   * repeated 50× has diverse words but deflates to almost nothing. One
   * codegen'd static call per row over a thread-local Deflater (zlib
   * native state is reused, not reallocated per row); narrow projection,
   * no shuffle at any scale. Empty/whitespace-only text → 1.0 (neutral:
   * the length gates own degenerate docs). */
  def compressionRatio(text: Column): Column =
    Bridge.column(CompressionRatioExpression(Bridge.expression(text)))

  /**
   * Gopher-style document quality measures (Rae et al. 2021, "Scaling
   * Language Models: Methods, Analysis & Insights from Training Gopher",
   * table A1 heuristics): word count bounds, mean word length, symbol-to-
   * word ratio (# and ellipsis), fraction of words containing an alphabetic
   * character, and stop-word presence. Returns a struct of the measures plus
   * the combined `pass` flag; every measure is plain deterministic SQL so
   * the DuckDB oracle replicates it bit-for-bit. Narrow projection — no
   * shuffle at any scale.
   */
  def gopherQuality(text: Column, minWords: Int = 50, maxWords: Int = 100000): Column =
    Bridge.column(GopherQualityExpression(Bridge.expression(text), minWords, maxWords))

  /** URL pieces for domain-level curation (blocklists, per-host stats,
   * domain caps). Pure regex projections — narrow at any scale, replicated
   * exactly by the DuckDB oracle. Empty string when the piece is absent.
   * The host strips `userinfo@` and `:port` so `example.com`,
   * `example.com:8080` and `user@example.com` group as ONE domain —
   * otherwise per-host caps/budgets would split across authority variants.
   * (IPv6 bracket literals are out of scope for these regex parsers.) */
  def urlHost(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1)

  def urlPath(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  /** Last dot-separated label of the host (simple public-suffix-free TLD). */
  def urlTld(url: Column): Column =
    regexp_extract(urlHost(url), "\\.([^.]+)$", 1)

  /** The multi-part public suffixes that matter for web-corpus domain
   * grouping (the high-traffic entries of the Mozilla public-suffix list;
   * the full list is an external artifact — load one via a blocklist-style
   * config when a tenant needs long-tail ccTLD schemes). */
  private[pipeline] val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.kr", "or.kr", "com.br", "net.br", "org.br",
    "com.mx", "com.ar", "com.cn", "net.cn", "org.cn",
    "com.tw", "com.hk", "co.in", "net.in", "org.in",
    "co.nz", "net.nz", "org.nz", "com.sg", "com.tr",
    "co.za", "org.za", "com.ua", "co.id", "com.my",
    "com.ph", "com.vn", "com.eg", "com.sa", "com.pk")

  /** Registrable domain (eTLD+1) of a URL's host: `a.b.example.co.uk` →
   * `example.co.uk`, `a.example.com` → `example.com`. THIS — not the raw
   * host — is the right key for per-domain caps, budgets and kill-lists:
   * keying on the host lets one site dodge its cap with unlimited
   * subdomains, and keying on the naive last-2-labels would lump every
   * .co.uk site into ONE cap bucket. Hosts under a known multi-part
   * public suffix ([[MultiPartSuffixes]]) keep three labels, everything
   * else two; a host with no dot (localhost, intranets) passes through.
   * Pure built-in regex/CASE projection — codegen'd, no shuffle, and the
   * DuckDB oracle replicates it token-for-token. */
  def registrableDomain(url: Column): Column = {
    // DNS is case-insensitive but urlHost preserves case; lowercase before
    // the suffix check or `A.Example.CO.UK` would yield `CO.UK` — lumping
    // every such host into one cap/budget bucket, the exact failure this
    // function exists to prevent
    val host = lower(urlHost(url))
    val last2 = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val last3 = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    when(last2 === lit(""), host) // dotless host: pass through
      .otherwise(when(last2.isin(MultiPartSuffixes: _*) && last3 =!= lit(""), last3)
        .otherwise(last2))
  }

  /** Flesch reading-ease — the edu-quality curation signal (FineWeb-Edu
   * style filters key on readability bands): struct(words, sentences,
   * syllables, flesch) with flesch = 206.835 − 1.015·(words/sentences) −
   * 84.6·(syllables/words), rounded to 6 (null when either denominator is
   * zero). Syllables are the standard vowel-GROUP heuristic (runs of
   * [aeiouy] in the lowercased text — crude, deterministic, and the same
   * crude rule both engines apply); sentences are [[sentences]]' units.
   * Pure built-ins → codegen'd narrow projection, DuckDB-replicable. */
  def readability(text: Column): Column = {
    val t = trim(text)
    val words = when(t === lit(""), lit(0)).otherwise(size(split(t, "\\s+")))
    val sents = size(sentences(text))
    val sylls = size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))
    val flesch = when(words > 0 && sents > 0,
      round(lit(206.835)
        - lit(1.015) * (words.cast(DoubleType) / sents.cast(DoubleType))
        - lit(84.6) * (sylls.cast(DoubleType) / words.cast(DoubleType)), 6))
    struct(words.as("words"), sents.as("sentences"),
      sylls.as("syllables"), flesch.as("flesch"))
  }

  /** Rule-based sentence segmentation: maximal runs of non-terminator
   * characters followed by a `.`/`!`/`?` run (or end of text), trimmed of
   * WHITESPACE on both ends (the explicit `[ \t\n\r\f]` class — `trim()`
   * strips spaces only, and a sentence led by the previous line's `\n`
   * would then hash differently across docs, hiding line-initial
   * boilerplate from [[graft.pipeline.Dedup.dedupSentences]]'s census);
   * units with no letter or digit dropped (pure-punctuation/whitespace
   * fragments are separators, not sentences). Deliberately simple — every
   * regex lives in the Java∩RE2 subset (no lookaround, no `\s`, whose
   * definition differs between the engines), so the DuckDB oracle
   * replicates it exactly; abbreviation handling is out of scope and the
   * contract is deterministic either way. Built-in functions only —
   * codegen'd narrow projection, no shuffle at any scale. */
  def sentences(text: Column): Column =
    filter(
      transform(regexp_extract_all(text, lit("[^.!?]+(?:[.!?]+|$)"), lit(0)),
        s => regexp_replace(s, "^[ \\t\\n\\r\\f]+|[ \\t\\n\\r\\f]+$", "")),
      s => s.rlike("[\\p{L}\\p{N}]"))

  /** Deterministic text cleaning for ingest normalization: strip control
   * characters (keeping \n and \t), collapse space/tab runs to one space,
   * tighten spaces around newlines, cap blank-line runs at one (paragraph
   * break preserved), trim the ends. Pure regex projection in the Java∩RE2
   * subset — the DuckDB oracle replicates it byte-for-byte; narrow at any
   * scale. */
  def cleanText(text: Column, lowercase: Boolean = false): Column = {
    val noCtl = regexp_replace(text, "[\\x00-\\x08\\x0B-\\x1F\\x7F]", "")
    val oneSpace = regexp_replace(noCtl, "[ \\t]+", " ")
    val tightNl = regexp_replace(oneSpace, " *\\n *", "\n")
    val para = regexp_replace(tightNl, "\\n{3,}", "\n\n")
    val trimmed = regexp_replace(para, "^\\s+|\\s+$", "")
    if (lowercase) lower(trimmed) else trimmed
  }

  /** Confusable table (UTS #39-style, bounded): lowercase Cyrillic and
   * Greek Latin-lookalikes plus the fullwidth ASCII block, paired
   * position-for-position with their Latin skeletons. Applied AFTER
   * lower(), so uppercase homoglyphs fold through their own script's
   * lowercasing first (Cyrillic А → а → a; fullwidth Ａ → ａ → a). */
  val ConfusablesFrom: String =
    "аеорсухіјѕһԁѡԛ" + "αικνορτυ" +
      "ａｂｃｄｅｆｇｈｉｊｋｌｍｎｏｐｑｒｓｔｕｖｗｘｙｚ０１２３４５６７８９"
  val ConfusablesTo: String =
    "aeopcyxijshdwq" + "aikvoptu" + "abcdefghijklmnopqrstuvwxyz0123456789"

  /**
   * Confusable-skeleton normalization — the dedup-evasion counter: a
   * spoofed copy that swaps Latin letters for Cyrillic/Greek/fullwidth
   * homoglyphs (and seasons with zero-width characters) hashes identically
   * after skeletonization, so exact dedup, minhash shingles and blocklist
   * matching all see through the disguise. lower() → strip
   * zero-width/format characters (ZWSP/ZWNJ/ZWJ/WJ/BOM/soft hyphen) →
   * codepoint translate over the bounded table. Pure built-ins (one
   * codegen'd pass, no shuffle); DuckDB replays it with the same table.
   */
  def confusableSkeleton(text: Column): Column =
    translate(
      regexp_replace(lower(text), "[\\u200B\\u200C\\u200D\\u2060\\uFEFF\\u00AD]", ""),
      ConfusablesFrom, ConfusablesTo)

  /** Canonical URL for crawl dedup and domain grouping: scheme/host
   * lowercased, default ports and fragments stripped, utm_/click-id
   * tracking params removed, trailing slash normalized — one codegen'd
   * pass; see [[IngestAlgos.canonicalizeUrl]] for the exact contract the
   * q_url_canonicalize oracle pins. */
  def urlCanonicalize(url: Column): Column =
    Bridge.column(UrlCanonicalizeExpression(Bridge.expression(url)))

  /** Mojibake + unicode-punctuation repair (latin-1/cp1252 double-decode
   * sequences → their real characters with ASCII punctuation, zero-widths
   * and BOM removed, exotic spaces → space) in ONE longest-match pass; see
   * [[IngestAlgos.fixEncoding]]. Chain in front of [[cleanText]] at ingest. */
  def fixEncoding(text: Column): Column =
    Bridge.column(FixEncodingExpression(Bridge.expression(text)))

  /** HTML → visible text: strip comments/script/style, decode entities,
   * block-level tags become `\n` block boundaries (so dedupLines /
   * dedupParagraphs see real units), inline tags vanish, whitespace
   * collapses per block. With `maxLinkDensity` < 1, blocks whose
   * non-whitespace characters are mostly inside `<a>` links (nav bars,
   * footer link farms) are dropped — the jusText-style boilerplate cut.
   * ONE codegen'd linear pass per row; see [[HtmlAlgos.extract]] for the
   * exact contract the q_html_extract oracle fixture pins. */
  def extractHtml(html: Column, maxLinkDensity: Double = 1.0): Column =
    Bridge.column(HtmlExtractExpression(Bridge.expression(html), maxLinkDensity))

  /** href values of `<a>` tags as array<string>, document order — raw
   * attribute text (no resolution/decoding; chain [[urlHost]] /
   * [[urlCanonicalize]]), script/style/comment decoys skipped; ONE
   * codegen'd linear pass per row ([[HtmlAlgos.links]]). The outlink side
   * of [[Graphs.hostEdges]]. */
  def htmlLinks(html: Column): Column =
    Bridge.column(HtmlLinksExpression(Bridge.expression(html)))

  /** (href, anchor) structs of `<a>` tags — anchor text is what OTHER
   * pages call a link target, the classic retrieval/host-description
   * signal. Same href set as [[htmlLinks]], text entity-decoded and
   * whitespace-collapsed, 500-char capture cap ([[HtmlAlgos.anchors]]). */
  def htmlAnchors(html: Column): Column =
    Bridge.column(HtmlAnchorsExpression(Bridge.expression(html)))

  /** Page metadata: struct(title, metas array<struct<name,content>>) —
   * first <title> (rcdata, entity-decoded, collapsed) and every <meta>
   * with a name/property/http-equiv key + content, document order, keys
   * lowercased ([[HtmlAlgos.meta]]). The og:/description/robots signals
   * crawl curation filters and labels by. */
  def htmlMeta(html: Column): Column =
    Bridge.column(HtmlMetaExpression(Bridge.expression(html)))

  /** Page-level robots directives from `<meta name="robots">` (and an
   * agent-specific `<meta name="<agent>">` tag, both honored, most
   * restrictive wins — the cumulative semantics search engines document):
   * struct(noindex, nofollow) booleans. `none` implies both. The
   * page-side half of crawl compliance — [[graft.pipeline.Robots]] gates
   * FETCHING, this gates INDEXING/CORPUS INCLUSION of fetched pages; a
   * curation front door should drop noindex pages before dedup. Pure HOF
   * composition over [[htmlMeta]]'s one-pass parse — no second scan. */
  def htmlRobotsDirectives(html: Column, agent: String = "robots"): Column = {
    val toks = flatten(transform(
      filter(htmlMeta(html)("metas"),
        m => m("name") === "robots" || m("name") === lit(agent.toLowerCase)),
      m => transform(split(m("content"), ","), t => trim(lower(t)))))
    struct(
      exists(toks, t => t === "noindex" || t === "none").as("noindex"),
      exists(toks, t => t === "nofollow" || t === "none").as("nofollow"))
  }

  /** The page's self-declared canonical URL ("" when absent) — THE
   * url-level dedup key: AMP/print/tracking variants collapse onto one
   * canonical ([[HtmlAlgos.canonical]]); chain [[urlCanonicalize]]. */
  def htmlCanonical(html: Column): Column =
    Bridge.column(HtmlCanonicalExpression(Bridge.expression(html)))

  /** (hreflang, href) alternate pairs — the page's own list of its
   * language versions, the seed of hreflang-mined parallel corpora
   * ([[HtmlAlgos.alternates]]). */
  def htmlAlternates(html: Column): Column =
    Bridge.column(HtmlAlternatesExpression(Bridge.expression(html)))

  /** JSON-LD script bodies (schema.org structured data) as array<string>
   * — parse downstream with `from_json` ([[HtmlAlgos.jsonLd]]). */
  def htmlJsonLd(html: Column): Column =
    Bridge.column(HtmlJsonLdExpression(Bridge.expression(html)))

  /** Distinct word n-gram shingles (lowercased), first-occurrence order —
   * ONE codegen'd static call per row. This feeds every minhash/simhash
   * corpus pass and the Jaccard verify joins, so it was the hottest
   * remaining interpreted HOF tree (transform + sequence + concat_ws +
   * slice, O(words × n) byte work through expression-tree walks).
   * Semantics replicate the HOF formulation exactly (spec-pinned against
   * it string-for-string): Spark lower/trim on the UTF8String, Java-regex
   * `\s+` split, short docs yield one sub-n shingle, empty docs one empty
   * shingle. */
  def shingles(text: Column, n: Int): Column =
    Bridge.column(ShinglesExpression(Bridge.expression(text), n))

  /** Whitespace words with empties dropped — one codegen'd call, shared by
   * span dedup, chunking, BPE and LM tokenization (replaces interpreted
   * filter(split(...)) HOF pairs in those corpus passes). `cjk = true`
   * additionally makes every ideographic code point its own token
   * (Character.isIdeographic), so unspaced CJK prose stops reading as one
   * giant "word" in token counts, Gopher gates, BPE, chunking and span
   * dedup. Default OFF: the oracle queries pin whitespace semantics, and
   * mixed-script corpora should opt in deliberately. */
  def words(text: Column, lowercase: Boolean = false, cjk: Boolean = false): Column =
    Bridge.column(SplitWordsExpression(Bridge.expression(text), lowercase, cjk))

  /** Word n-gram shingles WITH repeats ([[TextAlgos.shinglesAll]]) — the
   * multiset universe of the ICWS weighted-dedup tier. */
  def shinglesMultiset(text: Column, n: Int): Column =
    Bridge.column(ShinglesAllExpression(Bridge.expression(text), n))

  /** Whitespace + ideograph-aware token count (the `cjk` words variant). */
  def tokenCountCjk(text: Column): Column =
    size(words(text, lowercase = false, cjk = true))

  def minhash(shingleCol: Column, numHashes: Int = 64): Column =
    Bridge.column(MinHashExpression(Bridge.expression(shingleCol), numHashes))

  def simhash(shingleCol: Column): Column =
    Bridge.column(SimHashExpression(Bridge.expression(shingleCol)))

  def fingerprint(text: Column, k: Int = 9, window: Int = 4): Column =
    Bridge.column(WinnowFingerprintExpression(Bridge.expression(text), k, window))

  /**
   * Full Gopher repetition-signal family (Rae et al. 2021 table A1, the
   * MassiveText repetition filters): duplicate line / paragraph fractions
   * (by unit count and by character mass), the character fraction of the
   * single most frequent word {2,3,4}-gram, and the character fraction
   * covered by ANY duplicated word {5..10}-gram (position coverage — an
   * overlapping region counts once). One codegen'd expression, one pass
   * per n — a narrow projection with no shuffle at any scale.
   *
   * Exact semantics (mirrored by the DuckDB oracle for the SQL-expressible
   * subset): lines split on `\n` (exact content, untrimmed), paragraphs on
   * `\n\n`; words are lowercased `\s+` tokens with empties dropped; n-gram
   * character length counts word characters only (no joiner spaces); the
   * top n-gram tie-breaks by (count desc, char length desc, lexicographic
   * asc). Empty inputs score 0 everywhere.
   */
  def repetitionSignals(text: Column): Column =
    Bridge.column(RepetitionSignalsExpression(Bridge.expression(text)))

  /**
   * Unicode normalization (JDK java.text.Normalizer): the dedup-key
   * hygiene step — the same text in composed (NFC) vs decomposed (NFD)
   * form, or with compatibility variants (ﬁ ligature, full-width digits),
   * fingerprints as DIFFERENT content and sails through exact dedup.
   * `form` is "NFC" (canonical, the web default — DuckDB's nfc_normalize
   * replicates it, so oracles hash-match) or "NFKC" (adds compatibility
   * folding — the aggressive dedup-key choice). One codegen'd call,
   * already-normalized text is a fast no-op check inside the JDK.
   */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column = {
    require(Set("NFC", "NFD", "NFKC", "NFKD")(form), s"unknown form $form")
    Bridge.column(NormalizeUnicodeExpression(Bridge.expression(text), form))
  }

  /**
   * Hashed bag-of-words pseudo-embedding: lowercased words hash into `dim`
   * buckets, counts l2-normalize into an array<double> unit vector — a
   * deterministic, model-free document vector whose cosine approximates
   * lexical overlap. The bridge that runs the WHOLE embedding tier
   * (SemDeDup, IVF/SQ8/PQ ANN, embeddingOutliers) on corpora with no
   * neural embedding model: cosine of hashed BoW is a tight proxy for
   * unigram cosine similarity at dim ≫ vocabulary-per-doc. One codegen'd
   * call per row, no shuffle; empty/whitespace text yields the zero vector,
   * which every downstream cosine path treats as degenerate (NaN → drop).
   */
  def hashedBow(text: Column, dim: Int = 256): Column =
    Bridge.column(HashedBowExpression(Bridge.expression(text), dim))
}

/** xxhash-style 64-bit string mix shared by the signature expressions. */
object TextHash {
  def hash64(s: UTF8String, seed: Long): Long = {
    // FNV-1a over bytes then SplitMix64 finisher with seed fold — simple,
    // fast, deterministic across JVMs
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    var z = h + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/**
 * Signature algorithms as static-forwarder methods so generated code can
 * call them directly: the expressions below emit one static call in
 * `doGenCode`, keeping the whole signature projection inside whole-stage
 * codegen (a CodegenFallback would break the fused pipeline per row).
 */
object TextAlgos {

  private val WhitespaceRe = java.util.regex.Pattern.compile("\\s+")

  /** Thread-local zlib state: Deflater construction allocates native
   * buffers, so reuse-with-reset beats per-row allocation in the fused
   * corpus pass. Raw deflate (nowrap) — no zlib header/checksum bytes
   * skewing short documents. Level 6 (the zlib default) is the published
   * pipelines' convention. */
  private val deflaters =
    ThreadLocal.withInitial[java.util.zip.Deflater](() =>
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true))

  /** Deflate ratio = compressed/raw bytes; empty text → 1.0 (neutral). */
  def compressionRatio(text: UTF8String): Double = {
    val bytes = text.getBytes
    if (bytes.length == 0) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }

  /** Distinct word n-gram shingles, first-occurrence order — exact
   * replication of the HOF formulation this replaced:
   * `array_distinct(transform(sequence(0, max(len-n, 0)), i =>
   * concat_ws(" ", slice(split(trim(lower(text)), "\s+"), i+1, n))))`.
   * Lower/trim use the UTF8String methods (what Spark's lower/trim
   * evaluate to), the split is the same Java regex, a short doc yields one
   * sub-n shingle and an empty doc one empty shingle. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val words = WhitespaceRe.split(text.toLowerCase.trim.toString, -1)
    val last = math.max(words.length - n, 0)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= last) {
      val end = math.min(i + n, words.length)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    var k = 0
    val it = seen.iterator()
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** All word n-gram shingles WITH repeats — the tf multiset universe for
   * weighted (ICWS) dedup, unlike [[shingles]]' distinct set. Full
   * n-grams only: docs shorter than n yield an EMPTY array (they sit out
   * of multiset similarity rather than contributing a sub-n token).
   * Words are the \s+ split of lower(trim(text)) with empties dropped. */
  def shinglesAll(text: UTF8String, n: Int): ArrayData = {
    val all = WhitespaceRe.split(text.toLowerCase.trim.toString, -1)
    var cnt = 0
    var i = 0
    while (i < all.length) { if (!all(i).isEmpty) cnt += 1; i += 1 }
    val words =
      if (cnt == all.length) all
      else {
        val w = new Array[String](cnt)
        var k = 0
        i = 0
        while (i < all.length) { if (!all(i).isEmpty) { w(k) = all(i); k += 1 }; i += 1 }
        w
      }
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](words.length - n + 1)
    i = 0
    while (i <= words.length - n) {
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Whitespace word split with empties dropped (optionally lowercased) —
   * exact replication of `filter(split([lower(]text[)], "\s+"), _ != "")`. */
  def splitWords(text: UTF8String, lowercase: Boolean): ArrayData =
    splitWords(text, lowercase, cjk = false)

  /** Unicode normalization: fast path checks first (already-normalized
   * text — the overwhelming majority — never re-encodes). */
  def normalizeUnicode(text: UTF8String, form: String): UTF8String = {
    val s = text.toString
    val f = java.text.Normalizer.Form.valueOf(form)
    if (java.text.Normalizer.isNormalized(s, f)) text
    else UTF8String.fromString(java.text.Normalizer.normalize(s, f))
  }

  /** Hashed-BoW unit vector (see [[Text.hashedBow]]): lowercased words →
   * hash64 buckets → counts → l2 normalization. Empty text → zero vector
   * (degenerate by the cosine NaN contract). */
  def hashedBow(text: UTF8String, dim: Int): ArrayData = {
    val ws = splitWords(text, lowercase = true)
    val counts = new Array[Double](dim)
    var i = 0
    while (i < ws.numElements()) {
      val b = ((TextHash.hash64(ws.getUTF8String(i), 0x9e3779b97f4a7c15L) % dim)
        + dim) % dim
      counts(b.toInt) += 1.0
      i += 1
    }
    var norm2 = 0.0
    i = 0
    while (i < dim) { norm2 += counts(i) * counts(i); i += 1 }
    if (norm2 > 0.0) {
      val inv = 1.0 / math.sqrt(norm2)
      i = 0
      while (i < dim) { counts(i) *= inv; i += 1 }
    }
    val out = new Array[Any](dim)
    i = 0
    while (i < dim) { out(i) = counts(i); i += 1 }
    new GenericArrayData(out)
  }

  /** With `cjk = true`, ideographic code points (Character.isIdeographic —
   * CJK Unified Ideographs and extensions) become ONE token each, splitting
   * whatever whitespace-run they sit in; surrounding non-ideograph text
   * keeps the whitespace rule. CJK prose has no spaces, so the default
   * split sees whole sentences as one "word" and every word-based signal
   * (token counts, Gopher gates, BPE pre-tokens, chunking, span dedup)
   * degenerates; per-character tokens are the standard public baseline
   * (each hanzi ≈ one morpheme). Default OFF — oracle queries pin the
   * whitespace semantics. */
  def splitWords(text: UTF8String, lowercase: Boolean, cjk: Boolean): ArrayData = {
    val s = if (lowercase) text.toLowerCase.toString else text.toString
    if (!cjk) {
      val parts = WhitespaceRe.split(s, -1)
      var cnt = 0
      var i = 0
      while (i < parts.length) { if (!parts(i).isEmpty) cnt += 1; i += 1 }
      val out = new Array[Any](cnt)
      var k = 0
      i = 0
      while (i < parts.length) {
        if (!parts(i).isEmpty) { out(k) = UTF8String.fromString(parts(i)); k += 1 }
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new scala.collection.mutable.ArrayBuffer[Any](s.length / 4 + 1)
      val word = new java.lang.StringBuilder(16)
      def flush(): Unit =
        if (word.length > 0) { out += UTF8String.fromString(word.toString); word.setLength(0) }
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        val w = Character.charCount(cp)
        if (Character.isWhitespace(cp)) flush()
        else if (Character.isIdeographic(cp)) {
          flush()
          out += UTF8String.fromString(new String(Character.toChars(cp)))
        } else word.appendCodePoint(cp)
        i += w
      }
      flush()
      new GenericArrayData(out.toArray)
    }
  }

  private val HashRe = java.util.regex.Pattern.compile("#")
  private val EllipsisRe = java.util.regex.Pattern.compile("\\.\\.\\.")
  private val AlphaRe = java.util.regex.Pattern.compile("[A-Za-z]")
  private val StopRe =
    java.util.regex.Pattern.compile("\\b(the|be|to|of|and|that|have|with)\\b")

  private def countMatches(p: java.util.regex.Pattern, s: String): Int = {
    val m = p.matcher(s)
    var c = 0
    while (m.find()) c += 1
    c
  }

  /** Gopher quality gate in one static call — exact replication of the
   * Column formulation it replaced (same trim/split/regex/arithmetic
   * order, spec-pinned value-for-value): word count of the space-trimmed
   * split, mean word length over code points, per-symbol ratios, fraction
   * of words containing an ASCII letter, stopword regex hits, and the
   * table-A1 pass with EACH symbol ratio gated at 0.1. wc is never 0
   * (splitting "" yields one empty word), so the divisions are safe. */
  def gopherQuality(text: UTF8String, minWords: Int, maxWords: Int): InternalRow = {
    val words = WhitespaceRe.split(text.trim.toString, -1)
    val wc = words.length
    val wcD = wc.toDouble
    val full = text.toString
    val noWs = WhitespaceRe.matcher(full).replaceAll("")
    val meanWordLen = noWs.codePointCount(0, noWs.length) / wcD
    val hashRatio = countMatches(HashRe, full) / wcD
    val ellipsisRatio = countMatches(EllipsisRe, full) / wcD
    val symbolRatio = hashRatio + ellipsisRatio
    var alpha = 0
    var i = 0
    while (i < wc) { if (AlphaRe.matcher(words(i)).find()) alpha += 1; i += 1 }
    val alphaRatio = alpha / wcD
    val stops = countMatches(StopRe, text.toLowerCase.toString)
    val pass = wc >= minWords && wc <= maxWords &&
      meanWordLen >= 3.0 && meanWordLen <= 10.0 &&
      hashRatio <= 0.1 && ellipsisRatio <= 0.1 &&
      alphaRatio >= 0.8 && stops >= 2
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](wc, meanWordLen, symbolRatio, alphaRatio, stops, pass))
  }

  // ------------------------------------------------------- full language id

  /** Declared order IS the tie-break: en/de/es/fr first (pinned to the
   * [[Text.langId]] marker lists), then the next-biggest Latin-script web
   * languages. ASCII-only words so whole-token matching is exactly the
   * ASCII `\b(...)\b` regex count the DuckDB oracle runs. */
  private[pipeline] val LatinLangs: Array[String] =
    Array("en", "de", "es", "fr", "pt", "it", "nl", "pl", "sv", "tr", "ro", "id")
  private[pipeline] val LatinProfiles: Array[Array[String]] = Array(
    Array("the", "and", "of", "is"),
    Array("der", "die", "das", "und"),
    Array("el", "la", "los", "que"),
    Array("le", "les", "et", "est"),
    Array("uma", "para", "com", "mais"),
    Array("di", "che", "il", "per"),
    Array("het", "een", "voor", "niet"),
    Array("jest", "nie", "to", "w"),
    Array("och", "att", "som", "det"),
    Array("bir", "ve", "bu", "ile"),
    Array("cu", "din", "este", "pentru"),
    Array("yang", "dan", "untuk", "ini"))
  private val StopwordLangs: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    for (li <- LatinProfiles.indices; w <- LatinProfiles(li)) {
      val prev = m.get(w)
      m.put(w, if (prev == null) Array(li) else prev :+ li)
    }
    m
  }
  private[pipeline] val ScriptNames: Array[String] = Array(
    "latin", "han", "hiragana", "katakana", "hangul", "cyrillic", "arabic",
    "devanagari", "greek", "hebrew", "thai")
  private val ScriptLangs: Array[String] = Array(
    /* latin: profiles */ null, "zh", "ja", "ja", "ko", "ru", "ar", "hi",
    "el", "he", "th")

  @inline private def scriptOf(cp: Int): Int = {
    // Latin letters: ASCII + Latin-1 letters (× U+00D7 / ÷ U+00F7 excluded)
    // + Extended-A/B — the `[A-Za-zÀ-ÖØ-öø-ÿĀ-ɏ]` class of the oracle
    if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
      (cp >= 0xC0 && cp <= 0x24F && cp != 0xD7 && cp != 0xF7)) 0
    else if (cp >= 0x4E00 && cp <= 0x9FFF) 1
    else if (cp >= 0x3040 && cp <= 0x309F) 2
    else if (cp >= 0x30A0 && cp <= 0x30FF) 3
    else if (cp >= 0xAC00 && cp <= 0xD7A3) 4
    else if (cp >= 0x400 && cp <= 0x4FF) 5
    else if (cp >= 0x600 && cp <= 0x6FF) 6
    else if (cp >= 0x900 && cp <= 0x97F) 7
    else if (cp >= 0x370 && cp <= 0x3FF) 8
    else if (cp >= 0x590 && cp <= 0x5FF) 9
    else if (cp >= 0xE00 && cp <= 0xE7F) 10
    else -1
  }

  /** See [[Text.langIdFull]] for the contract this implements. One pass for
   * the script census; Latin-dominant text takes a second linear pass for
   * whole-token stopword hits (maximal `[a-z0-9_]` runs of the lowercased
   * string — the ASCII `\b` token, so profile counts equal the oracle's
   * regex counts). */
  def langIdFull(text: UTF8String): InternalRow = {
    val s = text.toString
    val counts = new Array[Int](ScriptNames.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val sc = scriptOf(cp)
      if (sc >= 0) counts(sc) += 1
      i += Character.charCount(cp)
    }
    var total = 0
    var bi = 0
    var j = 0
    while (j < counts.length) {
      total += counts(j)
      if (counts(j) > counts(bi)) bi = j // strict > = earlier wins ties
      j += 1
    }
    if (total == 0) return langIdRow("und", "none", 0.0)
    val script = ScriptNames(bi)
    if (bi != 0) {
      val kana = counts(2) + counts(3)
      val lang = if (bi == 1 && kana > 0) "ja" else ScriptLangs(bi)
      return langIdRow(lang, script, counts(bi).toDouble / total)
    }
    // Latin: whole-token stopword census over the lowercased text
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    val hits = new Array[Int](LatinLangs.length)
    var start = -1
    var k = 0
    while (k <= lower.length) {
      val isWord = k < lower.length && {
        val c = lower.charAt(k)
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'
      }
      if (isWord && start < 0) start = k
      else if (!isWord && start >= 0) {
        val langs = StopwordLangs.get(lower.substring(start, k))
        if (langs != null) { var t = 0; while (t < langs.length) { hits(langs(t)) += 1; t += 1 } }
        start = -1
      }
      k += 1
    }
    var sumH = 0
    var bh = 0
    j = 0
    while (j < hits.length) {
      sumH += hits(j)
      if (hits(j) > hits(bh)) bh = j
      j += 1
    }
    if (sumH == 0) langIdRow("und", "latin", 0.0)
    else langIdRow(LatinLangs(bh), "latin", hits(bh).toDouble / sumH)
  }

  private def langIdRow(lang: String, script: String, conf: Double): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(lang), UTF8String.fromString(script), conf))

  @inline private def remix(h: Long, c: Long): Long = {
    var z = (h ^ c) + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Each shingle is string-hashed ONCE, then permutation j applies a
   * SplitMix64 remix of (h ^ oddConst_j) — one byte-scan per shingle instead
   * of numHashes scans, standard tabulation-style minhash. */
  def minhash(arr: ArrayData, numHashes: Int): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val h = TextHash.hash64(arr.getUTF8String(i), 0L)
      var j = 0
      while (j < numHashes) {
        val c = j.toLong * 0x9e3779b97f4a7c15L + 0x632be59bd9b4e019L
        val m = remix(h, c)
        if (m < sig(j)) sig(j) = m
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  def simhash(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val h = TextHash.hash64(arr.getUTF8String(i), 0L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Gopher repetition signals — see [[Text.repetitionSignals]] for the
   * semantics contract. Returns the 13-field struct as an InternalRow. */
  def repetitionSignals(v: UTF8String): InternalRow = {
    val text = v.toString
    // duplicate-unit fractions over exact unit content (lines/paragraphs)
    def dupFracs(units: Array[String]): (Double, Double) = {
      if (units.isEmpty) return (0.0, 0.0)
      val counts = new java.util.HashMap[String, Integer]()
      units.foreach(u => counts.merge(u, 1, (a, b) => a + b))
      var dupN = 0L; var dupC = 0L; var totC = 0L
      units.foreach { u =>
        totC += u.length
        if (counts.get(u) > 1) { dupN += 1; dupC += u.length }
      }
      (dupN.toDouble / units.length, if (totC == 0L) 0.0 else dupC.toDouble / totC)
    }
    val (dlf, dlcf) = dupFracs(text.split("\n", -1))
    val (dpf, dpcf) = dupFracs(text.split("\n\n", -1))

    val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    var totalWc = 0L
    words.foreach(w => totalWc += w.length)

    def ngramCounts(n: Int): java.util.HashMap[String, Integer] = {
      val counts = new java.util.HashMap[String, Integer]()
      var i = 0
      while (i + n <= words.length) {
        val sb = new java.lang.StringBuilder(words(i))
        var j = 1
        while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
        counts.merge(sb.toString, 1, (a, b) => a + b)
        i += 1
      }
      counts
    }

    // char mass of the most frequent n-gram; ties: longer chars, then lex asc
    def topNgram(n: Int): Double = {
      if (words.length < n || totalWc == 0L) return 0.0
      var bestG: String = null; var bestC = 0; var bestL = -1
      ngramCounts(n).forEach { (g, c) =>
        val l = g.length - (n - 1)
        if (c > bestC || (c == bestC && (l > bestL ||
            (l == bestL && g.compareTo(bestG) < 0)))) {
          bestG = g; bestC = c; bestL = l
        }
      }
      bestC.toDouble * bestL / totalWc
    }

    // char mass covered by any occurrence of a >1-count n-gram (positions
    // marked once, overlapping duplicated grams don't double count)
    def dupNgram(n: Int): Double = {
      if (words.length < n || totalWc == 0L) return 0.0
      val counts = ngramCounts(n)
      val covered = new Array[Boolean](words.length)
      var i = 0
      while (i + n <= words.length) {
        val sb = new java.lang.StringBuilder(words(i))
        var j = 1
        while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
        if (counts.get(sb.toString) > 1) {
          var p = i
          while (p < i + n) { covered(p) = true; p += 1 }
        }
        i += 1
      }
      var cov = 0L
      i = 0
      while (i < words.length) { if (covered(i)) cov += words(i).length; i += 1 }
      cov.toDouble / totalWc
    }

    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      dlf, dlcf, dpf, dpcf,
      topNgram(2), topNgram(3), topNgram(4),
      dupNgram(5), dupNgram(6), dupNgram(7), dupNgram(8), dupNgram(9), dupNgram(10)))
  }

  /** Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03): k-gram rolling
   * hashes, min per sliding window, distinct sorted. */
  def winnow(v: UTF8String, k: Int, window: Int): ArrayData = {
    val s = v.toString.toLowerCase
    if (s.length < k) return new GenericArrayData(Array.empty[Long])
    val n = s.length - k + 1
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < k) { h ^= s.charAt(i + j).toLong; h *= 0x100000001b3L; j += 1 }
      hashes(i) = h
      i += 1
    }
    val picked = scala.collection.mutable.SortedSet.empty[Long]
    i = 0
    val lastWin = math.max(n - window, 0)
    while (i <= lastWin) {
      var min = Long.MaxValue
      var j = i
      val end = math.min(i + window, n)
      while (j < end) { if (hashes(j) < min) min = hashes(j); j += 1 }
      picked += min
      i += 1
    }
    new GenericArrayData(picked.toArray)
  }
}

/** Gopher quality-gate struct (see TextAlgos.gopherQuality). Codegen: one
 * static call per row — the gate used to carry an interpreted filter+rlike
 * HOF inside the fused curation tier. */
case class GopherQualityExpression(child: Expression, minWords: Int, maxWords: Int)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("word_count", IntegerType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("symbol_ratio", DoubleType, nullable = false),
    StructField("alpha_word_ratio", DoubleType, nullable = false),
    StructField("stopword_hits", IntegerType, nullable = false),
    StructField("pass", BooleanType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    TextAlgos.gopherQuality(v.asInstanceOf[UTF8String], minWords, maxWords)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.TextAlgos.gopherQuality($c, $minWords, $maxWords);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Full language id → struct(lang, script, confidence); one codegen'd
 * static call per row (see [[TextAlgos.langIdFull]]). */
case class LangIdFullExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("script", StringType, nullable = false),
    StructField("confidence", DoubleType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    TextAlgos.langIdFull(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.TextAlgos.langIdFull($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Deflate compression ratio (see [[TextAlgos.compressionRatio]]).
 * Codegen: one static call per row. */
case class CompressionRatioExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    TextAlgos.compressionRatio(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.TextAlgos.compressionRatio($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Whitespace word split, empties dropped (see TextAlgos.splitWords);
 * `cjk = true` adds ideograph-per-character tokens for unspaced scripts. */
case class SplitWordsExpression(child: Expression, lowercase: Boolean, cjk: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextAlgos.splitWords(v.asInstanceOf[UTF8String], lowercase, cjk)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.TextAlgos.splitWords($c, $lowercase, $cjk);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct word n-gram shingles (see TextAlgos.shingles). Codegen: one
 * static call per row. */
case class ShinglesExpression(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextAlgos.shingles(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.TextAlgos.shingles($c, $n);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Shingles with repeats (see TextAlgos.shinglesAll). Codegen: one call. */
case class ShinglesAllExpression(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextAlgos.shinglesAll(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.TextAlgos.shinglesAll($c, $n);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature (see TextAlgos.minhash). Codegen: one static call. */
case class MinHashExpression(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextAlgos.minhash(v.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.TextAlgos.minhash($c, $numHashes);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Unicode normalization via java.text.Normalizer. Codegen: one call. */
case class NormalizeUnicodeExpression(child: Expression, form: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextAlgos.normalizeUnicode(v.asInstanceOf[UTF8String], form)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.pipeline.TextAlgos.normalizeUnicode($c, "$form");""")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hashed-BoW unit vector (see Text.hashedBow). Codegen: one static call. */
case class HashedBowExpression(child: Expression, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextAlgos.hashedBow(v.asInstanceOf[UTF8String], dim)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.TextAlgos.hashedBow($c, $dim);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash over shingle features. Codegen: one static call. */
case class SimHashExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = TextAlgos.simhash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.TextAlgos.simhash($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Gopher repetition-signal struct (see TextAlgos.repetitionSignals).
 * Codegen: one static call per row. */
case class RepetitionSignalsExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepetitionSignalsExpression.schema
  override def nullSafeEval(v: Any): Any =
    TextAlgos.repetitionSignals(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.TextAlgos.repetitionSignals($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RepetitionSignalsExpression {
  val schema: StructType = StructType(
    (Seq("dup_line_frac", "dup_line_char_frac", "dup_para_frac", "dup_para_char_frac") ++
      (2 to 4).map(n => s"top_${n}gram_char_frac") ++
      (5 to 10).map(n => s"dup_${n}gram_char_frac"))
      .map(StructField(_, DoubleType, nullable = false)))
}

/** Winnowing document fingerprint. Codegen: one static call. */
case class WinnowFingerprintExpression(child: Expression, k: Int, window: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextAlgos.winnow(v.asInstanceOf[UTF8String], k, window)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.TextAlgos.winnow($c, $k, $window);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
