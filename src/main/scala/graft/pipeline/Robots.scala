package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * robots.txt — the crawl-permission layer of a web-corpus stack (RFC
 * 9309, the Robots Exclusion Protocol). A compliant corpus build must be
 * able to answer "was this URL fetchable for our agent?" from the
 * robots.txt bodies the crawler archived; this module parses those bodies
 * and evaluates the REP matching rules at corpus scale.
 *
 * Scope: `user-agent` groups with `allow`/`disallow` rules, `*` and `$`
 * pattern wildcards, longest-match precedence with allow winning ties —
 * the normative core of RFC 9309. Crawl-delay (non-standard but
 * near-universal) feeds the politeness scheduler via [[parseCrawlDelays]]/
 * [[crawlDelaysDf]]; sitemap lines live in [[Sitemaps]]; fetchability
 * matching is against the URL PATH (query
 * matching is a crawler-side concern; [[Text.urlPath]] is the extractor
 * used on both sides).
 */
object Robots {

  /** One parsed rule. `pattern` is the raw REP pattern; `regex` is its
   * anchored Java-regex translation (used only when `wild` — wildcard-free
   * patterns match by plain prefix, the fast path). */
  case class RobotRule(agent: String, allow: Boolean, pattern: String,
      wild: Boolean, regex: String)

  /** Parse one robots.txt body into rules, RFC 9309 group semantics:
   * consecutive `user-agent` lines open a group that the following
   * allow/disallow rules attach to (ALL listed agents); the next
   * `user-agent` after a rule starts a fresh group. Agent names
   * lowercase; rules before any user-agent line attach to `*`; an empty
   * `disallow:` value is "allow everything" (no rule emitted, per spec);
   * `#` comments and unknown fields are ignored. Plain JVM — unit-tests
   * without a session. */
  def parse(txt: String): Seq[RobotRule] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[RobotRule]
    var agents = List("*")
    var collecting = false // inside a run of consecutive user-agent lines
    txt.split("\n").foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h < 0) raw else raw.substring(0, h)
      }
      val colonAt = noComment.indexOf(':')
      if (colonAt > 0) {
        val field = noComment.substring(0, colonAt).trim.toLowerCase(java.util.Locale.ROOT)
        val value = noComment.substring(colonAt + 1).trim
        field match {
          case "user-agent" =>
            val a = value.toLowerCase(java.util.Locale.ROOT)
            if (a.nonEmpty) {
              if (collecting) agents = agents :+ a
              else { agents = List(a); collecting = true }
            }
          case "allow" | "disallow" =>
            collecting = false
            if (value.nonEmpty) {
              val wild = value.contains('*') || value.endsWith("$")
              agents.foreach(a => out += RobotRule(a, field == "allow", value, wild,
                if (wild) patternRegex(value) else ""))
            }
          case _ => collecting = false // crawl-delay, sitemap, unknown
        }
      }
    }
    out.toSeq
  }

  /** REP pattern → anchored Java regex: literal chunks quoted, `*` → `.*`,
   * a trailing `$` anchors the end; otherwise the match is a prefix
   * (leading `^` only). */
  private[pipeline] def patternRegex(pattern: String): String = {
    val endAnchor = pattern.endsWith("$")
    val body = if (endAnchor) pattern.dropRight(1) else pattern
    val quoted = body.split("\\*", -1).map {
      case "" => ""
      case chunk => java.util.regex.Pattern.quote(chunk)
    }.mkString(".*")
    "^" + quoted + (if (endAnchor) "$" else "")
  }

  /** Parse a frame of (host, robots.txt body) → (host, agent, allow,
   * pattern, wild, regex). One robots body per host (a bounded, tiny
   * frame next to the corpus — robots.txt is capped at 500 KiB by the
   * RFC); the typed flatMap is per-host work, not per-document. */
  def parseDf(df: DataFrame, hostCol: Column, txtCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(hostCol.cast("string").as("host"), txtCol.cast("string").as("txt"))
      .as[(String, String)]
      .flatMap { case (host, txt) =>
        parse(if (txt == null) "" else txt)
          .map(r => (host, r.agent, r.allow, r.pattern, r.wild, r.regex))
      }
      .toDF("host", "agent", "allow", "pattern", "wild", "regex")
  }

  /** Crawl-delay directives of one robots.txt body: (agent, delayMs) per
   * group that declares one (fractional seconds honored, non-numeric
   * ignored). Crawl-delay is non-normative but near-universal in crawler
   * practice — it feeds [[Frontier.crawlSchedule]]'s per-host config. */
  def parseCrawlDelays(txt: String): Seq[(String, Long)] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var agents = List("*")
    var collecting = false
    txt.split("\n").foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h < 0) raw else raw.substring(0, h)
      }
      val colonAt = noComment.indexOf(':')
      if (colonAt > 0) {
        val field = noComment.substring(0, colonAt).trim.toLowerCase(java.util.Locale.ROOT)
        val value = noComment.substring(colonAt + 1).trim
        field match {
          case "user-agent" =>
            val a = value.toLowerCase(java.util.Locale.ROOT)
            if (a.nonEmpty) {
              if (collecting) agents = agents :+ a
              else { agents = List(a); collecting = true }
            }
          case "crawl-delay" =>
            collecting = false
            value.toDoubleOption.filter(d => d >= 0 && d <= 3600).foreach { d =>
              agents.foreach(a => out.getOrElseUpdate(a, (d * 1000).toLong))
            }
          case _ => collecting = false
        }
      }
    }
    out.toSeq
  }

  /** Per-host crawl delay for `agent` from raw robots bodies — exact-agent
   * group beats `*` (the [[isAllowed]] selection rule): (host, delay_ms).
   * Hosts declaring no delay are absent; join with a default downstream
   * ([[Frontier.crawlSchedule]] takes one). */
  def crawlDelaysDf(df: DataFrame, hostCol: Column, txtCol: Column,
      agent: String): DataFrame = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(hostCol.cast("string").as("host"), txtCol.cast("string").as("txt"))
      .as[(String, String)]
      .flatMap { case (host, txt) =>
        parseCrawlDelays(if (txt == null) "" else txt)
          .collect { case (a, ms) if a == agentLc || a == "*" =>
            (host, if (a == agentLc) 2 else 1, ms)
          }
      }
      .toDF("host", "graft_spec", "delay_ms")
      .withColumn("graft_best", max(col("graft_spec")).over(
        Window.partitionBy(col("host"))))
      .where(col("graft_spec") === col("graft_best"))
      .groupBy(col("host")).agg(min(col("delay_ms")).as("delay_ms"))
  }

  /** `Sitemap:` directive values of one robots.txt body, in order of
   * appearance, duplicates collapsed. Per the sitemaps.org protocol (and
   * RFC 9309 §2.3's allowance for other records) the field is
   * group-INDEPENDENT — it binds to the host, not to any user-agent
   * group — so extraction ignores grouping entirely. Field name matched
   * case-insensitively; the value keeps its case (URLs are
   * case-sensitive past the host). This is the missing first link of the
   * discovery chain robots.txt → sitemap URL → [[Sitemaps.entries]].
   *
   * COMMENT HANDLING — deliberate divergence from RFC 9309 §2.2.4 and
   * mainstream parsers (e.g. Google's open-sourced robots parser), which
   * truncate at ANY `#`: here a `#` opens a comment only at line start or
   * after whitespace, so a `#` embedded in the URL value survives. A
   * recorded URL like `https://a.com/s.xml#frag` can therefore differ
   * from what a spec-conformant crawler fetches (it would resolve
   * `https://a.com/s.xml`). Rationale: this parser records PUBLISHER
   * INTENT for curation/audit; truncating an unencoded `#` silently
   * rewrites the URL to a different address, which is worse for
   * provenance than keeping the raw value. Callers that feed a real
   * fetcher should strip the fragment themselves (fragments are never
   * sent to servers) — or pass `rfc9309Comments = true` to get the
   * spec-conformant anywhere-`#` truncation (what Google's parser and
   * [[parseDf]]'s directive handling do). */
  def parseSitemapUrls(txt: String, rfc9309Comments: Boolean = false): Seq[String] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    txt.split("\n").foreach { raw =>
      // default mode: '#' opens a comment only at line start or after
      // whitespace HERE — a '#' embedded in the URL value (fragment,
      // unencoded hash) stays part of the URL instead of silently
      // truncating it to a different address. rfc9309Comments = true
      // matches the standard anywhere-'#' convention instead.
      val noComment = if (rfc9309Comments) {
        val i = raw.indexOf('#')
        if (i < 0) raw else raw.substring(0, i)
      } else {
        var h = -1
        var i = raw.indexOf('#')
        while (i >= 0 && h < 0) {
          if (i == 0 || Character.isWhitespace(raw.charAt(i - 1))) h = i
          else i = raw.indexOf('#', i + 1)
        }
        if (h < 0) raw else raw.substring(0, h)
      }
      val colonAt = noComment.indexOf(':')
      if (colonAt > 0 &&
        noComment.substring(0, colonAt).trim
          .toLowerCase(java.util.Locale.ROOT) == "sitemap") {
        val value = noComment.substring(colonAt + 1).trim
        if (value.nonEmpty) out += value
      }
    }
    out.toSeq
  }

  /** (host, sitemap_url) rows from raw robots bodies — one row per
   * distinct `Sitemap:` directive. Same per-host typed flatMap posture as
   * [[parseDf]] (robots frames are host-sized, not corpus-sized). */
  def sitemapsDf(df: DataFrame, hostCol: Column, txtCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(hostCol.cast("string").as("host"), txtCol.cast("string").as("txt"))
      .as[(String, String)]
      .flatMap { case (host, txt) =>
        parseSitemapUrls(if (txt == null) "" else txt).map(u => (host, u))
      }
      .toDF("host", "sitemap_url")
  }

  /** The discovery chain end-to-end: robots bodies → declared sitemap
   * URLs → the FETCHED sitemap documents (urlset or sitemapindex) →
   * per-URL entries. `fetched` maps sitemap URL → body (whatever the
   * crawler archived); declared sitemaps never fetched simply yield no
   * rows — join, not gate. Output: (host, sitemap_url, loc, lastmod).
   * Plan: the robots frame is host-sized; entries() is a codegen'd
   * projection over the fetched bodies; one equi-join on sitemap_url. */
  def discoverSitemapEntries(robots: DataFrame, hostCol: Column, txtCol: Column,
      fetched: DataFrame, urlCol: Column, xmlCol: Column): DataFrame = {
    val declared = sitemapsDf(robots, hostCol, txtCol)
    val bodies = fetched.select(urlCol.cast("string").as("sitemap_url"),
      Sitemaps.entries(xmlCol).as("graft_es"))
    declared.join(bodies, Seq("sitemap_url"))
      .select(col("host"), col("sitemap_url"),
        explode(col("graft_es")).as("graft_e"))
      .select(col("host"), col("sitemap_url"),
        col("graft_e.loc").as("loc"), col("graft_e.lastmod").as("lastmod"))
  }

  /**
   * Per-URL fetchability for `agent` against a parsed rules frame
   * ([[parseDf]] output): (url, allowed). RFC 9309 evaluation —
   *  1. group selection: the host's exact-agent group when present, else
   *     its `*` group (a window over the TINY rules frame, not the URLs);
   *  2. rule matching: prefix semantics, `*`/`$` via the precompiled
   *     regex (wildcard-free rules take the codegen'd startswith path);
   *  3. precedence: longest pattern wins, allow beats disallow on ties —
   *     ONE combining max-of-struct aggregate per URL, no window over the
   *     corpus;
   *  4. no matching rule / no robots.txt for the host → allowed.
   * Plan: one broadcast-friendly join on host (rules ≪ URLs), fan-out
   * bounded by rules-per-host, then the combining aggregate.
   */
  def isAllowed(rules: DataFrame, urls: DataFrame, urlCol: Column,
      agent: String): DataFrame = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val r = rules.where(col("agent").isin(agentLc, "*"))
      .withColumn("graft_spec",
        when(col("agent") === lit(agentLc), lit(2)).otherwise(lit(1)))
    val grouped = r
      .withColumn("graft_smax", max(col("graft_spec")).over(Window.partitionBy("host")))
      .where(col("graft_spec") === col("graft_smax"))
      .select(col("host"), col("allow"), col("pattern"), col("wild"), col("regex"))
    val u = urls.select(urlCol.as("url"))
      .withColumn("host", Text.urlHost(col("url")))
      // RFC 9309 §2.2.2: a URL with no path component is evaluated as "/"
      // — without this, `Disallow: /` would never match the site root
      .withColumn("graft_path",
        when(Text.urlPath(col("url")) === lit(""), lit("/"))
          .otherwise(Text.urlPath(col("url"))))
    u.join(grouped, Seq("host"), "left")
      .withColumn("graft_match", col("pattern").isNotNull &&
        when(col("wild"), expr("graft_path rlike regex"))
          .otherwise(expr("startswith(graft_path, pattern)")))
      .groupBy(col("url"))
      .agg(max(when(col("graft_match"),
        struct(length(col("pattern")).as("l"), col("allow").cast("int").as("a"))))
        .as("graft_win"))
      .select(col("url"),
        coalesce(col("graft_win.a") === 1, lit(true)).as("allowed"))
  }
}

/**
 * sitemap.xml extraction — the discovery side of the crawl stack (where
 * robots.txt says what MAY be fetched, sitemaps say what EXISTS and when
 * it changed; recrawl scheduling joins on lastmod). Handles both urlset
 * (`<url>` entries) and sitemapindex (`<sitemap>` entries, nested
 * sitemap files) documents in one pass.
 *
 * Deliberately built from BUILT-IN regexp functions only (RE2-safe
 * patterns, `(?s)` + non-greedy): the whole extraction is a codegen'd
 * narrow projection, and the DuckDB oracle replicates it
 * pattern-for-pattern — no custom parser to diverge.
 */
object Sitemaps {

  private def xmlUnescape(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(c, "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&apos;", "'"),
      "&amp;", "&")

  /** array<struct<loc, lastmod>> of a sitemap document: one entry per
   * `<url>`/`<sitemap>` block carrying a `<loc>`; `lastmod` is "" when
   * absent; XML entities in locs decoded (&amp; et al. — sitemap URLs
   * with query strings are escaped this way per the protocol). */
  def entries(xml: Column): Column =
    filter(
      transform(
        regexp_extract_all(xml,
          lit("(?s)<url[\\s>].*?</url>|<sitemap[\\s>].*?</sitemap>"), lit(0)),
        b => struct(
          xmlUnescape(regexp_extract(b, "(?s)<loc[^>]*>\\s*(.*?)\\s*</loc>", 1)).as("loc"),
          regexp_extract(b, "(?s)<lastmod[^>]*>\\s*(.*?)\\s*</lastmod>", 1).as("lastmod"))),
      e => e.getField("loc") =!= lit(""))
}

/**
 * Crawl-frontier politeness scheduling — turning a scored URL frontier
 * into the per-host serialized fetch plan a polite crawler executes:
 * each host is fetched one URL at a time, `crawl-delay` apart, highest
 * priority first. The other half of the crawl front door: [[Robots]]
 * says what MAY be fetched, [[Sitemaps]] says what exists, this says
 * WHEN each candidate gets its slot.
 */
object Frontier {

  /**
   * Assign fetch slots: per host, URLs rank by priority (desc, url
   * tie-break) and slot `r` fires at `(r-1) × delay_ms`; hosts absent
   * from `delays` use `defaultDelayMs`. `scheduled` marks slots inside
   * the horizon — the batch a crawl tick actually issues; the rest is
   * the carried-over frontier.
   *
   * Plan: one window partitioned BY HOST (never global), one broadcast
   * join against the tiny per-host delay config. Hosts with very deep
   * frontiers rank inside one partition each — upstream per-domain caps
   * ([[Curation.capPerKey]]) are the intended guard, same as every other
   * per-host stage.
   */
  def crawlSchedule(
      frontier: DataFrame, urlCol: Column, priorityCol: Column,
      delays: DataFrame, delayHostCol: Column, delayMsCol: Column,
      defaultDelayMs: Long, horizonMs: Long): DataFrame = {
    require(defaultDelayMs > 0, s"defaultDelayMs must be positive, got $defaultDelayMs")
    require(horizonMs > 0, s"horizonMs must be positive, got $horizonMs")
    val d = delays.select(delayHostCol.as("host"), delayMsCol.cast("long").as("graft_delay"))
    val u = frontier.select(urlCol.as("url"), priorityCol.cast("double").as("graft_pri"))
      .withColumn("host", Text.urlHost(col("url")))
    val w = Window.partitionBy("host").orderBy(col("graft_pri").desc, col("url").asc)
    u.withColumn("host_rank", row_number().over(w).cast("long"))
      .join(broadcast(d), Seq("host"), "left")
      .withColumn("graft_d", coalesce(col("graft_delay"), lit(defaultDelayMs)))
      .withColumn("fetch_at_ms", (col("host_rank") - 1L) * col("graft_d"))
      .withColumn("scheduled", col("fetch_at_ms") < horizonMs)
      .select(col("url"), col("host"), col("host_rank"),
        col("fetch_at_ms"), col("scheduled"))
  }
}
