package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Row}

/**
 * Dataset card generator — the human-facing audit artifact a published
 * corpus ships with (datasheets-for-datasets practice: Gebru et al. 2021;
 * the HuggingFace dataset-card convention). Assembles the engine's
 * existing reports into one deterministic markdown document: corpus
 * totals, per-domain composition, token-length percentiles, language mix,
 * quality/PII rates, top n-grams.
 *
 * Bounded BY CONSTRUCTION, not by assumption: the composition and
 * language tables collect at most `maxDomains` / `maxLangs` rows (top-N
 * by docs via TakeOrderedAndProject — per-partition heads merged on the
 * driver, never a full sort) plus ONE distributed "(other)" rollup row
 * for everything below the cut, and corpus totals come from a single
 * aggregate row rather than summing the collected table. Keyed on raw
 * web hosts (~10^8 keys) the driver still only ever sees N+1 rows —
 * the card cannot become corpus-shaped no matter the key column.
 *
 * Deterministic: every table sorts by key, doubles print with fixed
 * precision — the same corpus always renders the identical card (diffable
 * across corpus versions, spec-pinned). The "(other)" row appears only
 * when keys actually spilled past the cap, so existing small-cardinality
 * cards render character-identically.
 */
object DataCard {

  def generate(
      df: DataFrame, textCol: Column, domainCol: Column,
      title: String = "Dataset card", topNgramsK: Int = 10,
      gopherMinWords: Int = 50, maxDomains: Int = 100,
      maxLangs: Int = 50): String = {
    require(maxDomains > 0 && maxLangs > 0,
      s"maxDomains/maxLangs must be positive, got $maxDomains/$maxLangs")
    val base = df.select(domainCol.as("graft_dom"), textCol.as("graft_t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val report = Curation.corpusReport(
          base, col("graft_t"), col("graft_dom"), gopherMinWords)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // one aggregate row for the corpus totals AND the other-rollup base:
      // never derived from the (capped) collected table
      val totalsRow = report.agg(
          coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
          coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"),
          coalesce(sum(col("pii_docs")), lit(0L)).as("pii_docs"),
          coalesce(sum(col("gopher_pass_docs")), lit(0L)).as("gopher_pass_docs"),
          coalesce(sum(col("sum_quality_e9")), lit(0L)).as("sum_quality_e9"),
          count(lit(1)).as("n_domains"))
        .collect()(0)
      val totDocs = totalsRow.getAs[Long]("n_docs")
      val totToks = totalsRow.getAs[Long]("n_tokens")
      val nDomains = totalsRow.getAs[Long]("n_domains")
      // top-N domains by mass (doc-count desc, name asc for determinism):
      // orderBy+limit plans as TakeOrderedAndProject — O(N) per partition,
      // O(N) on the driver
      val domains = report
        .orderBy(col("n_docs").desc, col("domain").asc).limit(maxDomains)
        .collect().sortBy(_.getAs[Any]("domain").toString)
      val pcts = Curation.percentileReport(base, lit("all"),
          Text.tokenCount(col("graft_t"))).collect().headOption // p cols; None if empty
      val langCounts = base.select(Text.langId(col("graft_t")).as("lang"))
        .groupBy("lang").agg(count(lit(1)).as("n"))
      val langs = langCounts
        .orderBy(col("n").desc, col("lang").asc).limit(maxLangs)
        .collect().sortBy(r => (-r.getAs[Long]("n"), r.getAs[String]("lang")))
      val ngrams = Curation.topNgrams(base, col("graft_t"), n = 3, k = topNgramsK)
        .collect()
      report.unpersist()

      def longAt(rows: Seq[Row], c: String): Long =
        rows.map(r => Option(r.getAs[Any](c)).map(_.asInstanceOf[Long]).getOrElse(0L)).sum

      val sb = new StringBuilder
      sb.append(s"# $title\n\n")
      sb.append(s"- documents: $totDocs\n")
      sb.append(s"- whitespace tokens: $totToks\n")
      sb.append(s"- token-length percentiles (p10/p50/p90/p99): " +
        pcts.map(r => Seq("p10", "p50", "p90", "p99")
          .map(c => f"${r.getAs[Double](c)}%.1f").mkString(" / "))
          .getOrElse("n/a") + "\n\n")

      sb.append("## Composition by domain\n\n")
      sb.append("| domain | docs | tokens | pii docs | gopher pass | mean quality |\n")
      sb.append("|---|---|---|---|---|---|\n")
      domains.foreach { r =>
        val n = r.getAs[Long]("n_docs")
        val q = Option(r.getAs[Any]("sum_quality_e9")).map(_.asInstanceOf[Long])
          .map(s => s / 1e9 / math.max(n, 1)).getOrElse(0.0)
        sb.append(s"| ${r.getAs[Any]("domain")} | $n | " +
          s"${Option(r.getAs[Any]("n_tokens")).getOrElse(0L)} | " +
          s"${r.getAs[Long]("pii_docs")} | ${r.getAs[Long]("gopher_pass_docs")} | " +
          f"$q%.4f |\n")
      }
      if (nDomains > domains.length) {
        // rollup of everything past the cap, from the totals row minus the
        // rows shown — exact, and computed from two bounded aggregates
        val oDocs = totDocs - longAt(domains, "n_docs")
        val oToks = totToks - longAt(domains, "n_tokens")
        val oPii = totalsRow.getAs[Long]("pii_docs") - longAt(domains, "pii_docs")
        val oGoph = totalsRow.getAs[Long]("gopher_pass_docs") -
          longAt(domains, "gopher_pass_docs")
        val oQ = (totalsRow.getAs[Long]("sum_quality_e9") -
          longAt(domains, "sum_quality_e9")) / 1e9 / math.max(oDocs, 1)
        sb.append(s"| (other: ${nDomains - domains.length} domains) | $oDocs | " +
          f"$oToks | $oPii | $oGoph | $oQ%.4f |\n")
      }

      sb.append("\n## Language mix\n\n| lang | docs |\n|---|---|\n")
      langs.foreach(r =>
        sb.append(s"| ${r.getAs[String]("lang")} | ${r.getAs[Long]("n")} |\n"))
      if (langs.length == maxLangs) {
        val shown = langs.map(_.getAs[Long]("n")).sum
        if (totDocs > shown)
          sb.append(s"| (other) | ${totDocs - shown} |\n")
      }

      sb.append(s"\n## Top $topNgramsK trigrams by document frequency\n\n")
      sb.append("| ngram | docs |\n|---|---|\n")
      ngrams.foreach(r =>
        sb.append(s"| ${r.getAs[String]("ngram")} | ${r.getAs[Long]("doc_freq")} |\n"))
      sb.toString
    } finally base.unpersist()
  }
}
