package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Dataset card generator — the human-facing audit artifact a published
 * corpus ships with (datasheets-for-datasets practice: Gebru et al. 2021;
 * the HuggingFace dataset-card convention). Assembles the engine's
 * existing BOUNDED reports into one deterministic markdown document:
 * corpus totals, per-domain composition, token-length percentiles,
 * language mix, quality/PII rates, top n-grams. Everything collected is a
 * report row set bounded by domain/language/k counts — never corpus rows
 * — so the card is as scale-safe as the reports it reads (a handful of
 * keyed aggregations over the corpus; an audit artifact, not a hot path).
 *
 * Deterministic: every table sorts by key, doubles print with fixed
 * precision — the same corpus always renders the identical card (diffable
 * across corpus versions, spec-pinned).
 */
object DataCard {

  def generate(
      df: DataFrame, textCol: Column, domainCol: Column,
      title: String = "Dataset card", topNgramsK: Int = 10,
      gopherMinWords: Int = 50): String = {
    val base = df.select(domainCol.as("graft_dom"), textCol.as("graft_t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val domains = Curation.corpusReport(
          base, col("graft_t"), col("graft_dom"), gopherMinWords)
        .collect().sortBy(_.getAs[Any]("domain").toString)
      val totDocs = domains.map(_.getAs[Long]("n_docs")).sum
      val totToks = domains.map(r => Option(r.getAs[Any]("n_tokens"))
        .map(_.asInstanceOf[Long]).getOrElse(0L)).sum
      val pcts = Curation.percentileReport(base, lit("all"),
          Text.tokenCount(col("graft_t"))).collect().headOption // p cols; None if empty
      val langs = base.select(Text.langId(col("graft_t")).as("lang"))
        .groupBy("lang").agg(count(lit(1)).as("n"))
        .collect().sortBy(r => (-r.getAs[Long]("n"), r.getAs[String]("lang")))
      val ngrams = Curation.topNgrams(base, col("graft_t"), n = 3, k = topNgramsK)
        .collect()

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

      sb.append("\n## Language mix\n\n| lang | docs |\n|---|---|\n")
      langs.foreach(r =>
        sb.append(s"| ${r.getAs[String]("lang")} | ${r.getAs[Long]("n")} |\n"))

      sb.append(s"\n## Top $topNgramsK trigrams by document frequency\n\n")
      sb.append("| ngram | docs |\n|---|---|\n")
      ngrams.foreach(r =>
        sb.append(s"| ${r.getAs[String]("ngram")} | ${r.getAs[Long]("doc_freq")} |\n"))
      sb.toString
    } finally base.unpersist()
  }
}
