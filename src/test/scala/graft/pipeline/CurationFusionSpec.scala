package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The whole per-row curation tier — gopher gate, repetition signals, PII,
 * token counts, lang id, classifier score — must evaluate as ONE fused
 * codegen stage over ONE scan: at 100 TB the difference between a single
 * pass and one pass per signal IS the job cost. Fallback is disabled so any
 * interpreted expression in the chain fails the spec, not just slows it. */
class CurationFusionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("all per-row curation signals fuse into one codegen stage over one scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fuse").toString
    Seq((1L, "the quick brown fox a@b.com"), (2L, "zz11 buy now"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val model = Classifier.train(
      Seq(("good text", 1.0), ("zz11 spam", 0.0)).toDF("text", "y"),
      col("text"), col("y"), dim = 128, iters = 2)
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // extractHtml chains IN FRONT of every signal — the crawl front door
      // and the gate tier must still be one generated function over one scan
      val df = spark.read.parquet(dir)
        .select(col("doc_id"),
          Text.extractHtml(
            concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>")),
            maxLinkDensity = 0.5).as("text"))
        .select(
        col("doc_id"),
        Text.gopherQuality(col("text")).getField("pass").as("gopher_pass"),
        Text.repetitionSignals(col("text")).getField("dup_5gram_char_frac").as("rep5"),
        Pii.piiDensity(col("text")).as("pii"),
        Text.bpeTokenCount(col("text")).as("toks"),
        Text.langId(col("text")).as("lang"),
        Classifier.score(model, col("text")).as("quality"))
      assert(df.collect().length == 2) // evaluates with fallback disabled
      val plan = df.queryExecution.executedPlan
      val wscs = plan.collect { case w: WholeStageCodegenExec => w }
      assert(wscs.size == 1, s"expected ONE fused codegen stage, got ${wscs.size}:\n$plan")
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.size == 1, s"expected one scan:\n$plan")
    } finally prev.foreach(spark.conf.set("spark.sql.codegen.fallback", _))
  }

  test("the chained crawl front door shuffles only (fingerprint, id) — once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_crawl").toString
    Seq((1L, "alpha body text"), (2L, "beta body text"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    // html extract → encoding repair → url canonicalize → exact URL dedup
    // → token gate: the q_curate_crawl shape
    val d = spark.read.parquet(dir)
    val html = concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>"))
    val url = concat(lit("HTTPS://Example.COM:443/p"), col("doc_id").cast("string"),
      lit("/?utm_source=x&id=1#f"))
    val front = d.select(col("doc_id"),
      Text.urlCanonicalize(url).as("url"),
      Text.fixEncoding(Text.extractHtml(html, maxLinkDensity = 0.5)).as("t"))
    val out = Dedup.exact(front, col("doc_id"), col("url"))
      .where(Text.tokenCount(col("t")) >= 1)
    assert(out.count() == 2)
    def planNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      p match {
        case a: AdaptiveSparkPlanExec => planNodes(a.executedPlan)
        case q: QueryStageExec => q +: planNodes(q.plan)
        case other => other +: other.children.flatMap(planNodes)
      }
    }
    val plan = out.queryExecution.executedPlan
    // exactly ONE shuffle exchange (the fingerprint keep-first aggregate);
    // page content (t) must not be among its output attributes
    val exchanges = planNodes(plan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size == 1, s"expected one exchange:\n$plan")
    val shuffled = exchanges.head.output.map(_.name).toSet
    assert(!shuffled.exists(n => n == "t" || n == "text"),
      s"content column must never shuffle, got $shuffled")
  }
}
