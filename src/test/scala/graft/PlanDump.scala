package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round tooling: dump `.explain("formatted")` for named
  * queries to plans/<tag>/<name>_<suffix>.txt under the same session shape
  * the bench uses, so plan claims in OPTIMIZATION notes are reproducible.
  *
  *   sbt "Test/runMain graft.PlanDump <sfDir> <outDir> <suffix> q_a,q_b"
  *
  * Queries whose construction runs eager actions (checkpointed fixpoints,
  * staged fixtures) still dump the plan of the frame they RETURN — noted
  * in the file header so a reader knows what the text covers.
  */
object PlanDump {

  /** Operator-level reconstructions for queries whose RETURNED frame is a
    * localCheckpoint scan (the checkpoint truncates the interesting plan):
    * same operator calls as the SparkEntry query minus the final
    * checkpoint, so the dumped plan is the computation the bench times. */
  def ops(sfDir: String)(implicit s: SparkSession)
      : Map[String, () => org.apache.spark.sql.DataFrame] = {
    import org.apache.spark.sql.functions._
    def docs = s.read.parquet(s"$sfDir/documents.parquet")
    def scoreSet = docs.select(col("doc_id"), concat(col("text"),
      when(col("doc_id") % 6 === 0, lit(" zzqx9 vvkk7 zzqx9")).otherwise(lit(""))).as("t"))
    Map(
      "q_lm_score" -> (() => {
        val m = graft.pipeline.Lm.train(docs, col("text"), order = 2)
        graft.pipeline.Lm.score(m, scoreSet, col("doc_id"), col("t"))
      }),
      "q_lm5_score" -> (() => {
        val m = graft.pipeline.Lm.train(docs, col("text"), order = 5)
        graft.pipeline.Lm.score(m, scoreSet, col("doc_id"), col("t"))
      }),
      "q_lm_kn" -> (() => {
        val m = graft.pipeline.Lm.train(docs, col("text"), order = 3)
        graft.pipeline.Lm.scoreKn(m, scoreSet, col("doc_id"), col("t"))
      }),
      "q_lm_mkn" -> (() => {
        val m = graft.pipeline.Lm.train(docs, col("text"), order = 3)
        graft.pipeline.Lm.scoreMkn(m, scoreSet, col("doc_id"), col("t"))
      }),
      // the composed chain's GATES stage (the q_pipeline_* queries
      // checkpoint it mid-chain, so the returned-frame plan hides it):
      // ingest the staged front door and build the lazy pre-checkpoint
      // gate frame exactly as runChain does — tier flags + langid/gopher/
      // pii over the persisted base.
      "q_pipeline_gates" -> (() => {
        val (warcDir, jsonlDir) = BatchPipeline.stagedOnce(s, sfDir)
        val (warcRows, _) = graft.sources.Warc.read(s, warcDir)
        val jsonlSchema = org.apache.spark.sql.types.StructType.fromDDL(
          "url STRING, html STRING")
        val (jsonlRows, _) = graft.sources.Jsonl.read(s, jsonlDir, jsonlSchema)
        import graft.pipeline.Text
        val raw = warcRows.select(col("url"), col("text").as("html"))
          .unionAll(jsonlRows.select(col("url"), col("html")))
        val base = raw.select(
            xxhash64(col("url")).as("ingest_id"),
            Text.urlCanonicalize(col("url")).as("url"),
            Text.fixEncoding(
              Text.extractHtml(col("html"), maxLinkDensity = 0.5)).as("text"))
          .withColumn("tok", Text.tokenCount(col("text")))
          .withColumn("domain", Text.registrableDomain(col("url")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val (u, t, nr) = BatchPipeline.dedupTierIds(base)
        BatchPipeline.gateFlags(base, u, t, nr, redact = false)
      }))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtension")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", 4 * 1024 * 1024)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    implicit val sp: SparkSession = spark
    val opMap = ops(sfDir)
    for (name <- names) {
      try {
        val df = opMap.get(name).map(_.apply())
          .getOrElse(SparkEntry.queries(name)(spark, sfDir))
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"),
          s"== $name ($suffix) sf=$sfDir cpus=$cpus ==\n" + txt)
        println(s"[plandump] $name ok")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
