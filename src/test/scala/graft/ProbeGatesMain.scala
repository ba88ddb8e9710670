package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCRATCH same-JVM interleaved A/B probe (r20 opt, deleted after use):
  * the composed chain's GATES stage, old shape (one left join per dedup
  * tier) vs new shape (tier flags pre-combined on the slim id frames,
  * one corpus join — BatchPipeline.gateFlags). Times the noop sink over
  * the lazy frame (guide §1.4) so both shapes pay identical output cost;
  * also asserts row-level equality of the two shapes once.
  */
object ProbeGatesMain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtension")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.get("PROBE_MPB").map(_.toInt).getOrElse(4) * 1024 * 1024)
      // reap dead shuffle files promptly: a large heap never GCs, so the
      // default 30min periodic GC lets 100x-probe shuffle files fill /tmp
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import graft.pipeline.{Pii, Text}
    val (warcDir, jsonlDir) = BatchPipeline.stagedOnce(spark, dir)
    val (warcRows, _) = graft.sources.Warc.read(spark, warcDir)
    val jsonlSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "url STRING, html STRING")
    val (jsonlRows, _) = graft.sources.Jsonl.read(spark, jsonlDir, jsonlSchema)
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
    val tBase = System.nanoTime()
    base.count()
    println(f"[probe] base staged+persisted ${(System.nanoTime() - tBase) / 1e9}%.1f s")
    val tTiers = System.nanoTime()
    val (u, t, n) = BatchPipeline.dedupTierIds(base)
    println(f"[probe] dedupTierIds ${(System.nanoTime() - tTiers) / 1e9}%.1f s")

    def gatesExprs(gated: DataFrame): DataFrame = gated
      .withColumn("lang", Text.langId(col("text")))
      .withColumn("f_tokens", col("tok") >= 20)
      .withColumn("f_lang", col("lang").isin("en", "es", "de", "fr", "zh"))
      .withColumn("f_gopher", col("lang") =!= "en" ||
        Text.gopherQuality(col("text"), minWords = 20).getField("pass"))
      .withColumn("f_pii", Pii.redactPii(col("text")) === col("text"))

    // OLD shape: one left join of the full base per tier
    def oldShape(): DataFrame = {
      def surviveFlag(ids: DataFrame, name: String)(df: DataFrame): DataFrame =
        df.join(ids.withColumn(name, lit(true)), Seq("ingest_id"), "left")
          .withColumn(name, coalesce(col(name), lit(false)))
      gatesExprs(base
        .transform(surviveFlag(u, "f_url"))
        .transform(surviveFlag(t, "f_text"))
        .transform(surviveFlag(n, "f_near")))
    }
    // CHAIN shape: tier flags pre-combined via left-join chain
    def chainShape(): DataFrame = {
      val tierFlags = u.withColumn("f_url", lit(true))
        .join(t.withColumn("f_text", lit(true)), Seq("ingest_id"), "left")
        .join(n.withColumn("f_near", lit(true)), Seq("ingest_id"), "left")
      gatesExprs(base.join(tierFlags, Seq("ingest_id"), "left")
        .withColumn("f_url", coalesce(col("f_url"), lit(false)))
        .withColumn("f_text", coalesce(col("f_text"), lit(false)))
        .withColumn("f_near", coalesce(col("f_near"), lit(false))))
    }
    // AGG shape: union + max tier depth, one slim aggregate, one corpus join
    def aggShape(): DataFrame = {
      val depth = u.select(col("ingest_id"), lit(1).as("graft_tier"))
        .unionAll(t.select(col("ingest_id"), lit(2).as("graft_tier")))
        .unionAll(n.select(col("ingest_id"), lit(3).as("graft_tier")))
        .groupBy(col("ingest_id")).agg(max(col("graft_tier")).as("graft_depth"))
      gatesExprs(base.join(depth, Seq("ingest_id"), "left")
        .withColumn("f_url", coalesce(col("graft_depth") >= 1, lit(false)))
        .withColumn("f_text", coalesce(col("graft_depth") >= 2, lit(false)))
        .withColumn("f_near", coalesce(col("graft_depth") >= 3, lit(false)))
        .drop("graft_depth"))
    }

    if (sys.env.get("PROBE_MODE").contains("pii")) {
      // pii drop-gate expression: redact-and-compare vs match-only
      def piiOld() = base.withColumn("f_pii",
        Pii.redactPii(col("text")) === col("text"))
      def piiNew() = base.withColumn("f_pii", !Pii.hasPii(col("text")))
      val d1 = piiOld().exceptAll(piiNew()).count()
      val d2 = piiNew().exceptAll(piiOld()).count()
      println(s"[probe] pii equality: $d1 / $d2")
      require(d1 == 0 && d2 == 0, "pii gate diverged!")
      val ts = scala.collection.mutable.Map[String, Vector[Double]]()
        .withDefaultValue(Vector.empty)
      for (rep <- 0 until 10) {
        val (nm, f) = if (rep % 2 == 0) ("old", piiOld _) else ("new", piiNew _)
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        ts(nm) = ts(nm) :+ (System.nanoTime() - t0) / 1e9
      }
      for (nm <- Seq("old", "new"))
        println(f"[probe] pii $nm min ${ts(nm).min}%.3f " +
          s"all ${ts(nm).map(x => f"$x%.3f").mkString(",")}")
      spark.stop(); return
    }

    if (sys.env.get("PROBE_MODE").contains("decon")) {
      import graft.pipeline.Curation
      // the chain's staged frame: gates computed, checkpointed (as runChain)
      val t0s = System.nanoTime()
      val staged = graft.pipeline.Checkpoints.stage(
        BatchPipeline.gateFlags(base, u, t, n, redact = false))
      staged.write.format("noop").mode("overwrite").save()
      println(f"[probe] staged checkpoint ${(System.nanoTime() - t0s) / 1e9}%.3f s")
      val bench = spark.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % 97 === 0).select(col("text"))
      def deconOld() = Curation.decontaminate(
        staged, col("ingest_id"), col("text"), bench, col("text"),
        n = 8, minShared = 3)
      var rep = 0
      def deconNew() = {
        rep += 1
        val nm = s"probe_decon_$rep"
        val screened = Curation.decontaminateBloom(
          staged, col("ingest_id"), col("text"), bench, col("text"),
          n = 8, minShared = 3, expectedNgrams = 4000000L, fpp = 0.001,
          bloomName = nm)
        val cand = staged.join(screened.select(col("id").as("ingest_id")),
          Seq("ingest_id"), "left_semi")
        val out = Curation.decontaminate(
          cand, col("ingest_id"), col("text"), bench, col("text"),
          n = 8, minShared = 3).localCheckpoint(true)
        graft.lookups.Lookups.unregisterBloom(nm)
        out
      }
      if (!sys.env.get("PROBE_EQ").contains("0")) {
        val a = deconOld().select(col("id"), col("shared_ngrams"))
        val b = deconNew().select(col("id"), col("shared_ngrams"))
        val d1 = a.exceptAll(b).count(); val d2 = b.exceptAll(a).count()
        println(s"[probe] decon equality: $d1 / $d2 (old rows ${a.count()})")
        require(d1 == 0 && d2 == 0, "decon two-tier diverged!")
      }
      val reps = sys.env.get("PROBE_REPS").map(_.toInt).getOrElse(10)
      val ts = scala.collection.mutable.Map[String, Vector[Double]]()
        .withDefaultValue(Vector.empty)
      for (r <- 0 until reps) {
        val (nm, f) = if (r % 2 == 0) ("old", deconOld _) else ("new", deconNew _)
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        ts(nm) = ts(nm) :+ (System.nanoTime() - t0) / 1e9
        // large-SF probes: force the ContextCleaner to reap the rep's
        // shuffle files (a big heap never GCs, so they pile up on disk)
        System.gc()
        println(f"[probe] rep $r $nm ${ts(nm).last}%.3f s")
      }
      for (nm <- Seq("old", "new"))
        println(f"[probe] decon $nm min ${ts(nm).min}%.3f " +
          s"all ${ts(nm).map(x => f"$x%.3f").mkString(",")}")
      spark.stop(); return
    }

    if (sys.env.get("PROBE_MODE").contains("plan")) {
      // SMJ-regime check: with broadcasts off, the three same-key tier
      // joins must share ONE corpus exchange + sort (partitioning and
      // ordering propagate through same-key sort-merge joins)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      for ((nm, f) <- Seq("old" -> (oldShape _), "agg" -> (aggShape _))) {
        val p = f().queryExecution.executedPlan.toString
        def c(s: String) = s.r.findAllIn(p).size
        println(s"[probe] SMJ-regime $nm: SMJ=${c("SortMergeJoin")} " +
          s"Exchange=${c("Exchange")} Sort=${c("\\(Sort ")}... full below")
        println(p)
      }
      spark.stop(); return
    }

    // equality once (column order aligned)
    val cols = oldShape().columns.toSeq
    val a = oldShape().select(cols.map(col): _*)
    for ((nm, f) <- Seq("chain" -> (chainShape _), "agg" -> (aggShape _))) {
      val b = f().select(cols.map(col): _*)
      val d1 = a.exceptAll(b).count()
      val d2 = b.exceptAll(a).count()
      println(s"[probe] equality $nm: old\\x=$d1 x\\old=$d2")
      require(d1 == 0 && d2 == 0, s"$nm shape diverged!")
    }
    // join strategies
    for ((nm, f) <- Seq("old" -> (oldShape _), "chain" -> (chainShape _),
        "agg" -> (aggShape _))) {
      val p = f().queryExecution.executedPlan.toString
      val smj = "SortMergeJoin".r.findAllIn(p).size
      val bhj = "BroadcastHashJoin".r.findAllIn(p).size
      val ex = "Exchange".r.findAllIn(p).size
      println(s"[probe] plan $nm: SMJ=$smj BHJ=$bhj Exchange=$ex")
    }

    val shapes = Vector("old" -> (oldShape _), "chain" -> (chainShape _),
      "agg" -> (aggShape _))
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (rep <- 0 until 12) {
      val (name, f) = shapes(rep % 3)
      spark.sparkContext.setJobDescription(s"gates $name rep $rep")
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      times(name) = times(name) :+ sec
      println(f"[probe] rep $rep $name $sec%.3f s")
    }
    def stats(v: Vector[Double]) =
      f"min ${v.min}%.3f med ${v.sorted.apply(v.size / 2)}%.3f all ${v.map(x => f"$x%.3f").mkString(",")}"
    shapes.foreach { case (nm, _) => println(s"[probe] $nm ${stats(times(nm))}") }
    spark.stop()
  }
}
