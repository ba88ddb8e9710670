package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Parquet persistence for the pipeline's trainable models — train once on a
 * (sampled) corpus, score any number of later jobs without retraining, the
 * same build-once/reuse contract as [[graft.bloom.BloomModel]] and the IVF
 * index. Each model round-trips byte-exactly: scores after load are
 * bit-identical to scores before save (spec-asserted).
 */
object Models {

  // ------------------------------------------------------------- classifier

  def saveClassifier(spark: SparkSession, path: String, m: TextClassifierModel): Unit = {
    import spark.implicits._
    Seq((m.dim, m.seed, m.weights.toSeq)).toDF("dim", "seed", "weights")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadClassifier(spark: SparkSession, path: String): TextClassifierModel = {
    val r = spark.read.parquet(path).select("dim", "seed", "weights").collect().head
    TextClassifierModel(r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray)
  }

  // -------------------------------------------------------------------- bpe

  def saveBpe(spark: SparkSession, path: String, m: Bpe.BpeModel): Unit = {
    import spark.implicits._
    m.merges.zipWithIndex
      .map { case ((a, b), rank) => (rank, a, b) }.toSeq
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadBpe(spark: SparkSession, path: String): Bpe.BpeModel =
    Bpe.BpeModel(
      spark.read.parquet(path).orderBy(col("rank"))
        .select("left", "right").collect()
        .map(r => r.getString(0) -> r.getString(1)))

  // ---------------------------------------------------------------- unigram

  def saveUnigram(spark: SparkSession, path: String, m: Unigram.UnigramModel): Unit = {
    import spark.implicits._
    m.pieces.zip(m.logProbs).zipWithIndex
      .map { case ((p, lp), i) => (i, p, lp) }.toSeq
      .toDF("idx", "piece", "log_prob")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadUnigram(spark: SparkSession, path: String): Unigram.UnigramModel = {
    val rows = spark.read.parquet(path).orderBy(col("idx"))
      .select("piece", "log_prob").collect()
    Unigram.UnigramModel(
      rows.map(_.getString(0)), rows.map(_.getDouble(1)))
  }

  // --------------------------------------------------------------------- lm

  /** The LM "model" is the per-order count tables + the stats row — written
   * as parquet directories under `path`. Unlike the driver-sized models
   * above, these stay DISTRIBUTED: loading does not collect anything. The
   * model order round-trips via the presence of the `trigrams` /
   * `ngrams4` / `ngrams5` directories. */
  def saveLm(spark: SparkSession, path: String, m: Lm.LmModel): Unit = {
    m.unigrams.write.mode("overwrite").parquet(s"$path/unigrams")
    m.bigrams.write.mode("overwrite").parquet(s"$path/bigrams")
    m.stats.coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
    m.trigrams.foreach(_.write.mode("overwrite").parquet(s"$path/trigrams"))
    m.higher.zipWithIndex.foreach { case (df, i) =>
      df.write.mode("overwrite").parquet(s"$path/ngrams${i + 4}")
    }
    // re-saving a LOWER-order model over a higher-order one must not leave
    // the old model's upper tables behind — loadLm's contiguous scan would
    // otherwise stitch the fresh low-order counts to stale 4/5-gram counts
    // and score silently wrong
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stale = (if (m.trigrams.isEmpty) Seq(s"$path/trigrams") else Nil) ++
      (m.order.max(3) + 1 to 5).map(i => s"$path/ngrams$i")
    stale.foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      if (fs.exists(hp)) fs.delete(hp, true)
    }
  }

  def loadLm(spark: SparkSession, path: String): Lm.LmModel = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def existing(sub: String): Option[String] = {
      val p = s"$path/$sub"
      if (fs.exists(new org.apache.hadoop.fs.Path(p))) Some(p) else None
    }
    // higher orders load contiguously from 4 up — a gap ends the model, so
    // a partially-written save never yields a model with a missing order
    val higher = Iterator.from(4).map(i => existing(s"ngrams$i"))
      .takeWhile(_.isDefined).flatten.map(spark.read.parquet(_)).toSeq
    Lm.LmModel(
      spark.read.parquet(s"$path/unigrams"),
      spark.read.parquet(s"$path/bigrams"),
      spark.read.parquet(s"$path/stats"),
      existing("trigrams").map(spark.read.parquet(_)),
      higher)
  }

  // ------------------------------------------------------------------- dsir

  /** Persist the collected DSIR selector (llr_e6 by bucket — the inline
   * scoring form; integer micro-units round-trip exactly). */
  def saveDsir(spark: SparkSession, path: String, m: DsirArrayModel): Unit = {
    import spark.implicits._
    Seq(Tuple1(m.llrE6.toSeq)).toDF("llr_e6")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadDsir(spark: SparkSession, path: String): DsirArrayModel =
    DsirArrayModel(
      spark.read.parquet(path).select("llr_e6").collect().head
        .getSeq[Long](0).toArray)

  // --------------------------------------------------------------------- sq

  /** Persist the SQ8 quantizer params (per-dimension mins + ranges). The
   * encoded corpus itself is ordinary parquet the caller writes from
   * [[Sq.encodeDf]]. */
  def saveSq(spark: SparkSession, path: String, p: SqParams): Unit = {
    import spark.implicits._
    Seq((p.mins.toSeq, p.ranges.toSeq)).toDF("mins", "ranges")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadSq(spark: SparkSession, path: String): SqParams = {
    val r = spark.read.parquet(path).select("mins", "ranges").collect().head
    SqParams(r.getSeq[Double](0).toArray, r.getSeq[Double](1).toArray)
  }
}
