package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.unsafe.types.UTF8String

/**
 * The trained model: `weights` has `dim + 1` entries — hashed word weights
 * plus the intercept at index `dim`. A plain serializable value, safe to
 * carry into generated code as a reference object.
 */
case class TextClassifierModel(dim: Int, seed: Long, weights: Array[Double])

/**
 * fastText-style quality classifier trained INSIDE Spark: hashed
 * bag-of-words features (mean-pooled token indicators + intercept),
 * logistic regression fit by full-batch gradient descent where every
 * iteration is ONE DataFrame aggregation — explode the sparse features,
 * sum per-index gradients, collect the (dim+1)-bounded result to the
 * driver. No MLlib, no external artifact; this is the "model-based quality
 * filter" tier of a curation pipeline (GPT-3/CCNet-style) with the model
 * itself reproducible from the corpus.
 *
 * Scale: scoring is a narrow codegen'd projection (one static call per row
 * — tokenize, hash, dot, sigmoid; no shuffle). Training cost is
 * iters × one shuffle of (featureIdx, gradient) pairs keyed on the 2^b
 * feature space — map-side partial aggregation collapses each partition to
 * ≤ dim+1 rows before the wire; train on a sample at 100 TB (the standard
 * practice), score the full corpus.
 *
 * Determinism: per-doc probabilities are pure functions of the weights;
 * per-feature gradients are floored to 1e-9 fixed-point longs before the
 * sum, so gradient aggregation is exact and order-independent — training
 * is bit-reproducible under any partitioning, and so are the scores.
 */
object Classifier {

  /** Sparse hashed features as struct<idx: array<int>, v: array<double>> —
   * mean-pooled counts at hash(word) % dim, plus the constant intercept
   * feature at index `dim`. Indices ascend (TreeMap walk), so dot products
   * accumulate in a fixed order. */
  def hashedFeatures(text: Column, dim: Int = 1 << 15, seed: Long = 7L): Column =
    Bridge.column(HashedFeaturesExpression(Bridge.expression(text), dim, seed))

  /** P(label=1) for a text column under a trained model — one codegen'd
   * static call per row (tokenize → hash → dot → sigmoid), no shuffle. */
  def score(model: TextClassifierModel, text: Column): Column =
    Bridge.column(ClassifierScoreExpression(Bridge.expression(text), model))

  /**
   * Fit by full-batch GD: iters passes, each one aggregation job. labelCol
   * must be 0/1 (castable to double). lr is the step on the mean gradient.
   */
  def train(
      df: DataFrame, textCol: Column, labelCol: Column,
      dim: Int = 1 << 15, iters: Int = 30, lr: Double = 0.5,
      seed: Long = 7L): TextClassifierModel = {
    require(dim > 0 && iters > 0, "dim and iters must be positive")
    // null labels/texts can't contribute a gradient but WOULD inflate the
    // 1/n step scale — drop them up front so n matches the gradient sum
    val feats = df.select(labelCol.cast("double").as("graft_y"),
        hashedFeatures(textCol, dim, seed).as("graft_f"))
      .where(col("graft_y").isNotNull && col("graft_f").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = feats.count().toDouble
      require(n > 0, "training frame is empty")
      val weights = new Array[Double](dim + 1)
      var it = 0
      while (it < iters) {
        val model = TextClassifierModel(dim, seed, weights.clone())
        val dot = Bridge.column(SparseDotExpression(
          Bridge.expression(col("graft_f.idx")),
          Bridge.expression(col("graft_f.v")), model))
        val p = lit(1.0) / (lit(1.0) + exp(-dot))
        // (p - y)·x_j summed per feature index in 1e-9 fixed point: exact,
        // order-independent, bit-reproducible across partitionings
        val grads = feats
          .select((p - col("graft_y")).as("graft_pmy"),
            explode(arrays_zip(col("graft_f.idx").as("j"), col("graft_f.v").as("x"))).as("graft_e"))
          .select(col("graft_e.j").as("j"),
            floor(col("graft_pmy") * col("graft_e.x") * lit(1e9)).as("graft_g"))
          .groupBy(col("j")).agg(sum(col("graft_g")).as("graft_gsum"))
          .collect()
        grads.foreach { r =>
          val j = r.getInt(0)
          weights(j) -= lr * (r.getLong(1) / 1e9) / n
        }
        it += 1
      }
      TextClassifierModel(dim, seed, weights)
    } finally feats.unpersist()
  }

  /**
   * Threshold sweep for a (score ∈ [0,1], boolean label) frame — the
   * operating-point picker every quality gate needs before deployment:
   * per score bucket, the confusion counts and precision / recall / F1 at
   * the "keep everything scoring ≥ this bucket" cut, plus the bucket's own
   * positive rate (the reliability-diagram column — calibration and
   * sweep in one pass).
   *
   * Shape at scale: ONE groupBy over `buckets` keys (map-side combining),
   * then window cumulative sums over ≤ `buckets` rows — the window's
   * single partition holds the histogram, never the corpus. All ratios in
   * exact integer ppm. Buckets with no rows are absent (their operating
   * point equals the next occupied bucket's). Null scores/labels are
   * excluded up front.
   */
  def thresholdSweep(df: DataFrame, scoreCol: Column, labelCol: Column,
      buckets: Int = 100): DataFrame = {
    require(buckets >= 2 && buckets <= 100000, s"buckets must be in 2..100000, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val b = least(greatest(floor(scoreCol * buckets).cast("int"), lit(0)),
      lit(buckets - 1))
    val h = df.where(scoreCol.isNotNull && labelCol.isNotNull)
      .select(b.as("bucket"), labelCol.cast("boolean").as("graft_y"))
      .groupBy(col("bucket"))
      .agg(count(when(col("graft_y"), 1)).as("pos"),
        count(when(!col("graft_y"), 1)).as("neg"))
    val desc = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    h.select(col("bucket"), col("pos"), col("neg"),
        sum(col("pos")).over(desc).as("tp"),
        sum(col("neg")).over(desc).as("fp"),
        (sum(col("pos")).over(all) - sum(col("pos")).over(desc)).as("fn"))
      .select(col("bucket"),
        expr(s"bucket * 1000000L div $buckets").as("threshold_ppm"),
        col("pos"), col("neg"), col("tp"), col("fp"), col("fn"),
        expr("pos * 1000000L div nullif(pos + neg, 0L)").as("pos_rate_ppm"),
        expr("tp * 1000000L div nullif(tp + fp, 0L)").as("precision_ppm"),
        expr("tp * 1000000L div nullif(tp + fn, 0L)").as("recall_ppm"),
        expr("2 * tp * 1000000L div nullif(2 * tp + fp + fn, 0L)").as("f1_ppm"))
  }

  /** The lowest threshold (most recall) whose precision meets `target`
   * ppm — None when no cut qualifies. Driver-side over the ≤buckets-row
   * sweep. */
  def thresholdFor(sweep: DataFrame, targetPrecisionPpm: Long): Option[Long] =
    sweep.where(col("precision_ppm") >= targetPrecisionPpm)
      .agg(min(col("threshold_ppm"))).collect()(0) match {
      case r if r.isNullAt(0) => None
      case r => Some(r.getLong(0))
    }
}

/** Static kernels shared by eval and generated code. */
object ClassifierAlgos {

  def features(v: UTF8String, dim: Int, seed: Long): InternalRow = {
    val words = v.toString.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val counts = new java.util.TreeMap[Integer, Integer]()
    words.foreach { w =>
      val h = TextHash.hash64(UTF8String.fromString(w), seed)
      val idx = (((h % dim) + dim) % dim).toInt
      counts.merge(idx, 1, (a, b) => a + b)
    }
    val m = counts.size()
    val idx = new Array[Int](m + 1)
    val vals = new Array[Double](m + 1)
    val n = math.max(words.length, 1).toDouble
    var i = 0
    val entries = counts.entrySet().iterator()
    while (entries.hasNext) {
      val e = entries.next()
      idx(i) = e.getKey
      vals(i) = e.getValue.toDouble / n
      i += 1
    }
    idx(m) = dim
    vals(m) = 1.0
    new GenericInternalRow(Array[Any](new GenericArrayData(idx), new GenericArrayData(vals)))
  }

  def sparseDot(idx: ArrayData, v: ArrayData, m: TextClassifierModel): Double = {
    var s = 0.0
    var i = 0
    while (i < idx.numElements()) { s += m.weights(idx.getInt(i)) * v.getDouble(i); i += 1 }
    s
  }

  def score(text: UTF8String, m: TextClassifierModel): Double = {
    val f = features(text, m.dim, m.seed)
    val dot = sparseDot(f.getArray(0), f.getArray(1), m)
    1.0 / (1.0 + math.exp(-dot))
  }
}

/** struct<idx, v> hashed features. Codegen: one static call per row. */
case class HashedFeaturesExpression(child: Expression, dim: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("idx", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("v", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def nullSafeEval(v: Any): Any =
    ClassifierAlgos.features(v.asInstanceOf[UTF8String], dim, seed)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.ClassifierAlgos.features($c, $dim, ${seed}L);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** w·x over sparse (idx, v) arrays; the model rides into generated code as a
 * reference object. */
case class SparseDotExpression(
    left: Expression, right: Expression, model: TextClassifierModel)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(idx: Any, v: Any): Any =
    ClassifierAlgos.sparseDot(idx.asInstanceOf[ArrayData], v.asInstanceOf[ArrayData], model)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val mRef = ctx.addReferenceObj("graftClfModel", model, "graft.pipeline.TextClassifierModel")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.pipeline.ClassifierAlgos.sparseDot($a, $b, $mRef);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** sigmoid(w·features(text)) in one static call. */
case class ClassifierScoreExpression(child: Expression, model: TextClassifierModel)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    ClassifierAlgos.score(v.asInstanceOf[UTF8String], model)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val mRef = ctx.addReferenceObj("graftClfModel", model, "graft.pipeline.TextClassifierModel")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.ClassifierAlgos.score($c, $mRef);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
