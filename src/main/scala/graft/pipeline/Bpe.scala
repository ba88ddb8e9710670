package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Learned byte-pair-encoding tokenizer — exact subword token counts instead
 * of the chars/4 and pre-tokenizer ESTIMATES the rest of the text surface
 * uses. Classic BPE (Sennrich et al. 2016): training operates on the
 * word-FREQUENCY table, not the corpus — the distributed work is one word
 * count aggregate (groupBy word, map-side partials); the merge loop then
 * runs driver-side over the bounded dictionary, exactly like every BPE
 * trainer. Encoding is a codegen'd expression: per word, repeatedly merge
 * the lowest-rank adjacent symbol pair — one static call per row, narrow
 * projection, no shuffle.
 *
 * Determinism: merge selection breaks count ties lexicographically on the
 * pair, so the learned merge table is a pure function of the word counts;
 * `maxVocab` HARD-bounds the driver-side dictionary (top-K by count via a
 * distributed TakeOrderedAndProject — minCount alone is not a bound on a
 * web corpus), and sampling the corpus first remains standard practice at
 * 100 TB (the frequency table converges long before full scans).
 */
object Bpe {

  /** Learned merge table in rank order. */
  case class BpeModel(merges: Array[(String, String)]) {
    @transient lazy val ranks: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + " " + b, i) }
      m
    }
  }

  private def words(text: Column): Column =
    Text.words(text, lowercase = true)

  /** Learn `numMerges` merges from the corpus word-frequency table.
   *
   * `maxVocab` makes the driver-side dictionary PROVABLY bounded: the
   * frequency table is cut to the `maxVocab` most frequent words (ties
   * broken lexicographically, so the cut — like the merges — is a pure
   * function of the counts) with a sort+limit that Spark executes as
   * TakeOrderedAndProject: per-partition top-K map-side, one K-row merge —
   * the driver never sees more than `maxVocab` rows even on a 100 TB
   * corpus whose ≥minCount vocabulary is 10⁸+. Tail words barely move
   * pair counts, so the cap is the standard trainer trade. */
  def learnMerges(
      df: DataFrame, textCol: Column,
      numMerges: Int = 200, minCount: Long = 2L,
      maxVocab: Int = 1000000): BpeModel = {
    require(numMerges > 0, "numMerges must be positive")
    require(maxVocab > 0, "maxVocab must be positive — it bounds the driver-side dictionary")
    val counts = df.select(explode(words(textCol)).as("graft_w"))
      .groupBy(col("graft_w")).agg(count(lit(1)).as("graft_c"))
      .where(col("graft_c") >= minCount)
      .orderBy(col("graft_c").desc, col("graft_w").asc)
      .limit(maxVocab)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // dict: word as symbol sequence -> count. Driver-side merge loop over
    // the bounded dictionary (the standard BPE trainer shape).
    var dict: Array[(Array[String], Long)] =
      counts.map { case (w, c) => w.map(_.toString).toArray -> c }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var m = 0
    while (m < numMerges) {
      val pairCounts = new java.util.HashMap[(String, String), Long]()
      dict.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          pairCounts.merge((syms(i), syms(i + 1)), c, (a, b) => a + b)
          i += 1
        }
      }
      if (pairCounts.isEmpty) m = numMerges
      else {
        // max count, ties -> lexicographically smallest pair: deterministic
        var best: (String, String) = null
        var bestC = 0L
        pairCounts.forEach { (p, c) =>
          if (c > bestC || (c == bestC && (best == null ||
              p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
            best = p; bestC = c
          }
        }
        merges += best
        dict = dict.map { case (syms, c) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += syms(i) + syms(i + 1); i += 2
            } else { out += syms(i); i += 1 }
          }
          out.toArray -> c
        }
        m += 1
      }
    }
    BpeModel(merges.toArray)
  }

  /** Exact BPE token count of a text column under a learned model. */
  def tokenCount(model: BpeModel, text: Column): Column =
    Bridge.column(BpeCountExpression(Bridge.expression(text), model))

  /** BPE token strings (per doc, flattened across words). */
  def tokens(model: BpeModel, text: Column): Column =
    Bridge.column(BpeTokensExpression(Bridge.expression(text), model))
}

object BpeAlgos {

  /** Greedy encode: repeatedly merge the lowest-rank adjacent pair. */
  def encodeWord(word: String, m: Bpe.BpeModel): Array[String] = {
    var syms = word.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i + 1 < syms.length) {
        val r = m.ranks.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        val merged = new Array[String](syms.length - 1)
        System.arraycopy(syms, 0, merged, 0, bestAt)
        merged(bestAt) = syms(bestAt) + syms(bestAt + 1)
        System.arraycopy(syms, bestAt + 2, merged, bestAt + 1, syms.length - bestAt - 2)
        syms = merged
        done = syms.length < 2
      }
    }
    syms
  }

  private def splitWords(v: UTF8String): Array[String] =
    v.toString.toLowerCase.split("\\s+").filter(_.nonEmpty)

  def count(v: UTF8String, m: Bpe.BpeModel): Int = {
    var n = 0
    splitWords(v).foreach(w => n += encodeWord(w, m).length)
    n
  }

  def tokens(v: UTF8String, m: Bpe.BpeModel): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    splitWords(v).foreach(w =>
      encodeWord(w, m).foreach(t => out += UTF8String.fromString(t)))
    new GenericArrayData(out.toArray[Any])
  }
}

/** Exact BPE token count. Codegen: one static call per row. */
case class BpeCountExpression(child: Expression, model: Bpe.BpeModel)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    BpeAlgos.count(v.asInstanceOf[UTF8String], model)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val mRef = ctx.addReferenceObj("graftBpe", model, "graft.pipeline.Bpe.BpeModel")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.BpeAlgos.count($c, $mRef);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** BPE token array. Codegen: one static call per row. */
case class BpeTokensExpression(child: Expression, model: Bpe.BpeModel)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    BpeAlgos.tokens(v.asInstanceOf[UTF8String], model)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val mRef = ctx.addReferenceObj("graftBpe", model, "graft.pipeline.Bpe.BpeModel")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.BpeAlgos.tokens($c, $mRef);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
