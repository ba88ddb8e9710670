package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unigram-language-model subword tokenizer (Kudo 2018, the SentencePiece
 * `--model_type=unigram` trainer) — the third member of the tokenization
 * tier next to learned BPE ([[Bpe]]) and the pretrained GPT-2 import
 * ([[GptBpe]]). Unlike BPE's greedy bottom-up merges, a unigram model
 * holds an explicit piece vocabulary with probabilities and segments by
 * maximum likelihood, which is what the LLaMA/T5-family tokenizers train.
 *
 * Training follows the [[Bpe]] scale contract exactly: the distributed
 * work is ONE word-frequency aggregate capped to `maxVocab` rows by a
 * TakeOrderedAndProject (driver state provably bounded at any corpus
 * size); seed-substring counting, EM and pruning then run driver-side
 * over that bounded table, the standard trainer shape. The procedure:
 *
 *  1. seed vocabulary: every substring up to `maxPieceLen` of the capped
 *     word table, scored by count x length (the SentencePiece seed
 *     heuristic), cut to `seedSize`, plus EVERY single character for
 *     guaranteed coverage;
 *  2. EM: per word, forward-backward over the segmentation lattice in log
 *     space -> expected piece counts -> re-normalized log probabilities
 *     (corpus log-likelihood is non-decreasing, spec-asserted);
 *  3. prune to `vocabSize` pieces by expected count (single characters
 *     always survive), then one final EM pass re-normalizes.
 *
 * Determinism: the word table is sorted (count desc, word asc), seed cuts
 * break ties lexicographically, piece arrays are kept in sorted order and
 * every float accumulation runs in that fixed order — the model is a pure
 * function of the word counts, hence invariant to partitioning
 * (spec-pinned), and encoding is a pure function of (model, text).
 *
 * Encoding is Viterbi per word under the piece log-probs (ties prefer the
 * longer trailing piece), with out-of-vocabulary characters taking a
 * floored unk score — one codegen'd static call per row, the model riding
 * into generated code as a reference object, narrow projection, no
 * shuffle (the [[Bpe]]/[[Dsir]] scoring shape).
 */
object Unigram {

  case class UnigramModel(pieces: Array[String], logProbs: Array[Double]) {
    require(pieces.length == logProbs.length, "pieces and logProbs must align")
    @transient lazy val table: java.util.HashMap[String, java.lang.Double] = {
      val m = new java.util.HashMap[String, java.lang.Double]()
      var i = 0
      while (i < pieces.length) { m.put(pieces(i), logProbs(i)); i += 1 }
      m
    }
    @transient lazy val maxLen: Int =
      if (pieces.isEmpty) 1 else pieces.iterator.map(_.length).max
    /** OOV single characters score well below every real piece. */
    @transient lazy val unkLogProb: Double =
      (if (logProbs.isEmpty) 0.0 else logProbs.min) - 10.0
  }

  private def words(text: Column): Column = Text.words(text, lowercase = true)

  private val NegInf = Double.NegativeInfinity

  /** Train a unigram model on the corpus word-frequency table. */
  def train(
      df: DataFrame, textCol: Column,
      vocabSize: Int = 4000, maxPieceLen: Int = 8,
      seedSize: Int = 20000, emIters: Int = 4,
      minCount: Long = 2L, maxVocab: Int = 200000): UnigramModel = {
    require(vocabSize > 0, "vocabSize must be positive")
    require(maxPieceLen >= 1, "maxPieceLen must be at least 1")
    require(seedSize >= vocabSize, "seedSize must be at least vocabSize")
    require(emIters >= 1, "emIters must be at least 1")
    val wordCounts: Array[(String, Long)] = df
      .select(explode(words(textCol)).as("graft_w"))
      .groupBy(col("graft_w")).agg(count(lit(1)).as("graft_c"))
      .where(col("graft_c") >= minCount)
      .orderBy(col("graft_c").desc, col("graft_w").asc)
      .limit(maxVocab)
      .collect().map(r => r.getString(0) -> r.getLong(1))

    // ---- seed vocabulary: substrings scored by count x length
    val seedScores = new java.util.HashMap[String, Long]()
    wordCounts.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var j = i + 1
        val lim = math.min(w.length, i + maxPieceLen)
        while (j <= lim) {
          val s = w.substring(i, j)
          seedScores.merge(s, c * s.length, (a, b) => a + b)
          j += 1
        }
        i += 1
      }
    }
    val (chars, multis) = {
      val all = new Array[(String, Long)](seedScores.size)
      var i = 0
      seedScores.forEach { (s, c) => all(i) = (s, c); i += 1 }
      // score desc, piece asc: a deterministic cut
      val sorted = all.sortBy { case (s, c) => (-c, s) }
      sorted.partition(_._1.length == 1)
    }
    var pieces: Array[String] =
      (chars.map(_._1) ++ multis.take(math.max(0, seedSize - chars.length)).map(_._1)).sorted
    if (pieces.isEmpty) return UnigramModel(Array.empty, Array.empty)
    var logProbs: Array[Double] = {
      val raw = pieces.map(p => seedScores.get(p).toDouble)
      val logTotal = math.log(raw.sum)
      raw.map(c => math.log(c) - logTotal)
    }

    def logsumexp(a: Double, b: Double): Double =
      if (a == NegInf) b else if (b == NegInf) a
      else if (a > b) a + math.log1p(math.exp(b - a))
      else b + math.log1p(math.exp(a - b))

    /** One EM pass; returns (expected counts aligned to pieces, corpus LL). */
    def emPass(ps: Array[String], lps: Array[Double]): (Array[Double], Double) = {
      val idx = new java.util.HashMap[String, Integer]()
      var i = 0
      while (i < ps.length) { idx.put(ps(i), i); i += 1 }
      val maxLen = ps.iterator.map(_.length).max
      val expected = new Array[Double](ps.length)
      var ll = 0.0
      wordCounts.foreach { case (w, c) =>
        val n = w.length
        val alpha = Array.fill(n + 1)(NegInf)
        val beta = Array.fill(n + 1)(NegInf)
        alpha(0) = 0.0
        var j = 1
        while (j <= n) {
          var i0 = math.max(0, j - maxLen)
          while (i0 < j) {
            val pi = idx.get(w.substring(i0, j))
            if (pi != null && alpha(i0) != NegInf)
              alpha(j) = logsumexp(alpha(j), alpha(i0) + lps(pi))
            i0 += 1
          }
          j += 1
        }
        beta(n) = 0.0
        var i1 = n - 1
        while (i1 >= 0) {
          var j1 = math.min(n, i1 + maxLen)
          while (j1 > i1) {
            val pi = idx.get(w.substring(i1, j1))
            if (pi != null && beta(j1) != NegInf)
              beta(i1) = logsumexp(beta(i1), lps(pi) + beta(j1))
            j1 -= 1
          }
          i1 -= 1
        }
        val z = alpha(n)
        if (z != NegInf) {
          ll += c * z
          var i2 = 0
          while (i2 < n) {
            if (alpha(i2) != NegInf) {
              var j2 = math.min(n, i2 + maxLen)
              while (j2 > i2) {
                val pi = idx.get(w.substring(i2, j2))
                if (pi != null && beta(j2) != NegInf)
                  expected(pi) += c * math.exp(alpha(i2) + lps(pi) + beta(j2) - z)
                j2 -= 1
              }
            }
            i2 += 1
          }
        }
      }
      (expected, ll)
    }

    def renormalize(expected: Array[Double]): Array[Double] = {
      // floor keeps single chars alive through zero-expectation rounds —
      // coverage must never depend on the EM trajectory
      val floored = expected.map(e => math.max(e, 1e-12))
      val logTotal = math.log(floored.sum)
      floored.map(e => math.log(e) - logTotal)
    }

    var iter = 0
    while (iter < emIters) {
      val (expected, _) = emPass(pieces, logProbs)
      logProbs = renormalize(expected)
      iter += 1
    }
    // ---- prune to vocabSize by expected count; chars always survive
    val (expectedFinal, _) = emPass(pieces, logProbs)
    val scored = pieces.zip(expectedFinal)
    val keepChars = scored.filter(_._1.length == 1)
    val keepMultis = scored.filter(_._1.length > 1)
      .sortBy { case (p, e) => (-e, p) }
      .take(math.max(0, vocabSize - keepChars.length))
    val kept = (keepChars ++ keepMultis).map(_._1).sorted
    val pieceIdx = pieces.zipWithIndex.toMap
    var prunedLps = renormalize(kept.map(p => expectedFinal(pieceIdx(p))))
    pieces = kept
    // one final pass re-balances probabilities over the pruned vocabulary
    val (finalExpected, _) = emPass(pieces, prunedLps)
    prunedLps = renormalize(finalExpected)
    UnigramModel(pieces, prunedLps)
  }

  /** Corpus log-likelihood of the capped word table under `m` — exposed for
   * the EM-monotonicity spec and trainer diagnostics. */
  private[pipeline] def likelihoodOf(
      wordCounts: Seq[(String, Long)], m: UnigramModel): Double = {
    var ll = 0.0
    wordCounts.foreach { case (w, c) =>
      ll += c * UnigramAlgos.wordLogLikelihood(w, m)
    }
    ll
  }

  /** Exact unigram token count of a text column under a trained model. */
  def tokenCount(model: UnigramModel, text: Column): Column =
    Bridge.column(UnigramCountExpression(Bridge.expression(text), model))

  /** Unigram token strings (per doc, flattened across words). */
  def tokens(model: UnigramModel, text: Column): Column =
    Bridge.column(UnigramTokensExpression(Bridge.expression(text), model))
}

object UnigramAlgos {

  private val NegInf = Double.NegativeInfinity

  /** Viterbi segmentation: max-likelihood piece sequence; OOV characters
   * take the model's floored unk score, so every word segments. Score ties
   * break toward the LONGER trailing piece (smaller back-pointer), making
   * the segmentation deterministic. */
  def encodeWord(word: String, m: Unigram.UnigramModel): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val best = Array.fill(n + 1)(NegInf)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - math.max(m.maxLen, 1))
      while (i < j) {
        val lp: java.lang.Double =
          if (j - i == 1) {
            val c = m.table.get(word.substring(i, j))
            if (c != null) c else java.lang.Double.valueOf(m.unkLogProb)
          } else m.table.get(word.substring(i, j))
        if (lp != null && best(i) != NegInf) {
          val s = best(i) + lp
          if (s > best(j) || (s == best(j) && i < back(j))) {
            best(j) = s
            back(j) = i
          }
        }
        i += 1
      }
      j += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) {
      val i = back(p)
      out += word.substring(i, p)
      p = i
    }
    out.reverseIterator.toArray
  }

  /** Forward log-likelihood of one word (used by trainer diagnostics). */
  private[pipeline] def wordLogLikelihood(word: String, m: Unigram.UnigramModel): Double = {
    val n = word.length
    val alpha = Array.fill(n + 1)(NegInf)
    alpha(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - math.max(m.maxLen, 1))
      while (i < j) {
        val lp: java.lang.Double =
          if (j - i == 1) {
            val c = m.table.get(word.substring(i, j))
            if (c != null) c else java.lang.Double.valueOf(m.unkLogProb)
          } else m.table.get(word.substring(i, j))
        if (lp != null && alpha(i) != NegInf) {
          val s = alpha(i) + lp
          alpha(j) =
            if (alpha(j) == NegInf) s
            else if (alpha(j) > s) alpha(j) + math.log1p(math.exp(s - alpha(j)))
            else s + math.log1p(math.exp(alpha(j) - s))
        }
        i += 1
      }
      j += 1
    }
    alpha(n)
  }

  private def splitWords(v: UTF8String): Array[String] =
    v.toString.toLowerCase.split("\\s+").filter(_.nonEmpty)

  def count(v: UTF8String, m: Unigram.UnigramModel): Int = {
    var n = 0
    splitWords(v).foreach(w => n += encodeWord(w, m).length)
    n
  }

  def tokens(v: UTF8String, m: Unigram.UnigramModel): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    splitWords(v).foreach(w =>
      encodeWord(w, m).foreach(t => out += UTF8String.fromString(t)))
    new GenericArrayData(out.toArray[Any])
  }
}

/** Exact unigram token count. Codegen: one static call per row. */
case class UnigramCountExpression(child: Expression, model: Unigram.UnigramModel)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    UnigramAlgos.count(v.asInstanceOf[UTF8String], model)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val mRef = ctx.addReferenceObj("graftUnigram", model, "graft.pipeline.Unigram.UnigramModel")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.UnigramAlgos.count($c, $mRef);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Unigram token array. Codegen: one static call per row. */
case class UnigramTokensExpression(child: Expression, model: Unigram.UnigramModel)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    UnigramAlgos.tokens(v.asInstanceOf[UTF8String], model)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val mRef = ctx.addReferenceObj("graftUnigram", model, "graft.pipeline.Unigram.UnigramModel")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.UnigramAlgos.tokens($c, $mRef);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
