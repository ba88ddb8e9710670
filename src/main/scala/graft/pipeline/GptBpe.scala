package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Pretrained byte-level BPE import — GPT-2's published artifact format
 * (Radford et al. 2019; the `merges.txt` + `vocab.json` pair every
 * HuggingFace-style tokenizer distributes). Where [[Bpe]] TRAINS a
 * corpus-local char-level model, this loads a real model so token budgets
 * (shard manifests, sequence packing, sampleToTokenBudget) measure the
 * actual training tokens of the model that will consume the corpus.
 *
 * Faithful to the reference algorithm, all public knowledge:
 *  1. GPT-2's pre-tokenizer regex splits text into contraction / letter-run /
 *     digit-run / punctuation-run / whitespace pre-tokens;
 *  2. each pre-token's UTF-8 bytes map through the bytes→unicode table (the
 *     reversible 256-entry printable-char embedding), so the alphabet is
 *     closed and NOTHING is ever OOV;
 *  3. merges apply greedily by rank (lowest first), exactly the trained
 *     order in merges.txt.
 *
 * Scale: the model is a driver-loaded bounded artifact (50k merges ≈ 1 MB)
 * carried into generated code as one reference object; encoding is a
 * codegen'd static call per row with a shared per-executor memo (corpus
 * word frequency is Zipfian, so the memo hit rate is extreme). No shuffle,
 * no UDF, stays inside whole-stage codegen.
 */
object GptBpe {

  /** Loaded model: merge ranks over mapped-byte symbol pairs, optional
   * token→id vocabulary. Serializable — shipped once per executor. */
  class GptBpeModel(
      val ranks: java.util.HashMap[String, Integer],
      val vocab: java.util.HashMap[String, Integer]) extends Serializable {
    /** per-executor pre-token → encoded symbols memo (Zipfian hit rate);
     * bounded so an adversarial corpus can't grow it without limit. */
    @transient lazy val memo: java.util.concurrent.ConcurrentHashMap[String, Array[String]] =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  }

  /** Read a small driver-side artifact through the Hadoop filesystem of its
   * path — local disk and object stores behave identically. */
  private def readFully(spark: SparkSession, path: String): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  /** Load a GPT-2-format model: `merges.txt` (one "<left> <right>" pair per
   * line in rank order, `#version` header and blank lines skipped) and an
   * optional `vocab.json` (token string → id) for id output. */
  def load(spark: SparkSession, mergesPath: String, vocabPath: String = null): GptBpeModel = {
    val ranks = new java.util.HashMap[String, Integer]()
    var rank = 0
    new String(readFully(spark, mergesPath), java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").foreach { line0 =>
        val line = line0.stripSuffix("\r")
        if (line.nonEmpty && !line.startsWith("#")) {
          val sp = line.indexOf(' ')
          require(sp > 0 && sp < line.length - 1, s"malformed merges line: '$line'")
          ranks.put(line, rank)
          rank += 1
        }
      }
    val vocab = new java.util.HashMap[String, Integer]()
    if (vocabPath != null) {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.readTree(readFully(spark, vocabPath))
      val it = node.fields()
      while (it.hasNext) { val e = it.next(); vocab.put(e.getKey, e.getValue.asInt) }
    }
    new GptBpeModel(ranks, vocab)
  }

  /** Exact pretrained-BPE token count per row. */
  def tokenCount(model: GptBpeModel, text: Column): Column =
    Bridge.column(GptBpeCountExpression(Bridge.expression(text), model))

  /** Token strings (mapped-byte alphabet, GPT-2 style — e.g. `Ġworld`). */
  def tokens(model: GptBpeModel, text: Column): Column =
    Bridge.column(GptBpeTokensExpression(Bridge.expression(text), model))

  /** Token ids under vocab.json; tokens outside the vocab yield -1 (cannot
   * happen with a complete published vocab — the alphabet is closed). */
  def tokenIds(model: GptBpeModel, text: Column): Column =
    Bridge.column(GptBpeIdsExpression(Bridge.expression(text), model))
}

object GptBpeAlgos {
  import GptBpe.GptBpeModel

  /** GPT-2's published pre-tokenizer pattern (contractions, space-prefixed
   * letter/digit/punctuation runs, trailing-whitespace handling). */
  private val PreTokenRe = java.util.regex.Pattern.compile(
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")

  /** The GPT-2 bytes→unicode table: the 188 printable latin-1 bytes map to
   * themselves, the rest shift into U+0100.. so every byte is a printable,
   * reversible char. Standard construction, public knowledge. */
  private val ByteToChar: Array[Char] = {
    val table = new Array[Char](256)
    val direct = (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ')).map(_.toInt).toSet
    var shifted = 0
    var b = 0
    while (b < 256) {
      if (direct(b)) table(b) = b.toChar
      else { table(b) = (256 + shifted).toChar; shifted += 1 }
      b += 1
    }
    table
  }

  private val MemoCap = 65536

  /** Encode one pre-token: UTF-8 bytes → mapped chars → greedy lowest-rank
   * merges. Memoized per executor. */
  def encodePreToken(pre: String, m: GptBpeModel): Array[String] = {
    val hit = m.memo.get(pre)
    if (hit != null) return hit
    val bytes = pre.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var syms = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) { syms(i) = String.valueOf(ByteToChar(bytes(i) & 0xff)); i += 1 }
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      i = 0
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
    if (m.memo.size < MemoCap) m.memo.put(pre, syms)
    syms
  }

  def count(v: UTF8String, m: GptBpeModel): Int = {
    val matcher = PreTokenRe.matcher(v.toString)
    var n = 0
    while (matcher.find()) n += encodePreToken(matcher.group(), m).length
    n
  }

  def tokens(v: UTF8String, m: GptBpeModel): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val matcher = PreTokenRe.matcher(v.toString)
    while (matcher.find())
      encodePreToken(matcher.group(), m).foreach(t => out += UTF8String.fromString(t))
    new GenericArrayData(out.toArray)
  }

  def tokenIds(v: UTF8String, m: GptBpeModel): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val matcher = PreTokenRe.matcher(v.toString)
    while (matcher.find())
      encodePreToken(matcher.group(), m).foreach { t =>
        val id = m.vocab.get(t)
        out += (if (id == null) -1 else id.intValue)
      }
    new GenericArrayData(out.toArray)
  }
}

/** Exact pretrained-BPE token count. Codegen: one static call per row. */
case class GptBpeCountExpression(child: Expression, model: GptBpe.GptBpeModel)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    GptBpeAlgos.count(v.asInstanceOf[UTF8String], model)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val mRef = ctx.addReferenceObj("graftGptBpe", model, "graft.pipeline.GptBpe.GptBpeModel")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.GptBpeAlgos.count($c, $mRef);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Pretrained-BPE token array. Codegen: one static call per row. */
case class GptBpeTokensExpression(child: Expression, model: GptBpe.GptBpeModel)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    GptBpeAlgos.tokens(v.asInstanceOf[UTF8String], model)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val mRef = ctx.addReferenceObj("graftGptBpe", model, "graft.pipeline.GptBpe.GptBpeModel")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.GptBpeAlgos.tokens($c, $mRef);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Pretrained-BPE token-id array (-1 outside the vocab). Codegen: one
 * static call per row. */
case class GptBpeIdsExpression(child: Expression, model: GptBpe.GptBpeModel)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    GptBpeAlgos.tokenIds(v.asInstanceOf[UTF8String], model)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val mRef = ctx.addReferenceObj("graftGptBpe", model, "graft.pipeline.GptBpe.GptBpeModel")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.GptBpeAlgos.tokenIds($c, $mRef);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
