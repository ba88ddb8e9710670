package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * SFT / conversation-data curation — the post-training leg of the data
 * pipeline. Instruction-tuning corpora arrive as role-tagged message
 * lists (`array<struct<role,content>>`); before they become training
 * sequences they need structural validation (role alternation, empty
 * turns, ends-on-assistant), deterministic chat-template flattening,
 * and the assistant-turn character spans that drive loss masking (only
 * assistant tokens carry loss in standard SFT).
 *
 * The template is pinned and version-stable:
 * `<|role|>content<|end|>\n` per message, concatenated in order — a
 * neutral ChatML-like layout any tokenizer-side consumer can re-derive.
 * All three operators are one codegen'd static call per row.
 */
object Sft {

  val MessagesType: DataType = ArrayType(StructType(Seq(
    StructField("role", StringType), StructField("content", StringType))))

  /** struct(valid, n_turns, reason): a conversation is valid when it has
   * ≥ 2 turns, roles come from {system,user,assistant}, an optional
   * leading system turn is followed by strict user/assistant
   * alternation starting at user, it ends on assistant, and no content
   * is whitespace-empty. `reason` is the FIRST failing rule in check
   * order — too_short | bad_role | empty_content | order | ok. */
  def validateChat(messages: Column): Column =
    Bridge.column(ValidateChatExpression(Bridge.expression(messages)))

  /** The pinned flattening: `<|role|>content<|end|>\n` per message. */
  def flattenChat(messages: Column): Column =
    Bridge.column(FlattenChatExpression(Bridge.expression(messages)))

  /** Loss-mask spans: array<struct<turn,start,end>> — 0-based [start,end)
   * character offsets of each ASSISTANT message's content inside the
   * [[flattenChat]] output, with the message's turn index. */
  def assistantSpans(messages: Column): Column =
    Bridge.column(AssistantSpansExpression(Bridge.expression(messages)))
}

object SftAlgos {

  private val Open = "<|"
  private val Close = "|>"
  private val End = "<|end|>\n"

  private def role(r: InternalRow): String =
    if (r.isNullAt(0)) null else r.getUTF8String(0).toString
  private def content(r: InternalRow): String =
    if (r.isNullAt(1)) null else r.getUTF8String(1).toString

  def validateChat(msgs: ArrayData): InternalRow = {
    val n = msgs.numElements()
    var reason: String = null
    if (n < 2) reason = "too_short"
    var i = 0
    while (reason == null && i < n) {
      val m = msgs.getStruct(i, 2)
      val r = role(m)
      if (r != "system" && r != "user" && r != "assistant") reason = "bad_role"
      i += 1
    }
    i = 0
    while (reason == null && i < n) {
      val c = content(msgs.getStruct(i, 2))
      if (c == null || c.trim.isEmpty) reason = "empty_content"
      i += 1
    }
    if (reason == null) {
      // optional leading system, then strict user/assistant alternation
      // from user, ending on assistant
      var j = if (role(msgs.getStruct(0, 2)) == "system") 1 else 0
      var expectUser = true
      var ok = j < n // a system-only conversation is an order violation
      while (ok && j < n) {
        val r = role(msgs.getStruct(j, 2))
        ok = r == (if (expectUser) "user" else "assistant")
        expectUser = !expectUser
        j += 1
      }
      // expectUser flipped past the last turn: true means it ended on
      // assistant
      if (!ok || !expectUser) reason = "order"
    }
    new GenericInternalRow(Array[Any](
      reason == null, n,
      UTF8String.fromString(if (reason == null) "ok" else reason)))
  }

  def flattenChat(msgs: ArrayData): UTF8String = {
    val n = msgs.numElements()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < n) {
      val m = msgs.getStruct(i, 2)
      val r = role(m)
      val c = content(m)
      sb.append(Open).append(if (r == null) "" else r).append(Close)
        .append(if (c == null) "" else c).append(End)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def assistantSpans(msgs: ArrayData): ArrayData = {
    val n = msgs.numElements()
    val out = new java.util.ArrayList[Any]()
    var off = 0L
    var i = 0
    while (i < n) {
      val m = msgs.getStruct(i, 2)
      val r = role(m)
      val c = content(m)
      val rLen = if (r == null) 0 else r.codePointCount(0, r.length)
      val cLen = if (c == null) 0 else c.codePointCount(0, c.length)
      val start = off + Open.length + rLen + Close.length
      if (r == "assistant")
        out.add(new GenericInternalRow(Array[Any](i, start, start + cLen)))
      off = start + cLen + End.length
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Conversation validation (see [[SftAlgos.validateChat]]). Codegen: one
 * static call per row. */
case class ValidateChatExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("valid", BooleanType, nullable = false),
    StructField("n_turns", IntegerType, nullable = false),
    StructField("reason", StringType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    SftAlgos.validateChat(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.SftAlgos.validateChat($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Pinned chat-template flattening (see [[SftAlgos.flattenChat]]).
 * Codegen: one static call per row. */
case class FlattenChatExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    SftAlgos.flattenChat(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.SftAlgos.flattenChat($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Assistant loss-mask spans (see [[SftAlgos.assistantSpans]]). Codegen:
 * one static call per row. */
case class AssistantSpansExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("turn", IntegerType, nullable = false),
    StructField("start", LongType, nullable = false),
    StructField("end", LongType, nullable = false))), containsNull = false)
  override def nullSafeEval(v: Any): Any =
    SftAlgos.assistantSpans(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.SftAlgos.assistantSpans($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
