package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SFT conversation ops: validation rule order, template pinning,
 * loss-mask span arithmetic, SQL registration. */
class SftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def conv(turns: (String, String)*) =
    Seq(Tuple1(turns)).toDF("messages")

  private def validate(turns: (String, String)*): (Boolean, Int, String) = {
    val r = conv(turns: _*)
      .select(Sft.validateChat(col("messages")).as("v"))
      .select(col("v.valid"), col("v.n_turns"), col("v.reason")).collect().head
    (r.getBoolean(0), r.getInt(1), r.getString(2))
  }

  test("valid shapes: with and without a leading system turn") {
    assert(validate("user" -> "hi", "assistant" -> "hello") === ((true, 2, "ok")))
    assert(validate("system" -> "be kind", "user" -> "hi", "assistant" -> "ok")
      === ((true, 3, "ok")))
    assert(validate("user" -> "a", "assistant" -> "b", "user" -> "c",
      "assistant" -> "d") === ((true, 4, "ok")))
  }

  test("failure reasons fire in check order") {
    assert(validate("user" -> "only") === ((false, 1, "too_short")))
    assert(validate("user" -> "hi", "tool" -> "x") === ((false, 2, "bad_role")))
    // bad_role outranks the empty content on the same conversation
    assert(validate("user" -> "hi", "tool" -> " ") === ((false, 2, "bad_role")))
    assert(validate("user" -> "hi", "assistant" -> "  ") ===
      ((false, 2, "empty_content")))
    // ends on user
    assert(validate("user" -> "a", "assistant" -> "b", "user" -> "c") ===
      ((false, 3, "order")))
    // double user
    assert(validate("user" -> "a", "user" -> "b", "assistant" -> "c") ===
      ((false, 3, "order")))
    // system not first is an order violation (alternation starts at turn 0)
    assert(validate("user" -> "a", "system" -> "s", "assistant" -> "b") ===
      ((false, 3, "order")))
    // system-only + one user: ends on user
    assert(validate("system" -> "s", "user" -> "a") === ((false, 2, "order")))
  }

  test("flatten pins the template exactly") {
    val got = conv("system" -> "s!", "user" -> "q?", "assistant" -> "a.")
      .select(Sft.flattenChat(col("messages"))).collect().head.getString(0)
    assert(got === "<|system|>s!<|end|>\n<|user|>q?<|end|>\n<|assistant|>a.<|end|>\n")
  }

  test("assistant spans index the flattened string") {
    val df = conv("user" -> "hi", "assistant" -> "yes", "user" -> "go",
      "assistant" -> "done")
    val flat = df.select(Sft.flattenChat(col("messages"))).collect().head.getString(0)
    val spans = df.select(Sft.assistantSpans(col("messages")).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.turn"), col("e.start"), col("e.end"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(spans.length === 2)
    spans.foreach { case (_, s, e) =>
      val sub = flat.substring(s.toInt, e.toInt)
      assert(sub === "yes" || sub === "done")
    }
    assert(spans.map(_._1).toSeq === Seq(1, 3))
    // no assistant turns -> empty spans, not null
    val none = conv("user" -> "a", "user" -> "b")
      .select(Sft.assistantSpans(col("messages"))).collect().head.getSeq[Row](0)
    assert(none.isEmpty)
  }

  test("functions are SQL-callable") {
    graft.functions.Registry.registerAll(spark)
    val r = spark.sql(
      """SELECT validate_chat(m).reason AS reason, flatten_chat(m) AS f,
        |       size(assistant_spans(m)) AS ns
        |FROM (SELECT array(named_struct('role', 'user', 'content', 'q'),
        |                   named_struct('role', 'assistant', 'content', 'a')) AS m)
        |""".stripMargin).collect().head
    assert(r.getString(0) === "ok")
    assert(r.getString(1) === "<|user|>q<|end|>\n<|assistant|>a<|end|>\n")
    assert(r.getInt(2) === 1)
  }
}
