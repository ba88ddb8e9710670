package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Pretrained GPT-2-format BPE import: merges.txt/vocab.json loading, the
 * byte-level alphabet closure, the pre-tokenizer contract, and exact
 * hand-computed token counts through the codegen'd column path. */
class GptBpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A hand-sized merge table whose encodings are derivable on paper:
   * "hello" collapses to one token through 4 merges, " world" to one
   * through 5 (Ġ is the mapped space byte, exactly GPT-2's convention). */
  private def fixture(): (String, String) = {
    val dir = Files.createTempDirectory("graft_gptbpe")
    val merges = dir.resolve("merges.txt")
    Files.writeString(merges,
      """#version: 0.2
        |h e
        |l l
        |he ll
        |hell o
        |Ġ w
        |o r
        |l d
        |Ġw or
        |Ġwor ld
        |""".stripMargin)
    val vocab = dir.resolve("vocab.json")
    Files.writeString(vocab, """{"hello": 31373, "Ġworld": 995, "Ġ": 220}""")
    (merges.toString, vocab.toString)
  }

  test("hello world encodes to the two trained tokens with vocab ids") {
    val (m, v) = fixture()
    val model = GptBpe.load(spark, m, v)
    val row = Seq("hello world").toDF("t")
      .select(GptBpe.tokenCount(model, col("t")).as("n"),
        GptBpe.tokens(model, col("t")).as("toks"),
        GptBpe.tokenIds(model, col("t")).as("ids"))
      .as[(Int, Seq[String], Seq[Int])].collect().head
    assert(row._1 == 2)
    assert(row._2 == Seq("hello", "Ġworld"))
    assert(row._3 == Seq(31373, 995))
  }

  test("pre-tokenizer: double space yields a standalone-space token; contractions split") {
    val (m, v) = fixture()
    val model = GptBpe.load(spark, m, v)
    val rows = Seq("hello  world", "don't").toDF("t")
      .select(col("t"), GptBpe.tokens(model, col("t")).as("toks"),
        GptBpe.tokenIds(model, col("t")).as("ids"))
      .as[(String, Seq[String], Seq[Int])].collect().map(r => r._1 -> r).toMap
    // "hello" + lone " " (→ Ġ, id 220) + " world"
    assert(rows("hello  world")._2 == Seq("hello", "Ġ", "Ġworld"))
    assert(rows("hello  world")._3 == Seq(31373, 220, 995))
    // GPT-2 splits don / 't; no merges apply so bytes stay single; every
    // token outside the fixture vocab maps to -1
    assert(rows("don't")._2 == Seq("d", "o", "n", "'", "t"))
    assert(rows("don't")._3 == Seq(-1, -1, -1, -1, -1))
  }

  test("alphabet closure: zero-merge count equals the UTF-8 byte length — nothing is OOV") {
    val dir = Files.createTempDirectory("graft_gptbpe0")
    Files.writeString(dir.resolve("merges.txt"), "#version: 0.2\n")
    val model = GptBpe.load(spark, dir.resolve("merges.txt").toString)
    val texts = Seq("café ñ", "hello world", "字 test", "a\tb\nc", "")
    val got = texts.toDF("t")
      .select(col("t"), GptBpe.tokenCount(model, col("t")).as("n"))
      .as[(String, Int)].collect().toMap
    texts.foreach { t =>
      assert(got(t) == t.getBytes("UTF-8").length, s"for '$t'")
    }
  }

  test("merge order is rank order, not greedy-longest") {
    // with ranks [l l] < [he ll], "hello" must merge ll BEFORE hell exists;
    // dropping the "l l" merge changes the path: he,l,l,o has no ll so only
    // "h e" applies and the word stays 4 symbols
    val dir = Files.createTempDirectory("graft_gptbpe_rank")
    Files.writeString(dir.resolve("merges.txt"), "h e\nhe ll\nhell o\n")
    val model = GptBpe.load(spark, dir.resolve("merges.txt").toString)
    val toks = Seq("hello").toDF("t")
      .select(GptBpe.tokens(model, col("t")).as("toks"))
      .as[Seq[String]].collect().head
    assert(toks == Seq("he", "l", "l", "o"))
  }

  test("realistic 50k-merge artifact: load bound, exact counts, memo cap, throughput") {
    // a deterministic merges.txt at REAL GPT-2 artifact size (50,000 merges,
    // ~0.5 MB): layer 1 = all 676 letter pairs ("a b" → ab), layer 2 = all
    // 17,576 3-char extensions ("ab c" → abc), layer 3 = the first 31,748
    // 4-char extensions — every merge's operands exist before it, like a
    // genuinely trained table
    val chars = ('a' to 'z').map(_.toString)
    val sb = new StringBuilder("#version: 0.2\n")
    var n = 0
    for (a <- chars; b <- chars) { sb.append(s"$a $b\n"); n += 1 }
    for (a <- chars; b <- chars; c <- chars) { sb.append(s"$a$b $c\n"); n += 1 }
    val iter = for (a <- chars.iterator; b <- chars.iterator; c <- chars.iterator; d <- chars.iterator)
      yield s"$a$b$c $d"
    while (n < 50000) { sb.append(iter.next()).append('\n'); n += 1 }
    val dir = Files.createTempDirectory("graft_gptbpe50k")
    Files.writeString(dir.resolve("merges.txt"), sb.toString)

    val t0 = System.nanoTime()
    val model = GptBpe.load(spark, dir.resolve("merges.txt").toString)
    val loadSec = (System.nanoTime() - t0) / 1e9
    assert(model.ranks.size == 50000)
    assert(loadSec < 10.0, f"50k-merge load took $loadSec%.1f s — not linear?")

    // exact counts at artifact size: every 3-char letter word with first
    // letter < second letter is one trained token — the a<b constraint makes
    // rank("a b") < rank("b c"), so greedy-by-rank merges left-first and the
    // "ab c" layer-2 merge always completes. Doc = w0 + 39 space-prefixed
    // words → 1 + 39·2 tokens (the Ġ byte never merges here and stays its
    // own token)
    val toks3 = (for (a <- chars; b <- chars; c <- chars; if a < b) yield s"$a$b$c").toIndexedSeq
    val docs = (0 until 2000).map { i =>
      (0 until 40).map(j => toks3((i * 31 + j * 7) % toks3.length)).mkString(" ")
    }.toDF("t")
    val tEnc = System.nanoTime()
    val total = docs.select(GptBpe.tokenCount(model, col("t")).as("n"))
      .agg(sum(col("n"))).as[Long].collect().head
    val encSec = (System.nanoTime() - tEnc) / 1e9
    assert(total == 2000L * (1 + 39 * 2))
    assert(encSec < 60.0, f"encoding 2000 docs took $encSec%.1f s under the 50k table")

    // the per-executor memo stays bounded under an adversarial flood of
    // distinct pre-tokens (every numbered word is unique, no merges apply)
    (0 until 70000).foreach(i => GptBpeAlgos.encodePreToken(" w" + i, model))
    assert(model.memo.size() <= 65536,
      s"memo grew past its cap: ${model.memo.size()}")
    // ...and a capped memo still encodes correctly (cap only stops caching)
    assert(GptBpeAlgos.encodePreToken("abc", model).toSeq == Seq("abc"))
  }

  test("token budgets flow through: counts are stable across the memo and reps") {
    val (m, v) = fixture()
    val model = GptBpe.load(spark, m, v)
    val df = Seq.fill(500)("hello world hello").toDF("t")
    val counts = df.select(GptBpe.tokenCount(model, col("t")).as("n"))
      .agg(sum(col("n"))).as[Long].collect().head
    // "hello world hello" = hello / Ġworld / Ġ? no — " hello" has no Ġh
    // merge: Ġ,h,e,l,l,o → "h e","l l" → Ġ,he,ll,o → "he ll" needs
    // adjacency (he,ll adjacent after Ġ) → Ġ,hell,o → "hell o" → Ġ,hello =
    // 2 tokens. Total per row: 1 + 1 + 2 = 4.
    assert(counts == 500L * 4)
  }
}
