package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultiMatchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def asciiWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'

  /** Reference count: every (pattern, position) occurrence, optional
   * regex-gate boundary rule (anchor only at ASCII-word pattern edges). */
  private def brute(t: String, pats: Seq[String], wb: Boolean): Int = {
    var n = 0
    for ((p, _) <- pats.zipWithIndex; i <- 0 to t.length - p.length)
      if (t.regionMatches(i, p, 0, p.length)) {
        val ok = !wb || {
          (!asciiWord(p.head) || i == 0 || !asciiWord(t.charAt(i - 1))) &&
            (!asciiWord(p.last) || i + p.length == t.length || !asciiWord(t.charAt(i + p.length)))
        }
        if (ok) n += 1
      }
    n
  }

  test("automaton count matches brute force on random text, overlaps included") {
    val rnd = new scala.util.Random(41)
    val alphabet = "abcab "
    val pats = Seq("ab", "abc", "ca b", "bb", "a")
    val ac = MultiMatch.compile(pats)
    val acWb = MultiMatch.compile(pats, wordBoundary = true)
    for (_ <- 1 to 200) {
      val t = Seq.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(MultiMatchAlgos.count(org.apache.spark.unsafe.types.UTF8String.fromString(t), ac)
        == brute(t, pats, wb = false), s"substring mode on '$t'")
      assert(MultiMatchAlgos.count(org.apache.spark.unsafe.types.UTF8String.fromString(t), acWb)
        == brute(t, pats, wb = true), s"boundary mode on '$t'")
    }
  }

  test("overlap and nesting semantics: every end position counts") {
    def cnt(t: String, pats: Seq[String]) =
      MultiMatchAlgos.count(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), MultiMatch.compile(pats))
    assert(cnt("aaa", Seq("aa")) == 2)           // overlapping same-pattern
    assert(cnt("abcd", Seq("ab", "abc")) == 2)   // nested prefixes both count
    assert(cnt("xabcx", Seq("abc", "b")) == 2)   // interior pattern via output link
    assert(cnt("", Seq("a")) == 0)
  }

  test("acTerms returns sorted distinct matched ids") {
    val ac = MultiMatch.compile(Seq("dog", "cat", "do"))
    val out = spark.createDataset(Seq("a dog and a dog met a cat", "nothing here"))
      .toDF("t").select(MultiMatch.acTerms(col("t"), ac).as("ids"))
      .collect().map(_.getSeq[Int](0))
    assert(out(0) == Seq(0, 1, 2)) // dog(x2, once in ids), cat, do (prefix of dog)
    assert(out(1) == Seq())
  }

  test("blocklistGateAc agrees with the regex gate; counts equal without overlaps") {
    val phrases = Seq("slow", "hash  value", "Broken Pipe") // mixed case + ws runs
    val docs = Seq(
      "a slow day",                     // word match
      "slowly is not slow-ness wait slowly", // boundary blocks 'slowly'; 'slow-ness' hits
      "the hash\n\tvalue leaked twice: hash value",
      "broken pipes are not a broken pipe exactly",
      "nothing to see", "", "SLOW AND BROKEN PIPE").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val re = Curation.blocklistGate(docs, col("t"), phrases)
      .select($"id", $"n_blocklist_hits".as("h_re"), $"blocked".as("b_re"))
    val acd = Curation.blocklistGateAc(docs, col("t"), phrases)
      .select($"id", $"n_blocklist_hits".as("h_ac"), $"blocked".as("b_ac"))
    val j = re.join(acd, "id").collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      assert(r.getAs[Boolean]("b_re") == r.getAs[Boolean]("b_ac"), s"blocked drift: $r")
      // these phrases can't overlap each other → counts agree too
      assert(r.getAs[Int]("h_re") == r.getAs[Int]("h_ac"), s"count drift: $r")
    }
    // sanity on the planted rows
    val byId = j.map(r => r.getAs[Long]("id") -> r.getAs[Int]("h_ac")).toMap
    assert(byId(0L) == 1 && byId(1L) == 1 && byId(2L) == 2 && byId(3L) == 1 && byId(4L) == 0)
  }

  test("20k-phrase dictionary: compile bound, scan correct vs brute force") {
    val rnd = new scala.util.Random(7)
    val words = (0 until 4000).map(i => s"w${i}q${rnd.nextInt(100)}")
    val pats = (0 until 20000).map { _ =>
      Seq.fill(1 + rnd.nextInt(3))(words(rnd.nextInt(words.length))).mkString(" ")
    }.distinct
    val t0 = System.nanoTime()
    val ac = MultiMatch.compile(pats, wordBoundary = true)
    val compileSec = (System.nanoTime() - t0) / 1e9
    assert(compileSec < 10.0, f"20k-phrase compile took $compileSec%.1f s")
    val texts = (0 until 12).map { _ =>
      Seq.fill(100)(words(rnd.nextInt(words.length))).mkString(" ") }
    texts.foreach { t =>
      val got = MultiMatchAlgos.count(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), ac)
      assert(got == brute(t, pats, wb = true), "20k-dict count drift")
    }
  }

  test("null text, unicode edges, validation") {
    val ac = MultiMatch.compile(Seq("café", "😀 ok"))
    val out = spark.createDataset(Seq[String](null, "au cafés", "😀 ok!"))
      .toDF("t").select(MultiMatch.acCount(col("t"), ac).as("n")).collect()
    assert(out(0).isNullAt(0))
    // 'café' edge is non-ASCII → substring fallback: matches inside 'cafés'
    assert(out(1).getInt(0) == 1)
    assert(out(2).getInt(0) == 1) // astral lead edge: substring semantics
    intercept[IllegalArgumentException](MultiMatch.compile(Seq.empty))
    intercept[IllegalArgumentException](MultiMatch.compile(Seq("a", "")))
    intercept[IllegalArgumentException](Curation.blocklistGateAc(
      spark.range(1).toDF, col("id").cast("string"), Seq("  ")))
  }

  test("acRedact: merged spans, parity with sequential replace on disjoint dicts") {
    def red(t: String, pats: Seq[String], rep: String = "#",
        wb: Boolean = false): String =
      MultiMatchAlgos.redact(
        org.apache.spark.unsafe.types.UTF8String.fromString(t),
        MultiMatch.compile(pats, wordBoundary = wb),
        org.apache.spark.unsafe.types.UTF8String.fromString(rep)).toString
    // disjoint patterns == sequential String.replace
    val t = "the slow pipe broke a hash value near the slow end"
    assert(red(t, Seq("slow", "hash value")) ==
      t.replace("slow", "#").replace("hash value", "#"))
    // overlapping matches merge into ONE span
    assert(red("abcd", Seq("abc", "bcd")) == "#")
    assert(red("aaa", Seq("aa")) == "#")          // self-overlap chains
    assert(red("xabcx", Seq("abc", "b")) == "x#x") // nested inside longer
    // adjacent non-overlapping spans redact separately
    assert(red("abab", Seq("ab")) == "##")
    // boundary mode: 'slowly' survives, whole word goes
    assert(red("slow slowly", Seq("slow"), wb = true) == "# slowly")
    // no match → input unchanged (same instance semantics fine)
    assert(red("untouched", Seq("zz")) == "untouched")
    // replacement longer than match; empty replacement deletes
    assert(red("ab", Seq("ab"), rep = "[gone]") == "[gone]")
    assert(red("a b", Seq("b"), rep = "") == "a ")
  }

  test("the gate fuses into ONE codegen stage over the scan") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val df = Curation.blocklistGateAc(
      spark.range(100).select(concat(lit("row text "), col("id")).as("text")),
      col("text"), Seq("row text"))
      .where(!col("blocked"))
    val plan = df.queryExecution.executedPlan
    val wscs = plan.collect { case w: WholeStageCodegenExec => w }
    assert(wscs.nonEmpty, "no codegen stage at all")
    assert(wscs.length == 1,
      s"gate split into ${wscs.length} codegen stages:\n$plan")
  }

  test("codegen: evaluates with fallback disabled") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val ac = MultiMatch.compile(Seq("alpha", "beta gamma"), wordBoundary = true)
      val df = spark.createDataset(Seq("alpha beta gamma", "alphabet"))
        .toDF("t")
        .select(MultiMatch.acCount(col("t"), ac).as("n"),
          MultiMatch.acTerms(col("t"), ac).as("ids"),
          MultiMatch.acRedact(col("t"), ac, "▮").as("red"))
      val rows = df.collect()
      assert(rows(0).getInt(0) == 2 && rows(0).getSeq[Int](1) == Seq(0, 1))
      assert(rows(0).getString(2) == "▮ ▮")
      assert(rows(1).getInt(0) == 0) // boundary blocks 'alphabet'
      assert(rows(1).getString(2) == "alphabet")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }
}
