package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interpolated bigram LM: hand-computed probabilities, OOV floor,
 * perplexity ordering (fluent text scores better than gibberish). */
class LmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed transition probability") {
    // corpus: "a b", "a c" -> N=4, V=3; c(a)=2, c(b)=c(c)=1; c(a,b)=c(a,c)=1
    val corpus = Seq("a b", "a c").toDF("text")
    val model = Lm.train(corpus, col("text"))
    val out = Lm.score(model, Seq((1L, "a b")).toDF("id", "text"),
      col("id"), col("text")).collect().head
    assert(out.getLong(1) == 1) // one transition
    // P = 0.5*(1/2) + 0.5*((1+1)/(4+3)) = 0.25 + 1/7, floored to e12 units
    val expected = math.floor((0.25 + 1.0 / 7.0) * 1e12).toLong
    assert(out.getLong(2) == expected)
    assert(out.getLong(3) == 0)
  }

  test("OOV transitions fall to the smoothed unigram floor and are counted") {
    val corpus = Seq("a b", "a c").toDF("text")
    val model = Lm.train(corpus, col("text"))
    val out = Lm.score(model, Seq((1L, "a zzz")).toDF("id", "text"),
      col("id"), col("text")).collect().head
    // P = 0.5*0 + 0.5*((0+1)/(4+3)) = 1/14, floored to e12 units
    assert(out.getLong(2) == math.floor(0.5 * (1.0 / 7.0) * 1e12).toLong)
    assert(out.getLong(3) == 1)
  }

  test("docs with fewer than two words score zero, rows preserved") {
    val corpus = Seq("a b").toDF("text")
    val model = Lm.train(corpus, col("text"))
    val out = Lm.score(model, Seq((1L, "a"), (2L, "")).toDF("id", "text"),
      col("id"), col("text")).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getLong(1) == 0 && r.getLong(2) == 0 && r.getLong(3) == 0)
    }
  }

  test("PMI collocations: hand-computed value, hapax suppressed by minCount") {
    // unigrams: new=3 york=3 city=1, N=7; bigram (new,york)=3
    val corpus = Seq("new york new york", "new york city").toDF("text")
    val model = Lm.train(corpus, col("text"))
    val out = Lm.collocations(model, minCount = 2L).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getLong(2)) == (("new", "york", 3L)))
    assert(r.getDouble(3) == BigDecimal(math.log(7.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("perplexity ranks in-distribution text below shuffled gibberish") {
    val corpus = (1 to 50).map(_ => "the quick brown fox jumps over the lazy dog").toDF("text")
    val model = Lm.train(corpus, col("text"))
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "dog the over fox quick")).toDF("id", "text")
    val out = Lm.score(model, docs, col("id"), col("text"), includeLogScores = true)
      .select(col("id"), col("ppl")).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) < out(2L), s"fluent ppl ${out(1L)} should beat shuffled ${out(2L)}")
  }

  test("perplexity buckets: fluent text lands above gibberish, short docs in the tail") {
    val corpus = (1 to 50).map(_ => "the quick brown fox jumps over the lazy dog").toDF("text")
    val model = Lm.train(corpus, col("text"))
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // in-distribution
      (2L, "fox the dog brown jumps lazy the over"),       // shuffled
      (3L, "zzq9 vvk7 qqx3 wwy5 aab1 ccd2"),               // gibberish
      (4L, "hi")                                           // no transitions → tail
    ).toDF("id", "text")
    val out = Lm.perplexityBuckets(model, docs, col("id"), col("text"), nBuckets = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(1L) > out(3L), s"fluent ${out(1L)} must outrank gibberish ${out(3L)}")
    assert(out(4L) == 0)
    assert(out.values.toSet.subsetOf(Set(0, 1, 2)))
  }

  test("trigram: hand-computed recursive Jelinek-Mercer interpolation") {
    // corpus: "a b c", "a b d" -> N=6, V=4; c(a)=c(b)=2, c(c)=c(d)=1
    // bigrams: (a,b)=2, (b,c)=1, (b,d)=1; trigrams: (a,b,c)=1, (a,b,d)=1
    val corpus = Seq("a b c", "a b d").toDF("text")
    val model = Lm.train(corpus, col("text"), order = 3)
    assert(model.order == 3)
    val out = Lm.score(model, Seq((1L, "a b c")).toDF("id", "text"),
      col("id"), col("text")).collect().head
    assert(out.getLong(1) == 1) // one trigram transition
    // p3 = c(a,b,c)/c(a,b) = 1/2; p2 = c(b,c)/c(b) = 1/2; pU = (1+1)/(6+4) = 0.2
    // P = 0.5*0.5 + 0.5*(0.5*0.5 + 0.5*0.2) = 0.25 + 0.5*0.35 = 0.425
    assert(out.getLong(2) == math.floor(0.425 * 1e12).toLong)
    assert(out.getLong(3) == 0)
  }

  test("trigram: OOV target falls through both orders to the unigram floor") {
    val corpus = Seq("a b c", "a b d").toDF("text")
    val model = Lm.train(corpus, col("text"), order = 3)
    val out = Lm.score(model, Seq((1L, "a b zzz")).toDF("id", "text"),
      col("id"), col("text")).collect().head
    // p3 = 0 (no trigram), p2 = 0 (no bigram (b,zzz)), pU = (0+1)/(6+4) = 0.1
    // P = 0.5*0 + 0.5*(0.5*0 + 0.5*0.1) = 0.025
    assert(out.getLong(2) == math.floor(0.025 * 1e12).toLong)
    assert(out.getLong(3) == 1)
  }

  test("trigram: docs with fewer than three words score zero, rows preserved") {
    val corpus = Seq("a b c").toDF("text")
    val model = Lm.train(corpus, col("text"), order = 3)
    val out = Lm.score(model, Seq((1L, "a b"), (2L, "a"), (3L, "")).toDF("id", "text"),
      col("id"), col("text")).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getLong(1) == 0 && r.getLong(2) == 0 && r.getLong(3) == 0)
    }
  }

  test("trigram sharpens the fluent/gibberish separation vs the bigram model") {
    val corpus = (1 to 50).map(_ => "the quick brown fox jumps over the lazy dog").toDF("text")
    val m2 = Lm.train(corpus, col("text"))
    val m3 = Lm.train(corpus, col("text"), order = 3)
    val docs = Seq(
      (1L, "the quick brown fox jumps over"),
      (2L, "dog the over fox quick jumps")).toDF("id", "text")
    def meanP(m: Lm.LmModel) = Lm.score(m, docs, col("id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (if (r.getLong(1) == 0) 0.0 else r.getLong(2).toDouble / r.getLong(1))).toMap
    val (p2, p3) = (meanP(m2), meanP(m3))
    assert(p3(1L) > p3(2L), "trigram must rank fluent above shuffled")
    // the shuffled doc finds SOME bigram mass under m2 but almost no trigram
    // mass under m3, so the fluent/shuffled ratio must widen at order 3
    assert(p3(1L) / p3(2L) > p2(1L) / p2(2L),
      s"trigram ratio ${p3(1L) / p3(2L)} should exceed bigram ${p2(1L) / p2(2L)}")
  }

  test("perplexityBuckets and filterParagraphs run on the trigram model") {
    val corpus = (1 to 50).map(_ => "the quick brown fox jumps over the lazy dog").toDF("text")
    val model = Lm.train(corpus, col("text"), order = 3)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "zzq9 vvk7 qqx3 wwy5 aab1 ccd2"),
      (3L, "hi")).toDF("id", "text")
    val buckets = Lm.perplexityBuckets(model, docs, col("id"), col("text"), nBuckets = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(buckets(1L) > buckets(2L) && buckets(3L) == 0)
    val filtered = Lm.filterParagraphs(model,
        Seq((1L, "the quick brown fox jumps\n\nzzq9 vvk7 qqx3 wwy5\n\nover the lazy dog"))
          .toDF("id", "text"),
        col("id"), col("text"), minMeanProbE12 = 10000000000L)
      .as[(Long, String)].collect().toMap
    assert(filtered(1L) == "the quick brown fox jumps\n\nover the lazy dog")
  }

  test("order-5: hand-computed recursive interpolation through all five levels") {
    // corpus: "a b c d e", "a b c d f" → N=10, V=6
    // c(a)=c(b)=c(c)=c(d)=2, c(e)=c(f)=1
    // suffix tables for scoring "a b c d e":
    //   c5(a,b,c,d,e)=1, c4(a,b,c,d)=2, c4(b,c,d,e)=1, c3(b,c,d)=2,
    //   c3(c,d,e)=1, c2(c,d)=2, c2(d,e)=1, c1(d)=2, c1(e)=1
    val corpus = Seq("a b c d e", "a b c d f").toDF("text")
    val model = Lm.train(corpus, col("text"), order = 5)
    assert(model.order == 5)
    val out = Lm.score(model, Seq((1L, "a b c d e")).toDF("id", "text"),
      col("id"), col("text")).collect().head
    assert(out.getLong(1) == 1) // one 5-gram transition
    // p5=1/2; p4=1/2; p3=1/2; p2=1/2; pU=(1+1)/(10+6)=0.125
    // P = .5*.5 + .5*(.5*.5 + .5*(.5*.5 + .5*(.5*.5 + .5*0.125)))
    val p = 0.5 * 0.5 + 0.5 * (0.5 * 0.5 + 0.5 * (0.5 * 0.5 + 0.5 * (0.5 * 0.5 + 0.5 * 0.125)))
    assert(out.getLong(2) == math.floor(p * 1e12).toLong)
    assert(out.getLong(3) == 0)
  }

  test("order-4: OOV target falls through every order to the unigram floor") {
    val corpus = Seq("a b c d e", "a b c d f").toDF("text")
    val model = Lm.train(corpus, col("text"), order = 4)
    assert(model.order == 4)
    val out = Lm.score(model, Seq((1L, "a b c zzz")).toDF("id", "text"),
      col("id"), col("text")).collect().head
    // all n-gram numerators 0 → P = (1-λ)^3 · pU = 0.125 · (0+1)/(10+6)
    assert(out.getLong(2) == math.floor(0.125 * (1.0 / 16.0) * 1e12).toLong)
    assert(out.getLong(3) == 1)
  }

  test("order-5: docs with fewer than five words score zero, rows preserved") {
    val corpus = Seq("a b c d e").toDF("text")
    val model = Lm.train(corpus, col("text"), order = 5)
    val out = Lm.score(model, Seq((1L, "a b c d"), (2L, "a"), (3L, "")).toDF("id", "text"),
      col("id"), col("text")).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getLong(1) == 0 && r.getLong(2) == 0 && r.getLong(3) == 0)
    }
  }

  test("perplexityBuckets and filterParagraphs dispatch on the order-5 model") {
    val corpus = (1 to 50).map(_ => "the quick brown fox jumps over the lazy dog").toDF("text")
    val model = Lm.train(corpus, col("text"), order = 5)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "zzq9 vvk7 qqx3 wwy5 aab1 ccd2"),
      (3L, "hi there you")).toDF("id", "text")
    val buckets = Lm.perplexityBuckets(model, docs, col("id"), col("text"), nBuckets = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(buckets(1L) > buckets(2L) && buckets(3L) == 0)
    val filtered = Lm.filterParagraphs(model,
        Seq((1L, "the quick brown fox jumps over\n\nzzq9 vvk7 qqx3 wwy5 aab1\n\nover the lazy dog"))
          .toDF("id", "text"),
        col("id"), col("text"), minMeanProbE12 = 10000000000L)
      .as[(Long, String)].collect().toMap
    // the 3-word tail paragraph has no 5-gram transitions → kept (too short
    // to judge), the gibberish 5-gram paragraph drops
    assert(filtered(1L) == "the quick brown fox jumps over\n\nover the lazy dog")
  }

  test("paragraph filter drops gibberish paragraphs, keeps order and short units") {
    val corpus = (1 to 50).map(_ => "the quick brown fox jumps over the lazy dog").toDF("text")
    val model = Lm.train(corpus, col("text"))
    val docs = Seq(
      (1L, "the quick brown fox\n\nzzq9 vvk7 qqx3 wwy5\n\nover the lazy dog"),
      (2L, "the quick brown fox jumps"),       // single good paragraph
      (3L, "zzq9 vvk7 qqx3\n\nvvk7 zzq9 wwy5"), // all gibberish → empty
      (4L, "hi\n\nthe quick brown fox")         // 1-word para: n_trans=0, kept
    ).toDF("id", "text")
    // in-distribution transitions score ~0.5e12 (dominant bigram); the OOV
    // floor is orders of magnitude below 1e10
    val out = Lm.filterParagraphs(model, docs, col("id"), col("text"),
        minMeanProbE12 = 10000000000L)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "the quick brown fox\n\nover the lazy dog")
    assert(out(2L) == "the quick brown fox jumps")
    assert(out(3L) == "")
    assert(out(4L) == "hi\n\nthe quick brown fox")
  }

  test("Kneser-Ney order 3: hand-computed value through all three levels") {
    // corpus types: tri {(a,b,c),(a,b,d),(x,b,c)}; bi {(a,b):2,(b,c):2,(b,d):1,(x,b):1}
    // B = 4 bigram types, V = 5. Transition (a,b,c):
    //   p1 = (N1+(.c) + 1)/(B + V) = (1+1)/(4+5)
    //   p2 = max(N1+(.bc) - D,0)/N1+(.b.) + D*N1+(b.)/N1+(.b.) * p1
    //      = 1.25/3 + (0.75*2/3)*p1              (N1+(.bc)=2, den=3, nf=2)
    //   p3 = max(c(abc)-D,0)/c(ab) + D*N1+(ab.)/c(ab) * p2
    //      = 0.25/2 + (0.75*2/2)*p2
    val corpus = Seq("a b c", "a b d", "x b c").toDF("text")
    val model = Lm.train(corpus, col("text"), order = 3)
    val out = Lm.scoreKn(model, Seq((1L, "a b c")).toDF("id", "text"),
      col("id"), col("text")).collect().head
    val p1 = (1.0 + 1.0) / (4.0 + 1.0 * 5.0)
    val p2 = math.max(2.0 - 0.75, 0.0) / 3.0 + 0.75 * 2.0 / 3.0 * p1
    val p3 = math.max(1.0 - 0.75, 0.0) / 2.0 + 0.75 * 2.0 / 2.0 * p2
    assert(out.getLong(1) == 1)
    assert(out.getLong(2) == math.floor(p3 * 1e12).toLong)
    assert(out.getLong(3) == 0)
  }

  test("Kneser-Ney vs JM: continuation counts demote context-bound words (san francisco)") {
    // "francisco" is FREQUENT but only ever follows "san": raw-frequency
    // (JM) backoff overpays it after an unseen context; KN's continuation
    // count (1 distinct predecessor) ranks plain "cat" (2 predecessors)
    // above it. "cat" is always sentence-final, so (cat, w) is an unseen
    // context for both transitions and both models back off fully.
    val corpus = ((1 to 10).map(_ => "san francisco") ++
      Seq("the cat", "a cat")).toDF("text")
    val model = Lm.train(corpus, col("text"))
    val docsDf = Seq((1L, "cat francisco"), (2L, "cat cat")).toDF("id", "text")
    val kn = Lm.scoreKn(model, docsDf, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val jm = Lm.score(model, docsDf, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(jm(1L) > jm(2L), s"JM should overpay francisco: $jm")
    assert(kn(2L) > kn(1L), s"KN should prefer the 2-context word: $kn")
  }

  test("Kneser-Ney: OOV target takes the add-k continuation floor and is counted") {
    val corpus = Seq("a b", "a c").toDF("text")
    val model = Lm.train(corpus, col("text"))
    val out = Lm.scoreKn(model, Seq((1L, "a zzz")).toDF("id", "text"),
      col("id"), col("text")).collect().head
    // bi types {(a,b),(a,c)}: B=2, V=3; cc1(zzz)=0 -> p1 = 1/(2+3)
    // top: c2(a,zzz) null, c(a)=2, nf(a)=2 -> p = 0 + (0.75*2/2)*p1
    val p1 = (0.0 + 1.0) / (2.0 + 1.0 * 3.0)
    val expect = math.max(0.0 - 0.75, 0.0) / 2.0 + 0.75 * 2.0 / 2.0 * p1
    assert(out.getLong(2) == math.floor(expect * 1e12).toLong)
    assert(out.getLong(3) == 1)
  }

  test("Kneser-Ney: short docs score zero; context with no continuation backs off fully") {
    val corpus = Seq("a b c").toDF("text")
    val model = Lm.train(corpus, col("text"), order = 3)
    val out = Lm.scoreKn(model, Seq((1L, "a b"), (2L, "")).toDF("id", "text"),
      col("id"), col("text")).collect()
    assert(out.forall(r => r.getLong(1) == 0 && r.getLong(2) == 0 && r.getLong(3) == 0))
    // "c" only ends documents: context (b,c) has c(bc)>0 but no observed
    // continuation -> the top level must fall through to the middle order,
    // never zero the product
    val out2 = Lm.scoreKn(model, Seq((3L, "b c a")).toDF("id", "text"),
      col("id"), col("text")).collect().head
    assert(out2.getLong(2) > 0L)
  }

  test("knDiscount: Ney-Essen-Kneser estimate from count-of-counts") {
    // bigram types: (a,b) c=2, (a,c) c=1 -> n1=1, n2=1 -> D = 1/(1+2)
    val corpus = Seq("a b", "a b", "a c").toDF("text")
    val model = Lm.train(corpus, col("text"))
    assert(math.abs(Lm.knDiscount(model, 2) - 1.0 / 3.0) < 1e-12)
  }

  test("mknDiscounts: hand-computed D1/D2/D3+ from count-of-counts") {
    // trigram types with counts 1,2,3,4 (one each): n1=n2=n3=n4=1,
    // Y = 1/3, D1 = 1-2/3 = 1/3, D2 = 2-1 = 1, D3+ = 3-4/3 = 5/3
    val corpus = (Seq("a b c") ++ Seq.fill(2)("d e f") ++
      Seq.fill(3)("g h i") ++ Seq.fill(4)("j k l")).toDF("text")
    val model = Lm.train(corpus, col("text"), order = 3)
    val (d1, d2, d3) = Lm.mknDiscounts(model, 3)
    assert(math.abs(d1 - 1.0 / 3.0) < 1e-12)
    assert(math.abs(d2 - 1.0) < 1e-12)
    assert(math.abs(d3 - 5.0 / 3.0) < 1e-12)
  }

  test("modified KN equals single-discount KN when count-of-counts degenerate") {
    // all trigram counts AND all continuation counts have empty n2+ buckets
    // -> every order falls back to the flat 0.75 triple, and the modified
    // backoff mass (0.75*N1 + 0.75*N2 + 0.75*N3+) collapses to 0.75*N1+ —
    // bit-for-bit the single-discount scorer (incl. the planted OOV row)
    val corpus = Seq("a b c", "a b d", "x b c").toDF("text")
    val model = Lm.train(corpus, col("text"), order = 3)
    val docsDf = Seq((1L, "a b c"), (2L, "x b d"), (3L, "a b zzz"), (4L, ""))
      .toDF("id", "text")
    val kn = Lm.scoreKn(model, docsDf, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val mkn = Lm.scoreMkn(model, docsDf, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(mkn === kn)
  }

  test("modified KN generalizes across orders: degenerate equality at 2 and 4") {
    // all-singleton corpora degenerate the count-of-counts at EVERY order
    // -> flat 0.75 fallback -> scoreMkn must equal scoreKn bit-for-bit at
    // order 2 (no middle orders) and order 4 (two middle orders)
    val c2 = Seq("a b", "c d", "e f").toDF("text")
    val m2 = Lm.train(c2, col("text"), order = 2)
    val d2 = Seq((1L, "a b"), (2L, "a zzz")).toDF("id", "text")
    assert(Lm.scoreMkn(m2, d2, col("id"), col("text")).collect().map(_.toSeq).toSeq ===
      Lm.scoreKn(m2, d2, col("id"), col("text")).collect().map(_.toSeq).toSeq)
    val c4 = Seq("a b c d", "p q r s", "w x y z").toDF("text")
    val m4 = Lm.train(c4, col("text"), order = 4)
    val d4 = Seq((1L, "a b c d"), (2L, "a b c zzz"), (3L, "a b")).toDF("id", "text")
    assert(Lm.scoreMkn(m4, d4, col("id"), col("text")).collect().map(_.toSeq).toSeq ===
      Lm.scoreKn(m4, d4, col("id"), col("text")).collect().map(_.toSeq).toSeq)
  }

  test("modified KN separates from single-discount where count buckets differ") {
    // rich corpus with DECAYING count-of-counts at both orders (real
    // corpora decay roughly geometrically; a singleton-flooded one drives
    // D2/D3+ negative and clamps them to 0):
    //   trigram counts: n1=18, n2=4, n3=2, n4=1
    //   continuation counts (distinct predecessors per (w2,w3)):
    //   n1=7, n2=4, n3=2, n4=1
    val corpus = (Seq(
      "p1 s1 t1", "p2 s1 t1", "p3 s2 t2", "p4 s2 t2",
      "p5 s3 t3", "p6 s3 t3", "p7 s4 t4", "p8 s4 t4",
      "q1 u1 v1", "q2 u1 v1", "q3 u1 v1",
      "q4 u2 v2", "q5 u2 v2", "q6 u2 v2",
      "r1 u3 v3", "r2 u3 v3", "r3 u3 v3", "r4 u3 v3") ++
      Seq.fill(2)("m1 n1 o1") ++ Seq.fill(2)("m2 n2 o2") ++
      Seq.fill(2)("m3 n3 o3") ++ Seq.fill(2)("m4 n4 o4") ++
      Seq.fill(3)("w1 x1 y1") ++ Seq.fill(3)("w2 x2 y2") ++
      Seq.fill(4)("z1 z2 z3")).toDF("text")
    val model = Lm.train(corpus, col("text"), order = 3)
    val (d1, d2, d3) = Lm.mknDiscounts(model, 3)
    val y3 = 18.0 / (18.0 + 2.0 * 4.0)
    assert(math.abs(d1 - (1.0 - 2.0 * y3 * (4.0 / 18.0))) < 1e-12)
    assert(math.abs(d2 - (2.0 - 3.0 * y3 * (2.0 / 4.0))) < 1e-12)
    assert(math.abs(d3 - (3.0 - 4.0 * y3 * (1.0 / 2.0))) < 1e-12)
    assert(d1 != d2 && d2 != d3, s"expected distinct discounts, got ($d1,$d2,$d3)")
    val (e1, e2, e3) = Lm.mknDiscounts(model, 2)
    val y2 = 7.0 / (7.0 + 2.0 * 4.0)
    assert(math.abs(e1 - (1.0 - 2.0 * y2 * (4.0 / 7.0))) < 1e-12)
    assert(math.abs(e2 - (2.0 - 3.0 * y2 * (2.0 / 4.0))) < 1e-12)
    assert(math.abs(e3 - (3.0 - 4.0 * y2 * (1.0 / 2.0))) < 1e-12)
    assert(e1 != e2 && e2 != e3, s"expected distinct discounts, got ($e1,$e2,$e3)")
    // doc whose top-order count is 2 pays D2 != 0.75 -> scores diverge
    val docsDf = Seq((1L, "m1 n1 o1")).toDF("id", "text")
    val kn = Lm.scoreKn(model, docsDf, col("id"), col("text")).collect().head
    val mkn = Lm.scoreMkn(model, docsDf, col("id"), col("text")).collect().head
    assert(mkn.getLong(2) != kn.getLong(2),
      s"mkn ${mkn.getLong(2)} should differ from kn ${kn.getLong(2)}")
    // probabilities remain valid: 0 < sum_prob_e12 <= n_trans * 1e12
    assert(mkn.getLong(2) > 0L && mkn.getLong(2) <= mkn.getLong(1) * 1000000000000L)
  }

  test("LmModel.release drops every pinned count table; buckets leave none") {
    spark.catalog.clearCache()
    val docsDf = (1L to 30L).map(i =>
      (i, s"the quick brown fox ${i % 5} jumps over the lazy dog ${i % 3}"))
      .toDF("id", "text")
    val model = Lm.train(docsDf, col("text"), order = 3)
    // buckets' internal staging is localCheckpointed (reference-managed),
    // not persisted: the only registry entries after a full score+bucket
    // pass are the model's own count tables
    Lm.perplexityBuckets(model, docsDf, col("id"), col("text")).count()
    model.release()
    assert(spark.sharedState.cacheManager.isEmpty,
      "release() must drop every model count-table cache entry")
    // scoring after release stays correct, just unmemoized
    assert(Lm.score(model, docsDf, col("id"), col("text")).count() == 30L)
  }
}
