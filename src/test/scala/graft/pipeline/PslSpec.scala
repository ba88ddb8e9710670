package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Full Public Suffix List loader + eTLD+1 evaluation, pinned against a
 * bundled snapshot in the real public_suffix_list.dat format — comments,
 * section markers, wildcard (`*.ck`) and exception (`!www.ck`) rules, the
 * cases the built-in 46-suffix table can't express. */
class PslSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // a faithful slice of the published list format: ICANN + PRIVATE
  // sections, `//` comments, blank lines, the classic wildcard/exception
  // pair (ck), a deep exception family (kawasaki.jp), multi-label rules,
  // trailing whitespace and a same-line trailing comment fragment
  private val snapshot =
    """// This Software is subject to the terms of the Mozilla Public License.
      |// ===BEGIN ICANN DOMAINS===
      |
      |com
      |uk
      |co.uk
      |org.uk
      |jp
      |kawasaki.jp
      |*.kawasaki.jp
      |!city.kawasaki.jp
      |au
      |com.au
      |ck
      |*.ck
      |!www.ck
      |co.za
      |de comment-after-whitespace-is-ignored
      |
      |// ===END ICANN DOMAINS===
      |// ===BEGIN PRIVATE DOMAINS===
      |github.io
      |s3.amazonaws.com
      |// ===END PRIVATE DOMAINS===
      |""".stripMargin

  private lazy val rules = Psl.parse(snapshot)

  private def dom(url: String): String =
    Seq(Tuple1(url)).toDF("u")
      .select(Psl.registrableDomain(col("u"), rules)).collect()(0).getString(0)

  test("parse: comments, sections, whitespace; rule classes land in the right buckets") {
    assert(rules.exact.contains("co.uk") && rules.exact.contains("github.io"))
    assert(rules.exact.contains("co.za")) // trailing spaces trimmed
    assert(rules.exact.contains("de"))    // text after whitespace dropped
    assert(!rules.exact.exists(_.startsWith("//")))
    assert(rules.wildTails == Set("ck", "kawasaki.jp"))
    assert(rules.exceptions == Set("www.ck", "city.kawasaki.jp"))
    assert(rules.maxLabels == 3) // *.kawasaki.jp / s3.amazonaws.com
    // malformed wildcards are refused loudly, not mis-matched
    intercept[IllegalArgumentException](Psl.parse("foo.*.bar"))
  }

  test("plain and multi-label rules: longest match prevails") {
    assert(dom("https://a.b.example.co.uk/x") == "example.co.uk")
    assert(dom("https://example.co.uk/") == "example.co.uk")
    assert(dom("https://www.example.com/") == "example.com")
    // private-section rules behave identically: each gh-pages user is a
    // distinct registrable domain
    assert(dom("https://alice.github.io/p") == "alice.github.io")
    assert(dom("https://deep.x.bob.github.io/") == "bob.github.io")
    assert(dom("https://bucket.s3.amazonaws.com/k") == "bucket.s3.amazonaws.com")
  }

  test("wildcard rules: any single label under the tail is a public suffix") {
    // *.ck: foo.ck is a suffix, so the site under it keeps 3 labels
    assert(dom("https://shop.foo.ck/x") == "shop.foo.ck")
    assert(dom("https://a.shop.foo.ck/x") == "shop.foo.ck")
    // *.kawasaki.jp: same shape one level deeper
    assert(dom("https://site.ward.kawasaki.jp/") == "site.ward.kawasaki.jp")
    assert(dom("https://x.site.ward.kawasaki.jp/") == "site.ward.kawasaki.jp")
  }

  test("exception rules beat wildcards: the listed name IS registrable") {
    assert(dom("https://www.ck/index") == "www.ck")
    assert(dom("https://a.www.ck/x") == "www.ck")
    assert(dom("https://city.kawasaki.jp/") == "city.kawasaki.jp")
    assert(dom("https://a.b.city.kawasaki.jp/") == "city.kawasaki.jp")
  }

  test("engine conventions: pass-through degenerates, case/trailing-dot folding") {
    assert(dom("https://localhost/x") == "localhost")     // dotless
    assert(dom("https://co.uk/") == "co.uk")              // host IS a suffix
    assert(dom("https://foo.ck/") == "foo.ck")            // wildcard suffix itself
    assert(dom("https://unknown.zz/") == "unknown.zz")    // implicit * rule
    assert(dom("https://a.unknown.zz/") == "unknown.zz")
    assert(dom("https://A.Example.CO.UK/x") == "example.co.uk") // case-folded
    assert(dom("https://example.com./x") == "example.com")      // DNS root dot
  }

  test("built-in parity where both cover: PSL path agrees with Text.registrableDomain") {
    val urls = Seq(
      "https://a.b.example.co.uk/x", "https://www.example.com/z",
      "https://shop.example.com.au/", "https://localhost/p")
    val both = urls.toDF("u").select(
        Text.registrableDomain(col("u")).as("builtin"),
        Psl.registrableDomain(col("u"), rules).as("psl"))
      .collect()
    both.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("codegen: probe evaluates with codegen fallback disabled, stays in WSCG") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // spark.range (not a local Seq): ConvertToLocalRelation would fold a
      // local projection at optimize time and never exercise doGenCode
      val df = spark.range(1, 101)
        .select(concat(lit("https://sub"), col("id"), lit(".site"), col("id"),
          lit(".co.uk/p")).as("u"))
        .select(Psl.registrableDomain(col("u"), rules).as("d"))
      assert(df.where(col("d") === "site7.co.uk").count() == 1)
      // the starred `*(1) Project` prefix marks the whole-stage-codegen span
      val exec = df.queryExecution.executedPlan
      assert(exec.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.WholeStageCodegenExec]), exec.toString)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }
}
