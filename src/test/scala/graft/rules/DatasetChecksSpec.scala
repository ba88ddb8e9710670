package graft.rules

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DatasetChecksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("uniqueness: affected mass counted, null keys group loudly") {
    val df = Seq(
      (Some(1L), "a"), (Some(1L), "b"), (Some(1L), "c"), // key 1 x3
      (Some(2L), "d"),
      (None: Option[Long], "e"), (None: Option[Long], "f")) // null key x2
      .toDF("k", "v")
    val r = DatasetChecks.uniquenessReport(df, col("k")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((6L, 3L, 5L, 3L))) // 3+2 rows sit in duplicated keys
    assert(r.getLong(4) == 833333L)
    // composite key separates what a single column conflates
    val comp = DatasetChecks.uniquenessReport(df, col("k"), col("v")).collect()(0)
    assert(comp.getLong(2) == 0L && comp.getLong(4) == 0L)
  }

  test("referential integrity: orphans vs null fks, parent keys deduped") {
    val parent = Seq(1L, 2L, 2L, 3L).toDF("pk") // dup parent keys are fine
    val child = Seq(Some(1L), Some(2L), Some(9L), Some(8L), None)
      .toDF("fk")
    val r = DatasetChecks.referentialReport(child, col("fk"), parent, col("pk"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((5L, 1L, 2L)))
    assert(r.getLong(3) == 500000L) // 2 of 4 non-null fks dangle
  }

  test("functional dependency: violations counted, null variant is loud") {
    val df = Seq(
      (1L, "Alice"), (1L, "Alice"),          // consistent
      (2L, "Bob"), (2L, "bob"),              // casing drift: violation
      (3L, "Carol"), (3L, null: String))     // null among values: violation
      .toDF("cust", "name")
    val r = DatasetChecks.functionalDependencyReport(df, col("name"), col("cust"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 2L, 666666L, 2L)))
  }

  test("orderingReport: per-key regressions, partitioning-independent") {
    // user 1: seq 1,2,3 with ts 10,5,20 → one regression (5 after 10)
    // user 2: perfectly ordered; singleton user 3 contributes no pairs
    val df = Seq(
      (1L, 1L, 10L), (1L, 2L, 5L), (1L, 3L, 20L),
      (2L, 1L, 1L), (2L, 2L, 2L),
      (3L, 1L, 7L)).toDF("u", "seq", "t")
    val r = DatasetChecks.orderingReport(df.repartition(5), col("u"), col("t"), col("seq"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 3L, 1L, 333333L)))
  }

  test("schemaDiff: added, removed, type-changed columns") {
    val a = Seq((1L, "x", 1.0)).toDF("id", "name", "score")
    val b = Seq(("1", "x", true)).toDF("id", "name", "flag")
    val got = DatasetChecks.schemaDiff(a, b)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("flag", "added"), ("score", "removed"), ("id", "type_changed")))
    assert(DatasetChecks.schemaDiff(a, a).count() == 0)
  }

  test("completeness: one-pass per-column null profile") {
    val df = Seq(
      (Some(1L), Some("x"), None: Option[Double]),
      (None: Option[Long], Some("y"), None: Option[Double]),
      (Some(3L), None: Option[String], Some(1.5)))
      .toDF("a", "b", "c")
    val r = DatasetChecks.completenessReport(df, Seq("a", "b", "c"))
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(r("a") == ((3L, 1L, 333333L)))
    assert(r("b") == ((3L, 1L, 333333L)))
    assert(r("c") == ((3L, 2L, 666666L)))
  }

  private def miRow(df: org.apache.spark.sql.DataFrame) = {
    val r = DatasetChecks.mutualInformation(df, col("x"), col("y")).collect()(0)
    (r.getAs[Long]("n"), r.getAs[Long]("cells"), r.getAs[Long]("mi_e9"),
      r.getAs[Long]("hx_e9"), r.getAs[Long]("hy_e9"), r.getAs[Long]("nmi_ppm"))
  }

  test("mutualInformation: dependent columns hit NMI 1e6, independent hit 0") {
    // y == x: MI = H(x) = H(y) exactly (same doubles, same floors)
    val dep = (0 until 90).map(i => (s"c${i % 3}", s"c${i % 3}")).toDF("x", "y")
    val (n, cells, mi, hx, hy, nmi) = miRow(dep)
    assert(n == 90L && cells == 3L && mi == hx && hx == hy && nmi == 1000000L)
    assert(math.abs(mi / 1e9 - math.log(3.0)) < 1e-6) // uniform 3-way entropy
    // x and y independent and balanced: every cell term is ln(1) = 0
    val ind = (0 until 80).map(i => (s"a${i % 2}", s"b${(i / 2) % 2}")).toDF("x", "y")
    val (_, c2, mi2, hx2, _, nmi2) = miRow(ind)
    assert(c2 == 4L && mi2 == 0L && nmi2 == 0L)
    assert(math.abs(hx2 / 1e9 - math.log(2.0)) < 1e-6)
  }

  test("mutualInformation: scalar cross-check with the exact flooring, nulls are a category") {
    val df = Seq(("en", "web"), ("en", "web"), ("en", "books"),
      ("de", "web"), (null, "books"), (null, "books")).toDF("x", "y")
    val (n, cells, mi, hx, hy, _) = miRow(df)
    assert(n == 6L && cells == 4L) // (en,web) (en,books) (de,web) (null,books)
    def term(nxy: Long, nx: Long, ny: Long, nn: Long): Long =
      math.floor((nxy.toDouble / nn) *
        math.log((nxy.toDouble * nn) / (nx.toDouble * ny)) * 1e9).toLong
    val expMi = term(2, 3, 3, 6) + term(1, 3, 3, 6) + term(1, 1, 3, 6) + term(2, 2, 3, 6)
    assert(mi == expMi, s"mi=$mi expected=$expMi")
    def ent(ns: Seq[Long], nn: Long): Long = ns.map(k =>
      math.floor(-(k.toDouble / nn) * math.log(k.toDouble / nn) * 1e9).toLong).sum
    assert(hx == ent(Seq(3, 1, 2), 6) && hy == ent(Seq(3, 3), 6))
    // constant columns: zero entropy, zero MI, guarded NMI
    val const = Seq(("k", "k"), ("k", "k")).toDF("x", "y")
    assert(miRow(const) == ((2L, 1L, 0L, 0L, 0L, 0L)))
  }

  test("discoverFunctionalDependencies: all ordered pairs, null variants count") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        | (1, 'us', 'na'), (2, 'us', 'na'), (3, 'de', 'eu'),
        | (4, 'de', 'eu'), (5, 'jp', CAST(NULL AS STRING)),
        | (5, 'jp', 'ap') t(id, country, region)""".stripMargin)
    val out = DatasetChecks.discoverFunctionalDependencies(
        df, Seq("id", "country", "region"))
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out.size == 6)
    // id -> country holds (id 5 repeats with same country); id -> region
    // violated by id 5 (NULL and 'ap' are TWO variants)
    assert(out(("id", "country")) == ((5L, 0L, true)))
    assert(out(("id", "region")) == ((5L, 1L, false)))
    // country -> region violated only by jp's null/ap split
    assert(out(("country", "region")) == ((3L, 1L, false)))
    assert(out(("country", "id")) == ((3L, 2L, false))) // us and de repeat ids
    // region determinant: groups na, eu, NULL, ap (null key is a group)
    assert(out(("region", "country")) == ((4L, 0L, true)))
    intercept[IllegalArgumentException] {
      DatasetChecks.discoverFunctionalDependencies(df, Seq("id"))
    }
  }

  test("deltaAttribution: signed shares, one-sided values, weighted metric") {
    val oldDf = Seq(("web", 10L), ("web", 20L), ("api", 5L), ("ftp", 1L))
      .toDF("src", "w")
    val newDf = Seq(("web", 40L), ("api", 5L), ("api", 3L), ("cli", 2L))
      .toDF("src", "w")
    // counts: web 2→1 (-1), api 1→2 (+1), ftp 1→0 (-1), cli 0→1 (+1); total 0
    val byCount = DatasetChecks.deltaAttribution(oldDf, newDf, col("src"))
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._4, r._5))).toMap
    assert(byCount == Map(
      "web" -> ((-1L, None)), "api" -> ((1L, None)),
      "ftp" -> ((-1L, None)), "cli" -> ((1L, None)))) // zero total → null shares
    // weighted: web 30→40 (+10), api 5→8 (+3), ftp 1→0 (-1), cli 0→2 (+2); total +14
    val byW = DatasetChecks.deltaAttribution(oldDf, newDf, col("src"), col("w"))
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5.get))).toMap
    assert(byW("web") == ((30L, 40L, 10L, 714285L)))
    assert(byW("ftp") == ((1L, 0L, -1L, -71428L))) // truncation toward zero
    assert(byW("cli") == ((0L, 2L, 2L, 142857L)))
  }
}
