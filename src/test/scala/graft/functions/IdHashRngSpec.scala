package graft.functions

import graft.TestSpark
import graft.rules.{Id, RuleSuite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IdHashRngSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def c(sql: String) = graft.rules.RuleRunner.parseRule(sql, RuleSuite(Id(0, 0), Nil))

  test("digest_to_longs deterministic, algo-sensitive") {
    val df = Seq(("a", 1), ("a", 1), ("b", 2)).toDF("s", "i")
    val out = df.select(c("digest_to_longs('MD5', s, i)").as("d")).as[Seq[Long]].collect()
    assert(out(0) == out(1) && out(0) != out(2))
    assert(out(0).size == 2) // md5 = 128 bits
    val sha = df.select(c("digest_to_longs('SHA-256', s, i)").as("d")).as[Seq[Long]].collect()
    assert(sha(0).size == 4 && sha(0) != out(0))
  }

  test("murmur3_id and field_based_id structure") {
    val df = Seq(("x", 7)).toDF("s", "i")
    val r = df.select(c("murmur3_id('my', s, i)").as("id")).select("id.*")
    assert(r.columns.toSeq == Seq("my_base", "my_i0", "my_i1"))
    val row = r.collect()(0)
    assert(IdModel.headerOf(row.getInt(0)) == IdModel.FieldBasedHeader)
    assert(IdModel.lengthOf(row.getInt(0)) == 2)
    val r2 = df.select(c("field_based_id('f', 'SHA-256', s, i)").as("id")).select("id.*")
    assert(r2.columns.length == 5) // base + 4 longs
  }

  test("provided_id accepts array<long> payloads (exactly 2 elements)") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val row = df.select(c("provided_id('p', array(a, b))").as("id")).select("id.*").collect()(0)
    assert(IdModel.headerOf(row.getInt(0)) == IdModel.ProvidedHeader)
    assert(row.getLong(1) == 1L && row.getLong(2) == 2L)
    val err = intercept[Exception] {
      df.select(c("provided_id('p', array(a, b, a))").as("id")).collect()
    }
    assert(err.getMessage.contains("exactly 2") ||
      Option(err.getCause).exists(_.getMessage.contains("exactly 2")))
  }

  test("za hashes codegen-compose") {
    val df = Seq(("x", 7), ("y", 8)).toDF("s", "i")
    val out = df.select(c("za_hash_with('ZA', s, i)").as("h")).as[Long].collect()
    assert(out.distinct.length == 2)
    val pair = df.select(c("za_hash_longs_with('ZA', s, i)").as("h")).as[Seq[Long]].collect()
    assert(pair(0).size == 2 && pair(0)(0) != pair(0)(1))
  }

  test("unique_id produces distinct ids per row") {
    val df = spark.range(1000).toDF("x").repartition(4)
    val ids = df.select(c("unique_id('u')").as("id")).select("id.*")
    assert(ids.columns.toSeq == Seq("u_base", "u_i0", "u_i1"))
    assert(ids.distinct().count() == 1000)
  }

  test("rng_id deterministic per seed+partition, rng distinct across rows") {
    val df = spark.range(100).toDF("x").repartition(2)
    val a = df.select(c("rng_id('r', 'XO_RO_SHI_RO_128_PP', 7)").as("id")).collect().map(_.toString).sorted
    val b = df.select(c("rng_id('r', 'XO_RO_SHI_RO_128_PP', 7)").as("id")).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    assert(a.distinct.length == 100)
    val longs = df.select(c("rng()").as("r")).select("r.lower").as[Long].collect()
    assert(longs.distinct.length == 100)
    val bytes = df.select(c("rng_bytes()").as("b")).as[Array[Byte]].collect()
    assert(bytes.forall(_.length == 16))
  }

  test("id_base64 round trip + size + raw type") {
    val df = Seq(("x", 7)).toDF("s", "i")
    val out = df.select(
      c("id_size(murmur3_id('m', s, i))").as("sz"),
      c("id_raw_type(murmur3_id('m', s, i))").as("tp"),
      c("id_from_base64(id_base64(murmur3_id('m', s, i)), 2)").as("back"),
      c("murmur3_id('m', s, i)").as("orig"))
      .collect()(0)
    assert(out.getInt(0) == 160)
    assert(out.getString(1) == "fieldbased")
    assert(out.getStruct(2).toSeq == out.getStruct(3).toSeq)
  }

  test("id functions stay inside whole-stage codegen and match interpreted results") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    // non-local source so nothing constant-folds; multi-arg + struct forms,
    // decode, size, raw type all run through their generated paths
    val df = spark.range(3).select(
        col("id").cast("int").as("base"), col("id").as("i0"), (col("id") * 7).as("i1"))
      .select(
        c("id_base64(base, i0, i1)").as("b64_fields"),
        c("id_base64(named_struct('id_base', base, 'id_i0', i0, 'id_i1', i1))").as("b64_struct"),
        c("id_from_base64(id_base64(base, i0, i1), 2)").as("back"),
        c("id_size(named_struct('id_base', base, 'id_i0', i0, 'id_i1', i1))").as("sz"),
        c("id_raw_type(named_struct('id_base', base, 'id_i0', i0, 'id_i1', i1))").as("tp"),
        col("base"), col("i0"), col("i1"))
    val plan = df.queryExecution.executedPlan
    assert(plan.collectFirst { case w: WholeStageCodegenExec => w }.nonEmpty,
      s"id functions fell out of codegen:\n$plan")
    df.collect().foreach { r =>
      assert(r.getString(0) == r.getString(1)) // field and struct forms agree
      assert(r.getStruct(2).toSeq ==
        Seq(r.getInt(5), r.getLong(6), r.getLong(7))) // decode round-trips
      assert(r.getInt(3) == 160)
      assert(r.getString(4) == "random") // header bits of small base values
    }
  }

  test("prefixed_to_long_pair and long_pair_from_uuid round trip") {
    val df = Seq(1).toDF("x")
    val r = df.select(c("prefixed_to_long_pair('m', murmur3_id('m', x))").as("p")).select("p.*")
    assert(r.columns.toSeq == Seq("lower", "higher"))
    val uuid = df.select(c("as_uuid(123, 456)").as("u")).as[String].collect()(0)
    val back = df.select(c(s"long_pair_from_uuid('$uuid')").as("p")).select("p.*").collect()(0)
    assert(back.getLong(0) == 123L && back.getLong(1) == 456L)
  }
}
