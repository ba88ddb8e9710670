package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("joins and aggregations over co-bucketed tables run shuffle-free") {
    val left = (0L until 1000L).map(i => (i, s"l$i")).toDF("id", "lv")
    val right = (0L until 1000L).map(i => (i, i * 2)).toDF("id", "rv")
    // a previous JVM's warehouse dir may survive without catalog metadata —
    // clear both so saveAsTable can recreate the location
    Seq("graft_bk_left", "graft_bk_right").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    Bucketed.writeBucketed(left, "graft_bk_left", 4, "id")
    Bucketed.writeBucketed(right, "graft_bk_right", 4, "id")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a real join
    try {
      val joined = Bucketed.read(spark, "graft_bk_left")
        .join(Bucketed.read(spark, "graft_bk_right"), "id")
      assert(Bucketed.isShuffleFree(joined),
        s"bucketed join still shuffles:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 1000)
      val agg = Bucketed.read(spark, "graft_bk_left").groupBy("id").agg(count(lit(1)))
      assert(Bucketed.isShuffleFree(agg),
        s"bucketed agg still shuffles:\n${agg.queryExecution.executedPlan}")
      // sanity: the same join over non-bucketed frames DOES shuffle
      val plain = left.join(right, "id")
      assert(!Bucketed.isShuffleFree(plain))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
