package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucket: binary search over cut points, NaN high, ends clamp") {
    val cuts = Array(1.0, 2.0, 3.0)
    assert(ZValueExpression.bucket(0.5, cuts) == 0)
    assert(ZValueExpression.bucket(1.0, cuts) == 1) // cut <= v counts
    assert(ZValueExpression.bucket(2.5, cuts) == 2)
    assert(ZValueExpression.bucket(99.0, cuts) == 3)
    assert(ZValueExpression.bucket(Double.NaN, cuts) == 3)
  }

  test("zvalue interleaves bucket bits: known grid corners") {
    // 2 cols x 2 bits: buckets 0..3 each, z = interleave(bx, by)
    val cuts = Array(1.0, 2.0, 3.0) // buckets: (-inf,1)=0 [1,2)=1 [2,3)=2 [3,inf)=3
    val df = Seq((0.0, 0.0), (3.5, 3.5), (3.5, 0.0), (0.0, 3.5), (1.5, 2.5))
      .toDF("x", "y")
    val z = df.select(Layout.zvalue(Seq(col("x"), col("y")), Seq(cuts, cuts)).as("z"))
      .collect().map(_.getLong(0))
    // bx bits at even positions, by at odd
    assert(z(0) == 0L)
    assert(z(1) == 15L)              // (3,3) -> 1111
    assert(z(2) == 5L)               // (3,0) -> 0101
    assert(z(3) == 10L)              // (0,3) -> 1010
    assert(z(4) == 9L) // bx=1 -> z bit 0; by=2 (bit 1) -> z bit 3 -> 1 + 8
  }

  test("null buckets to zero, rows never dropped") {
    val df = Seq[(java.lang.Double, java.lang.Double)]((null, 5.0), (5.0, null), (null, null))
      .toDF("x", "y")
    val z = df.select(Layout.zvalue(Seq(col("x"), col("y")),
      Seq(Array(1.0), Array(1.0))).as("z")).collect().map(_.getLong(0))
    assert(z(0) == 2L && z(1) == 1L && z(2) == 0L)
  }

  test("zorderWrite: round trip preserves rows; files prune on BOTH dims") {
    // 64x64 uniform grid; 16 files of 256 rows each = 16x16 z-tiles
    val grid = spark.range(4096).select(
      (col("id") % 64).cast("double").as("x"),
      (col("id") / 64).cast("double").as("y"),
      col("id").as("rid"))
    val out = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    Layout.zorderWrite(grid, Seq("x", "y"), out, numFiles = 16, bits = 6)
    val back = spark.read.parquet(out)
    assert(back.count() == 4096)
    assert(back.select(sum(col("rid"))).as[Long].head == 4096L * 4095 / 2)

    // per-file min/max envelopes — what parquet footer pruning sees
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length == 16, s"expected 16 files, got ${files.length}")
    val envs = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("x"), max("x"), min("y"), max("y")).head
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
    // a 1/8-width slab on either dimension overlaps few z-ordered files
    // (~4 tiles + range-split straddle); sorting on x alone would leave
    // the y-slab overlapping ALL files — assert both dims prune AND the
    // z layout beats the single-sort layout on its blind dimension
    val xSlab = envs.count { case (x0, x1, _, _) => x1 >= 0.0 && x0 <= 7.0 }
    val ySlab = envs.count { case (_, _, y0, y1) => y1 >= 0.0 && y0 <= 7.0 }
    assert(xSlab <= 8, s"x-slab touched $xSlab/16 files")
    assert(ySlab <= 8, s"y-slab touched $ySlab/16 files")

    val sortedOut = java.nio.file.Files.createTempDirectory("graft_xsorted").toString
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(sortedOut)
    val sortedYSlab = new java.io.File(sortedOut).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
      .map { f => val r = spark.read.parquet(f).agg(min("y"), max("y")).head
        (r.getDouble(0), r.getDouble(1)) }
      .count { case (y0, y1) => y1 >= 0.0 && y0 <= 7.0 }
    assert(sortedYSlab >= 14, s"x-sorted control should not prune y ($sortedYSlab)")
    assert(ySlab < sortedYSlab / 2, "z layout must beat single-sort on its blind dim")
  }

  test("skewed data still splits into equal-mass files (quantile buckets)") {
    // 90% of mass at tiny values + heavy tail: linear min/max scaling
    // would put ~everything in bucket 0; quantiles spread it
    val df = spark.range(2000).select(
      when(col("id") % 10 === 0, col("id") * lit(1000.0))
        .otherwise(col("id") % 10).cast("double").as("x"),
      (col("id") % 7).cast("double").as("y"))
    val z = Layout.zorder(df, Seq("x", "y"), bits = 4)
    val distinctZ = z.select("graft_z").distinct().count()
    assert(distinctZ > 32, s"skewed column collapsed to $distinctZ z-values")
  }

  test("weighted write: equal BYTES per file under skewed row widths, pruning kept") {
    // heavy rows (100x bytes) cluster at low x — count-balanced files
    // would put ~all the byte mass in the first files
    val df = spark.range(2048).select(
      (col("id") % 64).cast("double").as("x"),
      (col("id") / 64).cast("double").as("y"),
      when(col("id") % 64 < 4, 800L).otherwise(lit(8L)).as("bytes"),
      col("id").as("rid"))
    val out = java.nio.file.Files.createTempDirectory("graft_zw").toString
    Layout.zorderWriteWeighted(df, Seq("x", "y"), out, numFiles = 8,
      sizeCol = col("bytes"), bits = 5)
    val back = spark.read.parquet(out)
    assert(back.count() == 2048)
    assert(back.select(sum("rid")).as[Long].head == 2048L * 2047 / 2)

    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length == 8, s"expected 8 files, got ${files.length}")
    val stats = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(sum("bytes"), min("graft_z"), max("graft_z")).head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val byteSums = stats.map(_._1)
    val mean = byteSums.sum.toDouble / byteSums.length
    assert(byteSums.max <= 2.5 * mean,
      s"byte-heaviest file ${byteSums.max} vs mean $mean")
    // z-ranges must stay disjoint (monotone assignment) so pruning holds
    val ranges = stats.map(s => (s._2, s._3)).sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi <= lo, "file z-ranges overlap — pruning broken")
    case _ => }

    // control: the count-balanced writer on the same data IS byte-skewed
    val ctrl = java.nio.file.Files.createTempDirectory("graft_zc").toString
    Layout.zorderWrite(df, Seq("x", "y"), ctrl, numFiles = 8, bits = 5)
    val ctrlMax = new java.io.File(ctrl).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => spark.read.parquet(f.toString).agg(sum("bytes")).head.getLong(0)).max
    assert(ctrlMax > byteSums.max,
      s"control max $ctrlMax should exceed weighted max ${byteSums.max}")
  }

  test("append + compact lifecycle: manifest-driven, rows exact, pruning restored") {
    def grid(lo: Long, hi: Long) = spark.range(lo, hi).select(
      (col("id") % 64).cast("double").as("x"),
      ((col("id") / 64) % 64).cast("double").as("y"),
      col("id").as("rid"))
    val out = java.nio.file.Files.createTempDirectory("graft_zlife").toString
    Layout.zorderWrite(grid(0, 4096), Seq("x", "y"), out, numFiles = 16, bits = 6)
    assert(Layout.readLayoutManifest(spark, out) == ((Seq("x", "y"), 6, 16, "morton")))

    Layout.zorderAppend(grid(4096, 4608), out, numFiles = 2)
    Layout.zorderAppend(grid(4608, 5120), out, numFiles = 2)
    def files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length == 20) // 16 base + 2 + 2
    assert(spark.read.parquet(out).count() == 5120)

    Layout.zorderCompact(spark, out)
    assert(files.length == 16, "compact should restore the recorded file count")
    val back = spark.read.parquet(out)
    assert(back.count() == 5120)
    assert(back.select(sum("rid")).as[Long].head == 5120L * 5119 / 2)
    // re-clustered: an x-slab touches few files again
    val xSlab = files.map { f =>
      val r = spark.read.parquet(f).agg(min("x"), max("x")).head
      (r.getDouble(0), r.getDouble(1))
    }.count { case (x0, x1) => x1 >= 0.0 && x0 <= 7.0 }
    assert(xSlab <= 8, s"post-compact x-slab touched $xSlab/16 files")
    // leftover swap state is gone
    assert(!new java.io.File(out + "__compact_tmp").exists())
    assert(!new java.io.File(out + "__compact_manifest").exists())
  }

  test("prunedRead: sidecar skips files, results exactly equal full filter") {
    val grid = spark.range(4096).select(
      (col("id") % 64).cast("double").as("x"),
      (col("id") / 64).cast("double").as("y"),
      col("id").as("rid"))
    val out = java.nio.file.Files.createTempDirectory("graft_zstats").toString
    Layout.zorderWrite(grid, Seq("x", "y"), out, numFiles = 16, bits = 6)
    assert(new java.io.File(out, "_graft_stats.yaml").exists())

    val pruned = Layout.prunedRead(spark, out, "x", 0.0, 7.0)
    val full = spark.read.parquet(out).where(col("x").between(0.0, 7.0))
    assert(pruned.select(sum("rid")).as[Long].head ==
      full.select(sum("rid")).as[Long].head)
    assert(pruned.count() == 4096 / 8)
    val touched = pruned.inputFiles.length
    assert(touched <= 8 && touched < 16, s"pruned read opened $touched/16 files")
    // y-dimension pruning works too (the z-order point); y = id/64 is
    // true division, so compare against the full filtered read
    val prunedY = Layout.prunedRead(spark, out, "y", 60.0, 63.0)
    assert(prunedY.count() ==
      spark.read.parquet(out).where(col("y").between(60.0, 63.0)).count())
    assert(prunedY.inputFiles.length < 16)

    // append updates the sidecar; results stay exact
    Layout.zorderAppend(grid.withColumn("rid", col("rid") + 10000), out, numFiles = 2)
    val pruned2 = Layout.prunedRead(spark, out, "x", 0.0, 7.0)
    assert(pruned2.count() == 2 * (4096 / 8))
    // no-sidecar fallback: plain dir still reads correctly
    val plain = java.nio.file.Files.createTempDirectory("graft_zplain").toString
    grid.write.mode("overwrite").parquet(plain)
    assert(Layout.prunedRead(spark, plain, "x", 0.0, 7.0).count() == 4096 / 8)
    // empty overlap set
    assert(Layout.prunedRead(spark, out, "x", 1000.0, 2000.0).count() == 0)
  }

  test("append refuses a dir without a layout manifest") {
    val plain = java.nio.file.Files.createTempDirectory("graft_plain").toString
    spark.range(10).select(col("id").cast("double").as("x"))
      .write.mode("overwrite").parquet(plain)
    intercept[IllegalArgumentException](
      Layout.zorderAppend(spark.range(5).select(col("id").cast("double").as("x")), plain))
  }

  test("weighted write: empty input and resolution cap") {
    val empty = spark.range(0).select(col("id").cast("double").as("x"),
      lit(1L).as("b"))
    intercept[IllegalArgumentException](Layout.zorderWriteWeighted(
      empty, Seq("x"), "/tmp/unused_zw", 4, col("b"), bits = 21))
  }

  test("hilbert index: bijective and unit-step continuous (the curve property)") {
    // n=2, bits=3: all 64 cells get distinct indexes 0..63, and walking
    // the curve in index order moves exactly ONE unit in ONE dimension —
    // the locality Morton interleave does not have
    def cellOf(h: Long, cells: Seq[(Int, Int)], idx: Map[(Int, Int), Long]) =
      cells.find(c => idx(c) == h).get
    val cells = for (x <- 0 until 8; y <- 0 until 8) yield (x, y)
    val idx = cells.map(c =>
      c -> ZValueExpression.hilbertIndex(Array(c._1, c._2), 3)).toMap
    assert(idx.values.toSet == (0L until 64L).toSet, "not a bijection")
    (0L until 63L).foreach { h =>
      val (x0, y0) = cellOf(h, cells, idx)
      val (x1, y1) = cellOf(h + 1, cells, idx)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"step $h -> ${h + 1} jumps from ($x0,$y0) to ($x1,$y1)")
    }
    // 3-D, bits=2: bijection + unit steps as well
    val cells3 = for (x <- 0 until 4; y <- 0 until 4; z <- 0 until 4) yield (x, y, z)
    val idx3 = cells3.map(c =>
      c -> ZValueExpression.hilbertIndex(Array(c._1, c._2, c._3), 2)).toMap
    assert(idx3.values.toSet == (0L until 64L).toSet)
    (0L until 63L).foreach { h =>
      val a = cells3.find(c => idx3(c) == h).get
      val b = cells3.find(c => idx3(c) == h + 1).get
      assert(math.abs(a._1 - b._1) + math.abs(a._2 - b._2) + math.abs(a._3 - b._3) == 1)
    }
  }

  test("hilbert write: manifest round-trip, lifecycle, pruning on both dims") {
    val grid = spark.range(4096).select(
      (col("id") % 64).cast("double").as("x"),
      (col("id") / 64).cast("double").as("y"),
      col("id").as("rid"))
    val out = java.nio.file.Files.createTempDirectory("graft_hilb").toString
    Layout.zorderWrite(grid, Seq("x", "y"), out, numFiles = 16, bits = 6,
      curve = "hilbert")
    assert(Layout.readLayoutManifest(spark, out) == ((Seq("x", "y"), 6, 16, "hilbert")))
    val back = spark.read.parquet(out)
    assert(back.count() == 4096)
    assert(back.select(sum("rid")).as[Long].head == 4096L * 4095 / 2)
    val envs = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map { f =>
        val r = spark.read.parquet(f.toString)
          .agg(min("x"), max("x"), min("y"), max("y")).head
        (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      }
    val xSlab = envs.count { case (x0, x1, _, _) => x1 >= 0.0 && x0 <= 7.0 }
    val ySlab = envs.count { case (_, _, y0, y1) => y1 >= 0.0 && y0 <= 7.0 }
    assert(xSlab <= 8 && ySlab <= 8, s"hilbert slabs touched $xSlab/$ySlab of 16")
    // append + compact keep the recorded curve
    Layout.zorderAppend(grid.limit(100), out, numFiles = 1)
    Layout.zorderCompact(spark, out)
    assert(Layout.readLayoutManifest(spark, out) == ((Seq("x", "y"), 6, 16, "hilbert")))
    assert(spark.read.parquet(out).count() == 4196)
    intercept[IllegalArgumentException](
      Layout.zorder(grid, Seq("x"), bits = 4, curve = "peano"))
  }

  test("streaming append: micro-batches land clustered, sidecar stays fresh") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_zstream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_zstream_ck").toString
    Layout.zorderWrite(
      spark.range(256).select((col("id") % 16).cast("double").as("x"),
        (col("id") / 16).cast("double").as("y"), col("id").as("rid")),
      Seq("x", "y"), out, numFiles = 4, bits = 4)
    val mem = MemoryStream[(Double, Double, Long)]
    val q = Layout.streamingAppend(
      mem.toDF().toDF("x", "y", "rid"), out, ckpt, numFilesPerBatch = 1)
    try {
      mem.addData((1.0, 1.0, 1000L), (2.0, 2.0, 1001L))
      q.processAllAvailable()
      mem.addData((3.0, 3.0, 1002L))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 259)
      // sidecar fresh: pruned read sees the streamed rows
      val got = Layout.prunedRead(spark, out, "x", 1.0, 3.0)
        .where(col("rid") >= 1000L).count()
      assert(got == 3)
    } finally q.stop()
  }

  test("validation: capacity, non-numeric, empty") {
    val df = Seq((1.0, "a")).toDF("x", "s")
    intercept[IllegalArgumentException](Layout.zorderBoundaries(df, Seq("x"), bits = 64))
    intercept[IllegalArgumentException](Layout.zorderBoundaries(df, Seq("x", "s"), bits = 8))
    intercept[IllegalArgumentException](Layout.zorderBoundaries(df, Seq.empty))
  }

  test("bloom filters: written on requested columns, preserved by append and compact") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.format.converter.ParquetMetadataConverter
    def bloomState(dir: String): Seq[(String, Boolean, Boolean)] = {
      val conf = spark.sparkContext.hadoopConfiguration
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(conf)
      fs.listStatus(root).toSeq.map(_.getPath)
        .filter(p => p.getName.endsWith(".parquet"))
        .map { p =>
          val footer = ParquetFileReader.readFooter(conf, p, ParquetMetadataConverter.NO_FILTER)
          var id = false; var x = false
          footer.getBlocks.forEach { b =>
            b.getColumns.forEach { cc =>
              val has = cc.getBloomFilterOffset >= 0
              if (cc.getPath.toDotString == "rid") id ||= has
              if (cc.getPath.toDotString == "x") x ||= has
            }
          }
          (p.getName, id, x)
        }
    }
    val df = spark.range(2000).select(col("id").as("rid"),
      (col("id") % 97).cast("double").as("x"), (col("id") % 13).cast("double").as("y"))
    val out = java.nio.file.Files.createTempDirectory("graft_zbloom").toString
    Layout.zorderWrite(df, Seq("x", "y"), out, numFiles = 3,
      bloomCols = Seq("rid"), bloomNdv = 1000L)
    val base = bloomState(out)
    assert(base.nonEmpty && base.forall { case (_, id, x) => id && !x },
      s"base files must carry a bloom on rid only: $base")

    // append inherits the bloom config from the manifest
    val extra = spark.range(2000, 2400).select(col("id").as("rid"),
      (col("id") % 97).cast("double").as("x"), (col("id") % 13).cast("double").as("y"))
    Layout.zorderAppend(extra, out, numFiles = 1)
    val after = bloomState(out)
    assert(after.size === base.size + 1)
    assert(after.forall { case (_, id, x) => id && !x }, s"append lost bloom: $after")

    // compact rewrites everything, filters still present, rows exact
    Layout.zorderCompact(spark, out)
    val compacted = bloomState(out)
    assert(compacted.nonEmpty && compacted.forall { case (_, id, x) => id && !x },
      s"compact lost bloom: $compacted")
    assert(spark.read.parquet(out).count() === 2400L)
    // point lookups stay exact with filters in play
    assert(spark.read.parquet(out).where(col("rid") === 1234L).count() === 1L)
    assert(spark.read.parquet(out).where(col("rid") === 99999L).count() === 0L)
  }

  test("fileReport prices fragmentation and its fix") {
    val df = spark.range(5000).select(col("id").cast("double").as("x"),
      (col("id") % 7).cast("double").as("y"))
    val out = java.nio.file.Files.createTempDirectory("graft_zfrag").toString
    Layout.zorderWrite(df, Seq("x", "y"), out, numFiles = 20)
    val r = Layout.fileReport(spark, out, targetFileBytes = 512 * 1024).collect().head
    assert(r.getLong(0) === 20L)                      // n_files
    assert(r.getLong(4) === 20L)                      // all far below 256 KiB
    assert(r.getLong(5) === 1L)                       // one file would do
    assert(r.getLong(6) === 1000000L)                 // fully fragmented
    Layout.zorderCompact(spark, out, numFiles = r.getLong(5).toInt)
    val after = Layout.fileReport(spark, out, targetFileBytes = 512 * 1024)
      .collect().head
    assert(after.getLong(0) === 1L)
    assert(spark.read.parquet(out).count() === 5000L)
  }

  test("compactionPlan: FFD bins under target, big files untouched, deterministic") {
    val df = spark.range(5000).select(col("id").cast("double").as("x"),
      (col("id") % 7).cast("double").as("y"))
    val out = java.nio.file.Files.createTempDirectory("graft_zplan").toString
    Layout.zorderWrite(df, Seq("x", "y"), out, numFiles = 12)
    val target = 512L * 1024
    val plan = Layout.compactionPlan(spark, out, target)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(plan.nonEmpty)
    // every small file planned exactly once; bins respect the target and
    // carry at least two files; bin_bytes is the exact member sum
    assert(plan.map(_._1).distinct.length == plan.length)
    val byBin = plan.groupBy(_._3)
    byBin.values.foreach { fs =>
      assert(fs.length >= 2 && fs.length == fs.head._5)
      assert(fs.map(_._2).sum == fs.head._4)
      assert(fs.head._4 <= target)
    }
    // deterministic re-run
    val again = Layout.compactionPlan(spark, out, target)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(plan.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // a big-file table needs no plan
    val out2 = java.nio.file.Files.createTempDirectory("graft_zplan2").toString
    Layout.zorderWrite(df, Seq("x", "y"), out2, numFiles = 1)
    assert(Layout.compactionPlan(spark, out2, 1024).count() == 0)
  }

  test("codegen: evaluates with fallback disabled") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.range(100).select(col("id").cast("double").as("x"),
        (col("id") % 10).cast("double").as("y"))
      val z = df.select(Layout.zvalue(Seq(col("x"), col("y")),
        Seq(Array(25.0, 50.0, 75.0), Array(3.0, 6.0))).as("z"))
      assert(z.collect().length == 100)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }
}
