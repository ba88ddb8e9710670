package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Perceptual image hashing (DCT pHash, public knowledge — the pHash.org /
 * Zauner 2010 construction): decode → 32×32 box-filter (area-averaged)
 * luminance downsample →
 * 2-D orthonormal DCT-II → keep the top-left 8×8 low-frequency block →
 * threshold each coefficient against the block median → 64-bit sign hash.
 * Re-encoded, recompressed and resized copies of an image keep their
 * low-frequency structure, so they land within a small Hamming distance
 * while unrelated images sit near 32 — which plugs image dedup straight
 * into the same Hamming band-join the text simhash tier uses: no all-pairs
 * comparison, candidates only from 16-bit band collisions.
 *
 * Scale: the hash is a codegen'd static call per row (decode included — one
 * in-memory ImageIO decode, no shared state), so hashing is a narrow
 * projection over the binary column; the pair join is the banded shuffle
 * shape of [[Dedup.simhashNearDups]], Σ|bucket|² bounded like every LSH
 * tier here. Undecodable bytes hash to NULL and drop out of the join.
 */
object Phash {

  /** 64-bit DCT perceptual hash of an image binary column (NULL when the
   * bytes don't decode as an image). */
  def imagePhash(data: Column): Column =
    Bridge.column(ImagePhashExpression(Bridge.expression(data)))

  /** Near-duplicate image pairs (id_a, id_b, hamming ≤ maxHamming) via the
   * shared Hamming band join at 8×8-bit bands — Hamming ≤ 7 is caught
   * exactly (pigeonhole over 8 bands), which covers JPEG recompression and
   * integer-ratio resizes outright; harsher transforms (non-integer
   * nearest-neighbour resampling lands ~10-16 bits out) still collide with
   * high probability on a surviving band. Median-split hashes have exactly
   * 32 set bits, so distances are always even. */
  def nearDups(df: DataFrame, idCol: Column, dataCol: Column, maxHamming: Int = 12): DataFrame = {
    // no isNotNull pre-filter: pushed down it would re-run the decode per
    // row (two evals in one codegen stage); null sigs never equi-join on
    // a band bucket, so undecodable rows simply yield no pairs
    val base = df.select(idCol.as("id"), imagePhash(dataCol).as("sig"))
    Dedup.hammingBandPairs(base, maxHamming, nBands = 8)
  }

  /**
   * Decoded-feature cache: decode each image ONCE into a persisted
   * (id, sig) parquet table — at media scale the pixel decode dominates
   * everything downstream (the r10 bench read 5+ s/rep on a 500-image
   * fixture, all decode), so every dedup/search/audit after the first
   * should run over 8-byte signatures, not bytes. Undecodable rows (null
   * sig) are excluded — they have no perceptual identity to compare.
   * [[Incremental.compact]] handles the flat layout; ids are cast to long
   * (the id contract every persisted graft index uses).
   */
  def buildIndex(df: DataFrame, idCol: Column, dataCol: Column, path: String): Unit =
    df.select(idCol.cast("long").as("id"), imagePhash(dataCol).as("sig"))
      // the repartition materializes sig before the null cut, so the filter
      // tests the shuffled 8-byte value instead of re-running the decode
      .repartition(col("id"))
      .where(col("sig").isNotNull)
      .write.mode("overwrite").parquet(path)

  /**
   * O(batch) append with the standard idempotence contract: already-
   * indexed ids are anti-joined away BEFORE the decode projection (the
   * expensive side — the Project computing the hash sits above the join
   * and Catalyst never pushes expression evaluation below it), so a
   * retried or mostly-indexed batch costs an id scan, not a re-decode.
   */
  def appendToIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, idCol: Column, dataCol: Column): Unit = {
    val indexed = spark.read.parquet(path).select(col("id"))
    batch.select(idCol.cast("long").as("id"), dataCol.as("graft_data"))
      .join(indexed, Seq("id"), "left_anti")
      .select(col("id"), imagePhash(col("graft_data")).as("sig"))
      .repartition(col("id")) // single decode: filter above the exchange
      .where(col("sig").isNotNull)
      .write.mode("append").parquet(path)
  }

  /** [[nearDups]] over the persisted signatures — no decode at all. */
  def nearDupsFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      maxHamming: Int = 12): DataFrame =
    Dedup.hammingBandPairs(spark.read.parquet(path), maxHamming, nBands = 8)

  /** Batch search: decode the query images (only), band-join their
   * signatures against the index — (id_q, id_c, hamming). */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, idCol: Column, dataCol: Column,
      maxHamming: Int = 12): DataFrame = {
    // undecodable queries carry a null sig and match nothing — no
    // pre-filter, for the same single-eval reason as [[nearDups]]
    val q = queries.select(idCol.cast("long").as("id"), imagePhash(dataCol).as("sig"))
    Dedup.hammingBandJoin(q, spark.read.parquet(path), maxHamming, nBands = 8)
  }
}

object PhashAlgos {

  /** Orthonormal 1-D DCT-II basis for N=32: Basis(u)(x) = α(u)·cos((2x+1)uπ/64). */
  private val Basis: Array[Array[Double]] = {
    val n = 32
    Array.tabulate(n, n) { (u, x) =>
      val alpha = if (u == 0) math.sqrt(1.0 / n) else math.sqrt(2.0 / n)
      alpha * math.cos((2 * x + 1) * u * math.Pi / (2.0 * n))
    }
  }

  /** One-slot per-thread memo — same double-eval guard as
   * [[AudioPhashAlgos.memo]] (inferred isnotnull constraints re-run the
   * decode inside one codegen stage; the repeat sees identical bytes). */
  private val memo = new ThreadLocal[(Array[Byte], java.lang.Long)]

  /** 64-bit pHash, boxed so NULL can signal an undecodable payload. */
  def phash64(data: Array[Byte]): java.lang.Long = {
    if (data == null || data.length == 0) return null
    val m = memo.get()
    if (m != null && java.util.Arrays.equals(m._1, data)) return m._2
    val r = phash64Compute(data)
    memo.set((data.clone(), r))
    r
  }

  private def phash64Compute(data: Array[Byte]): java.lang.Long = {
    val img = try {
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(data))
    } catch { case _: Exception => null }
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    if (w <= 0 || h <= 0) return null
    // 32×32 box-filtered luminance (integer Rec.601 weights): each cell
    // averages its whole source block — the anti-aliasing pre-smooth the
    // pHash construction requires (nearest-neighbour sampling leaks
    // aliasing noise into the low-frequency block and costs ~10 Hamming
    // bits on a resized copy; area averaging keeps it ≤ a few)
    val lum = new Array[Double](32 * 32)
    var y = 0
    while (y < 32) {
      val y0 = y * h / 32
      val y1 = math.max(y0 + 1, (y + 1) * h / 32)
      var x = 0
      while (x < 32) {
        val x0 = x * w / 32
        val x1 = math.max(x0 + 1, (x + 1) * w / 32)
        var acc = 0L
        var yy = y0
        while (yy < y1) {
          var xx = x0
          while (xx < x1) {
            val rgb = img.getRGB(xx, yy)
            acc += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114)
            xx += 1
          }
          yy += 1
        }
        lum(y * 32 + x) = acc / (1000.0 * (y1 - y0) * (x1 - x0))
        x += 1
      }
      y += 1
    }
    // separable 2-D DCT, but only the 8 output frequencies each direction —
    // rows first (32×8), then columns (8×8): 32·32·8 + 8·32·8 muls, not 32⁴
    val rowsOut = new Array[Double](32 * 8) // [y][v]
    y = 0
    while (y < 32) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var x = 0
        while (x < 32) { acc += lum(y * 32 + x) * Basis(v)(x); x += 1 }
        rowsOut(y * 8 + v) = acc
        v += 1
      }
      y += 1
    }
    val coeffs = new Array[Double](64) // [u][v]
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var yy = 0
        while (yy < 32) { acc += rowsOut(yy * 8 + v) * Basis(u)(yy); yy += 1 }
        coeffs(u * 8 + v) = acc
        v += 1
      }
      u += 1
    }
    // median threshold over the 64 low-frequency coefficients (even count →
    // lower middle; any fixed choice works, it only needs to be consistent)
    val sorted = java.util.Arrays.copyOf(coeffs, 64)
    java.util.Arrays.sort(sorted)
    val median = sorted(31)
    var hash = 0L
    var k = 0
    while (k < 64) {
      if (coeffs(k) > median) hash |= (1L << k)
      k += 1
    }
    hash
  }
}

/** DCT pHash as one codegen'd static call per row; NULL on undecodable
 * bytes. */
case class ImagePhashExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else PhashAlgos.phash64(v.asInstanceOf[Array[Byte]])
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val boxed = ctx.freshName("graftPhash")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${c.isNull}) {
        java.lang.Long $boxed = graft.pipeline.PhashAlgos.phash64(${c.value});
        if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.longValue(); }
      }""")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
