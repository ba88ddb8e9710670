package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Structured row IDs (reference: impl/id/model.scala, docs/advanced/
 * rowIdFunctions.md): every id is struct<{prefix}_base: int,
 * {prefix}_i0..iN: long> where base packs the payload length (low 16 bits)
 * and a 4-bit type header at bit 24 (reference model.scala:374-385).
 */
object IdModel {
  val RandomHeader = 0
  val GuaranteedUniqueHeader = 1
  val FieldBasedHeader = 2
  val ProvidedHeader = 3

  def base(nLongs: Int, header: Int): Int = nLongs | (header << 24)
  def headerOf(base: Int): Int = (base >> 24) & 0xf
  def lengthOf(base: Int): Int = base & 0xffff

  def idType(prefix: String, nLongs: Int): StructType = StructType(
    StructField(s"${prefix}_base", IntegerType, nullable = false) +:
      (0 until nLongs).map(i => StructField(s"${prefix}_i$i", LongType, nullable = false)))

  def typeName(header: Int): String = header match {
    case RandomHeader => "random"
    case GuaranteedUniqueHeader => "guaranteedunique"
    case FieldBasedHeader => "fieldbased"
    case ProvidedHeader => "provided"
    case _ => "unknown"
  }

  /** 48-bit MAC of the first hardware interface; stable fallback hash of
   * hostname when unavailable (containers). */
  lazy val mac48: Long = {
    import scala.jdk.CollectionConverters._
    val macs = java.net.NetworkInterface.getNetworkInterfaces.asScala
      .map(_.getHardwareAddress).filter(_ != null).toList
    val bytes = macs.headOption.getOrElse {
      val hn = java.net.InetAddress.getLocalHost.getHostName.getBytes("UTF-8")
      java.security.MessageDigest.getInstance("MD5").digest(hn).take(6)
    }
    bytes.take(6).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
  }

  /** ms epoch 2020-01-01T00:00Z (reference model.scala guaranteedUniqueEpoch). */
  val epoch2020: Long = java.time.Instant.parse("2020-01-01T00:00:00Z").toEpochMilli
}

/**
 * unique_id(prefix) — guaranteed-unique 160-bit id:
 * i0 = mac48<<16 | partition, i1 = msSinceEpoch<<22 | rowCounter (22 bits,
 * overflow bumps ms). Unique across executors with zero coordination.
 */
case class GuaranteedUniqueIdExpression(prefix: String)
    extends LeafExpression with Nondeterministic with CodegenFallback {
  @transient private var i0 = 0L
  @transient private var ms = 0L
  @transient private var counter = 0L
  override protected def initializeInternal(partitionIndex: Int): Unit = {
    i0 = (IdModel.mac48 << 16) | (partitionIndex.toLong & 0xffffL)
    ms = System.currentTimeMillis() - IdModel.epoch2020
    counter = 0L
  }
  override def nullable: Boolean = false
  override def dataType: DataType = IdModel.idType(prefix, 2)
  override protected def evalInternal(input: InternalRow): Any = {
    if (counter >= (1L << 22)) { ms += 1; counter = 0 }
    val i1 = (ms << 22) | counter
    counter += 1
    InternalRow(IdModel.base(2, IdModel.GuaranteedUniqueHeader), i0, i1)
  }
}

/** rng_id(prefix[,algo[,seed]]) — 128-bit random id. */
case class RngIdExpression(prefix: String, seed: Long)
    extends LeafExpression with RngBase with CodegenFallback {
  override def dataType: DataType = IdModel.idType(prefix, 2)
  override protected def evalInternal(input: InternalRow): Any =
    InternalRow(IdModel.base(2, IdModel.RandomHeader), rng.nextLong(), rng.nextLong())
}

/** Generic re-tag of a longs payload: field_based_id / provided_id families.
 * Codegen: one instance call (the id fns run in ingestion projections over
 * whole tables — keep them fused). */
case class LongsIdExpression(prefix: String, header: Int, child: Expression)
    extends UnaryExpression {
  // array<long> payloads declare a fixed 2-long id (the type must be known at
  // analysis time); eval enforces length==2 with a clear error rather than
  // mis-casting (reference requires a fixed long count too)
  @transient private lazy val nLongs = child.dataType match {
    case s: StructType if s.fields.forall(_.dataType == LongType) => s.fields.length
    case ArrayType(LongType, _) => 2
    case other => throw new IllegalArgumentException(
      s"id payload must be a struct of longs or array<long>, got ${other.sql}")
  }
  override def dataType: DataType = IdModel.idType(prefix, nLongs)
  override def nullSafeEval(v: Any): Any = retag(v)
  /** Codegen entry point. */
  def retag(v: Any): InternalRow = {
    val longs = v match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        require(a.numElements() == nLongs,
          s"array<long> id payload must have exactly $nLongs elements, got ${a.numElements()}")
        (0 until nLongs).map(a.getLong)
      case row: InternalRow => (0 until nLongs).map(row.getLong)
    }
    InternalRow.fromSeq(IdModel.base(longs.length, header) +: longs)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val ref = ctx.addReferenceObj("graftLongsId", this, classOf[LongsIdExpression].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.retag($c);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** id_size(id) → total bits (32 + 64*n) — a plan-time constant. */
case class IdSizeExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  @transient private lazy val bits = child.dataType match {
    case s: StructType => 32 + 64 * (s.fields.length - 1)
    case other => throw new IllegalArgumentException(s"id_size expects an id struct, got ${other.sql}")
  }
  override def nullSafeEval(v: Any): Any = bits
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, _ => s"$bits")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** id_raw_type(id) → type name decoded from the header bits. */
case class IdRawTypeExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = IdAlgos.rawType(v.asInstanceOf[InternalRow])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"graft.functions.IdAlgos.rawType($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static forwarders for generated code. */
object IdAlgos {
  def rawType(row: InternalRow): UTF8String =
    UTF8String.fromString(IdModel.typeName(IdModel.headerOf(row.getInt(0))))
}

/** id_base64(id | base, i0, i1…) → url-safe base64 of the packed bytes. */
case class IdBase64Expression(children: Seq[Expression]) extends Expression {
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  @transient private lazy val structArity = children match {
    case Seq(one) if one.dataType.isInstanceOf[StructType] =>
      Some(one.dataType.asInstanceOf[StructType].fields.length)
    case _ => None
  }

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input)).toArray[Any]
    renderParts(vals)
  }

  /** Codegen entry point: takes the already-evaluated (non-null) children. */
  def renderParts(vals: Array[Any]): UTF8String = {
    val parts: Seq[Any] = structArity match {
      case Some(n) =>
        if (vals(0) == null) return null
        val r = vals(0).asInstanceOf[InternalRow]
        (0 until n).map(i => r.get(i, if (i == 0) IntegerType else LongType))
      case None => vals.toSeq
    }
    if (parts.contains(null)) return null
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * (parts.length - 1))
    bb.putInt(parts.head.asInstanceOf[Int])
    parts.tail.foreach(l => bb.putLong(l.asInstanceOf[Long]))
    UTF8String.fromString(java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(bb.array()))
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.{Block, EmptyBlock}
    val gens = children.map(_.genCode(ctx))
    val ref = ctx.addReferenceObj("graftIdB64", this, classOf[IdBase64Expression].getName)
    val arr = ctx.freshName("graftParts")
    val fill = gens.zipWithIndex.map { case (g, i) =>
      s"$arr[$i] = ${g.isNull} ? null : (Object) ${g.value};"
    }.mkString("\n")
    val childCode = gens.map(_.code).foldLeft(EmptyBlock: Block)(_ + _)
    ev.copy(code = code"""
      $childCode
      Object[] $arr = new Object[${gens.length}];
      $fill
      org.apache.spark.unsafe.types.UTF8String ${ev.value} = $ref.renderParts($arr);
      boolean ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(children = cs)
}

/** id_from_base64(str[, nLongs=2]) → id struct (null on malformed input). */
case class IdFromBase64Expression(child: Expression, nLongs: Int)
    extends UnaryExpression {
  override def dataType: DataType = IdModel.idType("id", nLongs)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = decode(v.asInstanceOf[UTF8String])
  /** Codegen entry point: null on malformed input. */
  def decode(v: UTF8String): InternalRow =
    try {
      val bytes = java.util.Base64.getUrlDecoder.decode(v.toString)
      if (bytes.length != 4 + 8 * nLongs) null
      else {
        val bb = java.nio.ByteBuffer.wrap(bytes)
        InternalRow.fromSeq(bb.getInt() +: (0 until nLongs).map(_ => bb.getLong()))
      }
    } catch { case _: IllegalArgumentException => null }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val ref = ctx.addReferenceObj("graftIdFromB64", this, classOf[IdFromBase64Expression].getName)
    val res = ctx.freshName("graftDecoded")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.InternalRow $res = $ref.decode($c);
      if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }""")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
