package graft.table

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Exprs
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Z-order (Morton-curve) clustering kernels for multi-column zone-map
 * locality — the engine's answer to Iceberg's `rewrite_data_files` with
 * `zorder(...)`: rows sort by an interleaved-bit curve over k columns so
 * that EVERY clustered column gets tight per-file min/max ranges in the
 * manifest, and [[IceLiteTable.scanRange]] prunes files for range
 * predicates on any of them (a linear `write.sort.columns` sort only
 * tightens its leading column).
 *
 * Pipeline: each column is first mapped by [[ZEncExpr]] to a SIGNED
 * order-preserving 64-bit encoding (so plain min/max aggregates compute the
 * bounds), then [[ZValueExpr]] scales each encoding to a `bits`-wide cell
 * index between the column's driver-computed [lo, hi] bounds and interleaves
 * the cell bits MSB-first. Both expressions are whole-stage-codegen'd; the
 * sort itself is Spark's normal `sortWithinPartitions` on the z-value.
 *
 * Bounds-scaled cells (rather than Iceberg's raw truncated byte prefixes)
 * keep the curve meaningful for narrow-range columns: a LONG column holding
 * 0..99 uses the full cell range instead of collapsing into one shared
 * high-bit prefix. Values outside the bounds (possible only if the data
 * changed between the bounds job and the sort, which the rewrite's single
 * plan precludes) clamp to the edge cells — layout-only, never correctness.
 */
object ZOrderKernel {
  /** IEEE-754 double to a signed-order-preserving long (the standard
    * total-order trick; -0.0 < +0.0, NaN sorts above +Inf — layout only). */
  def encDouble(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(v)
    // negatives: flip the magnitude bits (IEEE stores them reversed), keep
    // the sign so they stay below every positive under SIGNED comparison
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }

  /** First 8 UTF-8 bytes, big-endian, as a signed-order-preserving long
    * (unsigned byte order — the order Spark compares UTF8Strings in — with
    * the sign bit flipped so signed long comparison agrees). */
  def encString(s: UTF8String): Long = {
    val bytes = s.getBytes
    var u = 0L
    var i = 0
    while (i < 8) {
      u = (u << 8) | (if (i < bytes.length) bytes(i) & 0xffL else 0L)
      i += 1
    }
    u ^ java.lang.Long.MIN_VALUE
  }

  /** Cell index in [0, 2^bits) for encoded value `u` between encoded bounds
    * [lo, hi] — exact fixed-point arithmetic (no double round-trip, so
    * narrow integer ranges like 0..99 still spread across cells). */
  def cell(u: Long, lo: Long, hi: Long, bits: Int): Long = {
    val max = (1L << bits) - 1
    if (u <= lo) return 0L
    if (u >= hi) return max
    // Deltas are non-negative magnitudes but can exceed Long.MaxValue as
    // signed (lo near MIN_VALUE, hi near MAX_VALUE) — treat as unsigned and
    // shrink both until (span << bits) fits in a signed long.
    var x = u - lo
    var span = hi - lo
    val sig = 64 - java.lang.Long.numberOfLeadingZeros(span)
    val excess = sig - (62 - bits)
    if (excess > 0) { x >>>= excess; span >>>= excess }
    if (span <= 0L) return 0L
    (x << bits) / (span + 1)
  }

  /** MSB-first bit interleave of the k cell indices (k * bits <= 63). A
    * null element (null column value) takes cell 0 — nulls cluster first. */
  def zvalue(cells: ArrayData, los: Array[Long], his: Array[Long], bits: Int): Long = {
    val k = los.length
    val cs = new Array[Long](k)
    var i = 0
    while (i < k) {
      cs(i) = if (cells.isNullAt(i)) 0L else cell(cells.getLong(i), los(i), his(i), bits)
      i += 1
    }
    var z = 0L
    var b = bits - 1
    while (b >= 0) {
      var c = 0
      while (c < k) {
        z = (z << 1) | ((cs(c) >>> b) & 1L)
        c += 1
      }
      b -= 1
    }
    z
  }
}

/** Signed order-preserving 64-bit encoding of a sortable column (integrals,
  * floating point, date/timestamp, string 8-byte prefix). Null-propagating:
  * the z-value assembly maps null encodings to the first cell. */
case class ZEncExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | TimestampNTZType | FloatType | DoubleType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"z_enc requires an integral/floating/date/timestamp/string column, got ${other.catalogString}")
    }
  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case ByteType => input.asInstanceOf[Byte].toLong
    case ShortType => input.asInstanceOf[Short].toLong
    case IntegerType | DateType => input.asInstanceOf[Int].toLong
    case LongType | TimestampType | TimestampNTZType => input.asInstanceOf[Long]
    case FloatType => ZOrderKernel.encDouble(input.asInstanceOf[Float].toDouble)
    case DoubleType => ZOrderKernel.encDouble(input.asInstanceOf[Double])
    case StringType => ZOrderKernel.encString(input.asInstanceOf[UTF8String])
    case other => throw new IllegalStateException(s"z_enc: unsupported type $other")
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case FloatType | DoubleType =>
        defineCodeGen(ctx, ev, c => s"graft.table.ZOrderKernel.encDouble((double)$c)")
      case StringType =>
        defineCodeGen(ctx, ev, c => s"graft.table.ZOrderKernel.encString($c)")
      case _ =>
        defineCodeGen(ctx, ev, c => s"(long)($c)")
    }
  override protected def withNewChildInternal(newChild: Expression): ZEncExpr =
    copy(child = newChild)
  override def prettyName: String = "z_enc"
}

/** Interleaved z-value over an array of [[ZEncExpr]] encodings, with the
  * per-column encoded bounds baked in as codegen reference objects. */
case class ZValueExpr(child: Expression, los: Seq[Long], his: Seq[Long], bits: Int)
  extends UnaryExpression {
  require(los.size == his.size && los.nonEmpty, "one (lo, hi) bound pair per column")
  require(bits >= 1 && bits * los.size <= 63, s"bits=$bits x ${los.size} columns exceeds 63")
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"z_value requires ARRAY<LONG> of z_enc encodings, got ${other.catalogString}")
    }
  private lazy val losArr = los.toArray
  private lazy val hisArr = his.toArray
  override protected def nullSafeEval(input: Any): Any =
    ZOrderKernel.zvalue(input.asInstanceOf[ArrayData], losArr, hisArr, bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val losRef = ctx.addReferenceObj("zlos", losArr, "long[]")
    val hisRef = ctx.addReferenceObj("zhis", hisArr, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.table.ZOrderKernel.zvalue($c, $losRef, $hisRef, $bits)")
  }
  override protected def withNewChildInternal(newChild: Expression): ZValueExpr =
    copy(child = newChild)
  override def prettyName: String = "z_value"
}

object ZOrder {
  /** Column-level handle on [[ZEncExpr]]. */
  def enc(c: Column): Column = Exprs.column(ZEncExpr(Exprs.expression(c)))

  /** Per-column cell width: 16 bits (65k cells) per column is plenty of
    * resolution for file-level zone maps; narrower when many columns share
    * the 63-bit budget. */
  def bitsFor(numCols: Int): Int = math.max(1, math.min(16, 62 / numCols))

  /** The interleaved z-value column for `cols` (raw columns; encoding is
    * applied here) with encoded bounds `los`/`his`. */
  def zvalue(cols: Seq[Column], los: Seq[Long], his: Seq[Long]): Column = {
    val bits = bitsFor(cols.size)
    Exprs.column(ZValueExpr(
      Exprs.expression(org.apache.spark.sql.functions.array(cols.map(enc): _*)),
      los, his, bits))
  }
}
