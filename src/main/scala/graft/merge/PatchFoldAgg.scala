package graft.merge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Exprs
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Column-level patch fold per group — the intra-batch kernel for PARTIAL
 * CDC updates (Debezium streams without full row images, Mongo
 * `$set`-style change events): a change row's null payload column means
 * "unchanged", so the group's final value per column is the column's LAST
 * NON-NULL value by LSN, with deletes resetting the key (a value written
 * before a delete never survives past it).
 *
 * Input: `struct(lsn long, op string, after struct, reset long?)` — the
 * canonical change struct plus an optional pre-folded reset watermark
 * (the max delete-LSN a previously folded partial row already absorbed;
 * raw change events pass null). Output: `struct(lsn, op, after, reset)` —
 * `lsn` = group max, `op` = "d" iff the last event is a delete, `after` =
 * per-column survivors (null when deleted), `reset` = max delete-LSN seen
 * (null when none) so downstream merges know NOT to coalesce with older
 * state.
 *
 * The fold is ASSOCIATIVE and COMMUTATIVE: each buffer keeps, per column,
 * the max-LSN non-null candidate newer than its own delete watermark;
 * combining takes the max watermark, re-drops candidates at or below it,
 * then keeps the newer candidate per column. A candidate dropped locally
 * would also be dropped globally (the global watermark is >= the local
 * one), and a candidate kept locally is re-checked on every combine —
 * so partial aggregation, two-level salted folds, MOR read-time
 * resolution over per-epoch delta files, and COW epoch-by-epoch
 * composition all compute the same result as one fold over the full
 * history. Runs through ObjectHashAggregate (hash shape, map-side
 * partials), same as [[LastWriteWinsAgg]].
 */
case class PatchFoldAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PatchFoldAgg.Buf] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType if s.size == 4 && s(0).dataType == LongType &&
        s(1).dataType == StringType && s(2).dataType.isInstanceOf[StructType] &&
        s(3).dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"patch_fold expects struct(lsn long, op string, after struct, reset long), got ${other.catalogString}")
    }

  @transient private lazy val afterType: StructType =
    child.dataType.asInstanceOf[StructType](2).dataType.asInstanceOf[StructType]
  @transient private lazy val n = afterType.size
  @transient private lazy val fieldTypes: Array[DataType] = afterType.fields.map(_.dataType)
  @transient private lazy val bufSchema = StructType(Seq(
    StructField("maxLsn", LongType, nullable = false),
    StructField("del", LongType, nullable = false),
    StructField("colLsn", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("vals", StructType(afterType.fields.map(f => f.copy(nullable = true))), nullable = false)))
  @transient private lazy val toUnsafe = UnsafeProjection.create(Array[DataType](bufSchema))
  @transient private lazy val wrapper = new GenericInternalRow(1)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("lsn", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("after", StructType(afterType.fields.map(_.copy(nullable = true))), nullable = true),
    StructField("reset", LongType, nullable = true)))

  override def createAggregationBuffer(): PatchFoldAgg.Buf = new PatchFoldAgg.Buf(n)

  private def dropStale(buf: PatchFoldAgg.Buf): Unit = {
    var i = 0
    while (i < buf.n) {
      if (buf.colLsn(i) != Long.MinValue && buf.colLsn(i) <= buf.del) {
        buf.colLsn(i) = Long.MinValue
        buf.vals(i) = null
      }
      i += 1
    }
  }

  override def update(buf: PatchFoldAgg.Buf, input: InternalRow): PatchFoldAgg.Buf = {
    val v = child.eval(input).asInstanceOf[InternalRow]
    if (v == null) return buf
    val lsn = v.getLong(0)
    val op = v.getUTF8String(1)
    val isDel = op != null && op.numBytes() == 1 && op.getByte(0) == 'd'
    val reset = if (v.isNullAt(3)) Long.MinValue else v.getLong(3)
    val newDel = math.max(buf.del, math.max(reset, if (isDel) lsn else Long.MinValue))
    if (newDel > buf.del) { buf.del = newDel; dropStale(buf) }
    if (!isDel && !v.isNullAt(2)) {
      val after = v.getStruct(2, n)
      var i = 0
      while (i < n) {
        if (!after.isNullAt(i) && lsn > buf.del && lsn > buf.colLsn(i)) {
          buf.colLsn(i) = lsn
          buf.vals(i) = InternalRow.copyValue(after.get(i, fieldTypes(i)))
        }
        i += 1
      }
    }
    if (lsn > buf.maxLsn) buf.maxLsn = lsn
    buf
  }

  override def merge(a: PatchFoldAgg.Buf, b: PatchFoldAgg.Buf): PatchFoldAgg.Buf = {
    if (b.maxLsn == Long.MinValue) return a
    if (a.maxLsn == Long.MinValue) return b
    a.maxLsn = math.max(a.maxLsn, b.maxLsn)
    a.del = math.max(a.del, b.del)
    dropStale(a)
    var i = 0
    while (i < a.n) {
      if (b.colLsn(i) > a.del && b.colLsn(i) > a.colLsn(i)) {
        a.colLsn(i) = b.colLsn(i)
        a.vals(i) = b.vals(i)
      }
      i += 1
    }
    a
  }

  override def eval(buf: PatchFoldAgg.Buf): Any =
    if (buf.maxLsn == Long.MinValue) null
    else {
      val isDel = buf.del == buf.maxLsn
      new GenericInternalRow(Array[Any](
        buf.maxLsn,
        UTF8String.fromString(if (isDel) "d" else "u"),
        if (isDel) null else new GenericInternalRow(buf.vals.clone()),
        if (buf.del == Long.MinValue) null else java.lang.Long.valueOf(buf.del)))
    }

  override def serialize(buf: PatchFoldAgg.Buf): Array[Byte] = {
    val row = new GenericInternalRow(Array[Any](
      buf.maxLsn, buf.del,
      new GenericArrayData(buf.colLsn),
      new GenericInternalRow(buf.vals.clone())))
    wrapper.update(0, row)
    toUnsafe(wrapper).copy().getBytes
  }

  override def deserialize(bytes: Array[Byte]): PatchFoldAgg.Buf = {
    val r = new UnsafeRow(1)
    r.pointTo(bytes, bytes.length)
    val s = r.getStruct(0, 4)
    val buf = new PatchFoldAgg.Buf(n)
    buf.maxLsn = s.getLong(0)
    buf.del = s.getLong(1)
    val lsns = s.getArray(2)
    val vals = s.getStruct(3, n)
    var i = 0
    while (i < n) {
      buf.colLsn(i) = lsns.getLong(i)
      buf.vals(i) =
        if (vals.isNullAt(i)) null
        else InternalRow.copyValue(vals.get(i, fieldTypes(i)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PatchFoldAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PatchFoldAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): PatchFoldAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "patch_fold"
}

object PatchFoldAgg {
  /** Mutable per-group state: the group's max LSN, its delete watermark,
    * and per payload column the surviving candidate (value + the LSN that
    * wrote it; MinValue = no candidate). */
  final class Buf(val n: Int) {
    var maxLsn: Long = Long.MinValue
    var del: Long = Long.MinValue
    val colLsn: Array[Long] = Array.fill(n)(Long.MinValue)
    val vals: Array[Any] = new Array[Any](n)
  }

  /** Column form: patch_fold(struct(lsn, op, after, reset)) ->
    * struct(lsn, op, after, reset). */
  def fold(structCol: Column): Column =
    Exprs.column(PatchFoldAgg(Exprs.expression(structCol)).toAggregateExpression())
}
