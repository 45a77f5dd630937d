package graft.merge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Exprs
import org.apache.spark.sql.types.{DataType, LongType, StructType}

/**
 * Last-write-wins per group: keeps the child struct with the greatest value
 * of its FIRST field (the LSN, a non-null long — the CDC total order per
 * key, `smt/Outbox.java:79-97` replay semantics).
 *
 * This is the merge engine's intra-batch dedup kernel. As a
 * TypedImperativeAggregate it runs through ObjectHashAggregate with a
 * PARTIAL pass before the shuffle, so the shuffle carries one buffer per
 * distinct (bucket, key) per map partition instead of every raw change
 * event, and the dedup is ONE operator — the previous formulation (max-lsn
 * hash agg + two self-equi-joins) read the full shuffled batch three times
 * and planned three exchanges, which profiling showed dominated both the
 * per-epoch serial (Catalyst) time and the shuffle I/O at high parallelism.
 *
 * Ties (equal LSN) keep the first-seen buffer: duplicate (key, lsn) events
 * are byte-identical redeliveries by the CDC contract, so the choice is
 * semantically immaterial; the aggregate still collapses them to one row.
 *
 * Buffer = UnsafeRow(1 struct field); serialize is the row's bytes
 * (no-copy), so spills and partial-buffer shuffles stay cheap.
 */
case class LastWriteWinsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[UnsafeRow] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType if s.fields.nonEmpty && s.fields.head.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"last_write_wins expects struct(lsn long, ...) input, got ${other.catalogString}")
    }

  @transient private lazy val numFields = child.dataType.asInstanceOf[StructType].size
  @transient private lazy val toUnsafe = UnsafeProjection.create(Array[DataType](child.dataType))
  @transient private lazy val wrapper = new GenericInternalRow(1)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = child.dataType

  override def createAggregationBuffer(): UnsafeRow = null

  override def update(buf: UnsafeRow, input: InternalRow): UnsafeRow = {
    val v = child.eval(input).asInstanceOf[InternalRow]
    if (v == null) buf
    else if (buf == null || v.getLong(0) > buf.getStruct(0, numFields).getLong(0)) {
      wrapper.update(0, v)
      toUnsafe(wrapper).copy()
    } else buf
  }

  override def merge(a: UnsafeRow, b: UnsafeRow): UnsafeRow =
    if (a == null) b
    else if (b == null) a
    else if (b.getStruct(0, numFields).getLong(0) > a.getStruct(0, numFields).getLong(0)) b
    else a

  override def eval(buf: UnsafeRow): Any =
    if (buf == null) null else buf.getStruct(0, numFields)

  override def serialize(buf: UnsafeRow): Array[Byte] =
    if (buf == null) Array.emptyByteArray else buf.getBytes

  override def deserialize(bytes: Array[Byte]): UnsafeRow =
    if (bytes.isEmpty) null
    else {
      val r = new UnsafeRow(1)
      r.pointTo(bytes, bytes.length)
      r
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): LastWriteWinsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LastWriteWinsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): LastWriteWinsAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "last_write_wins"
}

object LastWriteWinsAgg {
  /** Column form: last_write_wins(struct(lsn, ...)) -> the struct with max lsn. */
  def lww(structCol: Column): Column =
    Exprs.column(LastWriteWinsAgg(Exprs.expression(structCol)).toAggregateExpression())
}
