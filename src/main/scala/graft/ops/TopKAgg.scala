package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Exprs
import org.apache.spark.sql.types._

/**
 * Per-group top-k (score desc, id asc tie-break) as a typed imperative
 * aggregate with a bounded-heap buffer. The 100 TB shape for ANN ranking:
 * Spark's partial aggregation runs the heap MAP-SIDE, so each partition
 * contributes at most k candidates per query to the shuffle — O(P x k)
 * shuffled rows per query instead of the full N-candidate rank shuffle a
 * window row_number() needs.
 *
 * Buffer = bounded min-heap keyed by (score, -id); merge folds heaps.
 * Output: array<struct<score double, id long>> sorted best-first.
 */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Heap] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKAgg.entryType, containsNull = false)

  override def createAggregationBuffer(): TopKAgg.Heap = new TopKAgg.Heap(k)

  override def update(h: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      h.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    h
  }

  override def merge(a: TopKAgg.Heap, b: TopKAgg.Heap): TopKAgg.Heap = { a.absorb(b); a }

  override def eval(h: TopKAgg.Heap): Any = {
    val sorted = h.sortedDesc
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(h: TopKAgg.Heap): Array[Byte] = {
    val entries = h.entries
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + entries.length * 16)
    bb.putInt(k)
    bb.putInt(entries.length)
    entries.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val kk = bb.getInt
    val n = bb.getInt
    val h = new TopKAgg.Heap(kk)
    var j = 0
    while (j < n) { h.offer(bb.getDouble, bb.getLong); j += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "top_k"
}

object TopKAgg {
  val entryType: StructType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))

  /** Bounded top-k keeper: better = higher score, then lower id. */
  final class Heap(val k: Int) {
    private val ord = Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }
    // min-heap of the CURRENT top-k under "better first" ordering reversed:
    // the head is the worst kept entry.
    private val q = new scala.collection.mutable.PriorityQueue[(Double, Long)]()(ord)

    def offer(s: Double, i: Long): Unit = {
      if (q.size < k) q.enqueue((s, i))
      else {
        val worst = q.head
        if (s > worst._1 || (s == worst._1 && i < worst._2)) { q.dequeue(); q.enqueue((s, i)) }
      }
    }
    def absorb(other: Heap): Unit = other.entries.foreach { case (s, i) => offer(s, i) }
    def entries: Array[(Double, Long)] = q.toArray
    def sortedDesc: Array[(Double, Long)] = entries.sortBy { case (s, i) => (-s, i) }
  }

  /** Column form: top_k(score, id, k) -> array<struct<score,id>> best-first. */
  def topK(score: Column, id: Column, k: Int): Column =
    Exprs.column(TopKAgg(Exprs.expression(score), Exprs.expression(id), k)
      .toAggregateExpression())
}
