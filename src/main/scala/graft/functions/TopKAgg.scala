package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k-per-group aggregate (SURVEY.md §2 B49 — a custom
  * `TypedImperativeAggregate` for an operator Spark genuinely lacks).
  *
  * The built-in way to take the top k rows per group is a window
  * `row_number()` — which sorts EVERY row of every group. This aggregate
  * keeps a k-element min-heap per group per partition, so the partial
  * (map-side) phase reduces each partition to ≤ k pairs per group and the
  * shuffle moves k·groups·partitions pairs instead of the whole table:
  * the difference between a sort of 10¹¹ rows and a merge of k-heaps at
  * 100 TB.
  *
  * Ordering is total — (value, payload) lexicographic, descending — so
  * results are deterministic under ties and any partitioning.
  * Output: array<struct<value double, payload bigint>> sorted descending.
  */
case class TopKAgg(
    valueExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  // min-heap: weakest kept pair at the head, evicted first
  private val heapOrd: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long.reverse)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(heapOrd)

  override def update(
      heap: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = valueExpr.eval(input)
    val p = payloadExpr.eval(input)
    if (v != null && p != null)
      offer(heap, (v.asInstanceOf[Double], p.asInstanceOf[Long]))
    heap
  }

  override def merge(
      a: mutable.PriorityQueue[(Double, Long)],
      b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach(offer(a, _))
    a
  }

  private def offer(heap: mutable.PriorityQueue[(Double, Long)],
      pair: (Double, Long)): Unit = {
    if (heap.size < k) heap.enqueue(pair)
    else if (Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
        .gt(pair, heap.head)) {
      heap.dequeue(); heap.enqueue(pair)
    }
  }

  override def eval(heap: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = heap.toSeq.sorted(
      Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long.reverse))
    new GenericArrayData(sorted.map { case (v, p) => InternalRow(v, p) })
  }

  override def serialize(heap: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + heap.size * 16)
    buf.putInt(heap.size)
    heap.foreach { case (v, p) => buf.putDouble(v); buf.putLong(p) }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val heap = createAggregationBuffer()
    (0 until n).foreach(_ => heap.enqueue((buf.getDouble, buf.getLong)))
    heap
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", DoubleType),
      StructField("payload", LongType))),
    containsNull = false)

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(valueExpr, payloadExpr)
  override def prettyName: String = "top_k_by"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), payloadExpr = newChildren(1))
}

object TopKAgg {
  /** `top_k_by(value, payload, k)` — array of the k largest
    * (value, payload) pairs per group, descending. */
  def top_k_by(value: Column, payload: Column, k: Int): Column =
    GraftColumnBridge.toColumn(
      TopKAgg(
        GraftColumnBridge.toExpression(value.cast("double")),
        GraftColumnBridge.toExpression(payload.cast("long")),
        k).toAggregateExpression())
}
