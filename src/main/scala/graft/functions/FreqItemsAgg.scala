package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary (heavy hitters) as a
  * `TypedImperativeAggregate` — the candidate pass of the scalable
  * two-pass heavy-hitters pipeline (SURVEY.md §2 B49 family; the exact
  * `groupBy(item).count()` alternative shuffles one row per DISTINCT
  * item, which at 100 TB of open-vocabulary tokens is itself the
  * bottleneck).
  *
  * Guarantee (Misra-Gries '82): after summarizing n items with capacity
  * k, every item whose true count exceeds n/(k+1) is present in the
  * summary, and each kept count is a lower bound within n/(k+1) of the
  * true count. The merge (pairwise count-sum, then subtract the
  * (k+1)-th largest and drop non-positives) preserves the bound
  * (Agarwal et al., "Mergeable Summaries", PODS'12) — which is exactly
  * what makes it a valid PARTIAL aggregate: map-side partials are ≤ k
  * entries per partition, the shuffle carries k·partitions pairs, never
  * the token stream.
  *
  * Output is `struct<total bigint, items array<struct<item string,
  * lb bigint>>>` — `total` rides along so the caller gets the corpus
  * size from the same scan (no second pass for the denominator); items
  * are candidates ONLY (counts are lower bounds) and callers needing
  * exact figures re-count just the candidates (see
  * `TextOps.heavyWords`).
  */
case class FreqItemsAgg(
    itemExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqItemsAgg.MGSummary] {

  import FreqItemsAgg.MGSummary

  override def createAggregationBuffer(): MGSummary =
    new MGSummary(0L, mutable.HashMap.empty)

  override def update(buf: MGSummary, input: InternalRow): MGSummary = {
    val v = itemExpr.eval(input)
    if (v != null) {
      // copy out of Spark's reused UTF8String buffer before keying on it
      val item = v.asInstanceOf[UTF8String].toString
      buf.total += 1L
      buf.counts.get(item) match {
        case Some(c) => buf.counts(item) = c + 1L
        case None if buf.counts.size < k => buf.counts(item) = 1L
        case None =>
          // classic MG step: a full summary + unseen item decrements
          // every counter; zeros vacate slots for later heavy items
          val dead = mutable.ArrayBuffer.empty[String]
          buf.counts.foreach { case (key, c) =>
            if (c == 1L) dead += key else buf.counts(key) = c - 1L
          }
          dead.foreach(buf.counts.remove)
      }
    }
    buf
  }

  override def merge(a: MGSummary, b: MGSummary): MGSummary = {
    a.total += b.total
    b.counts.foreach { case (key, c) =>
      a.counts(key) = a.counts.getOrElse(key, 0L) + c
    }
    if (a.counts.size > k) {
      // subtract the (k+1)-th largest count from everything and drop
      // non-positives — the mergeable-summaries shrink that keeps the
      // n/(k+1) error bound
      val d = a.counts.values.toArray.sorted(Ordering.Long.reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      a.counts.foreach { case (key, c) =>
        if (c - d <= 0L) dead += key else a.counts(key) = c - d
      }
      dead.foreach(a.counts.remove)
    }
    a
  }

  override def eval(buf: MGSummary): Any = {
    val sorted = buf.counts.toSeq
      .sortBy { case (item, lb) => (-lb, item) }
      .map { case (item, lb) => InternalRow(UTF8String.fromString(item), lb) }
    InternalRow(buf.total, new GenericArrayData(sorted))
  }

  override def serialize(buf: MGSummary): Array[Byte] = {
    val entries = buf.counts.toSeq.map { case (item, c) =>
      (item.getBytes(StandardCharsets.UTF_8), c)
    }
    val size = 8 + 4 + entries.map(e => 4 + e._1.length + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(buf.total)
    bb.putInt(entries.size)
    entries.foreach { case (bytes, c) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MGSummary(bb.getLong, mutable.HashMap.empty)
    val n = bb.getInt
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.counts(new String(arr, StandardCharsets.UTF_8)) = bb.getLong
    }
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("items", ArrayType(
      StructType(Seq(
        StructField("item", StringType),
        StructField("lb", LongType))),
      containsNull = false))))

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(itemExpr)
  override def prettyName: String = "freq_items_mg"

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(itemExpr = newChildren(0))
}

object FreqItemsAgg {
  /** Mutable MG state: stream length so far + the ≤ k counters. */
  final class MGSummary(var total: Long, val counts: mutable.HashMap[String, Long])

  /** `freq_items_mg(item, k)` — struct(total, candidate items whose true
    * frequency can exceed total/(k+1)), counts as lower bounds. */
  def freq_items_mg(item: Column, k: Int): Column =
    GraftColumnBridge.toColumn(
      FreqItemsAgg(GraftColumnBridge.toExpression(item.cast("string")), k)
        .toAggregateExpression())
}
