package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KLL quantile sketch (Karnin–Lang–Liberty, FOCS'16) as a
  * `TypedImperativeAggregate` — the third mergeable-summary family next
  * to HLL distinct (`llm_distinct_sketch`) and Misra-Gries heavy
  * hitters ([[FreqItemsAgg]]). Exact percentiles (`percentile`) sort or
  * bucket the full value stream; at 100 TB the per-group value list IS
  * the bottleneck. A KLL sketch is O(k·log n) space, its merge is
  * associative and order-insensitive on the rank guarantee, so map-side
  * partials carry kilobytes per partition — and the SAME serialized
  * bytes persist next to the data (datasketches wire format), letting
  * new shards update corpus quantile stats without rescanning old ones
  * (KllAggSpec proves the parquet round-trip).
  *
  * Guarantee (k=200): rank error ≤ ~1.65% with 99% confidence — the
  * estimate at rank r is a true value whose exact rank is within
  * r ± 0.0165. The declared query checks exactly that bound, oracled
  * the `agg_approx` way (both engines assert their own sketch's rank
  * error; both booleans are true).
  *
  * Backed by `datasketches-java` from the Spark distribution — the same
  * library Spark's own `hll_sketch_agg` uses; no new dependency.
  */
case class KllQuantileAgg(
    child: Expression,
    k: Int,
    ranks: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b)
    a
  }

  /** struct(n, quantile value per requested rank). INCLUSIVE search
    * (value at the smallest true rank ≥ r) — every returned value is an
    * actual stream element, never an interpolation, which is what makes
    * the rank-error check against the exact CDF well-defined. */
  override def eval(buf: KllDoublesSketch): Any = {
    val qs =
      if (buf.isEmpty) ranks.map(_ => 0.0)
      else ranks.map(r => buf.getQuantile(r, QuantileSearchCriteria.INCLUSIVE))
    InternalRow(buf.getN, new GenericArrayData(qs))
  }

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("quantiles", ArrayType(DoubleType, containsNull = false))))

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kll_quantiles"

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object KllQuantileAgg {
  /** `kll_quantiles(x, k, ranks)` → struct(n, array of value-at-rank). */
  def kll_quantiles(x: Column, k: Int, ranks: Seq[Double]): Column =
    GraftColumnBridge.toColumn(
      KllQuantileAgg(GraftColumnBridge.toExpression(x.cast("double")), k, ranks)
        .toAggregateExpression())
}
