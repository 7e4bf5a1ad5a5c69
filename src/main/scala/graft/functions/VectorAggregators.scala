package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2 Part B row B49): a mergeable centroid
  * aggregator over embedding vectors.
  *
  * `Aggregator[IN, BUF, OUT]` gives partial (map-side) buffers merged at
  * the reducer — the same partial/final shape as built-in aggregates, so
  * the shuffle carries one (dim+1)-double buffer per group per partition,
  * not the vectors. (Float caveat: cross-partition merge order makes the
  * final double sums order-dependent in the last ulp — callers that need
  * oracle-exact output must round; see SURVEY.md §7.3.)
  */
object VectorAggregators {

  final case class VecBuf(var sum: Array[Double], var n: Long)

  /** Element-wise mean of float vectors per group. */
  object Centroid extends Aggregator[Seq[Float], VecBuf, Seq[Double]] {
    override def zero: VecBuf = VecBuf(Array.empty, 0L)

    override def reduce(b: VecBuf, v: Seq[Float]): VecBuf = {
      if (v.isEmpty) return b // empty vector: no dimension, no count —
                              // keeps sum.isEmpty <=> n == 0 for merge
      if (b.sum.isEmpty) b.sum = new Array[Double](v.length)
      var i = 0
      while (i < v.length && i < b.sum.length) { b.sum(i) += v(i); i += 1 }
      b.n += 1
      b
    }

    override def merge(a: VecBuf, b: VecBuf): VecBuf = {
      if (a.sum.isEmpty) b
      else if (b.sum.isEmpty) a
      else {
        var i = 0
        while (i < a.sum.length && i < b.sum.length) { a.sum(i) += b.sum(i); i += 1 }
        a.n += b.n
        a
      }
    }

    override def finish(b: VecBuf): Seq[Double] =
      if (b.n == 0) Seq.empty else b.sum.map(_ / b.n).toSeq

    override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  def centroid(c: Column): Column = Centroid.toColumn.name("centroid")
}
