package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.FreqItemsAgg

/** Misra-Gries guarantee pins (the properties `llm_heavy_words` leans
  * on): every item with true count > n/(k+1) survives, kept counts are
  * lower bounds within n/(k+1), the serialized partial round-trips, and
  * the guarantee holds under ANY partitioning (the merge/shrink path).
  * Note the sketch CONTENTS legitimately vary with merge order — only
  * the guarantee is partition-invariant, which is why heavyWords
  * re-counts candidates exactly before thresholding. */
class FreqItemsAggSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish corpus: a few heavy items over a wide once-only tail that
    * hammers the decrement path. Returns (df, exact counts). */
  private def corpus(): (org.apache.spark.sql.DataFrame, Map[String, Long]) = {
    val items =
      Seq.fill(400)("alpha") ++ Seq.fill(250)("beta") ++
        Seq.fill(120)("gamma") ++ Seq.fill(40)("delta") ++
        (1 to 800).map(i => s"tail_$i")
    val exact = items.groupBy(identity).map { case (w, ws) =>
      w -> ws.size.toLong }
    (items.toDF("item"), exact)
  }

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int)
      : (Long, Map[String, Long]) = {
    val row = df.agg(FreqItemsAgg.freq_items_mg(col("item"), k).as("s"))
      .select(col("s.total"), col("s.items")).head()
    val total = row.getLong(0)
    val kept = row.getSeq[org.apache.spark.sql.Row](1)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (total, kept)
  }

  private def checkGuarantee(k: Int, total: Long,
      kept: Map[String, Long], exact: Map[String, Long]): Unit = {
    val bound = total.toDouble / (k + 1)
    assert(total == exact.values.sum)
    assert(kept.size <= k)
    // (a) every item above the bound is present
    exact.foreach { case (w, c) =>
      if (c > bound) assert(kept.contains(w), s"heavy '$w' ($c > $bound) lost")
    }
    // (b) kept counts are lower bounds within the bound
    kept.foreach { case (w, lb) =>
      val truth = exact.getOrElse(w, 0L)
      assert(lb <= truth, s"'$w' lb=$lb exceeds true $truth")
      assert(truth - lb <= bound, s"'$w' lb=$lb drifted >$bound from $truth")
    }
  }

  test("MG guarantee on a repartition(8) corpus at k=10") {
    val (df, exact) = corpus()
    val (total, kept) = sketch(df.repartition(8), 10)
    checkGuarantee(10, total, kept, exact)
  }

  test("guarantee invariant to partitioning; totals exact under both") {
    val (df, exact) = corpus()
    for (parts <- Seq(1, 13)) {
      val (total, kept) = sketch(df.repartition(parts), 6)
      checkGuarantee(6, total, kept, exact)
      // the heavy set itself must survive regardless of merge order
      assert(kept.contains("alpha") && kept.contains("beta"))
    }
  }

  test("serialize/deserialize round-trips the summary exactly") {
    val agg = FreqItemsAgg(BoundReference(0, StringType, nullable = true), 4)
    val buf = agg.createAggregationBuffer()
    Seq("a", "a", "b", "c", "d", "e", "a", "b").foreach { w =>
      agg.update(buf, InternalRow(UTF8String.fromString(w)))
    }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.total == buf.total)
    assert(back.counts.toMap == buf.counts.toMap)
  }

  test("update path: k distinct items fill slots, k+1-th decrements") {
    val agg = FreqItemsAgg(BoundReference(0, StringType, nullable = true), 2)
    val buf = agg.createAggregationBuffer()
    def put(w: String): Unit = agg.update(buf, InternalRow(UTF8String.fromString(w)))
    put("x"); put("x"); put("y") // {x:2, y:1}
    assert(buf.counts.toMap == Map("x" -> 2L, "y" -> 1L))
    put("z") // unseen + full: decrement all, y vacates
    assert(buf.counts.toMap == Map("x" -> 1L))
    assert(buf.total == 4L)
  }

  test("merge + shrink keeps the bound and at most k entries") {
    val agg = FreqItemsAgg(BoundReference(0, StringType, nullable = true), 3)
    def summarize(ws: Seq[String]) = {
      val b = agg.createAggregationBuffer()
      ws.foreach(w => agg.update(b, InternalRow(UTF8String.fromString(w))))
      b
    }
    val a = summarize(Seq.fill(5)("p") ++ Seq("q", "r"))
    val b = summarize(Seq.fill(4)("s") ++ Seq("q", "t"))
    val m = agg.merge(a, b)
    assert(m.total == 13L)
    assert(m.counts.size <= 3)
    // p (5 > 13/4) and s (4 > 13/4) must survive the shrink
    assert(m.counts.contains("p") && m.counts.contains("s"))
  }
}
