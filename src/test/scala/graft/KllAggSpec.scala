package graft

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.functions._
import graft.functions.KllQuantileAgg.kll_quantiles

/** KLL guarantee pins (the properties `agg_quantile_sketch` leans on):
  * every returned quantile is an actual stream element whose EXACT rank
  * is within the k=200 bound, the guarantee holds under any
  * partitioning (the merge path), nulls are skipped, the empty buffer
  * evals cleanly, and the serialized sketch round-trips through a
  * parquet binary column — the property that lets corpus quantile
  * stats persist next to the data and absorb new shards without
  * rescanning old ones. Like MG ([[FreqItemsAggSpec]]), sketch
  * CONTENTS may vary with merge order; only the rank guarantee is
  * partition-invariant, and that is all the declared query asserts. */
class KllAggSpec extends SparkSpec {
  import spark.implicits._

  // log-normal-ish skew (squares of 1..N shuffled by a fixed LCG) so
  // quantiles are not evenly spaced and compaction actually triggers
  private val n = 20000
  private val values: Vector[Double] = {
    val raw = (1 to n).map(i => (i.toDouble / 100) * (i.toDouble / 100))
    var seed = 0x9e3779b97f4a7c15L
    raw.sortBy { _ =>
      seed = seed * 6364136223846793005L + 1442695040888963407L; seed
    }.toVector
  }
  private val sorted = values.sorted
  private val ranks = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  private def exactRank(v: Double): Double =
    sorted.count(_ <= v).toDouble / n

  private def checkGuarantee(total: Long, qs: Seq[Double]): Unit = {
    assert(total == n)
    ranks.zip(qs).foreach { case (r, q) =>
      // INCLUSIVE search ⇒ the estimate is an actual element
      assert(sorted.contains(q), s"quantile $q at rank $r not in stream")
      val err = math.abs(exactRank(q) - r)
      assert(err <= 0.025, s"rank $r: estimate $q has exact rank off by $err")
    }
  }

  private def runAgg(df: org.apache.spark.sql.DataFrame): (Long, Seq[Double]) = {
    val row = df.agg(kll_quantiles(col("x"), 200, ranks).as("s"))
      .select(col("s.n"), col("s.quantiles")).head()
    (row.getLong(0), row.getSeq[Double](1))
  }

  test("rank guarantee on a single partition") {
    val (total, qs) = runAgg(values.toDF("x").coalesce(1))
    checkGuarantee(total, qs)
  }

  test("rank guarantee survives repartition(8) — the merge path") {
    val (total, qs) = runAgg(values.toDF("x").repartition(8))
    checkGuarantee(total, qs)
  }

  test("nulls are skipped, not counted") {
    val withNulls = values.map(Option(_)) ++ Seq.fill(500)(Option.empty[Double])
    val (total, qs) = runAgg(withNulls.toDF("x").repartition(4))
    checkGuarantee(total, qs) // total must still be n, not n+500
  }

  test("empty input evals to n=0 and zeroed quantiles") {
    val (total, qs) = runAgg(values.toDF("x").filter(lit(false)))
    assert(total == 0L)
    assert(qs.forall(_ == 0.0))
  }

  test("streaming micro-batches accumulate to the same rank guarantee") {
    // the sketch buffer IS the streaming state: each micro-batch updates
    // the serialized KLL partial in the state store, so corpus quantile
    // stats stay current incrementally — no batch recompute, the same
    // merge path the repartition test exercises, now across time
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Double]
    val name = s"kll_${System.nanoTime()}"
    val q = mem.toDF().toDF("x")
      .agg(kll_quantiles(col("x"), 200, ranks).as("s"))
      .select(col("s.n").as("n"), col("s.quantiles").as("qs"))
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    try {
      values.grouped(5000).foreach { chunk =>
        mem.addData(chunk); q.processAllAvailable()
      }
      val row = spark.table(name).head()
      checkGuarantee(row.getLong(0), row.getSeq[Double](1))
    } finally q.stop()
  }

  test("serialized sketch round-trips through a parquet binary column") {
    // two shards sketched independently — the incremental-stats shape:
    // each shard persists its own bytes, a later reader merges
    val (a, b) = values.splitAt(n / 2)
    def sketchOf(xs: Seq[Double]): Array[Byte] = {
      val sk = KllDoublesSketch.newHeapInstance(200)
      xs.foreach(sk.update)
      sk.toByteArray
    }
    val dir = java.nio.file.Files.createTempDirectory("kll_rt").toString
    Seq(("a", sketchOf(a)), ("b", sketchOf(b))).toDF("shard", "sketch")
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).select("sketch")
      .as[Array[Byte]].collect()
    assert(back.length == 2)
    val merged = KllDoublesSketch.newHeapInstance(200)
    back.foreach(bytes => merged.merge(KllDoublesSketch.heapify(Memory.wrap(bytes))))
    val qs = ranks.map(r => merged.getQuantile(r, QuantileSearchCriteria.INCLUSIVE))
    checkGuarantee(merged.getN, qs)
  }
}
