package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TopKAgg

/** Bounded-heap top-k aggregate: equality with the window row_number
  * form, tie determinism, partial/merge correctness across partitions. */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("top_k_by equals window row_number on the orders table") {
    val o = Tables.orders(spark, sf)
    val viaAgg = o.groupBy("o_orderstatus")
      .agg(TopKAgg.top_k_by(col("o_totalprice"), col("o_orderkey"), 5).as("top"))
      .select(col("o_orderstatus"), explode(col("top")).as("p"))
      .select($"o_orderstatus", $"p.payload".as("k"), $"p.value".as("v"))
      .as[(String, Long, Double)].collect().toSet
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
    val viaWindow = o.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"o_orderstatus", $"o_orderkey", $"o_totalprice")
      .as[(String, Long, Double)].collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("ties break deterministically on payload (larger wins)") {
    val df = Seq((1.0, 1L), (1.0, 2L), (1.0, 3L), (0.5, 9L))
      .toDF("v", "p").withColumn("g", lit("x"))
    val top = df.groupBy("g")
      .agg(TopKAgg.top_k_by(col("v"), col("p"), 2).as("top"))
      .select(explode(col("top")).as("e"))
      .select($"e.value", $"e.payload").as[(Double, Long)].collect().toSeq
    assert(top == Seq((1.0, 3L), (1.0, 2L)))
  }

  test("results independent of partitioning (merge path exercised)") {
    val base = (1 to 1000).map(i => (i.toDouble % 97, i.toLong, s"g${i % 3}"))
    val one = base.toDF("v", "p", "g").repartition(1)
    val many = base.toDF("v", "p", "g").repartition(13)
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(TopKAgg.top_k_by(col("v"), col("p"), 7).as("t"))
        .select($"g", $"t").as[(String, Seq[(Double, Long)])]
        .collect().toMap
    assert(run(one) == run(many))
  }

  test("groups smaller than k return all rows, sorted descending") {
    val df = Seq((3.0, 1L), (1.0, 2L)).toDF("v", "p").withColumn("g", lit("x"))
    val top = df.groupBy("g")
      .agg(TopKAgg.top_k_by(col("v"), col("p"), 10).as("top"))
      .select(explode(col("top")).as("e"))
      .select($"e.value", $"e.payload").as[(Double, Long)].collect().toSeq
    assert(top == Seq((3.0, 1L), (1.0, 2L)))
  }

  test("streaming micro-batches keep a correct running top-k as state") {
    // the k-pair heap is the state-store payload — a leaderboard that
    // updates per micro-batch without reprocessing history, same
    // incremental contract the KLL streaming test pins for quantiles
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Double, Long)]
    val name = s"topk_${System.nanoTime()}"
    val q = mem.toDF().toDF("v", "p")
      .agg(TopKAgg.top_k_by(col("v"), col("p"), 3).as("top"))
      .select(explode(col("top")).as("e"))
      .select($"e.value", $"e.payload")
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    try {
      val batches = Seq(
        Seq((5.0, 1L), (1.0, 2L)),
        Seq((7.0, 3L), (0.5, 4L)),
        Seq((6.0, 5L), (5.5, 6L)))
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      val top = spark.table(name).as[(Double, Long)].collect().toSeq
        .sortBy(-_._1)
      assert(top == Seq((7.0, 3L), (6.0, 5L), (5.5, 6L)))
    } finally q.stop()
  }
}
