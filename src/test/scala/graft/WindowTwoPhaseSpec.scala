package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** The two-phase win_rank / win_ntile rewrites must emit EXACTLY the
  * rows of the direct one-window forms — the bucket decomposition is a
  * physical-plan strategy, not a semantics change (the DuckDB oracles
  * replay the window form, so any divergence here is a red gate). */
class WindowTwoPhaseSpec extends SparkSpec {
  import spark.implicits._

  test("win_rank == the direct one-window form, row for row") {
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_partkey"), col("l_suppkey"))
    val wPrefix = Window.partitionBy("l_returnflag").orderBy(col("l_extendedprice").desc)
    val wQty = Window.partitionBy("l_returnflag").orderBy(col("l_quantity").desc)
    val direct = Tables.lineitem(spark, sf)
      .withColumn("rn", row_number().over(w))
      .withColumn("qt", ntile(4).over(w))
      .withColumn("rk", rank().over(wPrefix))
      .withColumn("drk", dense_rank().over(wQty))
      .filter(col("rn") <= 20)
      .select("l_returnflag", "rn", "rk", "drk", "qt", "l_orderkey", "l_linenumber")
      .as[(String, Int, Int, Int, Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val twoPhase = Relational.winRank(spark, sf)
      .as[(String, Int, Int, Int, Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(direct.nonEmpty)
    assert(twoPhase.toSeq == direct.toSeq)
  }

  test("win_ntile == the direct one-window form, row for row") {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val direct = Tables.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"))
      .groupBy("o_orderstatus", "quartile")
      .agg(count(lit(1)).as("n"),
        min("o_totalprice").as("lo_price"), max("o_totalprice").as("hi_price"))
      .select(col("o_orderstatus"), col("quartile"), col("n"),
        col("lo_price").cast("string"), col("hi_price").cast("string"))
      .as[(String, Int, Long, String, String)].collect().sortBy(r => (r._1, r._2))
    val twoPhase = Relational.winNtile(spark, sf)
      .select(col("o_orderstatus"), col("quartile"), col("n"),
        col("lo_price").cast("string"), col("hi_price").cast("string"))
      .as[(String, Int, Long, String, String)].collect().sortBy(r => (r._1, r._2))
    assert(direct.nonEmpty)
    assert(twoPhase.toSeq == direct.toSeq)
  }

  test("ntileBucket closed form == the ntile window, every position, n = 1..30") {
    // the closed form feeds both rewrites; prove it against the engine's
    // own ntile across bucket-size edge cases (n mod 4 = 0..3, n < k)
    val rows = for (n <- 1 to 30; pos <- 1 to n) yield (n.toLong, pos.toLong)
    val df = rows.toDF("n", "pos")
    val w = Window.partitionBy("n").orderBy("pos")
    val mismatches = df
      .withColumn("win", ntile(4).over(w))
      .withColumn("closed", graft.operators.Relational.ntileBucketForTest(
        4, col("pos"), col("n")))
      .filter(col("win") =!= col("closed"))
      .count()
    assert(mismatches == 0L)
  }
}
