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

  test("agg_gini bucket two-phase == the direct one-window form, row for row") {
    import graft.operators.Relational
    def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val ranked = Tables.orders(spark, sf)
      .select(col("o_orderstatus"), dec2(col("o_totalprice")).as("x"),
        row_number().over(w).cast("long").as("i"))
    val direct = ranked.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("x")).as("sx"), sum(col("i") * col("x")).as("six"))
      .select(col("o_orderstatus"), col("n_rows"),
        col("sx").cast("string"), col("six").cast("string"))
      .as[(String, Long, String, String)].collect().sortBy(_._1)
    val pub = Relational.aggGini(spark, sf)
      .select(col("o_orderstatus"), col("n_rows"), col("gini").cast("string"))
      .as[(String, Long, String)].collect().sortBy(_._1)
    assert(direct.nonEmpty && pub.length == direct.length)
    // published gini derives deterministically from (n, sx, six): compare
    // it against the direct form's own tail computation
    val directPub = direct.map { case (st, n, sx, six) =>
      val nd = n.toDouble
      val g = (2.0 * six.toDouble - (nd + 1.0) * sx.toDouble) / (nd * sx.toDouble)
      (st, n, BigDecimal(g).setScale(6, BigDecimal.RoundingMode.HALF_UP).toString)
    }
    pub.zip(directPub).foreach { case ((s1, n1, g1), (s2, n2, g2)) =>
      assert(s1 == s2 && n1 == n2, s"$s1 rows differ")
      assert(math.abs(g1.toDouble - g2.toDouble) < 1e-9, s"$s1: $g1 vs $g2")
    }
  }

  test("agg_mannwhitney histogram form == the direct ranked form, row for row") {
    val ord = Window.partitionBy("l_returnflag").orderBy("q")
    val peers = ord.rangeBetween(Window.currentRow, Window.currentRow)
    val ranked = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").as("q"),
        (col("l_linenumber") % 2).as("grp"))
      .select(col("l_returnflag"), col("grp"),
        rank().over(ord).cast("long").as("rk"),
        count(lit(1)).over(peers).as("tie"))
    val direct = ranked.groupBy("l_returnflag")
      .agg(
        sum(when(col("grp") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("grp") === 1, 1L).otherwise(0L)).as("nb"),
        sum(when(col("grp") === 0, lit(2L) * col("rk") + col("tie") - 1L)
          .otherwise(0L)).as("r2a"),
        sum(col("tie") * col("tie") - lit(1L)).as("tsum"))
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    // the operator's public output derives from (na, nb, r2a, tsum)
    // deterministically, so equality of the full output row set follows
    // from the histogram form reproducing these four exactly — but pin
    // the public row too
    val pub = Relational.aggMannWhitney(spark, sf)
      .select(col("l_returnflag"), col("na"), col("nb"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(direct.nonEmpty)
    direct.zip(pub).foreach { case ((f1, na1, nb1, _, _), (f2, na2, nb2)) =>
      assert(f1 == f2 && na1 == na2 && nb1 == nb2)
    }
    // and the four sufficient statistics via the internal histogram path
    val hist = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").as("q"),
        (col("l_linenumber") % 2).as("grp"))
      .groupBy("l_returnflag", "q")
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("grp") === 0, 1L).otherwise(0L)).as("ca"))
      .withColumn("rk", coalesce(sum("cnt").over(
        Window.partitionBy("l_returnflag").orderBy("q")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) + 1L)
      .groupBy("l_returnflag")
      .agg(sum("ca").as("na"), sum(col("cnt") - col("ca")).as("nb"),
        sum(col("ca") * (lit(2L) * col("rk") + col("cnt") - 1L)).as("r2a"),
        sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("tsum"))
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(hist.toSeq == direct.toSeq)
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
