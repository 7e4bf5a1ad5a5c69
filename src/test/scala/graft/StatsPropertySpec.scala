package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, TextOps, GraphOps}

/** Semantic pins for the round's statistics / diagnostics queries. The
  * DuckDB oracle proves ENGINE PARITY (both engines compute the same
  * thing); these tests prove the thing computed is the intended
  * statistic — driver-side replays of the closed forms on collected
  * values, plus the invariants each estimator must satisfy. */
class StatsPropertySpec extends SparkSpec {
  import spark.implicits._

  test("mann-whitney: the exchangeable odd/even split is not significant") {
    // same-distribution halves by construction — a rank test that
    // rejects here is miscalibrated (the aggTtest calibration law)
    val rows = Relational.aggMannWhitney(spark, sf)
      .select("l_returnflag", "na", "nb", "u_even", "z", "significant")
      .as[(String, Long, Long, Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (f, na, nb, u, z, sig) =>
      assert(!sig && math.abs(z) < 1.96, s"$f z=$z fired on a null split")
      assert(u >= 0 && u <= na.toDouble * nb, s"$f U=$u outside [0, na*nb]")
    }
  }

  test("chi2: expected marginals reconstruct the observed total exactly") {
    // Σ expected = Σ observed = N is an algebraic identity of
    // e = rowTotal*colTotal/N — if it fails, the marginals are wrong
    val rows = Relational.aggChi2(spark, sf)
      .select("n", "expected", "contrib")
      .as[(Long, Double, Double)].collect()
    val nTotal = rows.map(_._1).sum.toDouble
    val eTotal = rows.map(_._2).sum
    assert(math.abs(eTotal - nTotal) < 0.01,
      s"sum(expected)=$eTotal != N=$nTotal")
    rows.foreach { case (_, e, c) =>
      assert(e > 0 && c >= 0)
    }
  }

  test("gini: driver replay of the closed form matches per group") {
    val got = Relational.aggGini(spark, sf)
      .select("o_orderstatus", "n_rows", "gini")
      .as[(String, Long, Double)].collect()
      .map { case (s, n, g) => s -> ((n, g)) }.toMap
    val raw = Tables.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_totalprice"))
      .as[(String, Double)].collect().groupBy(_._1)
    raw.foreach { case (status, rows) =>
      val xs = rows.map(r => BigDecimal(r._2).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sorted
      val n = xs.length.toDouble
      val sx = xs.sum.toDouble
      val six = xs.zipWithIndex.map { case (x, i) => x.toDouble * (i + 1) }.sum
      val expected = (2.0 * six - (n + 1.0) * sx) / (n * sx)
      val (gotN, gotG) = got(status)
      assert(gotN == xs.length, s"$status n mismatch")
      assert(math.abs(gotG - expected) < 1e-4,
        s"$status gini=$gotG, replay=$expected")
      assert(gotG >= 0 && gotG < 1, s"$status gini=$gotG out of [0,1)")
    }
  }

  test("ks: driver replay of the integer max-deviation for one source") {
    val got = Relational.profileKs(spark, sf)
      .select("source", "n_s", "n_rest", "d_num")
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val all = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars"))
      .as[(String, Long)].collect()
    got.take(3).foreach { case (src, nS, nRest, dNum) =>
      val mine = all.filter(_._1 == src).map(_._2)
      val rest = all.filter(_._1 != src).map(_._2)
      assert(mine.length.toLong == nS && rest.length.toLong == nRest)
      val values = all.map(_._2).distinct.sorted
      val replay = values.map { v =>
        val cs = mine.count(_ <= v).toLong
        val cr = rest.count(_ <= v).toLong
        math.abs(cs * nRest - cr * nS)
      }.max
      assert(replay == dNum, s"$src d_num=$dNum, replay=$replay")
    }
  }

  test("acf: driver replay of one Pearson cell; all cells within [-1,1]") {
    val events = Tables.events(spark, sf)
    val acf = Relational.tsAcf(spark, sf)
      .select("user_id", "lag", "n_pairs", "acf")
      .as[(Long, Int, Long, Double)].collect()
    assert(acf.nonEmpty)
    // replay one (user, lag) cell exactly
    val (u0, lag0, nPairs, got) = acf.head
    val series = events.filter(col("user_id") === u0)
      .orderBy("ts", "event_id")
      .select(col("value")).as[Double].collect()
      .map(v => BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val pairs = series.dropRight(lag0).zip(series.drop(lag0))
    assert(pairs.length == nPairs)
    val n = pairs.length.toDouble
    val (sa, sb) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sab = pairs.map(p => p._1 * p._2).sum
    val saa = pairs.map(p => p._1 * p._1).sum
    val sbb = pairs.map(p => p._2 * p._2).sum
    val r = (n * sab - sa * sb) /
      math.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
    assert(math.abs(r - got) < 1e-3, s"user $u0 lag $lag0: got $got, replay $r")
    acf.foreach { case (u, l, _, a) =>
      assert(a >= -1.0001 && a <= 1.0001, s"user $u lag $l acf=$a out of [-1,1]")
    }
  }

  test("changepoint: driver replay of the CUSUM argmax for one user") {
    val got = Relational.tsChangepoint(spark, sf)
      .select("user_id", "n", "cp_pos", "cp_event_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val (u0, n0, cpPos, cpEvt) = got.head
    val series = Tables.events(spark, sf).filter(col("user_id") === u0)
      .orderBy("ts", "event_id")
      .select(col("event_id"), col("value")).as[(Long, Double)].collect()
      .map { case (id, v) =>
        (id, BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP))
      }
    assert(series.length.toLong == n0)
    val sw = series.map(_._2).sum
    val n = BigDecimal(series.length)
    var cum = BigDecimal(0)
    val scores = series.zipWithIndex.dropRight(1).map { case ((id, v), i) =>
      cum += v
      (id, i + 1L, (n * cum - BigDecimal(i + 1) * sw).abs)
    }
    val best = scores.maxBy(s => (s._3, -s._2)) // max score, earliest t
    // maxBy keeps the FIRST max under ties only via the -t component:
    // exact decimal compare mirrors the query's (−score, t) struct min
    assert(best._2 == cpPos && best._1 == cpEvt,
      s"user $u0: got (pos=$cpPos, evt=$cpEvt), replay (${best._2}, ${best._1})")
  }

  test("attribution: purchase count is conserved across buckets") {
    val rows = Relational.evAttribution(spark, sf)
      .select("attributed_to", "n_purchases")
      .as[(String, Long)].collect()
    val total = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_._2).sum == total,
      s"attribution buckets ${rows.toSeq} don't sum to $total purchases")
    assert(rows.map(_._1).forall(Set("click", "view", "none")))
  }

  test("bm25/ttr/zipf/containment/linkpred: estimator invariants hold") {
    TextOps.bm25(spark, sf)
      .select("n_terms", "bm25").as[(Long, Double)].collect()
      .foreach { case (t, s) =>
        assert(t >= 1 && t <= 3 && s > 0, s"bm25 row t=$t s=$s")
      }
    TextOps.lexicalDiversity(spark, sf)
      .select("n_tokens", "n_types", "n_hapax", "ttr")
      .as[(Long, Long, Long, Double)].collect()
      .foreach { case (tok, ty, h, r) =>
        assert(h <= ty && ty <= tok && r > 0 && r <= 1.0)
      }
    val (slope, r2) = TextOps.zipfFit(spark, sf)
      .select("slope", "r2").as[(Double, Double)].collect().head
    assert(slope < 0, s"zipf slope=$slope must be negative")
    assert(r2 > 0 && r2 <= 1, s"zipf r2=$r2")
    TextOps.containment(spark, sf)
      .select("n_inter", "sh_a", "sh_b", "c_ab", "c_ba")
      .as[(Long, Long, Long, Double, Double)].collect()
      .foreach { case (i, a, b, cab, cba) =>
        assert(i <= math.min(a, b) && cab <= 1.0 && cba <= 1.0)
      }
    val e = TextOps.jaccardPairs(spark, sf, 150)
      .filter(col("jaccard") >= 0.02)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    GraphOps.linkPrediction(spark, sf)
      .select("u", "w", "cn", "score").as[(Long, Long, Long, Double)].collect()
      .foreach { case (u, w, cn, s2) =>
        assert(!e.contains((u, w)), s"($u,$w) predicted but already adjacent")
        assert(cn >= 1 && s2 > 0 && s2 <= 1.0)
      }
  }
}
