package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property-based laws (SURVEY.md §5.3): interval-lookup vs brute force,
  * dedup idempotence, cosine bounds/symmetry, hamming metric laws —
  * driven through the engine's own expressions on generated data. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic generator sampling (no scalatest-scalacheck bridge in
    * the offline cache): fixed seeds -> reproducible property runs. */
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(i.toLong)))

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    samples(ga, 30).zip(samples(gb, 30)).foreach { case (a, b) => f(a, b) }

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    samples(ga, 30).lazyZip(samples(gb, 30)).lazyZip(samples(gc, 30))
      .foreach { case (a, b, c) => f(a, b, c) }

  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit =
    samples(ga, 30).foreach(f)

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private val chunkGen: Gen[List[(String, Long, Long)]] = for {
    n <- Gen.choose(1, 12)
    starts <- Gen.listOfN(n, Gen.choose(0L, 500L))
    lens <- Gen.listOfN(n, Gen.choose(1L, 100L))
  } yield starts.zip(lens).zipWithIndex.map { case ((s0, l), i) =>
    (s"c$i", s0, s0 + l)
  }

  test("interval containment lookup equals brute-force scan (half-open)") {
    forAll(chunkGen, Gen.choose(0L, 650L)) { (chunks, probe) =>
      whenever(chunks.nonEmpty) {
        val df = chunks.toDF("chunk_id", "block_start", "block_end")
        val got = df.filter(col("block_start") <= probe && lit(probe) < col("block_end"))
          .select("chunk_id").as[String].collect().toSet
        val want = chunks.collect {
          case (id, s0, e) if s0 <= probe && probe < e => id
        }.toSet
        assert(got == want)
      }
    }
  }

  test("dedup is idempotent and order-insensitive") {
    forAll(Gen.listOf(Gen.choose(0, 20))) { ids =>
      whenever(ids.nonEmpty) {
        val df = ids.map(i => (s"c$i", i)).toDF("chunk_id", "v")
        val once = df.dropDuplicates("chunk_id")
        val twice = once.dropDuplicates("chunk_id")
        assert(once.count() == ids.distinct.size)
        assert(twice.count() == once.count())
      }
    }
  }

  private val vecGen: Gen[List[Float]] =
    Gen.listOfN(8, Gen.choose(-10.0f, 10.0f))
      .suchThat(v => v.exists(x => math.abs(x) > 1e-3))

  test("cosine_sim: |c| <= 1, symmetric, self = 1 (generated vectors)") {
    forAll(vecGen, vecGen) { (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val Array(ab, ba, aa) = df.select(
        graft.functions.NativeExpressions.cosine_sim(col("a"), col("b")),
        graft.functions.NativeExpressions.cosine_sim(col("b"), col("a")),
        graft.functions.NativeExpressions.cosine_sim(col("a"), col("a")))
        .as[(Double, Double, Double)].collect().flatMap(t => Array(t._1, t._2, t._3))
      assert(ab == ba)
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
      assert(math.abs(aa - 1.0) < 1e-9)
    }
  }

  private val bitsGen: Gen[String] =
    Gen.listOfN(16, Gen.oneOf('0', '1')).map(_.mkString)

  test("hamming_dist: identity, symmetry, triangle inequality") {
    forAll(bitsGen, bitsGen, bitsGen) { (x, y, z) =>
      val df = Seq((x, y, z)).toDF("x", "y", "z")
      def h(a: String, b: String) =
        graft.functions.NativeExpressions.hamming_dist(col(a), col(b))
      val r = df.select(h("x", "x"), h("x", "y"), h("y", "x"), h("x", "z"), h("z", "y"))
        .as[(Int, Int, Int, Int, Int)].head()
      val (xx, xy, yx, xz, zy) = r
      assert(xx == 0)
      assert(xy == yx)
      assert(xy <= xz + zy)
    }
  }

  test("sql_recursive: depth histogram equals a driver-side base-4 digit replay") {
    def depth(b: Long): Int = { // divisions by 4 until 0; depth(0) = 0
      var cur = b; var d = 0
      while (cur > 0) { cur /= 4; d += 1 }
      d
    }
    val expected = graft.operators.ChunkCatalog.catalog(spark, sf)
      .select("dataset_id", "block_start").as[(String, Long)].collect()
      .map { case (ds, bs) => (ds, depth(bs / 100)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = graft.operators.SqlQueries.recursiveRollup(spark, sf)
      .as[(String, Int, Long)].collect()
      .map { case (ds, d, n) => (ds, d) -> n }.toMap
    assert(got == expected)
  }

  test("profile_drift: an exchangeable odd/even split shows no drift") {
    // the two 'snapshots' are the same distribution by construction, so
    // PSI must sit far under the 0.1 alarm for every profiled column —
    // a drift detector that fires on exchangeable splits is useless
    val rows = graft.operators.Relational.profileDrift(spark, sf)
      .select("col_name", "psi", "drifted").as[(String, Double, Boolean)].collect()
    assert(rows.length == 2)
    rows.foreach { case (c, psi, drifted) =>
      assert(psi < 0.1 && !drifted, s"$c psi=$psi flagged drift on a null split")
    }
  }

  test("t-test: an exchangeable odd/even line-number split is not significant") {
    // both samples draw from the same distribution by construction, so
    // |t| must sit inside the acceptance region for every group — a
    // test that rejects on exchangeable splits is miscalibrated
    val rows = graft.operators.Relational.aggTtest(spark, sf)
      .select("l_returnflag", "t_stat", "significant")
      .as[(String, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (f, t, sig) =>
      assert(!sig && math.abs(t) < 1.96, s"flag $f t=$t flagged on a null split")
    }
  }

  test("bootstrap: SE tracks the analytic sigma/sqrt(n); CI brackets the mean") {
    val boot = graft.operators.Relational.aggBootstrap(spark, sf)
      .as[(String, Long, Double, Double, Double, Double)].collect()
    // analytic SE per group from exact moments
    val analytic = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        stddev(col("l_quantity")).as("sd"))
      .as[(String, Long, Double)].collect()
      .map { case (f, n, sd) => f -> sd / math.sqrt(n.toDouble) }.toMap
    boot.foreach { case (f, n, mean, se, lo, hi) =>
      assert(lo <= mean && mean <= hi, s"$f CI [$lo,$hi] excludes mean $mean")
      val a = analytic(f)
      // 8 replicates is a noisy SE estimate; consistency, not precision
      assert(se > a / 3 && se < a * 3, s"$f boot_se=$se vs analytic=$a")
    }
  }

  test("dedup weights: total sampling mass equals the number of clusters") {
    // 1/cluster_size summed over members is exactly 1 per cluster —
    // soft dedup conserves one document's worth of mass per duplicate set
    val w = graft.operators.GraphOps.dedupWeights(spark, sf)
      .select("doc_id", "cluster_size", "weight")
      .as[(Long, Long, Double)].collect()
    val nClusters = graft.operators.GraphOps.dedupClusters(spark, sf)
      .select("comp").distinct().count()
    val mass = w.map(_._3).sum
    assert(math.abs(mass - nClusters) < 1e-3,
      s"mass $mass != clusters $nClusters")
  }
}
