package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphOps

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("label propagation: path graph (deep diameter), separate pair, isolated node") {
    val nodes = (0L to 12L).toDF("node")
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 7L), (7L, 8L), (8L, 9L), // 10-node path: 9 rounds
      (11L, 10L)                              // reversed orientation on purpose
    ).toDF("src", "dst")
    val cc = GraphOps.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 9L).foreach(i => assert(cc(i) == 0L, s"node $i"))
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert(cc(12L) == 12L)
  }

  test("BFS: path distances exact, radius-bounded, multi-source takes the min") {
    val nodes = (0L to 10L).toDF("node")
    val edges = (0L to 8L).map(i => (i, i + 1)).toDF("src", "dst") // 0-…-9 path
    def run(seeds: Seq[Long]) =
      GraphOps.bfsDistances(nodes, edges, seeds.toDF("node"), rounds = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val single = run(Seq(0L))
    (0L to 4L).foreach(k => assert(single(k) == k, s"node $k"))
    // radius bound: nodes beyond 4 hops (and the isolated 10) are absent
    (5L to 10L).foreach(k => assert(!single.contains(k), s"node $k leaked"))
    // multi-source: distance is the min over seeds — the middle of the
    // path is now reachable from BOTH ends
    val multi = run(Seq(0L, 9L))
    assert(multi(4L) == 4L && multi(5L) == 4L && multi(9L) == 0L)
    assert(multi.size == 10) // everything but the isolated node
  }

  test("frequency-vote LPA: triangles converge to min id; sync pair oscillation pinned") {
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 12L, 20L, 21L, 30L).toDF("node")
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),     // triangle A
      (10L, 11L), (11L, 12L), (10L, 12L), // triangle B
      (20L, 21L)                          // bare pair
    ).toDF("src", "dst")
    def run(r: Int) = GraphOps.labelPropagation(nodes, edges, rounds = r)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val l3 = run(3)
    // each triangle is a dense region converging to its min id
    Seq(1L, 2L, 3L).foreach(n => assert(l3(n) == 1L, s"node $n"))
    Seq(10L, 11L, 12L).foreach(n => assert(l3(n) == 10L, s"node $n"))
    // isolated node keeps its own label
    assert(l3(30L) == 30L)
    // synchronous updates make a bare pair OSCILLATE (the textbook sync-LPA
    // artifact): odd round counts leave the labels swapped, even ones
    // restore them. Pinned, because the oracle replays exactly this.
    assert(l3(20L) == 21L && l3(21L) == 20L)
    val l2 = run(2)
    assert(l2(20L) == 20L && l2(21L) == 21L)
  }

  test("convergence piggybacks on the round job: d+1 rounds, one job per round") {
    val nodes = (0L to 12L).toDF("node")
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 7L), (7L, 8L), (8L, 9L),
      (11L, 10L)
    ).toDF("src", "dst")
    // count query EXECUTIONS, not Spark jobs: under AQE one action runs a
    // job per shuffle stage, so actions are the unit the fix changed
    // (1 checkpoint action per round, no second aggregate action)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case _: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            jobs.incrementAndGet()
          case _ => ()
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val (_, rounds) = GraphOps.connectedComponentsWithRounds(nodes, edges)
      // 9 propagation rounds for the 10-node path + 1 zero-change round;
      // if the observed metric never arrived the loop would hit maxIter=25
      assert(rounds == 10, s"expected 10 rounds, got $rounds")
      // listener delivery is async — drain the bus deterministically,
      // then drain once more after a short gap to catch an event POSTED
      // between the action unblocking and the scheduler's post
      drainListenerBus(); Thread.sleep(200); drainListenerBus()
      // one materialization action per round + 2 setup checkpoints (sym,
      // initial labels); the pre-fix shape ran a second aggregate action
      // per round (~2× this bound)
      assert(jobs.get() <= rounds + 3,
        s"expected <= ${rounds + 3} executions (1/round + setup), saw ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("observedChanged: delivery failure probes the checkpointed round, counts the miss") {
    // an Observation never attached to any query: its future cannot
    // complete, so Await times out — exactly the wedged-listener-bus
    // shape that inflated the r7/r8 graph numbers. The fallback must
    // read the answer from the materialized round, not assume changed=1.
    val miss0 = GraphOps.ccObservationMisses.get()
    val converged = Seq((1L, 1L, 0L), (2L, 1L, 0L))
      .toDF("node", "comp", "chg").localCheckpoint()
    assert(GraphOps.observedChanged(
      org.apache.spark.sql.Observation(), converged, 0) == 0L)
    val changed = Seq((1L, 1L, 0L), (2L, 1L, 1L))
      .toDF("node", "comp", "chg").localCheckpoint()
    assert(GraphOps.observedChanged(
      org.apache.spark.sql.Observation(), changed, 1) == 1L)
    assert(GraphOps.ccObservationMisses.get() == miss0 + 2,
      "each fallback must be counted — Bench surfaces these per query")
    converged.unpersist(blocking = false)
    changed.unpersist(blocking = false)
  }

  // deterministic listener drain via the test-scope package bridge
  // (LiveListenerBus.waitUntilEmpty() is private[spark]) — a fixed sleep
  // can flake when a straggling SQLExecutionStart from a PRIOR test
  // lands inside the listening window under load
  private def drainListenerBus(): Unit =
    org.apache.spark.GraftListenerBridge.waitUntilEmpty(spark.sparkContext)

  test("cluster layout: second call runs zero queries; artifact matches fresh CC") {
    GraphOps.ensureClusterLayout(spark, sf) // build (or reuse) the layout
    drainListenerBus()                      // drain build-time listener events
    val execs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case _: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execs.incrementAndGet()
          case _ => ()
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val dir = try {
      val d = GraphOps.ensureClusterLayout(spark, sf)
      drainListenerBus() // listener delivery is async
      // the cached path is a pure _BUILT existence check — re-training
      // per consumer is exactly the shape this artifact exists to kill
      assert(execs.get() == 0,
        s"cached ensureClusterLayout ran ${execs.get()} queries; expected 0")
      d
    } finally spark.sparkContext.removeSparkListener(listener)
    // the materialized table IS the direct computation, byte-for-byte
    val cached = spark.read.parquet(new java.io.File(dir, "jaccard_clusters").toString)
      .collect().map(_.toSeq).toSet
    val nodes = Tables.documents(spark, sf)
      .filter(col("doc_id") < 150).select(col("doc_id").as("node"))
    val edges = graft.operators.TextOps.jaccardPairs(spark, sf, 150)
      .filter(col("jaccard") >= 0.02)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val labels = GraphOps.connectedComponents(nodes, edges)
    val fresh = labels
      .join(labels.groupBy("comp").agg(count(lit(1)).as("cluster_size")), "comp")
      .select(col("node").as("doc_id"), col("comp"), col("cluster_size"))
      .collect().map(_.toSeq).toSet
    assert(cached == fresh)
  }

  test("dedupClusters: every similarity edge lands inside one cluster") {
    val labels = GraphOps.dedupClusters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = operators.TextOps.jaccardPairs(spark, sf, 150)
      .filter(col("jaccard") >= 0.02)
      .select("id_a", "id_b").collect()
    assert(edges.nonEmpty, "threshold should yield edges at sf0.001")
    edges.foreach { r =>
      assert(labels(r.getLong(0)) == labels(r.getLong(1)),
        s"edge (${r.getLong(0)},${r.getLong(1)}) split across clusters")
    }
    // cluster ids are canonical minima: the component id labels itself
    labels.values.toSet.foreach((c: Long) => assert(labels(c) == c))
  }

  test("dedupGroups: histogram covers every document exactly once") {
    val hist = GraphOps.dedupGroups(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val covered = hist.map { case (size, n) => size * n }.sum
    assert(covered == Tables.documents(spark, sf).count())
    assert(hist.keySet.min >= 1L)
  }

  /** Local replay of pageRank's exact fixed-point recurrence — the
    * distributed result must match it to the last digit on any
    * partitioning (that bit-exactness is what graph_pagerank's
    * unrolled-CTE oracle depends on). */
  private def localPageRank(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] = {
    val SCALE = 1000000000000L
    val sym = (edges ++ edges.map(_.swap)).distinct
    val outdeg = sym.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = nodes.size.toLong
    var pr = nodes.map(_ -> SCALE / n).toMap
    for (_ <- 1 to iters) {
      val contrib = sym.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => pr(src) / outdeg(src) }.sum
      }
      val dang = nodes.filterNot(outdeg.contains).map(pr).sum
      pr = nodes.map { v =>
        v -> ((15 * SCALE) / (100 * n) +
          (85 * (contrib.getOrElse(v, 0L) + dang / n)) / 100)
      }.toMap
    }
    pr
  }

  test("kCore: peeling cascades, isolated nodes drop, round 4 is the fixpoint") {
    // path 0-1-2 dies by cascade (ends first, then middle); the triangle
    // 3-4-5 plus pendant 6 keeps the triangle only; 7 is isolated
    val nodes = (0L to 7L).toDF("node")
    val edges = Seq((0L, 1L), (1L, 2L), (3L, 4L), (4L, 5L), (3L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val core = GraphOps.kCore(nodes, edges, k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(3L -> 2L, 4L -> 2L, 5L -> 2L))
    // the declared query's fixed 4 rounds must already BE the fixpoint
    // on the real graph — otherwise graph_kcore's output would be a
    // truncated peel, not the 2-core
    val r4 = GraphOps.kCoreDocs(spark, sf).collect().map(_.toSeq).toSet
    val nodes150 = Tables.documents(spark, sf)
      .filter(col("doc_id") < 150).select(col("doc_id").as("node"))
    val edges150 = graft.operators.TextOps.jaccardPairs(spark, sf, 150)
      .filter(col("jaccard") >= 0.02)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val r6 = GraphOps.kCore(nodes150, edges150, k = 2, rounds = 6)
      .select(col("node").as("doc_id"), col("core_deg")).orderBy("doc_id")
      .collect().map(_.toSeq).toSet
    assert(r4 == r6, "4-round peel has not converged on the doc graph")
  }

  test("pageRank matches the local fixed-point replay exactly") {
    // star (hub 0), a 2-cycle, and TWO isolated nodes (dangling mass)
    val nodes = (0L to 7L).toDF("node").repartition(4)
    val edgeSeq = Seq((0L, 1L), (0L, 2L), (0L, 3L), (4L, 5L))
    val edges = edgeSeq.toDF("src", "dst").repartition(3)
    val expected = localPageRank(0L to 7L, edgeSeq, iters = 3)
    val got = GraphOps.pageRank(nodes, edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // centrality ordering: the hub out-ranks its leaves, leaves out-rank
    // the isolated nodes (they receive only teleport + dangling share)
    assert(got(0L) > got(1L) && got(1L) > got(6L))
    assert(got(1L) == got(2L) && got(2L) == got(3L)) // symmetric leaves
    // fixed-point mass is conserved up to floor losses: strictly ≤ SCALE,
    // and within a few units per node per round of it
    val mass = got.values.sum
    assert(mass <= 1000000000000L)
    assert(1000000000000L - mass <= 8L * 4 * 3)
  }
}
