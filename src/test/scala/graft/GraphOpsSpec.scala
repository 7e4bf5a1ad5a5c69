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
}
