package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Dedup-cluster graph operators (SURVEY.md §2 Part B, the B43/B44
  * follow-on): near-duplicate PAIRS only become removable duplicates
  * once grouped — the keeper is one document per connected component of
  * the similarity graph, not one per pair.
  *
  * Scale design: minimum-label propagation. Each round is one
  * (edges ⋈ labels) shuffle plus a min-aggregate — the label table
  * carries (node, comp) only, never document payloads — and the loop
  * converges in O(graph diameter) rounds (dedup clusters are shallow;
  * single-digit diameters dominate real corpora). Every round
  * localCheckpoints the labels: iterative DataFrame plans otherwise
  * accrete lineage and re-execute the whole history each round. For
  * adversarial long-chain graphs the alternating large-star/small-star
  * contraction (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14) bounds rounds at O(log² n); label propagation is
  * the right default for near-dup cluster shapes.
  */
object GraphOps {

  /** Connected components by min-label propagation.
    *
    * @param nodes single column `node` (long ids)
    * @param edges columns `src`, `dst`; treated as undirected
    * @return (`node`, `comp`) with comp = min reachable node id
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame =
    connectedComponentsWithRounds(nodes, edges, maxIter)._1

  /** [[connectedComponents]] plus the executed round count — exposed so
    * tests can pin convergence behavior (a path graph of diameter d must
    * finish in exactly d + 1 rounds: d propagation + 1 zero-change
    * detection; if the observed metric never arrived the loop would
    * always run to maxIter). */
  def connectedComponentsWithRounds(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 25): (DataFrame, Int) = {
    // materialize the (small) edge list ONCE: it joins into every
    // round, and lazily it would re-run its whole upstream pipeline
    // (e.g. the MinHash band join) per iteration — 3× the query cost
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = nodes.select(col("node"), col("node").as("comp")).localCheckpoint()
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val cand = sym.join(labels, sym("src") === labels("node"))
        .groupBy(sym("dst").as("node"))
        .agg(min("comp").as("cand"))
      // convergence rides ON the materialization job: labels only ever
      // decrease, so changed = count(cand < comp), observed by the
      // CollectMetrics node while localCheckpoint materializes the round —
      // no second per-round job over the labels (GraphOpsSpec pins the
      // per-round job count)
      val obs = org.apache.spark.sql.Observation()
      val next = labels.as("l")
        .join(cand.as("c"), col("l.node") === col("c.node"), "left")
        .select(col("l.node").as("node"),
          least(col("l.comp"), coalesce(col("c.cand"), col("l.comp"))).as("comp"),
          (coalesce(col("c.cand"), col("l.comp")) < col("l.comp"))
            .cast("long").as("chg"))
        .observe(obs, coalesce(sum(col("chg")), lit(0L)).as("changed"))
        .select("node", "comp")
        .localCheckpoint()
      // the metrics row is delivered on action completion; localCheckpoint
      // is eager, so by now the future is (all but pathologically) done.
      // A delivery failure falls back to one cheap scan of the checkpoint
      // — correctness never depends on the listener bus.
      val changed =
        try scala.concurrent.Await
          .result(obs.future, scala.concurrent.duration.Duration("5s"))
          .getAs[Long]("changed")
        catch {
          // keep iterating on ANY delivery failure (timeout, an
          // exceptionally-completed future, a wedged listener bus):
          // maxIter still bounds the loop, and GraphOpsSpec pins the
          // exact round count so a broken metrics path cannot hide. The
          // timeout is short because localCheckpoint already materialized
          // the round — the metrics row is normally delivered by now.
          // Log each miss: repeated timeouts mean a converged run spins
          // to maxIter paying the wait every round, which degrades bench
          // numbers silently if invisible.
          case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"[graft] CC round $iter: observed-metric delivery failed " +
                s"(${e.getClass.getSimpleName}); assuming changed=1")
            1L
        }
      done = changed == 0L
      // next is already materialized (localCheckpoint is eager), so the
      // superseded round's blocks can go — otherwise every round's
      // label table stays pinned in the block manager for the whole run
      labels.unpersist(blocking = false)
      labels = next
      iter += 1
    }
    sym.unpersist(blocking = false)
    (labels, iter)
  }

  /** Near-dup clusters over the exact 3-shingle Jaccard graph
    * (threshold 0.02, doc_id < 150 — the same bounded subset as
    * [[TextOps.ngramJaccard]], where exact scoring is affordable; at
    * 100 TB the edge list comes from the MinHash band join instead and
    * this component step is unchanged). Cross-engine exact, so the
    * DuckDB oracle recomputes components via a recursive CTE. */
  def dedupClusters(s: SparkSession, d: String): DataFrame = {
    val nodes = Tables.documents(s, d)
      .filter(col("doc_id") < 150)
      .select(col("doc_id").as("node"))
    val edges = TextOps.jaccardPairs(s, d, 150)
      .filter(col("jaccard") >= 0.02)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val labels = connectedComponents(nodes, edges)
    val sizes = labels.groupBy("comp").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "comp")
      .select(col("node").as("doc_id"), col("comp"), col("cluster_size"))
      .orderBy("doc_id")
  }

  /** The full 100 TB dedup pipeline, corpus-wide: MinHash LSH band join
    * proposes candidate pairs ([[TextOps.minhashPairs]], never O(n²)),
    * connected components groups them into duplicate clusters, and the
    * keeper is min(doc_id) per cluster. Output is the cluster-size
    * histogram plus survivor count — the number a curation run reports.
    * Rows-only (xxhash64 band family is not DuckDB-reproducible); the
    * component math itself is oracle-proven by [[dedupClusters]]. */
  def dedupGroups(s: SparkSession, d: String): DataFrame = {
    val nodes = Tables.documents(s, d).select(col("doc_id").as("node"))
    val edges = TextOps.minhashPairs(s, d)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val labels = connectedComponents(nodes, edges)
    labels.groupBy("comp").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters")) // = surviving docs: one keeper each
      .orderBy("cluster_size")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_dedup_cc"     -> (dedupClusters(_, _)),
    "llm_dedup_groups" -> (dedupGroups(_, _))
  )

  def oracles: Map[String, String] = Map(
    "llm_dedup_cc" ->
      """WITH RECURSIVE sh AS (
        |  SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id,
        |      array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ') AS sh
        |    FROM documents,
        |      LATERAL (SELECT unnest(generate_series(1, len(string_split(text, ' ')) - 2)) AS i)
        |    WHERE doc_id < 150)
        |  WHERE length(sh) > 0),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b
        |  FROM pairs JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.02),
        |sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
        |nodes AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 150),
        |reach AS (
        |  SELECT doc_id AS src, doc_id AS dst FROM nodes
        |  UNION
        |  SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a),
        |lab AS (SELECT src AS doc_id, MIN(dst) AS comp FROM reach GROUP BY src),
        |cs AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM lab GROUP BY comp)
        |SELECT lab.doc_id, lab.comp, cs.cluster_size
        |FROM lab JOIN cs ON lab.comp = cs.comp ORDER BY lab.doc_id""".stripMargin
  )
}
