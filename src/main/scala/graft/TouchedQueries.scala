package graft

/** Dev utility: map changed source files to the declared query names
  * they can affect, so a code change can be re-verified at sf1/sf10
  * without replaying the full ~200-query board (~45 min of DuckDB at
  * sf10). Driven by tools/verify_touched.sh with a
  * `git diff --name-only`-derived file list.
  *
  * The mapping is intentionally coarse and FAIL-SAFE: each operator
  * module maps to exactly the queries it registers in
  * [[SparkEntry.queries]]; any changed main-source file NOT in the
  * table (shared infrastructure — Tables, SparkEntry, functions/,
  * plans/, sources/ internals, streaming/) prints `ALL`, forcing the
  * full board. Test/tool/doc changes match nothing and are ignored.
  * So a partial sweep can never silently under-check: only edits
  * provably confined to one module's query set narrow the board.
  */
object TouchedQueries {
  import graft.{operators => o}

  private val modules: Map[String, () => Set[String]] = Map(
    "operators/ChunkCatalog.scala" -> (() => o.ChunkCatalog.queries.keySet),
    "operators/Relational.scala" -> (() => o.Relational.queries.keySet),
    "operators/ScalarFns.scala" -> (() => o.ScalarFns.queries.keySet),
    "operators/Windows.scala" -> (() => o.Windows.queries.keySet),
    "operators/TextOps.scala" -> (() => o.TextOps.queries.keySet),
    "operators/IncrementalDedup.scala" -> (() => o.TextOps.queries.keySet),
    "operators/VectorOps.scala" -> (() => o.VectorOps.queries.keySet),
    "operators/Multimodal.scala" -> (() => o.Multimodal.queries.keySet),
    "operators/SqlQueries.scala" -> (() => o.SqlQueries.queries.keySet),
    "operators/GraphOps.scala" -> (() => o.GraphOps.queries.keySet),
    "sources/Formats.scala" -> (() => graft.sources.Formats.queries.keySet))

  /** Changed files whose edits cannot change any query's RESULT: tests,
    * tools, docs, and the dev/bench harness mains (Bench times queries,
    * it does not define them; ScaleGen/Probe generate dev corpora). */
  private val inert = Seq(
    "src/test/", "tools/", ".md", ".sbt", "project/",
    "graft/Bench.scala", "graft/Verify.scala", "graft/ScaleGen.scala",
    "graft/Probe.scala", "graft/SnapshotScaleProbe.scala",
    "graft/TouchedQueries.scala")

  def main(args: Array[String]): Unit = {
    val files = args.toSeq.filter(_.nonEmpty)
    val active = files.filterNot(f => inert.exists(f.contains))
    val (known, unknown) = active.partition(f => modules.keys.exists(f.endsWith))
    // the machine-readable line goes to STDERR with a `TOUCHED:` prefix:
    // sbt logs a forked JVM's stdout at info level, which the script's
    // `-error` invocation suppresses — stderr passes through at [error]
    def emit(v: String): Unit = System.err.println(s"TOUCHED:$v")
    if (unknown.nonEmpty) {
      System.err.println(
        s"[touched] shared-infra files changed -> full board: ${unknown.mkString(", ")}")
      emit("ALL")
    } else if (known.isEmpty) {
      System.err.println("[touched] no query-bearing files changed")
      emit("NONE")
    } else {
      val names = known.flatMap(f =>
        modules.collectFirst { case (k, qs) if f.endsWith(k) => qs() }.get)
        .toSet.toSeq.sorted
      System.err.println(s"[touched] ${known.size} module(s) -> ${names.size} queries")
      emit(names.mkString(","))
    }
  }
}
