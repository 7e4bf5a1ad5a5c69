package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Golden-output regression (SURVEY.md §5.5): five flagship queries'
  * sf0.001 results are checked in as JSON-lines fixtures; any drift in
  * results — an operator edit, a Spark upgrade, an oracle-harness change —
  * fails here even before the DuckDB gate runs.
  *
  * Regenerate intentionally with `GRAFT_REGEN_GOLDENS=1 sbt "testOnly
  * graft.GoldenSpec"` and review the diff like any code change.
  */
class GoldenSpec extends SparkSpec {

  private val goldenDir = Paths.get("src", "test", "resources", "goldens")
  private val regen = sys.env.get("GRAFT_REGEN_GOLDENS").contains("1")

  private val flagship = Seq(
    "agg_basic", "join_broadcast", "sql_q3", "llm_pipeline", "win_rank")

  flagship.foreach { name =>
    test(s"golden: $name matches the checked-in sf0.001 fixture") {
      // toJSON keys follow the declared column order and Jackson's
      // shortest-round-trip double formatting — deterministic for
      // bit-identical results, which the decimal discipline guarantees
      val got = SparkEntry.queries(name)(spark, sf).toJSON.collect().toSeq
      val path = goldenDir.resolve(s"$name.jsonl")
      if (regen) {
        Files.createDirectories(goldenDir)
        Files.write(path, got.asJava,
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        info(s"regenerated ${path} (${got.size} rows)")
      } else {
        assert(Files.exists(path),
          s"missing golden $path — run with GRAFT_REGEN_GOLDENS=1 to create")
        val want = Files.readAllLines(path).asScala.toSeq
        assert(got.size == want.size,
          s"row count drift: got ${got.size}, golden ${want.size}")
        got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
          assert(g == w, s"row $i drift:\n  got    $g\n  golden $w")
        }
      }
    }
  }
}
