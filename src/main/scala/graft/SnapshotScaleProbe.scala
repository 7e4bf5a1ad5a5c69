package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** Dev probe: exercise the snapshot WRITE path (fragmented ingest →
  * planned compaction → time travel) against the sf1 catalog — the
  * least-exercised scale surface per the round-9 audit. Prints one JSON
  * line with file counts before/after, wall time, and the time-travel
  * invariants, for the IMPLEMENTATION.md scale table.
  *
  * Usage: runMain graft.SnapshotScaleProbe [sfDir] [tableDir]
  */
object SnapshotScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/testdata/sf1")
    val table = args.drop(1).headOption.getOrElse("target/probe/snap_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Paths.get(table)
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      // Files.walk holds a directory handle until closed — collect the
      // paths under Using so the stream is released before the deletes
      scala.util.Using.resource(java.nio.file.Files.walk(root)) { st =>
        st.iterator().asScala.toSeq
      }.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }

    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_shipdate")
    val nRows = li.count()

    // fragmented ingest: 16 key-range slices, each appended as its own
    // commit repartitioned into 8 files — the many-small-files shape a
    // streaming/micro-batch writer leaves behind
    val keyMax = li.agg(max(col("l_orderkey").cast("long"))).head().getLong(0)
    val slices = 16
    val t0 = System.nanoTime()
    (0 until slices).foreach { s =>
      val lo = s.toLong * (keyMax + 1) / slices
      val hi = (s + 1).toLong * (keyMax + 1) / slices
      SnapshotTable.commit(spark, table,
        li.filter(col("l_orderkey") >= lo && col("l_orderkey") < hi)
          .repartition(8))
    }
    val ingestSec = (System.nanoTime() - t0) / 1e9
    val vFrag = SnapshotTable.currentVersion(table)
    val filesBefore = SnapshotTable.entries(table, vFrag).size

    val t1 = System.nanoTime()
    val vComp = SnapshotTable.compactPlanned(spark, table, "l_orderkey",
      groups = 32)
    val compactSec = (System.nanoTime() - t1) / 1e9
    val filesAfter = SnapshotTable.entries(table, vComp).size

    // invariants: compacted HEAD and the pre-compaction version both
    // read the full row set; range pruning still works post-compaction
    val headRows = SnapshotTable.read(spark, table).count()
    val fragRows = SnapshotTable.readVersion(spark, table, vFrag).count()
    val pruned = SnapshotTable.filesForRange(table, vComp, "l_orderkey",
      0L, keyMax / slices).size

    println(s"""{"probe":"snapshot_sf1","rows":$nRows,""" +
      s""""ingest_commits":$slices,"ingest_sec":${f"$ingestSec%.2f"},""" +
      s""""files_before":$filesBefore,"files_after":$filesAfter,""" +
      s""""compact_sec":${f"$compactSec%.2f"},""" +
      s""""head_rows":$headRows,"timetravel_rows":$fragRows,""" +
      s""""rows_ok":${headRows == nRows && fragRows == nRows},""" +
      s""""files_pruned_first16th":$pruned}""")
    spark.stop()
  }
}
