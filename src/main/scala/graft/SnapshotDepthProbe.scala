package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** Dev probe: scale the snapshot table's VERSION CHAIN, not its data
  * (r17 verdict task 3). Every prior snapshot growth artifact scales
  * the corpus (one merge on a bigger table); this one holds the table
  * at sf1 and drives `depth` SEQUENTIAL merges — the daily-upsert
  * shape — then measures what a deep history costs:
  *
  *  - per-merge wall time across the chain (does merge i grow with i?
  *    candidates fragment as rewrites widen file key ranges, so the
  *    stats prune CAN degrade with depth — this measures whether it
  *    does);
  *  - manifest file count + byte size per version (each manifest is a
  *    SELF-CONTAINED listing, so a read opens exactly one manifest —
  *    cost is O(files in that version), never O(versions); the probe
  *    proves it by timing readVersion at the head vs at v2);
  *  - `rowChanges(head-1, head)` — the incremental CDF consumer's cost
  *    at depth — and `rowChanges(1, head)`, the full-history replay;
  *  - `compactPlanned` at the end + a re-read, the maintenance op that
  *    resets whatever fragmentation the chain accreted.
  *
  * Usage: runMain graft.SnapshotDepthProbe [sfDir] [depth] [tableDir]
  * Artifact: SPARK_GRAFT_PROBE_OUT=<path> (same contract as [[Probe]]).
  */
object SnapshotDepthProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata-scaled/sf1")
    val depth = args.lift(1).map(_.toInt).getOrElse(100)
    // fail BEFORE the session and table build: depth<1 makes head-1 = 0
    // and rowChanges/readVersion(…, 2) die only after the table was
    // paid for (r18 advisor)
    require(depth >= 1, s"depth must be >= 1, got $depth")
    val table = args.lift(2).getOrElse("target/probe/snap_depth")
    val localDir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp/graft-spill")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(localDir))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        Bench.scaledShufflePartitions(sfDir, 32))
      .config("spark.io.compression.codec", Bench.scaledCodec(sfDir))
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Paths.get(table)
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(root)) { st =>
        st.iterator().asScala.toSeq
      }.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }

    def loadavg(): Double =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split("\\s+")(0).toDouble
      catch { case scala.util.control.NonFatal(_) => -1.0 }
    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    // full-plan execution with zero write cost, same sink as Bench
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("o_totalprice"))
      .localCheckpoint()
    val keyMax = orders.agg(max("o_orderkey")).head().getLong(0)

    val loadBefore = loadavg()
    // v1: the same 4-file range layout the sf1 snapshot queries commit
    val (commitSec, _) = time {
      SnapshotTable.commit(spark, table,
        orders.repartitionByRange(4, col("o_orderkey")), append = false)
    }
    // depth × the daily-upsert shape: each merge repices a ~1000-wide
    // key window that SLIDES across the table (so different merges
    // touch different files) and appends a handful of brand-new keys
    val mergeSecs = new Array[Double](depth)
    val fileCounts = new Array[Int](depth)
    val manifestKb = new Array[Double](depth)
    (1 to depth).foreach { i =>
      val lo = 1L + ((i - 1).toLong * keyMax / depth)
      val updates = orders
        .filter(col("o_orderkey").between(lo, lo + 1000))
        .withColumn("o_totalprice",
          (col("o_totalprice") + lit(i)).cast("decimal(18,2)"))
        .unionByName(orders
          .filter(col("o_orderkey").between(1L + (i - 1) * 50L, i * 50L))
          .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L)))
      val (sec, v) = time { SnapshotTable.merge(spark, table, updates, "o_orderkey") }
      mergeSecs(i - 1) = sec
      fileCounts(i - 1) = SnapshotTable.entries(table, v).size
      manifestKb(i - 1) = math.round(java.nio.file.Files.size(
        java.nio.file.Paths.get(table, "manifests", f"manifest-$v%05d")) / 102.4) / 10.0
      if (i % 10 == 0)
        println(f"[depth-probe] merge $i%3d: $sec%.2f s, files=${fileCounts(i - 1)}, " +
          f"manifest=${manifestKb(i - 1)}%.1f KB")
    }
    val head = SnapshotTable.currentVersion(table)

    // reads at depth: one manifest open each — the head read must cost
    // O(files at head), and the v2 read must NOT pay for the 100
    // versions committed after it
    val (readHeadSec, _) = time { drain(SnapshotTable.readVersion(spark, table, head)) }
    val (readV2Sec, _) = time { drain(SnapshotTable.readVersion(spark, table, 2L)) }
    val (cdfLastSec, _) = time {
      drain(SnapshotTable.rowChanges(spark, table, head - 1, head, "o_orderkey")) }
    val (cdfFullSec, _) = time {
      drain(SnapshotTable.rowChanges(spark, table, 1, head, "o_orderkey")) }
    // maintenance: one planned compaction, then the head read again
    val (compactSec, vComp) = time {
      SnapshotTable.compactPlanned(spark, table, "o_orderkey", groups = 8) }
    val filesAfterCompact = SnapshotTable.entries(table, vComp).size
    val (readCompSec, _) = time { drain(SnapshotTable.read(spark, table)) }
    val loadAfter = loadavg()

    import Meta.jstr
    def arr(xs: Seq[Double]): String = xs.map(x =>
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(x)))
      .mkString("[", ",", "]")
    // shared provenance helper (r18 advisor): see [[Meta.metaJson]]
    val metaJ = Meta.metaJson()
    // decile means make the growth curve readable at a glance; the full
    // per-merge series rides along for anyone who wants the raw shape
    val decile = mergeSecs.grouped(math.max(1, depth / 10)).map(g =>
      g.sum / g.length).toSeq
    val line = s"""{"metric":"snapshot_depth","unit":"sec","depth":$depth,""" +
      s""""_meta":$metaJ,""" +
      s""""shuffle_partitions":${spark.conf.get("spark.sql.shuffle.partitions")},""" +
      s""""heap_gib":${math.round(Runtime.getRuntime.maxMemory * 10.0 / (1L << 30)) / 10.0},""" +
      s""""load":{"before":$loadBefore,"after":$loadAfter},""" +
      s""""commit_sec":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(commitSec))},""" +
      s""""merge_sec_decile_means":${arr(decile)},""" +
      s""""merge_sec":${arr(mergeSecs.toSeq)},""" +
      s""""files_per_version":${fileCounts.mkString("[", ",", "]")},""" +
      s""""manifest_kb_per_version":${arr(manifestKb.toSeq)},""" +
      s""""read_head_sec":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(readHeadSec))},""" +
      s""""read_v2_sec":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(readV2Sec))},""" +
      s""""cdf_last_step_sec":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(cdfLastSec))},""" +
      s""""cdf_full_history_sec":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(cdfFullSec))},""" +
      s""""compact_sec":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(compactSec))},""" +
      s""""files_after_compact":$filesAfterCompact,""" +
      s""""read_after_compact_sec":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(readCompSec))},""" +
      s""""sf":${jstr(sfDir)}}"""
    sys.env.get("SPARK_GRAFT_PROBE_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[depth-probe] artifact -> $p")
    }
    println(line)
    spark.stop()
  }
}
