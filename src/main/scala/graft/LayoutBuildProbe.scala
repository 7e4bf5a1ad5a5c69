package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: time the COLD build of every derived corpus layout — the
  * fit-once artifacts whose QUERY-side cost is already priced
  * (llm_ann_trained / llm_semdedup_trained pure probes, measured
  * linear) but whose amortized BUILD cost never had a committed number
  * (r17 verdict task 2). Deletes each published layout dir first, then
  * times the `ensure*` call from scratch:
  *
  *  - trained IVF, k=8 (`VectorOps.ensureTrainedLayout` — flat Lloyd)
  *  - trained IVF at the corpus-scaled semDedup k
  *    (`ensureSemDedupLayout` — the two-level O(n·√k) fit past
  *    [[graft.operators.VectorOps.TwoLevelFloor]])
  *  - PQ codebooks + encoded corpus (`ensurePqLayout`)
  *  - the dedup-cluster table (`GraphOps.ensureClusterLayout`)
  *  - the z-order events layout (`Formats.ensureZLayout`)
  *
  * Rebuilds are deterministic (content-fingerprinted keys, decimal-exact
  * centroid math), so deleting and rebuilding leaves every later query
  * byte-identical. One timed sample per build — a build is a one-off
  * corpus operation like ingest, and the growth question (sf10 → sf100
  * ratio) dominates sample noise at these durations.
  *
  * Usage: runMain graft.LayoutBuildProbe [sfDir]
  * Artifact: SPARK_GRAFT_PROBE_OUT=<path> (same contract as [[Probe]]).
  */
object LayoutBuildProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val localDir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp/graft-spill")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(localDir))
    def diskFreeGb(): Double =
      math.round(new java.io.File(localDir).getUsableSpace * 10.0 / (1L << 30)) / 10.0
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        Bench.scaledShufflePartitions(sfDir, 32))
      .config("spark.io.compression.codec", Bench.scaledCodec(sfDir))
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def loadavg(): Double =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split("\\s+")(0).toDouble
      catch { case scala.util.control.NonFatal(_) => -1.0 }
    def cpuJiffies(): (Long, Long) =
      try {
        val n = java.nio.file.Files.readAllLines(
            java.nio.file.Paths.get("/proc/stat")).get(0)
          .split("\\s+").drop(1).map(_.toLong)
        (if (n.length > 7) n(7) else 0L, n.take(8).sum)
      } catch { case scala.util.control.NonFatal(_) => (0L, 0L) }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    def sizeOf(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).map(sizeOf).sum
      else f.length()
    // file count per published layout (r18 verdict task 2): the
    // quadratic small-files defect this probe caught in r18 (a
    // partitionBy without prior co-location wrote task×cell files —
    // 19,626 for 65 MB at sf10; inode/PUT exhaustion on an object
    // store) was fixed by repartition-on-cell, but the fix lived only
    // in prose: values are layout-independent, so every correctness
    // board stays green if it regresses. The count makes it an
    // artifact-checked invariant — expect ≈ cell/shard count plus
    // bookkeeping; ≫ that is the explosion coming back.
    def fileCount(f: java.io.File): Int =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).map(fileCount).sum
      else 1
    def quiesce(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }

    import graft.operators.{GraphOps, VectorOps}
    // semDedupK is computed BEFORE the timed region (one metadata-cheap
    // count) and recorded — the artifact must say which k it priced
    val kSem = VectorOps.semDedupK(spark, sfDir)
    val builds: Seq[(String, String, () => String)] = Seq(
      ("ivf_trained_k8", VectorOps.trainedLayoutDirFor(sfDir, 8),
        () => VectorOps.ensureTrainedLayout(spark, sfDir)),
      // at small SF the corpus-scaled k degenerates to 8 and the two
      // entries would race on ONE dir — skip the duplicate, the k8 row
      // already is that build
      ("ivf_trained_semdedup_k" + kSem, VectorOps.trainedLayoutDirFor(sfDir, kSem),
        () => VectorOps.ensureSemDedupLayout(spark, sfDir)),
      ("pq", VectorOps.pqLayoutDir(sfDir),
        () => VectorOps.ensurePqLayout(spark, sfDir)),
      ("dedup_clusters", GraphOps.clusterLayoutDir(sfDir),
        () => GraphOps.ensureClusterLayout(spark, sfDir)),
      ("zorder", graft.sources.Formats.zLayoutDir(sfDir),
        () => graft.sources.Formats.ensureZLayout(spark, sfDir)))
      .filterNot { case (n, _, _) =>
        n.startsWith("ivf_trained_semdedup") && kSem == 8 }

    val loadBefore = loadavg()
    val diskBefore = diskFreeGb()
    val (steal0, jif0) = cpuJiffies()
    import Meta.jstr
    // _meta resolved ONCE, before the timed region — the git calls are
    // cheap but there is no reason to pay them inside a build window.
    // Shared helper (r18 advisor): see [[Meta.metaJson]].
    val metaJ = Meta.metaJson()

    val done = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double, Int)]
    // artifact written after EVERY build, partial:true until the loop
    // completes (the Probe r14 lesson: a crash at build 4 of 5 must only
    // lose the in-flight build, not the completed readings — this probe's
    // first sf100 run was killed by a harness timeout with zero output)
    def writeArtifact(partial: Boolean): Unit = {
      val loadAfter = loadavg()
      val (steal1, jif1) = cpuJiffies()
      val stealPct =
        if (jif1 > jif0) math.round(10000.0 * (steal1 - steal0) / (jif1 - jif0)) / 100.0
        else -1.0
      val buildsJ = done.map { case (n, s, _, _) =>
        s"${jstr(n)}:${String.format(java.util.Locale.ROOT, "%.3f", Double.box(s))}"
      }.mkString("{", ",", "}")
      val sizesJ = done.map { case (n, _, g, _) => s"${jstr(n)}:$g" }
        .mkString("{", ",", "}")
      val filesJ = done.map { case (n, _, _, fc) => s"${jstr(n)}:$fc" }
        .mkString("{", ",", "}")
      val line = s"""{"metric":"layout_build_cold","unit":"sec","_meta":$metaJ,""" +
        (if (partial) s""""partial":true,""" else "") +
        s""""shuffle_partitions":${spark.conf.get("spark.sql.shuffle.partitions")},""" +
        s""""codec":${jstr(spark.conf.get("spark.io.compression.codec"))},""" +
        s""""heap_gib":${math.round(Runtime.getRuntime.maxMemory * 10.0 / (1L << 30)) / 10.0},""" +
        s""""semdedup_k":$kSem,""" +
        s""""load":{"before":$loadBefore,"after":$loadAfter,"steal_pct":$stealPct},""" +
        s""""disk_free_gib":{"before":$diskBefore,"after":${diskFreeGb()},"dir":${jstr(localDir)}},""" +
        s""""builds":$buildsJ,"published_gib":$sizesJ,"files":$filesJ,"sf":${jstr(sfDir)}}"""
      sys.env.get("SPARK_GRAFT_PROBE_OUT").foreach { p =>
        java.nio.file.Files.write(java.nio.file.Paths.get(p),
          line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      if (!partial) println(line)
    }
    builds.foreach { case (name, dir, build) =>
      rm(new java.io.File(dir))
      quiesce()
      val t0 = System.nanoTime()
      val out = build()
      val sec = (System.nanoTime() - t0) / 1e9
      val gb = math.round(sizeOf(new java.io.File(out)) * 1000.0 / (1L << 30)) / 1000.0
      val fc = fileCount(new java.io.File(out))
      println(f"[build-probe] $name $sec%.2f s, $gb%.3f GiB published, $fc files")
      quiesce()
      done += ((name, sec, gb, fc))
      writeArtifact(partial = true)
    }
    writeArtifact(partial = false)
    sys.env.get("SPARK_GRAFT_PROBE_OUT").foreach(p =>
      System.err.println(s"[build-probe] artifact -> $p"))
    spark.stop()
  }
}
