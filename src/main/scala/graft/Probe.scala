package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing probe (dev tool, not part of the driver contract).
  *
  * Isolated per-query timing is the instrument for CROSS-ROUND per-query
  * claims (r13 rule): an in-sweep number carries its predecessors'
  * warm-state (the r13 skew_salted_join incident read +20.5 s in both
  * sweeps from a board edit that never touched it), where a probe run
  * times the query against a quiesced session. With
  * `SPARK_GRAFT_PROBE_OUT=<path>` the probe commits a JSON artifact
  * (per-query min-of-samples + every sample + load/steal window) so
  * round claims can quote a diffable file instead of prose — the r13
  * verdict's task 2. `SPARK_GRAFT_PROBE_SAMPLES` sets timed runs per
  * query (default 2; 1 for expensive one-off growth probes).
  *
  * `snapshot_*` write-path queries are probe-valid on current code
  * (r17 re-adjudication of the r13 caveat): each invocation of
  * snapshotMerge/snapshotTimetravel builds its OWN fresh temp table
  * (Files.createTempDirectory) and deletes it before returning, and
  * SnapshotTable keeps no cross-invocation JVM state — so the warm
  * pass cannot grow any version chain the timed samples see; every
  * sample times an identical fresh-table build. The r13 probe
  * inflation that motivated the old "in-sweep only" rule is
  * attributable to the accreted-pinned-blocks bug fixed in the same
  * commit (the quiesce() below); probe_r17_sf10.json confirms
  * isolated ≈ in-sweep for both queries on current code.
  */
object Probe {
  /** The fixed cross-round SENTINEL basket (r17 verdict task 1b): five
    * stable queries spanning the engine's cost families — scan+agg
    * (sql_q1), skewed shuffle (skew_salted_join), iterative
    * driver-coordinated (llm_kmeans), replicate-heavy CPU
    * (agg_bootstrap), snapshot write path (snapshot_merge). Probed
    * ISOLATED in a clean window each round at sf0.1
    * (`runMain graft.Probe <sfDir> sentinels` expands to exactly this
    * list), they adjudicate suite-total drift by instrument: if the
    * sweep total inflates but the sentinels sit on their prior values,
    * the drift is ambient; if the sentinels move with it, it is code or
    * config. Code-pinned so the basket cannot quietly change
    * composition between rounds. */
  val sentinels: Seq[String] = Seq(
    "sql_q1", "skew_salted_join", "llm_kmeans", "agg_bootstrap",
    "snapshot_merge")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // bounded scratch for shuffle spill: the r14 sf100 probe filled the
    // root disk mid-shuffle (ShuffleExternalSorter ENOSPC) because Spark
    // defaulted spark.local.dir to /tmp on the system volume. A probe at
    // big SF points it at a dedicated dir so spill files are attributable
    // and deletable, and the artifact records headroom next to load/steal.
    val localDir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp/graft-spill")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(localDir))
    def diskFreeGb(): Double =
      math.round(new java.io.File(localDir).getUsableSpace * 10.0 / (1L << 30)) / 10.0
    val builder = SparkSession.builder()
      .master("local[32]")
      // same corpus-scaled count as Bench so probe timings reproduce it;
      // SPARK_GRAFT_PARTS overrides for partition-count bisection
      .config("spark.sql.shuffle.partitions",
        sys.env.get("SPARK_GRAFT_PARTS").map(_.toInt)
          .getOrElse(Bench.scaledShufflePartitions(sfDir, 32)))
      .config("spark.local.dir", localDir)
      // corpus-scaled codec, same rule as Bench (zstd at ≥1 GiB input —
      // measured faster AND ~4× less spill on the sf10 heavy rows, and
      // required to fit sf100's biggest shuffles on one disk); set
      // before the SPARK_GRAFT_CONF fold so an explicit entry overrides
      .config("spark.io.compression.codec", Bench.scaledCodec(sfDir))
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_CONF="k=v;k=v" — extra session confs for one-off
    // probes, e.g. spark.io.compression.codec=zstd when a query's live
    // shuffle exceeds the single-box disk under lz4 (skew_salted_join
    // at sf100 spills >50 GiB against ~51 GiB sandbox headroom; zstd is
    // a measurement-environment lever, the query is untouched). Any
    // override is recorded in the artifact so the reading carries its
    // provenance. ';' is the entry separator and cannot appear inside a
    // value; malformed entries FAIL FAST (r15 advisor: a '=v' entry
    // used to set an empty-key conf that only errored at session start,
    // and a bad entry silently dropped is a probe run with the wrong
    // config whose artifact looks clean).
    val extraConf = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).filter(_.trim.nonEmpty)
      .map { kv =>
        require(kv.contains("=") && kv.split("=", 2)(0).trim.nonEmpty,
          s"SPARK_GRAFT_CONF entry '$kv' is not k=v with a non-empty key " +
            "(';' separates entries and cannot appear inside a value)")
        val Array(k, v) = kv.split("=", 2); (k.trim, v.trim)
      }
    val spark = extraConf.foldLeft(builder) { case (b, (k, v)) =>
      b.config(k, v) }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val artifactPath = sys.env.get("SPARK_GRAFT_PROBE_OUT")
    val nSamples = sys.env.get("SPARK_GRAFT_PROBE_SAMPLES").map(_.toInt).getOrElse(2)
    // fail fast on misconfiguration: 0/negative would only surface as
    // ss.min throwing AFTER every warm run had executed (r14 advisor)
    require(nSamples >= 1,
      s"SPARK_GRAFT_PROBE_SAMPLES must be >= 1, got $nSamples")
    // optional committed baseline artifact (another probe run's JSON)
    // for the cross-round ratio block below; parsed ONCE at startup so
    // a bad path fails before any measurement has been paid for
    val baseline: Option[(String, Map[String, Double])] =
      sys.env.get("SPARK_GRAFT_PROBE_BASELINE").map { p =>
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(new java.io.File(p))
        val q = node.get("queries")
        require(q != null, s"SPARK_GRAFT_PROBE_BASELINE=$p has no 'queries' field")
        import scala.jdk.CollectionConverters._
        (p, q.fieldNames().asScala.map(n => n -> q.get(n).asDouble()).toMap)
      }
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
    // drop pinned blocks between runs — same discipline as Bench; a
    // multi-query probe otherwise accretes earlier queries' cached
    // state into later ones' memory budget (llm_bigrams read 36 s in
    // an 8-query probe chain vs ~22 s in the Bench sweep, r13)
    def quiesce(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      // nudge the ContextCleaner: shuffle files of dereferenced plans
      // are only deleted once the JVM GCs the shuffle handles — at
      // sf100 a 10-query chain otherwise accretes tens of GB of dead
      // spill in spark.local.dir between queries (r14 ENOSPC crash)
      System.gc()
    }
    // warm (uncounted) + nSamples timed runs; returns every sample's
    // (seconds, device busy_pct, MB read, MB written) — the io triple
    // brackets EACH timed run, because a window-average gauge hides the
    // burst that inflated one sample (the steal lesson, r18/r19)
    def run(name: String): Seq[(Double, Double, Double, Double)] = {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      quiesce()
      (1 to nSamples).map { _ =>
        val io0 = Meta.diskStats()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        val (dev, busy, rdMb, wrMb) = Meta.ioDelta(io0, Meta.diskStats(), t * 1000.0)
        quiesce()
        println(f"[probe] $name $t%.2f s (warm; io $dev busy $busy%.1f%% " +
          f"rd $rdMb%.0f MB wr $wrMb%.0f MB)")
        (t, busy, rdMb, wrMb)
      }
    }
    val loadBefore = loadavg()
    val diskBefore = diskFreeGb()
    val (steal0, jif0) = cpuJiffies()
    // effective-CPU-speed bracket (r19): fixed-work spin before the
    // first query and after the last — in a VM, host frequency/SMT
    // degradation under co-tenant load shows up in NO kernel counter,
    // only in how fast fixed work actually runs
    val cpuBefore = Meta.cpuSpeedJson()
    System.err.println(s"[probe] cpu speed before: $cpuBefore")
    val done = scala.collection.mutable.ArrayBuffer
      .empty[(String, Seq[(Double, Double, Double, Double)])]
    def writeArtifact(partial: Boolean): Unit = artifactPath.foreach { p =>
      val loadAfter = loadavg()
      val diskAfter = diskFreeGb()
      val (steal1, jif1) = cpuJiffies()
      val stealPct =
        if (jif1 > jif0) math.round(10000.0 * (steal1 - steal0) / (jif1 - jif0)) / 100.0
        else -1.0
      val heapGb = math.round(Runtime.getRuntime.maxMemory * 10.0 / (1L << 30)) / 10.0
      val sorted = done.map { case (n, ss) => (n, ss.map(_._1), ss) }
        .sortBy(_._1)
      val qj = sorted.map { case (n, ss, _) => s"\"$n\":${ss.min}" }
        .mkString("{", ",", "}")
      val sj = sorted.map { case (n, ss, _) =>
        s"\"$n\":[" + ss.map(t =>
          String.format(java.util.Locale.ROOT, "%.3f", Double.box(t)))
          .mkString(",") + "]"
      }.mkString("{", ",", "}")
      // per-sample [busy_pct, MB read, MB written] of the busiest
      // device, parallel to `samples` — the I/O-starvation discriminator
      val ioJ = sorted.map { case (n, _, ss) =>
        s"\"$n\":[" + ss.map { case (_, b, r, w) =>
          s"[$b,$r,$w]" }.mkString(",") + "]"
      }.mkString("{", ",", "}")
      import Meta.jstr
      val confJ = extraConf.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
        .mkString("{", ",", "}")
      // _meta provenance, same fields as Bench/check.py (r17): a probe
      // reading is a cross-round instrument, so it names the exact tree
      // it measured instead of leaving that to commit-adjacency.
      // Shared helper (r18 advisor: the block had been copy-pasted into
      // four mains and drifted) — see [[Meta.metaJson]] for the
      // stderr-drain / untracked-files / porcelain-parse rules.
      val metaJ = Meta.metaJson()
      // cross-round comparison BY INSTRUMENT (r18 verdict task 1): with
      // SPARK_GRAFT_PROBE_BASELINE=<earlier probe artifact> the current
      // readings are ratioed against the committed baseline's `queries`
      // map inside THIS artifact — "did the sentinels move" becomes a
      // field a reader checks, not a python one-liner in round prose.
      val baselineJ = baseline.map { case (path, base) =>
        val ratios = sorted.flatMap { case (n, ss, _) =>
          base.get(n).filter(_ > 0).map(b =>
            s"${jstr(n)}:${String.format(java.util.Locale.ROOT, "%.3f",
              Double.box(ss.min / b))}")
        }.mkString("{", ",", "}")
        s""""baseline":{"path":${jstr(path)},"rule":"ratio = cur_min / baseline_min","ratios":$ratios},"""
      }.getOrElse("")
      val line = s"""{"metric":"probe_isolated","unit":"sec","samples_per_query":$nSamples,""" +
        s""""_meta":$metaJ,""" +
        (if (partial) s""""partial":true,""" else "") +
        (if (extraConf.nonEmpty) s""""extra_conf":$confJ,""" else "") +
        s""""shuffle_partitions":${spark.conf.get("spark.sql.shuffle.partitions")},""" +
        s""""codec":${jstr(spark.conf.get("spark.io.compression.codec"))},""" +
        s""""heap_gib":$heapGb,""" +
        s""""load":{"before":$loadBefore,"after":$loadAfter,"steal_pct":$stealPct},""" +
        s""""disk_free_gib":{"before":$diskBefore,"after":$diskAfter,"dir":${jstr(localDir)}},""" +
        baselineJ +
        // "after" spin only on the final write — it costs ~2 s, and the
        // per-query partial snapshots only need the window's entry state
        s""""cpu":{"before":$cpuBefore${
          if (partial) "" else s""","after":${Meta.cpuSpeedJson()}"""}},""" +
        s""""queries":$qj,"samples":$sj,"io":$ioJ,"sf":${jstr(sfDir)}}"""
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (!partial) { System.err.println(s"[probe] artifact -> $p"); println(line) }
    }
    // a repeated query name would emit a duplicate key into the
    // artifact's queries/samples objects, which JSON parsers resolve
    // inconsistently (r15 advisor) — de-duplicate order-preservingly
    // and say so, rather than time the same query twice
    // "sentinels" expands to the code-pinned cross-round basket above
    val expanded = args.drop(1)
      .flatMap(a => if (a == "sentinels") sentinels else Seq(a))
    val argQueries = expanded.distinct
    if (argQueries.size < expanded.size)
      System.err.println("[probe] duplicate query names in args de-duplicated: " +
        expanded.diff(argQueries).mkString(", "))
    // "logical:<name>" prints the optimized logical plan (what
    // ProjectionLintSpec sweeps) instead of timing + physical plan
    val timed = argQueries.flatMap {
      case n if n.startsWith("logical:") =>
        val name = n.stripPrefix("logical:")
        println(SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.optimizedPlan.treeString)
        None
      // "finalplan:<name>" executes the query ONCE through its own
      // QueryExecution (foreachPartition, not a noop write — the write
      // would attach the adaptive plan to a separate execution) and
      // prints the FINAL adaptive physical plan: the join strategies
      // AQE actually chose at this SF, not the static planner guess.
      // The instrument for broadcast-threshold adjudications (r14
      // verdict task 2: which perplexity_held join grew at sf100).
      case n if n.startsWith("finalplan:") =>
        val name = n.stripPrefix("finalplan:")
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.foreachPartition((_: Iterator[org.apache.spark.sql.Row]) => ())
        println(df.queryExecution.executedPlan.treeString)
        quiesce()
        None
      case name =>
        val samples = run(name)
        // plan dump is probe-console material, not artifact material —
        // suppress it on artifact runs so a 10-query probe's stdout
        // stays readable
        if (artifactPath.isEmpty)
          SparkEntry.queries(name)(spark, sfDir).explain("formatted")
        // write the artifact AFTER EVERY query, not once at the end: the
        // r14 sf100 probe died on ENOSPC at query 7 of 10 and took all
        // six completed readings with it — a crash must only lose the
        // in-flight query. partial:true marks an in-progress snapshot;
        // the final write (below, after the loop) clears it.
        done += (name -> samples)
        writeArtifact(partial = true)
        Some(name -> samples)
    }
    assert(timed.sizeIs == done.size) // every timed query reached the artifact
    writeArtifact(partial = false)
    spark.stop()
  }
}
