package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing probe (dev tool, not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      // same corpus-scaled count as Bench so probe timings reproduce it;
      // SPARK_GRAFT_PARTS overrides for partition-count bisection
      .config("spark.sql.shuffle.partitions",
        sys.env.get("SPARK_GRAFT_PARTS").map(_.toInt)
          .getOrElse(Bench.scaledShufflePartitions(sfDir, 32)))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Unit = {
      val fn = SparkEntry.queries(name)
      // warm
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      // drop pinned blocks between runs — same discipline as Bench; a
      // multi-query probe otherwise accretes earlier queries' cached
      // state into later ones' memory budget (llm_bigrams read 36 s in
      // an 8-query probe chain vs ~22 s in the Bench sweep, r13)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%.2f s (warm)")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // "logical:<name>" prints the optimized logical plan (what
    // ProjectionLintSpec sweeps) instead of timing + physical plan
    args.drop(1).foreach {
      case n if n.startsWith("logical:") =>
        val name = n.stripPrefix("logical:")
        println(SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.optimizedPlan.treeString)
      case name =>
        run(name)
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
