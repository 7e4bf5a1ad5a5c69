package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** Structured Streaming semantics via MemoryStream (SURVEY.md §5.4):
  * watermark late-row drop, streaming dedup, batch/stream window parity,
  * custom keyed state. */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  import StreamOpsSpec.Ev

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  private def runStream(
      ops: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mode: String,
      batches: Seq[Seq[Ev]]): Array[org.apache.spark.sql.Row] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = s"out_${System.nanoTime()}"
    val q = ops(mem.toDF()).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      spark.table(name).collect()
    } finally q.stop()
  }

  test("tumbling stream counts equal the batch window() result") {
    val evs = (0 until 120).map(i =>
      Ev(i.toLong, ts(i * 2), i % 5, if (i % 2 == 0) "click" else "view", 1.0))
    val got = runStream(df => StreamOps.tumblingCounts(df), "complete",
      Seq(evs.take(60), evs.drop(60)))
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val want = evs.toDF()
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start", $"event_type", $"n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("watermark drops rows later than 10 minutes behind the max ts") {
    // batch 1 advances the clock to 02:00; batch 2 injects an event at
    // 00:05 — far behind the watermark → dropped from append output
    val onTime = (0 until 12).map(i => Ev(i.toLong, ts(i * 10), 1, "click", 1.0))
    val late = Seq(Ev(99L, ts(5), 1, "click", 1.0))
    val rows = runStream(df => StreamOps.tumblingCounts(df), "append",
      Seq(onTime, late, Seq(Ev(100L, ts(130), 1, "click", 1.0))))
    // the 00:00 window must have closed with only its on-time rows (6),
    // never re-emitted with the late row added
    val hour0 = rows.filter(_.getTimestamp(0) == ts(0))
    assert(hour0.length == 1 && hour0.head.getLong(2) == 6L)
  }

  test("dropDuplicatesWithinWatermark: replayed event ids appear once") {
    val evs = (0 until 10).map(i => Ev(i.toLong, ts(i), 1, "click", 1.0))
    val rows = runStream(df => StreamOps.dedupWithinWatermark(df), "append",
      Seq(evs, evs)) // exact replay — the streaming Entry::Vacant gate
    assert(rows.length == 10)
  }

  test("session stream windows match the batch session_window() result") {
    val evs = Seq(
      Ev(1, ts(0), 1, "a", 1.0), Ev(2, ts(10), 1, "a", 1.0),   // session 1
      Ev(3, ts(60), 1, "a", 1.0),                               // session 2
      Ev(4, ts(0), 2, "a", 1.0))                                // user 2
    val got = runStream(df => StreamOps.sessionize(df), "complete", Seq(evs))
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    val want = evs.toDF()
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n"))
      .select($"user_id", $"w.start", $"w.end", $"n")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(got == want)
  }

  test("sliding stream counts equal the batch sliding-window result") {
    val evs = (0 until 90).map(i =>
      Ev(i.toLong, ts(i * 3), i % 4, "click", 1.0))
    val got = runStream(df => StreamOps.slidingCounts(df), "complete",
      Seq(evs.take(45), evs.drop(45)))
      .map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    val want = evs.toDF()
      .groupBy(window($"ts", "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select($"window.start", $"n")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("stream-stream interval join pairs purchases with in-window signups") {
    implicit val sq = spark.sqlContext
    val pm = MemoryStream[Ev]
    val sm = MemoryStream[Ev]
    val name = s"out_${System.nanoTime()}"
    val q = StreamOps.purchasesWithRecentSignup(pm.toDF(), sm.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      sm.addData(Seq(
        Ev(10, ts(0), 1, "signup", 0),    // in window for purchase @30
        Ev(11, ts(0), 2, "signup", 0)))   // user 2: purchase too late
      pm.addData(Seq(
        Ev(20, ts(30), 1, "purchase", 5), // joins signup @0
        Ev(21, ts(90), 2, "purchase", 5), // signup 90 min earlier → out of window
        Ev(22, ts(40), 3, "purchase", 5)))// no signup at all
      q.processAllAvailable()
      // advance watermarks far enough to emit all results
      pm.addData(Seq(Ev(98, ts(600), 9, "purchase", 0)))
      sm.addData(Seq(Ev(99, ts(600), 9, "signup", 0)))
      q.processAllAvailable()
      val joined = spark.table(name).select("p_id").as[Long].collect().toSet
      assert(joined.contains(20L))
      assert(!joined.contains(21L) && !joined.contains(22L))
    } finally q.stop()
  }

  test("left-outer stream-stream join emits null rows once the watermark proves no match") {
    implicit val sq = spark.sqlContext
    val pm = MemoryStream[Ev]
    val sm = MemoryStream[Ev]
    val name = s"out_${System.nanoTime()}"
    val q = StreamOps.purchasesWithSignupOuter(pm.toDF(), sm.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      sm.addData(Seq(
        Ev(10, ts(0), 1, "signup", 0),    // in window for purchase @30
        Ev(11, ts(0), 2, "signup", 0)))   // user 2: purchase too late
      pm.addData(Seq(
        Ev(20, ts(30), 1, "purchase", 5), // joins signup @0
        Ev(21, ts(90), 2, "purchase", 5), // signup out of window → null row
        Ev(22, ts(40), 3, "purchase", 5)))// no signup at all → null row
      q.processAllAvailable()
      // only the watermark advancing can release the unmatched rows
      pm.addData(Seq(Ev(98, ts(600), 9, "purchase", 0)))
      sm.addData(Seq(Ev(99, ts(600), 9, "signup", 0)))
      q.processAllAvailable()
      val rows = spark.table(name)
        .select("p_id", "s_ts").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(rows(20L).nonEmpty)          // matched: signup ts present
      assert(rows(21L).isEmpty)           // out-of-interval: null-extended
      assert(rows(22L).isEmpty)           // never signed up: null-extended
    } finally q.stop()
  }

  test("stream-static join enriches a stream with a batch dim table") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val dims = Seq((0L, "bronze"), (1L, "silver"), (2L, "gold"))
      .toDF("user_id", "tier") // static side: read once, joined per batch
    val name = s"out_${System.nanoTime()}"
    val q = mem.toDF().join(dims, Seq("user_id"), "left_outer")
      .select($"event_id", $"tier")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      mem.addData(Seq(Ev(1, ts(0), 1, "click", 1.0), Ev(2, ts(1), 9, "click", 1.0)))
      q.processAllAvailable()
      val rows = spark.table(name).collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(rows(1L).contains("silver"))
      assert(rows(2L).isEmpty) // unknown user: left join keeps the event
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates per-user counts across batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val name = s"out_${System.nanoTime()}"
    val q = StreamOps.runningUserStats(mem.toDS()).toDF().writeStream
      .format("memory").queryName(name).outputMode("update").start()
    try {
      mem.addData(Seq((1L, ts(0)), (1L, ts(1)), (2L, ts(2))))
      q.processAllAvailable()
      mem.addData(Seq((1L, ts(3))))
      q.processAllAvailable()
      val last = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
      assert(last(1L) == 3L && last(2L) == 1L)
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits zero-to-many alert rows as thresholds are crossed") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val name = s"out_${System.nanoTime()}"
    val q = StreamOps.burstAlerts(mem.toDS()).toDF().writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      mem.addData(Seq((1L, ts(0))))                    // user 1 → 1 event: no alert
      q.processAllAvailable()
      assert(spark.table(name).count() == 0)
      mem.addData(Seq((1L, ts(1)), (1L, ts(2)), (1L, ts(3)), (1L, ts(4))))
      q.processAllAvailable()                          // 1 → 5: crosses 2 AND 4 in one batch
      val alerts = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(alerts == Set((1L, 2L), (1L, 4L)))
    } finally q.stop()
  }

  test("transformWithState matches mapGroupsWithState's final per-user stats") {
    // transformWithState only runs on the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val name = s"out_${System.nanoTime()}"
    val q = StreamOps.runningUserStatsTws(mem.toDS()).toDF().writeStream
      .format("memory").queryName(name).outputMode("update").start()
    try {
      mem.addData(Seq((1L, ts(5)), (1L, ts(1)), (2L, ts(2))))
      q.processAllAvailable()
      mem.addData(Seq((1L, ts(3)))) // late: count advances, lastTs must not regress
      q.processAllAvailable()
      val rows = spark.table(name)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
      val last = rows.groupBy(_._1).map { case (k, v) => k -> v.maxBy(_._2) }
      assert(last(1L)._2 == 3L && last(2L)._2 == 1L)
      assert(last(1L)._3 == ts(5), s"lastTs regressed: ${last(1L)._3}")
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}

object StreamOpsSpec {
  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
}
