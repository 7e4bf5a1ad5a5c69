package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming operators (SURVEY.md §2 Part B rows B38-B42).
  *
  * Each takes a *streaming* DataFrame of events
  * (`event_id, ts: timestamp, user_id, event_type, value`) and returns a
  * streaming DataFrame; the batch-equivalent forms live in
  * [[graft.operators.Windows]] (identical semantics — that is the
  * batch/stream parity Structured Streaming guarantees). MemoryStream
  * scalatests drive these (`StreamOpsSpec`).
  *
  * The reference has no streams; its idempotent-ingest gate
  * (/root/reference/src/data_manager.rs:223-256) carries over as
  * [[dedupWithinWatermark]] (B42).
  *
  * Scale: state stores are keyed by (window/user/event id) and bounded by
  * the watermark — late data past 10 minutes is dropped instead of
  * growing state forever, the only stable configuration at 100 TB/day
  * stream rates.
  */
object StreamOps {

  /** B38 streaming tumbling-window counts, append mode after watermark. */
  def tumblingCounts(events: DataFrame, gap: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", gap)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))

  /** B39 sliding windows on a stream. */
  def slidingCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("n"))

  /** B40 session windows per user (30-minute gap), streaming form. */
  def sessionize(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("ws"), col("w.end").as("we"), col("n"))

  /** Stream-stream interval join: purchases joined to the signup of the
    * same user within the preceding hour. Both sides watermarked so the
    * join state is bounded (Spark buffers each side only until the
    * watermark passes the interval bound — the only shape that survives
    * unbounded streams). */
  def purchasesWithRecentSignup(purchases: DataFrame, signups: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val s = signups.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
    p.join(s,
      col("p_user") === col("s_user") &&
        col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
  }

  /** Left-outer stream-stream interval join: every purchase emits
    * exactly once — enriched when a signup matched within the hour,
    * with nulls once the watermark PROVES no match can still arrive
    * (before that, "no match yet" is indistinguishable from "match in
    * flight", which is why outer stream joins demand both watermarks
    * and an event-time range bound; without them the null row could
    * never be emitted and match state could never be evicted). */
  def purchasesWithSignupOuter(purchases: DataFrame, signups: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val s = signups.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
    p.join(s,
      col("p_user") === col("s_user") &&
        col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"),
      "left_outer")
  }

  /** B42 stateful dedup on event_id within the watermark — streaming
    * idempotent ingest (the reference's Entry::Vacant gate, A4). */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** B42 custom keyed state: running per-user event counter + last-seen
    * timestamp via mapGroupsWithState (the escape hatch when built-in
    * windows can't express the state machine). */
  final case class UserStat(userId: Long, nEvents: Long, lastTs: java.sql.Timestamp)
  def runningUserStats(events: Dataset[(Long, java.sql.Timestamp)]): Dataset[UserStat] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[UserStat, UserStat](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp)], state: GroupState[UserStat]) =>
          val batch = rows.toSeq
          val prev = state.getOption.getOrElse(UserStat(uid, 0L, batch.head._2))
          // last-seen must never regress when a late batch arrives
          val batchMax = batch.map(_._2).maxBy(_.getTime)
          val next = UserStat(uid, prev.nEvents + batch.size,
            if (batchMax.getTime > prev.lastTs.getTime || prev.nEvents == 0) batchMax
            else prev.lastTs)
          state.update(next)
          next
      }
  }

  /** B42 `flatMapGroupsWithState`: zero-or-many outputs per group per
    * batch — the state machine [[runningUserStats]] can't express
    * (mapGroupsWithState must emit exactly one row per group). Emits an
    * alert row for EACH threshold the user's running event count crosses
    * in a batch (so one batch can emit several, or none). */
  final case class Burst(userId: Long, threshold: Long)
  def burstAlerts(events: Dataset[(Long, java.sql.Timestamp)],
      thresholds: Seq[Long] = Seq(2L, 4L)): Dataset[Burst] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[Long, Burst](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp)], state: GroupState[Long]) =>
          val before = state.getOption.getOrElse(0L)
          val after = before + rows.size
          state.update(after)
          thresholds.filter(t => before < t && t <= after)
            .map(Burst(uid, _)).iterator
      }
  }

  /** [[runningUserStats]] on the current API: `transformWithState`
    * (Spark 4's successor to mapGroupsWithState). Typed `ValueState` in
    * the RocksDB state store, optional TTL per state variable, timers,
    * and schema evolution — the shape new stateful pipelines should use.
    * Semantics identical to the mapGroupsWithState form; StreamOpsSpec
    * proves the two emit the same final per-user stats. */
  private class UserStatsProcessor
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp), UserStat] {
    @transient private var stat: ValueState[UserStat] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stat = getHandle.getValueState[UserStat](
        "userStat", Encoders.product[UserStat], TTLConfig.NONE)

    override def handleInputRows(
        uid: Long,
        rows: Iterator[(Long, java.sql.Timestamp)],
        timers: TimerValues): Iterator[UserStat] = {
      val batch = rows.toSeq
      val prev =
        if (stat.exists()) stat.get()
        else UserStat(uid, 0L, batch.head._2)
      // last-seen must never regress when a late batch arrives
      val batchMax = batch.map(_._2).maxBy(_.getTime)
      val next = UserStat(uid, prev.nEvents + batch.size,
        if (batchMax.getTime > prev.lastTs.getTime || prev.nEvents == 0) batchMax
        else prev.lastTs)
      stat.update(next)
      Iterator.single(next)
    }
  }

  /** transformWithState requires the RocksDB state store provider
    * (set `spark.sql.streaming.stateStore.providerClass` to
    * `...state.RocksDBStateStoreProvider` before starting the query). */
  def runningUserStatsTws(
      events: Dataset[(Long, java.sql.Timestamp)]): Dataset[UserStat] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new UserStatsProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
