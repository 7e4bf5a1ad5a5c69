package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-window operators over `events` (SURVEY.md §2 Part B rows B38-B40).
  *
  * These are the batch forms of the Structured Streaming window operators
  * (`window`, `session_window` are semantically identical in batch and
  * streaming, which is what makes them oracle-able). The live streaming
  * variants — watermarks, late data, stateful dedup — are in
  * [[graft.streaming.StreamOps]] and covered by MemoryStream scalatests
  * (SURVEY.md §5.4).
  *
  * The reference has no stream surface; block-number ordering within a
  * dataset (/root/reference/src/lib.rs:23) is its implicit time axis
  * (SURVEY.md §1.1), which the `events.ts` axis generalizes.
  *
  * Scale: tumbling/sliding aggregation shuffles once on (window, keys);
  * session windows shuffle on user_id then sort within partitions —
  * exactly the plan a 1000-executor cluster wants.
  */
object Windows {

  /** B38 tumbling 1-hour windows: per (window, event_type) counts + exact
    * decimal value sums. */
  def tumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("ws", "event_type")

  /** B39 sliding windows (1 hour every 15 min): each event lands in 4
    * windows; Spark emits only non-empty windows, epoch-aligned. */
  def sliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("n"))
      .orderBy("ws")

  /** B40 session windows: per-user sessions closed by a 30-minute gap;
    * window end = last event + gap (half-open, Spark semantics). */
  def session(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("user_id") < 30)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("w.start").as("ws"), col("w.end").as("we"), col("n"), col("sum_value"))
      .orderBy("user_id", "ws")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling" -> (tumbling(_, _)),
    "stream_sliding"  -> (sliding(_, _)),
    "stream_session"  -> (session(_, _))
  )

  def oracles: Map[String, String] = Map(
    "stream_tumbling" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_sliding" ->
      """WITH b AS (
        |  SELECT date_trunc('hour', min(CAST(ts AS TIMESTAMP))) - INTERVAL 1 HOUR AS lo,
        |         max(CAST(ts AS TIMESTAMP)) AS hi
        |  FROM events),
        |starts AS (
        |  SELECT unnest(generate_series((SELECT lo FROM b), (SELECT hi FROM b),
        |                                INTERVAL 15 MINUTE)) AS ws)
        |SELECT ws, CAST(COUNT(*) AS BIGINT) AS n
        |FROM events e JOIN starts s
        |  ON CAST(e.ts AS TIMESTAMP) >= s.ws
        | AND CAST(e.ts AS TIMESTAMP) < s.ws + INTERVAL 1 HOUR
        |GROUP BY ws ORDER BY ws""".stripMargin,
    "stream_session" ->
            """WITH flagged AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events WHERE user_id < 30),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, MIN(ts) AS ws, MAX(ts) + INTERVAL 30 MINUTE AS we,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sessions GROUP BY user_id, sid ORDER BY user_id, ws""".stripMargin
  )
}
