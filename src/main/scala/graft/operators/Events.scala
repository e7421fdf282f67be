package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time analytics over the `events` table (SURVEY.md §2.C).
  * Batch forms here; the same computations run incrementally in
  * `graft.streaming.EventsStreaming` (readStream + watermark).
  *
  * Timestamp parity note: the source parquet stores nanosecond
  * timestamps. Spark truncates to microseconds on read; DuckDB keeps
  * nanoseconds. Any RAW timestamp that reaches an output or a
  * comparison therefore goes through epoch-milliseconds
  * (`unix_millis` / `epoch_ms`) — both engines floor to the same
  * integer. `date_trunc` to hour/day is exact at either precision.
  */
object Events {

  /** Tumbling-window rollup: hour × event_type. */
  def hourlyRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("value_sum"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("hour_ms", "event_type")

  /** Per-user activity profile. */
  def userActivity(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        round(sum(col("value")), 2).as("value_sum"),
        min(unix_millis(col("ts"))).as("first_ms"),
        max(unix_millis(col("ts"))).as("last_ms"))
      .orderBy("user_id")

  /** Gap-based sessionization (30-min inactivity splits), the classic
    * lag → flag → cumulative-sum session assignment. At scale this is
    * one shuffle on user_id; the window sort is per-user.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_millis(col("ts")).as("ms"))
      .withColumn("prev_ms", lag(col("ms"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > 30L * 60 * 1000, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(min(col("ms")).as("session_start_ms"),
        max(col("ms")).as("session_end_ms"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("value_sum"))
      .orderBy("user_id", "session_seq")
  }

  /** Semi-structured JSON prop extraction + aggregation. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("k_sum"),
        max(col("k")).as("k_max"))
      .orderBy("event_type")

  val queries: Map[String, GQuery] = Map(
    "ev_hourly_rollup" -> GQuery.sql(hourlyRollup,
      """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
        |  count(*) AS n_events,
        |  round(sum(value), 2) AS value_sum,
        |  count(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "ev_user_activity" -> GQuery.sql(userActivity,
      """SELECT user_id, count(*) AS n_events,
        |  count(DISTINCT event_type) AS n_types,
        |  round(sum(value), 2) AS value_sum,
        |  min(epoch_ms(ts)) AS first_ms,
        |  max(epoch_ms(ts)) AS last_ms
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
    "ev_sessionize" -> GQuery.sql(sessionize,
      """WITH flagged AS (
        |  SELECT user_id, event_id, value, epoch_ms(ts) AS ms,
        |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 30*60*1000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
        |sessions AS (
        |  SELECT user_id, event_id, value, ms,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq,
        |  min(ms) AS session_start_ms, max(ms) AS session_end_ms,
        |  count(*) AS n_events, round(sum(value), 2) AS value_sum
        |FROM sessions GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin),
    "ev_json_extract" -> GQuery.sql(jsonExtract,
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
  )
}
