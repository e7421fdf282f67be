package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming forms of the event-time operators
  * (SURVEY.md §2.C): the same hourly rollup and sessionization as
  * `operators.Events`, expressed incrementally — file source →
  * watermark → windowed agg / stateful flatMapGroupsWithState →
  * sink. In production the source is a stream (files landing, Kafka);
  * here the parquet table replayed through `readStream` exercises the
  * identical plan, and EventsStreamingSpec pins streaming results to
  * the batch results.
  */
object EventsStreaming {

  /** The events parquet stores ns timestamps: stream-read them as raw
    * longs (same nanosAsLong contract as Tables.events) and floor to
    * a microsecond event-time column.
    */
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** `eventsDir` is a DIRECTORY into which event parquet files land
    * (the streaming file source contract — new files are discovered
    * per trigger).
    */
  def readEvents(spark: SparkSession, eventsDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      .parquet(eventsDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000L")))
  }

  /** Stage the test table's single parquet file into a fresh
    * directory so it can drive the streaming source.
    */
  def stageEventsDir(sfDir: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.createSymbolicLink(
      d.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    d.toString
  }

  /** Tumbling 1-hour event-time window per type, 2-hour watermark.
    * Late data beyond the watermark is dropped and state is bounded —
    * the property that lets this run forever on an unbounded stream.
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("value_sum"))
      .select(unix_millis(col("window.start")).as("hour_ms"),
        col("event_type"), col("n_events"), col("value_sum"))

  case class Ev(event_id: Long, user_id: Long, ms: Long, value: Double)
  case class Session(user_id: Long, session_seq: Long,
      session_start_ms: Long, session_end_ms: Long,
      n_events: Long, value_sum: Double)
  case class SessState(lastMs: Long, seq: Long)

  val GapMs: Long = 30L * 60 * 1000

  /** Stateful gap sessionizer: per-user GroupState carries the last
    * event time and session counter across triggers; each invocation
    * emits the sessions it can close. State per user is O(1) — the
    * shape that holds at any stream length.
    */
  def sessionize(spark: SparkSession, events: DataFrame): Dataset[Session] = {
    import spark.implicits._
    val evs = events.select(col("event_id"), col("user_id"),
      unix_millis(col("ts")).as("ms"), col("value")).as[Ev]
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Ev], state: GroupState[SessState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ms, e.event_id))
          var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          var cur: Option[Session] = None
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.ms - s.session_end_ms <= GapMs =>
                cur = Some(s.copy(session_end_ms = e.ms,
                  n_events = s.n_events + 1, value_sum = s.value_sum + e.value))
              case maybe =>
                maybe.foreach(out += _)
                st = st.copy(seq = st.seq + 1)
                cur = Some(Session(userId, st.seq, e.ms, e.ms, 1L, e.value))
            }
          }
          // single-batch replay: flush the trailing session too
          cur.foreach(out += _)
          state.update(st)
          out.iterator
      }
  }

  /** Watermarked streaming dedup — the exactly-once ingest pattern:
    * duplicate event_ids arriving within the watermark horizon are
    * dropped; state is bounded by the watermark. Returns per-type
    * counts over the deduplicated stream.
    */
  def dedupCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"))

  /** Run a streaming query against a memory sink until the source is
    * drained; returns the collected sink table.
    */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      mode: String = "append"): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
