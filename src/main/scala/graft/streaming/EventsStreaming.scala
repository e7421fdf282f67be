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

  // carries the raw `ts` (not a derived long) so the watermark tag on
  // the column survives to the stateful operator — EventTimeTimeout
  // requires a watermarked attribute in its input
  case class Ev(event_id: Long, user_id: Long, ts: java.sql.Timestamp, value: Double) {
    def ms: Long = ts.getTime
  }
  case class Session(user_id: Long, session_seq: Long,
      session_start_ms: Long, session_end_ms: Long,
      n_events: Long, value_sum: Double)
  /** Per-user state: the (possibly open) most-recent session. A closed
    * record (`open = false`) is kept as a tombstone so the session
    * counter stays monotone across watermark closes and restarts —
    * state per user stays O(1) at any stream length.
    */
  case class SessState(seq: Long, startMs: Long, endMs: Long,
      nEvents: Long, valueSum: Double, open: Boolean)

  val GapMs: Long = 30L * 60 * 1000

  /** Stateful gap sessionizer: per-user GroupState carries the OPEN
    * session across triggers, so a session spanning a micro-batch (or
    * checkpoint-restart) boundary is emitted exactly once, identical
    * to the batch `Events.sessionize`. Sessions are emitted only when
    * they provably closed: either a later event opened the next
    * session, or the event-time watermark passed `end + gap`
    * (EventTimeTimeout). Append mode never retracts.
    */
  def sessionize(spark: SparkSession, events: DataFrame): Dataset[Session] = {
    import spark.implicits._
    val evs = events
      .withWatermark("ts", "2 hours")
      .select(col("event_id"), col("user_id"), col("ts"), col("value")).as[Ev]
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Ev], state: GroupState[SessState]) =>
          def emit(s: SessState) = Session(userId, s.seq, s.startMs, s.endMs,
            s.nEvents, math.round(s.valueSum * 100.0) / 100.0)
          if (state.hasTimedOut) {
            val s = state.get
            state.update(s.copy(open = false)) // tombstone keeps seq monotone
            if (s.open) Iterator.single(emit(s)) else Iterator.empty
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ms, e.event_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            var st = state.getOption.getOrElse(
              SessState(0L, 0L, 0L, 0L, 0.0, open = false))
            sorted.foreach { e =>
              if (st.open && e.ms - st.endMs <= GapMs) {
                st = st.copy(endMs = math.max(st.endMs, e.ms),
                  nEvents = st.nEvents + 1, valueSum = st.valueSum + e.value)
              } else {
                if (st.open) out += emit(st)
                st = SessState(st.seq + 1, e.ms, e.ms, 1L, e.value, open = true)
              }
            }
            state.update(st)
            if (st.open) {
              // the timeout timestamp must sit above the current
              // watermark or Spark rejects it
              state.setTimeoutTimestamp(
                math.max(st.endMs + GapMs, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  /** Streaming word count — the reference's flagship job over a
    * stream of raw text files (new files are discovered per trigger,
    * exactly the reference's directory-input contract). Complete-mode
    * counts converge to the batch wordcount once the source drains;
    * the incremental state is the per-word partial count, the same
    * map-side partial aggregation as the batch plan.
    */
  def wordcount(spark: SparkSession, textDir: String): DataFrame =
    spark.readStream.text(textDir)
      .select(explode(graft.functions.Text.tokens(col("value"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Test/staging helper: write `df` as a single parquet file dropped
    * atomically into `watchDir` — one streaming-source "file arrival".
    */
  def dropFile(df: DataFrame, watchDir: String, name: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_drop")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.toFile.listFiles().find(_.getName.startsWith("part-")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(watchDir, s"$name.parquet"))
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
