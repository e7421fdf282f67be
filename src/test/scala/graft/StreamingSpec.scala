package graft

import org.apache.spark.sql.functions._
import graft.operators.Events
import graft.streaming.EventsStreaming

class StreamingSpec extends SparkTestBase {

  lazy val eventsDir: String = EventsStreaming.stageEventsDir(SfDir)

  test("streaming hourly rollup equals the batch rollup after drain") {
    val stream = EventsStreaming.hourlyRollup(
      EventsStreaming.readEvents(spark, eventsDir))
    // complete mode so the trailing windows (not yet closed by the
    // watermark when the source drains) are visible for comparison
    val got = EventsStreaming.runToMemory(spark, stream, "hourly", "complete")
      .select("hour_ms", "event_type", "n_events", "value_sum")
    val want = Events.hourlyRollup(spark, SfDir)
      .select("hour_ms", "event_type", "n_events", "value_sum")
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("stateful streaming sessionizer equals the batch sessionizer") {
    import spark.implicits._
    val sessions = EventsStreaming.sessionize(spark,
      EventsStreaming.readEvents(spark, eventsDir))
    val got = EventsStreaming.runToMemory(spark, sessions.toDF, "sessions")
      .select("user_id", "session_seq", "session_start_ms",
        "session_end_ms", "n_events")
    val want = Events.sessionize(spark, SfDir)
      .select("user_id", "session_seq", "session_start_ms",
        "session_end_ms", "n_events")
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }
}
