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

  test("streaming sliding-window rollup equals the batch computation") {
    val stream = EventsStreaming.slidingRollup(
      EventsStreaming.readEvents(spark, eventsDir))
    val got = EventsStreaming.runToMemory(spark, stream, "sliding", "complete")
      .select("win_ms", "event_type", "n_events", "value_sum")
    // batch oracle: the identical sliding-window aggregation on the
    // static table — every event must land in exactly two windows
    val want = Tables.events(spark, SfDir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("value_sum"))
      .select(unix_millis(col("window.start")).as("win_ms"),
        col("event_type"), col("n_events"), col("value_sum"))
    assert(got.count() > 0)
    assert(got.agg(sum("n_events")).collect()(0).getLong(0) ==
      2 * Tables.events(spark, SfDir).count())
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming wordcount over staged text drops equals the batch wordcount") {
    import org.apache.spark.sql.DataFrame
    val watch = java.nio.file.Files.createTempDirectory("graft_wc_stream").toString
    def dropText(df: DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_droptxt")
      df.coalesce(1).write.mode("overwrite").text(tmp.toString)
      val part = tmp.toFile.listFiles().find(_.getName.startsWith("part-")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(watch, s"$name.txt"))
    }
    val docs = Tables.documents(spark, SfDir)
    val half = docs.count() / 2
    val q = EventsStreaming.wordcount(spark, watch)
      .writeStream.outputMode("complete").format("memory")
      .queryName("wcstream").start()
    try {
      dropText(docs.filter(col("doc_id") < half).select("text"), "a")
      q.processAllAvailable()
      dropText(docs.filter(col("doc_id") >= half).select("text"), "b")
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("wcstream")
    val want = graft.operators.WordCount.wordcount(spark, SfDir)
      .select("word", "cnt")
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("streaming space-saving summary brackets batch counts; wide cap is exact") {
    import org.apache.spark.sql.DataFrame
    val watch = java.nio.file.Files.createTempDirectory("graft_hh_stream").toString
    def dropText(df: DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_drophh")
      df.coalesce(1).write.mode("overwrite").text(tmp.toString)
      val part = tmp.toFile.listFiles().find(_.getName.startsWith("part-")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(watch, s"$name.txt"))
    }
    val docs = Tables.documents(spark, SfDir)
    val half = docs.count() / 2
    val exact = graft.operators.WordCount.wordcount(spark, SfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def run(cap: Int, name: String): Array[(String, Long, Long)] = {
      val q = EventsStreaming.heavyHitters(spark, watch, cap)
        .writeStream.outputMode("complete").format("memory")
        .queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      spark.table(name)
        .select(explode(col("summary")).as("e"))
        .select(col("e.token"), col("e.ub"), col("e.err")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    }
    dropText(docs.filter(col("doc_id") < half).select("text"), "a")
    dropText(docs.filter(col("doc_id") >= half).select("text"), "b")
    // narrow cap: eviction ran, every surviving entry brackets truth
    val narrow = run(graft.operators.WordCount.HeavyHitterCap, "hh_narrow")
    assert(narrow.length === graft.operators.WordCount.HeavyHitterCap)
    narrow.foreach { case (tok, ub, err) =>
      val t = exact.getOrElse(tok, 0L)
      assert(t <= ub && t >= ub - err, s"$tok: $t outside [${ub - err}, $ub]")
    }
    // wide cap: no eviction — the streaming sketch IS exact wordcount
    val wide = run(exact.size + 8, "hh_wide")
    assert(wide.map { case (t, u, _) => t -> u }.toMap === exact)
    assert(wide.forall(_._3 == 0L))
  }

  test("stream-stream interval join emits exactly the batch attribution pairs") {
    val stream = EventsStreaming.clickAttribution(
      EventsStreaming.readEvents(spark, eventsDir))
    val got = EventsStreaming.runToMemory(spark, stream, "attrib", "append")
      .select("event_id", "user_id", "p_ms", "c_ms")
    // batch truth: the naive inequality join over the static table
    val ev = Tables.events(spark, SfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
    val want = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ms").as("p_ms"))
      .join(ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ms").as("c_ms")),
        col("user_id") === col("c_user") &&
          col("c_ms") >= col("p_ms") - 3600000L && col("c_ms") < col("p_ms"))
      .select("event_id", "user_id", "p_ms", "c_ms")
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("sessionizer carries open sessions across micro-batches and equals batch") {
    // split the events table at the median event time: the first file
    // drop ends mid-session for many users, the second continues them.
    // Emitting each such session ONCE (not split in two) is the bug
    // this test pins down.
    val all = Tables.events(spark, SfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val want = Events.sessionize(spark, SfDir)
      .select("user_id", "session_seq", "session_start_ms",
        "session_end_ms", "n_events")
    // split inside the longest session: its first event lands in drop A,
    // its last in drop B — a session provably spans the boundary
    val longest = want.orderBy(
      (col("session_end_ms") - col("session_start_ms")).desc).limit(1)
      .collect()(0)
    val medMs = (longest.getAs[Long]("session_start_ms") +
      longest.getAs[Long]("session_end_ms")) / 2
    val maxMs = all.select(max(unix_millis(col("ts")))).collect()(0).getLong(0)

    val watch = java.nio.file.Files.createTempDirectory("graft_twobatch").toString
    def sentinel(id: Long, ms: Long) = {
      import spark.implicits._
      Seq((id, ms)).toDF("event_id", "ms")
        .select(col("event_id"), timestamp_millis(col("ms")).as("ts"),
          lit(-1L).as("user_id"), lit("sentinel").as("event_type"),
          lit(0.0).as("value"))
    }

    val sessions = EventsStreaming.sessionize(spark,
      spark.readStream.schema(all.schema).parquet(watch))
    val q = sessions.toDF.writeStream.outputMode("append")
      .format("memory").queryName("sess2").start()
    try {
      EventsStreaming.dropFile(all.filter(unix_millis(col("ts")) <= medMs), watch, "a")
      q.processAllAvailable()
      EventsStreaming.dropFile(all.filter(unix_millis(col("ts")) > medMs), watch, "b")
      q.processAllAvailable()
      // two sentinel drops push the watermark past every real session's
      // close: the first advances it (at end of its batch), the second
      // runs a batch under the advanced watermark so timeouts fire
      // deterministically.
      EventsStreaming.dropFile(sentinel(-1L, maxMs + 10L * 3600 * 1000), watch, "s1")
      q.processAllAvailable()
      EventsStreaming.dropFile(sentinel(-2L, maxMs + 20L * 3600 * 1000), watch, "s2")
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sess2").filter(col("user_id") >= 0)
      .select("user_id", "session_seq", "session_start_ms",
        "session_end_ms", "n_events")
    // the scenario is real: some batch session spans the split point
    val spanning = want.filter(col("session_start_ms") <= medMs &&
      col("session_end_ms") > medMs).count()
    assert(spanning > 0, "no session spans the file-drop boundary; split is vacuous")
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("a late in-watermark event bridges two pending sessions into one") {
    import spark.implicits._
    // user 7: events at T and T+40min arrive first (40min > the 30min
    // gap ⇒ two pending sessions); then an OUT-OF-ORDER event at
    // T+20min — still above the 2h watermark — arrives and bridges
    // them. Batch semantics: ONE session [T, T+40min] of 3 events.
    // Emit-on-next-event would already have split it; emit-on-watermark
    // must merge.
    val T = 1000000000000L
    val min = 60L * 1000
    def ev(id: Long, ms: Long) =
      Seq((id, ms)).toDF("event_id", "ms")
        .select(col("event_id"), timestamp_millis(col("ms")).as("ts"),
          lit(7L).as("user_id"), lit("e").as("event_type"), lit(1.0).as("value"))
    val watch = java.nio.file.Files.createTempDirectory("graft_bridge").toString
    val sessions = EventsStreaming.sessionize(spark,
      spark.readStream.schema(ev(0, T).schema).parquet(watch))
    val q = sessions.toDF.writeStream.outputMode("append")
      .format("memory").queryName("bridge").start()
    try {
      EventsStreaming.dropFile(ev(1, T).unionAll(ev(2, T + 40 * min)), watch, "a")
      q.processAllAvailable()
      EventsStreaming.dropFile(ev(3, T + 20 * min), watch, "late")
      q.processAllAvailable()
      EventsStreaming.dropFile(
        ev(-1, T + 10L * 3600 * 1000).withColumn("user_id", lit(-1L)), watch, "s1")
      q.processAllAvailable()
      EventsStreaming.dropFile(
        ev(-2, T + 20L * 3600 * 1000).withColumn("user_id", lit(-2L)), watch, "s2")
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("bridge").filter(col("user_id") === 7L).collect()
    assert(got.length == 1, s"expected one bridged session, got ${got.length}")
    assert(got(0).getAs[Long]("session_start_ms") == T)
    assert(got(0).getAs[Long]("session_end_ms") == T + 40 * min)
    assert(got(0).getAs[Long]("n_events") == 3L)
  }

  test("outer attribution: null rows only after watermark passage; state bounded") {
    import spark.implicits._
    val T = 1000000000000L
    val hour = 3600L * 1000
    def ev(id: Long, user: Long, ms: Long, tpe: String) =
      Seq((id, user, ms, tpe)).toDF("event_id", "user_id", "ms", "event_type")
        .select(col("event_id"), timestamp_millis(col("ms")).as("ts"),
          col("user_id"), col("event_type"), lit(0.0).as("value"))
    // user 1: click then purchase 30 min later (a MATCH — emits as
    //   soon as both rows exist, no watermark wait);
    // user 2: clickless purchase at T — its outer row may emit only
    //   once the global watermark (min of both sides − 2 h) passes it;
    // user 9: click AND clickless purchase at T+4h — advances both
    //   watermarks to T+2h (sealing user 2) while staying UNSEALED
    //   itself: its null row must NOT appear before the sentinels.
    val corpus = ev(10, 1, T + 10 * 60 * 1000, "click")
      .unionAll(ev(11, 1, T + 30 * 60 * 1000, "purchase"))
      .unionAll(ev(20, 2, T, "purchase"))
      .unionAll(ev(90, 9, T + 4 * hour, "click"))
      .unionAll(ev(91, 9, T + 4 * hour, "purchase"))
    val watch = java.nio.file.Files.createTempDirectory("graft_outer_spec").toString
    val joined = EventsStreaming.clickAttributionOuter(
      spark.readStream.schema(corpus.schema).parquet(watch))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("outer_attr").start()
    try {
      EventsStreaming.dropFile(corpus, watch, "a")
      q.processAllAvailable()
      val phase1 = spark.table("outer_attr").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
      // matched pair emitted; sealed clickless purchase emitted with
      // NULL; the UNSEALED clickless purchase absent — null rows only
      // after watermark passage, never speculatively
      assert(phase1.contains((11L, T + 10 * 60 * 1000)), s"missing match: $phase1")
      assert(phase1.contains((20L, -1L)), s"sealed outer row missing: $phase1")
      assert(!phase1.exists(_._1 == 91L), s"unsealed outer row leaked: $phase1")
      // sentinel drops advance both watermarks past every real window
      EventsStreaming.dropFile(
        ev(-1, -1, T + 10 * hour, "click")
          .unionAll(ev(-2, -1, T + 10 * hour, "purchase")), watch, "s1")
      q.processAllAvailable()
      EventsStreaming.dropFile(
        ev(-3, -1, T + 20 * hour, "click")
          .unionAll(ev(-4, -1, T + 20 * hour, "purchase")), watch, "s2")
      q.processAllAvailable()
      // both state stores drained to the sentinel horizon: bounded by
      // the hour window + watermark, not by stream length
      val stateRows = q.recentProgress.flatMap(_.stateOperators)
        .lastOption.map(_.numRowsTotal).getOrElse(-1L)
      assert(stateRows >= 0 && stateRows <= 4,
        s"join state not watermark-bounded: $stateRows rows")
    } finally q.stop()
    val fin = spark.table("outer_attr").filter(col("user_id") >= 0).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(fin == Set((11L, T + 10 * 60 * 1000), (20L, -1L), (91L, -1L)),
      s"drained outer join diverged from the batch left join: $fin")
  }
}
