package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventsStreaming

/** Failure-recovery surface. The reference validates worker-failure
  * recovery by killing a worker pod mid-job
  * (reference mapreduce/tests/whitebox_tests/tests.py: delete_some_worker);
  * Spark's equivalents are lineage-based task retry (free) and
  * checkpointed streaming state. This spec stops a stateful
  * streaming query between batches and restarts it from its
  * checkpoint: state must carry over and no events may be lost.
  */
class RecoverySpec extends SparkTestBase {

  test("stream-stream join state survives a stop/restart from checkpoint") {
    val src = Files.createTempDirectory("graft_join_rec_src")
    val sink = Files.createTempDirectory("graft_join_rec_sink").toString
    val ckpt = Files.createTempDirectory("graft_join_rec_ckpt").toString

    // every click arrives BEFORE the failure, every purchase AFTER the
    // restart: a pair can only match if the click-side join state was
    // checkpointed and restored — the sharpest possible recovery test
    // for stream-stream join state.
    val ev = Tables.events(spark, SfDir)
    ev.filter(col("event_type") === "click")
      .write.mode("overwrite").parquet(s"$src/batch_a")
    ev.filter(col("event_type") === "purchase")
      .write.mode("overwrite").parquet(s"$src/incoming_b")

    def runOnce(): Unit = {
      val joined = EventsStreaming.clickAttribution(
        spark.readStream
          .schema(spark.read.parquet(s"$src/batch_a").schema)
          .parquet(s"$src/batch_*"))
      val q = joined.writeStream
        .outputMode("append").format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    runOnce() // clicks only: all join state, zero output
    Files.move(Paths.get(s"$src/incoming_b"), Paths.get(s"$src/batch_b"))
    runOnce() // purchases arrive post-restart and must match held clicks

    val got = spark.read.parquet(sink)
      .select("event_id", "user_id", "p_ms", "c_ms")
    val evms = ev.select(col("event_id"), col("user_id"), col("event_type"),
      unix_millis(col("ts")).as("ms"))
    val want = evms.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ms").as("p_ms"))
      .join(evms.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ms").as("c_ms")),
        col("user_id") === col("c_user") &&
          col("c_ms") >= col("p_ms") - 3600000L && col("c_ms") < col("p_ms"))
      .select("event_id", "user_id", "p_ms", "c_ms")
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("stateful sessionizer survives a stop/restart from checkpoint") {
    val src = Files.createTempDirectory("graft_recovery_src")
    val sink = Files.createTempDirectory("graft_recovery_sink").toString
    val ckpt = Files.createTempDirectory("graft_recovery_ckpt").toString

    // split the events table in two time halves: first arrives before
    // the "failure", second after the restart (arrival in event-time
    // order, the streaming contract the watermark assumes)
    val all = Tables.events(spark, SfDir)
    val medMs = all.select(expr("percentile_approx(unix_millis(ts), 0.5)"))
      .collect()(0).getLong(0)
    val maxMs = all.select(max(unix_millis(col("ts")))).collect()(0).getLong(0)
    all.filter(unix_millis(col("ts")) <= medMs)
      .write.mode("overwrite").parquet(s"$src/batch_a")
    all.filter(unix_millis(col("ts")) > medMs)
      .write.mode("overwrite").parquet(s"$src/incoming_b")

    def runOnce(): Unit = {
      // sessionize applies the watermark itself
      val sessions = EventsStreaming.sessionize(spark,
        spark.readStream
          .schema(spark.read.parquet(s"$src/batch_a").schema)
          .parquet(s"$src/batch_*"))
      val q = sessions.toDF.writeStream
        .outputMode("append").format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    runOnce() // processes batch_a, then the query terminates ("failure")
    // second half lands while the query is down
    Files.move(Paths.get(s"$src/incoming_b"), Paths.get(s"$src/batch_b"))
    runOnce() // restart from checkpoint: offsets + per-user state resume

    // sessions are emitted only once the watermark closes them, so two
    // sentinel drops (a far-future event, then a farther one processed
    // under the advanced watermark) flush every real user's state
    def sentinel(id: Long, ms: Long) = {
      import spark.implicits._
      Seq((id, ms)).toDF("event_id", "ms")
        .select(col("event_id"), timestamp_millis(col("ms")).as("ts"),
          lit(-1L).as("user_id"), lit("sentinel").as("event_type"),
          lit(0.0).as("value"), lit("{}").as("props"))
        .select(all.columns.map(col): _*)
    }
    sentinel(-1L, maxMs + 10L * 3600 * 1000)
      .write.mode("overwrite").parquet(s"$src/batch_c")
    runOnce()
    sentinel(-2L, maxMs + 20L * 3600 * 1000)
      .write.mode("overwrite").parquet(s"$src/batch_d")
    runOnce()

    val out = spark.read.parquet(sink).filter(col("user_id") >= 0)
    // no loss, no duplication across the restart
    assert(out.agg(sum("n_events")).collect()(0).getLong(0) == all.count())
    // state carried across the restart: session numbering continues
    // monotonically per user (no user restarts at seq 1 twice)
    val dupSeqs = out.groupBy("user_id", "session_seq").count()
      .filter(col("count") > 1).count()
    assert(dupSeqs == 0)
  }
}
