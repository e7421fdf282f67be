package graft

import org.apache.spark.sql.functions._

/** The skew-safe sessionization code path (VERDICT r10 #2): the
  * aggregate-before-window decomposition must be BYTE-IDENTICAL to the
  * default lag-window path — on the test SF and on a corpus planted
  * onto every gap boundary the equivalence proof leans on.
  */
class Round11SkewSpec extends SparkTestBase {

  private def bothPaths(dir: String) = {
    val default = operators.Events.sessionize(spark, dir)
      .collect().map(_.toSeq).toSeq
    spark.conf.set("graft.session.skewsafe", "true")
    val safe =
      try operators.Events.sessionize(spark, dir).collect().map(_.toSeq).toSeq
      finally spark.conf.unset("graft.session.skewsafe")
    (default, safe)
  }

  test("skewsafe path is byte-identical on the test corpus") {
    val (default, safe) = bothPaths(SfDir)
    assert(default.nonEmpty)
    assert(safe == default, "bucket decomposition diverged from lag window")
  }

  test("skewsafe path is byte-identical on a boundary-planted firehose user") {
    import spark.implicits._
    val G = operators.Events.SessionGapMs
    val stage = "/root/repo/target/graft_firehose_events"
    // One firehose user (0) exercising every boundary case of the
    // equivalence proof, plus a control user (1):
    //  - same-bucket clusters (gaps < G inside one bucket)
    //  - a gap of EXACTLY G across adjacent buckets (must NOT break)
    //  - a gap of G+1 (must break)
    //  - an empty bucket between events (must break)
    //  - events landing exactly on bucket edges (ms % G == 0)
    val hot = Seq(0L, 1L, G - 1, G, 2 * G, 3 * G + 1, 6 * G, 6 * G + 5,
      9 * G + 7)
    val ctrl = Seq(5L, G + 5, 4 * G)
    val rows =
      hot.zipWithIndex.map { case (ms, i) => (i.toLong, 0L, ms) } ++
        ctrl.zipWithIndex.map { case (ms, i) => (100L + i, 1L, ms) }
    rows.toDF("event_id", "user_id", "ms")
      .select(col("event_id"), col("user_id"),
        timestamp_millis(col("ms")).as("ts"),
        lit("click").as("event_type"),
        (col("event_id") % 7 + lit(0.25)).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$stage/events.parquet")
    val (default, safe) = bothPaths(stage)
    assert(safe == default,
      s"boundary corpus diverged:\n default=$default\n safe=$safe")
    // and the grouping is the one the plant intends: user 0 sessions
    // are {0..2G}, {3G+1}, {6G..6G+5}, {9G+7}
    val u0 = default.filter(_.head == 0L)
    assert(u0.map(r => (r(2), r(3), r(4))) == Seq(
      (0L, 2 * G, 5L), (3 * G + 1, 3 * G + 1, 1L),
      (6 * G, 6 * G + 5, 2L), (9 * G + 7, 9 * G + 7, 1L)),
      s"unexpected session intervals: $u0")
  }
}
