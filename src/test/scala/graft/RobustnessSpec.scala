package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: operators must not divide by zero,
  * NPE, or mis-aggregate on empty or pathological tables — the
  * "3 a.m. empty partition" cases a 100 TB pipeline hits routinely.
  */
class RobustnessSpec extends SparkTestBase {

  /** A scale dir whose documents/embeddings/events tables are empty
    * but schema-identical (written once per suite).
    */
  lazy val emptyDir: String = {
    val d = Files.createTempDirectory("graft_empty").toString
    Seq("documents", "embeddings", "lineitem", "orders",
      "customer", "supplier", "part", "nation", "region").foreach { t =>
      Tables.load(spark, SfDir, t).limit(0)
        .write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    // events via the typed loader (the raw file is ns-timestamped)
    Tables.events(spark, SfDir).limit(0)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("every registry query runs on empty tables without throwing") {
    // pooled sweep (sweepRegistry — same per-query count() and
    // failure capture, overlapped instead of strictly sequential)
    val res = sweepRegistry(SparkEntry.queries.keys.toSeq.sorted)(n =>
      SparkEntry.queries(n)(spark, emptyDir).count())
    val failures = res.toSeq.sortBy(_._1)
      .collect { case (n, Left(err)) => s"$n: ${err.take(160)}" }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  /** Single-row tables catch the divisions the empty sweep can't:
    * n−1 variance denominators, lag/lead windows with no prior row,
    * pair pipelines with nothing to pair.
    */
  lazy val oneRowDir: String = {
    val d = Files.createTempDirectory("graft_onerow").toString
    Seq("documents", "embeddings", "lineitem", "orders",
      "customer", "supplier", "part", "nation", "region").foreach { t =>
      Tables.load(spark, SfDir, t).limit(1)
        .write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    Tables.events(spark, SfDir).limit(1)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("every registry query runs on single-row tables without throwing") {
    val res = sweepRegistry(SparkEntry.queries.keys.toSeq.sorted)(n =>
      SparkEntry.queries(n)(spark, oneRowDir).count())
    val failures = res.toSeq.sortBy(_._1)
      .collect { case (n, Left(err)) => s"$n: ${err.take(160)}" }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("quality ratios handle the empty-text edge") {
    import spark.implicits._
    val df = Seq(("", 0L), ("   ", 1L), ("ok text", 2L)).toDF("text", "doc_id")
    val ratios = df.select(
      graft.functions.Text.punctRatio(col("text")).as("pr"),
      graft.functions.Text.wsTokenCount(col("text")).as("wc"))
      .collect()
    assert(ratios.forall(r => !r.isNullAt(0) && r.getDouble(0) >= 0.0))
    assert(ratios.map(_.getInt(1)).toSeq == Seq(0, 0, 2))
  }

  test("streaming dedup drops replayed duplicates") {
    // replay the same file twice into the source dir: second batch is
    // all duplicates within the watermark horizon
    val d = Files.createTempDirectory("graft_dup_stream")
    Files.createSymbolicLink(d.resolve("a.parquet"),
      java.nio.file.Paths.get(s"$SfDir/events.parquet"))
    Files.createSymbolicLink(d.resolve("b.parquet"),
      java.nio.file.Paths.get(s"$SfDir/events.parquet"))
    val out = graft.streaming.EventsStreaming.runToMemory(spark,
      graft.streaming.EventsStreaming.dedupCounts(
        graft.streaming.EventsStreaming.readEvents(spark, d.toString)),
      "dedup_counts", "complete")
    val got = out.agg(sum("n_events")).collect()(0).getLong(0)
    assert(got == Tables.events(spark, SfDir).count())
  }
}
