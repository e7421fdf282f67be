package graft

import org.apache.spark.sql.functions._

/** Round-10 batch 2: personalized PageRank, the percentile-sketch
  * calibration census, and streaming heavy hitters.
  */
class Round10bOpsSpec extends SparkTestBase {

  test("wc_ppr conserves mass and ranks a seed first") {
    val out = operators.WordCount.personalizedPagerank(spark, SfDir).collect()
    assert(out.nonEmpty)
    // mass conservation: Σpr over ALL nodes ≤ 1 (+ rounding slack);
    // the top-100 cut can only lower the visible sum
    val total = out.map(_.getDouble(1)).sum
    assert(total <= 1.0 + 1e-4, s"PPR mass exploded: $total")
    assert(out.forall(_.getDouble(1) > 0))
    // with restart mass only on seeds, the global top rank is a seed
    // (0.15/|S| restart dominates any 2-hop return flow here)
    val nn = operators.WordCount.personalizedPagerank(spark, SfDir)
    assert(nn.limit(1).collect().head.getDouble(1) > 0.01)
  }

  test("rel_percentile_sketch_error: estimate brackets the rank percentile") {
    // The sketch's guarantee is against the RANK-BASED (disc)
    // percentile: the bucket lower edge satisfies est ≤ v_rank <
    // est + w. (The registry row's err column reports the distance to
    // the INTERPOLATED exact — informational and hash-checked, but on
    // sparse groups an interpolation gap can exceed a bucket, so it
    // is not the bracketing property.)
    val rows = operators.Relational.percentileSketchError(spark, SfDir)
      .collect()
    assert(rows.nonEmpty)
    val groups = Tables.orders(spark, SfDir)
      .select(col("o_orderpriority").as("pri"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).sorted }
    rows.foreach { r =>
      val pri = r.getString(0)
      val sorted = groups(pri)
      val n = sorted.length
      val w = (sorted.last - sorted.head) /
        operators.Relational.PctSketchBuckets + 1
      val v50 = sorted(((n + 1) / 2 - 1).toInt)
      val v95 = sorted(((95 * n + 99) / 100 - 1).toInt)
      val est50 = r.getLong(3); val est95 = r.getLong(6)
      assert(est50 <= v50 && v50 < est50 + w,
        s"$pri p50: est $est50 does not bracket rank value $v50 (w=$w)")
      assert(est95 <= v95 && v95 < est95 + w,
        s"$pri p95: est $est95 does not bracket rank value $v95 (w=$w)")
    }
  }

  test("pipe_near_decontaminate flags an edited benchmark leak, not clean docs") {
    import spark.implicits._
    val stage = "/root/repo/target/graft_neardec_docs"
    // doc 0 is the "benchmark"; doc 100 is the leak (one token edited
    // at the end — exact-shingle decontamination would still catch a
    // suffix edit, but the POINT here is the J < 1 admission path);
    // doc 101 shares nothing.
    Seq(
      (0L, "en", "bench", "alpha beta gamma delta epsilon zeta eta theta", 46L),
      (100L, "en", "web", "alpha beta gamma delta epsilon zeta eta iota", 45L),
      (101L, "en", "web", "one two three four five six seven eight", 39L))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$stage/documents.parquet")
    val got = operators.Pipeline.nearDecontaminate(spark, stage).collect()
    assert(got.length == 1 && got.head.getLong(0) == 100L,
      s"expected only doc 100 flagged, got ${got.mkString(",")}")
    // 6-shingle sets sharing 5 → J = 5/7 ≈ 0.714
    assert(got.head.getLong(2) == 714286L)
  }

  test("dd_lsh_recall: recall climbs monotonically with Jaccard") {
    val rows = operators.Dedup.lshRecallCensus(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))) // (s, avgJ, recall)
    assert(rows.length == operators.Dedup.LshGradStrengths.length)
    // milder perturbation (larger s) → higher J → higher-or-equal recall
    rows.sliding(2).foreach { case Array((s1, j1, r1), (s2, j2, r2)) =>
      assert(j1 < j2, s"avg Jaccard not increasing: s=$s1 ($j1) vs s=$s2 ($j2)")
      assert(r1 <= r2, s"recall not monotone: s=$s1 ($r1) vs s=$s2 ($r2)")
    }
    // the sweep must actually span the S-curve, not sit on one end
    assert(rows.head._3 < 200000L && rows.last._3 > 800000L,
      s"strengths no longer sweep the banding S-curve: $rows")
  }

  test("stream_heavy_hitters equals the batch exact-degeneration twin") {
    val stream = SparkEntry.queries("stream_heavy_hitters")(spark, SfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = SparkEntry.queries("wc_heavy_hitters_exact")(spark, SfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(stream == batch,
      "streaming SpaceSaving drain diverged from the batch summary")
  }
}
