package graft

import org.apache.spark.sql.functions._

/** Property pins for the round-9 operators (the oracle hash is the
  * primary gate; these assert the properties a hash can't express).
  */
class Round9OpsSpec extends SparkTestBase {

  test("rel_skew_census: invariants tie the census to the key domain") {
    val out = graft.operators.Relational.skewCensus(spark, SfDir).collect()
    assert(out.map(_.getString(0)).sorted.toSeq == Seq("l_partkey", "l_suppkey"))
    out.foreach { r =>
      val (nRows, nKeys, minC, maxC, top1, skew) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))
      assert(minC >= 1 && maxC >= minC && nKeys >= 1)
      assert(nRows >= nKeys * minC && nRows <= nKeys * maxC)
      // uniform keys would be exactly 1000; max/avg can't be below avg
      assert(skew >= 1000 - 1)
      assert(top1 >= 1000000L / nKeys - 1)
    }
  }

  test("rel_join_size_estimate: exact_pairs equals the executed join") {
    val out = graft.operators.Relational.joinSizeEstimate(spark, SfDir)
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    val ol = Tables.orders(spark, SfDir).join(
      Tables.lineitem(spark, SfDir),
      col("o_orderkey") === col("l_orderkey")).count()
    val co = Tables.customer(spark, SfDir).join(
      Tables.orders(spark, SfDir),
      col("c_custkey") === col("o_custkey")).count()
    assert(out("o_orderkey=l_orderkey") == ol)
    assert(out("c_custkey=o_custkey") == co)
  }

  test("ev_burst_windows: every row is a genuine burst past warm-up") {
    val out = graft.operators.Events.burstWindows(spark, SfDir)
    val bad = out.filter(col("n_prev") < graft.operators.Events.BurstMinPrev ||
      col("n_events") * col("n_prev") <= lit(2L) * col("sum_prev")).count()
    assert(bad == 0)
    // lift is NULL exactly when the trailing sum is zero
    assert(out.filter(col("sum_prev") === 0 && col("lift_x1000").isNotNull)
      .count() == 0)
    assert(out.filter(col("sum_prev") > 0 && col("lift_x1000") <= 2000)
      .count() == 0)
  }

  test("txt_code_detect: planted docs all route code, naturals all prose") {
    val out = graft.operators.TextAnalysis.codeDetect(spark, SfDir)
    val natural = Tables.documents(spark, SfDir).count()
    val planted = Tables.documents(spark, SfDir)
      .filter(col("doc_id") % 8 === 0).count()
    val byRoute = out.groupBy("route")
      .agg(sum("n_docs").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byRoute.getOrElse("code", 0L) == planted)
    assert(byRoute.getOrElse("prose", 0L) == natural)
    // prose is symbol-free in this corpus; code twins are dense
    assert(out.filter(col("route") === "prose" && col("avg_ppm") > 0)
      .count() == 0)
    assert(out.filter(col("route") === "code" &&
      col("avg_ppm") < graft.operators.TextAnalysis.CodeSymbolPpm)
      .count() == 0)
  }

  test("vec_outlier_census: totals cover the corpus, outliers bounded") {
    val out = graft.operators.Similarity.outlierCensus(spark, SfDir)
    val nVecs = Tables.embeddings(spark, SfDir).count()
    val sums = out.agg(sum("n_vecs"), sum("n_outliers")).head()
    assert(sums.getLong(0) == nVecs)
    assert(sums.getLong(1) >= 0 && sums.getLong(1) <= nVecs)
    // max score must clear the outlier threshold wherever one was counted
    val bad = out.filter(col("n_outliers") > 0 &&
      col("max_score_x100") <= lit(64L) *
        graft.operators.Similarity.OutlierZ2x100).count()
    assert(bad == 0)
  }
}
