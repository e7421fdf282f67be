package graft

import org.apache.spark.sql.functions._

/** Round-10 operators: SCC sizes (path-doubling closure), harmonic
  * centrality (landmark-memo rollup), and the KMV distinct-sketch
  * calibration census.
  */
class Round10OpsSpec extends SparkTestBase {

  test("wc_scc_sizes recovers a planted cycle and singleton chain") {
    import spark.implicits._
    val stage = "/root/repo/target/graft_scc_docs"
    // doc 0: a→b→c→a (one SCC of size 3); doc 1: x→y→z chain (three
    // singleton SCCs). Distinct words ≪ SccCapWords, so the cap is
    // not binding and the expected histogram is exact.
    Seq((0L, "en", "synth", "a b c a", 7L),
        (1L, "en", "synth", "x y z", 5L))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$stage/documents.parquet")
    val got = operators.WordCount.sccSizes(spark, stage)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 3L), (3L, 1L)))
  }

  test("wc_harmonic_centrality is bounded by its reach and positive") {
    val out = operators.WordCount.harmonicCentrality(spark, SfDir)
    assert(out.count() > 0)
    // each reached node at dist ≥ 1 contributes ≤ 1e6; the seed
    // itself (dist 0) contributes 0 — so the sum is ≤ (n_reached−1)·1e6
    assert(out.filter(col("harmonic_x1e6") >
      (col("n_reached") - 1) * 1000000L).count() == 0)
    assert(out.filter(col("harmonic_x1e6") <= 0).count() == 0)
  }

  test("rel_distinct_sketch_error: KMV estimate lands inside its error regime") {
    val rows = operators.Relational.distinctSketchError(spark, SfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1); val est = r.getLong(2); val ppm = r.getLong(3)
      assert(est > 0, s"estimate must be positive, got $est")
      // KMV with k=64 has rsd ≈ 1/√(k−2) ≈ 12.7%; 4σ ≈ 51% — a loose
      // deterministic bracket that still catches a broken estimator
      // (off-by-modulus or wrong kth) which lands orders out
      assert(ppm <= 510000L, s"err_ppm $ppm out of the 4σ KMV regime (exact=$exact est=$est)")
    }
  }

  test("KMV degrades to the exact count below k distinct values") {
    import spark.implicits._
    val stage = "/root/repo/target/graft_kmv_small"
    // 10 distinct customers < k=64 → est_distinct must equal n_exact
    (1 to 40).map(i => (i.toLong, (i % 10).toLong + 1L, "O"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$stage/orders.parquet")
    val r = operators.Relational.distinctSketchError(spark, stage).collect()
    assert(r.length == 1 && r.head.getLong(1) == 10L &&
      r.head.getLong(2) == 10L && r.head.getLong(3) == 0L)
  }
}
