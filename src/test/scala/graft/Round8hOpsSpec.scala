package graft

import org.apache.spark.sql.functions._

/** Invariants for the eighth round-8 operator batch beyond their
  * DuckDB oracles.
  */
class Round8hOpsSpec extends SparkTestBase {

  test("anova f: exact sums reconcile and F is the HALF_UP ratio of the scaled scatters") {
    val got = operators.Similarity.anovaF(spark, SfDir).collect()
    assert(got.length == 64, "one row per embedding dimension")
    val nVecs = Tables.embeddings(spark, SfDir).count()
    got.foreach { r =>
      assert(r.getAs[Long]("n") == nVecs)
      assert(r.getAs[Long]("k") == 10L)
      val (ssb, ssw, f) = (r.getAs[Long]("ssb_e6"), r.getAs[Long]("ssw_e6"),
        r.getAs[Long]("f_x1000"))
      assert(ssb >= 0L && ssw > 0L)
      val n = r.getAs[Long]("n"); val k = r.getAs[Long]("k")
      assert(f == (2 * ssb * (n - k) * 1000 + ssw * (k - 1)) / (2 * ssw * (k - 1)),
        "F must be the integer HALF_UP of the scatter ratio")
    }
    // a synthetic labeled corpus should have at least one dim with
    // F > 1 (some separation) — sanity that the statistic is alive
    assert(got.exists(_.getAs[Long]("f_x1000") > 1000L))
  }

  test("abtest zscore: variant counts partition users, z sign follows the rates") {
    val r = operators.Events.abtestZscore(spark, SfDir).collect()(0)
    val nUsers = Tables.events(spark, SfDir).select("user_id").distinct().count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == nUsers)
    assert(r.getAs[Long]("conv_a") <= r.getAs[Long]("n_a"))
    assert(r.getAs[Long]("conv_b") <= r.getAs[Long]("n_b"))
    val z = r.getAs[java.lang.Double]("z")
    val degenerate = r.getAs[Long]("conv_a") + r.getAs[Long]("conv_b") == 0 ||
      r.getAs[Long]("conv_a") + r.getAs[Long]("conv_b") ==
        r.getAs[Long]("n_a") + r.getAs[Long]("n_b")
    if (degenerate) assert(z == null, "degenerate pooled rate must yield NULL z")
    else {
      assert(z != null && !z.isNaN)
      val diff = r.getAs[Long]("rate_a_ppm") - r.getAs[Long]("rate_b_ppm")
      if (diff > 0) assert(z > 0.0)
      if (diff < 0) assert(z < 0.0)
    }
  }

  test("bot score: rules fire exactly by their integer definitions") {
    val got = operators.Events.botScore(spark, SfDir).collect()
    val ev = Tables.events(spark, SfDir)
    assert(got.length == ev.select("user_id").distinct().count())
    got.foreach { r =>
      val flags = Seq("r_burst", "r_lowdiv", "r_regular").map(r.getAs[Long])
      assert(flags.forall(f => f == 0L || f == 1L))
      assert(r.getAs[Long]("score") == flags.sum)
      assert(r.getAs[Long]("r_burst") ==
        (if (r.getAs[Long]("max_burst_1d") >= operators.Events.VelocityBurstN) 1L else 0L))
      assert(r.getAs[Long]("r_lowdiv") ==
        (if (r.getAs[Long]("n_types") <= 2L) 1L else 0L))
    }
    // velocity flags and bot r_burst must agree user by user
    val vf = operators.Events.velocityFlags(spark, SfDir).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("flagged")).toMap
    got.foreach { r =>
      assert(r.getAs[Long]("r_burst") == vf(r.getAs[Long]("user_id")),
        "burst rule must match ev_velocity_flags exactly")
    }
  }
}
