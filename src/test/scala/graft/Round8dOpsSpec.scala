package graft

import org.apache.spark.sql.functions._

/** Invariants for the fourth round-8 operator batch beyond their
  * DuckDB oracles.
  */
class Round8dOpsSpec extends SparkTestBase {

  test("multitouch attribution conserves credit: per-purchase ppm sums to ~1e6") {
    val got = operators.Events.multitouchAttribution(spark, SfDir).collect()
    assert(got.nonEmpty)
    // HALF_UP(1e6/n) * n is within n/2 of 1e6, so total credit is
    // within (total touches)/2 of (attributed purchases) * 1e6.
    val totCredit = got.map(_.getAs[Long]("credit_ppm_sum")).sum
    val totTouches = got.map(_.getAs[Long]("n_touches")).sum
    // attributed purchases = distinct purchases across types; bound by
    // recomputing the join side exactly
    val ev = Tables.events(spark, SfDir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_millis(col("ts")).as("ms"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_uid"), col("event_id").as("p_id"),
        col("ms").as("p_ms"))
    val t = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id").as("t_uid"), col("ms").as("t_ms"))
    val nAttributed = p.join(t,
        col("p_uid") === col("t_uid") && col("t_ms") <= col("p_ms") &&
          col("p_ms") - col("t_ms") < operators.Events.MtaWindowMs)
      .select("p_id").distinct().count()
    assert(math.abs(totCredit - nAttributed * 1000000L) <= totTouches / 2 + got.length,
      s"credit $totCredit vs ${nAttributed}e6 drifts beyond rounding slack")
    assert(got.map(_.getAs[String]("touch_type")).toSet.subsetOf(Set("view", "click")))
  }

  test("equi-depth histogram tiles partition lineitem with near-equal depth and ordered ranges") {
    val got = operators.Relational.equidepthHistogram(spark, SfDir).collect()
    val n = Tables.lineitem(spark, SfDir).count()
    assert(got.map(_.getAs[Long]("n_rows")).sum == n)
    assert(got.length == operators.Relational.EquidepthTiles.toInt)
    val depths = got.map(_.getAs[Long]("n_rows"))
    assert(depths.max - depths.min <= 1, s"ntile depths uneven: ${depths.mkString(",")}")
    // tile value ranges are non-decreasing across tiles (ties may share
    // a boundary cent value, never invert)
    val byTile = got.sortBy(_.getAs[Long]("tile"))
    byTile.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_cents") <= b.getAs[Long]("min_cents"),
        "tile ranges overlap beyond a shared boundary")
    }
    byTile.foreach { r =>
      assert(r.getAs[Long]("min_cents") <= r.getAs[Long]("max_cents"))
    }
  }

  test("resource allocation terms price shared neighbors by inverse degree") {
    val rows = operators.WordCount.resourceAllocation(spark, SfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cn, ra) = (r.getAs[Long]("cn"), r.getAs[Long]("ra_ppm"))
      // every shared neighbor has degree in [2, CnDegCap]: it touches
      // both a and b, and survived the hub filter. So each term is in
      // [ppm(1/cap), 500000] and the sum is bracketed by cn * those.
      val lo = (2L * 1000000L + operators.WordCount.CnDegCap) / (2L * operators.WordCount.CnDegCap)
      assert(ra >= cn * lo && ra <= cn * 500000L,
        s"ra_ppm $ra outside [${cn * lo}, ${cn * 500000L}] for cn=$cn")
    }
    // descending by (ra_ppm, cn) with (a,b) tie-break: verify sorted
    val scores = rows.map(r => (r.getAs[Long]("ra_ppm"), r.getAs[Long]("cn")))
    assert(scores.sliding(2).forall { case Array(x, y) =>
      x._1 > y._1 || (x._1 == y._1 && x._2 >= y._2) || x._1 == y._1
    })
  }

  test("vocab growth curve is a consistent Heaps prefix decomposition") {
    val got = operators.TextAnalysis.vocabGrowth(spark, SfDir).collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, SfDir)
    assert(got.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // cum columns really are running sums of the per-decile columns
    var (ct, cv) = (0L, 0L)
    got.foreach { r =>
      ct += r.getAs[Long]("n_tokens"); cv += r.getAs[Long]("new_types")
      assert(r.getAs[Long]("cum_tokens") == ct)
      assert(r.getAs[Long]("cum_types") == cv)
    }
    // final cum_types equals the corpus vocabulary size
    val vocab = docs.select(explode(graft.functions.Text.tokens(lower(col("text")))).as("t"))
      .select("t").distinct().count()
    assert(cv == vocab, s"cum_types $cv != corpus vocabulary $vocab")
    // new types can only appear where docs exist
    got.foreach { r =>
      if (r.getAs[Long]("n_docs") == 0L) assert(r.getAs[Long]("new_types") == 0L)
    }
  }
}
