package graft

import org.apache.spark.sql.functions._
import graft.operators.{Events, Relational}

class RelationalSpec extends SparkTestBase {

  test("q1 aggregates reconcile with raw scan") {
    val q1 = Relational.q1PricingSummary(spark, SfDir)
    val total = q1.agg(sum("count_order")).collect()(0).getLong(0)
    val raw = Tables.lineitem(spark, SfDir)
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-09-02"))).count()
    assert(total == raw)
  }

  test("anti join + semi join partition the orders universe") {
    val withUrgent = Tables.customer(spark, SfDir)
      .join(Tables.orders(spark, SfDir).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi").count()
    val withoutUrgent = Relational.q7Antijoin(spark, SfDir)
      .agg(sum("n_customers")).collect()(0).getLong(0)
    assert(withUrgent + withoutUrgent == Tables.customer(spark, SfDir).count())
  }

  test("topk per group returns exactly k rows per group") {
    val counts = Relational.relTopkPerGroup(spark, SfDir)
      .groupBy("o_orderpriority").count().collect()
    assert(counts.nonEmpty && counts.forall(_.getLong(1) == 3))
  }

  test("sessionize: session count equals new-session flags; no session crosses a 30-min gap") {
    val s = Events.sessionize(spark, SfDir)
    // every session's span per event count: end >= start, and session ids start at 1
    assert(s.filter(col("session_end_ms") < col("session_start_ms")).count() == 0)
    assert(s.groupBy("user_id").agg(min("session_seq").as("m"))
      .filter(col("m") =!= 1).count() == 0)
  }

  test("native as-of join equals the composed window form, without union or window") {
    val composed = Events.asofJoin(spark, SfDir).collect().toSeq
    val native = Events.asofJoinNative(spark, SfDir)
    assert(native.collect().toSeq == composed)
    val exec = native.queryExecution.executedPlan.toString
    assert(exec.contains("AsOfJoin"), exec)
    assert(!exec.contains("Window"), "native as-of must not fall back to a window")
    assert(!exec.contains("Union"), "native as-of must not union the two sides")
  }

  test("plan shape: q5 broadcasts dims and pushes date filter to scan") {
    val plan = Relational.q5Multijoin(spark, SfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    val scanPlan = Tables.lineitem(spark, SfDir)
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-09-02")))
      .select("l_quantity")
      .queryExecution.executedPlan.toString
    assert(scanPlan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    // column pruning: only the 2 referenced columns reach the reader
    assert(scanPlan.contains("ReadSchema: struct<l_quantity:double,l_shipdate:timestamp"))
  }

  test("plan shape: q1 stays inside whole-stage codegen") {
    // "*(n)" prefixes mark whole-stage-codegen spans in the plan string
    val plan = Relational.q1PricingSummary(spark, SfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) HashAggregate") || plan.contains("*(1) Filter"))
  }

  test("plan shape: q2 broadcasts the region supplier set and part filter") {
    val plan = Relational.q2MinCostSupplier(spark, SfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    // no shuffled cartesian anywhere in the min-cost join-back
    assert(!plan.contains("CartesianProduct"))
  }

  test("range join covers every purchase and only in-window clicks") {
    val r = operators.Events.rangeJoinAttribution(spark, SfDir)
    val nPurchases = Tables.events(spark, SfDir)
      .filter(col("event_type") === "purchase").count()
    // left join: one output row per purchase, with or without clicks
    assert(r.count() == nPurchases)
    // when a last click exists it must sit strictly inside the window
    assert(r.filter(col("last_click_ms").isNotNull &&
      (col("last_click_ms") >= col("p_ms") ||
        col("last_click_ms") < col("p_ms") - operators.Events.AttribWindowMs)).count() == 0)
    // zero-click purchases report null last_click, and vice versa
    assert(r.filter((col("n_clicks_1h") === 0) =!= col("last_click_ms").isNull).count() == 0)
  }

  test("funnel stages are strictly ordered per user") {
    import org.apache.spark.sql.functions._
    val f = graft.operators.Events.funnel(spark, SfDir)
    assert(f.count() > 0)
    assert(f.filter(col("t_click").isNotNull && col("t_click") <= col("t_view")).count() == 0)
    assert(f.filter(col("t_purchase").isNotNull && col("t_purchase") <= col("t_click")).count() == 0)
    // a later stage implies the earlier one
    assert(f.filter(col("t_purchase").isNotNull && col("t_click").isNull).count() == 0)
  }

  test("approx_count_distinct error stays within 3x the configured rsd") {
    import org.apache.spark.sql.functions._
    // The raw sketch check, independent of the registry row's verdict
    // column: rsd = 0.02, 3-sigma relative-error bound of 6%.
    val approx = Tables.orders(spark, SfDir)
      .groupBy("o_orderpriority")
      .agg(approx_count_distinct(col("o_custkey"),
        Relational.ApproxDistinctRsd).as("approx_customers"))
    val exact = Tables.orders(spark, SfDir)
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("exact_customers"))
    val worst = approx.join(exact, "o_orderpriority")
      .select((abs(col("approx_customers") - col("exact_customers")).cast("double") /
        col("exact_customers").cast("double")).as("rel_err"))
      .agg(max(col("rel_err"))).collect()(0).getDouble(0)
    assert(worst <= 3 * Relational.ApproxDistinctRsd,
      s"worst HLL relative error $worst > 6%")
    // and the registry row's verdict column agrees: every group 1
    val verdicts = Relational.relApproxDistinct(spark, SfDir).collect()
    assert(verdicts.nonEmpty)
    verdicts.foreach(r =>
      assert(r.getAs[Long]("within_6sigma") == 1L,
        s"${r.getAs[String]("o_orderpriority")}: verdict flipped to 0"))
  }

  test("approx percentiles sit within the sketch's rank-error bracket") {
    import org.apache.spark.sql.functions._
    // percentile_approx(·, q, acc) guarantees a value whose rank is
    // within ε·n of q·n, ε = 1/acc — assert each group's approx value
    // lies between the exact order statistics at ranks (q ± ε)·n.
    val eps = 1.0 / Relational.ApproxPctAccuracy
    val acc = Relational.ApproxPctAccuracy
    val approx = Tables.orders(spark, SfDir)
      .groupBy("o_orderpriority")
      .agg(
        round(expr(s"percentile_approx(o_totalprice, 0.5, $acc)"), 2).as("p50"),
        round(expr(s"percentile_approx(o_totalprice, 0.95, $acc)"), 2).as("p95"))
      .collect()
      .map(r => r.getString(0) ->
        Seq(0.5 -> r.getDouble(1), 0.95 -> r.getDouble(2))).toMap
    val groups = Tables.orders(spark, SfDir)
      .select(col("o_orderpriority"), col("o_totalprice")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    assert(approx.keySet === groups.keySet)
    approx.foreach { case (k, qs) =>
      val v = groups(k); val n = v.length
      qs.foreach { case (q, got) =>
        val lo = v(math.max(0, math.ceil((q - eps) * n).toInt - 1))
        val hi = v(math.min(n - 1, math.floor((q + eps) * n).toInt))
        assert(got >= lo - 0.01 && got <= hi + 0.01,
          s"$k q=$q: $got outside rank bracket [$lo, $hi]")
      }
    }
    // and the registry row's verdict columns agree: every group 1/1
    val verdicts = Relational.relApproxPercentiles(spark, SfDir).collect()
    assert(verdicts.map(_.getString(0)).toSet === groups.keySet)
    verdicts.foreach { r =>
      assert(r.getAs[Long]("p50_bracketed") == 1L &&
        r.getAs[Long]("p95_bracketed") == 1L,
        s"${r.getString(0)}: bracket verdict flipped to 0")
      assert(r.getAs[Long]("r50_lo") <= r.getAs[Long]("r50_hi") &&
        r.getAs[Long]("r95_lo") <= r.getAs[Long]("r95_hi"))
    }
  }

  test("plan shape: q8 broadcasts the dim sides and never shuffles a cartesian") {
    val plan = Relational.q8MarketShare(spark, SfDir)
      .queryExecution.executedPlan.toString
    // part and supplier-nation-region sides are broadcast (at the tiny
    // test scale orders broadcasts too — at sf0.1+ lineitem⋈orders
    // becomes the one shuffled join); either way, no cartesian
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2)
    assert(!plan.contains("CartesianProduct"))
  }
}
