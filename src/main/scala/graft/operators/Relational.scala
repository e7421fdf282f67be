package graft.operators

import graft.{GQuery, Tables}
import graft.Ckpt.TruncOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator core (SURVEY.md §2.B): the general
  * map→shuffle→reduce engine the reference's pluggable
  * STEP_ID_TO_FUNCTION hosts (/root/reference/mapreduce/worker/
  * algorithm.py), widened to a full analytics surface and expressed
  * as declarative TPC-H-shaped Catalyst plans.
  *
  * Scale discipline (100 TB):
  *  - dimension tables (region/nation/supplier/part) are broadcast —
  *    never shuffled; fact-fact joins shuffle on their join key only.
  *  - aggregates are groupBy.agg → partial (map-side) aggregation
  *    before the exchange, the fix for the reference's
  *    coordinator-side in-memory shuffle.
  *  - every filter is a Column predicate on scan columns → pushed to
  *    the parquet reader (PushedFilters), verified in PlanSpec.
  *  - FP aggregates are rounded identically on both engine and
  *    oracle sides (sum order differs across engines).
  */
object Relational {

  private def round2(c: Column) = round(c, 2)

  /** TPC-H Q1 shape: scan-heavy multi-aggregate with pushdown filter. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-09-02")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round2(sum(col("l_quantity"))).as("sum_qty"),
        round2(sum(col("l_extendedprice"))).as("sum_base_price"),
        round2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
        round2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3 shape: fact-fact-dim join, agg, deterministic top-k. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < to_timestamp(lit("1998-06-30")))
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > to_timestamp(lit("1998-06-30")))
      .groupBy(col("l_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_orderdate_ms"),
        col("o_orderpriority"))
      .agg(round2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)

  /** TPC-H Q4 shape: EXISTS as a left-semi join with a join-side predicate. */
  def q4Semijoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    o.join(l,
        o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q5 shape: star join; all dims broadcast, facts shuffle once. */
  def q5Multijoin(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1999-01-01")))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey") && col("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(round2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))

  /** TPC-H Q6 shape: fully-pushed selective scan, single global agg. */
  def q6FilterAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
        col("l_discount").between(0.03, 0.07) &&
        col("l_quantity") < 24)
      .agg(round2(sum(col("l_extendedprice") * col("l_discount"))).as("revenue"))

  /** NOT EXISTS as a left-anti join (customers with no urgent order). */
  def q7Antijoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        round2(sum(col("c_acctbal"))).as("acctbal_sum"))
      .orderBy("c_mktsegment")

  /** TPC-H Q10 shape: returned-item revenue per customer, top 20. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(round2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)

  /** TPC-H Q12 shape: CASE-WHEN conditional aggregation over a join. */
  def q12ConditionalAgg(spark: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH"
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(high, 1).otherwise(0)).as("high_line_count"),
        sum(when(high, 0).otherwise(1)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** TPC-H Q13 shape: outer join + two-level aggregation. */
  def q13OrderHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_orderstatus") =!= "P"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))

  /** TPC-H Q14 shape: broadcast dim join + conditional ratio. */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-07-01")))
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .agg(round(
        lit(100.0) * sum(when(col("p_type") === "PROMO",
          col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0)) /
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("promo_revenue_pct"))

  /** TPC-H Q16 shape: groupBy + HAVING + count distinct. */
  def q16Having(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
          .filter(col("p_brand") =!= "Brand#1" && col("p_size") <= 20)),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .filter(col("supplier_cnt") >= 5)
      .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"), asc("p_size"))

  /** TPC-H Q17 shape: per-key avg subquery joined back to the fact.
    * The broadcast Brand#11 filter prunes the fact BEFORE the
    * per-partkey avg aggregate — only ~1/25 of partkeys survive, so at
    * scale the shuffle-agg runs over the pruned fact, not all of
    * lineitem. The avg per partkey is unchanged by the pruning (the
    * part filter is on the grouping key itself).
    */
  def q17CorrelatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    val pruned = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir).filter(col("p_brand") === "Brand#11")),
        col("l_partkey") === col("p_partkey"))
    val avgQty = pruned.groupBy(col("l_partkey").as("ap_partkey"))
      .agg((avg(col("l_quantity")) * 0.5).as("half_avg_qty"))
    pruned
      .join(avgQty, col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") < col("half_avg_qty"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }

  /** TPC-H Q18 shape: agg-then-join-back (large orders). */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val big = l.groupBy(col("l_orderkey").as("big_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 200)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("big_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"), round2(col("total_qty")).as("total_qty"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q19 shape: join with OR-of-ANDs residual predicates. */
  def q19DisjunctiveJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 21)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 40)))
      .agg(round2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q20 shape: IN-subquery over a derived aggregate → semi join. */
  def q20InSubquery(spark: SparkSession, dir: String): DataFrame = {
    val shipped = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir).filter(col("p_type") === "PROMO")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("promo_qty"))
      .filter(col("promo_qty") > 300)
    Tables.supplier(spark, dir)
      .join(shipped, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name", "s_acctbal")
      .orderBy("s_suppkey")
  }

  /** DISTINCT projection. */
  def relDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select("c_mktsegment", "c_nationkey")
      .distinct()
      .orderBy("c_mktsegment", "c_nationkey")

  /** UNION / INTERSECT / EXCEPT pipeline on key sets. */
  def relSetops(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val building = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val machinery = c.filter(col("c_mktsegment") === "MACHINERY").select("c_custkey")
    val openOrders = o.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("c_custkey"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    building.union(machinery).distinct()
      .intersect(openOrders)
      .except(urgent)
      .orderBy("c_custkey")
  }

  /** ROLLUP multi-level aggregate; grouping flags instead of nulls so
    * null-ordering semantics can't differ between engines.
    */
  def relRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(round2(sum(col("l_quantity"))).as("sum_qty"),
        count(lit(1)).as("n_rows"),
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("g_flag"), col("g_status"),
        col("sum_qty"), col("n_rows"))
      .orderBy("g_flag", "g_status", "returnflag", "linestatus")

  /** Dense per-group top-k via window — no global sort, no shuffle
    * beyond the partition key.
    */
  def relTopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "rn")
  }

  /** Running sum + rank over a partitioned window (unique sort key). */
  def relWindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") <= 10)
      .withColumn("running_qty", round2(sum(col("l_quantity"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .withColumn("rn", row_number().over(w).cast("long"))
      .select("l_suppkey", "rn", "l_orderkey", "l_linenumber", "running_qty")
      .orderBy("l_suppkey", "rn")
  }

  /** HLL relative standard deviation for `rel_approx_distinct`. */
  val ApproxDistinctRsd = 0.02

  /** HLL sketch count-distinct — the 100 TB path for distinct counts —
    * in its oracle-green bound-verdict form (VERDICT r13 #1): the HLL
    * estimate is engine-private (register layout), so the row emits
    * the 6σ accuracy VERDICT instead — per group, is the estimate
    * within 6·rsd of the exact count? (rsd is a relative STANDARD
    * DEVIATION, not a hard bound — ADVICE r14: at 3σ a legitimate
    * sketch run on a fresh corpus can flip the verdict with
    * probability ~2.7e-3 per group; 6σ puts the false-flip rate
    * below 2e-9 per group while any real register-layout regression
    * still lands orders of magnitude outside.) DuckDB computes the exact
    * distinct count and the constant-1 verdict column; a sketch
    * regression beyond its published bound flips the 1 and breaks the
    * hash (the estimate itself never reaches the oracle). The exact
    * count rides the SAME single aggregation pass for certification —
    * production keeps only the sketch; the oracle-green calibration
    * companion is `rel_distinct_sketch_error` (replayable KMV).
    */
  def relApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(
        approx_count_distinct(col("o_custkey"), ApproxDistinctRsd).as("hll"),
        count_distinct(col("o_custkey")).as("n_exact_customers"),
        count(lit(1)).as("n_orders"))
      .select(col("o_orderpriority"), col("n_orders"),
        col("n_exact_customers"),
        when(abs(col("hll") - col("n_exact_customers")).cast("double") <=
          lit(6 * ApproxDistinctRsd) * col("n_exact_customers").cast("double"),
          1L).otherwise(0L).as("within_6sigma"))
      .orderBy("o_orderpriority")

  /** KMV (k-minimum-values) affine-hash parameters for the
    * replayable distinct-sketch calibration row: h = (A·x + B) mod P
    * with P prime; the k-th smallest DISTINCT hash h_k estimates the
    * cardinality as (k−1)·P div h_k — the KMV estimator of
    * Bar-Yossef et al. (RANDOM 2002, "Counting distinct elements in
    * a data stream"); every step integer, so DuckDB replays it
    * cell-for-cell (the `ev_countmin_error` recipe applied to
    * distinct counting).
    */
  val KmvP = 2147483647L
  val KmvA = 1103515245L
  val KmvB = 12345L
  val KmvK = 64

  /** Replayable calibration census for the distinct-count sketch path
    * (VERDICT r9 #3): per o_orderstatus, the exact distinct customer
    * count next to the KMV estimate and its HALF-UP-free ppm error —
    * the hash-green accuracy audit the HLL row (`rel_approx_distinct`,
    * which stays the production path) cannot have, because HLL's
    * register layout is engine-private. Scale shape: the k-minima ride
    * the bounded-heap `TopKByScore` aggregator, so each map partition
    * contributes ≤ k rows to the exchange — the same partial-agg
    * property a production KMV/HLL sketch has; groups with fewer than
    * k distinct hashes degrade to the exact count by KMV convention.
    */
  def distinctSketchError(spark: SparkSession, dir: String): DataFrame = {
    val topk = graft.functions.TopK.topKByScore(KmvK)
    val d = Tables.orders(spark, dir)
      .select(col("o_orderstatus").as("status"), col("o_custkey"))
      .distinct()
    val hashes = d
      .select(col("status"),
        expr(s"($KmvA * o_custkey + $KmvB) % $KmvP").as("h"))
      .distinct()
    val ex = d.groupBy("status").agg(count(lit(1)).as("n_exact"))
    val sk = hashes.groupBy("status")
      .agg(count(lit(1)).as("n_hashes"),
        // score = -h: the k BEST scores are the k SMALLEST hashes
        topk((-col("h")).cast("double"), col("h")).as("mins"))
      .select(col("status"), col("n_hashes"),
        element_at(col("mins"), least(lit(KmvK), size(col("mins"))))
          .getField("id").as("kth"))
    ex.join(sk, Seq("status"))
      .select(col("status"), col("n_exact"),
        when(col("n_hashes") < KmvK, col("n_hashes"))
          .otherwise(expr(s"${(KmvK - 1) * KmvP}L div kth")).as("est_distinct"))
      .withColumn("err_ppm",
        expr("abs(est_distinct - n_exact) * 1000000 div n_exact"))
      .orderBy("status")
  }

  /** Equi-width bucket count for the replayable percentile-sketch
    * calibration row.
    */
  val PctSketchBuckets = 256L

  /** Replayable calibration census for the percentile-sketch path —
    * the quantile analogue of `rel_distinct_sketch_error`: per
    * o_orderpriority, the exact p50/p95 (the `rel_percentiles`
    * recipe) next to a histogram-sketch estimate and its error. The
    * estimator is the production shape for quantiles over data too
    * big to buffer: bucket every value into a fixed 256-cell
    * equi-width grid (integer cents, per-group bounds from one
    * broadcast agg), cumulative counts over the ≤256-row grid, and
    * take the lower edge of the first bucket whose cumulative count
    * reaches the target rank — every step integer, so DuckDB replays
    * the sketch cell-for-cell and the error column is hash-checked,
    * which the engine-private `percentile_approx` sketch
    * (`rel_approx_percentiles`, the production row) can never be.
    * Bracketing guarantee (Round10bOpsSpec): the estimate is within
    * one bucket width of the RANK-BASED percentile; the err columns
    * report the distance to the interpolated exact, which on sparse
    * groups additionally carries the interpolation gap.
    */
  def percentileSketchError(spark: SparkSession, dir: String): DataFrame = {
    // two scans total — the minimum for an equi-width sketch (bounds
    // must precede bucketing); every other relation here is a tiny
    // broadcast. The exact percentiles ride the SAME first scan as
    // the bounds (one agg), and both rank cuts come from ONE
    // conditional pass over the cumulative grid, so no subtree is
    // duplicated (the first cut of this query re-read orders 8×).
    val cents = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("pri"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
    val stats = cents.groupBy("pri")
      .agg(min("cents").as("lo"), max("cents").as("hi"),
        count(lit(1)).as("n"),
        round(expr("percentile(cents, 0.5) / 100.0"), 2).as("p50_exact"),
        round(expr("percentile(cents, 0.95) / 100.0"), 2).as("p95_exact"))
      .withColumn("w", expr(s"(hi - lo) div $PctSketchBuckets + 1"))
      .withColumn("r50", expr("(n + 1) div 2"))
      .withColumn("r95", expr("(95 * n + 99) div 100"))
      // group-domain-sized (5 rows); materialized once so its three
      // consumers don't each re-run the stats scan
      .truncated
    val grid = cents.join(broadcast(stats.select("pri", "lo", "w")), "pri")
      .select(col("pri"), expr("(cents - lo) div w").as("b"))
      .groupBy("pri", "b").agg(count(lit(1)).as("c"))
    // window over the ALREADY-AGGREGATED ≤(groups·257)-row grid
    val wnd = Window.partitionBy("pri").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val est = grid.withColumn("cum", sum(col("c")).over(wnd))
      .join(broadcast(stats.select("pri", "r50", "r95")), "pri")
      .groupBy("pri")
      .agg(min(when(col("cum") >= col("r50"), col("b"))).as("b50"),
        min(when(col("cum") >= col("r95"), col("b"))).as("b95"))
    stats.join(broadcast(est), "pri")
      .select(col("pri").as("o_orderpriority"), col("n").as("n_rows"),
        col("p50_exact"),
        (col("lo") + col("b50") * col("w")).as("p50_est_x100"),
        round((col("lo") + col("b50") * col("w")) / 100.0 - col("p50_exact"), 2)
          .as("p50_err"),
        col("p95_exact"),
        (col("lo") + col("b95") * col("w")).as("p95_est_x100"),
        round((col("lo") + col("b95") * col("w")) / 100.0 - col("p95_exact"), 2)
          .as("p95_err"))
      .orderBy("o_orderpriority")
  }

  /** Per-group percentiles, exact (interpolated), so the DuckDB
    * quantile_cont oracle hash-checks them. Exact percentile buffers a
    * group's values, so at 100 TB the sketch form is the right plan —
    * swap `percentile` for `percentile_approx` there and accept the
    * rows-only check (the 5-group demo here is driver-checkable
    * either way; the sketch error-bound is pinned in RelationalSpec).
    */
  def relPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.95)"), 2).as("p95"),
        round(min(col("o_totalprice")), 2).as("min_price"),
        round(max(col("o_totalprice")), 2).as("max_price"))
      .orderBy("o_orderpriority")

  val ApproxPctAccuracy = 1000 // rank error ε = 1/accuracy

  /** The sketch form of `relPercentiles` — the plan that survives
    * 100 TB: `percentile_approx` is a MERGEABLE quantile summary
    * (Greenwald–Khanna family), so every map partition contributes a
    * bounded-size sketch instead of buffering its group's values, and
    * the shuffle carries sketches, not data. Like the other sketch
    * rows (HLL distinct, SpaceSaving), merge order varies with
    * shuffle-fetch order, so the row emits the GK rank-bracket
    * VERDICT rather than the estimates (VERDICT r13 #1): the sketch
    * guarantees a returned value whose rank is within ε·n
    * (ε = 1/accuracy) of the target rank, so the estimate's exact
    * rank interval [lt+1, le] — computed by ONE broadcast-join pass
    * over the group — must intersect the closed-form bracket
    * [⌊n(p−ε)⌋, ⌈n(p+ε)⌉]. The bracket endpoints are pure integer
    * arithmetic over n (identical `div` on both engines), so DuckDB
    * emits them plus the constant-1 verdicts; a sketch regression
    * beyond its published rank error flips a verdict and breaks the
    * hash. The estimates stay engine-private; RelationalSpec
    * additionally pins them against the exact sorted values.
    */
  def relApproxPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val acc = ApproxPctAccuracy
    val o = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_totalprice"))
    val est = o.groupBy("o_orderpriority")
      .agg(
        expr(s"percentile_approx(o_totalprice, 0.5, $acc)").as("e50"),
        expr(s"percentile_approx(o_totalprice, 0.95, $acc)").as("e95"))
    o.join(broadcast(est), "o_orderpriority")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("o_totalprice") < col("e50"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("o_totalprice") <= col("e50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("o_totalprice") < col("e95"), 1L).otherwise(0L)).as("lt95"),
        sum(when(col("o_totalprice") <= col("e95"), 1L).otherwise(0L)).as("le95"))
      .withColumn("r50_lo", expr(s"(n_rows * ($acc - 2)) div (2 * $acc)"))
      .withColumn("r50_hi",
        expr(s"(n_rows * ($acc + 2) + 2 * $acc - 1) div (2 * $acc)"))
      .withColumn("r95_lo", expr(s"(n_rows * (19 * $acc - 20)) div (20 * $acc)"))
      .withColumn("r95_hi",
        expr(s"(n_rows * (19 * $acc + 20) + 20 * $acc - 1) div (20 * $acc)"))
      .select(col("o_orderpriority"), col("n_rows"),
        col("r50_lo"), col("r50_hi"),
        when(col("le50") >= col("r50_lo") &&
          col("lt50") + 1L <= col("r50_hi"), 1L).otherwise(0L)
          .as("p50_bracketed"),
        col("r95_lo"), col("r95_hi"),
        when(col("le95") >= col("r95_lo") &&
          col("lt95") + 1L <= col("r95_hi"), 1L).otherwise(0L)
          .as("p95_bracketed"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q9 shape: multi-dim profit rollup by nation × year. */
  /** Profit sums ride as SCALED INTEGERS (×10⁴ — price has 2 decimals,
    * discount 2, so the product is an exact 4-decimal value): integer
    * sums are order-free, making the result identical across engines
    * at EVERY scale factor (the raw-double sum hit a round-2 half
    * boundary at sf0.001). Headroom: Σ < 2⁶³ up to ~10⁹ rows of 10⁵
    * price per group; beyond that, move the accumulator to
    * DECIMAL(38,4) — the construction is unchanged.
    */
  def q9ProfitByNationYear(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000, 0)
          .cast("long")).cast("double") / 10000.0, 2).as("profit"))
      .orderBy(asc("n_name"), desc("o_year"))

  /** TPC-H Q2 shape: per-part min-cost supplier within a region — the
    * correlated-min-subquery pattern. No partsupp table in this
    * corpus, so supply cost is derived: min(l_extendedprice /
    * l_quantity) per (part, supplier). Dims broadcast; the per-part
    * min joins back on RAW double equality (both engines take min
    * over the identical value set, so the equality is bit-exact);
    * rounding happens only at output.
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val regSup = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    // BOTH broadcast filters (region suppliers AND the part predicate)
    // prune the fact before the per-(part, supplier) aggregate — the
    // same fix q17 got: both filters act on grouping keys, so the min
    // is unchanged while the shuffle-agg runs over a fraction of
    // lineitem. Supplier/part attributes ride along in the groupBy
    // (functionally dependent on the keys — no extra cardinality).
    val eligible = Tables.lineitem(spark, dir)
      .join(broadcast(regSup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.part(spark, dir)
          .filter(col("p_size") <= 10 && col("p_type") === "PROMO")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"), col("s_name"),
        col("s_acctbal"), col("n_name"), col("p_partkey"), col("p_name"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
    val minCost = eligible.groupBy(col("l_partkey").as("mc_partkey"))
      .agg(min(col("unit_cost")).as("min_cost"))
    eligible
      .join(minCost, col("l_partkey") === col("mc_partkey") &&
        col("unit_cost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), round(col("unit_cost"), 4).as("unit_cost"))
      .orderBy(desc("s_acctbal"), asc("n_name"), asc("s_name"), asc("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q8 shape: one nation's share of a region's revenue by
    * order year — broadcast part/supplier dims, the lineitem⋈orders
    * fact join, conditional-sum ratio per year.
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("n_name"))
    val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir).filter(col("p_type") === "STANDARD")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(
        sum(when(col("n_name") === "NATION_3", vol).otherwise(0.0)) / sum(vol),
        6).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q11 shape: groups exceeding a share of a global scalar
    * subquery (broadcast single-row cross join).
    */
  def q11RevenueShare(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .groupBy("l_partkey")
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("part_rev"))
    val total = rev.agg(sum(col("part_rev")).as("total_rev"))
    rev.crossJoin(broadcast(total))
      // 0.0008 share: low enough that the correctness scale factor
      // (sf0.01) yields actual rows (7), not a vacuous 0-row match.
      .filter(col("part_rev") > col("total_rev") * 0.0008)
      .select(col("l_partkey"), round(col("part_rev"), 2).as("part_rev"))
      .orderBy(desc("part_rev"), asc("l_partkey"))
  }

  /** TPC-H Q15 shape: argmax via scalar-subquery max on a derived
    * aggregate (top revenue supplier(s) in a half-year window).
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1996-07-01")))
      .groupBy("l_suppkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("total_rev"))
    val mx = rev.agg(max(col("total_rev")).as("max_rev"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_rev") === col("max_rev"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "total_rev")
      .orderBy("s_suppkey")
  }

  /** TPC-H Q21 shape: orders served by exactly one supplier →
    * per-supplier counts (agg-on-agg, no correlated EXISTS chain).
    */
  def q21SoleSupplierOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(countDistinct(col("l_suppkey")).as("n_supps"),
        min(col("l_suppkey")).as("the_supp"))
      .filter(col("n_supps") === 1)
      .groupBy(col("the_supp").as("s_suppkey"))
      .agg(count(lit(1)).as("sole_orders"))
      .join(broadcast(Tables.supplier(spark, dir)), Seq("s_suppkey"))
      .select("s_suppkey", "s_name", "sole_orders")
      .orderBy(desc("sole_orders"), asc("s_suppkey"))

  /** TPC-H Q22 shape: above-average balance + NOT EXISTS orders. */
  def q22DormantCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("avg_bal"))
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_custs"),
        round(sum(col("c_acctbal")), 2).as("total_bal"))
      .orderBy("c_nationkey")
  }

  /** Pivot: priority × order-status matrix of totals. */
  def relPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round2(sum(col("o_totalprice"))))
      .withColumnsRenamed(Map("F" -> "total_f", "O" -> "total_o", "P" -> "total_p"))
      .orderBy("o_orderpriority")

  /** Unpivot (melt) — the inverse of `relPivot` and the missing half
    * of the reshape surface: the four lineitem measures melt into
    * (metric, value) rows via the native `Dataset.unpivot` (Spark's
    * relational MELT, one narrow projection — no explode, no join),
    * then reduce per (returnflag, metric). The ×4 row expansion never
    * survives the map side: partial aggregation combines before the
    * exchange, so the shuffle carries |flags × metrics| rows. Money
    * rides per-value HALF_UP integer cents (the ev_sessionize
    * discipline — order-free exact sums); the oracle melts by UNION
    * ALL, a genuinely different construction, so hash equality
    * verifies Spark's unpivot itself.
    */
  def relUnpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "metric", "value")
      .groupBy("l_returnflag", "metric")
      .agg(count(lit(1)).as("n_rows"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_cents"))
      .orderBy("l_returnflag", "metric")

  /** CUBE over (returnflag, linestatus) with grouping flags. */
  def relCube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(round2(sum(col("l_quantity"))).as("sum_qty"),
        count(lit(1)).as("n_rows"),
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("g_flag"), col("g_status"), col("sum_qty"), col("n_rows"))
      .orderBy("g_flag", "g_status", "returnflag", "linestatus")

  /** GROUPING SETS — the general multi-aggregate form that rollup and
    * cube specialize: independent group-bys (per status, per priority,
    * grand total) computed in ONE pass over the fact table with
    * map-side partials, instead of N separate scans + a union.
    */
  def relGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(round2(sum(col("o_totalprice"))).as("sum_price"),
        count(lit(1)).as("n_orders"),
        grouping(col("o_orderstatus")).cast("long").as("g_status"),
        grouping(col("o_orderpriority")).cast("long").as("g_priority"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
        col("g_status"), col("g_priority"), col("sum_price"), col("n_orders"))
      .orderBy("g_status", "g_priority", "orderstatus", "orderpriority")

  /** Skew-safe join through the explicit salting tool (`plans.Skew`):
    * lineitem (big side, many rows per supplier) ⋈ supplier with the
    * big side salted 8 ways — a hot supplier's rows spread over 8
    * tasks instead of serializing into one, the portable fallback
    * when AQE skew handling can't apply. The oracle is the PLAIN
    * join's aggregate: hash equality proves salting is semantically
    * invisible.
    */
  def relSaltedSkewJoin(spark: SparkSession, dir: String): DataFrame =
    graft.plans.Skew.saltedJoin(
      Tables.lineitem(spark, dir).select(col("l_suppkey"), col("l_quantity"),
        col("l_orderkey"), col("l_linenumber")),
      Tables.supplier(spark, dir)
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey")),
      "l_suppkey",
      concat_ws("-", col("l_orderkey"), col("l_linenumber")),
      8)
      .groupBy("s_nationkey")
      .agg(round2(sum(col("l_quantity"))).as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy("s_nationkey")

  val BloomJoinNation = 7
  val BloomJoinBits = 8192 // 1 KiB bitmap — constant size at ANY dim cardinality
  val BloomJoinK = 5

  /** Runtime-filter (sideways-information-passing) join — the manual
    * form of the Bloom pre-filter a warehouse engine pushes into a
    * big-fact ⋈ selective-dim join: build a CONSTANT-size Bloom bitmap
    * over the dim side's join keys (suppliers of one nation, ~4% of
    * suppliers), broadcast it, and probe INSIDE the fact scan's
    * codegen pipeline so Bloom-negative rows die before the exchange.
    * False positives are removed by the exact join that follows, so
    * the rewrite is semantically invisible — the oracle is the PLAIN
    * join (hash equality proves invisibility, the salted_skew_join
    * pattern). At 100 TB the win is shuffle volume: only
    * selectivity + ε of the fact ever leaves the scan, and the bitmap
    * stays 1 KiB whether the dim has 40 keys or 40 million (vs a
    * broadcast hash set that grows with the dim).
    */
  def relBloomJoin(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Bloom
    val dim = Tables.supplier(spark, dir)
      .filter(col("s_nationkey") === BloomJoinNation)
      .select(col("s_suppkey"), col("s_name"))
    val bloom = dim.agg(
      Bloom.bloomAgg(BloomJoinBits, BloomJoinK)(col("s_suppkey")).as("bloom"))
    Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .crossJoin(broadcast(bloom))
      .filter(Bloom.mightContain(col("l_suppkey"), col("bloom"), BloomJoinK))
      .join(broadcast(dim), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey", "s_name")
      .agg(count(lit(1)).as("n_items"),
        round2(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue"))
      .orderBy("s_suppkey")
  }

  val ZBits = 8          // bits per dimension → 16-bit Morton key
  val ZBucketShift = 8   // keep the top 8 z-bits → 256 layout buckets

  /** The Morton interleave of two ZBits-wide ints, emitted once as a
    * Spark Column and once as DuckDB SQL FROM THE SAME LOOP, so the
    * engines cannot drift: bit i of each input lands at positions
    * 2i+1 / 2i of the key.
    */
  private def zInterleave(a: Column, b: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  private def zInterleaveSql(a: String, b: String): String =
    (0 until ZBits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i + 1}) | ((($b >> $i) & 1) << ${2 * i})"
    }.mkString("(", " | ", ")")

  /** Z-order (Morton) clustering — the multi-dimensional layout key
    * behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleaving the bits
    * of two filter dimensions yields ONE sort key whose contiguous
    * ranges are near-axis-aligned rectangles, so range-partitioned
    * files carry bounded min/max on BOTH columns and a predicate on
    * EITHER prunes files (a lexicographic (a, b) sort bounds only a).
    * The output is the per-bucket layout manifest (count + min/max
    * per dim) a writer would persist as its skipping index; the spec
    * asserts every bucket spans ≤ 1/2^(ZBucketShift/2) of each dim's
    * domain — the property that makes the layout prune. At 100 TB
    * this is a scan + one shuffle of the TINY manifest aggregate (the
    * real writer range-partitions by z_key with the terasort
    * machinery). All integer arithmetic: dims normalize to 0..2^ZBits−1
    * via the broadcast min/max aggregate (the distributed-rank shape)
    * with floor of an EXACT double quotient (numerators < 2^53), then
    * shift/mask interleave inside the scan's codegen — bit-identical
    * in DuckDB at every SF.
    */
  def relZorderCluster(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
    val bounds = li.agg(
      min("l_partkey").as("plo"), max("l_partkey").as("phi"),
      min("l_suppkey").as("slo"), max("l_suppkey").as("shi"))
    val zmax = (1L << ZBits) - 1
    def norm(x: Column, lo: Column, hi: Column): Column =
      floor((x - lo) * zmax / greatest(hi - lo, lit(1L))).cast("long")
    li.crossJoin(broadcast(bounds))
      .select(col("l_partkey"), col("l_suppkey"),
        norm(col("l_partkey"), col("plo"), col("phi")).as("up"),
        norm(col("l_suppkey"), col("slo"), col("shi")).as("us"))
      .withColumn("zbucket",
        shiftright(zInterleave(col("up"), col("us")), ZBucketShift))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n_rows"),
        min("l_partkey").as("min_part"), max("l_partkey").as("max_part"),
        min("l_suppkey").as("min_supp"), max("l_suppkey").as("max_supp"))
      .orderBy("zbucket")
  }

  val SkipProbes = 16

  /** Data-skipping effectiveness audit — the quantitative WHY behind
    * `rel_zorder_cluster`: build two 256-bucket layout manifests over
    * lineitem (z-order on (partkey, suppkey) vs a plain
    * lexicographic partkey sort), fire SkipProbes equal-width range
    * probes on the NON-sort dimension (suppkey), and count which
    * buckets min/max pruning would skip under each layout. The
    * lex layout's buckets each span ~the whole suppkey range (no
    * pruning); z-order's near-rectangular buckets prune most probes —
    * the measured advantage a lakehouse OPTIMIZE ZORDER report shows.
    * Everything after the two ≤256-row manifests is broadcast
    * arithmetic; probe edges are exact integer divisions.
    */
  def relSkippingStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
    val bounds = li.agg(
      min("l_partkey").as("plo"), max("l_partkey").as("phi"),
      min("l_suppkey").as("slo"), max("l_suppkey").as("shi"))
    val zmax = (1L << ZBits) - 1
    def norm(x: Column, lo: Column, hi: Column): Column =
      floor((x - lo) * zmax / greatest(hi - lo, lit(1L))).cast("long")
    val keyed = li.crossJoin(broadcast(bounds))
      .select(col("l_suppkey"), col("slo"), col("shi"),
        norm(col("l_partkey"), col("plo"), col("phi")).as("up"),
        norm(col("l_suppkey"), col("slo"), col("shi")).as("us"))
    def manifest(bucket: Column, tag: String) = keyed
      .withColumn("bucket", bucket)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("l_suppkey").as("mn"), max("l_suppkey").as("mx"),
        first("slo").as("slo"), first("shi").as("shi"))
      .withColumn("layout", lit(tag))
    val zman = manifest(shiftright(zInterleave(col("up"), col("us")), ZBucketShift), "z")
    val lman = manifest(col("up"), "lex")
    val man = zman.unionByName(lman)
    val probes = spark.range(SkipProbes).select(col("id").as("probe"))
    man.crossJoin(broadcast(probes))
      .withColumn("plo_k",
        expr(s"slo + ((shi - slo + 1) * probe) div $SkipProbes"))
      .withColumn("phi_k",
        expr(s"slo + ((shi - slo + 1) * (probe + 1)) div $SkipProbes - 1"))
      .withColumn("scanned", (col("mn") <= col("phi_k") && col("mx") >= col("plo_k")).cast("long"))
      .groupBy("probe", "layout")
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("scanned")).as("buckets_scanned"),
        sum(col("scanned") * col("n_rows")).as("rows_scanned"))
      .withColumn("prune_ppm",
        expr("(2*(n_buckets - buckets_scanned)*1000000 + n_buckets) div (2*n_buckets)"))
      .orderBy("probe", "layout")
  }

  private def skippingOracle: String = {
    val zmax = (1L << ZBits) - 1
    s"""WITH b AS (
       |  SELECT min(l_partkey) AS plo, max(l_partkey) AS phi,
       |         min(l_suppkey) AS slo, max(l_suppkey) AS shi
       |  FROM lineitem),
       |n AS (
       |  SELECT l_suppkey, slo, shi,
       |    CAST(floor((l_partkey - plo) * $zmax / greatest(phi - plo, 1)) AS BIGINT) AS up,
       |    CAST(floor((l_suppkey - slo) * $zmax / greatest(shi - slo, 1)) AS BIGINT) AS us
       |  FROM lineitem, b),
       |man AS (
       |  SELECT 'z' AS layout, ${zInterleaveSql("up", "us")} >> $ZBucketShift AS bucket,
       |    count(*) AS n_rows, min(l_suppkey) AS mn, max(l_suppkey) AS mx,
       |    any_value(slo) AS slo, any_value(shi) AS shi
       |  FROM n GROUP BY 1, 2
       |  UNION ALL
       |  SELECT 'lex' AS layout, up AS bucket,
       |    count(*) AS n_rows, min(l_suppkey) AS mn, max(l_suppkey) AS mx,
       |    any_value(slo) AS slo, any_value(shi) AS shi
       |  FROM n GROUP BY 1, 2),
       |p AS (SELECT unnest(range(0, $SkipProbes)) AS probe),
       |x AS (
       |  SELECT man.*, p.probe,
       |    slo + ((shi - slo + 1) * p.probe) // $SkipProbes AS plo_k,
       |    slo + ((shi - slo + 1) * (p.probe + 1)) // $SkipProbes - 1 AS phi_k
       |  FROM man CROSS JOIN p),
       |s AS (
       |  SELECT probe, layout, n_rows,
       |    CASE WHEN mn <= phi_k AND mx >= plo_k THEN 1 ELSE 0 END AS scanned
       |  FROM x)
       |SELECT probe, layout, count(*) AS n_buckets,
       |  CAST(sum(scanned) AS BIGINT) AS buckets_scanned,
       |  CAST(sum(scanned * n_rows) AS BIGINT) AS rows_scanned,
       |  (2*(count(*) - CAST(sum(scanned) AS BIGINT))*1000000 + count(*))
       |    // (2*count(*)) AS prune_ppm
       |FROM s GROUP BY probe, layout ORDER BY probe, layout""".stripMargin
  }

  private def zorderOracle: String = {
    val zmax = (1L << ZBits) - 1
    s"""WITH b AS (
       |  SELECT min(l_partkey) AS plo, max(l_partkey) AS phi,
       |         min(l_suppkey) AS slo, max(l_suppkey) AS shi
       |  FROM lineitem),
       |n AS (
       |  SELECT l_partkey, l_suppkey,
       |    CAST(floor((l_partkey - plo) * $zmax / greatest(phi - plo, 1)) AS BIGINT) AS up,
       |    CAST(floor((l_suppkey - slo) * $zmax / greatest(shi - slo, 1)) AS BIGINT) AS us
       |  FROM lineitem, b),
       |z AS (
       |  SELECT l_partkey, l_suppkey,
       |    ${zInterleaveSql("up", "us")} >> $ZBucketShift AS zbucket
       |  FROM n)
       |SELECT zbucket, count(*) AS n_rows,
       |  min(l_partkey) AS min_part, max(l_partkey) AS max_part,
       |  min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
       |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin
  }

  /** Snapshot reconciliation (table diff) — the audit every ingest /
    * migration pipeline runs between two versions of a table: one
    * co-partitioned FULL OUTER join on the key classifies every row
    * as added / removed / changed / unchanged and nets the value
    * drift, then a map-side-combinable aggregate reduces it all to
    * a four-row report — at 100 TB the cost is the two scans plus
    * one keyed shuffle each, and nothing wider than (key, price)
    * ever moves. The two "snapshots" derive deterministically from
    * orders: before drops keys ≡1 (mod 7) and perturbs prices of
    * keys ≡0 (mod 5) by +1.00 (an EXACT double add — integers ≤ 2⁵²
    * have exact representations and the 2-decimal price keeps its
    * bits, so changed-row detection compares bit-identical doubles
    * on both engines); after drops keys ≡2 (mod 7). Deltas ride as
    * CENTS INTEGERS (§4 order-free rule).
    */
  def relTableDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_totalprice"))
    val before = o.filter(pmod(col("o_orderkey"), lit(7L)) =!= 1L)
      .select(col("o_orderkey").as("bk"),
        when(pmod(col("o_orderkey"), lit(5L)) === 0L, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")).as("bprice"))
    val after = o.filter(pmod(col("o_orderkey"), lit(7L)) =!= 2L)
      .select(col("o_orderkey").as("ak"), col("o_totalprice").as("aprice"))
    before.join(after, col("bk") === col("ak"), "full_outer")
      .select(
        when(col("bk").isNull, "added")
          .when(col("ak").isNull, "removed")
          .when(col("aprice") =!= col("bprice"), "changed")
          .otherwise("unchanged").as("diff_status"),
        (coalesce(round(col("aprice") * 100).cast("long"), lit(0L)) -
          coalesce(round(col("bprice") * 100).cast("long"), lit(0L)))
          .as("delta_cents"))
      .groupBy("diff_status")
      .agg(count(lit(1)).as("n_rows"), sum(col("delta_cents")).as("net_delta_cents"))
      .orderBy("diff_status")
  }

  /** Buckets per group for the distributed rank decomposition. Fixed
    * here for oracle determinism; at 100 TB size it ~√(rows/group)
    * (driver conf), exactly like the IVF cell count.
    */
  val RankBuckets = 64

  /** Full per-group rank analytics — rank, percent_rank, cume_dist,
    * ntile(4) — WITHOUT a per-group corpus sort. `Window.partitionBy
    * (nation)` alone would funnel each nation's entire customer set
    * into one task forever (25 tasks at any scale — the round-3
    * ANN-window defect in relational form). Instead, the classic
    * distributed-CDF decomposition:
    *   1. bucket the order key into RankBuckets equi-width cells from
    *      a broadcast per-nation (min, max) aggregate (equi-depth
    *      percentile boundaries are the drop-in swap when value skew
    *      matters — same shape as `pipe_shard_manifest`);
    *   2. count rows per (nation, bucket) and prefix-sum the counts
    *      with a window over that TINY aggregate (≤ 25·64 rows);
    *   3. join the offsets back (broadcast) so the only per-row
    *      window partitions by (nation, bucket) — per-partition work
    *      is n/(groups·buckets), bounded by the bucket knob.
    * rank = bucket offset + intra-bucket row_number; the order key
    * (c_acctbal, c_custkey) is unique, so there are no peer groups
    * and percent_rank = (rank−1)/(n−1), cume_dist = rank/n, and
    * ntile(4) follows the SQL first-(n mod 4)-buckets-get-the-extra
    * rule in closed form. The DuckDB oracle computes rank and ntile
    * with its NATIVE window functions — hash equality proves the
    * decomposition implements textbook semantics exactly; the two
    * fractions are e6-quantized on BOTH engines by the integer
    * HALF_UP formula (2p+q) div 2q, because native cume_dist values
    * land exactly on round-6 half boundaries whenever n = 2^a·5^b
    * (see the in-code note).
    */
  def relDistributedRank(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select("c_custkey", "c_nationkey", "c_acctbal")
    val bounds = c.groupBy("c_nationkey")
      .agg(min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"))
    val bucketed = c.join(broadcast(bounds), Seq("c_nationkey"))
      .withColumn("bucket",
        least(greatest(
          floor((col("c_acctbal") - col("lo")) * RankBuckets /
            greatest(col("hi") - col("lo"), lit(1e-9))), lit(0L)),
          lit(RankBuckets - 1L)))
      .drop("lo", "hi")
    val counts = bucketed.groupBy("c_nationkey", "bucket")
      .agg(count(lit(1)).as("cnt"))
    val byNation = Window.partitionBy("c_nationkey")
    val offsets = counts
      .withColumn("cum", sum(col("cnt")).over(
        byNation.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("offset", col("cum") - col("cnt"))
      .withColumn("n", sum(col("cnt")).over(byNation))
      .select("c_nationkey", "bucket", "offset", "n")
    val inBucket = Window.partitionBy("c_nationkey", "bucket")
      .orderBy("c_acctbal", "c_custkey")
    def idiv(a: Column, b: Column): Column = floor(a.cast("double") / b).cast("long")
    val small = idiv(col("n"), lit(4))
    val rmd = col("n") % 4
    val ranked = bucketed.join(broadcast(offsets), Seq("c_nationkey", "bucket"))
      .withColumn("rnk", col("offset") + row_number().over(inBucket))
      // the e6-quantized fractions derive by INTEGER HALF_UP division
      // ((2p+q) div 2q) rather than round(double, 6): when n is
      // 2^a·5^b (n = 640 at sf0.1) rnk/n is an exact 7-decimal value
      // ending in 5, where Spark's shortest-decimal rounding and
      // DuckDB's binary-value rounding disagree; a pure-integer
      // formula is identical on any engine (§4)
      .withColumn("pct_rank",
        when(col("n") > 1,
          expr("(2*(rnk-1)*1000000 + (n-1)) div (2*(n-1))")
            .cast("double") / 1000000.0).otherwise(0.0))
      .withColumn("cume",
        expr("(2*rnk*1000000 + n) div (2*n)").cast("double") / 1000000.0)
      // first (n mod 4) tiles get ceil(n/4) rows; the otherwise branch is
      // unreachable when small == 0 (it needs rnk > n), so the greatest()
      // guard only shields the not-taken division.
      .withColumn("quartile",
        when(col("rnk") <= rmd * (small + 1),
          idiv(col("rnk") - 1, small + 1) + 1)
          .otherwise(rmd + idiv(col("rnk") - 1 - rmd * (small + 1),
            greatest(small, lit(1L))) + 1))
    ranked.select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
      col("rnk"), col("pct_rank"), col("cume"), col("quartile"))
      .orderBy("c_nationkey", "rnk")
  }

  /** MERGE / upsert — the warehouse maintenance primitive (Delta/
    * Iceberg MERGE INTO semantics) expressed as one full-outer join on
    * the key: matched+update rows take the change's values,
    * matched+delete rows drop, unmatched change rows insert, the rest
    * carry over. One key-partitioned shuffle of base and changes, no
    * driver involvement — the shape that rewrites a 100 TB table's
    * changed partitions. The change feed is derived deterministically
    * from the base table (updates for key%7=0, deletes for key%11=0,
    * inserts above the key space for key%13=0) so the oracle replays
    * the identical MERGE in SQL.
    */
  def relMergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select("c_custkey", "c_nationkey", "c_acctbal")
    val changes = base
      .withColumn("op",
        when(col("c_custkey") % 7 === 0, lit("update"))
          .when(col("c_custkey") % 11 === 0, lit("delete")))
      .filter(col("op").isNotNull)
      .select(col("c_custkey").as("k"),
        col("op"),
        (col("c_acctbal") + 50.0).as("new_bal"),
        col("c_nationkey").as("new_nation"))
      // insert keys ride ABOVE the true max key (broadcast scalar), so
      // they can never collide with a real customer at any scale —
      // key + fixed_offset would silently merge-over real rows once
      // custkeys reach the offset
      .unionByName(base.filter(col("c_custkey") % 13 === 0)
        .crossJoin(broadcast(base.agg(max(col("c_custkey")).as("max_k"))))
        .select((col("max_k") + col("c_custkey") + 1).as("k"),
          lit("insert").as("op"),
          lit(100.0).as("new_bal"),
          col("c_nationkey").as("new_nation")))
    base.join(changes, col("c_custkey") === col("k"), "full_outer")
      .filter(coalesce(col("op"), lit("keep")) =!= "delete")
      .select(
        coalesce(col("c_custkey"), col("k")).as("custkey"),
        coalesce(col("new_nation"), col("c_nationkey")).as("nationkey"),
        when(col("op").isin("update", "insert"), col("new_bal"))
          .otherwise(col("c_acctbal")).as("acctbal"),
        coalesce(col("op"), lit("keep")).as("op"))
      .orderBy("custkey")
  }

  /** Output every TerasortStride-th rank so the verified result stays
    * small while still pinning positions across the whole range.
    */
  val TerasortStride = 997L

  /** Total-order global rank — the TeraSort shape. A naive
    * `row_number() OVER (ORDER BY …)` funnels the entire table through
    * ONE sort task; the distributed form is: range-repartition on the
    * sort key (Spark samples split points, so partitions stay balanced
    * under any distribution), sort within partitions, then turn local
    * positions into global ranks by adding per-partition offsets. The
    * offsets come from one count-per-partition pass (numPartitions
    * integers to the driver — conf-sized, never data-sized), and rank
    * assignment is a single mapPartitionsWithIndex sweep over the
    * already-sorted partitions: no window exchange, no global sort
    * task, two narrow passes total. (This is the one operator family
    * where per-partition imperative code is the honest tool — a window
    * partitioned by spark_partition_id would re-shuffle the sorted
    * table just to number it.) The oracle is DuckDB's global
    * row_number over the same unique key — hash equality proves the
    * offset arithmetic implements exactly the single-task semantics.
    */
  def relTerasort(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val sortCols = Seq(col("l_extendedprice").desc, col("l_orderkey").asc,
      col("l_linenumber").asc)
    // Materialize the range-partitioned sort ONCE: the sizes pass and
    // the rank pass are separate jobs, and without the checkpoint each
    // would re-execute the shuffle + per-partition sort.
    val sorted = Tables.lineitem(spark, dir)
      .select("l_extendedprice", "l_orderkey", "l_linenumber")
      .repartitionByRange(32, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .localCheckpoint()
    val sizes = sorted.rdd
      .mapPartitionsWithIndex((i, it) =>
        Iterator((i, it.foldLeft(0L)((n, _) => n + 1)))) // Long count — .size is Int
      .collect().sortBy(_._1).map(_._2)
    val offsets = sizes.scanLeft(0L)(_ + _)
    val stride = TerasortStride
    val ranked = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var r = offsets(i)
      it.flatMap { row =>
        r += 1
        if (r % stride == 1L) Some(Row.fromSeq(row.toSeq :+ r)) else None
      }
    }
    spark.createDataFrame(ranked,
      StructType(sorted.schema.fields :+ StructField("rank", LongType)))
      .select(col("rank"), col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber"))
      .orderBy("rank")
  }

  /** Bucket count for `rel_equiwidth_histogram`. */
  val HistBuckets = 20L

  /** Equi-width histogram over `l_extendedprice` — the
    * statistics/data-profiling primitive (the engine-side analogue of
    * an optimizer column histogram). Price rides as cents integers;
    * the bucket index is PURE integer math, ((v−lo)·B) div (hi−lo+1),
    * which lands every value in [0, B−1] with no clamp and no FP
    * boundary to disagree across engines. Plan: one 1-row min/max
    * aggregate broadcast into the scan, then a B-row census agg —
    * two passes over the column, zero windows, zero joins of scale.
    */
  def equiwidthHistogram(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("cents"))
    val bounds = li.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
    li.crossJoin(broadcast(bounds))
      .select(expr(s"((cents - lo) * $HistBuckets) div (hi - lo + 1)").as("bucket"),
        col("cents"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("cents")).as("sum_cents"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"))
      .orderBy("bucket")
  }

  /** Tile count for `rel_equidepth_histogram`. */
  val EquidepthTiles = 8L

  /** Equi-DEPTH histogram (ntile boundaries) of line-item price — the
    * optimizer-statistics companion to `rel_equiwidth_histogram`:
    * eight tiles of (near-)equal row count with per-tile count /
    * min / max / sum, i.e. exact global quantile boundaries. A naive
    * `ntile(8) OVER (ORDER BY …)` is a single-task global sort
    * forever; instead the `rel_distributed_rank` decomposition goes
    * global: integer equi-width pre-buckets over the broadcast cents
    * range, per-bucket counts prefix-summed by a broadcast THETA-JOIN
    * over the ≤`RankBuckets`-row grid (no window over any
    * corpus-scaled input, no unpartitioned window at all), global
    * rank = bucket offset + in-bucket row_number on the unique
    * (cents, orderkey, linenumber) key, and the SQL ntile
    * first-(n mod T)-tiles-get-the-extra rule applied in closed form.
    * The DuckDB oracle uses its NATIVE ntile window — hash equality
    * proves the decomposition, tile by tile, on exact integer cents.
    */
  def equidepthHistogram(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("cents"),
        col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
    val bounds = li.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
    val bucketed = li.crossJoin(broadcast(bounds))
      .select(expr(s"((cents - lo) * $RankBuckets) div (hi - lo + 1)").as("bucket"),
        col("cents"), col("ok"), col("ln"))
    // counts is RankBuckets-sized but feeds THREE subtrees (both
    // sides of the prefix theta-join and the total) — materialize it
    // so each does not re-scan the fact table
    val counts = bucketed.groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .truncated
    val offsets = counts.as("a")
      .join(broadcast(counts.as("b")), col("b.bucket") < col("a.bucket"), "left")
      .groupBy(col("a.bucket").as("bucket"), col("a.cnt").as("cnt"))
      .agg(coalesce(sum(col("b.cnt")), lit(0L)).as("offset"))
    val total = counts.agg(sum(col("cnt")).as("n"))
    val inBucket = Window.partitionBy("bucket").orderBy("cents", "ok", "ln")
    val t = EquidepthTiles
    bucketed.join(broadcast(offsets.select("bucket", "offset")), Seq("bucket"))
      .crossJoin(broadcast(total))
      .withColumn("rnk", col("offset") + row_number().over(inBucket))
      // ntile(T): first (n mod T) tiles take (n div T)+1 rows; the else
      // branch needs rnk > rmd*(small+1) which is impossible when
      // small == 0, so greatest() only shields the not-taken division.
      .withColumn("tile",
        when(col("rnk") <= (col("n") % t) * (expr(s"n div $t") + 1),
          expr(s"(rnk - 1) div ((n div $t) + 1) + 1"))
          .otherwise(col("n") % t +
            expr(s"(rnk - (n % $t) * ((n div $t) + 1) - 1) div greatest(n div $t, 1)") + 1))
      .groupBy("tile")
      .agg(count(lit(1)).as("n_rows"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"),
        sum(col("cents")).as("sum_cents"))
      .orderBy("tile")
  }

  /** Population-stability-index drift monitor — the ML-monitoring
    * standard for "did the feature distribution move between
    * snapshots": baseline vs current = the deterministic orderkey
    * parity split (stand-in for two table snapshots), equi-width
    * cents buckets over the COMBINED broadcast range (shared edges,
    * or PSI is meaningless), Laplace-smoothed shares as HALF_UP ppm
    * integers ((n+1)/(N+B) — zero buckets stay finite), and the PSI
    * term (p−q)·ln(p/q) emitted PER BUCKET from the two exact ppm
    * integers in one identical FP tree rounded to 6 — the χ²-op
    * discipline: no cross-bucket FP sum exists, the consumer adds
    * exact per-bucket terms. One scan + a B-row census.
    */
  def psiDrift(spark: SparkSession, dir: String): DataFrame = {
    val cents = Tables.orders(spark, dir)
      .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"),
        (col("o_orderkey") % 2).as("side"))
    val bounds = cents.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
    val grid = cents.crossJoin(broadcast(bounds))
      .select(expr(s"((cents - lo) * $HistBuckets) div (hi - lo + 1)").as("bucket"),
        col("side"))
      .groupBy("bucket")
      .agg(count(when(col("side") === 0, 1)).as("n_base"),
        count(when(col("side") === 1, 1)).as("n_cur"))
    val tot = grid.agg(sum(col("n_base")).as("tb"), sum(col("n_cur")).as("tc"))
    grid.crossJoin(broadcast(tot))
      .withColumn("p_ppm",
        expr(s"(2*(n_base + 1)*1000000 + (tb + $HistBuckets)) div (2*(tb + $HistBuckets))"))
      .withColumn("q_ppm",
        expr(s"(2*(n_cur + 1)*1000000 + (tc + $HistBuckets)) div (2*(tc + $HistBuckets))"))
      .select(col("bucket"), col("n_base"), col("n_cur"), col("p_ppm"), col("q_ppm"),
        round(((col("p_ppm") - col("q_ppm")).cast("double") / 1000000.0) *
          (log(col("p_ppm").cast("double")) - log(col("q_ppm").cast("double"))), 6)
          .as("psi_term"))
      .orderBy("bucket")
  }

  /** Constraint audit — the dbt-test / Great-Expectations data-quality
    * pass as one engine query: primary-key uniqueness (violations =
    * rows − distinct keys), referential integrity (orphan counts via
    * LEFT ANTI joins — the probe side is the fact table, the build
    * side the key set), a deliberately-false functional dependency
    * (l_orderkey → l_suppkey: LHS keys with >1 distinct RHS — multi-
    * supplier orders exist by construction, so the audit must be
    * non-degenerate), and a NOT NULL check. Every check is one keyed
    * agg or one anti join; the union is a fixed 6-row report. At
    * 100 TB each check is an independent scan — they parallelize and
    * none carries per-key state beyond the count.
    */
  def constraintAudit(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val c = Tables.customer(spark, dir)
    def row(name: String, rows: Column, viol: Column, df: DataFrame): DataFrame =
      df.agg(rows.as("n_rows"), viol.as("n_violations"))
        .select(lit(name).as("constraint_name"), col("n_rows"), col("n_violations"))
    val pkO = row("pk_orders_orderkey", count(lit(1)),
      count(lit(1)) - countDistinct(col("o_orderkey")), o)
    val pkL = row("pk_lineitem_orderkey_linenumber", count(lit(1)),
      count(lit(1)) - countDistinct(col("l_orderkey"), col("l_linenumber")), li)
    val fkLO = li.join(o.select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphans"))
      .crossJoin(broadcast(li.agg(count(lit(1)).as("n"))))
      .select(lit("fk_lineitem_orders").as("constraint_name"),
        col("n").as("n_rows"), col("orphans").as("n_violations"))
    val fkOC = o.join(c.select(col("c_custkey").as("o_custkey")),
        Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("orphans"))
      .crossJoin(broadcast(o.agg(count(lit(1)).as("n"))))
      .select(lit("fk_orders_customer").as("constraint_name"),
        col("n").as("n_rows"), col("orphans").as("n_violations"))
    val fd = li.groupBy("l_orderkey")
      .agg(countDistinct(col("l_suppkey")).as("nd"))
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("nd") > 1, 1)).as("n_violations"))
      .select(lit("fd_orderkey_to_suppkey").as("constraint_name"),
        col("n_rows"), col("n_violations"))
    val nn = row("nn_orders_custkey", count(lit(1)),
      count(when(col("o_custkey").isNull, 1)), o)
    pkO.unionByName(pkL).unionByName(fkLO).unionByName(fkOC)
      .unionByName(fd).unionByName(nn)
      .orderBy("constraint_name")
  }

  /** Benford first-digit reference shares in ppm — log10(1+1/d)
    * quantized HALF_UP; the nine constants sum to exactly 10⁶ and are
    * LITERALS on both engines (an in-plan log10 would differ in the
    * last ulp between libm and the JVM).
    */
  val BenfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** Benford's-law first-digit audit of order totals — the classic
    * forensic/data-quality screen (synthetic or tampered monetary
    * data drifts from log10(1+1/d)): totals ride as exact cents
    * integers, the leading digit is a pure string-head on the
    * engine-identical decimal rendering of a BIGINT, observed shares
    * are HALF_UP ppm against the broadcast 1-row total, and the
    * reference shares are shared literals. One scan + a 9-row census;
    * delta_ppm is the per-digit deviation the auditor reads.
    */
  def benfordAudit(spark: SparkSession, dir: String): DataFrame = {
    val cents = Tables.orders(spark, dir)
      .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .filter(col("cents") > 0)
    val total = cents.agg(count(lit(1)).as("n_total"))
    val bf = BenfordPpm.foldLeft(lit(null).cast("long")) { case (acc, (d, p)) =>
      when(col("digit") === d, lit(p)).otherwise(acc)
    }
    cents
      .select(substring(col("cents").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("(2*n_orders*1000000 + n_total) div (2*n_total)"))
      .withColumn("benford_ppm", bf)
      .select(col("digit"), col("n_orders"), col("share_ppm"), col("benford_ppm"),
        (col("share_ppm") - col("benford_ppm")).as("delta_ppm"))
      .orderBy("digit")
  }

  /** χ² contingency audit of returnflag × linestatus — the
    * categorical-dependence profiling primitive (drift detection /
    * feature selection). Per-CELL contributions, not a single χ²
    * total: a cross-cell FP sum would accumulate in engine-specific
    * order, while per-cell terms are pure functions of exact integer
    * (observed, row-total, col-total, n) — num = o·n − rt·ct stays a
    * BIGINT (< 2⁵³, so exactly representable), then one identical
    * IEEE tree double(num)²/(n·rt·ct) on both engines, shipped as
    * ⌊·10⁶+0.5⌋ ppm; expected counts as ×100 HALF_UP integers
    * (rt·ct·100 < 2⁶³ up to ~3·10⁸ rows per margin; re-scale beyond).
    * The grid is |flags|×|statuses| — a broadcast-sized aggregate;
    * margins re-aggregate that tiny grid and attach by BROADCAST
    * joins (no windows at all), so the corpus is touched by exactly
    * one keyed count.
    */
  def crosstabChi2(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("o"))
    val rt = cells.groupBy("l_returnflag").agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy("l_linestatus").agg(sum(col("o")).as("ct"))
    val n = cells.agg(sum(col("o")).as("n"))
    val g = cells
      .join(broadcast(rt), Seq("l_returnflag"))
      .join(broadcast(ct), Seq("l_linestatus"))
      .crossJoin(broadcast(n))
    g.select(col("l_returnflag"), col("l_linestatus"), col("o").as("observed"),
        expr("(2*rt*ct*100 + n) div (2*n)").as("expected_x100"),
        floor(
          (col("o") * col("n") - col("rt") * col("ct")).cast("double") *
            (col("o") * col("n") - col("rt") * col("ct")).cast("double") /
            (col("n").cast("double") * col("rt").cast("double") *
              col("ct").cast("double")) * lit(1000000.0) + lit(0.5))
          .cast("long").as("chi2_contrib_ppm"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Per-customer reorder-cadence census — the CRM/replenishment
    * signal on the ORDERS table (the relational twin of
    * `ev_interarrival_census`, in whole days): gaps between a
    * customer's consecutive orders, banded {same week, ≤30 d, ≤90 d,
    * longer}, with contributing customers and the §4 HALF_UP mean.
    * One per-customer window (keyed, history-bounded) + a 4-row
    * band agg; days are pure integer epoch math.
    */
  def reorderGaps(spark: SparkSession, dir: String): DataFrame = {
    val byCust = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000").as("day"))
      .withColumn("gap_d", col("day") - lag(col("day"), 1).over(byCust))
      .filter(col("gap_d").isNotNull)
      .select(col("o_custkey"),
        when(col("gap_d") <= 7, "a_within_week")
          .when(col("gap_d") <= 30, "b_within_month")
          .when(col("gap_d") <= 90, "c_within_quarter")
          .otherwise("d_longer").as("band"),
        col("gap_d"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_gaps"),
        countDistinct(col("o_custkey")).as("n_customers"),
        sum(col("gap_d")).as("sum_days"),
        max(col("gap_d")).as("max_days"))
      .withColumn("mean_days", expr("(2*sum_days + n_gaps) div (2*n_gaps)"))
      .orderBy("band")
  }

  /** Join-key skew audit — the measurement that decides BEFORE a big
    * join whether it needs `rel_salted_skew_join`'s salting or AQE
    * skew splitting: per candidate join key of the fact table, the
    * per-key frequency profile reduced to the numbers a planner
    * reads — total rows, distinct keys, min/max per-key count, the
    * heaviest key's share (ppm), and skew = max/avg ×1000 (a skew of
    * 1000 is perfectly uniform; ≥ ~10⁴ means one task gets 10× the
    * mean partition and salting pays). Pure integers, §4 HALF_UP.
    * Shape: one scan per key column, map-side-combinable keyed agg,
    * then a 1-row reduce over the key-count domain — no windows, no
    * sort, nothing scales with skew itself.
    */
  def skewCensus(spark: SparkSession, dir: String): DataFrame = {
    def censusOf(keyCol: String): DataFrame =
      Tables.lineitem(spark, dir)
        .groupBy(col(keyCol).as("k"))
        .agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"),
          min(col("cnt")).as("min_cnt"), max(col("cnt")).as("max_cnt"))
        .select(lit(keyCol).as("key_col"), col("n_rows"), col("n_keys"),
          col("min_cnt"), col("max_cnt"),
          expr("(2*max_cnt*1000000 + n_rows) div (2*n_rows)")
            .as("top1_ppm"),
          expr("(2*max_cnt*n_keys*1000 + n_rows) div (2*n_rows)")
            .as("skew_x1000"))
    censusOf("l_suppkey").unionByName(censusOf("l_partkey"))
      .orderBy("key_col")
  }

  /** Join-size prediction WITHOUT executing the join — the planner
    * primitive behind join reordering and shuffle sizing: the exact
    * output cardinality of an equi-join is Σ_k cA(k)·cB(k), computed
    * from the two per-key count aggregates joined on the key domain —
    * each side reduces to its distinct-key grid first, so the cost is
    * two keyed aggs + a key-domain join, never the fact⋈fact output
    * itself (which is the thing being predicted). Reported next to
    * the textbook System-R independence estimate |A|·|B|/max(dA,dB)
    * and its signed error ×1000 (HALF_UP on the absolute value) — the
    * number that tells a planner how wrong uniform-key assumptions
    * are on THIS data before it picks a plan.
    */
  def joinSizeEstimate(spark: SparkSession, dir: String): DataFrame = {
    def estimateOf(name: String, left: DataFrame, lk: String,
        right: DataFrame, rk: String): DataFrame = {
      // NOTE (measured, r16): checkpointing ca/cb (each feeds the
      // exact-pairs join AND its own (n, d) rollup) was tried and
      // came out SLOWER at sf0.1 (1.0 → 1.4 s) — Spark's exchange
      // reuse already shares the keyed aggregate between the two
      // references, so the extra barriers bought nothing.
      val ca = left.groupBy(col(lk).as("k")).agg(count(lit(1)).as("ca"))
      val cb = right.groupBy(col(rk).as("k")).agg(count(lit(1)).as("cb"))
      ca.join(cb, Seq("k"))
        .agg(sum(col("ca") * col("cb")).as("exact_pairs"))
        .crossJoin(broadcast(
          ca.agg(sum(col("ca")).as("n_left"), count(lit(1)).as("d_left"))))
        .crossJoin(broadcast(
          cb.agg(sum(col("cb")).as("n_right"), count(lit(1)).as("d_right"))))
        .select(lit(name).as("join_key"),
          col("n_left"), col("n_right"), col("d_left"), col("d_right"),
          coalesce(col("exact_pairs"), lit(0L)).as("exact_pairs"),
          expr("""(2*n_left*n_right + greatest(d_left, d_right))
                 div (2*greatest(d_left, d_right))""").as("sysr_estimate"))
        .withColumn("err_x1000", expr(
          """CASE WHEN exact_pairs = 0 THEN NULL
             ELSE (2*abs(sysr_estimate - exact_pairs)*1000 + exact_pairs)
                  div (2*exact_pairs) END"""))
    }
    estimateOf("o_orderkey=l_orderkey",
      Tables.orders(spark, dir), "o_orderkey",
      Tables.lineitem(spark, dir), "l_orderkey")
      .unionByName(estimateOf("c_custkey=o_custkey",
        Tables.customer(spark, dir), "c_custkey",
        Tables.orders(spark, dir), "o_custkey"))
      .orderBy("join_key")
  }

  /** Exact-money aggregation — the discipline every revenue query
    * above APPROXIMATES with round(sum(double), 2): at 100 TB a sum
    * of billions of doubles is both lossy and ORDER-DEPENDENT (two
    * runs of the same query can differ in the last cents), which is
    * why financial rollups ride DECIMAL. Here price and discount are
    * cast to DECIMAL(18,2) once at the scan (HALF_UP from the stored
    * double — the identical rule both engines apply), every product
    * and sum after that is exact fixed-point whatever the partition
    * or combine order, and the result ships as scaled BIGINTs
    * (cents / hundredths-of-a-cent) so the oracle compare is integer
    * equality, no rounding crutch anywhere.
    */
  def decimalMoney(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        expr("CAST(l_extendedprice AS DECIMAL(18,2))").as("p2"),
        expr("CAST(l_discount AS DECIMAL(18,2))").as("d2"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        (sum(col("p2")) * 100).cast("long").as("base_cents"),
        (sum(col("p2") * (lit(1) - col("d2"))) * 10000).cast("long")
          .as("revenue_e4"))
      .orderBy("l_returnflag")

  /** SQL front door certification: everything else in the registry is
    * DataFrame DSL, but a user of this library also gets the textual
    * SQL surface — temp views + `spark.sql(...)` — and it must plan
    * through the same Catalyst pipeline (pushdown, broadcast, AQE)
    * as the DSL. This runs an order-priority revenue rollup as a SQL
    * STRING over registered views; the oracle is, for once, almost
    * the same text — which is exactly the point of the row: the SQL
    * dialect surface itself is what is being certified.
    */
  def sqlFrontend(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("g_orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("g_lineitem")
    spark.sql(
      """SELECT o.o_orderpriority AS priority, count(*) AS n_items,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        |  count(DISTINCT o.o_orderkey) AS n_orders
        |FROM g_orders o JOIN g_lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderstatus <> 'F'
        |GROUP BY o.o_orderpriority
        |ORDER BY priority""".stripMargin)
  }

  val queries: Map[String, GQuery] = Map(
    "rel_sql_frontend" -> GQuery.sql(sqlFrontend,
      """SELECT o.o_orderpriority AS priority, count(*) AS n_items,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        |  count(DISTINCT o.o_orderkey) AS n_orders
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderstatus <> 'F'
        |GROUP BY o.o_orderpriority
        |ORDER BY priority""".stripMargin),
    "rel_decimal_money" -> GQuery.sql(decimalMoney,
      """SELECT l_returnflag, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS base_cents,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT)
        |    AS revenue_e4
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    "rel_join_size_estimate" -> GQuery.sql(joinSizeEstimate,
      """WITH e1 AS (
        |  SELECT 'o_orderkey=l_orderkey' AS join_key, *
        |  FROM (
        |    WITH ca AS (SELECT o_orderkey AS k, count(*) AS ca
        |                FROM orders GROUP BY 1),
        |    cb AS (SELECT l_orderkey AS k, count(*) AS cb
        |           FROM lineitem GROUP BY 1),
        |    j AS (SELECT coalesce(CAST(sum(ca.ca * cb.cb) AS BIGINT), 0)
        |            AS exact_pairs
        |          FROM ca JOIN cb ON ca.k = cb.k),
        |    sa AS (SELECT CAST(sum(ca) AS BIGINT) AS n_left,
        |             count(*) AS d_left FROM ca),
        |    sb AS (SELECT CAST(sum(cb) AS BIGINT) AS n_right,
        |             count(*) AS d_right FROM cb)
        |    SELECT sa.n_left, sb.n_right, sa.d_left, sb.d_right,
        |      j.exact_pairs,
        |      (2*sa.n_left*sb.n_right + greatest(sa.d_left, sb.d_right))
        |        // (2*greatest(sa.d_left, sb.d_right)) AS sysr_estimate
        |    FROM j CROSS JOIN sa CROSS JOIN sb)),
        |e2 AS (
        |  SELECT 'c_custkey=o_custkey' AS join_key, *
        |  FROM (
        |    WITH ca AS (SELECT c_custkey AS k, count(*) AS ca
        |                FROM customer GROUP BY 1),
        |    cb AS (SELECT o_custkey AS k, count(*) AS cb
        |           FROM orders GROUP BY 1),
        |    j AS (SELECT coalesce(CAST(sum(ca.ca * cb.cb) AS BIGINT), 0)
        |            AS exact_pairs
        |          FROM ca JOIN cb ON ca.k = cb.k),
        |    sa AS (SELECT CAST(sum(ca) AS BIGINT) AS n_left,
        |             count(*) AS d_left FROM ca),
        |    sb AS (SELECT CAST(sum(cb) AS BIGINT) AS n_right,
        |             count(*) AS d_right FROM cb)
        |    SELECT sa.n_left, sb.n_right, sa.d_left, sb.d_right,
        |      j.exact_pairs,
        |      (2*sa.n_left*sb.n_right + greatest(sa.d_left, sb.d_right))
        |        // (2*greatest(sa.d_left, sb.d_right)) AS sysr_estimate
        |    FROM j CROSS JOIN sa CROSS JOIN sb)),
        |u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2)
        |SELECT join_key, n_left, n_right, d_left, d_right, exact_pairs,
        |  sysr_estimate,
        |  CASE WHEN exact_pairs = 0 THEN NULL
        |       ELSE (2*abs(sysr_estimate - exact_pairs)*1000 + exact_pairs)
        |            // (2*exact_pairs) END AS err_x1000
        |FROM u ORDER BY join_key""".stripMargin),
    "rel_skew_census" -> GQuery.sql(skewCensus,
      """WITH c1 AS (SELECT l_suppkey AS k, count(*) AS cnt
        |            FROM lineitem GROUP BY 1),
        |c2 AS (SELECT l_partkey AS k, count(*) AS cnt
        |       FROM lineitem GROUP BY 1),
        |a1 AS (SELECT 'l_suppkey' AS key_col,
        |         CAST(sum(cnt) AS BIGINT) AS n_rows, count(*) AS n_keys,
        |         min(cnt) AS min_cnt, max(cnt) AS max_cnt FROM c1),
        |a2 AS (SELECT 'l_partkey' AS key_col,
        |         CAST(sum(cnt) AS BIGINT) AS n_rows, count(*) AS n_keys,
        |         min(cnt) AS min_cnt, max(cnt) AS max_cnt FROM c2),
        |u AS (SELECT * FROM a1 UNION ALL SELECT * FROM a2)
        |SELECT key_col, n_rows, n_keys, min_cnt, max_cnt,
        |  (2*max_cnt*1000000 + n_rows) // (2*n_rows) AS top1_ppm,
        |  (2*max_cnt*n_keys*1000 + n_rows) // (2*n_rows) AS skew_x1000
        |FROM u ORDER BY key_col""".stripMargin),
    "rel_reorder_gaps" -> GQuery.sql(reorderGaps,
      """WITH g AS (
        |  SELECT o_custkey,
        |    epoch_ms(o_orderdate) // 86400000 -
        |      lag(epoch_ms(o_orderdate) // 86400000) OVER (
        |        PARTITION BY o_custkey
        |        ORDER BY epoch_ms(o_orderdate) // 86400000, o_orderkey)
        |      AS gap_d
        |  FROM orders),
        |b AS (
        |  SELECT o_custkey,
        |    CASE WHEN gap_d <= 7 THEN 'a_within_week'
        |         WHEN gap_d <= 30 THEN 'b_within_month'
        |         WHEN gap_d <= 90 THEN 'c_within_quarter'
        |         ELSE 'd_longer' END AS band,
        |    gap_d
        |  FROM g WHERE gap_d IS NOT NULL)
        |SELECT band, count(*) AS n_gaps,
        |  count(DISTINCT o_custkey) AS n_customers,
        |  CAST(sum(gap_d) AS BIGINT) AS sum_days,
        |  max(gap_d) AS max_days,
        |  (2*CAST(sum(gap_d) AS BIGINT) + count(*)) // (2*count(*)) AS mean_days
        |FROM b GROUP BY band ORDER BY band""".stripMargin),
    "rel_crosstab_chi2" -> GQuery.sql(crosstabChi2,
      """WITH cells AS (
        |  SELECT l_returnflag, l_linestatus, count(*) AS o
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus),
        |g AS (
        |  SELECT l_returnflag, l_linestatus, o,
        |    CAST(sum(o) OVER (PARTITION BY l_returnflag) AS BIGINT) AS rt,
        |    CAST(sum(o) OVER (PARTITION BY l_linestatus) AS BIGINT) AS ct,
        |    CAST(sum(o) OVER () AS BIGINT) AS n
        |  FROM cells)
        |SELECT l_returnflag, l_linestatus, o AS observed,
        |  (2*rt*ct*100 + n) // (2*n) AS expected_x100,
        |  CAST(floor(CAST(o*n - rt*ct AS DOUBLE) * CAST(o*n - rt*ct AS DOUBLE) /
        |    (CAST(n AS DOUBLE) * CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)) *
        |    1000000.0 + 0.5) AS BIGINT) AS chi2_contrib_ppm
        |FROM g ORDER BY l_returnflag, l_linestatus""".stripMargin),
    "rel_psi_drift" -> GQuery.sql(psiDrift,
      s"""WITH c AS (
        |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |    o_orderkey % 2 AS side
        |  FROM orders),
        |b AS (SELECT min(cents) AS lo, max(cents) AS hi FROM c),
        |g AS (
        |  SELECT ((cents - lo) * $HistBuckets) // (hi - lo + 1) AS bucket,
        |    count(*) FILTER (side = 0) AS n_base,
        |    count(*) FILTER (side = 1) AS n_cur
        |  FROM c, b GROUP BY 1),
        |t AS (
        |  SELECT CAST(sum(n_base) AS BIGINT) AS tb,
        |    CAST(sum(n_cur) AS BIGINT) AS tc
        |  FROM g),
        |s AS (
        |  SELECT bucket, n_base, n_cur,
        |    (2*(n_base + 1)*1000000 + (tb + $HistBuckets))
        |      // (2*(tb + $HistBuckets)) AS p_ppm,
        |    (2*(n_cur + 1)*1000000 + (tc + $HistBuckets))
        |      // (2*(tc + $HistBuckets)) AS q_ppm
        |  FROM g, t)
        |SELECT bucket, n_base, n_cur, p_ppm, q_ppm,
        |  round((CAST(p_ppm - q_ppm AS DOUBLE) / 1000000.0) *
        |    (ln(CAST(p_ppm AS DOUBLE)) - ln(CAST(q_ppm AS DOUBLE))), 6)
        |    AS psi_term
        |FROM s ORDER BY bucket""".stripMargin),
    "rel_constraint_audit" -> GQuery.sql(constraintAudit,
      """SELECT * FROM (
        |  SELECT 'pk_orders_orderkey' AS constraint_name,
        |    count(*) AS n_rows,
        |    count(*) - count(DISTINCT o_orderkey) AS n_violations
        |  FROM orders
        |  UNION ALL
        |  SELECT 'pk_lineitem_orderkey_linenumber', count(*),
        |    count(*) - count(DISTINCT (l_orderkey, l_linenumber))
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'fk_lineitem_orders',
        |    (SELECT count(*) FROM lineitem),
        |    count(*) FILTER (o_orderkey IS NULL)
        |  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
        |  UNION ALL
        |  SELECT 'fk_orders_customer',
        |    (SELECT count(*) FROM orders),
        |    count(*) FILTER (c_custkey IS NULL)
        |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |  UNION ALL
        |  SELECT 'fd_orderkey_to_suppkey', count(*),
        |    count(*) FILTER (nd > 1)
        |  FROM (SELECT l_orderkey, count(DISTINCT l_suppkey) AS nd
        |        FROM lineitem GROUP BY 1)
        |  UNION ALL
        |  SELECT 'nn_orders_custkey', count(*),
        |    count(*) FILTER (o_custkey IS NULL)
        |  FROM orders)
        |ORDER BY constraint_name""".stripMargin),
    "rel_benford_audit" -> GQuery.sql(benfordAudit,
      """WITH c AS (
        |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders
        |  WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) > 0),
        |t AS (SELECT count(*) AS n_total FROM c),
        |d AS (
        |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
        |    count(*) AS n_orders
        |  FROM c GROUP BY 1),
        |s AS (
        |  SELECT digit, n_orders,
        |    (2*n_orders*1000000 + n_total) // (2*n_total) AS share_ppm,
        |    CAST(CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
        |      WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181
        |      WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153
        |      WHEN 9 THEN 45757 END AS BIGINT) AS benford_ppm
        |  FROM d, t)
        |SELECT digit, n_orders, share_ppm, benford_ppm,
        |  share_ppm - benford_ppm AS delta_ppm
        |FROM s ORDER BY digit""".stripMargin),
    "rel_equidepth_histogram" -> GQuery.sql(equidepthHistogram,
      s"""WITH c AS (
        |  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
        |    l_orderkey AS ok, l_linenumber AS ln
        |  FROM lineitem),
        |t AS (
        |  SELECT cents,
        |    CAST(ntile($EquidepthTiles) OVER (ORDER BY cents, ok, ln) AS BIGINT) AS tile
        |  FROM c)
        |SELECT tile, count(*) AS n_rows,
        |  min(cents) AS min_cents, max(cents) AS max_cents,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM t GROUP BY tile ORDER BY tile""".stripMargin),
    "rel_equiwidth_histogram" -> GQuery.sql(equiwidthHistogram,
      s"""WITH c AS (
        |  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem),
        |b AS (SELECT min(cents) AS lo, max(cents) AS hi FROM c)
        |SELECT ((cents - lo) * $HistBuckets) // (hi - lo + 1) AS bucket,
        |  count(*) AS n_rows,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  min(cents) AS min_cents, max(cents) AS max_cents
        |FROM c CROSS JOIN b GROUP BY 1 ORDER BY bucket""".stripMargin),
    "rel_terasort" -> GQuery.sql(relTerasort,
      s"""SELECT rank, l_extendedprice, l_orderkey, l_linenumber FROM (
        |  SELECT l_extendedprice, l_orderkey, l_linenumber,
        |    row_number() OVER (ORDER BY l_extendedprice DESC,
        |      l_orderkey, l_linenumber) AS rank
        |  FROM lineitem)
        |WHERE rank % $TerasortStride = 1 ORDER BY rank""".stripMargin),
    "rel_merge_upsert" -> GQuery.sql(relMergeUpsert,
      """WITH base AS (SELECT c_custkey, c_nationkey, c_acctbal FROM customer),
        |changes AS (
        |  SELECT c_custkey AS k,
        |    CASE WHEN c_custkey % 7 = 0 THEN 'update' ELSE 'delete' END AS op,
        |    c_acctbal + 50.0 AS new_bal, c_nationkey AS new_nation
        |  FROM base WHERE c_custkey % 7 = 0 OR c_custkey % 11 = 0
        |  UNION ALL
        |  SELECT (SELECT max(c_custkey) FROM base) + c_custkey + 1 AS k, 'insert' AS op,
        |    100.0 AS new_bal, c_nationkey AS new_nation
        |  FROM base WHERE c_custkey % 13 = 0)
        |SELECT coalesce(b.c_custkey, c.k) AS custkey,
        |  coalesce(c.new_nation, b.c_nationkey) AS nationkey,
        |  CASE WHEN c.op IN ('update', 'insert') THEN c.new_bal
        |       ELSE b.c_acctbal END AS acctbal,
        |  coalesce(c.op, 'keep') AS op
        |FROM base b FULL OUTER JOIN changes c ON b.c_custkey = c.k
        |WHERE coalesce(c.op, 'keep') <> 'delete'
        |ORDER BY custkey""".stripMargin),
    "rel_distributed_rank" -> GQuery.sql(relDistributedRank,
      """WITH r AS (
        |  SELECT c_custkey, c_nationkey, c_acctbal,
        |    row_number() OVER w AS rnk,
        |    count(*) OVER (PARTITION BY c_nationkey) AS n,
        |    CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey))
        |SELECT c_custkey, c_nationkey, c_acctbal, rnk,
        |  CASE WHEN n > 1 THEN
        |    CAST((2*(rnk-1)*1000000 + (n-1)) // (2*(n-1)) AS DOUBLE) / 1000000.0
        |  ELSE 0.0 END AS pct_rank,
        |  CAST((2*rnk*1000000 + n) // (2*n) AS DOUBLE) / 1000000.0 AS cume,
        |  quartile
        |FROM r ORDER BY c_nationkey, rnk""".stripMargin),
    "rel_zorder_cluster" -> GQuery.sql(relZorderCluster, zorderOracle),
    "rel_skipping_stats" -> GQuery.sql(relSkippingStats, skippingOracle),
    "rel_table_diff" -> GQuery.sql(relTableDiff,
      """WITH b AS (
        |  SELECT o_orderkey AS bk,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS bprice
        |  FROM orders WHERE o_orderkey % 7 <> 1),
        |a AS (
        |  SELECT o_orderkey AS ak, o_totalprice AS aprice
        |  FROM orders WHERE o_orderkey % 7 <> 2),
        |d AS (
        |  SELECT CASE WHEN bk IS NULL THEN 'added'
        |              WHEN ak IS NULL THEN 'removed'
        |              WHEN aprice <> bprice THEN 'changed'
        |              ELSE 'unchanged' END AS diff_status,
        |    coalesce(CAST(round(aprice * 100) AS BIGINT), 0) -
        |    coalesce(CAST(round(bprice * 100) AS BIGINT), 0) AS delta_cents
        |  FROM b FULL OUTER JOIN a ON bk = ak)
        |SELECT diff_status, count(*) AS n_rows,
        |  CAST(sum(delta_cents) AS BIGINT) AS net_delta_cents
        |FROM d GROUP BY diff_status ORDER BY diff_status""".stripMargin),
    "rel_bloom_join" -> GQuery.sql(relBloomJoin,
      s"""SELECT s_suppkey, s_name, count(*) AS n_items,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_nationkey = $BloomJoinNation
        |GROUP BY s_suppkey, s_name ORDER BY s_suppkey""".stripMargin),
    "rel_salted_skew_join" -> GQuery.sql(relSaltedSkewJoin,
      """SELECT s_nationkey, round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin),
    "rel_grouping_sets" -> GQuery.sql(relGroupingSets,
      """SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
        |  coalesce(o_orderpriority, 'ALL') AS orderpriority,
        |  grouping(o_orderstatus) AS g_status,
        |  grouping(o_orderpriority) AS g_priority,
        |  round(sum(o_totalprice), 2) AS sum_price,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_priority, orderstatus, orderpriority""".stripMargin),
    "q2_min_cost_supplier" -> GQuery.sql(q2MinCostSupplier,
      """WITH costs AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(l_extendedprice / l_quantity) AS unit_cost
        |  FROM lineitem GROUP BY 1, 2),
        |regsup AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'),
        |eligible AS (
        |  SELECT * FROM costs JOIN regsup ON l_suppkey = s_suppkey),
        |mc AS (
        |  SELECT l_partkey AS mc_partkey, min(unit_cost) AS min_cost
        |  FROM eligible GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
        |  round(unit_cost, 4) AS unit_cost
        |FROM eligible
        |JOIN mc ON l_partkey = mc_partkey AND unit_cost = min_cost
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 10 AND p_type = 'PROMO'
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin),
    "q8_market_share" -> GQuery.sql(q8MarketShare,
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  round(sum(CASE WHEN n_name = 'NATION_3'
        |                 THEN l_extendedprice * (1 - l_discount) ELSE 0 END) /
        |        sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_type = 'STANDARD' AND r_name = 'EUROPE'
        |GROUP BY 1 ORDER BY 1""".stripMargin),
    "q9_profit_by_nation_year" -> GQuery.sql(q9ProfitByNationYear,
      """SELECT n_name, year(o_orderdate) AS o_year,
        |  round(CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT))
        |        AS DOUBLE) / 10000.0, 2) AS profit
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY n_name, o_year DESC""".stripMargin),
    "q11_revenue_share" -> GQuery.sql(q11RevenueShare,
      """SELECT l_partkey, round(part_rev, 2) AS part_rev FROM (
        |  SELECT l_partkey, sum(l_extendedprice*(1-l_discount)) AS part_rev
        |  FROM lineitem GROUP BY 1)
        |WHERE part_rev > (SELECT sum(l_extendedprice*(1-l_discount)) * 0.0008
        |                  FROM lineitem)
        |ORDER BY part_rev DESC, l_partkey""".stripMargin),
    "q15_top_supplier" -> GQuery.sql(q15TopSupplier,
      """WITH rev AS (
        |  SELECT l_suppkey, round(sum(l_extendedprice*(1-l_discount)), 2) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-07-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_rev
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin),
    "q21_sole_supplier_orders" -> GQuery.sql(q21SoleSupplierOrders,
      """WITH sole AS (
        |  SELECT l_orderkey, min(l_suppkey) AS s_suppkey
        |  FROM lineitem GROUP BY 1
        |  HAVING count(DISTINCT l_suppkey) = 1)
        |SELECT s.s_suppkey, s.s_name, count(*) AS sole_orders
        |FROM sole JOIN supplier s ON sole.s_suppkey = s.s_suppkey
        |GROUP BY 1, 2 ORDER BY sole_orders DESC, s.s_suppkey""".stripMargin),
    "q22_dormant_customers" -> GQuery.sql(q22DormantCustomers,
      """SELECT c_nationkey, count(*) AS n_custs,
        |  round(sum(c_acctbal), 2) AS total_bal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |GROUP BY 1 ORDER BY c_nationkey""".stripMargin),
    "rel_pivot" -> GQuery.sql(relPivot,
      """SELECT o_orderpriority,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS total_f,
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS total_o,
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS total_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    "rel_unpivot" -> GQuery.sql(relUnpivot,
      """WITH m AS (
        |  SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
        |SELECT l_returnflag, metric, count(*) AS n_rows,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM m GROUP BY l_returnflag, metric
        |ORDER BY l_returnflag, metric""".stripMargin),
    "rel_cube" -> GQuery.sql(relCube,
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  grouping(l_returnflag) AS g_flag,
        |  grouping(l_linestatus) AS g_status,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, returnflag, linestatus""".stripMargin),
    "q1_pricing_summary" -> GQuery.sql(q1PricingSummary,
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice*(1-l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    "q3_shipping_priority" -> GQuery.sql(q3ShippingPriority,
      """SELECT l_orderkey, epoch_ms(o_orderdate) AS o_orderdate_ms, o_orderpriority,
        |  round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-30'
        |  AND l_shipdate > TIMESTAMP '1998-06-30'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin),
    "q4_semijoin" -> GQuery.sql(q4Semijoin,
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    "q5_multijoin" -> GQuery.sql(q5Multijoin,
      """SELECT n_name,
        |  round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),
    "q6_filter_agg" -> GQuery.sql(q6FilterAgg,
      """SELECT round(sum(l_extendedprice*l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin),
    "q7_antijoin" -> GQuery.sql(q7Antijoin,
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  round(sum(c_acctbal), 2) AS acctbal_sum
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
    "q10_returned_items" -> GQuery.sql(q10ReturnedItems,
      """SELECT c_custkey, c_name, n_name,
        |  round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
    "q12_conditional_agg" -> GQuery.sql(q12ConditionalAgg,
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin),
    "q13_outer_join_histogram" -> GQuery.sql(q13OrderHistogram,
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderstatus <> 'P'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin),
    "q14_promo_share" -> GQuery.sql(q14PromoShare,
      """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice*(1-l_discount) ELSE 0 END) /
        |  sum(l_extendedprice*(1-l_discount)), 4) AS promo_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-07-01'""".stripMargin),
    "q16_having" -> GQuery.sql(q16Having,
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size <= 20
        |GROUP BY p_brand, p_type, p_size
        |HAVING count(DISTINCT l_suppkey) >= 5
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),
    "q17_correlated_subquery" -> GQuery.sql(q17CorrelatedSubquery,
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#11'
        |  AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin),
    "q18_groupby_backjoin" -> GQuery.sql(q18LargeOrders,
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice,
        |  round(total_qty, 2) AS total_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING sum(l_quantity) > 200) big ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin),
    "q19_disjunctive_join" -> GQuery.sql(q19DisjunctiveJoin,
      """SELECT round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)""".stripMargin),
    "q20_in_subquery" -> GQuery.sql(q20InSubquery,
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_type = 'PROMO'
        |  GROUP BY l_suppkey HAVING sum(l_quantity) > 300)
        |ORDER BY s_suppkey""".stripMargin),
    "rel_distinct" -> GQuery.sql(relDistinct,
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin),
    "rel_setops" -> GQuery.sql(relSetops,
      """SELECT c_custkey FROM (
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |   UNION
        |   SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
        |  INTERSECT
        |  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
        |  EXCEPT
        |  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin),
    "rel_rollup" -> GQuery.sql(relRollup,
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  grouping(l_returnflag) AS g_flag,
        |  grouping(l_linestatus) AS g_status,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, returnflag, linestatus""".stripMargin),
    "rel_topk_per_group" -> GQuery.sql(relTopkPerGroup,
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin),
    "rel_window_running" -> GQuery.sql(relWindowRunning,
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber, running_qty FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |    round(sum(l_quantity) OVER (PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem WHERE l_suppkey <= 10)
        |ORDER BY l_suppkey, rn""".stripMargin),
    "rel_approx_distinct" -> GQuery.sql(relApproxDistinct,
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS n_exact_customers,
        |  CAST(1 AS BIGINT) AS within_6sigma
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin),
    "rel_distinct_sketch_error" -> GQuery.sql(distinctSketchError,
      s"""WITH d AS (SELECT DISTINCT o_orderstatus AS status, o_custkey FROM orders),
        |h AS (SELECT DISTINCT status,
        |        ($KmvA * o_custkey + $KmvB) % $KmvP AS h FROM d),
        |ranked AS (SELECT status, h,
        |        row_number() OVER (PARTITION BY status ORDER BY h) AS rn FROM h),
        |kth AS (SELECT status, h AS kth FROM ranked WHERE rn = $KmvK),
        |nh AS (SELECT status, count(*) AS n_hashes FROM h GROUP BY status),
        |ex AS (SELECT status, count(*) AS n_exact FROM d GROUP BY status),
        |est AS (
        |  SELECT ex.status, ex.n_exact,
        |    CAST(CASE WHEN nh.n_hashes < $KmvK THEN nh.n_hashes
        |      ELSE ${(KmvK - 1) * KmvP} // k.kth END AS BIGINT) AS est_distinct
        |  FROM ex JOIN nh USING (status) LEFT JOIN kth k USING (status))
        |SELECT status, n_exact, est_distinct,
        |  CAST(abs(est_distinct - n_exact) * 1000000 // n_exact AS BIGINT)
        |    AS err_ppm
        |FROM est ORDER BY status""".stripMargin),
    "rel_approx_percentiles" -> GQuery.sql(relApproxPercentiles, {
      val acc = ApproxPctAccuracy
      s"""SELECT o_orderpriority, count(*) AS n_rows,
        |  (count(*) * ($acc - 2)) // (2 * $acc) AS r50_lo,
        |  (count(*) * ($acc + 2) + 2 * $acc - 1) // (2 * $acc) AS r50_hi,
        |  CAST(1 AS BIGINT) AS p50_bracketed,
        |  (count(*) * (19 * $acc - 20)) // (20 * $acc) AS r95_lo,
        |  (count(*) * (19 * $acc + 20) + 20 * $acc - 1) // (20 * $acc) AS r95_hi,
        |  CAST(1 AS BIGINT) AS p95_bracketed
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
    }),
    "rel_percentile_sketch_error" -> GQuery.sql(percentileSketchError,
      s"""WITH cents AS (
        |  SELECT o_orderpriority AS pri,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |bounds AS (
        |  SELECT pri, min(cents) AS lo, max(cents) AS hi, count(*) AS n,
        |    (max(cents) - min(cents)) // $PctSketchBuckets + 1 AS w
        |  FROM cents GROUP BY pri),
        |bc AS (
        |  SELECT c.pri, (c.cents - b.lo) // b.w AS b, count(*) AS c
        |  FROM cents c JOIN bounds b USING (pri) GROUP BY 1, 2),
        |cum AS (
        |  SELECT pri, b, sum(c) OVER (PARTITION BY pri ORDER BY b) AS cum
        |  FROM bc),
        |r AS (SELECT pri, (n + 1) // 2 AS r50, (95 * n + 99) // 100 AS r95
        |      FROM bounds),
        |e50 AS (SELECT cum.pri, min(b) AS b50 FROM cum JOIN r USING (pri)
        |        WHERE cum >= r50 GROUP BY 1),
        |e95 AS (SELECT cum.pri, min(b) AS b95 FROM cum JOIN r USING (pri)
        |        WHERE cum >= r95 GROUP BY 1),
        |ex AS (SELECT pri,
        |         round(quantile_cont(cents, 0.5) / 100.0, 2) AS p50_exact,
        |         round(quantile_cont(cents, 0.95) / 100.0, 2) AS p95_exact
        |       FROM cents GROUP BY 1)
        |SELECT b.pri AS o_orderpriority, b.n AS n_rows, ex.p50_exact,
        |  CAST(b.lo + e50.b50 * b.w AS BIGINT) AS p50_est_x100,
        |  round((b.lo + e50.b50 * b.w) / 100.0 - ex.p50_exact, 2) AS p50_err,
        |  ex.p95_exact,
        |  CAST(b.lo + e95.b95 * b.w AS BIGINT) AS p95_est_x100,
        |  round((b.lo + e95.b95 * b.w) / 100.0 - ex.p95_exact, 2) AS p95_err
        |FROM bounds b JOIN e50 USING (pri) JOIN e95 USING (pri)
        |  JOIN ex USING (pri)
        |ORDER BY o_orderpriority""".stripMargin),
    "rel_percentiles" -> GQuery.sql(relPercentiles,
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |  round(quantile_cont(o_totalprice, 0.95), 2) AS p95,
        |  round(min(o_totalprice), 2) AS min_price,
        |  round(max(o_totalprice), 2) AS max_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
  )
}
