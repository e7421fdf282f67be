package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time analytics over the `events` table (SURVEY.md §2.C).
  * Batch forms here; the same computations run incrementally in
  * `graft.streaming.EventsStreaming` (readStream + watermark).
  *
  * Timestamp parity note: the source parquet stores nanosecond
  * timestamps. Spark truncates to microseconds on read; DuckDB keeps
  * nanoseconds. Any RAW timestamp that reaches an output or a
  * comparison therefore goes through epoch-milliseconds
  * (`unix_millis` / `epoch_ms`) — both engines floor to the same
  * integer. `date_trunc` to hour/day is exact at either precision.
  */
object Events {

  /** Tumbling-window rollup: hour × event_type. */
  def hourlyRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("value_sum"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("hour_ms", "event_type")

  /** Incremental aggregate maintenance (the materialized-view /
    * Delta-table pattern): yesterday's rollup STATE plus today's
    * DELTA merge into the refreshed rollup by re-aggregating the
    * PARTIALS — history is never rescanned, which is the only viable
    * refresh at 100 TB (the delta is days, the state is years). The
    * split is deterministic (event_id % 10 = 0 is "today"); every
    * published stat is algebraic-mergeable (counts and sums add,
    * min/max combine, avg derives from merged sums AT THE END — never
    * merge averages). The oracle is the ONE-SHOT rollup over all
    * events: hash equality proves the merge decomposition exact.
    * The value column is exact 2-decimal money, so sums ride as CENTS
    * INTEGERS (order-free at every SF) and the average derives by the
    * integer HALF_UP formula (2p+q) div 2q — a round(sum/count, 4)
    * of doubles sits EXACTLY on half boundaries whenever the count is
    * 2^a·5^b (1512.12/32 = 47.25375), where Spark's shortest-decimal
    * rounding and DuckDB's binary-value rounding disagree (§4).
    * Headroom: cents sums overflow 2⁶³ past ~10¹⁴ rows of 10⁵ value;
    * move the accumulator to DECIMAL(38,2) beyond.
    */
  def incrementalRollup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"),
        col("value"), (col("event_id") % 10 === 0).as("is_delta"))
    def partial(df: DataFrame) = df.groupBy("event_type", "hour_ms")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("svc"),
        min(col("value")).as("mn"), max(col("value")).as("mx"))
    partial(ev.filter(!col("is_delta")))
      .union(partial(ev.filter(col("is_delta"))))
      .groupBy("event_type", "hour_ms")
      .agg(sum(col("n")).as("n_events"), sum(col("svc")).as("svc"),
        min(col("mn")).as("value_min"), max(col("mx")).as("value_max"))
      .select(col("event_type"), col("hour_ms"), col("n_events"),
        round(col("svc").cast("double") / 100.0, 2).as("value_sum"),
        (expr("(2*svc*100 + n_events) div (2*n_events)")
          .cast("double") / 10000.0).as("value_avg"),
        col("value_min"), col("value_max"))
      .orderBy("event_type", "hour_ms")
  }

  /** Per-user activity profile. */
  def userActivity(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        round(sum(col("value")), 2).as("value_sum"),
        min(unix_millis(col("ts"))).as("first_ms"),
        max(unix_millis(col("ts"))).as("last_ms"))
      .orderBy("user_id")

  val SessionGapMs: Long = 30L * 60 * 1000

  /** Gap-based sessionization (30-min inactivity splits), the classic
    * lag → flag → cumulative-sum session assignment. At scale this is
    * one shuffle on user_id; the window sort is per-user — which is
    * the documented hot-ENTITY residual (§5.2): a single-entity
    * firehose serializes that user's whole history through one task.
    * Setting the conf `graft.session.skewsafe=true` (the Approx.scala
    * knob precedent) switches to the aggregate-before-window
    * decomposition below, PROVABLY identical output; the default path
    * is untouched.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    if (spark.conf.getOption("graft.session.skewsafe").contains("true"))
      sessionizeSkewSafe(spark, dir)
    else {
      val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), col("value"),
          unix_millis(col("ts")).as("ms"))
        .withColumn("prev_ms", lag(col("ms"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ms").isNull || col("ms") - col("prev_ms") > SessionGapMs, 1)
            .otherwise(0))
        .withColumn("session_seq", sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_seq")
        .agg(min(col("ms")).as("session_start_ms"),
          max(col("ms")).as("session_end_ms"),
          count(lit(1)).as("n_events"),
          // HALF_UP integer cents (the stream_upsert_sink_census money
          // discipline, ADVICE r11 #2): each event's value rounds to
          // cents ONCE, then sums are exact integers — so the default
          // path, the skew-safe bucket decomposition, and the DuckDB
          // oracle agree bit-for-bit under ANY addition order, not
          // just away from half-cent boundaries.
          sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_cents"))
        .orderBy("user_id", "session_seq")
    }

  /** Skew-safe sessionization (VERDICT r10 #2) — the hot-entity
    * residual closed as a code path: AGGREGATE BEFORE WINDOW (the
    * `ev_burst_windows` / `ev_peak_concurrency` shape). Events first
    * reduce to (user, gap-width time bucket) partials — a keyed
    * aggregate whose map-side combine absorbs ANY single-entity
    * firehose before the exchange — and the per-user window then runs
    * over BUCKET rows, bounded by the time horizon / gap (a user
    * emitting 10⁹ events in a day still yields ≤ 48 bucket rows at
    * the 30-min gap), never by event count.
    *
    * Output is PROVABLY identical to the event-level path, not
    * approximately: with bucket width exactly the gap G,
    *   (1) two events in one bucket differ by < G, so no break can
    *       occur inside a bucket;
    *   (2) for consecutive events straddling nonempty buckets b1 < b2
    *       the earlier one IS b1's max and the later IS b2's min (no
    *       event lies between them), so the event-level gap equals
    *       mn(b2) − mx(b1) — exactly what the bucket-level lag
    *       compares (empty buckets in between only widen it past G).
    * Session numbering, min/max, counts AND the money field then agree
    * bucket-wise: value rides as per-event HALF_UP integer cents
    * (rounded ONCE, before any partial), so the per-bucket partial sums
    * re-associate to the identical integer total — the equality is
    * exact arithmetic on every column, not an FP coincidence
    * (ADVICE r11 #2; Round11SkewSpec pins byte equality on a
    * boundary-planted corpus and the test SF).
    */
  def sessionizeSkewSafe(spark: SparkSession, dir: String): DataFrame = {
    val byUserBucket = Window.partitionBy("user_id").orderBy("bucket")
    Tables.events(spark, dir)
      .select(col("user_id"), col("value"), unix_millis(col("ts")).as("ms"))
      .withColumn("bucket", expr(s"ms div $SessionGapMs"))
      .groupBy("user_id", "bucket")
      .agg(count(lit(1)).as("n"), min(col("ms")).as("mn"),
        max(col("ms")).as("mx"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("vs"))
      .withColumn("prev_mx", lag(col("mx"), 1).over(byUserBucket))
      .withColumn("new_session",
        when(col("prev_mx").isNull || col("mn") - col("prev_mx") > SessionGapMs, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUserBucket.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(min(col("mn")).as("session_start_ms"),
        max(col("mx")).as("session_end_ms"),
        sum(col("n")).as("n_events"),
        sum(col("vs")).as("value_cents"))
      .orderBy("user_id", "session_seq")
  }

  /** Semi-structured JSON prop extraction + aggregation. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("k_sum"),
        max(col("k")).as("k_max"))
      .orderBy("event_type")

  /** As-of join — the canonical "operator Spark lacks natively":
    * each purchase matched to the user's most recent signup at or
    * before it. Composed from built-ins (preference (a) in the
    * custom-operator ladder): tag both streams, union, and carry the
    * last signup forward with a running last_value window — one
    * shuffle on user_id, no range explosion. The DuckDB oracle is its
    * native ASOF JOIN. Microsecond epochs floor identically from the
    * ns source on both engines.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    // order signups before purchases at equal timestamps so ts >= matches
    val w = Window.partitionBy("user_id").orderBy("us", "kind")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), lit(1).as("kind"),
        col("event_id"))
      .unionByName(ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("us"), lit(0).as("kind"),
          col("event_id")))
      .withColumn("last_signup_id",
        last(when(col("kind") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("last_signup_us",
        last(when(col("kind") === 0, col("us")), ignoreNulls = true).over(w))
    joined.filter(col("kind") === 1 && col("last_signup_id").isNotNull)
      .select(col("event_id"), col("user_id"),
        col("us").as("purchase_us"),
        col("last_signup_id").as("signup_event_id"),
        col("last_signup_us").as("signup_us"))
      .orderBy("event_id")
  }

  /** The same purchases-to-latest-signup attribution as `asofJoin`,
    * through the NATIVE as-of join operator
    * (`org.apache.spark.sql.graftshim.AsOfJoinExec` — custom
    * LogicalPlan + SparkStrategy + SparkPlan): hash-cluster each side
    * on user_id, sort by (user_id, time) within partitions, one-pass
    * streaming merge. No union of the two streams and no window —
    * the composed form's per-partition window sort over purchases ∪
    * signups is replaced by two smaller sorts and a merge, the same
    * plan shape Spark gives SortMergeJoin. Hash-checked against
    * DuckDB's built-in ASOF JOIN (same oracle as `ev_asof_join`).
    */
  def asofJoinNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us").as("purchase_us"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_event_id"),
        col("user_id").as("s_user_id"), col("us").as("signup_us"))
    org.apache.spark.sql.graftshim.AsOfJoinShim.asof(
        purchases, signups,
        purchases("user_id"), signups("s_user_id"),
        purchases("purchase_us"), signups("signup_us"))
      .select("event_id", "user_id", "purchase_us",
        "signup_event_id", "signup_us")
      .orderBy("event_id")
  }

  /** Hour-over-hour cohort retention: users active in hour h who are
    * also active in h+1.
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val active = Tables.events(spark, dir)
      .select(col("user_id"),
        unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"))
      .distinct()
    active.as("a")
      .join(active.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.hour_ms") === col("a.hour_ms") + 3600000L)
      .groupBy(col("a.hour_ms").as("hour_ms"))
      .agg(countDistinct(col("a.user_id")).as("retained_users"))
      .orderBy("hour_ms")
  }

  /** Ordered funnel: per user, the first 'view', the first 'click'
    * strictly after it, and the first 'purchase' strictly after that —
    * the classic product-analytics sequence query. Each stage is a
    * keyed min-aggregation joined to the previous stage on user_id,
    * so all three stages shuffle on the SAME key (co-partitioned
    * joins, successively smaller frames) and nothing sorts events
    * per user.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ms")).as("t_view"))
    val s2 = ev.filter(col("event_type") === "click").join(s1, "user_id")
      .filter(col("ms") > col("t_view"))
      .groupBy("user_id").agg(min(col("ms")).as("t_click"))
    val s3 = ev.filter(col("event_type") === "purchase").join(s2, "user_id")
      .filter(col("ms") > col("t_click"))
      .groupBy("user_id").agg(min(col("ms")).as("t_purchase"))
    s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
      .select("user_id", "t_view", "t_click", "t_purchase")
      .orderBy("user_id")
  }

  val AttribWindowMs = 3600000L // 1 h attribution lookback

  /** Range (interval) join — click-to-purchase attribution: for each
    * purchase, the count and latest timestamp of the same user's
    * clicks in the preceding hour. A naive inequality join is a
    * per-user cross product; the scale form is the classic BUCKETED
    * range join: quantize time into lookback-sized buckets, replicate
    * each click into its own bucket and the next (a click can only
    * serve purchases in those two), and equi-join on
    * (user_id, bucket) with the exact range as a residual predicate —
    * a plain shuffle join whose per-task width is bounded by bucket
    * population, never by user history length. The DuckDB oracle runs
    * the naive inequality join; hash-equality proves the bucketing
    * rewrite is semantically invisible.
    */
  def rangeJoinAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ms").as("p_ms"))
      .withColumn("bkt", expr(s"p_ms div $AttribWindowMs"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ms").as("c_ms"))
      .withColumn("bkt", explode(array(
        expr(s"c_ms div $AttribWindowMs"),
        expr(s"c_ms div $AttribWindowMs + 1L"))))
    purchases.as("p").join(clicks.as("c"),
        col("p.user_id") === col("c.user_id") && col("p.bkt") === col("c.bkt") &&
          col("c.c_ms") >= col("p.p_ms") - AttribWindowMs &&
          col("c.c_ms") < col("p.p_ms"),
        "left")
      .groupBy(col("p.event_id").as("event_id"), col("p.user_id").as("user_id"),
        col("p.p_ms").as("p_ms"))
      .agg(count(col("c.c_ms")).as("n_clicks_1h"),
        max(col("c.c_ms")).as("last_click_ms"))
      .orderBy("event_id")
  }

  /** Per-user hourly-volume anomaly detection: flag hours whose event
    * count exceeds that user's mean + 3σ across their active hours —
    * the z-score outlier pass of a monitoring pipeline. Two keyed
    * aggregations plus an equi-join back on user_id (broadcastable at
    * any scale: one row per user). The threshold is rounded to 6 on
    * both engines BEFORE the comparison, so an ulp of
    * variance-accumulation difference can't flip a row across the
    * cut; users with a single active hour have NULL stddev and
    * surface nothing on either engine.
    */
  def anomaly(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
      .groupBy("user_id", "hr").agg(count(lit(1)).as("cnt"))
    val stats = hourly.groupBy("user_id")
      .agg(round(avg(col("cnt")) + lit(3.0) * stddev_samp(col("cnt")), 6).as("thr"))
    hourly.join(stats, Seq("user_id"))
      .filter(col("cnt").cast("double") > col("thr"))
      .select(col("user_id"), unix_millis(col("hr")).as("hour_ms"),
        col("cnt"), col("thr"))
      .orderBy("user_id", "hour_ms")
  }

  val PathTopK = 50

  /** Session path mining: the most frequent event-type journeys.
    * Sessions are assigned exactly as `sessionize` (lag → flag →
    * cumulative sum, one shuffle on user_id); each session's path is
    * then folded with collect_list + array_sort — the per-session
    * buffer is bounded by the 30-minute inactivity gap, never by the
    * corpus, so unlike an inverted-index collect this cannot OOM a
    * hot key. The path histogram is one more map-side-combinable
    * aggregate; top-k via TakeOrdered (no global sort materialized).
    */
  def sessionPaths(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
    val sessions = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
      .withColumn("prev_ms", lag(col("ms"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > 30L * 60 * 1000, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessions.groupBy("user_id", "session_seq")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("ms"), col("event_id"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(desc("n_sessions"), asc("path"))
      .limit(PathTopK)
  }

  /** Per-user activity-gap profile over distinct active hours: how
    * continuous is each user's hourly presence? One distinct + one
    * per-user window over the user's OWN active hours (bounded by the
    * time span, not the event volume) + one keyed aggregate. All gap
    * arithmetic stays in exact integer-valued doubles (epoch ms are
    * multiples of 3600000), so both engines compute identical values.
    */
  def gapStats(spark: SparkSession, dir: String): DataFrame = {
    val hours = Tables.events(spark, dir)
      .select(col("user_id"),
        unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"))
      .distinct()
    val byUser = Window.partitionBy("user_id").orderBy("hour_ms")
    hours
      .withColumn("gap_h",
        ((col("hour_ms") - lag(col("hour_ms"), 1).over(byUser)) / 3600000L).cast("long"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_active_hours"),
        (((max(col("hour_ms")) - min(col("hour_ms"))) / 3600000L).cast("long") + 1)
          .as("span_hours"),
        count(when(col("gap_h") > 1, 1)).as("n_gaps"),
        coalesce(max(col("gap_h") - 1), lit(0L)).as("max_skip_hours"))
      .withColumn("missing_hours", col("span_hours") - col("n_active_hours"))
      .select("user_id", "n_active_hours", "span_hours", "missing_hours",
        "n_gaps", "max_skip_hours")
      .orderBy("user_id")
  }

  /** Sessionization through Spark's NATIVE `session_window` aggregate
    * — the built-in operator the manual lag→flag→cumsum pipeline
    * (`sessionize`) hand-rolls. One gap-merging aggregation, no
    * window-function pass at all; at scale this is a single shuffle
    * on user_id with Spark's session-merge exec doing the per-key
    * work (and it is the exact construct the STREAMING sessionizer
    * generalizes). The oracle is the manual lag-cumsum CTE — two
    * genuinely different constructions, so hash equality proves the
    * built-in's gap semantics equal the textbook definition.
    * Same 30-minute gap; sessions keyed by their start instead of a
    * per-user sequence (the numbering is the only thing the native
    * form doesn't define).
    */
  def sessionWindowNative(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("value_sum"),
        min(unix_millis(col("ts"))).as("session_start_ms"),
        max(unix_millis(col("ts"))).as("session_end_ms"))
      .select("user_id", "session_start_ms", "session_end_ms",
        "n_events", "value_sum")
      .orderBy("user_id", "session_start_ms")

  val ResampleUsers = 5

  /** Time-series resampling to a dense hourly grid with forward fill
    * — the gap-repair step before any ML over regular series. Each
    * tracked user's grid is `sequence(first_hour, last_hour)` exploded
    * (bounded by the user's SPAN, not event volume), left-joined to
    * the hourly aggregate, and missing hours carry the last observed
    * value forward via a running last-ignoring-nulls window (the
    * `ev_asof_join` primitive). Per-user windows over span-bounded
    * grids — no corpus-sized sort anywhere. Restricted to
    * ResampleUsers users to keep the verified output small; the plan
    * is user-count-independent.
    */
  def resampleFfill(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .filter(col("user_id") < ResampleUsers)
      .groupBy(col("user_id"),
        unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("vs"))
    val grid = hourly.groupBy("user_id")
      .agg(min(col("hour_ms")).as("lo"), max(col("hour_ms")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), lit(3600000L))).as("hour_ms"))
    val fill = Window.partitionBy("user_id").orderBy("hour_ms")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hour_ms"), "left")
      .withColumn("n_events", coalesce(col("n"), lit(0L)))
      .withColumn("filled_value", last(col("vs"), ignoreNulls = true).over(fill))
      .select("user_id", "hour_ms", "n_events", "filled_value")
      .orderBy("user_id", "hour_ms")
  }

  /** Trailing event-time RANGE window — the feature-engineering
    * staple (each event's trailing-1h activity count and spend):
    * `Window.rangeBetween(-1h, 0)` over (user, event-time). RANGE
    * (not ROWS) is the deterministic choice: all ms-tied peers are
    * in-frame on both engines regardless of their physical order, so
    * no tiebreak can flip a frame. The windowed SUM rides as CENTS
    * INTEGERS — window aggregates accumulate in engine-specific order
    * (DuckDB segment-trees vs Spark's running frame), so an FP sum
    * could drift a ulp and a 2-decimal round sits exactly on the
    * boundary; the integer sum is order-free (§4). Per-user windows
    * bounded by per-entity history, the sessionize scale argument.
    */
  def trailingWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ms")
      .rangeBetween(-3600000L, 0L)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ms"),
        round(col("value") * 100).cast("long").as("vc"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h", sum(col("vc")).over(w).cast("double") / 100.0)
      .select("user_id", "event_id", "ms", "n_1h", "sum_1h")
      .orderBy("user_id", "ms", "event_id")
  }

  /** Lags included in the truncated exponential decay (weight 2⁻ᵏ for
    * the event k steps back; 16 lags ⇒ truncation error < 2⁻¹⁶ of an
    * untruncated EWMA).
    */
  val EwmaLags = 16

  /** Per-event exponentially decayed activity score (recency-weighted
    * spend over the user's last EwmaLags events) — the
    * feature-engineering staple next to `ev_trailing_window`'s flat
    * frame. Decay is ROW-lag 2⁻ᵏ with the sum carried as cents·2¹⁵
    * INTEGERS (dyadic weights are exact powers of two, so the scaled
    * sum is a plain BIGINT — order-free, no FP accumulation anywhere;
    * the final ÷2¹⁵ is exact in double). The plan is the scale shape,
    * NOT the per-user quadratic self-join: each event explodes into
    * EwmaLags forward (user, rn+k) contributions — a 16× narrow
    * fanout — then ONE map-side-combinable keyed agg and ONE equi-join
    * back on (user, rn). Both sides stay partitioned by user; no
    * range-join residual, no window beyond the per-user row_number.
    */
  def ewma(spark: SparkSession, dir: String): DataFrame = {
    val wrn = Window.partitionBy("user_id").orderBy("ms", "event_id")
    val c = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ms"),
        round(col("value") * 100).cast("long").as("vc"))
      .withColumn("rn", row_number().over(wrn))
    val contribs = c
      .select(col("user_id"), col("rn"), col("vc"),
        explode(sequence(lit(0), lit(EwmaLags - 1))).as("k"))
      .select(col("user_id"), (col("rn") + col("k")).as("rnt"),
        // shiftleft with a non-literal shift needs the expr form (the
        // Scala shim pins numBits to Int); left-shifting vc itself is
        // exact ×2^(lags-1-k) with no overflow (|vc|·2¹⁵ ≪ 2⁶³)
        expr(s"shiftleft(vc, ${EwmaLags - 1} - k)").as("w"))
      .groupBy("user_id", "rnt").agg(sum(col("w")).as("sw"))
    c.as("e").join(contribs.as("s"),
        col("e.user_id") === col("s.user_id") && col("e.rn") === col("s.rnt"))
      .select(col("e.user_id").as("user_id"), col("e.event_id").as("event_id"),
        col("e.ms").as("ms"),
        (col("s.sw").cast("double") / (1L << (EwmaLags - 1)).toDouble).as("ewma16"))
      .orderBy("user_id", "ms", "event_id")
  }

  /** CDC changelog → SCD2 validity intervals (the "apply changes"
    * maintenance pass every lakehouse table runs): each event is an
    * UPSERT of its user's tracked attribute (`value`); 'error' events
    * are DELETE tombstones. An interval [valid_from, valid_to) opens
    * at every upsert and closes at the key's NEXT operation of either
    * kind — a tombstone closes the preceding interval and opens
    * nothing, so deleted spans simply have no covering row. The last
    * open interval per key is the current row (valid_to NULL,
    * is_current). One keyed shuffle on user_id; the per-key window
    * scans a single key's history, which is bounded by per-entity
    * activity, not corpus size — the partition-by-key plan holds at
    * 100 TB (a pathological single hot key would need the
    * sessionize-style span split; keys here are users, naturally
    * bounded). Timestamps ride as epoch millis (parity note at the
    * top of this file); `value` passes through UNTOUCHED — no
    * arithmetic, so no FP boundary for the engines to disagree on.
    */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ms"), col("value"),
        (col("event_type") === "error").as("is_delete"))
      .withColumn("valid_to_ms", lead(col("ms"), 1).over(w))
      .filter(!col("is_delete"))
      .select(col("user_id"), col("event_id"),
        col("ms").as("valid_from_ms"), col("valid_to_ms"), col("value"),
        col("valid_to_ms").isNull.as("is_current"))
      .orderBy("user_id", "valid_from_ms", "event_id")
  }

  /** Per-user event-type Markov transition matrix — the behavioral
    * model behind next-action prediction and funnel anomaly
    * detection: count (from_type → to_type) over each user's
    * time-ordered stream, then the row-stochastic transition
    * probability per from_type. The per-user lead window is bounded
    * by per-user history (never the corpus); the from_type totals
    * live on the tiny event-type domain, so the normalize join
    * broadcasts. Probabilities ship as HALF_UP ppm integers via the
    * §4 identity ⌈p·10⁶/q⌋ = (2p·10⁶+q) div (2q) — no FP division.
    */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    val trans = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ms"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    val totals = trans.groupBy("from_type")
      .agg(sum("n_trans").as("n_from"))
    trans.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n_trans"), col("n_from"),
        expr("(2*n_trans*1000000 + n_from) div (2*n_from)").as("prob_ppm"))
      .orderBy("from_type", "to_type")
  }

  /** Sliding active-user rollup (the DAU/WAU shape): 2-hour windows
    * advancing hourly, so every event lands in exactly two windows;
    * per window, event count and EXACT distinct users. Spark's
    * `window()` replicates each row into its ≤2 windows before the
    * keyed agg; distinct runs as the standard two-level
    * (window, user) partial dedup then count — no per-window state
    * beyond the group cells. The 100 TB swap for the exact distinct
    * is HLL (`rel_approx_distinct`), same plan shape.
    */
  def slidingActive(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        // graft.distinct.approx=true → HLL (the 100 TB swap, now a
        // code path — see functions.Approx); exact default is the
        // oracle-checked plan
        graft.functions.Approx.distinctCountOf(spark, col("user_id"))
          .as("n_users"))
      .select(unix_millis(col("window.start")).as("win_ms"),
        col("n_events"), col("n_users"))
      .orderBy("win_ms")

  /** Hour-of-day × day-of-week activity heatmap — the seasonality
    * census behind load planning and anomaly baselines. Both axes
    * come from PURE INTEGER epoch math ((days+4) % 7 with Thursday
    * anchoring 1970-01-01, hour = ms-of-day div 3600000) so neither
    * engine's calendar/locale functions are in the loop. One scan,
    * one keyed agg on the 7×24 cell grid.
    */
  def heatmap(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(unix_millis(col("ts")).as("ms"), col("user_id"), col("value"))
      .select(expr("((ms div 86400000) + 4) % 7").as("dow"),
        expr("(ms % 86400000) div 3600000").as("hour"),
        col("user_id"), col("value"))
      .groupBy("dow", "hour")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("value_cents"))
      .orderBy("dow", "hour")

  /** Inactivity / churn-band census: per-user recency (whole days
    * since last event, measured against the corpus max — pure integer
    * epoch-ms arithmetic) bucketed into the standard active (<7 d),
    * at-risk (<30 d), churned bands. Shape at 100 TB: one keyed
    * max-agg per user (map-side combinable), then a 3-row band agg;
    * the corpus max rides in as a broadcast 1-row aggregate, never a
    * driver collect.
    */
  def inactivityChurn(spark: SparkSession, dir: String): DataFrame = {
    val last = Tables.events(spark, dir)
      .groupBy("user_id").agg(max(unix_millis(col("ts"))).as("last_ms"))
    val mx = last.agg(max("last_ms").as("max_ms"))
    last.crossJoin(broadcast(mx))
      .select(col("user_id"),
        expr("(max_ms - last_ms) div 86400000").as("days_inactive"))
      .select(col("user_id"), col("days_inactive"),
        when(col("days_inactive") < 7, "active")
          .when(col("days_inactive") < 30, "at_risk")
          .otherwise("churned").as("band"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_users"),
        sum("days_inactive").as("sum_days"),
        max("days_inactive").as("max_days"))
      .orderBy("band")
  }

  /** Event-time lateness census — the watermark-delay planning input
    * for the streaming module: within each user's stream in ARRIVAL
    * order (event_id — the corpus's ingest sequence), lateness = the
    * running max event-time seen so far minus this event's time; the
    * census of lateness bands says exactly what fraction of events a
    * `withWatermark` of 1 s / 1 min / 10 min would drop. The only
    * window partitions by user_id and is bounded by per-user history
    * (the `ev_markov_transitions` shape); the band agg is tiny.
    *
    * The synthetic corpus's ingest log is PERFECTLY time-ordered
    * (event_id order == ts order per user — verified), which would
    * collapse the census to one all-on-time band and prove nothing.
    * So arrival order is deterministically perturbed (the §4
    * planted-input pattern, as in `txt_pii_scrub`): per user, every
    * 10th event straggles 1 position, every 10th+5 straggles 3, and
    * every 20th+7 straggles 12 — inter-event gaps run ~1–25 h here,
    * so the three displacements populate every band. Mirrored exactly
    * in the oracle; band edges are 6 h / 1 d / 3 d.
    */
  def latenessCensus(spark: SparkSession, dir: String): DataFrame = {
    val bySeq = Window.partitionBy("user_id").orderBy("event_id")
    val byArrival = Window.partitionBy("user_id").orderBy("arrival", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
      .withColumn("rn", row_number().over(bySeq).cast("long") - 1L)
      .withColumn("arrival", col("rn") +
        when(col("rn") % 20 === 7, 12L)
          .when(col("rn") % 10 === 0, 1L)
          .when(col("rn") % 10 === 5, 3L)
          .otherwise(0L))
      .withColumn("late_ms", max(col("ms")).over(byArrival) - col("ms"))
      .select(
        when(col("late_ms") === 0, "a_on_time")
          .when(col("late_ms") < 21600000L, "b_lt_6h")
          .when(col("late_ms") < 86400000L, "c_lt_1d")
          .when(col("late_ms") < 259200000L, "d_lt_3d")
          .otherwise("e_ge_3d").as("band"),
        col("late_ms"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_events"),
        max(col("late_ms")).as("max_late_ms"),
        sum(col("late_ms")).as("sum_late_ms"))
      .orderBy("band")
  }

  /** DAU / trailing-7-day-WAU stickiness ratio per day — the
    * product-analytics headline. Exact distincts via the census
    * trick: reduce to DISTINCT (day, user) pairs first (keyed
    * partial-aggregable shuffle), then explode each pair into the 7
    * day-windows it keeps a user active in — the fanout multiplies
    * the DEDUPLICATED pair count, never raw events — and count
    * per-window distinct users with a second keyed agg. HLL is the
    * declared at-scale swap for both distincts (same plan shape,
    * sketch merge instead of exact dedup). Ratio is a HALF_UP ppm
    * integer; windows are anchored on pure integer epoch-days. The
    * window is 7 (not the production 30) because the corpus spans
    * exactly 30 days — a 30-day window would leave ONE fully-covered
    * day and a degenerate oracle; the decomposition is
    * window-length-invariant.
    */
  def dauMau(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(expr("unix_millis(ts) div 86400000").as("day"), col("user_id"))
    val bounds = ev.agg(min("day").as("lo"), max("day").as("hi"))
    // graft.distinct.approx=true → the HLL plan: NO per-(day, user)
    // pre-dedup exchange at all, the sketch absorbs duplicates
    // map-side — exactly the shape swap the 100 TB path needs. The
    // exact default keeps the oracle-checked dedup-then-count plan.
    val (dau, mau) =
      if (spark.conf.get("graft.distinct.approx", "false").toBoolean) {
        val rsd = graft.functions.Approx.Rsd
        (ev.groupBy("day")
            .agg(approx_count_distinct(col("user_id"), rsd).as("dau")),
          ev.withColumn("w", explode(sequence(col("day"), col("day") + 6L)))
            .groupBy(col("w").as("day"))
            .agg(approx_count_distinct(col("user_id"), rsd).as("wau7")))
      } else {
        val dayUser = ev.distinct()
        (dayUser.groupBy("day").agg(count(lit(1)).as("dau")),
          dayUser
            .withColumn("w", explode(sequence(col("day"), col("day") + 6L)))
            .select(col("w").as("day"), col("user_id"))
            .distinct()
            .groupBy("day").agg(count(lit(1)).as("wau7")))
      }
    dau.join(mau, Seq("day"))
      .crossJoin(broadcast(bounds))
      // windows overhanging the corpus edges see truncated history on
      // both engines; keep only fully-covered days so the metric means
      // what it says
      .filter(col("day") >= col("lo") + 6 && col("day") <= col("hi"))
      .select(col("day"), col("dau"), col("wau7"),
        expr("(2*dau*1000000 + wau7) div (2*wau7)").as("stickiness_ppm"))
      .orderBy("day")
  }

  /** Cohort lifetime-value curves: users grouped by first-seen day
    * (the cohort), spend accumulated by cohort age in whole days —
    * the LTV companion to `ev_retention`'s counting curves. Exact
    * integer end to end: value rides as cents, the running total is a
    * window over the ALREADY-AGGREGATED (cohort, age) grid (bounded
    * by the calendar span², never by users or events — the
    * `rel_window_running` shape). Two keyed shuffles: per-user first
    * day, then the cohort-age agg; the user→cohort attach is a keyed
    * equi-join.
    */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val cohort = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    val grid = ev.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("age"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        sum(col("cents")).as("cents"))
    val byCohort = Window.partitionBy("cohort_day").orderBy("age")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.withColumn("cum_cents", sum(col("cents")).over(byCohort))
      .select("cohort_day", "age", "n_users", "cents", "cum_cents")
      .orderBy("cohort_day", "age")
  }

  /** RFM (recency / frequency / monetary) segmentation — the CRM
    * census behind every targeting pipeline. Scores are terciles
    * around the CORPUS MEAN (below ⅔·mean → 1, above 4/3·mean → 3),
    * compared as cross-multiplied integers (3·x·n vs 2·Σx / 4·Σx) so
    * no division — FP or integer — ever happens and the cuts are
    * scale-factor-invariant (absolute thresholds would collapse to
    * one band when per-user volume grows 10×). Recency scores
    * REVERSED (fresher = higher); its corpus total derives from the
    * same one-row aggregate (Σrec = n·max_ms − Σlast_ms), so the plan
    * is one keyed user agg + ONE broadcast 1-row totals join + a
    * ≤27-cell census agg. Headroom: 3·rec_ms·n_users < 2⁶³ up to
    * ~10⁹ users at a 30-day horizon; band by days instead beyond.
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(spark, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("user_id")
      .agg(max(col("ms")).as("last_ms"), count(lit(1)).as("freq"),
        sum(col("cents")).as("cents"))
    val totals = per.agg(count(lit(1)).as("n_users"),
      max(col("last_ms")).as("corpus_ms"),
      sum(col("last_ms")).as("sum_last_ms"),
      sum(col("freq")).as("tot_freq"),
      sum(col("cents")).as("tot_cents"))
    per.crossJoin(broadcast(totals))
      .withColumn("rec_ms", col("corpus_ms") - col("last_ms"))
      .withColumn("tot_rec",
        col("n_users") * col("corpus_ms") - col("sum_last_ms"))
      .select(
        when(lit(3) * col("rec_ms") * col("n_users") <= lit(2) * col("tot_rec"), 3L)
          .when(lit(3) * col("rec_ms") * col("n_users") >= lit(4) * col("tot_rec"), 1L)
          .otherwise(2L).as("r"),
        when(lit(3) * col("freq") * col("n_users") >= lit(4) * col("tot_freq"), 3L)
          .when(lit(3) * col("freq") * col("n_users") <= lit(2) * col("tot_freq"), 1L)
          .otherwise(2L).as("f"),
        when(lit(3) * col("cents") * col("n_users") >= lit(4) * col("tot_cents"), 3L)
          .when(lit(3) * col("cents") * col("n_users") <= lit(2) * col("tot_cents"), 1L)
          .otherwise(2L).as("m"),
        col("freq"), col("cents"))
      .groupBy("r", "f", "m")
      .agg(count(lit(1)).as("n_users"), sum(col("freq")).as("sum_events"),
        sum(col("cents")).as("sum_cents"))
      .orderBy("r", "f", "m")
  }

  /** Inter-arrival latency census — the queueing/telemetry primitive
    * (arrival-process profile for capacity planning and bot
    * detection): consecutive same-user gaps in event time, banded on
    * integer-ms cuts {<1 h, <6 h, <1 d, <3 d, ≥3 d} with per-band
    * count, contributing users, sum/max and the §4 HALF_UP integer
    * mean. One keyed user window (per-user sort, never global) + a
    * 5-row band agg; gaps ride as epoch-ms BIGINTs end to end.
    */
  def interarrivalCensus(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
      .withColumn("gap_ms", col("ms") - lag(col("ms"), 1).over(byUser))
      .filter(col("gap_ms").isNotNull)
      .select(col("user_id"),
        when(col("gap_ms") < 3600000L, "a_lt_1h")
          .when(col("gap_ms") < 21600000L, "b_lt_6h")
          .when(col("gap_ms") < 86400000L, "c_lt_1d")
          .when(col("gap_ms") < 259200000L, "d_lt_3d")
          .otherwise("e_ge_3d").as("band"),
        col("gap_ms"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_gaps"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("gap_ms")).as("sum_ms"),
        max(col("gap_ms")).as("max_ms"))
      .withColumn("mean_ms", expr("(2*sum_ms + n_gaps) div (2*n_gaps)"))
      .orderBy("band")
  }

  /** Daily-activity streak profile — the gaps-and-islands classic
    * (engagement/retention feature): consecutive-day runs per user
    * via the island key day − row_number (constant within a run,
    * pure integer), then per-user streak stats. Events first reduce
    * to DISTINCT (user, day) pairs — partial-aggregable, so the
    * per-user window sorts active DAYS (≤ calendar span), never raw
    * events. One keyed dedup + one keyed window + two keyed aggs.
    */
  def streakCensus(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"))
      .distinct()
    val byUser = Window.partitionBy("user_id").orderBy("day")
    du.withColumn("island", col("day") - row_number().over(byUser))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_streaks"),
        sum(col("len")).as("n_active_days"),
        max(col("len")).as("max_streak"))
      .orderBy("user_id")
  }

  /** Per-user behavioral entropy — the event-type diversity feature
    * (bots and single-purpose scripts sit near 0, organic users
    * higher): Shannon entropy over the user's event-type histogram
    * via the engine-shared identity H = log2(n) − Σc·log2(c)/n, so
    * both engines evaluate ONE expression tree on exact integer
    * counts (the `txt_entropy` pattern, user-keyed). Two keyed aggs
    * + one keyed join; rounded 6.
    */
  def userEntropy(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.events(spark, dir)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("c"))
    val n = c.groupBy("user_id")
      .agg(sum(col("c")).as("n_events"), count(lit(1)).as("n_types"),
        sum(col("c").cast("double") * log2(col("c").cast("double"))).as("clog"))
    n.select(col("user_id"), col("n_events"), col("n_types"),
      round(log2(col("n_events").cast("double")) -
        col("clog") / col("n_events").cast("double"), 6).as("entropy"))
      .orderBy("user_id")
  }

  /** Point-in-time-correct feature snapshot — the feature-store /
    * leakage-guard primitive behind every supervised pipeline on
    * event data: at each LABEL event (deterministically every 10th
    * by event_id ending in 7), features computed from STRICTLY
    * PRIOR events only — prior count, prior spend (cents), ms since
    * the user's first and most recent prior events. One per-user
    * window with an explicit rows-between-(unbounded, −1) frame —
    * the frame IS the leakage guard; empty frames surface as −1
    * sentinels identically on both engines. Keyed shuffle on
    * user_id only, per-user sort bounded by user history.
    */
  def featureSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
    val pre = byUser.rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .withColumn("n_prior", count(lit(1)).over(pre))
      .withColumn("cents_prior", coalesce(sum(col("cents")).over(pre), lit(0L)))
      .withColumn("ms_since_first",
        coalesce(col("ms") - min(col("ms")).over(pre), lit(-1L)))
      .withColumn("ms_since_last",
        coalesce(col("ms") - max(col("ms")).over(pre), lit(-1L)))
      .filter(col("event_id") % 10 === 7)
      .select("event_id", "user_id", "n_prior", "cents_prior",
        "ms_since_first", "ms_since_last")
      .orderBy("event_id")
  }

  /** Peak session concurrency per hour — the capacity-planning
    * sweep-line (max simultaneously-open 30-min-gap sessions), DONE
    * DISTRIBUTED: the textbook solution is one GLOBAL ordered running
    * sum over ±1 deltas, which is exactly the single-task window this
    * repo bans. The decomposition: (1) deltas at session start /
    * end+1 (ends sort before starts at ms ties via d asc, so
    * back-to-back sessions never double-count); (2) per-HOUR partial
    * sums — an aggregate bounded by the calendar, broadcast
    * theta-joined into per-hour OFFSETS (prefix sums with no window
    * at all, the pack_sequences pattern; ~10⁴ rows even at a decade
    * of data); (3) the running sum windows only INSIDE each hour
    * partition, offset + in-hour prefix. max(prefix) is invariant
    * under same-(ms, d) tie orderings — equal deltas commute — so
    * both engines agree without a total order on rows.
    */
  def peakConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val s = sessionize(spark, dir)
      .select(col("session_start_ms").as("s"), col("session_end_ms").as("e"))
    // deltas feeds the per-hour totals AND the final windowed join —
    // left live, the entire sessionize pipeline upstream re-executes
    // once per reference; materialized it is two session-bounded rows
    // per session
    val deltas = graft.Ckpt.truncate(
      s.select(col("s").as("ms"), lit(1L).as("d"))
        .unionAll(s.select((col("e") + 1).as("ms"), lit(-1L).as("d")))
        .withColumn("hour", expr("ms div 3600000")))
    val hourTot = deltas.groupBy("hour").agg(sum(col("d")).as("hd"))
    val offsets = hourTot.as("a")
      .join(broadcast(hourTot.as("b")), col("b.hour") < col("a.hour"), "left")
      .groupBy(col("a.hour").as("hour"))
      .agg(coalesce(sum(col("b.hd")), lit(0L)).as("offset"))
    val inHour = Window.partitionBy("hour").orderBy("ms", "d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.join(broadcast(offsets), Seq("hour"))
      .withColumn("conc", col("offset") + sum(col("d")).over(inHour))
      .groupBy("hour")
      .agg(max(col("conc")).as("peak_concurrency"),
        count(lit(1)).as("n_changes"))
      .orderBy("hour")
  }

  /** Revenue-concentration (Lorenz/Pareto) table — "the top spend
    * bands hold X% of users and Y% of revenue": per-user cents
    * totals bucketed into log2 spend bands (length(bin(x)) — the
    * rankVocab band trick, identical to DuckDB's bit_length-style
    * floor(log2)+1 via length(bin())), then cumulative-from-the-top
    * shares computed as a broadcast theta-join over the ≤64-row band
    * grid — NO window anywhere, every division the §4 HALF_UP ppm
    * identity. Two keyed aggs + tiny-grid arithmetic; ppm exactness
    * holds while 2·total_cents·10⁶ < 2⁶³ (≈4.6·10¹² cents corpus);
    * move to DECIMAL beyond.
    */
  def lorenzCurve(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("user_id").agg(sum(col("cents")).as("cents"))
    val bands = per
      .select(length(bin(col("cents"))).cast("long").as("band"), col("cents"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("sum_cents"))
    val tot = bands.agg(sum(col("n_users")).as("tu"), sum(col("sum_cents")).as("tc"))
    bands.as("a")
      .join(broadcast(bands.as("b")), col("b.band") >= col("a.band"))
      .groupBy(col("a.band").as("band"))
      .agg(max(col("a.n_users")).as("n_users"),
        max(col("a.sum_cents")).as("sum_cents"),
        sum(col("b.n_users")).as("cum_users"),
        sum(col("b.sum_cents")).as("cum_cents"))
      .crossJoin(broadcast(tot))
      .select(col("band"), col("n_users"), col("sum_cents"),
        expr("(2*cum_users*1000000 + tu) div (2*tu)").as("cum_users_ppm"),
        expr("(2*cum_cents*1000000 + tc) div (2*tc)").as("cum_cents_ppm"))
      .orderBy(desc("band"))
  }

  /** Dwell time after each event TYPE — "how long does a user linger
    * after a view vs a click": the gap to the user's next event,
    * keyed by the type of the event BEFORE the gap (the
    * interarrival census's per-type refinement; lead instead of lag
    * so the gap attributes to its origin). Per-user lead window +
    * one tiny per-type agg; §4 HALF_UP integer mean, exact ms sums.
    */
  def dwellByType(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
      .withColumn("dwell_ms", lead(col("ms"), 1).over(byUser) - col("ms"))
      .filter(col("dwell_ms").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("dwell_ms")).as("sum_ms"),
        max(col("dwell_ms")).as("max_ms"))
      .withColumn("mean_ms", expr("(2*sum_ms + n_gaps) div (2*n_gaps)"))
      .orderBy("event_type")
  }

  /** Seasonal-naive forecast backtest — the baseline every real
    * forecaster must beat, evaluated in-engine: predict each hour's
    * event count per type by (a) the previous hour, (b) the same
    * hour yesterday, (c) the same hour last week, and report per-type
    * MAE ×100 for each horizon. Counts and absolute errors are exact
    * integers; each MAE is a ratio-of-sums HALF_UP division, so zero
    * FP exists. Plan: one keyed hourly rollup, three self-equi-joins
    * on (type, hour±lag) — co-partitioned, no window, no explosion —
    * each evaluated over the hours where both sides exist (the
    * standard backtest convention; identical on both engines by
    * inner-join semantics), then a types-sized merge.
    */
  def seasonalBaseline(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(expr("unix_millis(ts) div 3600000").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    def horizon(lagH: Long, tag: String): DataFrame =
      hourly.as("a").join(hourly.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("a.hour") === col("b.hour") + lagH)
        .select(col("a.event_type").as("event_type"),
          abs(col("a.cnt") - col("b.cnt")).as("ae"))
        .groupBy("event_type")
        .agg(count(lit(1)).as(s"n_$tag"),
          expr("(2*sum(ae)*100 + count(1)) div (2*count(1))").as(s"mae_${tag}_x100"))
    horizon(1L, "h1")
      .join(horizon(24L, "h24"), Seq("event_type"))
      .join(horizon(168L, "h168"), Seq("event_type"))
      .orderBy("event_type")
  }

  /** Time-to-convert histogram — the product metric `ev_funnel`
    * doesn't give (funnel reports per-stage first-completion times;
    * this is the DISTRIBUTION of view→purchase latency): per user
    * the first view and first purchase from one filtered keyed
    * min-agg each, converted = first purchase at-or-after first
    * view, delays banded {<1 h, <1 d, <3 d, ≥3 d} into a 4-row
    * census plus the never-converted and purchase-before-view
    * remainder classes, so the output partitions the viewing
    * population exactly. Two keyed aggs + one keyed join; pure
    * integer epoch-ms bands.
    */
  def conversionDelay(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ms")).as("v_ms"))
    val p = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min(col("ms")).as("p_ms"))
    v.join(p, Seq("user_id"), "left")
      .select(
        when(col("p_ms").isNull, "e_no_purchase")
          .when(col("p_ms") < col("v_ms"), "f_purchase_first")
          .when(col("p_ms") - col("v_ms") < 3600000L, "a_lt_1h")
          .when(col("p_ms") - col("v_ms") < 86400000L, "b_lt_1d")
          .when(col("p_ms") - col("v_ms") < 259200000L, "c_lt_3d")
          .otherwise("d_ge_3d").as("band"),
        when(col("p_ms") >= col("v_ms"), col("p_ms") - col("v_ms")).as("delay_ms"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_users"),
        coalesce(sum(col("delay_ms")), lit(0L)).as("sum_delay_ms"),
        coalesce(max(col("delay_ms")), lit(0L)).as("max_delay_ms"))
      .orderBy("band")
  }

  /** Multi-touch lookback: touches within 7 days before the purchase. */
  val MtaWindowMs = 7L * 86400000L

  /** Linear multi-touch attribution — the marketing-analytics standard
    * `ev_funnel` and `stream_click_attribution` don't cover (funnel is
    * per-stage firsts; the streaming op is last-touch): every view or
    * click in the 7 days at-or-before a purchase shares that
    * purchase's credit equally. Per-touch credit is the HALF_UP ppm
    * integer ⌈10⁶/n⌋ (§4 identity), so per-type credit sums are exact
    * integers with no FP and no order sensitivity. Plan: one per-user
    * equi-join of purchases to touches with the lookback as a join-time
    * range predicate (per-user event counts bound the pair fan-out),
    * one fine-grained groupBy(purchase) for n, one types-sized final
    * agg — no window over the corpus anywhere.
    */
  def multitouchAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_millis(col("ts")).as("ms"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_uid"), col("event_id").as("p_id"),
        col("ms").as("p_ms"))
    val t = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id").as("t_uid"), col("event_type").as("touch_type"),
        col("ms").as("t_ms"))
    val j = p.join(t,
      col("p_uid") === col("t_uid") &&
        col("t_ms") <= col("p_ms") &&
        col("p_ms") - col("t_ms") < MtaWindowMs)
      .select("p_id", "touch_type")
    val n = j.groupBy("p_id").agg(count(lit(1)).as("n_touch"))
    j.join(n, Seq("p_id"))
      .withColumn("credit_ppm", expr("(2*1000000 + n_touch) div (2*n_touch)"))
      .groupBy("touch_type")
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit_ppm")).as("credit_ppm_sum"),
        countDistinct(col("p_id")).as("n_purchases"))
      .orderBy("touch_type")
  }

  /** Global outage / coverage census — the SRE "did ingestion ever go
    * dark?" check over the WHOLE stream, not per user: distinct
    * event-minutes, gaps to the next present minute banded
    * {adjacent, 2–4, 5–9, 10–29, ≥30 min} with max gap and total
    * missing minutes. The textbook form is one global lead() — a
    * single-task sort forever — so the lead decomposes exactly like
    * `ev_peak_concurrency`'s running sum: in-HOUR leads from an
    * hour-partitioned window, and each hour's LAST minute closed by
    * the next present hour's first minute from a broadcast theta-join
    * over the hour grid (grid rows scale with the time range, not the
    * corpus). The stream's one true last minute has no successor and
    * is excluded on both engines (lead IS NULL).
    */
  def outageCensus(spark: SparkSession, dir: String): DataFrame = {
    val minutes = Tables.events(spark, dir)
      .select(expr("unix_millis(ts) div 60000").as("minute")).distinct()
      .withColumn("hour", expr("minute div 60"))
    val inHour = Window.partitionBy("hour").orderBy("minute")
    val led = minutes.withColumn("nxt_in", lead(col("minute"), 1).over(inHour))
    val grid = minutes.groupBy("hour").agg(min(col("minute")).as("first_min"))
    val nextHourFirst = grid.as("a")
      .join(broadcast(grid.as("b")), col("b.hour") > col("a.hour"), "left")
      .groupBy(col("a.hour").as("hour"))
      .agg(min(col("b.first_min")).as("nxt_hour_min"))
    led.join(broadcast(nextHourFirst), Seq("hour"))
      .select(col("minute"),
        coalesce(col("nxt_in"), col("nxt_hour_min")).as("nxt"))
      .filter(col("nxt").isNotNull)
      .select((col("nxt") - col("minute")).as("gap"))
      .select(
        when(col("gap") <= 1, "a_adjacent")
          .when(col("gap") < 5, "b_2_4")
          .when(col("gap") < 10, "c_5_9")
          .when(col("gap") < 30, "d_10_29")
          .otherwise("e_ge_30").as("band"),
        col("gap"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_gaps"),
        max(col("gap")).as("max_gap"),
        sum(col("gap") - 1).as("missing_minutes"))
      .orderBy("band")
  }

  /** Velocity-rule threshold for `ev_velocity_flags`. */
  val VelocityBurstN = 6L

  /** Velocity / burst flagging — the fraud-ops rule "more than N
    * events from one account inside a trailing day": per event, the
    * count of that user's events in the trailing 24 h via a per-user
    * RANGE frame (peers at the same millisecond count together, so
    * the result is tie-order-invariant); per user, the max burst and
    * a flag at ≥ VelocityBurstN. Per-user window only — partition
    * cardinality is the user base, per-partition work the user's own
    * history. Output is the per-user audit row, so the op is
    * non-degenerate at any SF while the flag subset varies.
    */
  def velocityFlags(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ms")
      .rangeBetween(-86399999L, 0L)
    Tables.events(spark, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"))
      .withColumn("burst", count(lit(1)).over(byUser))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), max(col("burst")).as("max_burst_1d"))
      .withColumn("flagged",
        (col("max_burst_1d") >= VelocityBurstN).cast("long"))
      .orderBy("user_id")
  }

  /** Candidates reported by `ev_cusum_changepoints`. */
  val CusumTopK = 10

  /** CUSUM changepoint scan over the hourly arrival rate — the
    * level-shift detector (deploys, incidents, seasonality breaks)
    * `ev_anomaly`'s pointwise z-score can't see: the classic
    * S_h = Σ_{h'≤h} (cnt − mean) drift, kept EXACT by scaling with
    * the hour count (n·S_h = n·cum_h − k_h·T — pure BIGINT, no mean
    * division ever happens), computed per hour by the broadcast
    * theta-join over the hour grid (cum and k from the same join;
    * grid scales with the time range, not the corpus). The top-|S|
    * hours are where the pre/post means differ most — the CUSUM
    * changepoint estimate. Deterministic (|drift|, hour) ranking.
    */
  def cusumChangepoints(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(expr("unix_millis(ts) div 3600000").as("hour"))
      .agg(count(lit(1)).as("cnt"))
    val tot = hourly.agg(sum(col("cnt")).as("t"), count(lit(1)).as("n"))
    hourly.as("a")
      .join(broadcast(hourly.as("b")), col("b.hour") <= col("a.hour"))
      .groupBy(col("a.hour").as("hour"), col("a.cnt").as("cnt"))
      .agg(sum(col("b.cnt")).as("cum_events"), count(lit(1)).as("k"))
      .crossJoin(broadcast(tot))
      .select(col("hour"), col("cnt"), col("cum_events"),
        (col("n") * col("cum_events") - col("k") * col("t")).as("drift_xn"))
      .orderBy(abs(col("drift_xn")).desc, col("hour").asc)
      .limit(CusumTopK)
  }

  /** Error budget for `ev_slo_burn` (ppm of events allowed to error). */
  val SloBudgetPpm = 200000L

  /** SLO error-budget burn by day — the SRE reliability report: per
    * UTC day, events vs errors, the burn rate as a HALF_UP ppm
    * integer, breach flag against the budget, and the running count
    * of breach days (computed by a broadcast theta-join over the
    * day grid — no global window). One keyed daily rollup; the day
    * grid scales with the time range, not the corpus.
    */
  def sloBurn(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
      .agg(count(lit(1)).as("n_events"),
        count(when(col("event_type") === "error", 1)).as("n_errors"))
      .withColumn("burn_ppm",
        expr("(2*n_errors*1000000 + n_events) div (2*n_events)"))
      .withColumn("breached",
        (col("burn_ppm") > SloBudgetPpm).cast("long"))
    daily.as("a")
      .join(broadcast(daily.select("day", "breached").as("b")),
        col("b.day") <= col("a.day"))
      .groupBy(col("a.day").as("day"), col("a.n_events").as("n_events"),
        col("a.n_errors").as("n_errors"), col("a.burn_ppm").as("burn_ppm"),
        col("a.breached").as("breached"))
      .agg(sum(col("b.breached")).as("breach_days_to_date"))
      .orderBy("day")
  }

  /** A/B experiment readout — deterministic variant assignment (bit
    * 31 of a Knuth multiplicative hash of user_id: the multiplier is
    * odd, so the raw LOW bit would be literal user_id parity — a
    * poor assignment when ids correlate with parity — whereas a high
    * bit genuinely mixes) and the two-proportion
    * z-test on signup→purchase conversion. All counts are exact
    * integers; conversion rates ride the §4 HALF_UP ppm; the z
    * statistic is the one place FP exists — a single identical
    * expression tree over four exact integers on both engines,
    * rounded to 3 (the `pipe_group_stats` corr precedent). One scan,
    * two keyed aggs, a 1-row output.
    */
  def abtestZscore(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("converted"))
      .withColumn("variant",
        expr("(((user_id % 999983) * 2654435761) div 2147483648) % 2"))
    perUser.agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === 0, col("converted")).otherwise(0L)).as("conv_a"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("variant") === 1, col("converted")).otherwise(0L)).as("conv_b"))
      .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        expr("(2*conv_a*1000000 + n_a) div (2*n_a)").as("rate_a_ppm"),
        expr("(2*conv_b*1000000 + n_b) div (2*n_b)").as("rate_b_ppm"),
        // degenerate pooled rate (0 or 1) zeroes the variance; the z
        // statistic is undefined there — NULL on BOTH engines (ANSI
        // Spark would otherwise throw on the 0-divisor; DuckDB would
        // emit NaN)
        when(col("conv_a") + col("conv_b") === 0 ||
          col("conv_a") + col("conv_b") === col("n_a") + col("n_b"),
          lit(null).cast("double"))
          .otherwise(round(
            (col("conv_a").cast("double") / col("n_a") -
              col("conv_b").cast("double") / col("n_b")) /
              sqrt(((col("conv_a") + col("conv_b")).cast("double") /
                (col("n_a") + col("n_b"))) *
                (lit(1.0) - (col("conv_a") + col("conv_b")).cast("double") /
                  (col("n_a") + col("n_b"))) *
                (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 3))
          .as("z"))
  }

  /** Bot / automation scoring — the trust-and-safety composite that
    * joins this module's individual signals into one audit: per user,
    * three integer rules — (1) burst: ≥ `VelocityBurstN` events in a
    * trailing day (the `ev_velocity_flags` frame); (2) low diversity:
    * ≤ 2 distinct event types; (3) metronome regularity: ≥ 5
    * inter-event gaps with coefficient of variation < 0.5, tested by
    * the CROSS-MULTIPLIED integer form 4·(n·Σg² − (Σg)²) < (Σg)² on
    * second-quantized gaps, so no variance division or sqrt ever
    * happens. Score = flags fired (0–3). Per-user windows only;
    * gap seconds keep Σg² < 2⁶³ for any 90-day user history (re-scale
    * to minutes beyond). Humans are bursty-but-diverse; bots are
    * fast, narrow, and regular — the score separates exactly that.
    */
  def botScore(spark: SparkSession, dir: String): DataFrame = {
    val byUserRange = Window.partitionBy("user_id").orderBy("ms")
      .rangeBetween(-86399999L, 0L)
    val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
    val base = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
      .withColumn("burst", count(lit(1)).over(byUserRange))
      .withColumn("gap_s",
        ((col("ms") - lag(col("ms"), 1).over(byUser)) / 1000).cast("long"))
    base.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        max(col("burst")).as("max_burst_1d"),
        countDistinct(col("event_type")).as("n_types"),
        count(col("gap_s")).as("n_g"),
        coalesce(sum(col("gap_s")), lit(0L)).as("sg"),
        coalesce(sum(col("gap_s") * col("gap_s")), lit(0L)).as("sg2"))
      .select(col("user_id"), col("n_events"), col("max_burst_1d"),
        col("n_types"),
        (col("max_burst_1d") >= VelocityBurstN).cast("long").as("r_burst"),
        (col("n_types") <= 2).cast("long").as("r_lowdiv"),
        (col("n_g") >= 5 && col("sg") > 0 &&
          (col("n_g") * col("sg2") - col("sg") * col("sg")) * 4 <
            col("sg") * col("sg")).cast("long").as("r_regular"))
      .withColumn("score", col("r_burst") + col("r_lowdiv") + col("r_regular"))
      .orderBy("user_id")
  }

  /** Censoring horizon and band width (days) for `ev_hazard_table`. */
  val HazardCensorDays = 7L
  val HazardBandDays = 7L
  val HazardMaxBand = 12L

  /** Discrete-time survival (hazard) table — churn modeling's
    * Kaplan-Meier prep without the cross-band FP product: per user,
    * lifetime = last − first event, right-CENSORED if the user was
    * still active within `HazardCensorDays` of the corpus end (the
    * standard observation-window rule); lifetimes band into 7-day
    * buckets (capped at 12+). Per band: the at-risk population
    * (lifetime reaching the band — a theta-join suffix sum over the
    * 13-row grid), churn events (uncensored lifetimes ENDING there),
    * censored exits, and the discrete hazard d/n as HALF_UP ppm.
    * All integers; one keyed per-user agg + grid arithmetic.
    */
  def hazardTable(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(spark, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"))
      .groupBy("user_id")
      .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"))
    val horizon = per.agg(max(col("last_ms")).as("end_ms"))
    val banded = per.crossJoin(broadcast(horizon))
      .select(
        least(expr(s"((last_ms - first_ms) div 86400000) div $HazardBandDays"),
          lit(HazardMaxBand)).as("band"),
        (col("end_ms") - col("last_ms") <
          HazardCensorDays * 86400000L).cast("long").as("censored"))
    val grid = banded.groupBy("band")
      .agg(count(when(col("censored") === 0, 1)).as("n_churned"),
        count(when(col("censored") === 1, 1)).as("n_censored"))
    grid.as("a")
      .join(broadcast(grid.as("b")), col("b.band") >= col("a.band"))
      .groupBy(col("a.band").as("band"), col("a.n_churned").as("n_churned"),
        col("a.n_censored").as("n_censored"))
      .agg(sum(col("b.n_churned") + col("b.n_censored")).as("n_at_risk"))
      .withColumn("hazard_ppm",
        expr("(2*n_churned*1000000 + n_at_risk) div (2*n_at_risk)"))
      .select("band", "n_at_risk", "n_churned", "n_censored", "hazard_ppm")
      .orderBy("band")
  }

  /** Burst detection over the hourly grid — the rate-spike monitor
    * (traffic surges, abuse onset, incident load) run the scalable
    * way: the corpus first reduces to the (event_type, hour) COUNT
    * GRID (a map-side-combinable keyed agg, the only corpus-sized
    * pass), and the trailing-baseline window runs over that tiny
    * grid, partitioned by event_type. An hour is a burst when its
    * count more than doubles the trailing-24-bucket mean — exact
    * cross-multiplied integers (cnt·n_prev > 2·sum_prev), no rate
    * division; lift ×1000 is §4 HALF_UP, NULL when the trailing sum
    * is zero (a burst out of silence has no finite lift). Warm-up
    * hours (fewer than 6 trailing buckets) can't fire.
    */
  val BurstTrailing = 24
  val BurstMinPrev = 6L
  def burstWindows(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("event_type").orderBy("hour_ms")
      .rowsBetween(-BurstTrailing, -1)
    hourly
      .withColumn("n_prev", count(lit(1)).over(w))
      .withColumn("sum_prev", coalesce(sum(col("n_events")).over(w), lit(0L)))
      .filter(col("n_prev") >= BurstMinPrev &&
        col("n_events") * col("n_prev") > lit(2L) * col("sum_prev"))
      .select(col("event_type"), col("hour_ms"), col("n_events"),
        col("n_prev"), col("sum_prev"),
        when(col("sum_prev") === 0, lit(null).cast("long"))
          .otherwise(expr(
            "(2*n_events*n_prev*1000 + sum_prev) div (2*sum_prev)"))
          .as("lift_x1000"))
      .orderBy("event_type", "hour_ms")
  }

  /** Count-Min sketch geometry: D independent affine hash rows of W
    * counters each — 256 integers total, the bounded-memory substitute
    * for an exact per-key groupBy when the key domain is unbounded.
    * W is deliberately far below the user count so collisions (and
    * the sketch's one-sided overcount) actually occur and the census
    * has something real to measure.
    */
  val CmsD = 4
  val CmsW = 64L
  val CmsP = 1000000007L
  private def cmsA(d: Int): Long = (2654435761L + 40503L * d) % CmsP
  private def cmsB(d: Int): Long = (97781L * d + 12289L) % CmsP

  /** Count-Min calibration census — like `dd_minhash_error` for the
    * counting side of the sketch toolbox: build the D×W sketch over
    * per-user event counts, read back every user's estimate
    * (min over rows of its D cells), and report the one-sided error
    * against the exact counts. CM guarantees est ≥ exact always and
    * E[overcount] ≤ 2·N/W per row; the census shows where the real
    * key distribution lands inside that bound. All integer arithmetic
    * (affine hashes mod p mod W), so DuckDB replays the sketch
    * cell-for-cell. Shape: one (d, bucket)-keyed agg over a
    * D-way stack (the 256-cell sketch — THE thing that stays tiny at
    * any scale), one exact user-keyed agg, a broadcast join of the
    * 256-cell table back to the user domain, and a 1-row reduce.
    */
  def countminErrorCensus(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"))
    val bucketCols = (0 until CmsD).map { d =>
      ((col("user_id") * cmsA(d) + cmsB(d)) % CmsP % CmsW).as(s"b$d")
    }
    val stackArgs = (0 until CmsD).map(d => s"${d}L, b$d").mkString(", ")
    val cells = ev.select(col("user_id") +: bucketCols: _*)
      .selectExpr(s"stack($CmsD, $stackArgs) as (d, bucket)")
      .groupBy("d", "bucket").agg(count(lit(1)).as("cnt"))
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
    val est = exact.select(col("user_id") +: col("exact_n") +: bucketCols: _*)
      .selectExpr("user_id", "exact_n",
        s"stack($CmsD, $stackArgs) as (d, bucket)")
      .join(broadcast(cells), Seq("d", "bucket"))
      .groupBy("user_id")
      .agg(first(col("exact_n")).as("exact_n"), min(col("cnt")).as("est_n"))
    est.agg(count(lit(1)).as("n_keys"),
        sum(col("exact_n")).as("n_events"),
        count(when(col("est_n") === col("exact_n"), 1)).as("n_tight"),
        sum(col("est_n") - col("exact_n")).as("sum_overcount"),
        max(col("est_n") - col("exact_n")).as("max_overcount"))
      .withColumn("avg_overcount_x1000",
        // CASE-guarded: the global agg emits one row even on an empty
        // corpus, where n_keys = 0 would be an ANSI division error
        expr("CASE WHEN n_keys = 0 THEN NULL " +
          "ELSE (2*sum_overcount*1000 + n_keys) div (2*n_keys) END"))
  }

  private def countminErrorOracle: String = {
    val buckets = (0 until CmsD).map(d =>
      s"(user_id * ${cmsA(d)} + ${cmsB(d)}) % $CmsP % $CmsW AS b$d").mkString(",\n    ")
    val unpiv = (0 until CmsD).map(d =>
      s"SELECT user_id, $d AS d, b$d AS bucket FROM h").mkString("\n  UNION ALL ")
    s"""WITH h AS (
      |  SELECT user_id,
      |    $buckets
      |  FROM events),
      |hb AS (
      |  $unpiv),
      |cells AS (SELECT d, bucket, count(*) AS cnt FROM hb GROUP BY d, bucket),
      |exact AS (SELECT user_id, count(*) AS exact_n FROM events GROUP BY user_id),
      |keyb AS (SELECT DISTINCT user_id, d, bucket FROM hb),
      |est AS (
      |  SELECT k.user_id, min(c.cnt) AS est_n
      |  FROM keyb k JOIN cells c ON c.d = k.d AND c.bucket = k.bucket
      |  GROUP BY k.user_id)
      |SELECT count(*) AS n_keys,
      |  CAST(sum(exact_n) AS BIGINT) AS n_events,
      |  count(*) FILTER (WHERE est_n = exact_n) AS n_tight,
      |  CAST(sum(est_n - exact_n) AS BIGINT) AS sum_overcount,
      |  max(est_n - exact_n) AS max_overcount,
      |  CASE WHEN count(*) = 0 THEN NULL
      |    ELSE (2*CAST(sum(est_n - exact_n) AS BIGINT)*1000 + count(*))
      |      // (2*count(*)) END AS avg_overcount_x1000
      |FROM exact JOIN est USING (user_id)""".stripMargin
  }

  val HotUsersK = 3

  /** Hot-key leaderboard per hour — "who are the top-3 users each
    * hour" — in the bounded-heap shape: per-(hour, user) counts (one
    * keyed, map-side-combinable shuffle), then the TopKByScore
    * Aggregator per hour, so each map partition contributes ≤ k rows
    * per hour to the second exchange and NO row_number window ever
    * sorts the full (hour, user) grid. Ties break to the lower
    * user_id in the heap's (−score, id) order; the oracle takes the
    * same top-3 via a rank window — different construction, hash
    * equality proves the heap.
    */
  def topkUsersHourly(spark: SparkSession, dir: String): DataFrame = {
    val topk = graft.functions.TopK.topKByScore(HotUsersK)
    Tables.events(spark, dir)
      .select(unix_millis(date_trunc("HOUR", col("ts"))).as("hour_ms"),
        col("user_id"))
      .groupBy("hour_ms", "user_id").agg(count(lit(1)).as("n"))
      .groupBy("hour_ms")
      .agg(topk(col("n").cast("double"), col("user_id")).as("top"))
      .select(col("hour_ms"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("hour_ms"), (col("pos") + 1).cast("long").as("rank"),
        col("s.id").as("user_id"), col("s.score").cast("long").as("n_events"))
      .orderBy("hour_ms", "rank")
  }

  val queries: Map[String, GQuery] = Map(
    "ev_topk_users_hourly" -> GQuery.sql(topkUsersHourly,
      s"""WITH g AS (
        |  SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, user_id,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT hour_ms, user_id, n,
        |    CAST(row_number() OVER (PARTITION BY hour_ms
        |      ORDER BY n DESC, user_id) AS BIGINT) AS rank
        |  FROM g)
        |SELECT hour_ms, rank, user_id, n AS n_events
        |FROM r WHERE rank <= $HotUsersK
        |ORDER BY hour_ms, rank""".stripMargin),
    "ev_countmin_error" -> GQuery.sql(countminErrorCensus, countminErrorOracle),
    "ev_burst_windows" -> GQuery.sql(burstWindows,
      s"""WITH h AS (
        |  SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, hour_ms, n_events,
        |    count(*) OVER w AS n_prev,
        |    coalesce(CAST(sum(n_events) OVER w AS BIGINT), 0) AS sum_prev
        |  FROM h
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hour_ms
        |    ROWS BETWEEN $BurstTrailing PRECEDING AND 1 PRECEDING))
        |SELECT event_type, hour_ms, n_events, n_prev, sum_prev,
        |  CASE WHEN sum_prev = 0 THEN NULL
        |       ELSE (2*n_events*n_prev*1000 + sum_prev) // (2*sum_prev)
        |  END AS lift_x1000
        |FROM t
        |WHERE n_prev >= $BurstMinPrev AND n_events * n_prev > 2 * sum_prev
        |ORDER BY event_type, hour_ms""".stripMargin),
    "ev_hazard_table" -> GQuery.sql(hazardTable,
      s"""WITH per AS (
        |  SELECT user_id, min(epoch_ms(ts)) AS first_ms,
        |    max(epoch_ms(ts)) AS last_ms
        |  FROM events GROUP BY user_id),
        |h AS (SELECT max(last_ms) AS end_ms FROM per),
        |banded AS (
        |  SELECT least(((last_ms - first_ms) // 86400000) // $HazardBandDays,
        |      $HazardMaxBand) AS band,
        |    CAST(end_ms - last_ms < ${HazardCensorDays * 86400000L}
        |      AS BIGINT) AS censored
        |  FROM per, h),
        |grid AS (
        |  SELECT band,
        |    count(*) FILTER (censored = 0) AS n_churned,
        |    count(*) FILTER (censored = 1) AS n_censored
        |  FROM banded GROUP BY band),
        |ar AS (
        |  SELECT a.band, a.n_churned, a.n_censored,
        |    CAST(sum(b.n_churned + b.n_censored) AS BIGINT) AS n_at_risk
        |  FROM grid a JOIN grid b ON b.band >= a.band
        |  GROUP BY 1, 2, 3)
        |SELECT band, n_at_risk, n_churned, n_censored,
        |  (2*n_churned*1000000 + n_at_risk) // (2*n_at_risk) AS hazard_ppm
        |FROM ar ORDER BY band""".stripMargin),
    "ev_abtest_zscore" -> GQuery.sql(abtestZscore,
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
        |    (((user_id % 999983) * 2654435761) // 2147483648) % 2 AS variant
        |  FROM events GROUP BY user_id),
        |c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
        |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_b
        |  FROM u)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  (2*conv_a*1000000 + n_a) // (2*n_a) AS rate_a_ppm,
        |  (2*conv_b*1000000 + n_b) // (2*n_b) AS rate_b_ppm,
        |  CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
        |    THEN NULL
        |    ELSE round((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b) /
        |      sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
        |        (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
        |        (1.0 / n_a + 1.0 / n_b)), 3) END AS z
        |FROM c""".stripMargin),
    "ev_bot_score" -> GQuery.sql(botScore,
      s"""WITH b AS (
        |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
        |    count(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |      RANGE BETWEEN 86399999 PRECEDING AND CURRENT ROW) AS burst,
        |    (epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(ts), event_id)) // 1000 AS gap_s
        |  FROM events),
        |g AS (
        |  SELECT user_id, count(*) AS n_events,
        |    max(burst) AS max_burst_1d,
        |    count(DISTINCT event_type) AS n_types,
        |    count(gap_s) AS n_g,
        |    CAST(coalesce(sum(gap_s), 0) AS BIGINT) AS sg,
        |    CAST(coalesce(sum(gap_s*gap_s), 0) AS BIGINT) AS sg2
        |  FROM b GROUP BY user_id),
        |f AS (
        |  SELECT user_id, n_events, max_burst_1d, n_types,
        |    CAST(max_burst_1d >= $VelocityBurstN AS BIGINT) AS r_burst,
        |    CAST(n_types <= 2 AS BIGINT) AS r_lowdiv,
        |    CAST(n_g >= 5 AND sg > 0
        |      AND (n_g*sg2 - sg*sg)*4 < sg*sg AS BIGINT) AS r_regular
        |  FROM g)
        |SELECT user_id, n_events, max_burst_1d, n_types,
        |  r_burst, r_lowdiv, r_regular,
        |  r_burst + r_lowdiv + r_regular AS score
        |FROM f ORDER BY user_id""".stripMargin),
    "ev_slo_burn" -> GQuery.sql(sloBurn,
      s"""WITH d AS (
        |  SELECT epoch_ms(ts) // 86400000 AS day, count(*) AS n_events,
        |    count(*) FILTER (event_type = 'error') AS n_errors
        |  FROM events GROUP BY 1),
        |b AS (
        |  SELECT day, n_events, n_errors,
        |    (2*n_errors*1000000 + n_events) // (2*n_events) AS burn_ppm,
        |    CAST((2*n_errors*1000000 + n_events) // (2*n_events)
        |      > $SloBudgetPpm AS BIGINT) AS breached
        |  FROM d)
        |SELECT day, n_events, n_errors, burn_ppm, breached,
        |  CAST(sum(breached) OVER (ORDER BY day) AS BIGINT)
        |    AS breach_days_to_date
        |FROM b ORDER BY day""".stripMargin),
    "ev_cusum_changepoints" -> GQuery.sql(cusumChangepoints,
      s"""WITH h AS (
        |  SELECT epoch_ms(ts) // 3600000 AS hour, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS t, count(*) AS n FROM h),
        |c AS (
        |  SELECT hour, cnt,
        |    CAST(sum(cnt) OVER (ORDER BY hour) AS BIGINT) AS cum_events,
        |    CAST(row_number() OVER (ORDER BY hour) AS BIGINT) AS k
        |  FROM h)
        |SELECT hour, cnt, cum_events,
        |  n * cum_events - k * t AS drift_xn
        |FROM c, t
        |ORDER BY abs(n * cum_events - k * t) DESC, hour
        |LIMIT $CusumTopK""".stripMargin),
    "ev_outage_census" -> GQuery.sql(outageCensus,
      """WITH m AS (
        |  SELECT DISTINCT epoch_ms(ts) // 60000 AS minute FROM events),
        |g AS (
        |  SELECT lead(minute) OVER (ORDER BY minute) - minute AS gap FROM m),
        |b AS (
        |  SELECT CASE WHEN gap <= 1 THEN 'a_adjacent'
        |              WHEN gap < 5 THEN 'b_2_4'
        |              WHEN gap < 10 THEN 'c_5_9'
        |              WHEN gap < 30 THEN 'd_10_29'
        |              ELSE 'e_ge_30' END AS band, gap
        |  FROM g WHERE gap IS NOT NULL)
        |SELECT band, count(*) AS n_gaps, max(gap) AS max_gap,
        |  CAST(sum(gap - 1) AS BIGINT) AS missing_minutes
        |FROM b GROUP BY band ORDER BY band""".stripMargin),
    "ev_velocity_flags" -> GQuery.sql(velocityFlags,
      s"""WITH w AS (
        |  SELECT user_id,
        |    count(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |      RANGE BETWEEN 86399999 PRECEDING AND CURRENT ROW) AS burst
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        |  max(burst) AS max_burst_1d,
        |  CAST(max(burst) >= $VelocityBurstN AS BIGINT) AS flagged
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin),
    "ev_multitouch_attribution" -> GQuery.sql(multitouchAttribution,
      s"""WITH p AS (
        |  SELECT user_id, event_id AS p_id, epoch_ms(ts) AS p_ms
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (
        |  SELECT user_id, event_type AS touch_type, epoch_ms(ts) AS t_ms
        |  FROM events WHERE event_type IN ('view', 'click')),
        |j AS (
        |  SELECT p.p_id, t.touch_type
        |  FROM p JOIN t ON p.user_id = t.user_id
        |    AND t.t_ms <= p.p_ms AND p.p_ms - t.t_ms < $MtaWindowMs),
        |n AS (SELECT p_id, count(*) AS n_touch FROM j GROUP BY p_id)
        |SELECT j.touch_type, count(*) AS n_touches,
        |  CAST(sum((2*1000000 + n.n_touch) // (2*n.n_touch)) AS BIGINT)
        |    AS credit_ppm_sum,
        |  count(DISTINCT j.p_id) AS n_purchases
        |FROM j JOIN n ON j.p_id = n.p_id
        |GROUP BY j.touch_type ORDER BY j.touch_type""".stripMargin),
    "ev_conversion_delay" -> GQuery.sql(conversionDelay,
      """WITH v AS (
        |  SELECT user_id, min(epoch_ms(ts)) AS v_ms FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |p AS (
        |  SELECT user_id, min(epoch_ms(ts)) AS p_ms FROM events
        |  WHERE event_type = 'purchase' GROUP BY user_id),
        |b AS (
        |  SELECT
        |    CASE WHEN p.p_ms IS NULL THEN 'e_no_purchase'
        |         WHEN p.p_ms < v.v_ms THEN 'f_purchase_first'
        |         WHEN p.p_ms - v.v_ms < 3600000 THEN 'a_lt_1h'
        |         WHEN p.p_ms - v.v_ms < 86400000 THEN 'b_lt_1d'
        |         WHEN p.p_ms - v.v_ms < 259200000 THEN 'c_lt_3d'
        |         ELSE 'd_ge_3d' END AS band,
        |    CASE WHEN p.p_ms >= v.v_ms THEN p.p_ms - v.v_ms END AS delay_ms
        |  FROM v LEFT JOIN p USING (user_id))
        |SELECT band, count(*) AS n_users,
        |  CAST(coalesce(sum(delay_ms), 0) AS BIGINT) AS sum_delay_ms,
        |  CAST(coalesce(max(delay_ms), 0) AS BIGINT) AS max_delay_ms
        |FROM b GROUP BY band ORDER BY band""".stripMargin),
    "ev_seasonal_baseline" -> GQuery.sql(seasonalBaseline,
      """WITH h AS (
        |  SELECT epoch_ms(ts) // 3600000 AS hour, event_type,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |e1 AS (
        |  SELECT a.event_type, count(*) AS n_h1,
        |    (2*CAST(sum(abs(a.cnt - b.cnt)) AS BIGINT)*100 + count(*))
        |      // (2*count(*)) AS mae_h1_x100
        |  FROM h a JOIN h b ON a.event_type = b.event_type
        |    AND a.hour = b.hour + 1 GROUP BY a.event_type),
        |e24 AS (
        |  SELECT a.event_type, count(*) AS n_h24,
        |    (2*CAST(sum(abs(a.cnt - b.cnt)) AS BIGINT)*100 + count(*))
        |      // (2*count(*)) AS mae_h24_x100
        |  FROM h a JOIN h b ON a.event_type = b.event_type
        |    AND a.hour = b.hour + 24 GROUP BY a.event_type),
        |e168 AS (
        |  SELECT a.event_type, count(*) AS n_h168,
        |    (2*CAST(sum(abs(a.cnt - b.cnt)) AS BIGINT)*100 + count(*))
        |      // (2*count(*)) AS mae_h168_x100
        |  FROM h a JOIN h b ON a.event_type = b.event_type
        |    AND a.hour = b.hour + 168 GROUP BY a.event_type)
        |SELECT event_type, n_h1, mae_h1_x100, n_h24, mae_h24_x100,
        |  n_h168, mae_h168_x100
        |FROM e1 JOIN e24 USING (event_type) JOIN e168 USING (event_type)
        |ORDER BY event_type""".stripMargin),
    "ev_dwell_by_type" -> GQuery.sql(dwellByType,
      """WITH g AS (
        |  SELECT event_type,
        |    lead(epoch_ms(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(ts), event_id) - epoch_ms(ts) AS dwell_ms
        |  FROM events)
        |SELECT event_type, count(*) AS n_gaps,
        |  CAST(sum(dwell_ms) AS BIGINT) AS sum_ms,
        |  max(dwell_ms) AS max_ms,
        |  (2*CAST(sum(dwell_ms) AS BIGINT) + count(*)) // (2*count(*)) AS mean_ms
        |FROM g WHERE dwell_ms IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin),
    "ev_lorenz_curve" -> GQuery.sql(lorenzCurve,
      """WITH per AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY user_id),
        |bands AS (
        |  SELECT CAST(length(bin(cents)) AS BIGINT) AS band,
        |    count(*) AS n_users, CAST(sum(cents) AS BIGINT) AS sum_cents
        |  FROM per GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_users) AS BIGINT) AS tu,
        |               CAST(sum(sum_cents) AS BIGINT) AS tc FROM bands),
        |cum AS (
        |  SELECT a.band, max(a.n_users) AS n_users,
        |    max(a.sum_cents) AS sum_cents,
        |    CAST(sum(b.n_users) AS BIGINT) AS cum_users,
        |    CAST(sum(b.sum_cents) AS BIGINT) AS cum_cents
        |  FROM bands a JOIN bands b ON b.band >= a.band
        |  GROUP BY a.band)
        |SELECT band, n_users, sum_cents,
        |  (2*cum_users*1000000 + tu) // (2*tu) AS cum_users_ppm,
        |  (2*cum_cents*1000000 + tc) // (2*tc) AS cum_cents_ppm
        |FROM cum CROSS JOIN tot ORDER BY band DESC""".stripMargin),
    "ev_peak_concurrency" -> GQuery.sql(peakConcurrency,
      """WITH flagged AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 30*60*1000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
        |sess AS (
        |  SELECT user_id, ms,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS seq
        |  FROM flagged),
        |iv AS (SELECT min(ms) AS s, max(ms) AS e
        |       FROM sess GROUP BY user_id, seq),
        |d AS (
        |  SELECT s AS ms, CAST(1 AS BIGINT) AS d FROM iv
        |  UNION ALL SELECT e + 1, -1 FROM iv),
        |r AS (
        |  SELECT ms, d,
        |    CAST(sum(d) OVER (ORDER BY ms, d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS conc
        |  FROM d)
        |SELECT ms // 3600000 AS hour, max(conc) AS peak_concurrency,
        |  count(*) AS n_changes
        |FROM r GROUP BY 1 ORDER BY hour""".stripMargin),
    "ev_feature_snapshot" -> GQuery.sql(featureSnapshot,
      """WITH f AS (
        |  SELECT event_id, user_id, epoch_ms(ts) AS ms,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |w AS (
        |  SELECT event_id, user_id, ms,
        |    count(*) OVER pre AS n_prior,
        |    coalesce(CAST(sum(cents) OVER pre AS BIGINT), 0) AS cents_prior,
        |    coalesce(ms - min(ms) OVER pre, -1) AS ms_since_first,
        |    coalesce(ms - max(ms) OVER pre, -1) AS ms_since_last
        |  FROM f
        |  WINDOW pre AS (PARTITION BY user_id ORDER BY ms, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, n_prior, cents_prior,
        |  ms_since_first, ms_since_last
        |FROM w WHERE event_id % 10 = 7 ORDER BY event_id""".stripMargin),
    "ev_user_entropy" -> GQuery.sql(userEntropy,
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY user_id, event_type),
        |n AS (
        |  SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
        |    count(*) AS n_types,
        |    sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) AS clog
        |  FROM c GROUP BY user_id)
        |SELECT user_id, n_events, n_types,
        |  round(log2(CAST(n_events AS DOUBLE)) - clog / CAST(n_events AS DOUBLE), 6)
        |    AS entropy
        |FROM n ORDER BY user_id""".stripMargin),
    "ev_streak_census" -> GQuery.sql(streakCensus,
      """WITH du AS (
        |  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        |i AS (
        |  SELECT user_id,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
        |  FROM du),
        |s AS (SELECT user_id, island, count(*) AS len
        |      FROM i GROUP BY user_id, island)
        |SELECT user_id, count(*) AS n_streaks,
        |  CAST(sum(len) AS BIGINT) AS n_active_days,
        |  max(len) AS max_streak
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin),
    "ev_rfm_segments" -> GQuery.sql(rfmSegments,
      """WITH per AS (
        |  SELECT user_id, max(epoch_ms(ts)) AS last_ms, count(*) AS freq,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY user_id),
        |t AS (
        |  SELECT count(*) AS n_users, max(last_ms) AS corpus_ms,
        |    CAST(sum(last_ms) AS BIGINT) AS sum_last_ms,
        |    CAST(sum(freq) AS BIGINT) AS tot_freq,
        |    CAST(sum(cents) AS BIGINT) AS tot_cents
        |  FROM per),
        |s AS (
        |  SELECT
        |    CAST(CASE WHEN 3*(corpus_ms - last_ms)*n_users <= 2*(n_users*corpus_ms - sum_last_ms) THEN 3
        |         WHEN 3*(corpus_ms - last_ms)*n_users >= 4*(n_users*corpus_ms - sum_last_ms) THEN 1
        |         ELSE 2 END AS BIGINT) AS r,
        |    CAST(CASE WHEN 3*freq*n_users >= 4*tot_freq THEN 3
        |         WHEN 3*freq*n_users <= 2*tot_freq THEN 1
        |         ELSE 2 END AS BIGINT) AS f,
        |    CAST(CASE WHEN 3*cents*n_users >= 4*tot_cents THEN 3
        |         WHEN 3*cents*n_users <= 2*tot_cents THEN 1
        |         ELSE 2 END AS BIGINT) AS m,
        |    freq, cents
        |  FROM per CROSS JOIN t)
        |SELECT r, f, m, count(*) AS n_users,
        |  CAST(sum(freq) AS BIGINT) AS sum_events,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM s GROUP BY r, f, m ORDER BY r, f, m""".stripMargin),
    "ev_interarrival_census" -> GQuery.sql(interarrivalCensus,
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
        |      PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS gap_ms
        |  FROM events),
        |b AS (
        |  SELECT user_id,
        |    CASE WHEN gap_ms < 3600000 THEN 'a_lt_1h'
        |         WHEN gap_ms < 21600000 THEN 'b_lt_6h'
        |         WHEN gap_ms < 86400000 THEN 'c_lt_1d'
        |         WHEN gap_ms < 259200000 THEN 'd_lt_3d'
        |         ELSE 'e_ge_3d' END AS band,
        |    gap_ms
        |  FROM g WHERE gap_ms IS NOT NULL)
        |SELECT band, count(*) AS n_gaps,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(gap_ms) AS BIGINT) AS sum_ms,
        |  max(gap_ms) AS max_ms,
        |  (2*CAST(sum(gap_ms) AS BIGINT) + count(*)) // (2*count(*)) AS mean_ms
        |FROM b GROUP BY band ORDER BY band""".stripMargin),
    "ev_cohort_ltv" -> GQuery.sql(cohortLtv,
      """WITH ev AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id),
        |g AS (
        |  SELECT c.cohort_day, e.day - c.cohort_day AS age,
        |    count(DISTINCT e.user_id) AS n_users,
        |    CAST(sum(e.cents) AS BIGINT) AS cents
        |  FROM ev e JOIN c USING (user_id)
        |  GROUP BY c.cohort_day, e.day - c.cohort_day)
        |SELECT cohort_day, age, n_users, cents,
        |  CAST(sum(cents) OVER (PARTITION BY cohort_day ORDER BY age
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_cents
        |FROM g ORDER BY cohort_day, age""".stripMargin),
    "ev_lateness_census" -> GQuery.sql(latenessCensus,
      """WITH r AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS rn
        |  FROM events),
        |a AS (
        |  SELECT user_id, event_id, ms,
        |    rn + CASE WHEN rn % 20 = 7 THEN 12
        |              WHEN rn % 10 = 0 THEN 1
        |              WHEN rn % 10 = 5 THEN 3
        |              ELSE 0 END AS arrival
        |  FROM r),
        |l AS (
        |  SELECT user_id,
        |    max(ms) OVER (PARTITION BY user_id ORDER BY arrival, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ms
        |      AS late_ms
        |  FROM a),
        |b AS (
        |  SELECT CASE WHEN late_ms = 0 THEN 'a_on_time'
        |              WHEN late_ms < 21600000 THEN 'b_lt_6h'
        |              WHEN late_ms < 86400000 THEN 'c_lt_1d'
        |              WHEN late_ms < 259200000 THEN 'd_lt_3d'
        |              ELSE 'e_ge_3d' END AS band,
        |    late_ms
        |  FROM l)
        |SELECT band, count(*) AS n_events,
        |  max(late_ms) AS max_late_ms,
        |  CAST(sum(late_ms) AS BIGINT) AS sum_late_ms
        |FROM b GROUP BY band ORDER BY band""".stripMargin),
    "ev_dau_mau" -> GQuery.sql(dauMau,
      """WITH du AS (
        |  SELECT DISTINCT epoch_ms(ts) // 86400000 AS day, user_id FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
        |bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM du),
        |w AS (
        |  SELECT DISTINCT u.day + s.i AS day, u.user_id
        |  FROM du u CROSS JOIN (SELECT unnest(range(0, 7)) AS i) s),
        |mau AS (SELECT day, count(*) AS wau7 FROM w GROUP BY day)
        |SELECT d.day AS day, d.dau AS dau, m.wau7 AS wau7,
        |  (2*d.dau*1000000 + m.wau7) // (2*m.wau7) AS stickiness_ppm
        |FROM dau d JOIN mau m ON d.day = m.day CROSS JOIN bounds
        |WHERE d.day >= lo + 6 AND d.day <= hi
        |ORDER BY day""".stripMargin),
    "ev_inactivity_churn" -> GQuery.sql(inactivityChurn,
      """WITH last AS (
        |  SELECT user_id, max(epoch_ms(ts)) AS last_ms FROM events GROUP BY user_id),
        |mx AS (SELECT max(last_ms) AS max_ms FROM last),
        |d AS (
        |  SELECT user_id, (max_ms - last_ms) // 86400000 AS days_inactive
        |  FROM last CROSS JOIN mx),
        |b AS (
        |  SELECT user_id, days_inactive,
        |    CASE WHEN days_inactive < 7 THEN 'active'
        |         WHEN days_inactive < 30 THEN 'at_risk'
        |         ELSE 'churned' END AS band
        |  FROM d)
        |SELECT band, count(*) AS n_users,
        |  CAST(sum(days_inactive) AS BIGINT) AS sum_days,
        |  max(days_inactive) AS max_days
        |FROM b GROUP BY band ORDER BY band""".stripMargin),
    "ev_sliding_active" -> GQuery.sql(slidingActive,
      """WITH w AS (
        |  SELECT user_id,
        |    unnest([epoch_ms(date_trunc('hour', ts)),
        |            epoch_ms(date_trunc('hour', ts)) - 3600000]) AS win_ms
        |  FROM events)
        |SELECT win_ms, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users
        |FROM w GROUP BY 1 ORDER BY win_ms""".stripMargin),
    "ev_heatmap" -> GQuery.sql(heatmap,
      """WITH c AS (
        |  SELECT ((epoch_ms(ts) // 86400000) + 4) % 7 AS dow,
        |    (epoch_ms(ts) % 86400000) // 3600000 AS hour,
        |    user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
        |  FROM events)
        |SELECT dow, hour, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(vc) AS BIGINT) AS value_cents
        |FROM c GROUP BY 1, 2 ORDER BY dow, hour""".stripMargin),
    "ev_markov_transitions" -> GQuery.sql(markovTransitions,
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(ts), event_id) AS to_type
        |  FROM events),
        |trans AS (
        |  SELECT from_type, to_type, count(*) AS n_trans
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |totals AS (
        |  SELECT from_type, CAST(sum(n_trans) AS BIGINT) AS n_from
        |  FROM trans GROUP BY 1)
        |SELECT t.from_type, t.to_type, t.n_trans, tot.n_from,
        |  CAST((2*t.n_trans*1000000 + tot.n_from) // (2*tot.n_from) AS BIGINT)
        |    AS prob_ppm
        |FROM trans t JOIN totals tot USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin),
    // NB: session_window starts a NEW session at diff == gap (window is
    // [start, last+gap)), so the replay splits on >=, not > (the manual
    // `sessionize` keeps the > convention — both are valid gap
    // definitions; each is pinned against its own oracle).
    "ev_session_window_native" -> GQuery.sql(sessionWindowNative,
      """WITH flagged AS (
        |  SELECT user_id, event_id, value, epoch_ms(ts) AS ms,
        |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w >= 30*60*1000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
        |sessions AS (
        |  SELECT user_id, value, ms,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM flagged)
        |SELECT user_id,
        |  min(ms) AS session_start_ms, max(ms) AS session_end_ms,
        |  count(*) AS n_events, round(sum(value), 2) AS value_sum
        |FROM sessions GROUP BY user_id, session_seq
        |ORDER BY user_id, session_start_ms""".stripMargin),
    "ev_resample_ffill" -> GQuery.sql(resampleFfill,
      s"""WITH hourly AS (
        |  SELECT user_id, epoch_ms(date_trunc('hour', ts)) AS hour_ms,
        |    count(*) AS n, round(sum(value), 2) AS vs
        |  FROM events WHERE user_id < $ResampleUsers GROUP BY 1, 2),
        |bounds AS (
        |  SELECT user_id, min(hour_ms) AS lo, max(hour_ms) AS hi
        |  FROM hourly GROUP BY 1),
        |grid AS (
        |  SELECT user_id, unnest(range(lo, hi + 1, 3600000)) AS hour_ms
        |  FROM bounds)
        |SELECT g.user_id, g.hour_ms, coalesce(h.n, 0) AS n_events,
        |  last_value(h.vs IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.hour_ms
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
        |FROM grid g LEFT JOIN hourly h
        |  ON h.user_id = g.user_id AND h.hour_ms = g.hour_ms
        |ORDER BY g.user_id, g.hour_ms""".stripMargin),
    "ev_session_paths" -> GQuery.sql(sessionPaths,
      s"""WITH flagged AS (
        |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
        |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 30*60*1000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
        |sessions AS (
        |  SELECT user_id, event_id, event_type, ms,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM flagged),
        |paths AS (
        |  SELECT user_id, session_seq,
        |    string_agg(event_type, '>' ORDER BY ms, event_id) AS path
        |  FROM sessions GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions FROM paths
        |GROUP BY path ORDER BY n_sessions DESC, path LIMIT $PathTopK""".stripMargin),
    "ev_gap_stats" -> GQuery.sql(gapStats,
      """WITH hours AS (
        |  SELECT DISTINCT user_id, epoch_ms(date_trunc('hour', ts)) AS hour_ms
        |  FROM events),
        |gapped AS (
        |  SELECT user_id, hour_ms,
        |    CAST((hour_ms - lag(hour_ms) OVER (PARTITION BY user_id ORDER BY hour_ms))
        |      / 3600000 AS BIGINT) AS gap_h
        |  FROM hours)
        |SELECT user_id,
        |  count(*) AS n_active_hours,
        |  CAST((max(hour_ms) - min(hour_ms)) / 3600000 AS BIGINT) + 1 AS span_hours,
        |  CAST((max(hour_ms) - min(hour_ms)) / 3600000 AS BIGINT) + 1 - count(*)
        |    AS missing_hours,
        |  count(*) FILTER (WHERE gap_h > 1) AS n_gaps,
        |  coalesce(max(gap_h - 1), 0) AS max_skip_hours
        |FROM gapped GROUP BY user_id ORDER BY user_id""".stripMargin),
    "ev_anomaly" -> GQuery.sql(anomaly,
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hr, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |stats AS (
        |  SELECT user_id, round(avg(cnt) + 3.0 * stddev_samp(cnt), 6) AS thr
        |  FROM hourly GROUP BY user_id)
        |SELECT h.user_id, epoch_ms(h.hr) AS hour_ms, h.cnt AS cnt, s.thr AS thr
        |FROM hourly h JOIN stats s USING (user_id)
        |WHERE CAST(h.cnt AS DOUBLE) > s.thr
        |ORDER BY user_id, hour_ms""".stripMargin),
    "ev_range_join" -> GQuery.sql(rangeJoinAttribution,
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |p AS (SELECT event_id, user_id, ms AS p_ms FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ms AS c_ms FROM e WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.p_ms,
        |  count(c.c_ms) AS n_clicks_1h,
        |  max(c.c_ms) AS last_click_ms
        |FROM p LEFT JOIN c ON c.user_id = p.user_id
        |  AND c.c_ms >= p.p_ms - 3600000 AND c.c_ms < p.p_ms
        |GROUP BY 1, 2, 3 ORDER BY event_id""".stripMargin),
    "ev_funnel" -> GQuery.sql(funnel,
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |s1 AS (SELECT user_id, min(ms) AS t_view FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(ms) AS t_click FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND ms > t_view GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(ms) AS t_purchase FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND ms > t_click GROUP BY 1)
        |SELECT s1.user_id, t_view, t_click, t_purchase
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin),
    "ev_asof_join_native" -> GQuery.sql(asofJoinNative,
      """SELECT p.event_id, p.user_id,
        |  p.us AS purchase_us,
        |  s.event_id AS signup_event_id,
        |  s.us AS signup_us
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS us
        |      FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT event_id, user_id, epoch_us(ts) AS us
        |           FROM events WHERE event_type = 'signup') s
        |  ON p.user_id = s.user_id AND p.us >= s.us
        |ORDER BY p.event_id""".stripMargin),
    "ev_asof_join" -> GQuery.sql(asofJoin,
      """SELECT p.event_id, p.user_id,
        |  p.us AS purchase_us,
        |  s.event_id AS signup_event_id,
        |  s.us AS signup_us
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS us
        |      FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT event_id, user_id, epoch_us(ts) AS us
        |           FROM events WHERE event_type = 'signup') s
        |  ON p.user_id = s.user_id AND p.us >= s.us
        |ORDER BY p.event_id""".stripMargin),
    "ev_retention" -> GQuery.sql(retention,
      """WITH active AS (
        |  SELECT DISTINCT user_id, epoch_ms(date_trunc('hour', ts)) AS hour_ms
        |  FROM events)
        |SELECT a.hour_ms AS hour_ms, count(DISTINCT a.user_id) AS retained_users
        |FROM active a JOIN active b
        |  ON a.user_id = b.user_id AND b.hour_ms = a.hour_ms + 3600000
        |GROUP BY 1 ORDER BY 1""".stripMargin),
    "ev_trailing_window" -> GQuery.sql(trailingWindow,
      """WITH c AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events)
        |SELECT user_id, event_id, ms,
        |  count(*) OVER w AS n_1h,
        |  CAST(sum(vc) OVER w AS DOUBLE) / 100.0 AS sum_1h
        |FROM c
        |WINDOW w AS (PARTITION BY user_id ORDER BY ms
        |  RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ms, event_id""".stripMargin),
    "ev_ewma" -> GQuery.sql(ewma,
      s"""WITH c AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    CAST(round(value * 100) AS BIGINT) AS vc,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(ts), event_id) AS rn
        |  FROM events),
        |x AS (
        |  SELECT user_id, rn + k AS rnt, vc * (1 << (${EwmaLags - 1} - k)) AS w
        |  FROM c CROSS JOIN (SELECT unnest(range($EwmaLags)) AS k) t),
        |s AS (SELECT user_id, rnt, CAST(sum(w) AS BIGINT) AS sw
        |      FROM x GROUP BY 1, 2)
        |SELECT c.user_id, c.event_id, c.ms,
        |  CAST(s.sw AS DOUBLE) / ${1L << (EwmaLags - 1)}.0 AS ewma16
        |FROM c JOIN s ON c.user_id = s.user_id AND c.rn = s.rnt
        |ORDER BY c.user_id, c.ms, c.event_id""".stripMargin),
    "ev_scd2_intervals" -> GQuery.sql(scd2Intervals,
      """WITH c AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms, value,
        |    event_type = 'error' AS is_delete
        |  FROM events),
        |iv AS (
        |  SELECT user_id, event_id, ms, value, is_delete,
        |    lead(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id)
        |      AS valid_to_ms
        |  FROM c)
        |SELECT user_id, event_id, ms AS valid_from_ms, valid_to_ms, value,
        |  valid_to_ms IS NULL AS is_current
        |FROM iv WHERE NOT is_delete
        |ORDER BY user_id, valid_from_ms, event_id""".stripMargin),
    "ev_incremental_rollup" -> GQuery.sql(incrementalRollup,
      """WITH c AS (
        |  SELECT event_type, epoch_ms(date_trunc('hour', ts)) AS hour_ms,
        |    CAST(round(value * 100) AS BIGINT) AS vc, value
        |  FROM events)
        |SELECT event_type, hour_ms, count(*) AS n_events,
        |  round(CAST(sum(vc) AS DOUBLE) / 100.0, 2) AS value_sum,
        |  CAST((2 * sum(vc) * 100 + count(*)) // (2 * count(*)) AS DOUBLE)
        |    / 10000.0 AS value_avg,
        |  min(value) AS value_min,
        |  max(value) AS value_max
        |FROM c GROUP BY 1, 2 ORDER BY event_type, hour_ms""".stripMargin),
    "ev_hourly_rollup" -> GQuery.sql(hourlyRollup,
      """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
        |  count(*) AS n_events,
        |  round(sum(value), 2) AS value_sum,
        |  count(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "ev_user_activity" -> GQuery.sql(userActivity,
      """SELECT user_id, count(*) AS n_events,
        |  count(DISTINCT event_type) AS n_types,
        |  round(sum(value), 2) AS value_sum,
        |  min(epoch_ms(ts)) AS first_ms,
        |  max(epoch_ms(ts)) AS last_ms
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
    "ev_sessionize" -> GQuery.sql(sessionize,
      """WITH flagged AS (
        |  SELECT user_id, event_id, value, epoch_ms(ts) AS ms,
        |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 30*60*1000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
        |sessions AS (
        |  SELECT user_id, event_id, value, ms,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq,
        |  min(ms) AS session_start_ms, max(ms) AS session_end_ms,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM sessions GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin),
    "ev_json_extract" -> GQuery.sql(jsonExtract,
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
  )
}
