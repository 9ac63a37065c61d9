package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.load

/** Event-stream analytics over the `events` table — the batch twins of
  * the Structured Streaming operators in graft.streaming (same logical
  * transforms applied to a bounded frame). The reference's only time
  * constructs are a month bucket and a trailing-24h filter (SURVEY
  * §2.7); these extend them to proper tumbling/sliding/session windows.
  *
  * Scale notes: tumbling/sliding windows aggregate on (bucket, type)
  * keys — one shuffle, partial aggregation map-side. Sessionization is
  * a per-user sort (window function) — shuffles once on user_id; at
  * 100 TB you'd range-partition by user and day first, same plan shape.
  */
object EventAnalytics {

  /** Tumbling 1-hour windows per event type (window().start exported as
    * a second-precision string for engine-portable hashing). */
  def tumblingCounts(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
              col("event_type"), col("n_events"), col("total_value"))
      .orderBy("window_start", "event_type")

  /** Sliding windows: 1-hour length, 30-minute slide — each event lands
    * in exactly two windows. */
  def slidingCounts(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
              col("n_events"), col("total_value"))
      .orderBy("window_start")

  /** Gap-based sessionization (30-minute inactivity gap): classic
    * lag → gap flag → running sum over a per-user ordered window.
    * Output: one row per session. */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    load(s, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
             col("ts").cast("long") - col("prev_ts").cast("long") > 1800L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
           count(lit(1)).as("n_events"),
           round(sum(col("value")), 2).as("session_value"))
      .orderBy("user_id", "session_id")
  }

  /** Event funnel: per user, did view precede purchase? Global
    * conversion stats — min-timestamp comparison per user. */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
    val perUser = ev.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("ts"))).as("first_view"),
           min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
    perUser.agg(
      count(lit(1)).as("n_users"),
      count(col("first_view")).as("n_viewers"),
      count(col("first_purchase")).as("n_purchasers"),
      count(when(col("first_view") < col("first_purchase"), lit(1))).as("n_converted"))
  }

  /** As-of attribution: each purchase matched to the user's most recent
    * view at-or-before purchase time (graft.ops.AsOfJoin — one shuffle
    * on user_id, no range cross-join). Views deduped to one per
    * (user, ts) for determinism. */
  def asofAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts").as("view_ts"))
      .agg(min(col("event_id")).as("view_event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    graft.ops.AsOfJoin.asofBackward(purchases, views, "user_id", "ts", "view_ts")
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        col("asof_view_event_id").as("view_event_id"),
        date_format(col("asof_view_ts"), "yyyy-MM-dd HH:mm:ss").as("view_ts"),
        (unix_micros(col("ts")) - unix_micros(col("asof_view_ts"))).as("lag_micros"))
      .orderBy("event_id")
  }

  /** Distribution stats per event type: exact interpolated percentiles
    * (p50/p95/p99) — Spark `percentile` and DuckDB `quantile_cont`
    * share the linear-interpolation definition, so this is fully
    * oracle-checked. At 100 TB you'd switch to approx_percentile
    * (t-digest) and trade the oracle for an error-bound spec. */
  def valuePercentiles(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "events")
      .groupBy(col("event_type"))
      // one array-percentile aggregate, not three scalar ones: each
      // percentile() buffers every group value, so the fused form cuts
      // aggregation state and merge cost 3×. (At 100 TB switch to
      // approx_percentile — exact percentiles buffer the group.)
      .agg(expr("percentile(value, array(0.5D, 0.95D, 0.99D))").as("ps"),
           count(lit(1)).as("n"))
      .select(col("event_type"),
        round(element_at(col("ps"), 1), 6).as("p50"),
        round(element_at(col("ps"), 2), 6).as("p95"),
        round(element_at(col("ps"), 3), 6).as("p99"),
        col("n"))
      .orderBy("event_type")

  /** Approximate percentiles by DETERMINISTIC hash-sampling — the
    * scale path next to [[valuePercentiles]]'s exact buffering form.
    * The sample is a pure u32(event_id) threshold filter (10%), so it
    * pushes to the scan, costs no extra shuffle, and buffers 10× less
    * per group; and because the SAME subset reproduces in any engine
    * (portable integer hash, exact integer threshold), this approximate
    * operator still sits under an EXACT DuckDB oracle — the same trick
    * that made the KMV/CMS sketches hash-checkable. At 100 TB the rate
    * dials down (1e-4 keeps ~10M rows per 100B-row type) while the scan
    * stays one pass; exact percentile() instead buffers every group
    * value forever. Sampling error on these 20k-rows/type groups is
    * ~1-2% at mid quantiles (spec-checked against the exact form). */
  def sampledPercentiles(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "events")
      .filter(graft.ext.Sampling.u32(col("event_id")) < lit(429496730L)) // 0.1 * 2^32
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, array(0.5D, 0.95D, 0.99D))").as("ps"),
           count(lit(1)).as("n_sampled"))
      .select(col("event_type"),
        round(element_at(col("ps"), 1), 6).as("p50"),
        round(element_at(col("ps"), 2), 6).as("p95"),
        round(element_at(col("ps"), 3), 6).as("p99"),
        col("n_sampled"))
      .orderBy("event_type")

  /** Hierarchical rollup (date × type) via grouping sets — subtotal
    * rows carry NULL group keys exactly as ANSI ROLLUP defines; one
    * shuffle computes all three granularities. */
  def dailyTypeRollup(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "events")
      .rollup(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(asc_nulls_first("day"), asc_nulls_first("event_type"))

  /** x23 again, but through the NATIVE as-of operator (plans.AsOfJoinExec)
    * — puts the custom LogicalPlan→SparkPlan path under the same DuckDB
    * ASOF JOIN oracle as the composition. */
  def asofAttributionNative(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts")).agg(min(col("event_id")).as("view_event_id"))
      .select(col("user_id"), unix_micros(col("ts")).as("view_us"), col("view_event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("purchase_us"))
    graft.ops.AsOfJoin.asofNative(purchases, views, "user_id", "purchase_us", "view_us")
      .select(col("event_id"), col("user_id"),
        date_format(timestamp_micros(col("purchase_us")), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        col("asof_view_event_id").as("view_event_id"),
        date_format(timestamp_micros(col("asof_view_us")), "yyyy-MM-dd HH:mm:ss").as("view_ts"),
        (col("purchase_us") - col("asof_view_us")).as("lag_micros"))
      .orderBy("event_id")
  }

  /** Semi-structured extraction: parse the JSON props column with a
    * declared schema (`from_json` — typed once per row, vectorizable,
    * vs `get_json_object` which re-parses the string per probed path)
    * and aggregate the extracted field. The shape of every "pull a
    * field out of the raw event blob" query at scale: schema-on-read
    * with the parse pushed into the scan projection, no UDF. */
  def propsJsonRollup(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "events")
      .withColumn("k", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("k")).cast("long").as("sum_k"),
           min(col("k")).as("min_k"),
           max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** Daily active / new / cumulative users — the growth audit: DAU is a
    * per-day exact distinct, new users come from each user's first-seen
    * day (one user-keyed aggregate), and the running total rides a
    * window over the per-day frame (a few hundred rows after
    * aggregation — the single-partition window is on the TINY rollup,
    * never the raw events; at 100 TB the heavy lifting is the two
    * hash aggs, both map-side combined). */
  def dailyActiveUsers(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
    val dau = ev.groupBy("day").agg(count_distinct(col("user_id")).as("dau"))
    val firstSeen = ev.groupBy("user_id").agg(min("day").as("day"))
    val newUsers = firstSeen.groupBy("day").agg(count(lit(1)).as("new_users"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    dau.join(newUsers, Seq("day"), "left")
      .na.fill(0L, Seq("new_users"))
      .withColumn("cum_users", sum("new_users").over(w))
      .orderBy("day")
  }

  /** Weekly retention cohorts: users grouped by first-seen day, counted
    * distinct in each subsequent week offset — the classic retention
    * triangle. Week offsets are exact integer day-diffs div 7 (no
    * calendar-week numbering, which differs across engines). Two
    * user-keyed aggregates + one (cohort, week) rollup; the events
    * frame joins its own tiny first-seen table on user_id. */
  def retentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
      .select(to_date(col("ts")).as("d"), col("user_id"))
    val first = ev.groupBy("user_id").agg(min("d").as("cohort"))
    ev.join(first, Seq("user_id"))
      .select(col("user_id"), col("cohort"),
        expr("datediff(d, cohort) div 7").cast("long").as("week_offset"))
      .distinct()
      .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_day", "week_offset")
  }

  /** Trailing 7-day event volume per day: a RANGE window over the day
    * ordinal (not ROWS — a missing calendar day must still bound the
    * trailing week correctly). The window runs over the per-day rollup
    * (tiny), never raw events. */
  def rollingVolume(s: SparkSession, dir: String): DataFrame = {
    val daily = load(s, dir, "events")
      .groupBy(unix_date(to_date(col("ts"))).as("day_num"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("day_value"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("day_num").rangeBetween(-6, 0)
    daily
      .withColumn("events_7d", sum("n_events").over(w))
      .withColumn("value_7d", round(sum("day_value").over(w), 2))
      .select(date_format(date_add(lit("1970-01-01").cast("date"), col("day_num")), "yyyy-MM-dd").as("day"),
        col("n_events"), col("events_7d"), col("value_7d"))
      .orderBy("day")
  }

  /** Daily-volume anomaly flags: z-score of each day's event count
    * against the corpus of days, |z| ≥ 2 flagged — the statistical
    * extension of the reference's 24h monitoring (main.py:651-668 reads
    * current volume; this says whether it is NORMAL). Day rollup is one
    * shuffle; the two-row stats frame broadcasts back over it. */
  def volumeAnomalies(s: SparkSession, dir: String): DataFrame = {
    val daily = load(s, dir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"))
    val stats = daily.agg(avg("n_events").as("mu"), stddev_samp("n_events").as("sd"))
    // sd = 0 (every day identical) → z undefined: emit NULL rather than
    // NaN, mirroring the oracle's NULLIF — engines disagree on 0/0
    val z = when(col("sd") =!= 0.0, (col("n_events") - col("mu")) / col("sd"))
    daily.crossJoin(broadcast(stats))
      .select(col("day"), col("n_events"),
        round(z, 6).as("z"),
        (abs(z) >= 2.0).cast("int").as("is_anomaly"))
      .orderBy("day")
  }

  /** Behavioral sequence mining: the 20 most common 3-event type
    * sequences users execute (consecutive by time per user) — the
    * "what do users actually do" pattern query. One shuffle to order
    * each user's stream (lead ×2 over the user partition), then a
    * count aggregate; ties broken lexicographically for determinism. */
  def topEventSequences(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead("event_type", 1).over(w))
      .withColumn("e3", lead("event_type", 2).over(w))
      .filter(col("e3").isNotNull)
      .groupBy(col("event_type").as("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(20)
  }

  /** Within-session conversion: of each user's 30-minute-gap sessions,
    * how many contain a view followed (within the session) by a
    * purchase — the sessionized refinement of the x18 lifetime funnel.
    * Reuses the x17 session assignment; one extra per-session
    * aggregate. */
  def sessionConversion(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val gapped = load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("new_session",
        when(lag("ts", 1).over(w).isNull ||
          col("ts").cast("long") - lag("ts", 1).over(w).cast("long") > 1800L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("new_session").over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy("ts", "event_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
    val perSession = gapped.groupBy("user_id", "sid")
      .agg(min(when(col("event_type") === "view", col("ts"))).as("first_view"),
           max(when(col("event_type") === "purchase", col("ts"))).as("last_purchase"))
    perSession.agg(
      count(lit(1)).as("n_sessions"),
      count(col("first_view")).as("n_with_view"),
      count(col("last_purchase")).as("n_with_purchase"),
      count(when(col("first_view") < col("last_purchase"), 1)).as("n_converted"))
  }

  /** Inter-arrival profile: per event type, stats over the gap from the
    * same user's PREVIOUS event (any type) — the arrival-process audit
    * behind session-gap and watermark-lateness tuning. Gaps are
    * microsecond-exact integers (unix_micros ≡ DuckDB epoch_us), so
    * min/max/sum are engine-exact; the average is one division at the
    * edge. Shape: one user-keyed window (same shuffle x17 already
    * needs), one small rollup. */
  def interArrivalStats(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
           min("gap_us").as("min_gap_us"),
           max("gap_us").as("max_gap_us"),
           round(sum("gap_us").cast("double") / count(lit(1)).cast("double") / 1000000.0, 2)
             .as("avg_gap_s"))
      .orderBy("event_type")
  }

  /** Calendar-spine gap filling: daily totals for RARE events (value >
    * 450 — one qualifying day at sf0.01) reported over EVERY day the
    * corpus spans, zero-filled. Dashboards and anomaly jobs need the
    * empty days present; a plain groupBy silently drops them. The spine
    * comes from one 1-row min/max aggregate exploded through sequence()
    * — no generator table. Both join sides are ≤ one row per DAY
    * regardless of corpus size; the broadcast hint goes on the rare
    * AGGREGATE (the build side — Spark cannot broadcast the preserved
    * side of a LEFT OUTER join, so hinting the spine would be silently
    * ignored). At 100 TB the join is still a broadcast of a
    * few-thousand-row frame. */
  def dailySpine(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
    val spine = ev
      .agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val rare = ev.filter(col("value") > 450)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
    spine.join(broadcast(rare), Seq("day"), "left")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
              coalesce(col("n_events"), lit(0L)).as("n_events"),
              coalesce(col("total_value"), lit(0.0)).as("total_value"))
      .orderBy("day")
  }

  /** SCD2 temporal-dimension construction from the event log: each
    * user's latest event type is treated as their current state, and
    * the history is compacted into validity intervals
    * [valid_from, valid_to) with the open interval flagged current —
    * the slowly-changing-dimension type-2 table a warehouse maintains
    * so training-data joins can ask "what was this user's state AT
    * time t" (the as-of joins x23/x29 consume exactly this shape).
    *
    * Two per-user windows: lag() collapses consecutive same-state
    * events (the SCD2 no-op-update rule), lead() closes each interval
    * at the next change. Both ride ONE (user_id)-keyed sort-shuffle —
    * Catalyst evaluates same-partitioning windows on one exchange.
    * Per-user history is bounded in any real dimension feed; a bot key
    * with millions of events takes the x94 skew report +
    * [[scd2RawSkewHardenedFor]] (bucketed pre-compaction, exactly
    * equivalent output), same mitigation family as x61. Interval edges order by (ts, event_id)
    * — full-precision microseconds plus a unique tiebreak, so the
    * compaction is deterministic in any engine; only the OUTPUT
    * rendering truncates to seconds. */
  def scd2StateIntervals(s: SparkSession, dir: String): DataFrame =
    scd2Raw(s, dir)
      .select(col("user_id"), col("state"),
        date_format(col("valid_from_ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(col("valid_to_ts"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
        col("valid_to_ts").isNull.cast("int").as("is_current"))
      .orderBy("user_id", "valid_from", "state")

  /** Full-precision SCD2 intervals (microsecond bounds) — the frame
    * x117 renders and the point-in-time join (x122) consumes. */
  def scd2Raw(s: SparkSession, dir: String): DataFrame =
    scd2RawFor(load(s, dir, "events"))

  /** Frame-level SCD2 builder (events needs user_id, event_type, ts,
    * event_id) — factored so the property spec drives the SAME pipeline
    * over generated event frames. */
  def scd2RawFor(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("event_type").as("state"),
              col("ts"), col("event_id"))
      .withColumn("prev_state", lag(col("state"), 1).over(w))
      .filter(col("prev_state").isNull || col("state") =!= col("prev_state"))
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("state"),
        col("ts").as("valid_from_ts"), col("valid_to_ts"))
  }

  /** Skew-hardened [[scd2RawFor]] — EXACTLY equivalent output
    * (property-tested row-for-row), different shuffle shape for bot
    * keys. Consecutive-same-state collapse is hierarchical: phase 1
    * collapses within (user_id, day) buckets — the hot user's millions
    * of rows split across as many partitions as days, so no single
    * window partition holds the whole key — and phase 2 re-collapses
    * the per-bucket survivors across bucket boundaries on the plain
    * (user_id) window, which now only carries CHANGE rows. Collapse is
    * associative (dropping a row only depends on its immediate
    * predecessor in (ts, event_id) order, and phase 1 preserves each
    * bucket's first row), so the phase-2 frame has exactly the plain
    * builder's change set, and lead() closes identical intervals.
    *
    * Cost trade: two keyed exchanges instead of one, so the PLAIN
    * builder stays the default for dimension-shaped feeds (bounded
    * per-user history — x117/x122); this variant is the documented
    * mitigation when the x94 skew report flags an event-log key whose
    * raw history exceeds one executor's window buffer. Its residual
    * bound: a key alternating state EVERY event keeps all its rows
    * through phase 1 — but then the SCD2 OUTPUT is that size too, and
    * no builder can beat its own result cardinality. */
  def scd2RawSkewHardenedFor(events: DataFrame): DataFrame = {
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "bucket").orderBy("ts", "event_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("event_type").as("state"),
              col("ts"), col("event_id"))
      .withColumn("bucket", to_date(col("ts")))
      .withColumn("prev_state", lag(col("state"), 1).over(wBucket))
      .filter(col("prev_state").isNull || col("state") =!= col("prev_state"))
      .withColumn("prev_state", lag(col("state"), 1).over(w))
      .filter(col("prev_state").isNull || col("state") =!= col("prev_state"))
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("state"),
        col("ts").as("valid_from_ts"), col("valid_to_ts"))
  }

  /** Point-in-time attribution over the SCD2 table: every event joined
    * to the ONE validity interval covering its timestamp — "what state
    * was this user in when they did X", the lookup a feature store /
    * training-set assembler must get right to avoid time-travel
    * leakage. Equi-key (user_id) sort-merge join with the interval
    * containment as a residual condition — never a product; per-user
    * interval lists are the bounded SCD2 history. The containment is
    * half-open ([from, to)) on full-precision microseconds, so exactly
    * one interval matches each event (the change event itself lands in
    * the interval it opens) — asserted by the spec, and the rollup is
    * engine-exact integer counts. */
  def pitAttribution(s: SparkSession, dir: String): DataFrame = {
    val iv = scd2Raw(s, dir)
      .select(col("user_id").as("iv_user"), col("state"),
        col("valid_from_ts"), col("valid_to_ts"))
    load(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
      .join(iv,
        col("user_id") === col("iv_user") &&
        col("ts") >= col("valid_from_ts") &&
        (col("valid_to_ts").isNull || col("ts") < col("valid_to_ts")))
      .groupBy(col("state"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("state", "event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x117_scd2_intervals" -> scd2StateIntervals,
    "x122_pit_attribution" -> pitAttribution,
    "x92_daily_spine" -> dailySpine,
    "x69_event_gaps" -> interArrivalStats,
    "x61_event_sequences" -> topEventSequences,
    "x62_session_conversion" -> sessionConversion,
    "x59_volume_anomalies" -> volumeAnomalies,
    "x52_retention_cohorts" -> retentionCohorts,
    "x53_rolling_volume" -> rollingVolume,
    "x49_daily_users" -> dailyActiveUsers,
    "x40_events_json" -> propsJsonRollup,
    "x29_events_asof_native" -> asofAttributionNative,
    "x24_events_percentiles" -> valuePercentiles,
    "x86_sampled_percentiles" -> sampledPercentiles,
    "x25_events_rollup" -> dailyTypeRollup,
    "x23_events_asof_attribution" -> asofAttribution,
    "x15_events_tumbling" -> tumblingCounts,
    "x16_events_sliding" -> slidingCounts,
    "x17_events_sessionize" -> sessionize,
    "x18_events_funnel" -> funnel)

  val oracles: Map[String, String] = Map(
    "x117_scd2_intervals" -> """
      WITH ordered AS (
        SELECT user_id, event_type AS state, ts, event_id,
          LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS prev_state
        FROM events),
      changes AS (
        SELECT user_id, state, ts, event_id FROM ordered
        WHERE prev_state IS NULL OR state <> prev_state),
      iv AS (
        SELECT user_id, state, ts,
          LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS valid_to_ts
        FROM changes)
      SELECT user_id, state,
        strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        strftime(valid_to_ts, '%Y-%m-%d %H:%M:%S') AS valid_to,
        CAST(CASE WHEN valid_to_ts IS NULL THEN 1 ELSE 0 END AS INTEGER)
          AS is_current
      FROM iv ORDER BY user_id, valid_from, state""",
    "x122_pit_attribution" -> """
      WITH ordered AS (
        SELECT user_id, event_type AS state, ts, event_id,
          LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS prev_state
        FROM events),
      changes AS (
        SELECT user_id, state, ts, event_id FROM ordered
        WHERE prev_state IS NULL OR state <> prev_state),
      iv AS (
        SELECT user_id, state, ts AS valid_from_ts,
          LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS valid_to_ts
        FROM changes)
      SELECT iv.state, e.event_type, COUNT(*) AS n_events
      FROM events e JOIN iv
        ON e.user_id = iv.user_id
        AND e.ts >= iv.valid_from_ts
        AND (iv.valid_to_ts IS NULL OR e.ts < iv.valid_to_ts)
      GROUP BY 1, 2 ORDER BY 1, 2""",
    "x92_daily_spine" -> """
      WITH b AS (SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events),
      spine AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
      rare AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
          ROUND(SUM(value), 2) AS total_value
        FROM events WHERE value > 450 GROUP BY 1)
      SELECT strftime(s.day, '%Y-%m-%d') AS day,
        COALESCE(r.n_events, 0) AS n_events,
        COALESCE(r.total_value, 0.0) AS total_value
      FROM spine s LEFT JOIN rare r USING (day) ORDER BY day""",
    "x69_event_gaps" -> """
      WITH g AS (
        SELECT event_type,
          epoch_us(ts) - lag(epoch_us(ts), 1) OVER
            (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events)
      SELECT event_type, COUNT(*) AS n_gaps,
        MIN(gap_us) AS min_gap_us, MAX(gap_us) AS max_gap_us,
        ROUND(CAST(SUM(gap_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000.0, 2)
          AS avg_gap_s
      FROM g WHERE gap_us IS NOT NULL
      GROUP BY 1 ORDER BY 1""",
    "x61_event_sequences" -> """
      WITH seq AS (
        SELECT event_type AS e1,
          lead(event_type, 1) OVER w AS e2,
          lead(event_type, 2) OVER w AS e3
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT e1, e2, e3, COUNT(*) AS n FROM seq WHERE e3 IS NOT NULL
      GROUP BY 1, 2, 3 ORDER BY n DESC, e1, e2, e3 LIMIT 20""",
    "x62_session_conversion" -> """
      WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_session
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sessions AS (
        SELECT user_id, event_type, ts,
          SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged),
      per_session AS (
        SELECT user_id, sid,
          MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
          MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
        FROM sessions GROUP BY 1, 2)
      SELECT COUNT(*) AS n_sessions,
        COUNT(first_view) AS n_with_view,
        COUNT(last_purchase) AS n_with_purchase,
        COUNT(CASE WHEN first_view < last_purchase THEN 1 END) AS n_converted
      FROM per_session""",
    "x59_volume_anomalies" -> """
      WITH daily AS (SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_events
        FROM events GROUP BY 1),
      stats AS (SELECT AVG(n_events) AS mu, stddev_samp(n_events) AS sd FROM daily)
      SELECT day, n_events,
        ROUND((n_events - mu) / NULLIF(sd, 0), 6) AS z,
        CAST(abs((n_events - mu) / NULLIF(sd, 0)) >= 2.0 AS INT) AS is_anomaly
      FROM daily, stats ORDER BY day""",
    "x52_retention_cohorts" -> """
      WITH ev AS (SELECT CAST(ts AS DATE) AS d, user_id FROM events),
      first AS (SELECT user_id, MIN(d) AS cohort FROM ev GROUP BY 1),
      act AS (SELECT DISTINCT e.user_id, f.cohort,
          CAST(date_diff('day', f.cohort, e.d) // 7 AS BIGINT) AS week_offset
        FROM ev e JOIN first f USING (user_id))
      SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day, week_offset,
        COUNT(*) AS n_active
      FROM act GROUP BY 1, 2 ORDER BY 1, 2""",
    "x53_rolling_volume" -> """
      WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num,
          COUNT(*) AS n_events, ROUND(SUM(value), 2) AS day_value
        FROM events GROUP BY 1)
      SELECT strftime(DATE '1970-01-01' + CAST(day_num AS INT), '%Y-%m-%d') AS day,
        n_events,
        CAST(SUM(n_events) OVER w AS BIGINT) AS events_7d,
        ROUND(SUM(day_value) OVER w, 2) AS value_7d
      FROM daily
      WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      ORDER BY day""",
    "x49_daily_users" -> """
      WITH ev AS (SELECT strftime(ts, '%Y-%m-%d') AS day, user_id FROM events),
      dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM ev GROUP BY 1),
      fs AS (SELECT user_id, MIN(day) AS day FROM ev GROUP BY 1),
      nu AS (SELECT day, COUNT(*) AS new_users FROM fs GROUP BY 1)
      SELECT d.day, d.dau, COALESCE(n.new_users, 0) AS new_users,
        CAST(SUM(COALESCE(n.new_users, 0)) OVER (ORDER BY d.day
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
      FROM dau d LEFT JOIN nu n USING (day) ORDER BY d.day""",
    "x40_events_json" -> """
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS min_k,
        MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k
      FROM events GROUP BY 1 ORDER BY 1""",
    "x29_events_asof_native" ->
      """WITH views AS (
           SELECT user_id, ts AS view_ts, MIN(event_id) AS view_event_id
           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
         purch AS (
           SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
         SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           v.view_event_id,
           strftime(v.view_ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
           epoch_us(p.ts) - epoch_us(v.view_ts) AS lag_micros
         FROM purch p ASOF LEFT JOIN views v
           ON p.user_id = v.user_id AND p.ts >= v.view_ts
         ORDER BY p.event_id""",
    "x24_events_percentiles" ->
      """SELECT event_type,
         ROUND(quantile_cont(value, 0.5), 6) AS p50,
         ROUND(quantile_cont(value, 0.95), 6) AS p95,
         ROUND(quantile_cont(value, 0.99), 6) AS p99,
         COUNT(*) AS n
         FROM events GROUP BY 1 ORDER BY 1""",
    "x86_sampled_percentiles" ->
      s"""WITH s AS (SELECT event_type, value FROM events
         WHERE ${graft.ext.Sampling.u32Sql("event_id")} < 429496730)
         SELECT event_type,
         ROUND(quantile_cont(value, 0.5), 6) AS p50,
         ROUND(quantile_cont(value, 0.95), 6) AS p95,
         ROUND(quantile_cont(value, 0.99), 6) AS p99,
         COUNT(*) AS n_sampled
         FROM s GROUP BY 1 ORDER BY 1""",
    "x25_events_rollup" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
         COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
         FROM events GROUP BY ROLLUP(1, 2)
         ORDER BY day NULLS FIRST, event_type NULLS FIRST""",
    "x23_events_asof_attribution" ->
      """WITH views AS (
           SELECT user_id, ts AS view_ts, MIN(event_id) AS view_event_id
           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
         purch AS (
           SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
         SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           v.view_event_id,
           strftime(v.view_ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
           epoch_us(p.ts) - epoch_us(v.view_ts) AS lag_micros
         FROM purch p ASOF LEFT JOIN views v
           ON p.user_id = v.user_id AND p.ts >= v.view_ts
         ORDER BY p.event_id""",
    "x15_events_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "x16_events_sliding" ->
      """WITH assigned AS (
           -- TZ-free: naive TIMESTAMP + interval (to_timestamp is
           -- TIMESTAMPTZ and renders in the session zone)
           SELECT TIMESTAMP '1970-01-01'
             + CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) * INTERVAL '1 second' AS w,
             value FROM events
           UNION ALL
           SELECT TIMESTAMP '1970-01-01'
             + CAST(floor(epoch(ts) / 1800) * 1800 - 1800 AS BIGINT) * INTERVAL '1 second' AS w,
             value FROM events)
         SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
         FROM assigned GROUP BY 1 ORDER BY 1""",
    "x17_events_sessionize" ->
      """WITH flagged AS (
           SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_session
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sessions AS (
           SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM flagged)
         SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events, ROUND(SUM(value), 2) AS session_value
         FROM sessions GROUP BY 1, 2 ORDER BY 1, 2""",
    "x18_events_funnel" ->
      """WITH per_user AS (
           SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
           FROM events GROUP BY 1)
         SELECT COUNT(*) AS n_users,
           COUNT(first_view) AS n_viewers,
           COUNT(first_purchase) AS n_purchasers,
           COUNT(CASE WHEN first_view < first_purchase THEN 1 END) AS n_converted
         FROM per_user""")
}
