package graft.extensions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.{Relational, Skew}
import graft.sources.Tables

/** Event-stream analytics over the `events` table — batch formulations whose
  * streaming twins (watermarked tumbling windows, mapGroupsWithState
  * sessions) live in [[graft.streaming.StreamingOps]]. Value sums go
  * through DECIMAL for exact, order-independent cross-engine totals.
  */
object Events {

  /** Tumbling 1-hour windows per event type: count + exact value sum. */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast(DecimalType(28, 10))), 2).cast("double").as("sum_value"))
      .orderBy("hour", "event_type")

  /** Sessionization with a 30-minute inactivity gap (gaps-and-islands over a
    * per-user window; total order ts, event_id). Output per user: session
    * count, largest session (events), total events. */
  def eventsSessions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val sessions = Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("sess_id", sum("new_sess").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_id")
      .agg(count(lit(1)).as("n"))
    sessions.groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        max(col("n")).as("max_session_events"),
        sum(col("n")).as("n_events"))
      .select(col("user_id"), col("n_sessions"), col("max_session_events"),
        col("n_events").cast("long").as("n_events"))
      .orderBy("user_id")
  }

  /** Sessionization via the NATIVE `session_window` operator — the same
    * merging-session machinery Structured Streaming's session windows use,
    * available in batch: ONE shuffle on the grouping key with sessions
    * merged inside the aggregation, vs the two window passes (lag + running
    * sum) of [[eventsSessions]]. Emits one row per session with its
    * session bounds (end = last event + gap). Boundary semantics verified
    * by spec: a gap of EXACTLY the 30-minute threshold still MERGES
    * (sessions merge while next_ts <= current end), so the oracle's break
    * flag uses `>` — the same boundary as events_sessions' lag form. */
  def eventsSessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast(DecimalType(28, 10))), 2).cast("double").as("sum_value"))
      .select(col("user_id"),
        col("w.start").as("session_start"),
        col("w.end").as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  /** Purchase-session attribution — which sessions convert: the native
    * `session_window` aggregation ([[eventsSessionWindow]]'s one-shuffle
    * merge) carrying CONDITIONAL aggregates per session (purchase count,
    * purchase revenue, events-before-anything-else) and emitting only the
    * sessions that contain a purchase. The filter on a session-level
    * aggregate runs AFTER the merge — a per-event filter would change
    * session boundaries (a purchase-only stream sessionizes differently);
    * same scale shape as the plain session window. */
  def eventsPurchaseSessions(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        round(sum(when(col("event_type") === "purchase",
          col("value")).otherwise(lit(0.0)).cast(DecimalType(28, 10))), 2)
          .cast("double").as("purchase_value"))
      .filter(col("n_purchases") >= 1)
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("n_purchases"), col("purchase_value"))
      .orderBy("user_id", "session_start")

  /** A/B experiment readout — deterministic assignment + lift: users hash
    * into two arms (the [[graft.extensions.TextAnalysis.textSplitAssign]]
    * discipline — assignment is a pure function of the id, reproducible
    * across runs/engines/layouts), and the readout reports per arm the
    * user count, converting-user share, and mean per-user purchase spend,
    * plus the treatment−control lift on both metrics. Everything reduces
    * to one per-user aggregation then a 2-row arm rollup; means are exact
    * decimal ratios, the lift two single IEEE subtractions on already-
    * rounded values. (Interval estimates for the lift are
    * [[graft.queries.Tpch.qBootstrapCi]]'s weight-bootstrap applied
    * per-arm — same machinery, kept separate so each gate stays small.) */
  def eventsAbLift(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purch"),
        sum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0))
          .cast(DecimalType(28, 10))).as("spend"))
      .withColumn("arm",
        when(graft.functions.Portable.hash60(col("user_id").cast("string")) % 2 === 0,
          "control").otherwise("treatment"))
    val arms = perUser.groupBy("arm")
      .agg(count(lit(1)).as("n_users"),
        round(sum(when(col("n_purch") > 0, 1L).otherwise(0L)).cast("double")
          / count(lit(1)), 6).as("conv_rate"),
        round(sum(col("spend")).cast("double") / count(lit(1)), 6).as("mean_spend"))
    val c = arms.filter(col("arm") === "control")
      .select(col("conv_rate").as("cc"), col("mean_spend").as("cs"))
    arms.crossJoin(broadcast(c))
      .select(col("arm"), col("n_users"), col("conv_rate"), col("mean_spend"),
        round(col("conv_rate") - col("cc"), 6).as("conv_lift"),
        round(col("mean_spend") - col("cs"), 6).as("spend_lift"))
      .orderBy("arm")
  }

  /** Metric trend detection — per type, the least-squares slope of the
    * daily mean value over the day index: the direction-and-rate signal a
    * drift monitor pairs with [[eventsCusumDrift]]'s change-point. Same
    * closed-form discipline as the Zipf fit: per-day x/y/xy/x² are single
    * IEEE ops on 6-dp-rounded daily means, the four moments sum in DECIMAL
    * (exact, order-independent), and slope/intercept are a fixed scalar
    * chain — no iterative fitting, no float accumulation. The moment
    * aggregation is bounded by types × days. */
  def eventsTrendSlope(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum(col("value").cast(DecimalType(38, 18))).cast("double")
        / count(lit(1)), 6).as("dmean"))
    val t0 = lit("1995-01-01").cast("date")
    val terms = daily.select(col("event_type"),
        datediff(col("day"), t0).cast("double").as("x"), col("dmean").as("y"))
      .select(col("event_type"), col("x"), col("y"),
        round(col("x") * col("y"), 9).as("xy"), round(col("x") * col("x"), 9).as("xx"))
    val dec = DecimalType(38, 12)
    val s = terms.groupBy("event_type").agg(count(lit(1)).as("n"),
      sum(col("x").cast(dec)).cast("double").as("sx"),
      sum(col("y").cast(dec)).cast("double").as("sy"),
      sum(col("xy").cast(dec)).cast("double").as("sxy"),
      sum(col("xx").cast(dec)).cast("double").as("sxx"))
    val slope = round(
      (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx")), 6)
    // n >= 2 guard (mirrored in the oracle): a single-day type makes the
    // denominator exactly 0, where Spark's non-ANSI double division yields
    // NULL but DuckDB may yield inf — keep the degenerate row out of both.
    s.filter(col("n") >= 2)
      .select(col("event_type"), col("n").as("n_days"), slope.as("slope_per_day"),
        round((col("sy") - slope * col("sx")) / col("n"), 6).as("intercept"))
      .orderBy("event_type")
  }

  /** Weekday seasonality profile — the day-of-week effect report behind
    * staffing/capacity/anomaly baselines: per (event_type, Spark
    * `dayofweek` 1=Sunday..7=Saturday — not ISO),
    * event share and mean value, plus the deviation of that weekday's mean
    * from the type's overall mean. Two bounded aggregations (types × 7
    * cells); all means are exact-decimal ratios. */
  def eventsWeekdaySeasonality(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("value"),
        dayofweek(col("ts")).as("dow")) // 1=Sunday..7=Saturday (both engines differ; see oracle)
    val cell = ev.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast(DecimalType(38, 18))).cast("double")
          / count(lit(1)), 6).as("mean_value"))
    val tot = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_total"),
        round(sum(col("value").cast(DecimalType(38, 18))).cast("double")
          / count(lit(1)), 6).as("mean_total"))
    cell.join(broadcast(tot), "event_type")
      .select(col("event_type"), col("dow").cast("int").as("dow"),
        col("n_events"),
        round(col("n_events").cast("double") / col("n_total"), 6).as("share"),
        col("mean_value"),
        round(col("mean_value") - col("mean_total"), 6).as("mean_dev"))
      .orderBy("event_type", "dow")
  }

  /** Calendar-gap audit — the data-completeness check a freshness monitor
    * runs per entity: densify each user's purchase span to a daily
    * calendar (bounded `sequence` explode per user — never a global
    * calendar cross join), anti-join the observed days, and measure both
    * total missing days and the LONGEST consecutive outage via
    * gaps-and-islands on the missing days (day-index minus row_number —
    * O(1)/row state, same discipline as t2's streaks). One exchange on
    * user_id drives the window; spans are user-bounded so the explode is
    * O(active span), not O(global calendar). */
  def eventsCalendarGaps(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val span = p.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"), count(lit(1)).as("active"))
    val cal = span.select(col("user_id"),
      explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val gaps = cal.join(p, Seq("user_id", "day"), "left_anti")
    val w = Window.partitionBy("user_id").orderBy("day")
    val longest = gaps
      .withColumn("grp",
        datediff(col("day"), lit("1995-01-01").cast("date"))
          - row_number().over(w))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("c"))
      .groupBy("user_id").agg(max("c").as("longest"))
    span.join(longest, Seq("user_id"), "left")
      .select(col("user_id"),
        (datediff(col("d1"), col("d0")) + 1).cast("long").as("span_days"),
        col("active").cast("long").as("active_days"),
        (datediff(col("d1"), col("d0")) + 1 - col("active")).cast("long")
          .as("gap_days"),
        coalesce(col("longest"), lit(0L)).cast("long").as("longest_gap_days"))
      .orderBy("user_id")
  }

  /** Type-2 slowly-changing-dimension build from a change log — the
    * warehouse dimension-history pass: collapse each user's event stream to
    * its VALUE CHANGES (consecutive repeats of the same event_type open no
    * new version), then stamp each version with [valid_from, valid_to)
    * from the next change's timestamp; the open version has NULL valid_to
    * and is_current = true. Scale shape: ONE shuffle on user_id feeds both
    * window passes (lag to detect changes, lead to close intervals) — the
    * second window reuses the first's partitioning, no extra exchange. */
  def eventsScd2(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val changes = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    val byUserChange = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    changes
      .withColumn("valid_to", lead(col("ts"), 1).over(byUserChange))
      .select(col("user_id"), col("event_type"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "valid_from")
  }

  /** 7-day moving aggregate per event type over daily pre-aggregates —
    * frame-based window function surface (ROWS BETWEEN 6 PRECEDING AND
    * CURRENT ROW over one row per (type, day)). */
  def eventsMovingAvg(spark: SparkSession, dir: String): DataFrame = {
    // to_date: DuckDB's date_trunc('day') yields DATE (not TIMESTAMP) — match it
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(round(sum(col("value").cast(DecimalType(28, 10))), 2).cast("double").as("daily_value"))
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    daily
      .select(col("day"), col("event_type"), col("daily_value"),
        round(sum("daily_value").over(w) / count(lit(1)).over(w), 6).as("avg_7d"))
      .orderBy("event_type", "day")
  }

  /** CDC compaction: the latest event per user ([[Relational.latestByKey]])
    * — the "current snapshot" materialization every change-capture pipeline
    * runs. One exchange on user_id; WindowGroupLimit bounds per-task state
    * to one candidate row per key. */
  def eventsLatestPerUser(spark: SparkSession, dir: String): DataFrame =
    Relational.latestByKey(
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type")),
      Seq(col("user_id")), Seq(col("ts").desc, col("event_id").desc))
      .orderBy("user_id")

  /** Skew-mitigated aggregation, oracle-gated: event_type has only 5 hot
    * keys — the canonical single-key aggregation-skew regime where one
    * reducer would own 1/5 of 100 TB. The salted two-stage count/sum
    * ([[Skew]]) shards each hot key 16 ways, partially aggregates per
    * shard, and merges; counts and decimal sums are associative, so the
    * result equals the plain GROUP BY bit-for-bit — which is exactly what
    * the oracle checks. */
  def eventsSkewSalted(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val cnt = Skew.saltedCount(e, Seq(col("event_type")), out = "n_events")
    val sm = Skew.saltedSum(e, Seq(col("event_type")),
      col("value").cast(DecimalType(28, 10)), out = "sum_dec")
    cnt.join(sm, "event_type")
      .select(col("event_type"), col("n_events"),
        round(col("sum_dec"), 2).cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  /** RANGE (value-interval) window frame — the per-event sliding "last
    * hour": count and exact-decimal value sum over same-type events within
    * the preceding 3600 s, inclusive. ROWS frames slide by position; RANGE
    * frames slide by ORDER-key distance (epoch microseconds here), which is
    * what time-based analytics mean by "last hour" when events arrive
    * irregularly. Peers (equal timestamps) enter the frame identically on
    * both engines by definition of RANGE.
    *
    * SCALE CAVEAT (measured on the builder sf1): Spark's sliding-frame
    * `WindowExec` has no aggregate retraction — it RE-AGGREGATES the whole
    * frame at every slide, so this form costs O(rows × rows-per-hour).
    * Over a fixed-calendar corpus, 10× the events means 10× the frame
    * density and ~100× the work (sf0.1→sf1 went 1.5 s → 38 s).
    * [[eventsRangeFrameScalable]] is the same answer via an arrive/expire
    * change-log whose only window is a GROWING frame (incremental in
    * Spark) — linear, the form a 100 TB deployment must use. The
    * change-log form IS the registered `events_range_frame` lane; this
    * sliding form exists only as its differential witness
    * (`ExtensionsSpec`: both relations must be identical row-for-row). */
  def eventsRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("t_us")
      .rangeBetween(-3599999999L, 0L)
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"), col("value"))
      .select(col("event_id"), col("event_type"),
        count(lit(1)).over(w).as("n_last_hour"),
        round(sum(col("value").cast(DecimalType(28, 10))).over(w), 2)
          .cast("double").as("sum_last_hour"))
      .orderBy("event_id")
  }

  /** The PRIMARY `events_range_frame` lane (round 9 — promoted over the
    * quadratic sliding form, which remains only as a spec-level
    * differential): same answer as [[eventsRangeFrame]], scalable
    * plan. Each event becomes TWO change-log records: an ARRIVE at its
    * own timestamp carrying (+1, +value) and an EXPIRE at
    * `t + 3 600 000 000 µs` carrying (−1, −value) — exactly when the
    * event leaves every later row's inclusive 1-hour frame (an event at
    * u is in the frame of t iff t − 3 599 999 999 ≤ u ≤ t, i.e. until
    * t = u + 3 599 999 999; the expiry lands one µs after). A cumulative
    * sum over the change-log ordered by record time (RANGE unbounded
    * preceding → current row, so timestamp peers — including an arrive
    * and an expire at the same µs — all apply before any of them reads)
    * IS the sliding aggregate at every arrive record. Spark's growing
    * frame is incremental (`UnboundedPrecedingWindowFunctionFrame` adds
    * each row once, never re-aggregates), so the cost is one shuffle +
    * sort of 2n slim rows — O(n log n) against the sliding form's
    * O(n × frame). DECIMAL deltas keep the sum exact under retraction. */
  def eventsRangeFrameScalable(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"),
        col("value").cast(DecimalType(28, 10)).as("dv"))
    val arrive = e.select(col("event_id"), col("event_type"),
      col("t_us").as("rt"), lit(1L).as("dn"), col("dv"))
    val expire = e.select(lit(-1L).as("event_id"), col("event_type"),
      (col("t_us") + 3600000000L).as("rt"), lit(-1L).as("dn"),
      (-col("dv")).as("dv"))
    val w = Window.partitionBy("event_type").orderBy("rt")
      .rangeBetween(Window.unboundedPreceding, 0L)
    arrive.unionByName(expire)
      .select(col("event_id"), col("event_type"),
        sum(col("dn")).over(w).as("n_last_hour"),
        round(sum(col("dv")).over(w), 2).cast("double").as("sum_last_hour"))
      .filter(col("event_id") >= 0) // expire records served their purpose
      .orderBy("event_id")
  }

  /** Event-time AS-OF join composed from window primitives (no custom
    * operator needed): for each purchase, the most recent strictly-prior
    * click by the same user. One shuffle on user_id; the running-max frame
    * keeps O(1) state per row — the 100 TB-safe as-of formulation. */
  def eventsAsofAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("us").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    ev
      .withColumn("prev_click_us",
        max(when(col("event_type") === "click", col("us"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        timestamp_micros(col("prev_click_us")).as("prev_click_ts"))
      .orderBy("event_id")
  }

  /** [[eventsAsofAttribution]] through the NATIVE as-of join operator
    * ([[org.apache.spark.sql.graft.AsOfJoinExec]] — logical node + planner
    * strategy + physical merge, injected via GraftSessionExtensions)
    * instead of the window composition: clicks and purchases shuffle on
    * user_id separately (two smaller sorts instead of one union-wide
    * sort), then a two-pointer per-partition merge carries ONE payload
    * value of state. Bit-identical result by construction — it shares
    * events_asof_attribution's oracle, and AsOfJoinSpec differentials the
    * two plans row-for-row. */
  def eventsAsofCustom(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.AsOf
    AsOf.install(spark)
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "us")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us"), col("event_id"))
    AsOf.joinAsOf(purchases, clicks,
        key = "user_id", time = "us", tiebreak = "event_id",
        payload = "us", asofCol = "prev_click_us")
      .select(col("event_id"), col("user_id"), col("ts"),
        timestamp_micros(col("prev_click_us")).as("prev_click_ts"))
      .orderBy("event_id")
  }

  /** Staleness bound for [[eventsAsofTolerance]]: an as-of match older than
    * this is discarded (1 hour in micros). */
  val AsofToleranceUs = 3600000000L

  /** As-of join WITH a match tolerance — the "max staleness" variant every
    * feature-store lookup needs (a quote/feature older than the bound is
    * as good as missing). Composes the NATIVE as-of operator with a
    * residual freshness predicate: the merge finds the latest candidate in
    * O(1) state per partition exactly as before, and the bound is a
    * stateless post-map — no second pass, no window. A match can only be
    * MORE stale than the latest one, so filtering after the merge is
    * semantically exact, never a recall loss. */
  def eventsAsofTolerance(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.AsOf
    AsOf.install(spark)
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "us")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us"), col("event_id"))
    AsOf.joinAsOf(purchases, clicks,
        key = "user_id", time = "us", tiebreak = "event_id",
        payload = "us", asofCol = "prev_click_us")
      .select(col("event_id"), col("user_id"), col("ts"),
        timestamp_micros(when(col("us") - col("prev_click_us") <= AsofToleranceUs,
          col("prev_click_us"))).as("prev_click_ts"),
        (col("prev_click_us").isNotNull &&
          col("us") - col("prev_click_us") <= AsofToleranceUs).as("fresh"))
      .orderBy("event_id")
  }

  /** Throttle window for [[eventsDedupWindow]] (1 day in micros): an event
    * repeating its (user, type) within this gap of the PREVIOUS event of
    * that key is a duplicate (retry storm / double-fire). */
  val DedupWindowUs = 86400000000L

  /** Telemetry de-duplication within a time window — the ingestion-edge
    * cleanup every event pipeline runs before analytics: drop an event when
    * the previous event of the same (user_id, event_type) lies within
    * [[DedupWindowUs]]. Lag-based (gap measured to the previous RAW event,
    * not the previous kept one), so it is ONE window pass over one exchange
    * on the key — no sequential state, embarrassingly scalable; the
    * kept-anchored variant is the streaming twin's territory
    * (dropDuplicatesWithinWatermark keys state by first arrival). Output is
    * the surviving stream plus the per-row gap that justified keeping it. */
  def eventsDedupWindow(spark: SparkSession, dir: String): DataFrame = {
    val byKey = Window.partitionBy("user_id", "event_type")
      .orderBy(col("us").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(byKey))
      .filter(col("prev_us").isNull || col("us") - col("prev_us") > DedupWindowUs)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        (col("us") - col("prev_us")).as("gap_us"))
      .orderBy("event_id")
  }

  /** 3-step behavior paths: the top user journeys as (step1, step2, step3)
    * trigram counts over each user's time-ordered stream — the path-analysis
    * report product teams read next to the [[eventsTransitions]] matrix.
    * Two stacked lags share ONE exchange + sort on user_id; the trigram
    * keyspace is |types|³ (bounded), so the count aggregation is partial →
    * final with near-zero shuffle. */
  def eventsTrigramPaths(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("step1", lag(col("event_type"), 2).over(byUser))
      .withColumn("step2", lag(col("event_type"), 1).over(byUser))
      .filter(col("step1").isNotNull)
      .groupBy(col("step1"), col("step2"), col("event_type").as("step3"))
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("step1").asc, col("step2").asc, col("step3").asc)
      .limit(20)
  }

  /** Price-band cut points for the [[eventsPitJoin]] dimension (purchase
    * value quartile-ish constants at the driver data's distribution). */
  val PitBandMid = 25.0
  val PitBandHigh = 60.0

  /** Point-in-time (PIT) dimension lookup — the feature-store / warehouse
    * pattern behind every "attribute as of event time" join: a slowly-
    * changing dimension is derived from the purchase stream (each user's
    * spend band, versions opened only when the band CHANGES — the SCD-2
    * collapse of [[eventsScd2]]), and every click is enriched with the
    * version in force at click time. The interval containment join
    * degenerates to an as-of match on version starts because SCD-2
    * intervals tile time contiguously — so the NATIVE as-of operator
    * ([[org.apache.spark.sql.graft.AsOfJoinExec]]) does the lookup with
    * O(1) merge state per partition instead of an interval range join;
    * clicks before the first version report NULL band (fine — the feature
    * is genuinely unknown then). */
  def eventsPitJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.AsOf
    AsOf.install(spark)
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("us"))
    val byUser = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
    val versions = ev.filter(col("event_type") === "purchase")
      .withColumn("band",
        when(col("value") < PitBandMid, "low")
          .when(col("value") < PitBandHigh, "mid")
          .otherwise("high"))
      .withColumn("prev_band", lag(col("band"), 1).over(byUser))
      .filter(col("prev_band").isNull || col("prev_band") =!= col("band"))
      .select(col("user_id"), col("us"), col("event_id"), col("band"))
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "us")
    AsOf.joinAsOf(clicks, versions,
        key = "user_id", time = "us", tiebreak = "event_id",
        payload = "band", asofCol = "band_at_click")
      .select(col("event_id"), col("user_id"), col("ts"), col("band_at_click"))
      .orderBy("event_id")
  }

  /** CUSUM drift detection per event type — the change-point screen data
    * pipelines run on metric streams: daily means, each day's deviation
    * from the type's overall daily-mean level, and the cumulative deviation
    * sum whose extreme |value| marks the most likely level-shift point
    * (flagged per type). The cumulative sum runs in DECIMAL: a float
    * running sum is association-dependent (Spark accumulates left-to-right,
    * DuckDB's window aggregation uses a segment tree), and the exact
    * decimal sum is order-independent on both. Scale: one daily pre-agg,
    * then windows over the small (type × day) relation. */
  def eventsCusumDrift(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum(col("value").cast(DecimalType(38, 18))).cast("double")
        / count(lit(1)), 6).as("dmean"))
    val tm = daily.groupBy("event_type")
      .agg(round(sum(col("dmean").cast(DecimalType(38, 18))).cast("double")
        / count(lit(1)), 6).as("m"))
    val byDay = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCusum = daily.join(broadcast(tm), "event_type")
      .withColumn("cusum",
        round(sum(round(col("dmean") - col("m"), 6).cast(DecimalType(38, 18)))
          .over(byDay).cast("double"), 6))
    withCusum
      .withColumn("is_peak",
        abs(col("cusum")) === max(abs(col("cusum")))
          .over(Window.partitionBy("event_type")))
      .select("event_type", "day", "dmean", "cusum", "is_peak")
      .orderBy("event_type", "day")
  }

  /** RFM (recency / frequency / monetary) customer segmentation over the
    * purchase stream — the classic lifecycle-marketing cut: per user, days
    * since last purchase (vs the stream's last purchase day), purchase
    * count, and exact spend; each dimension is scored into quintiles by
    * NTILE(5) over a TOTAL order (user_id tiebreak — ntile is
    * deterministic only under one) and the three digits concatenate into
    * the segment label. One aggregation to per-user rows, then three exact
    * distributed NTILE passes ([[graft.ops.Relational.withDistributedNtile]]
    * — range exchange + partitioned rank + broadcast offsets; NO
    * single-partition WindowExec, so the user dimension can grow 100×
    * without a serialization point); the reference-date scalar is a
    * broadcast. R quintile 1 = most recent, F/M quintile 1 = heaviest. */
  def eventsRfm(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.events(spark, dir).filter(col("event_type") === "purchase")
    val ref = p.agg(max(to_date(col("ts"))).as("ref_day"))
    val perUser = p.groupBy("user_id")
      .agg(max(to_date(col("ts"))).as("last_day"),
        count(lit(1)).as("frequency"),
        round(sum(col("value").cast(DecimalType(28, 10))), 2).cast("double")
          .as("monetary"))
      .crossJoin(broadcast(ref))
      .select(col("user_id"),
        datediff(col("ref_day"), col("last_day")).as("recency_days"),
        col("frequency"), col("monetary"))
    // Three exact-NTILE passes, each fully distributed (range exchange +
    // partitioned ranking + broadcast offsets — Relational.withDistributedNtile)
    // instead of `ntile(5).over(Window.orderBy(..))`, which would pull the
    // whole user dimension into ONE task three times. Bit-identical buckets:
    // user_id makes each ordering total, so ranks (hence NTILE's fixed
    // rank→bucket formula) are unambiguous.
    val nUsers = perUser.count() // one probe sizes all three passes
    val withR = graft.ops.Relational.withDistributedNtile(perUser, 5, "r",
      Seq(col("recency_days").asc, col("user_id").asc), nUsers)
    val withF = graft.ops.Relational.withDistributedNtile(withR, 5, "f",
      Seq(col("frequency").desc, col("user_id").asc), nUsers)
    val withM = graft.ops.Relational.withDistributedNtile(withF, 5, "m",
      Seq(col("monetary").desc, col("user_id").asc), nUsers)
    withM
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary"), col("r"), col("f"), col("m"),
        concat(col("r"), col("f"), col("m")).as("segment"))
      .orderBy("user_id")
  }

  /** Batch boundary for [[eventsIncrementalAgg]]: event_id < this is the
    * already-aggregated base; the rest is the arriving delta. */
  val IncAggSplit = 8000L

  /** Incremental aggregate maintenance — the materialized-view refresh
    * pattern: a standing per-type summary (count / exact sum / latest id)
    * is updated by COMBINING it with the delta batch's partial aggregate,
    * never by re-scanning the base. Works because the state is a
    * commutative monoid (counts and DECIMAL sums add, max merges) — the
    * same mergeability contract Spark's partial aggregation and streaming
    * update mode rely on. The oracle recomputes from scratch over ALL
    * events; equality of the merged result with the full recompute IS the
    * gate. Scale: refresh cost is O(delta) + O(|groups|), independent of
    * base size; rounding happens once at the edge (state stays exact —
    * rounding inside the state would drift across refreshes). */
  def eventsIncrementalAgg(spark: SparkSession, dir: String): DataFrame =
    eventsIncrementalAggAt(spark, dir, IncAggSplit)

  /** [[eventsIncrementalAgg]] with an explicit split point — the merge must
    * equal the full recompute for EVERY split (monoid law), which the spec
    * asserts across several splits including the all-base and all-delta
    * degenerate ones. */
  private[graft] def eventsIncrementalAggAt(spark: SparkSession, dir: String,
                                            split: Long): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    def partial(df: DataFrame): DataFrame =
      df.groupBy("event_type").agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(28, 10))).as("sv"),
        max(col("event_id")).as("max_event_id"))
    val base = partial(ev.filter(col("event_id") < split))
    val delta = partial(ev.filter(col("event_id") >= split))
    base.unionByName(delta)
      .groupBy("event_type")
      .agg(sum(col("n_events")).cast("long").as("n_events"),
        sum(col("sv")).as("sv"),
        max(col("max_event_id")).as("max_event_id"))
      .select(col("event_type"), col("n_events"),
        round(col("sv"), 2).cast("double").as("sum_value"),
        col("max_event_id"))
      .orderBy("event_type")
  }

  /** Time-to-convert distribution — the funnel-latency report next to
    * [[eventsFunnel]]'s counts: per user, the lag from FIRST view to the
    * first purchase AFTER it; over converted users, exact interpolated
    * percentiles of the lag (seconds) plus conversion counts. One
    * aggregation collapses the stream to per-user firsts (conditional
    * min's — no window needed), percentiles run on the user-cardinality
    * relation (the q_percentiles cross-engine interpolation contract).
    * Users whose only purchases precede their first view count as
    * unconverted — the funnel is ordered. */
  def eventsTimeToConvert(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val perUser = ev.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("us"))).as("first_view"))
    val firstPurchaseAfter = ev.filter(col("event_type") === "purchase")
      .join(perUser, "user_id")
      .filter(col("first_view").isNotNull && col("us") >= col("first_view"))
      .groupBy("user_id")
      .agg(min(col("us")).as("first_purch"), min(col("first_view")).as("fv"))
      .select(col("user_id"),
        ((col("first_purch") - col("fv")) / 1000000L).cast("double").as("lag_s"))
    val viewers = perUser.filter(col("first_view").isNotNull)
      .agg(count(lit(1)).as("n_viewers"))
    firstPurchaseAfter
      .agg(count(lit(1)).as("n_converted"),
        round(expr("percentile(lag_s, 0.5)"), 4).as("p50_s"),
        round(expr("percentile(lag_s, 0.9)"), 4).as("p90_s"))
      .crossJoin(broadcast(viewers))
      .select(col("n_viewers"), col("n_converted"),
        round(col("n_converted").cast("double") / col("n_viewers"), 6)
          .as("conversion_rate"),
        col("p50_s"), col("p90_s"))
  }

  /** JSON-column analytics: extract the typed payload from the free-form
    * `props` JSON string per row (codegen'd path expression, no UDF) and
    * aggregate — the semi-structured surface of the function library. */
  def eventsJsonStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** Conversion funnel view → ORDERED click → ORDERED purchase per user,
    * computed with three STACKED cumulative windows over ONE (user_id,
    * ts, event_id) sort: first_view is the running min of view times;
    * first_click qualifies only at rows whose running first_view is
    * already set (click strictly after-or-at a view); first_purchase
    * likewise gates on first_click. One exchange + one sort for the whole
    * staging — the match_recognize-style sequential pattern without joins
    * or per-user collected state. Scoped to the first two days of the
    * event stream so the cohort is mid-conversion and all four stages are
    * populated (purchase/click/view/none = 21/20/51/58 at sf0.01). */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .filter(col("ts") < lit("2024-01-03").cast("timestamp"))
      .withColumn("first_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("first_click",
        min(when(col("event_type") === "click" && col("first_view").isNotNull,
          col("ts"))).over(w))
      .withColumn("first_purchase",
        min(when(col("event_type") === "purchase" && col("first_click").isNotNull,
          col("ts"))).over(w))
      .groupBy("user_id")
      .agg(min("first_view").as("first_view"),
        min("first_click").as("first_click"),
        min("first_purchase").as("first_purchase"))
      .withColumn("stage",
        when(col("first_purchase").isNotNull, "purchase")
          .when(col("first_click").isNotNull, "click")
          .when(col("first_view").isNotNull, "view")
          .otherwise("none"))
      .orderBy("user_id")
  }

  /** Weekly cohort retention on the purchase stream — the product-analytics
    * staple: cohort = the week of a user's FIRST purchase, and each
    * (cohort_week, week_offset) cell counts the cohort's users who
    * purchased again that many weeks later (offset 0 is the cohort size by
    * construction). Integer-only output — no cross-engine float hazard.
    * Scale shape: the stream collapses to distinct (user, week) pairs
    * before anything else (purchases per user per week dedupe map-side),
    * the first-week aggregation is one shuffle on user_id, and the cell
    * counts shuffle |users × weeks| pre-aggregated pairs, never events. */
  def eventsCohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val pw = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("w"))
      .distinct()
    val cohort = pw.groupBy("user_id").agg(min(col("w")).as("cohort_week"))
    pw.join(cohort, "user_id")
      .select(col("user_id"), col("cohort_week"),
        (datediff(col("w"), col("cohort_week")) / 7).cast("int").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Trailing-window width (days) for the sliding distinct-user count. */
  val SlidingDauDays = 7

  /** Sliding 7-day distinct active users (DAU/WAU-style) per day — the
    * rolling engagement metric every analytics store reports. Distinct
    * counts do NOT compose across window positions, so a window function
    * cannot express this; the scale shape is: collapse events to distinct
    * (user, day) pairs FIRST (the big reduction — event volume never
    * reaches the window logic), then fan each user-day out to the
    * [[SlidingDauDays]] window-end days it supports (bounded ×7 row
    * expansion of the already-small pair relation) and count distinct per
    * window end. For corpus scales where even user-days overwhelm the
    * exact count, swap the final agg for approx_count_distinct (HLL) —
    * same dataflow. The inner join back to per-day counts keeps exactly
    * the window ends observed in the data. */
  def eventsSlidingDau(spark: SparkSession, dir: String): DataFrame = {
    // Three consumers (window fan-out, per-day counts, observed-day screen)
    // — materialized once.
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .localCheckpoint()
    val win = ud.select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), SlidingDauDays - 1))).as("wday"))
      .groupBy("wday").agg(count_distinct(col("user_id")).as("dau_7d"))
    ud.groupBy("day").agg(count_distinct(col("user_id")).as("dau_1d"))
      .join(win, col("day") === col("wday"))
      .select(col("day").as("window_end"), col("dau_1d"), col("dau_7d"))
      .orderBy("window_end")
  }

  /** The CORPUS-SCALE twin of [[eventsSlidingDau]]: same collapse-then-
    * fan-out dataflow, but the per-window distinct count is ALSO computed
    * with `approx_count_distinct` (HLL++, rsd 2%) and gated through the
    * within-bounds pattern of [[graft.queries.Tpch.qSketchBounds]] — the
    * oracle recomputes the exact count and asserts the emitted boolean,
    * so the sketch's 5% envelope is part of the correctness gate, not a
    * claim. At 100 TB the exact column is what you drop: HLL state is
    * O(1) per window and merges map-side, so the ×7 fan-out shuffles
    * fixed-size sketch buffers instead of user-id sets. Exact and sketch
    * aggregations run as separate single-pass aggs joined on the 1-per-day
    * key — mixing count(DISTINCT) with the HLL buffer would route the
    * sketch through the distinct Expand for nothing. */
  def eventsSlidingDauApprox(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .localCheckpoint()
    val win = ud.select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), SlidingDauDays - 1))).as("wday"))
      .localCheckpoint() // two aggregation consumers below
    val exact = win.groupBy("wday").agg(count_distinct(col("user_id")).as("dau_7d"))
    val sketch = win.groupBy("wday")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("dau_7d_hll"))
    ud.select(col("day")).distinct()
      .join(exact, col("day") === exact("wday")).drop("wday")
      .join(sketch, col("day") === sketch("wday")).drop("wday")
      .select(col("day").as("window_end"), col("dau_7d"),
        (abs(col("dau_7d_hll") - col("dau_7d")) <= col("dau_7d") * 0.05)
          .as("hll_within_5pct"))
      .orderBy("window_end")
  }

  /** |z| threshold for [[eventsWeekdayAnomaly]]. */
  val WeekdayAnomalyZ = 1.0

  /** SEASONALITY-AWARE anomaly detection — the report [[eventsZscoreOutliers]]
    * cannot produce: a quiet Sunday is normal, the same volume on a Tuesday
    * is an incident. Per (event_type, weekday) cell, mean and sample
    * stddev of the 6-dp daily means; each day is then scored against ITS
    * WEEKDAY's baseline and days with |z| ≥ [[WeekdayAnomalyZ]] are
    * flagged. Determinism discipline: deviations are single IEEE ops on
    * already-rounded values, squares round at 9 dp before the exact
    * DECIMAL sum, and sqrt is IEEE-correctly-rounded (not libm-ULP like
    * ln/exp), so both engines agree bit-exactly. Cells with one day or
    * zero variance are excluded on both sides (no z is defined there).
    * Two bounded aggregations (types × 7 cells) over the types × days
    * daily relation — event volume never reaches the stats. */
  /** The (event_type, day, dmean, dow) daily-mean relation the weekday
    * family scores over — shared by the batch query and the streaming
    * screen's replayed-days parity spec. */
  private[graft] def weekdayDaily(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum(col("value").cast(DecimalType(38, 18))).cast("double")
        / count(lit(1)), 6).as("dmean"))
      .withColumn("dow", dayofweek(col("day")))

  /** Per-(event_type, weekday) baseline (`mu`, `sd`, `n_days`) over a daily
    * relation — extracted so the STREAMING anomaly screen can broadcast
    * the same batch-built stats ([[graft.streaming.StreamingOps.weekdayAnomalyScreen]]).
    *
    * The baseline mean is rounded in EXACT INTEGER arithmetic: the 6-dp
    * daily means scale to exact micro-units (BIGINT), and half-up
    * rounding of sum/n is an integer-division + remainder test — no
    * double-rounding tie (sum/4, sum/5 land exactly on .5e-6 boundaries,
    * where Spark's and DuckDB's double round() legitimately disagree).
    * Sign safety: Spark's `div` truncates toward zero while DuckDB's `//`
    * floors, so they diverge on NEGATIVE sums — both sides therefore
    * round |s6| half-up and reapply the sign (round half away from zero),
    * touching div/% only on non-negative operands where every engine
    * agrees. Holds for any sign of `value`, not just this corpus'. */
  private[graft] def weekdayBaseline(daily: DataFrame): DataFrame = {
    val dec = DecimalType(38, 18)
    val mag = expr("abs(s6) div n_days") +
      when((abs(col("s6")) % col("n_days")) * 2 >= col("n_days"), 1L).otherwise(0L)
    val mu = daily.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n_days"),
        sum(round(col("dmean") * 1000000).cast("long")).as("s6"))
      .withColumn("mu6", when(col("s6") >= 0, mag).otherwise(-mag))
      .select(col("event_type"), col("dow"), col("n_days"),
        (col("mu6").cast("double") / 1000000.0).as("mu"))
    daily.join(mu, Seq("event_type", "dow"))
      .select(col("event_type"), col("dow"), col("n_days"), col("mu"),
        round((col("dmean") - col("mu")) * (col("dmean") - col("mu")), 9).as("sq"))
      .groupBy("event_type", "dow", "n_days", "mu")
      .agg(round(sqrt(sum(col("sq").cast(dec)).cast("double")
        / (col("n_days") - 1)), 6).as("sd"))
      .filter(col("n_days") >= 2 && col("sd") > 0)
  }

  def eventsWeekdayAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val daily = weekdayDaily(spark, dir)
      .localCheckpoint() // feeds the baseline agg, the sd join, and the scoring join
    daily.join(weekdayBaseline(daily), Seq("event_type", "dow"))
      .select(col("event_type"), col("day"), col("dmean"), col("mu"), col("sd"),
        round((col("dmean") - col("mu")) / col("sd"), 6).as("z"))
      .filter(abs(col("z")) >= WeekdayAnomalyZ)
      .orderBy("event_type", "day")
  }

  /** Trailing window (days, inclusive of the current day) for
    * [[eventsRollingMedian]]. */
  val RollingMedianDays = 7

  /** Rolling EXACT median of the daily mean value per event type — the
    * robust smoother a metrics monitor pairs with [[eventsMovingAvg]]
    * (a median shrugs off the single-day spike that drags a mean): an
    * ordered-set aggregate (`percentile`, linear interpolation — the
    * q_percentiles cross-engine contract) evaluated OVER a RANGE frame
    * keyed on the integer day index, so calendar gaps shorten the window
    * correctly (a ROWS frame would silently stretch across them). Daily
    * means reduce event volume to types × days BEFORE the window, so the
    * frame holds ≤ [[RollingMedianDays]] 6-dp-rounded scalars per row —
    * O(1) state at any corpus scale; one exchange on event_type for the
    * window. */
  def eventsRollingMedian(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum(col("value").cast(DecimalType(38, 18))).cast("double")
        / count(lit(1)), 6).as("dmean"))
      .withColumn("x", datediff(col("day"), lit("1995-01-01").cast("date")))
    daily.select(col("event_type"), col("day"), col("dmean"),
        round(expr(
          s"""percentile(dmean, 0.5) OVER (
             |  PARTITION BY event_type ORDER BY x
             |  RANGE BETWEEN ${RollingMedianDays - 1} PRECEDING AND CURRENT ROW)"""
            .stripMargin), 6).as("rolling_median"))
      .orderBy("event_type", "day")
  }

  /** Daily OHLC (open/high/low/close) per event type — the time-series
    * compaction every metrics store runs: first/last values by event time
    * (row_number both directions over ONE exchange on (type, day); the
    * descending pass reuses the partitioning, adding only a sort) plus
    * min/max/count and the exact-decimal volume. */
  def eventsDailyOhlc(spark: SparkSession, dir: String): DataFrame = {
    val asc = Window.partitionBy("event_type", "day")
      .orderBy(col("ts").asc, col("event_id").asc)
    val desc = Window.partitionBy("event_type", "day")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        col("ts"), col("event_id"), col("value"))
      .withColumn("rn_a", row_number().over(asc))
      .withColumn("rn_d", row_number().over(desc))
      .groupBy("event_type", "day")
      .agg(
        min(when(col("rn_a") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        min(when(col("rn_d") === 1, col("value"))).as("close"),
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast(DecimalType(28, 10))), 2).cast("double").as("volume"))
      .orderBy("event_type", "day")
  }

  /** Winsorization — robust-stats cleaning: clamp values to the per-type
    * [p05, p95] band (exact interpolated percentiles, one aggregation
    * broadcast back) and report raw vs winsorized means and clamp counts.
    * The percentile pass shuffles |groups| quantile states, not rows. */
  def eventsWinsorized(spark: SparkSession, dir: String): DataFrame = {
    val qs = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(percentile(col("value"), lit(0.05)).as("p05"),
        percentile(col("value"), lit(0.95)).as("p95"))
    // Means via exact DECIMAL sums (order-independent) divided in double:
    // a parallel float AVG is summation-order-dependent in its last ulp,
    // which can flip the 6-dp rounding between runs on either engine.
    def decMean(c: org.apache.spark.sql.Column) =
      round(sum(c.cast(DecimalType(38, 18))).cast("double") / count(lit(1)), 6)
    Tables.events(spark, dir)
      .join(broadcast(qs), "event_type")
      .withColumn("w", least(greatest(col("value"), col("p05")), col("p95")))
      .groupBy("event_type")
      .agg(
        decMean(col("value")).as("mean_raw"),
        decMean(col("w")).as("mean_winsorized"),
        count(when(col("value") < col("p05") || col("value") > col("p95"), 1)).as("n_clamped"),
        round(min("p05"), 6).as("p05"),
        round(min("p95"), 6).as("p95"))
      .orderBy("event_type")
  }

  /** Z-score outlier detection per event type — the numeric data-cleaning
    * staple: per-type mean and sample stddev (one aggregation, broadcast
    * back), flag |z| ≥ 3 on the ROUNDED score (round-before-threshold, the
    * cross-engine float contract; Spark and DuckDB stddev_samp differ only
    * in the last ulps). Emits the flagged rows with their scores. A
    * degenerate group (all values equal → sd = 0) emits no rows instead of
    * NaN/Inf scores — the sd > 0 guard is mirrored in the oracle. */
  def eventsZscoreOutliers(spark: SparkSession, dir: String): DataFrame = {
    // Mean and stddev derive from exact DECIMAL sums of v and v·v (the
    // v·v product is one deterministic IEEE op per row), then ONE shared
    // double expression tree — order-independent aggregation, so the 6-dp
    // rounded z cannot flip between runs on either engine. The two-pass
    // textbook stddev is avoided on purpose: Welford/parallel-merge
    // variance is combine-order-dependent.
    val stats = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        sum(col("value").cast(DecimalType(38, 18))).cast("double").as("s1"),
        sum((col("value") * col("value")).cast(DecimalType(38, 15))).cast("double").as("s2"),
        count(lit(1)).as("cnt"))
      .select(col("event_type"), (col("s1") / col("cnt")).as("m"),
        sqrt(greatest(lit(0.0),
          (col("s2") - col("s1") * col("s1") / col("cnt")) / (col("cnt") - 1))).as("sd"))
    Tables.events(spark, dir)
      .join(broadcast(stats), "event_type")
      .filter(col("sd") > 0)
      .withColumn("z", round((col("value") - col("m")) / col("sd"), 6))
      .filter(abs(col("z")) >= 3)
      .select(col("event_id"), col("event_type"), col("value"), col("z"))
      .orderBy("event_id")
  }

  /** Robust outlier flags via MAD (median absolute deviation) — the
    * [[eventsZscoreOutliers]] twin that survives heavy tails, where one
    * extreme value inflates the stddev enough to hide every other outlier:
    * per type, med = exact median, mad = median(|v − med|), and the
    * modified z-score 0.6745·(v − med)/mad flags at |mz| ≥ 3.5 (the
    * Iglewicz–Hoaglin rule). Exact medians come from two distributed
    * percentile aggregations (cross-engine interpolation parity gated by
    * q_percentiles); the per-type stats broadcast — the corpus never
    * shuffles. mz is rounded before thresholding so both engines flag the
    * identical row set. MAD is exactly 0 whenever >50% of a group's values
    * equal the median (common on integer-ish data); such degenerate groups
    * emit no rows instead of NaN/Inf — the mad > 0 guard is mirrored in the
    * oracle. */
  def eventsMadOutliers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val med = ev.groupBy("event_type").agg(expr("percentile(value, 0.5)").as("m"))
    val withM = ev.join(broadcast(med), "event_type")
    val mad = withM.groupBy("event_type")
      .agg(expr("percentile(abs(value - m), 0.5)").as("mad"))
    withM.join(broadcast(mad), "event_type")
      .filter(col("mad") > 0)
      .withColumn("mz", round(lit(0.6745) * (col("value") - col("m")) / col("mad"), 6))
      .filter(abs(col("mz")) >= 3.5)
      .select(col("event_id"), col("event_type"), col("value"), col("mz"))
      .orderBy("event_id")
  }

  /** Forward-fill (gap-fill) — the time-series repair op: per user in event
    * order, a missing reading takes the most recent non-null one
    * (`last(..., ignoreNulls)` over a cumulative frame; leading nulls stay
    * null). Readings are deterministically nulled (event_id % 7) on both
    * engines since the driver data has no gaps. One exchange on user_id,
    * O(1) state per row — same scale shape as the other sequence ops. */
  def eventsForwardFill(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("reading",
        when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")))
      .withColumn("filled", last(col("reading"), ignoreNulls = true).over(w))
      .select(col("event_id"), col("user_id"), col("reading"), col("filled"))
      .orderBy("event_id")
  }

  /** Markov transition mining over per-user event sequences: consecutive
    * (from → to) event-type bigrams from ONE lag window, counted globally —
    * the product-analytics "behavior flow" matrix. Scale shape: the lag
    * pass shuffles once on user_id; the bigram count's keyspace is
    * |types|² (tiny), so its aggregation is map-side dominated. */
  def eventsTransitions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy(col("n_transitions").desc, col("from_type").asc, col("to_type").asc)
  }

  /** Hourly top-k heavy users — windowed heavy-hitter reporting (who
    * dominated each hour): per-(hour, user) counts, then row_number ≤ 3 per
    * hour. The rank window runs over the PRE-AGGREGATED hourly relation
    * (one row per user-hour, not per event), and plans with the
    * WindowGroupLimit map-side eviction — per-task state is 3 rows per
    * hour regardless of user cardinality. */
  def eventsHourlyTopk(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("hour").orderBy(col("n_events").desc, col("user_id").asc)
    hourly.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .orderBy(col("hour").asc, col("rk").asc)
  }

  /** EWMA weights 1, α, α², … α⁷ (α = 0.5): all exact binary fractions, so
    * weighted products introduce no decimal-representation skew. */
  private val ewmaWeights: Seq[(Int, Double)] =
    (0 to 7).map(j => j -> math.pow(0.5, j))

  /** Exponentially-weighted moving average per user with a BOUNDED 8-term
    * memory. The textbook EWMA recurrence is inherently sequential (every
    * value depends on the whole prefix — a chain no engine parallelizes);
    * truncating at 8 terms keeps 1 − 2⁻⁸ ≈ 99.6% of the weight mass at
    * α = 0.5 and turns the recurrence into a fixed window expression:
    * O(1) per-row state, one user_id exchange, embarrassingly parallel.
    * All 8 lags share ONE window; the weighted terms are summed in a fixed
    * left-to-right order, so both engines run identical IEEE arithmetic.
    * Warm-up rows renormalize by the sum of PRESENT weights (no bias at
    * the sequence head). */
  def eventsEwma(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val lagged = ewmaWeights.foldLeft(
      Tables.events(spark, dir).select(col("user_id"), col("event_id"), col("ts"), col("value"))) {
      case (df, (j, _)) =>
        if (j == 0) df else df.withColumn(s"l$j", lag(col("value"), j).over(byUser))
    }
    def term(j: Int, w: Double) = {
      val c = if (j == 0) col("value") else col(s"l$j")
      (when(c.isNotNull, c * lit(w)).otherwise(lit(0.0)),
       when(c.isNotNull, lit(w)).otherwise(lit(0.0)))
    }
    val (numers, denoms) = ewmaWeights.map { case (j, w) => term(j, w) }.unzip
    lagged
      .withColumn("ewma", round(numers.reduce(_ + _) / denoms.reduce(_ + _), 6))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"), col("ewma"))
      .orderBy("event_id")
  }

  /** Oracle twin of [[eventsEwma]] generated from the same weight list, so
    * the term order and weight constants can never drift apart. */
  private val ewmaOracleSql: String = {
    val lagDefs = ewmaWeights.collect { case (j, _) if j > 0 =>
      s"lag(value, $j) OVER uw AS l$j" }.mkString(",\n      |         ")
    val numer = ewmaWeights.map { case (j, w) =>
      val c = if (j == 0) "value" else s"l$j"
      s"(CASE WHEN $c IS NOT NULL THEN $c * $w ELSE 0.0 END)"
    }.mkString(" + ")
    val denom = ewmaWeights.map { case (j, w) =>
      val c = if (j == 0) "value" else s"l$j"
      s"(CASE WHEN $c IS NOT NULL THEN $w ELSE 0.0 END)"
    }.mkString(" + ")
    s"""WITH w AS (
       |  SELECT event_id, user_id, ts, value,
       |         $lagDefs
       |  FROM events
       |  WINDOW uw AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
       |)
       |SELECT event_id, user_id, ts, value,
       |       round(($numer) / ($denom), 6) AS ewma
       |FROM w ORDER BY event_id""".stripMargin
  }

  private val asofOracleSql =
    """WITH ev AS (
      |  SELECT event_id, user_id, ts, event_type, epoch_us(ts) AS us FROM events
      |), w AS (
      |  SELECT event_id, user_id, ts, event_type,
      |         max(CASE WHEN event_type = 'click' THEN us END)
      |           OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_us
      |  FROM ev
      |)
      |SELECT event_id, user_id, ts, make_timestamp(prev_us) AS prev_click_ts
      |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  private val funnelWindowSql =
    """OVER (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  val oracle: Map[String, String] = Map(
    "events_asof_tolerance" ->
      s"""WITH ev AS (
         |  SELECT event_id, user_id, ts, event_type, epoch_us(ts) AS us FROM events
         |), w AS (
         |  SELECT event_id, user_id, ts, event_type, us,
         |         max(CASE WHEN event_type = 'click' THEN us END)
         |           OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_us
         |  FROM ev
         |)
         |SELECT event_id, user_id, ts,
         |       make_timestamp(CASE WHEN us - prev_us <= $AsofToleranceUs
         |                           THEN prev_us END) AS prev_click_ts,
         |       (prev_us IS NOT NULL AND us - prev_us <= $AsofToleranceUs) AS fresh
         |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    // Full recompute — the incremental merge must equal it exactly.
    "events_trend_slope" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |         round(CAST(sum(CAST(value AS DECIMAL(38,18))) AS DOUBLE) / count(*), 6) AS dmean
        |  FROM events GROUP BY event_type, day
        |), t AS (
        |  SELECT event_type,
        |         CAST(date_diff('day', DATE '1995-01-01', day) AS DOUBLE) AS x,
        |         dmean AS y
        |  FROM daily
        |), t2 AS (
        |  SELECT event_type, x, y,
        |         round(x * y, 9) AS xy, round(x * x, 9) AS xx
        |  FROM t
        |), s AS (
        |  SELECT event_type, count(*) AS n,
        |         CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
        |         CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
        |         CAST(sum(CAST(xy AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
        |         CAST(sum(CAST(xx AS DECIMAL(38,12))) AS DOUBLE) AS sxx
        |  FROM t2 GROUP BY event_type
        |)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days,
        |       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope_per_day,
        |       round((sy - round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) * sx) / n, 6)
        |         AS intercept
        |FROM s WHERE n >= 2 ORDER BY event_type""".stripMargin,

    "events_ab_lift" ->
      """WITH pu AS (
        |  SELECT user_id,
        |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purch,
        |         sum(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END
        |             AS DECIMAL(28,10))) AS spend,
        |         CASE WHEN ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT % 2 = 0
        |              THEN 'control' ELSE 'treatment' END AS arm
        |  FROM events GROUP BY user_id
        |), arms AS (
        |  SELECT arm, count(*) AS n_users,
        |         round(CAST(count(*) FILTER (WHERE n_purch > 0) AS DOUBLE) / count(*), 6) AS conv_rate,
        |         round(CAST(sum(spend) AS DOUBLE) / count(*), 6) AS mean_spend
        |  FROM pu GROUP BY arm
        |), c AS (SELECT conv_rate AS cc, mean_spend AS cs FROM arms WHERE arm = 'control')
        |SELECT arm, n_users, conv_rate, mean_spend,
        |       round(conv_rate - cc, 6) AS conv_lift,
        |       round(mean_spend - cs, 6) AS spend_lift
        |FROM arms, c ORDER BY arm""".stripMargin,

    // Spark dayofweek is 1=Sunday..7; DuckDB's is 0=Sunday..6 — shift +1.
    "events_weekday_seasonality" ->
      """WITH ev AS (
        |  SELECT event_type, value, CAST(dayofweek(ts) + 1 AS INTEGER) AS dow
        |  FROM events
        |), cell AS (
        |  SELECT event_type, dow, count(*) AS n_events,
        |         round(CAST(sum(CAST(value AS DECIMAL(38,18))) AS DOUBLE) / count(*), 6) AS mean_value
        |  FROM ev GROUP BY event_type, dow
        |), tot AS (
        |  SELECT event_type, count(*) AS n_total,
        |         round(CAST(sum(CAST(value AS DECIMAL(38,18))) AS DOUBLE) / count(*), 6) AS mean_total
        |  FROM ev GROUP BY event_type
        |)
        |SELECT cell.event_type, dow, n_events,
        |       round(CAST(n_events AS DOUBLE) / n_total, 6) AS share,
        |       mean_value,
        |       round(mean_value - mean_total, 6) AS mean_dev
        |FROM cell JOIN tot ON cell.event_type = tot.event_type
        |ORDER BY cell.event_type, dow""".stripMargin,

    "events_calendar_gaps" ->
      """WITH p AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events WHERE event_type = 'purchase'
        |), span AS (
        |  SELECT user_id, min(day) AS d0, max(day) AS d1, count(*) AS active
        |  FROM p GROUP BY user_id
        |), cal AS (
        |  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM span
        |), gaps AS (
        |  SELECT c.user_id, c.day
        |  FROM cal c LEFT JOIN p ON c.user_id = p.user_id AND c.day = p.day
        |  WHERE p.day IS NULL
        |), runs AS (
        |  SELECT user_id,
        |         date_diff('day', DATE '1995-01-01', day)
        |           - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM gaps
        |), lg AS (
        |  SELECT user_id, max(c) AS longest
        |  FROM (SELECT user_id, grp, count(*) AS c FROM runs GROUP BY user_id, grp)
        |  GROUP BY user_id
        |)
        |SELECT s.user_id,
        |       CAST(date_diff('day', d0, d1) + 1 AS BIGINT) AS span_days,
        |       CAST(active AS BIGINT) AS active_days,
        |       CAST(date_diff('day', d0, d1) + 1 - active AS BIGINT) AS gap_days,
        |       CAST(coalesce(lg.longest, 0) AS BIGINT) AS longest_gap_days
        |FROM span s LEFT JOIN lg ON s.user_id = lg.user_id
        |ORDER BY s.user_id""".stripMargin,

    "events_purchase_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, event_type, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |), numbered AS (
        |  SELECT user_id, ts, event_type, value,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged
        |)
        |SELECT user_id,
        |       make_timestamp(min(epoch_us(ts))) AS session_start,
        |       count(*) AS n_events,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_purchases,
        |       CAST(round(sum(CAST(CASE WHEN event_type = 'purchase' THEN value
        |                           ELSE 0.0 END AS DECIMAL(28,10))), 2) AS DOUBLE)
        |         AS purchase_value
        |FROM numbered GROUP BY user_id, sid
        |HAVING sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 1
        |ORDER BY user_id, session_start""".stripMargin,

    "events_time_to_convert" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        |), pu AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'view' THEN us END) AS first_view
        |  FROM ev GROUP BY user_id
        |), fp AS (
        |  SELECT e.user_id,
        |         (min(e.us) - min(pu.first_view)) / 1000000 AS lag_s
        |  FROM ev e JOIN pu ON e.user_id = pu.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND pu.first_view IS NOT NULL AND e.us >= pu.first_view
        |  GROUP BY e.user_id
        |), v AS (SELECT count(*) AS n_viewers FROM pu WHERE first_view IS NOT NULL),
        |f AS (
        |  -- global (group-less) aggregate so the zero-converted case still
        |  -- yields one row (count 0, NULL percentiles), matching Spark's
        |  -- global agg instead of GROUP BY's empty result
        |  SELECT count(*) AS n_converted,
        |         round(quantile_cont(lag_s, 0.5), 4) AS p50_s,
        |         round(quantile_cont(lag_s, 0.9), 4) AS p90_s
        |  FROM fp
        |)
        |SELECT v.n_viewers, f.n_converted,
        |       round(CAST(f.n_converted AS DOUBLE) / v.n_viewers, 6) AS conversion_rate,
        |       f.p50_s, f.p90_s
        |FROM f, v""".stripMargin,

    "events_incremental_agg" ->
      """SELECT event_type, count(*) AS n_events,
        |       CAST(round(sum(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_value,
        |       max(event_id) AS max_event_id
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "events_cusum_drift" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |         round(CAST(sum(CAST(value AS DECIMAL(38,18))) AS DOUBLE) / count(*), 6) AS dmean
        |  FROM events GROUP BY event_type, day
        |), tm AS (
        |  SELECT event_type,
        |         round(CAST(sum(CAST(dmean AS DECIMAL(38,18))) AS DOUBLE) / count(*), 6) AS m
        |  FROM daily GROUP BY event_type
        |), c AS (
        |  SELECT daily.event_type, day, dmean,
        |         round(CAST(sum(CAST(round(dmean - m, 6) AS DECIMAL(38,18)))
        |             OVER (PARTITION BY daily.event_type ORDER BY day
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS cusum
        |  FROM daily JOIN tm USING (event_type)
        |)
        |SELECT event_type, day, dmean, cusum,
        |       abs(cusum) = max(abs(cusum)) OVER (PARTITION BY event_type) AS is_peak
        |FROM c ORDER BY event_type, day""".stripMargin,

    "events_rfm" ->
      """WITH p AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, value
        |  FROM events WHERE event_type = 'purchase'
        |), ref AS (SELECT max(day) AS ref_day FROM p),
        |u AS (
        |  SELECT user_id,
        |         date_diff('day', max(day), (SELECT ref_day FROM ref)) AS recency_days,
        |         count(*) AS frequency,
        |         CAST(round(sum(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS monetary
        |  FROM p GROUP BY user_id
        |), s AS (
        |  SELECT user_id, CAST(recency_days AS INTEGER) AS recency_days,
        |         frequency, monetary,
        |         CAST(ntile(5) OVER (ORDER BY recency_days ASC, user_id ASC) AS INTEGER) AS r,
        |         CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id ASC) AS INTEGER) AS f,
        |         CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id ASC) AS INTEGER) AS m
        |  FROM u
        |)
        |SELECT user_id, recency_days, frequency, monetary, r, f, m,
        |       r || f || m AS segment
        |FROM s ORDER BY user_id""".stripMargin,

    "events_dedup_window" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, event_type, ts, epoch_us(ts) AS us,
         |         lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
         |           ORDER BY ts ASC, event_id ASC) AS prev_us
         |  FROM events
         |)
         |SELECT event_id, user_id, event_type, ts, us - prev_us AS gap_us
         |FROM e WHERE prev_us IS NULL OR us - prev_us > $DedupWindowUs
         |ORDER BY event_id""".stripMargin,

    "events_trigram_paths" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         lag(event_type, 2) OVER w AS step1,
        |         lag(event_type, 1) OVER w AS step2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |)
        |SELECT step1, step2, event_type AS step3, count(*) AS n_paths
        |FROM seq WHERE step1 IS NOT NULL
        |GROUP BY step1, step2, step3
        |ORDER BY n_paths DESC, step1 ASC, step2 ASC, step3 ASC
        |LIMIT 20""".stripMargin,

    // PIT lookup replay: SCD-2 version starts + strictly-prior last_value
    // over the union — the same semantics the native as-of merge computes.
    "events_pit_join" ->
      s"""WITH ev AS (
         |  SELECT event_id, user_id, ts, event_type, value, epoch_us(ts) AS us
         |  FROM events
         |), p AS (
         |  SELECT user_id, us, event_id,
         |         CASE WHEN value < $PitBandMid THEN 'low'
         |              WHEN value < $PitBandHigh THEN 'mid'
         |              ELSE 'high' END AS band
         |  FROM ev WHERE event_type = 'purchase'
         |), v AS (
         |  SELECT user_id, us, event_id, band
         |  FROM (SELECT *, lag(band) OVER (PARTITION BY user_id
         |          ORDER BY us ASC, event_id ASC) AS prev_band FROM p)
         |  WHERE prev_band IS NULL OR prev_band <> band
         |), u AS (
         |  SELECT user_id, us, event_id, CAST(NULL AS VARCHAR) AS band,
         |         ts, TRUE AS is_click
         |  FROM ev WHERE event_type = 'click'
         |  UNION ALL
         |  SELECT user_id, us, event_id, band, CAST(NULL AS TIMESTAMP), FALSE
         |  FROM v
         |), w AS (
         |  SELECT *, last_value(band IGNORE NULLS)
         |           OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |           AS band_at_click
         |  FROM u
         |)
         |SELECT event_id, user_id, ts, band_at_click
         |FROM w WHERE is_click ORDER BY event_id""".stripMargin,

    "events_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         lag(event_type, 1) OVER (PARTITION BY user_id
        |           ORDER BY ts ASC, event_id ASC) AS from_type
        |  FROM events
        |)
        |SELECT from_type, event_type AS to_type, count(*) AS n_transitions
        |FROM seq WHERE from_type IS NOT NULL
        |GROUP BY from_type, to_type
        |ORDER BY n_transitions DESC, from_type ASC, to_type ASC""".stripMargin,

    "events_hourly_topk" ->
      """WITH hourly AS (
        |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, user_id,
        |         count(*) AS n_events
        |  FROM events GROUP BY hour, user_id
        |)
        |SELECT hour, user_id, n_events,
        |       CAST(rk AS BIGINT) AS rk
        |FROM (SELECT *, row_number() OVER (PARTITION BY hour
        |        ORDER BY n_events DESC, user_id ASC) AS rk
        |      FROM hourly)
        |WHERE rk <= 3
        |ORDER BY hour ASC, rk ASC""".stripMargin,

    "events_ewma" -> ewmaOracleSql,

    "events_winsorized" ->
      """WITH q AS (
        |  SELECT event_type,
        |         quantile_cont(value, 0.05) AS p05,
        |         quantile_cont(value, 0.95) AS p95
        |  FROM events GROUP BY event_type
        |)
        |SELECT e.event_type,
        |       round(CAST(sum(CAST(value AS DECIMAL(38,18))) AS DOUBLE) / count(*), 6) AS mean_raw,
        |       round(CAST(sum(CAST(least(greatest(value, p05), p95) AS DECIMAL(38,18))) AS DOUBLE) / count(*), 6) AS mean_winsorized,
        |       count(*) FILTER (WHERE value < p05 OR value > p95) AS n_clamped,
        |       round(min(p05), 6) AS p05,
        |       round(min(p95), 6) AS p95
        |FROM events e JOIN q USING (event_type)
        |GROUP BY e.event_type
        |ORDER BY e.event_type""".stripMargin,

    "events_zscore_outliers" ->
      """WITH s0 AS (
        |  SELECT event_type,
        |         CAST(sum(CAST(value AS DECIMAL(38,18))) AS DOUBLE) AS s1,
        |         CAST(sum(CAST(value * value AS DECIMAL(38,15))) AS DOUBLE) AS s2,
        |         count(*) AS cnt
        |  FROM events GROUP BY event_type
        |), s AS (
        |  SELECT event_type, s1 / cnt AS m,
        |         sqrt(greatest(0.0, (s2 - s1 * s1 / cnt) / (cnt - 1))) AS sd
        |  FROM s0
        |)
        |SELECT event_id, e.event_type, value,
        |       round((value - m) / sd, 6) AS z
        |FROM events e JOIN s ON e.event_type = s.event_type
        |WHERE sd > 0 AND abs(round((value - m) / sd, 6)) >= 3
        |ORDER BY event_id""".stripMargin,

    "events_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS m
        |  FROM events GROUP BY event_type
        |), wm AS (
        |  SELECT e.event_id, e.event_type, e.value, med.m
        |  FROM events e JOIN med ON e.event_type = med.event_type
        |), mad AS (
        |  SELECT event_type, quantile_cont(abs(value - m), 0.5) AS mad
        |  FROM wm GROUP BY event_type
        |)
        |SELECT event_id, wm.event_type, value,
        |       round(0.6745 * (value - m) / mad, 6) AS mz
        |FROM wm JOIN mad ON wm.event_type = mad.event_type
        |WHERE mad > 0 AND abs(round(0.6745 * (value - m) / mad, 6)) >= 3.5
        |ORDER BY event_id""".stripMargin,

    "events_cohort_retention" ->
      """WITH pw AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS w
        |  FROM events WHERE event_type = 'purchase'
        |), cohort AS (
        |  SELECT user_id, min(w) AS cohort_week FROM pw GROUP BY user_id
        |)
        |SELECT cohort_week,
        |       CAST(datediff('week', cohort_week, w) AS INTEGER) AS week_offset,
        |       count(DISTINCT pw.user_id) AS n_users
        |FROM pw JOIN cohort USING (user_id)
        |GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "events_sliding_dau" ->
      s"""WITH ud AS (
         |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
         |  FROM events
         |), win AS (
         |  SELECT day + CAST(g AS INTEGER) AS wday, user_id
         |  FROM ud, (SELECT unnest(generate_series(0, ${SlidingDauDays - 1})) AS g) gs
         |), w AS (
         |  SELECT wday, count(DISTINCT user_id) AS dau_7d FROM win GROUP BY wday
         |), d AS (
         |  SELECT day, count(DISTINCT user_id) AS dau_1d FROM ud GROUP BY day
         |)
         |SELECT d.day AS window_end, CAST(dau_1d AS BIGINT) AS dau_1d,
         |       CAST(dau_7d AS BIGINT) AS dau_7d
         |FROM d JOIN w ON d.day = w.wday
         |ORDER BY window_end""".stripMargin,

    "events_sliding_dau_approx" ->
      s"""WITH ud AS (
         |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
         |  FROM events
         |), win AS (
         |  SELECT day + CAST(g AS INTEGER) AS wday, user_id
         |  FROM ud, (SELECT unnest(generate_series(0, ${SlidingDauDays - 1})) AS g) gs
         |), w AS (
         |  SELECT wday, count(DISTINCT user_id) AS dau_7d FROM win GROUP BY wday
         |), d AS (SELECT DISTINCT day FROM ud)
         |SELECT d.day AS window_end, CAST(dau_7d AS BIGINT) AS dau_7d,
         |       TRUE AS hll_within_5pct
         |FROM d JOIN w ON d.day = w.wday
         |ORDER BY window_end""".stripMargin,

    "events_weekday_anomaly" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |         round(CAST(sum(CAST(value AS DECIMAL(38,18))) AS DOUBLE) / count(*), 6) AS dmean,
         |         CAST(dayofweek(CAST(date_trunc('day', ts) AS DATE)) + 1 AS INTEGER) AS dow
         |  FROM events GROUP BY event_type, day
         |), mu0 AS (
         |  -- exact integer half-up rounding of the baseline mean (see Spark side)
         |  SELECT event_type, dow, count(*) AS n_days,
         |         CAST(sum(CAST(round(dmean * 1000000) AS BIGINT)) AS BIGINT) AS s6
         |  FROM daily GROUP BY event_type, dow
         |), mu AS (
         |  -- round half AWAY FROM ZERO on |s6| (matches the Spark side;
         |  -- div/% touch only non-negative operands, where // and div agree)
         |  SELECT event_type, dow, n_days,
         |         CAST(CASE WHEN s6 >= 0 THEN 1 ELSE -1 END *
         |              (abs(s6) // n_days + CASE WHEN 2 * (abs(s6) % n_days) >= n_days
         |               THEN 1 ELSE 0 END) AS DOUBLE) / 1000000.0 AS mu
         |  FROM mu0
         |), sd AS (
         |  SELECT d.event_type, d.dow, mu.n_days, mu.mu,
         |         round(sqrt(CAST(sum(CAST(round((d.dmean - mu.mu) * (d.dmean - mu.mu), 9)
         |               AS DECIMAL(38,18))) AS DOUBLE) / (mu.n_days - 1)), 6) AS sd
         |  FROM daily d JOIN mu ON d.event_type = mu.event_type AND d.dow = mu.dow
         |  GROUP BY d.event_type, d.dow, mu.n_days, mu.mu
         |  HAVING mu.n_days >= 2
         |)
         |SELECT d.event_type, d.day, d.dmean, s.mu, s.sd,
         |       round((d.dmean - s.mu) / s.sd, 6) AS z
         |FROM daily d JOIN sd s ON d.event_type = s.event_type AND d.dow = s.dow
         |WHERE s.sd > 0 AND abs(round((d.dmean - s.mu) / s.sd, 6)) >= $WeekdayAnomalyZ
         |ORDER BY d.event_type, d.day""".stripMargin,

    "events_rolling_median" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |         round(CAST(sum(CAST(value AS DECIMAL(38,18))) AS DOUBLE) / count(*), 6) AS dmean,
         |         date_diff('day', DATE '1995-01-01', CAST(date_trunc('day', ts) AS DATE)) AS x
         |  FROM events GROUP BY event_type, day
         |)
         |SELECT event_type, day, dmean,
         |       round(quantile_cont(dmean, 0.5) OVER (
         |         PARTITION BY event_type ORDER BY x
         |         RANGE BETWEEN ${RollingMedianDays - 1} PRECEDING AND CURRENT ROW), 6)
         |         AS rolling_median
         |FROM daily ORDER BY event_type, day""".stripMargin,

    "events_daily_ohlc" ->
      """WITH e AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |         ts, event_id, value,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts ASC, event_id ASC) AS rn_a,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events
        |)
        |SELECT event_type, day,
        |       min(CASE WHEN rn_a = 1 THEN value END) AS open,
        |       max(value) AS high,
        |       min(value) AS low,
        |       min(CASE WHEN rn_d = 1 THEN value END) AS close,
        |       count(*) AS n_events,
        |       CAST(round(sum(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS volume
        |FROM e
        |GROUP BY event_type, day
        |ORDER BY event_type, day""".stripMargin,

    "events_forward_fill" ->
      """SELECT event_id, user_id,
        |       CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS reading,
        |       last_value(CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END IGNORE NULLS)
        |         OVER (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "events_funnel" ->
      s"""WITH s1 AS (
         |  SELECT user_id, ts, event_id, event_type,
         |         min(CASE WHEN event_type = 'view' THEN ts END)
         |         $funnelWindowSql AS first_view
         |  FROM events WHERE ts < TIMESTAMP '2024-01-03'
         |), s2 AS (
         |  SELECT *, min(CASE WHEN event_type = 'click' AND first_view IS NOT NULL THEN ts END)
         |         $funnelWindowSql AS first_click
         |  FROM s1
         |), s3 AS (
         |  SELECT *, min(CASE WHEN event_type = 'purchase' AND first_click IS NOT NULL THEN ts END)
         |         $funnelWindowSql AS first_purchase
         |  FROM s2
         |)
         |SELECT user_id, min(first_view) AS first_view, min(first_click) AS first_click,
         |       min(first_purchase) AS first_purchase,
         |       CASE WHEN min(first_purchase) IS NOT NULL THEN 'purchase'
         |            WHEN min(first_click) IS NOT NULL THEN 'click'
         |            WHEN min(first_view) IS NOT NULL THEN 'view'
         |            ELSE 'none' END AS stage
         |FROM s3 GROUP BY user_id ORDER BY user_id""".stripMargin,
    "events_json_stats" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "events_asof_attribution" -> asofOracleSql,
    // the native-operator twin is gated against the IDENTICAL oracle
    "events_asof_custom" -> asofOracleSql,

    "events_latest_per_user" ->
      """WITH r AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM events
        |)
        |SELECT user_id, event_id, ts, event_type
        |FROM r WHERE rk = 1 ORDER BY user_id""".stripMargin,

    "events_skew_salted" ->
      """SELECT event_type, count(*) AS n_events,
        |       CAST(round(sum(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "events_range_frame" ->
      """WITH e AS (
        |  SELECT event_id, event_type, epoch_us(ts) AS t_us, value FROM events
        |)
        |SELECT event_id, event_type,
        |       count(*) OVER w AS n_last_hour,
        |       CAST(round(sum(CAST(value AS DECIMAL(28,10))) OVER w, 2) AS DOUBLE) AS sum_last_hour
        |FROM e
        |WINDOW w AS (PARTITION BY event_type ORDER BY t_us
        |             RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "events_moving_avg" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS day, event_type,
        |         CAST(round(sum(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS daily_value
        |  FROM events GROUP BY date_trunc('day', ts), event_type
        |)
        |SELECT day, event_type, daily_value,
        |       round(sum(daily_value) OVER w / count(*) OVER w, 6) AS avg_7d
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY day
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, day""".stripMargin,

    "events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |       count(*) AS n_events,
        |       CAST(round(sum(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY date_trunc('hour', ts), event_type
        |ORDER BY hour, event_type""".stripMargin,

    "events_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
        |              THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |), numbered AS (
        |  SELECT user_id,
        |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM flagged
        |), per_session AS (
        |  SELECT user_id, sess_id, count(*) AS n FROM numbered GROUP BY user_id, sess_id
        |)
        |SELECT user_id,
        |       count(*) AS n_sessions,
        |       max(n) AS max_session_events,
        |       CAST(sum(n) AS BIGINT) AS n_events
        |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin,

    // session_window semantics: break at gap > threshold (an exact-gap
    // event still merges — spec-verified); session bounds rebuilt from
    // epoch micros so timestamp precision matches Spark's µs output.
    "events_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |), numbered AS (
        |  SELECT user_id, ts, value,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged
        |)
        |SELECT user_id,
        |       make_timestamp(min(epoch_us(ts))) AS session_start,
        |       make_timestamp(max(epoch_us(ts)) + 1800 * 1000000) AS session_end,
        |       count(*) AS n_events,
        |       CAST(round(sum(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_value
        |FROM numbered GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "events_scd2" ->
      """WITH marked AS (
        |  SELECT user_id, event_type, ts, event_id,
        |         lag(event_type) OVER w AS prev_type
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |), changes AS (
        |  SELECT user_id, event_type, ts, event_id FROM marked
        |  WHERE prev_type IS NULL OR prev_type <> event_type
        |)
        |SELECT user_id, event_type,
        |       ts AS valid_from,
        |       lead(ts) OVER w AS valid_to,
        |       lead(ts) OVER w IS NULL AS is_current
        |FROM changes
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY user_id, valid_from""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_hourly"           -> (eventsHourly _),
    "events_sessions"         -> (eventsSessions _),
    "events_session_window"   -> (eventsSessionWindow _),
    "events_scd2"             -> (eventsScd2 _),
    "events_moving_avg"       -> (eventsMovingAvg _),
    "events_asof_attribution" -> (eventsAsofAttribution _),
    "events_asof_custom"      -> (eventsAsofCustom _),
    "events_asof_tolerance"   -> (eventsAsofTolerance _),
    // primary lane is the LINEAR change-log form (round-9 promotion: the
    // sliding WindowExec twin is quadratic in frame density — alpha_tail
    // 1.42 on the sf sweep — and survives only as the differential spec
    // in ExtensionsSpec, never as a registered query)
    "events_range_frame"      -> (eventsRangeFrameScalable _),
    "events_skew_salted"      -> (eventsSkewSalted _),
    "events_latest_per_user"  -> (eventsLatestPerUser _),
    "events_json_stats"       -> (eventsJsonStats _),
    "events_funnel"           -> (eventsFunnel _),
    "events_forward_fill"     -> (eventsForwardFill _),
    "events_cohort_retention" -> (eventsCohortRetention _),
    "events_sliding_dau"      -> (eventsSlidingDau _),
    "events_sliding_dau_approx" -> (eventsSlidingDauApprox _),
    "events_rolling_median"   -> (eventsRollingMedian _),
    "events_weekday_anomaly"  -> (eventsWeekdayAnomaly _),
    "events_daily_ohlc"       -> (eventsDailyOhlc _),
    "events_zscore_outliers"  -> (eventsZscoreOutliers _),
    "events_mad_outliers"     -> (eventsMadOutliers _),
    "events_winsorized"       -> (eventsWinsorized _),
    "events_transitions"      -> (eventsTransitions _),
    "events_hourly_topk"      -> (eventsHourlyTopk _),
    "events_ewma"             -> (eventsEwma _),
    "events_dedup_window"     -> (eventsDedupWindow _),
    "events_trigram_paths"    -> (eventsTrigramPaths _),
    "events_pit_join"         -> (eventsPitJoin _),
    "events_cusum_drift"      -> (eventsCusumDrift _),
    "events_rfm"              -> (eventsRfm _),
    "events_incremental_agg"  -> (eventsIncrementalAgg _),
    "events_time_to_convert"  -> (eventsTimeToConvert _),
    "events_purchase_sessions" -> (eventsPurchaseSessions _),
    "events_calendar_gaps"    -> (eventsCalendarGaps _),
    "events_weekday_seasonality" -> (eventsWeekdaySeasonality _),
    "events_ab_lift"          -> (eventsAbLift _),
    "events_trend_slope"      -> (eventsTrendSlope _),
  )
}
