package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.EventMarts.enriched

/** User-level analytics beyond the daily marts: growth accounting
  * (the new/retained/resurrected/lapsed state machine), the per-user
  * feature matrix a training pipeline exports, and the hour-of-week
  * seasonality profile.
  *
  * Reference anchor: scripts/spark_batch_processor.py's user
  * aggregates and the retention family (EventMarts) — these extend
  * the same grain with the standard product-analytics surfaces the
  * reference's mart consumers compute downstream in SQL.
  *
  * Scale notes: every query here is one shuffle at user (or
  * user-day) grain with map-side partial aggregation, plus window
  * functions whose partition keys are subsets of the grouping keys —
  * no whole-frame windows, no Expand plans. All output arithmetic is
  * exact integers/decimals or single IEEE divisions of them, so the
  * DuckDB oracle hashes bit-identically (the repo's libm rule:
  * Math.log never reaches an oracle-checked column).
  */
object UserAnalytics {

  /** Churn horizon for growth accounting: a returning gap ≤ 7 days
    * counts as retained, > 7 days as resurrected. */
  val ChurnDays = 7

  /** Daily growth accounting over user active-days. For each user
    * active-date: `new` (first activity ever), `retained` (previous
    * active day within [[ChurnDays]]), `resurrected` (longer gap);
    * `lapsed_after` marks active-days followed by a gap longer than
    * the horizon (or no activity again) — the standard
    * new/retained/resurrected/churned ledger (Growth Accounting),
    * day-censused.
    *
    * Plan shape: distinct (user, date) — one shuffle with partial
    * dedup — then lag/lead over the per-user date sequence (window
    * subset-satisfied by a user_id exchange), then a tiny day-grain
    * rollup. At 100 TB the distinct is the only fact-sized exchange
    * and it carries two columns. */
  def userLifecycle(spark: SparkSession, dir: String): DataFrame =
    userLifecycleFrom(enriched(spark, dir))

  def userLifecycleFrom(e: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_date")
    val days = e.filter(col("user_id").isNotNull && col("event_date").isNotNull)
      .select(col("user_id"), col("event_date")).distinct()
      .withColumn("prev_gap", datediff(col("event_date"), lag("event_date", 1).over(w)))
      .withColumn("next_gap", datediff(lead("event_date", 1).over(w), col("event_date")))
    days
      .groupBy(col("event_date"))
      .agg(
        count(lit(1)).as("active_users"),
        count(when(col("prev_gap").isNull, 1)).as("new_users"),
        count(when(col("prev_gap") <= ChurnDays, 1)).as("retained_users"),
        count(when(col("prev_gap") > ChurnDays, 1)).as("resurrected_users"),
        count(when(col("next_gap").isNull || col("next_gap") > ChurnDays, 1))
          .as("lapsed_after_users"))
      .orderBy("event_date")
  }

  val userLifecycleSql: String =
    s"""WITH days AS (
       |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS event_date
       |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
       |), seq AS (
       |  SELECT user_id, event_date,
       |    date_diff('day', LAG(event_date) OVER w, event_date) AS prev_gap,
       |    date_diff('day', event_date, LEAD(event_date) OVER w) AS next_gap
       |  FROM days WINDOW w AS (PARTITION BY user_id ORDER BY event_date)
       |)
       |SELECT event_date, COUNT(*) AS active_users,
       |  COUNT(CASE WHEN prev_gap IS NULL THEN 1 END) AS new_users,
       |  COUNT(CASE WHEN prev_gap <= $ChurnDays THEN 1 END) AS retained_users,
       |  COUNT(CASE WHEN prev_gap > $ChurnDays THEN 1 END) AS resurrected_users,
       |  COUNT(CASE WHEN next_gap IS NULL OR next_gap > $ChurnDays THEN 1 END)
       |    AS lapsed_after_users
       |FROM seq GROUP BY event_date ORDER BY event_date""".stripMargin

  /** Weekly retention triangle: cohort week (user's first active
    * week) × week offset → active users and retention rate — the full
    * cohort matrix behind every retention heat-map, where
    * retention_curve reads only the D1/D3/D7 slices at day grain.
    *
    * Plan shape: the distinct (user, week) frame is the only
    * fact-sized exchange; cohort week rides a user-partitioned window
    * (subset-satisfied); the (cohort, offset) cells are plain counts
    * over already-distinct rows (no Expand), and the rate divides by
    * the offset-0 cell via a cohort-partitioned window over the tiny
    * triangle frame. */
  def retentionTriangle(spark: SparkSession, dir: String): DataFrame =
    retentionTriangleFrom(enriched(spark, dir))

  def retentionTriangleFrom(e: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    val cells = e.filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), date_trunc("week", col("event_date")).cast("date").as("week"))
      .distinct()
      .withColumn("cohort_week", min("week").over(w))
      .withColumn("week_offset",
        (datediff(col("week"), col("cohort_week")) / lit(7)).cast("int"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("active_users"))
    val wc = Window.partitionBy("cohort_week")
    cells
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("active_users"))).over(wc))
      .withColumn("retention_pct",
        col("active_users").cast("double") / col("cohort_size").cast("double") * lit(100.0))
      .orderBy("cohort_week", "week_offset")
  }

  val retentionTriangleSql: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week
      |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
      |), f AS (
      |  SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id
      |), cells AS (
      |  SELECT f.cohort_week,
      |    CAST(date_diff('day', f.cohort_week, uw.week) / 7 AS INT) AS week_offset,
      |    COUNT(*) AS active_users
      |  FROM uw JOIN f ON uw.user_id = f.user_id
      |  GROUP BY 1, 2
      |)
      |SELECT cohort_week, week_offset, active_users,
      |  MAX(CASE WHEN week_offset = 0 THEN active_users END)
      |    OVER (PARTITION BY cohort_week) AS cohort_size,
      |  CAST(active_users AS DOUBLE)
      |    / CAST(MAX(CASE WHEN week_offset = 0 THEN active_users END)
      |        OVER (PARTITION BY cohort_week) AS DOUBLE) * 100.0 AS retention_pct
      |FROM cells
      |ORDER BY cohort_week, week_offset""".stripMargin

  /** Per-user feature matrix — the row a training pipeline exports
    * per user: type counts, activity span/recency, monetary value,
    * and derived rates. One user-grain shuffle (the per-type counts
    * are conditional aggregates, not an Expand); the corpus-max date
    * for recency is a 1-row broadcast, never a whole-frame window.
    * Derived columns are single IEEE divisions of exact ints/decimals
    * (deterministic across engines); monetary sums in decimal. */
  def userFeatureMatrix(spark: SparkSession, dir: String): DataFrame =
    userFeatureMatrixFrom(enriched(spark, dir))

  def userFeatureMatrixFrom(e: DataFrame): DataFrame = {
    val typed = e.filter(col("user_id").isNotNull && col("event_date").isNotNull)
    val maxDate = typed.agg(max(col("event_date")).as("corpus_max_date"))
    typed
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("event_type") === "view", 1)).as("n_view"),
        count(when(col("event_type") === "click", 1)).as("n_click"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
        count(when(col("event_type") === "signup", 1)).as("n_signup"),
        count(when(col("event_type") === "error", 1)).as("n_error"),
        countDistinct(col("event_date")).as("active_days"),
        min(col("event_date")).as("first_date"),
        max(col("event_date")).as("last_date"),
        coalesce(sum(when(col("event_type") === "purchase", col("value"))
          .cast("decimal(12,2)")), lit(0).cast("decimal(12,2)")).as("monetary"))
      .crossJoin(broadcast(maxDate))
      .withColumn("tenure_days", datediff(col("last_date"), col("first_date")))
      .withColumn("recency_days", datediff(col("corpus_max_date"), col("last_date")))
      .withColumn("avg_purchase_value",
        when(col("n_purchase") > 0,
          col("monetary").cast("double") / col("n_purchase").cast("double")))
      .withColumn("events_per_active_day",
        col("n_events").cast("double") / col("active_days").cast("double"))
      .withColumn("error_rate",
        col("n_error").cast("double") / col("n_events").cast("double"))
      .select(col("user_id"), col("n_events"), col("n_view"), col("n_click"),
        col("n_purchase"), col("n_signup"), col("n_error"), col("active_days"),
        col("first_date"), col("last_date"), col("tenure_days"), col("recency_days"),
        col("monetary").cast("double").as("monetary"), col("avg_purchase_value"),
        col("events_per_active_day"), col("error_rate"))
      .orderBy("user_id")
  }

  val userFeatureMatrixSql: String =
    """WITH typed AS (
      |  SELECT user_id, CAST(ts AS DATE) AS event_date, event_type, value
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |), m AS (SELECT MAX(event_date) AS corpus_max_date FROM typed)
      |SELECT user_id, n_events, n_view, n_click, n_purchase, n_signup, n_error,
      |  active_days, first_date, last_date,
      |  date_diff('day', first_date, last_date) AS tenure_days,
      |  date_diff('day', last_date, corpus_max_date) AS recency_days,
      |  CAST(monetary AS DOUBLE) AS monetary,
      |  CASE WHEN n_purchase > 0
      |    THEN CAST(monetary AS DOUBLE) / CAST(n_purchase AS DOUBLE) END
      |    AS avg_purchase_value,
      |  CAST(n_events AS DOUBLE) / CAST(active_days AS DOUBLE) AS events_per_active_day,
      |  CAST(n_error AS DOUBLE) / CAST(n_events AS DOUBLE) AS error_rate
      |FROM (
      |  SELECT user_id, COUNT(*) AS n_events,
      |    COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
      |    COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
      |    COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
      |    COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
      |    COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
      |    COUNT(DISTINCT event_date) AS active_days,
      |    MIN(event_date) AS first_date, MAX(event_date) AS last_date,
      |    COALESCE(SUM(CASE WHEN event_type = 'purchase'
      |      THEN CAST(value AS DECIMAL(12,2)) END), 0) AS monetary
      |  FROM typed GROUP BY user_id
      |) u CROSS JOIN m
      |ORDER BY user_id""".stripMargin

  /** Hour-of-week traffic seasonality: for each (day-of-week, hour)
    * slot, events per calendar day of that weekday with a
    * zero-day-aware mean and standard deviation — the baseline an
    * hour-grain traffic anomaly alert compares against (dq_anomaly's
    * weekly-seasonal sibling).
    *
    * Zero-days matter: a slot that saw traffic on 3 of a weekday's 5
    * calendar days must average over 5, so the per-dow calendar-day
    * census joins in (a ≤7-row broadcast). Variance comes from exact
    * integer sums (Σx, Σx², n) in one pass; mean/std are then single
    * IEEE ops in a pinned order, so Spark and DuckDB agree
    * bit-for-bit (sqrt is correctly-rounded in both). */
  def trafficSeasonality(spark: SparkSession, dir: String): DataFrame =
    trafficSeasonalityFrom(enriched(spark, dir))

  def trafficSeasonalityFrom(e: DataFrame): DataFrame = {
    val typed = e.filter(col("ts").isNotNull)
      .select(col("event_date"), dayofweek(col("event_date")).as("dow"),
        hour(col("ts")).as("event_hour"))
    // one calendar-day census per weekday (≤7 rows, broadcast back)
    val dowDays = typed.select(col("event_date"), col("dow")).distinct()
      .groupBy(col("dow")).agg(count(lit(1)).as("n_days"))
    val slots = typed
      .groupBy(col("event_date"), col("dow"), col("event_hour"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("dow"), col("event_hour"))
      .agg(
        count(lit(1)).as("days_active"),
        sum(col("n")).as("total_events"),
        sum(col("n") * col("n")).as("sum_sq"),
        max(col("n")).as("max_day"))
    val grand = slots.agg(sum(col("total_events")).as("grand_total"))
    val mean = col("total_events").cast("double") / col("n_days").cast("double")
    slots.join(broadcast(dowDays), "dow")
      .crossJoin(broadcast(grand))
      .withColumn("mean_per_day", mean)
      .withColumn("std_per_day",
        sqrt((col("sum_sq").cast("double") -
          col("n_days").cast("double") * col("mean_per_day") * col("mean_per_day")) /
          col("n_days").cast("double")))
      .withColumn("share_pct",
        col("total_events").cast("double") / col("grand_total").cast("double") * lit(100.0))
      .select(col("dow"), col("event_hour"), col("n_days"), col("days_active"),
        col("total_events"), col("max_day"), col("mean_per_day"),
        col("std_per_day"), col("share_pct"))
      .orderBy("dow", "event_hour")
  }

  /** Seasonal-naive next-day hourly forecast — the ACTION side of
    * `traffic_seasonality` (the baseline says what a normal Tuesday
    * 3pm looks like; this says what TOMORROW 3pm should bring, the
    * number capacity planning and alert thresholds actually consume):
    * predicted(hour) = hour-of-week baseline mean × recent LEVEL, the
    * level being the last-7-calendar-day event rate against the
    * corpus-wide daily rate — so a traffic ramp scales every hour's
    * forecast while the weekly SHAPE stays the baseline's. Exact
    * integer counts end-to-end; level and prediction are the only
    * IEEE divisions (products grouped long-first so both engines see
    * identical integers) — oracle-green. ≤24 output rows; everything
    * after the one fact rollup is broadcast scalar algebra. */
  def trafficForecast(spark: SparkSession, dir: String): DataFrame =
    trafficForecastFrom(enriched(spark, dir))

  def trafficForecastFrom(e: DataFrame): DataFrame =
    forecastFromSlots(e.filter(col("ts").isNotNull)
      .select(col("event_date"), dayofweek(col("event_date")).as("dow"),
        hour(col("ts")).as("event_hour"))
      .groupBy(col("event_date"), col("dow"), col("event_hour"))
      .agg(count(lit(1)).as("n")))

  /** The forecast recipe over a pre-aggregated (event_date, dow,
    * event_hour, n) slot frame — ONE fact exchange to slot grain,
    * then every leg (bounds, recent level, baseline) is
    * slot-dimension algebra; counts are additive so this is
    * result-identical to the raw-row formulation while scanning the
    * fact once. Shared by the batch query and the streaming-log
    * rescore (`streaming.EventStream.forecastFromTrafficLog`), so
    * live and nightly capacity numbers cannot drift. */
  private[graft] def forecastFromSlots(slotsIn: DataFrame): DataFrame = {
    val slots = slotsIn.localCheckpoint() // feeds bounds/recent/baseline
    val bounds = slots.agg(max(col("event_date")).as("last_date"),
      countDistinct(col("event_date")).as("n_dates"),
      sum(col("n")).as("all_events"))
    val recent = slots.join(broadcast(bounds))
      .filter(datediff(col("last_date"), col("event_date")) < 7)
      .agg(sum(col("n")).as("recent_events"))
    val dowDays = slots.select(col("event_date"), col("dow")).distinct()
      .groupBy(col("dow")).agg(count(lit(1)).as("n_days"))
    val baseline = slots
      .groupBy(col("dow"), col("event_hour"))
      .agg(sum(col("n")).as("total_events"))
      .join(broadcast(dowDays), "dow")
    baseline
      .crossJoin(broadcast(bounds))
      .crossJoin(broadcast(recent))
      .withColumn("forecast_date", date_add(col("last_date"), 1))
      .filter(col("dow") === dayofweek(col("forecast_date")))
      .withColumn("baseline_mean",
        col("total_events").cast("double") / col("n_days").cast("double"))
      .withColumn("level",
        (col("recent_events") * col("n_dates")).cast("double") /
          (col("all_events") * lit(7L)).cast("double"))
      .select(col("forecast_date"), col("event_hour"), col("dow"),
        col("baseline_mean"), col("level"),
        (col("baseline_mean") * col("level")).as("predicted_events"))
      .orderBy("event_hour")
  }

  val trafficForecastSql: String =
    """WITH typed AS (
      |  SELECT CAST(ts AS DATE) AS event_date,
      |    CAST(EXTRACT(dow FROM CAST(ts AS DATE)) AS INT) + 1 AS dow,
      |    CAST(EXTRACT(hour FROM ts) AS INT) AS event_hour
      |  FROM events WHERE ts IS NOT NULL
      |), b AS (
      |  SELECT MAX(event_date) AS last_date,
      |    CAST(COUNT(DISTINCT event_date) AS BIGINT) AS n_dates,
      |    CAST(COUNT(*) AS BIGINT) AS all_events
      |  FROM typed
      |), r AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS recent_events
      |  FROM typed, b WHERE DATE_DIFF('day', event_date, last_date) < 7
      |), dd AS (
      |  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days FROM
      |    (SELECT DISTINCT event_date, dow FROM typed) d GROUP BY dow
      |), base AS (
      |  SELECT dow, event_hour, CAST(COUNT(*) AS BIGINT) AS total_events
      |  FROM typed GROUP BY dow, event_hour
      |)
      |SELECT CAST(last_date + 1 AS DATE) AS forecast_date, event_hour, dow,
      |  CAST(total_events AS DOUBLE) / CAST(n_days AS DOUBLE) AS baseline_mean,
      |  CAST(recent_events * n_dates AS DOUBLE) /
      |    CAST(all_events * 7 AS DOUBLE) AS level,
      |  (CAST(total_events AS DOUBLE) / CAST(n_days AS DOUBLE)) *
      |    (CAST(recent_events * n_dates AS DOUBLE) /
      |     CAST(all_events * 7 AS DOUBLE)) AS predicted_events
      |FROM base JOIN dd USING (dow), b, r
      |WHERE dow = CAST(EXTRACT(dow FROM CAST(last_date + 1 AS DATE)) AS INT) + 1
      |ORDER BY event_hour""".stripMargin

  val trafficSeasonalitySql: String =
    """WITH typed AS (
      |  SELECT CAST(ts AS DATE) AS event_date,
      |    CAST(EXTRACT(dow FROM CAST(ts AS DATE)) AS INT) + 1 AS dow,
      |    CAST(EXTRACT(hour FROM ts) AS INT) AS event_hour
      |  FROM events WHERE ts IS NOT NULL
      |), dow_days AS (
      |  SELECT dow, COUNT(*) AS n_days FROM
      |    (SELECT DISTINCT event_date, dow FROM typed) d GROUP BY dow
      |), daily AS (
      |  SELECT event_date, dow, event_hour, COUNT(*) AS n
      |  FROM typed GROUP BY 1, 2, 3
      |), slots AS (
      |  SELECT dow, event_hour, COUNT(*) AS days_active,
      |    CAST(SUM(n) AS BIGINT) AS total_events,
      |    CAST(SUM(n * n) AS BIGINT) AS sum_sq, MAX(n) AS max_day
      |  FROM daily GROUP BY 1, 2
      |), g AS (SELECT CAST(SUM(total_events) AS BIGINT) AS grand_total FROM slots)
      |SELECT s.dow, s.event_hour, d.n_days, s.days_active, s.total_events, s.max_day,
      |  CAST(s.total_events AS DOUBLE) / CAST(d.n_days AS DOUBLE) AS mean_per_day,
      |  sqrt((CAST(s.sum_sq AS DOUBLE) -
      |    CAST(d.n_days AS DOUBLE) *
      |      (CAST(s.total_events AS DOUBLE) / CAST(d.n_days AS DOUBLE)) *
      |      (CAST(s.total_events AS DOUBLE) / CAST(d.n_days AS DOUBLE))) /
      |    CAST(d.n_days AS DOUBLE)) AS std_per_day,
      |  CAST(s.total_events AS DOUBLE) / CAST(g.grand_total AS DOUBLE) * 100.0 AS share_pct
      |FROM slots s JOIN dow_days d USING (dow) CROSS JOIN g
      |ORDER BY dow, event_hour""".stripMargin

  /** CUSUM changepoint detection over daily traffic — the LEVEL-SHIFT
    * detector completing the time-series suite: `traffic_seasonality`
    * says what normal looks like, `traffic_anomaly_seasonal` flags
    * single outlier cells, `traffic_forecast` projects tomorrow — and
    * this answers "did the level permanently move, and WHEN" (a
    * tracking-tag drop, a bot ramp, a market launch), which pointwise
    * z-scores structurally miss because after a shift every day is
    * only mildly off its old mean. Classic Page/Brownian-bridge CUSUM:
    * the maximum absolute cumulative residual, normalized, against
    * the 5% bridge critical value 1.358 (Kolmogorov); argmax date =
    * the estimated changepoint.
    *
    * Exactness trick: residuals vs the global daily mean are kept as
    * SCALED integers u_d = n·c_d − T (Σu = 0 exactly), so the CUSUM
    * prefix is an exact BIGINT window sum and Σu² an exact decimal —
    * the statistic max|S|/√(Σu²) (algebraically max|S_r|/(σ√n) on the
    * unscaled residuals) needs ONE sqrt and ONE division, both
    * engines bit-identical (sqrt survives the oracle hash; log/exp
    * would not). Scale shape: one fact exchange to the day grain;
    * everything after is day-dimension windows (≤366 rows/year by
    * construction — the documented tiny-window class) under a 1-row
    * broadcast total. Weekday seasonality rides INSIDE the residual
    * noise here by design — it inflates σ symmetrically and cannot
    * fake a sustained drift; the weekday-adjusted pointwise score
    * stays `traffic_anomaly_seasonal`'s job. */
  def trafficChangepoint(spark: SparkSession, dir: String): DataFrame =
    trafficChangepointFrom(enriched(spark, dir))

  def trafficChangepointFrom(e: DataFrame): DataFrame =
    changepointFromDaily(e.filter(col("ts").isNotNull)
      .groupBy(col("event_date")).agg(count(lit(1)).as("n_events")))

  /** The CUSUM core over ANY (event_date, n_events) day frame — the
    * one definition the batch query and the streaming traffic-log
    * watch (`EventStream.changepointFromTrafficLog`) both run, so
    * live and nightly level-shift verdicts cannot drift. */
  def changepointFromDaily(daily: DataFrame): DataFrame = {
    val totals = daily.agg(count(lit(1)).as("n_days"),
      sum(col("n_events")).as("total"))
    val wCum = Window.orderBy(asc("event_date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wPick = Window.orderBy(desc("abs_cusum"), asc("event_date"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val sumU2 = col("sum_u2").cast("double")
    val stat = when(sumU2 > lit(0.0), col("max_abs").cast("double") / sqrt(sumU2))
    daily.crossJoin(broadcast(totals))
      .withColumn("u", col("n_days") * col("n_events") - col("total"))
      .withColumn("cusum", sum(col("u")).over(wCum))
      .withColumn("abs_cusum", abs(col("cusum")))
      .withColumn("sum_u2", sum(col("u").cast("decimal(19,0)") *
        col("u").cast("decimal(19,0)")).over(wAll))
      .withColumn("max_abs", max(col("abs_cusum")).over(wAll))
      .withColumn("split_date", first(col("event_date")).over(wPick))
      .select(col("event_date"), col("n_events"),
        (col("u").cast("double") / col("n_days").cast("double")).as("residual"),
        col("cusum"),
        stat.as("stat"),
        col("split_date"),
        coalesce(stat > lit(1.358), lit(false)).as("changepoint_flag"))
      .orderBy("event_date")
  }

  val trafficChangepointSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS event_date, CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM events WHERE ts IS NOT NULL GROUP BY 1
      |), t AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
      |    CAST(SUM(n_events) AS BIGINT) AS total FROM daily
      |), c AS (
      |  SELECT event_date, n_events, n_days,
      |    n_days * n_events - total AS u,
      |    CAST(SUM(n_days * n_events - total) OVER (ORDER BY event_date
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cusum
      |  FROM daily CROSS JOIN t
      |), g AS (
      |  SELECT *,
      |    CAST(SUM(CAST(u AS DECIMAL(19,0)) * CAST(u AS DECIMAL(19,0)))
      |      OVER () AS DOUBLE) AS sum_u2,
      |    CAST(MAX(ABS(cusum)) OVER () AS DOUBLE) AS max_abs,
      |    FIRST_VALUE(event_date) OVER (ORDER BY ABS(cusum) DESC, event_date
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS split_date
      |  FROM c
      |)
      |SELECT event_date, n_events,
      |  CAST(u AS DOUBLE) / CAST(n_days AS DOUBLE) AS residual,
      |  cusum,
      |  CASE WHEN sum_u2 > 0.0 THEN max_abs / sqrt(sum_u2) END AS stat,
      |  split_date,
      |  COALESCE(CASE WHEN sum_u2 > 0.0 THEN max_abs / sqrt(sum_u2) END > 1.358,
      |           FALSE) AS changepoint_flag
      |FROM g ORDER BY event_date""".stripMargin

  /** Seasonality-aware traffic anomaly detection — each (date, hour)
    * cell scored against ITS OWN weekday-hour baseline (z-score vs
    * the slot's zero-day-aware mean/std), where dq_anomaly scores
    * whole days against the flat daily mean: a quiet Sunday 3am that
    * would z-flag against the global curve is normal HERE, and a
    * Monday-9am dip that the global curve absorbs is caught. The
    * actionable composition of traffic_seasonality's baseline.
    *
    * Scale shape: ONE fact-sized exchange (the (date, dow, hour)
    * rollup, checkpoint-pinned because both the baseline and the
    * scored rows derive from it); the slot baseline, calendar census,
    * and the join back all run at day×24 dimension. In-sample z by
    * design (the baseline includes the scored day — the reference
    * dq_anomaly convention); variance from exact Σ/Σ²/n sums with
    * pinned-order IEEE ops, so the oracle hashes bit-identically. */
  def trafficAnomalySeasonal(spark: SparkSession, dir: String): DataFrame =
    trafficAnomalySeasonalFrom(enriched(spark, dir))

  def trafficAnomalySeasonalFrom(e: DataFrame, zThreshold: Double = 3.0): DataFrame = {
    val daily = e.filter(col("ts").isNotNull)
      .select(col("event_date"), dayofweek(col("event_date")).as("dow"),
        hour(col("ts")).as("event_hour"))
      .groupBy(col("event_date"), col("dow"), col("event_hour"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // day×24 frame; feeds the baseline AND the scored rows
    val dowDays = daily.select(col("event_date"), col("dow")).distinct()
      .groupBy(col("dow")).agg(count(lit(1)).as("n_days"))
    val slots = daily.groupBy(col("dow"), col("event_hour"))
      .agg(sum(col("n")).as("total_events"), sum(col("n") * col("n")).as("sum_sq"))
      .join(broadcast(dowDays), "dow")
    val mean = col("total_events").cast("double") / col("n_days").cast("double")
    val baseline = slots
      .withColumn("expected", mean)
      .withColumn("std_per_day",
        sqrt((col("sum_sq").cast("double") -
          col("n_days").cast("double") * col("expected") * col("expected")) /
          col("n_days").cast("double")))
      .select(col("dow"), col("event_hour"), col("n_days"),
        col("expected"), col("std_per_day"))
    daily.join(baseline, Seq("dow", "event_hour"))
      .withColumn("z_score",
        when(col("std_per_day") > 0,
          (col("n").cast("double") - col("expected")) / col("std_per_day")))
      .select(col("event_date"), col("event_hour"), col("dow"),
        col("n").as("observed"), col("n_days"), col("expected"),
        col("std_per_day"), col("z_score"),
        coalesce(abs(col("z_score")) >= zThreshold, lit(false)).as("is_anomaly"))
      .orderBy("event_date", "event_hour")
  }

  val trafficAnomalySeasonalSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS event_date,
      |    CAST(EXTRACT(dow FROM CAST(ts AS DATE)) AS INT) + 1 AS dow,
      |    CAST(EXTRACT(hour FROM ts) AS INT) AS event_hour, COUNT(*) AS n
      |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2, 3
      |), dow_days AS (
      |  SELECT dow, COUNT(*) AS n_days
      |  FROM (SELECT DISTINCT event_date, dow FROM daily) d GROUP BY dow
      |), baseline AS (
      |  SELECT s.dow, s.event_hour, d.n_days,
      |    CAST(s.total_events AS DOUBLE) / CAST(d.n_days AS DOUBLE) AS expected,
      |    sqrt((CAST(s.sum_sq AS DOUBLE) -
      |      CAST(d.n_days AS DOUBLE) *
      |        (CAST(s.total_events AS DOUBLE) / CAST(d.n_days AS DOUBLE)) *
      |        (CAST(s.total_events AS DOUBLE) / CAST(d.n_days AS DOUBLE))) /
      |      CAST(d.n_days AS DOUBLE)) AS std_per_day
      |  FROM (
      |    SELECT dow, event_hour, CAST(SUM(n) AS BIGINT) AS total_events,
      |      CAST(SUM(n * n) AS BIGINT) AS sum_sq
      |    FROM daily GROUP BY 1, 2
      |  ) s JOIN dow_days d USING (dow)
      |)
      |SELECT daily.event_date, daily.event_hour, daily.dow, daily.n AS observed,
      |  b.n_days, b.expected, b.std_per_day,
      |  CASE WHEN b.std_per_day > 0
      |    THEN (CAST(daily.n AS DOUBLE) - b.expected) / b.std_per_day END AS z_score,
      |  COALESCE(ABS(CASE WHEN b.std_per_day > 0
      |    THEN (CAST(daily.n AS DOUBLE) - b.expected) / b.std_per_day END) >= 3.0,
      |    FALSE) AS is_anomaly
      |FROM daily JOIN baseline b ON daily.dow = b.dow AND daily.event_hour = b.event_hour
      |ORDER BY daily.event_date, daily.event_hour""".stripMargin

  /** Survival horizon for [[retentionSurvival]] — offsets beyond 30
    * days read as flat tail at the test corpus' span. */
  val SurvivalMaxOffset = 30

  /** User survival curve (Kaplan-Meier under right-censoring at the
    * corpus end): for each day offset k, the share of users still
    * active at-or-after k days from their first activity, among users
    * whose observation window actually extends k days (users first
    * seen near the corpus end are censored out of the denominators
    * they can't reach — the bias the naive "active after k days"
    * curve has). The longitudinal complement of retention_curve's
    * calendar-cohort grid.
    *
    * Scale shape — NO per-user-per-offset explode of the fact table:
    * one user-grain rollup to (first_day, last_day), then two
    * HISTOGRAMS (lifetime days, window days — at most corpus-span
    * rows each) explode into their covered offsets. The fact table is
    * touched once; everything after is span×offset-bounded. The
    * corpus end rides the plan as a 1-row broadcast (scalar-subquery
    * pattern, zero driver round-trips). */
  def retentionSurvival(spark: SparkSession, dir: String): DataFrame =
    retentionSurvivalFrom(enriched(spark, dir))

  def retentionSurvivalFrom(e: DataFrame, maxOffset: Int = SurvivalMaxOffset): DataFrame = {
    val spans = e.filter(col("user_id").isNotNull && col("event_date").isNotNull)
      .groupBy(col("user_id"))
      .agg(min(col("event_date")).as("first_day"), max(col("event_date")).as("last_day"))
    val corpusEnd = spans.agg(max(col("last_day")).as("corpus_end"))
    val u = spans.crossJoin(broadcast(corpusEnd))
      .select(
        datediff(col("last_day"), col("first_day")).as("lifetime"),
        datediff(col("corpus_end"), col("first_day")).as("window"))
    // histogram → suffix counts via covered-offset explode: a row
    // (value v, n users) contributes n to every offset 0..min(v, max)
    def suffixCounts(vals: DataFrame, valCol: String, out: String): DataFrame =
      vals.groupBy(col(valCol).as("v")).agg(count(lit(1)).as("n"))
        .select(explode(sequence(lit(0), least(col("v"), lit(maxOffset)))).as("day_offset"),
          col("n"))
        .groupBy(col("day_offset")).agg(sum(col("n")).as(out))
    val surviving = suffixCounts(u, "lifetime", "surviving_users")
    val atRisk = suffixCounts(u, "window", "at_risk_users")
    atRisk.join(surviving, Seq("day_offset"), "left")
      .select(col("day_offset"), col("at_risk_users"),
        coalesce(col("surviving_users"), lit(0L)).as("surviving_users"),
        (coalesce(col("surviving_users"), lit(0L)).cast("double")
          / col("at_risk_users").cast("double") * lit(100)).as("survival_pct"))
      .orderBy("day_offset")
  }

  val retentionSurvivalSql: String =
    """WITH spans AS (
      |  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day, MAX(CAST(ts AS DATE)) AS last_day
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |  GROUP BY user_id
      |), u AS (
      |  SELECT date_diff('day', first_day, last_day) AS lifetime,
      |    date_diff('day', first_day, (SELECT MAX(last_day) FROM spans)) AS win
      |  FROM spans
      |), life AS (
      |  SELECT CAST(o.day_offset AS INT) AS day_offset, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM u, LATERAL (SELECT UNNEST(range(0, LEAST(lifetime, 30) + 1)) AS day_offset) o
      |  GROUP BY 1
      |), risk AS (
      |  SELECT CAST(o.day_offset AS INT) AS day_offset, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM u, LATERAL (SELECT UNNEST(range(0, LEAST(win, 30) + 1)) AS day_offset) o
      |  GROUP BY 1
      |)
      |SELECT r.day_offset, r.n AS at_risk_users, COALESCE(l.n, 0) AS surviving_users,
      |  CAST(COALESCE(l.n, 0) AS DOUBLE) / CAST(r.n AS DOUBLE) * 100 AS survival_pct
      |FROM risk r LEFT JOIN life l USING (day_offset)
      |ORDER BY day_offset""".stripMargin

  /** Inter-purchase interval census — the repeat-buy cadence curve
    * (how long until a customer buys AGAIN), the input to
    * replenishment-window and win-back timing decisions that
    * cohort_ltv's revenue triangle doesn't expose.
    *
    * Per user, consecutive purchase gaps via one lag window; gaps
    * bucket into power-of-two day bins (same fixed comparable bins as
    * doc_token_histogram — quantile bins would shift with the data),
    * then a ≤7-row rollup. share_of_gaps divides by the ONE-ROW
    * broadcast gap total (scalar-subquery pattern).
    *
    * Scale shape: the purchase filter lands on the scan (purchases
    * are a small fraction of events), one user_id exchange for the
    * lag window, one tiny hash aggregate. `DIV` (not `/`) keeps the
    * day arithmetic integer in both engines — DuckDB rounds
    * double→BIGINT casts while Spark truncates, so a float division
    * here would hash-mismatch on .5 boundaries. */
  def purchaseIntervals(spark: SparkSession, dir: String): DataFrame =
    purchaseIntervalsFrom(enriched(spark, dir))

  def purchaseIntervalsFrom(e: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_epoch", "event_id")
    val gaps = e
      .filter(col("event_type") === "purchase" && col("user_id").isNotNull &&
        col("ts").isNotNull)
      .select(col("user_id"), col("event_id"), col("event_epoch"))
      .withColumn("prev_epoch", lag("event_epoch", 1).over(w))
      .filter(col("prev_epoch").isNotNull)
      .withColumn("gap_days", expr("(event_epoch - prev_epoch) DIV 86400"))
    val bucket = Seq(32, 16, 8, 4, 2, 1)
      .foldLeft(when(lit(false), 0)) { (acc, b) => acc.when(col("gap_days") >= b, b) }
      .otherwise(0)
      .cast("int")
    val hist = gaps.select(col("user_id"), bucket.as("gap_bucket_days"))
      .groupBy("gap_bucket_days")
      .agg(count(lit(1)).as("n_gaps"), countDistinct(col("user_id")).as("n_users"))
    val total = hist.agg(sum(col("n_gaps")).as("total_gaps"))
    hist.crossJoin(broadcast(total))
      .select(col("gap_bucket_days"), col("n_gaps"), col("n_users"),
        (col("n_gaps").cast("double") / col("total_gaps").cast("double"))
          .as("share_of_gaps"))
      .orderBy("gap_bucket_days")
  }

  val purchaseIntervalsSql: String =
    """WITH p AS (
      |  SELECT user_id, event_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS event_epoch
      |  FROM events
      |  WHERE event_type = 'purchase' AND user_id IS NOT NULL AND ts IS NOT NULL
      |), g AS (
      |  SELECT user_id,
      |    (event_epoch - LAG(event_epoch) OVER (
      |       PARTITION BY user_id ORDER BY event_epoch, event_id)) // 86400 AS gap_days
      |  FROM p
      |), h AS (
      |  SELECT CAST(CASE WHEN gap_days >= 32 THEN 32 WHEN gap_days >= 16 THEN 16
      |              WHEN gap_days >= 8 THEN 8 WHEN gap_days >= 4 THEN 4
      |              WHEN gap_days >= 2 THEN 2 WHEN gap_days >= 1 THEN 1
      |              ELSE 0 END AS INT) AS gap_bucket_days,
      |    CAST(COUNT(*) AS BIGINT) AS n_gaps,
      |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |  FROM g WHERE gap_days IS NOT NULL
      |  GROUP BY 1
      |)
      |SELECT gap_bucket_days, n_gaps, n_users,
      |  CAST(n_gaps AS DOUBLE) / CAST((SELECT SUM(n_gaps) FROM h) AS DOUBLE)
      |    AS share_of_gaps
      |FROM h ORDER BY gap_bucket_days""".stripMargin

  /** Deterministic A/B experiment readout: users hash into
    * control/treatment arms by md5 of a salted user key (the
    * corpus_split assignment machinery turned on users — append-
    * stable, reproducible, no assignment table to store or join), and
    * each arm reports its view/purchase reach and conversion with
    * lift vs the control arm. With no real traffic splitter behind
    * the testdata the two arms are statistically identical — the
    * HARNESS is the operator: assignment, per-arm funnel, and lift
    * arithmetic are exactly what a real experiment reads out, and the
    * A/A shape (lift ≈ 0) is itself the standard sanity check.
    *
    * Scale shape: one user-grain rollup (max-flag conditional
    * aggregates ride the exchange map-side), a 2-row arm rollup, and
    * the control rate joined back as a ONE-ROW broadcast (the
    * scalar-subquery pattern). Rates are single IEEE divisions of
    * exact counts; lift is a fixed two-op scalar chain on those —
    * per-row arithmetic, never a shuffle-ordered float sum, so the
    * DuckDB oracle hashes bit-identically. */
  def abTestSummary(spark: SparkSession, dir: String): DataFrame =
    abTestSummaryFrom(enriched(spark, dir))

  /** Deterministic experiment-arm assignment — the ONE definition the
    * batch readout and the streaming ramp watch both use, so "stream
    * and batch can never disagree on assignment" is structural, not
    * copy-discipline (the specs' driver-side MD5 recomputes stay
    * independent on purpose — they are the check ON this column). */
  private[graft] def armCol(experiment: String): org.apache.spark.sql.Column =
    when(
      substring(md5(concat(lit(experiment + ":"),
        col("user_id").cast("string")).cast("binary")), 1, 1) >= "8",
      "treatment").otherwise("control")

  def abTestSummaryFrom(e: DataFrame, experiment: String = "exp1"): DataFrame = {
    val u = e.filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "view", 1).otherwise(0)).as("has_view"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("has_purchase"))
      .select(armCol(experiment).as("arm"), col("has_view"), col("has_purchase"))
    val arms = u.groupBy("arm")
      .agg(count(lit(1)).as("n_users"),
        sum(col("has_view")).as("n_viewers"),
        sum(col("has_purchase")).as("n_purchasers"))
    // control rate via the standard tiny-aggregate window (the arm
    // frame is 2 rows): a filter+crossJoin formulation would execute
    // the whole fact aggregation twice — one subtree per consumer —
    // which a same-harness bench read as a clean 2× on this query
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    arms
      .withColumn("ctrl_rate", max(when(col("arm") === "control",
        col("n_purchasers").cast("double") / col("n_users").cast("double"))).over(wAll))
      .select(col("arm"), col("n_users"), col("n_viewers"), col("n_purchasers"),
        (col("n_viewers").cast("double") / col("n_users").cast("double")).as("view_rate"),
        (col("n_purchasers").cast("double") / col("n_users").cast("double")).as("conv_rate"),
        // zero-conversion control (tiny/gated corpora) → NULL lift, not
        // a divide-by-zero (ANSI) or an Infinity — mirrored in the SQL
        when(col("ctrl_rate") =!= lit(0.0),
          (col("n_purchasers").cast("double") / col("n_users").cast("double")
            - col("ctrl_rate")) / col("ctrl_rate")).as("lift_vs_control"))
      .orderBy("arm")
  }

  val abTestSummarySql: String =
    """WITH u AS (
      |  SELECT user_id,
      |    CASE WHEN substr(md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 1) >= '8'
      |         THEN 'treatment' ELSE 'control' END AS arm,
      |    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_view,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
      |  FROM events WHERE user_id IS NOT NULL
      |  GROUP BY 1, 2
      |), a AS (
      |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
      |    CAST(SUM(has_view) AS BIGINT) AS n_viewers,
      |    CAST(SUM(has_purchase) AS BIGINT) AS n_purchasers
      |  FROM u GROUP BY arm
      |), c AS (
      |  SELECT CAST(n_purchasers AS DOUBLE) / CAST(n_users AS DOUBLE) AS ctrl_rate
      |  FROM a WHERE arm = 'control'
      |)
      |-- LEFT JOIN, not a cross join: with no control arm (skewed/small
      |-- populations) arm rows must survive with NULL lift, matching the
      |-- Scala path's windowed MAX over the arm frame
      |SELECT arm, n_users, n_viewers, n_purchasers,
      |  CAST(n_viewers AS DOUBLE) / CAST(n_users AS DOUBLE) AS view_rate,
      |  CAST(n_purchasers AS DOUBLE) / CAST(n_users AS DOUBLE) AS conv_rate,
      |  CASE WHEN c.ctrl_rate <> 0.0 THEN
      |    (CAST(n_purchasers AS DOUBLE) / CAST(n_users AS DOUBLE) - c.ctrl_rate)
      |      / c.ctrl_rate END AS lift_vs_control
      |FROM a LEFT JOIN c ON TRUE ORDER BY arm""".stripMargin

  /** Sample-ratio-mismatch (SRM) guard on the hash-split experiment:
    * the check every A/B readout must pass FIRST — if the md5 split
    * doesn't deliver its designed 50/50 user ratio, every lift number
    * in `ab_test_summary` is invalid (the classic silent killers: a
    * bot cohort hashing into one arm, a gated logging path dropping
    * one arm's events, a mid-flight assignment change). Shares
    * `armCol` with the summary and the stream watch, so the three
    * surfaces can't test different splits.
    *
    * Shape: ONE distinct-user exchange, then a 1-row conditional
    * aggregate — nothing downstream of the user dimension. The
    * chi-square statistic against the 50/50 design collapses to
    * (n_c − n_t)²/n, and the 95% decision (3.84 at df = 1) is taken
    * as the INTEGER comparison 100·(n_c − n_t)² > 384·n — exact in
    * both engines, no libm in the verdict (the double statistic is
    * reported for dashboards but never drives the flag). BIGINT
    * arithmetic holds to an arm imbalance of ~3×10⁹ users. */
  def abSrmCheck(spark: SparkSession, dir: String): DataFrame =
    abSrmCheckFrom(enriched(spark, dir))

  def abSrmCheckFrom(e: DataFrame, experiment: String = "exp1"): DataFrame = {
    val diff = col("n_control") - col("n_treatment")
    val total = col("n_control") + col("n_treatment")
    e.filter(col("user_id").isNotNull)
      .select(col("user_id")).distinct()
      .select(armCol(experiment).as("arm"))
      .agg(
        sum(when(col("arm") === "control", 1L).otherwise(0L)).as("n_control"),
        sum(when(col("arm") === "treatment", 1L).otherwise(0L)).as("n_treatment"))
      .select(
        lit(experiment).as("experiment"),
        col("n_control"), col("n_treatment"),
        (diff * diff).as("sq_diff"),
        when(total > 0, (diff * diff).cast("double") / total.cast("double"))
          .as("chi_sq"),
        (lit(100L) * diff * diff > lit(384L) * total).as("srm_flag"))
  }

  val abSrmCheckSql: String =
    """WITH u AS (
      |  SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL
      |), arms AS (
      |  SELECT CASE WHEN substr(md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 1) >= '8'
      |              THEN 'treatment' ELSE 'control' END AS arm
      |  FROM u
      |), a AS (
      |  SELECT CAST(SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END) AS BIGINT) AS n_control,
      |         CAST(SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END) AS BIGINT) AS n_treatment
      |  FROM arms
      |)
      |SELECT 'exp1' AS experiment, n_control, n_treatment,
      |  (n_control - n_treatment) * (n_control - n_treatment) AS sq_diff,
      |  CASE WHEN n_control + n_treatment > 0 THEN
      |    CAST((n_control - n_treatment) * (n_control - n_treatment) AS DOUBLE)
      |      / CAST(n_control + n_treatment AS DOUBLE) END AS chi_sq,
      |  100 * (n_control - n_treatment) * (n_control - n_treatment)
      |    > 384 * (n_control + n_treatment) AS srm_flag
      |FROM a""".stripMargin

  /** CUPED variance-reduced A/B readout (Deng–Xu–Kohavi–Walker,
    * WSDM 2013) — the third leg of the experimentation suite:
    * `ab_srm_check` validates the split, `ab_test_summary` reads the
    * raw lift, and CUPED shrinks the lift's variance using
    * pre-experiment behavior (the covariate a hash split guarantees
    * is independent of assignment). Covariate X = the user's event
    * count in the FIRST half of the observed window; outcome Y = the
    * user's purchase count in the second half; the adjusted metric
    * Y − θ(X − E[X]) with θ = Cov(X,Y)/Var(X) removes the
    * pre-existing-activity component of the outcome noise — the
    * variance_reduction column (= ρ²) reports how much experiment
    * runtime the covariate buys.
    *
    * Scale shape: the window midpoint rides as a 1-ROW broadcast
    * (the scalar-subquery pattern) onto ONE user-grain conditional
    * rollup; per-arm sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²
    * — all exact BIGINT) reduce to a ≤2-row arm frame, and every
    * global moment is a window sum over THAT frame. Crucially the
    * per-arm adjusted mean needs no per-user adjusted values:
    * mean(Y_a) − θ(mean(X_a) − E[X]) is algebraically the mean of
    * the adjusted scores, so nothing after the user rollup is
    * fact-sized and no shuffle-ordered float sum exists. θ and ρ²
    * are computed in MEAN form (E[xy] − E[x]E[y]…), a fixed scalar
    * chain on exact integers — bit-identical in the DuckDB oracle;
    * zero-variance degenerate corpora take θ = 0 (no adjustment) by
    * guard in both engines. Epoch midpoint is (min+max) DIV 2 —
    * integer in both engines (the purchase_intervals DIV rule). */
  def abCuped(spark: SparkSession, dir: String): DataFrame =
    abCupedFrom(enriched(spark, dir))

  def abCupedFrom(e: DataFrame, experiment: String = "exp1"): DataFrame = {
    val f = e.filter(col("user_id").isNotNull && col("ts").isNotNull)
    val bounds = f.agg(min(col("event_epoch")).as("e0"),
      max(col("event_epoch")).as("e1"))
    val u = f.crossJoin(broadcast(bounds))
      .withColumn("mid", expr("(e0 + e1) div 2"))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_epoch") <= col("mid"), 1L).otherwise(0L)).as("x"),
        sum(when(col("event_epoch") > col("mid") &&
          col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .select(armCol(experiment).as("arm"), col("x"), col("y"))
    val arms = u.groupBy("arm").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val g = arms
      .withColumn("gn", sum(col("n")).over(wAll))
      .withColumn("gsx", sum(col("sx")).over(wAll))
      .withColumn("gsy", sum(col("sy")).over(wAll))
      .withColumn("gsxy", sum(col("sxy")).over(wAll))
      .withColumn("gsxx", sum(col("sxx")).over(wAll))
      .withColumn("gsyy", sum(col("syy")).over(wAll))
    val gnD = col("gn").cast("double")
    val gmx = col("gsx").cast("double") / gnD
    val gmy = col("gsy").cast("double") / gnD
    val cov = col("gsxy").cast("double") / gnD - gmx * gmy
    val varx = col("gsxx").cast("double") / gnD - gmx * gmx
    val vary = col("gsyy").cast("double") / gnD - gmy * gmy
    val theta = when(varx =!= lit(0.0), cov / varx).otherwise(lit(0.0))
    val meanPre = col("sx").cast("double") / col("n").cast("double")
    val conv = col("sy").cast("double") / col("n").cast("double")
    val adj = conv - theta * (meanPre - gmx)
    val varRed = when(varx * vary =!= lit(0.0),
      cov * cov / (varx * vary)).otherwise(lit(0.0))
    g.select(col("arm"), col("n").as("n_users"),
        meanPre.as("mean_pre"), conv.as("conv_rate"),
        theta.as("theta"), adj.as("adj_conv_rate"),
        varRed.as("var_reduction"))
      .withColumn("ctrl_adj",
        max(when(col("arm") === "control", col("adj_conv_rate"))).over(wAll))
      .select(col("arm"), col("n_users"), col("mean_pre"), col("conv_rate"),
        col("theta"), col("adj_conv_rate"),
        when(col("ctrl_adj") =!= lit(0.0),
          (col("adj_conv_rate") - col("ctrl_adj")) / col("ctrl_adj"))
          .as("adj_lift_vs_control"),
        col("var_reduction"))
      .orderBy("arm")
  }

  val abCupedSql: String =
    """WITH f AS (
      |  SELECT user_id, event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS e
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |), b AS (
      |  SELECT (MIN(e) + MAX(e)) // 2 AS mid FROM f
      |), u AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN e <= b.mid THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN e > b.mid AND event_type = 'purchase'
      |             THEN 1 ELSE 0 END) AS BIGINT) AS y
      |  FROM f, b GROUP BY user_id
      |), a AS (
      |  SELECT CASE WHEN substr(md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 1) >= '8'
      |              THEN 'treatment' ELSE 'control' END AS arm,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    CAST(SUM(y * y) AS BIGINT) AS syy
      |  FROM u GROUP BY 1
      |), g AS (
      |  SELECT arm, n, sx, sy, sxy, sxx, syy,
      |    SUM(n) OVER () AS gn, SUM(sx) OVER () AS gsx,
      |    SUM(sy) OVER () AS gsy, SUM(sxy) OVER () AS gsxy,
      |    SUM(sxx) OVER () AS gsxx, SUM(syy) OVER () AS gsyy
      |  FROM a
      |), s AS (
      |  SELECT arm, n,
      |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_pre,
      |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS conv_rate,
      |    CAST(gsx AS DOUBLE) / CAST(gn AS DOUBLE) AS gmx,
      |    CAST(gsxy AS DOUBLE) / CAST(gn AS DOUBLE)
      |      - (CAST(gsx AS DOUBLE) / CAST(gn AS DOUBLE))
      |        * (CAST(gsy AS DOUBLE) / CAST(gn AS DOUBLE)) AS cov,
      |    CAST(gsxx AS DOUBLE) / CAST(gn AS DOUBLE)
      |      - (CAST(gsx AS DOUBLE) / CAST(gn AS DOUBLE))
      |        * (CAST(gsx AS DOUBLE) / CAST(gn AS DOUBLE)) AS varx,
      |    CAST(gsyy AS DOUBLE) / CAST(gn AS DOUBLE)
      |      - (CAST(gsy AS DOUBLE) / CAST(gn AS DOUBLE))
      |        * (CAST(gsy AS DOUBLE) / CAST(gn AS DOUBLE)) AS vary
      |  FROM g
      |), t AS (
      |  SELECT arm, n AS n_users, mean_pre, conv_rate,
      |    CASE WHEN varx <> 0.0 THEN cov / varx ELSE 0.0 END AS theta,
      |    conv_rate - (CASE WHEN varx <> 0.0 THEN cov / varx ELSE 0.0 END)
      |      * (mean_pre - gmx) AS adj_conv_rate,
      |    CASE WHEN varx * vary <> 0.0 THEN cov * cov / (varx * vary)
      |         ELSE 0.0 END AS var_reduction
      |  FROM s
      |), w AS (
      |  SELECT *, MAX(CASE WHEN arm = 'control' THEN adj_conv_rate END)
      |    OVER () AS ctrl_adj
      |  FROM t
      |)
      |SELECT arm, n_users, mean_pre, conv_rate, theta, adj_conv_rate,
      |  CASE WHEN ctrl_adj <> 0.0 THEN (adj_conv_rate - ctrl_adj) / ctrl_adj
      |  END AS adj_lift_vs_control,
      |  var_reduction
      |FROM w ORDER BY arm""".stripMargin

  /** Two-sided 95% normal quantile Φ⁻¹(0.975), hard-coded as a double
    * LITERAL so Spark and the DuckDB oracle see the identical constant
    * (the Benford-literal pattern — no libm inverse-erf in either
    * engine; the spec documents the provenance). */
  val ZAlpha975: Double = 1.959963984540054

  /** 80%-power normal quantile Φ⁻¹(0.80), same literal discipline. */
  val ZPower80: Double = 0.8416212335729143

  /** Experiment power readout — the PLANNING closure of the A/B
    * suite (the tuning-closure pattern once more: measured arm sizes
    * and rates → the smallest lift this experiment could actually
    * detect). `ab_srm_check` validates the split, `ab_test_summary`
    * reads the lift, `ab_cuped` shrinks its variance — this row says
    * whether the readout MEANS anything: the minimum detectable
    * effect at α = 0.05 (two-sided) / 80% power for the
    * two-proportion z-test, MDE = (z_{α/2} + z_β) ·
    * √(p_c(1−p_c)/n_c + p_t(1−p_t)/n_t), against the observed
    * |Δ|. `powered = false` with a "significant" lift is the classic
    * underpowered-readout trap this row makes visible.
    *
    * Scale shape: the SAME single user-grain rollup as the summary,
    * reduced to a 1-row conditional aggregate — nothing downstream of
    * the user dimension. Rates are single IEEE divisions of exact
    * BIGINT counts; the z constants are shared literals; √ is
    * IEEE-correctly-rounded in both engines, so the chain hashes
    * bit-identically. Degenerate arms (either n = 0) yield NULL
    * mde/powered rather than a divide-by-zero. */
  def abPowerMde(spark: SparkSession, dir: String): DataFrame =
    abPowerMdeFrom(enriched(spark, dir))

  def abPowerMdeFrom(e: DataFrame, experiment: String = "exp1"): DataFrame = {
    val u = e.filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("has_purchase"))
      .select(armCol(experiment).as("arm"), col("has_purchase"))
    val a = u.agg(
      sum(when(col("arm") === "control", 1L).otherwise(0L)).as("n_control"),
      sum(when(col("arm") === "treatment", 1L).otherwise(0L)).as("n_treatment"),
      sum(when(col("arm") === "control", col("has_purchase")).otherwise(0L))
        .as("p_control"),
      sum(when(col("arm") === "treatment", col("has_purchase")).otherwise(0L))
        .as("p_treatment"))
    val rc = col("p_control").cast("double") / col("n_control").cast("double")
    val rt = col("p_treatment").cast("double") / col("n_treatment").cast("double")
    val bothArms = col("n_control") > 0 && col("n_treatment") > 0
    val se = sqrt(
      rc * (lit(1.0) - rc) / col("n_control").cast("double") +
        rt * (lit(1.0) - rt) / col("n_treatment").cast("double"))
    val mde = lit(ZAlpha975 + ZPower80) * se
    a.select(
      lit(experiment).as("experiment"),
      col("n_control"), col("n_treatment"),
      when(col("n_control") > 0, rc).as("rate_control"),
      when(col("n_treatment") > 0, rt).as("rate_treatment"),
      when(bothArms, se).as("se_delta"),
      when(bothArms, mde).as("mde_abs"),
      when(bothArms && rc =!= lit(0.0), mde / rc).as("mde_rel"),
      when(bothArms, rt - rc).as("observed_delta"),
      when(bothArms, abs(rt - rc) > mde).as("powered"))
  }

  val abPowerMdeSql: String =
    s"""WITH u AS (
      |  SELECT user_id,
      |    CASE WHEN substr(md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 1) >= '8'
      |         THEN 'treatment' ELSE 'control' END AS arm,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
      |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
      |), a AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END) AS BIGINT) AS n_control,
      |    CAST(SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END) AS BIGINT) AS n_treatment,
      |    CAST(SUM(CASE WHEN arm = 'control' THEN has_purchase ELSE 0 END) AS BIGINT) AS p_control,
      |    CAST(SUM(CASE WHEN arm = 'treatment' THEN has_purchase ELSE 0 END) AS BIGINT) AS p_treatment
      |  FROM u
      |), s AS (
      |  SELECT n_control, n_treatment,
      |    CAST(p_control AS DOUBLE) / CAST(n_control AS DOUBLE) AS rc,
      |    CAST(p_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE) AS rt
      |  FROM a
      |), t AS (
      |  SELECT n_control, n_treatment, rc, rt,
      |    SQRT(rc * (1.0 - rc) / CAST(n_control AS DOUBLE)
      |       + rt * (1.0 - rt) / CAST(n_treatment AS DOUBLE)) AS se,
      |    ${ZAlpha975 + ZPower80} *
      |      SQRT(rc * (1.0 - rc) / CAST(n_control AS DOUBLE)
      |         + rt * (1.0 - rt) / CAST(n_treatment AS DOUBLE)) AS mde
      |  FROM s
      |)
      |SELECT 'exp1' AS experiment, n_control, n_treatment,
      |  CASE WHEN n_control > 0 THEN rc END AS rate_control,
      |  CASE WHEN n_treatment > 0 THEN rt END AS rate_treatment,
      |  CASE WHEN n_control > 0 AND n_treatment > 0 THEN se END AS se_delta,
      |  CASE WHEN n_control > 0 AND n_treatment > 0 THEN mde END AS mde_abs,
      |  CASE WHEN n_control > 0 AND n_treatment > 0 AND rc <> 0.0
      |       THEN mde / rc END AS mde_rel,
      |  CASE WHEN n_control > 0 AND n_treatment > 0 THEN rt - rc END AS observed_delta,
      |  CASE WHEN n_control > 0 AND n_treatment > 0
      |       THEN ABS(rt - rc) > mde END AS powered
      |FROM t""".stripMargin

  /** Per-arm windowed-funnel readout with per-step significance — the
    * experiment suite meets the funnel (the PM question behind most
    * A/B tests: "did treatment move step-2, or just clicks?"). Funnel
    * depth comes from the SHARED `FunnelWindow.windowFunnel` operator
    * (view → click → purchase within a day, the greedy carry-forward
    * chain — no self-join), arms from the SHARED `armCol`; per step,
    * reach counts, rates, the observed Δ, and the pooled two-proportion
    * z-statistic with the `ZAlpha975` literal deciding significance —
    * the per-step readout `ab_test_summary`'s single conversion bit
    * can't give.
    *
    * Scale shape: windowFunnel's one user exchange + k−1 local window
    * passes, then a ≤2-row arm frame; steps unstack over THAT frame
    * and re-pivot at ≤k rows — nothing after the user rollup is
    * fact-sized. All counts exact BIGINT; rates/z a fixed IEEE chain
    * mirrored in the oracle; a missing arm or degenerate pooled rate
    * yields NULL z, not a divide-by-zero. */
  def abFunnel(spark: SparkSession, dir: String): DataFrame =
    abFunnelFrom(enriched(spark, dir))

  def abFunnelFrom(e: DataFrame, experiment: String = "exp1"): DataFrame = {
    val lvl = FunnelWindow.windowFunnel(
        e.filter(col("ts").isNotNull && col("user_id").isNotNull),
        steps = Seq("view", "click", "purchase"),
        windowSeconds = FunnelWindow.FunnelWindowSeconds)
      .select(armCol(experiment).as("arm"), col("funnel_level"))
    val arms = lvl.groupBy("arm").agg(
      count(lit(1)).as("n"),
      sum(when(col("funnel_level") >= 1, 1L).otherwise(0L)).as("x1"),
      sum(when(col("funnel_level") >= 2, 1L).otherwise(0L)).as("x2"),
      sum(when(col("funnel_level") >= 3, 1L).otherwise(0L)).as("x3"))
    val wide = arms
      .select(col("arm"), col("n"),
        expr("stack(3, 1, x1, 2, x2, 3, x3) as (step, reach)"))
      .groupBy("step").agg(
        max(when(col("arm") === "control", col("n"))).as("n_control"),
        max(when(col("arm") === "treatment", col("n"))).as("n_treatment"),
        max(when(col("arm") === "control", col("reach"))).as("reach_control"),
        max(when(col("arm") === "treatment", col("reach"))).as("reach_treatment"))
    val rc = col("reach_control").cast("double") / col("n_control").cast("double")
    val rt = col("reach_treatment").cast("double") / col("n_treatment").cast("double")
    val pp = (col("reach_control") + col("reach_treatment")).cast("double") /
      (col("n_control") + col("n_treatment")).cast("double")
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_control").cast("double") +
        lit(1.0) / col("n_treatment").cast("double")))
    val bothArms = col("n_control") > 0 && col("n_treatment") > 0
    val z = when(bothArms && se =!= lit(0.0), (rt - rc) / se)
    wide.select(col("step"),
        when(col("step") === 1, "view").when(col("step") === 2, "click")
          .otherwise("purchase").as("step_name"),
        col("n_control"), col("n_treatment"),
        col("reach_control"), col("reach_treatment"),
        when(col("n_control") > 0, rc).as("rate_control"),
        when(col("n_treatment") > 0, rt).as("rate_treatment"),
        when(bothArms, rt - rc).as("delta"),
        z.as("z_score"),
        when(z.isNotNull, abs(z) > lit(ZAlpha975)).as("significant"))
      .orderBy("step")
  }

  val abFunnelSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ep
      |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
      |), u AS (
      |  SELECT DISTINCT user_id FROM ev
      |), arms AS (
      |  SELECT user_id,
      |    CASE WHEN substr(md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 1) >= '8'
      |         THEN 'treatment' ELSE 'control' END AS arm
      |  FROM u
      |), l1 AS (
      |  SELECT DISTINCT user_id FROM ev WHERE event_type = 'view'
      |), l2 AS (
      |  SELECT DISTINCT a.user_id
      |  FROM ev a JOIN ev b ON a.user_id = b.user_id
      |  WHERE a.event_type = 'view' AND b.event_type = 'click'
      |    AND a.ep <= b.ep AND b.ep - a.ep <= 86400
      |), l3 AS (
      |  SELECT DISTINCT a.user_id
      |  FROM ev a JOIN ev b ON a.user_id = b.user_id
      |             JOIN ev c ON a.user_id = c.user_id
      |  WHERE a.event_type = 'view' AND b.event_type = 'click'
      |    AND c.event_type = 'purchase'
      |    AND a.ep <= b.ep AND b.ep <= c.ep AND c.ep - a.ep <= 86400
      |), base AS (
      |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n FROM arms GROUP BY arm
      |), reach AS (
      |  SELECT 1 AS step, arm, CAST(COUNT(*) AS BIGINT) AS x
      |  FROM arms JOIN l1 USING (user_id) GROUP BY arm
      |  UNION ALL
      |  SELECT 2, arm, CAST(COUNT(*) AS BIGINT)
      |  FROM arms JOIN l2 USING (user_id) GROUP BY arm
      |  UNION ALL
      |  SELECT 3, arm, CAST(COUNT(*) AS BIGINT)
      |  FROM arms JOIN l3 USING (user_id) GROUP BY arm
      |), grid AS (
      |  SELECT s.step, b.arm, b.n, COALESCE(r.x, 0) AS x
      |  FROM (SELECT UNNEST([1, 2, 3]) AS step) s
      |  CROSS JOIN base b
      |  LEFT JOIN reach r ON r.step = s.step AND r.arm = b.arm
      |), wide AS (
      |  SELECT step,
      |    MAX(CASE WHEN arm = 'control' THEN n END) AS n_control,
      |    MAX(CASE WHEN arm = 'treatment' THEN n END) AS n_treatment,
      |    CAST(MAX(CASE WHEN arm = 'control' THEN x END) AS BIGINT) AS reach_control,
      |    CAST(MAX(CASE WHEN arm = 'treatment' THEN x END) AS BIGINT) AS reach_treatment
      |  FROM grid GROUP BY step
      |), s AS (
      |  SELECT *,
      |    CAST(reach_control AS DOUBLE) / CAST(n_control AS DOUBLE) AS rc,
      |    CAST(reach_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE) AS rt,
      |    CAST(reach_control + reach_treatment AS DOUBLE)
      |      / CAST(n_control + n_treatment AS DOUBLE) AS pp
      |  FROM wide
      |), t AS (
      |  SELECT *,
      |    SQRT(pp * (1.0 - pp) * (1.0 / CAST(n_control AS DOUBLE)
      |      + 1.0 / CAST(n_treatment AS DOUBLE))) AS se
      |  FROM s
      |)
      |SELECT step,
      |  CASE WHEN step = 1 THEN 'view' WHEN step = 2 THEN 'click'
      |       ELSE 'purchase' END AS step_name,
      |  n_control, n_treatment, reach_control, reach_treatment,
      |  CASE WHEN n_control > 0 THEN rc END AS rate_control,
      |  CASE WHEN n_treatment > 0 THEN rt END AS rate_treatment,
      |  CASE WHEN n_control > 0 AND n_treatment > 0 THEN rt - rc END AS delta,
      |  CASE WHEN n_control > 0 AND n_treatment > 0 AND se <> 0.0
      |       THEN (rt - rc) / se END AS z_score,
      |  CASE WHEN n_control > 0 AND n_treatment > 0 AND se <> 0.0
      |       THEN ABS((rt - rc) / se) > 1.959963984540054 END AS significant
      |FROM t ORDER BY step""".stripMargin

  /** Sequential A/B monitoring — the daily-look boundary readout real
    * experimentation platforms run between launch and the fixed-
    * horizon readout (peeking at a plain z every day inflates the
    * false-positive rate severalfold; a spending boundary is what
    * makes daily looks legitimate). Looks are the observed event
    * dates; at look k of K, cumulative enrolment (users whose first
    * event ≤ d) and conversion (first purchase ≤ d) per arm feed the
    * SAME pooled z as `ab_test_summary`'s family, compared against
    * the O'Brien–Fleming-SHAPE boundary z·√(K/k) — early looks demand
    * far stronger evidence, the final look relaxes to (approximately)
    * the fixed-horizon 1.96 (the exact OBF constant varies with K by
    * a few percent; this is the monitoring boundary's shape, stated
    * as such, not an exact α guarantee).
    *
    * Scale shape: ONE user-grain rollup of the fact table (first
    * event/purchase dates + the shared `armCol`), day-grain counts,
    * then cumulative windows over ≤|days| rows per arm; z and the
    * boundary are exact-int divisions and one sqrt — oracle-safe. */
  def abSequential(spark: SparkSession, dir: String): DataFrame =
    abSequentialFrom(enriched(spark, dir))

  def abSequentialFrom(e: DataFrame, experiment: String = "exp1"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val users = e.filter(col("ts").isNotNull && col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("first_day"),
        min(when(col("event_type") === "purchase", to_date(col("ts"))))
          .as("conv_day"))
      .select(armCol(experiment).as("arm"), col("first_day"), col("conv_day"))
    val enroll = users.groupBy(col("first_day").as("day"), col("arm"))
      .agg(count(lit(1)).as("enrolled"))
    val conv = users.filter(col("conv_day").isNotNull)
      .groupBy(col("conv_day").as("day"), col("arm"))
      .agg(count(lit(1)).as("converted"))
    sequentialFromDaily(enroll.join(conv, Seq("day", "arm"), "fullouter")
      .select(col("day"), col("arm"),
        coalesce(col("enrolled"), lit(0L)).as("e"),
        coalesce(col("converted"), lit(0L)).as("c")))
  }

  /** The look-table core shared by the batch query and the streaming
    * first-touch log rescore (`streaming.AbSequentialStream
    * .sequentialFromLog`): takes per-(day, arm) NEW enrolments `e` and
    * NEW conversions `c`, returns the boundary look table. Keeping one
    * recipe means live peeks and the nightly readout can never apply
    * different statistics to the same experiment. */
  private[graft] def sequentialFromDaily(newDaily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wArm = Window.partitionBy(col("arm")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val daily = newDaily
      .withColumn("n", sum(col("e")).over(wArm))
      .withColumn("x", sum(col("c")).over(wArm))
    val wide = daily.groupBy(col("day")).agg(
      max(when(col("arm") === "control", col("n"))).as("n_control"),
      max(when(col("arm") === "treatment", col("n"))).as("n_treatment"),
      max(when(col("arm") === "control", col("x"))).as("x_control"),
      max(when(col("arm") === "treatment", col("x"))).as("x_treatment"))
    // a day with activity in only one arm still needs BOTH arms'
    // cumulative state: carry the last known value forward over the
    // ≤|days| frame
    val wAll = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = wide
      .withColumn("n_control", last(col("n_control"), ignoreNulls = true).over(wAll))
      .withColumn("n_treatment", last(col("n_treatment"), ignoreNulls = true).over(wAll))
      .withColumn("x_control", last(col("x_control"), ignoreNulls = true).over(wAll))
      .withColumn("x_treatment", last(col("x_treatment"), ignoreNulls = true).over(wAll))
      .na.fill(0L, Seq("n_control", "n_treatment", "x_control", "x_treatment"))
      .withColumn("look", row_number().over(Window.orderBy(col("day"))))
    val total = filled.agg(max(col("look")).as("total_looks"))
    val rc = col("x_control").cast("double") / col("n_control").cast("double")
    val rt = col("x_treatment").cast("double") / col("n_treatment").cast("double")
    val pp = (col("x_control") + col("x_treatment")).cast("double") /
      (col("n_control") + col("n_treatment")).cast("double")
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_control").cast("double") +
        lit(1.0) / col("n_treatment").cast("double")))
    val bothArms = col("n_control") > 0 && col("n_treatment") > 0
    val z = when(bothArms && se =!= lit(0.0), (rt - rc) / se)
    val bound = lit(ZAlpha975) *
      sqrt(col("total_looks").cast("double") / col("look").cast("double"))
    filled.crossJoin(broadcast(total))
      .select(col("day"), col("look"), col("total_looks"),
        col("n_control"), col("n_treatment"),
        col("x_control"), col("x_treatment"),
        z.as("z_score"), bound.as("z_boundary"),
        when(z.isNotNull, abs(z) > bound).as("crossed"))
      .orderBy("day")
  }

  val abSequentialSql: String =
    """WITH u AS (
      |  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day,
      |    MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END) AS conv_day
      |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
      |  GROUP BY user_id
      |), a AS (
      |  SELECT CASE WHEN substr(md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 1) >= '8'
      |              THEN 'treatment' ELSE 'control' END AS arm,
      |    first_day, conv_day
      |  FROM u
      |), en AS (
      |  SELECT first_day AS day, arm, COUNT(*) AS e FROM a GROUP BY 1, 2
      |), cv AS (
      |  SELECT conv_day AS day, arm, COUNT(*) AS c FROM a
      |  WHERE conv_day IS NOT NULL GROUP BY 1, 2
      |), d AS (
      |  SELECT COALESCE(en.day, cv.day) AS day, COALESCE(en.arm, cv.arm) AS arm,
      |    COALESCE(e, 0) AS e, COALESCE(c, 0) AS c
      |  FROM en FULL OUTER JOIN cv ON en.day = cv.day AND en.arm = cv.arm
      |), cum AS (
      |  SELECT day, arm,
      |    SUM(e) OVER (PARTITION BY arm ORDER BY day ROWS UNBOUNDED PRECEDING) AS n,
      |    SUM(c) OVER (PARTITION BY arm ORDER BY day ROWS UNBOUNDED PRECEDING) AS x
      |  FROM d
      |), wide AS (
      |  SELECT day,
      |    MAX(CASE WHEN arm = 'control' THEN n END) AS n_control,
      |    MAX(CASE WHEN arm = 'treatment' THEN n END) AS n_treatment,
      |    MAX(CASE WHEN arm = 'control' THEN x END) AS x_control,
      |    MAX(CASE WHEN arm = 'treatment' THEN x END) AS x_treatment
      |  FROM cum GROUP BY day
      |), filled AS (
      |  SELECT day,
      |    CAST(COALESCE(LAST_VALUE(n_control IGNORE NULLS) OVER w, 0) AS BIGINT) AS n_control,
      |    CAST(COALESCE(LAST_VALUE(n_treatment IGNORE NULLS) OVER w, 0) AS BIGINT) AS n_treatment,
      |    CAST(COALESCE(LAST_VALUE(x_control IGNORE NULLS) OVER w, 0) AS BIGINT) AS x_control,
      |    CAST(COALESCE(LAST_VALUE(x_treatment IGNORE NULLS) OVER w, 0) AS BIGINT) AS x_treatment,
      |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS INT) AS look
      |  FROM wide
      |  WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
      |), t AS (
      |  SELECT f.*, (SELECT CAST(MAX(look) AS INT) FROM filled) AS total_looks,
      |    CAST(x_control AS DOUBLE) / CAST(n_control AS DOUBLE) AS rc,
      |    CAST(x_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE) AS rt,
      |    CAST(x_control + x_treatment AS DOUBLE)
      |      / CAST(n_control + n_treatment AS DOUBLE) AS pp
      |  FROM filled f
      |), s AS (
      |  SELECT *, SQRT(pp * (1.0 - pp) * (1.0 / CAST(n_control AS DOUBLE)
      |    + 1.0 / CAST(n_treatment AS DOUBLE))) AS se
      |  FROM t
      |)
      |SELECT day, look, total_looks, n_control, n_treatment,
      |  x_control, x_treatment,
      |  CASE WHEN n_control > 0 AND n_treatment > 0 AND se <> 0.0
      |       THEN (rt - rc) / se END AS z_score,
      |  1.959963984540054 * SQRT(CAST(total_looks AS DOUBLE)
      |    / CAST(look AS DOUBLE)) AS z_boundary,
      |  CASE WHEN n_control > 0 AND n_treatment > 0 AND se <> 0.0
      |       THEN ABS((rt - rc) / se) > 1.959963984540054 *
      |         SQRT(CAST(total_looks AS DOUBLE) / CAST(look AS DOUBLE))
      |  END AS crossed
      |FROM s ORDER BY day""".stripMargin

  /** Stratified CUPED — per-stratum θ (post-stratification composed
    * with CUPED, the standard production refinement of Deng–Xu–
    * Kohavi–Walker): one pooled slope under-adjusts wherever the
    * covariate–outcome relation differs by cohort (a heavy user's
    * pre-activity predicts purchases very differently from a
    * cold-start's), so θ is fit WITHIN each pre-activity stratum and
    * adjustment happens stratum-locally. Strata come from the same
    * covariate the slope uses — the user's pre-midpoint event count x
    * (cold x = 0 / light x ≤ 3 / heavy) — which a hash split
    * guarantees is assignment-independent, so stratifying on it is
    * unbiased. The all-zero cold stratum has Var(x) = 0 and takes
    * θ = 0 (raw readout) by the same guard as the pooled query —
    * exercised by design, not an edge case.
    *
    * Scale shape: identical to `ab_cuped` with stratum added to the
    * tiny dimension — ONE user-grain rollup (the midpoint rides as a
    * 1-row broadcast), a ≤ 3·arms-row rollup of exact BIGINT
    * sufficient statistics, and every stratum-global moment a window
    * over THAT frame partitioned by stratum. Nothing after the user
    * rollup is fact-sized. */
  def abCupedStratified(spark: SparkSession, dir: String): DataFrame =
    abCupedStratifiedFrom(enriched(spark, dir))

  def abCupedStratifiedFrom(e: DataFrame, experiment: String = "exp1"): DataFrame = {
    val f = e.filter(col("user_id").isNotNull && col("ts").isNotNull)
    val bounds = f.agg(min(col("event_epoch")).as("e0"),
      max(col("event_epoch")).as("e1"))
    val u = f.crossJoin(broadcast(bounds))
      .withColumn("mid", expr("(e0 + e1) div 2"))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_epoch") <= col("mid"), 1L).otherwise(0L)).as("x"),
        sum(when(col("event_epoch") > col("mid") &&
          col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .select(
        when(col("x") === 0L, "s0_cold")
          .when(col("x") <= 3L, "s1_light")
          .otherwise("s2_heavy").as("stratum"),
        armCol(experiment).as("arm"), col("x"), col("y"))
    val arms = u.groupBy("stratum", "arm").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val wS = Window.partitionBy(col("stratum"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val g = arms
      .withColumn("gn", sum(col("n")).over(wS))
      .withColumn("gsx", sum(col("sx")).over(wS))
      .withColumn("gsy", sum(col("sy")).over(wS))
      .withColumn("gsxy", sum(col("sxy")).over(wS))
      .withColumn("gsxx", sum(col("sxx")).over(wS))
      .withColumn("gsyy", sum(col("syy")).over(wS))
    val gnD = col("gn").cast("double")
    val gmx = col("gsx").cast("double") / gnD
    val gmy = col("gsy").cast("double") / gnD
    val cov = col("gsxy").cast("double") / gnD - gmx * gmy
    val varx = col("gsxx").cast("double") / gnD - gmx * gmx
    val vary = col("gsyy").cast("double") / gnD - gmy * gmy
    val theta = when(varx =!= lit(0.0), cov / varx).otherwise(lit(0.0))
    val meanPre = col("sx").cast("double") / col("n").cast("double")
    val conv = col("sy").cast("double") / col("n").cast("double")
    val adj = conv - theta * (meanPre - gmx)
    val varRed = when(varx * vary =!= lit(0.0),
      cov * cov / (varx * vary)).otherwise(lit(0.0))
    g.select(col("stratum"), col("arm"), col("n").as("n_users"),
        meanPre.as("mean_pre"), conv.as("conv_rate"),
        theta.as("theta"), adj.as("adj_conv_rate"),
        varRed.as("var_reduction"))
      .withColumn("ctrl_adj",
        max(when(col("arm") === "control", col("adj_conv_rate"))).over(wS))
      .select(col("stratum"), col("arm"), col("n_users"), col("mean_pre"),
        col("conv_rate"), col("theta"), col("adj_conv_rate"),
        when(col("ctrl_adj") =!= lit(0.0),
          (col("adj_conv_rate") - col("ctrl_adj")) / col("ctrl_adj"))
          .as("adj_lift_vs_control"),
        col("var_reduction"))
      .orderBy("stratum", "arm")
  }

  val abCupedStratifiedSql: String =
    """WITH f AS (
      |  SELECT user_id, event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS e
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |), b AS (
      |  SELECT (MIN(e) + MAX(e)) // 2 AS mid FROM f
      |), u0 AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN e <= b.mid THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN e > b.mid AND event_type = 'purchase'
      |             THEN 1 ELSE 0 END) AS BIGINT) AS y
      |  FROM f, b GROUP BY user_id
      |), u AS (
      |  SELECT CASE WHEN x = 0 THEN 's0_cold'
      |              WHEN x <= 3 THEN 's1_light'
      |              ELSE 's2_heavy' END AS stratum,
      |    CASE WHEN substr(md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 1) >= '8'
      |         THEN 'treatment' ELSE 'control' END AS arm,
      |    x, y
      |  FROM u0
      |), a AS (
      |  SELECT stratum, arm,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    CAST(SUM(y * y) AS BIGINT) AS syy
      |  FROM u GROUP BY 1, 2
      |), g AS (
      |  SELECT stratum, arm, n, sx, sy, sxy, sxx, syy,
      |    SUM(n) OVER (PARTITION BY stratum) AS gn,
      |    SUM(sx) OVER (PARTITION BY stratum) AS gsx,
      |    SUM(sy) OVER (PARTITION BY stratum) AS gsy,
      |    SUM(sxy) OVER (PARTITION BY stratum) AS gsxy,
      |    SUM(sxx) OVER (PARTITION BY stratum) AS gsxx,
      |    SUM(syy) OVER (PARTITION BY stratum) AS gsyy
      |  FROM a
      |), s AS (
      |  SELECT stratum, arm, n,
      |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_pre,
      |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS conv_rate,
      |    CAST(gsx AS DOUBLE) / CAST(gn AS DOUBLE) AS gmx,
      |    CAST(gsxy AS DOUBLE) / CAST(gn AS DOUBLE)
      |      - (CAST(gsx AS DOUBLE) / CAST(gn AS DOUBLE))
      |        * (CAST(gsy AS DOUBLE) / CAST(gn AS DOUBLE)) AS cov,
      |    CAST(gsxx AS DOUBLE) / CAST(gn AS DOUBLE)
      |      - (CAST(gsx AS DOUBLE) / CAST(gn AS DOUBLE))
      |        * (CAST(gsx AS DOUBLE) / CAST(gn AS DOUBLE)) AS varx,
      |    CAST(gsyy AS DOUBLE) / CAST(gn AS DOUBLE)
      |      - (CAST(gsy AS DOUBLE) / CAST(gn AS DOUBLE))
      |        * (CAST(gsy AS DOUBLE) / CAST(gn AS DOUBLE)) AS vary
      |  FROM g
      |), t AS (
      |  SELECT stratum, arm, n AS n_users, mean_pre, conv_rate,
      |    CASE WHEN varx <> 0.0 THEN cov / varx ELSE 0.0 END AS theta,
      |    conv_rate - (CASE WHEN varx <> 0.0 THEN cov / varx ELSE 0.0 END)
      |      * (mean_pre - gmx) AS adj_conv_rate,
      |    CASE WHEN varx * vary <> 0.0 THEN cov * cov / (varx * vary)
      |         ELSE 0.0 END AS var_reduction
      |  FROM s
      |), w AS (
      |  SELECT *, MAX(CASE WHEN arm = 'control' THEN adj_conv_rate END)
      |    OVER (PARTITION BY stratum) AS ctrl_adj
      |  FROM t
      |)
      |SELECT stratum, arm, n_users, mean_pre, conv_rate, theta,
      |  adj_conv_rate,
      |  CASE WHEN ctrl_adj <> 0.0 THEN (adj_conv_rate - ctrl_adj) / ctrl_adj
      |  END AS adj_lift_vs_control,
      |  var_reduction
      |FROM w ORDER BY stratum, arm""".stripMargin

  /** Forecast backtest — the EVAL closure of `traffic_forecast` (the
    * tuning-closure pattern on the time-series leg: the forecast query
    * says what tomorrow brings; this one says how wrong that recipe
    * WAS, before anyone wires it to capacity planning). The last
    * calendar day is held out, the identical seasonal-naive recipe
    * (hour-of-week baseline × recent-7-day level) is fit on the days
    * before it, and the held-out day's actual hourly counts score the
    * prediction — per-hour absolute and relative error.
    *
    * Scale shape: the same one fact-grain rollup as the forecast
    * (dow × hour counts), all scored rows ≤ 24; the holdout bound,
    * train bounds and level ride as 1-row broadcasts. FULL OUTER on
    * event_hour so both failure modes surface: an hour the model
    * never saw (predicted 0) and a forecast hour that never realized
    * (actual 0). Exact integer counts end-to-end; predictions and
    * errors are the only IEEE arithmetic, identical chain shape in
    * the oracle. */
  def forecastBacktest(spark: SparkSession, dir: String): DataFrame =
    forecastBacktestFrom(enriched(spark, dir))

  def forecastBacktestFrom(e: DataFrame): DataFrame = {
    val typed = e.filter(col("ts").isNotNull)
      .select(col("event_date"), dayofweek(col("event_date")).as("dow"),
        hour(col("ts")).as("event_hour"))
      .localCheckpoint() // feeds the holdout bound, train legs, actuals
    val target = typed.agg(max(col("event_date")).as("target_date"))
    val train = typed.join(broadcast(target))
      .filter(col("event_date") < col("target_date"))
      .drop("target_date")
    val tb = train.agg(max(col("event_date")).as("last_train"),
      countDistinct(col("event_date")).as("n_dates"),
      count(lit(1)).as("all_events"))
    val recent = train.join(broadcast(tb))
      .filter(datediff(col("last_train"), col("event_date")) < 7)
      .agg(count(lit(1)).as("recent_events"))
    val dowDays = train.select(col("event_date"), col("dow")).distinct()
      .groupBy(col("dow")).agg(count(lit(1)).as("n_days"))
    val predicted = train
      .groupBy(col("dow"), col("event_hour"))
      .agg(count(lit(1)).as("total_events"))
      .join(broadcast(dowDays), "dow")
      .crossJoin(broadcast(tb)).crossJoin(broadcast(recent))
      .crossJoin(broadcast(target))
      .filter(col("dow") === dayofweek(col("target_date")))
      .select(col("event_hour"),
        ((col("total_events").cast("double") / col("n_days").cast("double")) *
          ((col("recent_events") * col("n_dates")).cast("double") /
            (col("all_events") * lit(7L)).cast("double")))
          .as("predicted_events"))
    val actual = typed.join(broadcast(target))
      .filter(col("event_date") === col("target_date"))
      .groupBy(col("event_hour")).agg(count(lit(1)).as("actual_events"))
    predicted.join(actual, Seq("event_hour"), "full_outer")
      .crossJoin(broadcast(target))
      .select(col("target_date"), col("event_hour"),
        dayofweek(col("target_date")).as("dow"),
        coalesce(col("actual_events"), lit(0L)).as("actual_events"),
        coalesce(col("predicted_events"), lit(0.0)).as("predicted_events"))
      .withColumn("abs_err",
        abs(col("actual_events").cast("double") - col("predicted_events")))
      .withColumn("pct_err", when(col("actual_events") > 0,
        col("abs_err") / col("actual_events").cast("double")))
      .orderBy("event_hour")
  }

  val forecastBacktestSql: String =
    """WITH typed AS (
      |  SELECT CAST(ts AS DATE) AS event_date,
      |    CAST(EXTRACT(dow FROM CAST(ts AS DATE)) AS INT) + 1 AS dow,
      |    CAST(EXTRACT(hour FROM ts) AS INT) AS event_hour
      |  FROM events WHERE ts IS NOT NULL
      |), tgt AS (
      |  SELECT MAX(event_date) AS target_date FROM typed
      |), train AS (
      |  SELECT t.* FROM typed t, tgt WHERE t.event_date < tgt.target_date
      |), tb AS (
      |  SELECT MAX(event_date) AS last_train,
      |    CAST(COUNT(DISTINCT event_date) AS BIGINT) AS n_dates,
      |    CAST(COUNT(*) AS BIGINT) AS all_events
      |  FROM train
      |), r AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS recent_events
      |  FROM train, tb WHERE DATE_DIFF('day', event_date, last_train) < 7
      |), dd AS (
      |  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days FROM
      |    (SELECT DISTINCT event_date, dow FROM train) d GROUP BY dow
      |), pred AS (
      |  SELECT event_hour,
      |    (CAST(total_events AS DOUBLE) / CAST(n_days AS DOUBLE)) *
      |      (CAST(recent_events * n_dates AS DOUBLE) /
      |       CAST(all_events * 7 AS DOUBLE)) AS predicted_events
      |  FROM (SELECT dow, event_hour, CAST(COUNT(*) AS BIGINT) AS total_events
      |        FROM train GROUP BY dow, event_hour) base
      |  JOIN dd USING (dow) CROSS JOIN tb CROSS JOIN r CROSS JOIN tgt
      |  WHERE dow = CAST(EXTRACT(dow FROM tgt.target_date) AS INT) + 1
      |), act AS (
      |  SELECT event_hour, CAST(COUNT(*) AS BIGINT) AS actual_events
      |  FROM typed t, tgt WHERE t.event_date = tgt.target_date
      |  GROUP BY event_hour
      |), j AS (
      |  SELECT COALESCE(pred.event_hour, act.event_hour) AS event_hour,
      |    CAST(COALESCE(act.actual_events, 0) AS BIGINT) AS actual_events,
      |    COALESCE(pred.predicted_events, 0.0) AS predicted_events
      |  FROM pred FULL OUTER JOIN act ON pred.event_hour = act.event_hour
      |)
      |SELECT tgt.target_date, event_hour,
      |  CAST(EXTRACT(dow FROM tgt.target_date) AS INT) + 1 AS dow,
      |  actual_events, predicted_events,
      |  ABS(CAST(actual_events AS DOUBLE) - predicted_events) AS abs_err,
      |  CASE WHEN actual_events > 0 THEN
      |    ABS(CAST(actual_events AS DOUBLE) - predicted_events)
      |      / CAST(actual_events AS DOUBLE) END AS pct_err
      |FROM j CROSS JOIN tgt ORDER BY event_hour""".stripMargin

  /** Classical additive time-series decomposition of daily traffic —
    * trend + seasonal + residual (the moving-average decomposition
    * every STL/forecast pipeline starts from): trend = centered 7-day
    * moving average (NULL on edge days without a full window — honest
    * incompleteness beats a shrinking-window bias), seasonal = the
    * day-of-week mean of the detrended series, residual = what's
    * left — the series the anomaly checks SHOULD score (a Monday spike
    * is signal in the raw series and noise in the residual).
    *
    * Exactness trick (the CUSUM discipline): the detrended series is
    * kept as SCALED integers 7·n_d − Σ₇ (exact BIGINT — no double
    * subtraction order), so the seasonal means are single IEEE
    * divisions of exact sums and trend/residual fixed scalar chains —
    * bit-identical in the oracle. Scale shape: ONE fact exchange to
    * day grain, then day-dimension windows (≤366 rows/year by
    * construction) and a ≤7-row seasonal broadcast. The 7-day range
    * frame counts CALENDAR days (rangeBetween on day number), so date
    * gaps disqualify a window rather than silently shrinking it. */
  def trafficDecompose(spark: SparkSession, dir: String): DataFrame =
    trafficDecomposeFrom(enriched(spark, dir))

  def trafficDecomposeFrom(e: DataFrame): DataFrame = {
    val daily = e.filter(col("ts").isNotNull)
      .groupBy(col("event_date"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("day_num",
        datediff(col("event_date"), to_date(lit("1970-01-01"))))
      .withColumn("dow", dayofweek(col("event_date")))
    val w = Window.orderBy(col("day_num")).rangeBetween(-3, 3)
    val det = daily
      .withColumn("win_days", count(lit(1)).over(w))
      .withColumn("win_sum", sum(col("n_events")).over(w))
      .withColumn("det_scaled",
        when(col("win_days") === 7, lit(7L) * col("n_events") - col("win_sum")))
    val seas = det.filter(col("det_scaled").isNotNull)
      .groupBy(col("dow"))
      .agg(sum(col("det_scaled")).as("s_scaled"),
        count(lit(1)).as("s_days"))
    det.join(broadcast(seas), Seq("dow"), "left")
      .select(col("event_date"), col("dow"), col("n_events"),
        when(col("win_days") === 7,
          col("win_sum").cast("double") / lit(7.0)).as("trend"),
        (col("s_scaled").cast("double") /
          (lit(7L) * col("s_days")).cast("double")).as("seasonal"))
      .withColumn("residual",
        col("n_events").cast("double") - col("trend") - col("seasonal"))
      .orderBy("event_date")
  }

  val trafficDecomposeSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS event_date,
      |    CAST(EXTRACT(dow FROM CAST(ts AS DATE)) AS INT) + 1 AS dow,
      |    DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num,
      |    CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2, 3
      |), t AS (
      |  SELECT *,
      |    COUNT(*) OVER win AS win_days,
      |    CAST(SUM(n_events) OVER win AS BIGINT) AS win_sum
      |  FROM daily
      |  WINDOW win AS (ORDER BY day_num RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
      |), det AS (
      |  SELECT *, CASE WHEN win_days = 7 THEN 7 * n_events - win_sum END
      |    AS det_scaled
      |  FROM t
      |), seas AS (
      |  SELECT dow, CAST(SUM(det_scaled) AS BIGINT) AS s_scaled,
      |    CAST(COUNT(*) AS BIGINT) AS s_days
      |  FROM det WHERE det_scaled IS NOT NULL GROUP BY dow
      |), j AS (
      |  SELECT event_date, dow, n_events,
      |    CASE WHEN win_days = 7 THEN CAST(win_sum AS DOUBLE) / 7.0 END AS trend,
      |    CAST(s_scaled AS DOUBLE) / CAST(7 * s_days AS DOUBLE) AS seasonal
      |  FROM det LEFT JOIN seas USING (dow)
      |)
      |SELECT event_date, dow, n_events, trend, seasonal,
      |  CAST(n_events AS DOUBLE) - trend - seasonal AS residual
      |FROM j ORDER BY event_date""".stripMargin

  /** Activity-inequality census: the exact Gini coefficient over
    * per-user event counts — ONE number answering "how concentrated
    * is the traffic" (0 = everyone equally active, →1 = a handful of
    * bots/power users generate everything). The operational dial next
    * to `dq_key_skew`'s top-k table and `revenue_pareto`'s top-100:
    * skew census names the heads, Gini tracks the whole distribution
    * drifting (a bot ramp moves Gini before any single key tops the
    * census).
    *
    * Exact global rank without a global sort — the banded distributed
    * prefix-sum (the `revenue_abc` shape, reused on its third
    * surface): GK quantiles band the user counts (fixed-state, one
    * pass), per-band row counts collect (≤ bands driver rows), each
    * band ranks LOCALLY (window subset-satisfied by the band
    * exchange) and a literal per-band offset lifts local ranks to
    * global ones. The rank-weighted sum Σ i·xᵢ is tie-order-invariant
    * (equal xᵢ commute under any rank assignment), so band-local tie
    * order cannot perturb the result, and the sorted-rank identity
    * G = 2·Σ i·xᵢ/(n·Σx) − (n+1)/n is exact — decimal(38,0) keeps the
    * weighted sum overflow-proof at 10⁹ users. A degenerate
    * all-equal-counts corpus collapses to one band (still correct;
    * the window is then population-wide — the documented worst case,
    * which a real event corpus' long-tailed counts never hit).
    *
    * Oracle-green: the single IEEE division of exact integers at the
    * end matches DuckDB's one-window form bit-for-bit. */
  def userActivityGini(spark: SparkSession, dir: String, bands: Int = 16): DataFrame =
    userActivityGiniFrom(enriched(spark, dir), bands)

  def userActivityGiniFrom(e: DataFrame, bands: Int = 16): DataFrame = {
    val counts = e.filter(col("user_id").isNotNull)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      .localCheckpoint() // feeds thresholds, band stats, and the ranked sum
    val qs = (1 until bands).map(i => i.toDouble / bands)
    val ts = counts
      .agg(expr(s"approx_percentile(CAST(n_events AS DOUBLE), " +
        s"array(${qs.mkString(", ")}), 10000)").as("ts"))
      .collect().head.getSeq[Double](0)
    // ascending monotone chain: band 0 = least active users
    val band = ts.zipWithIndex.foldLeft(lit(0)) { case (acc, (t, i)) =>
      when(col("n_events").cast("double") > t, lit(i + 1)).otherwise(acc)
    }
    val banded = counts.withColumn("band", band)
    val stats = banded.groupBy(col("band"))
      .agg(count(lit(1)).as("n"), sum(col("n_events")).as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val totalN = stats.map(_._2).sum
    val totalS = stats.map(_._3).sum
    val rowOffsets = stats.scanLeft(0L) { case (acc, (_, n, _)) => acc + n }.init
    val offCol = stats.map(_._1).zip(rowOffsets).foldLeft(lit(0L)) {
      case (acc, (b, off)) => when(col("band") === b, lit(off)).otherwise(acc)
    }
    val w = Window.partitionBy("band").orderBy(asc("n_events"), asc("user_id"))
    banded
      .withColumn("rnk", row_number().over(w).cast("long") + offCol)
      .agg(sum(col("rnk").cast("decimal(38,0)") *
        col("n_events").cast("decimal(38,0)")).as("s_rank"))
      .select(
        lit(totalN).as("n_users"),
        lit(totalS).as("total_events"),
        (lit(2.0) * col("s_rank").cast("double") /
          (lit(totalN.toDouble) * lit(totalS.toDouble)) -
          lit((totalN + 1).toDouble) / lit(totalN.toDouble)).as("gini"))
  }

  val userActivityGiniSql: String =
    """WITH c AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
      |), r AS (
      |  SELECT n_events,
      |    ROW_NUMBER() OVER (ORDER BY n_events, user_id) AS rnk
      |  FROM c
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(n_events) AS BIGINT) AS total_events,
      |  2.0 * CAST(SUM(CAST(rnk AS DECIMAL(38,0)) *
      |                 CAST(n_events AS DECIMAL(38,0))) AS DOUBLE) /
      |    (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(n_events) AS DOUBLE)) -
      |  CAST(COUNT(*) + 1 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS gini
      |FROM r""".stripMargin

  /** Weekly stickiness — the DAU/WAU ratio (what share of a week's
    * active users show up on an average active day). The standard
    * engagement readout between `retention_daily` (day grain) and
    * `retention_curve` (cohort grain): 1.0 = every weekly user is in
    * daily, ~1/7 = each user appears one day a week. `avg_dau`
    * averages over the week's ACTIVE days (a partial trailing week at
    * the corpus edge isn't diluted by absent days).
    *
    * Scale shape: BOTH rollups hang off one distinct (user_id,
    * event_date) exchange — the fact table is touched once; DAU is a
    * count per (week, day) and WAU a distinct-user count per week
    * over that key-dimension frame, joined at |weeks| rows. */
  def stickinessWeekly(spark: SparkSession, dir: String): DataFrame =
    stickinessWeeklyFrom(enriched(spark, dir))

  def stickinessWeeklyFrom(e: DataFrame): DataFrame = {
    val ud = e
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_date")).distinct()
      .withColumn("week", date_trunc("week", col("event_date")).cast("date"))
      .localCheckpoint() // two rollups off the one fact-sized distinct
    val daily = ud.groupBy("week", "event_date")
      .agg(count(lit(1)).as("dau"))
    val weekly = ud.select("week", "user_id").distinct()
      .groupBy("week").agg(count(lit(1)).as("wau"))
    weekly.join(daily, Seq("week"))
      .groupBy(col("week"), col("wau"))
      .agg(count(lit(1)).as("active_days"),
        avg(col("dau").cast("double")).as("avg_dau"))
      .select(col("week"), col("wau"), col("active_days"),
        col("avg_dau"),
        (col("avg_dau") / col("wau").cast("double")).as("stickiness"))
      .orderBy("week")
  }

  val stickinessWeeklySql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS event_date
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |), d AS (
      |  SELECT date_trunc('week', event_date) AS week, event_date, COUNT(*) AS dau
      |  FROM ud GROUP BY 1, 2
      |), w AS (
      |  SELECT date_trunc('week', event_date) AS week,
      |    COUNT(DISTINCT user_id) AS wau
      |  FROM ud GROUP BY 1
      |)
      |SELECT w.week, CAST(w.wau AS BIGINT) AS wau,
      |  CAST(COUNT(*) AS BIGINT) AS active_days,
      |  AVG(CAST(d.dau AS DOUBLE)) AS avg_dau,
      |  AVG(CAST(d.dau AS DOUBLE)) / CAST(w.wau AS DOUBLE) AS stickiness
      |FROM w JOIN d ON w.week = d.week
      |GROUP BY w.week, w.wau ORDER BY w.week""".stripMargin
}
