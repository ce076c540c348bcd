package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.EventMarts.enriched

/** Gap-based sessionization + session sequence analysis.
  *
  * Reference: spark_batch_processor.compute_session_sequences
  * (/root/reference/scripts/spark_batch_processor.py:266-324) — the
  * testdata has no session_id, so sessions are derived with the classic
  * lag + cumulative-sum pattern: a new session starts after a
  * `gapSeconds` silence per user.
  *
  * Scale notes: all three window functions share ONE partitioning —
  * the per-session `row_number` clusters on (user_id, session_idx),
  * which the existing HashPartitioning(user_id) already satisfies
  * (subset rule), so it adds only a partition-local sort, and the
  * subsequent groupBy(user_id, session_idx) is likewise co-located.
  * Sequences are HARD-CAPPED at `MaxSeqEvents` events: the
  * `collect_list` aggregates `when(rank <= cap, …)` so the aggregation
  * BUFFER is bounded, not just the output row — a bot user with a
  * multi-million-event "session" costs `MaxSeqEvents` structs of state,
  * with the tail surfaced as `overflow_events`. At 100 TB, user_id
  * partitioning distributes evenly (no hot keys in behavioral data;
  * were there any, AQE skew-join/salting applies).
  */
object Sessionize {

  val GapSeconds = 1800

  /** Max events rendered into `event_sequence`; the rest are counted in
    * `overflow_events`. Bounds both the aggregation state and the
    * output row width against pathological single-user sessions. */
  val MaxSeqEvents = 100

  /** Event-level sessionized frame (user_id, event_id, event_type,
    * event_epoch, session_idx) — the shared base of every session
    * query. One hash partitioning on user_id; every downstream window
    * keyed on (user_id, session_idx) is satisfied by the subset rule
    * and adds only a partition-local sort. */
  private[graft] def sessionized(e: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_epoch", "event_id")
    e.select("user_id", "event_id", "event_type", "event_epoch")
      .withColumn("prev_epoch", lag("event_epoch", 1).over(w))
      .withColumn("is_new",
        when(col("prev_epoch").isNull || col("event_epoch") - col("prev_epoch") > GapSeconds, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** One row per (user, session): ordered event sequence + stats. */
  def sessionSequences(spark: SparkSession, dir: String): DataFrame =
    sessionSequencesFrom(enriched(spark, dir))

  def sessionSequencesFrom(e: DataFrame): DataFrame = {
    val withGap = sessionized(e)
      // same user_id hash partitioning satisfies the (user_id,
      // session_idx) clustering — only a local sort is added here
      .withColumn("seq_rank",
        row_number().over(Window.partitionBy("user_id", "session_idx")
          .orderBy("event_epoch", "event_id")))
    withGap
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(col("seq_rank") <= MaxSeqEvents,
                struct(col("event_epoch"), col("event_id"), col("event_type"))))),
            x => x.getField("event_type")),
          " -> ").as("event_sequence"),
        count(lit(1)).as("event_count"),
        min(col("event_epoch")).as("session_start_epoch"),
        max(col("event_epoch")).as("session_end_epoch"),
        (max(col("event_epoch")) - min(col("event_epoch"))).as("duration_seconds"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("has_purchase"),
        greatest(count(lit(1)) - lit(MaxSeqEvents), lit(0L)).as("overflow_events"))
      .orderBy("user_id", "session_idx")
  }

  val sessionSequencesSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS event_epoch,
      |    CASE WHEN LAG(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) OVER w IS NULL
      |           OR CAST(FLOOR(EPOCH(ts)) AS BIGINT) - LAG(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) OVER w > 1800
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT), event_id)
      |), sessioned AS (
      |  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY event_epoch, event_id
      |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
      |  FROM flagged
      |), ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_idx
      |                               ORDER BY event_epoch, event_id) AS seq_rank
      |  FROM sessioned
      |)
      |SELECT user_id, session_idx,
      |  STRING_AGG(event_type, ' -> ' ORDER BY event_epoch, event_id)
      |    FILTER (WHERE seq_rank <= 100) AS event_sequence,
      |  COUNT(*) AS event_count,
      |  MIN(event_epoch) AS session_start_epoch,
      |  MAX(event_epoch) AS session_end_epoch,
      |  MAX(event_epoch) - MIN(event_epoch) AS duration_seconds,
      |  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase,
      |  GREATEST(COUNT(*) - 100, 0) AS overflow_events
      |FROM ranked
      |GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin

  /** Frequency/duration/conversion per behavioral pattern.
    * Reference: spark_batch_processor.py:313-322 (pattern_summary). */
  def sessionPatterns(spark: SparkSession, dir: String): DataFrame =
    sessionSequences(spark, dir)
      .groupBy(col("event_sequence"))
      .agg(
        count(lit(1)).as("session_count"),
        (sum(col("duration_seconds")).cast("double") / count(lit(1))).as("avg_duration_sec"),
        (sum(col("has_purchase")).cast("double") / count(lit(1)) * lit(100)).as("purchase_rate"))
      .orderBy(desc("session_count"), asc("event_sequence"))

  val sessionPatternsSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS event_epoch,
      |    CASE WHEN LAG(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) OVER w IS NULL
      |           OR CAST(FLOOR(EPOCH(ts)) AS BIGINT) - LAG(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) OVER w > 1800
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT), event_id)
      |), sessioned AS (
      |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY event_epoch, event_id
      |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      |  FROM flagged
      |), ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_idx
      |                               ORDER BY event_epoch, event_id) AS seq_rank
      |  FROM sessioned
      |), sessions AS (
      |  SELECT user_id, session_idx,
      |    STRING_AGG(event_type, ' -> ' ORDER BY event_epoch, event_id)
      |      FILTER (WHERE seq_rank <= 100) AS event_sequence,
      |    MAX(event_epoch) - MIN(event_epoch) AS duration_seconds,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
      |  FROM ranked GROUP BY user_id, session_idx
      |)
      |SELECT event_sequence,
      |  COUNT(*) AS session_count,
      |  CAST(SUM(duration_seconds) AS DOUBLE) / COUNT(*) AS avg_duration_sec,
      |  CAST(SUM(has_purchase) AS DOUBLE) / COUNT(*) * 100 AS purchase_rate
      |FROM sessions
      |GROUP BY event_sequence
      |ORDER BY session_count DESC, event_sequence ASC""".stripMargin

  /** Shared oracle CTE prefix: gap-sessionized event rows (the SQL
    * mirror of `sessionized`). */
  private val sessionizedSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS event_epoch,
      |    CASE WHEN LAG(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) OVER w IS NULL
      |           OR CAST(FLOOR(EPOCH(ts)) AS BIGINT) - LAG(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) OVER w > 1800
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT), event_id)
      |), sessioned AS (
      |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY event_epoch, event_id
      |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      |  FROM flagged
      |)""".stripMargin

  /** Within-session event-type transition matrix (first-order Markov):
    * how traffic flows step-to-step — `view -> click` vs `view ->
    * error` — with per-origin transition rates. The micro-structure
    * complement to the day-grain step funnel (funnel_conversion).
    *
    * Scale shape: consecutive pairs come from ONE `lead` window whose
    * (user_id, session_idx) clustering the sessionize exchange already
    * satisfies (local sort only); the pair rollup shuffles only
    * (from_type, to_type) partial counts — at most |types|² groups
    * regardless of event volume — and the rate window runs over that
    * tiny aggregated frame. */
  def sessionTransitions(spark: SparkSession, dir: String): DataFrame =
    sessionTransitionsFrom(enriched(spark, dir))

  def sessionTransitionsFrom(e: DataFrame): DataFrame = {
    val wSess = Window.partitionBy("user_id", "session_idx")
      .orderBy("event_epoch", "event_id")
    sessionized(e)
      .withColumn("to_type", lead("event_type", 1).over(wSess))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("transition_count"))
      .withColumn("transition_rate",
        col("transition_count").cast("double")
          / sum(col("transition_count")).over(Window.partitionBy("from_type")).cast("double")
          * lit(100))
      .orderBy("from_type", "to_type")
  }

  val sessionTransitionsSql: String = sessionizedSql +
    """, pairs AS (
      |  SELECT event_type AS from_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id, session_idx
      |                           ORDER BY event_epoch, event_id) AS to_type
      |  FROM sessioned
      |)
      |SELECT from_type, to_type, COUNT(*) AS transition_count,
      |  CAST(COUNT(*) AS DOUBLE)
      |    / CAST(SUM(COUNT(*)) OVER (PARTITION BY from_type) AS DOUBLE) * 100 AS transition_rate
      |FROM pairs WHERE to_type IS NOT NULL
      |GROUP BY from_type, to_type
      |ORDER BY from_type, to_type""".stripMargin

  /** Daily session-grain mart (the GA-style headline table): sessions
    * per day, average depth and duration, bounce rate (single-event
    * sessions) and session conversion rate. Day grain is the SESSION
    * START day (a session straddling midnight counts once, on the day
    * it began). Distinct from mart_user_daily (user grain) and
    * funnel_conversion (step grain, day-windowed).
    *
    * Scale shape: the per-session rollup rides the sessionize
    * exchange (groupBy (user_id, session_idx) is subset-satisfied —
    * no second shuffle of event rows); only per-session stat rows
    * reach the final day rollup. The day is derived with pure integer
    * epoch arithmetic (epoch // 86400), timezone-free on both the
    * Spark and oracle sides. */
  def sessionDaily(spark: SparkSession, dir: String): DataFrame =
    sessionDailyFrom(enriched(spark, dir))

  def sessionDailyFrom(e: DataFrame): DataFrame = {
    val sessions = sessionized(e)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("event_count"),
        min(col("event_epoch")).as("session_start_epoch"),
        (max(col("event_epoch")) - min(col("event_epoch"))).as("duration_seconds"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("has_purchase"))
    sessions
      .groupBy(date_add(lit("1970-01-01").cast("date"),
        (col("session_start_epoch") / lit(86400)).cast("int")).as("session_date"))
      .agg(
        count(lit(1)).as("sessions"),
        (sum(col("event_count")).cast("double") / count(lit(1)).cast("double"))
          .as("avg_events_per_session"),
        (sum(col("duration_seconds")).cast("double") / count(lit(1)).cast("double"))
          .as("avg_duration_sec"),
        (sum(when(col("event_count") === 1, 1).otherwise(0)).cast("double")
          / count(lit(1)).cast("double") * lit(100)).as("bounce_rate"),
        (sum(col("has_purchase")).cast("double") / count(lit(1)).cast("double") * lit(100))
          .as("conversion_rate"))
      .orderBy("session_date")
  }

  /** Peak concurrent sessions per day — the capacity-planning curve
    * ("how many sessions were live at once"). A session is active on
    * the inclusive epoch range [first event, last event]; concurrency
    * is evaluated after each boundary event with starts ordered before
    * ends at the same epoch (a session ending at t and one starting at
    * t overlap at t). Days with no session boundary carry concurrency
    * silently and emit no row.
    *
    * Scale shape — a DISTRIBUTED sweep-line, not a global window:
    * the classic running `sum(±1) over (order by epoch)` would move
    * every boundary row to one partition. Instead boundary deltas get
    * prefix sums WITHIN hour buckets (partition-parallel across
    * buckets), buckets collapse to one (net, peak) row each, and the
    * only unpartitioned window runs over that |hours| aggregate frame
    * — the same two-level decomposition a prefix-scan uses. Per-day
    * peak is max(bucket carry + bucket-local peak) vs the day's own
    * carry-in (a day whose first boundary is an END peaked before it).
    */
  def sessionConcurrency(spark: SparkSession, dir: String): DataFrame =
    sessionConcurrencyFrom(enriched(spark, dir))

  def sessionConcurrencyFrom(e: DataFrame): DataFrame = {
    val sessions = sessionized(e)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("event_epoch")).as("start_epoch"),
        max(col("event_epoch")).as("end_epoch"))
    val deltas = sessions.select(col("start_epoch").as("epoch"), lit(1).as("delta"))
      .unionAll(sessions.select(col("end_epoch").as("epoch"), lit(-1).as("delta")))
      .withColumn("hour_bucket", floor(col("epoch") / lit(3600)))
    // prefix sums are bucket-local: parallel across hour buckets; the
    // +1-before-−1 tie order makes equal-epoch overlap inclusive, and
    // reordering equal (epoch, delta) rows permutes prefix values
    // without changing their multiset, so max is deterministic
    val wBucket = Window.partitionBy("hour_bucket")
      .orderBy(col("epoch").asc, col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perBucket = deltas
      .withColumn("run_local", sum(col("delta")).over(wBucket))
      .groupBy(col("hour_bucket"))
      .agg(sum(col("delta")).as("net"),
        max(col("run_local")).as("peak_local"),
        sum(when(col("delta") === 1, 1).otherwise(0)).as("starts"),
        sum(when(col("delta") === -1, 1).otherwise(0)).as("ends"))
    // the ONLY unpartitioned window — over the |hour buckets| frame
    val wCarry = Window.orderBy("hour_bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val buckets = perBucket
      .withColumn("carry", coalesce(sum(col("net")).over(wCarry), lit(0L)))
      .withColumn("peak", col("carry") + col("peak_local"))
    buckets
      .groupBy(date_add(lit("1970-01-01").cast("date"),
        floor(col("hour_bucket") / lit(24)).cast("int")).as("session_date"))
      .agg(
        greatest(max(col("peak")), min_by(col("carry"), col("hour_bucket")))
          .as("peak_concurrent_sessions"),
        sum(col("starts")).as("sessions_started"),
        sum(col("ends")).as("sessions_ended"))
      .orderBy("session_date")
  }

  val sessionConcurrencySql: String = sessionizedSql +
    """, sessions AS (
      |  SELECT user_id, session_idx,
      |    MIN(event_epoch) AS start_epoch, MAX(event_epoch) AS end_epoch
      |  FROM sessioned GROUP BY user_id, session_idx
      |), deltas AS (
      |  SELECT start_epoch AS epoch, 1 AS delta FROM sessions
      |  UNION ALL
      |  SELECT end_epoch AS epoch, -1 AS delta FROM sessions
      |), run AS (
      |  SELECT epoch, delta,
      |    SUM(delta) OVER (ORDER BY epoch ASC, delta DESC
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
      |  FROM deltas
      |), daily AS (
      |  SELECT CAST(epoch // 86400 AS BIGINT) AS day_idx,
      |    MAX(running) AS in_day_peak, SUM(delta) AS net,
      |    SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS sessions_started,
      |    SUM(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS sessions_ended
      |  FROM run GROUP BY 1
      |)
      |SELECT DATE '1970-01-01' + CAST(day_idx AS INT) AS session_date,
      |  CAST(GREATEST(in_day_peak,
      |    COALESCE(SUM(net) OVER (ORDER BY day_idx
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) AS BIGINT) AS peak_concurrent_sessions,
      |  CAST(sessions_started AS BIGINT) AS sessions_started,
      |  CAST(sessions_ended AS BIGINT) AS sessions_ended
      |FROM daily
      |ORDER BY session_date""".stripMargin

  val sessionDailySql: String = sessionizedSql +
    """, sessions AS (
      |  SELECT user_id, session_idx, COUNT(*) AS event_count,
      |    MIN(event_epoch) AS session_start_epoch,
      |    MAX(event_epoch) - MIN(event_epoch) AS duration_seconds,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
      |  FROM sessioned GROUP BY user_id, session_idx
      |)
      |SELECT DATE '1970-01-01' + CAST(session_start_epoch // 86400 AS INT) AS session_date,
      |  COUNT(*) AS sessions,
      |  CAST(SUM(event_count) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_events_per_session,
      |  CAST(SUM(duration_seconds) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_duration_sec,
      |  CAST(SUM(CASE WHEN event_count = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) * 100 AS bounce_rate,
      |  CAST(SUM(has_purchase) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 100 AS conversion_rate
      |FROM sessions
      |GROUP BY 1
      |ORDER BY session_date""".stripMargin
}
