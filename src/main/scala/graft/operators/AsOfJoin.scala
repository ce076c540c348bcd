package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — "for each left row, the most recent right row
  * at or before it" — the attribution/point-in-time primitive Spark
  * has no native operator for (and the batch analogue of
  * `streaming.EventStream.viewPurchaseAttribution`).
  *
  * Spark-first plan (brief's preference (a): compose existing ops):
  * instead of a per-pair range join (which explodes to pairs before
  * filtering, O(n·m) within a key) the two sides are UNIONED, sorted
  * once per key by (time, side, id), and the right side's latest value
  * is carried forward with a running window aggregate — ONE shuffle on
  * the key, linear work, no pair materialization. This is the plan a
  * 100 TB as-of join wants: state per key is a single running value,
  * exactly like the sorted-merge as-of of kdb/QuestDB re-expressed as
  * a Spark window.
  */
object AsOfJoin {

  /** Generic core: left rows (key, ts, id) gain `asof_<rightTs>` = the
    * greatest right ts ≤ their own ts within the key group. Ties
    * (equal ts) match, with the right side ordered first. `idCol`
    * breaks residual ordering ties deterministically. */
  private[graft] def asofBackwardEpoch(left: DataFrame, right: DataFrame,
      key: String, ts: String, idCol: String): DataFrame = {
    val l = left.select(col(key), col(ts), col(idCol), lit(1).as("side"))
    val r = right.select(col(key), col(ts), col(idCol), lit(0).as("side"))
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("side"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("asof_ts", max(when(col("side") === 0, col(ts))).over(w))
      .filter(col("side") === 1)
      .drop("side")
  }

  /** General backward as-of join: every left row keeps ALL its
    * columns and gains `asof_<ts>` + `asof_<p>` for each right
    * `payload` column — the values of the LATEST right row with the
    * same `key` and ts ≤ the left row's ts (ties match). Left rows
    * with no prior right row get nulls: as-of is left-total, never
    * row-dropping.
    *
    * Row semantics, not last-non-null-per-column: the carried value
    * is a STRUCT of the entire matched right row, so a right row
    * whose payload is genuinely null yields null (a per-column
    * `last(_, ignoreNulls)` would skip past it to an older row and
    * stitch together a row that never existed).
    *
    * Same single-shuffle union+window plan as the core: both sides
    * hash on `key` once; no pair materialization, state per key is
    * one running struct. `tieBreak` columns (right-side, may be
    * absent on left) make the choice among equal-ts right rows
    * deterministic. */
  def asofBackward(left: DataFrame, right: DataFrame, key: String, ts: String,
                   payload: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    require(payload.nonEmpty, "asofBackward needs at least one payload column")
    val side = "__graft_asof_side"
    val carry = "__graft_asof_carry"
    require(!(left.columns ++ right.columns).exists(c => c == side || c == carry),
      s"inputs may not carry $side/$carry")
    // a payload name shared with a left column would merge in the union
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"payload columns collide with left columns: ${collisions.mkString(", ")} — rename one side")
    val r = right.select((Seq(key, ts) ++ payload ++ tieBreak).distinct.map(col): _*)
      .withColumn(side, lit(0))
    val l = left.withColumn(side, lit(1))
    // right (side 0) sorts before left (side 1) at equal ts → ties match
    val w = Window.partitionBy(key)
      .orderBy(col(ts) +: col(side) +: tieBreak.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = last(
      when(col(side) === 0, struct((Seq(ts) ++ payload).map(col): _*)),
      ignoreNulls = true).over(w)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(carry, carried)
      .filter(col(side) === 1)
      .select(left.columns.toIndexedSeq.map(col)
        ++ Seq(col(s"$carry.$ts").as(s"asof_$ts"))
        ++ payload.map(p => col(s"$carry.$p").as(s"asof_$p")): _*)
  }

  /** Forward as-of join — the time-mirror of `asofBackward`: every
    * left row gains the values of the EARLIEST right row with the same
    * `key` and ts ≥ the left row's ts (ties match). Left-total; same
    * single-shuffle union+window plan, with the frame reversed
    * (currentRow → unboundedFollowing) and the LEFT side ordered first
    * at equal ts so an equal-ts right row falls inside the frame.
    * The "time to next X" primitive: activation latency, next-error
    * lookup, replenishment-gap analyses. */
  def asofForward(left: DataFrame, right: DataFrame, key: String, ts: String,
                  payload: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    require(payload.nonEmpty, "asofForward needs at least one payload column")
    val side = "__graft_asof_side"
    val carry = "__graft_asof_carry"
    require(!(left.columns ++ right.columns).exists(c => c == side || c == carry),
      s"inputs may not carry $side/$carry")
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"payload columns collide with left columns: ${collisions.mkString(", ")} — rename one side")
    val r = right.select((Seq(key, ts) ++ payload ++ tieBreak).distinct.map(col): _*)
      .withColumn(side, lit(1))
    val l = left.withColumn(side, lit(0))
    // left (side 0) sorts before right (side 1) at equal ts, so the
    // forward frame starting at the left row includes equal-ts rights
    val w = Window.partitionBy(key)
      .orderBy(col(ts) +: col(side) +: tieBreak.map(col): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = first(
      when(col(side) === 1, struct((Seq(ts) ++ payload).map(col): _*)),
      ignoreNulls = true).over(w)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(carry, carried)
      .filter(col(side) === 0)
      .select(left.columns.toIndexedSeq.map(col)
        ++ Seq(col(s"$carry.$ts").as(s"asof_$ts"))
        ++ payload.map(p => col(s"$carry.$p").as(s"asof_$p")): _*)
  }

  /** Nearest as-of join — the third direction (pandas
    * merge_asof(direction='nearest'), kdb's wj midpoint cousin): every
    * left row gains the right row whose `ts` is CLOSEST in either
    * direction; equal distances resolve BACKWARD (the
    * attribution-friendly convention: prefer the cause that already
    * happened). Left-total like the other two.
    *
    * ONE shuffle, not two: both directional carries ride the same
    * union + key exchange as separate frames over one window ordering
    * (right side sorts first at equal ts, so an equal-ts right lands
    * in the backward carry at distance 0 — the forward frame missing
    * it is immaterial because ties go backward anyway). `ts` must be
    * numeric (epoch) — nearest needs subtractable time. */
  def asofNearest(left: DataFrame, right: DataFrame, key: String, ts: String,
                  payload: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    require(payload.nonEmpty, "asofNearest needs at least one payload column")
    val side = "__graft_asof_side"
    val bc = "__graft_asof_back"
    val fc = "__graft_asof_fwd"
    require(!(left.columns ++ right.columns).exists(c => c == side || c == bc || c == fc),
      s"inputs may not carry $side/$bc/$fc")
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"payload columns collide with left columns: ${collisions.mkString(", ")} — rename one side")
    val r = right.select((Seq(key, ts) ++ payload ++ tieBreak).distinct.map(col): _*)
      .withColumn(side, lit(0))
    val l = left.withColumn(side, lit(1))
    val order = col(ts) +: col(side) +: tieBreak.map(col)
    val wb = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rightRow = when(col(side) === 0, struct((Seq(ts) ++ payload).map(col): _*))
    val chosen = {
      val backGap = col(ts) - col(s"$bc.$ts")
      val fwdGap = col(s"$fc.$ts") - col(ts)
      when(col(bc).isNull, col(fc))
        .when(col(fc).isNull, col(bc))
        .when(backGap <= fwdGap, col(bc))
        .otherwise(col(fc))
    }
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(bc, last(rightRow, ignoreNulls = true).over(wb))
      .withColumn(fc, first(rightRow, ignoreNulls = true).over(wf))
      .filter(col(side) === 1)
      .withColumn("__graft_asof_pick", chosen)
      .select(left.columns.toIndexedSeq.map(col)
        ++ Seq(col(s"__graft_asof_pick.$ts").as(s"asof_$ts"))
        ++ payload.map(p => col(s"__graft_asof_pick.$p").as(s"asof_$p")): _*)
  }

  val ActivationWindowSeconds: Long = 7L * 86400

  /** Signup→first-purchase activation mart: per signup day, how many
    * signups reached their FIRST subsequent purchase within 7 days,
    * the activation rate, and the integer-exact mean / max activation
    * latency among the activated. The forward as-of finds each
    * signup's next purchase in ONE user-key shuffle (no signup×
    * purchase pair materialization); the day rollup moves signup-count
    * rows. Mean is integer-sum ÷ count (partial-order-proof); no
    * percentile aggregate, so the mart is exact at any scale. */
  def signupActivation(spark: SparkSession, dir: String): DataFrame = {
    val e = EventMarts.enriched(spark, dir).filter(col("ts").isNotNull)
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_epoch"), col("event_id"), col("event_date"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_epoch"), col("event_id").as("purchase_id"))
    val gap = col("asof_event_epoch") - col("event_epoch")
    val activated = col("asof_event_epoch").isNotNull &&
      gap <= lit(ActivationWindowSeconds)
    asofForward(signups, purchases, "user_id", "event_epoch",
        payload = Seq("purchase_id"), tieBreak = Seq("purchase_id"))
      .select(col("event_date").as("signup_date"),
        when(activated, gap).as("act_gap"))
      .groupBy(col("signup_date"))
      .agg(
        count(lit(1)).as("signups"),
        count(col("act_gap")).as("activated_7d"),
        (count(col("act_gap")).cast("double") / count(lit(1)).cast("double"))
          .as("activation_rate"),
        (sum(col("act_gap")).cast("double") / count(col("act_gap")).cast("double"))
          .as("mean_seconds"),
        max(col("act_gap")).as("max_seconds"))
      .orderBy("signup_date")
  }

  val signupActivationSql: String =
    """WITH s AS (
      |  SELECT event_id, user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ep,
      |    CAST(ts AS DATE) AS signup_date
      |  FROM events WHERE event_type = 'signup' AND ts IS NOT NULL
      |), p AS (
      |  SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ep
      |  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
      |), firstp AS (
      |  SELECT s.event_id, s.signup_date,
      |    MIN(p.ep) - s.ep AS gap
      |  FROM s LEFT JOIN p ON s.user_id = p.user_id AND p.ep >= s.ep
      |  GROUP BY s.event_id, s.signup_date, s.ep
      |), act AS (
      |  SELECT signup_date,
      |    CASE WHEN gap IS NOT NULL AND gap <= 604800 THEN gap END AS act_gap
      |  FROM firstp
      |)
      |SELECT signup_date,
      |  COUNT(*) AS signups,
      |  COUNT(act_gap) AS activated_7d,
      |  CAST(COUNT(act_gap) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS activation_rate,
      |  CAST(SUM(act_gap) AS DOUBLE) / CAST(COUNT(act_gap) AS DOUBLE) AS mean_seconds,
      |  MAX(act_gap) AS max_seconds
      |FROM act GROUP BY signup_date ORDER BY signup_date""".stripMargin

  /** View→purchase attribution: each purchase matched to the SAME
    * user's most recent view at or before it (seconds grain), plus the
    * attribution gap. Null-ts rows are excluded from both sides (they
    * carry no event time to order on; the quality checks count them).
    * Oracle: DuckDB's native ASOF LEFT JOIN over the same epochs —
    * an independent formulation of the same semantics. */
  def viewPurchaseAsOf(spark: SparkSession, dir: String): DataFrame = {
    val e = EventMarts.enriched(spark, dir)
      .filter(col("ts").isNotNull)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_epoch"), col("event_id"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_epoch"), col("event_id"))
    asofBackwardEpoch(purchases, views, "user_id", "event_epoch", "event_id")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("event_epoch").as("purchase_epoch"),
        col("asof_ts").as("last_view_epoch"),
        (col("event_epoch") - col("asof_ts")).as("gap_seconds"))
      .orderBy("purchase_id")
  }

  /** Payload-carrying attribution through the GENERAL as-of join:
    * each purchase gains the ID of its latest prior-or-equal view,
    * not just its timestamp — the column a downstream "which
    * impression converted" join actually needs. Views are
    * pre-aggregated to one row per (user, epoch) (max event_id) so
    * the as-of choice is deterministic in both engines — DuckDB's
    * ASOF expects a right side unique on (key, ts). */
  def attributedView(spark: SparkSession, dir: String): DataFrame = {
    val e = EventMarts.enriched(spark, dir).filter(col("ts").isNotNull)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_epoch"), col("event_id"))
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("event_epoch"))
      .agg(max(col("event_id")).as("view_id"))
    asofBackward(purchases, views, key = "user_id", ts = "event_epoch",
        payload = Seq("view_id"))
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("event_epoch").as("purchase_epoch"),
        col("asof_event_epoch").as("view_epoch"),
        col("asof_view_id").as("view_id"),
        (col("event_epoch") - col("asof_event_epoch")).as("gap_seconds"))
      .orderBy("purchase_id")
  }

  val attributedViewSql: String =
    """WITH p AS (
      |  SELECT event_id, user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ep
      |  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
      |), v AS (
      |  SELECT user_id AS v_user, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ev,
      |    MAX(event_id) AS view_id
      |  FROM events WHERE event_type = 'view' AND ts IS NOT NULL
      |  GROUP BY v_user, ev
      |)
      |SELECT p.event_id AS purchase_id, p.user_id, p.ep AS purchase_epoch,
      |  v.ev AS view_epoch, v.view_id, p.ep - v.ev AS gap_seconds
      |FROM p ASOF LEFT JOIN v ON p.user_id = v.v_user AND p.ep >= v.ev
      |ORDER BY purchase_id""".stripMargin

  /** Nearest-view attribution through [[asofNearest]]: each purchase
    * matched to the temporally CLOSEST same-user view in EITHER
    * direction (ties backward) — the session-reconstruction question
    * ("which impression belongs to this purchase") when instrumentation
    * skew can put the view's timestamp after the purchase's, which the
    * pure backward join silently mis-attributes to an older view.
    * Views pre-aggregated unique per (user, epoch) like
    * `asof_attributed_view`, so the choice is deterministic in both
    * engines. Oracle: an independent DuckDB LATERAL nearest-1 probe
    * (ORDER BY distance, direction, LIMIT 1) — a different algorithm
    * for the same semantics. */
  def nearestView(spark: SparkSession, dir: String): DataFrame = {
    val e = EventMarts.enriched(spark, dir).filter(col("ts").isNotNull)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_epoch"), col("event_id"))
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("event_epoch"))
      .agg(max(col("event_id")).as("view_id"))
    asofNearest(purchases, views, key = "user_id", ts = "event_epoch",
        payload = Seq("view_id"))
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("event_epoch").as("purchase_epoch"),
        col("asof_event_epoch").as("view_epoch"),
        col("asof_view_id").as("view_id"),
        abs(col("event_epoch") - col("asof_event_epoch")).as("gap_seconds"))
      .orderBy("purchase_id")
  }

  val nearestViewSql: String =
    """WITH p AS (
      |  SELECT event_id, user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ep
      |  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
      |), v AS (
      |  SELECT user_id AS v_user, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ev,
      |    MAX(event_id) AS view_id
      |  FROM events WHERE event_type = 'view' AND ts IS NOT NULL
      |  GROUP BY v_user, ev
      |)
      |SELECT p.event_id AS purchase_id, p.user_id, p.ep AS purchase_epoch,
      |  n.ev AS view_epoch, n.view_id, ABS(p.ep - n.ev) AS gap_seconds
      |FROM p LEFT JOIN LATERAL (
      |  SELECT ev, view_id FROM v
      |  WHERE v.v_user = p.user_id
      |  ORDER BY ABS(v.ev - p.ep) ASC,
      |    CASE WHEN v.ev <= p.ep THEN 0 ELSE 1 END ASC
      |  LIMIT 1
      |) n ON TRUE
      |ORDER BY purchase_id""".stripMargin

  /** Daily conversion-latency distribution: for purchases with a
    * prior same-user view, seconds from the LAST view to the purchase,
    * rolled up per purchase day as count / p50 / p90 / mean / max —
    * the "how long does intent take to convert" mart funnel teams
    * read next to funnel_conversion's step rates.
    *
    * Scale shape: inherits the as-of core's single key shuffle +
    * running-max window (no pair materialization); the day rollup
    * then moves only purchase-count rows. Exact percentiles buffer
    * ONE DAY'S latencies in one aggregation buffer — fine while days
    * are small, a scale-killer when a day is billions of purchases,
    * which is why `conversionLatencyApprox` below is the registered
    * 100 TB form (this exact query stays as the oracle anchor). Mean
    * is integer-sum ÷ count, so partial-aggregation order can't move
    * a bit; p50/p90 ride the proven percentile ≡ quantile_cont
    * equivalence. Unconverted purchases (no prior view) are excluded
    * here and counted by funnel/quality marts. */
  def conversionLatency(spark: SparkSession, dir: String): DataFrame =
    latencyRollup(conversionLatencies(spark, dir), Seq("event_date"), approx = false)

  /** The 100 TB form: `approx_percentile` (Greenwald-Khanna) carries a
    * FIXED-size sketch through map-side partial aggregation instead of
    * buffering one day's every latency on one reducer — at 100 TB a
    * single day's purchases are billions of values. Rows-only at the
    * gate (DuckDB's approx algorithm differs); the spec bounds each
    * answer by the exact values at q ± 0.01 (the value_percentiles /
    * value_percentiles_approx pattern). The exact form stays
    * registered as the oracle anchor. */
  def conversionLatencyApprox(spark: SparkSession, dir: String): DataFrame =
    latencyRollup(conversionLatencies(spark, dir), Seq("event_date"), approx = true)

  /** Shared pre-aggregation frame: (event_date, latency) per converted
    * purchase — the as-of core's single key shuffle + running-max
    * window, no pair materialization. */
  private[graft] def conversionLatencies(spark: SparkSession, dir: String): DataFrame = {
    val e = EventMarts.enriched(spark, dir).filter(col("ts").isNotNull)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_epoch"), col("event_id"), col("event_date"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_epoch"), col("event_id").as("view_id"))
    asofBackward(purchases, views, "user_id", "event_epoch",
        payload = Seq("view_id"), tieBreak = Seq("view_id"))
      .filter(col("asof_event_epoch").isNotNull)
      .select(col("event_date"),
        (col("event_epoch") - col("asof_event_epoch")).as("latency"))
  }

  /** One definition of the latency-distribution rollup, exact and
    * approx: the two forms differ ONLY in the percentile aggregate
    * (group-buffering sort vs fixed-state GK sketch at accuracy 1e-4),
    * so the approx sibling can never drift from the mart's shape. */
  private[graft] def latencyRollup(lat: DataFrame, keys: Seq[String],
                                   approx: Boolean): DataFrame = {
    def pct(q: Double, name: String) = Pct.col("latency", q.toString, approx).as(name)
    lat.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("conversions"),
        pct(0.5, "p50_seconds"),
        pct(0.9, "p90_seconds"),
        (sum(col("latency")).cast("double") / count(lit(1)).cast("double"))
          .as("mean_seconds"),
        max(col("latency")).as("max_seconds"))
      .orderBy(keys.map(col): _*)
  }

  /** Step-to-step funnel timing: for each adjacent funnel pair
    * (view→click, click→purchase), the per-day latency distribution
    * from the LAST upstream event to the downstream one — where the
    * funnel's time is actually spent, per day (conversionLatency is
    * the end-to-end view→purchase collapse of this).
    *
    * Scale shape: one as-of union+window pass per step pair (each a
    * single user_id shuffle over only that pair's filtered events);
    * the day×step rollup moves event-count rows. Same determinism
    * contract as conversionLatency. */
  def stepLatency(spark: SparkSession, dir: String): DataFrame =
    latencyRollup(stepLatencies(spark, dir), Seq("event_date", "step"), approx = false)

  /** Fixed-state sibling of `stepLatency` — see conversionLatencyApprox. */
  def stepLatencyApprox(spark: SparkSession, dir: String): DataFrame =
    latencyRollup(stepLatencies(spark, dir), Seq("event_date", "step"), approx = true)

  private[graft] def stepLatencies(spark: SparkSession, dir: String): DataFrame = {
    val e = EventMarts.enriched(spark, dir).filter(col("ts").isNotNull)
    def pair(fromType: String, toType: String, label: String): DataFrame = {
      val to = e.filter(col("event_type") === toType)
        .select(col("user_id"), col("event_epoch"), col("event_id"), col("event_date"))
      val from = e.filter(col("event_type") === fromType)
        .select(col("user_id"), col("event_epoch"), col("event_id").as("from_id"))
      asofBackward(to, from, "user_id", "event_epoch",
          payload = Seq("from_id"), tieBreak = Seq("from_id"))
        .filter(col("asof_event_epoch").isNotNull)
        .select(col("event_date"), lit(label).as("step"),
          (col("event_epoch") - col("asof_event_epoch")).as("latency"))
    }
    pair("view", "click", "view_to_click")
      .unionByName(pair("click", "purchase", "click_to_purchase"))
  }

  val stepLatencySql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ep,
      |    CAST(ts AS DATE) AS event_date
      |  FROM events WHERE ts IS NOT NULL
      |), vc AS (
      |  SELECT c.event_date, 'view_to_click' AS step, c.ep - v.ev AS latency
      |  FROM (SELECT user_id, ep, event_date FROM ev WHERE event_type = 'click') c
      |  ASOF JOIN (SELECT DISTINCT user_id, ep AS ev FROM ev WHERE event_type = 'view') v
      |    ON c.user_id = v.user_id AND c.ep >= v.ev
      |), cp AS (
      |  SELECT p.event_date, 'click_to_purchase' AS step, p.ep - c.ec AS latency
      |  FROM (SELECT user_id, ep, event_date FROM ev WHERE event_type = 'purchase') p
      |  ASOF JOIN (SELECT DISTINCT user_id, ep AS ec FROM ev WHERE event_type = 'click') c
      |    ON p.user_id = c.user_id AND p.ep >= c.ec
      |), lat AS (
      |  SELECT * FROM vc UNION ALL SELECT * FROM cp
      |)
      |SELECT event_date, step,
      |  COUNT(*) AS conversions,
      |  quantile_cont(latency, 0.5) AS p50_seconds,
      |  quantile_cont(latency, 0.9) AS p90_seconds,
      |  CAST(SUM(latency) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_seconds,
      |  MAX(latency) AS max_seconds
      |FROM lat
      |GROUP BY event_date, step
      |ORDER BY event_date, step""".stripMargin

  val conversionLatencySql: String =
    """WITH p AS (
      |  SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ep,
      |    CAST(ts AS DATE) AS event_date
      |  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
      |), v AS (
      |  SELECT DISTINCT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ev
      |  FROM events WHERE event_type = 'view' AND ts IS NOT NULL
      |), lat AS (
      |  SELECT p.event_date, p.ep - v.ev AS latency
      |  FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ep >= v.ev
      |)
      |SELECT event_date,
      |  COUNT(*) AS conversions,
      |  quantile_cont(latency, 0.5) AS p50_seconds,
      |  quantile_cont(latency, 0.9) AS p90_seconds,
      |  CAST(SUM(latency) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_seconds,
      |  MAX(latency) AS max_seconds
      |FROM lat
      |GROUP BY event_date
      |ORDER BY event_date""".stripMargin

  val viewPurchaseAsOfSql: String =
    """WITH p AS (
      |  SELECT event_id, user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ep
      |  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
      |), v AS (
      |  SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ev
      |  FROM events WHERE event_type = 'view' AND ts IS NOT NULL
      |)
      |SELECT p.event_id AS purchase_id, p.user_id, p.ep AS purchase_epoch,
      |  v.ev AS last_view_epoch, p.ep - v.ev AS gap_seconds
      |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ep >= v.ev
      |ORDER BY purchase_id""".stripMargin
}
