package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.EventMarts.enriched

/** Ordered in-window funnel per user (the windowFunnel analytic):
  * the deepest step prefix s1 ≤ s2 ≤ … ≤ sk (event time, ties
  * inclusive) a user completed with sk.ts − s1.ts ≤ window, plus the
  * epoch of their first full completion.
  *
  * NOT a self-join: the exists-a-chain test is solved greedily with
  * chained carry-forward windows. Let a_i(t) = the LATEST possible
  * chain start among all i-step chains ending at or before t; then
  * a_1 is a running max of step-1 epochs and a_i is a running max of
  * a_(i−1) sampled at step-i rows — because any (i−1)-chain ending
  * ≤ q extends with a step-i event at q, and maximizing the start
  * epoch level-by-level is exchange-optimal. A k-chain within the
  * window exists iff some step-k row has ep − a_(k−1) ≤ window: any
  * witness chain's start is ≤ the greedy start, so the greedy test
  * dominates. Each a_i is one more window pass over the SAME user
  * partitioning (no extra shuffle, k−1 local passes); RANGE frames on
  * the epoch make equal-epoch ties order-independent, so results are
  * deterministic without an event_id tiebreak.
  *
  * At 100 TB: one hash exchange on user_id, k−1 partition-local
  * sorts+scans, then a map-side-combinable per-user aggregate. The
  * self-join formulation this replaces is O(events²) per user and
  * k-way; this is O(k·events·log events).
  */
object FunnelWindow {

  def windowFunnel(e: DataFrame, steps: Seq[String],
                   windowSeconds: Long): DataFrame = {
    require(steps.size >= 2, "windowFunnel needs at least 2 steps")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    val n = steps.size
    val wRange = Window.partitionBy("user_id").orderBy("event_epoch")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    var df = e.select("user_id", "event_type", "event_epoch")
      .withColumn("a1",
        max(when(col("event_type") === steps.head, col("event_epoch"))).over(wRange))
    for (i <- 2 until n)
      df = df.withColumn(s"a$i",
        max(when(col("event_type") === steps(i - 1), col(s"a${i - 1}"))).over(wRange))
    // level-i witness at a step-i row: an (i−1)-chain start exists and
    // the full span fits the window
    def reached(i: Int): Column =
      col("event_type") === steps(i - 1) && col(s"a${i - 1}").isNotNull &&
        col("event_epoch") - col(s"a${i - 1}") <= windowSeconds
    val aggs: Seq[Column] =
      (2 to n).map(i => max(when(reached(i), 1).otherwise(0)).as(s"l$i")) :+
        min(when(reached(n), col("event_epoch"))).as("first_completion_epoch")
    val grouped = df.groupBy(col("user_id")).agg(
      max(when(col("event_type") === steps.head, 1).otherwise(0)).as("l1"),
      aggs: _*)
    val level = (n to 1 by -1).foldRight(lit(0)) {
      case (i, rest) => when(col(s"l$i") === 1, lit(i)).otherwise(rest)
    }
    grouped
      .select(col("user_id"), level.cast("int").as("funnel_level"),
        col("first_completion_epoch"))
      .orderBy("user_id")
  }

  val FunnelWindowSeconds = 86400L

  /** The registered query: view → click → purchase within one day.
    * Null-ts events are excluded (no position on the time axis). */
  def funnelWindow(spark: SparkSession, dir: String): DataFrame =
    windowFunnel(
      enriched(spark, dir).filter(col("ts").isNotNull),
      steps = Seq("view", "click", "purchase"),
      windowSeconds = FunnelWindowSeconds)

  val funnelWindowSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ep
      |  FROM events WHERE ts IS NOT NULL
      |), u AS (
      |  SELECT DISTINCT user_id FROM ev
      |), l1 AS (
      |  SELECT DISTINCT user_id FROM ev WHERE event_type = 'view'
      |), l2 AS (
      |  SELECT DISTINCT a.user_id
      |  FROM ev a JOIN ev b ON a.user_id = b.user_id
      |  WHERE a.event_type = 'view' AND b.event_type = 'click'
      |    AND a.ep <= b.ep AND b.ep - a.ep <= 86400
      |), l3 AS (
      |  SELECT c.user_id, MIN(c.ep) AS fce
      |  FROM ev a
      |  JOIN ev b ON a.user_id = b.user_id AND a.event_type = 'view'
      |    AND b.event_type = 'click' AND a.ep <= b.ep
      |  JOIN ev c ON b.user_id = c.user_id AND c.event_type = 'purchase'
      |    AND b.ep <= c.ep AND c.ep - a.ep <= 86400
      |  GROUP BY c.user_id
      |)
      |SELECT u.user_id,
      |  CAST(CASE WHEN l3.user_id IS NOT NULL THEN 3
      |            WHEN l2.user_id IS NOT NULL THEN 2
      |            WHEN l1.user_id IS NOT NULL THEN 1 ELSE 0 END AS INT) AS funnel_level,
      |  l3.fce AS first_completion_epoch
      |FROM u
      |LEFT JOIN l1 ON u.user_id = l1.user_id
      |LEFT JOIN l2 ON u.user_id = l2.user_id
      |LEFT JOIN l3 ON u.user_id = l3.user_id
      |ORDER BY u.user_id""".stripMargin
}
