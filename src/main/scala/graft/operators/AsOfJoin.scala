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
