package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.EventMarts.enriched

/** Point-in-interval range join as a bin-exploded HASH join — the
  * multi-match complement to AsOfJoin (as-of keeps the single latest
  * match; range join keeps every interval containing the point).
  *
  * Spark plans a raw `p.ts BETWEEN i.s AND i.e` predicate (plus any
  * equi-keys) as a join whose range half is a post-probe filter; with
  * NO equi-keys it degenerates to BroadcastNestedLoopJoin — O(|P|·|I|)
  * and driver-memory-bound. The bin trick restores an equi-join in
  * both regimes: intervals are replicated into every fixed-width bin
  * they overlap (`explode(sequence(...))`), points carry their single
  * bin, and the join key is `keys :+ bin`. Each qualifying (point,
  * interval) pair meets in EXACTLY the point's bin, so no post-join
  * dedup is ever needed — the residual `BETWEEN` filter only rejects
  * same-bin near-misses.
  *
  * Scale levers: replication factor per interval is
  * ceil(len/binSize)+1, guarded by `maxBins` (fails loudly instead of
  * silently exploding a year-long interval into 8760 rows — pick
  * binSize near the TYPICAL interval length so the factor stays
  * O(1..2)). Bins also spread a hot time range across partitions in
  * the keyless case. Small interval sides still broadcast: the
  * explode multiplies rows BEFORE the broadcast-size estimate, so
  * AQE/statistics decide on the replicated size, which is the honest
  * size. Both ends inclusive.
  */
object RangeJoin {

  def rangeJoin(points: DataFrame, intervals: DataFrame, pointTs: String,
                startTs: String, endTs: String, keys: Seq[String] = Nil,
                binSize: Long = 3600, maxBins: Int = 1024): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    val bin = "__graft_range_bin"
    require(!(points.columns ++ intervals.columns).contains(bin),
      s"inputs may not carry $bin")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet) -- keys.toSet
    require(shared.isEmpty,
      s"non-key columns shared by both sides would collide in the output: ${shared.mkString(", ")}")
    val lo = floor(col(startTs) / lit(binSize))
    val hi = floor(col(endTs) / lit(binSize))
    val ivBinned = intervals
      // null bounds can never match any point (`BETWEEN` over null is
      // null → false), so drop them EXPLICITLY. Without this the span
      // guard sees `hi - lo < maxBins` = NULL, falls into otherwise(),
      // and misdiagnoses a null-bounds row as a runaway interval —
      // whether that happens depends on constraint propagation pushing
      // inferred IsNotNull below the Generate, which is not semantics
      // to rely on.
      .filter(col(startTs).isNotNull && col(endTs).isNotNull)
      // the span guard lives in the VALUE path (when/otherwise
      // raise_error), not a side column — a side column would be
      // pruned away, and a silent cap would under-report matches; a
      // runaway interval must fail the job loudly
      .withColumn(bin, explode(
        when(hi - lo < lit(maxBins.toLong), sequence(lo, hi))
          .otherwise(raise_error(
            lit(s"interval spans ≥ $maxBins bins — raise binSize or maxBins")))))
    val ptBinned = points.withColumn(bin, floor(col(pointTs) / lit(binSize)))
    ptBinned.join(ivBinned, keys :+ bin)
      .filter(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .drop(bin)
  }

  /** Window attribution: EVERY view within the hour before each
    * purchase by the same user (as-of keeps only the last touch; ads
    * people want the full touch set). Via `rangeJoin` with
    * keys=user_id — an equi-join Spark could already hash, but the
    * bins additionally co-bucket the time axis, which is what keeps
    * the plan alive when the key is absent or hot. Inclusive ends:
    * a view at the purchase epoch itself counts (gap 0). */
  def attributionWindow(spark: SparkSession, dir: String): DataFrame =
    attributionWindowFrom(enriched(spark, dir).filter(col("ts").isNotNull))

  val WindowSeconds = 3600L

  def attributionWindowFrom(e: DataFrame): DataFrame = {
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("event_epoch").as("purchase_epoch"))
      .withColumn("win_start", col("purchase_epoch") - lit(WindowSeconds))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("event_epoch").as("view_epoch"))
    rangeJoin(views, purchases, pointTs = "view_epoch",
        startTs = "win_start", endTs = "purchase_epoch", keys = Seq("user_id"))
      .select(col("purchase_id"), col("user_id"), col("view_id"),
        col("view_epoch"), col("purchase_epoch"),
        (col("purchase_epoch") - col("view_epoch")).as("gap_seconds"))
      .orderBy("purchase_id", "view_epoch", "view_id")
  }

  /** Multi-touch attribution: every view/click touch within the hour
    * before each purchase, with LINEAR credit (value/n split evenly)
    * and U-SHAPED positional credit (40% first touch, 40% last, the
    * middle 20% split across interior touches; 50/50 at n=2, all at
    * n=1) — the two standard credit models downstream of the same
    * touch-set `attributionWindow` materializes.
    *
    * Plan shape: the binned range join pairs touches with purchases
    * (same bounded fan-out as attributionWindow), then ONE window
    * pass keyed (user_id, purchase_id) assigns positions and touch
    * counts — the only shuffle after the join, at touch-pair grain.
    * Credits are single IEEE ops on the double value in a pinned
    * order (no credit SUMS in the output — the per-touch grain is the
    * deliverable a warehouse aggregates later), so the oracle hashes
    * exactly. */
  def attributionMultitouch(spark: SparkSession, dir: String): DataFrame =
    attributionMultitouchFrom(enriched(spark, dir).filter(col("ts").isNotNull))

  def attributionMultitouchFrom(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("event_epoch").as("purchase_epoch"), col("value").as("purchase_value"))
      .withColumn("win_start", col("purchase_epoch") - lit(WindowSeconds))
    val touches = e.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("touch_type"), col("event_epoch").as("touch_epoch"))
    val w = Window.partitionBy("user_id", "purchase_id")
    val pos = row_number().over(w.orderBy(col("touch_epoch"), col("touch_id")))
    val n = count(lit(1)).over(w)
    val pairs = rangeJoin(touches, purchases, pointTs = "touch_epoch",
        startTs = "win_start", endTs = "purchase_epoch", keys = Seq("user_id"))
      .withColumn("touch_pos", pos)
      .withColumn("n_touches", n)
    val uWeight =
      when(col("n_touches") === 1, lit(1.0))
        .when(col("n_touches") === 2, lit(0.5))
        .when(col("touch_pos") === 1 || col("touch_pos") === col("n_touches"), lit(0.4))
        .otherwise(lit(0.2) / (col("n_touches").cast("double") - lit(2.0)))
    pairs
      .select(col("purchase_id"), col("user_id"), col("touch_id"), col("touch_type"),
        col("touch_pos"), col("n_touches"),
        (col("purchase_epoch") - col("touch_epoch")).as("gap_seconds"),
        (col("purchase_value") / col("n_touches").cast("double")).as("credit_linear"),
        (col("purchase_value") * uWeight).as("credit_position"))
      .orderBy("purchase_id", "touch_pos")
  }

  val attributionMultitouchSql: String =
    """WITH p AS (
      |  SELECT event_id AS purchase_id, user_id,
      |    CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS pep, value AS purchase_value
      |  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
      |), t AS (
      |  SELECT event_id AS touch_id, event_type AS touch_type, user_id AS tu,
      |    CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS tep
      |  FROM events WHERE event_type IN ('view', 'click') AND ts IS NOT NULL
      |), pairs AS (
      |  SELECT p.purchase_id, p.user_id, t.touch_id, t.touch_type,
      |    p.pep - t.tep AS gap_seconds, p.purchase_value,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY p.user_id, p.purchase_id
      |      ORDER BY t.tep, t.touch_id) AS INT) AS touch_pos,
      |    COUNT(*) OVER (PARTITION BY p.user_id, p.purchase_id) AS n_touches
      |  FROM p JOIN t ON p.user_id = t.tu AND t.tep BETWEEN p.pep - 3600 AND p.pep
      |)
      |SELECT purchase_id, user_id, touch_id, touch_type, touch_pos, n_touches,
      |  gap_seconds,
      |  purchase_value / CAST(n_touches AS DOUBLE) AS credit_linear,
      |  purchase_value * (CASE
      |    WHEN n_touches = 1 THEN 1.0
      |    WHEN n_touches = 2 THEN 0.5
      |    WHEN touch_pos = 1 OR touch_pos = n_touches THEN 0.4
      |    ELSE 0.2 / (CAST(n_touches AS DOUBLE) - 2.0) END) AS credit_position
      |FROM pairs ORDER BY purchase_id, touch_pos""".stripMargin

  val attributionWindowSql: String =
    """WITH p AS (
      |  SELECT event_id AS purchase_id, user_id,
      |    CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS pep
      |  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
      |), v AS (
      |  SELECT event_id AS view_id, user_id AS vu,
      |    CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS vep
      |  FROM events WHERE event_type = 'view' AND ts IS NOT NULL
      |)
      |SELECT p.purchase_id, p.user_id, v.view_id, v.vep AS view_epoch,
      |  p.pep AS purchase_epoch, p.pep - v.vep AS gap_seconds
      |FROM p JOIN v ON p.user_id = v.vu AND v.vep BETWEEN p.pep - 3600 AND p.pep
      |ORDER BY purchase_id, view_epoch, view_id""".stripMargin
}
