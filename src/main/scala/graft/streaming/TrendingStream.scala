package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Exponentially-decayed trending products — the recency-weighted
  * counterpart of `EventStream.productCounts`: where windowed counts
  * weight an hour-old view and a week-old view the same inside their
  * windows, the decayed score ages every view by exp(−λ·Δt) with a
  * configurable half-life, so "trending now" reads directly off the
  * state.
  *
  * State is O(1) per product — (score, last_epoch, total): folding a
  * new event multiplies the score by the elapsed decay and adds 1, so
  * NO event history is retained (the algebraic trick: Σ exp(−λ(T−tᵢ))
  * updates incrementally). Events fold in (epoch, event_id) order
  * within each batch, and the decay math is StrictMath (no JIT
  * intrinsic drift), so a replayed stream reproduces scores
  * bit-for-bit — the spec pins the stream fold against a driver-side
  * replication exactly, and against the closed-form batch recompute
  * (`decayedScoresBatchFrom`, one groupBy) within float-sum
  * tolerance.
  *
  * Out-of-order arrivals across micro-batches fold in ARRIVAL order
  * (a late event decays the score as if it were current — its true
  * age is unrecoverable without history, the standard online-decay
  * trade-off); the watermarked window family stays the exact-window
  * surface, this one is the cheap live dial. */
object TrendingStream {

  case class TEv(product_k: Int, event_id: Long, epoch: Long)

  case class TState(score: Double, lastEpoch: Long, total: Long)

  case class TrendOut(product_k: Int, score: Double, last_epoch: Long,
                      total_events: Long)

  /** Default half-life: one day. */
  val HalfLifeSeconds = 86400L

  private def lambda(halfLife: Long): Double =
    StrictMath.log(2.0) / halfLife.toDouble

  /** Typed view-event stream (trending is a view-side signal). */
  def asTrendEvents(raw: DataFrame): Dataset[TEv] = {
    import raw.sparkSession.implicits._
    raw
      .withColumn("product_k", get_json_object(col("props"), "$.k").cast("int"))
      .filter(col("event_type") === "view" && col("product_k").isNotNull &&
        col("ts").isNotNull && col("event_id").isNotNull)
      .select(col("product_k"), col("event_id"),
        unix_timestamp(col("ts")).as("epoch"))
      .as[TEv]
  }

  /** One decay-fold step — shared by the stream operator and the
    * spec's driver replication so the two can be compared exactly. */
  def fold(s: TState, e: TEv, halfLife: Long): TState = {
    val dt = math.max(e.epoch - s.lastEpoch, 0L)
    TState(s.score * StrictMath.exp(-lambda(halfLife) * dt.toDouble) + 1.0,
      math.max(e.epoch, s.lastEpoch), s.total + 1)
  }

  /** Per-product decayed scores, one updated row per product per
    * micro-batch (Update mode — state never expires; a product's
    * score only asymptotes to 0, and the state row is O(1)). */
  def trendScores(events: Dataset[TEv],
      halfLife: Long = HalfLifeSeconds): Dataset[TrendOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.product_k)
      .flatMapGroupsWithState[TState, TrendOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (k, evs, state: GroupState[TState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.epoch, e.event_id))
          if (sorted.isEmpty) Iterator.empty
          else {
            val init = state.getOption.getOrElse(
              TState(0.0, sorted.head.epoch, 0L))
            val out = sorted.foldLeft(init)((s, e) => fold(s, e, halfLife))
            state.update(out)
            Iterator.single(TrendOut(k, out.score, out.lastEpoch, out.total))
          }
      }
  }

  /** Append-log sink: batchId-keyed dynamic overwrite (replaying a
    * micro-batch rewrites its own partition — idempotent), same
    * contract as productLogSink. */
  def trendLogSink(scores: Dataset[TrendOut], logDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    scores.toDF().writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          graft.sources.MartSink.writePartitioned(
            batch.withColumn("batch_id", lit(batchId)), logDir, Seq("batch_id"))
        ()
      }
      .start()

  /** Trending top-N from the persisted score log: latest state row
    * per product (max (last_epoch, batch_id) — later batches win),
    * every score aged to the common `asOfEpoch` so products updated
    * at different times compare fairly. Tiny-log batch rollup. */
  def trendingTopNFromLog(spark: org.apache.spark.sql.SparkSession,
      logDir: String, asOfEpoch: Long, n: Int = 10,
      halfLife: Long = HalfLifeSeconds): DataFrame = {
    val lam = lambda(halfLife)
    val latest = spark.read.parquet(logDir)
      .groupBy(col("product_k"))
      .agg(max(struct(col("last_epoch"), col("batch_id"), col("score"),
        col("total_events"))).as("s"))
      .select(col("product_k"), col("s.score").as("score"),
        col("s.last_epoch").as("last_epoch"), col("s.total_events").as("total_events"))
    latest
      .withColumn("score_now",
        col("score") * exp(lit(-lam) *
          greatest(lit(asOfEpoch) - col("last_epoch"), lit(0L)).cast("double")))
      .orderBy(desc("score_now"), asc("product_k"))
      .limit(n)
      .select(col("product_k"), col("score_now"), col("score"),
        col("last_epoch"), col("total_events"))
  }

  /** Closed-form batch recompute: the decayed score at `asOfEpoch`
    * over a bounded event frame — Σ exp(−λ(T−t)) per product. The
    * parity oracle for the stream fold (same math, sum order differs
    * by float associativity only). */
  def decayedScoresBatchFrom(e: DataFrame, asOfEpoch: Long,
      halfLife: Long = HalfLifeSeconds): DataFrame = {
    val lam = lambda(halfLife)
    e.filter(col("event_type") === "view" && col("product_k").isNotNull &&
        col("ts").isNotNull)
      .select(col("product_k"), col("event_epoch"))
      .filter(col("event_epoch") <= asOfEpoch)
      .groupBy(col("product_k"))
      .agg(
        sum(exp(lit(-lam) * (lit(asOfEpoch) - col("event_epoch")).cast("double")))
          .as("score"),
        count(lit(1)).as("total_events"))
      .orderBy(desc("score"), asc("product_k"))
  }
}
