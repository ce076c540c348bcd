package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Live sequential A/B monitoring — the streaming leg of
  * `UserAnalytics.abSequential` (reference anchor: the daily readout in
  * llm_daily_report.py runs once a night; real experimentation
  * platforms peek continuously, and unguarded peeking inflates the
  * false-positive rate severalfold — the O'Brien–Fleming-shape
  * boundary is what makes live looks legitimate).
  *
  * Division of labor (the changepointFromTrafficLog pattern): the
  * STREAM maintains the cheap, exactly-what-the-statistic-needs log —
  * per-user FIRST TOUCHES (one 'enroll' row on a user's first-ever
  * event, one 'convert' row on the first-ever purchase), emitted by a
  * flatMapGroupsWithState whose state is two booleans per user; the
  * RESCORE reruns the SHARED `UserAnalytics.sequentialFromDaily` core
  * over the log, so the live look table and the nightly batch table
  * are structurally identical — same z, same boundary, same verdict,
  * refreshed per micro-batch instead of per night.
  *
  * Scale shape: state is O(users) × 2 booleans with no timeout
  * (first-touch is forever-semantics; at 10^9 users this is a few GB
  * of state store, far below the session operator's). The log is
  * user-FIRST-TOUCH grain — it grows with users, not events. The
  * rescore dedups the log at (user, kind) grain (min day), which
  * absorbs BOTH at-least-once sink replays and any duplicate emission,
  * then collapses to ≤ |days|·|arms| rows before the window math.
  *
  * Honest semantics note: enrolment day is the first day SEEN by the
  * stream. In-order ingest (the production tail or a date-ordered
  * backfill) reproduces the batch table exactly — pinned by spec;
  * heavily out-of-order history replayed in one batch still lands on
  * the min-epoch event because each micro-batch sorts per user. */
object AbSequentialStream {

  case class Touch(user_id: Long, arm: String, epoch: Long, purchase: Boolean)
  case class TouchState(enrolled: Boolean, converted: Boolean)
  case class TouchOut(user_id: Long, arm: String, day: java.sql.Date, kind: String)

  /** First-touch rows per user: 'enroll' once, 'convert' once. The arm
    * is the SHARED stateless assignment (`UserAnalytics.armCol`) —
    * stream and batch cannot disagree about membership. */
  def firstTouches(events: DataFrame, experiment: String = "exp1"): Dataset[TouchOut] = {
    import events.sparkSession.implicits._
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"),
        graft.operators.UserAnalytics.armCol(experiment).as("arm"),
        unix_timestamp(col("ts")).as("epoch"),
        (col("event_type") === "purchase").as("purchase"))
      .as[Touch]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, TouchOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[TouchState]) =>
          val sorted = rows.toSeq.sortBy(_.epoch)
          val st = state.getOption.getOrElse(TouchState(false, false))
          val out = scala.collection.mutable.ListBuffer.empty[TouchOut]
          var (enr, conv) = (st.enrolled, st.converted)
          sorted.foreach { t =>
            // UTC epoch-day, zone-proof both here and through Spark's
            // Date conversion (valueOf(LocalDate) round-trips exactly);
            // matches the batch query's to_date(ts) under the UTC
            // session timezone
            val day = java.sql.Date.valueOf(
              java.time.LocalDate.ofEpochDay(Math.floorDiv(t.epoch, 86400L)))
            if (!enr) { out += TouchOut(uid, t.arm, day, "enroll"); enr = true }
            if (!conv && t.purchase) {
              out += TouchOut(uid, t.arm, day, "convert"); conv = true
            }
          }
          if (enr != st.enrolled || conv != st.converted)
            state.update(TouchState(enr, conv))
          out.iterator
      }
  }

  /** Append the finalized first-touch rows to a parquet log —
    * at-least-once under micro-batch replay (the qualityLogSink
    * contract); the rescore's (user, kind) dedup makes reads
    * effectively-once. */
  def touchLogSink(touches: Dataset[TouchOut], logDir: String,
                   checkpoint: String): StreamingQuery =
    touches.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", logDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The live look table: rescore the first-touch log with the SAME
    * `sequentialFromDaily` core as the batch query. Dedup at
    * (user, kind) grain — min day wins — absorbs sink replays; arms
    * are a pure function of user_id, so any replica carries the same
    * arm. */
  def sequentialFromLog(spark: SparkSession, logDir: String): DataFrame =
    sequentialFromLogs(spark, Seq(logDir))

  /** The same rescore over a COMPACTED BASE plus live tail(s) — the
    * log-maintenance read path (see [[compactTouchLog]]): the
    * (user, kind) dedup runs across every segment, so a base that
    * already absorbed a user's enrolment and a tail that replays it
    * agree on min day. */
  def sequentialFromLogs(spark: SparkSession, dirs: Seq[String]): DataFrame = {
    val touches = dirs.map(spark.read.parquet(_)
        .select("user_id", "arm", "day", "kind"))
      .reduce(_ unionByName _)
      .groupBy(col("user_id"), col("kind"))
      .agg(min(col("day")).as("day"), max(col("arm")).as("arm"))
    val daily = touches
      .groupBy(col("day"), col("arm"))
      .agg(
        sum(when(col("kind") === "enroll", 1L).otherwise(0L)).as("e"),
        sum(when(col("kind") === "convert", 1L).otherwise(0L)).as("c"))
    graft.operators.UserAnalytics.sequentialFromDaily(daily)
  }

  /** Log MAINTENANCE — the rotate-and-absorb pattern
    * (`appendChunkIndex`'s discipline applied to the first-touch log):
    * the append log grows one file per micro-batch and re-accumulates
    * replay duplicates forever; this absorbs one or more rotated log
    * segments (plus any existing base) into ONE deduped
    * (user, kind)-grain base snapshot, written compact. Run it with
    * the producing sink STOPPED or after rotating it to a fresh
    * logDir + checkpoint — a file-sink segment must never be edited
    * under its own `_spark_metadata` manifest, which is why this
    * absorbs INTO a separate base rather than rewriting in place.
    * Returns (rows read, rows in the compacted base). */
  def compactTouchLog(spark: SparkSession, segments: Seq[String],
                      baseDir: String): (Long, Long) = {
    val existing = segments.filter(d => new java.io.File(d).exists()) ++
      Option.when(new java.io.File(baseDir).exists())(baseDir)
    require(existing.nonEmpty, "nothing to compact")
    val raw = existing.map(spark.read.parquet(_)
        .select("user_id", "arm", "day", "kind"))
      .reduce(_ unionByName _)
    val before = raw.count()
    // materialize the dedup BEFORE overwriting baseDir (it may be one
    // of the inputs — the localCheckpoint cuts the read-write cycle)
    val compacted = raw
      .groupBy(col("user_id"), col("kind"))
      .agg(min(col("day")).as("day"), max(col("arm")).as("arm"))
      .select(col("user_id"), col("arm"), col("day"), col("kind"))
      .localCheckpoint()
    val after = compacted.count()
    compacted.coalesce(1).write.mode("overwrite").parquet(baseDir)
    (before, after)
  }

  /** The fires-once verdict: the EARLIEST look whose |z| crossed its
    * boundary — per group-sequential discipline the experiment STOPS
    * at the first crossing, so later looks (which may also cross, or
    * regress back under the boundary) must not re-fire the alert.
    * Empty when no look crossed. */
  def firstCrossing(looks: DataFrame): DataFrame =
    looks.filter(col("crossed")).orderBy(col("day")).limit(1)
}
