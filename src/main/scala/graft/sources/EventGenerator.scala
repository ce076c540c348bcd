package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed synthetic event generator (reference:
  * scripts/generate_events.py — the pipeline's front end, which
  * produces the daily JSONL batch the rest of the system consumes).
  *
  * Spark-native shape: `spark.range(n)` gives a partitioned seed
  * column; every field derives from a seeded hash of the row id, so
  * generation is embarrassingly parallel, reproducible across retries
  * (no RNG state), and scales to any row count by changing `n` —
  * generating a 100 TB test corpus is the same plan with more
  * partitions. Weighted event-type choice mirrors the reference's
  * funnel-heavy distribution.
  */
object EventGenerator {

  private val EventTypes = Seq( // cumulative weights out of 100
    ("view", 45), ("click", 75), ("purchase", 85), ("signup", 92), ("error", 100))

  /** Generate `n` events spanning `days` days from `startDate`. */
  def events(spark: SparkSession, n: Long, days: Int = 30,
             startDate: String = "2024-01-01", users: Long = 1000,
             seed: Long = 42): DataFrame = {
    def h(salt: String) = pmod(xxhash64(col("id"), lit(seed), lit(salt)), lit(1000000007L))
    val pct = h("type") % 100
    val eventType = EventTypes.foldRight(lit(EventTypes.last._1): org.apache.spark.sql.Column) {
      case ((name, cum), els) => when(pct < cum, lit(name)).otherwise(els)
    }
    val secondsSpan = days.toLong * 24 * 3600
    spark.range(n)
      .withColumn("event_id", col("id"))
      .withColumn("ts",
        (unix_timestamp(lit(startDate), "yyyy-MM-dd") + h("ts") % secondsSpan)
          .cast("timestamp"))
      .withColumn("user_id", h("user") % users)
      .withColumn("event_type", eventType)
      .withColumn("value",
        when(col("event_type") === "purchase", (h("amt") % 49000 + 1000).cast("double") / 100)
          .otherwise(lit(1.0)))
      .withColumn("props",
        when(col("event_type").isin("view", "click", "purchase"),
          concat(lit("""{"k": """), (h("prod") % 100).cast("string"), lit("}")))
          .otherwise(lit("{}")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Write a generated batch as JSONL (the reference's interchange
    * format) — one file per partition, ready for EventSource.jsonl. */
  def writeJsonl(spark: SparkSession, path: String, n: Long, partitions: Int = 8): Unit =
    events(spark, n).repartition(partitions).write.mode("overwrite").json(path)

  /** Deterministic dirty-data injection over a generated batch — the
    * test harness for the quality suite (the reference validates
    * production feeds; to prove the checks CATCH defects we need a
    * corpus with known defect rates). Each defect class is keyed by an
    * independent seeded hash with a per-mille rate, so the expected
    * failure counts are exact functions of (n, rate) and a spec can
    * assert the quality checks recover them. Narrow maps only.
    *
    * Injected classes (mirroring the 7-check taxonomy):
    *   nulls    — user_id nulled (null_check)
    *   dups     — event_id collapsed to id 0 (duplicate_check)
    *   badValue — value set to -5 (range_check + integrity for purchases)
    *   badTs    — year shifted to 2035 (timestamp_check) */
  def withAnomalies(events: DataFrame, nullPerMille: Int = 10, dupPerMille: Int = 10,
                    badValuePerMille: Int = 10, badTsPerMille: Int = 10,
                    seed: Long = 43): DataFrame = {
    def h(salt: String) = // all classes key off the ORIGINAL event_id
      pmod(xxhash64(col("event_id"), lit(seed), lit(salt)), lit(1000L))
    // one projection so every condition sees the pre-mutation columns
    events.select(
      when(h("dup") < dupPerMille, lit(0L)).otherwise(col("event_id")).as("event_id"),
      when(h("ts") < badTsPerMille, col("ts") + expr("INTERVAL 11 YEARS"))
        .otherwise(col("ts")).as("ts"),
      when(h("null") < nullPerMille, lit(null)).otherwise(col("user_id")).as("user_id"),
      col("event_type"),
      when(h("bad") < badValuePerMille, lit(-5.0)).otherwise(col("value")).as("value"),
      col("props"))
  }

  /** Session-structured generation (reference:
    * generate_events.py `_simulate_user_session` :231-307 — the
    * reference's events arrive as per-user session journeys, not
    * i.i.d. rows). One row per (user, session) seeds a funnel-ordered
    * event burst: 2-7 events spaced 4-7 minutes apart, so every
    * generated session is internally gap-free while consecutive
    * sessions of a user sit ≥ 2h apart — Sessionize recovers EXACTLY
    * the generated sessions (round-trip asserted in spec).
    *
    * Spark-native shape: range → narrow derivations → one explode; no
    * shuffle, no RNG state, reproducible at any scale. */
  def sessionEvents(spark: SparkSession, users: Long, sessionsPerUser: Int = 3,
                    startDate: String = "2024-01-01", seed: Long = 42): DataFrame = {
    def h(salt: String) = pmod(xxhash64(col("id"), lit(seed), lit(salt)), lit(1000000007L))
    def he(salt: String) = // per-event hash
      pmod(xxhash64(col("id"), col("eidx"), lit(seed), lit(salt)), lit(1000000007L))
    val base = unix_timestamp(lit(startDate), "yyyy-MM-dd")
    spark.range(users.toLong * sessionsPerUser)
      .withColumn("user_id", col("id") % users)
      .withColumn("session_slot", (col("id") / lit(users)).cast("long"))
      // slots every 2h + <30min jitter; max session span < 45min, so
      // inter-session gaps always exceed the 30-min sessionize gap
      .withColumn("session_start",
        base + col("session_slot") * 7200L + h("jitter") % 1800L)
      .withColumn("n_events", (h("len") % 6 + 2).cast("int"))
      .select(col("id"), col("user_id"), col("session_start"), col("n_events"),
        explode(sequence(lit(0), col("n_events") - 1)).as("eidx"))
      // 240s stride + <200s jitter: strictly monotone within a session
      .withColumn("ts",
        (col("session_start") + col("eidx") * 240L + he("off") % 200L).cast("timestamp"))
      .withColumn("event_type",
        // funnel journey: open with a view, browse, maybe convert last
        when(col("eidx") === 0, "view")
          .when(col("eidx") === col("n_events") - 1 && he("buy") % 100 < 40, "purchase")
          .when(he("act") % 100 < 55, "view")
          .when(he("act") % 100 < 90, "click")
          .otherwise("signup"))
      .withColumn("event_id", col("id") * 16 + col("eidx"))
      .withColumn("value",
        when(col("event_type") === "purchase", (he("amt") % 49000 + 1000).cast("double") / 100)
          .otherwise(lit(1.0)))
      .withColumn("props",
        when(col("event_type").isin("view", "click", "purchase"),
          concat(lit("""{"k": """), (he("prod") % 100).cast("string"), lit("}")))
          .otherwise(lit("{}")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
}
