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
}
