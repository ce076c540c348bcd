package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Defaults are chosen for the 100 TB design point:
  *   - AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  *     broadcast-join demotion/promotion at runtime).
  *   - Explicit shuffle partitions from the caller (32 on local[32];
  *     on a real cluster this would be ~2-3x total executor cores).
  *   - UTC session time zone so date bucketing is deterministic and
  *     matches the DuckDB oracle.
  */
object GraftSession {
  // WindowExec's "No Partition Defined" WARN is silenced via the
  // shipped log4j2.properties (scoped to that one logger): every
  // partition-less window in a registered plan is an AUDITED bounded
  // post-aggregation frame, and PlanAuditSpec.IntendedGlobalWindow is
  // the lint that keeps the silence honest — a new unaudited global
  // window fails the suite instead of scrolling past in a muted log.
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder = {
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      // relied-upon at the 100 TB design point (made explicit): when a
      // fact-fact join can't broadcast, the optimizer injects a bloom
      // semi-filter from the selective side onto the probe-side scan —
      // the spec pins that it arms once the size thresholds are in the
      // no-broadcast regime (at test scale it correctly stays off)
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // Spark 4.1's ChecksumCheckpointFileManager writes state-store
      // checkpoint checksums on a side thread pool; in single-JVM test
      // runs this can deadlock against executor class loading
      // (observed: state commit parked in awaitResult while the pool
      // thread loads classes). Plain checkpoint files are sufficient
      // here; a real cluster can re-enable.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")
  }

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
