package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Operational observability for the streaming family — the ops
  * dashboard the sinks themselves don't provide: every micro-batch's
  * progress event (rows/sec in and out, trigger duration, event-time
  * watermark, state rows) lands in a tiny parquet log, and a rescore
  * query rolls it to the per-query health table (throughput,
  * latency percentiles-of-batches, state growth, watermark advance) a
  * capacity planner or alert reads.
  *
  * Design: a `StreamingQueryListener` — the engine's own progress
  * feed, zero instrumentation inside any query plan — appends one row
  * per (query, batch) progress event. Events arrive on the driver's
  * listener bus asynchronously and batches are seconds apart, so the
  * per-event single-row append is negligible next to the micro-batch
  * itself; the log is (query_name)-partitioned so per-query reads
  * prune. At 1000 queries × 1 batch/sec this is 1000 tiny rows/sec on
  * the driver — if that ever binds, the listener buffers and flushes
  * per N events; the LOG SCHEMA is the contract, not the cadence.
  *
  * The rescore is deliberately batch (not a stream over the log):
  * lag/health dashboards refresh on human cadence, and a plain read
  * serves any window of it. */
object StreamObservability {

  final case class ProgressRow(
      query_name: String,
      run_id: String,
      batch_id: Long,
      ts: String,
      num_input_rows: Long,
      input_rows_per_sec: Double,
      processed_rows_per_sec: Double,
      trigger_ms: Long,
      watermark: String,
      state_rows: Long)

  /** The listener: one appended row per progress event. Failures to
    * write must never kill the listener bus (a full disk should not
    * stop the PIPELINE — the gap is visible in the log itself). */
  final class ProgressLogListener(spark: SparkSession, logDir: String)
      extends StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      try {
        val p = e.progress
        val name = Option(p.name).getOrElse(p.id.toString)
        def d(x: java.lang.Double) = Option(x).map(_.doubleValue)
          .filterNot(v => v.isNaN || v.isInfinite).getOrElse(0.0)
        val row = ProgressRow(
          name, p.runId.toString, p.batchId, p.timestamp,
          p.numInputRows, d(p.inputRowsPerSecond), d(p.processedRowsPerSecond),
          Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
          Option(p.eventTime.get("watermark")).getOrElse(""),
          p.stateOperators.map(_.numRowsTotal).sum)
        import spark.implicits._
        Seq(row).toDF()
          .write.mode("append").partitionBy("query_name").parquet(logDir)
      } catch {
        case ex: Throwable =>
          System.err.println(s"[progress-log] append failed: ${ex.getMessage}")
      }
  }

  /** Attach a progress log to the session; returns the listener so
    * the caller can detach it (tests) or hold it for the app's life
    * (production — one listener serves every query on the session). */
  def attach(spark: SparkSession, logDir: String): ProgressLogListener = {
    val l = new ProgressLogListener(spark, logDir)
    spark.streams.addListener(l)
    l
  }

  def detach(spark: SparkSession, l: ProgressLogListener): Unit =
    spark.streams.removeListener(l)

  /** Per-query health rollup over the progress log: batches seen,
    * total rows, mean/max trigger duration, throughput, latest state
    * size and watermark (max-by-batch — the log is append-only, so
    * the latest batch id carries the current values). */
  def progressFromLog(spark: SparkSession, logDir: String): DataFrame =
    spark.read.parquet(logDir)
      .groupBy(col("query_name"))
      .agg(
        count(lit(1)).as("batches"),
        sum(col("num_input_rows")).as("total_rows"),
        avg(col("trigger_ms")).as("mean_trigger_ms"),
        max(col("trigger_ms")).as("max_trigger_ms"),
        avg(col("processed_rows_per_sec")).as("mean_rows_per_sec"),
        max_by(col("state_rows"), col("batch_id")).as("state_rows_latest"),
        max_by(col("watermark"), col("batch_id")).as("watermark_latest"),
        max(col("batch_id")).as("last_batch_id"))
      .orderBy("query_name")
}
