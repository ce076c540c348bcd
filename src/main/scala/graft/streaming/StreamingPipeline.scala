package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The continuous flavor of graft.Pipeline: one deduped event stream
  * feeds the windowed funnel/traffic marts and the quality check log,
  * each with its own checkpointed sink.
  *
  * Reference parity: the Airflow DAG re-runs the batch pipeline per
  * execution date (dags/event_pipeline_dag.py); this is the same mart
  * surface maintained incrementally — watermarked windows instead of
  * date batches, dropDuplicatesWithinWatermark instead of the loader's
  * ON CONFLICT DO NOTHING, and the check log written per finalized
  * window instead of per run.
  *
  * Every sink is an idempotent batchId-keyed dynamic overwrite
  * (foreachBatch is at-least-once; a replayed batch rewrites exactly
  * its own partitions), so crash/restart never duplicates mart rows.
  */
object StreamingPipeline {

  /** Flatten a windowed aggregate and write it as an idempotent
    * parquet mart partitioned by (event_date, batch_id). */
  private def windowedMartSink(df: DataFrame, path: String,
                               checkpointDir: String): StreamingQuery =
    df.writeStream
      .outputMode("append") // watermark-finalized windows only
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val rows = batch
            .withColumn("window_start", col("window.start"))
            .withColumn("window_end", col("window.end"))
            .drop("window")
            .withColumn("event_date", to_date(col("window_start")))
            .withColumn("batch_id", lit(batchId))
          graft.sources.MartSink.writePartitioned(rows, path, Seq("event_date", "batch_id"))
        }
        ()
      }
      .start()

  /** Start the continuous pipeline over a JSONL ingest directory.
    * Returns the running queries (funnel mart, traffic mart, quality
    * log) — callers own their lifecycle (`processAllAvailable` in
    * tests, `awaitTermination` in production). */
  def start(spark: SparkSession, inDir: String, outDir: String,
            watermark: String = "2 hours"): Seq[StreamingQuery] = {
    // the watermark is defined ONCE, upstream of the dedup (a query
    // may not redefine it past a stateful operator) — the downstream
    // marts consume the already-watermarked deduped stream
    val events = EventStream.dedupEvents(EventStream.readJsonl(spark, inDir), watermark)
    Seq(
      windowedMartSink(EventStream.funnelCountsOn(events),
        s"$outDir/funnel_hourly", s"$outDir/_checkpoints/funnel"),
      windowedMartSink(EventStream.hourlyTrafficOn(events),
        s"$outDir/hourly_traffic", s"$outDir/_checkpoints/traffic"),
      EventStream.qualityLogSink(EventStream.qualityCountsOn(events),
        s"$outDir/quality_check_log", s"$outDir/_checkpoints/quality"))
  }

  /** Standalone runner: `runMain graft.streaming.StreamingPipeline
    * <jsonlInDir> <outDir>` — starts the three sinks and blocks. */
  def main(args: Array[String]): Unit = {
    val inDir = if (args.nonEmpty) args(0) else "/tmp/graft_stream_in"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_stream_out"
    val spark = graft.GraftSession.get()
    val queries = start(spark, inDir, outDir)
    println(s"streaming pipeline up: ${queries.map(_.name).mkString(", ")} -> $outDir")
    queries.foreach(_.awaitTermination())
  }
}
