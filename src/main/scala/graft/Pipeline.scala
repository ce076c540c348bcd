package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{EventMarts, Quality, Sessionize}
import graft.sources.MartSink

/** The reference DAG re-expressed as a composable batch driver
  * (reference: dags/event_pipeline_dag.py — generate → validate →
  * branch(PASS/FAIL) → load → 4 marts in parallel → report).
  *
  * Orchestration differences are deliberate and Spark-native:
  *   - "parallel mart tasks" are one Spark scheduler's jobs over a
  *     shared scan; an external orchestrator (Airflow et al.) would
  *     submit this main per day.
  *   - the PASS/FAIL branch is a driver-side decision over the tiny
  *     7-row quality summary — the only collect() in the library, by
  *     design (it IS the branch condition).
  *   - idempotency: marts are written with dynamic partition
  *     overwrite (MartSink), the Spark analogue of the reference's
  *     DELETE+INSERT per date.
  */
object Pipeline {

  final case class Result(
      passed: Boolean,
      failedChecks: Seq[String],
      martsWritten: Seq[String])

  /** All marts built by the daily run, keyed by output name. */
  def marts(spark: SparkSession, sfDir: String): Map[String, DataFrame] = Map(
    "mart_user_daily"    -> EventMarts.martUserDaily(spark, sfDir),
    "mart_funnel_daily"  -> EventMarts.martFunnelDaily(spark, sfDir),
    "mart_product_daily" -> EventMarts.martProductDaily(spark, sfDir),
    "mart_orders"        -> EventMarts.martOrders(spark, sfDir),
    "session_sequences"  -> Sessionize.sessionSequences(spark, sfDir),
    "hourly_traffic"     -> EventMarts.hourlyTraffic(spark, sfDir))

  /** Marts partitioned by event_date on disk (the backfill grain). */
  private val partitioned = Map(
    "mart_user_daily"    -> Seq("event_date"),
    "mart_funnel_daily"  -> Seq("event_date"),
    "mart_product_daily" -> Seq("event_date"),
    "mart_orders"        -> Seq("order_date"),
    "hourly_traffic"     -> Seq("event_date"))

  /** validate → gate → build. Returns what was written and why (or
    * why not). `failFast = false` mirrors the reference's WARN path
    * (build marts anyway, surface failures in the result). */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          failFast: Boolean = true): Result = {
    val summary = Quality.summary(spark, sfDir).collect()
    val failed = summary.filter(_.getAs[String]("status") == "FAIL")
      .map(_.getAs[String]("check_name")).toSeq
    if (failed.nonEmpty && failFast) Result(passed = false, failed, Nil)
    else {
      val written = marts(spark, sfDir).map { case (name, df) =>
        partitioned.get(name) match {
          case Some(cols) => MartSink.writePartitioned(df, s"$outDir/$name", cols)
          case None       => MartSink.writeSnapshot(df, s"$outDir/$name")
        }
        name
      }.toSeq
      Result(passed = failed.isEmpty, failed, written)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_marts"
    val spark = GraftSession.get()
    val r = run(spark, sfDir, outDir)
    println(s"passed=${r.passed} failedChecks=${r.failedChecks.mkString(",")} " +
      s"martsWritten=${r.martsWritten.sorted.mkString(",")}")
    spark.stop()
  }
}
