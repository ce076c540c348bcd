package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-run dataset VERSIONING over the stamped artifact families —
  * the provenance question the per-artifact manifests answer only one
  * run at a time: WHICH corpus fingerprint fed which epoch plan, what
  * changed between pipeline runs, and when did an artifact silently
  * stop being re-stamped. (r13 VERDICT "next round" #7: composes
  * [[ArtifactManifest]] with the drift-log machinery; no reference
  * file corresponds — spec-pinned §2F component, not an oracle row.)
  *
  * Shape: a run SNAPSHOTS the manifests of its registered artifacts
  * (one tiny driver-side read per artifact — the stamps are one-row
  * JSON sidecars), appends them to a run log under the standard
  * `run_id` partition contract (idempotent per run, grows with
  * runs × artifacts, never data size), and the trend reader labels
  * each (artifact, run) against the artifact's previous appearance:
  *
  *   - `added`            first appearance in the log
  *   - `unchanged`        same content fingerprint, same lineage
  *   - `content_changed`  new content from the same declared inputs —
  *                        the "the corpus moved under the artifact"
  *                        signal (a retrain on fresh data, or drift)
  *   - `lineage_changed`  same content, different declared inputs —
  *                        rare and worth eyes (a relabeled build that
  *                        happened to reproduce the bytes)
  *   - `rebuilt`          both moved — a deliberate retrain
  *   - `unstamped`        the directory exists but lost its manifest
  *                        (surfaces as a finding, never a blank row)
  *
  * run_id CONTRACT: same as every run log — ids must sort
  * chronologically as strings, ENFORCED by
  * [[graft.operators.RunLog.requireChronological]]. */
object VersionLog {

  /** One row per registered (logical name, artifact dir): the
    * manifest stamp as data. Unstamped dirs surface with
    * stamped = false rather than vanishing. */
  def manifestSnapshot(spark: SparkSession,
      artifacts: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    artifacts.map { case (name, dir) =>
      ArtifactManifest.read(dir) match {
        case Some(s) => (name, dir, s.artifact, s.contentFp, s.builtFrom, true)
        case None => (name, dir, null.asInstanceOf[String],
          null.asInstanceOf[String], null.asInstanceOf[String], false)
      }
    }.toDF("artifact_name", "path", "artifact_type", "content_fp",
      "built_from", "stamped")
  }

  /** Append one run's snapshot under its `run_id` partition —
    * idempotent per run via the dynamic-overwrite mart writer. */
  def versionLogAppend(snapshot: DataFrame, logDir: String,
      runId: String): Unit =
    MartSink.writePartitioned(
      snapshot.withColumn("run_id", lit(runId)), logDir, Seq("run_id"))

  /** [[manifestSnapshot]] + [[versionLogAppend]] in one call. */
  def snapshotAndAppend(spark: SparkSession,
      artifacts: Seq[(String, String)], logDir: String,
      runId: String): Unit =
    versionLogAppend(manifestSnapshot(spark, artifacts), logDir, runId)

  /** Per (artifact, run): the change label vs the artifact's PREVIOUS
    * appearance in the log (the lag skips runs the artifact missed —
    * `prev_run` says which run it compared against). Tiny frame:
    * runs × artifacts. */
  def versionTrendFromLog(spark: SparkSession, logDir: String): DataFrame = {
    val log = spark.read.parquet(logDir)
    graft.operators.RunLog.requireChronological(log)
    val w = Window.partitionBy("artifact_name").orderBy("run_id")
    val fp = coalesce(col("content_fp"), lit(""))
    val bf = coalesce(col("built_from"), lit(""))
    val prevFp = coalesce(col("prev_fp"), lit(""))
    val prevBf = coalesce(col("prev_built_from"), lit(""))
    log.select(col("run_id").cast("string").as("run_id"),
        col("artifact_name"), col("artifact_type"), col("content_fp"),
        col("built_from"), col("stamped"))
      .withColumn("prev_fp", lag(col("content_fp"), 1).over(w))
      .withColumn("prev_built_from", lag(col("built_from"), 1).over(w))
      .withColumn("prev_run", lag(col("run_id"), 1).over(w))
      .withColumn("change",
        when(!col("stamped"), lit("unstamped"))
          .when(col("prev_run").isNull, lit("added"))
          .when(fp === prevFp && bf === prevBf, lit("unchanged"))
          .when(fp =!= prevFp && bf === prevBf, lit("content_changed"))
          .when(fp === prevFp, lit("lineage_changed"))
          .otherwise(lit("rebuilt")))
      .drop("prev_fp", "prev_built_from")
      .orderBy("run_id", "artifact_name")
  }

  /** The latest run's diff: every artifact's change label for
    * max(run_id), PLUS a `removed` row for each artifact the log has
    * seen before but the latest run did not snapshot (the lag-based
    * trend cannot see absence — this closes that hole). Empty log →
    * empty frame. */
  def versionDiffLatest(spark: SparkSession, logDir: String): DataFrame = {
    val trend = versionTrendFromLog(spark, logDir)
    val latestRow = trend.agg(max(col("run_id"))).collect().head
    if (latestRow.isNullAt(0)) return trend
      .select(col("artifact_name"), col("change"), col("run_id").as("vs_run"))
    val latest = latestRow.getString(0)
    val current = trend.filter(col("run_id") === latest)
      .select(col("artifact_name"), col("change"),
        coalesce(col("prev_run"), lit("")).as("vs_run"))
    val removed = trend.groupBy(col("artifact_name"))
      .agg(max(col("run_id")).as("last_seen"))
      .filter(col("last_seen") < lit(latest))
      .select(col("artifact_name"), lit("removed").as("change"),
        col("last_seen").as("vs_run"))
    current.unionByName(removed).orderBy("artifact_name")
  }
}
