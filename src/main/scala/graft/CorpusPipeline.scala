package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.operators.{Dedup, TextAnalysis}
import graft.sources.MartSink

/** The corpus-preparation DAG as one composable batch driver — the
  * documents-side sibling of `Pipeline` (which drives the reference's
  * event DAG): PII scrub + quality/language gate + exact dedup in ONE
  * scan and one shuffle, MinHash-LSH near-dup collapse over the
  * survivors, deterministic split assignment, and a split-partitioned
  * idempotent write.
  *
  * Scale design mirrors `Pipeline`: the cleaned survivor frame is
  * persisted once and feeds the near-dup banding, the component
  * collapse, and the final write (each would otherwise re-run the
  * scan+scrub subtree — measured on `dedup_substring` that identical
  * subtrees are NOT deduped by exchange reuse); the near-dup stage
  * sees only cleaned survivors (never the raw corpus); the write uses
  * dynamic partition overwrite so a rerun replaces its own partitions
  * byte-for-byte and nothing else. The only driver-side values are
  * the three census counts of the returned `Result`.
  */
object CorpusPipeline {

  final case class Result(
      inputDocs: Long,
      cleaned: Long,
      kept: Long,
      outPath: String)

  /** @param maxRounds cap on near-dup label-propagation rounds.
    * @param requireConvergence true by default HERE (unlike the ad-hoc
    *   query surface): this pipeline persists a production artifact,
    *   so a component deeper than the round cap must fail the run
    *   loudly rather than silently write a partially-collapsed
    *   corpus. */
  def run(spark: SparkSession, inDir: String, outDir: String,
          minQuality: Double = 0.5,
          langs: Seq[String] = Seq("en", "es", "de", "fr"),
          estThreshold: Double = 0.4,
          maxRounds: Int = 20,
          requireConvergence: Boolean = true): Result = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, inDir)
    // Scrub + gates ride the scan projection. Gates come BEFORE the
    // exact-dedup keeper window, and the window sees only gate-passing
    // rows: the window key is the SCRUBBED content (so
    // redaction-identical docs collapse) while the gates score the raw
    // text — windowing first would let a gate-failing min-id copy
    // knock out its whole content group even when a passing copy
    // exists. The keeper window on the survivors is the only shuffle.
    val w = Window.partitionBy(md5(col("clean_text").cast("binary")))
    val cleanedDf = docs
      .select(col("doc_id"), col("lang"), col("n_chars"),
        TextAnalysis.piiScrubText(col("text")).as("clean_text"),
        TextAnalysis.qualityScoreCol.as("quality_score"),
        TextAnalysis.predictedLangCol.as("predicted_lang"))
      .filter(col("quality_score") >= minQuality &&
        col("predicted_lang").isin(langs.map(lit(_)): _*))
      .withColumn("keeper", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("keeper"))
      .select(col("doc_id"), col("lang"), col("predicted_lang"),
        col("quality_score"), col("n_chars"), col("clean_text"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // parquet count() prunes to zero columns (footer metadata +
      // row-group counts) — the input census never re-reads the text
      val inputDocs = docs.count()
      val cleaned = cleanedDf.count()
      val pairs = Dedup.minhashLshFrom(spark,
          cleanedDf.select(col("doc_id"), col("clean_text").as("text")),
          estThreshold, Dedup.DefaultMaxBucket)
        .select(col("doc_a"), col("doc_b"))
      val kept = Dedup.nearDupCorpusFromPairs(cleanedDf, pairs,
          maxRounds, requireConvergence)
        .withColumn("split", TextAnalysis.splitCol(col("doc_id")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        // count the frame this run produced — re-reading outDir would
        // also count stale partitions dynamic overwrite didn't touch
        val keptCount = kept.count()
        MartSink.writePartitioned(kept, outDir, Seq("split"))
        Result(inputDocs, cleaned, keptCount, outDir)
      } finally {
        kept.unpersist()
        ()
      }
    } finally {
      cleanedDf.unpersist()
      ()
    }
  }
}
