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

  def run(spark: SparkSession, inDir: String, outDir: String,
          minQuality: Double = 0.5,
          langs: Seq[String] = Seq("en", "es", "de", "fr"),
          estThreshold: Double = 0.4): Result = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, inDir)
    // scrub + gates ride the scan projection; the exact-dedup keeper
    // window on the SCRUBBED content hash is the only shuffle (the
    // same composition as clean_corpus, keeping the text for the
    // near-dup stage; scrub first so redaction-identical docs dedup)
    val w = Window.partitionBy(md5(col("clean_text").cast("binary")))
    val cleanedDf = docs
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"),
        TextAnalysis.piiScrubText(col("text")).as("clean_text"),
        TextAnalysis.qualityScoreCol.as("quality_score"),
        TextAnalysis.predictedLangCol.as("predicted_lang"))
      .withColumn("keeper", min(col("doc_id")).over(w))
      .filter(col("quality_score") >= minQuality &&
        col("predicted_lang").isin(langs.map(lit(_)): _*) &&
        col("doc_id") === col("keeper"))
      .select(col("doc_id"), col("lang"), col("predicted_lang"),
        col("quality_score"), col("n_chars"), col("clean_text"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val inputDocs = docs.count()
      val cleaned = cleanedDf.count()
      val pairs = Dedup.minhashLshFrom(spark,
          cleanedDf.select(col("doc_id"), col("clean_text").as("text")),
          estThreshold)
        .select(col("doc_a"), col("doc_b"))
      val kept = Dedup.nearDupCorpusFromPairs(cleanedDf, pairs)
        .withColumn("split", TextAnalysis.splitCol(col("doc_id")))
      MartSink.writePartitioned(kept, outDir, Seq("split"))
      Result(inputDocs, cleaned, spark.read.parquet(outDir).count(), outDir)
    } finally {
      cleanedDf.unpersist()
      ()
    }
  }
}
