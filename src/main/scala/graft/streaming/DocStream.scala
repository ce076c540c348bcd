package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.TextAnalysis

/** Streaming corpus ingest — the continuous flavor of the batch
  * `clean_corpus` pass (SURVEY.md §2D) for a training-data pipeline
  * that receives documents as a feed rather than a snapshot: PII
  * scrub → quality + language gate → watermark-bounded exact dedup.
  *
  * Scale design: every gate is a narrow projection over the stream
  * (the same codegen'd columns the batch operators use — one shared
  * definition, no drift between batch and streaming cleaning); the
  * only stateful step is `dropDuplicatesWithinWatermark` on the
  * scrubbed content hash, whose state is bounded by the watermark
  * horizon instead of growing with the corpus (the unbounded
  * `dropDuplicates` would OOM a long-running ingest).
  */
object DocStream {

  /** Feed schema: the documents-table layout plus an arrival/event
    * timestamp to watermark on. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ts", TimestampType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("text", StringType)))

  /** File-source stream of JSONL documents. */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 8)
      .json(path)

  /** The cleaning transform over a streaming (or batch) documents
    * frame: scrub PII, gate on quality score and predicted language,
    * drop exact duplicates of the scrubbed content within the
    * watermark. Emits the surviving docs with their audit columns. */
  def cleanDocs(docs: DataFrame, watermark: String = "1 hour",
                minQuality: Double = 0.5,
                langs: Seq[String] = Seq("en", "es", "de", "fr")): DataFrame =
    docs.withWatermark("ts", watermark)
      .withColumn("clean_text", TextAnalysis.piiScrubText(col("text")))
      .withColumn("quality_score", TextAnalysis.qualityScoreCol)
      .withColumn("predicted_lang", TextAnalysis.predictedLangCol)
      .filter(col("quality_score") >= minQuality &&
        col("predicted_lang").isin(langs.map(lit(_)): _*))
      .withColumn("content_md5", md5(col("clean_text").cast("binary")))
      .dropDuplicatesWithinWatermark("content_md5")
      .select(col("doc_id"), col("ts"), col("lang"), col("predicted_lang"),
        col("quality_score"), col("clean_text"))
}
