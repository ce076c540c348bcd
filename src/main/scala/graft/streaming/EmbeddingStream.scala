package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Similarity

/** Continuous ANN-index maintenance — the streaming flavor of the
  * IVF-PQ index build (SURVEY.md §2D `ann_ivfpq_topk`): codebooks and
  * coarse centroids are trained OFFLINE in batch
  * (`Similarity.pqCodebooks` / `kmeansCentroids`) and embedded as
  * literals; arriving vectors are deduped within the watermark and
  * turned into (cell, codes) index rows in stateless narrow
  * projections. The appended code table IS the index delta — float
  * vectors never accumulate in stream state, the existing index is
  * only ever appended to (the same never-reshuffle-the-corpus
  * contract as `dedup_incremental_minhash`'s persisted band index),
  * and re-training is an offline decision that swaps the literals.
  */
object EmbeddingStream {

  /** Feed schema: the embeddings-table layout plus an arrival/event
    * timestamp to watermark on. */
  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("ts", TimestampType),
    StructField("embedding", ArrayType(FloatType))))

  /** Encode a streaming (or batch) vector feed into IVF-PQ index
    * rows: watermark-bounded exact dedup on vec_id (a replayed vector
    * must not duplicate its index row), L2-normalize, assign the IVF
    * cell and the M PQ codes against the literal index metadata.
    * Everything after the dedup is stateless. */
  def encode(vecs: DataFrame,
             books: Seq[Seq[(Int, Array[Float])]],
             cents: Seq[(Int, Array[Float])],
             watermark: String = "1 hour"): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(vecs.sparkSession)
    val normalized = Similarity.withNormalized(
      vecs.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("vec_id"),
      "embedding", "nv")
    normalized.select(
      col("vec_id"), col("ts"),
      explode(Similarity.nearestCellsCol(col("nv"), cents, 1)).as("cell"),
      call_function("pq_encode", col("nv"),
        Similarity.flatBooksLit(books), lit(books.length)).as("codes"))
  }
}
