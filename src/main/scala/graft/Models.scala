package graft

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed row models for the corpus tables — `Dataset[T]` accessors for
  * callers that want compile-time column safety (streaming state ops,
  * user-defined per-partition logic). The untyped `Tables` loaders stay
  * the default for relational plans, where Catalyst's column pruning
  * over `DataFrame` projections is all the safety that matters.
  */
object Models {
  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  final case class Document(
      doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

  final case class Embedding(
      vec_id: Long, embedding: Array[Float], label: Long)
}

/** Typed variants of the Tables loaders. */
object TypedTables {
  import Models._

  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    Tables.events(spark, dir).as[Event]
  }

  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.documents(spark, dir).as[Document]
  }

  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables.embeddings(spark, dir).as[Embedding]
  }
}
