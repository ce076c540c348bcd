package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch ingest for the reference's event feed formats.
  *
  * The reference generates daily JSONL batches and COPYs them into
  * PostgreSQL (reference: scripts/generate_events.py +
  * dags/event_pipeline_dag.py load task). The Spark-native equivalents
  * read the same shapes straight into the `events` schema with an
  * EXPLICIT schema — never `inferSchema` (a schema inference pass
  * reads the data twice and can silently drift types between daily
  * batches, which at 100 TB is both a correctness and a cost bug).
  */
object EventSource {

  /** The canonical event schema (testdata layout; reference:
    * schemas/event_schema.json). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = true),
    StructField("props", StringType, nullable = true)))

  /** JSONL batch (the reference's native interchange format).
    * Corrupt lines land in `_corrupt_record` instead of failing the
    * batch (PERMISSIVE) — the quality suite (graft.operators.Quality)
    * is the explicit gate, mirroring the reference's
    * validate-then-branch DAG shape. */
  def jsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** CSV batch with the same schema (header optional). Same
    * corrupt-row contract as `jsonl`: a malformed line (wrong arity,
    * unparseable timestamp/number) lands whole in `_corrupt_record`
    * with the typed columns NULL, instead of failing the batch or
    * being silently dropped — the quality suite is the explicit
    * gate, and a quarantine route keeps the bad line's full text for
    * replay after the upstream fix. */
  def csv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", StringType))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(path)

  /** Parquet (the at-scale storage format; see graft.Tables for the
    * nanosecond-timestamp handling of the driver testdata). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
