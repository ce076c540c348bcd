package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Bucketed-table layout for the fact-fact join (SURVEY.md §4).
  *
  * orders⋈lineitem on the order key is the one join in the corpus
  * where neither side broadcasts at scale. Pre-bucketing BOTH tables
  * on that key (same bucket count, sorted within buckets) makes every
  * subsequent join between them shuffle-free: each task reads matching
  * bucket files from both sides and merge-joins in place. At 100 TB
  * this turns the nightly mart build's dominant exchange into pure
  * scan — the write-side cost is paid once, at ingest.
  */
object Bucketing {

  /** Write orders+lineitem as bucketed, sorted external tables rooted
    * at `path`. Table names get `suffix` so tests can isolate runs. */
  def writeBucketed(spark: SparkSession, dir: String, path: String,
                    buckets: Int = 16, suffix: String = ""): (String, String) = {
    val oName = s"orders_bucketed$suffix"
    val lName = s"lineitem_bucketed$suffix"
    Tables.orders(spark, dir)
      .write.mode("overwrite")
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$path/$oName").saveAsTable(oName)
    Tables.lineitem(spark, dir)
      .write.mode("overwrite")
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$path/$lName").saveAsTable(lName)
    (oName, lName)
  }

  /** The rollup mart over the bucketed layout — same result as
    * Relational.orderLineitemRollup, but the join consumes bucket
    * locality instead of shuffling. */
  def rollupFromBucketed(spark: SparkSession, oName: String, lName: String): DataFrame = {
    val o = spark.table(oName).select("o_orderkey", "o_orderstatus", "o_orderpriority")
    val l = spark.table(lName).select("l_orderkey", "l_extendedprice", "l_quantity")
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(
        count(lit(1)).as("line_count"),
        countDistinct(col("o_orderkey")).as("order_count"),
        sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("gross_revenue"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("total_qty"))
      .orderBy("o_orderstatus", "o_orderpriority")
  }
}
