package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2C relational / OLAP core
    "q1_pricing_summary"   -> ((s, d) => Relational.q1PricingSummary(s, d)),
    "q3_shipping_priority" -> ((s, d) => Relational.q3ShippingPriority(s, d)),
    "q5_local_supplier"    -> ((s, d) => Relational.q5LocalSupplier(s, d)),
    "q6_revenue_forecast"  -> ((s, d) => Relational.q6RevenueForecast(s, d)),
    "top_customers_window" -> ((s, d) => Relational.topCustomersWindow(s, d)),
    "order_lineitem_rollup" -> ((s, d) => Relational.orderLineitemRollup(s, d)),
    // §2A reference marts & batch aggregates
    "mart_user_daily"      -> ((s, d) => EventMarts.martUserDaily(s, d)),
    "mart_funnel_daily"    -> ((s, d) => EventMarts.martFunnelDaily(s, d)),
    "mart_product_daily"   -> ((s, d) => EventMarts.martProductDaily(s, d)),
    "mart_orders"          -> ((s, d) => EventMarts.martOrders(s, d)),
    "hourly_traffic"       -> ((s, d) => EventMarts.hourlyTraffic(s, d)),
    "product_top_n"        -> ((s, d) => EventMarts.productTopN(s, d)),
    "report_user_summary"  -> ((s, d) => EventMarts.reportUserSummary(s, d)),
    "report_payment_dist"  -> ((s, d) => EventMarts.reportPaymentDist(s, d)),
    "retention_daily"      -> ((s, d) => EventMarts.retentionDaily(s, d)),
    "session_sequences"    -> ((s, d) => Sessionize.sessionSequences(s, d)),
    "session_patterns"     -> ((s, d) => Sessionize.sessionPatterns(s, d)),
  )

  /** DuckDB-runnable oracle for each query (same parquet tables).
    * Column names/types match the Spark output exactly (SURVEY.md §5). */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary"   -> Relational.q1Sql,
    "q3_shipping_priority" -> Relational.q3Sql,
    "q5_local_supplier"    -> Relational.q5Sql,
    "q6_revenue_forecast"  -> Relational.q6Sql,
    "top_customers_window" -> Relational.topCustomersSql,
    "order_lineitem_rollup" -> Relational.orderLineitemRollupSql,
    "mart_user_daily"      -> EventMarts.martUserDailySql,
    "mart_funnel_daily"    -> EventMarts.martFunnelDailySql,
    "mart_product_daily"   -> EventMarts.martProductDailySql,
    "mart_orders"          -> EventMarts.martOrdersSql,
    "hourly_traffic"       -> EventMarts.hourlyTrafficSql,
    "product_top_n"        -> EventMarts.productTopNSql,
    "report_user_summary"  -> EventMarts.reportUserSummarySql,
    "report_payment_dist"  -> EventMarts.reportPaymentDistSql,
    "retention_daily"      -> EventMarts.retentionDailySql,
    "session_sequences"    -> Sessionize.sessionSequencesSql,
    "session_patterns"     -> Sessionize.sessionPatternsSql,
  )
}
