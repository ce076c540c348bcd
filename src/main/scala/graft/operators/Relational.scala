package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational/OLAP core — the headline scan/join/agg shapes the
  * reference's mart layer exercises (SQL over raw_events / marts,
  * cf. /root/reference/sql/marts/mart_user_daily.sql and siblings),
  * expressed on the TPC-H-ish testdata tables.
  *
  * Determinism contract with the DuckDB oracle: money aggregates are
  * summed as DECIMAL (exact, order-independent) and cast back to DOUBLE,
  * so Spark and DuckDB produce bit-identical doubles regardless of
  * partial-aggregation order. Rates/averages are single IEEE divisions
  * of exact operands.
  *
  * Scale notes: all aggregates are single-shuffle groupBys with map-side
  * partial aggregation; dimension joins (region/nation/supplier/customer)
  * are explicitly broadcast; fact tables are projected to the needed
  * columns before any join so the parquet scan prunes (ReadSchema).
  */
object Relational {

  /** Exact decimal sum of a 2-dp double column, returned as double. */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(12,2)")).cast("double")

  /** TPC-H Q1-style pricing summary: full lineitem scan + 8 aggregates.
    * Reference shape: mart_user_daily.sql's grouped multi-aggregate. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val disc  = col("l_extendedprice").cast("decimal(12,2)") *
                (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
    val charge = disc * (lit(1).cast("decimal(12,2)") + col("l_tax").cast("decimal(12,2)"))
    l.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(disc).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        (sum(col("l_quantity").cast("decimal(12,2)")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double") / count(lit(1))).as("avg_price"),
        (sum(col("l_discount").cast("decimal(12,2)")).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q6-style selective revenue scan — predicate pushdown showcase. */
  def q6RevenueForecast(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.filter(
        col("l_shipdate") >= lit("1995-01-01") && col("l_shipdate") < lit("1996-01-01") &&
        col("l_discount").between(0.02, 0.09) && col("l_quantity") < 25)
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)") * col("l_discount").cast("decimal(12,2)"))
             .cast("double").as("revenue"),
           count(lit(1)).as("n_items"))
  }

  val q6Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.02 AND 0.09 AND l_quantity < 25""".stripMargin

  /** TPC-H Q3-style shipping priority: filtered 3-way join + agg + top-N.
    * customer is broadcast (small dim); orders⋈lineitem shuffles on the
    * order key only after projection. Deterministic top-10 via unique
    * orderkey tiebreak. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < lit("1995-06-15"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > lit("1995-06-15"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
              (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)")))
             .cast("double").as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1995-06-15 00:00:00' AND l_shipdate > TIMESTAMP '1995-06-15 00:00:00'
      |GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
      |ORDER BY revenue DESC, l_orderkey ASC
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-style local-supplier volume: 6-way join, dims broadcast. */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA").select("r_regionkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name", "n_regionkey")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
              (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)")))
             .cast("double").as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  val q5Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name ASC""".stripMargin

  /** Window-function showcase: top-3 customers per nation by account
    * balance (rank with unique custkey tiebreak → deterministic). */
  def topCustomersWindow(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = Tables.customer(spark, dir).select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val w = Window.partitionBy("n_name").orderBy(desc("c_acctbal"), asc("c_custkey"))
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .withColumn("rank_in_nation", row_number().over(w))
      .filter(col("rank_in_nation") <= 3)
      .select("n_name", "rank_in_nation", "c_custkey", "c_name", "c_acctbal")
      .orderBy("n_name", "rank_in_nation")
  }

  val topCustomersSql: String =
    """SELECT n_name, CAST(rank_in_nation AS INTEGER) AS rank_in_nation, c_custkey, c_name, c_acctbal
      |FROM (
      |  SELECT n_name, c_custkey, c_name, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey ASC) AS rank_in_nation
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |) t WHERE rank_in_nation <= 3
      |ORDER BY n_name, rank_in_nation""".stripMargin

  /** TPC-H Q7-style volume shipping: revenue between two nations by
    * ship year. supplier/customer/nation broadcast; lineitem⋈orders is
    * the only fact-fact shuffle. */
  def q7VolumeShipping(spark: SparkSession, dir: String,
                       nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .filter(
        (col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
              (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)")))
             .cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7Sql: String =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
      |    CAST(YEAR(l_shipdate) AS INT) AS l_year, l_extendedprice, l_discount
      |  FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ns ON s_nationkey = ns.n_nationkey
      |  JOIN nation nc ON c_nationkey = nc.n_nationkey
      |  WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
      |     OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
      |) t
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q10-style returned-item report: top-20 customers by revenue
    * lost to returns. */
  def q10ReturnedItems(spark: SparkSession, dir: String, topN: Int = 20): DataFrame = {
    val c = Tables.customer(spark, dir).select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
              (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)")))
             .cast("double").as("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(topN)
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey ASC
      |LIMIT 20""".stripMargin

  /** TPC-H Q14-style promo revenue share: conditional aggregate over a
    * part-dimension join, one exact division at the end. */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select("p_partkey", "p_type")
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01") && col("l_shipdate") < lit("1995-07-01"))
      .select("l_partkey", "l_extendedprice", "l_discount")
    val disc = col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        (sum(when(col("p_type") === "PROMO", disc).otherwise(lit(0).cast("decimal(12,2)"))).cast("double") /
         sum(disc).cast("double") * lit(100)).as("promo_revenue_pct"),
        sum(disc).cast("double").as("total_revenue"))
  }

  val q14Sql: String =
    """SELECT
      |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) * 100 AS promo_revenue_pct,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS total_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1995-07-01 00:00:00'""".stripMargin

  /** TPC-H Q18-style large-volume orders: grouped HAVING over lineitem
    * feeds a join back to orders/customer — the "aggregate as a filter"
    * shape. The big-order set after the HAVING is tiny, so it
    * broadcasts into the orders join; lineitem aggregates in one
    * shuffle on the order key. */
  def q18LargeOrders(spark: SparkSession, dir: String, minQty: Double = 120, topN: Int = 100): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_name")
    o.join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(topN)
  }

  val q18Sql: String =
    """SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
      |  o_totalprice, sum_qty
      |FROM (
      |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 120
      |) big
      |JOIN orders   ON o_orderkey = big.l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 100""".stripMargin

  /** Multi-level rollup: orders⋈lineitem grouped by status/priority. */
  def orderLineitemRollup(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderstatus", "o_orderpriority")
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice", "l_quantity")
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(
        count(lit(1)).as("line_count"),
        countDistinct(col("o_orderkey")).as("order_count"),
        sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("gross_revenue"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("total_qty"))
      .orderBy("o_orderstatus", "o_orderpriority")
  }

  val orderLineitemRollupSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  COUNT(*) AS line_count,
      |  COUNT(DISTINCT o_orderkey) AS order_count,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS gross_revenue,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderstatus, o_orderpriority
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  /** Multi-grain reporting via CUBE: order counts and revenue at every
    * (status × priority) grain including subtotals and the grand
    * total — the grouping-sets family as ONE aggregate over ONE scan
    * (separate per-grain queries would multiply the scan by four).
    * grouping_id disambiguates subtotal rows from real NULL groups. */
  def orderCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping_id().cast("int").as("grain"),
        count(lit(1)).as("order_count"),
        dsum(col("o_totalprice")).as("total_revenue"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  val orderCubeSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS grain,
      |  COUNT(*) AS order_count,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_revenue
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** TPC-H Q4 analog — late-shipment priority census: orders with at
    * least one lineitem shipped more than 60 days after the order
    * date, counted per priority. The EXISTS is a LEFT SEMI join on the
    * order key with the lateness predicate in the join condition — the
    * probe side never duplicates (no post-join distinct needed), one
    * shuffle per side on the order key. */
  def q4PriorityCount(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    o.join(l,
        col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders o
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey
      |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q13 analog — customer order-count distribution: customers
    * LEFT OUTER joined to orders so zero-order customers stay in the
    * census (count(o_orderkey) skips their nulls), then customers
    * counted per order count. Two single-shuffle aggregates. */
  def q13OrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select("c_custkey")
    val o = Tables.orders(spark, dir).select("o_custkey", "o_orderkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  val q13Sql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey
      |) t
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q22 analog — untapped wealthy customers: above-average
    * positive-balance customers with no BIG-TICKET order yet
    * (every customer in this corpus has some order, so the anti-join
    * target is the selective high-value order subset), censused per
    * market segment. The NOT EXISTS is a LEFT ANTI join with the
    * selective filter pushed below it; the global-average threshold is
    * a one-row exact-decimal scalar broadcast (a double-summed average
    * would make the cutoff order-dependent and flip memberships
    * between engines). */
  def q22UntappedSegments(spark: SparkSession, dir: String,
                          bigOrder: Double = 300000.0): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    val o = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > bigOrder)
      .select("o_custkey")
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg((sum(col("c_acctbal").cast("decimal(12,2)")).cast("double") /
            count(lit(1))).as("avg_bal"))
    c.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("total_acctbal"))
      .orderBy("c_mktsegment")
  }

  /** TPC-H Q8-style market share: among ASIA-region customers' orders
    * in 1995-1996 for parts of one type, the per-year revenue share
    * supplied by one nation. Plan: the selective part filter joins
    * FIRST (broadcast) so the fact shuffle carries only matching
    * lines; customer/supplier/nation/region are all broadcast dims;
    * one shuffle for lineitem⋈orders, one for the year aggregate. The
    * share is a single IEEE division of two exact decimal sums. */
  def q8MarketShare(spark: SparkSession, dir: String, regionName: String = "ASIA",
                    partType: String = "ECONOMY", nationName: String = "NATION_2"): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === regionName).select("r_regionkey")
    val nCust = Tables.nation(spark, dir).select("n_nationkey", "n_regionkey")
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(nCust), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val p = Tables.part(spark, dir).filter(col("p_type") === partType).select("p_partkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01") && col("o_orderdate") < lit("1997-01-01"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val l = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    val vol = col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === nationName, vol).otherwise(lit(0).cast("decimal(12,2)")))
           .cast("double") / sum(vol).cast("double")).as("mkt_share"),
        sum(vol).cast("double").as("total_volume"))
      .orderBy("o_year")
  }

  val q8Sql: String =
    """SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
      |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_2' THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS mkt_share,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS total_volume
      |FROM lineitem
      |JOIN part     ON l_partkey = p_partkey
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN region   ON n1.n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
      |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TPC-H Q2-style minimum-cost supplier (partsupp re-expressed over
    * lineitem: a supplier's offer price for a part = its exact decimal
    * average sale price). For small parts (p_size ≤ 10), find each
    * part's cheapest supplier in one region — the correlated
    * min-per-group subquery as a WINDOW over the (part, supplier)
    * aggregate, then broadcast dim join-back. Two shuffles: the
    * (part, supplier) aggregate and the per-part window; everything
    * dimensional broadcasts. Top-100 by balance/name for determinism. */
  def q2MinCostSupplier(spark: SparkSession, dir: String, regionName: String = "EUROPE",
                        maxSize: Int = 10, topN: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val r = Tables.region(spark, dir).filter(col("r_name") === regionName).select("r_regionkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name", "n_regionkey")
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val p = Tables.part(spark, dir).filter(col("p_size") <= maxSize)
      .select("p_partkey", "p_brand", "p_size")
    // offer price per (part, supplier): exact decimal mean of sale prices
    val offers = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("p_brand"), col("p_size"), col("l_suppkey"))
      .agg((sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double") /
            count(lit(1))).as("offer_price"))
    val w = Window.partitionBy("p_partkey")
    offers
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .withColumn("min_price", min(col("offer_price")).over(w))
      .filter(col("offer_price") === col("min_price"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"), col("offer_price"))
      .orderBy(desc("s_acctbal"), asc("n_name"), asc("s_name"), asc("p_partkey"))
      .limit(topN)
  }

  val q2Sql: String =
    """WITH s AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'
      |), offers AS (
      |  SELECT p_partkey, p_brand, p_size, l_suppkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS offer_price
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_size <= 10
      |  GROUP BY p_partkey, p_brand, p_size, l_suppkey
      |), ranked AS (
      |  SELECT o.*, s.s_acctbal, s.s_name, s.n_name,
      |    MIN(offer_price) OVER (PARTITION BY p_partkey) AS min_price
      |  FROM offers o JOIN s ON o.l_suppkey = s.s_suppkey
      |)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, offer_price
      |FROM ranked WHERE offer_price = min_price
      |ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
      |LIMIT 100""".stripMargin

  /** TPC-H Q15-style top supplier: quarterly revenue per supplier,
    * keep the supplier(s) hitting the maximum — the "view + scalar
    * max" shape. The per-supplier aggregate is one shuffle; the max is
    * a one-row broadcast joined back on exact equality (both sides are
    * the same decimal-sum double, so equality is deterministic). */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
              (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)")))
             .cast("double").as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("max_rev"))
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_name")
    rev.join(broadcast(mx), col("total_revenue") === col("max_rev"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  val q15Sql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey
      |)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q17-style small-quantity revenue: for one brand's parts,
    * the yearly-average revenue of lines ordering under 20% of that
    * part's average quantity. The correlated per-part average is a
    * WINDOW over the brand-filtered join — one selective broadcast
    * join + one shuffle on the part key, instead of scanning lineitem
    * twice (subquery form). The average is an exact decimal sum over
    * an integer count, so the 0.2× cutoff is bit-identical across
    * engines. */
  def q17SmallQuantity(spark: SparkSession, dir: String, brand: String = "Brand#12"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = Tables.part(spark, dir).filter(col("p_brand") === brand).select("p_partkey")
    val w = Window.partitionBy("l_partkey")
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .withColumn("avg_qty",
        sum(col("l_quantity").cast("decimal(12,2)")).over(w).cast("double") /
          count(lit(1)).over(w))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(
        (sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double") / lit(7.0))
          .as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  val q17Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
      |  COUNT(*) AS n_lines
      |FROM (
      |  SELECT l_quantity, l_extendedprice,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (PARTITION BY l_partkey) AS DOUBLE)
      |      / COUNT(*) OVER (PARTITION BY l_partkey) AS avg_qty
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#12'
      |) t WHERE l_quantity < 0.2 * avg_qty""".stripMargin

  /** TPC-H Q19-style disjunctive revenue: three OR'd (brand, size,
    * quantity) branches over lineitem⋈part. The disjunction lives in
    * the broadcast-join condition; the per-branch part predicates
    * still prune the broadcast build side, and the scan projects only
    * the four needed lineitem columns. */
  def q19DiscountedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    val l = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val branches =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) && col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) && col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) && col("l_quantity").between(20, 30))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey") && branches)
      .agg(
        sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q19Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** TPC-H Q21-style suppliers kept waiting: for finished ('F')
    * orders, count each supplier's late lines (shipped > 60 days after
    * the order date) in multi-supplier orders where it was the ONLY
    * late supplier. The double EXISTS/NOT-EXISTS correlated form is
    * re-expressed as ONE grouped aggregate per order — distinct
    * suppliers, distinct late suppliers, the sole late supplier's id
    * and line count — so lineitem joins orders once and shuffles once
    * on the order key, instead of the textbook three self-joins of
    * lineitem (the oracle runs the EXISTS form to pin equivalence). */
  def q21SuppliersKeptWaiting(spark: SparkSession, dir: String,
                              lateDays: Int = 60, topN: Int = 100): DataFrame = {
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey", "l_shipdate")
    val late = col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS")
    // two PLAIN aggregates instead of two countDistincts in one (which
    // would plan an Expand carrying every row 3× through the shuffle):
    // (order, supplier) grain first — distinct-supplier counting then
    // degenerates to plain counts at the order grain
    val perOrderSupp = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(
        max(when(late, 1).otherwise(0)).as("is_late"),
        count(when(late, 1)).as("late_lines"))
    val perOrder = perOrderSupp
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_supp"),
        sum(col("is_late")).as("n_late_supp"),
        max(when(col("is_late") === 1, col("l_suppkey"))).as("late_suppkey"),
        sum(when(col("is_late") === 1, col("late_lines")).otherwise(lit(0L))).as("late_lines"))
      .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_name")
    perOrder
      .groupBy(col("late_suppkey"))
      .agg(sum(col("late_lines")).cast("bigint").as("numwait"))
      .join(broadcast(s), col("late_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(desc("numwait"), asc("s_name"))
      .limit(topN)
  }

  val q21Sql: String =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders     ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  val q22Sql: String =
    """WITH ab AS (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_bal
      |  FROM customer WHERE c_acctbal > 0
      |)
      |SELECT c_mktsegment, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
      |FROM customer, ab
      |WHERE c_acctbal > avg_bal
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** TPC-H Q9-style product-type profit: profit by supplier nation and
    * order year for one part type. The testdata has no partsupp, so
    * supply cost is proxied as 60% of the part's retail price per unit
    * (exact decimal math, cf. ps_supplycost * l_quantity in the
    * reference query; /root/reference/sql/marts/mart_orders.sql is the
    * analogous revenue-minus-cost mart shape).
    *
    * Plan: part (type-filtered, 1/6 of 2000 rows) and supplier⋈nation
    * are broadcast; the one real shuffle is lineitem⋈orders on the
    * order key (both fact-sized, as in the textbook Q9). Aggregation
    * is a single groupBy(nation, year) with map-side partials. */
  def q9ProductTypeProfit(spark: SparkSession, dir: String, partType: String = "PROMO"): DataFrame = {
    val p = Tables.part(spark, dir).filter(col("p_type") === partType)
      .select("p_partkey", "p_retailprice")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val l = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount")
    val revenue = col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
    val cost = lit(0.6).cast("decimal(12,2)") * col("p_retailprice").cast("decimal(12,2)") *
      col("l_quantity").cast("decimal(12,2)")
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg((sum(revenue).cast("double") - sum(cost).cast("double")).as("sum_profit"),
           count(lit(1)).as("n_lines"))
      .orderBy(asc("n_name"), desc("o_year"))
  }

  val q9Sql: String =
    """SELECT n_name, CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
      |    - CAST(SUM(CAST(0.6 AS DECIMAL(12,2)) * CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_profit,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |JOIN part     ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN orders   ON l_orderkey = o_orderkey
      |WHERE p_type = 'PROMO'
      |GROUP BY n_name, CAST(YEAR(o_orderdate) AS INTEGER)
      |ORDER BY n_name ASC, o_year DESC""".stripMargin

  /** TPC-H Q11-style important parts: for parts supplied by one
    * nation's suppliers, keep those whose sales value exceeds a fixed
    * fraction of that nation's total. The "GROUP BY … HAVING SUM >
    * (scalar subquery)" shape: one shuffle to the part grain, then the
    * global total is re-aggregated from the SAME grouped result (no
    * second scan) and broadcast back as a one-row join. */
  def q11ImportantParts(spark: SparkSession, dir: String, nationName: String = "NATION_3",
                        fraction: Double = 0.001): DataFrame = {
    val n = Tables.nation(spark, dir).filter(col("n_name") === nationName).select("n_nationkey")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    // per-part values stay DECIMAL until after the total: a double sum's
    // rounding is partial-aggregation-order dependent, and the threshold
    // comparison must be bit-identical with the oracle
    val perPart = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)")).as("part_value_dec"))
    val total = perPart.agg(sum(col("part_value_dec")).cast("double").as("total_value"))
    perPart
      .withColumn("part_value", col("part_value_dec").cast("double"))
      .join(broadcast(total), col("part_value") > col("total_value") * lit(fraction))
      .select(col("l_partkey"), col("part_value"))
      .orderBy(desc("part_value"), asc("l_partkey"))
  }

  val q11Sql: String =
    """WITH perpart AS (
      |  SELECT l_partkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS part_value_dec
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation   ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_3'
      |  GROUP BY l_partkey
      |)
      |SELECT l_partkey, CAST(part_value_dec AS DOUBLE) AS part_value
      |FROM perpart
      |WHERE CAST(part_value_dec AS DOUBLE) > CAST((SELECT SUM(part_value_dec) FROM perpart) AS DOUBLE) * 0.001
      |ORDER BY part_value DESC, l_partkey ASC""".stripMargin

  /** TPC-H Q12-style priority split by return flag: for lines shipped
    * in one year, count urgent/high-priority orders vs the rest per
    * return flag (the testdata has no l_shipmode, so l_returnflag
    * stands in as the grouping column). The shape is Q12's: one
    * fact⋈fact shuffle join on the order key + conditional aggregates
    * (SUM(CASE WHEN …)). The year filter is pushed into the lineitem
    * scan before the join. */
  def q12PrioritySplit(spark: SparkSession, dir: String, yearStart: String = "1996-01-01",
                       yearEnd: String = "1997-01-01"): DataFrame = {
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit(yearStart) && col("l_shipdate") < lit(yearEnd))
      .select("l_orderkey", "l_returnflag")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(when(high, 1)).as("high_line_count"),
           count(when(!high, 1)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  val q12Sql: String =
    """SELECT l_returnflag,
      |  COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
      |  COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** TPC-H Q16-style supplier census: distinct suppliers per (brand,
    * type, size) for non-excluded parts, excluding complained-about
    * suppliers (proxied by negative account balance — the testdata has
    * no s_comment). The exclusion is a broadcast anti-join BEFORE the
    * aggregate; the single countDistinct plans as a two-phase
    * aggregate on (brand, type, size, suppkey) — no Expand. */
  def q16SupplierCensus(spark: SparkSession, dir: String, excludeBrand: String = "Brand#45",
                        sizes: Seq[Int] = Seq(1, 4, 9, 14, 19, 23, 36, 45)): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") =!= excludeBrand && col("p_size").isin(sizes: _*))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val bad = Tables.supplier(spark, dir).filter(col("s_acctbal") < 0).select("s_suppkey")
    Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"), asc("p_size"))
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#45' AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC""".stripMargin

  /** TPC-H Q20-style dominant suppliers: suppliers who shipped more
    * than half of a part's total 1997 volume for one part type — the
    * correlated "quantity > 0.5 × (SELECT SUM … same part)" shape,
    * expressed as a per-part window over ONE shuffle on the part key
    * instead of a rescan-per-row subquery. The qualifying (part,
    * supplier) pairs then semi-drive a broadcast join to supplier ⋈
    * nation for the report. Both sides of the 0.5× comparison are
    * exact decimal sums cast to double, so the cutoff is bit-identical
    * across engines. */
  def q20DominantSuppliers(spark: SparkSession, dir: String, partType: String = "SMALL",
                           yearStart: String = "1997-01-01", yearEnd: String = "1998-01-01"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = Tables.part(spark, dir).filter(col("p_type") === partType).select("p_partkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_name", "s_nationkey")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_name")
    val w = Window.partitionBy("l_partkey")
    // quantities stay DECIMAL through BOTH the per-supplier aggregate
    // AND the per-part window sum — a double window sum would make the
    // 0.5× cutoff accumulation-order dependent (cf. q11's total)
    val perPartSupp = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit(yearStart) && col("l_shipdate") < lit(yearEnd))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("supp_qty_dec"))
    perPartSupp
      .withColumn("supp_qty", col("supp_qty_dec").cast("double"))
      .withColumn("part_qty", sum(col("supp_qty_dec")).over(w).cast("double"))
      .filter(col("supp_qty") > lit(0.5) * col("part_qty"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_dominated_parts"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("n_name"), col("n_dominated_parts"))
      .orderBy(desc("n_dominated_parts"), asc("s_name"))
  }

  val q20Sql: String =
    """WITH per_part_supp AS (
      |  SELECT l_partkey, l_suppkey,
      |    SUM(CAST(l_quantity AS DECIMAL(12,2))) AS supp_qty_dec
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_type = 'SMALL'
      |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY l_partkey, l_suppkey
      |), dominant AS (
      |  SELECT l_suppkey, COUNT(*) AS n_dominated_parts
      |  FROM (
      |    SELECT l_suppkey, CAST(supp_qty_dec AS DOUBLE) AS supp_qty,
      |      CAST(SUM(supp_qty_dec) OVER (PARTITION BY l_partkey) AS DOUBLE) AS part_qty
      |    FROM per_part_supp
      |  ) t WHERE supp_qty > 0.5 * part_qty
      |  GROUP BY l_suppkey
      |)
      |SELECT s_name, n_name, n_dominated_parts
      |FROM dominant
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |ORDER BY n_dominated_parts DESC, s_name ASC""".stripMargin

  /** Monthly shipping-latency distribution: days from order placement
    * to line shipment, p50/p90/mean/max per order month — the
    * fulfillment-SLA mart (the OLAP-side sibling of
    * conversion_latency's behavioral gap).
    *
    * Scale shape: both fact sides project to two/three columns before
    * the orderkey shuffle join; the month rollup then moves
    * |lineitem| → |months| rows. Exact per-month percentiles buffer a
    * whole MONTH of latencies in one aggregation buffer — billions of
    * values at 100 TB — so `shippingLatencyApprox` below is the
    * registered 100 TB form (this exact query stays as the oracle
    * anchor). Mean is integer day-sum ÷ count:
    * partial-aggregation-order-proof. */
  def shippingLatency(spark: SparkSession, dir: String): DataFrame =
    shippingLatencyRollup(spark, dir, approx = false)

  /** The 100 TB form: a month of a 100 TB lineitem is billions of
    * latency values — exact `percentile` buffers them all in ONE
    * aggregation buffer, while `approx_percentile` (Greenwald-Khanna,
    * accuracy 1e-4) carries fixed-size state through map-side partial
    * aggregation. Rows-only at the gate; the spec bounds p50/p90 by
    * the exact values at q ± 0.01. The exact form stays registered as
    * the oracle anchor. */
  def shippingLatencyApprox(spark: SparkSession, dir: String): DataFrame =
    shippingLatencyRollup(spark, dir, approx = true)

  /** Shared pre-aggregation frame: (order_month, lat) per line. */
  private[graft] def shippingLatencies(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_orderkey"), col("o_orderdate"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate").isNotNull)
      .select(col("l_orderkey"), col("l_shipdate"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(trunc(col("o_orderdate"), "month").as("order_month"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))).as("lat"))
  }

  private def shippingLatencyRollup(spark: SparkSession, dir: String,
                                    approx: Boolean): DataFrame = {
    def pct(q: Double, name: String) = Pct.col("lat", q.toString, approx).as(name)
    shippingLatencies(spark, dir)
      .groupBy(col("order_month"))
      .agg(
        count(lit(1)).as("lines"),
        pct(0.5, "p50_days"),
        pct(0.9, "p90_days"),
        (sum(col("lat")).cast("double") / count(lit(1)).cast("double")).as("mean_days"),
        max(col("lat")).cast("bigint").as("max_days"))
      .orderBy("order_month")
  }

  val shippingLatencySql: String =
    """WITH lat AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
      |    date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS lat
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_shipdate IS NOT NULL AND o_orderdate IS NOT NULL
      |)
      |SELECT order_month,
      |  COUNT(*) AS lines,
      |  quantile_cont(lat, 0.5) AS p50_days,
      |  quantile_cont(lat, 0.9) AS p90_days,
      |  CAST(SUM(lat) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_days,
      |  CAST(MAX(lat) AS BIGINT) AS max_days
      |FROM lat
      |GROUP BY order_month
      |ORDER BY order_month""".stripMargin

  /** Revenue Pareto / ABC curve: the top-100 parts by discounted
    * revenue with cumulative corpus share and the A/B/C inventory
    * class (A up to 80% cumulative share, B to 95%, C beyond) — the
    * 80/20 concentration analysis every assortment review starts
    * from.
    *
    * Scale shape: the per-part revenue rollup is the only fact-sized
    * shuffle; the curve itself ranks a TakeOrdered top-100 (no global
    * sort materialization — the full-dimension prefix-sum would need
    * a range-partitioned two-pass and is deliberately out of scope),
    * then windows over those ≤100 rows with the 1-row broadcast grand
    * total. Revenue accumulates in decimal; shares are single IEEE
    * divisions, so the class thresholds compare identically in both
    * engines. */
  def revenuePareto(spark: SparkSession, dir: String, k: Int = 100): DataFrame =
    revenueParetoFrom(Tables.lineitem(spark, dir), k)

  def revenueParetoFrom(lineitem: DataFrame, k: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
    val partRev = lineitem
      .groupBy(col("l_partkey"))
      .agg(sum(rev).as("revenue_dec"))
    val total = partRev.agg(sum(col("revenue_dec")).as("total_dec"))
    val w = Window.orderBy(desc("revenue_dec"), asc("l_partkey"))
    val cum = sum(col("revenue_dec"))
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    partRev
      .orderBy(desc("revenue_dec"), asc("l_partkey")).limit(k)
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_share_pct",
        cum.cast("double") / col("total_dec").cast("double") * lit(100.0))
      .withColumn("abc_class",
        when(col("cum_share_pct") <= 80.0, "A")
          .when(col("cum_share_pct") <= 95.0, "B")
          .otherwise("C"))
      .select(col("rank"), col("l_partkey"),
        col("revenue_dec").cast("double").as("revenue"),
        (col("revenue_dec").cast("double") / col("total_dec").cast("double") * lit(100.0))
          .as("share_pct"),
        col("cum_share_pct"), col("abc_class"))
      .orderBy("rank")
  }

  /** FULL-dimension ABC classification — every part classified, not
    * just the top-100 curve: the distributed prefix-sum pattern
    * revenue_pareto deliberately avoids. A global cumulative sum
    * ordered by revenue cannot ride one window (single partition at
    * dimension scale), so it splits into band-local prefix sums plus
    * driver-side band offsets:
    *
    *  1. per-part decimal revenue (the only fact-sized shuffle);
    *  2. ~`bands` revenue-range bands from one fixed-state
    *     approx_percentile (band assignment is a monotone literal
    *     when-chain — equal revenues always share a band, so band
    *     order extends the global (revenue desc, key asc) order);
    *  3. per-band EXACT decimal totals (≤ bands rows) collect; their
    *     running sums become per-band offset literals — the classic
    *     partition-offsets trick with the partitioning made explicit
    *     and deterministic (no RangePartitioner sampling dependence);
    *  4. one band-partitioned window computes the local prefix; the
    *     global cumulative is offset + local — exact, because decimal
    *     addition is associative.
    *
    * Each band holds ~|parts|/bands rows, so no task ever sees the
    * whole dimension. Classes: A ≤ 80% cumulative share, B ≤ 95%, C
    * beyond — identical to the oracle's single-window form because
    * every sum is exact decimal. */
  def revenueAbc(spark: SparkSession, dir: String, bands: Int = 16): DataFrame =
    revenueAbcFrom(Tables.lineitem(spark, dir), bands)

  def revenueAbcFrom(lineitem: DataFrame, bands: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
    val partRev = lineitem
      .groupBy(col("l_partkey"))
      .agg(sum(rev).as("revenue_dec"))
      .localCheckpoint() // feeds thresholds, band totals, and the curve
    // band thresholds: descending revenue quantiles (fixed-state GK)
    val qs = (1 until bands).map(i => i.toDouble / bands)
    val thresholds = partRev
      .agg(expr(s"approx_percentile(CAST(revenue_dec AS DOUBLE), " +
        s"array(${qs.mkString(", ")}), 10000)").as("ts"))
      .collect().head.getSeq[Double](0)
    // monotone when-chain: higher revenue → lower band id
    val band = thresholds.reverse.zipWithIndex.foldLeft(lit(bands - 1)) {
      case (acc, (t, i)) => when(col("revenue_dec").cast("double") > t, i).otherwise(acc)
    }
    val banded = partRev.withColumn("band", band)
    // per-band exact totals → running offsets (≤ bands rows driver-side)
    val bandTotals = banded.groupBy(col("band"))
      .agg(sum(col("revenue_dec")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).sortBy(_._1)
    val grand = bandTotals.map(_._2.asInstanceOf[java.math.BigDecimal])
      .reduce(_.add(_))
    val offsets = bandTotals.scanLeft(java.math.BigDecimal.ZERO) {
      case (acc, (_, t)) => acc.add(t)
    }.init
    val offsetCol = bandTotals.map(_._1).zip(offsets).foldLeft(
      lit(java.math.BigDecimal.ZERO)) { case (acc, (b, off)) =>
        when(col("band") === b, lit(off)).otherwise(acc)
    }
    val w = Window.partitionBy("band")
      .orderBy(desc("revenue_dec"), asc("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    banded
      .withColumn("cum_dec", sum(col("revenue_dec")).over(w) + offsetCol)
      .withColumn("cum_share_pct",
        col("cum_dec").cast("double") / lit(grand).cast("double") * lit(100.0))
      .withColumn("abc_class",
        when(col("cum_share_pct") <= 80.0, "A")
          .when(col("cum_share_pct") <= 95.0, "B")
          .otherwise("C"))
      .select(col("l_partkey"), col("revenue_dec").cast("double").as("revenue"),
        col("cum_share_pct"), col("abc_class"))
      .orderBy(desc("revenue"), asc("l_partkey"))
  }

  val revenueAbcSql: String =
    """WITH pr AS (
      |  SELECT l_partkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |        (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS revenue_dec
      |  FROM lineitem GROUP BY l_partkey
      |), tot AS (SELECT SUM(revenue_dec) AS total_dec FROM pr)
      |SELECT l_partkey, CAST(revenue_dec AS DOUBLE) AS revenue,
      |  CAST(SUM(revenue_dec) OVER (ORDER BY revenue_dec DESC, l_partkey ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / CAST(total_dec AS DOUBLE) * 100.0 AS cum_share_pct,
      |  CASE WHEN CAST(SUM(revenue_dec) OVER (ORDER BY revenue_dec DESC, l_partkey ASC
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |         / CAST(total_dec AS DOUBLE) * 100.0 <= 80.0 THEN 'A'
      |       WHEN CAST(SUM(revenue_dec) OVER (ORDER BY revenue_dec DESC, l_partkey ASC
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |         / CAST(total_dec AS DOUBLE) * 100.0 <= 95.0 THEN 'B'
      |       ELSE 'C' END AS abc_class
      |FROM pr CROSS JOIN tot
      |ORDER BY revenue DESC, l_partkey ASC""".stripMargin

  /** Revenue-inequality readout: the exact Gini coefficient over
    * per-customer order revenue — the whole-distribution concentration
    * dial beside `revenue_pareto`'s top-100 heads and `revenue_abc`'s
    * banded classes (Pareto names the heads, ABC buckets everyone,
    * Gini is the ONE number that moves when the curve's shape drifts —
    * the standard KPI for "are we becoming a whale shop"). Fourth
    * surface of the banded distributed prefix-sum core
    * (`revenue_abc` → `user_activity_gini` → `dq_key_skew`'s census →
    * here): GK band thresholds, ≤bands driver rows, band-local
    * row_number + literal offsets — exact global ranks with no global
    * sort, and Σ i·vᵢ is tie-order-invariant so band-local tie order
    * cannot perturb it. Money stays decimal end-to-end (the dsum
    * rule); the final Gini is a fixed IEEE chain on exact decimals,
    * so the DuckDB one-window oracle hashes bit-identically.
    * Population = customers with ≥1 order (revenue Gini over
    * purchasers; the zero-order tail is `user_lifecycle`'s job). */
  def revenueGini(spark: SparkSession, dir: String, bands: Int = 16): DataFrame =
    revenueGiniFrom(Tables.orders(spark, dir), bands)

  def revenueGiniFrom(orders: DataFrame, bands: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vals = orders
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(12,2)"))
        .cast("decimal(18,2)").as("v"))
      .localCheckpoint() // feeds thresholds, band stats, and the ranked sum
    val qs = (1 until bands).map(i => i.toDouble / bands)
    val ts = vals
      .agg(expr(s"approx_percentile(CAST(v AS DOUBLE), " +
        s"array(${qs.mkString(", ")}), 10000)").as("ts"))
      .collect().head.getSeq[Double](0)
    // ascending monotone chain: band 0 = lowest-revenue customers
    val band = ts.zipWithIndex.foldLeft(lit(0)) { case (acc, (t, i)) =>
      when(col("v").cast("double") > t, lit(i + 1)).otherwise(acc)
    }
    val banded = vals.withColumn("band", band)
    val stats = banded.groupBy(col("band"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1),
        r.getDecimal(2).asInstanceOf[java.math.BigDecimal])).sortBy(_._1)
    val totalN = stats.map(_._2).sum
    val totalS = stats.map(_._3).reduce(_.add(_))
    val rowOffsets = stats.scanLeft(0L) { case (acc, (_, n, _)) => acc + n }.init
    val offCol = stats.map(_._1).zip(rowOffsets).foldLeft(lit(0L)) {
      case (acc, (b, off)) => when(col("band") === b, lit(off)).otherwise(acc)
    }
    val w = Window.partitionBy("band").orderBy(asc("v"), asc("o_custkey"))
    banded
      .withColumn("rnk", row_number().over(w).cast("long") + offCol)
      .agg(sum(col("rnk").cast("decimal(20,0)") * col("v")).as("s_rank"))
      .select(
        lit(totalN).as("n_customers"),
        lit(totalS).cast("double").as("total_revenue"),
        (lit(2.0) * col("s_rank").cast("double") /
          (lit(totalN.toDouble) * lit(totalS).cast("double")) -
          lit((totalN + 1).toDouble) / lit(totalN.toDouble)).as("gini"))
  }

  val revenueGiniSql: String =
    """WITH c AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS v
      |  FROM orders GROUP BY o_custkey
      |), r AS (
      |  SELECT o_custkey, v,
      |    ROW_NUMBER() OVER (ORDER BY v, o_custkey) AS rnk
      |  FROM c
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  CAST(SUM(v) AS DOUBLE) AS total_revenue,
      |  2.0 * CAST(SUM(CAST(rnk AS DECIMAL(20,0)) * v) AS DOUBLE) /
      |    (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(v) AS DOUBLE)) -
      |  CAST(COUNT(*) + 1 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS gini
      |FROM r""".stripMargin

  val revenueParetoSql: String =
    """WITH pr AS (
      |  SELECT l_partkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |        (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS revenue_dec
      |  FROM lineitem GROUP BY l_partkey
      |), tot AS (SELECT SUM(revenue_dec) AS total_dec FROM pr),
      |top AS (SELECT * FROM pr ORDER BY revenue_dec DESC, l_partkey ASC LIMIT 100)
      |SELECT CAST(ROW_NUMBER() OVER w AS INT) AS rank, l_partkey,
      |  CAST(revenue_dec AS DOUBLE) AS revenue,
      |  CAST(revenue_dec AS DOUBLE) / CAST(total_dec AS DOUBLE) * 100.0 AS share_pct,
      |  cum_share_pct,
      |  CASE WHEN cum_share_pct <= 80.0 THEN 'A'
      |       WHEN cum_share_pct <= 95.0 THEN 'B' ELSE 'C' END AS abc_class
      |FROM (
      |  SELECT l_partkey, revenue_dec, total_dec,
      |    CAST(SUM(revenue_dec) OVER (ORDER BY revenue_dec DESC, l_partkey ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |      / CAST(total_dec AS DOUBLE) * 100.0 AS cum_share_pct
      |  FROM top CROSS JOIN tot
      |) q
      |WINDOW w AS (ORDER BY revenue_dec DESC, l_partkey ASC)
      |ORDER BY rank""".stripMargin

  /** Daily fulfillment backlog — the operational time series the
    * order/ship marts imply but never surface: lines placed vs lines
    * shipped per day and the OPEN backlog between them (cumulative
    * placed − cumulative shipped), the curve an ops team reads for
    * fulfillment drift (backlog trending up = shipping falling behind
    * intake; shipping_latency tells you how slow, this tells you how
    * DEEP the hole is).
    *
    * Scale shape: two fact-sized day rollups (lineitem keyed to
    * o_orderdate via one join, and to l_shipdate directly — both
    * map-side combined to DAY dimension), then cumulative windows
    * over the day frame. The day dimension is CALENDAR-bounded — it
    * grows with elapsed time, not data volume (a decade is ~3.7k
    * rows at any corpus size), so the single-partition cumulative
    * window is bounded by construction, the same argument as
    * vocab_coverage's capped frame. Counts stay exact bigints; no
    * float leaves the engine. */
  def orderBacklog(spark: SparkSession, dir: String): DataFrame =
    orderBacklogFrom(Tables.orders(spark, dir), Tables.lineitem(spark, dir))

  /** Shipping latency by ORDER PRIORITY — does priority actually
    * expedite fulfilment (the operational check q4's count census
    * can't make): per o_orderpriority, line count, mean ship days and
    * the >30-day late share. An inverted table (URGENT slower than
    * LOW) is a routing bug upstream systems read off this mart.
    *
    * Scale shape: same one orderkey-join as `shipping_latency` (the
    * priority column rides the orders side), rollup to ≤5 rows —
    * exact long sums until the two final IEEE divisions, so the
    * oracle hash holds. */
  def priorityShipping(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate").isNotNull)
      .select(col("l_orderkey"), col("l_shipdate"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))).as("lat"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("lines"),
        sum(col("lat")).cast("bigint").as("total_days"),
        sum(when(col("lat") > 30, 1L).otherwise(0L)).as("late_lines"),
        max(col("lat")).cast("int").as("max_days"))
      .select(col("o_orderpriority"), col("lines"),
        (col("total_days").cast("double") / col("lines").cast("double")).as("mean_days"),
        (col("late_lines").cast("double") / col("lines").cast("double")).as("late_share"),
        col("max_days"))
      .orderBy("o_orderpriority")
  }

  val priorityShippingSql: String =
    """WITH lat AS (
      |  SELECT o_orderpriority,
      |    date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS lat
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_shipdate IS NOT NULL AND o_orderdate IS NOT NULL
      |)
      |SELECT o_orderpriority,
      |  COUNT(*) AS lines,
      |  CAST(SUM(lat) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_days,
      |  CAST(SUM(CASE WHEN lat > 30 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS late_share,
      |  CAST(MAX(lat) AS INT) AS max_days
      |FROM lat
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Per-market-segment order profile — the BI card for the customer
    * dimension q3 only filters on: per c_mktsegment, customers who
    * ordered, orders, revenue, average order value, orders per
    * buying customer, and revenue share. A segment with high AOV but
    * low orders-per-customer is an acquisition play; the reverse is
    * a retention play — the split that decides where the next
    * campaign goes.
    *
    * Scale shape: one orders⋈customer key join (customer is the
    * small side — broadcast at any realistic scale), rollup to
    * ≤|segments| rows, exact decimal revenue and long counts until
    * the three final IEEE divisions + a 1-row broadcast total for
    * the share. */
  def segmentOrderProfile(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_totalprice").cast("decimal(12,2)").as("price"))
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    // de-Expand: a countDistinct beside other aggregates plans an
    // Expand (3x the fact rows through the exchange) — pre-aggregate
    // at (segment, customer) instead, then a plain second-level rollup
    val seg = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_custkey"))
      .agg(count(lit(1)).as("cust_orders"), sum(col("price")).as("cust_revenue"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("buying_customers"),
        sum(col("cust_orders")).cast("bigint").as("n_orders"),
        sum(col("cust_revenue")).as("revenue"))
    val total = seg.agg(sum(col("revenue")).as("total_revenue"))
    seg.crossJoin(broadcast(total))
      .select(col("c_mktsegment"), col("buying_customers"), col("n_orders"),
        col("revenue").cast("double").as("revenue"),
        (col("revenue").cast("double") / col("n_orders").cast("double")).as("aov"),
        (col("n_orders").cast("double") / col("buying_customers").cast("double"))
          .as("orders_per_customer"),
        (col("revenue").cast("double") / col("total_revenue").cast("double"))
          .as("revenue_share"))
      .orderBy("c_mktsegment")
  }

  val segmentOrderProfileSql: String =
    """WITH per AS (
      |  SELECT c_mktsegment, o_custkey,
      |    COUNT(*) AS cust_orders,
      |    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS cust_revenue
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2
      |), seg AS (
      |  SELECT c_mktsegment,
      |    COUNT(*) AS buying_customers,
      |    CAST(SUM(cust_orders) AS BIGINT) AS n_orders,
      |    SUM(cust_revenue) AS revenue
      |  FROM per GROUP BY c_mktsegment
      |)
      |SELECT c_mktsegment, buying_customers, n_orders,
      |  CAST(revenue AS DOUBLE) AS revenue,
      |  CAST(revenue AS DOUBLE) / CAST(n_orders AS DOUBLE) AS aov,
      |  CAST(n_orders AS DOUBLE) / CAST(buying_customers AS DOUBLE)
      |    AS orders_per_customer,
      |  CAST(revenue AS DOUBLE) / CAST(SUM(revenue) OVER () AS DOUBLE)
      |    AS revenue_share
      |FROM seg
      |ORDER BY c_mktsegment""".stripMargin

  /** Discount-effectiveness table — does a deeper discount actually
    * move volume (the pricing read q19's revenue filter and q6's
    * what-if can't give): per discount percentage band, line count,
    * mean quantity, gross and discounted revenue, and the realized
    * revenue give-up share. A flat mean-quantity column across bands
    * says discounts are burning margin without lifting baskets.
    *
    * Scale shape: ONE map-side-combined rollup of the bare lineitem
    * scan to ≤ 11 band rows; quantities/revenues sum as exact
    * decimals, divisions happen once per band row. The band key
    * `round(l_discount×100)` is exact in both engines (discounts are
    * hundredths; round is half-away-from-zero for positives in
    * both). */
  def discountUplift(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(round(col("l_discount") * 100).cast("int").as("discount_pct"),
        col("l_quantity").cast("decimal(12,2)").as("qty"),
        col("l_extendedprice").cast("decimal(12,2)").as("price"),
        (col("l_extendedprice").cast("decimal(12,2)") *
          col("l_discount").cast("decimal(12,2)")).as("give_up"))
      .groupBy(col("discount_pct"))
      .agg(count(lit(1)).as("lines"),
        sum(col("qty")).as("total_qty"),
        sum(col("price")).as("gross_revenue"),
        sum(col("give_up")).as("discount_given"))
      .select(col("discount_pct"), col("lines"),
        (col("total_qty").cast("double") / col("lines").cast("double"))
          .as("mean_quantity"),
        col("gross_revenue").cast("double").as("gross_revenue"),
        col("discount_given").cast("double").as("discount_given"),
        (col("discount_given").cast("double") /
          col("gross_revenue").cast("double")).as("give_up_share"))
      .orderBy("discount_pct")

  val discountUpliftSql: String =
    """WITH b AS (
      |  SELECT CAST(ROUND(l_discount * 100) AS INT) AS discount_pct,
      |    CAST(l_quantity AS DECIMAL(12,2)) AS qty,
      |    CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
      |    CAST(l_extendedprice AS DECIMAL(12,2)) *
      |      CAST(l_discount AS DECIMAL(12,2)) AS give_up
      |  FROM lineitem
      |)
      |SELECT discount_pct, COUNT(*) AS lines,
      |  CAST(SUM(qty) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_quantity,
      |  CAST(SUM(price) AS DOUBLE) AS gross_revenue,
      |  CAST(SUM(give_up) AS DOUBLE) AS discount_given,
      |  CAST(SUM(give_up) AS DOUBLE) / CAST(SUM(price) AS DOUBLE) AS give_up_share
      |FROM b
      |GROUP BY discount_pct
      |ORDER BY discount_pct""".stripMargin

  def orderBacklogFrom(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val placed = lineitem
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderdate").as("event_date"))
      .agg(count(lit(1)).as("lines_placed"))
    val shipped = lineitem
      .groupBy(col("l_shipdate").as("event_date"))
      .agg(count(lit(1)).as("lines_shipped"))
    val days = placed.select("event_date")
      .unionByName(shipped.select("event_date")).distinct()
    val w = Window.orderBy("event_date")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days
      .join(placed, Seq("event_date"), "left")
      .join(shipped, Seq("event_date"), "left")
      .select(col("event_date"),
        coalesce(col("lines_placed"), lit(0L)).as("lines_placed"),
        coalesce(col("lines_shipped"), lit(0L)).as("lines_shipped"))
      .withColumn("cum_placed", sum(col("lines_placed")).over(w))
      .withColumn("cum_shipped", sum(col("lines_shipped")).over(w))
      .withColumn("open_lines", col("cum_placed") - col("cum_shipped"))
      .orderBy("event_date")
  }

  val orderBacklogSql: String =
    """WITH placed AS (
      |  SELECT o_orderdate AS event_date, CAST(COUNT(*) AS BIGINT) AS lines_placed
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY o_orderdate
      |), shipped AS (
      |  SELECT l_shipdate AS event_date, CAST(COUNT(*) AS BIGINT) AS lines_shipped
      |  FROM lineitem GROUP BY l_shipdate
      |), days AS (
      |  SELECT event_date FROM placed
      |  UNION SELECT event_date FROM shipped
      |)
      |SELECT d.event_date,
      |  COALESCE(p.lines_placed, 0) AS lines_placed,
      |  COALESCE(s.lines_shipped, 0) AS lines_shipped,
      |  CAST(SUM(COALESCE(p.lines_placed, 0)) OVER w AS BIGINT) AS cum_placed,
      |  CAST(SUM(COALESCE(s.lines_shipped, 0)) OVER w AS BIGINT) AS cum_shipped,
      |  CAST(SUM(COALESCE(p.lines_placed, 0)) OVER w
      |    - SUM(COALESCE(s.lines_shipped, 0)) OVER w AS BIGINT) AS open_lines
      |FROM days d
      |LEFT JOIN placed p ON d.event_date = p.event_date
      |LEFT JOIN shipped s ON d.event_date = s.event_date
      |WINDOW w AS (ORDER BY d.event_date
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY d.event_date""".stripMargin

  /** Year-over-year revenue by nation — the board-level growth table
    * over the q5/q7 join path: discounted revenue per (nation, year)
    * with the previous year's revenue and growth percentage alongside
    * (NULL for a nation's first year — no fabricated 0-baseline
    * growth).
    *
    * Scale shape: one fact-sized aggregation to the (nation, year)
    * grain — the customer/nation dims broadcast onto lineitem⋈orders
    * exactly as q5 does — then a lag window partitioned by nation
    * over the ≤ nations×years frame. Revenue sums stay decimal (the
    * q1 determinism pattern); the YoY percentage is a fixed two-op
    * IEEE chain on the exact sums. */
  def nationRevenueYoy(spark: SparkSession, dir: String): DataFrame =
    nationRevenueYoyFrom(Tables.lineitem(spark, dir), Tables.orders(spark, dir),
      Tables.customer(spark, dir), Tables.nation(spark, dir))

  private[graft] def nationRevenueYoyFrom(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, nation: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
    val base = lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("order_year"))
      .agg(sum(rev).as("revenue_dec"))
    val w = Window.partitionBy("nation").orderBy("order_year")
    base
      // the baseline must be the ADJACENT year: a bare lag(1) over the
      // present rows would label growth across a gap year (1994 → 1996
      // with no 1995 orders) as one-year growth
      .withColumn("prev_dec",
        when(lag(col("order_year"), 1).over(w) === col("order_year") - 1,
          lag(col("revenue_dec"), 1).over(w)))
      .select(col("nation"), col("order_year"),
        col("revenue_dec").cast("double").as("revenue"),
        col("prev_dec").cast("double").as("prev_revenue"),
        ((col("revenue_dec").cast("double") - col("prev_dec").cast("double"))
          / col("prev_dec").cast("double") * 100).as("yoy_pct"))
      .orderBy("nation", "order_year")
  }

  val nationRevenueYoySql: String =
    """WITH base AS (
      |  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS order_year,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |        (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS revenue_dec
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2
      |), lagged AS (
      |  SELECT nation, order_year, revenue_dec,
      |    CASE WHEN LAG(order_year) OVER (PARTITION BY nation ORDER BY order_year)
      |              = order_year - 1
      |         THEN LAG(revenue_dec) OVER (PARTITION BY nation ORDER BY order_year)
      |    END AS prev_dec
      |  FROM base
      |)
      |SELECT nation, order_year,
      |  CAST(revenue_dec AS DOUBLE) AS revenue,
      |  CAST(prev_dec AS DOUBLE) AS prev_revenue,
      |  (CAST(revenue_dec AS DOUBLE) - CAST(prev_dec AS DOUBLE))
      |    / CAST(prev_dec AS DOUBLE) * 100 AS yoy_pct
      |FROM lagged
      |ORDER BY nation, order_year""".stripMargin
}
