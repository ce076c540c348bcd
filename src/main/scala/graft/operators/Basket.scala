package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Market-basket affinity: which product pairs land in the same order,
  * with support (share of orders containing both) and lift (observed
  * co-occurrence vs independence). The retail cross-sell staple the
  * reference's product mart stops short of.
  *
  * Scale shape: all-pairs work exists ONLY inside an order — the
  * self-join is co-located on l_orderkey (both sides are the SAME
  * deduped projection, so the exchange is planned once and reused) and
  * an order holds at most a handful of distinct parts, so the blow-up
  * is C(|order|,2), bounded per group like the LSH bucket pair
  * enumeration. Everything after is aggregated-frame algebra: pair
  * counts (|distinct pairs| rows), per-part order counts (|parts|
  * rows), one scalar total joined via a 1-row broadcast cross join.
  * The `p1 < p2` ordering halves the pairs and makes each undirected
  * pair a single canonical row. Final top-N is TakeOrdered (no global
  * sort materialization); ties at the cut break deterministically on
  * (part1, part2). */
object Basket {

  def basketPairs(spark: SparkSession, dir: String, topN: Int = 100): DataFrame =
    basketPairsFrom(Tables.lineitem(spark, dir), topN)

  def basketPairsFrom(lineitem: DataFrame, topN: Int = 100): DataFrame = {
    val li = lineitem
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct() // the same part twice in one order is one basket membership
    val pairs = li.as("a")
      .join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part1"), col("b.l_partkey").as("part2"))
      .agg(count(lit(1)).as("pair_orders"))
    val partOrders = li.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("part_orders"))
    val total = li.agg(countDistinct(col("l_orderkey")).as("n_orders"))
    pairs
      .join(broadcast(total))
      .join(partOrders.withColumnRenamed("l_partkey", "pk1")
        .withColumnRenamed("part_orders", "orders1"), col("part1") === col("pk1"))
      .join(partOrders.withColumnRenamed("l_partkey", "pk2")
        .withColumnRenamed("part_orders", "orders2"), col("part2") === col("pk2"))
      .select(col("part1"), col("part2"), col("pair_orders"),
        (col("pair_orders").cast("double") / col("n_orders").cast("double")).as("support"),
        ((col("pair_orders").cast("double") * col("n_orders").cast("double"))
          / (col("orders1").cast("double") * col("orders2").cast("double"))).as("lift"))
      .orderBy(desc("pair_orders"), asc("part1"), asc("part2"))
      .limit(topN)
  }

  /** Cohort-LTV revenue triangle: customers grouped by FIRST-order
    * month, revenue and active-customer counts laid out by months
    * since acquisition — the table every retention-revenue model and
    * payback-period analysis starts from.
    *
    * Scale shape: one custkey exchange for the first-order window
    * (unordered running min — no sort), then the per-(cohort, offset,
    * customer) pre-aggregate BEFORE the cell rollup, so the distinct
    * customer count is a plain `count(*)` — the de-Expand trick the
    * funnel marts use; a mixed countDistinct+sum here would Expand ×2
    * every order row through the shuffle. Month arithmetic is pure
    * integers (year·12+month), timezone-free; money sums as
    * decimal(18,2) and casts back to double so partial-aggregation
    * order can't move a bit. */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame =
    cohortLtvFrom(Tables.orders(spark, dir))

  def cohortLtvFrom(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val midx = year(col("o_orderdate")) * lit(12) + month(col("o_orderdate")) - lit(1)
    val base = orders.filter(col("o_orderdate").isNotNull)
      .select(col("o_custkey"), midx.as("midx"), col("o_totalprice"))
      .withColumn("cohort_idx", min(col("midx")).over(Window.partitionBy("o_custkey")))
    base
      .groupBy(col("cohort_idx"),
        (col("midx") - col("cohort_idx")).cast("long").as("months_since"),
        col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      .groupBy(col("cohort_idx"), col("months_since"))
      .agg(count(lit(1)).as("active_customers"),
        sum(col("rev")).cast("double").as("revenue"))
      .select(
        make_date((col("cohort_idx") / lit(12)).cast("int"),
          (col("cohort_idx") % lit(12) + lit(1)).cast("int"), lit(1)).as("cohort_month"),
        col("months_since"), col("active_customers"), col("revenue"))
      .orderBy("cohort_month", "months_since")
  }

  val cohortLtvSql: String =
    """WITH o AS (
      |  SELECT o_custkey,
      |    EXTRACT(YEAR FROM o_orderdate) * 12 + EXTRACT(MONTH FROM o_orderdate) - 1 AS midx,
      |    o_totalprice
      |  FROM orders WHERE o_orderdate IS NOT NULL
      |), c AS (
      |  SELECT *, MIN(midx) OVER (PARTITION BY o_custkey) AS cohort_idx FROM o
      |), per_cust AS (
      |  SELECT cohort_idx, midx - cohort_idx AS months_since, o_custkey,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM c GROUP BY 1, 2, 3
      |)
      |SELECT make_date(CAST(cohort_idx // 12 AS INT), CAST(cohort_idx % 12 + 1 AS INT), 1) AS cohort_month,
      |  CAST(months_since AS BIGINT) AS months_since,
      |  COUNT(*) AS active_customers,
      |  CAST(SUM(rev) AS DOUBLE) AS revenue
      |FROM per_cust
      |GROUP BY cohort_idx, months_since
      |ORDER BY cohort_month, months_since""".stripMargin

  val basketPairsSql: String =
    """WITH li AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      |), pc AS (
      |  SELECT l_partkey, COUNT(*) AS part_orders FROM li GROUP BY l_partkey
      |), tot AS (
      |  SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li
      |), pairs AS (
      |  SELECT a.l_partkey AS part1, b.l_partkey AS part2, COUNT(*) AS pair_orders
      |  FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2
      |)
      |SELECT part1, part2, pair_orders,
      |  CAST(pair_orders AS DOUBLE) / CAST(n_orders AS DOUBLE) AS support,
      |  (CAST(pair_orders AS DOUBLE) * CAST(n_orders AS DOUBLE))
      |    / (CAST(p1.part_orders AS DOUBLE) * CAST(p2.part_orders AS DOUBLE)) AS lift
      |FROM pairs
      |CROSS JOIN tot
      |JOIN pc p1 ON part1 = p1.l_partkey
      |JOIN pc p2 ON part2 = p2.l_partkey
      |ORDER BY pair_orders DESC, part1 ASC, part2 ASC
      |LIMIT 100""".stripMargin
}
