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
