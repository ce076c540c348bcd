package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.EventMarts.enriched

/** Graph centrality over the product browse graph — PageRank on the
  * directed view-transition graph (product A viewed, then product B
  * by the same user within the session gap). The popularity measure
  * that counts being REACHED FROM popular places, which plain view
  * counts (product_top_n) and co-occurrence (coview/item_cf) don't
  * capture.
  *
  * Scale shape: the edge list aggregates once (events → per-user lag
  * pairs under the session-gap predicate → (src, dst) weights) and is
  * localCheckpoint-pinned — every iteration reuses it. One PageRank
  * iteration = ranks ⋈ edges on src (rank frame is node-dimension
  * scale, edges fact scale, both hash-partitioned on the join key) +
  * one dst rollup; the dangling mass rides the plan as a 1-row
  * broadcast aggregate (the scalar-subquery pattern — ZERO driver
  * round-trips per round; the checkpoint materialization is the only
  * job, and the convergence delta is computed once at the end, not
  * per round). Ranks re-checkpoint per
  * iteration to truncate lineage, exactly like the Lloyd loop in
  * ann_ivf_kmeans. Iteration count is fixed (power iteration
  * converges geometrically at damping rate); convergence delta is
  * surfaced in the output for observability.
  *
  * rows-only by design: iterated float arithmetic (and partial-sum
  * order inside each rollup) is not bit-reproducible in a DuckDB
  * re-expression; the spec pins a driver-side exact power iteration
  * within 1e-9 on a crafted graph plus structural invariants at sf.
  */
object Graph {

  val Damping = 0.85
  val GapSeconds = 1800L

  /** Directed product-transition edges: consecutive VIEW events by
    * one user within the session gap, product changing. One user
    * exchange for the lag window, then the (src, dst) rollup. */
  def productEdgesFrom(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("event_epoch", "event_id")
    e.filter(col("event_type") === "view" && col("product_k").isNotNull &&
        col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"), col("event_epoch"), col("product_k"))
      .withColumn("prev_k", lag("product_k", 1).over(w))
      .withColumn("prev_epoch", lag("event_epoch", 1).over(w))
      .filter(col("prev_k").isNotNull &&
        col("event_epoch") - col("prev_epoch") <= GapSeconds &&
        col("prev_k") =!= col("product_k"))
      .groupBy(col("prev_k").as("src"), col("product_k").as("dst"))
      .agg(count(lit(1)).as("weight"))
  }

  def productPagerank(spark: SparkSession, dir: String,
      iterations: Int = 15): DataFrame =
    pagerankFrom(productEdgesFrom(enriched(spark, dir)), iterations)

  /** Weighted PageRank over an (src, dst, weight) edge frame.
    * Returns (node, pagerank, out_weight, in_edges, out_edges,
    * last_delta) with Σ pagerank = 1 (dangling mass redistributed
    * uniformly each round). */
  def pagerankFrom(edges: DataFrame, iterations: Int = 15,
      damping: Double = Damping): DataFrame = {
    val e = edges.localCheckpoint() // every iteration reuses the edge frame
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "empty graph")
    val outW = e.groupBy(col("src").as("node"))
      .agg(sum(col("weight")).cast("double").as("out_weight"))
    // node base frame: out_weight NULL marks a dangling node
    val base = nodes.join(outW, Seq("node"), "left").localCheckpoint()
    var ranks = base.select(col("node"), col("out_weight"),
      lit(1.0 / n.toDouble).as("rank"))
    var delta = Double.NaN
    for (i <- 1 to iterations) {
      // the dangling mass rides the iteration plan as a ONE-ROW
      // broadcast (scalar-subquery pattern) — zero driver round-trips
      // per round; the checkpoint materialization is the only job
      val dang = ranks.filter(col("out_weight").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dangling"))
      val contribs = ranks.filter(col("out_weight").isNotNull)
        .join(e, ranks("node") === e("src"))
        .select(col("dst").as("node"),
          (col("rank") * col("weight").cast("double") / col("out_weight")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      val next = base.join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"), col("out_weight"),
          (lit((1.0 - damping) / n.toDouble) +
            lit(damping) * (coalesce(col("inflow"), lit(0.0)) +
              col("dangling") / lit(n.toDouble))).as("rank"))
        .localCheckpoint()
      // the convergence reading is observability, not control flow —
      // only the FINAL round pays its extra join+aggregate (computing
      // it every round nearly doubled the per-iteration job count)
      if (i == iterations)
        delta = next.as("a").join(ranks.as("b"), "node")
          .agg(coalesce(sum(abs(col("a.rank") - col("b.rank"))), lit(0.0)))
          .collect().head.getDouble(0)
      ranks = next
    }
    val inDeg = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_edges"))
    val outDeg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_edges"))
    ranks.join(inDeg, Seq("node"), "left").join(outDeg, Seq("node"), "left")
      .select(col("node").as("product_k"), col("rank").as("pagerank"),
        coalesce(col("out_weight"), lit(0.0)).as("out_weight"),
        coalesce(col("in_edges"), lit(0L)).as("in_edges"),
        coalesce(col("out_edges"), lit(0L)).as("out_edges"),
        lit(delta).as("last_delta"))
      .orderBy(desc("pagerank"), asc("product_k"))
  }
}
