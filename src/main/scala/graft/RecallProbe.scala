package graft

/** ANN evidence run: measured recall@k of every approximate index
  * against the brute-force ground truth on the same corpus, with
  * same-session wall times — the quality/latency tradeoff table the
  * recall-floor specs pin only a lower bound of. Emits one flushed
  * JSON line per index. Usage: `runMain graft.RecallProbe [sfDir]`. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("ann_cosine_topk", "ann_lsh_bucketed", "ann_ivf_topk",
      "ann_ivf_kmeans", "ann_pq_topk", "ann_ivfpq_topk")
    def pairs(n: String): Set[(Long, Long)] =
      SparkEntry.queries(n)(spark, dir).select("query_id", "cand_id").collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    // warm scans + codegen so the timed pass measures steady state
    names.foreach(n => SparkEntry.queries(n)(spark, dir)
      .write.format("noop").mode("overwrite").save())
    val truth = pairs("ann_cosine_topk")
    // the dial each index family trades recall against compute with:
    // probes (fraction of cells scanned) and refine (exact re-score
    // shortlist) — recall is tuned at QUERY time, never by re-indexing
    val tuned: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "ann_ivf_topk@nprobe=5" ->
        (() => operators.Similarity.ivfTopK(spark, dir, nProbe = 5)),
      "ann_ivf_kmeans@nprobe=5" ->
        (() => operators.Similarity.ivfTopKKmeans(spark, dir, nProbe = 5)),
      "ann_pq_topk@refine=96" ->
        (() => operators.Similarity.pqTopK(spark, dir, refine = 96)),
      "ann_ivfpq_topk@nprobe=6,refine=96" ->
        (() => operators.Similarity.ivfpqTopK(spark, dir, nProbe = 6, refine = 96)))
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "cand_id").collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    val runs: Seq[(String, () => Set[(Long, Long)])] =
      names.map(n => n -> (() => pairs(n))) ++
        tuned.map { case (n, f) => n -> (() => pairsOf(f())) }
    runs.foreach { case (n, f) =>
      val t0 = System.nanoTime()
      val p = f()
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = p.intersect(truth).size.toDouble / truth.size
      println("{\"index\":\"" + n + "\",\"recall_at_k\":" + f"$recall%.3f" +
        ",\"sec\":" + f"$sec%.3f" + ",\"pairs\":" + p.size + "}")
      System.out.flush()
    }
    spark.stop()
  }
}
