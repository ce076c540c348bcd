package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LPA round-budget evidence run (r13): cluster recovery/purity vs
  * the semi-sync round budget on the planted spec corpora, plus
  * same-session wall times of `embedding_clusters` at each budget on
  * a real sf dir. The spec pins recovery at the SHIPPED budget; this
  * probe is the measurement that justifies the budget's VALUE — the
  * accuracy/cost trade is decided on evidence, not on the round
  * count the first implementation happened to use. Emits one flushed
  * JSON line per (corpus, budget). Usage:
  * `runMain graft.LpaProbe [sfDir]`. */
object LpaProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- the planted spec corpora (TextDedupSpec's generators) ----
    def jit(c: Int, i: Int, d: Int) =
      (((i * 2654435761L + d * 40503L + c) % 997L) / 997.0f) * 0.05f
    def corpus(sizes: Seq[Int]): DataFrame = {
      val bounds = sizes.scanLeft(0)(_ + _)
      (0 until sizes.sum).map { i =>
        val c = bounds.indexWhere(_ > i) - 1
        val base = Array.fill(8)(0.0f)
        base(c) = 1.0f
        (i.toLong, base.zipWithIndex.map { case (x, d) => x + jit(c, i, d) })
      }.toDF("vec_id", "embedding")
    }
    def planted(bounds: Seq[Int])(id: Long) = bounds.count(_ <= id) - 1
    def run(e: DataFrame, nlist: Int, k: Int, iters: Int): Map[Long, Long] = {
      val cents = operators.Similarity.kmeansCentroidsFrom(e, nlist, iters = 2)
      operators.Similarity.clustersFromGraph(
          operators.Similarity.annKnnGraphWith(spark, e, cents, k = k, nProbe = 2),
          lpaIters = iters)
        .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    }
    val dense = corpus(Seq(8, 6, 6))
    val sparse = corpus(Seq(30, 20, 10))
    for (iters <- 1 to 8) {
      val got = run(dense, nlist = 3, k = 8, iters)
      val byPlanted = got.groupBy { case (id, _) => planted(Seq(0, 8, 14))(id) }
        .map { case (pc, m) => pc -> m.values.toSet }
      val recovered = byPlanted.values.forall(_.size == 1) &&
        byPlanted.values.flatten.toSet.size == 3
      val sp = run(sparse, nlist = 3, k = 5, iters)
      val byLabel = sp.groupBy(_._2).map { case (l, m) =>
        l -> m.keys.map(planted(Seq(0, 30, 50))).toSet }
      val pure = byLabel.values.forall(_.size == 1)
      println(s"""{"corpus":"planted","iters":$iters,"dense_recovered":$recovered,""" +
        s""""sparse_pure":$pure,"sparse_labels":${byLabel.size}}""")
      System.out.flush()
    }

    // ---- wall time + output drift vs budget on the real corpus ----
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm the quantizer + graph memos so the timings isolate LPA
    operators.Similarity.annKnnGraph(spark, dir).count()
    val at8 = operators.Similarity.embeddingClusters(spark, dir, lpaIters = 8)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    for (iters <- Seq(1, 2, 3, 4, 6, 8)) {
      val ts = (1 to 2).map(_ => time(
        operators.Similarity.embeddingClusters(spark, dir, lpaIters = iters)
          .write.format("noop").mode("overwrite").save()))
      val got = operators.Similarity.embeddingClusters(spark, dir, lpaIters = iters)
        .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
      val agree = got.count { case (id, c) => at8.get(id).contains(c) }
      println(f"""{"corpus":"$dir","iters":$iters,"sec":${ts.min}%.3f,""" +
        f""""max_sec":${ts.max}%.3f,"agree_vs8":$agree,"n":${got.size}}""")
      System.out.flush()
    }
    spark.stop()
  }
}
