package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN index MAINTENANCE loop — the operational piece that keeps a
  * persisted IVF-PQ index (`Similarity.saveIvfPqIndex`) serving well
  * as the corpus grows: deltas append as code rows (the corpus'
  * float vectors never reshuffle and the index never rebuilds per
  * ingest — the same O(batch) contract as `CorpusPipeline
  * .runIncremental`), a DRIFT detector compares live per-cell
  * occupancy against the training-time histogram, and when drift
  * crosses the threshold the index re-trains from the live corpus —
  * recall is bought back by re-training exactly when the trained
  * cells stop describing the data, not on a blind schedule.
  *
  * Why occupancy drift is the right trigger: IVF recall degrades when
  * vectors concentrate where training saw nothing (new topics, new
  * embedding model) — those vectors pile into a few nearest stale
  * cells, the probe's candidate lists bloat and mis-rank (the PQ
  * codebooks quantize the new directions to near-constant codes), and
  * no amount of nProbe fixes cells that don't tile the new region.
  * That failure mode IS a shift of the cell-occupancy distribution,
  * measured here as total-variation distance — 0 when the live
  * corpus matches training, 1 when it lives entirely off the trained
  * cells. The detector reads one histogram per side (nlist-sized —
  * driver-trivial at any corpus scale).
  */
object IndexMaintenance {

  final case class DriftReport(totalTrain: Long, totalNow: Long,
                               tvDistance: Double,
                               errTrain: Double, errNow: Double,
                               errRatio: Double, retrain: Boolean)

  final case class MaintainResult(drift: DriftReport, retrained: Boolean)

  /** Append a delta vector batch to the persisted index: dedup within
    * the batch, encode cell + PQ codes against the LOADED metadata
    * (narrow projections — the streaming encoder's exact
    * construction, `EmbeddingStream.encode`, with the float kept for
    * the refine stage), anti-join already-indexed ids so a replayed
    * batch appends nothing (idempotent), and append the survivors to
    * the codes table. Returns the number of rows appended. */
  def appendDelta(spark: SparkSession, indexPath: String, vecs: DataFrame): Long = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val (cents, books) = Similarity.loadIndexMeta(spark, indexPath)
    val existing = spark.read.parquet(s"$indexPath/codes").select(col("cand_id"))
    val fresh = Similarity.withNormalized(
        vecs.select(col("vec_id"), col("embedding")).dropDuplicates("vec_id"),
        "embedding", "nv")
      .select(col("vec_id").as("cand_id"), col("nv").as("c_emb"),
        call_function("pq_encode", col("nv"),
          Similarity.flatBooksLit(books), lit(books.length)).as("codes"))
      .withColumn("cell", explode(Similarity.nearestCellsCol(col("c_emb"), cents, 1)))
      .join(existing, Seq("cand_id"), "left_anti")
      .localCheckpoint() // two consumers: the census and the append
    val n = fresh.count()
    if (n > 0) fresh.write.mode("append").parquet(s"$indexPath/codes")
    n
  }

  /** Streaming leg: every micro-batch of the vector feed appends
    * through `appendDelta` — the anti-join makes at-least-once
    * delivery effectively-once in the codes table. */
  def deltaSink(vecs: DataFrame, indexPath: String,
                checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        appendDelta(batch.sparkSession, indexPath, batch)
        ()
      }
      .start()

  /** Drift of the live codes table vs the training-time baseline, on
    * two complementary signals (both nlist-sized aggregates):
    *
    *  - OCCUPANCY: total-variation distance between the per-cell mass
    *    distributions (0 = unchanged, 1 = fully relocated) — catches
    *    data concentrating where training saw little;
    *  - QUANTIZATION ERROR: corpus-mean squared L2 to the assigned
    *    centroid, now vs train — catches ORTHOGONAL drift, where new
    *    vectors scatter across stale cells by noise (occupancy barely
    *    moves) but every one of them sits far from its centroid.
    *
    * Trigger = tv ≥ `threshold` OR errNow/errTrain ≥ `errFactor`. */
  def drift(spark: SparkSession, indexPath: String,
            threshold: Double = 0.2, errFactor: Double = 2.0): DriftReport = {
    val train = spark.read.parquet(s"$indexPath/stats").collect()
      .map(r => r.getAs[Int]("cell") ->
        ((r.getAs[Long]("n_train"), r.getAs[Double]("err_train")))).toMap
    val now = Similarity.indexCellStats(spark, indexPath).collect()
      .map(r => r.getAs[Int]("cell") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("err")))).toMap
    val tTot = math.max(train.values.map(_._1).sum, 1L).toDouble
    val nTot = math.max(now.values.map(_._1).sum, 1L).toDouble
    val tv = 0.5 * (train.keySet ++ now.keySet).toSeq.map(c =>
      math.abs(train.get(c).map(_._1).getOrElse(0L) / tTot -
        now.get(c).map(_._1).getOrElse(0L) / nTot)).sum
    def meanErr(m: Map[Int, (Long, Double)], tot: Double): Double =
      m.values.map { case (n, e) => n * e }.sum / tot
    val errTrain = meanErr(train, tTot)
    val errNow = meanErr(now, nTot)
    val ratio = errNow / math.max(errTrain, 1e-12)
    DriftReport(train.values.map(_._1).sum, now.values.map(_._1).sum,
      tv, errTrain, errNow, ratio,
      retrain = tv >= threshold || ratio >= errFactor)
  }

  /** One maintenance tick: measure drift; past the threshold,
    * re-train the whole artifact from the LIVE corpus (original
    * vectors + absorbed deltas — the float source of truth; the code
    * table alone cannot re-train). Centroids AND codebooks re-learn,
    * so both the cell tiling and the quantizer track the drifted
    * distribution; the stats baseline resets with them. Below the
    * threshold the tick is read-only (two histogram scans). */
  def maintain(corpus: DataFrame, indexPath: String, threshold: Double = 0.2,
               errFactor: Double = 2.0, nlist: Int = 10, m: Int = 8,
               ksub: Int = 16, iters: Int = 2): MaintainResult = {
    val d = drift(corpus.sparkSession, indexPath, threshold, errFactor)
    if (d.retrain)
      Similarity.saveIvfPqIndexFrom(corpus, indexPath, nlist, m, ksub, iters)
    MaintainResult(d, d.retrain)
  }

  /** The maintenance tick with the ENCODER-side trigger composed in:
    * an un-L2'd deploy or a pooling change corrupts the feed BEFORE
    * the index's own occupancy/error statistics accumulate enough
    * drifted mass to fire — the live norm watch
    * (`EmbeddingStream.normLogSink`) sees it within one micro-batch.
    * Trigger = the index's own (occupancy-TV OR err-ratio) OR the
    * norm log's LATEST batch flagging at `normTv` — one loop for
    * index drift and encoder drift, so the two alarms can't be
    * triaged separately into inaction. An absent or still-empty norm
    * log contributes nothing (the dir is probed for parquet files
    * FIRST — a corrupted log still fails loudly rather than reading
    * as "no drift"). */
  def maintainWithNormLog(corpus: DataFrame, indexPath: String, normLogDir: String,
      threshold: Double = 0.2, errFactor: Double = 2.0, normTv: Double = 0.25,
      nlist: Int = 10, m: Int = 8, ksub: Int = 16, iters: Int = 2): MaintainResult = {
    val spark = corpus.sparkSession
    def hasParquet(d: String): Boolean = {
      val root = new java.io.File(d)
      def walk(f: java.io.File): Boolean =
        if (f.isDirectory) Option(f.listFiles()).exists(_.exists(walk))
        else f.getName.endsWith(".parquet")
      root.exists() && walk(root)
    }
    val encoderDrift = hasParquet(normLogDir) &&
      graft.streaming.EmbeddingStream.normDriftFromLog(spark, normLogDir, normTv)
        .orderBy(org.apache.spark.sql.functions.desc("batch_id")).limit(1)
        .collect().exists(_.getAs[Boolean]("drift_flag"))
    val d0 = drift(spark, indexPath, threshold, errFactor)
    val d = d0.copy(retrain = d0.retrain || encoderDrift)
    if (d.retrain)
      Similarity.saveIvfPqIndexFrom(corpus, indexPath, nlist, m, ksub, iters)
    MaintainResult(d, d.retrain)
  }
}
