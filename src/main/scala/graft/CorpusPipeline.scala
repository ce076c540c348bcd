package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.operators.{Dedup, TextAnalysis}
import graft.sources.MartSink

/** The corpus-preparation DAG as one composable batch driver — the
  * documents-side sibling of `Pipeline` (which drives the reference's
  * event DAG): PII scrub + quality/language gate + exact dedup in ONE
  * scan and one shuffle, MinHash-LSH near-dup collapse over the
  * survivors, deterministic split assignment, and a split-partitioned
  * idempotent write.
  *
  * Scale design mirrors `Pipeline`: the cleaned survivor frame is
  * persisted once and feeds the near-dup banding, the component
  * collapse, and the final write (each would otherwise re-run the
  * scan+scrub subtree — measured on `dedup_substring` that identical
  * subtrees are NOT deduped by exchange reuse); the near-dup stage
  * sees only cleaned survivors (never the raw corpus); the write uses
  * dynamic partition overwrite so a rerun replaces its own partitions
  * byte-for-byte and nothing else. The only driver-side values are
  * the three census counts of the returned `Result`.
  */
object CorpusPipeline {

  final case class Result(
      inputDocs: Long,
      cleaned: Long,
      kept: Long,
      outPath: String)

  /** What an incremental refresh moved: batch size, gate survivors,
    * rows surviving the exact-vs-existing anti-join, and the final
    * kept count after both near-dup passes. `kept == 0` on a replayed
    * already-absorbed batch. `idCollisions` counts content-NEW batch
    * docs whose doc_id already exists in the corpus — they are
    * excluded (landing them would break doc_id uniqueness and the
    * id-hash split assignment downstream) and surfaced here so the
    * ingest can alert instead of silently corrupting the artifact. */
  final case class IncResult(
      batchDocs: Long,
      cleaned: Long,
      newDocs: Long,
      kept: Long,
      outPath: String,
      idCollisions: Long = 0L)

  /** @param maxRounds cap on near-dup label-propagation rounds.
    * @param requireConvergence true by default HERE (unlike the ad-hoc
    *   query surface): this pipeline persists a production artifact,
    *   so a component deeper than the round cap must fail the run
    *   loudly rather than silently write a partially-collapsed
    *   corpus. */
  def run(spark: SparkSession, inDir: String, outDir: String,
          minQuality: Double = 0.5,
          langs: Seq[String] = Seq("en", "es", "de", "fr"),
          estThreshold: Double = 0.4,
          maxRounds: Int = 20,
          requireConvergence: Boolean = true): Result = {
    val docs = Tables.documents(spark, inDir)
    val cleanedDf = cleanedStage(docs, minQuality, langs)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // parquet count() prunes to zero columns (footer metadata +
      // row-group counts) — the input census never re-reads the text
      val inputDocs = docs.count()
      val cleaned = cleanedDf.count()
      val pairs = Dedup.minhashLshFrom(spark,
          cleanedDf.select(col("doc_id"), col("clean_text").as("text")),
          estThreshold, Dedup.DefaultMaxBucket)
        .select(col("doc_a"), col("doc_b"))
      val kept = Dedup.nearDupCorpusFromPairs(cleanedDf, pairs,
          maxRounds, requireConvergence)
        .withColumn("split", TextAnalysis.splitCol(col("doc_id")))
        .withColumn("batch", lit("full"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        // count the frame this run produced — re-reading outDir would
        // also count stale partitions dynamic overwrite didn't touch
        val keptCount = kept.count()
        MartSink.writePartitioned(kept, outDir, Seq("batch", "split"))
        Result(inputDocs, cleaned, keptCount, outDir)
      } finally {
        kept.unpersist()
        ()
      }
    } finally {
      cleanedDf.unpersist()
      ()
    }
  }

  /** The full build + a DSIR selection stage — the batch mirror of
    * `DocStream.ingestChain`'s final gate, with the artifact contract
    * (`TextAnalysis.loadDsirModel` verifies the stamp; a swapped
    * model refuses instead of silently re-denominating every score).
    * Selection runs AFTER dedup, deliberately: selecting first would
    * spend the budget on near-duplicate copies of the most
    * target-like page (Gumbel keys differ per doc_id, so copies don't
    * collapse). The survivors' top-k by the shared Gumbel rule —
    * `TextAnalysis.sampleDsirWith`, the ONE selection definition live
    * and nightly — lands under a `batch=selected` partition with each
    * doc's log weight riding along for downstream mixing. Read
    * `dsir_budget_curve` before fixing k. */
  def runSelected(spark: SparkSession, inDir: String, outDir: String,
      modelPath: String, k: Int,
      minQuality: Double = 0.5,
      langs: Seq[String] = Seq("en", "es", "de", "fr"),
      estThreshold: Double = 0.4,
      maxRounds: Int = 20,
      requireConvergence: Boolean = true,
      seed: String = "s0"): Result = {
    val (ratio, _) = TextAnalysis.loadDsirModel(spark, modelPath)
    val docs = Tables.documents(spark, inDir)
    val cleanedDf = cleanedStage(docs, minQuality, langs)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val inputDocs = docs.count()
      val cleaned = cleanedDf.count()
      val pairs = Dedup.minhashLshFrom(spark,
          cleanedDf.select(col("doc_id"), col("clean_text").as("text")),
          estThreshold, Dedup.DefaultMaxBucket)
        .select(col("doc_a"), col("doc_b"))
      val kept = Dedup.nearDupCorpusFromPairs(cleanedDf, pairs,
          maxRounds, requireConvergence)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      val selected = TextAnalysis.sampleDsirWith(
          kept.select(col("doc_id"), col("source"), col("clean_text").as("text")),
          ratio, k, seed)
        .select(col("doc_id"), col("log_weight"), col("gumbel_key"))
      // the k-row selection broadcasts back onto the survivor frame
      val out = kept.join(broadcast(selected), Seq("doc_id"))
        .withColumn("split", TextAnalysis.splitCol(col("doc_id")))
        .withColumn("batch", lit("selected"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val keptCount = out.count()
        MartSink.writePartitioned(out, outDir, Seq("batch", "split"))
        Result(inputDocs, cleaned, keptCount, outDir)
      } finally {
        out.unpersist()
        ()
      }
    } finally {
      cleanedDf.unpersist()
      ()
    }
  }

  /** Scrub + gates + exact-dedup keeper window — the shared cleaning
    * stage. Gates come BEFORE the keeper window, and the window sees
    * only gate-passing rows: the window key is the SCRUBBED content
    * (so redaction-identical docs collapse) while the gates score the
    * raw text — windowing first would let a gate-failing min-id copy
    * knock out its whole content group even when a passing copy
    * exists. The keeper window is the stage's only shuffle, sized to
    * its input (the full corpus in `run`, just the batch in
    * `runIncremental`). */
  /** One-call corpus daily report — the scheduled composition the
    * reference's llm_daily_report.py cron runs (render only; the
    * HTTP/LLM transport stays out of scope): funnel + source mix over
    * the corpus dir, token-budget fill from the streaming log when
    * one exists. Returns (text, blockKitPayload) from ONE pass over
    * each query frame; an absent/empty token log degrades to the
    * renderer's "no data" rather than failing the report job.
    * `includeAgreement` adds the dedup method-agreement census
    * (`dedup_method_agreement_full`) as a "[dedup method agreement]"
    * section — opt-in because the census costs the member-generator
    * sweep on a cold session (it rides the shared member-pair frame,
    * so a session that already ran the dedup family pays ~nothing).
    * When `calibrationLogDir` is also set, the same census rows
    * append to the calibration run log under the execution date
    * (idempotent per date — a report rerun replaces its own rows),
    * so the one-off report number becomes a
    * `Dedup.calibrationTrendFromLog` trend for free. */
  def dailyReport(spark: SparkSession, dir: String, executionDate: String,
      tokenLogDir: Option[String] = None,
      includeAgreement: Boolean = false,
      calibrationLogDir: Option[String] = None): (String, String) = {
    val funnel = operators.TextAnalysis.corpusFunnel(spark, dir).collect().toSeq
    val mix = operators.TextAnalysis.sourceMix(spark, dir).collect().toSeq
    val agreement =
      if (!includeAgreement) Nil
      else {
        // ONE execution feeds both the log append and the report:
        // collect the (≤10-row) census first and rebuild the log
        // frame from the driver rows — appending the live frame
        // would re-run the member-generator sweep a second time.
        val census = operators.Dedup.methodAgreementFull(spark, dir)
        val rows = census.collect().toSeq
        calibrationLogDir.foreach { ld =>
          import scala.jdk.CollectionConverters._
          val frame = spark.createDataFrame(rows.asJava, census.schema)
          operators.Dedup.calibrationLogAppend(frame, ld, executionDate)
        }
        rows
      }
    // tokenLogSink creates the dir lazily on the first non-empty
    // batch, so an absent or still-empty dir must read as "no data".
    // Probe for parquet files FIRST rather than Try-swallowing every
    // read failure: a corrupted or permission-broken log must surface
    // as a failed report job, not silently render as "no data"
    def hasParquet(d: String): Boolean = {
      val root = new java.io.File(d)
      def walk(f: java.io.File): Boolean =
        if (f.isDirectory) Option(f.listFiles()).exists(_.exists(walk))
        else f.getName.endsWith(".parquet")
      root.exists() && walk(root)
    }
    val budget = tokenLogDir
      .filter(hasParquet)
      .map(d => streaming.DocStream.tokenBudgetFromLog(spark, d).collect().toSeq)
      .getOrElse(Nil)
    (Reporting.corpusReport(executionDate, funnel, mix, budget, agreement),
      Reporting.corpusReportPayload(executionDate, funnel, mix, budget, agreement))
  }

  private def cleanedStage(docs: DataFrame, minQuality: Double,
                           langs: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col("clean_text").cast("binary")))
    docs
      .select(col("doc_id"), col("lang"), col("n_chars"),
        TextAnalysis.piiScrubText(col("text")).as("clean_text"),
        TextAnalysis.qualityScoreCol.as("quality_score"),
        TextAnalysis.predictedLangCol.as("predicted_lang"))
      .filter(col("quality_score") >= minQuality &&
        col("predicted_lang").isin(langs.map(lit(_)): _*))
      .withColumn("keeper", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("keeper"))
      .select(col("doc_id"), col("lang"), col("predicted_lang"),
        col("quality_score"), col("n_chars"), col("clean_text"))
  }

  /** INCREMENTAL refresh — the daily-ingest form: only the incoming
    * batch is processed; the existing corpus artifact is read but
    * never reprocessed and never reshuffled. The 100 TB argument is
    * the same as `MartSink.mergeJdbc`'s: a daily batch is orders of
    * magnitude smaller than the corpus, so the refresh must cost
    * O(batch), not O(corpus).
    *
    *   1. the batch runs the SAME cleaning stage as the full build
    *      (one batch-sized shuffle);
    *   2. exact-dedup vs existing: anti-join against the existing
    *      corpus' content-HASH index — the corpus contributes 16
    *      bytes/row, never its text (Dedup.incremental pattern);
    *   3. near-dup vs existing: the batch's banded MinHash signatures
    *      BROADCAST against the existing index
    *      (Dedup.incrementalMinhashFrom — the corpus never
    *      reshuffles); batch docs over the estimate threshold drop;
    *   4. near-dup WITHIN the batch collapses via the same
    *      component machinery as the full build;
    *   5. survivors append under (batch=batchId, split) partitions —
    *      dynamic overwrite makes a replayed batch rewrite exactly
    *      its own partitions (idempotent), and split assignment is
    *      the deterministic doc_id hash, so appended batches keep the
    *      corpus split-stable.
    */
  def runIncremental(spark: SparkSession, incoming: DataFrame, outDir: String,
                     batchId: String,
                     minQuality: Double = 0.5,
                     langs: Seq[String] = Seq("en", "es", "de", "fr"),
                     estThreshold: Double = 0.4,
                     maxRounds: Int = 20,
                     requireConvergence: Boolean = true): IncResult = {
    require(batchId.nonEmpty && batchId.forall(c =>
      c.isLetterOrDigit || c == '-' || c == '_'), s"unsafe batch id: $batchId")
    // bootstrap: the very first batch has no corpus artifact to dedup
    // against — it runs as a batch-sized full build under its own
    // batch partition instead of throwing on the missing read
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val fs = outPath.getFileSystem(spark.sessionState.newHadoopConf())
    val existingOpt =
      if (fs.exists(outPath)) Some(spark.read.parquet(outDir)) else None
    val cleanedDf = cleanedStage(incoming, minQuality, langs)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val batchDocs = incoming.count()
      val cleaned = cleanedDf.count()
      val (fresh, collisionsDf) = existingOpt match {
        case None => (cleanedDf, None)
        case Some(existing) =>
          val exHashes = existing
            .select(md5(col("clean_text").cast("binary")).as("h")).distinct()
          // both guards ride the same corpus index scan: content-dup
          // rows are ABSORBED (the normal replay/ingest-overlap path);
          // content-NEW rows colliding on doc_id are EXCLUDED and
          // counted — two corpus rows sharing a doc_id would break key
          // uniqueness and the id-hash split downstream
          val contentNew = cleanedDf
            .withColumn("h", md5(col("clean_text").cast("binary")))
            .join(exHashes, Seq("h"), "left_anti")
            .drop("h")
          val exIds = existing.select(col("doc_id")).distinct()
          (contentNew.join(exIds, Seq("doc_id"), "left_anti"),
            Some(contentNew.join(exIds, Seq("doc_id"), "left_semi")))
      }
      val freshP = fresh.persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val newDocs = freshP.count()
        val idCollisions = collisionsDf.map(_.count()).getOrElse(0L)
        val sansExisting = existingOpt match {
          case None => freshP
          case Some(existing) =>
            val nearExisting = Dedup.incrementalMinhashFrom(spark,
                freshP.select(col("doc_id"), col("clean_text").as("text")),
                existing.select(col("doc_id"), col("clean_text").as("text")),
                estThreshold, Dedup.DefaultMaxBucket)
              .select(col("doc_in").as("doc_id")).distinct()
            freshP.join(nearExisting, Seq("doc_id"), "left_anti")
        }
        val pairs = Dedup.minhashLshFrom(spark,
            sansExisting.select(col("doc_id"), col("clean_text").as("text")),
            estThreshold, Dedup.DefaultMaxBucket)
          .select(col("doc_a"), col("doc_b"))
        val kept = Dedup.nearDupCorpusFromPairs(sansExisting, pairs,
            maxRounds, requireConvergence)
          .withColumn("split", TextAnalysis.splitCol(col("doc_id")))
          .withColumn("batch", lit(batchId))
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val keptCount = kept.count()
          MartSink.writePartitioned(kept, outDir, Seq("batch", "split"))
          IncResult(batchDocs, cleaned, newDocs, keptCount, outDir, idCollisions)
        } finally {
          kept.unpersist()
          ()
        }
      } finally {
        freshP.unpersist()
        ()
      }
    } finally {
      cleanedDf.unpersist()
      ()
    }
  }

  // ---- corpus backfill planner — the documents-side sibling of
  // Pipeline.planBackfill/backfill: which ingest BATCHES (hive-style
  // `batch=<id>` subdirs of the ingest dir) were never absorbed, and
  // which changed after absorption (late/re-delivered documents).

  /** `stale` is the actionable list; `vanished` batches are reported,
    * never re-ingested (their absorbed survivors stay — removing them
    * is an erasure decision, not an ingest side effect). */
  final case class CorpusBackfillPlan(neverIngested: Seq[String],
                                      changed: Seq[String],
                                      vanished: Seq[String]) {
    def stale: Seq[String] = (neverIngested ++ changed).sorted
  }

  /** Per-batch content state: row count + order-independent xor
    * fingerprint (the Pipeline.datesState pair, on documents). One
    * partition-discovering read of the whole ingest dir — the `batch`
    * column comes from the directory layout, so the census is one
    * map-combined aggregation, never a per-batch job loop. */
  private def ingestState(spark: SparkSession, ingestDir: String): DataFrame =
    spark.read.parquet(ingestDir)
      .groupBy(col("batch").cast("string").as("batch"))
      .agg(count(lit(1)).as("n_docs"),
        expr("bit_xor(xxhash64(doc_id, text))").as("fingerprint"))

  private def readIngestManifest(spark: SparkSession, manifestDir: String): DataFrame = {
    import spark.implicits._
    if (new java.io.File(manifestDir).exists())
      spark.read.parquet(manifestDir)
        .select(col("batch").cast("string"), col("n_docs"),
          col("fingerprint"), col("revision"))
    else Seq.empty[(String, Long, Long, Int)]
      .toDF("batch", "n_docs", "fingerprint", "revision")
  }

  def planCorpusBackfill(spark: SparkSession, ingestDir: String,
                         manifestDir: String): CorpusBackfillPlan = {
    val cur = ingestState(spark, ingestDir)
      .withColumnRenamed("n_docs", "cur_n").withColumnRenamed("fingerprint", "cur_fp")
    val man = readIngestManifest(spark, manifestDir)
      .withColumnRenamed("n_docs", "man_n").withColumnRenamed("fingerprint", "man_fp")
    val joined = cur.join(man, Seq("batch"), "full_outer")
      .select(col("batch"), col("cur_n"), col("cur_fp"), col("man_n"), col("man_fp"))
      .collect()
    CorpusBackfillPlan(
      joined.filter(r => r.isNullAt(3)).map(_.getString(0)).sorted.toSeq,
      joined.filter(r => !r.isNullAt(1) && !r.isNullAt(3) &&
        (r.getLong(1) != r.getLong(3) || r.getLong(2) != r.getLong(4)))
        .map(_.getString(0)).sorted.toSeq,
      joined.filter(r => r.isNullAt(1) && !r.isNullAt(3)).map(_.getString(0)).sorted.toSeq)
  }

  /** Plan + absorb + stamp. A CHANGED batch re-ingests under a
    * REVISION-SUFFIXED id (`<batch>_r<n>`): the incremental writer's
    * dynamic overwrite replaces exactly the partitions it writes, so
    * re-landing a changed batch under its ORIGINAL id would clobber
    * the batch's previously-absorbed survivors with only the delta —
    * the revision id makes each absorption append-only while the
    * exact/near-dup anti-joins still guarantee only genuinely new
    * content lands. An identical replay ships zero rows (absorbed),
    * and the manifest row (keyed by the SOURCE batch id) advances its
    * fingerprint + revision only after the ingest returns. */
  def corpusBackfill(spark: SparkSession, ingestDir: String, outDir: String,
                     manifestDir: String,
                     minQuality: Double = 0.5,
                     langs: Seq[String] = Seq("en", "es", "de", "fr"),
                     estThreshold: Double = 0.4):
      (CorpusBackfillPlan, Seq[(String, IncResult)]) = {
    import spark.implicits._
    val plan = planCorpusBackfill(spark, ingestDir, manifestDir)
    if (plan.stale.isEmpty) (plan, Nil)
    else {
      val revs = readIngestManifest(spark, manifestDir)
        .select("batch", "revision").collect()
        .map(r => r.getString(0) -> r.getInt(1)).toMap
      // ONE ingest-dir census serves every stamp (the events-side
      // Pipeline.backfill census-carry discipline): the absorb loop
      // never mutates the ingest dir, so re-scanning the WHOLE dir
      // once per stale batch (B full scans for B batches) bought
      // nothing but I/O. |stale| rows collected.
      val census = ingestState(spark, ingestDir)
        .filter(col("batch").isin(plan.stale: _*))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val results = plan.stale.map { b =>
        val rev = revs.getOrElse(b, 0) + 1
        val ingestId = if (rev == 1) b else s"${b}_r$rev"
        val batchDf = spark.read.parquet(s"$ingestDir/batch=$b")
        val r = runIncremental(spark, batchDf, outDir, ingestId,
          minQuality = minQuality, langs = langs, estThreshold = estThreshold)
        val (nDocs, fp) = census(b)
        val stamp = Seq((b, nDocs, fp, rev))
          .toDF("batch", "n_docs", "fingerprint", "revision")
        MartSink.writePartitioned(stamp, manifestDir, Seq("batch"))
        b -> r
      }
      (plan, results)
    }
  }
}
