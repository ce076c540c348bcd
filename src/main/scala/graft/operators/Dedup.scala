package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication operators for LLM-training-data pipelines over the
  * `documents` table (SURVEY.md §2D): exact, n-gram Jaccard,
  * MinHash+LSH, SimHash.
  *
  * Scale design: the only all-pairs computation is inside a BLOCK —
  * exact dedup is a hash groupBy (one shuffle); Jaccard pairs are
  * blocked by language (in production: by LSH band, as in
  * `minhashLsh`); MinHash/SimHash candidates come from band-bucket
  * joins, never an unblocked self-join. All signatures are computed
  * with higher-order functions on arrays — no UDFs, no explode of
  * shingles (the per-doc signature is folded in a single projection).
  */
object Dedup {

  /** Whitespace tokens. */
  private def toks(c: Column): Column = split(trim(c), "\\s+")

  /** Shingles hashed to sorted distinct longs — set operations on long
    * arrays (merge pass) instead of string arrays (per-pair hash-set
    * build). Hashing is injective in practice at shingle-set sizes, so
    * intersection/union cardinalities — and hence Jaccard — are
    * unchanged. One fused native pass (graft.functions
    * .TrigramShingleHashes): the HOF chain materialized every trigram
    * as a string and ran two distinct passes per document. */
  private def shingleHashes(c: Column): Column =
    call_function("trigram_hashes", c)

  /** Exact dedup: group by content hash, keep min doc_id.
    * One shuffle on the 128-bit hash — the canonical 100 TB exact-dedup
    * plan (hash is computed map-side; the shuffle carries only
    * (hash, id)). */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text").cast("binary")).as("text_md5"))
      .agg(
        count(lit(1)).as("dup_count"),
        min(col("doc_id")).as("keeper_doc_id"))
      .orderBy("text_md5")

  val exactSql: String =
    """SELECT md5(text) AS text_md5, COUNT(*) AS dup_count, MIN(doc_id) AS keeper_doc_id
      |FROM documents GROUP BY 1 ORDER BY text_md5""".stripMargin

  /** The deduplicated corpus itself: one kept document per distinct
    * content hash (min doc_id wins). This is the consumable output of
    * exact dedup — `exact()` reports the groups; this returns the
    * surviving rows. Implemented as a keeper-id window filter, one
    * shuffle on the content hash. */
  def dedupedCorpus(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col("text").cast("binary")))
    Tables.documents(spark, dir)
      .withColumn("keeper", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("keeper"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  val dedupedCorpusSql: String =
    """SELECT doc_id, lang, source, n_chars
      |FROM (
      |  SELECT doc_id, lang, source, n_chars,
      |    MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
      |  FROM documents
      |) t WHERE doc_id = keeper
      |ORDER BY doc_id""".stripMargin

  /** Near-dup pairs by exact 3-gram Jaccard within a language block.
    * The block bounds the self-join (at scale the block key would be an
    * LSH bucket — see minhashLsh — this operator is the exact verifier
    * that runs on candidate pairs). */
  /** @param broadcastBuild broadcast the build side (default): right
    *   when this runs as the exact verifier over bounded candidate
    *   blocks. Pass false for a pre-blocked corpus too large to
    *   broadcast — the join falls back to a shuffle on the block key
    *   (then the caller must ensure block-key cardinality ≫ cores,
    *   e.g. LSH band buckets, or parallelism collapses). */
  def ngramJaccard(spark: SparkSession, dir: String, threshold: Double = 0.2,
                   broadcastBuild: Boolean = true): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // repartition before the heavy per-row work: the corpus may arrive
    // in a handful of splits (here: one parquet file), which would run
    // shingling — and every probe of the broadcast join — in one task.
    // The shuffle moves only raw text; the pair scoring downstream is
    // orders of magnitude heavier.
    val nPart = spark.sessionState.conf.numShufflePartitions
    val d = Tables.documents(spark, dir)
      .repartition(nPart, col("doc_id"))
      .select(col("doc_id"), col("lang"), shingleHashes(col("text")).as("sh"))
      .withColumn("n", size(col("sh")))
    val a = d.as("a")
    val b = d.as("b")
    // |A∩B| in one merge pass (native expression); |A∪B| = |A|+|B|-|A∩B|
    val inter = expr("sorted_intersect_count(a.sh, b.sh)")
    val jac = inter.cast("double") /
      (col("a.n") + col("b.n") - inter).cast("double")
    // Length prefilter (lossless): J(A,B) ≤ min/max, so any pair with
    // min(|A|,|B|) < τ·max(|A|,|B|) can never reach the threshold —
    // pruned BEFORE the merge-count runs. The build side is broadcast:
    // a lang block's dictionary is bounded (this operator is the exact
    // verifier; unbounded corpora go through minhashLsh first), and a
    // broadcast join keeps full parallelism where a shuffle join would
    // collapse to one partition per distinct lang key.
    a.join(if (broadcastBuild) broadcast(b) else b,
        col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id") &&
        least(col("a.n"), col("b.n")).cast("double") >=
          lit(threshold) * greatest(col("a.n"), col("b.n")).cast("double"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.lang").as("lang"), jac.as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  val ngramJaccardSql: String = {
    val sh =
      """list_distinct(CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 3
        |  THEN list_transform(range(1, len(string_split_regex(trim(text), '\s+')) - 1),
        |       i -> string_split_regex(trim(text), '\s+')[i] || ' ' || string_split_regex(trim(text), '\s+')[i+1] || ' ' || string_split_regex(trim(text), '\s+')[i+2])
        |  ELSE string_split_regex(trim(text), '\s+') END)""".stripMargin
    s"""WITH d AS (SELECT doc_id, lang, $sh AS sh FROM documents)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang AS lang,
       |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
       |FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
       |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.2
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Number of MinHash permutations / LSH bands (16 bands × 4 rows —
    * catches Jaccard ≳ 0.5 with high probability). Permutation
    * parameters live in the native expression
    * (graft.functions.MinHashSignature — a fused single pass; the
    * higher-order-function form inlined the shingle-hash subtree 64
    * times, re-hashing every shingle once per permutation). */
  val NumPerms = 64
  val NumBands = 16
  val RowsPerBand = 4

  /** Per-doc MinHash signature: fused shingle hashing, then one fused
    * 64-permutation pass (both native codegen'd expressions). */
  private def signature(text: Column): Column =
    call_function("minhash_sig", call_function("trigram_hashes", text))

  /** MinHash + LSH banding: shingle → 64 minhashes → 16 band keys →
    * bucket self-join → candidate pairs with estimated Jaccard
    * (signature agreement ratio). At 100 TB this is THE near-dup plan:
    * the shuffle key is (band_idx, band_hash) so only colliding docs
    * ever meet; no unblocked pair enumeration exists anywhere.
    * Oracle: rows-only (approximate operator, no SQL equivalent). */
  /** @param maxBucket skew guard: a band bucket larger than this is a
    *   degenerate block (e.g. a boilerplate/empty-text cluster) whose
    *   O(bucket²) pairs add no near-dup information beyond what exact
    *   dedup already collapses — such buckets are dropped rather than
    *   allowed to dominate the stage. */
  def minhashLsh(spark: SparkSession, dir: String, estThreshold: Double = 0.4,
                 maxBucket: Int = 1024): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // repartition raw docs so signature computation parallelizes even
    // from a single input split (see ngramJaccard)
    val docs = Tables.documents(spark, dir)
      .repartition(spark.sessionState.conf.numShufflePartitions, col("doc_id"))
      .select(col("doc_id"), signature(col("text")).as("sig"))
    val bands = docs.select(
      col("doc_id"), col("sig"),
      explode(transform(sequence(lit(0), lit(NumBands - 1)), b =>
        struct(b.as("band_idx"),
          xxhash64(slice(col("sig"), b * RowsPerBand + 1, lit(RowsPerBand)))
            .as("band_hash")))).as("band"))
      .select(col("doc_id"), col("sig"), col("band.band_idx"), col("band.band_hash"))
    // Pairs are enumerated INSIDE each band bucket from the grouped
    // member list: signatures are computed once and shuffled once (the
    // self-join formulation planned the fused signature subtree into
    // BOTH join sides — twice the dominant CPU cost — and leaned on a
    // broadcast). Bucket size is bounded by the banding design, so the
    // per-bucket list and its pair expansion are bounded too.
    val pairs = bands
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(collect_list(struct(col("doc_id"), col("sig"))).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
      .select(explode(expr(
        """filter(
          |  flatten(transform(members, x -> transform(members, y ->
          |    struct(x.doc_id AS doc_a, y.doc_id AS doc_b, x.sig AS sig_a, y.sig AS sig_b)))),
          |  p -> p.doc_a < p.doc_b)""".stripMargin)).as("p"))
    val agree = size(filter(zip_with(col("p.sig_a"), col("p.sig_b"), (x, y) => when(x === y, 1)), x => x.isNotNull))
    pairs
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        (agree.cast("double") / lit(NumPerms.toDouble)).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= estThreshold)
      .orderBy("doc_a", "doc_b")
  }

  /** The consumable output of NEAR-dup dedup: one kept document per
    * near-duplicate cluster (min doc_id wins), where clusters are the
    * connected components of the `minhashLsh` candidate-pair graph.
    *
    * Components are resolved with iterated min-id label propagation —
    * the standard bounded-rounds Spark CC: each round every doc's
    * keeper becomes the min over itself and its neighbors' keepers
    * (one join + one grouped min = two shuffles per round, labels are
    * (doc_id, keeper) pairs only). Near-dup clusters have tiny
    * diameters in practice, so `rounds` rounds converge; docs chained
    * further than `rounds` hops from their component min would keep a
    * non-minimal keeper (each still elects SOME keeper — the dedup
    * stays sound, merely slightly less aggressive). At 100 TB each
    * round's frames should be checkpointed to cut lineage; at a few
    * rounds the plan stays compact. */
  def nearDupCorpus(spark: SparkSession, dir: String, estThreshold: Double = 0.4,
                    rounds: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    nearDupCorpusFromPairs(docs,
      minhashLsh(spark, dir, estThreshold).select(col("doc_a"), col("doc_b")), rounds)
  }

  /** The component-collapse core over ANY candidate-pair graph —
    * feed it `minhashLsh`, `simhash`, `ngramJaccard` or
    * `Similarity.cosineNearDup` pairs (renamed to doc_a/doc_b). */
  def nearDupCorpusFromPairs(docs: DataFrame, pairs: DataFrame,
                             rounds: Int = 3): DataFrame = {
    // undirected adjacency: propagate keeper ids both ways.
    // localCheckpoint materializes the pair graph ONCE and cuts its
    // lineage — every propagation round joins the edges again, and
    // without the cut the (expensive) candidate-generation subtree
    // would be re-planned into each round. The edge list is tiny
    // relative to the corpus (near-dup pairs only). On a real cluster
    // prefer a reliable checkpoint dir (localCheckpoint does not
    // survive executor loss).
    val edges = pairs.unionByName(
        pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .localCheckpoint()
    var labels = docs.select(col("doc_id"), col("doc_id").as("keeper"))
    var r = 0
    while (r < rounds) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("doc_id", "nbr"), col("doc_b") === col("nbr"))
        .groupBy(col("doc_a").as("doc_id"))
        .agg(min(col("keeper")).as("nbr_keeper"))
      labels = labels.join(viaNeighbors, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("keeper"), coalesce(col("nbr_keeper"), col("keeper"))).as("keeper"))
      r += 1
    }
    docs.join(labels.filter(col("doc_id") === col("keeper")), Seq("doc_id"))
      .select(docs.columns.map(col).toSeq: _*)
      .orderBy("doc_id")
  }

  /** 64-bit SimHash near-dup: token hashes vote per bit; candidates
    * from 16-bit band blocking; pairs kept at Hamming distance ≤ 7.
    * Oracle: rows-only. */
  def simhash(spark: SparkSession, dir: String, maxHamming: Int = 7,
              maxBucket: Int = 1024): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // bit b of the simhash = majority vote of token-hash bit b — one
    // fused pass in the native expression (the higher-order-function
    // form allocated a 64-wide array per token).
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        call_function("simhash64", transform(toks(col("text")), t => xxhash64(t))).as("simhash"))
    val banded = docs.select(col("doc_id"), col("simhash"),
      expr("explode(transform(sequence(0, 3), b -> struct(b as band_idx, shiftright(simhash, b * 16) & 65535 as band_val)))").as("band"))
      .select(col("doc_id"), col("simhash"), col("band.band_idx"), col("band.band_val"))
    // grouped-bucket pair enumeration (see minhashLsh): one simhash
    // computation, one shuffle, bounded per-bucket expansion
    banded
      .groupBy(col("band_idx"), col("band_val"))
      .agg(collect_list(struct(col("doc_id"), col("simhash"))).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
      .select(explode(expr(
        """filter(
          |  flatten(transform(members, x -> transform(members, y ->
          |    struct(x.doc_id AS doc_a, y.doc_id AS doc_b, x.simhash AS h_a, y.simhash AS h_b)))),
          |  p -> p.doc_a < p.doc_b)""".stripMargin)).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        bit_count(col("p.h_a").bitwiseXOR(col("p.h_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }
}
