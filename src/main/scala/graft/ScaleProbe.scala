package graft

import org.apache.spark.sql.functions._

/** Scale proof-point: generate a ~10× corpus (1M events via
  * EventGenerator; 50k documents by replicating sf0.1 docs under a
  * per-replica character cipher) and time the headline marts + dedup
  * family at sf0.1 vs the generated sf~1, emitting per-query flushed
  * JSON lines with the scaling factor.
  *
  * The document replicas are made pairwise-disjoint across replicas
  * (a seeded bijective a-z permutation per replica — see
  * `cipherAlphabets` for why this replaced the r8-r11 token
  * suffixes), so the duplicate DENSITY of the corpus is unchanged —
  * a naive ×10 copy would give every doc 10 exact near-twins and
  * quadratically inflate the in-bucket pair work, measuring
  * densification, not scale; the cipher preserves each replica's
  * token-level AND character-level pair structure exactly. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--")).toSet
    val pos = args.filterNot(_.startsWith("--"))
    val small = "/root/testdata/sf0.1"
    val big = pos.headOption.getOrElse("/tmp/graft_sf1")
    val deep = pos.lift(1).getOrElse("/tmp/graft_sf10")
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** Disjoint-replica corpus builder, shared by the 10× and 100×
      * (`--deep`) dirs: documents replicate under a PER-REPLICA
      * CHARACTER CIPHER (a deterministic seeded a-z permutation per
      * rep, space fixed, rep 0 identity), embeddings replicate
      * vec_id-remapped with vectors unchanged (linear-scoring ops
      * only; pair enumerators are excluded from both probe lists),
      * events come from the generator at n×100k.
      *
      * Why a cipher and not the r8-r11 per-token `_rep` suffixes: a
      * bijective char map preserves EVERY within-replica structure
      * the dedup family measures — token equality (jaccard/minhash
      * axes), document lengths AND exact character edit distances
      * (the PassJoin axis) — so each replica carries exactly the base
      * corpus's pair structure: duplicate density is unchanged BY
      * CONSTRUCTION, not approximately. The suffixes preserved only
      * the token-level part; at the character grain they injected a
      * shared `_k` substring into every token, so PassJoin candidates
      * densified ~1.9× at 10 reps and ~8.9× at 100 (measured r12:
      * 53k → 990k → 47.2M bounded candidates where linear structure
      * gives 53k → 530k → 5.3M) — the "third-decade constant" the
      * r10/r11 records chased was mostly this corpus artifact.
      * Cross-replica token collisions (cipher_j(t) = cipher_k(u))
      * would re-couple replicas — and rep PAIRS grow quadratically,
      * so even rare coincidences compound (first cipher draft: 74k
      * cross-rep candidates at 10 reps, ~17% of the pair space). The
      * builder therefore REJECTS colliding alphabets by construction:
      * the corpus vocabulary is a small fixed set (collected once),
      * and each replica's alphabet is re-seeded until its ciphered
      * vocab image is disjoint from every earlier replica's — token-
      * level cross-rep disjointness is then exact, and a wide (≥3
      * chars per segment) cross-rep PassJoin segment match, which
      * must contain a full equal token, is excluded with it. (The
      * short-DOC tier — len ≲ 3·maxD, width-1/2 segments — still
      * matches across reps; that is PassJoin's inherent density
      * boundary for near-vacuous bounds, present on ANY corpus with
      * short docs, ~16% of sf1 candidates — see the operator's
      * scaladoc.) Disjointness is enforced for words
      * of length ≥ 3 only — a 1-char word has 26 possible images
      * total (the corpus vocab contains "a", which exhausts them at
      * rep 26), and a shared ≤2-char token across two reps is
      * sub-threshold noise on every measured axis (1 of ~40 tokens
      * for jaccard; far too short to carry a ≥17-char segment match
      * for PassJoin). The vocabulary still grows ~reps× (each rep
      * mints its own token images), keeping the tfidf / perplexity /
      * vocab-growth axes honest. */
    val cipherBase = "abcdefghijklmnopqrstuvwxyz"
    def cipherAlphabets(reps: Int, vocab0: Set[String]): Seq[String] = {
      val vocab = vocab0.filter(_.length >= 3)
      val out = scala.collection.mutable.ArrayBuffer(cipherBase)
      val seen = scala.collection.mutable.Set[String]() ++ vocab
      for (r <- 1 until reps) {
        var attempt = 0
        var alpha = ""
        var mapped = Set.empty[String]
        do {
          alpha = new scala.util.Random(7919L * r + 17 + attempt * 1000003L)
            .shuffle(cipherBase.toList).mkString
          val m = cipherBase.zip(alpha).toMap
          mapped = vocab.map(_.map(c => m.getOrElse(c, c)))
          attempt += 1
        } while (mapped.exists(seen.contains) && attempt < 1000)
        require(!mapped.exists(seen.contains),
          s"no collision-free cipher found for rep $r")
        seen ++= mapped
        out += alpha
      }
      out.toSeq
    }
    def buildCorpus(dir: String, reps: Int): Unit = {
      if (!new java.io.File(s"$dir/events.parquet").exists()) {
        sources.EventGenerator.events(spark, 100000L * reps, days = 30,
            users = 1000L * reps)
          .repartition(32).write.mode("overwrite").parquet(s"$dir/events.parquet")
        val vocab = Tables.documents(spark, small)
          .select(explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "").distinct()
          .collect().map(_.getString(0)).toSet // small fixed generator vocab
        Tables.documents(spark, small)
          .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"),
            explode(sequence(lit(0), lit(reps - 1))).as("rep"))
          .withColumn("alphas", typedlit(cipherAlphabets(reps, vocab)))
          .select(
            (col("doc_id") + col("rep").cast("long") * 10000000L).as("doc_id"),
            expr(s"translate(text, '$cipherBase', element_at(alphas, rep + 1))")
              .as("text"),
            col("lang"), col("source"), col("n_chars"))
          .repartition(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      }
      if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
        // vec_id-remapped replicas, vectors unchanged: the PCA
        // moment pass is duplicate-insensitive (timing scales with row
        // count, the covariance is unchanged). Pair-enumerating ANN ops
        // must NOT be probed on this table — exact replicas would
        // densify every cell and measure pair blow-up, not scale.
        val e = Tables.embeddings(spark, small)
        e.withColumn("rep", explode(sequence(lit(0), lit(reps - 1))))
          .select(
            (col("vec_id") + col("rep").cast("long") * 10000000L).as("vec_id")
              +: e.columns.filter(_ != "vec_id").toIndexedSeq.map(col): _*)
          .repartition(32).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      }
    }
    /** Relational replica builder (orders/lineitem), shared by the 10×
      * and 100× dirs: order/customer keys remap per replica so order
      * sizes and per-customer frequencies are UNCHANGED (scale, not
      * densification); part keys stay shared, so basket pair counts
      * scale n× at constant support. */
    def buildRelational(dir: String, reps: Int): Unit =
      if (!new java.io.File(s"$dir/orders.parquet").exists()) {
        val rep = explode(sequence(lit(0), lit(reps - 1))).as("rep")
        Tables.orders(spark, small).withColumn("rep", rep)
          .select(
            (col("o_orderkey") + col("rep").cast("long") * 100000000L).as("o_orderkey"),
            (col("o_custkey") + col("rep").cast("long") * 10000000L).as("o_custkey"),
            col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
            col("o_orderpriority"))
          .repartition(32).write.mode("overwrite").parquet(s"$dir/orders.parquet")
        val li = Tables.lineitem(spark, small)
        li.withColumn("rep", rep)
          .select(
            (col("l_orderkey") + col("rep").cast("long") * 100000000L).as("l_orderkey")
              +: li.columns.filter(_ != "l_orderkey").toIndexedSeq.map(col): _*)
          .repartition(32).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      }

    /** Customer replicas remapped with the SAME custkey offset as the
      * orders replicas (an unreplicated dim would inner-join away all
      * rep>0 revenue and silently measure 1× work as 10×); nation
      * copies verbatim — c_nationkey is untouched by the remap. */
    def buildRelationalDims(dir: String, reps: Int): Unit =
      if (!new java.io.File(s"$dir/customer.parquet").exists()) {
        val rep = explode(sequence(lit(0), lit(reps - 1))).as("rep")
        val cust = Tables.customer(spark, small)
        cust.withColumn("rep", rep)
          .select(
            (col("c_custkey") + col("rep").cast("long") * 10000000L).as("c_custkey")
              +: cust.columns.filter(_ != "c_custkey").toIndexedSeq.map(col): _*)
          .repartition(8).write.mode("overwrite").parquet(s"$dir/customer.parquet")
        Tables.nation(spark, small)
          .write.mode("overwrite").parquet(s"$dir/nation.parquet")
      }
    buildCorpus(big, 10)
    buildRelational(big, 10)
    buildRelationalDims(big, 10)

    val headline = Seq(
      "mart_user_daily", "mart_funnel_daily", "hourly_traffic", "session_sequences",
      "session_daily", "session_transitions", "new_vs_returning",
      "session_concurrency", "funnel_window", "attribution_window",
      "product_top_n", "retention_curve",
      "dedup_exact", "dedup_corpus", "dedup_minhash_lsh", "dedup_substring",
      "corpus_source_mix", "text_bigram_rarity",
      "basket_pairs", "cohort_ltv", "rfm_segments",
      "rolling_active_users", "coview_pairs", "conversion_latency",
      "embedding_pca",
      "doc_chunks", "chunk_dedup", "sample_temperature", "sample_uniform_k",
      "dedup_cluster_sizes", "rolling_active_hll",
      "funnel_step_latency", "media_near_dup",
      // round 6: the fixed-state approx siblings, the forward-asof
      // mart, the new DQ/corpus passes, and the dedup censuses.
      // ann_hard_negatives is safe on the replicated embeddings (it
      // broadcast-SCORES linearly, never enumerates bucket pairs).
      "conversion_latency_approx", "funnel_step_latency_approx",
      "shipping_latency_approx", "rfm_segments_approx",
      "signup_activation", "dq_freshness", "text_garbage_score",
      "clean_corpus_decontaminated", "dedup_source_profile",
      "split_leakage_check", "ann_hard_negatives",
      "user_streaks", "dq_schema_drift",
      // round 7: the session gate, the span scrub (disjoint replicas
      // keep duplicated-span density constant), the two cross-table
      // reconciliation checks (key remaps preserve alignment), and the
      // topic queries (narrow assignment + equi-join — no pair
      // enumeration). ann_knn_graph is EXCLUDED like the other
      // in-cell pair enumerators: exact vector replicas densify every
      // cell ×10 and would measure pair blow-up, not scale.
      "session_quality_gate", "session_funnel", "clean_dup_spans",
      "dq_orders_reconcile", "dq_corpus_coverage",
      "corpus_topic_mix", "sample_topic_balanced",
      // BPE training/counting scale with the word DICTIONARY — the
      // disjoint-replica corpus grows it ~10× (ciphered token images), the
      // honest axis for these two
      "bpe_vocab", "text_bpe_tokens",
      // round 8: events-side analytics ride the generator corpus
      // (never replicated); revenue_pareto's part keys stay shared
      // (×10 revenue per part — scale, not densification); the text
      // curves grow vocabulary ~10× with the ciphered replicas;
      // embedding_outliers only scores linearly (no pair enumeration,
      // safe on exact vector replicas); item_cf/pagerank pair work is
      // bounded per user / per transition like coview_pairs
      "user_lifecycle", "user_feature_matrix", "traffic_seasonality",
      "attribution_multitouch", "item_cf_neighbors", "product_pagerank",
      "revenue_pareto", "basket_rules", "zipf_curve", "vocab_growth",
      "doc_tfidf_keywords", "search_bm25", "embedding_outliers",
      // round-8 continuation: the events-side analytics ride the
      // generator corpus like the rest; coview_triangles' wedge work
      // is degree-bounded per node (same class as coview_pairs);
      // bigram perplexity scales with the bigram VOCAB (~10× under
      // ciphered replicas — the honest axis); minhash_calibration's
      // pair frame is band-bounded like dedup_minhash_lsh
      "purchase_intervals", "ab_test_summary", "dq_key_skew",
      "coview_triangles", "text_perplexity_bigram", "minhash_calibration",
      // closing additions: the funnel shares clean_corpus's plan; the
      // gap histogram rides the sessionize exchange; the histogram/
      // percentile pair and backlog are day-dimension rollups; yoy is
      // the q5 join path; recall curve and MMR score the broadcast
      // query sample linearly (no pair enumeration)
      "corpus_funnel", "session_gap_histogram", "value_histogram_daily",
      "value_percentiles_merged", "order_backlog", "nation_revenue_yoy",
      "ann_recall_curve", "ann_mmr_diverse",
      // round 9: gini rides the banded prefix sum (user dimension);
      // benford is a narrow ladder + 9-row rollup; surprise rides the
      // sessionize exchange; entropy is a zero-shuffle narrow map over
      // the replicated docs; fertility/pack are doc-dimension rollups;
      // kcenter scores linearly against a fixed pool (no pair
      // enumeration — safe on exact vector replicas).
      // embedding_clusters is EXCLUDED with the other in-cell pair
      // enumerators (ann_knn_graph class): exact replicas densify
      // every kNN cell and would measure pair blow-up, not scale.
      "user_activity_gini", "dq_benford", "session_surprise",
      "text_entropy", "tokenizer_fertility", "pack_efficiency",
      "sample_kcenter",
      // round 9 batch 2: the CC census is safe on the generated events
      // (graph shape, not replicas); dedup_inflation and
      // embedding_dim_stats are linear passes over the replicated
      // corpora (exact-dup groups stay size-1 per replica — ciphered
      // texts; dim stats is duplicate-insensitive)
      "graph_components", "dedup_inflation", "stickiness_weekly",
      "session_entry_exit", "embedding_dim_stats",
      // round 9 batch 4: kcore + degree census ride the same
      // generated-events graph shape as graph_components (no replica
      // densification); srm is one distinct-user exchange + a 1-row
      // aggregate
      "graph_kcore", "graph_degree_census", "ab_srm_check",
      // round 9 batch 5: assortativity rides the same graph shape
      // (degree joins are node-dimension); cuped is one user rollup +
      // a 2-row arm frame; revenue_gini rides the banded prefix sum
      // on the customer dimension (revenue_abc's class)
      "graph_assortativity", "ab_cuped", "revenue_gini",
      // round 9 batch 6: changepoint is one day-grain rollup + tiny
      // windows; the profile is six column-pruned passes; id gaps is
      // one bucket exchange + TakeOrdered
      "traffic_changepoint", "dq_column_profile", "dq_id_gaps",
      // batch 8: suggestion rules ride the profile's pruned passes +
      // a LIMIT-capped distinct collect
      "dq_suggested_checks",
      // batch 10: power/MDE and stratified CUPED are one user rollup
      // + tiny arm frames; the backtest is the forecast's fact rollup
      // twice (train + holdout legs off one checkpointed projection)
      "ab_power_mde", "ab_cuped_stratified", "forecast_backtest",
      // batch 12: decompose is one day-grain rollup + day-dimension
      // windows; rank shift is one product rollup + TakeOrdered;
      // embedding drift rides the dim-stats posexplode rollup
      "traffic_decompose", "product_rank_shift", "embedding_drift",
      // batch 13: nearest as-of rides the same one-key-shuffle union
      // window as the backward join; readability is a zero-shuffle
      // narrow map; the lineitem profile is per-column pruned passes
      "asof_nearest_view", "text_readability", "dq_profile_lineitem",
      // batch 14: the pooled-ratio source rollup is one source-grain
      // exchange of integer sums
      "readability_by_source",
      // batch 15: windowFunnel's one user exchange + tiny arm frames
      "ab_funnel",
      // batch 17: the CDC chunker is one codegen'd pass per doc (the
      // census ships 8-byte hashes through one map-combined rollup)
      "doc_chunks_cdc", "chunk_dedup_cdc",
      // batch 18: index-side scan + two batch-bounded broadcasts
      "dedup_incremental_cdc",
      // batch 19: two B-row LM rollups + a narrow literal-fold scan
      "sample_dsir", "dsir_source_shift",
      // batch 20: textPerplexity's fact pass + ≤16-row windows
      "ppl_threshold_curve",
      // batch 21: one (product,user) exchange; one orderkey join
      "product_repeat_rate", "priority_shipping",
      // batch 22: (hash,source) self-join fan-out ≤ |sources| per
      // hash; the norm census is a narrow fold + |bins| rollup
      "dedup_cross_source", "embedding_norm_census",
      // batch 23: one map-combined rollup to ≤11 band rows
      "discount_uplift",
      // batch 25: one TakeOrdered ranking, budgets are rank cuts
      "dsir_budget_curve",
      // batch 26: one postings rollup + probe-bounded broadcasts
      "search_selfrecall",
      // batch 27: one user rollup + ≤|days| cumulative windows
      "ab_sequential",
      // batch 28: one chunker pass + a hash-dim semi-join back
      "cdc_dup_mass_by_source",
      // batch 30: the rarity word shuffle + a doc-grain join to
      // ≤100 cells
      "quality_rarity_grid",
      // batch 33: the simhash band enumeration + candidate-dim exact
      // scores (ciphered doc replicas keep the pair space honest,
      // unlike the embedding replicas)
      "simhash_calibration",
      // batch 35: one broadcast key join + a two-level rollup
      "segment_order_profile",
      // round 10 batch 1: the bucketed session family — each form's
      // point is the bounded partial shapes, so the probe measures
      // them beside their plain twins (same generator corpus)
      "session_daily_bucketed", "session_transitions_bucketed",
      "session_funnel_bucketed", "session_quality_gate_bucketed",
      "session_entry_exit_bucketed", "session_concurrency_bucketed",
      "markov_next_event_bucketed",
      // round 10 batch 2: per-table suggestions ride the profiles'
      // pruned passes; the serving table is N walks on one pinned
      // edge checkpoint (graph shape, not replicas)
      "dq_suggested_lineitem", "dq_suggested_documents",
      "ppr_related_products",
      // round 11 batch 5: two suggestion passes (pre-max-date slice +
      // full frame) + one dimension-sized full-outer diff
      "dq_contract_drift",
      // round 11 batch 8: one corpus pass + the exact-dup keeper
      // window, rolled to a 14-counter aggregate
      "filter_ablation",
      // round 11 batch 9: one corpus pass to source grain + bounded
      // windows; and the PassJoin pairs + auto CC composition
      "corpus_mix_plan", "dedup_edit_clusters",
      // round 11 batch 11: the grid sweep shares the mix pass; the
      // calibration rides the one-scan LR feature projection
      "mix_budget_curve", "quality_classifier_calibration",
      // round 10 batch 4 (re-blocked round 11): PassJoin pigeonhole
      // segments keep the pair space key-joined (cipher-disjoint
      // replicas sit far beyond maxD of each other, so the block
      // structure is per-replica — scale, not densification); the
      // banded distance is O(len*maxD) per pair
      "dedup_edit_distance",
      // round 10 batch 7: the batched serving walks — one job stream
      // for N seeds over the same graph shape
      "ppr_related_products_batched")
      // batch 29's ann_ivf_filtered is NOT probed here: pair
      // enumerators are excluded from the replica dirs by the header
      // rule (exact replicas densify every cell) — it shares
      // ann_ivf_topk's plan class plus one pushed conjunct
    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both scan paths + codegen once
    Tables.events(spark, small).groupBy("event_type").count().write.format("noop").mode("overwrite").save()
    Tables.events(spark, big).groupBy("event_type").count().write.format("noop").mode("overwrite").save()
    // --only=a,b,c restricts the headline leg to the named queries
    // (iteration aid, mirrors graft.Bench's named-query args)
    val only = flags.find(_.startsWith("--only="))
      .map(_.stripPrefix("--only=").split(",").toSet)
    if (!flags.contains("--deep-only") && !flags.contains("--composed-only") &&
        !flags.contains("--partition-ab") && !flags.contains("--kmeans-init-ab") &&
        !flags.contains("--bot-ab") && !flags.contains("--bot-ab-deep") &&
        !flags.contains("--memo-cold") && !flags.contains("--ppr-ab") &&
        !flags.contains("--ann-deep"))
      headline.filter(n => only.forall(_.contains(n))).foreach { name =>
        val s = (1 to 2).map(_ => run(name, small)).min
        val b = (1 to 2).map(_ => run(name, big)).min
        println("{\"query\":\"" + name + "\",\"sf01_sec\":" + f"$s%.3f" +
          ",\"sf1_sec\":" + f"$b%.3f" + ",\"factor\":" + f"${b / s}%.2f" + "}")
        System.out.flush()
      }

    // ---- 100× deep leg (--deep): one more decade for the steepest
    // 10× factors, to confirm their curves BEND (fixed overheads
    // amortizing) rather than grow. Factors are reported per decade:
    // f10 = sf1/sf0.1, f100 = sf10/sf1 — sub-linear means each stays
    // well under 10.
    if (flags.contains("--deep") || flags.contains("--deep-only")) {
      buildCorpus(deep, 100)
      buildRelational(deep, 100)
      Tables.events(spark, deep).groupBy("event_type").count()
        .write.format("noop").mode("overwrite").save()
      // the steepest r7 10× factors, plus the round-8 heavy additions:
      // basket_rules (60M-row lineitem self-pairing at constant
      // support), product_pagerank (15 fixed rounds over the 10M-event
      // transition graph), doc_tfidf_keywords (500k-doc vocabulary
      // growth under the disjoint-replica cipher)
      val steepest = Seq("dedup_exact", "dq_corpus_coverage", "clean_dup_spans",
        "sample_topic_balanced", "corpus_topic_mix",
        "basket_rules", "product_pagerank", "doc_tfidf_keywords",
        // continuation additions: the bigram LM (vocabulary grows
        // ~100× under ciphered replicas — its honest axis) and the
        // triangle census (degree-bounded wedges on the denser graph)
        "text_perplexity_bigram", "coview_triangles",
        // round 9: the steepest new addition (1.67 at 10×) — rides
        // the sessionize exchange, so the deep leg tests whether the
        // LM join stays vocab-dimension as sessions multiply
        "session_surprise",
        // round-9 close (§7p #3): the graph family's third decade —
        // the co-view graph densifies with corpus scale, so confirm
        // the 10× sub-linear factors bend rather than grow
        "graph_components", "graph_kcore", "graph_assortativity",
        "graph_degree_census",
        // round-9 closing batch shapes at the third decade: the
        // probe-bounded self-retrieval (one postings rollup) and the
        // day-grain sequential looks (one user rollup)
        "search_selfrecall", "ab_sequential",
        // round-9 closing: the new scan shapes — does the CDC
        // containment stay flat as the INDEX side grows 100×; does
        // the DSIR B-row rollup hold its near-flat curve; does the
        // cross-source hash self-join stay |sources|²-bounded under
        // disjoint replicas
        "dedup_incremental_cdc", "sample_dsir", "dedup_cross_source",
        // round 10: the round's steepest 10x factors — does the
        // anchored-block pair space stay linear at the third decade
        // (7.87 at 10x), do the gate's two-phase partials and the
        // 11-column profile passes keep amortizing (2.13 / 3.82)
        "dedup_edit_distance", "session_quality_gate_bucketed",
        "dq_suggested_lineitem")
      steepest.filter(n => only.forall(_.contains(n))).foreach { name =>
        val s = (1 to 2).map(_ => run(name, small)).min
        val b = (1 to 2).map(_ => run(name, big)).min
        val d = (1 to 2).map(_ => run(name, deep)).min
        println("{\"query\":\"" + name + "\",\"sf01_sec\":" + f"$s%.3f" +
          ",\"sf1_sec\":" + f"$b%.3f" + ",\"sf10_sec\":" + f"$d%.3f" +
          ",\"f10\":" + f"${b / s}%.2f" + ",\"f100\":" + f"${d / b}%.2f" + "}")
        System.out.flush()
      }
    }

    // ---- shuffle-partition A/B (--partition-ab): tests the r8
    // hypothesis that text_perplexity_bigram's f100 overshoot (13.95
    // on its honest vocab-linear axis) is an artifact of pinning
    // spark.sql.shuffle.partitions=32 while the bigram vocabulary
    // grows ~10x per decade — i.e. the knob a real cluster WOULD turn
    // (decade-proportional partitions, AQE coalescing the excess) but
    // a fixed-32 probe can't. Each decade dir runs both ways: fixed 32
    // vs decade-scaled (32/128/512 — x4 per decade, beyond the thread
    // count so per-task state shrinks with the data). The conf is
    // runtime-settable and read at plan time, so no session restart.
    if (flags.contains("--partition-ab")) {
      buildCorpus(deep, 100)
      val legs = Seq((small, 32, "sf01"), (big, 128, "sf1"), (deep, 512, "sf10"))
      val abQueries = only.map(_.toSeq.sorted)
        .getOrElse(Seq("text_perplexity_bigram", "clean_dup_spans"))
      for (name <- abQueries) {
        val readings = legs.map { case (dir, scaled, tag) =>
          def at(parts: Int): Double = {
            System.err.println(s"[partition-ab] $name $tag parts=$parts")
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            try (1 to 2).map(_ => run(name, dir)).min
            finally spark.conf.set("spark.sql.shuffle.partitions", 32)
          }
          (tag, at(32), at(scaled), scaled)
        }
        val parts = readings.map { case (tag, fixed, scaled, n) =>
          "\"" + tag + "_fixed32_sec\":" + f"$fixed%.3f" +
            ",\"" + tag + s"_scaled${n}_sec" + "\":" + f"$scaled%.3f"
        }.mkString(",")
        val f100Fixed = readings(2)._2 / readings(1)._2
        val f100Scaled = readings(2)._3 / readings(1)._3
        println("{\"query\":\"" + name + "\"," + parts +
          ",\"f100_fixed\":" + f"$f100Fixed%.2f" +
          ",\"f100_scaled\":" + f"$f100Scaled%.2f" + "}")
        System.out.flush()
      }
    }

    // ---- memoized-family COLD cost at depth (--memo-cold, r13
    // VERDICT #6): the 10× records price the WARM path (memo hits);
    // this prices what the payer pays — the quality-LR training, the
    // k-means quantizer, the kNN graph build, and the dedup
    // member-pair frame — fresh per decade, cache cleared between
    // runs. The kNN graph is measured on its HONEST axis: exact
    // vector replicas densify every cell, so the graph scales nlist
    // with the corpus (the operator's own √N sizing — per-cell work
    // flat) instead of pretending fixed nlist=10 survives 100×; the
    // registry-default graph stays excluded from replica probes for
    // the documented densification reason.
    if (flags.contains("--memo-cold")) {
      buildCorpus(deep, 100)
      def cold(tag: String, dir: String, nlistGraph: Int,
               memberPair: Boolean): Unit = {
        def t(f: => Any): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        operators.TextAnalysis.clearQualityLrCache()
        val lr = t(operators.TextAnalysis.trainedQualityLr(spark, dir))
        operators.Similarity.clearKmeansCache()
        val km = t(operators.Similarity.kmeansCentroids(spark, dir))
        operators.Similarity.clearKnnGraphCache()
        operators.Similarity.clearKmeansCache()
        val knn = t(operators.Similarity.annKnnGraph(spark, dir,
          nlist = nlistGraph).count())
        // the member-pair frame carries the EVAL-grade exact members
        // (ngram jaccard / containment verify quadratically within a
        // lang block by design — lshRecall's documented truth-stage
        // class, run on a sampled slice at corpus scale). Measured
        // f10 ≈ 18.6 on the replicas, which is the members'
        // documented density boundary, not a plan defect — the third
        // decade is skipped for the same reason lshRecall excludes
        // its truth stage from replica probes.
        val mp = if (!memberPair) -1.0
          else {
            operators.Dedup.clearMemberPairCache()
            t(operators.Dedup.memberPairFrame(spark, dir).count())
          }
        println("{\"probe\":\"memo_cold\",\"dir\":\"" + tag + "\"" +
          f""","quality_lr_sec":$lr%.2f,"kmeans_sec":$km%.2f""" +
          f""","knn_graph_nlist$nlistGraph%d_sec":$knn%.2f""" +
          (if (memberPair) f""","member_pair_sec":$mp%.2f}"""
           else ",\"member_pair_sec\":null}"))
        System.out.flush()
      }
      cold("sf01", small, 10, memberPair = true)
      cold("sf1", big, 32, memberPair = true)
      cold("sf10", deep, 100, memberPair = false)
    }

    // ---- honest ANN third decade (--ann-deep, r13): the replica
    // corpora were NEVER a valid axis for the in-cell pair
    // enumerators (exact vector copies densify every cell — the
    // documented exclusion since r7). This probe builds the axis the
    // ANN family actually claims to scale on: corpora whose CLUSTER
    // COUNT grows with the data (C = 10·R clusters of ~200 vectors,
    // deterministic hash-placed centers ± small jitter in the real
    // table's 64-dim geometry), with nlist ∝ C per the IVF sizing —
    // per-cell size constant, so the kNN graph's pair work should
    // scale ~linearly. Measures the cold quantizer + graph build and
    // the LPA clustering per decade; any super-linear constant it
    // finds (e.g. the literal-centroid codegen at four-digit nlist)
    // gets named rather than guessed at.
    if (flags.contains("--ann-deep")) {
      def buildClustered(dir: String, reps: Int): Unit =
        if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
          val n = 2000L * reps
          val c = 10 * reps
          spark.range(0L, n, 1L, 32)
            .select(col("id").as("vec_id"),
              expr(s"""transform(sequence(0, 63), d -> cast(
                (pmod(xxhash64(id % $c, d, 1), 2001) - 1000) / 1000.0 +
                (pmod(xxhash64(id, d, 2), 101) - 50) / 2500.0 AS float))""")
                .as("embedding"),
              (col("id") % 10).cast("int").as("label"))
            .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
        }
      def t(f: => Any): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val decades = Seq(1, 10, 100).takeWhile(r =>
        !flags.contains("--ann-deep-skip100") || r <= 10)
      for (reps <- decades) {
        val dir = s"/tmp/graft_ann$reps"
        buildClustered(dir, reps)
        val nlist = 10 * reps
        operators.Similarity.clearKmeansCache()
        val km = t(operators.Similarity.kmeansCentroids(spark, dir,
          nlist = nlist, iters = 3))
        operators.Similarity.clearKnnGraphCache()
        val graph = t(operators.Similarity.annKnnGraph(spark, dir,
          k = 5, nProbe = 2, nlist = nlist, iters = 3).count())
        val lpa = t(operators.Similarity.embeddingClusters(spark, dir,
          nlist = nlist).write.format("noop").mode("overwrite").save())
        val clusters = operators.Similarity.embeddingClusters(spark, dir,
          nlist = nlist).select("cluster").distinct().count()
        println(f"""{"probe":"ann_deep","reps":$reps,"nlist":$nlist,""" +
          f""""kmeans_sec":$km%.2f,"knn_graph_sec":$graph%.2f,""" +
          f""""lpa_sec":$lpa%.2f,"clusters_found":$clusters}""")
        System.out.flush()
      }
    }

    // ---- PPR/pagerank round-budget probe (--ppr-ab, r13): the
    // family's per-round cost is N-independent (one join + rollup +
    // checkpoint), so wall time ∝ rounds run. The frames carry
    // iterations_run/last_delta, so this reads where the tolerance
    // ACTUALLY fires at registry defaults, what each form costs, and
    // how stable the serving table's top-k is at reduced budgets —
    // the evidence for (or against) an LPA-style budget re-pin.
    if (flags.contains("--ppr-ab")) {
      def t(f: => Any): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      def meta(df: org.apache.spark.sql.DataFrame): (Int, Double) = {
        val r = df.select("iterations_run", "last_delta").head()
        (r.getInt(0), r.getDouble(1))
      }
      for ((name, mk) <- Seq[(String, () => org.apache.spark.sql.DataFrame)](
        "ppr_reg_15_tol1e6" -> (() => operators.Graph.productPpr(spark, small)),
        "ppr_fixed15" -> (() =>
          operators.Graph.productPpr(spark, small, tol = 0.0)),
        "ppr_30_tol1e6" -> (() =>
          operators.Graph.productPpr(spark, small, iterations = 30)),
        "pagerank_reg_fixed15" -> (() =>
          operators.Graph.productPagerank(spark, small)),
        "pagerank_30_tol1e6" -> (() => operators.Graph.productPagerank(
          spark, small, iterations = 30, tol = 1e-6, checkEvery = 3)))) {
        val df = mk()
        val sec = (1 to 2).map(_ => t(
          df.write.format("noop").mode("overwrite").save())).min
        val (it, dl) = meta(mk())
        println(f"""{"probe":"ppr_ab","form":"$name","sec":$sec%.2f,""" +
          f""""iterations_run":$it,"last_delta":$dl%.2e}""")
        System.out.flush()
      }
      // serving-table ranking stability vs budget: overlap + exact
      // rank agreement of (seed, related, rank) triples at reduced
      // round budgets against the 15-round reference
      val ref = operators.Graph.pprServingTableBatched(spark, small)
        .select("seed_product", "related_product", "rank").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
      for (iters <- Seq(12, 10, 8, 6)) {
        val sec = t(operators.Graph.pprServingTableBatched(spark, small,
          iterations = iters).write.format("noop").mode("overwrite").save())
        val got = operators.Graph.pprServingTableBatched(spark, small,
          iterations = iters)
          .select("seed_product", "related_product", "rank").collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
        println(f"""{"probe":"ppr_serving","iters":$iters,"sec":$sec%.2f,""" +
          f""""exact_triples":${(got & ref).size},"of":${ref.size}}""")
        System.out.flush()
      }
    }

    // ---- k-means seeding A/B (--kmeans-init-ab): hash-sample seeds
    // vs Gonzalez k-center picks (SURVEY §7o #6) — same Lloyd rounds,
    // different starting spread. Read: lower mean cosine distance to
    // the assigned centroid (cohesion) and a flatter max/mean cell
    // occupancy both mean better-shaped IVF cells for the same
    // training cost.
    if (flags.contains("--kmeans-init-ab")) {
      graft.functions.GraftFunctions.ensureRegistered(spark)
      def centStats(cents: Seq[(Int, Array[Float])],
                    e: org.apache.spark.sql.DataFrame): (Double, Double) = {
        val centArr = array(cents.map { case (cell, vec) =>
          struct(lit(cell).as("cell"), array(vec.toIndexedSeq.map(lit(_)): _*).as("vec"))
        }: _*)
        val best = element_at(array_sort(transform(centArr, c => struct(
          (-call_function("cosine_sim", col("embedding"), c.getField("vec"))).as("neg"),
          c.getField("cell").as("cell")))), 1)
        val df = e.select(best.getField("cell").as("cell"),
          (-best.getField("neg")).as("sim"))
        val coh = df.agg(avg(lit(1.0) - col("sim"))).collect().head.getDouble(0)
        val occ = df.groupBy("cell").count()
          .agg(max("count").cast("double"), avg("count")).collect().head
        (coh, occ.getDouble(0) / occ.getDouble(1))
      }
      for ((dir, tag) <- Seq((small, "sf01"), (big, "sf1"));
           init <- Seq("hash", "kcenter")) {
        val e = Tables.embeddings(spark, dir)
        val t0 = System.nanoTime()
        val cents = operators.Similarity.kmeansCentroidsFrom(e, nlist = 10,
          iters = 3, init = init)
        val trainSec = (System.nanoTime() - t0) / 1e9
        val (coh, imb) = centStats(cents, e)
        println("{\"probe\":\"kmeans_init\",\"dir\":\"" + tag +
          "\",\"init\":\"" + init + "\",\"cohesion\":" + f"$coh%.6f" +
          ",\"occ_imbalance\":" + f"$imb%.3f" +
          ",\"train_sec\":" + f"$trainSec%.2f" + "}")
        System.out.flush()
      }
    }

    // ---- planted-bot A/B (--bot-ab): the round-10 session-family
    // claim MEASURED, not argued — on a corpus where one sentinel user
    // owns a large single-session slice (the straggler class the r9
    // VERDICT flagged), time each family query's plain user_id-window
    // form against its bucketed twin. The outputs are hash-equal (the
    // gate proves that); this probe measures what the bucketing buys:
    // the plain path's wall clock is the bot partition's sort+window,
    // the bucketed path's is the even per-(user, day) spread. Also
    // reports the measured arming census — the ratio the Auto door
    // reads to take the bucketed path by itself.
    if (flags.contains("--bot-ab")) {
      val dir = "/tmp/graft_botskew"
      if (!new java.io.File(s"$dir/events.parquet").exists()) {
        // 1M organic rows over 10k users / 35 days + ONE sentinel
        // firing every second for ~35 days: 3M rows, 75% of the
        // corpus, one unbroken session crossing ~35 bucket boundaries
        // — the sort/window of those 3M rows lands in ONE task on the
        // plain path, ~86k per (user, day) task on the bucketed one
        val base = sources.EventGenerator.events(spark, 1000000L,
          days = 35, users = 10000L)
        val bot = spark.range(3024000L).selectExpr(
          "10000000 + id AS event_id",
          "timestamp_seconds(unix_timestamp(DATE'2024-01-01') + id) AS ts",
          "CAST(424242 AS BIGINT) AS user_id",
          "CASE WHEN id % 3 = 0 THEN 'view' WHEN id % 3 = 1 THEN 'click' " +
            "ELSE 'purchase' END AS event_type",
          "CAST(1.0 AS DOUBLE) AS value", "'{}' AS props")
        base.unionByName(bot).repartition(32)
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
      }
      val e = operators.EventMarts.enriched(spark, dir)
      val armPlan = operators.Skew.measure(e, "user_id", 16.0)
      def timed(f: => org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      import operators.Sessionize
      val pairsAb: Seq[(String, () => org.apache.spark.sql.DataFrame,
          () => org.apache.spark.sql.DataFrame)] = Seq(
        ("session_sequences", () => Sessionize.sessionSequencesFrom(e),
          () => Sessionize.sessionSequencesBucketedFrom(e)),
        ("session_daily", () => Sessionize.sessionDailyFrom(e),
          () => Sessionize.sessionDailyBucketedFrom(e)),
        ("session_funnel", () => Sessionize.sessionFunnelFrom(e),
          () => Sessionize.sessionFunnelBucketedFrom(e)),
        ("session_transitions", () => Sessionize.sessionTransitionsFrom(e),
          () => Sessionize.sessionTransitionsBucketedFrom(e)),
        ("session_entry_exit", () => Sessionize.sessionEntryExitFrom(e),
          () => Sessionize.sessionEntryExitBucketedFrom(e)))
      pairsAb.filter(p => only.forall(_.contains(p._1))).foreach {
        case (name, plainF, bucketedF) =>
          val ps = (1 to 2).map(_ => timed(plainF())).min
          val bs = (1 to 2).map(_ => timed(bucketedF())).min
          println("{\"probe\":\"bot_ab\",\"query\":\"" + name + "\"" +
            ",\"plain_sec\":" + f"$ps%.3f" + ",\"bucketed_sec\":" + f"$bs%.3f" +
            ",\"speedup\":" + f"${ps / bs}%.2f" +
            ",\"hot_ratio\":" + f"${armPlan.hotRatio}%.1f" +
            ",\"armed\":" + armPlan.armed + "}")
          System.out.flush()
      }
    }

    // ---- third-decade bot A/B (--bot-ab-deep): the 100× leg the
    // session family's 100 TB claim actually rests on — a 10^7-row
    // SINGLE-USER sentinel (the r10 crossover curve had two points,
    // 37%: 0.77× and 75%: 2.71×; this pins where the plain path's
    // one-task sort/window stops being merely slow and starts
    // spilling). 10M organic rows over 100k users/35 days + one
    // sentinel firing 3×/sec for ~39 days ≈ 10.08M rows, ~50% of the
    // corpus. k=1 per form (the walls here are tens of seconds — the
    // signal is the ratio and the spill, not ±5% noise); the arming
    // census is printed so the record carries the ratio the Auto door
    // would read at this scale.
    if (flags.contains("--bot-ab-deep")) {
      val dir = "/tmp/graft_botskew_deep"
      if (!new java.io.File(s"$dir/events.parquet").exists()) {
        val base = sources.EventGenerator.events(spark, 10000000L,
          days = 35, users = 100000L)
        val bot = spark.range(10080000L).selectExpr(
          "100000000 + id AS event_id",
          "timestamp_seconds(unix_timestamp(DATE'2024-01-01') + id DIV 3) AS ts",
          "CAST(424242 AS BIGINT) AS user_id",
          "CASE WHEN id % 3 = 0 THEN 'view' WHEN id % 3 = 1 THEN 'click' " +
            "ELSE 'purchase' END AS event_type",
          "CAST(1.0 AS DOUBLE) AS value", "'{}' AS props")
        base.unionByName(bot).repartition(32)
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
      }
      val e = operators.EventMarts.enriched(spark, dir)
      val armPlan = operators.Skew.measure(e, "user_id", 16.0)
      def timedDeep(f: => org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      import operators.Sessionize
      val deepPairs: Seq[(String, () => org.apache.spark.sql.DataFrame,
          () => org.apache.spark.sql.DataFrame)] = Seq(
        ("session_sequences", () => Sessionize.sessionSequencesFrom(e),
          () => Sessionize.sessionSequencesBucketedFrom(e)),
        ("session_daily", () => Sessionize.sessionDailyFrom(e),
          () => Sessionize.sessionDailyBucketedFrom(e)),
        ("session_funnel", () => Sessionize.sessionFunnelFrom(e),
          () => Sessionize.sessionFunnelBucketedFrom(e)),
        ("session_transitions", () => Sessionize.sessionTransitionsFrom(e),
          () => Sessionize.sessionTransitionsBucketedFrom(e)),
        // round 12: the rest of the family at the same sentinel — the
        // members sharing the partial shapes but with no deep-leg
        // rows until now (VERDICT r11 next-round #5)
        ("session_patterns", () => Sessionize.sessionPatternsFrom(e),
          () => Sessionize.sessionPatternsBucketedFrom(e)),
        ("session_entry_exit", () => Sessionize.sessionEntryExitFrom(e),
          () => Sessionize.sessionEntryExitBucketedFrom(e)),
        ("session_concurrency", () => Sessionize.sessionConcurrencyFrom(e),
          () => Sessionize.sessionConcurrencyBucketedFrom(e)),
        ("session_quality_gate", () => Sessionize.sessionQualityGateFrom(e),
          () => Sessionize.sessionQualityGateBucketedFrom(e)),
        ("session_surprise", () => Sessionize.sessionSurpriseFrom(e),
          () => Sessionize.sessionSurpriseBucketedFrom(e)))
      deepPairs.filter(p => only.forall(_.contains(p._1))).foreach {
        case (name, plainF, bucketedF) =>
          val bs = timedDeep(bucketedF())
          val ps = timedDeep(plainF())
          println("{\"probe\":\"bot_ab_deep\",\"query\":\"" + name + "\"" +
            ",\"plain_sec\":" + f"$ps%.3f" + ",\"bucketed_sec\":" + f"$bs%.3f" +
            ",\"speedup\":" + f"${ps / bs}%.2f" +
            ",\"hot_ratio\":" + f"${armPlan.hotRatio}%.1f" +
            ",\"armed\":" + armPlan.armed + "}")
          System.out.flush()
      }
    }

    // ---- composed cron-path probe (--composed): the full per-date
    // schedule — gate → clean-session marts → incremental JDBC merge —
    // timed end-to-end at sf0.1 vs the 10× corpus, so the composition
    // (not just each query) has a measured scale factor. Fresh Derby
    // db + mart dir per measurement; per-dir the probed date is the
    // 2nd distinct event date (a full day in both corpora).
    if (flags.contains("--composed") || flags.contains("--composed-only")) {
      def composedRun(dir: String): Double = {
        val date = Tables.events(spark, dir)
          .select(to_date(col("ts")).as("d")).where(col("d").isNotNull)
          .distinct().orderBy("d").limit(2)
          .collect().last.getDate(0).toString
        val base = java.nio.file.Files.createTempDirectory("graft_composed")
        val url = s"jdbc:derby:${base.resolve("db")};create=true"
        val t0 = System.nanoTime()
        Pipeline.run(spark, dir, base.resolve("marts").toString,
          failFast = false, dates = Seq(date),
          checkLogDir = Some(base.resolve("qlog").toString),
          quarantine = true, martJdbc = Some(url))
        (System.nanoTime() - t0) / 1e9
      }
      val s = (1 to 2).map(_ => composedRun(small)).min
      val b = (1 to 2).map(_ => composedRun(big)).min
      println("{\"query\":\"composed_quarantine_mart_jdbc\",\"sf01_sec\":" + f"$s%.3f" +
        ",\"sf1_sec\":" + f"$b%.3f" + ",\"factor\":" + f"${b / s}%.2f" + "}")
      System.out.flush()
    }
    spark.stop()
  }
}
