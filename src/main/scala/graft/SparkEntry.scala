package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2C relational / OLAP core
    "q1_pricing_summary"   -> ((s, d) => Relational.q1PricingSummary(s, d)),
    "q3_shipping_priority" -> ((s, d) => Relational.q3ShippingPriority(s, d)),
    "q5_local_supplier"    -> ((s, d) => Relational.q5LocalSupplier(s, d)),
    "q6_revenue_forecast"  -> ((s, d) => Relational.q6RevenueForecast(s, d)),
    "q7_volume_shipping"   -> ((s, d) => Relational.q7VolumeShipping(s, d)),
    "q10_returned_items"   -> ((s, d) => Relational.q10ReturnedItems(s, d)),
    "q14_promo_share"      -> ((s, d) => Relational.q14PromoShare(s, d)),
    "q18_large_orders"     -> ((s, d) => Relational.q18LargeOrders(s, d)),
    "q4_priority_count"    -> ((s, d) => Relational.q4PriorityCount(s, d)),
    "q13_order_distribution" -> ((s, d) => Relational.q13OrderDistribution(s, d)),
    "q22_untapped_segments" -> ((s, d) => Relational.q22UntappedSegments(s, d)),
    "q8_market_share"      -> ((s, d) => Relational.q8MarketShare(s, d)),
    "q15_top_supplier"     -> ((s, d) => Relational.q15TopSupplier(s, d)),
    "q17_small_quantity"   -> ((s, d) => Relational.q17SmallQuantity(s, d)),
    "q19_discounted_revenue" -> ((s, d) => Relational.q19DiscountedRevenue(s, d)),
    "q21_suppliers_waiting" -> ((s, d) => Relational.q21SuppliersKeptWaiting(s, d)),
    "top_customers_window" -> ((s, d) => Relational.topCustomersWindow(s, d)),
    "order_lineitem_rollup" -> ((s, d) => Relational.orderLineitemRollup(s, d)),
    // §2A reference marts & batch aggregates
    "mart_user_daily"      -> ((s, d) => EventMarts.martUserDaily(s, d)),
    "mart_funnel_daily"    -> ((s, d) => EventMarts.martFunnelDaily(s, d)),
    "mart_product_daily"   -> ((s, d) => EventMarts.martProductDaily(s, d)),
    "mart_orders"          -> ((s, d) => EventMarts.martOrders(s, d)),
    "hourly_traffic"       -> ((s, d) => EventMarts.hourlyTraffic(s, d)),
    "funnel_conversion"    -> ((s, d) => EventMarts.funnelConversion(s, d)),
    "product_top_n"        -> ((s, d) => EventMarts.productTopN(s, d)),
    "report_user_summary"  -> ((s, d) => EventMarts.reportUserSummary(s, d)),
    "report_payment_dist"  -> ((s, d) => EventMarts.reportPaymentDist(s, d)),
    "report_order_summary" -> ((s, d) => EventMarts.reportOrderSummary(s, d)),
    "retention_daily"      -> ((s, d) => EventMarts.retentionDaily(s, d)),
    "retention_curve"      -> ((s, d) => EventMarts.retentionCurve(s, d)),
    "value_percentiles"    -> ((s, d) => EventMarts.valuePercentiles(s, d)),
    "session_sequences"    -> ((s, d) => Sessionize.sessionSequences(s, d)),
    "session_patterns"     -> ((s, d) => Sessionize.sessionPatterns(s, d)),
    // §2B data-quality validation
    "dq_null_check"        -> ((s, d) => Quality.nullCheck(s, d)),
    "dq_duplicate_check"   -> ((s, d) => Quality.duplicateCheck(s, d)),
    "dq_range_check"       -> ((s, d) => Quality.rangeCheck(s, d)),
    "dq_sequence_check"    -> ((s, d) => Quality.sequenceCheck(s, d)),
    "dq_timestamp_check"   -> ((s, d) => Quality.timestampCheck(s, d)),
    "dq_integrity_check"   -> ((s, d) => Quality.integrityCheck(s, d)),
    "dq_consistency_check" -> ((s, d) => Quality.consistencyCheck(s, d)),
    "dq_summary"           -> ((s, d) => Quality.summary(s, d)),
    "dq_daily_trend"       -> ((s, d) => Quality.dailyTrend(s, d)),
    // §2D text analysis
    "text_token_count"     -> ((s, d) => TextAnalysis.tokenCount(s, d)),
    "text_quality_score"   -> ((s, d) => TextAnalysis.qualityScore(s, d)),
    "text_langid"          -> ((s, d) => TextAnalysis.langId(s, d)),
    "text_fingerprint"     -> ((s, d) => TextAnalysis.fingerprint(s, d)),
    "text_bpe_estimate"    -> ((s, d) => TextAnalysis.bpeEstimate(s, d)),
    "text_top_ngrams"      -> ((s, d) => TextAnalysis.topNgrams(s, d)),
    "doc_stats_by_lang"    -> ((s, d) => TextAnalysis.statsByLang(s, d)),
    "sample_stratified"    -> ((s, d) => TextAnalysis.sampleStratified(s, d)),
    "clean_corpus"         -> ((s, d) => TextAnalysis.cleanCorpus(s, d)),
    "text_pii_scrub"       -> ((s, d) => TextAnalysis.piiScrub(s, d)),
    "corpus_split"         -> ((s, d) => TextAnalysis.corpusSplit(s, d)),
    "sample_weighted_sources" -> ((s, d) => TextAnalysis.sampleWeightedSources(s, d)),
    "corpus_pack"          -> ((s, d) => TextAnalysis.corpusPack(s, d)),
    "asof_view_purchase"   -> ((s, d) => AsOfJoin.viewPurchaseAsOf(s, d)),
    // §2D dedup family
    "dedup_exact"          -> ((s, d) => Dedup.exact(s, d)),
    "dedup_corpus"         -> ((s, d) => Dedup.dedupedCorpus(s, d)),
    "dedup_ngram_jaccard"  -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "dedup_minhash_lsh"    -> ((s, d) => Dedup.minhashLsh(s, d)),
    "dedup_near_corpus"    -> ((s, d) => Dedup.nearDupCorpus(s, d)),
    "dedup_simhash"        -> ((s, d) => Dedup.simhash(s, d)),
    // §2D similarity search
    "ann_cosine_topk"      -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    // long format: the driver's pandas compare cannot hash array columns
    "embedding_centroids"  -> ((s, d) => Similarity.embeddingCentroidsLong(s, d)),
    "embedding_quantize"   -> ((s, d) => Similarity.embeddingQuantize(s, d)),
    "ann_lsh_bucketed"     -> ((s, d) => Similarity.lshTopK(s, d)),
    "ann_ivf_topk"         -> ((s, d) => Similarity.ivfTopK(s, d)),
    "ann_ivf_kmeans"       -> ((s, d) => Similarity.ivfTopKKmeans(s, d)),
    "dedup_embedding_cosine" -> ((s, d) => Similarity.cosineNearDup(s, d)),
    // §2E multimodal plumbing
    "media_metadata"       -> ((s, d) => Multimodal.mediaMetadata(s, d)),
    "media_frame_sample"   -> ((s, d) => Multimodal.frameSample(s, d)),
    "media_feature_extract" -> ((s, d) => Multimodal.featureExtractLong(s, d)),
    "media_resize"         -> ((s, d) => Multimodal.mediaResize(s, d)),
  )

  /** DuckDB-runnable oracle for each query (same parquet tables).
    * Column names/types match the Spark output exactly (SURVEY.md §5). */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary"   -> Relational.q1Sql,
    "q3_shipping_priority" -> Relational.q3Sql,
    "q5_local_supplier"    -> Relational.q5Sql,
    "q6_revenue_forecast"  -> Relational.q6Sql,
    "q7_volume_shipping"   -> Relational.q7Sql,
    "q10_returned_items"   -> Relational.q10Sql,
    "q14_promo_share"      -> Relational.q14Sql,
    "q18_large_orders"     -> Relational.q18Sql,
    "q4_priority_count"    -> Relational.q4Sql,
    "q13_order_distribution" -> Relational.q13Sql,
    "q22_untapped_segments" -> Relational.q22Sql,
    "q8_market_share"      -> Relational.q8Sql,
    "q15_top_supplier"     -> Relational.q15Sql,
    "q17_small_quantity"   -> Relational.q17Sql,
    "q19_discounted_revenue" -> Relational.q19Sql,
    "q21_suppliers_waiting" -> Relational.q21Sql,
    "top_customers_window" -> Relational.topCustomersSql,
    "order_lineitem_rollup" -> Relational.orderLineitemRollupSql,
    "mart_user_daily"      -> EventMarts.martUserDailySql,
    "mart_funnel_daily"    -> EventMarts.martFunnelDailySql,
    "mart_product_daily"   -> EventMarts.martProductDailySql,
    "mart_orders"          -> EventMarts.martOrdersSql,
    "hourly_traffic"       -> EventMarts.hourlyTrafficSql,
    "funnel_conversion"    -> EventMarts.funnelConversionSql,
    "product_top_n"        -> EventMarts.productTopNSql,
    "report_user_summary"  -> EventMarts.reportUserSummarySql,
    "report_payment_dist"  -> EventMarts.reportPaymentDistSql,
    "report_order_summary" -> EventMarts.reportOrderSummarySql,
    "retention_daily"      -> EventMarts.retentionDailySql,
    "retention_curve"      -> EventMarts.retentionCurveSql,
    "value_percentiles"    -> EventMarts.valuePercentilesSql,
    "session_sequences"    -> Sessionize.sessionSequencesSql,
    "session_patterns"     -> Sessionize.sessionPatternsSql,
    "dq_null_check"        -> Quality.nullCheckSql,
    "dq_duplicate_check"   -> Quality.duplicateCheckSql,
    "dq_range_check"       -> Quality.rangeCheckSql,
    "dq_sequence_check"    -> Quality.sequenceCheckSql,
    "dq_timestamp_check"   -> Quality.timestampCheckSql,
    "dq_integrity_check"   -> Quality.integrityCheckSql,
    "dq_consistency_check" -> Quality.consistencyCheckSql,
    "dq_summary"           -> Quality.summarySql,
    "dq_daily_trend"       -> Quality.dailyTrendSql,
    "text_token_count"     -> TextAnalysis.tokenCountSql,
    "text_quality_score"   -> TextAnalysis.qualityScoreSql,
    "text_langid"          -> TextAnalysis.langIdSql,
    "text_fingerprint"     -> TextAnalysis.fingerprintSql,
    "text_bpe_estimate"    -> TextAnalysis.bpeEstimateSql,
    "text_top_ngrams"      -> TextAnalysis.topNgramsSql,
    "doc_stats_by_lang"    -> TextAnalysis.statsByLangSql,
    "sample_stratified"    -> TextAnalysis.sampleStratifiedSql,
    "clean_corpus"         -> TextAnalysis.cleanCorpusSql,
    "text_pii_scrub"       -> TextAnalysis.piiScrubSql,
    "corpus_split"         -> TextAnalysis.corpusSplitSql,
    "sample_weighted_sources" -> TextAnalysis.sampleWeightedSourcesSql,
    "corpus_pack"          -> TextAnalysis.corpusPackSql,
    "asof_view_purchase"   -> AsOfJoin.viewPurchaseAsOfSql,
    "embedding_centroids"  -> Similarity.embeddingCentroidsSql,
    "embedding_quantize"   -> Similarity.embeddingQuantizeSql,
    "dedup_exact"          -> Dedup.exactSql,
    "dedup_corpus"         -> Dedup.dedupedCorpusSql,
    "dedup_ngram_jaccard"  -> Dedup.ngramJaccardSql,
    "media_metadata"       -> Multimodal.mediaMetadataSql,
    "media_feature_extract" -> Multimodal.featureExtractSql,
    // dedup_minhash_lsh / dedup_simhash / dedup_near_corpus / ann_* /
    // dedup_embedding_cosine / media_frame_sample / media_resize:
    // approximate or non-SQL-expressible → rows-only (each is
    // ScalaTest-backed with recall floors / exact ground-truth checks).
  )
}
