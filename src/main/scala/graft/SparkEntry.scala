package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.dedup.DedupQueries
import graft.events.EventQueries
import graft.multimodal.MultimodalPipeline
import graft.relational.RelationalQueries
import graft.similarity.SimilarityQueries
import graft.text.{LangQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers here twice: a DataFrame query in
  * [[queries]] and the equivalent DuckDB SQL in [[oracleSql]] (the driver
  * hash-compares both at sf0.01). Column names and values are engineered to
  * match exactly — see RelationalQueries' integer-cents policy.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Relational surface (SURVEY.md §2.3)
    "q1_pricing" -> (RelationalQueries.q1Pricing _),
    "q3_shipping" -> (RelationalQueries.q3Shipping _),
    "q5_nation_revenue" -> (RelationalQueries.q5NationRevenue _),
    "top_customers" -> (RelationalQueries.topCustomers _),
    "order_priority" -> (RelationalQueries.orderPriority _),
    "part_brand_stats" -> (RelationalQueries.partBrandStats _),
    "distinct_segments" -> (RelationalQueries.distinctSegments _),
    "lineitem_topk" -> (RelationalQueries.lineitemTopk _),
    "nation_balance" -> (RelationalQueries.nationBalance _),
    "union_order_status" -> (RelationalQueries.unionOrderStatus _),
    "customers_no_orders" -> (RelationalQueries.customersNoOrders _),
    "brand_cheapest" -> (RelationalQueries.brandCheapest _),
    "orders_above_avg" -> (RelationalQueries.ordersAboveAvg _),
    "lineitem_stats" -> (RelationalQueries.lineitemStats _),
    "median_price" -> (RelationalQueries.medianPrice _),
    "shipping_lag" -> (RelationalQueries.shippingLag _),
    "price_quantiles" -> (RelationalQueries.priceQuantiles _),
    "q12_priority_class" -> (RelationalQueries.q12PriorityClass _),
    "q17_small_quantity" -> (RelationalQueries.q17SmallQuantity _),
    "events_funnel" -> (EventQueries.funnel _),
    "events_user_hll" -> (EventQueries.userHll _),
    "q14_promo_share" -> (RelationalQueries.q14PromoShare _),
    "q19_disjunctive" -> (RelationalQueries.q19Disjunctive _),
    "lineitem_unpivot" -> (RelationalQueries.lineitemUnpivot _),
    "customer_max_order" -> (RelationalQueries.customerMaxOrder _),
    "q4_exists_returned" -> (RelationalQueries.q4ExistsReturned _),
    "q13_order_histogram" -> (RelationalQueries.q13OrderHistogram _),
    "q18_large_orders" -> (RelationalQueries.q18LargeOrders _),
    "q22_idle_customers" -> (RelationalQueries.q22IdleCustomers _),
    "q21_waiting_suppliers" -> (RelationalQueries.q21WaitingSuppliers _),
    "q2_min_cost_supplier" -> (RelationalQueries.q2MinCostSupplier _),
    "q20_concentrated_suppliers" -> (RelationalQueries.q20ConcentratedSuppliers _),
    "q10_returned_ranking" -> (RelationalQueries.q10ReturnedRanking _),
    "q15_top_supplier" -> (RelationalQueries.q15TopSupplier _),
    "q7_nation_volume" -> (RelationalQueries.q7NationVolume _),
    // Reference app workloads (SURVEY.md §2.2) + text analysis
    "wc" -> (TextQueries.wordCount _),
    "wc_salted" -> (TextQueries.wordCountSalted _),
    "indexer" -> (TextQueries.invertedIndex _),
    "file_stats" -> (TextQueries.fileStats _),
    "doc_count_by_source" -> (TextQueries.docCountBySource _),
    "token_stats" -> (TextQueries.tokenStats _),
    "text_quality" -> (TextQueries.textQuality _),
    "lang_stats" -> (TextQueries.langStats _),
    "word_heavy_hitters" -> (TextQueries.wordHeavyHitters _),
    "q6_forecast" -> (RelationalQueries.q6Forecast _),
    "price_bands" -> (RelationalQueries.priceBands _),
    "events_props_stats" -> (EventQueries.propsStats _),
    "events_asof" -> (EventQueries.asofPurchase _),
    "events_session_window" -> (EventQueries.sessionWindows _),
    "customer_set_ops" -> (RelationalQueries.customerSetOps _),
    "events_user_pivot" -> (EventQueries.userTypePivot _),
    "events_sliding" -> (EventQueries.sliding _),
    "events_daily" -> (EventQueries.daily _),
    "orders_rollup" -> (RelationalQueries.ordersRollup _),
    "orders_cube" -> (RelationalQueries.ordersCube _),
    "lang_id" -> (LangQueries.langId _),
    "token_count_bpe" -> (LangQueries.tokenCountBpe _),
    "rolling_fingerprint" -> (LangQueries.rollingFingerprint _),
    "events_running_totals" -> (EventQueries.runningTotals _),
    // Dedup pipeline
    "doc_fingerprint" -> (DedupQueries.docFingerprint _),
    "dedup_exact" -> (DedupQueries.dedupExact _),
    "dedup_jaccard" -> (DedupQueries.dedupJaccard _),
    "dedup_substring" -> (DedupQueries.dedupSubstring _),
    "dedup_near" -> (DedupQueries.dedupNear _),
    "simhash" -> (DedupQueries.simhash _),
    "dedup_simhash_pairs" -> (DedupQueries.simhashPairs _),
    "dedup_components" -> (DedupQueries.dedupComponents _),
    // Similarity search
    "embed_topk" -> (SimilarityQueries.topkBruteForce _),
    "embed_topk_lsh" -> (SimilarityQueries.topkLsh _),
    "embed_topk_ivf" -> (SimilarityQueries.topkIvf _),
    "embed_near_pairs" -> (SimilarityQueries.nearPairs _),
    "label_centroids" -> (SimilarityQueries.labelCentroids _),
    "ivf_train" -> (SimilarityQueries.ivfTrain _),
    // Event-time analytics
    "events_hourly" -> (EventQueries.hourly _),
    "events_user_stats" -> (EventQueries.userStats _),
    "events_sessions" -> (EventQueries.sessions _),
    "events_top3_per_type" -> (EventQueries.top3PerType _),
    "events_top3_agg" -> (EventQueries.top3PerTypeAgg _),
    "events_type_share" -> (EventQueries.typeShare _),
    "events_quantile_sketch" -> (EventQueries.quantileSketch _),
    // Multimodal plumbing
    "media_features" -> (MultimodalPipeline.mediaFeatures _),
    // Training-data preparation (decontamination, packing, splitting)
    "decontaminate" -> (graft.pipelines.TrainingPrep.decontaminate _),
    "seq_pack" -> (graft.pipelines.TrainingPrep.seqPack _),
    "doc_repetition" -> (graft.pipelines.TrainingPrep.docRepetition _),
    "train_split" -> (graft.pipelines.TrainingPrep.trainSplit _),
    "bigram_topk" -> (graft.pipelines.TrainingPrep.bigramTopk _),
    "training_pipeline" -> (graft.pipelines.TrainingPrep.trainingPipeline _),
    "stratified_sample" -> (graft.pipelines.TrainingPrep.stratifiedSample _),
    "doc_chunks" -> (graft.pipelines.TrainingPrep.docChunks _),
    // Flagship composition: dedup → near-dup removal → quality/lang gate →
    // per-source accounting, one lazy plan
    "corpus_pipeline" -> (graft.pipelines.CorpusPipeline.corpusSummary _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing" -> RelationalQueries.q1PricingSql,
    "q3_shipping" -> RelationalQueries.q3ShippingSql,
    "q5_nation_revenue" -> RelationalQueries.q5NationRevenueSql,
    "top_customers" -> RelationalQueries.topCustomersSql,
    "order_priority" -> RelationalQueries.orderPrioritySql,
    "part_brand_stats" -> RelationalQueries.partBrandStatsSql,
    "distinct_segments" -> RelationalQueries.distinctSegmentsSql,
    "lineitem_topk" -> RelationalQueries.lineitemTopkSql,
    "nation_balance" -> RelationalQueries.nationBalanceSql,
    "union_order_status" -> RelationalQueries.unionOrderStatusSql,
    "customers_no_orders" -> RelationalQueries.customersNoOrdersSql,
    "brand_cheapest" -> RelationalQueries.brandCheapestSql,
    "orders_above_avg" -> RelationalQueries.ordersAboveAvgSql,
    "lineitem_stats" -> RelationalQueries.lineitemStatsSql,
    "median_price" -> RelationalQueries.medianPriceSql,
    "shipping_lag" -> RelationalQueries.shippingLagSql,
    "price_quantiles" -> RelationalQueries.priceQuantilesSql,
    "q12_priority_class" -> RelationalQueries.q12PriorityClassSql,
    "q17_small_quantity" -> RelationalQueries.q17SmallQuantitySql,
    "events_funnel" -> EventQueries.funnelSql,
    "events_user_hll" -> EventQueries.userHllSql,
    "q14_promo_share" -> RelationalQueries.q14PromoShareSql,
    "q19_disjunctive" -> RelationalQueries.q19DisjunctiveSql,
    "lineitem_unpivot" -> RelationalQueries.lineitemUnpivotSql,
    "customer_max_order" -> RelationalQueries.customerMaxOrderSql,
    "q4_exists_returned" -> RelationalQueries.q4ExistsReturnedSql,
    "q13_order_histogram" -> RelationalQueries.q13OrderHistogramSql,
    "q18_large_orders" -> RelationalQueries.q18LargeOrdersSql,
    "q22_idle_customers" -> RelationalQueries.q22IdleCustomersSql,
    "q21_waiting_suppliers" -> RelationalQueries.q21WaitingSuppliersSql,
    "q2_min_cost_supplier" -> RelationalQueries.q2MinCostSupplierSql,
    "q20_concentrated_suppliers" -> RelationalQueries.q20ConcentratedSuppliersSql,
    "q10_returned_ranking" -> RelationalQueries.q10ReturnedRankingSql,
    "q15_top_supplier" -> RelationalQueries.q15TopSupplierSql,
    "q7_nation_volume" -> RelationalQueries.q7NationVolumeSql,
    "wc" -> TextQueries.wordCountSql,
    "wc_salted" -> TextQueries.wordCountSql,
    "indexer" -> TextQueries.invertedIndexSql,
    "file_stats" -> TextQueries.fileStatsSql,
    "doc_count_by_source" -> TextQueries.docCountBySourceSql,
    "token_stats" -> TextQueries.tokenStatsSql,
    "text_quality" -> TextQueries.textQualitySql,
    "lang_stats" -> TextQueries.langStatsSql,
    "word_heavy_hitters" -> TextQueries.wordHeavyHittersSql,
    "q6_forecast" -> RelationalQueries.q6ForecastSql,
    "price_bands" -> RelationalQueries.priceBandsSql,
    "events_props_stats" -> EventQueries.propsStatsSql,
    "events_asof" -> EventQueries.asofPurchaseSql,
    "events_session_window" -> EventQueries.sessionWindowsSql,
    "customer_set_ops" -> RelationalQueries.customerSetOpsSql,
    "events_user_pivot" -> EventQueries.userTypePivotSql,
    "events_sliding" -> EventQueries.slidingSql,
    "events_daily" -> EventQueries.dailySql,
    "orders_rollup" -> RelationalQueries.ordersRollupSql,
    "orders_cube" -> RelationalQueries.ordersCubeSql,
    "lang_id" -> LangQueries.langIdSql,
    "token_count_bpe" -> LangQueries.tokenCountBpeSql,
    "rolling_fingerprint" -> LangQueries.rollingFingerprintSql,
    "events_running_totals" -> EventQueries.runningTotalsSql,
    "doc_fingerprint" -> DedupQueries.docFingerprintSql,
    "dedup_exact" -> DedupQueries.dedupExactSql,
    "dedup_jaccard" -> DedupQueries.dedupJaccardSql,
    "dedup_substring" -> DedupQueries.dedupSubstringSql,
    "dedup_near" -> DedupQueries.dedupNearSql,
    "simhash" -> DedupQueries.simhashSql,
    "dedup_simhash_pairs" -> DedupQueries.simhashPairsSql,
    "dedup_components" -> DedupQueries.dedupComponentsSql,
    "embed_topk" -> SimilarityQueries.topkBruteForceSql,
    // The "approximate" paths are still deterministic functions of the data
    // (inlined hyperplane signs; exact integer-scaled centroids), so each has
    // an exact SQL oracle.
    "embed_topk_lsh" -> SimilarityQueries.topkLshSql,
    "embed_topk_ivf" -> SimilarityQueries.topkIvfSql,
    "embed_near_pairs" -> SimilarityQueries.nearPairsSql,
    "label_centroids" -> SimilarityQueries.labelCentroidsSql,
    "ivf_train" -> SimilarityQueries.ivfTrainSql,
    "events_hourly" -> EventQueries.hourlySql,
    "events_user_stats" -> EventQueries.userStatsSql,
    "events_sessions" -> EventQueries.sessionsSql,
    "events_top3_per_type" -> EventQueries.top3PerTypeSql,
    "events_top3_agg" -> EventQueries.top3PerTypeSql,
    "events_type_share" -> EventQueries.typeShareSql,
    "events_quantile_sketch" -> EventQueries.quantileSketchSql,
    "media_features" -> MultimodalPipeline.mediaFeaturesSql,
    "decontaminate" -> graft.pipelines.TrainingPrep.decontaminateSql,
    "seq_pack" -> graft.pipelines.TrainingPrep.seqPackSql,
    "doc_repetition" -> graft.pipelines.TrainingPrep.docRepetitionSql,
    "train_split" -> graft.pipelines.TrainingPrep.trainSplitSql,
    "bigram_topk" -> graft.pipelines.TrainingPrep.bigramTopkSql,
    "training_pipeline" -> graft.pipelines.TrainingPrep.trainingPipelineSql,
    "stratified_sample" -> graft.pipelines.TrainingPrep.stratifiedSampleSql,
    "doc_chunks" -> graft.pipelines.TrainingPrep.docChunksSql,
    "corpus_pipeline" -> graft.pipelines.CorpusPipeline.corpusSummarySql,
  )
}
