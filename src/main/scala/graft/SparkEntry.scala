package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Thin registry: implementations live under graft.ops / graft.dedup.
  */
object SparkEntry {

  /** Flagship query (the reference's GenerateLabeledPoints semantics on the
    * customer table) on /root/testdata/sf0.001 through the skew-aware
    * strategy chooser; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.dedup.DedupStrategy.pairFeaturesAuto(
      graft.Tables(spark, "/root/testdata/sf0.001", "customer"),
      Dedup.customerConfig,
      k = 8)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_pairs" -> (Dedup.pairsNaive _),
    "dedup_pairs_triangle" -> (Dedup.pairsTriangle _),
    "q1_agg" -> (Relational.q1Agg _),
    "q2_region_revenue" -> (Relational.q2RegionRevenue _),
    "q3_priority_revenue" -> (Relational.q3PriorityRevenue _),
    "q4_semi_join" -> (Relational.q4SemiJoin _),
    "q5_anti_join" -> (Relational.q5AntiJoin _),
    "q6_left_join_agg" -> (Relational.q6LeftJoinAgg _),
    "q7_window_topn" -> (Relational.q7WindowTopN _),
    "q8_window_running" -> (Relational.q8WindowRunning _),
    "q9_rollup" -> (Relational.q9Rollup _),
    "q10_cube" -> (Relational.q10Cube _),
    "q11_distinct_agg" -> (Relational.q11DistinctAgg _),
    "q12_topk" -> (Relational.q12TopK _),
    "q13_setops" -> (Relational.q13SetOps _),
    "q14_scalar_fns" -> (Relational.q14ScalarFns _),
    "q15_json" -> (Relational.q15Json _),
    "q16_distinct" -> (Relational.q16Distinct _),
    "q17_window_tumbling" -> (Events.q17WindowTumbling _),
    "q18_window_sliding" -> (Events.q18WindowSliding _),
    "q19_sessionize" -> (Events.q19Sessionize _),
    "q20_hourly_uniques" -> (Events.q20HourlyUniques _),
    "q21_token_stats" -> (TextOps.q21TokenStats _),
    "q22_quality_score" -> (TextOps.q22QualityScore _),
    "q23_langid" -> (TextOps.q23LangId _),
    "q24_fingerprint" -> (TextOps.q24Fingerprint _),
    "q25_exact_dedup" -> (TextOps.q25ExactDedup _),
    "q26_minhash_sig" -> ((s, d) => NearDup.q26MinhashSig(s, d)),
    "q27_lsh_pairs" -> ((s, d) => NearDup.q27LshPairs(s, d)),
    "q28_simhash" -> (NearDup.q28Simhash _),
    "q29_knn_brute" -> ((s, d) => Embeddings.q29KnnBrute(s, d)),
    "q30_ann_lsh" -> ((s, d) => Embeddings.q30AnnLsh(s, d)),
    "q31_centroids" -> (Embeddings.q31Centroids _),
    "q32_centroid_cosine" -> (Embeddings.q32CentroidCosine _),
    "q33_dup_score" -> (MlOps.q33DupScore _),
    "q34_media_features" -> (Multimodal.q34MediaFeatures _),
    "q35_percentile" -> (Relational.q35Percentile _),
    "q36_asof_join" -> (Events.q36AsofJoin _),
    "q37_simhash_pairs" -> ((s, d) => NearDup.q37SimhashPairs(s, d)),
    "q38_approx_stats" -> (Relational.q38ApproxStats _),
    "q39_pivot" -> (Relational.q39Pivot _),
    "q40_unpivot" -> (Relational.q40Unpivot _),
    "q41_grouping_sets" -> (Relational.q41GroupingSets _),
    "q42_salted_agg" -> (Relational.q42SaltedAgg _),
    "q43_vocab_topk" -> (TextOps.q43VocabTopK _),
    "q44_tf_df" -> (TextOps.q44TfDf _),
    "q45_length_histogram" -> (TextOps.q45LengthHistogram _),
    "q46_ivf_ann" -> (Embeddings.q46IvfAnn _),
    "q47_range_join" -> (Relational.q47RangeJoin _),
    "q48_embedding_neardup" -> ((s, d) => Embeddings.q48EmbeddingNeardup(s, d)),
    "q49_entity_clusters" -> (Dedup.entityClusters _),
    "q50_exact_stats" -> (Relational.q50ExactStats _),
    "q51_corpus_curation" -> (Curation.q51CorpusCuration _),
    "q52_stratified_sample" -> (Curation.q52StratifiedSample _),
    "q53_span_dedup" -> ((s, d) => NearDup.q53SpanDedup(s, d)),
    "q54_dup_features" -> (MlOps.q54DupFeatures _),
    "q55_kmeans_refine" -> (Embeddings.q55KmeansRefine _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "dedup_pairs" -> Dedup.pairsOracleSql,
    "dedup_pairs_triangle" -> Dedup.pairsOracleSql,
    "q1_agg" -> Relational.q1AggSql,
    "q2_region_revenue" -> Relational.q2RegionRevenueSql,
    "q3_priority_revenue" -> Relational.q3PriorityRevenueSql,
    "q4_semi_join" -> Relational.q4SemiJoinSql,
    "q5_anti_join" -> Relational.q5AntiJoinSql,
    "q6_left_join_agg" -> Relational.q6LeftJoinAggSql,
    "q7_window_topn" -> Relational.q7WindowTopNSql,
    "q8_window_running" -> Relational.q8WindowRunningSql,
    "q9_rollup" -> Relational.q9RollupSql,
    "q10_cube" -> Relational.q10CubeSql,
    "q11_distinct_agg" -> Relational.q11DistinctAggSql,
    "q12_topk" -> Relational.q12TopKSql,
    "q13_setops" -> Relational.q13SetOpsSql,
    "q14_scalar_fns" -> Relational.q14ScalarFnsSql,
    "q15_json" -> Relational.q15JsonSql,
    "q16_distinct" -> Relational.q16DistinctSql,
    "q17_window_tumbling" -> Events.q17WindowTumblingSql,
    "q18_window_sliding" -> Events.q18WindowSlidingSql,
    "q19_sessionize" -> Events.q19SessionizeSql,
    "q20_hourly_uniques" -> Events.q20HourlyUniquesSql,
    "q35_percentile" -> Relational.q35PercentileSql,
    "q36_asof_join" -> Events.q36AsofJoinSql,
    "q39_pivot" -> Relational.q39PivotSql,
    "q40_unpivot" -> Relational.q40UnpivotSql,
    "q41_grouping_sets" -> Relational.q41GroupingSetsSql,
    "q42_salted_agg" -> Relational.q42SaltedAggSql,
    "q43_vocab_topk" -> TextOps.q43VocabTopKSql,
    "q44_tf_df" -> TextOps.q44TfDfSql,
    "q45_length_histogram" -> TextOps.q45LengthHistogramSql,
    "q46_ivf_ann" -> Embeddings.q46IvfAnnSql,
    "q47_range_join" -> Relational.q47RangeJoinSql,
    "q48_embedding_neardup" -> Embeddings.q48EmbeddingNeardupSql,
    "q49_entity_clusters" -> Dedup.entityClustersSql,
    "q37_simhash_pairs" -> NearDup.q37SimhashPairsSql,
    "q21_token_stats" -> TextOps.q21TokenStatsSql,
    "q22_quality_score" -> TextOps.q22QualityScoreSql,
    "q23_langid" -> TextOps.q23LangIdSql,
    "q24_fingerprint" -> TextOps.q24FingerprintSql,
    "q25_exact_dedup" -> TextOps.q25ExactDedupSql,
    "q26_minhash_sig" -> NearDup.q26MinhashSigSql,
    "q27_lsh_pairs" -> NearDup.q27LshPairsSql,
    "q28_simhash" -> NearDup.q28SimhashSql,
    "q29_knn_brute" -> Embeddings.q29KnnBruteSql,
    "q30_ann_lsh" -> Embeddings.q30AnnLshSql,
    "q31_centroids" -> Embeddings.q31CentroidsSql,
    "q32_centroid_cosine" -> Embeddings.q32CentroidCosineSql,
    "q50_exact_stats" -> Relational.q50ExactStatsSql,
    "q51_corpus_curation" -> Curation.q51CorpusCurationSql,
    "q52_stratified_sample" -> Curation.q52StratifiedSampleSql,
    "q53_span_dedup" -> NearDup.q53SpanDedupSql,
    "q54_dup_features" -> MlOps.q54DupFeaturesSql,
    "q55_kmeans_refine" -> Embeddings.q55KmeansRefineSql
  )
}
