package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 (plus the
  * training-data-pipeline operators) to a DataFrame program over the
  * TESTDATA tables; `oracleSql` holds the DuckDB-equivalent SQL for each
  * oracle-checkable query. Non-SQL-expressible ops (hash-seeded sketches)
  * carry no oracle → rows-only check + ScalaTest invariants.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map[String, Q](
    "q1_agg"          -> (Relational.q1Agg _),
    "q2_drilldown"    -> (Relational.q2Drilldown _),
    "q3_antijoin"     -> (Relational.q3AntiJoin _),
    "q4_files_browse" -> (Relational.q4FilesBrowse _),
    "q5_latest_per_key" -> (Relational.q5LatestPerKey _),
    "q6_page"         -> (Relational.q6Page _),
    "q7_join_agg"     -> (Relational.q7JoinAgg _),
    "q8_setops"       -> (Relational.q8SetOps _),
    "q9_predicates"   -> (Relational.q9Predicates _),
    "q10_rollup"      -> (Relational.q10Rollup _),
    "q11_partition_stats"     -> (Metadata.q11PartitionStats _),
    "q12_table_summary"       -> (Metadata.q12TableSummary _),
    "q13_files_browse"        -> (Metadata.q13FilesBrowse _),
    "q14_missing_files"       -> (Metadata.q14MissingFiles _),
    "q15_optimize_candidates" -> (Metadata.q15OptimizeCandidates _),
    "q16_s3_parse"            -> (Metadata.q16S3Parse _),
    "q17_claim_oldest"        -> (Metadata.q17ClaimOldest _),
    "q20_dedup_exact"         -> (TrainingData.q20DedupExact _),
    "q21_ngram_jaccard"       -> (TrainingData.q21NgramJaccard _),
    "q22_minhash_lsh"         -> (TrainingData.q22MinhashLsh _),
    "q23_simhash_pairs"       -> (TrainingData.q23SimhashPairs _),
    "q24_embedding_neardup"   -> (TrainingData.q24EmbeddingNearDup _),
    "q25_ann_topk"            -> (TrainingData.q25AnnTopK _),
    "q26_ann_lsh"             -> (TrainingData.q26AnnLsh _),
    "q27_token_stats"         -> (TrainingData.q27TokenStats _),
    "q28_quality"             -> (TrainingData.q28Quality _),
    "q29_langid"              -> (TrainingData.q29LangId _),
    "q30_fingerprint"         -> (TrainingData.q30Fingerprint _),
    "q31_ann_ivf"             -> (TrainingData.q31AnnIvf _),
    "q32_windowed_counts"     -> (Streams.q32WindowedCounts _),
    "q33_sessions"            -> (Streams.q33Sessions _),
    "q34_multimodal_summary"  -> (Streams.q34MultimodalSummary _),
    "q35_outer_join"          -> (Relational2.q35OuterJoin _),
    "q36_semi_join"           -> (Relational2.q36SemiJoin _),
    "q37_union"               -> (Relational2.q37Union _),
    "q38_correlated_avg"      -> (Relational2.q38CorrelatedAvg _),
    "q39_strings"             -> (Relational2.q39Strings _),
    "q40_dedup_clusters"      -> (TrainingData.q40DedupClusters _),
    "q41_snapshot_files"      -> (Metadata.q41SnapshotFiles _),
    "q42_profile"             -> (graft.operators.Profile.q42Profile _),
    "q43_json_path"           -> (Metadata.q43JsonPath _),
    "q44_array_agg"           -> (Relational3.q44ArrayAgg _),
    "q45_cube"                -> (Relational3.q45Cube _),
    "q46_percentiles"         -> (Relational3.q46Percentiles _),
    "q47_dedup_clusters_lsh"  -> (TrainingData.q47DedupClustersLsh _),
    "q48_stratified_sample"   -> (graft.operators.Sampling.q48StratifiedSample _),
    "q49_decontaminate"       -> (graft.operators.Decontaminate.q49Decontaminate _),
    "q50_sequence_packing"    -> (graft.operators.Packing.q50SequencePacking _),
    "q51_repetition"          -> (graft.operators.TextAnalysis.repetitionMetrics _),
    "q52_asof_attribution"    -> (Streams.q52AsOfAttribution _),
    "q53_vocab_coverage"      -> ((s, d) => graft.operators.TextAnalysis.vocabCoverage(s, d)),
    "q54_top_tokens"          -> ((s, d) => graft.operators.TextAnalysis.topTokensPerLang(s, d)),
    "q55_ann_pq"              -> ((s, d) => graft.operators.ProductQuantization.annPq(s, d)),
    "q56_order_timeline"      -> (Relational3.q56OrderTimeline _),
    "q57_order_count_dist"    -> (Relational2.q57OrderCountDist _),
    "q58_large_orders"        -> ((s, d) => Relational2.q58LargeOrders(s, d)),
    "q59_chunks"              -> (graft.operators.Chunking.q59Chunks _),
    "q60_top_bigrams"         -> ((s, d) => graft.operators.TextAnalysis.topBigrams(s, d)),
    "q61_rolling_activity"    -> (Streams.q61RollingActivity _),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg"          -> Relational.q1Sql,
    "q2_drilldown"    -> Relational.q2Sql,
    "q3_antijoin"     -> Relational.q3Sql,
    "q4_files_browse" -> Relational.q4Sql,
    "q5_latest_per_key" -> Relational.q5Sql,
    "q6_page"         -> Relational.q6Sql,
    "q7_join_agg"     -> Relational.q7Sql,
    "q8_setops"       -> Relational.q8Sql,
    "q9_predicates"   -> Relational.q9Sql,
    "q10_rollup"      -> Relational.q10Sql,
    "q11_partition_stats"     -> Metadata.q11Sql,
    "q12_table_summary"       -> Metadata.q12Sql,
    "q13_files_browse"        -> Metadata.q13Sql,
    "q14_missing_files"       -> Metadata.q14Sql,
    "q15_optimize_candidates" -> Metadata.q15Sql,
    "q16_s3_parse"            -> Metadata.q16Sql,
    "q17_claim_oldest"        -> Metadata.q17Sql,
    "q20_dedup_exact"         -> TrainingData.q20Sql,
    "q21_ngram_jaccard"       -> TrainingData.q21Sql,
    "q22_minhash_lsh"         -> TrainingData.q22Sql,
    "q24_embedding_neardup"   -> TrainingData.q24Sql,
    "q25_ann_topk"            -> TrainingData.q25Sql,
    "q27_token_stats"         -> TrainingData.q27Sql,
    "q28_quality"             -> TrainingData.q28Sql,
    "q29_langid"              -> TrainingData.q29Sql,
    "q32_windowed_counts"     -> Streams.q32Sql,
    "q33_sessions"            -> Streams.q33Sql,
    "q35_outer_join"          -> Relational2.q35Sql,
    "q36_semi_join"           -> Relational2.q36Sql,
    "q37_union"               -> Relational2.q37Sql,
    "q38_correlated_avg"      -> Relational2.q38Sql,
    "q39_strings"             -> Relational2.q39Sql,
    "q40_dedup_clusters"      -> TrainingData.q40Sql,
    "q41_snapshot_files"      -> Metadata.q41Sql,
    "q42_profile"             -> graft.operators.Profile.q42Sql,
    "q43_json_path"           -> Metadata.q43Sql,
    "q44_array_agg"           -> Relational3.q44Sql,
    "q45_cube"                -> Relational3.q45Sql,
    "q46_percentiles"         -> Relational3.q46Sql,
    "q47_dedup_clusters_lsh"  -> TrainingData.q47Sql,
    "q48_stratified_sample"   -> graft.operators.Sampling.q48Sql,
    "q49_decontaminate"       -> graft.operators.Decontaminate.q49Sql,
    "q50_sequence_packing"    -> graft.operators.Packing.q50Sql,
    "q51_repetition"          -> graft.operators.TextAnalysis.repetitionMetricsSql,
    "q52_asof_attribution"    -> Streams.q52Sql,
    "q53_vocab_coverage"      -> graft.operators.TextAnalysis.vocabCoverageSql(20),
    "q54_top_tokens"          -> graft.operators.TextAnalysis.topTokensPerLangSql(10),
    "q56_order_timeline"      -> Relational3.q56Sql,
    "q57_order_count_dist"    -> Relational2.q57Sql,
    "q58_large_orders"        -> Relational2.q58Sql(300),
    "q59_chunks"              -> graft.operators.Chunking.q59Sql,
    "q60_top_bigrams"         -> graft.operators.TextAnalysis.topBigramsSql(20),
    "q61_rolling_activity"    -> Streams.q61Sql,
  )
}
