package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries => A, ClusterQueries => K, CoreQueries => C, LlmQueries => L, PipelineQueries => P, StatsQueries => S}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    C.q3JoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- core delegated-SQL surface (SURVEY §2.2, 2.4-2.8, 2.11) ---
    "q1_pricing_summary"  -> (C.q1PricingSummary _),
    "q2_filter_pushdown"  -> (C.q2FilterPushdown _),
    "q3_join_agg"         -> (C.q3JoinAgg _),
    "q4_star_join"        -> (C.q4StarJoin _),
    "q5_topk"             -> (C.q5TopK _),
    "q6_window_rank"      -> (C.q6WindowRank _),
    "q7_window_running"   -> (C.q7WindowRunning _),
    "q8_window_lag"       -> (C.q8WindowLag _),
    "q9_null_stats"       -> (C.q9NullStats _),
    "q10_semi_anti_join"  -> (C.q10SemiAnti _),
    "q11_set_ops"         -> (C.q11SetOps _),
    "q12_rollup"          -> (C.q12Rollup _),
    "q13_json_extract"    -> (C.q13Json _),
    "q14_scalar_funcs"    -> (C.q14Scalars _),
    "q15_event_windows"   -> (C.q15EventWindows _),
    "q16_sessionization"  -> (C.q16Sessions _),
    "q17_column_stats"    -> (C.q17ColumnStats _),
    "q18_cube"            -> (C.q18Cube _),
    // --- ELT pipeline: write strategies, state, evolution (§2.3, 2.9, 2.10) ---
    "q20_merge_upsert"    -> (P.q20Merge _),
    "q21_append"          -> (P.q21Append _),
    "q22_replace"         -> (P.q22Replace _),
    "q23_auto_strategy"   -> (P.q23AutoStrategy _),
    "q24_schema_evolution" -> (P.q24SchemaEvolution _),
    "q25_incremental_cursor" -> (P.q25Incremental _),
    "q26_record_normalize" -> (P.q26RecordNormalize _),
    "q27_name_normalize"  -> (P.q27NameNormalize _),
    "q28_sql_passthrough" -> (P.q28SqlPassthrough _),
    "q29_bucketed_merge"  -> (P.q29BucketedMerge _),
    // --- LLM-pipeline operators (north-star; BASELINE.json) ---
    "q30_dedup_exact"     -> (L.q30DedupExact _),
    "q31_dedup_minhash_lsh" -> (L.q31MinhashLsh _),
    "q32_simhash"         -> (L.q32Simhash _),
    "q33_ngram_jaccard"   -> (L.q33NgramJaccard _),
    "q34_embed_near_dups" -> (L.q34EmbedNearDups _),
    "q35_cosine_topk"     -> (L.q35CosineTopK _),
    "q36_langid"          -> (L.q36LangId _),
    "q37_quality_score"   -> (L.q37Quality _),
    "q38_token_count"     -> (L.q38TokenCount _),
    "q39_fingerprint"     -> (L.q39Fingerprint _),
    "q40_multimodal_features" -> (L.q40Multimodal _),
    "q41_frame_sample"    -> (L.q41FrameSample _),
    "q42_ivf_topk"        -> (L.q42IvfTopK _),
    "q43_corpus_clean"    -> (L.q43CorpusClean _),
    // --- round-2 analytics surface: temporal/skew joins, grouping sets,
    //     pivot, sampling, contamination, repetition, PII scrub ---
    "q44_asof_join"       -> (A.q44AsofJoin _),
    "q45_salted_join"     -> (A.q45SaltedJoin _),
    "q46_stratified_sample" -> (A.q46StratifiedSample _),
    "q47_contamination"   -> (A.q47Contamination _),
    "q48_repetition"      -> (A.q48Repetition _),
    "q49_distinctive_terms" -> (A.q49DistinctiveTerms _),
    "q50_grouping_sets"   -> (A.q50GroupingSets _),
    "q51_pivot"           -> (A.q51Pivot _),
    "q52_pii_scrub"       -> (A.q52PiiScrub _),
    "q53_percentiles"     -> (A.q53Percentiles _),
    "q54_range_join"      -> (A.q54RangeJoin _),
    "q55_window_ranks"    -> (A.q55WindowRanks _),
    // --- statistical profiling: exact-moment corr/regression, fuzzy
    //     entity matching, anomaly detection ---
    "q56_corr_regression" -> (S.q56CorrRegression _),
    "q57_fuzzy_match"     -> (S.q57FuzzyMatch _),
    "q58_anomaly_zscore"  -> (S.q58AnomalyZscore _),
    // --- embedding clustering: SemDeDup semantic dedup + Lloyd k-means ---
    "q59_semantic_dedup"  -> (K.q59SemanticDedup _),
    "q60_kmeans_iter"     -> (K.q60KmeansIter _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary"  -> C.q1Sql,
    "q2_filter_pushdown"  -> C.q2Sql,
    "q3_join_agg"         -> C.q3Sql,
    "q4_star_join"        -> C.q4Sql,
    "q5_topk"             -> C.q5Sql,
    "q6_window_rank"      -> C.q6Sql,
    "q7_window_running"   -> C.q7Sql,
    "q8_window_lag"       -> C.q8Sql,
    "q9_null_stats"       -> C.q9Sql,
    "q10_semi_anti_join"  -> C.q10Sql,
    "q11_set_ops"         -> C.q11Sql,
    "q12_rollup"          -> C.q12Sql,
    "q13_json_extract"    -> C.q13Sql,
    "q14_scalar_funcs"    -> C.q14Sql,
    "q15_event_windows"   -> C.q15Sql,
    "q16_sessionization"  -> C.q16Sql,
    "q17_column_stats"    -> C.q17Sql,
    "q18_cube"            -> C.q18Sql,
    "q20_merge_upsert"    -> P.q20Sql,
    "q21_append"          -> P.q21Sql,
    "q22_replace"         -> P.q22Sql,
    "q23_auto_strategy"   -> P.q23Sql,
    "q24_schema_evolution" -> P.q24Sql,
    "q25_incremental_cursor" -> P.q25Sql,
    "q26_record_normalize" -> P.q26Sql,
    "q27_name_normalize"  -> P.q27Sql,
    "q28_sql_passthrough" -> P.q28Sql,
    "q29_bucketed_merge"  -> P.q29Sql,
    "q30_dedup_exact"     -> L.q30Sql,
    "q31_dedup_minhash_lsh" -> L.q31Sql,
    "q32_simhash"         -> L.q32Sql,
    "q33_ngram_jaccard"   -> L.q33Sql,
    "q34_embed_near_dups" -> L.q34Sql,
    "q35_cosine_topk"     -> L.q35Sql,
    "q36_langid"          -> L.q36Sql,
    "q37_quality_score"   -> L.q37Sql,
    "q38_token_count"     -> L.q38Sql,
    "q39_fingerprint"     -> L.q39Sql,
    "q40_multimodal_features" -> L.q40Sql,
    "q41_frame_sample"    -> L.q41Sql,
    "q42_ivf_topk"        -> L.q42Sql,
    "q43_corpus_clean"    -> L.q43Sql,
    "q44_asof_join"       -> A.q44Sql,
    "q45_salted_join"     -> A.q45Sql,
    "q46_stratified_sample" -> A.q46Sql,
    "q47_contamination"   -> A.q47Sql,
    "q48_repetition"      -> A.q48Sql,
    "q49_distinctive_terms" -> A.q49Sql,
    "q50_grouping_sets"   -> A.q50Sql,
    "q51_pivot"           -> A.q51Sql,
    "q52_pii_scrub"       -> A.q52Sql,
    "q53_percentiles"     -> A.q53Sql,
    "q54_range_join"      -> A.q54Sql,
    "q55_window_ranks"    -> A.q55Sql,
    "q56_corr_regression" -> S.q56Sql,
    "q57_fuzzy_match"     -> S.q57Sql,
    "q58_anomaly_zscore"  -> S.q58Sql,
    "q59_semantic_dedup"  -> K.q59Sql,
    "q60_kmeans_iter"     -> K.q60Sql,
  )
}
