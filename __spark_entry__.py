"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``inspectadb_spark`` (SURVEY.md §2 contract).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from inspectadb_spark import queries as _corpus  # noqa: E402
from inspectadb_spark.session import SEMANTIC_CONFS  # noqa: E402

# ---------------------------------------------------------------------------
# Driver-facing ordering. The driver verifies the FIRST 50 keys of queries()
# in dict-iteration order (confirmed in r02-r12 samples). Rounds 2-12 drove
# 386 distinct oracled ids green; the 13 round-12 additions (q351-q363)
# have never been driver-sampled. The round-13 window (VERDICT r12 item 1)
# front-loads those 13 — cumulative coverage reaches 399/399 — then spends
# the remaining 37 slots on the STALEST evidence: all 36 ids whose latest
# green row is r04 (the round-4 window family: window/scalar extension
# suites, b/c-variants, derived-partsupp TPC-H, retrieval/curation
# composites) plus one r05-stale id. tests/test_entry.py pins all of this
# against the registry.
# Round-14 window (VERDICT r13 item 1): the oracled backlog is 0 (cumulative
# 399/399), so every slot refreshes evidence. (a) front-loads the
# round-13-rewritten oracled ids never driver-sampled post-change (the
# semantic-surgery set first); (b) the three ids this optimization round
# itself touches; (c) the stalest remaining evidence (r05-green, registry
# order). q53d/q267b from VERDICT's list are rows-only (no oracle SQL) and
# would waste a slot — their shared operators are covered via q43c/q44c
# (r13-confirmed) and q267. tests/test_entry.py pins all of this.
_ROUND14_FRONT = [
    # (a) round-13 rewrites awaiting driver confirmation — heaviest
    # semantic surgery first (q102 factorization, q244 numpy percentile,
    # q179 vectorized recurrence, q182 full-outer changelog, q296 NULL-class
    # tag, tpch_q21 window rewrite, batch_cross_dots family; q53d/q267b/
    # q207/q199 from VERDICT's list are rows-only — no oracle SQL — their
    # shared operators are driver-covered via the oracled family members)
    "q102_null_safe_join", "q244_theil_sen", "q179_capped_sessions",
    "q182_repair_changelog", "q296_multiclass_prf", "tpch_q21",
    "q202_margin_bitext", "q203_matryoshka_recall",
    "q193_hard_negatives", "q224_knn_label_accuracy", "q267_mutual_nn",
    "q187_poisson_bootstrap",
    "q250_dedup_threshold_sweep", "q240_inclusion_audit",
    "q245_join_cardinality_audit", "q281_cramers_v", "q166_chi_square",
    "q306_mutual_information", "q173_psi_drift", "q273_spearman",
    "q264_ngram_coverage", "q130_curation_pipeline",
    "q284_shingle_containment", "q268_winnowing_neardup",
    "q266_winnowing_profile", "q131_dup_spans", "q137_cross_source_dups",
    "q142_fuzzy_join", "q129_boilerplate", "q198_heavy_hitters",
    "q237_keep_best_dedup", "q219_simhash_calibration",
    "q280_avg_precision",
    # (b) this round's focus ids (q204 rewritten, q302 examined/
    # adjudicated, q43g r13-touched and r05-stale)
    "q204_minhash_calibration", "q302_kn_bigram_xent",
    "q43g_blocked_neardup",
    # (c) stalest remaining evidence (latest green row r05), registry order
    "q116_interval_union", "q123_source_top_p", "q127_session_concurrency",
    "q128_nearest_click", "q135_semantic_dedup", "q136_vocab_growth",
    "q141_salted_agg", "q144_pagerank", "q145_skew_profile",
    "q153_triangles", "q159_inverted_index", "q168_event_pattern",
    "q171_time_travel", "q177_group_by_all",
]

_ROUND13_FRONT = [
    # (a) the 13 never-driver-sampled round-12 additions — backlog to zero
    "q351_pq_adc_topk", "q352_pq_filtered_topk", "q353_sprt",
    "q354_randomized_response", "q355_msttr", "q356_lsh_bucket_skew",
    "q357_dp_quantile", "q358_conformal_interval",
    "q359_xmr_control_chart", "q360_neyman_allocation", "q361_nzv_screen",
    "q362_hill_tail_index", "q363_diff_in_differences",
    # (b) all 36 ids whose latest green row is r04 — the stalest evidence
    # window/scalar extension families
    "q104_time_range_frame", "q105_generator_outer", "q107_safe_casts",
    "q108_regex_suite", "q109_bitwise_suite", "q110_date_suite2",
    "q111_running_distinct", "q112_sliding_median",
    # dedup / merge / retrieval / curation composites
    "q114_minhash_lsh_portable", "q115_merge_upsert", "q120_bm25_topk",
    "q121_cdc_chunking", "q122_hybrid_rrf", "q124_cdc_chunk_pairs",
    "q125_embedding_dim_stats", "q126_mixture_rebalance",
    "q126b_weighted_rebalance",
    # scalar/dedup/text b/c-variants
    "q42b_from_json", "q42c_variant", "q43c_cosine_neardup",
    "q44b_simhash", "q44c_jaccard_pairs", "q45b_lang_stats",
    "q45c_text_quality", "q45f_lang_id",
    # DQ / file-format roundtrips / reshaping / hierarchy / diff
    "q54b_dq_integrity", "q55b_json_roundtrip", "q55c_orc_roundtrip",
    "q55d_xml_roundtrip", "q57b_unpivot", "q59_hierarchical_rollup",
    "q98_table_diff",
    # derived-partsupp TPC-H adaptations
    "tpch_q02", "tpch_q11", "tpch_q16", "tpch_q20",
    # (c) one r05-stale id fills slot 50
    "q106_array_algebra",
]

# The round-12 window (driver-green 50/50 in r12); behind the fresh window.
_ROUND12_FRONT = [
    # (a) the 15 never-driver-sampled round-11 additions — backlog to zero
    "q336_bucketed_join", "q337_binaryfile_ingest", "q338_pyds_roundtrip",
    "q339_ivf_knn_join", "q340_ivf_index_topk", "q341_quarantine_ingest",
    "q342_rbf_mmd_drift", "q343_k_anonymity", "q344_k_anonymize_sweep",
    "q345_t_closeness", "q346_dsir_selection", "q347_dp_noisy_release",
    "q348_dp_sum_release", "q349_dp_thresholded_histogram",
    "q350_filtered_vector_search",
    # (b) the seven ids whose only green rows are r02 — stalest evidence
    "q95_recursive_reachability", "q96_percentile_within_group",
    "q102_null_safe_join", "q103_group_by_all", "q113_lateral_topk",
    "q118_crosstab", "q119_equidepth_histogram",
    # (c) the r03-green normative window/sort/set/scalar block (18 ids)
    "q24_percentile", "q25_ranking", "q26_running_sum", "q27_sliding_frame",
    "q28_lag_lead", "q29_distribution", "q30_range_frame",
    "q31_topk_per_group", "q32_sort_limit_offset", "q33_union",
    "q34_intersect", "q35_except", "q36_string_suite", "q37_date_suite",
    "q38_math_suite", "q39_array_suite", "q40_higher_order", "q41_map_suite",
    # (d) ten r04-stale §2 contract-spine rows
    "q52_udf_parity", "q53_multimodal_blobs", "q54_dq_profile",
    "q55_csv_roundtrip", "q56_schema_drift", "q57_pivot",
    "q58_scalar_subquery", "q60_range_join", "q61_not_in_3vl",
    "q62_udtf_tokens",
]

# The round-11 window (driver-green 50/50 in r11); behind the fresh window.
_ROUND11_FRONT = [
    # (a) the final 14 never-driver-sampled oracled ids — backlog to zero
    "q322_cmh_test", "q323_decision_stump",
    "q324_calibration_fit", "q325_fleiss_kappa",
    "q326_capture_recapture", "q327_diversity_index",
    "q328_jackknife_ratio_se", "q329_gumbel_maxima",
    "q330_theil_decomposition", "q331_atkinson",
    "q332_decayed_ltv", "q333_cold_start_rate",
    "q334_icc_design_effect", "q335_winsorized_ab",
    # (b) the four ids whose only green row is r02 — the stalest evidence
    "q01_scan_count", "q34b_intersect_all", "q35b_except_all",
    "q37b_time_parts",
    # (c) r03-green normative headliners + join family, stale since r03
    "q13_asof_join", "q42_json", "q43_cosine_topk", "q44_exact_dedup",
    "q45_token_counts", "q46_cdc_apply", "q47_scd2", "q48_sessionize",
    "q49_tumbling", "q50_sliding", "q51_sink_roundtrip",
    "q21_conditional_agg", "q02_project_case", "q03_predicates",
    "q04_regex_topk", "q05_inner_join", "q06_star_join", "q07_left_join",
    "q08_full_join", "q09_semi_join", "q10_anti_join", "q11_cross_join",
    "q12_theta_join", "q14_global_agg", "q15_pricing_summary",
    "q16_having", "q17_multi_distinct", "q18_grouping_sets", "q19_rollup",
    "q20_cube", "q22_max_by", "q23_list_agg",
]

# The round-9 window (driver-green 50/50 in r09 and re-run green in r10);
# behind the fresh window.
_ROUND9_FRONT = [
    "q92_posexplode",
    "q94_cms_estimates", "q191_wilson_ci", "q196_calibration_bins",
    "q215_weighted_median", "q244_theil_sen",
    "q245_join_cardinality_audit",
    "q279_welch_ttest", "q280_avg_precision", "q281_cramers_v",
    "q282_mcnemar", "q283_js_divergence", "q284_shingle_containment",
    "q285_anova_f", "q286_jarque_bera", "q287_levene_mean",
    "q288_wilcoxon_signed_rank", "q289_cochran_q", "q290_bartlett",
    "q291_ndcg", "q292_mrr", "q293_cohens_kappa", "q294_brier_murphy",
    "q295_ece", "q296_multiclass_prf",
    "q297_ljung_box", "q298_durbin_watson", "q299_runs_test",
    "q300_grubbs",
    "q301_good_turing", "q302_kn_bigram_xent", "q303_flesch",
    "q304_hapax", "q305_isotropy",
    "q306_mutual_information", "q307_entropy_rate", "q308_hellinger",
    "q309_vocab_jaccard", "q310_permutation_entropy",
    "q311_mann_kendall", "q312_cochran_armitage", "q313_page_trend",
    "q314_rbo", "q315_markov_entropy",
    "q316_embedding_mmd", "q317_seasonal_mann_kendall",
    "q318_delta_method", "q319_cuped", "q320_srm_check",
    "q321_two_proportion_z",
]
# The round-8 window (driver-green 50/50 in r08); behind the fresh window.
_ROUND8_FRONT = [
    "q45d_token_stats", "q45e_fingerprint", "q202_margin_bitext",
    "q203_matryoshka_recall", "q219_simhash_calibration",
    "q223_dup_cluster_histogram", "q237_keep_best_dedup", "q238_zipf_fit",
    "q182_repair_changelog", "q183_lww_merge", "q208_session_pressure",
    "q210_ltv_curves", "q213_seasonal_backtest", "q214_lorenz_deciles",
    "q217_dau_wau", "q226_revenue_peaks", "q228_seasonal_outliers",
    "q230_cdc_lifecycle_census", "q232_topk_movers", "q233_pareto_point",
    "q236_repurchase_cadence", "q243_sequence_patterns",
    "q246_disorder_profile", "q256_price_dispersion",
    "q259_discount_curve", "q44e_dedup_clusters", "q72_edit_distance",
    "q193_hard_negatives", "q211_reconciliation", "q231_basket_sizes",
    "q234_revenue_waterfall", "q241_fd_audit", "q251_fk_enforcement",
    "q63_tfidf_topk", "q64_chunking", "q65_hash_sample", "q66_repetition",
    "q67_bigrams", "q69_label_centroids", "q69b_centroid_outliers",
    "q65b_stratified_quota", "q75_decontam_ngrams", "q76_redact",
    "q77_corpus_freq_score", "q79_token_budget_selection",
    "q83_training_shards", "q192_group_kfold", "q201_blocklist",
    "q205_dataset_card", "q90b_listagg",
]
# The round-7 window (driver-green 50/50 in r07); behind the fresh window.
_ROUND7_FRONT = [
    # round-6 additions (winnowing pairs, dedup-weighted budget, held-out
    # xent, audio features, seasonal decompose, rank statistics), then the
    # round-4 additions q131-q188 never touched by an external row (span
    # dedup, LM scoring, drift, fuzzy join/ER, embeddings, attribution)
    "q268_winnowing_neardup", "q269_dedup_weighted_tokens",
    "q270_heldout_xent", "q271_audio_pcm8_features",
    "q272_seasonal_decompose", "q273_spearman", "q274_mann_whitney",
    "q275_kruskal_wallis", "q276_kendall_tau", "q277_friedman",
    "q278_brown_forsythe", "q131_dup_spans", "q132_unigram_logprob",
    "q133_ngram_novelty", "q134_source_divergence",
    "q137_cross_source_dups", "q138_winsorized_stats", "q138b_mad",
    "q139_centroid_separation", "q140_resample_interpolate",
    "q142_fuzzy_join", "q143_entity_resolution", "q146_zorder_layout",
    "q147_bigram_logprob", "q148_embedding_quartiles",
    "q149_embedding_covariance", "q150_asof_forward", "q151_attribution",
    "q152_streaks", "q154_copurchase_pairs", "q155_cusum",
    "q157_weighted_sample", "q158_skyline", "q160_calendar_dim",
    "q162_rle_compress", "q163_linear_attribution",
    "q164_session_landing", "q165_time_to_convert", "q167_hhi",
    "q169_tokenizer_fertility", "q170_crosslingual_dups",
    "q172_period_over_period", "q173_psi_drift", "q174_group_mode",
    "q176_autocorrelation", "q179_capped_sessions",
    "q181_bloom_membership", "q186_ks_drift", "q187_poisson_bootstrap",
    "q188_pmi_collocations",
]

# The never-driver-sampled oracled ids (explicit, registry order): the
# round-12 additions, front-loaded by the round-13 rotation so the backlog
# reaches 0 (cumulative 399/399). Kept as a named list because
# tests/test_entry.py pins the window's (a) block against it.
_NEVER_REST = [
    "q351_pq_adc_topk", "q352_pq_filtered_topk", "q353_sprt",
    "q354_randomized_response", "q355_msttr", "q356_lsh_bucket_skew",
    "q357_dp_quantile", "q358_conformal_interval",
    "q359_xmr_control_chart", "q360_neyman_allocation", "q361_nzv_screen",
    "q362_hill_tail_index", "q363_diff_in_differences",
]

# The round-6 window (driver-green 50/50 in r06); behind the fresh window.
_ROUND6_FRONT = [
    # TPC-H adaptations (the whole outstanding block)
    "tpch_q03", "tpch_q04", "tpch_q05", "tpch_q06", "tpch_q07", "tpch_q08",
    "tpch_q09", "tpch_q10", "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q15",
    "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q21", "tpch_q22",
    # time-series / sessionization family
    "q70_resample_ffill", "q71_funnel", "q73_zscore_anomalies",
    "q78_retention_cohorts", "q80_time_weighted_avg", "q81_sequence_funnel",
    "q82_session_transitions", "q85_daily_value_bands", "q86_type_affinity",
    "q87_window_distributions", "q88_share_of_day", "q101_dynamic_sessions",
    "q117_ohlc_bars",
    # stats / eval family (q156 re-proves this round's ntile rewrite)
    "q89_stat_moments", "q89b_regression", "q90_bit_bool_aggs",
    "q91_window_values", "q93_ewma", "q100_histogram", "q156_rfm",
    "q161_benford", "q166_chi_square", "q175_gini", "q184_quantile_sketch",
    "q190_kaplan_meier",
    # round-5 additions + the WITH TIES top-k (DATE-safe per VERDICT r5)
    "q261_packing_efficiency", "q262_token_entropy",
    "q263_equi_depth_histogram", "q264_ngram_coverage",
    "q265_label_silhouette", "q266_winnowing_profile", "q267_mutual_nn",
    "q178_topk_with_ties",
]

# The round-5 window (driver-green 50/50 in r05); behind the fresh window.
_ROUND5_FRONT = [
    # re-sample the r04 red rows, now driver-canonicalizable
    "q97_chunk_dedup", "q99_table_checksum", "q123_source_top_p",
    "q106_array_algebra",
    # the formerly-latent HUGEINT/array/DECIMAL renders, fixed this round
    "q74_cumulative_users", "q116_interval_union", "q136_vocab_growth",
    "q209_dow_seasonality", "q218_churn_labels", "q221_quality_rules",
    "q222_dedup_impact", "q224_knn_label_accuracy", "q227_ship_sla",
    "q229_new_vs_returning", "q235_abc_classification",
    "q249_mixture_temperature", "q252_split_leakage", "q159_inverted_index",
    "q247_golden_record", "q206_gap_profile",
    # never-sampled round-4 serving / inspection / curation families
    "q127_session_concurrency", "q128_nearest_click", "q43g_blocked_neardup",
    "q129_boilerplate", "q130_curation_pipeline", "q135_semantic_dedup",
    "q141_salted_agg", "q144_pagerank", "q145_skew_profile", "q153_triangles",
    "q168_event_pattern", "q171_time_travel", "q177_group_by_all",
    "q180_ivm_join_delta", "q185_auc", "q189_kmv_overlap",
    "q198_heavy_hitters", "q204_minhash_calibration",
    "q216_association_rules", "q239_mv_rewrite", "q240_inclusion_audit",
    "q242_candidate_keys", "q248_cdc_to_summary",
    "q250_dedup_threshold_sweep", "q253_cluster_split", "q254_grain_navigator",
    "q255_segment_migration", "q257_revenue_drawdown", "q258_backlog_aging",
    "q260_single_source_risk",
]

# The round-4 window (driver-green in r04 except the four re-sampled above);
# kept next in line behind the fresh window.
_ROUND4_FRONT = [
    # retrieval / curation operators (round-3/4 additions)
    "q120_bm25_topk", "q121_cdc_chunking", "q122_hybrid_rrf",
    "q123_source_top_p", "q124_cdc_chunk_pairs", "q125_embedding_dim_stats",
    "q126_mixture_rebalance", "q126b_weighted_rebalance",
    # derived-partsupp TPC-H adaptations
    "tpch_q02", "tpch_q11", "tpch_q16", "tpch_q20",
    # dedup / merge composites
    "q97_chunk_dedup", "q114_minhash_lsh_portable", "q115_merge_upsert",
    # reshaping / subquery / hierarchy / range-join / 3VL / UDTF
    "q57_pivot", "q57b_unpivot", "q58_scalar_subquery",
    "q59_hierarchical_rollup", "q60_range_join", "q61_not_in_3vl",
    "q62_udtf_tokens",
    # window/scalar extension families
    "q104_time_range_frame", "q105_generator_outer", "q106_array_algebra",
    "q107_safe_casts", "q108_regex_suite", "q109_bitwise_suite",
    "q110_date_suite2", "q111_running_distinct", "q112_sliding_median",
    # UDF parity / multimodal / data-quality / file formats / schema drift
    "q52_udf_parity", "q53_multimodal_blobs", "q54_dq_profile",
    "q54b_dq_integrity", "q55_csv_roundtrip", "q55b_json_roundtrip",
    "q55c_orc_roundtrip", "q55d_xml_roundtrip", "q56_schema_drift",
    # scalar/dedup/text b/c-variants
    "q42b_from_json", "q42c_variant", "q44b_simhash", "q44c_jaccard_pairs",
    "q45b_lang_stats", "q45c_text_quality", "q45f_lang_id",
    "q43c_cosine_neardup",
    # replication tooling
    "q98_table_diff", "q99_table_checksum",
]

# Tier 2: the remaining never-driver-verified oracled ids (registry order) —
# covered if the driver ever samples more than 50.
_TIER2 = [
    "q45d_token_stats", "q45e_fingerprint", "q70_resample_ffill", "q71_funnel",
    "q73_zscore_anomalies", "q74_cumulative_users", "q78_retention_cohorts",
    "q80_time_weighted_avg", "q81_sequence_funnel", "q82_session_transitions",
    "q85_daily_value_bands", "q86_type_affinity", "q87_window_distributions",
    "q88_share_of_day", "q101_dynamic_sessions", "q116_interval_union",
    "q117_ohlc_bars", "q44e_dedup_clusters", "q72_edit_distance",
    "tpch_q03", "tpch_q04", "tpch_q05", "tpch_q06", "tpch_q07", "tpch_q08",
    "tpch_q09", "tpch_q10", "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q15",
    "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q21", "tpch_q22",
    "q63_tfidf_topk", "q64_chunking", "q65_hash_sample", "q66_repetition",
    "q67_bigrams", "q69_label_centroids", "q69b_centroid_outliers",
    "q65b_stratified_quota", "q75_decontam_ngrams", "q76_redact",
    "q77_corpus_freq_score", "q79_token_budget_selection",
    "q83_training_shards", "q89_stat_moments", "q89b_regression",
    "q90_bit_bool_aggs", "q90b_listagg", "q91_window_values", "q92_posexplode",
    "q93_ewma", "q94_cms_estimates", "q100_histogram",
    # round-4 additions (after the window was frozen; next round's rotation
    # should front-load these)
    "q127_session_concurrency", "q128_nearest_click", "q43g_blocked_neardup",
    "q129_boilerplate", "q130_curation_pipeline", "q131_dup_spans",
    "q132_unigram_logprob", "q133_ngram_novelty", "q134_source_divergence",
    "q135_semantic_dedup", "q136_vocab_growth", "q137_cross_source_dups",
    "q138_winsorized_stats", "q138b_mad", "q139_centroid_separation",
    "q140_resample_interpolate", "q53d_image_phash_neardup",
    "q141_salted_agg", "q142_fuzzy_join", "q143_entity_resolution",
    "q144_pagerank", "q145_skew_profile", "q146_zorder_layout",
    "q147_bigram_logprob", "q148_embedding_quartiles",
    "q149_embedding_covariance", "q150_asof_forward", "q151_attribution",
    "q152_streaks", "q153_triangles", "q154_copurchase_pairs",
    "q155_cusum", "q156_rfm", "q157_weighted_sample", "q158_skyline",
    "q159_inverted_index", "q160_calendar_dim", "q161_benford",
    "q162_rle_compress", "q163_linear_attribution", "q164_session_landing",
    "q165_time_to_convert", "q166_chi_square", "q167_hhi",
    "q168_event_pattern", "q169_tokenizer_fertility",
    "q170_crosslingual_dups", "q171_time_travel",
    "q172_period_over_period", "q173_psi_drift", "q174_group_mode",
    "q175_gini", "q176_autocorrelation", "q177_group_by_all",
    "q178_topk_with_ties", "q179_capped_sessions", "q180_ivm_join_delta",
    "q181_bloom_membership", "q182_repair_changelog", "q183_lww_merge",
    "q184_quantile_sketch", "q185_auc", "q186_ks_drift",
    "q187_poisson_bootstrap", "q188_pmi_collocations", "q189_kmv_overlap",
    "q190_kaplan_meier", "q191_wilson_ci", "q192_group_kfold",
    "q193_hard_negatives", "q194_bpe_merges", "q195_pca_project",
    "q196_calibration_bins", "q197_isotonic_calibration",
    "q198_heavy_hitters", "q201_blocklist", "q202_margin_bitext",
    "q203_matryoshka_recall", "q199_bpe_encode", "q204_minhash_calibration",
    "q205_dataset_card", "q206_gap_profile", "q207_mmr_topk",
    "q208_session_pressure", "q209_dow_seasonality", "q210_ltv_curves",
    "q211_reconciliation", "q213_seasonal_backtest", "q214_lorenz_deciles",
    "q215_weighted_median", "q216_association_rules", "q217_dau_wau",
    "q218_churn_labels", "q219_simhash_calibration",
    "q220_compression_ratio", "q221_quality_rules",
    "q222_dedup_impact", "q223_dup_cluster_histogram",
    "q224_knn_label_accuracy", "q226_revenue_peaks", "q227_ship_sla",
    "q228_seasonal_outliers", "q229_new_vs_returning",
    "q230_cdc_lifecycle_census", "q232_topk_movers", "q233_pareto_point",
    "q231_basket_sizes", "q234_revenue_waterfall",
    "q235_abc_classification", "q236_repurchase_cadence",
    "q237_keep_best_dedup", "q238_zipf_fit", "q239_mv_rewrite",
    "q240_inclusion_audit", "q241_fd_audit", "q242_candidate_keys",
    "q243_sequence_patterns", "q244_theil_sen",
    "q245_join_cardinality_audit", "q246_disorder_profile",
    "q247_golden_record", "q248_cdc_to_summary",
    "q249_mixture_temperature", "q250_dedup_threshold_sweep",
    "q251_fk_enforcement", "q252_split_leakage",
    "q253_cluster_split", "q254_grain_navigator",
    "q255_segment_migration", "q256_price_dispersion",
    "q257_revenue_drawdown", "q258_backlog_aging",
    "q259_discount_curve", "q260_single_source_risk",
    # round-5 additions (behind this round's frozen window)
    "q261_packing_efficiency", "q262_token_entropy",
    "q263_equi_depth_histogram", "q264_ngram_coverage",
    "q265_label_silhouette", "q266_winnowing_profile", "q267_mutual_nn",
    # round-6 additions (behind this round's frozen window)
    "q268_winnowing_neardup", "q269_dedup_weighted_tokens",
    "q270_heldout_xent", "q271_audio_pcm8_features",
    "q272_seasonal_decompose",
]

# Tier 3: the r02/r03-verified corpus (normative §2.3 first), then anything
# else in registry order via _ordered()'s tail append.
_TIER3 = [
    "q13_asof_join", "q42_json", "q43_cosine_topk", "q44_exact_dedup",
    "q45_token_counts", "q46_cdc_apply", "q47_scd2", "q48_sessionize",
    "q49_tumbling", "q50_sliding", "q51_sink_roundtrip", "q21_conditional_agg",
    "q02_project_case", "q03_predicates", "q04_regex_topk", "q05_inner_join",
    "q06_star_join", "q07_left_join", "q08_full_join", "q09_semi_join",
    "q10_anti_join", "q11_cross_join", "q12_theta_join", "q14_global_agg",
    "q15_pricing_summary", "q16_having", "q17_multi_distinct",
    "q18_grouping_sets", "q19_rollup", "q20_cube", "q22_max_by", "q23_list_agg",
    "q24_percentile", "q25_ranking", "q26_running_sum", "q27_sliding_frame",
    "q28_lag_lead", "q29_distribution", "q30_range_frame", "q31_topk_per_group",
    "q32_sort_limit_offset", "q33_union", "q34_intersect", "q35_except",
    "q36_string_suite", "q37_date_suite", "q38_math_suite", "q39_array_suite",
    "q40_higher_order", "q41_map_suite", "q01_scan_count",
    "q34b_intersect_all", "q35b_except_all", "q37b_time_parts",
]

_PRIMARY = list(_ROUND14_FRONT)
for _n in (_ROUND13_FRONT + _ROUND12_FRONT + _ROUND11_FRONT + _ROUND9_FRONT
           + _ROUND8_FRONT + _ROUND7_FRONT + _ROUND6_FRONT + _TIER2
           + _ROUND5_FRONT + _ROUND4_FRONT + _TIER3):
    # behind the fresh window: most-recently-curated windows first, so a
    # driver sampling more than 50 refreshes next-stalest evidence next
    if _n not in _PRIMARY:
        _PRIMARY.append(_n)


def _ordered(d: dict) -> dict:
    ordered = {k: d[k] for k in _PRIMARY if k in d}
    ordered.update({k: v for k, v in d.items() if k not in ordered})
    return ordered


def _pin_confs(spark: SparkSession) -> None:
    """The driver owns the session; re-pin semantic confs defensively
    (notably the parquet-nanos shim, without which events is unreadable)."""
    for k, v in SEMANTIC_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    _pin_confs(spark)
    return _corpus.queries()["q15_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    base = _corpus.queries()

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _pin_confs(spark)
            return fn(spark, sf_dir)

        return run

    return _ordered({name: _wrap(fn) for name, fn in base.items()})


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for non-SQL-expressible)."""
    return _ordered(_corpus.oracle_sql())
