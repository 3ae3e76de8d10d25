"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline at sf0.001; ``queries()`` /
``oracle_sql()`` expose every registered operator key from SURVEY.md §2
(registry populated by importing the plans package).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from automated_property_data_ingestion_document_pipeline_spark import catalog, tune
from automated_property_data_ingestion_document_pipeline_spark.functions import formatters as fmt
from automated_property_data_ingestion_document_pipeline_spark.plans import ORACLES, QUERIES

FLAGSHIP_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7 stage 0): validated engagement-fee
    rollup — orders ⋈ customer ⋈ nation ⋈ region star join with the
    reference's validation gate and formatters applied to the output.
    Dims broadcast; one shuffle on the rollup keys; money summed in
    exact decimal.
    """
    from pyspark.sql import functions as F

    tune(spark)
    t = catalog.load_all(spark, FLAGSHIP_SF_DIR)
    enriched = (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("o_totalprice") > 0)  # step-3 fee gate (App.js:389)
    )
    rollup = enriched.groupBy("r_name", "n_name").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)")).cast("double").alias("total_fees"),
        F.max("o_orderdate").alias("latest_order"),
    )
    return rollup.select(
        "r_name",
        "n_name",
        "n_orders",
        "total_fees",
        fmt.format_currency(F.col("total_fees")).alias("total_fees_fmt"),
        F.date_format("latest_order", "MMMM dd, yyyy").alias("latest_order_fmt"),
    )


# Keys the driver has already verified (union of CORRECTNESS_r01/r02/r03).
# The driver snapshots only the FIRST ~50 keys of the returned dict, so
# ``queries()``/``oracle_sql()`` front-load never-driver-checked keys:
# highest-value composites first, then the remaining unchecked
# oracle-backed keys in registration order, then rows-only unchecked
# keys, then already-verified keys.  Refresh this set each round from
# the latest CORRECTNESS_r{N}.json.
_DRIVER_SEEN = frozenset({
    "q_anti_join", "q_approx_distinct", "q_arith", "q_array_fns",
    "q_asof_join", "q_asof_join_forward", "q_broadcast_join",
    "q_cosine_pairs", "q_count_distinct", "q_currency_format",
    "q_date_format", "q_dedup_clusters", "q_digits_only", "q_doc_dedup",
    "q_except", "q_fingerprint", "q_format_string", "q_groupby_agg",
    "q_jaccard_pairs", "q_json_ingest", "q_knn", "q_knn_lsh", "q_langid",
    "q_left_join", "q_minhash_neardup", "q_ngram_jaccard", "q_null_fns",
    "q_percent_format", "q_quality_score", "q_range_join",
    "q_repetition_filter", "q_rollup", "q_safe_name", "q_scan_count",
    "q_scd2_intervals", "q_semi_join", "q_sessionize", "q_simhash",
    "q_sliding_window", "q_sort", "q_split_extract", "q_star_join",
    "q_stream_sessionize", "q_text_stats", "q_token_count", "q_topk",
    "q_trim", "q_try_cast", "q_tumbling_window", "q_union",
    "q_window_lag", "q_window_rank", "q_window_running", "q_wizard_steps",
    "q_wordcount",
    # r03 snapshot (CORRECTNESS_r03.json, 50/50 green)
    "q_asof_nearest", "q_chunk_overlap", "q_corpus_pipeline",
    "q_curation_pipeline2", "q_custom_udaf", "q_dataset_split",
    "q_decontaminate", "q_dedup_lastwin", "q_domain_mix",
    "q_engagement_pipeline", "q_except_all", "q_fuzzy_match",
    "q_heavy_hitters", "q_letter_text", "q_multimodal_meta",
    "q_name_canonicalize", "q_nullsafe_join", "q_pack_sequences",
    "q_partitioned_write", "q_pii_scrub", "q_pivot_multi",
    "q_quantize_embeddings", "q_rank_fns", "q_ref_crs_diff",
    "q_ref_dim_join", "q_required_fields", "q_salted_join",
    "q_sessionize_capped", "q_sql_tpch_q1", "q_sql_tpch_q10",
    "q_sql_tpch_q13", "q_sql_tpch_q14", "q_sql_tpch_q15",
    "q_sql_tpch_q17", "q_sql_tpch_q18", "q_sql_tpch_q19",
    "q_sql_tpch_q22", "q_sql_tpch_q3", "q_sql_tpch_q5", "q_sql_tpch_q6",
    "q_sql_tpch_q7", "q_sql_tpch_q8", "q_stratified_sample",
    "q_token_budget", "q_token_count_bpe", "q_top_supplier_onepass",
    "q_unigram_logfreq", "q_validate_steps", "q_variant_json",
    "q_window_count_distinct",
    # r04 snapshot (CORRECTNESS_r04.json, 48 oracle green + 2 rows-only)
    "q_funnel", "q_cohort_retention", "q_conversion_latency",
    "q_temporal_join", "q_sessionize_twophase", "q_pattern_match",
    "q_resample_ffill", "q_resample_bfill", "q_resample_interp",
    "q_correlated_scalar", "q_in_subquery", "q_lateral_topk",
    "q_recursive_cte", "q_cube", "q_grouping_sets", "q_percentiles",
    "q_stats_agg", "q_window_ntile", "q_first_last_window", "q_minmax_by",
    "q_conditional_agg", "q_collect_agg", "q_bool_agg", "q_bitwise_agg",
    "q_histogram", "q_anomaly_zscore", "q_salted_agg", "q_pivot",
    "q_unpivot", "q_next_greater", "q_string_fns", "q_date_fns",
    "q_regexp_extract", "q_posexplode", "q_array_set_ops", "q_intersect",
    "q_paragraph_dedup", "q_dedup_lastwin_agg", "q_centroid_assign",
    "q_hash_sample", "q_ref_state_coverage", "q_quality_band",
    "q_schema_evolution_read", "q_time_travel", "q_zorder_prune",
    "q_sessionize_skew", "q_sessionize_capped_skew", "q_window_rank_skew",
    "q_neardup_clusters", "q_png_resize",
    # r05 snapshot (CORRECTNESS_r05.json, 45 oracle green + 5 rows-only)
    "q_auc_exact", "q_audio_energy", "q_bigram_probs", "q_bloom_filter",
    "q_bm25", "q_boolean_search", "q_cdc_apply", "q_corr_matrix",
    "q_countmin_error", "q_decile_lift", "q_dup_spans",
    "q_embedding_centroids", "q_ewma", "q_frame_stats", "q_image_stats",
    "q_incremental_agg", "q_incremental_join", "q_inverted_index",
    "q_jpeg_stats", "q_kaplan_meier", "q_khop", "q_kmeans_step",
    "q_kmv_distinct", "q_ks_test", "q_lag_features", "q_markov_transitions",
    "q_merge_upsert", "q_minhash_portable", "q_phrase_search",
    "q_revenue_bridge", "q_rfm_segments", "q_scd2_lookup", "q_scd2_merge",
    "q_semantic_dedup", "q_simhash_portable", "q_skipgram_pmi",
    "q_snapshot_diff", "q_sq8_recall", "q_sql_tpch_q11", "q_sql_tpch_q12",
    "q_sql_tpch_q16", "q_sql_tpch_q2", "q_sql_tpch_q20", "q_sql_tpch_q21",
    "q_sql_tpch_q4", "q_sql_tpch_q9", "q_stream_multi", "q_table_checksum",
    "q_target_encode", "q_threshold_metrics",
    # r06 snapshot (CORRECTNESS_r06.json, 49 oracle green + 1 rows-only)
    "q_stream_ewma", "q_tfidf", "q_oov_rate", "q_bpe_pair_counts",
    "q_jpeg_progressive_stats", "q_wav_energy", "q_flac_energy",
    "q_mjpeg_stats", "q_gif_stats", "q_bmp_stats", "q_tiff_stats",
    "q_zip_ingest", "q_archive_decode", "q_pdf_extract", "q_holt_linear",
    "q_clamped_balance", "q_minmax_scale", "q_regr_ols", "q_chi_square",
    "q_mad_outliers", "q_readability", "q_rolling_median", "q_cusum",
    "q_twap", "q_ohlc_bars", "q_winsorize", "q_telemetry_pipeline",
    "q_rolling_slope", "q_seasonal_residual", "q_user_features",
    "q_attribution", "q_autocorr", "q_iqr_outliers", "q_control_chart",
    "q_ma_crossover", "q_duplicate_payments", "q_purchase_cycle",
    "q_window_funnel", "q_time_rollup", "q_user_growth",
    "q_diversity_index", "q_weighted_sample", "q_vacuum_retention",
    "q_geo_radius_join", "q_geo_nearest", "q_geo_tile_agg",
    "q_geo_pipeline", "q_bucketed_join", "q_data_quality_report",
    "q_triangle_count",
    # r07 snapshot (CORRECTNESS_r07.json, 50/50 oracle green)
    "q_degree_histogram", "q_link_prediction", "q_shortest_path",
    "q_interval_coverage", "q_event_runs", "q_calendar_fill",
    "q_debounce", "q_hour_bitmap", "q_peak_concurrency",
    "q_map_fns", "q_range_frame", "q_relational_division",
    "q_mode_per_group", "q_skyline", "q_global_rownum", "q_item_pairs",
    "q_share_of_total", "q_topn_plus_other", "q_item_similarity",
    "q_string_agg", "q_association_rules", "q_abc_classes",
    "q_csv_roundtrip", "q_jsonl_roundtrip", "q_orc_roundtrip",
    "q_denormalize_roundtrip", "q_union_by_name", "q_sorted_neighborhood",
    "q_largest_remainder", "q_benford", "q_quota_sample", "q_k_anonymity",
    "q_profile_summary", "q_gini_skew", "q_price_consistency",
    "q_basket_size_dist", "q_returns_analysis", "q_revenue_hhi",
    "q_rank_normalize", "q_ecdf", "q_fulfillment_latency", "q_ab_test",
    "q_json_rescue", "q_json_flatten", "q_odds_ratio", "q_wilson_interval",
    "q_nps", "q_activity_profile", "q_audience_overlap",
    "q_weighted_median",
})

# VERDICT r07 #1: close the driver ledger — witness the final 30
# never-driver-checked keys.  Head of the 50-slot window: the 6 unseen
# oracle keys (2 displaced in r07 + the 4 r07-growth keys), then every
# rows-only lane (recall gates, sinks, streaming, float pagerank), then
# any keys newly registered this round (they auto-queue after _PRIORITY
# via the unseen_oracle/unseen_rows buckets in _driver_order).  30 keys
# + r08 growth fits one window with slots to spare → after r08 the
# complete registry is driver-proven.
_PRIORITY = [
    # --- 6 unseen oracle keys ---
    "q_equidepth_histogram", "q_session_paths",
    "q_docx_extract", "q_letter_roundtrip",
    "q_pagerank_portable", "q_embedding_neardup_portable",
    # --- 24 rows-only lanes, never driver-run ---
    "q_lsh_recall", "q_ivf_recall", "q_pq_recall", "q_ivfpq_recall",
    "q_knn_ivf", "q_knn_pq", "q_embedding_neardup", "q_kmeans_converged",
    "q_stream_join", "q_stream_static", "q_stream_tumbling",
    "q_stream_dedup", "q_pagerank", "q_frame_sample", "q_letter_sink",
    "q_letter_sink_docx", "q_letter_sink_ref_template", "q_letter_sink_pdf",
    "q_http_enrich", "q_audio_chunks", "q_quantile_error",
    "q_hll_shard_merge", "q_html_extract", "q_html_fields_udtf",
]


def _driver_order() -> list[str]:
    keys = list(QUERIES)
    pri = [k for k in _PRIORITY if k in QUERIES]
    rest = [k for k in keys if k not in pri]
    unseen_oracle = [k for k in rest if k not in _DRIVER_SEEN and k in ORACLES]
    unseen_rows = [k for k in rest if k not in _DRIVER_SEEN and k not in ORACLES]
    seen = [k for k in rest if k in _DRIVER_SEEN]
    return pri + unseen_oracle + unseen_rows + seen


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator key (SURVEY.md §2)."""
    return {k: QUERIES[k] for k in _driver_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per key; keys absent here are rows-only by
    design (streaming state, LSH approximations, executor-side sinks)."""
    return {k: ORACLES[k] for k in _driver_order() if k in ORACLES}
