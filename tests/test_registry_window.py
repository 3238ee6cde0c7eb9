"""Pin the driver's 50-entry correctness window (registry insertion
order). The external gate checks exactly the first 50 registered
queries, so the window composition is load-bearing — a module reorder
or an entry added to a window module would silently rotate core
queries out of driver verification. This test makes that a hard
failure instead."""

from quake_vector_search_spark.queries import REGISTRY, load_all_query_modules

EXPECTED_WINDOW = [
    # vector_queries (17) — O1-O15, E14
    "knn_brute_l2", "knn_cosine", "ivf_search_fullprobe",
    "ivf_search_adaptive", "kmeans_clusters", "aps_partition_scores",
    "ivf_recall_eval", "ivf_dml_roundtrip", "knn_filtered",
    "knn_with_payload", "knn_sq8_rerank", "knn_pq_rerank",
    "q_balanced_sample", "ivf_pq_search_fullprobe", "knn_dot",
    "emb_label_centroids", "emb_nearest_centroid",
    # multimodal_queries (5) — E15
    "mm_extract_features", "mm_frame_sample", "mm_resize",
    "mm_dedup_by_features", "mm_training_pairs",
    # timeseries_queries (15) — E11
    "ts_tumbling_hourly", "ts_sliding_1h_30m", "ts_sessionization",
    "ts_trailing_1h_range", "ts_asof_join", "ts_gapfill_ffill",
    "ts_interval_join", "ts_session_window_native", "ts_multi_rollup",
    "ts_funnel", "ts_cohort_retention", "ts_anomaly_hours",
    "ts_scd2_intervals", "ts_top_paths", "ts_scd2_merge",
    # text_queries (11) — E13
    "text_token_stats", "text_quality_score", "text_language_id",
    "text_fingerprint", "text_tfidf", "q_train_test_split",
    "text_chunking", "text_bigram_freq", "text_cms_wordcount",
    "text_pack_sequences", "text_kgram_fingerprints",
    # pinned_queries (2) — scale-path APS + O16 generator pin
    "aps_scores_distributed", "gen_dataset_pinned",
]


def test_driver_window_is_the_core_surface():
    load_all_query_modules()
    names = list(REGISTRY)
    assert len(EXPECTED_WINDOW) == 50
    assert names[:50] == EXPECTED_WINDOW


def test_registry_has_no_orphan_oracles():
    load_all_query_modules()
    # every registered sql is a non-empty string when present
    for name, q in REGISTRY.items():
        assert q.sql is None or (isinstance(q.sql, str) and q.sql.strip())
