"""Pin the driver's 50-entry correctness window. The external gate
checks exactly the first 50 entries of ``__spark_entry__.queries()`` in
dict order, so the window composition is load-bearing — a module
reorder, an entry added to a window module, or a change to WINDOW_R6
would silently rotate queries out of driver verification. This test
makes that a hard failure instead.

Round 6 rotated the window (VERDICT r5 #1): TPC-H battery, dedup
family, streaming mirrors and sketch rows (WINDOW_R6). Round 7 rotated
a THIRD 50 in front (WINDOW_R7: quantization ladder, calibrated APS,
retrieval/graph/BPE/PCA rows, format roundtrips, the E4/E7-E9
relational surface). Round 8 rotates a FOURTH window (WINDOW_R8): the
50 of the 53 rows the driver had never checked through r7 — CDC
indexes, serving mirrors, LOPQ/SQ8 rungs, routed calibration, WAV/BMP
decoders, recall-eval guards, and the text/relational remainder.
Disjointness for WINDOW_R8 is asserted against the UNION of actual
CORRECTNESS_r01..r07 report keys (VERDICT r7 "What's wrong" #3: the
pinned manifests alone undercount — 8 of WINDOW_R7's rows were already
driver-verified in round 1). The rounds-1-5 window stays pinned as the
raw-REGISTRY prefix so all compositions remain verified.
"""

import glob
import json
import os

from quake_vector_search_spark.queries import (
    REGISTRY,
    WINDOW_R6,
    WINDOW_R7,
    WINDOW_R8,
    load_all_query_modules,
    ordered_registry,
)

# Driver-verified across rounds 1-5 (CORRECTNESS_r01..r05: 50/50 green).
WINDOW_R2R5 = [
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


def _driver_verified_union():
    """Union of query names across every committed driver correctness
    report — the TRUE already-verified set (manifests undercount)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r0[1-7].json")):
        with open(path) as f:
            names |= set(json.load(f))
    return names


def test_r8_window_is_the_rotated_surface():
    """First 50 of the driver-facing ordering = WINDOW_R8, disjoint
    from the UNION of all rounds-1-7 driver-verified report keys
    (pure rotation, no accidental overlap)."""
    names = list(ordered_registry())
    assert len(WINDOW_R8) == 50
    assert names[:50] == list(WINDOW_R8)
    verified = _driver_verified_union()
    assert verified, "correctness reports missing from repo root"
    overlap = set(WINDOW_R8) & verified
    assert not overlap, f"WINDOW_R8 re-verifies: {sorted(overlap)}"


def test_r7_window_still_pinned_at_51_100():
    """The round-7 driver-verified window keeps its exact composition
    at positions 51-100 of the driver-facing ordering."""
    names = list(ordered_registry())
    assert len(WINDOW_R7) == 50
    assert names[50:100] == list(WINDOW_R7)
    assert not set(WINDOW_R7) & set(WINDOW_R6)
    assert not set(WINDOW_R7) & set(WINDOW_R2R5)


def test_r6_window_still_pinned_at_101_150():
    """The round-6 driver-verified window keeps its exact composition
    at positions 101-150 of the driver-facing ordering."""
    names = list(ordered_registry())
    assert len(WINDOW_R6) == 50
    assert names[100:150] == list(WINDOW_R6)
    assert not set(WINDOW_R6) & set(WINDOW_R2R5)


def test_r2r5_window_still_pinned_in_raw_registry():
    """Module load order unchanged: the previously driver-verified
    window remains the raw-REGISTRY prefix."""
    load_all_query_modules()
    names = list(REGISTRY)
    assert len(WINDOW_R2R5) == 50
    assert names[:50] == WINDOW_R2R5


def test_ordered_registry_is_a_permutation():
    load_all_query_modules()
    assert set(ordered_registry()) == set(REGISTRY)
    assert len(ordered_registry()) == len(REGISTRY)


def test_registry_has_no_orphan_oracles():
    load_all_query_modules()
    # every registered sql is a non-empty string when present
    for name, q in REGISTRY.items():
        assert q.sql is None or (isinstance(q.sql, str) and q.sql.strip())
