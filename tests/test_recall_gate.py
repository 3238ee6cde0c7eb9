"""Recall REGRESSION gate (round 11, VERDICT r10 #5).

The suite pins bit-exact codes and plan shapes everywhere, but until
this test a codebook / calibration regression that kept determinism
while dropping recall five points would sail through — only a human
reading BENCH_r{N}.json against the previous round would notice. This
replicates bench.py's ``ivf_calibrated_n40k`` fixture (same corpus
seeds, same noisy-query construction) and asserts the calibrated
target-0.9 operating point stays inside a safety margin of the
committed artifact (bench_results_r10: recall 0.906 scanning 49.7% —
the gate allows recall >= 0.88 and scanned_frac <= 0.6, so normal
jitter passes and a real regression turns the suite red).
"""

import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.slow

K = 10


def test_calibrated_target09_operating_point(spark, tmp_path):
    from quake_vector_search_spark.operators.evaluation import avg_recall
    from quake_vector_search_spark.operators.ivf import IVFIndex
    from quake_vector_search_spark.operators.knn import knn_bruteforce
    from quake_vector_search_spark.operators.workload import make_dataset

    n, d = 40_000, 64
    emb = make_dataset(spark, n, d=d, n_clusters=60, seed=7).cache()
    emb.count()
    wd = str(tmp_path / "recall_gate_idx")
    shutil.rmtree(wd, ignore_errors=True)
    idx = IVFIndex.build(emb, wd, coarse_k=16, base_k=8)
    idx.calibrate(n_queries=128)

    rng = np.random.default_rng(3)
    rows = emb.where("vec_id < 2000").collect()
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float64)
    pick = rng.integers(0, len(vecs), 50)
    qmat = vecs[pick] + rng.normal(0.0, 0.1, size=(50, d))
    qids = np.arange(50)
    exact = knn_bruteforce(idx.read_corpus(), (qids, qmat),
                           k=K).localCheckpoint()

    found, m = idx.search((qids, qmat), k=K, target_recall=0.9,
                          policy="calibrated",
                          max_probe=len(idx.part_ids))
    found = found.localCheckpoint()
    recall = avg_recall(found, exact, K)
    scanned_frac = m["avg_scanned"] / n
    emb.unpersist()
    assert recall >= 0.88, (
        f"calibrated target-0.9 recall regressed: {recall:.4f} "
        f"(committed artifact: 0.906)")
    assert scanned_frac <= 0.6, (
        f"calibrated target-0.9 scans too much: {scanned_frac:.4f} "
        f"(committed artifact: 0.497)")
