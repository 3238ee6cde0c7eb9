"""Workload generator determinism (O16/O17): same seed, same output —
independent of partitioning (the counter-keyed Philox stream is derived
from the row id, not the task)."""

import numpy as np

from quake_vector_search_spark.operators import workload as WL


def _collect(df):
    rows = df.orderBy("vec_id").collect()
    return (np.array([r["vec_id"] for r in rows]),
            np.array([np.asarray(r["embedding"]) for r in rows]),
            np.array([r["label"] for r in rows]))


def test_gaussian_dataset_deterministic_across_partitionings(spark):
    a = _collect(WL.make_dataset(spark, 300, d=8, n_clusters=6, seed=7,
                                 partitions=2))
    b = _collect(WL.make_dataset(spark, 300, d=8, n_clusters=6, seed=7,
                                 partitions=7))
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    np.testing.assert_array_equal(a[2], b[2])
    assert a[1].shape == (300, 8)
    assert len(np.unique(a[2])) > 1


def test_zipf_queries_deterministic_and_skewed():
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(400, 8))
    ids = np.arange(400)
    part_of = np.repeat(np.arange(8), 50)
    q1 = WL.zipf_queries(ids, vecs, part_of, 64)
    q2 = WL.zipf_queries(ids, vecs, part_of, 64)
    np.testing.assert_array_equal(q1, q2)
    assert q1.shape == (64, 8)
    # Zipf skew: rank-0 partition drawn more than the tail on average
    ranks = WL.zipf_ranks(8, 1000)
    counts = np.bincount(ranks, minlength=8)
    assert counts[0] > counts[-1]


def test_zipf_distributed_shape_and_determinism(spark):
    import numpy as np

    from quake_vector_search_spark.operators.ivf import IVFIndex
    from quake_vector_search_spark.operators.workload import (
        zipf_queries_distributed,
    )
    from quake_vector_search_spark.sources import load_table
    import shutil
    wd = "/tmp/qvss_test_zipfdist"
    shutil.rmtree(wd, ignore_errors=True)
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    idx = IVFIndex.build(emb, wd, coarse_k=4, base_k=2)
    sizes = {int(p): int(s) for p, s in zip(idx.part_ids, idx.sizes)}
    q1 = zipf_queries_distributed(idx.read_corpus(), sizes, 32)
    q2 = zipf_queries_distributed(idx.read_corpus(), sizes, 32)
    assert q1.shape == (32, 64)
    np.testing.assert_array_equal(q1, q2)          # deterministic
    # queries sit near stored vectors (noise 0.1 over unit-ish vecs)
    assert np.isfinite(q1).all()
    shutil.rmtree(wd, ignore_errors=True)
