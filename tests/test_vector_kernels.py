"""Unit tests for vector kernels (SURVEY.md §5.2): distance kernels vs
naive NumPy on seeded random inputs; top-k tie-break order."""

import numpy as np

from quake_vector_search_spark.functions.vector import l2_batch, topk_indices


def test_l2_batch_matches_naive():
    rng = np.random.default_rng(42)
    x = rng.normal(size=(7, 16))
    y = rng.normal(size=(13, 16))
    d2 = l2_batch(x, y)
    naive = ((x[:, None, :] - y[None, :, :]) ** 2).sum(axis=2)
    np.testing.assert_allclose(d2, naive, rtol=1e-10, atol=1e-10)


def test_l2_batch_nonnegative_on_duplicates():
    x = np.ones((3, 8), dtype=np.float32) * 1e3
    d2 = l2_batch(x, x)
    assert (d2 >= 0).all()
    np.testing.assert_allclose(np.diag(d2), 0.0, atol=1e-6)


def test_topk_ascending_and_tiebreak():
    arr = np.array([3.0, 1.0, 2.0, 1.0, 0.5])
    idx = topk_indices(arr, 3)
    # 0.5@4, then tie 1.0@1 before 1.0@3 (index asc on ties)
    assert idx.tolist() == [4, 1, 3]


def test_topk_k_larger_than_n():
    arr = np.array([2.0, 1.0])
    assert topk_indices(arr, 10).tolist() == [1, 0]
    assert topk_indices(arr, 0).tolist() == []
