"""Unit tests for PCA / whitening (operators/pca.py)."""

import numpy as np
import pytest

from quake_vector_search_spark.operators.pca import (
    fit_pca,
    pca_project,
)


def _mkdf(spark, X, parts=1):
    rows = [(i, [float(v) for v in x]) for i, x in enumerate(X)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").repartition(parts)


def test_fit_recovers_known_principal_axes(spark):
    rng = np.random.RandomState(7)
    # anisotropic 3-d data: variances 9, 1, 0.01 along axes
    X = rng.randn(400, 3) * np.array([3.0, 1.0, 0.1])
    m = fit_pca(_mkdf(spark, X, parts=4), vec_col="embedding")
    assert m["n"] == 400 and m["dim"] == 3
    # eigvals descending, roughly the generating variances
    assert m["eigvals"][0] > m["eigvals"][1] > m["eigvals"][2]
    assert abs(m["eigvals"][0] - 9.0) < 1.5
    # top component aligns with axis 0
    assert abs(m["components"][0][0]) > 0.99
    # sign convention: dominant coefficient positive
    for row in m["components"]:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_fit_is_partitioning_invariant_within_tolerance(spark):
    rng = np.random.RandomState(11)
    X = rng.randn(300, 5)
    a = fit_pca(_mkdf(spark, X, parts=1))
    b = fit_pca(_mkdf(spark, X, parts=13))
    assert a["n"] == b["n"]
    assert np.abs(a["eigvals"] - b["eigvals"]).max() < 1e-9
    assert np.abs(a["mean"] - b["mean"]).max() < 1e-12


def test_whitened_output_has_identity_covariance(spark):
    rng = np.random.RandomState(3)
    X = rng.randn(500, 4) * np.array([5.0, 2.0, 1.0, 0.5]) + 7.0
    df = _mkdf(spark, X, parts=6)
    m = fit_pca(df)
    out = pca_project(df, m, whiten=True).collect()
    Y = np.stack([r["proj"] for r in out])
    C = np.cov(Y.T, bias=True)
    assert np.abs(C - np.eye(4)).max() < 1e-8
    assert np.abs(Y.mean(axis=0)).max() < 1e-8


def test_k_reduction_keeps_top_variance_dims(spark):
    rng = np.random.RandomState(5)
    X = rng.randn(200, 6) * np.array([4.0, 3.0, 0.1, 0.1, 0.1, 0.1])
    df = _mkdf(spark, X, parts=3)
    m = fit_pca(df)
    out = pca_project(df, m, k=2).collect()
    Y = np.stack([r["proj"] for r in out])
    assert Y.shape == (200, 2)
    # retained variance ~ top-2 eigvals
    assert abs(Y.var(axis=0, ddof=0).sum()
               - m["eigvals"][:2].sum()) < 1e-8
    # payload columns survive the projection pass
    assert {r["vec_id"] for r in out} == set(range(200))


def test_degenerate_dims_are_not_whitened(spark):
    # a constant dimension has lambda == 0; whitening must not divide
    # by ~0 and blow it up
    rng = np.random.RandomState(9)
    X = np.column_stack([rng.randn(100), np.full(100, 2.5)])
    df = _mkdf(spark, X, parts=2)
    m = fit_pca(df)
    Y = np.stack([r["proj"]
                  for r in pca_project(df, m, whiten=True).collect()])
    assert np.isfinite(Y).all()
    assert np.abs(Y[:, 1]).max() < 1e-6  # stays ~0, not amplified


def test_fit_errors(spark):
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no non-null"):
        fit_pca(empty)
    mixed = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>").repartition(2)
    with pytest.raises(ValueError, match="mixed vector widths"):
        fit_pca(mixed)


def test_isometry_violations_zero_for_true_fit_and_catches_bad(spark):
    import numpy as np

    from quake_vector_search_spark.operators.pca import (
        isometry_violations,
    )

    rng = np.random.RandomState(21)
    X = rng.randn(150, 5) * np.array([3, 2, 1, 1, 0.5])
    df = _mkdf(spark, X, parts=4)
    m = fit_pca(df)
    assert isometry_violations(df, m) == 0
    # corrupt one component: no longer a rotation -> violations
    bad = dict(m)
    bad["components"] = m["components"].copy()
    bad["components"][0] *= 1.5
    assert isometry_violations(df, bad) > 0


def test_project_drops_null_vectors_like_fit(spark):
    """ADVICE r5 (medium): fit_pca dropna's null vectors but
    pca_project used to np.stack the raw batch and crash — any input
    that fits must also project, yielding exactly the non-null rows."""
    rng = np.random.RandomState(33)
    X = rng.randn(40, 3)
    rows = [(i, [float(v) for v in x]) for i, x in enumerate(X)]
    rows += [(100 + j, None) for j in range(5)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").repartition(3)
    m = fit_pca(df)                       # dropna path
    out = pca_project(df, m).collect()    # must not raise
    assert len(out) == 40
    assert {r["vec_id"] for r in out} == set(range(40))
    # projected values match the null-free projection row-for-row
    clean = {r["vec_id"]: r["proj"]
             for r in pca_project(df.where("embedding IS NOT NULL"),
                                  m).collect()}
    for r in out:
        assert np.allclose(r["proj"], clean[r["vec_id"]])


def test_project_all_null_yields_empty(spark):
    rng = np.random.RandomState(34)
    X = rng.randn(10, 3)
    df = _mkdf(spark, X, parts=2)
    m = fit_pca(df)
    nulls = spark.createDataFrame(
        [(i, None) for i in range(4)],
        "vec_id long, embedding array<double>").repartition(2)
    assert pca_project(nulls, m).count() == 0
