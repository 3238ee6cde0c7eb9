"""PCA / embedding whitening — the standard embedding-pipeline
post-processing step (decorrelate + equalize variance before ANN,
clustering, or near-dup search; cf. the whitening trick common in
retrieval papers).

Scale design: the only corpus-sized work is moment accumulation — one
Arrow-batched mapInPandas pass emitting a per-batch partial
(n, Σv, Σv·vᵀ as a d×d float64 block, BLAS-accumulated), so the
driver collects O(#partitions) rows of d² doubles each, independent of
corpus size.  For d=64 a partial is 32 KiB.  The eigendecomposition is
a d×d driver-side `numpy.linalg.eigh` (microseconds); the projection
matrix broadcasts by closure and the transform is one more
mapInPandas matmul pass.  No shuffle anywhere — both passes are
map-only, so the plan is two scans at any scale.

The covariance uses the population convention C = Σ(v−μ)(v−μ)ᵀ / n, so
trace(C) equals the sum of per-dimension var_pop — the anchor the
DuckDB oracle can verify independently.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _moment_partials(emb: DataFrame, vec_col: str) -> list:
    """One map-only pass -> [(n, Σv bytes, Σvvᵀ bytes), ...] per Arrow
    batch.  float64 throughout; arrays ship as raw little-endian bytes
    to keep the partial rows Arrow-friendly."""
    def gen(batches):
        for pdf in batches:
            vals = pdf[vec_col].dropna()
            if not len(vals):
                continue
            widths = {len(v) for v in vals}
            if len(widths) != 1:
                raise ValueError(
                    f"fit_pca: mixed vector widths {sorted(widths)}")
            X = np.stack(vals.to_numpy()).astype(np.float64)
            yield pd.DataFrame({
                "n": [np.int64(X.shape[0])],
                "d": [np.int64(X.shape[1])],
                "s": [X.sum(axis=0).tobytes()],
                "ss": [(X.T @ X).tobytes()],
            })

    return emb.select(vec_col).mapInPandas(
        gen, "n long, d long, s binary, ss binary").collect()


def fit_pca(emb: DataFrame, vec_col: str = "embedding") -> dict:
    """Fit full-rank PCA.  Returns {n, dim, mean (d,), eigvals (d,)
    descending, components (d, d) rows = principal directions with a
    deterministic sign convention (largest-|coefficient| entry
    positive)}."""
    parts = _moment_partials(emb, vec_col)
    if not parts:
        raise ValueError("fit_pca: input has no non-null vectors")
    dims = {int(p["d"]) for p in parts}
    if len(dims) != 1:
        raise ValueError(f"fit_pca: mixed vector widths {sorted(dims)}")
    d = dims.pop()
    n = sum(int(p["n"]) for p in parts)
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for p in parts:
        s += np.frombuffer(p["s"], dtype=np.float64)
        ss += np.frombuffer(p["ss"], dtype=np.float64).reshape(d, d)
    mu = s / n
    cov = ss / n - np.outer(mu, mu)
    cov = (cov + cov.T) / 2.0
    w, v = np.linalg.eigh(cov)          # ascending
    order = np.argsort(w)[::-1]
    eigvals = np.maximum(w[order], 0.0)
    comps = v[:, order].T               # rows = components
    # deterministic sign: the largest-|x| coefficient of each
    # component is positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {"n": n, "dim": d, "mean": mu,
            "eigvals": eigvals, "components": comps}


def pca_project(emb: DataFrame, model: dict, k: int | None = None,
                whiten: bool = False, vec_col: str = "embedding",
                out_col: str = "proj",
                eps: float = 1e-12) -> DataFrame:
    """Project (v − μ) onto the top-k components; with ``whiten`` each
    retained coordinate is scaled by 1/√λ so the output covariance is
    the identity.  Dimensions with λ ≤ eps are never whitened (their
    scale is numerical noise) — they keep unit scale.

    Null vectors mirror ``fit_pca``'s handling: ``fit_pca`` dropna's
    them when accumulating moments, so ``pca_project`` drops those rows
    too — any input that fits also projects (same non-null row set),
    rather than ``np.stack`` raising on a batch containing None."""
    k = model["dim"] if k is None else int(k)
    comps = model["components"][:k]
    eig = model["eigvals"][:k]
    scale = (np.where(eig > eps, 1.0 / np.sqrt(np.maximum(eig, eps)),
                      1.0) if whiten else np.ones(k))
    B = (comps * scale[:, None]).T      # (d, k), closure-broadcast
    mu = model["mean"]

    def gen(batches):
        for pdf in batches:
            keep = pdf[vec_col].notna()
            pdf = pdf[keep]
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Y = (X - mu) @ B
            out = pdf.drop(columns=[vec_col])
            out[out_col] = list(Y)
            yield out

    in_cols = [c for c in emb.columns if c != vec_col]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in emb.schema.fields if f.name != vec_col
    ) + f", {out_col} array<double>"
    return emb.select(*in_cols, vec_col).mapInPandas(gen, schema)


def isometry_violations(emb: DataFrame, model: dict,
                        vec_col: str = "embedding",
                        rtol: float = 1e-8) -> int:
    """Count rows where the full-rank unwhitened projection fails
    ‖(v−μ)·Cᵀ‖² == ‖v−μ‖² (relative tol) — the rotation property.
    Projection and comparison are FUSED in one map-only pass (one
    tiny count row per Arrow batch), so the check adds no shuffle at
    any corpus size — unlike a project-then-self-join formulation."""
    comps = model["components"]
    mu = model["mean"]

    def gen(batches):
        for pdf in batches:
            vals = pdf[vec_col].dropna()
            if not len(vals):
                continue
            X = np.stack(vals.to_numpy()).astype(np.float64) - mu
            n2 = (X * X).sum(axis=1)
            p2 = ((X @ comps.T) ** 2).sum(axis=1)
            bad = np.abs(p2 - n2) > np.maximum(n2, 1.0) * rtol
            yield pd.DataFrame({"viol": [np.int64(bad.sum())]})

    parts = emb.select(vec_col).mapInPandas(gen, "viol long").collect()
    return sum(int(p["viol"]) for p in parts)
