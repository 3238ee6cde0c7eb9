"""Seeded distributed k-means (Lloyd's algorithm).

Reference parity: ``kmeans(x, k, iters, seed)`` at
QUAKE_working_demo.ipynb c1:22-36 / adaptive_ivf.mjs:70-121 — seeded
init by sampling k distinct points, fixed iteration count, empty
clusters reseeded to a (seeded-)random point.

Spark-first design: per Lloyd iteration, centroids are broadcast to the
executors; each Arrow batch computes assignments with one BLAS matmul
(`l2_batch`) and emits ONE partial (cluster, count, component-sums) row
per cluster per batch — classic map-side combine, so the data crossing
to the driver per iteration is O(partitions · k · d) floats, independent
of n. The driver merges partials in sorted order for deterministic
float addition.

Determinism: "random" choices (init points, empty-cluster reseeds) are
derived from the k smallest values of a seeded hash over the id column —
a distributed, order-independent analogue of the reference's
`rng.choice(n, k, replace=False)`, reproducible across partitionings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quake_vector_search_spark.functions.vector import l2_argmin


def _group_slices(labels: np.ndarray):
    """Stable-argsort grouping of integer labels: returns (idx, starts,
    ends, uniq) where ``idx[starts[i]:ends[i]]`` are the row indices
    with label ``uniq[i]``, in ASCENDING original-row order — exactly
    the rows (and row order) a ``rows[labels == c]`` boolean mask
    yields, so any per-group reduction over the slice is bit-identical
    to the masked form, at one O(n log n) sort instead of k O(n) scans.
    ``uniq`` ascends."""
    if labels.size == 0:
        # the per-cluster loops this replaced were no-ops on empty
        # input (ADVICE r16 #1: sl[bounds[:-1]] would IndexError)
        empty = np.empty(0, dtype=np.int64)
        return empty, empty, empty, labels[:0]
    idx = np.argsort(labels, kind="stable")
    sl = labels[idx]
    bounds = np.flatnonzero(np.r_[True, sl[1:] != sl[:-1], True])
    return idx, bounds[:-1], bounds[1:], sl[bounds[:-1]]


def _seeded_sample(df: DataFrame, vec_col: str, id_col: str, n: int,
                   seed: int) -> tuple[np.ndarray, np.ndarray]:
    """The n rows with smallest xxhash64(id, seed) — a deterministic
    seeded sample computed as a distributed top-n (TakeOrdered), no full
    sort, no collect of the corpus. Returns (ids, vectors)."""
    # Arrow-path collect (toPandas): the TakeOrderedAndProject result
    # order is preserved and float64 values transport exactly; the row
    # path pays per-row pickle + Row construction for the same bytes
    pdf = (df.select(id_col, vec_col,
                     F.xxhash64(F.col(id_col), F.lit(seed)).alias("_h"))
           .orderBy("_h", id_col)
           .limit(n)
           .select(id_col, vec_col)
           .toPandas())
    ids = pdf[id_col].to_numpy().astype(np.int64)
    vecs = np.array([np.asarray(v, dtype=np.float64)
                     for v in pdf[vec_col].to_numpy()])
    return ids, vecs


def _assign_partials(df: DataFrame, vec_col: str,
                     centroids: np.ndarray) -> list:
    """One Lloyd E+partial-M step: rows → (cluster, count, sums[d]).

    Emits per-batch partials (map-side combine); collects only
    O(batches · k) small rows to the driver.
    """
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def partials(batches):
        cents = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            # fused tiled assign — bit-equal to argmin(l2_batch(...))
            assign = l2_argmin(vecs, cents)
            clusters, inv = np.unique(assign, return_inverse=True)
            cnt = np.bincount(inv)
            sums = np.zeros((len(clusters), vecs.shape[1]))
            np.add.at(sums, inv, vecs)
            yield pd.DataFrame({
                "cluster": clusters.astype(np.int64),
                "cnt": cnt.astype(np.int64),
                "sums": list(sums),
            })

    rows = (df.select(vec_col)
            .mapInPandas(partials, "cluster long, cnt long, sums array<double>")
            .collect())
    return rows


def _merge_partials(rows, k: int, d: int) -> tuple[np.ndarray, np.ndarray]:
    """Merge partial sums deterministically: sort by (cluster, then the
    partial's content) before accumulation so float addition order is
    stable across shuffles."""
    counts = np.zeros(k, dtype=np.int64)
    sums = np.zeros((k, d), dtype=np.float64)
    for r in sorted(rows, key=lambda r: (r["cluster"], r["cnt"], tuple(r["sums"]))):
        counts[r["cluster"]] += r["cnt"]
        sums[r["cluster"]] += np.asarray(r["sums"], dtype=np.float64)
    return counts, sums


def kmeans_fit(df: DataFrame, vec_col: str = "embedding",
               id_col: str = "vec_id", k: int = 8, iters: int = 10,
               seed: int = 42,
               train_cap: int | None = 262_144) -> np.ndarray:
    """Fit k-means, returning centroids [k, d] (float64).

    Mirrors reference semantics (init from seeded sample, fixed iters,
    empty-cluster reseed — ipynb c1:22-36).

    ``train_cap`` (default 256k rows): train on a deterministic seeded
    sample pulled to the driver and iterate locally — ONE distributed
    pass instead of ``iters`` full-corpus passes. This is the 100 TB-
    sane coarse-training design (what faiss does): k centroids need
    k·O(1000) training points, not the corpus; a 256k×d float64 block
    is ≤128 MB at d=64. Assignment downstream is always full-corpus
    and distributed. ``train_cap=None`` runs classic distributed
    Lloyd's (broadcast centroids → map-side partial sums per
    iteration) when sample bias is unacceptable.
    """
    # Persist the (id, vec) projection across iterations — Lloyd's
    # re-scans its input `iters` times; without this every iteration
    # pays the source scan + decode again (Spark ML's KMeans caches the
    # same way). MEMORY_AND_DISK: spills rather than recomputes at scale.
    # don't re-project an input that is already the bare projection —
    # build() passes a (possibly persisted) one in
    proj = (df if set(df.columns) == {id_col, vec_col}
            else df.select(id_col, vec_col))
    reservoir_n = max(4 * k, 64)

    if train_cap is not None:
        # sampled path: one distributed TakeOrdered, then local Lloyd's
        _, samp = _seeded_sample(proj, vec_col, id_col,
                                 max(train_cap, reservoir_n), seed)
        if samp.shape[0] == 0:
            raise ValueError("kmeans_fit on empty DataFrame")
        # reservoir = the sample's smallest-hash prefix (identical to
        # what the distributed path uses)
        return _lloyds_local(samp, samp[:reservoir_n], k, iters)

    from pyspark import StorageLevel
    owned_cache = proj.storageLevel == StorageLevel.NONE
    if owned_cache:
        # persist across iterations — Lloyd's re-scans its input every
        # pass (Spark ML's KMeans caches the same way)
        proj = proj.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # Reservoir of seeded-sample points: first k are the init
        # centroids, the rest feed deterministic empty-cluster reseeds.
        _, reservoir = _seeded_sample(proj, vec_col, id_col,
                                      reservoir_n, seed)
        if reservoir.shape[0] == 0:
            raise ValueError("kmeans_fit on empty DataFrame")
        k_eff = min(k, reservoir.shape[0])
        cents = reservoir[:k_eff].copy()
        d = cents.shape[1]
        reseed_cursor = k_eff

        for _ in range(iters):
            rows = _assign_partials(proj, vec_col, cents)
            counts, sums = _merge_partials(rows, k_eff, d)
            for c in range(k_eff):
                if counts[c] > 0:
                    cents[c] = sums[c] / counts[c]
                else:
                    # empty cluster → deterministic reservoir point
                    cents[c] = reservoir[reseed_cursor % reservoir.shape[0]]
                    reseed_cursor += 1
        return cents
    finally:
        if owned_cache:
            proj.unpersist()


def _lloyds_local(train: np.ndarray, reservoir: np.ndarray, k: int,
                  iters: int) -> np.ndarray:
    """Seeded Lloyd's over an in-memory training block with the same
    init/empty-reseed scheme as the distributed path (init = first k
    reservoir points, empty cluster → next reservoir point)."""
    k_eff = min(k, train.shape[0])
    cents = reservoir[:k_eff].copy()
    reseed_cursor = k_eff
    for _ in range(iters):
        assign = l2_argmin(train, cents)
        # grouped means via one stable argsort — bit-identical to the
        # per-cluster boolean-mask form (same rows, same order, same
        # .mean reduction); empty clusters reseed in ascending-c order,
        # matching the original c-loop's reservoir-cursor consumption
        idx, starts, ends, uniq = _group_slices(assign)
        present = np.zeros(k_eff, dtype=bool)
        present[uniq] = True
        for s, e, c in zip(starts, ends, uniq):
            cents[c] = train[idx[s:e]].mean(axis=0)
        for c in np.flatnonzero(~present):
            cents[c] = reservoir[reseed_cursor % reservoir.shape[0]]
            reseed_cursor += 1
    return cents


def local_kmeans(vecs: np.ndarray, k: int, iters: int,
                 seed: int,
                 final_assign: bool = True
                 ) -> tuple[np.ndarray, np.ndarray | None]:
    """In-memory seeded Lloyd's over one NumPy block — used for per-cell
    base training (seed 123+cell, ipynb c1:77) and 2-means splits (seed
    17+partition, ipynb c1:185), where the block fits one executor.

    Returns (centroids [k,d], assignment [n]). Mirrors the reference's
    scheme: init = k distinct sampled points, empty clusters reseeded to
    a random point (ipynb c1:25-34).
    """
    vecs = np.asarray(vecs, dtype=np.float64)
    n = vecs.shape[0]
    rng = np.random.default_rng(seed)
    k = min(k, n)
    cents = vecs[rng.choice(n, size=k, replace=False)].copy()
    assign = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        assign = l2_argmin(vecs, cents)
        # grouped means (see _group_slices): bit-identical to the
        # boolean-mask-per-cluster form; empty-cluster rng draws happen
        # in ascending-c order exactly as the original c-loop drew them
        idx, starts, ends, uniq = _group_slices(assign)
        present = np.zeros(k, dtype=bool)
        present[uniq] = True
        for s, e, c in zip(starts, ends, uniq):
            cents[c] = vecs[idx[s:e]].mean(axis=0)
        for c in np.flatnonzero(~present):
            cents[c] = vecs[rng.integers(0, n)]
    if not final_assign:
        # books-only callers (PQ subspace fits) never read the
        # assignment: skip the post-update assign pass — centroids
        # are identical either way (the loop above already ran)
        return cents, None
    assign = l2_argmin(vecs, cents)
    return cents, assign


def train_subspace_books(X: np.ndarray, m: int, ksub: int, iters: int,
                         seed: int, parallel: bool = False
                         ) -> np.ndarray:
    """Per-chunk seeded Lloyd's: ``books[j] = local_kmeans(X[:, j·dsub:
    (j+1)·dsub], ksub, iters, seed + 1 + j)`` — the init every PQ
    trainer in quantization.py shares. The m fits are INDEPENDENT
    (disjoint columns, disjoint seeds), so with ``parallel=True`` they
    run on a thread pool: each fit executes byte-identical code on its
    own data — the threads merely overlap the BLAS/ufunc sections that
    release the GIL — so the result is bit-equal to the serial loop in
    any interleaving. Enable ONLY on the driver: inside an executor
    task the cores are already owned by sibling tasks and the extra
    threads just thrash."""
    n, d = X.shape
    if d % m != 0:
        raise ValueError(f"d={d} not divisible by m={m}")
    dsub = d // m
    ksub_eff = min(ksub, n)
    books = np.empty((m, ksub_eff, dsub), dtype=np.float64)
    if parallel and m > 1:
        from concurrent.futures import ThreadPoolExecutor

        def fit(j):
            return local_kmeans(X[:, j * dsub:(j + 1) * dsub],
                                ksub_eff, iters, seed + 1 + j,
                                final_assign=False)[0]

        import os
        # measured (round 17, 100k×64 m=8): 4 workers ≈ 6.5 s vs 8
        # workers ≈ 8.5 s — each fit's dgemm already runs 2 BLAS
        # threads and the assign kernel is DRAM-bound, so a pool wider
        # than ~cpu/8 only adds memory-bus and scheduler contention
        workers = min(m, max(2, (os.cpu_count() or 8) // 8))
        with ThreadPoolExecutor(max_workers=workers) as ex:
            for j, bj in enumerate(ex.map(fit, range(m))):
                books[j] = bj
    else:
        for j in range(m):
            books[j], _ = local_kmeans(X[:, j * dsub:(j + 1) * dsub],
                                       ksub_eff, iters, seed + 1 + j,
                                       final_assign=False)
    return books


def assign_clusters(df: DataFrame, centroids: np.ndarray,
                    vec_col: str = "embedding",
                    out_col: str = "cluster") -> DataFrame:
    """Append argmin-distance cluster ids (one matmul per Arrow batch).
    Keeps all input columns; the assignment is a narrow transform — no
    shuffle."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))
    cols = df.columns

    def assign(batches):
        cents = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            pdf = pdf.copy()
            pdf[out_col] = l2_argmin(vecs, cents).astype(np.int64)
            yield pdf

    # build a FRESH StructType — StructType.add mutates in place, and
    # df.schema is cached on the DataFrame, so `df.schema.add(...)`
    # would corrupt df.columns and break mapInPandas' input resolution
    from pyspark.sql.types import LongType, StructField, StructType
    schema = StructType(list(df.schema.fields)
                        + [StructField(out_col, LongType(), False)])
    out = df.mapInPandas(assign, schema)
    return out.select(*cols, out_col)
