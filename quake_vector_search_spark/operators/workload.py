"""Synthetic dataset + skewed workload generators (SURVEY.md O16-O18).

Reference parity: ``make_dataset`` (ipynb c2:9-20 / runner.mjs:4-28) —
Gaussian-blob corpus — and ``zipf_partition_sampler`` (ipynb c2:22-29 /
runner.mjs:37-48) — rank-skewed query sampling near stored vectors.

The dataset generator is distributed *and* partitioning-independent:
each row's randomness comes from a Philox counter keyed by (seed,
row_id), so the same (n, d, seed) produces identical rows no matter how
Spark splits the range — the property that makes generated fixtures
usable in differential tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def make_dataset(spark: SparkSession, n: int, d: int = 64,
                 n_clusters: int = 60, seed: int = 7,
                 partitions: int | None = None) -> DataFrame:
    """Gaussian-blob corpus: centers ~ N(0, 4²) per dim, point = center
    + N(0, 1), cluster picked uniformly-by-multinomial via the row's
    own counter stream (reference semantics, ipynb c2:9-20, re-keyed
    for distribution). Returns (vec_id LONG, embedding ARRAY<FLOAT>).
    """
    # centers are tiny: derive once on the driver, broadcast via closure
    center_rng = np.random.default_rng(seed)
    centers = center_rng.normal(0.0, 4.0, size=(n_clusters, d))
    bc = spark.sparkContext.broadcast(centers)

    def gen(batches):
        cents = bc.value
        k = cents.shape[0]
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = np.empty((len(ids), d), dtype=np.float32)
            cl = np.empty(len(ids), dtype=np.int64)
            for j, i in enumerate(ids):
                rng = np.random.Generator(
                    np.random.Philox(key=seed, counter=int(i)))
                cl[j] = rng.integers(0, k)
                out[j] = cents[cl[j]] + rng.normal(0.0, 1.0, size=d)
            yield pd.DataFrame({
                "vec_id": ids,
                "embedding": list(out),
                "label": cl,
            })

    rng_df = spark.range(n, numPartitions=partitions)
    return rng_df.mapInPandas(
        gen, "vec_id long, embedding array<float>, label long")


def zipf_ranks(n_items: int, n_draws: int, alpha: float = 1.1,
               seed: int = 7) -> np.ndarray:
    """Rank draws with P(rank r) ∝ 1/r^alpha (reference
    zipf_partition_sampler, ipynb c2:22-29)."""
    rng = np.random.default_rng(seed)
    w = 1.0 / np.arange(1, n_items + 1) ** alpha
    w /= w.sum()
    return rng.choice(n_items, size=n_draws, p=w)


def zipf_queries(corpus_ids: np.ndarray, corpus_vecs: np.ndarray,
                 part_of: np.ndarray, n_queries: int,
                 alpha: float = 1.1, noise: float = 0.1,
                 seed: int = 7) -> np.ndarray:
    """Skewed query workload: pick a partition by Zipf rank, pick one of
    its stored vectors, add N(0, noise²) — queries concentrate on hot
    partitions exactly like the reference demo (ipynb c2:57-64)."""
    rng = np.random.default_rng(seed)
    parts = np.unique(part_of)
    ranks = zipf_ranks(len(parts), n_queries, alpha, seed + 1)
    out = np.empty((n_queries, corpus_vecs.shape[1]))
    for qi, r in enumerate(ranks):
        members = np.where(part_of == parts[r])[0]
        pick = members[rng.integers(0, len(members))]
        out[qi] = corpus_vecs[pick] + rng.normal(0.0, noise,
                                                 size=corpus_vecs.shape[1])
    return out


def zipf_queries_distributed(corpus_df: DataFrame,
                             part_sizes: dict[int, int], n_queries: int,
                             alpha: float = 1.1, noise: float = 0.1,
                             seed: int = 7, id_col: str = "vec_id",
                             vec_col: str = "embedding") -> np.ndarray:
    """Skewed query workload WITHOUT collecting the corpus (the scale
    path for ``zipf_queries``, whose signature needs every vector on
    the driver): Zipf-rank a partition per query (driver-side over the
    P-sized partition table), pick a uniform member *by position*, and
    fetch exactly the picked rows via a broadcast join against a
    per-partition row_number — the driver ever holds n_queries vectors,
    never the corpus. Deterministic given (seed, corpus id order).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    parts = np.array(sorted(part_sizes))
    ranks = zipf_ranks(len(parts), n_queries, alpha, seed + 1)
    rng = np.random.default_rng(seed)
    picks = []
    for qi, r in enumerate(ranks):
        pid = int(parts[r])
        picks.append((qi, pid, int(rng.integers(0, part_sizes[pid]))))
    spark = corpus_df.sparkSession
    pdf = spark.createDataFrame(
        picks, "qi long, partition_id long, rn long")
    pids_sql = ",".join(str(p) for p in sorted({p for _, p, _ in picks}))
    w = Window.partitionBy("partition_id").orderBy(id_col)
    numbered = (corpus_df
                .where(F.expr(f"partition_id IN ({pids_sql})"))
                .select(id_col, vec_col, "partition_id")
                .withColumn("rn", F.row_number().over(w) - 1))
    sel = (numbered.join(F.broadcast(pdf), ["partition_id", "rn"])
           .select("qi", vec_col).collect())
    assert len(sel) == n_queries
    d = len(sel[0][vec_col])
    base = np.empty((n_queries, d), dtype=np.float64)
    for row in sel:
        base[int(row["qi"])] = np.asarray(row[vec_col], dtype=np.float64)
    return base + rng.normal(0.0, noise, size=base.shape)
