"""Vector-search queries (SURVEY.md O1-O3, O15, E14).

Oracle strategy: DuckDB's `list_distance` / `list_cosine_similarity`
over DOUBLE[] casts match our float64 kernels; distances rounded to 6
digits on both sides before hashing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from quake_vector_search_spark.operators.knn import cosine_topk, knn_bruteforce
from quake_vector_search_spark.queries import register
from quake_vector_search_spark.sources import load_table

N_QUERIES = 5   # query vectors: the first N rows of the embeddings table
K = 10

_IVF_CACHE: dict[str, object] = {}


def _ivf_index(spark, sf_dir):
    """Build (once per process per sf_dir) an IVF index over the
    embeddings table in a scratch dir."""
    import os
    import shutil

    from quake_vector_search_spark.operators.ivf import IVFIndex
    if sf_dir not in _IVF_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        workdir = os.path.join(
            "/tmp/qvss_ivf", sf_dir.strip("/").replace("/", "_"))
        shutil.rmtree(workdir, ignore_errors=True)
        _IVF_CACHE[sf_dir] = IVFIndex.build(emb, workdir,
                                            coarse_k=16, base_k=4)
    return _IVF_CACHE[sf_dir]


@register("knn_brute_l2", sql=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM embeddings WHERE vec_id < {N_QUERIES}
), d AS (
  SELECT q.query_id, e.vec_id,
         list_distance(CAST(e.embedding AS DOUBLE[]),
                       CAST(q.qvec AS DOUBLE[])) AS dist
  FROM embeddings e CROSS JOIN q
), r AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist ASC, vec_id ASC) AS rank
  FROM d
)
SELECT query_id, vec_id, ROUND(dist, 6) AS dist, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {K}
""")
def knn_brute_l2(spark, sf_dir):
    """Exact L2 top-{K} for the first {N} embedding vectors vs the whole
    corpus (reference exact_topk, ipynb c1:212-215)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES) \
                 .withColumnRenamed("vec_id", "query_id")
    out = knn_bruteforce(emb, queries, k=K)
    return out.withColumn("dist", F.round("dist", 6))


@register("knn_cosine", sql=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM embeddings WHERE vec_id < {N_QUERIES}
), d AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                CAST(q.qvec AS DOUBLE[])) AS sim
  FROM embeddings e CROSS JOIN q
), r AS (
  SELECT query_id, vec_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id ASC) AS rank
  FROM d
)
SELECT query_id, vec_id, ROUND(sim, 6) AS sim, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {K}
""")
def knn_cosine(spark, sf_dir):
    """Exact cosine top-{K} (similarity DESC) — the embedding-similarity
    primitive for near-dup detection (E12) and ANN baselines (E14)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES) \
                 .withColumnRenamed("vec_id", "query_id")
    out = cosine_topk(emb, queries, k=K)
    return out.withColumn("sim", F.round("sim", 6))


# Reuse the brute-force SQL: at target_recall=1.0 the APS cumulative-
# probability cutoff only triggers at the full partition set (softmax
# sums to 1), so the IVF path probes everything and must return exactly
# the brute-force answer — an oracle-checked end-to-end exercise of
# build → APS → partition-pruned scan → local/global top-k.
@register("ivf_search_fullprobe", sql=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM embeddings WHERE vec_id < {N_QUERIES}
), d AS (
  SELECT q.query_id, e.vec_id,
         list_distance(CAST(e.embedding AS DOUBLE[]),
                       CAST(q.qvec AS DOUBLE[])) AS dist
  FROM embeddings e CROSS JOIN q
), r AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist ASC, vec_id ASC) AS rank
  FROM d
)
SELECT query_id, vec_id, ROUND(dist, 6) AS dist, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {K}
""")
def ivf_search_fullprobe(spark, sf_dir):
    """IVF search (O5-O11) at target_recall=1.0 → full probe set →
    results must equal brute force (reference search, ipynb c1:147-168)."""
    idx = _ivf_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES) \
                 .withColumnRenamed("vec_id", "query_id")
    out, _meta = idx.search(queries, k=K, target_recall=1.0,
                            max_probe=1_000_000_000)
    return out.withColumn("dist", F.round("dist", 6))


@register("ivf_search_adaptive")  # approximate → rows-only driver check
def ivf_search_adaptive(spark, sf_dir):
    """IVF search with adaptive nprobe at target_recall=0.9 (the
    reference's demo config, ipynb c2:38). Approximate by design —
    recall floor is asserted in tests/test_ivf.py, not hash-matched."""
    idx = _ivf_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES) \
                 .withColumnRenamed("vec_id", "query_id")
    out, _meta = idx.search(queries, k=K, target_recall=0.9)
    return out.withColumn("dist", F.round("dist", 6))
