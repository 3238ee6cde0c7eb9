"""Pinned registry queries — scale-path and bench-surface insurance.

Two entries that close the last correctness gaps the round-1 audit
named:

- ``aps_scores_distributed``: the ≥10⁶-partition APS scale path
  (operators/ivf.py::aps_scores_table) hash-matched against a pure-SQL
  oracle. The centroid table here is the per-label centroid table (an
  SQL-expressible stand-in for k-means centroids, which are iterative
  and hence not oracle-able); the math under test — softmax of
  ``-dist/tau + 0.5·ln(size+1)``, tau = exact median, cumulative-
  probability nprobe cutoff (ipynb c1:127-145) — is exactly the
  production scoring, and equality with the driver NumPy path over real
  IVF centroids is separately pinned in tests/test_ivf.py.

- ``gen_dataset_pinned``: O16's seeded generator (operators/workload.py
  ::make_dataset) regression-pinned: partitioning-independence checked
  inside the query (same digest under different partition counts) and
  the digest itself frozen as a literal in both engines, so any
  behavior drift of the generator flips the driver gate red.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from quake_vector_search_spark.queries import register
from quake_vector_search_spark.sources import load_table

N_APS_QUERIES = 3
APS_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM embeddings WHERE vec_id < {N_APS_QUERIES}
), cent AS (
  SELECT e.label, g.i AS i, AVG(CAST(e.embedding[g.i + 1] AS DOUBLE)) AS c
  FROM embeddings e
  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) g
  GROUP BY e.label, g.i
), sz AS (
  SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label
), dist AS (
  SELECT q.query_id, cent.label,
         SQRT(SUM((CAST(q.qvec[cent.i + 1] AS DOUBLE) - cent.c)
                  * (CAST(q.qvec[cent.i + 1] AS DOUBLE) - cent.c))) AS dist
  FROM q CROSS JOIN cent
  GROUP BY q.query_id, cent.label
), tau AS (
  SELECT query_id, median(dist) + 1e-6 AS tau FROM dist GROUP BY query_id
), lg AS (
  SELECT d.query_id, d.label, sz.n,
         -d.dist / tau.tau + 0.5 * ln(sz.n + 1.0) AS logit
  FROM dist d JOIN sz ON sz.label = d.label
            JOIN tau ON tau.query_id = d.query_id
), ex AS (
  SELECT query_id, label,
         exp(logit - max(logit) OVER (PARTITION BY query_id)) AS p
  FROM lg
), pr AS (
  SELECT query_id, label AS partition_id,
         p / sum(p) OVER (PARTITION BY query_id) AS prob,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY p DESC, label ASC) AS rank
  FROM ex
), cum AS (
  SELECT *, sum(prob) OVER (PARTITION BY query_id ORDER BY rank) AS cumprob
  FROM pr
), np AS (
  SELECT query_id,
         min(CASE WHEN cumprob >= 0.9 THEN rank END) AS reached,
         count(*) AS P
  FROM cum GROUP BY query_id
)
SELECT c.query_id, c.partition_id, ROUND(c.prob, 6) AS prob,
       CAST(c.rank AS INT) AS rank,
       c.rank <= least(greatest(coalesce(np.reached, np.P), 1),
                       least(64, np.P)) AS probed
FROM cum c JOIN np ON np.query_id = c.query_id
"""


@register("aps_scores_distributed", sql=APS_SQL)
def aps_scores_distributed(spark, sf_dir):
    """Distributed APS scoring (the ≥10⁶-partition scale path) over the
    per-label centroid table: softmax partition probabilities, ranks and
    the adaptive-nprobe probe flags, computed entirely as a Spark plan —
    one shuffle of scalar rows, no driver-side score matrix."""
    from quake_vector_search_spark.operators.ivf import aps_scores_table

    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select("label", F.posexplode("embedding").alias("i", "v0")) \
        .withColumn("v", F.col("v0").cast("double"))
    cent = (dims.groupBy("label", "i").agg(F.avg("v").alias("c")))
    centroid = F.transform(
        F.array_sort(F.collect_list(F.struct("i", "c"))), lambda s: s["c"])
    cdf = (cent.groupBy("label").agg(centroid.alias("centroid"))
           .join(emb.groupBy("label").agg(F.count("*").alias("size")),
                 "label")
           .select(F.col("label").alias("partition_id"),
                   F.col("label").cast("long").alias("pos"),
                   "centroid", "size"))
    queries = (emb.where(F.col("vec_id") < N_APS_QUERIES)
               .withColumnRenamed("vec_id", "query_id"))
    out = aps_scores_table(queries, cdf, target_recall=0.9, max_probe=64)
    return out.withColumn("prob", F.round("prob", 6))


# Frozen digest of make_dataset(n=2000, d=16, n_clusters=8, seed=7):
# sum over rows of (md5-int of "vec_id:label:rounded-embedding") mod 2^40
# (2000 · 2^40 < 2^51, no int64 overflow under ANSI mode). Recompute and
# re-freeze only if the generator is *intentionally* changed.
GEN_N, GEN_D, GEN_K, GEN_SEED = 2000, 16, 8, 7


def _dataset_digest(df):
    row_str = F.concat_ws(
        ":", F.col("vec_id"), F.col("label"),
        F.concat_ws(",", F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double"), 4).cast("string"))))
    h = (F.conv(F.substring(F.md5(row_str), 1, 15), 16, 10).cast("long")
         % F.lit(2 ** 40))
    return df.select(F.sum(h).alias("digest"))


@register("gen_dataset_pinned", sql="""
SELECT CAST(2000 AS BIGINT) AS n_rows, TRUE AS labels_in_range,
       TRUE AS dims_ok, TRUE AS partitioning_stable,
       CAST(1100426458140684 AS BIGINT) AS digest
""")
def gen_dataset_pinned(spark, sf_dir):
    """O16/O17 bench-surface insurance: the seeded Gaussian-blob
    generator, hash-pinned. Emits corpus invariants (row count, label
    range, dims), a partitioning-independence check (digest equal under
    4 vs 13 partitions — the property that makes generated fixtures
    usable in differential tests), and the frozen content digest."""
    from quake_vector_search_spark.operators.workload import make_dataset

    a = make_dataset(spark, GEN_N, d=GEN_D, n_clusters=GEN_K,
                     seed=GEN_SEED, partitions=4)
    b = make_dataset(spark, GEN_N, d=GEN_D, n_clusters=GEN_K,
                     seed=GEN_SEED, partitions=13)
    da = _dataset_digest(a).head()["digest"]
    db = _dataset_digest(b).head()["digest"]
    stats = a.agg(
        F.count("*").alias("n_rows"),
        ((F.min("label") >= 0) & (F.max("label") < GEN_K))
        .alias("labels_in_range"),
        (F.min(F.size("embedding")) == GEN_D).alias("dims_ok")).head()
    return spark.createDataFrame(
        [(int(stats["n_rows"]), bool(stats["labels_in_range"]),
          bool(stats["dims_ok"]), bool(da == db), int(da))],
        "n_rows long, labels_in_range boolean, dims_ok boolean, "
        "partitioning_stable boolean, digest long")


ZIPF_NQ = 64


def _query_matrix_digest(q) -> int:
    """Frozen digest of a driver-side query matrix: md5 over the
    round-4-decimals float64 buffer (deterministic bytes), folded to
    48 bits so it stays comfortably inside BIGINT."""
    import hashlib

    import numpy as np
    return int(hashlib.md5(
        np.round(np.asarray(q, dtype=np.float64), 4).tobytes())
        .hexdigest()[:12], 16)


@register("zipf_workload_pinned", sql=f"""
SELECT CAST({ZIPF_NQ} AS BIGINT) AS n_queries,
       CAST({GEN_D} AS BIGINT) AS d,
       TRUE AS partitioning_stable,
       CAST(240696585184616 AS BIGINT) AS digest
""")
def zipf_workload_pinned(spark, sf_dir):
    """O17 (reference zipf_partition_sampler, ipynb c2:22-29) pinned:
    the DISTRIBUTED Zipf query sampler (corpus never collected) over
    the pinned generator corpus, with labels standing in as the
    partition layout. Emits the workload shape, a partitioning-
    independence boolean (same query matrix off a 4-partition and a
    13-partition corpus — the row_number-by-id positional pick is
    layout-independent by construction), and the frozen content digest
    of the query matrix, literal-matched by the oracle: any behavior
    drift of the sampler flips the driver gate red."""
    from quake_vector_search_spark.operators.workload import (
        make_dataset,
        zipf_queries_distributed,
    )

    def corpus(parts):
        return (make_dataset(spark, GEN_N, d=GEN_D, n_clusters=GEN_K,
                             seed=GEN_SEED, partitions=parts)
                .withColumnRenamed("label", "partition_id"))

    ca = corpus(4)
    sizes = {int(r["partition_id"]): int(r["n"]) for r in
             ca.groupBy("partition_id").agg(F.count("*").alias("n"))
             .collect()}
    qa = zipf_queries_distributed(ca, sizes, ZIPF_NQ)
    qb = zipf_queries_distributed(corpus(13), sizes, ZIPF_NQ)
    da, db = _query_matrix_digest(qa), _query_matrix_digest(qb)
    return spark.createDataFrame(
        [(int(qa.shape[0]), int(qa.shape[1]), bool(da == db), int(da))],
        "n_queries long, d long, partitioning_stable boolean, digest long")
