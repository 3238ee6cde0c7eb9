"""Round-2+ query additions.

Loaded AFTER the driver's 50-entry correctness window (see
queries/__init__.py::load_all_query_modules) so new entries never push
core-surface queries out of the externally-verified prefix; everything
here is still covered by the local oracle gate (tools/check_oracle.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: E402

from quake_vector_search_spark.queries import register  # noqa: E402
from quake_vector_search_spark.sources import load_table  # noqa: E402


@register("dedup_embedding_lsh", sql="""
WITH hyper AS (
  SELECT bs.b, isx.i,
         (CAST(concat('0x', substr(md5('lsh1:' || bs.b || ':' || isx.i),
                      1, 15)) AS BIGINT) % 2001 - 1000) / 1000.0 AS h
  FROM unnest(range(16)) AS bs(b) CROSS JOIN unnest(range(64)) AS isx(i)
), dots AS (
  SELECT e.vec_id, hy.b,
         SUM(CAST(e.embedding[hy.i + 1] AS DOUBLE) * hy.h) AS dot
  FROM embeddings e CROSS JOIN hyper hy
  GROUP BY e.vec_id, hy.b
), bits AS (
  SELECT vec_id, b, CASE WHEN dot >= 0 THEN 1 ELSE 0 END AS bit FROM dots
), keys AS (
  SELECT vec_id, CAST(b // 4 AS BIGINT) AS band,
         CAST(SUM(bit * (1 << (b % 4))) AS BIGINT) AS key
  FROM bits GROUP BY vec_id, b // 4
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
  FROM keys a JOIN keys b2
    ON a.band = b2.band AND a.key = b2.key AND a.vec_id < b2.vec_id
)
SELECT c.id_a, c.id_b,
       ROUND(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                    CAST(eb.embedding AS DOUBLE[])), 6)
           AS cosine
FROM cand c
JOIN embeddings ea ON ea.vec_id = c.id_a
JOIN embeddings eb ON eb.vec_id = c.id_b
WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                             CAST(eb.embedding AS DOUBLE[])) >= 0.45
""")
def dedup_embedding_lsh(spark, sf_dir):
    """Embedding near-dup via sign-LSH bucketing — the PRODUCTION scale
    path that replaces the demoted n² cosine scan as the default
    (round-1 audit item #3): hyperplane sign signatures → band-key
    equality join (candidates ∝ collision density) → exact cosine
    verify ≥ 0.45. Hyperplanes are md5-derived so the DuckDB oracle
    regenerates them bit-for-bit; the oracle mirrors the LSH semantics
    (banding and all), not the all-pairs scan."""
    from quake_vector_search_spark.operators.dedup import cosine_pairs_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    out = cosine_pairs_lsh(emb, threshold=0.45, n_bits=16, n_bands=4)
    return out.withColumn("cosine", F.round("cosine", 6))
