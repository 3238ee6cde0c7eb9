"""Recall@k evaluation (SURVEY.md O12).

Reference parity: the ``exact_ref`` overlap computation inside
``search`` (ipynb c1:164-167 / adaptive_ivf.mjs:296-302):
recall = |found ∩ exact| / min(k, |exact|), per query.

Expressed as a join + aggregation — fully distributed, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_at_k(found: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """Per-query recall@k of ``found`` against ``exact`` ground truth.

    Both inputs: (query_id, vec_id, rank) shaped results (rank ≤ k).
    Returns (query_id, recall DOUBLE).
    """
    f = found.where(F.col("rank") <= k).select("query_id", "vec_id")
    e = exact.where(F.col("rank") <= k).select("query_id", "vec_id")
    denom = e.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    inter = (f.join(e, ["query_id", "vec_id"], "inner")
             .groupBy("query_id").agg(F.count("*").alias("n_hit")))
    return (denom.join(inter, "query_id", "left")
            .select("query_id",
                    (F.coalesce(F.col("n_hit"), F.lit(0))
                     / F.least(F.lit(k), F.col("n_exact"))).alias("recall")))


def avg_recall(found: DataFrame, exact: DataFrame, k: int) -> float:
    row = (recall_at_k(found, exact, k)
           .agg(F.avg("recall").alias("r")).collect()[0])
    return float(row["r"]) if row["r"] is not None else 0.0
