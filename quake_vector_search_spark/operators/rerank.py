"""Maximal Marginal Relevance (MMR) diversified reranking — Carbonell
& Goldstein, SIGIR'98: greedily select k results trading relevance
against redundancy with the already-selected set,

    score(d) = lam * rel(d) - (1 - lam) * max_{s in S} sim(d, s)

(empty-S second term = 0; ties break on the lower doc id).  The
standard post-retrieval step for result diversity / near-dup-free
top-k in a RAG pipeline.

Determinism note: when rel and sim are the engine's exact-integer
hash-embed cosines (rounded doubles, bit-identical cross-engine — see
text.py::hash_embed_cosine_topk), the MMR arithmetic consumes
identical doubles on every engine, so the greedy argmax — equality
ties included — is reproducible and the whole rerank hash-matches an
unrolled-CTE oracle.

Scale shape: candidates are a per-query top-N (N small, e.g. 8-50);
the pairwise-sim relation is query-bounded (N² per query, never
corpus²); the greedy loop runs per query group inside
``cogroup().applyInPandas`` — each group is a few dozen rows, the
operator distributes over queries.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def candidate_sims(docs: DataFrame, cands: DataFrame,
                   id_col: str = "doc_id",
                   text_col: str = "text",
                   query_col: str = "query_id",
                   dim: int | None = None) -> DataFrame:
    """Pairwise hash-embed cosines among each query's candidates:
    (query_id, doc_a, doc_b, sim) with doc_a < doc_b — rows exist only
    for pairs sharing ≥1 bucket (absent pair ≡ sim 0, mirrored by the
    oracle's COALESCE).  Cost: |cands|² pairs per query joined to the
    sparse term relation — query-bounded, never corpus²."""
    from quake_vector_search_spark.operators.text import (
        FEATURE_HASH_DIM, hash_embed)
    dim = dim or FEATURE_HASH_DIM

    # every self-joined frame gets fully distinct column names with
    # explicit join conditions — bare USING joins between same-lineage
    # frames trip Spark's ambiguous-self-join analyzer check
    a = cands.select(query_col, F.col(id_col).alias("doc_a"))
    b = cands.select(F.col(query_col).alias("_q2"),
                     F.col(id_col).alias("doc_b"))
    pairs = (a.join(b, F.col(query_col) == F.col("_q2"))
             .drop("_q2")
             .where(F.col("doc_a") < F.col("doc_b")))
    sp = hash_embed(docs, id_col=id_col, text_col=text_col, dim=dim)
    n2 = sp.groupBy(id_col).agg(
        F.sum(F.col("v") * F.col("v")).alias("_n2"))
    sa = sp.select(F.col(id_col).alias("_ida"),
                   F.col("bucket").alias("_bka"),
                   F.col("v").alias("_va"))
    sb = sp.select(F.col(id_col).alias("_idb"),
                   F.col("bucket").alias("_bkb"),
                   F.col("v").alias("_vb"))
    dots = (pairs
            .join(sa, F.col("doc_a") == F.col("_ida"))
            .join(sb, (F.col("doc_b") == F.col("_idb"))
                  & (F.col("_bka") == F.col("_bkb")))
            .groupBy(query_col, "doc_a", "doc_b")
            .agg(F.sum(F.col("_va") * F.col("_vb")).alias("_dot")))
    na = n2.select(F.col(id_col).alias("_na_id"),
                   F.col("_n2").alias("_na"))
    nb = n2.select(F.col(id_col).alias("_nb_id"),
                   F.col("_n2").alias("_nb"))
    return (dots
            .join(na, F.col("doc_a") == F.col("_na_id"))
            .join(nb, F.col("doc_b") == F.col("_nb_id"))
            .select(query_col, "doc_a", "doc_b",
                    F.round(F.col("_dot")
                            / F.sqrt(F.col("_na") * F.col("_nb")), 6)
                    .alias("sim")))


def mmr_rerank(cands: DataFrame, sims: DataFrame, k: int = 5,
               lam: float = 0.7, query_col: str = "query_id",
               id_col: str = "doc_id",
               rel_col: str = "cosine") -> DataFrame:
    """Greedy MMR over per-query candidate sets.  ``cands`` =
    (query_id, doc_id, rel); ``sims`` = candidate_sims output (a < b,
    missing pair ≡ 0).  If ``sims`` was DERIVED from ``cands`` (the
    usual flow), localCheckpoint one of them first — cogroup rejects
    two groupings over shared-lineage attributes.  Returns (query_id,
    doc_id, mmr_rank, mmr_score).  Distributed per query via cogrouped applyInPandas —
    the greedy loop only ever sees one query's N candidates."""
    q_c, i_c, r_c = query_col, id_col, rel_col

    def fn(cdf: pd.DataFrame, sdf: pd.DataFrame) -> pd.DataFrame:
        if not len(cdf):
            return pd.DataFrame(
                {q_c: [], i_c: [], "mmr_rank": [], "mmr_score": []})
        rel = dict(zip(cdf[i_c].astype("int64"), cdf[r_c]))
        sim: dict = {}
        for a, b, s in zip(sdf["doc_a"].astype("int64"),
                           sdf["doc_b"].astype("int64"), sdf["sim"]):
            sim[(a, b)] = s
            sim[(b, a)] = s
        qid = int(cdf[q_c].iloc[0])
        remaining = sorted(rel)
        sel, ranks, scores = [], [], []
        while remaining and len(sel) < k:
            best, best_key = None, None
            for d in remaining:
                ms = max((sim.get((d, s), 0.0) for s in sel),
                         default=0.0)
                score = lam * rel[d] - (1.0 - lam) * ms
                key = (score, -d)
                if best_key is None or key > best_key:
                    best, best_key = d, key
            sel.append(best)
            ranks.append(len(sel))
            scores.append(best_key[0])
            remaining.remove(best)
        return pd.DataFrame({
            q_c: [qid] * len(sel),
            i_c: pd.Series(sel, dtype="int64"),
            "mmr_rank": pd.Series(ranks, dtype="int32"),
            "mmr_score": scores,
        })

    schema = (f"{q_c} long, {i_c} long, mmr_rank int, "
              f"mmr_score double")
    return (cands.groupBy(q_c)
            .cogroup(sims.groupBy(q_c))
            .applyInPandas(fn, schema))
