"""Multi-vector (late-interaction / ColBERT-style) retrieval.

The reference is single-vector only (SURVEY.md §2.2 lists multi-vector
as an explicit gap). Late interaction represents a document as a BAG
of vectors and scores a multi-vector query against it with MaxSim:

    score(Q, D) = sum over qv in Q of  max over dv in D  cos(qv, dv)

Spark-first plan: the query side of a late-interaction pass is small
by contract (it reranks candidates for a handful of queries), so the
query vectors broadcast and the corpus NEVER moves for the pairing:
one narrow broadcast cross join (each corpus-vector partition scores
against all query vectors in place), then two map-side-combined
aggregations — max over the document's vectors per (query, query-vec,
doc), sum over the query's vectors per (query, doc) — and one
partitioned window for per-query top-k. The only shuffles are the two
aggregations keyed on (query_doc, doc) groups: cardinality
n_docs x n_query_docs, not corpus-sized.

Float determinism (the round-5 sparse lesson): each per-query-vector
max is rounded to 6 places BEFORE the sum — max of rounded values is
order-free, and a sum of a few 1e-6-quantized doubles stays far from
the next .xxxxxx5 rounding boundary — so the final rounded score and
the (score DESC, doc ASC) ranking are bit-stable across engines and
aggregation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from quake_vector_search_spark.functions.vector import (
    cosine_similarity_col,
)


def maxsim_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                doc_col: str = "doc_id", vec_col: str = "embedding",
                query_doc_col: str = "query_doc",
                query_vec_id_col: str = "qv_id",
                query_vec_col: str = "qvec") -> DataFrame:
    """MaxSim top-k: ``corpus`` = (doc, vector) bag rows, ``queries`` =
    (query_doc, query-vector-id, vector) bag rows (small — broadcast).
    Returns (query_doc, doc_id, score, rank), rank 1..k per query."""
    pair = corpus.crossJoin(F.broadcast(queries))
    sim = F.round(cosine_similarity_col(vec_col, query_vec_col), 6)
    per_qv = (pair
              .groupBy(query_doc_col, query_vec_id_col, doc_col)
              .agg(F.max(sim).alias("mx")))
    scored = (per_qv.groupBy(query_doc_col, doc_col)
              .agg(F.round(F.sum("mx"), 6).alias("score")))
    w = (Window.partitionBy(query_doc_col)
         .orderBy(F.col("score").desc(), F.col(doc_col).asc()))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
