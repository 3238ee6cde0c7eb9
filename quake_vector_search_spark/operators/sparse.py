"""Sparse-vector retrieval — the inverted-index complement to the
dense ANN surface (SURVEY §2.2 lists sparse vectors as a reference
gap; dense+sparse is the standard hybrid-retrieval pair in LLM data
and RAG pipelines).

A sparse vector is (id, term, weight) rows — the relational layout IS
the index. Retrieval is then pure Catalyst: queries join the posting
lists on term (the shuffle moves only matching postings), partial
map-side combines sum the per-(query, doc) dot products, and a window
takes top-k per query. No UDF anywhere; at 100 TB the posting-list
join is the same plan Lucene-style engines hand-build, expressed
declaratively — AQE handles hot terms like any skewed key (and a
df cap, as in the jaccard family, bounds Σdf² if needed).

Weights are deterministic functions of integer corpus statistics
(tf, df, N, doc lengths), so every score is reproducible cross-engine
and the DuckDB oracles hash-match after rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from quake_vector_search_spark.sources.catalog import spread


def _terms(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term) occurrence rows — whitespace tokens, empties
    dropped. Narrow explode; everything downstream aggregates it."""
    return (spread(docs.select(id_col, text_col))
            .select(F.col(id_col),
                    F.explode(F.split(F.col(text_col), " "))
                     .alias("term"))
            .where(F.col("term") != ""))


def tfidf_vectors(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  n_docs: int | None = None) -> DataFrame:
    """Sparse TF-IDF document vectors: weight = tf · (ln((N+1)/(df+1))
    + 1) — the smooth-idf variant, never negative, deterministic from
    integer (tf, df, N). Two aggregates (term stats, doc tf) + one
    broadcast-scale join on term.

    N (corpus size) is a LAZY 1-row aggregate broadcast into the plan
    (round 6 — it was an eager ``distinct().count()``, which launched
    a standalone scan-job per index build just to fetch one scalar: a
    full extra corpus pass at 100 TB). Pass ``n_docs`` to reuse a
    precomputed corpus-stats value and skip even the narrow id scan.

    Returns (id, term, weight) — the sparse index relation.
    """
    t = _terms(docs, id_col, text_col)
    tf = t.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    if n_docs is not None:
        nrow = docs.sparkSession.createDataFrame(
            [(int(n_docs),)], "_n long")
    else:
        nrow = docs.agg(F.countDistinct(id_col).alias("_n"))
    idf = F.log((F.col("_n") + F.lit(1)).cast("double")
                / (F.col("df") + F.lit(1)).cast("double")) + F.lit(1.0)
    return (tf.join(df_, "term").join(F.broadcast(nrow))
            .select(F.col(id_col), "term",
                    (F.col("tf").cast("double") * idf).alias("weight")))


def sparse_dot_topk(index: DataFrame, queries: DataFrame, k: int = 10,
                    id_col: str = "doc_id",
                    query_id_col: str = "query_id") -> DataFrame:
    """Sparse dot-product retrieval: queries are (query_id, term
    [, weight]) rows (weight defaults to 1 — a bag-of-words query);
    score(q, d) = Σ_matching-terms w_q · w_d. One equi-join on term →
    one (query, doc) aggregate → per-query window top-k.

    Ranking uses the score ROUNDED to 6 decimals (then id ASC): two
    documents with identical term multisets (exact dups exist in any
    real corpus) accumulate the same addends in different orders, so
    their raw float scores can differ by an ulp and flip rank
    nondeterministically — rounding before ranking makes the ranking
    a pure function of the data on every engine and every run.

    Returns (query_id, id, score, rank), rank 1..k, score rounded.
    """
    q = queries
    if "weight" not in q.columns:
        q = q.withColumn("weight", F.lit(1.0))
    q = q.select(F.col(query_id_col), "term",
                 F.col("weight").alias("_wq"))
    joined = (index.join(q, "term")
              .groupBy(query_id_col, id_col)
              .agg(F.round(F.sum(F.col("weight") * F.col("_wq")), 6)
                    .alias("score")))
    w = (Window.partitionBy(query_id_col)
         .orderBy(F.col("score").desc(), F.col(id_col).asc()))
    return (joined.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id_col, id_col, "score", "rank"))


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id",
              text_col: str = "text",
              query_id_col: str = "query_id",
              n_docs: int | None = None) -> DataFrame:
    """BM25 retrieval over the corpus — the standard lexical ranking
    (the retrieval half of quality-filtering and RAG evaluation):

        score(q,d) = Σ_{t∈q} idf(t) · tf·(k1+1) /
                     (tf + k1·(1 − b + b·len_d/avg_len))
        idf(t) = ln( (N − df + 0.5)/(df + 0.5) + 1 )   (Robertson)

    Every statistic (tf, df, N, len_d, avg_len) comes from the same
    two aggregates as TF-IDF; avg_len AND N are 1-row broadcasts
    (round 6: N was an eager ``distinct().count()`` — a standalone
    scan-job per retrieval build; now it's a lazy aggregate folded
    into the same Spark action, or ``n_docs=`` from precomputed
    corpus stats). Queries are (query_id, term) bags. Same
    join/agg/window plan as sparse_dot_topk.

    Returns (query_id, id, score, rank).
    """
    t = _terms(docs, id_col, text_col)
    tf = t.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    dlen = t.groupBy(id_col).agg(F.count("*").alias("_len"))
    if n_docs is not None:
        nrow = docs.sparkSession.createDataFrame(
            [(int(n_docs),)], "_n long")
    else:
        nrow = docs.agg(F.countDistinct(id_col).alias("_n"))
    avg_len = dlen.agg(F.avg("_len").alias("_avg"))
    idf = F.log((F.col("_n").cast("double") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
    postings = (tf.join(df_, "term").join(dlen, id_col)
                .join(F.broadcast(avg_len)).join(F.broadcast(nrow)))
    denom = (F.col("tf")
             + F.lit(k1) * (F.lit(1.0 - b)
                            + F.lit(b) * F.col("_len") / F.col("_avg")))
    scored = postings.select(
        F.col(id_col), "term",
        (idf * F.col("tf").cast("double") * F.lit(k1 + 1.0)
         / denom).alias("weight"))
    qq = queries.select(F.col(query_id_col), "term").distinct()
    # rounded-before-ranking for the same reassociation-stability
    # reason as sparse_dot_topk
    hits = (scored.join(qq, "term")
            .groupBy(query_id_col, id_col)
            .agg(F.round(F.sum("weight"), 6).alias("score")))
    w = (Window.partitionBy(query_id_col)
         .orderBy(F.col("score").desc(), F.col(id_col).asc()))
    return (hits.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id_col, id_col, "score", "rank"))


def rrf_fuse(ranked_a: DataFrame, ranked_b: DataFrame, k: int = 10,
             c: int = 60,
             id_cols: tuple[str, str] = ("doc_id", "doc_id"),
             query_id_col: str = "query_id") -> DataFrame:
    """Reciprocal-rank fusion of two retrieval lists — the standard
    hybrid-retrieval combiner (dense ANN ⊕ sparse lexical):

        rrf(q, d) = Σ_lists 1 / (c + rank_list(q, d))

    RRF consumes only the integer RANKS, never the incomparable
    scores, which also makes it hash-exact: each fused score is a sum
    of exactly two floats (commutativity is exact in IEEE — only ≥3
    term reassociation drifts), so every engine computes the
    identical value. Full-outer join on (query, id), absent list
    contributes 0; ties break (fused DESC, id ASC).

    Returns (query_id, id, rrf_score, rank) with id named after
    ``id_cols[0]``.
    """
    ida, idb = id_cols
    a = ranked_a.select(query_id_col, F.col(ida).alias("_id"),
                        F.col("rank").alias("_ra"))
    b = ranked_b.select(query_id_col, F.col(idb).alias("_id"),
                        F.col("rank").alias("_rb"))
    fused = (a.join(b, [query_id_col, "_id"], "full_outer")
             .select(query_id_col, "_id",
                     (F.coalesce(1.0 / (F.lit(c) + F.col("_ra")),
                                 F.lit(0.0))
                      + F.coalesce(1.0 / (F.lit(c) + F.col("_rb")),
                                   F.lit(0.0))).alias("_rrf")))
    w = (Window.partitionBy(query_id_col)
         .orderBy(F.col("_rrf").desc(), F.col("_id").asc()))
    return (fused.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id_col, F.col("_id").alias(ida),
                    F.round("_rrf", 6).alias("rrf_score"), "rank"))
