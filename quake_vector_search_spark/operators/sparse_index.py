"""Persisted incremental BM25 (inverted) index.

The lexical-retrieval twin of ``dedup_index``: tokenizing a 100 TB
corpus is expensive, so do it ONCE — persist the posting lists and the
per-term / per-doc integer statistics — and serve query batches (or
admit new document batches) at cost proportional to the batch, never
re-reading corpus text. The reference has no sparse surface at all
(SURVEY.md §2.2 extended gap); this is the CDC-shaped completion of
``operators/sparse.py``'s one-shot ``bm25_topk``.

The design decision that makes extends O(batch): persist RAW INTEGER
statistics, never weights. BM25 weights depend on global stats
(df, N, avg_len) that change with every admitted batch — a
materialized weight column would go stale corpus-wide on each extend.
Raw (tf, df, len) rows are append-only and MERGEABLE (df sums across
batches, N and Σlen are two driver-side counters), and the weight
arithmetic moves to query time, where it costs a handful of Column
expressions over candidate-bounded rows.

Index layout under ``path``::

    postings/   (id, term, tf)   parquet — append per batch
    termstats/  (term, df)       parquet — per-batch partials (CDC
                                 removals append NEGATIVE partials);
                                 query SUMs them (vocab-bounded, and
                                 only for the query's own terms)
    doclens/    (id, len)        parquet — candidate-bounded join
    tombstones/ (id)             parquet — removed docs until compact
    meta.json   {id_col, version, n_docs, n_len_docs, total_len}

Scale notes:
- ``query`` inner-joins postings to the (tiny) query-term stats table
  — AQE broadcasts the term side, so the posting scan is pruned to
  the query's terms; doc lengths join only candidate ids.
- df for a query term = SUM over per-batch partials — the same
  mergeable-partial-aggregate shape as the sketch family, so extends
  never rewrite existing stats.
- N / avg_len are exact integers in meta.json, updated per batch from
  the batch's own aggregates — no corpus-wide recount, ever.
- Scores are identical to ``bm25_topk`` over the union of all
  admitted batches (pinned by the registry row's oracle): same
  Robertson idf, same rounding-before-ranking determinism rule.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quake_vector_search_spark.operators.sparse import _terms


def _batch_stats(docs: DataFrame, path: str, id_col: str,
                 text_col: str, mode: str) -> dict:
    """Write one batch's postings/termstats/doclens and return its
    integer counters {n_docs, n_len_docs, total_len}. Two aggregates
    over the term relation (the same pair every sparse operator
    uses) + one narrow distinct-count of the batch's ids."""
    t = _terms(docs, id_col, text_col)
    tf = t.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    if mode == "overwrite":
        # build: write the postings first, then derive the other
        # stats FROM the written files — the corpus-scale relation is
        # materialized exactly once, scan-backed, never cached
        tf.write.mode(mode).parquet(os.path.join(path, "postings"))
        tf = docs.sparkSession.read.parquet(
            os.path.join(path, "postings"))
    else:
        # extend: the batch-bounded tf is checkpointed so the three
        # derived aggregates don't re-tokenize the batch; an append
        # can't re-read its own rows back (the dir holds all batches)
        tf = tf.localCheckpoint()
        tf.write.mode(mode).parquet(os.path.join(path, "postings"))
    (tf.groupBy("term").agg(F.count("*").alias("df"))
     .write.mode(mode).parquet(os.path.join(path, "termstats")))
    # doclens is the index's MEMBER table: one row per admitted doc,
    # len 0 for empty-text docs (they count in N but not in avg_len)
    # — removal needs an authoritative membership test, and this
    # table is it
    dlen = (docs.select(id_col).distinct()
            .join(tf.groupBy(id_col).agg(F.sum("tf").alias("len")),
                  id_col, "left")
            .withColumn("len", F.coalesce(F.col("len"), F.lit(0))))
    dlen.write.mode(mode).parquet(os.path.join(path, "doclens"))
    agg = dlen.agg(
        F.count("*").alias("nd"),
        F.sum(F.when(F.col("len") > 0, 1).otherwise(0)).alias("nl"),
        F.sum("len").alias("tl")).collect()[0]
    return {"n_docs": int(agg["nd"] or 0),
            "n_len_docs": int(agg["nl"] or 0),
            "total_len": int(agg["tl"] or 0)}


def build_bm25_index(docs: DataFrame, path: str,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> None:
    """One-time corpus pass: persist posting lists + integer stats.
    The corpus text is never read again by query/extend."""
    import shutil

    # a REBUILD must not inherit the previous index's tombstones:
    # the stale anti-join would hide freshly-indexed docs that the
    # fresh stats still count — silently wrong top-k
    shutil.rmtree(os.path.join(path, "tombstones"),
                  ignore_errors=True)
    counters = _batch_stats(docs, path, id_col, text_col, "overwrite")
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump({"id_col": id_col, "version": 1, **counters}, fh)


def _load_meta(path: str) -> dict:
    with open(os.path.join(path, "meta.json")) as fh:
        return json.load(fh)


def extend_bm25_index(path: str, new_docs: DataFrame,
                      text_col: str = "text") -> None:
    """Admit a document batch: append its postings/stats partials and
    bump the exact driver-side counters — O(batch), no rewrite, no
    corpus re-read. Ids are assumed new (the same unique-member
    contract the near-dup index has)."""
    meta = _load_meta(path)
    counters = _batch_stats(new_docs, path, meta["id_col"], text_col,
                            "append")
    for key in ("n_docs", "n_len_docs", "total_len"):
        meta[key] = int(meta.get(key, 0)) + counters[key]
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)


def query_bm25_index(spark: SparkSession, path: str,
                     queries: DataFrame, k: int = 10,
                     k1: float = 1.2, b: float = 0.75,
                     query_id_col: str = "query_id",
                     max_term_df: int | None = None) -> DataFrame:
    """BM25 top-k of a query batch against the persisted index —
    identical scores to ``bm25_topk`` over the union of every admitted
    batch. Queries are (query_id, term) bags. The plan touches only
    query-term postings (inner join against the query's own term-stat
    rows) and candidate-doc lengths; N/avg_len come from the meta
    counters as literals, so no corpus-wide job runs at query time.

    ``max_term_df`` is the hot-key guard (VERDICT r7 #7): the posting
    scan is pruned to the query's terms, but ONE stopword-class term
    ("the") can hold a posting list the size of the corpus — a skewed
    join key whose candidates dominate the scan while contributing
    ~zero score (Robertson idf → 0 as df → N). Terms with summed df
    above the cap are dropped at the stats step, before any posting
    row is read, bounding candidates to Σ df ≤ n_query_terms · cap.
    ``None`` (default) keeps exact oracle semantics."""
    meta = _load_meta(path)
    id_col = meta["id_col"]
    n = int(meta["n_docs"])
    avg_len = float(meta["total_len"]) / max(int(meta["n_len_docs"]),
                                             1)
    qq = queries.select(F.col(query_id_col), "term").distinct()
    # per-term df = SUM of per-batch partials, restricted to the
    # query's terms BEFORE the sum — vocab-bounded, batch-bounded
    ts = (spark.read.parquet(os.path.join(path, "termstats"))
          .join(qq.select("term").distinct(), "term", "left_semi")
          .groupBy("term").agg(F.sum("df").alias("df"))
          .where(F.col("df") > 0))
    if max_term_df is not None:
        ts = ts.where(F.col("df") <= int(max_term_df))
    posts = (spark.read.parquet(os.path.join(path, "postings"))
             .join(ts, "term"))
    # CDC removals: tombstoned docs drop out of the candidate set
    # here (their df/N/len corrections are already in the stats —
    # negative partials + decremented counters), until a compact
    # physically drops their rows
    tomb_dir = os.path.join(path, "tombstones")
    if os.path.isdir(tomb_dir):
        posts = posts.join(spark.read.parquet(tomb_dir), id_col,
                           "left_anti")
    dlen = (spark.read.parquet(os.path.join(path, "doclens"))
            .join(posts.select(id_col).distinct(), id_col,
                  "left_semi"))
    idf = F.log((F.lit(float(n)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
    denom = (F.col("tf")
             + F.lit(k1) * (F.lit(1.0 - b)
                            + F.lit(b) * F.col("len")
                            / F.lit(avg_len)))
    scored = (posts.join(dlen, id_col)
              .select(F.col(id_col), "term",
                      (idf * F.col("tf").cast("double")
                       * F.lit(k1 + 1.0) / denom).alias("weight")))
    hits = (scored.join(qq, "term")
            .groupBy(query_id_col, id_col)
            .agg(F.round(F.sum("weight"), 6).alias("score")))
    w = (Window.partitionBy(query_id_col)
         .orderBy(F.col("score").desc(), F.col(id_col).asc()))
    return (hits.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id_col, id_col, "score", "rank"))


def remove_from_bm25_index(spark: SparkSession, path: str,
                           ids) -> None:
    """CDC delete: un-admit documents at cost ∝ their own postings —
    no corpus rescan, no rewrite. Three mergeable corrections, all
    derived from the index's own persisted rows for the removed ids:

    - tombstones/ (id): query-side anti-join drops the docs' postings
      and lengths;
    - NEGATIVE df partials appended to termstats/ (the per-term SUM
      the query computes then nets out the removed docs — the same
      merge arithmetic extends use, run in reverse);
    - the meta counters decremented by the docs' own doclens rows.

    Removal is IDEMPOTENT. CDC delivery is at-least-once, so the same
    delete can arrive twice (and a batch can repeat an id): the
    request ids are deduped, then anti-joined against the existing
    tombstones BEFORE any correction is computed — a redelivered
    delete touches zero rows and leaves every counter unchanged.
    Non-member ids (a delete for a doc filtered at ingest) are also
    ignored: live membership is tested against the doclens member
    table net of tombstones, so stray ids never corrupt N or leave
    tombstones. ``compact_bm25_index`` physically drops the rows and
    squashes the partials."""
    meta = _load_meta(path)
    id_col = meta["id_col"]
    if isinstance(ids, DataFrame):
        req = ids.toDF(id_col)
    else:
        from pyspark.sql import types as T

        id_field = next(
            f for f in spark.read.parquet(
                os.path.join(path, "doclens")).schema
            if f.name == id_col)
        req = spark.createDataFrame(
            [(i,) for i in ids],
            T.StructType([T.StructField(id_col, id_field.dataType)]))
    req = req.distinct()          # a batch may repeat an id
    # already-tombstoned ids are NOT members anymore — doclens still
    # holds their rows until compact, so the membership test must be
    # doclens NET OF tombstones or a redelivered delete would
    # double-append negative df partials and double-decrement the
    # meta counters (silent score corruption; ADVICE r7 medium)
    tomb_dir = os.path.join(path, "tombstones")
    if os.path.isdir(tomb_dir):
        req = req.join(spark.read.parquet(tomb_dir), id_col,
                       "left_anti")
    # restrict to ACTUAL members — doclens has one row per admitted
    # doc (len 0 for empty-text docs), so it is the membership oracle
    dl_rm = (spark.read.parquet(os.path.join(path, "doclens"))
             .join(req, id_col, "left_semi")
             .localCheckpoint())   # bounded: the removal batch
    rm = dl_rm.select(id_col)
    posts_rm = (spark.read.parquet(os.path.join(path, "postings"))
                .join(rm, id_col, "left_semi"))
    (posts_rm.groupBy("term")
     .agg((-F.count("*")).alias("df"))
     .write.mode("append").parquet(os.path.join(path, "termstats")))
    agg = dl_rm.agg(
        F.count("*").alias("nd"),
        F.sum(F.when(F.col("len") > 0, 1).otherwise(0)).alias("nl"),
        F.sum("len").alias("tl")).collect()[0]
    rm.write.mode("append").parquet(os.path.join(path, "tombstones"))
    meta["n_docs"] = int(meta["n_docs"]) - int(agg["nd"] or 0)
    meta["n_len_docs"] = int(meta["n_len_docs"]) - int(agg["nl"] or 0)
    meta["total_len"] = int(meta["total_len"]) - int(agg["tl"] or 0)
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)


def compact_bm25_index(spark: SparkSession, path: str) -> dict:
    """Physically drop removed docs' postings/lengths, squash the
    per-batch termstats partials (positive and negative) into one row
    per term, and clear tombstones — query answers identical before
    and after, file counts reset after many CDC batches. Returns
    {"live", "dropped"}."""
    import shutil

    meta = _load_meta(path)
    id_col = meta["id_col"]
    tomb_dir = os.path.join(path, "tombstones")
    posts = spark.read.parquet(os.path.join(path, "postings"))
    total = posts.count()
    dlen = spark.read.parquet(os.path.join(path, "doclens"))
    if os.path.isdir(tomb_dir):
        tomb = spark.read.parquet(tomb_dir)
        posts = posts.join(tomb, id_col, "left_anti")
        dlen = dlen.join(tomb, id_col, "left_anti")
    stats = (spark.read.parquet(os.path.join(path, "termstats"))
             .groupBy("term").agg(F.sum("df").alias("df"))
             .where(F.col("df") > 0))
    tmp = {k: os.path.join(path, f"_compact_{k}")
           for k in ("postings", "doclens", "termstats")}
    posts.write.mode("overwrite").parquet(tmp["postings"])
    dlen.write.mode("overwrite").parquet(tmp["doclens"])
    stats.write.mode("overwrite").parquet(tmp["termstats"])
    n_live = spark.read.parquet(tmp["postings"]).count()
    for k, t in tmp.items():
        dst = os.path.join(path, k)
        shutil.rmtree(dst, ignore_errors=True)
        os.replace(t, dst)
    shutil.rmtree(tomb_dir, ignore_errors=True)
    return {"live": int(n_live), "dropped": int(total - n_live)}
