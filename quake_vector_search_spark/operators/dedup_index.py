"""Persisted incremental near-dup (MinHash-LSH) index.

The production CDC dedup loop at corpus scale: signatures over a
100 TB corpus are expensive to compute, so compute them ONCE, persist
the LSH band buckets + exact shingle sets as an index, and dedup each
arriving batch against the index with per-batch cost ∝ batch size —
never re-touching the corpus text. The reference has no incremental
path at all (its dedup story is absent; SURVEY.md §2.2 extended
surface); this is the scale-first re-expression of the same
MinHash-LSH semantics `operators/dedup.py` uses in-memory.

Index layout under ``path``::

    bands/     (id, band, key)   parquet, partitionBy(band)
    shingles/  (id, shs, n_sh)   parquet — exact verification payload
    meta.json  {n, id_col, version}

Scale notes:
- ``query`` joins the (small) batch's bucket rows against the band
  table on (band, key) — an equi-join AQE broadcasts from the batch
  side; candidate volume scales with true duplicate density, not
  |corpus|·|batch|.
- Verification joins candidates to the PERSISTED corpus shingle sets
  (semi-joined down to candidate ids first — the corpus side of the
  join is candidate-bounded) and to the batch's freshly-computed
  sets; exact Jaccard ≥ threshold, identical to the in-memory
  verifier, so index-vs-in-memory answers match bit-for-bit.
- ``extend`` appends survivors' bands + shingles (append-mode writes
  into the same partition layout); the next batch then dedups against
  corpus ∪ survivors without any rebuild.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quake_vector_search_spark.operators.dedup import (
    band_explode,
    minhash_signatures,
    shingle_sets,
)


def _write_members(docs: DataFrame, path: str, id_col: str,
                   text_col: str, n: int, mode: str) -> None:
    sig = minhash_signatures(docs, id_col, text_col, n)
    (band_explode(sig, id_col)
     .write.mode(mode).partitionBy("band")
     .parquet(os.path.join(path, "bands")))
    (shingle_sets(docs, id_col, text_col, n)
     .write.mode(mode).parquet(os.path.join(path, "shingles")))


def build_lsh_index(docs: DataFrame, path: str,
                    id_col: str = "doc_id", text_col: str = "text",
                    n: int = 3) -> None:
    """One-time corpus pass: persist LSH band buckets + exact shingle
    sets. Two shuffles total (the signature groupBy and the set
    groupBy), both map-side combined; the corpus text is never read
    again by query/extend."""
    _write_members(docs, path, id_col, text_col, n, "overwrite")
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump({"n": n, "id_col": id_col, "version": 1}, fh)


def _load_meta(path: str) -> dict:
    with open(os.path.join(path, "meta.json")) as fh:
        return json.load(fh)


def query_lsh_index(spark: SparkSession, path: str,
                    new_docs: DataFrame, threshold: float = 0.5,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Near-dups of a new batch AGAINST the indexed corpus:
    (new_id, corpus_id, jaccard ≥ threshold). Same banding + exact-
    Jaccard semantics as ``minhash_lsh_pairs`` restricted to
    cross-side pairs — so the in-memory operator on corpus ∪ batch is
    the oracle for this path."""
    meta = _load_meta(path)
    n = int(meta["n"])
    sig_new = minhash_signatures(new_docs, id_col, text_col, n)
    banded_new = (band_explode(sig_new, id_col)
                  .withColumnRenamed(id_col, "new_id"))
    corpus_bands = (spark.read.parquet(os.path.join(path, "bands"))
                    .withColumnRenamed(id_col, "corpus_id"))
    cand = (corpus_bands.join(banded_new, ["band", "key"])
            .select("new_id", "corpus_id").distinct())
    # corpus verification payload, candidate-bounded via semi-join
    # BEFORE the set join — the index's shingle table never streams
    # through the verifier beyond the candidate ids
    corpus_sets = (spark.read.parquet(os.path.join(path, "shingles"))
                   .join(cand.select(F.col("corpus_id").alias(id_col))
                         .distinct(), id_col, "left_semi")
                   .select(F.col(id_col).alias("corpus_id"),
                           F.col("shs").alias("sa"),
                           F.col("n_sh").alias("na")))
    new_sets = (shingle_sets(new_docs, id_col, text_col, n)
                .select(F.col(id_col).alias("new_id"),
                        F.col("shs").alias("sb"),
                        F.col("n_sh").alias("nb")))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    return (cand.join(corpus_sets, "corpus_id").join(new_sets, "new_id")
            .withColumn("jaccard",
                        inter / (F.col("na") + F.col("nb") - inter))
            .where(F.col("jaccard") >= threshold)
            .select("new_id", "corpus_id", "jaccard"))


def extend_lsh_index(path: str, new_docs: DataFrame,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> None:
    """Append a batch's membership rows (bands + shingle sets) so
    later batches dedup against corpus ∪ batch. Caller passes the
    SURVIVORS (post-dedup) — the index stores members, it does not
    decide retention policy. Appends only; no rebuild, no corpus
    re-read."""
    meta = _load_meta(path)
    if meta["id_col"] != id_col:
        raise ValueError(f"index was built with id_col="
                         f"{meta['id_col']!r}, got {id_col!r}")
    _write_members(new_docs, path, id_col, text_col, int(meta["n"]),
                   "append")
