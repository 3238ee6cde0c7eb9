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

    bands/      (id, band, key)          parquet, partitionBy(band)
    shingles/   (id, shs, n_sh, epoch)   parquet — exact verification
    tombstones/ (id, t_epoch)            parquet — CDC removals
    meta.json   {n, id_col, version, epoch}

Epoch rule (the insert-after-delete visibility the IVF index's DML
has): member rows stamp the epoch current at write time; ``remove``
bumps the epoch and tombstones ids at the new value, killing rows
written before it; a later ``extend`` of the same id re-admits it.
``compact`` physically drops dead rows and clears tombstones.

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
                   text_col: str, n: int, mode: str,
                   epoch: int = 0) -> None:
    sig = minhash_signatures(docs, id_col, text_col, n)
    (band_explode(sig, id_col)
     .write.mode(mode).partitionBy("band")
     .parquet(os.path.join(path, "bands")))
    (shingle_sets(docs, id_col, text_col, n)
     .withColumn("epoch", F.lit(int(epoch)))
     .write.mode(mode).parquet(os.path.join(path, "shingles")))


def build_lsh_index(docs: DataFrame, path: str,
                    id_col: str = "doc_id", text_col: str = "text",
                    n: int = 3) -> None:
    """One-time corpus pass: persist LSH band buckets + exact shingle
    sets. Two shuffles total (the signature groupBy and the set
    groupBy), both map-side combined; the corpus text is never read
    again by query/extend."""
    import shutil

    # a REBUILD at the same path must not inherit the previous
    # index's tombstones: the new epoch-0 member rows would read as
    # dead against stale higher-epoch tombstones — silently hiding
    # freshly-indexed members
    shutil.rmtree(os.path.join(path, "tombstones"),
                  ignore_errors=True)
    _write_members(docs, path, id_col, text_col, n, "overwrite",
                   epoch=0)
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump({"n": n, "id_col": id_col, "version": 1,
                   "epoch": 0}, fh)


def _load_meta(path: str) -> dict:
    with open(os.path.join(path, "meta.json")) as fh:
        return json.load(fh)


def _save_meta(path: str, meta: dict) -> None:
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)


def _alive_shingles(spark: SparkSession, path: str,
                    id_col: str) -> DataFrame:
    """The index's LIVE membership: shingle rows whose epoch is at or
    after the newest tombstone for their id. A member row written at
    epoch e dies when a ``remove`` stamps a tombstone at e' > e, and a
    later ``extend`` of the same id (written at the then-current
    epoch ≥ e') re-admits it — the exact insert-after-delete
    visibility rule the IVF index's DML has, expressed as one
    broadcastable max-per-id join. Pre-epoch indexes (no ``epoch``
    column, no tombstones) read as epoch 0 / no tombstones —
    including MIXED dirs (pre-epoch build + post-epoch extends):
    mergeSchema unions the file schemas so the new files' stored
    epochs can't be dropped by single-file schema inference, and the
    old files' missing values coalesce to 0."""
    sh = (spark.read.option("mergeSchema", "true")
          .parquet(os.path.join(path, "shingles")))
    if "epoch" not in sh.columns:
        sh = sh.withColumn("epoch", F.lit(0))
    else:
        sh = sh.withColumn("epoch",
                           F.coalesce(F.col("epoch"), F.lit(0)))
    tomb_dir = os.path.join(path, "tombstones")
    if not os.path.isdir(tomb_dir):
        return sh
    tomb = (spark.read.parquet(tomb_dir)
            .groupBy(id_col)
            .agg(F.max("t_epoch").alias("t_epoch")))
    return (sh.join(tomb, id_col, "left")
            .where(F.col("t_epoch").isNull()
                   | (F.col("epoch") >= F.col("t_epoch")))
            .drop("t_epoch"))


def query_lsh_index(spark: SparkSession, path: str,
                    new_docs: DataFrame, threshold: float = 0.5,
                    id_col: str = "doc_id",
                    text_col: str = "text",
                    max_bucket_size: int | None = None) -> DataFrame:
    """Near-dups of a new batch AGAINST the indexed corpus:
    (new_id, corpus_id, jaccard ≥ threshold). Same banding + exact-
    Jaccard semantics as ``minhash_lsh_pairs`` restricted to
    cross-side pairs — so the in-memory operator on corpus ∪ batch is
    the oracle for this path.

    ``max_bucket_size`` is the hot-key guard (VERDICT r7 #7), the
    index-query analogue of ``minhash_lsh_pairs``' cap: candidate
    volume per matched (band, key) is |corpus bucket| × |batch
    bucket|, and an adversarial (or boilerplate-heavy) corpus can
    concentrate millions of members in one bucket — a single skewed
    join key at 100 TB. Buckets larger than the cap are dropped from
    candidate generation; their members can still surface through
    their other bands. Sizes are counted only for buckets the BATCH
    actually touches (semi-join first), so the guard's cost is
    batch-bounded, not corpus-bounded. The count is over PHYSICAL
    band rows — including tombstoned members until a compact — on
    purpose: dead rows still flow through the candidate join, and
    join cost is what the guard bounds (run ``compact_lsh_index``
    if removals have inflated hot buckets). ``None`` (default) keeps
    exact oracle semantics."""
    meta = _load_meta(path)
    n = int(meta["n"])
    sig_new = minhash_signatures(new_docs, id_col, text_col, n)
    banded_new = (band_explode(sig_new, id_col)
                  .withColumnRenamed(id_col, "new_id"))
    corpus_bands = (spark.read.parquet(os.path.join(path, "bands"))
                    .withColumnRenamed(id_col, "corpus_id"))
    if max_bucket_size is not None:
        touched = banded_new.select("band", "key").distinct()
        corpus_bands = corpus_bands.join(F.broadcast(touched),
                                         ["band", "key"], "left_semi")
        ok = (corpus_bands.groupBy("band", "key")
              .agg(F.count("*").alias("bsz"))
              .where(F.col("bsz") <= int(max_bucket_size))
              .select("band", "key"))
        corpus_bands = corpus_bands.join(F.broadcast(ok),
                                         ["band", "key"], "left_semi")
    cand = (corpus_bands.join(banded_new, ["band", "key"])
            .select("new_id", "corpus_id").distinct())
    # corpus verification payload, candidate-bounded via semi-join
    # BEFORE the set join — the index's shingle table never streams
    # through the verifier beyond the candidate ids. Alive rows only:
    # stale band rows of removed members still bucket-match, but the
    # inner join against the live shingle set drops them here.
    corpus_sets = (_alive_shingles(spark, path, id_col)
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
                   "append", epoch=int(meta.get("epoch", 0)))


def remove_from_lsh_index(spark: SparkSession, path: str,
                          ids) -> None:
    """CDC delete: tombstone members so ``query`` stops matching them
    — O(|ids|) metadata append, no rewrite of the member tables (the
    same tombstone economics as the IVF index's delete). The removal
    bumps the index epoch and stamps tombstones at the new epoch, so
    member rows written BEFORE the removal die while a later
    ``extend`` of the same id (stamped at the then-current epoch)
    re-admits it. ``compact_lsh_index`` physically drops dead rows.

    ``ids``: an iterable of ids or a single-column DataFrame."""
    meta = _load_meta(path)
    epoch = int(meta.get("epoch", 0)) + 1
    id_col = meta["id_col"]
    if isinstance(ids, DataFrame):
        tomb = ids.toDF(id_col)
    else:
        # derive the id type from the persisted member table — the
        # index is id-type-agnostic (string ids work everywhere
        # else), so a hardcoded long here would silently no-op the
        # remove for non-long ids
        from pyspark.sql import types as T

        id_field = next(
            f for f in spark.read.parquet(
                os.path.join(path, "shingles")).schema
            if f.name == id_col)
        tomb = spark.createDataFrame(
            [(i,) for i in ids],
            T.StructType([T.StructField(id_col, id_field.dataType)]))
    (tomb.withColumn("t_epoch", F.lit(epoch))
     .write.mode("append").parquet(os.path.join(path, "tombstones")))
    meta["epoch"] = epoch
    _save_meta(path, meta)


def compact_lsh_index(spark: SparkSession, path: str) -> dict:
    """Physically drop dead members (tombstoned, never re-admitted)
    from both tables and clear the tombstones — the periodic
    compaction any tombstone scheme owes, and the small-file cleanup
    after many appends (each ``extend`` adds a file per band
    partition; at CDC cadence that's thousands of tiny files a day at
    100 TB scale — compaction rewrites each band partition into full
    coalesced files in one pass). Query answers are IDENTICAL before
    and after. Returns {"live", "dropped"}."""
    import shutil

    meta = _load_meta(path)
    id_col = meta["id_col"]
    total = spark.read.parquet(os.path.join(path, "shingles")).count()
    alive = _alive_shingles(spark, path, id_col)
    live_ids = alive.select(id_col)
    bands = (spark.read.parquet(os.path.join(path, "bands"))
             .join(live_ids, id_col, "left_semi"))
    # rewrite into scratch dirs, then swap — readers of the OLD files
    # are done by the time the actions below finish (same single-
    # writer contract the IVF sidecar rebuilds have)
    tmp_b = os.path.join(path, "_compact_bands")
    tmp_s = os.path.join(path, "_compact_shingles")
    bands.write.mode("overwrite").partitionBy("band").parquet(tmp_b)
    alive.write.mode("overwrite").parquet(tmp_s)
    n_live = spark.read.parquet(tmp_s).count()
    for tmp, final in ((tmp_b, "bands"), (tmp_s, "shingles")):
        dst = os.path.join(path, final)
        shutil.rmtree(dst, ignore_errors=True)
        os.replace(tmp, dst)
    shutil.rmtree(os.path.join(path, "tombstones"),
                  ignore_errors=True)
    return {"live": int(n_live), "dropped": int(total - n_live)}
