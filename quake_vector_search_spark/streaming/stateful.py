"""Custom stateful streaming operator via applyInPandasWithState —
the extension seam for stateful logic Spark's built-in windows can't
express (reference analogue: the per-partition ``hits`` counters the
demo loop accumulates across queries, ipynb c1:155 / c2:57-84).

``user_running_totals`` keeps per-user lifetime aggregates (count, sum,
max, last-seen timestamp) in the state store and emits the refreshed
totals every micro-batch the user appears in. State is keyed by user —
at scale the store shards with the shuffle partitioning, and a real
deployment would add a timeout policy (GroupStateTimeout) to retire
idle keys; lifetime totals here deliberately never expire.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("user_id long, n_events long, sum_value double, "
              "max_value double, last_ts timestamp")
STATE_SCHEMA = "n long, s double, m double, last_us long"


def user_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max, last event time) over an
    events stream. Each micro-batch emits one refreshed row per active
    user; the *final* emission per user equals the batch groupBy
    aggregate — the oracle tests/test_streaming.py asserts."""

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        n, s, m, last_us = (state.get if state.exists
                            else (0, 0.0, float("-inf"), 0))
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            s += float(pdf["value"].sum())
            m = max(m, float(pdf["value"].max()))
            last_us = max(last_us,
                          int(pd.DatetimeIndex(pdf["ts"]).asi8.max() // 1000))
        state.update((n, s, m, last_us))
        yield pd.DataFrame({
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [s],
            "max_value": [m],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        })

    return (events.groupBy("user_id")
            .applyInPandasWithState(update, OUT_SCHEMA, STATE_SCHEMA,
                                    "update", GroupStateTimeout.NoTimeout))


KMV_OUT_SCHEMA = "shard int, version long, mins array<double>"
KMV_STATE_SCHEMA = "version long, mins array<double>"


def kmv_stream(rows: DataFrame, item_col: str, k: int = 256,
               n_shards: int = 8) -> DataFrame:
    """Streaming KMV distinct-count sketch — the pairing of the
    streaming CMS (frequency) with a cardinality sketch, built on the
    applyInPandasWithState seam because keep-the-k-smallest is not an
    algebraic aggregate Spark's incremental engine knows.

    Items hash to (0, 1] with EXACTLY the batch operator's portable
    hash (operators/sketch.py::kmv_distinct), shard by hash range, and
    each shard's state is its own k minimum distinct hashes — state is
    ≤ k doubles per shard regardless of stream length or cardinality.
    Every touched shard emits (shard, version, mins) per micro-batch;
    `version` increments per update so a reader of the drained sink
    takes max-version per shard. Merging the shards' minima
    (kmv_merge_rows) reproduces the batch sketch EXACTLY: each shard
    owns a disjoint hash range, so the union of per-shard minima
    contains the global k smallest — the mergeability that makes KMV
    the distributed/streaming distinct counter."""
    import numpy as np
    from pyspark.sql import functions as F

    h = (F.conv(F.substring(F.md5(
            F.concat_ws(":", F.lit("kmv"),
                        F.col(item_col).cast("string"))), 1, 15), 16, 10)
         .cast("long"))
    u = (h + F.lit(1)).cast("double") / F.lit(float(2 ** 60))
    shard = F.least(F.floor(u * n_shards).cast("int"),
                    F.lit(n_shards - 1))
    hashed = (rows.select(u.alias("u"), shard.alias("shard"))
              .where(F.col("u").isNotNull()))

    def update(key, pdfs, state: GroupState):
        (sh,) = key
        version, mins = (state.get if state.exists else (0, []))
        vals = set(mins)
        for pdf in pdfs:
            vals.update(float(x) for x in pdf["u"])
        merged = sorted(vals)[:k]
        version += 1
        state.update((version, merged))
        yield pd.DataFrame({"shard": [sh], "version": [version],
                            "mins": [np.asarray(merged)]})

    return (hashed.groupBy("shard")
            .applyInPandasWithState(update, KMV_OUT_SCHEMA,
                                    KMV_STATE_SCHEMA, "update",
                                    GroupStateTimeout.NoTimeout))


def kmv_merge_rows(drained: DataFrame, k: int = 256) -> DataFrame:
    """Merge a drained kmv_stream sink into the batch operator's
    single-row output shape (kth_min_hash, est_distinct, n_kept):
    latest emission per shard → union of minima → global k smallest.
    Identical arithmetic to operators/sketch.py::kmv_distinct, so
    stream-then-merge equals the batch sketch row for row."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    latest = (drained
              .withColumn("_rn", F.row_number().over(
                  Window.partitionBy("shard")
                  .orderBy(F.col("version").desc())))
              .where(F.col("_rn") == 1))
    mins = (latest.select(F.explode("mins").alias("u"))
            .distinct().orderBy(F.col("u").asc()).limit(k))
    return (mins.agg(F.max("u").alias("kth_min_hash"),
                     F.count("*").alias("n_kept"))
            .select(F.round("kth_min_hash", 10).alias("kth_min_hash"),
                    F.when(F.col("n_kept") < k,
                           F.col("n_kept").cast("double"))
                     .otherwise((F.lit(k - 1)) / F.col("kth_min_hash"))
                     .cast("double").alias("est_distinct_raw"),
                    F.col("n_kept"))
            .select("kth_min_hash",
                    F.round("est_distinct_raw", 4).alias("est_distinct"),
                    "n_kept"))
