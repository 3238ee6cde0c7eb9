"""SCD2 dimension maintenance: build and incrementally merge
slowly-changing-dimension tables.

``scd2_build`` turns a change stream into validity intervals (each
state-changing row opens an interval closed by the key's next change;
open tail = current state). ``scd2_apply`` merges a new change batch
into an existing SCD2 table WITHOUT rebuilding history: only the
touched keys' open intervals close, everything else is untouched —
the lakehouse MERGE pattern, expressed as DataFrame ops.

Invariant (pinned by tests and the ts_scd2_merge oracle):
``scd2_apply(scd2_build(old), new) == scd2_build(old ∪ new)``
whenever every row in ``new`` is later than every row in ``old`` for
its key (the append-only CDC case). At 100 TB the payoff is that the
merge touches one partition-pruned anti-join + a window over the NEW
batch's keys only — not a rebuild over all history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(changes: DataFrame, key_col: str, ts_col: str,
               order_cols: tuple[str, ...] = (),
               state_cols: tuple[str, ...] = ()) -> DataFrame:
    """Change rows → SCD2 intervals. ``order_cols`` break timestamp
    ties deterministically (e.g. an event id). valid_to is an
    epoch-seconds double (NULL = open) — see NOTES: nullable raw
    timestamps don't survive every hash path."""
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    cols = [F.col(key_col), F.col(ts_col).alias("valid_from"),
            F.round(F.lead(ts_col).over(w).cast("double"), 6)
             .alias("valid_to_epoch_s")]
    cols += [F.col(c) for c in state_cols]
    cols += [F.col(c) for c in order_cols if c not in state_cols]
    return changes.select(*cols)


def scd2_apply(dim: DataFrame, new_changes: DataFrame, key_col: str,
               ts_col: str, order_cols: tuple[str, ...] = (),
               state_cols: tuple[str, ...] = ()) -> DataFrame:
    """Merge an append-only change batch into an existing SCD2 table.

    Touched keys: their open interval closes at the key's first new
    change; the new rows chain among themselves. Untouched keys pass
    through byte-identical. Plan: one aggregate over the (small) batch
    for first-change-per-key, a broadcast join to close open rows, and
    one window over the batch — history is never re-shuffled."""
    new_built = scd2_build(new_changes, key_col, ts_col,
                           order_cols, state_cols)
    first_new = (new_changes.groupBy(key_col)
                 .agg(F.min(ts_col).alias("_first_new_ts")))
    closed = (dim.join(F.broadcast(first_new), key_col, "left")
              .withColumn(
                  "valid_to_epoch_s",
                  F.when(F.col("valid_to_epoch_s").isNull()
                         & F.col("_first_new_ts").isNotNull(),
                         F.round(F.col("_first_new_ts").cast("double"), 6))
                   .otherwise(F.col("valid_to_epoch_s")))
              .drop("_first_new_ts"))
    return closed.unionByName(new_built)


def merge_rollup(existing: DataFrame, delta: DataFrame,
                 keys: list[str], sum_cols: list[str],
                 count_col: str = "n") -> DataFrame:
    """Incremental aggregate maintenance (materialized-view merge):
    fold a pre-aggregated DELTA batch into an EXISTING rollup without
    touching history — the 100 TB pattern where the nightly fact scan
    is replaced by re-aggregating only the new partition and merging
    (sums add, counts add; avg/ratios derive downstream).

    Both inputs carry (keys, sum_cols, count_col) at the same grain.
    Plan: unionAll + one map-side-combined groupBy on the keys — the
    merge shuffles only the two SUMMARY relations (cardinality =
    group count, not fact rows)."""
    aggs = [F.sum(c).alias(c) for c in sum_cols]
    aggs.append(F.sum(count_col).cast("long").alias(count_col))
    return existing.unionAll(delta).groupBy(*keys).agg(*aggs)
