"""Deterministic sharded export — the last step of a training-data
pipeline: write the curated corpus as a fixed number of shards whose
membership is a pure function of (row id, seed), so re-runs, engine
swaps, and incremental additions produce bit-identical shard routing.

Why hash-sharding and not `repartition(n)`: Spark's round-robin /
random repartition assigns rows by task layout, so two runs of the
same pipeline can produce different shard contents — poison for
reproducible training-data releases and for downstream "which shard
is example X in" bookkeeping. The portable md5 route (same formula as
sampling.py::split_hash_expr) makes shard membership checkable by ANY
engine that can compute md5 — which is exactly what the registry
oracle does.

Plan shape at 100 TB: one narrow projection (the shard column), one
hash-shuffle on `shard` (unavoidable — it IS the output contract),
an optional in-partition sort (no extra exchange: sortWithinPartitions
after repartition(shard) sorts the already-placed data), then a
partitionBy(shard) parquet write. No global sort, no driver
materialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shard_expr(id_col: str, n_shards: int, seed: int = 101) -> Column:
    """Portable shard id in [0, n_shards): first 15 hex chars of
    md5('<seed>:<id>') -> bigint mod n_shards. DuckDB twin:
    ``CAST(concat('0x', substr(md5(concat(seed, ':', CAST(id AS
    VARCHAR))), 1, 15)) AS BIGINT) % n_shards``."""
    tag = F.concat_ws(":", F.lit(str(seed)),
                      F.col(id_col).cast("string"))
    return (F.conv(F.substring(F.md5(tag), 1, 15), 16, 10)
            .cast("long") % n_shards)


def shard_assign(df: DataFrame, id_col: str, n_shards: int,
                 seed: int = 101) -> DataFrame:
    """Append the deterministic `shard` column (narrow, no shuffle)."""
    return df.withColumn("shard", shard_expr(id_col, n_shards, seed))


def export_shards(df: DataFrame, path: str, id_col: str,
                  n_shards: int, seed: int = 101,
                  sort_col: str | None = None) -> None:
    """Write ``df`` as ``path/shard=<i>/`` parquet, one directory per
    shard, rows within a shard sorted by ``sort_col`` (default: the id
    column) for stable file layout and better downstream range scans."""
    out = shard_assign(df, id_col, n_shards, seed)
    out = (out.repartition(n_shards, F.col("shard"))
              .sortWithinPartitions(sort_col or id_col))
    out.write.mode("overwrite").partitionBy("shard").parquet(path)


def shard_manifest(shards: DataFrame, id_col: str,
                   content_cols: list[str] | None = None) -> DataFrame:
    """Per-shard manifest over a read-back sharded dataset: row count,
    id range, and an order-insensitive content checksum (sum over rows
    of md5(id) mod 1e9+7 — portable, overflow-safe for < ~9e9 rows per
    shard as a bigint sum). One partial-aggregated groupBy on the
    shard key."""
    h = (F.conv(F.substring(
            F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
         .cast("long") % 1_000_000_007)
    aggs = [F.count("*").alias("n_rows"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
            F.sum(h).alias("id_checksum")]
    for c in (content_cols or []):
        aggs.append(F.sum(c).alias(f"sum_{c}"))
    return shards.groupBy("shard").agg(*aggs)
