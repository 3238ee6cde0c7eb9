"""Physical layout operators: z-order clustering for data skipping.

At 100 TB the cheapest predicate is the one that never reads the row
group: parquet footers carry per-column min/max, and both Spark's
reader (row-group skipping from pushed filters) and any lakehouse
table format (file-level stats pruning) exploit them — but only if the
write LAYOUT made the stats tight. Sorting by one column gives perfect
skipping on that column and none on any other; interleaving the bits
of several columns (Morton / z-order — the Delta OPTIMIZE ZORDER
technique) gives partial skipping on EVERY indexed column at once.

Everything here is pure Catalyst column arithmetic (shift/mask/sum) —
the z-value is deterministic and engine-portable, so the DuckDB oracle
computes the identical interleave (queries/relational_queries.py::
q_zorder_values builds the same expression text for both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16


def _scale_expr(c: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Min-max scale a numeric column to an integer in [0, 2^bits):
    rank-free normalization that needs only the (broadcastable) column
    bounds. Constant columns (hi == lo) map to 0."""
    span = hi - lo
    frac = F.when(span > 0, (c.cast("double") - lo) / span).otherwise(F.lit(0.0))
    top = F.lit((1 << bits) - 1)
    return F.least(F.floor(frac * (1 << bits)).cast("long"), top.cast("long"))


def interleave_bits(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Morton-interleave two integers in [0, 2^bits): bit i of ``a``
    lands at position 2i, bit i of ``b`` at 2i+1. Expanded as a sum of
    2*bits shift/mask terms — a single whole-stage-codegen expression,
    no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def interleave_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    """The identical interleave as portable SQL text (for oracles and
    SQL-surface users): ``a``/``b`` are integer expressions already
    scaled to [0, 2^bits)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zvalue(df: DataFrame, col_a: str, col_b: str,
           bits: int = Z_BITS) -> DataFrame:
    """Append a ``zval`` column: the Morton code of the two columns
    after min-max scaling. Bounds come from one tiny aggregate,
    broadcast-joined back (no second scan of a cached input; at scale
    bounds usually come from table stats instead)."""
    bounds = df.agg(F.min(col_a).alias("_alo"), F.max(col_a).alias("_ahi"),
                    F.min(col_b).alias("_blo"), F.max(col_b).alias("_bhi"))
    out = df.join(F.broadcast(bounds))
    sa = _scale_expr(F.col(col_a), F.col("_alo"), F.col("_ahi"), bits)
    sb = _scale_expr(F.col(col_b), F.col("_blo"), F.col("_bhi"), bits)
    return (out.withColumn("zval", interleave_bits(sa, sb, bits))
            .drop("_alo", "_ahi", "_blo", "_bhi"))


def zorder_write(df: DataFrame, path: str, col_a: str, col_b: str,
                 n_files: int = 8, bits: int = Z_BITS) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered by the
    z-curve over (col_a, col_b): range-partition on zval (contiguous
    curve segments per file) and sort within each, so every file's
    min/max footer stats are tight boxes on BOTH columns. One shuffle
    (the range partitioner), exactly what a maintenance/OPTIMIZE job
    would run; readers then skip files/row-groups from ordinary pushed
    filters with no new reader code."""
    z = zvalue(df, col_a, col_b, bits)
    (z.repartitionByRange(n_files, "zval")
     .sortWithinPartitions("zval")
     .drop("zval")
     .write.mode("overwrite").parquet(path))
