"""Dataset profiling — per-column QA stats for training-data curation
(beyond-reference surface; the reference has no relational data model
at all, SURVEY.md §2.2).

One aggregate pass over the table computes every column's stats
simultaneously (count / nulls / exact distinct / min / max), then a
narrow explode reshapes the single wide row to one row per column.
At 100 TB this is one scan + one tiny shuffle for the multi-distinct
expand; swap count_distinct for approx_count_distinct when exactness
isn't needed (the oracle pins the exact variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column profile: (col_name, n_rows, n_null, n_distinct,
    min_value, max_value) with min/max rendered as strings so mixed
    column types share one schema."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
             .alias(f"{c}__n_null"),
            F.count_distinct(F.col(c)).alias(f"{c}__n_distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    per_col = [F.struct(
        F.lit(c).alias("col_name"),
        F.col("__n_rows").alias("n_rows"),
        F.col(f"{c}__n_null").alias("n_null"),
        F.col(f"{c}__n_distinct").alias("n_distinct"),
        F.col(f"{c}__min").alias("min_value"),
        F.col(f"{c}__max").alias("max_value"),
    ) for c in cols]
    return (wide.select(F.explode(F.array(*per_col)).alias("p"))
            .select("p.*"))
