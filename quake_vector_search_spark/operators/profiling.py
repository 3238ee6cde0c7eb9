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

from pyspark.sql import DataFrame, Window
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


def psi_drift(ref: DataFrame, cur: DataFrame, value_col: str,
              n_buckets: int = 10,
              lo: float | None = None,
              hi: float | None = None) -> DataFrame:
    """Population Stability Index between a reference and a current
    snapshot of a numeric column — the standard training-data drift
    monitor (PSI < 0.1 stable, 0.1–0.25 moderate, > 0.25 major drift).

    Fixed-width buckets over [lo, hi] (taken from the REFERENCE
    snapshot's min/max when not given — the production pattern: bucket
    edges freeze with the training run, new data lands in the edge
    buckets when it drifts out of range). Each side is one scan + one
    tiny groupBy on the bucket id; the PSI sum is over n_buckets rows.
    Laplace-style smoothing (+1 per bucket) keeps empty buckets from
    producing infinities while staying engine-portable (integer
    counts, no float accumulation order dependence).

    Returns one row per bucket (bucket, n_ref, n_cur, psi_term) —
    aggregate SUM(psi_term) for the headline PSI.
    """
    if lo is None or hi is None:
        b = ref.agg(F.min(value_col).cast("double").alias("lo"),
                    F.max(value_col).cast("double").alias("hi")).head()
        if b["lo"] is None or b["hi"] is None:
            raise ValueError(
                f"psi_drift: reference snapshot has no non-null "
                f"{value_col!r} rows to derive bucket edges from — "
                f"pass lo/hi explicitly or supply a non-empty reference")
        lo = float(b["lo"]) if lo is None else lo
        hi = float(b["hi"]) if hi is None else hi
    # hi == lo (single-valued reference) degenerates to width 1.0:
    # every row lands in bucket 0 and drift out of the point shows up
    # in the edge buckets — intended freeze-the-edges behavior
    width = (hi - lo) / n_buckets or 1.0
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.greatest(F.lit(0), F.floor(
            (F.col(value_col).cast("double") - F.lit(lo)) / F.lit(width))
            .cast("int"))).alias("bucket")

    def side(df, name):
        return (df.select(bucket)
                .groupBy("bucket").agg(F.count("*").alias(name)))

    grid = ref.sparkSession.range(n_buckets) \
        .select(F.col("id").cast("int").alias("bucket"))
    r = side(ref, "n_ref")
    c = side(cur, "n_cur")
    tot_r = F.sum("n_ref").over(Window.partitionBy())
    tot_c = F.sum("n_cur").over(Window.partitionBy())
    joined = (grid.join(r, "bucket", "left").join(c, "bucket", "left")
              .select("bucket",
                      F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
                      F.coalesce("n_cur", F.lit(0)).alias("n_cur")))
    pa = (F.col("n_ref") + 1).cast("double") / (tot_r + n_buckets)
    pb = (F.col("n_cur") + 1).cast("double") / (tot_c + n_buckets)
    return joined.select(
        "bucket", "n_ref", "n_cur",
        ((pa - pb) * F.log(pa / pb)).alias("psi_term"))
