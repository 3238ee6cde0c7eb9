"""Parquet source catalog for the testdata star schema + vector tables.

Spark mapping of reference data model (SURVEY.md §1.3): the reference
holds everything in process memory (`adaptive_ivf.mjs:140-154`,
`ipynb c1:51-64`); here every table is a Parquet-backed DataFrame so
scans get predicate pushdown, column pruning, and partition pruning from
Catalyst for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# canonical table names (one parquet file/dir per table)
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table. Plain `spark.read.parquet` — Catalyst
    handles pushdown/pruning; do NOT cache here (caching defeats column
    pruning for wide tables at scale)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def normalize_events_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an events timestamp column to session-tz TIMESTAMP
    regardless of how the parquet writer encoded it. Two historical
    encodings in the driver testdata:

    - TIMESTAMP(NANOS): Spark's vectorized reader rejects it, so it is
      read as raw long nanos (legacy conf) and floored to microseconds
      with integral DIV — `/ 1000` would round-trip through double and
      lose precision above 2^53.
    - timestamp[us] with no timezone → Spark 4 reads TIMESTAMP_NTZ,
      which cannot feed cast(double) / unix_micros / percentile. The
      session tz is pinned UTC (session.py), so NTZ→TIMESTAMP is the
      identity on values and stays consistent with DuckDB's naive
      timestamps.

    DuckDB oracles use CAST(ts AS TIMESTAMP) (same µs truncation).
    """
    ts_type = dict(df.dtypes).get(col)
    if ts_type == "bigint":
        df = df.withColumn(
            col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts encoding varies across testdata generations — see
    normalize_events_ts for the cases."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    return normalize_events_ts(df)


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition a *narrow* input before a CPU-heavy
    projection so the work uses every core. Small parquet inputs (and
    broadcast-sized dims generally) arrive as 1-2 partitions; without
    this an explode/regex/hash pipeline runs single-threaded regardless
    of cluster size. No-op when the input is already wide enough — at
    100 TB the scan is naturally wide and this never triggers."""
    if df.isStreaming:
        # partition probing (and repartition heuristics) don't apply
        # to an unbounded plan — micro-batch sizing is the stream's
        # parallelism knob; pass through so every spread()-guarded
        # operator (text stats, classifier, ...) is streaming-safe
        return df
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    try:
        # partition count straight off the physical plan's RDD (no
        # job, no Python-side Row serializer the `df.rdd` wrapper
        # builds); private API, so fall back to the public path
        n = df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:
        n = df.rdd.getNumPartitions()
    if n >= target:
        return df
    return df.repartition(target)


def register_all(spark: SparkSession, sf_dir: str,
                 names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Register each table as a temp view (for the SQL surface) and
    return the DataFrames keyed by name."""
    out = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def write_sink(df: DataFrame, path: str, fmt: str = "parquet",
               mode: str = "overwrite", partition_by=None,
               **options) -> None:
    """Uniform sink: parquet (columnar, the default), csv (header +
    ISO timestamps), or json lines. Formats beyond parquet exist for
    interchange — pipelines should land parquet."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "csv":
        options = {"header": "true", **options}
    if fmt in ("csv", "json"):
        # default formats drop sub-millisecond precision — pin µs for
        # both TIMESTAMP and TIMESTAMP_NTZ columns (each has its own opt)
        options = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
                   "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
                   **options}
    w.format(fmt).options(**options).save(path)


def read_source(spark: SparkSession, path: str, fmt: str = "parquet",
                schema=None, **options) -> DataFrame:
    """Uniform source: schema-on-read for parquet; csv/json take an
    explicit schema (inference double-scans and guesses types — never
    at 100 TB)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        options = {"header": "true", **options}
    if fmt in ("csv", "json"):
        options = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
                   "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
                   **options}
    return r.format(fmt).options(**options).load(path)
