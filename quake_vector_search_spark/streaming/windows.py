"""Structured Streaming mirrors of the batch time-series operators
(E11 streaming surface).

The batch results (operators/timeseries.py) are the oracle: replaying
the same parquet rows through these streams with
``processAllAvailable()`` must produce identical aggregates once every
watermark closes. Tests (tests/test_streaming.py) assert exactly that.

At scale: these are the standard incremental shapes — state keyed by
(window, key) or session, bounded by the watermark so state size tracks
the late-data horizon, not the stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def read_events_stream(spark: SparkSession, events_dir: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """Replay an events parquet *directory* as a file stream (N files →
    N triggers — the local stand-in for a Kafka source). The writer's
    ts encoding has varied across testdata generations (raw NANOS read
    as long, timestamp[us] read as TIMESTAMP_NTZ), so sniff the real
    file schema from the parquet footers (one cheap batch read — no
    data scan) instead of hardcoding it, then normalize ts to session-tz
    TIMESTAMP exactly like the batch reader (catalog._load_events).
    A wrong hardcoded schema doesn't error here: it yields null event
    times, the watermark never advances, and the stream silently emits
    nothing."""
    from quake_vector_search_spark.sources.catalog import (
        normalize_events_ts,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    file_schema = spark.read.parquet(events_dir).schema
    raw = (spark.readStream.schema(file_schema)
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .parquet(events_dir))
    return normalize_events_ts(raw)


def tumbling_stream(events: DataFrame, width: str = "1 hour",
                    watermark: str = "2 hours",
                    key_col: str = "event_type") -> DataFrame:
    """Watermarked tumbling aggregate — append-mode compatible: a
    window emits once the watermark passes its end."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", width).alias("w"), F.col(key_col))
            .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    key_col, "n", "sum_value"))


def session_stream(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Watermarked session windows — the streaming-native form of the
    batch lag-based sessionization (session merging handled by Spark's
    session_window state)."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("w"),
                     F.col("user_id"))
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "sum_value"))


def run_to_completion(stream_df: DataFrame, query_name: str,
                      output_mode: str = "append") -> DataFrame:
    """Drive a bounded stream to completion into a memory sink and
    return the collected result as a batch DataFrame."""
    q = (stream_df.writeStream.outputMode(output_mode)
         .format("memory").queryName(query_name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")


def dedup_stream(rows: DataFrame, key_cols: list[str],
                 ts_col: str = "ts",
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup (E12's streaming form): first occurrence
    of each key within the watermark horizon passes; later duplicates
    drop. State = one entry per distinct key inside the horizon —
    `dropDuplicates` state is evicted as the watermark advances, so
    memory tracks the dedup window, not the stream length."""
    return (rows.withWatermark(ts_col, watermark)
            .dropDuplicates(key_cols))


def enrich_stream(events: DataFrame, dim: DataFrame,
                  stream_key: str = "user_id",
                  dim_key: str = "c_custkey") -> DataFrame:
    """Stream-static enrichment join: every event picks up its
    dimension attributes. Stateless (no watermark, no state store) —
    the static side is planned as a broadcast per micro-batch, so the
    stream never shuffles; at scale this is the standard dimension
    lookup in an ingest pipeline. Left join: events without a dimension
    row flow through with nulls rather than being dropped."""
    d = dim.withColumnRenamed(dim_key, stream_key)
    return events.join(F.broadcast(d), stream_key, "left")


def interval_join_stream(left: DataFrame, right: DataFrame, key: str,
                         left_ts: str, right_ts: str,
                         upper_s: int = 3600,
                         watermark: str = "2 hours") -> DataFrame:
    """Watermarked stream-stream interval join — the streaming form of
    operators/timeseries.py::interval_join. Both sides carry event-time
    watermarks so each side's state store evicts rows once they can no
    longer match (state size tracks watermark horizon × rate, not
    stream length)."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = ((F.col(f"l.{key}") == F.col(f"r.{key}"))
            & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
            & (F.col(f"r.{right_ts}")
               <= F.col(f"l.{left_ts}")
               + F.expr(f"INTERVAL {upper_s} SECONDS")))
    return l.join(r, cond, "inner").drop(F.col(f"r.{key}"))


def cms_stream(rows: DataFrame, item_col: str,
               depth: int = 4, width: int = 256) -> DataFrame:
    """Streaming count-min sketch: because the CMS is just a groupBy
    over (row, bucket) cells, it rides Structured Streaming's
    incremental aggregation unchanged — state is the ≤ depth×width
    live counters, independent of stream length or item cardinality
    (the property that makes the sketch THE streaming frequency
    answer). Same portable hashing as the batch operator
    (operators/sketch.py), so a drained stream's sketch equals the
    batch sketch over the same rows — pinned by test_streaming.py."""
    from quake_vector_search_spark.operators.sketch import _bucket_expr

    expanded = (rows
                .select(F.col(item_col).alias("item"),
                        F.explode(F.sequence(
                            F.lit(0), F.lit(depth - 1))).alias("j"))
                .withColumn("bucket",
                            _bucket_expr(F.col("j"), F.col("item"),
                                         width)))
    return expanded.groupBy("j", "bucket").count().withColumnRenamed(
        "count", "c")
