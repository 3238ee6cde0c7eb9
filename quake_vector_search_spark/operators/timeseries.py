"""Time-series / sessionization operators (E11), batch-first.

Batch implementations are the oracle for the streaming mirrors in
streaming/windows.py — same grouping logic, so a streaming run over the
same rows must produce the same aggregates once watermarks close.

Scale notes: tumbling/sliding windows shuffle on (window, key) — bounded
cardinality. Sessionization shuffles on user_id once for the lag window
and once for the session aggregate; AQE handles hot users (or salt the
lag stage for pathological skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(events: DataFrame, width: str = "1 hour",
                 ts_col: str = "ts", key_col: str = "event_type") -> DataFrame:
    """Tumbling-window aggregate via F.window (streaming-compatible
    shape). Emits (window_start, key, n, sum_value)."""
    return (events.groupBy(F.window(ts_col, width).alias("w"),
                           F.col(key_col))
            .agg(F.count("*").alias("n"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    key_col, "n", "sum_value"))


def sliding_agg(events: DataFrame, width: str = "1 hour",
                slide: str = "30 minutes", ts_col: str = "ts",
                key_col: str = "event_type") -> DataFrame:
    """Sliding-window aggregate — each event lands in width/slide
    overlapping windows."""
    return (events.groupBy(F.window(ts_col, width, slide).alias("w"),
                           F.col(key_col))
            .agg(F.count("*").alias("n"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    key_col, "n", "sum_value"))


def sessionize(events: DataFrame, gap_minutes: int = 30,
               ts_col: str = "ts", user_col: str = "user_id",
               order_tiebreak: str = "event_id") -> DataFrame:
    """Gap-based sessionization (batch): lag the timestamp per user,
    mark session boundaries where the gap exceeds ``gap_minutes``, and
    running-sum the markers into session ids. Emits one row per session:
    (user_id, session_id, session_start, session_end, n_events,
    sum_value). Streaming equivalent: session_window(ts, gap).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(),
                                             F.col(order_tiebreak).asc())
    gap_s = gap_minutes * 60
    marked = (events
              .withColumn("_prev", F.lag(ts_col).over(w))
              .withColumn(
                  "_new_session",
                  # cast-to-double keeps sub-second precision in the gap
                  # (unix_timestamp() truncates, which can disagree with
                  # a fractional-epoch oracle on boundary gaps)
                  (F.col("_prev").isNull()
                   | (F.col(ts_col).cast("double")
                      - F.col("_prev").cast("double")
                      > gap_s)).cast("long"))
              .withColumn("session_id",
                          F.sum("_new_session").over(
                              w.rowsBetween(Window.unboundedPreceding, 0))))
    return (marked.groupBy(user_col, "session_id")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count("*").alias("n_events"),
                 F.sum("value").alias("sum_value")))


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str,
              right_tiebreak: str) -> DataFrame:
    """As-of join: for every left row, attach the latest right row with
    ``right_ts <= left_ts`` for the same ``key`` (LEFT semantics — left
    rows with no prior right row keep nulls). Ties on ``right_ts`` break
    to the greatest ``right_tiebreak``.

    The reference engine has no temporal operators (SURVEY.md §2.2);
    this is part of the declared training-pipeline surface. Spark has
    no ASOF JOIN builtin, and a range-condition join would explode to a
    per-key cross product. Instead: tag both inputs, union them, and
    run ``last(<right payload>, ignorenulls=True)`` over a window
    ordered by (ts, is_right DESC, tiebreak) — right rows sort before
    left rows at equal ts, so ``<=`` matches. One shuffle on ``key``,
    linear work per key, no materialized candidate pairs: the plan
    survives arbitrarily many rows per key at cluster scale (sort is
    the only per-key cost; pathological single-key skew falls back to
    disk sort, same as any window).
    """
    rpay = [c for c in right.columns if c != key]
    r = (right.select(
            F.col(key),
            F.col(right_ts).alias("_ts"),
            F.lit(1).alias("_is_right"),
            F.col(right_tiebreak).cast("long").alias("_tb"),
            F.struct(*[F.col(c) for c in rpay]).alias("_rpay"))
         .withColumns({c: F.lit(None) for c in left.columns if c != key}))
    l = (left.select(
            F.col(key),
            F.col(left_ts).alias("_ts"),
            F.lit(0).alias("_is_right"),
            F.lit(None).cast("long").alias("_tb"),
            F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
            *[F.col(c) for c in left.columns if c != key]))
    w = (Window.partitionBy(key)
         .orderBy(F.col("_ts").asc(), F.col("_is_right").desc(),
                  F.col("_tb").asc_nulls_last())
         .rowsBetween(Window.unboundedPreceding, 0))
    matched = (l.unionByName(r.select(*l.columns))
               .withColumn("_match", F.last("_rpay", ignorenulls=True).over(w))
               .where(F.col("_is_right") == 0))
    out_left = [F.col(c) for c in left.columns if c != key]
    out_right = [F.col(f"_match.{c}").alias(f"asof_{c}") for c in rpay]
    return matched.select(F.col(key), *out_left, *out_right)


def resample_ffill(events: DataFrame, every_seconds: int = 900,
                   ts_col: str = "ts", key_col: str = "event_type",
                   val_col: str = "value") -> DataFrame:
    """Resample to a fixed grid with forward fill: bucket events to
    ``every_seconds``, build the complete (key × bucket) spine over the
    data's time range, and carry the last observed aggregate forward
    into empty buckets (n = 0 marks filled rows).

    All DataFrame-side: the spine is sequence+explode off a 1-row
    bounds aggregate crossed with the distinct keys (both tiny), the
    fill is one last-ignorenulls window per key. Scale: the spine's
    cardinality is (range/step)·|keys| — independent of event count —
    and the only big-data pass is the bucket aggregate's single
    shuffle.
    """
    bucket = F.to_timestamp(
        F.floor(F.unix_timestamp(ts_col) / every_seconds) * every_seconds)
    agg = (events.groupBy(F.col(key_col), bucket.alias("bucket"))
           .agg(F.sum(val_col).alias("_s"), F.count("*").alias("n")))
    bounds = (events.agg(
        F.min(F.unix_timestamp(ts_col)).alias("_lo"),
        F.max(F.unix_timestamp(ts_col)).alias("_hi")))
    spine = (bounds.select(F.explode(F.sequence(
                F.floor(F.col("_lo") / every_seconds).cast("long"),
                F.floor(F.col("_hi") / every_seconds).cast("long")))
             .alias("_b"))
             .select(F.to_timestamp(F.col("_b") * every_seconds)
                     .alias("bucket"))
             .crossJoin(events.select(key_col).distinct()))
    joined = spine.join(agg, ["bucket", key_col], "left")
    w = (Window.partitionBy(key_col).orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (joined
            .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
            .withColumn("sum_value_ffill",
                        F.last("_s", ignorenulls=True).over(w))
            .select(key_col, "bucket", "n", "sum_value_ffill"))


def interval_join(left: DataFrame, right: DataFrame, key: str,
                  left_ts: str, right_ts: str,
                  lower_s: int = 0, upper_s: int = 3600) -> DataFrame:
    """Event-time interval join: pair left and right rows with the same
    ``key`` where ``right_ts ∈ [left_ts + lower_s, left_ts + upper_s]``
    (attribution windows, feature joins). Inner join.

    Plans as an equi-join on ``key`` with the time window as a residual
    predicate — one shuffle per side, never a cross product. Pair
    volume per key is bounded by the window width; this same shape runs
    as a watermarked stream-stream join (streaming/windows.py::
    interval_join_stream)."""
    l, r = left.alias("l"), right.alias("r")
    lo = F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {lower_s} SECONDS")
    hi = F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper_s} SECONDS")
    cond = ((F.col(f"l.{key}") == F.col(f"r.{key}"))
            & (F.col(f"r.{right_ts}") >= lo)
            & (F.col(f"r.{right_ts}") <= hi))
    return l.join(r, cond, "inner")


def m4_downsample(events: DataFrame, width: str = "1 hour",
                  ts_col: str = "ts", val_col: str = "value",
                  key_col: str = "event_type",
                  id_col: str = "event_id") -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB'14): per
    (series, time bucket) keep exactly the four value-defining points
    — min, max, first, last — the lossless reduction for pixel-perfect
    line rendering of arbitrarily long series. Purely relational: one
    map-side-combined groupBy per bucket; first/last resolve by
    (ts, id) so ties are deterministic. At 100 TB this turns a
    billion-point series into 4·buckets rows with one shuffle."""
    bucket = F.window(F.col(ts_col), width).start.alias("bucket_start")
    tie = F.struct(F.col(ts_col), F.col(id_col), F.col(val_col))
    return (events.groupBy(F.col(key_col), bucket)
            .agg(F.count("*").cast("long").alias("n_points"),
                 F.min(val_col).alias("v_min"),
                 F.max(val_col).alias("v_max"),
                 F.min(tie).getField(val_col).alias("v_first"),
                 F.max(tie).getField(val_col).alias("v_last")))
