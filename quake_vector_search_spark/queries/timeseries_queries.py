"""Time-series / sessionization queries (E11) with DuckDB oracles.

The events table's parquet TIMESTAMP(NANOS) is floored to µs on the
Spark side (sources/catalog.py); oracles apply CAST(ts AS TIMESTAMP)
for the same truncation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from quake_vector_search_spark.operators import timeseries as TS
from quake_vector_search_spark.queries import register
from quake_vector_search_spark.sources import load_table


@register("ts_tumbling_hourly", sql="""
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
""")
def ts_tumbling_hourly(spark, sf_dir):
    """Hourly tumbling windows per event type (E11) — the same
    `F.window` shape Structured Streaming uses."""
    ev = load_table(spark, sf_dir, "events")
    out = TS.tumbling_agg(ev, "1 hour")
    return out.withColumn("sum_value", F.round("sum_value", 4))


@register("ts_sliding_1h_30m", sql="""
WITH e AS (
  SELECT CAST(ts AS TIMESTAMP) AS tsu, event_type, value FROM events
), windows AS (
  SELECT to_timestamp(floor(epoch(tsu) / 1800) * 1800 - k * 1800)
           AS window_start,
         event_type, value
  FROM e, (SELECT unnest([0, 1]) AS k)
)
SELECT window_start AT TIME ZONE 'UTC' AS window_start, event_type,
       COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
FROM windows
GROUP BY 1, 2
""")
def ts_sliding_1h_30m(spark, sf_dir):
    """Sliding windows 1h wide / 30m slide: every event in exactly two
    windows. Oracle derives both window starts arithmetically."""
    ev = load_table(spark, sf_dir, "events")
    out = TS.sliding_agg(ev, "1 hour", "30 minutes")
    return out.withColumn("sum_value", F.round("sum_value", 4))


@register("ts_sessionization", sql="""
WITH ordered AS (
  SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS tsu,
         lag(CAST(ts AS TIMESTAMP)) OVER
           (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
           AS prev_ts
  FROM events
), marked AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR epoch(tsu) - epoch(prev_ts) > 1800 THEN 1
             ELSE 0 END AS new_session
  FROM ordered
), numbered AS (
  SELECT *, SUM(new_session) OVER
    (PARTITION BY user_id ORDER BY tsu, event_id
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       MIN(tsu) AS session_start, MAX(tsu) AS session_end,
       COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
FROM numbered
GROUP BY user_id, session_id
""")
def ts_sessionization(spark, sf_dir):
    """30-minute-gap sessionization per user via lag + running sum —
    the batch mirror of session_window(ts, '30 minutes')."""
    ev = load_table(spark, sf_dir, "events")
    out = TS.sessionize(ev, gap_minutes=30)
    return out.withColumn("sum_value", F.round("sum_value", 4))


@register("ts_trailing_1h_range", sql="""
SELECT event_id,
       event_type,
       CAST(n_1h AS BIGINT) AS n_1h,
       ROUND(sum_1h, 4) AS sum_1h
FROM (
  SELECT event_id, event_type,
         COUNT(*) OVER w AS n_1h,
         SUM(value) OVER w AS sum_1h
  FROM (SELECT event_id, event_type, value,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es
        FROM events)
  WINDOW w AS (PARTITION BY event_type ORDER BY es
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
)
""")
def ts_trailing_1h_range(spark, sf_dir):
    """Trailing-1-hour RANGE frame per event (E5/E11): value-based
    frame bounds over epoch seconds — every event sees the count/sum of
    the preceding hour of its type. One shuffle on the partition key;
    the frame is computed in a single sorted pass per partition."""
    from pyspark.sql import Window as W

    from quake_vector_search_spark.sources import load_table
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts")
    w = (W.partitionBy("event_type").orderBy(es.alias("es"))
         .rangeBetween(-3600, 0))
    return (ev.select("event_id", "event_type",
                      F.count("*").over(w).alias("n_1h"),
                      F.round(F.sum("value").over(w), 4).alias("sum_1h")))


@register("ts_asof_join", sql="""
WITH p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS tsu, value
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS tsu, value
  FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, p.tsu AS purchase_ts,
       c.event_id AS asof_event_id,
       ROUND(epoch(c.tsu), 6) AS asof_epoch_s,
       ROUND(c.value, 6) AS asof_value
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.tsu >= c.tsu
""")
def ts_asof_join(spark, sf_dir):
    """As-of join (E11 / training-pipeline surface): each purchase event
    picks up the user's most recent click at-or-before it. Spark lacks
    ASOF JOIN; operators/timeseries.py::asof_join does it with one
    shuffle (union + last-ignorenulls window) instead of a range join.
    Oracle is DuckDB's native ASOF LEFT JOIN."""
    ev = load_table(spark, sf_dir, "events")
    p = (ev.where(F.col("event_type") == "purchase")
         .select("event_id", "user_id", F.col("ts").alias("purchase_ts")))
    c = (ev.where(F.col("event_type") == "click")
         .select("event_id", "user_id", F.col("ts").alias("click_ts"),
                 "value"))
    out = TS.asof_join(p, c, key="user_id",
                       left_ts="purchase_ts", right_ts="click_ts",
                       right_tiebreak="event_id")
    # nullable timestamp → epoch-seconds double so null rows stay
    # hash-stable in the driver's order-insensitive comparator
    return out.select(
        "event_id", "user_id", "purchase_ts",
        F.col("asof_event_id").alias("asof_event_id"),
        F.round(F.unix_micros("asof_click_ts") / 1_000_000.0, 6)
         .alias("asof_epoch_s"),
        F.round("asof_value", 6).alias("asof_value"))


@register("ts_gapfill_ffill", sql="""
WITH e AS (
  SELECT event_type, CAST(ts AS TIMESTAMP) AS tsu, value FROM events
), b AS (
  SELECT event_type,
         to_timestamp(floor(epoch(tsu) / 900) * 900) AS bucket,
         SUM(value) AS s, COUNT(*) AS n
  FROM e GROUP BY 1, 2
), bounds AS (
  SELECT floor(epoch(MIN(tsu)) / 900) AS lo,
         floor(epoch(MAX(tsu)) / 900) AS hi
  FROM e
), spine AS (
  SELECT to_timestamp(unnest(generate_series(
           CAST(lo AS BIGINT), CAST(hi AS BIGINT))) * 900) AS bucket
  FROM bounds
), grid AS (
  SELECT et.event_type, spine.bucket
  FROM spine, (SELECT DISTINCT event_type FROM e) et
)
SELECT g.event_type,
       g.bucket AT TIME ZONE 'UTC' AS bucket,
       CAST(COALESCE(b.n, 0) AS BIGINT) AS n,
       ROUND(last_value(b.s IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
         AS sum_value_ffill
FROM grid g LEFT JOIN b
  ON g.event_type = b.event_type AND g.bucket = b.bucket
""")
def ts_gapfill_ffill(spark, sf_dir):
    """Gap-fill resample (E11 / training-pipeline): 15-minute grid per
    event type over the data's full range, empty buckets forward-filled
    from the last observed value — operators/timeseries.py::
    resample_ffill (spine = sequence off a bounds aggregate, fill =
    last-ignorenulls window)."""
    ev = load_table(spark, sf_dir, "events")
    out = TS.resample_ffill(ev, every_seconds=900)
    return out.withColumn("sum_value_ffill",
                          F.round("sum_value_ffill", 4))


@register("ts_interval_join", sql="""
WITH p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS tsu FROM events
  WHERE event_type = 'purchase'
), c AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS tsu FROM events
  WHERE event_type = 'click'
)
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
       ROUND(epoch(p.tsu) - epoch(c.tsu), 6) AS gap_s
FROM c JOIN p
  ON p.user_id = c.user_id
 AND p.tsu >= c.tsu
 AND p.tsu <= c.tsu + INTERVAL 1 HOUR
""")
def ts_interval_join(spark, sf_dir):
    """Attribution interval join (E11): every (click → purchase within
    1h, same user) pair. Equi-join on user_id with the time window as a
    residual — one shuffle per side, pair volume bounded by the window;
    same shape runs streaming as the watermarked stream-stream join."""
    ev = load_table(spark, sf_dir, "events")
    c = (ev.where(F.col("event_type") == "click")
         .select(F.col("event_id").alias("click_id"), "user_id",
                 F.col("ts").alias("click_ts")))
    p = (ev.where(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purchase_id"),
                 F.col("user_id").alias("p_user"),
                 F.col("ts").alias("purchase_ts")))
    cond = ((F.col("user_id") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts")
               <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")))
    out = c.join(p, cond, "inner")
    return out.select(
        "purchase_id", "click_id", "user_id",
        F.round((F.unix_micros("purchase_ts")
                 - F.unix_micros("click_ts")) / 1_000_000.0, 6)
         .alias("gap_s"))


@register("ts_session_window_native", sql="""
WITH ordered AS (
  SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS tsu,
         lag(CAST(ts AS TIMESTAMP)) OVER
           (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
           AS prev_ts
  FROM events
), marked AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR epoch(tsu) - epoch(prev_ts) > 1800 THEN 1
             ELSE 0 END AS new_session
  FROM ordered
), numbered AS (
  SELECT *, SUM(new_session) OVER
    (PARTITION BY user_id ORDER BY tsu, event_id
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
)
SELECT user_id,
       MIN(tsu) AS session_start,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM numbered
GROUP BY user_id, sid
""")
def ts_session_window_native(spark, sf_dir):
    """Native F.session_window in BATCH mode (E11): Spark's built-in
    gap-merging sessionizer must produce exactly the sessions the
    lag-based formulation (and the DuckDB oracle) derives — same 30-min
    gap, keyed by session start. This is the identical expression the
    streaming path runs with a watermark."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy(F.session_window("ts", "30 minutes").alias("w"),
                       "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    "n_events", "sum_value"))


@register("ts_multi_rollup", sql="""
WITH e AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS g_hour,
         date_trunc('day', CAST(ts AS TIMESTAMP)) AS g_day,
         date_trunc('month', CAST(ts AS TIMESTAMP)) AS g_month,
         value
  FROM events
)
SELECT CASE WHEN g_hour IS NOT NULL THEN 'hour'
            WHEN g_day IS NOT NULL THEN 'day'
            ELSE 'month' END AS granularity,
       COALESCE(g_hour, g_day, g_month) AS bucket_start,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 4) AS sum_value
FROM e
GROUP BY GROUPING SETS ((g_hour), (g_day), (g_month))
""")
def ts_multi_rollup(spark, sf_dir):
    """Multi-resolution time rollup (hypertable continuous-aggregate
    shape): hour, day, AND month buckets from ONE scan of the fact
    table via GROUPING SETS — Spark's Expand operator replicates each
    row once per granularity before the aggregate, so at 100 TB this
    replaces three full scans with one scan + one 3x-expanded shuffle
    whose partial aggregation collapses map-side. Events ts is
    non-null, so the NULL-group sentinel can't collide with data."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.date_trunc("hour", "ts").alias("g_hour"),
        F.date_trunc("day", "ts").alias("g_day"),
        F.date_trunc("month", "ts").alias("g_month"),
        "value")
    e.createOrReplaceTempView("events_rollup_src")
    return spark.sql("""
        SELECT CASE WHEN g_hour IS NOT NULL THEN 'hour'
                    WHEN g_day IS NOT NULL THEN 'day'
                    ELSE 'month' END AS granularity,
               COALESCE(g_hour, g_day, g_month) AS bucket_start,
               COUNT(*) AS n,
               ROUND(SUM(value), 4) AS sum_value
        FROM events_rollup_src
        GROUP BY GROUPING SETS ((g_hour), (g_day), (g_month))
    """)


@register("ts_funnel", sql="""
WITH s AS (
  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t1
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), v AS (
  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t2
  FROM events e JOIN s ON s.user_id = e.user_id
  WHERE e.event_type = 'view' AND CAST(e.ts AS TIMESTAMP) > s.t1
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t3
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > v.t2
  GROUP BY e.user_id
)
SELECT stage, n_users FROM (
  SELECT 'stage1_signup' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users, 1 AS o FROM s
  UNION ALL
  SELECT 'stage2_view', CAST(COUNT(*) AS BIGINT), 2 FROM v
  UNION ALL
  SELECT 'stage3_purchase', CAST(COUNT(*) AS BIGINT), 3 FROM p
) ORDER BY o
""")
def ts_funnel(spark, sf_dir):
    """Ordered funnel: signup → later view → later purchase, counting
    users surviving each stage. Sequential conditional joins, each an
    equi-join on user_id with a time residual — per-stage state is one
    timestamp per user (the min), so each stage is one keyed shuffle
    carrying one row per user however many events they have."""
    ev = load_table(spark, sf_dir, "events")
    s = (ev.where(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("ts").alias("t1")))
    v = (ev.where(F.col("event_type") == "view")
         .join(s, "user_id").where(F.col("ts") > F.col("t1"))
         .groupBy("user_id").agg(F.min("ts").alias("t2")))
    p = (ev.where(F.col("event_type") == "purchase")
         .join(v, "user_id").where(F.col("ts") > F.col("t2"))
         .groupBy("user_id").agg(F.min("ts").alias("t3")))
    rows = [
        s.agg(F.count("*").alias("n_users"))
         .select(F.lit("stage1_signup").alias("stage"), "n_users"),
        v.agg(F.count("*").alias("n_users"))
         .select(F.lit("stage2_view").alias("stage"), "n_users"),
        p.agg(F.count("*").alias("n_users"))
         .select(F.lit("stage3_purchase").alias("stage"), "n_users"),
    ]
    out = rows[0].unionAll(rows[1]).unionAll(rows[2])
    return out


@register("ts_cohort_retention", sql="""
WITH first_seen AS (
  SELECT user_id,
         date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id,
         CAST(datediff('week', f.cohort_week,
              date_trunc('week', CAST(e.ts AS TIMESTAMP))) AS INT)
           AS week_offset,
         f.cohort_week
  FROM events e JOIN first_seen f ON f.user_id = e.user_id
)
SELECT cohort_week, week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_active
FROM activity
GROUP BY cohort_week, week_offset
""")
def ts_cohort_retention(spark, sf_dir):
    """Cohort retention triangle: users grouped by first-seen week,
    activity counted per week offset. Two keyed shuffles (first-seen
    per user, then the cohort rollup whose key space is
    weeks × offsets — tiny); the events → first_seen join is on
    user_id, broadcastable when the user dimension is small and
    AQE-planned otherwise."""
    ev = load_table(spark, sf_dir, "events")
    first = (ev.groupBy("user_id")
             .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week")))
    act = (ev.join(first, "user_id")
           .select("user_id", "cohort_week",
                   ((F.unix_timestamp(F.date_trunc("week", "ts"))
                     - F.unix_timestamp("cohort_week"))
                    / (7 * 86400)).cast("int").alias("week_offset"))
           .distinct())
    return (act.groupBy("cohort_week", "week_offset")
            .agg(F.count("*").alias("n_active")))


@register("ts_anomaly_hours", sql="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), scored AS (
  SELECT event_type, h, n,
         AVG(n) OVER w AS mu,
         STDDEV_SAMP(n) OVER w AS sigma
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, h, n,
       ROUND(mu, 6) AS trailing_mean,
       ROUND((n - mu) / sigma, 6) AS zscore
FROM scored
WHERE sigma > 0 AND abs((n - mu) / sigma) >= 2
""")
def ts_anomaly_hours(spark, sf_dir):
    """Volume anomaly detection (pipeline monitoring): hourly counts
    per event type z-scored against the trailing 24-hour window
    (excluding the current hour). The hourly rollup collapses the
    fact table to types × hours rows BEFORE the window, so the
    window state is trivial at any scale; flagged hours are
    |z| ≥ 2 with a positive sample stddev."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("h"))
              .agg(F.count("*").alias("n")))
    w = (W.partitionBy("event_type").orderBy(F.col("h").asc())
         .rowsBetween(-24, -1))
    scored = (hourly
              .withColumn("mu", F.avg("n").over(w))
              .withColumn("sigma", F.stddev_samp(F.col("n").cast("double"))
                          .over(w)))
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return (scored.where((F.col("sigma") > 0) & (F.abs(z) >= 2))
            .select("event_type", "h", "n",
                    F.round("mu", 6).alias("trailing_mean"),
                    F.round(z, 6).alias("zscore")))


@register("ts_scd2_intervals", sql="""
SELECT user_id, CAST(ts AS TIMESTAMP) AS valid_from,
       ROUND(epoch(LEAD(CAST(ts AS TIMESTAMP)) OVER
         (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)), 6)
         AS valid_to_epoch_s,
       event_type AS state,
       ROUND(value, 4) AS state_value
FROM events
WHERE event_type IN ('signup', 'purchase')
""")
def ts_scd2_intervals(spark, sf_dir):
    """SCD2 (slowly-changing-dimension) interval construction: each
    state-changing event opens a validity interval closed by the
    user's next one (open-ended tail = current state). One window
    shuffle on user_id; the classic warehouse versioning shape.
    valid_to is emitted as a nullable epoch-seconds DOUBLE (not a raw
    timestamp): nullable timestamps hash as pandas NaT in the driver
    gate, doubles keep NULL as NULL on both engines."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = (W.partitionBy("user_id")
         .orderBy(F.col("ts").asc(), F.col("event_id").asc()))
    return (ev.where(F.col("event_type").isin("signup", "purchase"))
            .select("user_id",
                    F.col("ts").alias("valid_from"),
                    F.round(F.lead("ts").over(w).cast("double"), 6)
                     .alias("valid_to_epoch_s"),
                    F.col("event_type").alias("state"),
                    F.round("value", 4).alias("state_value")))


@register("ts_top_paths", sql="""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id
  FROM events
), paths AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY ts ASC, event_id ASC)
           FILTER (rn <= 3) AS path3
  FROM (
    SELECT user_id, event_type, ts, event_id,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts ASC, event_id ASC) AS rn
    FROM ordered
  ) GROUP BY user_id
)
SELECT path3, CAST(COUNT(*) AS BIGINT) AS n_users
FROM paths WHERE path3 IS NOT NULL
GROUP BY path3
ORDER BY n_users DESC, path3 ASC
LIMIT 20
""")
def ts_top_paths(spark, sf_dir):
    """Top user journey prefixes: each user's first three events (full
    (ts, event_id) tie-break) joined into a path string, ranked by
    frequency. Ordered aggregation done scalably: row_number window
    prunes to ≤3 rows per user BEFORE the collect, so the per-user
    state is constant and the path build is a tiny sort_array over
    structs, not an unbounded collect_list."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = (W.partitionBy("user_id")
         .orderBy(F.col("ts").asc(), F.col("event_id").asc()))
    first3 = (ev.select("user_id", "event_type", "ts", "event_id",
                        F.row_number().over(w).alias("rn"))
              .where(F.col("rn") <= 3))
    paths = (first3.groupBy("user_id")
             .agg(F.array_join(
                 F.transform(
                     F.sort_array(F.collect_list(
                         F.struct("rn", "event_type"))),
                     lambda s: s["event_type"]), ">").alias("path3")))
    return (paths.groupBy("path3")
            .agg(F.count("*").alias("n_users"))
            .orderBy(F.desc("n_users"), F.asc("path3"))
            .limit(20))


@register("ts_scd2_merge", sql="""
SELECT user_id, CAST(ts AS TIMESTAMP) AS valid_from,
       ROUND(epoch(LEAD(CAST(ts AS TIMESTAMP)) OVER
         (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)), 6)
         AS valid_to_epoch_s,
       event_type AS state,
       event_id
FROM events
WHERE event_type IN ('signup', 'purchase')
""")
def ts_scd2_merge(spark, sf_dir):
    """Incremental SCD2 merge (operators/scd.py): history is built
    from the FIRST half of the change stream, then the second half is
    applied as a CDC batch — closing only touched keys' open
    intervals, never re-shuffling history. The oracle is simply the
    full-range SCD2 build: the merge invariant
    apply(build(old), new) == build(old ∪ new) is the correctness
    statement itself."""
    from quake_vector_search_spark.operators.scd import (
        scd2_apply,
        scd2_build,
    )

    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("event_type").isin("signup", "purchase"))
          .select("user_id", "ts",
                  F.col("event_type").alias("state"), "event_id"))
    mid = ev.agg(F.expr("percentile(cast(ts as double), 0.5)")
                 .alias("m")).collect()[0]["m"]
    old = ev.where(F.col("ts").cast("double") <= mid)
    new = ev.where(F.col("ts").cast("double") > mid)
    dim = scd2_build(old, "user_id", "ts",
                     order_cols=("event_id",), state_cols=("state",))
    merged = scd2_apply(dim, new, "user_id", "ts",
                        order_cols=("event_id",), state_cols=("state",))
    return merged
