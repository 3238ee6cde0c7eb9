"""asof_join edge cases: equal timestamps (<= must match), right-ts
ties (greatest tiebreak wins), left rows with no prior right row
(nulls), and key isolation."""

import datetime as dt

from pyspark.sql import Row

from quake_vector_search_spark.operators.timeseries import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame([
        Row(k=1, lid=10, lts=_ts("2024-01-01T10:00:00")),   # after r2
        Row(k=1, lid=11, lts=_ts("2024-01-01T09:00:00")),   # == r1 ts
        Row(k=1, lid=12, lts=_ts("2024-01-01T08:00:00")),   # before all
        Row(k=2, lid=20, lts=_ts("2024-01-01T12:00:00")),   # other key
    ])
    right = spark.createDataFrame([
        Row(k=1, rid=100, rts=_ts("2024-01-01T09:00:00"), v=1.0),
        Row(k=1, rid=101, rts=_ts("2024-01-01T09:30:00"), v=2.0),
        Row(k=1, rid=102, rts=_ts("2024-01-01T09:30:00"), v=3.0),  # tie
        Row(k=2, rid=200, rts=_ts("2024-01-01T11:00:00"), v=4.0),
    ])
    out = asof_join(left, right, key="k", left_ts="lts", right_ts="rts",
                    right_tiebreak="rid")
    got = {r.lid: (r.asof_rid, r.asof_v) for r in out.collect()}
    assert got[10] == (102, 3.0)       # tie at 09:30 → greatest rid
    assert got[11] == (100, 1.0)       # equal ts matches (<=)
    assert got[12] == (None, None)     # nothing at-or-before
    assert got[20] == (200, 4.0)       # keys don't leak
    assert out.count() == 4            # left semantics: all left rows


def test_asof_join_empty_right(spark):
    left = spark.createDataFrame([Row(k=1, lid=1,
                                      lts=_ts("2024-01-01T00:00:00"))])
    right = spark.createDataFrame(
        [Row(k=1, rid=1, rts=_ts("2024-01-01T00:00:00"), v=0.0)]
    ).where("rid < 0")
    out = asof_join(left, right, key="k", left_ts="lts", right_ts="rts",
                    right_tiebreak="rid")
    rows = out.collect()
    assert len(rows) == 1 and rows[0].asof_rid is None


def test_scd2_apply_matches_full_rebuild(spark):
    """Merge invariant: apply(build(old), new) == build(old ∪ new);
    untouched keys pass through unchanged."""
    from pyspark.sql import functions as F

    from quake_vector_search_spark.operators.scd import (
        scd2_apply,
        scd2_build,
    )

    rows = [  # (user, ts_sec, state, event_id)
        (1, 10.0, "a", 1), (1, 20.0, "b", 2), (1, 30.0, "c", 3),
        (2, 15.0, "a", 4),                     # untouched by new batch
        (3, 25.0, "a", 5),                     # open, then closed by new
    ]
    new_rows = [(1, 40.0, "d", 6), (3, 35.0, "b", 7), (4, 50.0, "a", 8)]

    def mk(rs):
        df = spark.createDataFrame(rs, ["user_id", "sec", "state",
                                        "event_id"])
        return df.select("user_id",
                         F.timestamp_seconds("sec").alias("ts"),
                         "state", "event_id")

    old, new = mk(rows), mk(new_rows)
    merged = scd2_apply(
        scd2_build(old, "user_id", "ts", ("event_id",), ("state",)),
        new, "user_id", "ts", ("event_id",), ("state",))
    full = scd2_build(old.unionByName(new), "user_id", "ts",
                      ("event_id",), ("state",))
    canon = lambda df: sorted(map(tuple, df.collect()))
    assert canon(merged) == canon(full)
    got = {(r["user_id"], r["event_id"]): r["valid_to_epoch_s"]
           for r in merged.collect()}
    assert got[(2, 4)] is None          # untouched key stays open
    assert got[(3, 5)] == 35.0          # closed by the new batch
    assert got[(4, 8)] is None          # brand-new key opens
