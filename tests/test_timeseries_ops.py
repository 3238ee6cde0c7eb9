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
