"""Custom stateful streaming operator via applyInPandasWithState —
the extension seam for stateful logic Spark's built-in windows can't
express (reference analogue: the per-partition ``hits`` counters the
demo loop accumulates across queries, ipynb c1:155 / c2:57-84).

``user_running_totals`` keeps per-user lifetime aggregates (count, sum,
max, last-seen timestamp) in the state store and emits the refreshed
totals every micro-batch the user appears in. State is keyed by user —
at scale the store shards with the shuffle partitioning, and a real
deployment would add a timeout policy (GroupStateTimeout) to retire
idle keys; lifetime totals here deliberately never expire.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("user_id long, n_events long, sum_value double, "
              "max_value double, last_ts timestamp")
STATE_SCHEMA = "n long, s double, m double, last_us long"


def user_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max, last event time) over an
    events stream. Each micro-batch emits one refreshed row per active
    user; the *final* emission per user equals the batch groupBy
    aggregate — the oracle tests/test_streaming.py asserts."""

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        n, s, m, last_us = (state.get if state.exists
                            else (0, 0.0, float("-inf"), 0))
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            s += float(pdf["value"].sum())
            m = max(m, float(pdf["value"].max()))
            last_us = max(last_us,
                          int(pd.DatetimeIndex(pdf["ts"]).asi8.max() // 1000))
        state.update((n, s, m, last_us))
        yield pd.DataFrame({
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [s],
            "max_value": [m],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        })

    return (events.groupBy("user_id")
            .applyInPandasWithState(update, OUT_SCHEMA, STATE_SCHEMA,
                                    "update", GroupStateTimeout.NoTimeout))
