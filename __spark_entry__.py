"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``quake_vector_search_spark/queries/`` — this
module only exposes the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from quake_vector_search_spark.queries import (  # noqa: E402
    REGISTRY,
    load_all_query_modules,
    ordered_registry,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact brute-force kNN (read → broadcast queries →
    per-partition BLAS distance kernel → local top-k → global windowed
    top-k) on sf0.001. Proves the whole pipeline end-to-end."""
    load_all_query_modules()
    return REGISTRY["knn_brute_l2"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so the round-13 rotation window (WINDOW_R13: the four
    new r13 rows — auto-maintenance cadence, persisted-cadence
    restart, and the global + per-cell aniso×OPQ fullprobes — the
    rebuilt distributed-LOPQ roundtrip, and the 45 stalest
    driver-verified rows — the r6 straggler + 44 r7-era rows)
    occupies the first 50 entries; the
    earlier windows' remainders follow in pinned order (see
    quake_vector_search_spark/queries/__init__.py and
    tests/test_registry_window.py)."""
    return {name: q.fn for name, q in ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {name: q.sql for name, q in ordered_registry().items()
            if q.sql is not None}
