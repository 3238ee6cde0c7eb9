"""Registry of oracle-checked queries.

Each entry pairs a Spark implementation ``fn(spark, sf_dir) ->
DataFrame`` with (where SQL-expressible) an equivalent DuckDB oracle SQL
string over the same parquet tables. The driver compares row-count +
schema + order-insensitive value hash — so every implementation must be
deterministic: explicit tie-breaks on ranked output, floats rounded
(ROUND_DIGITS) identically on both sides, float64 accumulation.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

ROUND_DIGITS = 6


@dataclass
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → driver does rows-only check


REGISTRY: dict[str, Query] = {}


def register(name: str, sql: str | None = None):
    """Decorator: register a query implementation under ``name``."""
    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(fn, sql)
        return fn
    return deco


def load_all_query_modules() -> None:
    """Import every query-defining module so REGISTRY is populated."""
    from quake_vector_search_spark.queries import (  # noqa: F401
        dedup_queries,
        multimodal_queries,
        relational_queries,
        text_queries,
        tpch_queries,
        timeseries_queries,
        vector_queries,
    )
