"""Every registered query runs at sf0.001 and produces a stable schema.

The full DuckDB differential check runs via tools/check_oracle.py at
sf0.01 (mirrored by the driver); here we gate on fast smoke + schema
determinism so pytest stays quick.
"""

import pytest

from quake_vector_search_spark.queries import REGISTRY, load_all_query_modules

load_all_query_modules()


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    rows = df.limit(5).collect()
    assert df.columns, f"{name}: no columns"
    assert rows is not None


def test_oracle_sql_well_formed():
    import duckdb
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('/root/testdata/sf0.001/{t}.parquet')")
    for name, q in REGISTRY.items():
        if q.sql is not None:
            con.sql(q.sql)  # raises on malformed SQL
