"""E1 sink path: query results round-trip through a Parquet write."""

import shutil

from quake_vector_search_spark.queries import REGISTRY, load_all_query_modules
from tests.conftest import SF_SMOKE

load_all_query_modules()


def test_parquet_sink_roundtrip(spark, tmp_path):
    out_dir = str(tmp_path / "q1_out")
    df = REGISTRY["q1_pricing_summary"].fn(spark, SF_SMOKE)
    df.write.mode("overwrite").parquet(out_dir)
    back = spark.read.parquet(out_dir)
    # nullability flags legitimately widen through a parquet roundtrip;
    # names + types must survive exactly
    assert [(f.name, f.dataType) for f in back.schema.fields] \
        == [(f.name, f.dataType) for f in df.schema.fields]
    key = lambda r: (r["l_returnflag"], r["l_linestatus"])
    assert sorted(back.collect(), key=key) == sorted(df.collect(), key=key)
    shutil.rmtree(out_dir, ignore_errors=True)


def test_partitioned_sink_prunes_on_read(spark, tmp_path):
    out_dir = str(tmp_path / "part_out")
    df = REGISTRY["q_filter_project"].fn(spark, SF_SMOKE)
    df.write.mode("overwrite").partitionBy("l_returnflag").parquet(out_dir)
    back = spark.read.parquet(out_dir).where("l_returnflag = 'A'")
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        back.explain(True)
    assert "PartitionFilters" in buf.getvalue()
    assert back.count() == df.where("l_returnflag = 'A'").count()
    shutil.rmtree(out_dir, ignore_errors=True)


def test_csv_roundtrip_preserves_values(spark, tmp_path):
    """CSV interchange: write orders with pinned timestamp format, read
    back with explicit schema → identical rows (no inference)."""
    from quake_vector_search_spark.sources import load_table
    from quake_vector_search_spark.sources.catalog import (
        read_source,
        write_sink,
    )
    from tests.conftest import SF_SMOKE

    o = load_table(spark, SF_SMOKE, "orders")
    p = str(tmp_path / "orders_csv")
    write_sink(o, p, fmt="csv")
    back = read_source(spark, p, fmt="csv", schema=o.schema)
    a = sorted(map(tuple, o.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_json_roundtrip_preserves_values(spark, tmp_path):
    """JSON-lines interchange for the events table (string props stay
    strings, not re-parsed)."""
    from quake_vector_search_spark.sources import load_table
    from quake_vector_search_spark.sources.catalog import (
        read_source,
        write_sink,
    )
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    p = str(tmp_path / "events_json")
    write_sink(ev, p, fmt="json")
    back = read_source(spark, p, fmt="json", schema=ev.schema)
    a = sorted(map(tuple, ev.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_orc_roundtrip_preserves_values(spark, tmp_path):
    """ORC sink/source parity: same rows and schema back, timestamps
    intact (ORC stores native timestamps — no format pinning needed,
    unlike csv/json)."""
    from quake_vector_search_spark.sources.catalog import (
        read_source,
        write_sink,
    )
    from quake_vector_search_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events").limit(200)
    path = str(tmp_path / "events_orc")
    write_sink(ev, path, fmt="orc")
    back = read_source(spark, path, fmt="orc")
    assert back.schema == ev.schema
    a = sorted(map(tuple, ev.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
