from quake_vector_search_spark.sources.catalog import (  # noqa: F401
    TABLES,
    load_table,
    normalize_events_ts,
    read_source,
    register_all,
    write_sink,
)
