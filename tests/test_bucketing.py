"""Bucketed co-located join (the scale pattern for repeated fact-fact
joins): both sides bucketed on the join key at write time join with NO
Exchange — at 100 TB this converts the nightly lineitem⋈orders shuffle
into a local zipper per bucket."""

import io
from contextlib import redirect_stdout

import pytest

from quake_vector_search_spark.sources import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    o = load_table(spark, SF_SMOKE, "orders")
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS o_bkt")
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
     .sortBy("l_orderkey").saveAsTable("li_bkt"))
    (o.write.mode("overwrite").bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").saveAsTable("o_bkt"))
    yield "li_bkt", "o_bkt"
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS o_bkt")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    # disable broadcast so the join must pick a non-broadcast strategy —
    # on bucketed inputs that is a SortMergeJoin with zero exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.sql(f"""
            SELECT l.l_orderkey, l.l_extendedprice, o.o_totalprice
            FROM {li_t} l JOIN {o_t} o ON l.l_orderkey = o.o_orderkey""")
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain(True)
        physical = buf.getvalue().split("== Physical Plan ==", 1)[1]
        assert "Exchange" not in physical
        # and it still returns the right rows
        li = load_table(spark, SF_SMOKE, "lineitem")
        o = load_table(spark, SF_SMOKE, "orders")
        expected = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
