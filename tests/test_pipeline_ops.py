"""Invariants for the training-pipeline QA operators: profiling,
gap-fill resample, balanced downsampling."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from quake_vector_search_spark.operators.profiling import profile
from quake_vector_search_spark.operators.sampling import (
    balanced_downsample,
)
from quake_vector_search_spark.operators.timeseries import resample_ffill


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame([
        Row(a=1, b="x"), Row(a=1, b=None), Row(a=2, b="y"),
    ])
    got = {r.col_name: r for r in profile(df).collect()}
    assert got["a"].n_rows == 3 and got["a"].n_null == 0
    assert got["a"].n_distinct == 2
    assert got["a"].min_value == "1" and got["a"].max_value == "2"
    assert got["b"].n_null == 1 and got["b"].n_distinct == 2


def test_resample_ffill_fills_gaps(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1, 0, 0, 30)
    df = spark.createDataFrame([
        # key 'a': events in bucket 0 and bucket 3 → buckets 1,2 filled
        Row(ts=base, event_type="a", value=1.0),
        Row(ts=base + dt.timedelta(minutes=45), event_type="a", value=2.0),
        Row(ts=base, event_type="b", value=5.0),
    ])
    out = resample_ffill(df, every_seconds=900)
    rows = {(r.event_type, r.bucket.minute): r for r in out.collect()}
    # full spine: 4 buckets (0,15,30,45 min) × 2 keys
    assert len(rows) == 8
    assert rows[("a", 0)].n == 1 and rows[("a", 0)].sum_value_ffill == 1.0
    assert rows[("a", 15)].n == 0 and rows[("a", 15)].sum_value_ffill == 1.0
    assert rows[("a", 45)].n == 1 and rows[("a", 45)].sum_value_ffill == 2.0
    # key b: only bucket 0 observed, value carried to the end
    assert rows[("b", 45)].n == 0 and rows[("b", 45)].sum_value_ffill == 5.0


def test_balanced_downsample_equalizes_classes(spark):
    rows = [Row(vec_id=i, label=0) for i in range(20)] + \
           [Row(vec_id=100 + i, label=1) for i in range(7)] + \
           [Row(vec_id=200 + i, label=2) for i in range(13)]
    df = spark.createDataFrame(rows)
    out = balanced_downsample(df, class_col="label", id_col="vec_id")
    counts = {r.label: r.n for r in
              out.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert counts == {0: 7, 1: 7, 2: 7}
    # deterministic: a second run keeps exactly the same rows
    ids1 = sorted(r.vec_id for r in out.collect())
    ids2 = sorted(r.vec_id for r in
                  balanced_downsample(df, class_col="label",
                                      id_col="vec_id").collect())
    assert ids1 == ids2


def test_connected_components_chain_and_singletons(spark):
    from quake_vector_search_spark.operators.dedup import (
        connected_components,
    )
    nodes = spark.createDataFrame([(i,) for i in range(7)], ["doc_id"])
    # chain 4-3, 3-2, 2-1 (diameter 3, needs multiple rounds); pair 5-6
    pairs = spark.createDataFrame(
        [(4, 3), (3, 2), (2, 1), (5, 6)], ["doc_a", "doc_b"])
    got = {r.doc_id: r.cluster_id
           for r in connected_components(nodes, pairs).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5}


def test_connected_components_empty_pairs(spark):
    from quake_vector_search_spark.operators.dedup import (
        connected_components,
    )
    nodes = spark.createDataFrame([(1,), (2,)], ["doc_id"])
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    got = {r.doc_id: r.cluster_id
           for r in connected_components(nodes, pairs).collect()}
    assert got == {1: 1, 2: 2}
