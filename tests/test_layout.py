"""Z-order layout: interleave correctness and the actual payoff —
file-level stats get tight enough to skip data on the SECOND column,
which a single-column sort cannot do."""

import shutil

import pytest

from quake_vector_search_spark.operators.layout import (
    interleave_bits,
    zorder_write,
    zvalue,
)
from quake_vector_search_spark.sources import load_table
from tests.conftest import SF_SMOKE


def _py_interleave(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_known_and_random(spark):
    import random

    from pyspark.sql import functions as F
    cases = [(0, 0), (1, 0), (0, 1), (3, 3), (65535, 0), (0, 65535)]
    rng = random.Random(7)
    cases += [(rng.randrange(65536), rng.randrange(65536))
              for _ in range(50)]
    df = spark.createDataFrame(cases, "a long, b long")
    got = (df.select("a", "b",
                     interleave_bits(F.col("a"), F.col("b")).alias("z"))
           .collect())
    for r in got:
        assert r["z"] == _py_interleave(r["a"], r["b"]), (r["a"], r["b"])
    # z-order locality sanity: the known small cases in curve order
    known = {(0, 0): 0, (1, 0): 1, (0, 1): 2, (3, 3): 15}
    for (a, b), expect in known.items():
        assert _py_interleave(a, b) == expect


def test_zvalue_scaling_bounds(spark):
    """Min-max scaling maps bounds to [0, 2^bits) and constant columns
    to 0; zval is deterministic for a fixed input."""
    rows = [(i, float(i) * 2.5, 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "a long, b double, c double")
    z1 = {r["a"]: r["zval"] for r in zvalue(df, "a", "b").collect()}
    z2 = {r["a"]: r["zval"] for r in zvalue(df, "a", "b").collect()}
    assert z1 == z2
    # b is perfectly correlated with a -> diagonal of the curve:
    # min point maps to 0, max to the top corner
    assert z1[0] == 0
    assert z1[99] == _py_interleave(65535, 65535)
    zc = {r["a"]: r["zval"] for r in zvalue(df, "a", "c").collect()}
    assert zc[0] == 0 and zc[99] == _py_interleave(65535, 0)


@pytest.mark.parametrize("probe_col", ["value"])
def test_zorder_files_skip_on_second_column(spark, probe_col):
    """Write events two ways — sorted by user_id only vs z-ordered on
    (user_id, value) — and check parquet footer stats: a narrow filter
    on ``value`` overlaps FEWER z-ordered files than single-sorted
    ones (where every file spans the full value range). This is the
    skip a 100 TB reader gets for free from pushed filters."""
    import pyarrow.parquet as pq

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "value")
    lin_dir = "/tmp/qvss_layout_linear"
    z_dir = "/tmp/qvss_layout_zorder"
    for d in (lin_dir, z_dir):
        shutil.rmtree(d, ignore_errors=True)
    (ev.repartitionByRange(8, "user_id").sortWithinPartitions("user_id")
     .write.mode("overwrite").parquet(lin_dir))
    zorder_write(ev, z_dir, "user_id", "value", n_files=8)

    lo, hi = 10.0, 20.0

    def overlapping_files(d):
        import glob
        n_over, n_files = 0, 0
        for f in glob.glob(d + "/part-*.parquet"):
            md = pq.read_metadata(f)
            n_files += 1
            fmin, fmax = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == probe_col and col.statistics:
                        s = col.statistics
                        fmin = s.min if fmin is None else min(fmin, s.min)
                        fmax = s.max if fmax is None else max(fmax, s.max)
            if fmin is not None and not (fmax < lo or fmin > hi):
                n_over += 1
        return n_over, n_files

    lin_over, lin_files = overlapping_files(lin_dir)
    z_over, z_files = overlapping_files(z_dir)
    assert lin_files == 8 and z_files == 8
    # single-column sort: value uncorrelated with user_id, every file
    # spans the whole value range
    assert lin_over == 8
    assert z_over < lin_over

    # layout must not change content: filtered reads agree
    got_l = sorted(r["event_id"] for r in spark.read.parquet(lin_dir)
                   .where(f"{probe_col} BETWEEN {lo} AND {hi}").collect())
    got_z = sorted(r["event_id"] for r in spark.read.parquet(z_dir)
                   .where(f"{probe_col} BETWEEN {lo} AND {hi}").collect())
    assert got_l == got_z and got_l
    for d in (lin_dir, z_dir):
        shutil.rmtree(d, ignore_errors=True)
