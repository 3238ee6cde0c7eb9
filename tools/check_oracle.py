"""Local mirror of the driver's correctness gate.

Runs each registered query on Spark and its DuckDB oracle SQL at sf0.01,
compares row count, column set, and values (rows sorted by all columns,
columns sorted by name — approximating the driver's order-insensitive
value hash). Floats compared exactly after both sides' own rounding,
with a 5e-7 safety tolerance to flag borderline rounding flips.

Usage: python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    if len(sdf) != len(odf):
        errs.append(f"row count: spark={len(sdf)} oracle={len(odf)}")
    s, o = canon(sdf), canon(odf)
    if errs:
        return errs
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        if np.issubdtype(s[c].dtype, np.floating) or np.issubdtype(o[c].dtype, np.floating):
            sv64 = sv.astype(np.float64)
            ov64 = ov.astype(np.float64)
            bad = ~(np.isclose(sv64, ov64, rtol=0, atol=5e-7)
                    | (np.isnan(sv64) & np.isnan(ov64)))
        elif np.issubdtype(s[c].dtype, np.datetime64) and \
                np.issubdtype(o[c].dtype, np.datetime64):
            bad = (sv != ov) & ~(pd.isna(sv) & pd.isna(ov))
        else:
            bad = sv != ov
        if bad.any():
            i = int(np.argmax(bad))
            errs.append(f"col {c}: {int(bad.sum())} mismatches; first at row {i}: "
                        f"spark={sv[i]!r} oracle={ov[i]!r}")
    return errs


def _run_sharded(n_shards: int, extra: list[str]) -> int:
    """Split the registry across N child processes (round 6). Safe:
    every index scratch dir is pid-scoped and each child builds its
    own SparkSession/DuckDB. Interleaved by position so heavy families
    (ivf, dedup, streaming) spread across shards. Exit code 0 iff all
    shards pass. NOT for timing runs — for correctness sweeps only."""
    import subprocess

    from quake_vector_search_spark.queries import (
        REGISTRY,
        load_all_query_modules,
    )
    load_all_query_modules()
    names = extra or list(REGISTRY)
    shards = [names[i::n_shards] for i in range(n_shards)]
    procs = []
    for i, shard in enumerate(shards):
        if not shard:
            continue
        procs.append((i, subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), *shard],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True, env={**os.environ,
                            "SPARK_GRAFT_CPUS": str(
                                max(4, 32 // n_shards))})))
    rc = 0
    n_pass = n_total = 0
    for i, p in procs:
        out, _ = p.communicate()
        for ln in out.splitlines():
            if ln.startswith(("PASS", "FAIL")):
                print(ln)
            if ln.startswith("FAIL"):
                rc = 1
            m = ln.strip()
            if m.endswith("passed") and "/" in m:
                a, b = m.split()[0].split("/")
                n_pass += int(a)
                n_total += int(b)
        if p.returncode:
            rc = 1
    print(f"\n{n_pass}/{n_total} passed (over {len(procs)} shards)")
    return rc


def main(argv):
    if argv and argv[0] == "--shards":
        return _run_sharded(int(argv[1]), argv[2:])

    from quake_vector_search_spark.queries import REGISTRY, load_all_query_modules
    from quake_vector_search_spark.session import get_spark

    load_all_query_modules()
    names = argv or list(REGISTRY)
    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")

    failed = []
    for name in names:
        q = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        t1 = time.time()
        if q.sql is None:
            status = "rows-only" if len(sdf) >= 0 else "empty"
            print(f"PASS {name} ({status}, {len(sdf)} rows, spark {t1-t0:.1f}s)")
            continue
        try:
            odf = con.sql(q.sql).df()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: oracle error: {e}")
            continue
        errs = compare(name, sdf, odf)
        if errs:
            failed.append(name)
            print(f"FAIL {name} ({len(sdf)} vs {len(odf)} rows):")
            for e in errs[:5]:
                print(f"    {e}")
        else:
            print(f"PASS {name} ({len(sdf)} rows, spark {t1-t0:.1f}s)")
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
