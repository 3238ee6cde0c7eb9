"""Round-start testdata schema guard.

The driver regenerates /root/testdata between rounds and physical
encodings have drifted before (round 3: events.ts flipped from
TIMESTAMP(NANOS) to timestamp[us]/TIMESTAMP_NTZ and silently broke 5
queries, 11 tests, and the bench). Run this FIRST each round:

    python tools/schema_check.py [sf_dir ...]

Prints every table's arrow schema and exits 1 if events.ts is an
encoding the catalog's normalize_events_ts does not handle, or a table
is missing. Pure pyarrow footer reads — no Spark session.
"""

from __future__ import annotations

import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")

# ts encodings normalize_events_ts handles (sources/catalog.py)
KNOWN_TS = {
    pa.int64(),                 # raw nanos via nanosAsLong
    pa.timestamp("us"),         # Spark 4 reads as TIMESTAMP_NTZ
    pa.timestamp("ns"),         # nanos (legacy conf path)
    pa.timestamp("us", tz="UTC"),
    pa.timestamp("ns", tz="UTC"),
}


def main() -> int:
    dirs = sys.argv[1:] or [f"/root/testdata/sf{s}"
                            for s in ("0.001", "0.01", "0.1")]
    rc = 0
    for d in dirs:
        print(f"== {d}")
        for t in TABLES:
            path = f"{d}/{t}.parquet"
            try:
                schema = pq.read_schema(path)
            except Exception as e:
                print(f"  {t}: MISSING/UNREADABLE ({e})")
                rc = 1
                continue
            cols = ", ".join(f"{f.name}:{f.type}" for f in schema)
            print(f"  {t}: {cols}")
            if t == "events":
                ts_type = schema.field("ts").type
                if ts_type not in KNOWN_TS:
                    print(f"  !! events.ts encoding {ts_type} is NOT "
                          "handled by catalog.normalize_events_ts — "
                          "add a branch before anything else")
                    rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
