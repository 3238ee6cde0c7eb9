"""Round-over-round bench comparison (VERDICT r5 #8 made per-query
deltas a standing deliverable — the headline total is not comparable
across rounds because the query set grows).

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--threshold 1.15]

Accepts either a raw ``bench.py`` output line (the JSON object with a
"queries" dict) or a driver ``BENCH_r{N}.json`` wrapper (whose "tail"
holds the truncated end of that line — pairs are regex-recovered from
it). Prints a ratio-sorted table and exits 1 if any shared query
regressed past the threshold.
"""

from __future__ import annotations

import json
import re
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        raw = f.read()
    try:
        d = json.loads(raw.splitlines()[0] if raw.lstrip().startswith(
            '{"metric"') else raw)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        return {k: float(v) for k, v in d["queries"].items()}
    if isinstance(d, dict) and "tail" in d:      # driver wrapper
        head = str(d["tail"]).split('}, "sf":')[0]
        pairs = re.findall(r'"([A-Za-z0-9_.]+)": ([0-9.]+)', head)
        return {k: float(v) for k, v in pairs}
    raise SystemExit(f"{path}: no 'queries' dict or recoverable tail")


def main(argv: list[str]) -> int:
    thr = 1.15
    if "--threshold" in argv:
        i = argv.index("--threshold")
        thr = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    old_p, new_p = argv
    old, new = load_queries(old_p), load_queries(new_p)
    shared = sorted((k for k in new if k in old and old[k] > 0),
                    key=lambda k: -(new[k] / old[k]))
    print(f"{'query':42s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    bad = []
    for k in shared:
        r = new[k] / old[k]
        flag = "  << REGRESSION" if r > thr else ""
        print(f"{k:42s} {old[k]:8.2f} {new[k]:8.2f} {r:6.2f}x{flag}")
        if r > thr:
            bad.append(k)
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"\nnew queries (no baseline): {', '.join(only_new)}")
    print(f"\nshared n={len(shared)}  "
          f"sum {sum(old[k] for k in shared):.1f} -> "
          f"{sum(new[k] for k in shared):.1f} s  "
          f"regressions>{thr}x: {len(bad)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
