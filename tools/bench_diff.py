#!/usr/bin/env python
"""Per-query bench regression gate.

Usage: python tools/bench_diff.py BENCH_prev.json BENCH_new.json [ratio]

Compares per-query seconds between two bench.py outputs and exits 1 when
any shared query regressed more than ``ratio``× (default 1.3) AND by more
than an absolute floor of 0.15 s (local timings for sub-100 ms queries
jitter far beyond 30% run-to-run; a 0.04 s → 0.06 s "regression" is
noise, a 1 s → 1.4 s one is not). New/removed queries are reported but
never fail the gate.
"""

from __future__ import annotations

import json
import sys

ABS_FLOOR_S = 0.15


def load_queries(path: str) -> dict[str, float]:
    """Accept a raw bench.py JSON line OR the driver's BENCH_r{N}.json
    wrapper ({"parsed": {...}} or a stdout "tail" containing the line)."""
    d = json.load(open(path))
    if "queries" in d:
        return d["queries"]
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]["queries"]
    tail = d.get("tail", "")
    start = tail.find('{"metric"')
    if start >= 0:
        line = tail[start:].strip().split("\n")[0]
        return json.loads(line)["queries"]
    raise SystemExit(f"{path}: no per-query timings found (truncated driver tail?)")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    prev = load_queries(sys.argv[1])
    new = load_queries(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    bad = []
    for name in sorted(set(prev) & set(new)):
        p, n = prev[name], new[name]
        if n > p * ratio and n - p > ABS_FLOOR_S:
            bad.append((name, p, n))
            print(f"REGRESSED {name}: {p:.3f}s -> {n:.3f}s ({n / p:.2f}x)")
        elif n < p / ratio and p - n > ABS_FLOOR_S:
            print(f"improved  {name}: {p:.3f}s -> {n:.3f}s")
    for name in sorted(set(new) - set(prev)):
        print(f"new       {name}: {new[name]:.3f}s")
    for name in sorted(set(prev) - set(new)):
        print(f"removed   {name} (was {prev[name]:.3f}s)")
    tp, tn = sum(prev.values()), sum(n for q, n in new.items() if q in prev)
    print(f"\nshared-query total: {tp:.2f}s -> {tn:.2f}s; {len(bad)} regression(s) @ >{ratio}x")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
