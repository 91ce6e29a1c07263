#!/usr/bin/env python
"""Per-query bench regression gate.

Usage: python tools/bench_diff.py BENCH_prev.json BENCH_new.json [ratio]
       python tools/bench_diff.py --close [ratio]

Compares per-query seconds between two bench.py outputs and exits 1 when
any shared query regressed more than ``ratio``× (default 1.3) AND by more
than an absolute floor of 0.15 s (local timings for sub-100 ms queries
jitter far beyond 30% run-to-run; a 0.04 s → 0.06 s "regression" is
noise, a 1 s → 1.4 s one is not). New/removed queries are reported but
never fail the gate.

``--close`` is the round-close form (round-11 verdict "What's wrong"
#1: the gate once diffed a mid-round run while the committed
BENCH_LOCAL.json had drifted): it compares the repo-root
BENCH_LOCAL.json — the file the driver will record as BENCH_r{N} —
against the HIGHEST committed BENCH_r*.json, and prints each input's
md5 so the round record can pin WHICH bytes were diffed. If
BENCH_LOCAL.json is regenerated after this runs, the printed md5 no
longer matches the committed file and the diff must be re-run.
"""

from __future__ import annotations

import json
import sys

ABS_FLOOR_S = 0.15


def _close_args() -> tuple[str, str]:
    """(prev, new) for --close: the BENCH_LOCAL.json COMMITTED at the
    previous round's close vs the current repo-root BENCH_LOCAL.json.

    The driver's BENCH_r{N}.json wrapper often carries only a pointer
    ("queries": "BENCH_LOCAL.json") because the full per-query digest
    overflows its 2000-char stdout tail — so the authoritative per-query
    record of round N is the BENCH_LOCAL.json at the commit that added
    BENCH_r{N}.json. Extract exactly that blob via git (falling back to
    the wrapper only if git is unavailable)."""
    import glob
    import os
    import re
    import subprocess
    import tempfile

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = []
    for p in glob.glob(os.path.join(root, "BENCH_r*.json")):
        m = re.match(r"BENCH_r(\d+)\.json$", os.path.basename(p))
        if m:
            rounds.append((int(m.group(1)), p))
    if not rounds:
        raise SystemExit("--close: no committed BENCH_r*.json found")
    local = os.path.join(root, "BENCH_LOCAL.json")
    if not os.path.exists(local):
        raise SystemExit("--close: no BENCH_LOCAL.json at the repo root")
    n, wrapper = max(rounds)
    try:
        commit = subprocess.check_output(
            ["git", "log", "-n1", "--format=%H", "--", f"BENCH_r{n}.json"],
            cwd=root, text=True,
        ).strip()
        if not commit:
            # the newest wrapper is on disk but never committed (the
            # driver wrote it moments ago): `git show :BENCH_LOCAL.json`
            # would silently diff against the INDEX copy — a near-self
            # diff that passes vacuously. Fall back to the wrapper.
            raise FileNotFoundError(f"BENCH_r{n}.json not committed yet")
        blob = subprocess.check_output(
            ["git", "show", f"{commit}:BENCH_LOCAL.json"], cwd=root, text=True
        )
        prev = os.path.join(
            tempfile.gettempdir(), f"BENCH_LOCAL_r{n}_{commit[:8]}.json"
        )
        with open(prev, "w") as fh:
            fh.write(blob)
        print(f"prev = BENCH_LOCAL.json @ round-{n} close commit {commit[:8]}")
        return prev, local
    except (subprocess.CalledProcessError, FileNotFoundError):
        print(f"prev = {wrapper} (git blob unavailable; wrapper may be a pointer)")
        return wrapper, local


def _fingerprint(path: str) -> str:
    import hashlib
    import os

    h = hashlib.md5(open(path, "rb").read()).hexdigest()
    return f"{path}: md5={h} mtime={int(os.path.getmtime(path))}"


def load_queries(path: str) -> dict[str, float]:
    """Accept a raw bench.py JSON line OR the driver's BENCH_r{N}.json
    wrapper ({"parsed": {...}} or a stdout "tail" containing the line)."""
    d = json.load(open(path))
    if isinstance(d.get("queries"), dict):
        return d["queries"]
    if isinstance(d.get("parsed"), dict) and isinstance(
        d["parsed"].get("queries"), dict
    ):
        return d["parsed"]["queries"]
    tail = d.get("tail", "")
    start = tail.find('{"metric"')
    if start >= 0:
        line = tail[start:].strip().split("\n")[0]
        return json.loads(line)["queries"]
    raise SystemExit(f"{path}: no per-query timings found (truncated driver tail?)")


def main() -> int:
    if len(sys.argv) >= 2 and sys.argv[1] == "--close":
        prev_path, new_path = _close_args()
        ratio = float(sys.argv[2]) if len(sys.argv) > 2 else 1.3
    elif len(sys.argv) >= 3:
        prev_path, new_path = sys.argv[1], sys.argv[2]
        ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    else:
        print(__doc__)
        return 2
    print(f"prev {_fingerprint(prev_path)}")
    print(f"new  {_fingerprint(new_path)}")
    prev = load_queries(prev_path)
    new = load_queries(new_path)
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
