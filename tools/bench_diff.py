#!/usr/bin/env python
"""Per-query bench regression gate.

Usage: python tools/bench_diff.py BENCH_prev.json BENCH_new.json [ratio]
       python tools/bench_diff.py --close [--canary] [ratio]

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

``--canary`` (round-12 verdict next-round #1 — two consecutive rounds
lost effort to phantom regressions that were VM-rebuild artifacts):
anchors the diff against machine drift with a same-session A/B. The
previous round's code is checked out into a throwaway git worktree at
the commit whose BENCH_LOCAL.json is being diffed against, and
``tools/bench_subset.py`` runs a fixed ~8-query canary set under BOTH
trees on THIS machine, minutes apart. The per-query drift factor
(prev-code-NOW / prev-code-COMMITTED, median over canary queries)
rescales the whole committed baseline before the regression gate runs,
so a regression is only named code-real when it survives the canary:
if the previous round's own code measures just as slow on today's
machine, the committed delta is machine drift, not code. The canary
A/B table (prev code vs current code, same machine, same session) is
printed for the round record.
"""

from __future__ import annotations

import json
import sys

ABS_FLOOR_S = 0.15

#: The canary set: ~8 queries spanning the families whose committed
#: numbers have historically drifted with the VM (the cap/incremental
#: family, ANN, SemDeDup) plus one relational and one window anchor.
#: bench_subset matches on the qNN prefix.
CANARY_QUERIES = ["q29", "q63", "q98", "q112", "q162", "q173", "q174", "q220"]


def _close_commit() -> tuple[int, str]:
    """(round, commit) of the previous round's close — the commit whose
    BENCH_LOCAL.json --close diffs against."""
    import glob
    import os
    import re
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = []
    for p in glob.glob(os.path.join(root, "BENCH_r*.json")):
        m = re.match(r"BENCH_r(\d+)\.json$", os.path.basename(p))
        if m:
            rounds.append(int(m.group(1)))
    if not rounds:
        raise SystemExit("--canary: no committed BENCH_r*.json found")
    n = max(rounds)
    commit = subprocess.check_output(
        ["git", "log", "-n1", "--format=%H", "--", f"BENCH_r{n}.json"],
        cwd=root, text=True,
    ).strip()
    if not commit:
        raise SystemExit(f"--canary: BENCH_r{n}.json not committed yet")
    return n, commit


def _bench_subset_in(tree: str, queries: list[str]) -> dict[str, float]:
    """Run tools/bench_subset.py in ``tree`` (its OWN code and its own
    SparkSession — the whole point is benching the old code on this
    machine) and parse the one-JSON-line output."""
    import os
    import subprocess

    out = subprocess.run(
        [sys.executable, "tools/bench_subset.py", *queries],
        cwd=tree, capture_output=True, text=True, timeout=1800,
        env={**os.environ, "PYTHONPATH": tree},
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return {k: float(v) for k, v in json.loads(line).items()}
    raise SystemExit(
        f"--canary: no JSON line from bench_subset in {tree}\n"
        f"stdout tail: {out.stdout[-500:]}\nstderr tail: {out.stderr[-500:]}"
    )


def _run_canary(prev_committed: dict[str, float]) -> tuple[float, dict]:
    """Same-session A/B: bench the canary set under the previous
    round's code (throwaway worktree) AND the current tree, on this
    machine, minutes apart. Returns (drift, table) where ``drift`` is
    the median over canary queries of prev-code-NOW / prev-COMMITTED —
    the factor by which this machine differs from the machine that
    produced the committed baseline — and ``table`` holds the raw A/B
    rows for the round record."""
    import os
    import statistics
    import subprocess
    import tempfile

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n, commit = _close_commit()
    wt = os.path.join(tempfile.gettempdir(), f"bench_canary_r{n}_{commit[:8]}")
    created = False
    if not os.path.exists(os.path.join(wt, "tools", "bench_subset.py")):
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=root, capture_output=True,
        )
        subprocess.check_call(
            ["git", "worktree", "add", "--detach", wt, commit], cwd=root
        )
        created = True
    print(f"canary: prev code = round-{n} close {commit[:8]} @ {wt}")
    try:
        prev_now = _bench_subset_in(wt, CANARY_QUERIES)
        cur_now = _bench_subset_in(root, CANARY_QUERIES)
    finally:
        if created:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=root, capture_output=True,
            )
    # committed baseline keyed by full names; canary output by prefix
    committed_by_prefix = {
        k.split("_", 1)[0]: v for k, v in prev_committed.items()
    }
    ratios, table = [], {}
    for q in CANARY_QUERIES:
        pc, pn, cn = committed_by_prefix.get(q), prev_now.get(q), cur_now.get(q)
        table[q] = {"prev_committed": pc, "prev_now": pn, "cur_now": cn}
        if pc and pn:
            ratios.append(pn / pc)
    if not ratios:
        raise SystemExit("--canary: no canary query overlaps the committed baseline")
    drift = statistics.median(ratios)
    print(f"canary drift factor (prev-code NOW / prev COMMITTED, median): {drift:.3f}x")
    print(f"{'query':8} {'prev committed':>14} {'prev code NOW':>14} {'cur code NOW':>13} {'code A/B':>9}")
    for q, row in table.items():
        pc = f"{row['prev_committed']:.3f}s" if row["prev_committed"] else "-"
        pn = f"{row['prev_now']:.3f}s" if row["prev_now"] else "-"
        cn = f"{row['cur_now']:.3f}s" if row["cur_now"] else "-"
        ab = (
            f"{row['cur_now'] / row['prev_now']:.2f}x"
            if row["prev_now"] and row["cur_now"]
            else "-"
        )
        print(f"{q:8} {pc:>14} {pn:>14} {cn:>13} {ab:>9}")
    return drift, table


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
    args = list(sys.argv[1:])
    canary = "--canary" in args
    if canary:
        args.remove("--canary")
    if args and args[0] == "--close":
        prev_path, new_path = _close_args()
        ratio = float(args[1]) if len(args) > 1 else 1.3
    elif len(args) >= 2:
        if canary:
            # the canary worktree is anchored at the latest BENCH_r*
            # close commit; against an arbitrary prev file the drift
            # factor would fold REAL code deltas into "machine drift"
            # and exonerate them (review finding)
            raise SystemExit(
                "--canary only composes with --close (the A/B worktree is "
                "pinned to the commit --close diffs against)"
            )
        prev_path, new_path = args[0], args[1]
        ratio = float(args[2]) if len(args) > 2 else 1.3
    else:
        print(__doc__)
        return 2
    print(f"prev {_fingerprint(prev_path)}")
    print(f"new  {_fingerprint(new_path)}")
    prev = load_queries(prev_path)
    new = load_queries(new_path)
    drift, ab_table = 1.0, {}
    if canary:
        drift, ab_table = _run_canary(prev)
        if abs(drift - 1.0) > 0.05:
            print(
                f"normalizing the committed baseline by {drift:.3f}x before "
                "the gate (machine drift measured by the canary A/B)"
            )
    bad = []
    for name in sorted(set(prev) & set(new)):
        p, n = prev[name] * drift, new[name]
        if n > p * ratio and n - p > ABS_FLOOR_S:
            suffix = ""
            row = ab_table.get(name.split("_", 1)[0])
            if row and row.get("prev_now") and row.get("cur_now"):
                # canary queries get the direct same-machine verdict:
                # the committed delta is noise unless current code is
                # ALSO slower than the old code benched minutes apart
                ab = row["cur_now"] / row["prev_now"]
                if ab <= ratio or row["cur_now"] - row["prev_now"] <= ABS_FLOOR_S:
                    print(
                        f"noise     {name}: committed {p:.3f}s -> {n:.3f}s "
                        f"but canary A/B exonerates (cur/prev same-machine "
                        f"= {ab:.2f}x)"
                    )
                    continue
                suffix = f" [confirmed by canary A/B {ab:.2f}x]"
            elif canary:
                suffix = " [not in canary set; baseline drift-normalized]"
            bad.append((name, p, n))
            print(f"REGRESSED {name}: {p:.3f}s -> {n:.3f}s ({n / p:.2f}x){suffix}")
        elif n < p / ratio and p - n > ABS_FLOOR_S:
            print(f"improved  {name}: {p:.3f}s -> {n:.3f}s")
    for name in sorted(set(new) - set(prev)):
        print(f"new       {name}: {new[name]:.3f}s")
    for name in sorted(set(prev) - set(new)):
        print(f"removed   {name} (was {prev[name]:.3f}s)")
    tp = sum(v * drift for v in prev.values())
    tn = sum(n for q, n in new.items() if q in prev)
    norm = f" (baseline canary-normalized by {drift:.3f}x)" if canary else ""
    print(f"\nshared-query total: {tp:.2f}s -> {tn:.2f}s; {len(bad)} regression(s) @ >{ratio}x{norm}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
