#!/usr/bin/env python
"""Run every oracle-checked query against DuckDB at a given SF dir and
report mismatches — the standalone form of the driver's correctness gate
and tests/test_oracle_parity.py.

The comparison is HASH-EXACT, mirroring the driver's gate: columns sorted
by name, every cell stringified with no numeric tolerance, rows sorted by
the stringified tuple.  A LONG-vs-DOUBLE drift ("151" vs "151.0") fails
here exactly as it fails the driver (this caught q59 in round 1 only at
the driver — the old sweep used a 1e-9 float tolerance and missed it).

Usage: python tools/oracle_sweep.py [/root/testdata/sf0.01] [name_filter]
Exit code 1 on any failure.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings"


def _cell(v) -> str:
    """Stringify one cell with no dtype coercion; normalize containers so
    numpy arrays (Spark->pandas) and lists (DuckDB->pandas) print alike."""
    import numpy as np

    if v is None:
        return "<NULL>"
    if isinstance(v, float) and v != v:  # NaN
        return "<NULL>"
    if isinstance(v, np.ndarray):
        return "[" + ", ".join(_cell(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(f"{k}: {_cell(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, np.generic):
        v = v.item()
    return str(v)


def canonical_rows(df, cols):
    return sorted(tuple(_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None))


def compare(sdf, odf):
    cols = sorted(sdf.columns)
    if cols != sorted(odf.columns):
        return f"columns {cols} vs {sorted(odf.columns)}"
    if len(sdf) != len(odf):
        return f"rows {len(sdf)} vs {len(odf)}"
    a, b = canonical_rows(sdf, cols), canonical_rows(odf, cols)
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            for c, va, vb in zip(cols, ra, rb):
                if va != vb:
                    return f"row {i} col {c}: spark={va!r} oracle={vb!r}"
    return None


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from beast_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filters = sys.argv[2:] or [""]  # any-match substrings
    spark = get_spark(app_name="oracle_sweep")
    con = duckdb.connect()
    for t in TABLES.split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    checked, bad, unoracled = 0, [], []
    for name in sorted(qs):
        if not any(f in name for f in name_filters):
            continue
        sql = oracles.get(name)
        if not sql:
            unoracled.append(name)
            continue
        checked += 1
        try:
            sdf = qs[name](spark, sf).toPandas()
            odf = con.execute(sql).df()
            err = compare(sdf, odf)
        except Exception as exc:
            err = f"ERROR {type(exc).__name__}: {str(exc)[:150]}"
        if err:
            bad.append((name, err))
            print(f"FAIL {name}: {err}")
        else:
            print(f"ok   {name} ({len(sdf)} rows)")
        # Some query builds persist intermediates their returned frame
        # reads (documented per query); release them between queries so
        # a 176-query sweep doesn't accumulate cached blocks.
        spark.catalog.clearCache()
    if unoracled:
        print(f"no_oracle ({len(unoracled)}): {' '.join(unoracled)}")
    print(f"\n{checked} checked, {len(bad)} failed @ {sf}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
