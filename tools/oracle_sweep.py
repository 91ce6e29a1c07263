#!/usr/bin/env python
"""Run every oracle-checked query against DuckDB at a given SF dir and
report mismatches — the standalone form of the driver's correctness gate
and tests/test_oracle_parity.py.

Usage: python tools/oracle_sweep.py [/root/testdata/sf0.01] [name_filter]
Exit code 1 on any failure.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings"


def compare(sdf, odf):
    cols = sorted(sdf.columns)
    if cols != sorted(odf.columns):
        return f"columns {cols} vs {sorted(odf.columns)}"
    sdf = sdf[cols].sort_values(cols).reset_index(drop=True)
    odf = odf[cols].sort_values(cols).reset_index(drop=True)
    if len(sdf) != len(odf):
        return f"rows {len(sdf)} vs {len(odf)}"
    for c in cols:
        a, b = sdf[c], odf[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            ok = ((a - b).abs() < 1e-9) | (a.isna() & b.isna())
        else:
            ok = (a.astype(str) == b.astype(str)) | (a.isna() & b.isna())
        if not ok.all():
            return f"col {c}: {int((~ok).sum())} diffs"
    return None


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from beast_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark(app_name="oracle_sweep")
    con = duckdb.connect()
    for t in TABLES.split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    checked, bad = 0, []
    for name in sorted(qs):
        sql = oracles.get(name)
        if not sql or name_filter not in name:
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
    print(f"\n{checked} checked, {len(bad)} failed @ {sf}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
