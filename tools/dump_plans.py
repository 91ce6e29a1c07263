#!/usr/bin/env python
"""Dump .explain("formatted") of named queries to plans/<outdir>/<name>_<tag>.txt.

Usage: python tools/dump_plans.py <outdir> <tag> q174 q183 ...
Run from a repo/worktree root; plan text goes to the MAIN repo's plans dir
(override with PLANS_ROOT). Explain only — no job execution.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beast_spark.queries import all_queries  # noqa: E402
from beast_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, tag, want = sys.argv[1], sys.argv[2], set(sys.argv[3:])
    root = os.environ.get("PLANS_ROOT", "/root/repo/plans")
    dest = os.path.join(root, outdir)
    os.makedirs(dest, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="dump_plans",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "SPARK_GRAFT_MAX_PARTITION_BYTES", "1MB"
            )
        },
    )
    for name, spec in sorted(all_queries().items()):
        if name.split("_", 1)[0] not in want and name not in want:
            continue
        df = spec.fn(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(dest, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
