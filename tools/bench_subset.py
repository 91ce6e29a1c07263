#!/usr/bin/env python
"""Bench a subset of registered queries with bench.py's exact protocol
(1MB splits, table+worker warmup, one untimed warmup run, best of <=3
with 20% early stop). Usage:

    python tools/bench_subset.py q36 q37 q97 q98 ...

Prints one JSON line {name: best_sec}. Iteration harness for perf work;
the committed numbers still come from bench.py.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beast_spark.queries import all_queries  # noqa: E402
from beast_spark.session import get_spark  # noqa: E402
from beast_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    want = set(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="beast_spark_bench_subset",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "SPARK_GRAFT_MAX_PARTITION_BYTES", "1MB"
            )
        },
    )
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()

    def _identity(batches):
        for b in batches:
            yield b

    spark.range(10_000, numPartitions=2 * spark.sparkContext.defaultParallelism).mapInPandas(
        _identity, "id long"
    ).write.format("noop").mode("overwrite").save()

    specs = {
        n: s
        for n, s in sorted(all_queries().items())
        if n.split("_", 1)[0] in want or n in want
    }
    out: dict[str, float] = {}
    for name, spec in specs.items():
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        runs = [elapsed]
        while elapsed > 0.2 and len(runs) < 3:
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            again = time.perf_counter() - t1
            runs.append(again)
            converged = again > elapsed * 0.8
            elapsed = min(elapsed, again)
            if converged:
                break
        out[name.split("_", 1)[0]] = round(elapsed, 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
