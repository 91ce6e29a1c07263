#!/usr/bin/env python
"""Stage-level profile of one registered query (optimization harness).

Runs the query with bench.py's exact session/protocol but with the Spark
UI enabled, executes one warmup + one measured noop-sink run, then
scrapes the UI REST API for per-stage task time, shuffle bytes and spill
so the expensive stage — not just the total — is visible.

Usage: python tools/profile_query.py q185 [q183 ...]
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beast_spark.queries import all_queries  # noqa: E402
from beast_spark.session import get_spark  # noqa: E402
from beast_spark.sources.tables import load_table  # noqa: E402


def _rest(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    want = set(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="beast_spark_profile",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "SPARK_GRAFT_MAX_PARTITION_BYTES", "1MB"
            ),
            "spark.ui.enabled": "true",
        },
    )
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()

    def _identity(batches):
        for b in batches:
            yield b

    spark.range(10_000, numPartitions=2 * spark.sparkContext.defaultParallelism).mapInPandas(
        _identity, "id long"
    ).write.format("noop").mode("overwrite").save()

    specs = {
        n: s for n, s in sorted(all_queries().items()) if n.split("_", 1)[0] in want or n in want
    }
    for name, spec in specs.items():
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warmup
        jobs_before = {j["jobId"] for j in _rest(port, f"applications/{app_id}/jobs")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        jobs = [
            j
            for j in _rest(port, f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        print(f"\n=== {name}  wall={wall:.2f}s  jobs={len(jobs)} stages={len(stage_ids)}")
        rows = []
        for sid in stage_ids:
            try:
                st = _rest(port, f"applications/{app_id}/stages/{sid}")[0]
            except Exception:
                continue
            rows.append(
                (
                    st.get("executorRunTime", 0) / 1e3,
                    sid,
                    st.get("numCompleteTasks", 0),
                    st.get("inputBytes", 0) / 1e6,
                    st.get("shuffleReadBytes", 0) / 1e6,
                    st.get("shuffleWriteBytes", 0) / 1e6,
                    st.get("memoryBytesSpilled", 0) / 1e6,
                    (st.get("name", "") or "").split("\n")[0][:80],
                )
            )
        rows.sort(reverse=True)
        print(
            f"{'runT_s':>7} {'stage':>5} {'tasks':>5} {'inMB':>8} {'shRdMB':>7} {'shWrMB':>7} {'spillMB':>7}  name"
        )
        for r in rows[:14]:
            print(
                f"{r[0]:7.2f} {r[1]:5d} {r[2]:5d} {r[3]:8.1f} {r[4]:7.1f} {r[5]:7.1f} {r[6]:7.1f}  {r[7]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
