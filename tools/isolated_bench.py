"""Isolated best-of-N timing for a set of queries — the quiet-window
disposition tool: each query runs in THIS fresh session (no 170-query
JVM state accumulation), best-of-N steady state, with the per-query
work volumes (input rows/bytes, shuffle bytes, task time) captured from
the Spark UI REST API so host-vs-plan attribution is arithmetic.

Usage: python tools/isolated_bench.py [sf_dir] q1 q2 ...  (N from
$BENCH_REPEATS, default 5). Prints one JSON line per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod
import __spark_entry__ as entrymod
from affinity_spark import get_spark
from affinity_spark.cache import release_shared


def main() -> None:
    args = sys.argv[1:]
    sf_dir = (
        args.pop(0)
        if args and os.path.isdir(args[0])
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    repeats = max(int(os.environ.get("BENCH_REPEATS", "5")), 1)
    spark = get_spark(
        app_name="affinity-isolated-bench",
        conf={"spark.ui.enabled": "true", "spark.ui.retainedStages": "40000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    # absorb session/codegen startup
    queries["q6_forecast_revenue"](spark, sf_dir).count()
    for name in args:
        fn = queries[name]
        best = float("inf")
        work = None
        for i in range(repeats):
            last = i == repeats - 1
            before = benchmod._stage_snapshot(spark) if last else None
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            if last:
                work = benchmod._work_delta(
                    before, benchmod._stage_snapshot(spark)
                )
        release_shared()
        print(json.dumps(
            {"query": name, "best_sec": round(best, 3), "repeats": repeats,
             "sf_dir": sf_dir, "work": work}
        ))


if __name__ == "__main__":
    main()
