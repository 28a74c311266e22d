"""Write-path scale rehearsal: snapshot build, merge-upsert and streaming
micro-batches at sf0.1 and K× rows.

The reference's only hard performance floors are WRITE floors
(>= 500 state writes/s/partition, ConfluentEcoSystemSpec.scala:94-110),
so the 10× question must be answered for the write path too, not just
queries: does snapshot build stay linear, does the merge-upsert rewrite
stay proportional to table size, does micro-batch latency stay flat for
a fixed batch size?  Reuses bench.py's `_write_path_bench` verbatim so
the rehearsed numbers are the same metric the per-round bench records.

Usage: python tools/write_path_rehearsal.py [K]   (default 10)
Prints one JSON line; record in BASELINE.md next to the query table.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from affinity_spark import get_spark
from bench import _write_path_bench
from tools.scale_rehearsal import BASE_SF, build_scaled


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="affinity-write-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    scaled = build_scaled(spark, k)

    small = _write_path_bench(spark, BASE_SF)
    big = _write_path_bench(spark, scaled)

    def exponent(metric_rows: str, metric_rate: str) -> float:
        t_small = small[metric_rows] / small[metric_rate]
        t_big = big[metric_rows] / big[metric_rate]
        return round(math.log(t_big / t_small) / math.log(k), 3)

    out = {
        "metric": "write_path_rehearsal",
        "k": k,
        "sf0.1": small,
        f"x{k}": big,
        "exponents": {
            # time-to-build exponent (1.0 = linear in rows)
            "snapshot_build": exponent("table_rows", "snapshot_build_rows_per_sec"),
            # merge rewrites the whole table: exponent vs TABLE rows
            "upsert_merge": exponent("table_rows", "upsert_merged_rows_per_sec"),
        },
        # micro-batches are fixed-size (10k rows split in 5) at every scale:
        # latency should stay FLAT, so report the ratio directly
        "stream_batch_ms_ratio": round(
            big["stream_batch_ms_avg"] / small["stream_batch_ms_avg"], 2
        )
        if small.get("stream_batch_ms_avg")
        else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
