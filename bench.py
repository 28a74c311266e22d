"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1_...": sec, ...}, "sf": <sf>}

Each query is executed with a count-style action that forces full evaluation
(including the shuffle/join pipeline) without serializing all rows back to
the driver — at bench scale collect() would measure driver ingest, not the
engine. A warmup run of the smallest query absorbs JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from affinity_spark import get_spark

# Headline set: the TPC-H-shaped analytics spine, KV/state read semantics,
# text + dedup + similarity pipeline ops, and the iterative graph op.
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "events_compact_latest",
    "events_prefix_timerange",
    "events_topn_per_key",
    "join_enrich_events",
    "mktsegment_revenue",
    "word_count",
    "text_quality",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "emb_knn_brute",
    "graph_components",
    "asof_last_order_before_event",
    "orders_range_join",
    "events_sessionize",
    "orders_rollup",
    "events_json_extract",
    "q7_nation_volume",
    "q10_returned_items",
]

# Training-pipeline extension set, timed separately so the headline total
# stays comparable across rounds (it predates these ops).
EXTENDED = [
    "pipeline_clean_corpus",
    "pipeline_training_corpus",
    "docs_train_split",
    "docs_pack_sequences",
    "docs_reservoir_per_source",
    "text_bpe_tokens",
    "text_winnow_fps",
    "emb_near_dup_drop",
]


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="affinity-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # Warmup: absorb session/codegen startup so per-query numbers are honest.
    queries["q6_forecast_revenue"](spark, sf_dir).count()

    # Best-of-N per query (default 2): the first run pays JVM JIT + codegen
    # compilation, later runs measure the steady-state plan (what a
    # long-running cluster actually sees). Raise BENCH_REPEATS on noisy
    # hosts for a tighter minimum.
    repeats = max(int(os.environ.get("BENCH_REPEATS", "2")), 1)
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    extended: dict[str, float] = {}
    for name in EXTENDED:
        fn = queries[name]
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        extended[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_of(sf_dir),
                "extended_total": round(sum(extended.values()), 3),
                "extended": extended,
            }
        )
    )


if __name__ == "__main__":
    main()
