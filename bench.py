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

from pyspark.sql import functions as F

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


# Round-3 operator families (LM scoring, chunking, sketches, iterative
# graph, ANN composition, record linkage), timed as a third set so the
# headline and extended totals stay anchor-comparable.
R3_SET = [
    "docs_lm_bits",
    "docs_dsir_weights",
    "docs_chunk_overlap",
    "docs_phrase_search",
    "graph_pagerank",
    "events_cms_counts",
    "emb_ivfpq_search",
    "dedup_edit_distance",
]


# Round-5 surface (maintained postings index + new dedup/ANN/corpus ops),
# timed as a fourth set so earlier totals stay anchor-comparable. The
# shared index is built before this set runs (postings_index_build_sec).
R5_SET = [
    "docs_bm25_search",
    "docs_tfidf_pairs",
    "docs_postings_stats",
    "docs_proximity_search",
    "docs_pmi_collocations",
    "docs_source_drift",
    "dedup_ppjoin_pairs",
    "dedup_winnow_pairs",
    "emb_batch_search",
    "events_debounce_state",
    "docs_online_lsh_state",
    "docs_leakage_free_split",
    "dedup_incremental_batch",
    "dedup_cross_source_matrix",
    "events_kmv_theta",
    "docs_tokenizer_fertility",
    "dedup_quality_canonical",
    "emb_filtered_knn",
    "events_transition_matrix",
    "events_mad_outliers",
]


# Round-8 surface (maintained IVF index, unicode hygiene, FFD packing,
# composed streaming replay, diversity sampling), timed as a fifth set so
# earlier totals stay anchor-comparable. emb_* here are INDEX-SERVED: the
# first call builds the shared IVFIndex once per process, best-of-2 keeps
# the index-read query path (the postings-index precedent).
R8_SET = [
    "emb_ivf_search",
    "emb_incremental_search",
    "emb_diverse_sample",
    "docs_unicode_scrub",
    "docs_pack_bestfit",
    "pipeline_streaming_replay",
    "docs_span_dedup",
]


# Round-9 surface: index-served IVF-PQ (codes-in-the-index ADC read),
# the KN perplexity filter + CCNet tertile sharding. Sixth set so earlier
# totals stay anchor-comparable.
R9_SET = [
    "emb_ivfpq_search",
    "emb_pq_batch_search",
    "docs_lm_bits_kn",
    "docs_ccnet_buckets",
    "docs_filter_ensemble",
    "docs_unigram_segment",
    "events_hll_range_store",
    "events_dd_range_store",
]


# --- per-query work volumes (Spark UI REST) --------------------------------
# The r9 verdict: quiet-window anchors moved +44% on an unchanged query set
# and were dispositioned by narrative + spot floors. Recording input rows,
# shuffle bytes, and task time per query makes "host constant" vs
# "plan/data growth" arithmetic: same bytes+rows with higher wall time is
# host; more bytes/rows is data or plan. Snapshots are keyed by
# (stageId, attemptId) so UI stage eviction between snapshots cannot
# corrupt a delta (evicted stages simply drop out of both snapshots).

_WORK_FIELDS = {
    "input_rows": "inputRecords",
    "input_bytes": "inputBytes",
    "shuffle_read_bytes": "shuffleReadBytes",
    "shuffle_write_bytes": "shuffleWriteBytes",
    "task_time_ms": "executorRunTime",
    # steal-proof meter (r15): hypervisor steal parks tasks, inflating
    # executorRunTime and wall 2-5x in bursts, but withheld CPU never
    # lands in executorCpuTime — A/B attribution on a bursty host
    # compares THIS field (REST API reports it in nanoseconds; the
    # snapshot converts to ms)
    "cpu_time_ms": "executorCpuTime",
    "num_tasks": "numTasks",
}


def _stage_snapshot(spark) -> dict | None:
    """(stageId, attemptId) -> metrics for every stage the UI still holds,
    or None when the UI is disabled/unreachable."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return None
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete&status=failed"
    try:
        with urllib.request.urlopen(url, timeout=10) as r:
            stages = json.load(r)
    except Exception:
        return None
    return {
        (s["stageId"], s.get("attemptId", 0)): {
            k: int(s.get(v, 0) or 0)
            // (1_000_000 if v == "executorCpuTime" else 1)
            for k, v in _WORK_FIELDS.items()
        }
        for s in stages
    }


def _work_delta(before: dict | None, after: dict | None) -> dict | None:
    if before is None or after is None:
        return None
    out = {k: 0 for k in _WORK_FIELDS}
    new_stages = 0
    for key, m in after.items():
        if key in before:
            continue
        new_stages += 1
        for k in out:
            out[k] += m[k]
    out["num_stages"] = new_stages
    return out


# Round-10 surface: the maintained quality store's signal/verdict reads
# and the soft-EM tokenizer family. Seventh set so earlier totals stay
# anchor-comparable. The quality reads are INDEX-SERVED: the first call
# builds the shared store once per process, best-of-2 keeps the read path.
R10_SET = [
    "docs_quality_signals",
    "docs_unigram_soft_em",
    "docs_unigram_soft_fertility",
    "docs_ccnet_perlang",
    "events_kmv_range_store",
]


# Round-11 surface: the store-served ingest replay (first call drives the
# full micro-batched ingest through the maintained stores; best-of-2 keeps
# the committed-table audit read — the store-served precedent) and the
# perceptual-hash image near-dup. Eighth set.
R11_SET = [
    "pipeline_store_served_replay",
    "docs_image_near_dup",
    "dedup_incremental_exact",
    "docs_audio_near_dup",
    "docs_video_near_dup",
    "dedup_incremental_clusters",
    "emb_kmeans_train",
    "emb_incremental_clusters",
    "events_series_knn",
    "events_series_motif",
]


# Round-12 surface: the maintained multimodal fingerprint index driven
# end to end (first call = the 4-batch incremental replay, best-of-2
# keeps the committed-pairs audit read) and the cross-user matched-window
# AB-join. Ninth set.
R12_SET = [
    "docs_media_incremental_near_dup",
    "events_series_matched_windows",
]


# Round-13 surface: the text-class corpus profile (one JVM-regex scan
# over the documents table). Tenth set.
R13_SET = [
    "docs_textclass_profile",
]


# Round-14 surface: binary-quantization ANN, hybrid RRF retrieval (built
# on the shared postings index — its build cost is paid inside this set's
# first call, best-of-2 keeps the index-served path), exact triangle
# counting, and the Matryoshka-truncation recall eval. Eleventh set.
R14_SET = [
    "emb_bitq_search",
    "emb_bitq_recall",
    "docs_hybrid_rrf_search",
    "graph_triangles",
    "emb_matryoshka_recall",
    "events_scd2_intervals",
    "events_ohlc_bars",
    "dedup_cluster_stats",
    "docs_split_contamination",
    "docs_weighted_sample",
]


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


# --- host-contention canary -------------------------------------------------
# The r12 driver artifact read 2.44x the record with IDENTICAL input rows,
# bytes, and shuffle bytes on every query — pure host contention (a second
# JVM on the box inflates walls 2-2.5x, CLAUDE.md), but the gate only saw
# the headline number. Every set subprocess now times q1 (3 stages, ~0.25 s
# of task time quiet) as a canary BEFORE its set; the orchestrator compares
# the canary's task_time at identical work against the committed quiet band
# below. Inflated sets are re-run (bounded), and the final artifact carries
# a machine-readable `contention` block — canary ratios per set + load
# averages — so the artifact itself proves whether inflation is host or code
# without consulting BASELINE.md.
#
# Anchor: the DEDICATED canary's quiet band (r13 calibration run, quiet
# host: task 288-378 ms / wall 0.73-0.97 s across ten fresh JVMs). A
# dedicated early-in-JVM canary reads ~1.1-1.5x hotter than the same
# query mid-set in a deep-warmed JVM (the 9f83044 in-set reading was
# 257 ms task), so the anchor must be canary-calibrated, not set-
# calibrated — the first threshold choice (1.3x over the in-set anchor)
# tripped on quiet day-band variance and burned the retry budget.
CANARY_QUERY = "q1_pricing_summary"
CANARY_ANCHOR = {
    "sf": 0.1,
    "wall_sec": 0.78,
    "task_time_ms": 300,
    "input_rows": 600_000,
    "input_bytes": 17_841,
}
# task_time is the primary signal (executor CPU at constant work — the host
# signature); wall alone schedules noisier. The r12 contended-driver
# signature was task x3.9 over this anchor; quiet day-band variance stays
# under ~1.3x. 1.6x task OR 2.0x wall trips.
CANARY_TASK_RATIO = 1.6
CANARY_WALL_RATIO = 2.0
MAX_SET_ATTEMPTS = 2  # one retry per contended set...
# ...from a shared budget (bounds total wall). Default raised 4→6 when the
# steal gate landed: per-set steal trips fire more often on a bursty day,
# and 4 was sized for canary-only trips. Env-tunable like the steal gate.
GLOBAL_RETRY_BUDGET = int(os.environ.get("BENCH_RETRY_BUDGET", "6"))
# Hypervisor steal gate: the canary is a POINT sample before the set, so a
# steal burst INSIDE the set (r14: task_time 2-7x at identical rows/bytes
# on every r11 query while the canary read 1.35 quiet) is invisible to it.
# /proc/stat's steal field integrates external interference over the whole
# set window and counts only CPU the hypervisor withheld — our own load
# lands in user/system, so the meter cannot be self-tripped. Quiet probes
# read 0.2-0.5%; a burst window read 3.1% on an ADJACENT idle probe and
# 2-7x task inflation inside the set. Local default 5%, env-tunable for
# hosts with different virtualization (scale-dependent settings rule).
# Since r15 steal_pct is normalized by NON-idle ticks (r14 ADVICE): the
# same physical burst reads higher than under the old total-tick
# normalization (a 3% total-tick burst at ~40% busy reads ~7.5%), so the
# gate is MORE sensitive at the same 5% default — that is the intent.
STEAL_PCT_MAX = float(os.environ.get("BENCH_STEAL_PCT_MAX", "5.0"))


def _cpu_ticks() -> tuple[int, int, int] | None:
    """(steal_ticks, total_ticks, idle_ticks) from /proc/stat, None
    off-Linux. Sums only user..steal (v[:8]): guest/guest_nice are
    already folded into user/nice by the kernel, so including them
    double-counts busy time (r14 ADVICE). idle is returned separately so
    steal_pct can be normalized by NON-idle ticks — on a mostly-idle
    host, idle ticks in the denominator dilute a burst that inflated the
    few busy queries 2-7x below the gate (r14 ADVICE)."""
    try:
        with open("/proc/stat") as f:
            v = [int(x) for x in f.readline().split()[1:]]
        return v[7], sum(v[:8]), v[3]
    except (OSError, IndexError, ValueError):
        return None


def _canary_disposition(canary: dict | None, sf: float) -> dict:
    """Classify one set's canary reading against the committed anchor.

    Returns {"ratio": float|None, "contended": bool, ...} — ratio is None
    (and contended False) when no comparison is possible: wrong sf, UI
    capture unavailable, or the canary's work volume no longer matches the
    anchor (testdata regeneration changed row counts — a ratio at different
    work would be meaningless)."""
    if canary is None or sf != CANARY_ANCHOR["sf"]:
        return {"ratio": None, "contended": False, "reason": "no_anchor"}
    rows, ref_rows = canary.get("input_rows"), CANARY_ANCHOR["input_rows"]
    if not rows or abs(rows - ref_rows) > 0.2 * ref_rows:
        return {"ratio": None, "contended": False, "reason": "work_mismatch"}
    task_ratio = canary["task_time_ms"] / CANARY_ANCHOR["task_time_ms"]
    wall_ratio = canary["wall_sec"] / CANARY_ANCHOR["wall_sec"]
    contended = task_ratio > CANARY_TASK_RATIO or wall_ratio > CANARY_WALL_RATIO
    return {
        "ratio": round(max(task_ratio, wall_ratio), 2),
        "task_ratio": round(task_ratio, 2),
        "wall_ratio": round(wall_ratio, 2),
        "contended": contended,
        "reason": "measured",
    }


# Executor/scheduler noise that is known-benign in this harness: accumulator
# updates arriving from stages AQE already cancelled/replanned race the
# DAGScheduler and print a stack trace without affecting any result (the
# BENCH_r02 tail). Anything trace-shaped NOT matching these fails the run
# loudly instead of hiding in a log.
_BENIGN_STDERR = (
    "updateAccumulators",
    "TaskKilled",
    "another attempt succeeded",
    "Stage cancelled",
    "SparkContext was shut down",
)


def _trace_shaped(line: str) -> bool:
    return (
        " ERROR " in line
        or "Exception" in line
        or "Error:" in line
        or line.lstrip().startswith("at ")
        or line.startswith("Caused by")
    )


def classify_stderr(text: str) -> tuple[str, list[str]]:
    """('clean'|'benign'|'unexpected', offending lines).

    Trace-shaped lines are grouped into blocks (a new log ERROR header or
    any non-trace line starts a new block); a block is benign when any of
    its lines matches a known-benign pattern — the whole trace belongs to
    that scheduler event, frames included."""
    blocks: list[list[str]] = []
    current: list[str] | None = None
    for line in text.splitlines():
        if not _trace_shaped(line):
            current = None
            continue
        if " ERROR " in line or current is None:
            current = [line]
            blocks.append(current)
        else:
            current.append(line)
    bad = [b for b in blocks if not any(p in l for l in b for p in _BENIGN_STDERR)]
    if bad:
        return "unexpected", [l for b in bad for l in b][:20]
    return ("benign", []) if blocks else ("clean", [])


#: name -> query list; the per-set subprocess unit. Each set runs in its
#: own fresh JVM: a 170-query run in ONE JVM measurably inflates late sets
#: (accumulated plan/codegen/GC state — r8 A/B 15.9 vs 10.9 s; r10:
#: docs_bm25_search 3.34 s in-set vs 1.11 s isolated), so set-position
#: contamination was polluting the driver artifact. Subprocess isolation
#: makes every set's numbers fresh-JVM comparable; JVM startup/warmup is
#: paid outside the timed region exactly as before.
SETS = {
    "headline": HEADLINE,
    "extended": EXTENDED,
    "r3": R3_SET,
    "r5": R5_SET,
    "r8": R8_SET,
    "r9": R9_SET,
    "r10": R10_SET,
    "r11": R11_SET,
    "r12": R12_SET,
    "r13": R13_SET,
    "r14": R14_SET,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if len(sys.argv) >= 3 and sys.argv[1] == "--set":
        _child(sys.argv[2], sf_dir)
        return
    payload, verdict, lines = _orchestrate(sf_dir)
    payload["stderr_classification"] = verdict
    # The driver records only the LAST ~2000 chars of the stdout line: the
    # r13 artifact lost metric/value entirely because the full contention
    # block happened to be the final key. Same single line, same content —
    # but bulky diagnostics (work volumes, per-set per-query timings) are
    # serialized FIRST and the contract keys (queries/sf/metric/unit/value)
    # LAST, so any tail window of the line is self-sufficient. Full payload
    # also lands in BENCH_LOCAL.json.
    tail_keys = [
        *[f"{s}_total" for s in SETS if f"{s}_total" in payload],
        "postings_index_build_sec",
        "stderr_classification",
        "queries",
        "sf",
        "metric",
        "unit",
        "value",
    ]
    head = {k: v for k, v in payload.items() if k not in tail_keys}
    stdout_line = {**head, **{k: payload[k] for k in tail_keys if k in payload}}
    print(json.dumps(stdout_line))
    # Self-sufficient on-disk artifact (totals FIRST — readable even if the
    # recorded stdout line is clipped from either end).
    ordered = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": payload["unit"],
        "sf": payload["sf"],
        **{
            f"{s}_total": payload[f"{s}_total"]
            for s in SETS
            if s != "headline" and f"{s}_total" in payload
        },
        "stderr_classification": verdict,
        **payload,
    }
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"),
            "w",
        ) as f:
            json.dump(ordered, f)
            f.write("\n")
    except OSError:
        pass  # read-only checkout must not fail the bench
    if verdict == "benign":
        print(
            "bench stderr: known-benign scheduler trace "
            "(cancelled-stage accumulator update)",
            file=sys.stderr,
        )
    elif verdict == "unexpected":
        print("bench stderr: UNEXPECTED executor/scheduler errors:", file=sys.stderr)
        for line in lines:
            print(f"  {line}", file=sys.stderr)
        sys.exit(2)


def _orchestrate(sf_dir: str) -> tuple[dict, str, list[str]]:
    """Run every bench set in its own subprocess (fresh JVM each) and
    aggregate into the historical single-JSON payload shape. Child stderr
    (log4j + executor traces) is captured per set and classified with the
    same benign/unexpected taxonomy as the old in-process capture."""
    import subprocess

    def run_once(name: str) -> tuple[dict, str, list[str]]:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--set", name],
            capture_output=True,
            text=True,
            env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
        )
        if p.returncode != 0:
            sys.stderr.write(p.stderr[-4000:])
            print(f"bench set {name} FAILED rc={p.returncode}", file=sys.stderr)
            sys.exit(2)
        line = next(
            (
                l
                for l in reversed(p.stdout.splitlines())
                if l.startswith('{"bench_set"')
            ),
            None,
        )
        if line is None:
            sys.stderr.write(p.stderr[-4000:])
            print(f"bench set {name}: no result line on stdout", file=sys.stderr)
            sys.exit(2)
        v, lines = classify_stderr(p.stderr)
        return json.loads(line), v, lines

    sf = sf_of(sf_dir)
    results: dict[str, dict] = {}
    verdicts: list[str] = []
    bad: list[str] = []
    contention_sets: dict[str, dict] = {}
    retry_budget = GLOBAL_RETRY_BUDGET
    for name in [*SETS, "write_path"]:
        attempts: list[tuple[dict, dict, str, list[str]]] = []
        while True:
            res, v, lines = run_once(name)
            disp = _canary_disposition(res.get("canary"), sf)
            # steal over the set's own window (see STEAL_PCT_MAX): trips
            # the same retry as a hot canary — the burst the point-sample
            # canary cannot see.
            steal = res.get("steal_pct")
            disp["steal_pct"] = steal
            if steal is not None and steal > STEAL_PCT_MAX:
                disp["contended"] = True
                disp["reason"] = "steal"
            try:
                disp["load_avg"] = [round(x, 2) for x in os.getloadavg()]
            except OSError:
                pass
            attempts.append((disp, res, v, lines))
            if not disp["contended"]:
                break
            if len(attempts) >= MAX_SET_ATTEMPTS or retry_budget <= 0:
                break
            retry_budget -= 1
            print(
                f"bench set {name}: canary x{disp['ratio'] or 'n/a'} / "
                f"steal {disp['steal_pct']}% at identical work — "
                "re-running (host contention)",
                file=sys.stderr,
            )
        # prefer MEASURED attempts: a retry whose canary work capture
        # failed (ratio None — no Spark UI snapshot) carries no contention
        # evidence and must never outrank a measured quiet attempt; only
        # when every attempt is unmeasured does the first one win (r13
        # ADVICE). Non-contended attempts outrank contended ones outright
        # (a quiet-steal attempt with a hot canary is still contended);
        # within a class, steal ranks first (it integrates the whole set
        # window) and the canary ratio tie-breaks.
        disp, res, v, lines = min(
            attempts,
            key=lambda a: (
                a[0]["contended"],
                a[0]["steal_pct"]
                if a[0]["steal_pct"] is not None
                else float("inf"),
                a[0]["ratio"] if a[0]["ratio"] else float("inf"),
            ),
        )
        results[name] = res
        verdicts.append(v)
        bad.extend(lines)
        contention_sets[name] = {**disp, "attempts": len(attempts)}

    work: dict[str, dict] = {}
    for r in results.values():
        work.update(r.get("work") or {})
    timings = results["headline"]["timings"]
    payload = {
        "work": work,
        "queries": timings,
        "write_path": results["write_path"]["write_path"],
        "postings_index_build_sec": results["r5"]["postings_index_build_sec"],
        "sf": sf_of(sf_dir),
        "metric": "headline_queries_total",
        "unit": "sec",
        "value": round(sum(timings.values()), 3),
    }
    # every non-headline set rides into the artifact by name — a new
    # round's set must never silently drop out of the payload (the r14
    # set ran but was absent because this block hard-coded r3..r13)
    for set_name in SETS:
        if set_name == "headline":
            continue
        t = results[set_name]["timings"]
        payload[set_name] = t
        payload[f"{set_name}_total"] = round(sum(t.values()), 3)
    ratios = [d["ratio"] for d in contention_sets.values() if d.get("ratio")]
    # an attempt counts as measured when EITHER instrument produced a
    # reading: the canary work capture ("measured") or the steal meter
    # (steal_pct is not None). The old `reason in ("measured","steal")`
    # form was dead code — reason is only "steal" on contended attempts,
    # which take the host_contention branch before this filter — so a
    # quiet steal reading on a no-anchor-canary set never yielded "quiet"
    # (r14 ADVICE).
    measured = [
        d
        for d in contention_sets.values()
        if d["reason"] == "measured" or d.get("steal_pct") is not None
    ]
    payload["contention"] = {
        "anchor": CANARY_ANCHOR,
        "canary_query": CANARY_QUERY,
        "thresholds": {
            "task": CANARY_TASK_RATIO,
            "wall": CANARY_WALL_RATIO,
            "steal_pct": STEAL_PCT_MAX,
        },
        "sets": contention_sets,
        "max_canary_ratio": max(ratios) if ratios else None,
        "retries_used": GLOBAL_RETRY_BUDGET - retry_budget,
        # host_contention = a set still shows inflated canary CPU at
        # identical rows/bytes after its retry: wall numbers in that set are
        # host-inflated by ~the canary ratio, not plan/data growth.
        "disposition": (
            "host_contention"
            if any(d["contended"] for d in contention_sets.values())
            else ("quiet" if measured else "no_anchor")
        ),
    }
    verdict = (
        "unexpected"
        if "unexpected" in verdicts
        else ("benign" if "benign" in verdicts else "clean")
    )
    return payload, verdict, bad[:20]


def _child(set_name: str, sf_dir: str) -> None:
    spark = get_spark(
        app_name=f"affinity-spark-bench-{set_name}",
        # UI on for the work-volume REST capture; retention high enough
        # that a full set cannot evict a stage between the before/after
        # snapshots of a single query.
        conf={"spark.ui.enabled": "true", "spark.ui.retainedStages": "40000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # Warmup: absorb session/codegen startup so per-query numbers are honest.
    queries["q6_forecast_revenue"](spark, sf_dir).count()

    # Best-of-N per query (default 2): the first run pays JVM JIT + codegen
    # compilation, later runs measure the steady-state plan (what a
    # long-running cluster actually sees). Raise BENCH_REPEATS on noisy
    # hosts for a tighter minimum. Library-persisted shared frames are
    # drained after each query's repeats so one query's cache entries
    # can't substitute into a later query's plan.
    from affinity_spark.cache import release_shared

    repeats = max(int(os.environ.get("BENCH_REPEATS", "2")), 1)

    # Consume via the built-in noop sink, NOT count(): count lets the
    # optimizer eliminate outer-joins-to-unique-keys, generates, and final
    # sorts — 8 registry queries lost their core joins under count() (an
    # audited r8 finding; emb_lsh_recall elided all six). The noop write
    # computes and materializes every output row executor-side and
    # discards it — full query cost, zero driver ingest.
    def consume(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    work: dict[str, dict] = {}

    def time_set(names: list[str]) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in names:
            fn = queries[name]
            best = float("inf")
            for i in range(repeats):
                last = i == repeats - 1
                before = _stage_snapshot(spark) if last else None
                t0 = time.perf_counter()
                consume(fn(spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
                if last:
                    # Steady-state work volume: the LAST repeat's stages
                    # (shared index/cache builds land on repeat 1).
                    delta = _work_delta(before, _stage_snapshot(spark))
                    if delta is not None:
                        work[name] = delta
            out[name] = round(best, 3)
            release_shared()
        return out

    result: dict = {"bench_set": set_name}

    # Steal meter: /proc/stat deltas over the whole timed region (canary
    # through last query) — catches intra-set hypervisor bursts the
    # point-sample canary misses.
    ticks0 = _cpu_ticks()

    # Canary: best-of-2 q1 with work capture, before the set. Cheap (~0.7 s
    # quiet), constant work (600k rows / 3 stages at sf0.1), and its
    # task_time at identical rows/bytes is the host-contention instrument
    # the orchestrator gates on (see CANARY_ANCHOR).
    canary_fn = queries.get(CANARY_QUERY)
    if canary_fn is not None:
        c_wall = float("inf")
        c_work: dict | None = None
        for i in range(2):
            before = _stage_snapshot(spark) if i == 1 else None
            t0 = time.perf_counter()
            consume(canary_fn(spark, sf_dir))
            c_wall = min(c_wall, time.perf_counter() - t0)
            if i == 1:
                c_work = _work_delta(before, _stage_snapshot(spark))
        release_shared()
        if c_work is not None:
            result["canary"] = {
                "wall_sec": round(c_wall, 3),
                "task_time_ms": c_work["task_time_ms"],
                "input_rows": c_work["input_rows"],
                "input_bytes": c_work["input_bytes"],
            }

    if set_name == "write_path":
        result["write_path"] = _write_path_bench(spark, sf_dir)
        result["timings"] = {}
    else:
        if set_name in ("r3", "r5"):
            # the retrieval family (docs_phrase_search in r3; bm25/tfidf
            # in r5) reads the materialized postings index. Build it
            # eagerly and report the build as its own metric — a
            # deployment maintains the index incrementally; folding a
            # full build into one query's time would misstate both.
            t0 = time.perf_counter()
            from affinity_spark.registry import docs as _registry_docs

            _registry_docs._postings(spark, sf_dir)
            if set_name == "r5":
                result["postings_index_build_sec"] = round(
                    time.perf_counter() - t0, 3
                )
        result["timings"] = time_set(SETS[set_name])
    result["work"] = work
    ticks1 = _cpu_ticks()
    if ticks0 is not None and ticks1 is not None:
        ds = ticks1[0] - ticks0[0]
        # non-idle denominator (r14 ADVICE): steal relative to the CPU
        # actually contended for, so idle headroom on a 32-CPU host can't
        # dilute a burst below the gate over a long set window.
        dbusy = (ticks1[1] - ticks1[2]) - (ticks0[1] - ticks0[2])
        if dbusy > 0:
            result["steal_pct"] = round(100.0 * ds / dbusy, 2)
    # one machine-readable line, newline-guarded against interleaved logs
    sys.stdout.flush()
    print("\n" + json.dumps(result), flush=True)


def _write_path_bench(spark, sf_dir: str) -> dict:
    """Write-path throughput against BASELINE.md's reference floors
    (>=500 state writes/s/partition, ConfluentEcoSystemSpec.scala:94-110):
    KeyedTable snapshot build + merge-upsert throughput, and streaming
    micro-batch latency through the foreachBatch merge sink."""
    import json as _json
    import shutil
    import tempfile

    from affinity_spark.sources.keyed_table import KeyedTable
    from affinity_spark.streaming.sinks import foreach_batch_merge
    from affinity_spark.tables import load as load_table

    base_dir = tempfile.mkdtemp(prefix="bench-write-")
    out: dict = {}
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            "event_type",
            (F.unix_millis(F.col("ts"))).alias("ts_ms"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        n = ev.count()
        # Warm the WRITE path before timing: the subprocess JVM's generic
        # warmup is a read-only query, so the first parquet write would
        # otherwise pay writer/codegen/committer startup inside the timed
        # section — the r11 artifact showed a 5x snapshot-rate drop from
        # exactly this (r11 verdict #2). A small untimed overwrite +
        # upsert compiles both write plans first.
        warm = KeyedTable(
            spark, os.path.join(base_dir, "warm"), ["event_id"], "ts_ms"
        )
        warm.overwrite(ev.limit(2_000))
        warm.upsert(ev.limit(200))
        tbl = KeyedTable(spark, os.path.join(base_dir, "t"), ["event_id"], "ts_ms")
        t0 = time.perf_counter()
        tbl.overwrite(ev)
        t_build = time.perf_counter() - t0
        updates = ev.filter(F.col("event_id") % 10 == 0).withColumn(
            "cents", F.col("cents") + 1
        )
        n_up = updates.count()
        t0 = time.perf_counter()
        tbl.upsert(updates)
        t_upsert = time.perf_counter() - t0
        out["table_rows"] = n
        out["snapshot_build_rows_per_sec"] = round(n / t_build)
        out["upsert_updates"] = n_up
        # merge cost is the full last-write-wins rewrite; both rates recorded
        out["upsert_updates_per_sec"] = round(n_up / t_upsert)
        out["upsert_merged_rows_per_sec"] = round(n / t_upsert)

        # streaming micro-batch latency: 5 single-file batches through the
        # foreachBatch merge sink (the S4 ingest spine)
        src = os.path.join(base_dir, "in")
        os.makedirs(src)
        rows = ev.limit(10_000).collect()
        per_batch = max(1, len(rows) // 5)
        for i in range(5):
            chunk = rows[i * per_batch : (i + 1) * per_batch]
            tmp = os.path.join(src, f".b{i}.tmp")
            with open(tmp, "w") as f:
                for r in chunk:
                    f.write(_json.dumps(r.asDict()) + "\n")
            os.rename(tmp, os.path.join(src, f"b{i}.json"))
            os.utime(os.path.join(src, f"b{i}.json"), (1_700_000_000 + i,) * 2)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        q = (
            stream.writeStream.foreachBatch(
                foreach_batch_merge(os.path.join(base_dir, "st"), ["event_id"], "ts_ms")
            )
            .option("checkpointLocation", os.path.join(base_dir, "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            progress = [p for p in q.recentProgress if p.numInputRows > 0]
        finally:
            q.stop()
        execs = [p.durationMs["triggerExecution"] for p in progress]
        batch_rows = sum(int(p.numInputRows) for p in progress)
        if execs:
            out["stream_batches"] = len(execs)
            out["stream_batch_ms_avg"] = round(sum(execs) / len(execs))
            out["stream_rows_per_sec"] = round(batch_rows / (sum(execs) / 1000.0))

        # gateway write path (r13 verdict #8): HTTP POST → from_json
        # schema coercion → CAS merge commit, through a real socket — the
        # serving surface gets the same regression tracking as the engine.
        # Each POST pays one full last-write-wins merge by design (the
        # single-writer front), so the rate is per-request merge cost, not
        # bulk ingest.
        import urllib.request

        from affinity_spark.serving import ServingGateway
        from affinity_spark.serving_http import HttpGateway

        gw_tbl = KeyedTable(
            spark, os.path.join(base_dir, "gw"), ["event_id"], "ts_ms"
        )
        gw_tbl.overwrite(ev.limit(2_000))
        hg = HttpGateway()
        hg.register("events", ServingGateway(table=gw_tbl), gw_tbl.read().schema)
        port = hg.start()
        try:
            def post(chunk):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/kv/events",
                    data=_json.dumps(chunk).encode(),
                    headers={"Content-Type": "application/json"},
                    method="POST",
                )
                with urllib.request.urlopen(req, timeout=120) as r:
                    r.read()

            http_rows = [r.asDict() for r in ev.limit(1_010).collect()]
            post(http_rows[:10])  # warm the POST->merge plan, untimed
            per = 100
            chunks = [
                http_rows[i : i + per] for i in range(10, len(http_rows), per)
            ]
            t0 = time.perf_counter()
            for c in chunks:
                post(c)
            dt = time.perf_counter() - t0
            out["http_posts"] = len(chunks)
            out["http_post_ms_avg"] = round(dt / len(chunks) * 1000)
            out["http_upserts_per_sec"] = round(
                sum(len(c) for c in chunks) / dt
            )
        finally:
            hg.stop()
    finally:
        shutil.rmtree(base_dir, ignore_errors=True)
    return out


if __name__ == "__main__":
    main()
