"""Scale rehearsal: measure how query families scale from sf0.1 to ~sf1.

The closest local[32] proxy for the 100x question: build a 10x-scaled
copy of the bench tables, time the same queries at both scales, and
record the per-query scaling exponent e = log(t_big/t_small)/log(K).
Linear engine scaling reads e <= ~1 (sub-linear when fixed overheads
amortize); anything clearly super-linear is a scale bug UNLESS the
operator is inherently cell-quadratic (within-bucket pair generation is
sum-of-|cell|^2 BY CONTRACT — at real scale you grow the bucket count
with the data, which the synthetic scaling deliberately does not).

Scaling construction (engine-honest, dup-rate preserving):
- documents: K copies, doc_id remapped; every WORD suffixed with the copy
  index so no cross-copy shingle collides — the within-copy near-dup
  structure replicates exactly, so dup density stays constant (naive
  concatenation would give every doc K-1 near-identical twins and measure
  a data artifact, not the engine).
- embeddings: K copies, vec_id remapped, one dimension nudged per copy
  (no exact cross-copy duplicates).
- events: K copies, event_id/user_id remapped (distinct-key count scales
  with the data, as it would in production).
- all other tables symlinked unchanged (dimension-table role).

Usage: python tools/scale_rehearsal.py [K] [query ...]
Writes the scaled tables under /tmp/affinity-scale-sfK/ (reused if
present) and prints one JSON line per query plus a summary line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from affinity_spark import get_spark
from affinity_spark.cache import release_shared
from affinity_spark.tables import TABLES, load

BASE_SF = "/root/testdata/sf0.1"

DEFAULT_QUERIES = [
    # dedup family
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_winnow_pairs",
    "docs_span_dedup",
    # pipelines
    "pipeline_clean_corpus",
    "pipeline_training_corpus",
    "pipeline_streaming_replay",
    # text hygiene + packing (r8)
    "docs_unicode_scrub",
    "docs_pack_bestfit",
    # ANN family
    "emb_knn_brute",
    "emb_ivfpq_search",
    "emb_pq_codes",
    "emb_incremental_search",
    # text/LM family
    "docs_lm_bits",
    "docs_quality_classifier",
    "docs_bloom_decontam",
    "emb_srp_recall",
    "docs_chunk_overlap",
    "word_count",
    # index-served retrieval (r5: materialized postings; first call per
    # corpus pays the one-scan index build, best-of-2 keeps the query path)
    "docs_tfidf_pairs",
    "docs_bm25_search",
    "docs_phrase_search",
    "docs_proximity_search",
    # iterative graph + sketches over events
    "graph_components",
    "events_cms_counts",
    "events_sessionize",
    # r9: the last heavy queries without a recorded exponent (r8 verdict
    # Next #4) — LSH-verify-bound canonicalization/splitting, the two
    # sequential-state batch twins, the BPE apply path, diversity
    # sampling, and the KN perplexity filter (new r9)
    "dedup_quality_canonical",
    "docs_leakage_free_split",
    "docs_online_lsh_state",
    "events_debounce_state",
    "docs_bpe_segment",
    "emb_diverse_sample",
    "docs_lm_bits_kn",
    "docs_ccnet_buckets",
    "emb_pq_batch_search",
    "emb_ivfpq_recall",
    "docs_filter_ensemble",
    "docs_unigram_segment",
    "events_hll_range_store",
    "events_dd_range_store",
    "docs_unigram_em",
    "docs_unigram_fertility",
    "docs_quality_signals",
    "docs_unigram_soft_em",
    "docs_unigram_soft_fertility",
    "docs_ccnet_perlang",
    "events_kmv_range_store",
]


def build_scaled(spark, k: int) -> str:
    out_dir = f"/tmp/affinity-scale-sf{k}"
    marker = os.path.join(out_dir, "_done")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    copies = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("_copy")

    docs = load(spark, BASE_SF, "documents")
    id_cols = [c for c in docs.columns if c not in ("doc_id", "text")]
    (
        docs.select("*", copies)
        .select(
            (F.col("doc_id") + F.col("_copy").cast("long") * F.lit(10_000_000)).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(w, F.lit("c"), F.col("_copy").cast("string")),
                ),
                " ",
            ).alias("text"),
            *id_cols,
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "documents.parquet"))
    )

    emb = load(spark, BASE_SF, "embeddings")
    other = [c for c in emb.columns if c not in ("vec_id", "embedding")]
    (
        emb.select("*", copies)
        .select(
            (F.col("vec_id") + F.col("_copy").cast("long") * F.lit(10_000_000)).alias("vec_id"),
            # cast the nudge back to float: float + double literal widens the
            # element type to double, silently DOUBLING embedding bytes and
            # biasing the ANN family's measured scaling exponent
            F.transform(
                F.col("embedding"),
                lambda x, i: F.when(
                    i == (F.col("_copy") % F.size(F.col("embedding"))),
                    (x + F.col("_copy").cast("float") * F.lit(0.003)).cast("float"),
                ).otherwise(x),
            ).alias("embedding"),
            *other,
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "embeddings.parquet"))
    )

    ev = load(spark, BASE_SF, "events")
    rest = [c for c in ev.columns if c not in ("event_id", "user_id")]
    (
        ev.select("*", copies)
        .select(
            (F.col("event_id") + F.col("_copy").cast("long") * F.lit(1_000_000_000)).alias("event_id"),
            (F.col("user_id") + F.col("_copy").cast("long") * F.lit(1_000_000)).alias("user_id"),
            *rest,
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "events.parquet"))
    )

    for t in TABLES:
        if t in ("documents", "embeddings", "events"):
            continue
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(BASE_SF, f"{t}.parquet"), dst)
    open(marker, "w").close()
    return out_dir


def time_query(fn, spark, sf_dir: str, repeats: int = 2) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        # noop write, not count(): count lets the optimizer elide
        # outer-joins/generates/sorts on 8 registry queries (see bench.py)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        release_shared()
    return best


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark(app_name="affinity-scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    scaled = build_scaled(spark, k)
    queries = entrymod.queries()
    # warmup
    queries["q6_forecast_revenue"](spark, BASE_SF).count()
    results = {}
    for name in names:
        fn = queries[name]
        t_small = time_query(fn, spark, BASE_SF)
        t_big = time_query(fn, spark, scaled)
        ratio = t_big / t_small
        exponent = math.log(ratio) / math.log(k)
        results[name] = {
            "t_sf0.1": round(t_small, 3),
            f"t_x{k}": round(t_big, 3),
            "ratio": round(ratio, 2),
            "exponent": round(exponent, 3),
        }
        print(json.dumps({"query": name, **results[name]}), flush=True)
    worst = max(results.items(), key=lambda kv: kv[1]["exponent"])
    print(
        json.dumps(
            {
                "metric": "scale_rehearsal",
                "k": k,
                "queries": results,
                "worst": {"query": worst[0], **worst[1]},
            }
        )
    )


if __name__ == "__main__":
    main()
