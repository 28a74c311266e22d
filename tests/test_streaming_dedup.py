"""Streaming MinHash-LSH near-dup detection (streaming/dedup_stream.py):
buckets as stateful keys, exact-Jaccard verify against remembered members,
cross-batch state survival."""

from __future__ import annotations

import json
import os

import pytest

from affinity_spark.streaming.dedup_stream import streaming_near_dup_candidates

DOC_A = "the quick brown fox jumps over the lazy dog again and again today"
DOC_A_NEAR = "the quick brown fox jumps over the lazy dog again and again tonight"
DOC_B = "completely different content about spark structured streaming state"
DOC_C = "unrelated third text mentioning neither foxes nor streaming topics"


def _write_jsonl(src, name, rows):
    tmp = os.path.join(src, f".{name}.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, os.path.join(src, name))


@pytest.fixture()
def run_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    sink = f"stream_dedup_sink_{tmp_path.name}"

    stream = spark.readStream.schema("doc_id long, text string").json(src)
    cands = streaming_near_dup_candidates(stream, "doc_id", "text", 3, 0.5)
    q = (
        cands.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )

    def feed(name, rows):
        _write_jsonl(src, name, rows)
        q.processAllAvailable()
        # a pair matching in k bands emits k rows; collapse like a caller would
        return {
            (r.doc_id, r.dup_of): r.jaccard
            for r in spark.sql(
                f"SELECT DISTINCT doc_id, dup_of, jaccard FROM {sink}"
            ).collect()
        }

    yield feed
    q.stop()


def test_near_dup_flagged_across_batches(run_stream):
    got = run_stream(
        "b1.json",
        [{"doc_id": 1, "text": DOC_A}, {"doc_id": 2, "text": DOC_B}],
    )
    assert got == {}  # nothing seen before: no candidates
    # batch 2: near-dup of doc 1 (state remembered across batches) + unrelated
    got = run_stream(
        "b2.json",
        [{"doc_id": 3, "text": DOC_A_NEAR}, {"doc_id": 4, "text": DOC_C}],
    )
    assert set(got) == {(3, 1)}
    assert got[(3, 1)] >= 0.5


def test_exact_dup_scores_one(run_stream):
    run_stream("b1.json", [{"doc_id": 1, "text": DOC_A}])
    got = run_stream("b2.json", [{"doc_id": 5, "text": DOC_A}])
    assert got[(5, 1)] == pytest.approx(1.0)


def test_within_batch_pair_ordered_by_arrival_id(run_stream):
    got = run_stream(
        "b1.json",
        [{"doc_id": 7, "text": DOC_A}, {"doc_id": 8, "text": DOC_A_NEAR}],
    )
    # higher id is flagged as dup of the lower (deterministic in-batch order)
    assert set(got) == {(8, 7)}
