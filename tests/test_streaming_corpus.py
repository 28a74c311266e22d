"""Streaming corpus ingest: the training-pipeline ops composed over a
document STREAM — quality gate, cross-batch exact dedup (stateful
dropDuplicates on the content fingerprint), and split assignment — proving
the corpus-management family is a pure projection/filter layer that rides
micro-batches unchanged (SURVEY §2.11 + phase-6 extension set)."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from affinity_spark.functions.text import doc_fingerprint, token_count
from affinity_spark.operators.sampling import train_split

LONG_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
LONG_B = "one two three four five six seven eight nine ten eleven twelve"
SHORT = "too short"


@pytest.fixture()
def run_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    sink = f"stream_corpus_sink_{tmp_path.name}"

    stream = spark.readStream.schema("doc_id long, text string").json(src)
    cleaned = (
        stream.withColumn("n_tokens", token_count(F.col("text")))
        .filter(F.col("n_tokens") >= 10)
        .withColumn("fp", doc_fingerprint(F.col("text")))
        .dropDuplicates(["fp"])  # stateful: cross-batch exact dedup
    )
    labeled = train_split(cleaned, "doc_id").select(
        "doc_id", "n_tokens", "split"
    )
    q = (
        labeled.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )

    def feed(name, rows):
        tmp = os.path.join(src, f".{name}.tmp")
        with open(tmp, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.rename(tmp, os.path.join(src, name))
        q.processAllAvailable()
        return {
            r.doc_id: (r.n_tokens, r.split)
            for r in spark.sql(f"SELECT * FROM {sink}").collect()
        }

    yield feed
    q.stop()


def test_streaming_corpus_quality_dedup_split(run_stream):
    got = run_stream(
        "b0.json",
        [
            {"doc_id": 1, "text": LONG_A},
            {"doc_id": 2, "text": SHORT},  # quality-gated out
            {"doc_id": 3, "text": LONG_A},  # exact dup of 1, same batch
        ],
    )
    assert set(got) == {1}
    assert got[1][0] == 12

    # cross-batch: the duplicate arrives a batch later and is still dropped;
    # new content passes and gets a split label
    got = run_stream(
        "b1.json",
        [
            {"doc_id": 4, "text": LONG_A},  # dup of doc 1 from batch 0
            {"doc_id": 5, "text": LONG_B},
        ],
    )
    assert set(got) == {1, 5}
    assert got[5][1] in ("train", "val", "test")

    # split assignment in the stream matches the batch operator bit-for-bat
    # (pure function of doc_id — no state involved)
    import hashlib

    bucket = int(hashlib.md5(b"5").hexdigest()[:8], 16) % 1000
    expect = "train" if bucket < 900 else ("val" if bucket < 950 else "test")
    assert got[5][1] == expect
