"""JSONL ingestion: clean rows flow, malformed lines dead-letter (never
silently dropped), counts reconcile."""

from __future__ import annotations

import os

from affinity_spark.sources.jsonl import read_jsonl, split_corrupt


def test_jsonl_corrupt_lines_are_dead_lettered(spark, tmp_path):
    p = str(tmp_path / "shard.jsonl")
    lines = [
        '{"doc_id": 1, "text": "alpha beta"}',
        "this is not json at all",
        '{"doc_id": 2, "text": "gamma delta"}',
        '{"doc_id": "NaN-ish", "text": 3}',  # type mismatch -> corrupt
        '{"doc_id": 3, "text": "epsilon"}',
    ]
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")

    df = read_jsonl(spark, p, "doc_id BIGINT, text STRING").cache()
    try:
        clean, dead = split_corrupt(df)
        got = {r.doc_id: r.text for r in clean.collect()}
        assert got == {1: "alpha beta", 2: "gamma delta", 3: "epsilon"}
        raws = [r.raw_line for r in dead.collect()]
        assert len(raws) == 2
        assert "not json" in raws[0]
        # nothing lost: clean + dead == input lines
        assert clean.count() + dead.count() == len(lines)
    finally:
        df.unpersist()


def test_jsonl_all_clean_shard(spark, tmp_path):
    p = str(tmp_path / "ok.jsonl")
    with open(p, "w") as f:
        for i in range(10):
            f.write('{"doc_id": %d, "text": "t%d"}\n' % (i, i))
    df = read_jsonl(spark, p, "doc_id BIGINT, text STRING").cache()
    try:
        clean, dead = split_corrupt(df)
        assert clean.count() == 10
        assert dead.count() == 0
    finally:
        df.unpersist()
