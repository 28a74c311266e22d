"""Overlapping token-window chunking: coverage, boundary, and plan shape."""

import hashlib

from pyspark.sql import functions as F

from affinity_spark.operators.chunking import chunk_tokens


def _chunks_model(text: str, size: int, overlap: int):
    toks = [t for t in text.lower().strip().split() if t]
    if not toks:
        return []
    stride = size - overlap
    n_chunks = max(-(-(len(toks) - overlap) // stride), 1)
    out = []
    for i in range(n_chunks):
        piece = toks[i * stride : i * stride + size]
        out.append(
            (i, len(piece), hashlib.md5(" ".join(piece).encode()).hexdigest())
        )
    return out


def test_chunk_boundaries_match_python_model(spark):
    cases = [
        (1, "one two three"),                      # shorter than one chunk
        (2, " ".join(f"w{i}" for i in range(8))),  # exactly one chunk (n == size)
        (3, " ".join(f"w{i}" for i in range(9))),  # one token past → 2 chunks
        (4, " ".join(f"w{i}" for i in range(23))), # several chunks, short tail
        (5, ""),                                   # empty → dropped
        (6, "   "),                                # whitespace-only → dropped
    ]
    df = spark.createDataFrame(cases, "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_tokens, r.chunk_md5)
        for r in chunk_tokens(df, chunk_size=8, overlap=3).collect()
    }
    want = {}
    for doc_id, text in cases:
        for idx, n, h in _chunks_model(text, 8, 3):
            want[(doc_id, idx)] = (n, h)
    assert got == want
    assert not [k for k in got if k[0] in (5, 6)]


def test_every_token_covered_and_overlap_exact(spark):
    n_tokens = 100
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(n_tokens)))], "doc_id long, text string"
    )
    rows = sorted(
        chunk_tokens(df, chunk_size=16, overlap=4).collect(),
        key=lambda r: r.chunk_idx,
    )
    # stride 12: chunks start at 0,12,24,... covering [start, start+16)
    starts = [r.chunk_idx * 12 for r in rows]
    ends = [s + r.chunk_tokens for s, r in zip(starts, rows)]
    assert starts[0] == 0
    assert ends[-1] == n_tokens
    # consecutive full chunks overlap by exactly 4; no gaps anywhere
    for i in range(len(rows) - 1):
        assert starts[i + 1] == starts[i] + 12
        assert ends[i] - starts[i + 1] == 4


def test_chunking_is_shuffle_free(spark):
    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 10) for i in range(50)],
        "doc_id long, text string",
    )
    plan = chunk_tokens(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
