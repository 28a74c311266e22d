"""Streaming near-duplicate detection: MinHash-LSH as stateful streaming.

The batch LSH tier (operators/dedup.py) finds near-dup pairs over a static
corpus; a training-data INGEST pipeline needs the same decision online —
"is this arriving document a near-dup of anything seen so far?" — without
re-scanning the corpus per batch. Spark-first:

1. map-side per-doc band hashes (``lsh_bands_mapside`` — the same
   single-expression zero-shuffle path as batch, works on streaming frames);
2. shuffle on ``(band_id, band_hash)`` — each LSH bucket is a streaming
   state key owned by one task per micro-batch (the per-key serialization
   the reference gets from partition masters, KVStoreLocal.scala:589-631);
3. ``applyInPandasWithState`` keeps each bucket's previously-seen members
   (doc_id + shingle set) and emits a candidate row per (new doc, stored
   member) whose exact Jaccard clears the threshold;
4. downstream, a per-doc aggregate (any-match) is the dedup verdict —
   kept OUT of this operator: a doc matching in k bands yields k candidate
   rows, and the caller collapses them (``dropDuplicates`` in a
   ``foreachBatch``, or a batch distinct over the sink). Chaining a second
   stateful operator directly after ``applyInPandasWithState`` trips a
   ColumnarBatchRow→UnsafeRow cast error in this Spark build (the pandas
   runner's columnar output reaches the next shuffle without a
   ColumnarToRow transition), so the collapse must live behind a sink
   boundary anyway — see CLAUDE.md.

State per bucket is bounded by bucket occupancy (near-uniform for real
corpora — same argument as the batch bucket join, MMDS ch.3); a TTL or
max-members cap bounds adversarial buckets at scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from affinity_spark.operators.dedup import doc_shingle_arrays, lsh_bands_mapside

_CAND_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("dup_of", LongType()),
        StructField("jaccard", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("shingle_sets", ArrayType(ArrayType(StringType()))),
    ]
)


def streaming_near_dup_candidates(
    docs_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_bucket_members: int = 1024,
) -> DataFrame:
    """(doc_id, dup_of, jaccard) rows for arriving docs that near-match a
    previously seen doc (arrival order: ``dup_of`` was seen first). Exact
    Jaccard verification against stored shingle sets, candidates confined
    to LSH bucket collisions — the streaming twin of ``minhash_lsh_dedup``.
    """
    arrs = doc_shingle_arrays(docs_stream, id_col, text_col, n)
    # shingles ride through the band explode (keep_cols) — no stream-stream
    # self-join, so the only streaming state is the bucket membership.
    with_bands = lsh_bands_mapside(arrs, id_col, keep_cols=("shingles",))

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            ids, sets = state.get
            ids = list(ids)
            sets = [set(s) for s in sets]
        else:
            ids, sets = [], []
        out_id, out_dup, out_j = [], [], []
        # arrival order within the batch: sort by id for determinism
        rows = []
        for pdf in pdfs:
            for did, sh in zip(pdf[id_col], pdf["shingles"]):
                rows.append((int(did), set(sh)))
        rows.sort(key=lambda r: r[0])
        for did, sh in rows:
            if did in ids:
                continue  # replay of a seen doc: no self-match, no dup state
            for prev_id, prev_sh in zip(ids, sets):
                inter = len(sh & prev_sh)
                union = len(sh) + len(prev_sh) - inter
                if union and inter / union >= threshold:
                    out_id.append(did)
                    out_dup.append(prev_id)
                    out_j.append(inter / union)
            if len(ids) < max_bucket_members:
                ids.append(did)
                sets.append(sh)
        state.update((ids, [sorted(s) for s in sets]))
        if out_id:
            yield pd.DataFrame(
                {"doc_id": out_id, "dup_of": out_dup, "jaccard": out_j}
            )

    return with_bands.groupBy("band_id", "band_hash").applyInPandasWithState(
        update,
        outputStructType=_CAND_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def online_lsh_replay(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    t_num: int = 1,
    t_den: int = 2,
    max_bucket_members: int = 1024,
) -> DataFrame:
    """Batch replay of :func:`streaming_near_dup_candidates`'s band-state
    contract — the driver-checkable twin: given the whole corpus arriving
    in id order, emit the same (doc_id, dup_of) candidate rows the
    streaming bucket state would emit, one row PER SHARED BAND BUCKET
    (the streaming operator checks each of a doc's bands independently;
    the caller collapses duplicates behind the sink boundary).

    Contract points replicated exactly:
    - arrival order = id order, so ``dup_of < doc_id``;
    - a bucket stores only its first ``max_bucket_members`` arrivals
      (row_number per bucket over id order) — later arrivals still emit
      their own matches but are never anyone's ``dup_of``;
    - exact Jaccard >= t_num/t_den over distinct shingle sets.

    Jaccard is emitted as integer basis points (``jacc_bp`` = floor of
    n_common*10000/n_union) — the cross-engine-exact projection of the
    stream's double (the repo's no-float-hash rule).
    """
    from pyspark.sql import Window

    arrs = doc_shingle_arrays(docs, id_col, text_col, n)
    bands = lsh_bands_mapside(arrs, id_col, keep_cols=("shingles", "n_shingles"))
    keys = ["band_id", "band_hash"]
    rk = F.row_number().over(
        Window.partitionBy(*keys).orderBy(F.col(id_col).asc())
    )
    ranked = bands.withColumn("_rk", rk)
    stored = ranked.filter(F.col("_rk") <= max_bucket_members).select(
        *keys,
        F.col(id_col).alias("dup_of"),
        F.col("shingles").alias("_sh_a"),
        F.col("n_shingles").alias("_n_a"),
    )
    arriving = ranked.select(
        *keys,
        F.col(id_col).alias("doc_id"),
        F.col("shingles").alias("_sh_b"),
        F.col("n_shingles").alias("_n_b"),
    )
    # Corpus × corpus on band keys: BOTH sides scale with the data (and
    # carry full shingle arrays), so broadcasting either is a driver OOM
    # waiting for scale — Catalyst's size estimate for this HOF-derived
    # frame undershoots badly enough that it planned BuildLeft broadcast
    # and died at a 30x corpus. Pin the shuffle join; buckets are already
    # cap-bounded so per-partition pair work stays ~cap².
    joined = (
        stored.hint("shuffle_hash").join(arriving, keys)
        .filter(F.col("dup_of") < F.col("doc_id"))
        .withColumn("_common", F.size(F.array_intersect("_sh_a", "_sh_b")).cast("long"))
        .withColumn("_union", F.col("_n_a") + F.col("_n_b") - F.col("_common"))
    )
    return (
        joined.filter(F.lit(t_den) * F.col("_common") >= F.lit(t_num) * F.col("_union"))
        .select(
            "doc_id",
            "dup_of",
            F.expr("(_common * 10000) div _union").alias("jacc_bp"),
        )
    )
