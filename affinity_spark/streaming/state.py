"""Per-key stateful streaming operators.

The reference's whole KV layer is per-key serialized read-modify-write over
changelog-backed local state (affinity ``core/.../state/KVStoreLocal.scala``
W1-W7, continuous counting ``examples/.../ExampleWordCount.scala:35-52``).
Spark-first this is ``applyInPandasWithState``: the shuffle guarantees one
task owns a key per micro-batch (the same linearizability the reference gets
from per-key locks + master-exclusive writes, README.md:312-324), state is
checkpoint-backed (the changelog bootstrap/tail of Log.java becomes state
store recovery), and Arrow batches keep the Python hop amortized.

Request-response semantics (W5 returns the *previous* value to the caller)
don't exist in a decoupled pipeline, so — per SURVEY §7 hard-part 4 — the
operator emits (key, old, new, ts) change records downstream, preserving
the observable before/after pair on the changelog instead of the RPC reply.

Checkpoint recovery note: state survives restarts only with a recoverable
sink (foreachBatch / file / kafka). Spark's memory sink refuses checkpoint
recovery — fine for demos, wrong for the changelog story.

TTL note: with ProcessingTimeTimeout active the engine schedules periodic
batches to evaluate timeouts, so ``processAllAvailable()`` never settles —
drive TTL'd queries with a processing-time trigger and poll the sink.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def debounce_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    min_interval_ms: int,
) -> DataFrame:
    """Per-key event-time debounce: emit a key's record only when at least
    ``min_interval_ms`` has elapsed since the key's LAST EMITTED record —
    the rate-limit / change-notification-squelch every per-key push surface
    grows once subscribers exist (the reference's per-key WebSocket push,
    T7, with a client-protecting emission floor).

    Semantics (deterministic, order-defined): rows within a batch are
    processed in (ts, all-columns) order; the first row ever seen for a key
    emits; a later row emits iff ``ts >= last_emitted_ts + interval``.
    Suppressed rows are DROPPED, not queued — debounce, not throttle-delay.
    State is one long per key, checkpoint-backed like every state op here.
    """
    out_schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField("ts_ms", LongType()),
            StructField("suppressed_before", LongType()),
        ]
    )
    # state: (last emitted ts, suppressed count since that emission) — the
    # pending count rides on the NEXT emission even across batches, so no
    # drop is ever silent.
    state_schema = StructType(
        [StructField("last_ms", LongType()), StructField("pending", LongType())]
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        last, pending = (state.get if state.exists else (None, 0))
        if last == -1:
            last = None
        rows = pd.concat(list(pdfs), ignore_index=True)
        # sort by ts THEN the remaining columns so ts ties resolve
        # deterministically (not by arrival order), as documented
        order_cols = [ts_col] + [c for c in rows.columns if c != ts_col]
        rows = rows.sort_values(order_cols, kind="mergesort")
        out_ts, out_sup = [], []
        for t in rows[ts_col]:
            t_ms = int(t.value // 1_000_000) if hasattr(t, "value") else int(t)
            if last is None or t_ms >= last + min_interval_ms:
                out_ts.append(t_ms)
                out_sup.append(pending)
                last, pending = t_ms, 0
            else:
                pending += 1
        state.update((last if last is not None else -1, pending))
        if out_ts:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(out_ts),
                    "ts_ms": out_ts,
                    "suppressed_before": out_sup,
                }
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_count_stream(stream: DataFrame, key_col: str = "word") -> DataFrame:
    """A2 continuous counting: per-key running count, one output row per
    (key, micro-batch) with the updated total — the reference's word count
    emits the updated count downstream on every input record; micro-batching
    coalesces that to per-trigger, the documented at-least-once cadence
    (commit.interval.ms ≈ trigger interval)."""

    out_schema = StructType(
        [StructField(key_col, StringType()), StructField("count", LongType())]
    )
    state_schema = StructType([StructField("n", LongType())])

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n = state.get[0] if state.exists else 0
        seen = 0
        for pdf in pdfs:
            seen += len(pdf)
        if seen:
            n += seen
            state.update((n,))
            yield pd.DataFrame({key_col: [key[0]], "count": [n]})

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_n_stream(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    seq_col: str,
    n: int = 3,
) -> DataFrame:
    """X6 streaming latest-N: per key, an insertion-ordered ring buffer of
    the last ``n`` values, re-emitted whenever it changes — the change-
    listener deque of the reference's latest-news view
    (``ExampleESGateway.scala:63-69``) as checkpointed state.

    Output: (key, items array<string>) with items newest-last. ``seq_col``
    orders arrivals within a batch (the log-offset role).
    """
    from pyspark.sql.types import ArrayType

    out_schema = StructType(
        [
            StructField(key_col, LongType()),
            StructField("items", ArrayType(StringType())),
        ]
    )
    state_schema = StructType([StructField("buf", ArrayType(StringType()))])

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        buf = list(state.get[0]) if state.exists else []
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        for _, row in batch.sort_values(seq_col).iterrows():
            buf.append(str(row[value_col]))
            if len(buf) > n:
                buf.pop(0)
        state.update((buf,))
        yield pd.DataFrame({key_col: [key[0]], "items": [buf]})

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def get_and_update_stream(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    update_fn: Callable[[int | None, pd.Series], int | None],
    ttl_ms: int | None = None,
) -> DataFrame:
    """W5/W6 per-key atomic read-modify-write as a streaming operator.

    ``update_fn(old, values)`` sees the previous state (None when absent,
    the reference's ``Option[V]``) and the batch's values for the key, and
    returns the new value (None = delete, the tombstone path W4). Emits one
    (key, old, new, ts_ms) change record per key per batch — the observable
    old/new pair of ``getAndUpdate``/``updateAndGet``.

    ``ttl_ms`` maps the reference's per-record TTL (MemStore.unwrap) onto
    processing-time state timeout: state silently expires after the idle
    TTL, the streaming-side analog of lazy delete-on-read.
    """
    out_schema = StructType(
        [
            StructField("key", LongType()),
            StructField("old", LongType()),
            StructField("new", LongType()),
        ]
    )
    state_schema = StructType([StructField("v", LongType())])
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms else GroupStateTimeout.NoTimeout
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        old = state.get[0] if state.exists else None
        values = pd.concat([p[value_col] for p in pdfs], ignore_index=True)
        if len(values) == 0:
            return
        new = update_fn(old, values)
        if new is None:
            if state.exists:
                state.remove()
        else:
            state.update((new,))
            if ttl_ms:
                state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"key": [key[0]], "old": [old], "new": [new]})

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=timeout,
    )


def debounce_replay(
    df: DataFrame,
    key_col: str,
    ts_ms_col: str,
    min_interval_ms: int,
) -> DataFrame:
    """Batch replay of :func:`debounce_stream`'s emission contract — the
    driver-checkable twin (same pattern as the W5/W6 and X6 twins): given
    the full changelog at once, emit exactly the rows the streaming
    operator would have emitted, with the same suppressed-run accounting.

    The per-key emission fold (emit iff ``ts >= last_emitted + interval``,
    suppressed count riding on the next emission) is NOT a window
    function — each decision depends on the last EMITTED ts, not the
    previous row — so it runs as one engine-side ``aggregate`` over the
    per-key sorted ts array: one shuffle (the per-key collect), integer
    arithmetic only, state the same one (last, pending) pair per key the
    streaming operator keeps. Per-key array size = key's event count, the
    exact payload the streaming state would have replayed through it.

    Output: (key, ts_ms, suppressed_before) — identical column contract to
    the stream. Ties on ts collapse identically (the first of an equal-ts
    run emits; which physical row "is" the emitted one is unobservable in
    this projection).
    """
    from pyspark.sql import functions as F

    out_t = "array<struct<ts_ms:bigint,suppressed_before:bigint>>"
    init = F.struct(
        F.lit(-1).cast("long").alias("last"),
        F.lit(0).cast("long").alias("pending"),
        F.lit(None).cast(out_t).alias("out"),
    )

    def step(acc, t):
        emitted = F.struct(
            t.alias("last"),
            F.lit(0).cast("long").alias("pending"),
            F.concat(
                F.coalesce(acc["out"], F.array().cast(out_t)),
                F.array(
                    F.struct(
                        t.alias("ts_ms"),
                        acc["pending"].alias("suppressed_before"),
                    )
                ),
            ).alias("out"),
        )
        suppressed = F.struct(
            acc["last"].alias("last"),
            (acc["pending"] + 1).alias("pending"),
            acc["out"].alias("out"),
        )
        return F.when(
            (acc["last"] == -1) | (t >= acc["last"] + F.lit(min_interval_ms)),
            emitted,
        ).otherwise(suppressed)

    folded = (
        df.select(F.col(key_col), F.col(ts_ms_col).cast("long").alias("_ts"))
        .groupBy(key_col)
        .agg(F.array_sort(F.collect_list("_ts")).alias("_a"))
        .select(
            key_col,
            F.aggregate("_a", init, step, lambda acc: acc["out"]).alias("_out"),
        )
    )
    return folded.select(key_col, F.explode("_out").alias("_e")).select(
        key_col,
        F.col("_e.ts_ms").alias("ts_ms"),
        F.col("_e.suppressed_before").alias("suppressed_before"),
    )
