"""Arbitrary stateful streaming on Spark 4's transformWithState API.

``state.py`` carries the reference's per-key read-modify-write semantics
(W1-W7, ``core/.../state/KVStoreLocal.scala``) on ``applyInPandasWithState``;
this module re-expresses the same operators on
``transformWithStateInPandas`` (``StatefulProcessor``), the engine's
successor API and the preferred 100 TB path:

- typed, *named* state variables (ValueState/ListState/MapState) instead of
  one opaque state tuple — the reference's named MemStores map 1:1;
- native per-state TTL (``ttlDurationMs``) — MemStore's record TTL
  (``MemStoreRocksDb.java``, ``MemStore.unwrap``) without the manual
  ProcessingTimeTimeout choreography documented in state.py;
- RocksDB state store required by the engine (transformWithState is
  RocksDB-only), which is exactly the reference's storage engine for
  memstores — callers set
  ``spark.sql.streaming.stateStore.providerClass`` to the RocksDB provider.

Output contract matches state.py: decoupled pipelines can't return the
previous value to a caller, so operators emit (key, old, new) change
records downstream — the observable before/after pair of
``getAndUpdate``/``updateAndGet`` on the changelog.

Implementation note: the StatefulProcessor subclasses are defined INSIDE
the factory functions. transformWithState spawns a dedicated driver-side
Python worker that unpickles the processor; a module-level class pickles by
reference and that worker (launched with the engine's own PYTHONPATH, not
the caller's cwd) cannot import this package. A function-local class is
pickled by value — self-contained bytes, importable nowhere, runnable
everywhere.

Environment gate: the transformWithState Python↔JVM state protocol is
protobuf-based (``pyspark/sql/streaming/proto/StateMessage_pb2``); in a
container without ``google.protobuf`` the query fails at start inside the
pre-init runner (verified failure mode: STREAMING_PYTHON_RUNNER_
INITIALIZATION_FAILURE → ImportError). Plan construction does not touch
the protocol, so ``tws_available()`` lets callers and tests choose the
state.py fallback at runtime.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """True when the runtime can execute transformWithState queries (the
    state protocol needs google.protobuf; plan building alone does not)."""
    import importlib.util

    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        # find_spec raises (not returns None) when the parent "google"
        # namespace package itself is absent.
        return False


def running_count_tws(stream: DataFrame, key_col: str = "word") -> DataFrame:
    """A2 continuous counting (ExampleWordCount.scala:35-52) on a named
    ValueState; one (key, count) row per key per micro-batch."""

    class RunningCountProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._count = handle.getValueState("count", "n BIGINT")

        def handleInputRows(self, key, rows, timer_values):
            seen = sum(len(pdf) for pdf in rows)
            if not seen:
                return
            prev = self._count.get()
            n = (prev[0] if prev is not None else 0) + seen
            self._count.update((n,))
            yield pd.DataFrame({key_col: [key[0]], "count": [n]})

        def close(self) -> None:
            pass

    return stream.groupBy(key_col).transformWithStateInPandas(
        RunningCountProcessor(),
        outputStructType=f"{key_col} STRING, count BIGINT",
        outputMode="Update",
        timeMode="None",
    )


def get_and_update_tws(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    update_fn: Callable[[int | None, pd.Series], int | None],
    ttl_ms: int | None = None,
) -> DataFrame:
    """W5/W6 per-key atomic read-modify-write emitting (key, old, new).

    ``update_fn(old, values)`` sees the previous value (None when absent —
    the reference's ``Option[V]``) and the key's batch values; returning
    None deletes the state (W4 tombstone). ``ttl_ms`` uses the API's native
    state TTL (timeMode becomes ProcessingTime): an idle key's value
    expires with no timer bookkeeping.
    """

    class GetAndUpdateProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._v = handle.getValueState("v", "v BIGINT", ttlDurationMs=ttl_ms)

        def handleInputRows(self, key, rows, timer_values):
            values = pd.concat([pdf[value_col] for pdf in rows], ignore_index=True)
            if len(values) == 0:
                return
            prev = self._v.get()
            old = prev[0] if prev is not None else None
            new = update_fn(old, values)
            if new is None:
                self._v.clear()
            else:
                self._v.update((new,))
            yield pd.DataFrame({"key": [key[0]], "old": [old], "new": [new]})

        def close(self) -> None:
            pass

    return stream.groupBy(key_col).transformWithStateInPandas(
        GetAndUpdateProcessor(),
        outputStructType="key BIGINT, old BIGINT, new BIGINT",
        outputMode="Update",
        timeMode="ProcessingTime" if ttl_ms else "None",
    )


def latest_n_tws(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    seq_col: str,
    n: int = 3,
) -> DataFrame:
    """X6 latest-N ring buffer on a ListState — the change-listener deque of
    the reference's latest-news view (ExampleESGateway.scala:63-69), with
    the buffer as a *list* state variable rather than an array-typed value
    (RocksDB appends, no read-modify-write of the whole array)."""

    class LatestNProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._buf = handle.getListState("buf", "item STRING")

        def handleInputRows(self, key, rows, timer_values):
            batch = pd.concat(list(rows), ignore_index=True)
            if len(batch) == 0:
                return
            incoming = [
                (str(r[value_col]),)
                for _, r in batch.sort_values(seq_col).iterrows()
            ]
            buf = list(self._buf.get()) if self._buf.exists() else []
            buf.extend(incoming)
            buf = buf[-n:]
            self._buf.put(buf)
            yield pd.DataFrame({key_col: [key[0]], "items": [[t[0] for t in buf]]})

        def close(self) -> None:
            pass

    return stream.groupBy(key_col).transformWithStateInPandas(
        LatestNProcessor(),
        outputStructType=f"{key_col} BIGINT, items ARRAY<STRING>",
        outputMode="Update",
        timeMode="None",
    )
