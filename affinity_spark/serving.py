"""Transport-free serving gateway: the reference's query surface without HTTP.

The reference's primary entry point is an HTTP/WS gateway over partitioned
state — point gets, prefix/range scans and per-key subscriptions
(``core/src/main/scala/io/amient/affinity/core/actor/GatewayHttp.scala:50-111,
220-330``, ``ws-client/``; behavior pinned by
``examples/example-range-lookups/src/test/scala/io/amient/affinity/example/
ExampleBankSpec.scala:75-178`` — account reads, branch reads, time cutoffs).
SURVEY descopes the transport itself; this shim closes the entry point: ONE
python class exposing the same three operations over a
:class:`~affinity_spark.sources.keyed_table.KeyedTable` (or any keyed
DataFrame), returning plain python rows the way a handler would serialize
them.

Serving contract notes:
- ``point_get``/``prefix_range`` COLLECT — this is the serving path, where
  results are key-bounded (an account's transactions, a branch's day), the
  same contract as ``kv.range_materialize``. The analytical path stays
  DataFrame-shaped via the underlying operators.
- ``subscribe`` is a generator over a changelog STREAM filtered to one key
  — the ws-client's key subscription (initial state, then every update in
  arrival order). The filter is pushed into the stream before the sink, so
  a subscription costs a predicate, not a full materialization, no matter
  how wide the log is.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from typing import Iterator, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from affinity_spark.functions.lits import local_df
from affinity_spark.operators.kv import point_get, prefix_scan
from affinity_spark.timerange import TimeRange


class Subscription:
    """Handle for one per-key changelog subscription: ``take(n)`` blocks
    for the next n events; ``stop()`` tears the stream down."""

    def __init__(self, query, buffer: deque, lock: threading.Lock):
        self._query = query
        self._buffer = buffer
        self._lock = lock

    def take(self, n: int, timeout_s: float = 20.0) -> list[dict]:
        out: list[dict] = []
        deadline = time.monotonic() + timeout_s
        while len(out) < n:
            with self._lock:
                while self._buffer and len(out) < n:
                    out.append(self._buffer.popleft())
            if len(out) < n:
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"subscription delivered {len(out)}/{n} events in {timeout_s}s"
                    )
                self._query.processAllAvailable()
                time.sleep(0.05)
        return out

    def events(self, timeout_s: float = 20.0) -> Iterator[dict]:
        """Generator view: yields events one at a time until ``stop()``."""
        while self._query.isActive:
            yield self.take(1, timeout_s)[0]

    def poll(self, timeout_s: float = 5.0) -> list[dict]:
        """Non-raising take(1): [] when no event arrives within the window
        — the push-transport primitive (an idle key is a heartbeat tick,
        not a teardown; r12 ADVICE on the subscribe channel)."""
        try:
            return self.take(1, timeout_s)
        except TimeoutError:
            return []

    @property
    def active(self) -> bool:
        return self._query.isActive

    def stop(self) -> None:
        self._query.stop()


class TableSubscription:
    """Per-key push fed by the TABLE's own commit stream — the reference's
    mediator push wired to gateway WRITES: a poller watches the version
    pointer and diffs consecutive committed snapshots
    (``KeyedTable.changes_between``, the CDF read), so a POST/WS upsert
    notifies subscribers with no external changelog. Events are flat row
    dicts: inserts/updates carry the NEW values plus ``_change``; deletes
    carry the key plus ``_change: 'delete'``. A commit burst that outruns
    version retention degrades to a ``resync`` event carrying the key's
    current state (never a silent gap). Duck-typed with
    :class:`Subscription` (take/poll/events/active/stop)."""

    def __init__(self, gateway, key: Mapping[str, object],
                 poll_s: float = 0.25, include_initial: bool = True):
        self._gw = gateway
        self._key = dict(key)
        self._tbl = gateway._require_table()
        self._buffer: deque = deque()
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._last = self._tbl._current_version_dir()
        if include_initial:
            self._buffer.extend(gateway.point_get(key))
        self._thread = threading.Thread(
            target=self._poll_loop, args=(poll_s,), daemon=True
        )
        self._thread.start()

    def _poll_loop(self, poll_s: float) -> None:
        while not self._stop.is_set():
            try:
                cur = self._tbl._current_version_dir()
                if cur != self._last:
                    try:
                        events = self._events_between(self._last, cur)
                    except Exception:  # noqa: BLE001 - reclaimed snapshot
                        events = [
                            {**r, "_change": "resync"}
                            for r in self._gw.point_get(self._key)
                        ]
                    with self._lock:
                        self._buffer.extend(events)
                    self._last = cur
            except Exception:  # noqa: BLE001 - poller must not die silently mid-loop
                pass
            self._stop.wait(poll_s)

    def _events_between(self, old_dir: str, new_dir: str) -> list[dict]:
        import os as _os

        ch = self._tbl.changes_between(
            _os.path.basename(old_dir), _os.path.basename(new_dir)
        )
        cond = None
        for col, val in self._key.items():
            c = F.col(col).eqNullSafe(F.lit(val))
            cond = c if cond is None else cond & c
        if cond is not None:
            ch = ch.filter(cond)
        events = []
        for r in ch.collect():
            d = r.asDict(recursive=True)
            keys = {k: d[k] for k in self._tbl.key_cols}
            if d["change"] == "delete":
                events.append({**keys, "_change": "delete"})
            else:
                events.append(
                    {**keys, **(d.get("new_values") or {}), "_change": d["change"]}
                )
        return events

    def take(self, n: int, timeout_s: float = 20.0) -> list[dict]:
        out: list[dict] = []
        deadline = time.monotonic() + timeout_s
        while len(out) < n:
            with self._lock:
                while self._buffer and len(out) < n:
                    out.append(self._buffer.popleft())
            if len(out) < n:
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"table subscription delivered {len(out)}/{n} events"
                        f" in {timeout_s}s"
                    )
                time.sleep(0.05)
        return out

    def poll(self, timeout_s: float = 5.0) -> list[dict]:
        try:
            return self.take(1, timeout_s)
        except TimeoutError:
            return []

    def events(self, timeout_s: float = 20.0) -> Iterator[dict]:
        while not self._stop.is_set():
            yield self.take(1, timeout_s)[0]

    @property
    def active(self) -> bool:
        return not self._stop.is_set()

    def stop(self) -> None:
        self._stop.set()


class ServingGateway:
    """Point-get + prefix/range + per-key subscribe over keyed state."""

    def __init__(self, table=None, df: DataFrame | None = None, ts_col: str | None = None,
                 ts_unit: str = "millis", schema=None):
        if (table is None) == (df is None):
            raise ValueError("exactly one of table= or df= is required")
        self._table = table
        self._df = df
        self._ts_col = ts_col if table is None else table.ts_col
        self._ts_unit = ts_unit
        # declared row schema (StructType): used to coerce writes when the
        # table has no committed snapshot yet — the FIRST write through the
        # gateway defines the physical schema, so it must come from a
        # declaration, not from reading the (absent) snapshot
        self._schema = schema

    def _frame(self) -> DataFrame:
        return self._df if self._table is None else self._table.read()

    # -- request handlers (what an HTTP route would call) -------------------

    def point_get(self, key: Mapping[str, object]) -> list[dict]:
        """GET /{table}/{full key}: the rows for exactly one key."""
        return [r.asDict() for r in point_get(self._frame(), key).collect()]

    def prefix_range(
        self,
        prefix: Mapping[str, object],
        time_range: TimeRange | None = None,
    ) -> list[dict]:
        """GET /{table}/{key prefix}[?from=..&until=..]: all rows under a
        key prefix, optionally time-bounded (the branch reads of
        ExampleBankSpec)."""
        rows = prefix_scan(
            self._frame(), prefix, time_range, self._ts_col, self._ts_unit
        )
        return [r.asDict() for r in rows.collect()]

    # -- write handlers (what an HTTP POST/DELETE route calls) --------------
    # The reference's gateway mutates state over POST (``examples/
    # example-distributed-graph/.../GraphHttp.scala:91-102`` POST /connect,
    # /disconnect; ``example-auth-methods/.../PrivateApi.scala:62`` POST
    # /settings/add). Writes require a table-backed gateway (df= is a
    # read-only view); all three are replay-idempotent — a replayed
    # request re-derives the same committed state (last-write-wins merge /
    # anti-join), the W-row contract.

    def _require_table(self):
        if self._table is None:
            raise ValueError("writes need a table-backed gateway (table=)")
        return self._table

    def _rows_df(self, rows: list[Mapping[str, object]]) -> DataFrame:
        """Rows (parsed JSON dicts) -> a DataFrame in the SNAPSHOT's exact
        schema: from_json coerces JSON numerics/strings to the committed
        column types, so a wire write can never introduce the mixed
        numeric-width parquet poisoning (the r5 BandIndex rule)."""
        import json as _json

        tbl = self._require_table()
        try:
            schema = tbl.read().schema
        except FileNotFoundError:
            if self._schema is None:
                raise
            schema = self._schema  # first write defines the table
        spark = tbl.spark
        raw = local_df(
            spark, [(_json.dumps(dict(r), default=str),) for r in rows], "j string"
        )
        return raw.select(F.from_json("j", schema).alias("s")).select("s.*")

    def _validate_keys(self, rows: list[Mapping[str, object]]) -> None:
        """Key columns must be present, non-null and type-compatible in
        EVERY row BEFORE the frame is built: from_json coerces by
        nulling mismatches, so a typo'd key value would otherwise write a
        silent NULL-keyed row instead of answering 400."""
        from pyspark.sql import types as T

        tbl = self._require_table()
        schema = self._schema
        if schema is None:
            try:
                schema = tbl.read().schema
            except FileNotFoundError:
                schema = None
        ok_types = {
            T.LongType: (int,), T.IntegerType: (int,), T.ShortType: (int,),
            T.DoubleType: (int, float), T.FloatType: (int, float),
            T.BooleanType: (bool,), T.StringType: (str,),
        }
        fields = {f.name: type(f.dataType) for f in schema.fields} if schema else {}
        for r in rows:
            for c in tbl.key_cols:
                v = r.get(c)
                if v is None:
                    raise ValueError(f"missing or null key column {c!r} in row")
                allowed = ok_types.get(fields.get(c))
                # bool is an int subclass — never a valid numeric key
                if allowed is not None and (
                    not isinstance(v, allowed)
                    or (bool not in allowed and isinstance(v, bool))
                ):
                    raise ValueError(
                        f"key column {c!r} value {v!r} does not match the "
                        f"table's column type"
                    )

    def upsert(self, rows: list[Mapping[str, object]]) -> dict:
        """POST /{table}: W1 blind replace / W2 merge — last-write-wins by
        (key, event-time) through the KeyedTable CAS merge."""
        self._validate_keys(rows)
        self._require_table().upsert(self._rows_df(rows))
        return {"upserted": len(rows)}

    def insert(self, rows: list[Mapping[str, object]]) -> dict:
        """POST /{table}?op=insert: W3 insert-only — keys already present
        are left untouched (anti-join), fresh keys merge in."""
        tbl = self._require_table()
        self._validate_keys(rows)
        df = self._rows_df(rows)
        # capture the base BEFORE the anti-join and CAS the merge to it
        # (as delete() does): an external writer committing the same key
        # between the existing-keys read and the merge must raise
        # ConcurrentWriteError, not be silently overwritten — insert-only
        # semantics hold outside the HTTP write_lock too (r13 ADVICE)
        base_version = tbl._current_version_dir()
        existing = (
            None  # first write defines the table: all rows fresh
            if base_version is None
            else tbl.spark.read.parquet(base_version)
            .select(*tbl.key_cols)
            .distinct()
        )
        fresh = (
            df
            if existing is None
            else df.join(existing, on=list(tbl.key_cols), how="left_anti")
        )
        n = fresh.count()
        if n:
            tbl.upsert(fresh, expected_base=base_version)
        return {"inserted": n, "skipped": len(rows) - n}

    def delete(self, key: Mapping[str, object]) -> dict:
        """DELETE /{table}?key...: W4 tombstone — every row under the key
        (which may be a prefix of the full key) is dropped; the CAS commit
        keeps concurrent writers loud."""
        tbl = self._require_table()
        base_version = tbl._current_version_dir()
        cur = tbl.read()
        cond = None
        for col, val in key.items():
            c = F.col(col).eqNullSafe(F.lit(val))
            cond = c if cond is None else cond & c
        if cond is None:
            raise ValueError("delete needs at least one key column")
        n = cur.filter(cond).count()
        if n:
            tbl.overwrite(cur.filter(~cond), expected_base=base_version)
        return {"deleted": n}

    def subscribe(
        self,
        changes: DataFrame,
        key: Mapping[str, object],
        checkpoint_dir: str,
        include_initial: bool = True,
    ) -> Subscription:
        """Per-key subscription over a streaming changelog DataFrame: the
        current state for the key first (ws-client semantics), then every
        subsequent change to that key in arrival order."""
        if not changes.isStreaming:
            raise ValueError("subscribe() needs a streaming DataFrame")
        buffer: deque = deque()
        lock = threading.Lock()
        if include_initial:
            with lock:
                buffer.extend(self.point_get(key))
        cond = None
        for col, val in key.items():
            c = F.col(col) == F.lit(val)
            cond = c if cond is None else cond & c
        filtered = changes.filter(cond) if cond is not None else changes

        def _sink(batch_df: DataFrame, _batch_id: int) -> None:
            rows = [r.asDict() for r in batch_df.collect()]
            with lock:
                buffer.extend(rows)

        query = (
            filtered.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(_sink)
            .start()
        )
        return Subscription(query, buffer, lock)

    def subscribe_table(
        self,
        key: Mapping[str, object],
        poll_s: float = 0.25,
        include_initial: bool = True,
    ) -> TableSubscription:
        """Per-key subscription fed by the TABLE's own commits: a gateway
        write (POST / WS record / direct upsert) notifies subscribers with
        no external changelog stream — the reference's
        write→mediator→push loop closed over the KeyedTable CDF."""
        return TableSubscription(
            self, key, poll_s=poll_s, include_initial=include_initial
        )
