"""Request/process metrics — the reference's AffinityMetrics analog.

The reference keeps one ``MetricRegistry`` per actor system and meters
every gateway response group with a timer + success/failure meters
(``core/src/main/scala/io/amient/affinity/core/util/AffinityMetrics.scala:50-95``,
wired by ``Gateway.trace``, ``core/.../actor/Gateway.scala:78-82``: a
response with status >= 400 marks failure, anything else success, both
stop the timer started at request arrival). This module is that surface
re-expressed stdlib-only for the Spark serving edge:

- :class:`ProcessMetrics` — per-group timer + success/failure counters.
  Durations live in a bounded ring (last ``window`` observations), the
  codahale ``Timer``'s sliding-window role: percentiles describe RECENT
  latency, counters are lifetime totals.
- :class:`MetricsRegistry` — thread-safe get-or-create by group name
  (the ``meterAndHistogram`` contract) + a one-call ``snapshot()`` the
  HTTP gateway serves as ``GET /metrics``.

Thread-safety matters here: the gateway handler is a
``ThreadingHTTPServer`` (one thread per in-flight request), exactly the
concurrent-writer shape the reference's ``ConcurrentHashMap`` guards.
"""

from __future__ import annotations

import threading
import time
from collections import deque


class ProcessMetrics:
    """Timer + success/failure meters for one request group."""

    def __init__(self, name: str, window: int = 1024) -> None:
        self.name = name
        self._lock = threading.Lock()
        self._durations_ms: deque[float] = deque(maxlen=window)
        self.successes = 0
        self.failures = 0

    def mark_start(self) -> float:
        return time.perf_counter()

    def mark_success(self, start: float, n: int = 1) -> None:
        dt = (time.perf_counter() - start) * 1000.0
        with self._lock:
            self._durations_ms.append(dt)
            self.successes += n

    def mark_failure(self, start: float) -> None:
        dt = (time.perf_counter() - start) * 1000.0
        with self._lock:
            self._durations_ms.append(dt)
            self.failures += 1

    def snapshot(self) -> dict:
        with self._lock:
            durs = sorted(self._durations_ms)
            succ, fail = self.successes, self.failures
        out = {"success": succ, "failure": fail, "count": succ + fail}
        if durs:

            def pct(p: float) -> float:
                return durs[min(len(durs) - 1, int(p * (len(durs) - 1) + 0.5))]

            out["duration_ms"] = {
                "mean": round(sum(durs) / len(durs), 3),
                "p50": round(pct(0.50), 3),
                "p95": round(pct(0.95), 3),
                "max": round(durs[-1], 3),
                "window": len(durs),
            }
        return out


class MetricsRegistry:
    """Thread-safe name → :class:`ProcessMetrics` registry."""

    def __init__(self, window: int = 1024) -> None:
        self._lock = threading.Lock()
        self._window = window
        self._groups: dict[str, ProcessMetrics] = {}

    def meter_and_histogram(self, name: str) -> ProcessMetrics:
        with self._lock:
            pm = self._groups.get(name)
            if pm is None:
                pm = ProcessMetrics(name, window=self._window)
                self._groups[name] = pm
            return pm

    def mark(self, name: str, start: float, ok: bool) -> None:
        """Gateway.trace's completion rule: status < 400 → success."""
        pm = self.meter_and_histogram(name)
        if ok:
            pm.mark_success(start)
        else:
            pm.mark_failure(start)

    def snapshot(self) -> dict:
        with self._lock:
            groups = dict(self._groups)
        return {name: pm.snapshot() for name, pm in sorted(groups.items())}
