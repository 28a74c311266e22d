"""bench.py stderr triage: known-benign scheduler traces are classified,
anything else fails the run loudly (the BENCH_r02 unexplained-trace fix)."""

from __future__ import annotations

from bench import classify_stderr

BENIGN_TRACE = """\
26/08/13 10:00:00 ERROR DAGScheduler: Failed to update accumulator 123
java.lang.IllegalStateException: Attempted to access garbage collected accumulator
\tat org.apache.spark.scheduler.DAGScheduler.updateAccumulators(DAGScheduler.scala:1500)
\tat org.apache.spark.scheduler.DAGScheduler.handleTaskCompletion(DAGScheduler.scala:1600)
"""

UNEXPECTED_TRACE = """\
26/08/13 10:00:00 ERROR Executor: Exception in task 3.0 in stage 6.0
java.lang.OutOfMemoryError: Java heap space
\tat org.apache.spark.unsafe.memory.HeapMemoryAllocator.allocate(HeapMemoryAllocator.java:60)
"""

NOISE = """\
[Stage 4:=====>   (3 + 5) / 32]
26/08/13 10:00:00 WARN NativeCodeLoader: Unable to load native-hadoop library
"""


def test_clean_run():
    verdict, lines = classify_stderr(NOISE)
    assert verdict == "clean" and lines == []


def test_benign_accumulator_trace():
    verdict, lines = classify_stderr(NOISE + BENIGN_TRACE)
    assert verdict == "benign" and lines == []


def test_unexpected_trace_flagged():
    verdict, lines = classify_stderr(BENIGN_TRACE + UNEXPECTED_TRACE)
    assert verdict == "unexpected"
    assert any("OutOfMemoryError" in l for l in lines)


def test_taskkilled_is_benign():
    verdict, _ = classify_stderr(
        "26/08/13 ERROR TaskSetManager: Lost task: TaskKilled (another attempt succeeded)\n"
    )
    assert verdict == "benign"


def test_cpu_ticks_steal_meter():
    """The per-set steal meter: monotone non-negative deltas, steal a
    subset of total, and a sane steal_pct derivation (the intra-set
    hypervisor-burst instrument the point-sample canary cannot see).
    The non-idle normalization (r15): steal/(total-idle) must be finite
    and bounded whenever any CPU was busy in the window."""
    import time

    import pytest

    from bench import _cpu_ticks

    t0 = _cpu_ticks()
    if t0 is None:  # deliberate degradation off-Linux (r14 ADVICE)
        pytest.skip("no /proc/stat on this platform")
    # burn a little CPU so the non-idle delta is provably positive
    deadline = time.perf_counter() + 0.05
    while time.perf_counter() < deadline:
        pass
    t1 = _cpu_ticks()
    ds, dt = t1[0] - t0[0], t1[1] - t0[1]
    didle = t1[2] - t0[2]
    dbusy = dt - didle
    assert ds >= 0 and dt > 0 and ds <= dt
    assert 0 <= didle <= dt
    assert dbusy > 0  # the busy-loop above guarantees non-idle ticks
    assert 0.0 <= 100.0 * ds / dbusy <= 100.0
