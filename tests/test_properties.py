"""Property-based tests (SURVEY §5 tier 2, the AvroRecordPropSpec analog):
core operators must agree with a plain-Python model on generated inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from affinity_spark import TimeRange
from affinity_spark.operators.kv import compact_latest
from affinity_spark.operators.upsert import merge_upsert

# one (key, ts, seq, value) changelog entry
entry = st.tuples(
    st.integers(min_value=0, max_value=4),      # key — few keys force collisions
    st.integers(min_value=0, max_value=9),      # ts — small domain forces ties
    st.integers(min_value=0, max_value=99),     # seq (unique-ified below)
    st.integers(min_value=-1000, max_value=1000),
)

changelog = st.lists(entry, min_size=0, max_size=12).map(
    # make seq unique so (ts, seq) is a total order (the log offset role)
    lambda rows: [(k, t, i, v) for i, (k, t, _, v) in enumerate(rows)]
)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def model_compact(rows):
    best = {}
    for k, t, s, v in rows:
        if k not in best or (t, s) > (best[k][0], best[k][1]):
            best[k] = (t, s, v)
    return {k: v for k, (t, s, v) in best.items()}


@given(changelog)
@SLOW
def test_compact_latest_matches_model(spark, rows):
    if not rows:
        return
    df = spark.createDataFrame(rows, "k int, ts int, seq int, v int")
    got = {
        r.k: r.v
        for r in compact_latest(df, ["k"], "ts", tiebreak_cols=["seq"]).collect()
    }
    assert got == model_compact(rows)


def model_compact_full(rows):
    best = {}
    for k, t, s, v in rows:
        if k not in best or (t, s) > (best[k][0], best[k][1]):
            best[k] = (t, s, v)
    return best  # key -> (ts, seq, value)


@given(changelog, changelog)
@SLOW
def test_merge_upsert_matches_model(spark, base_rows, upd_rows):
    if not base_rows or not upd_rows:
        return
    # base = compacted state (one row per key); updates = raw batch
    base_state = model_compact_full(base_rows)
    base = spark.createDataFrame(
        [(k, t, s, v) for k, (t, s, v) in base_state.items()],
        "k int, ts int, seq int, v int",
    )
    updates = spark.createDataFrame(upd_rows, "k int, ts int, seq int, v int")
    got = {
        r.k: r.v
        for r in merge_upsert(base, updates, ["k"], "ts", tiebreak_cols=["seq"]).collect()
    }
    # model: per key, max by (ts, seq, src) — src=1 for updates, so an
    # update wins an exact (ts, seq) tie (replayed-batch-wins, W1)
    expect = {}
    for src, rows in ((0, [(k, t, s, v) for k, (t, s, v) in base_state.items()]), (1, upd_rows)):
        for k, t, s, v in rows:
            if k not in expect or (t, s, src) > expect[k][:3]:
                expect[k] = (t, s, src, v)
    assert got == {k: v for k, (t, s, src, v) in expect.items()}


def test_timerange_predicate_matches_contains(spark):
    rows = [(i, t) for i, t in enumerate(range(0, 20))]
    df = spark.createDataFrame(rows, "id int, ts long")
    for start, end in [(0, 20), (5, 5), (5, 6), (3, 17), (19, 20)]:
        tr = TimeRange.of(start, end)
        via_spark = {r.id for r in df.filter(tr.predicate(F.col("ts"), "millis")).collect()}
        via_model = {i for i, t in rows if tr.contains(t)}
        assert via_spark == via_model, (start, end)
