"""Cross-engine stability of window-ordered queries under timestamp ties.

events.parquet is written with TIMESTAMP(NANOS); Spark truncates to micros
(tables.load), so any ordering that leans on ts is precision-dependent
across engines. ``events_sessionize`` / ``events_running_totals`` therefore
order by the unique, ts-monotone ``event_id`` alone. This test stresses the
worst case — many rows sharing the SAME microsecond — and asserts the Spark
plan and the DuckDB oracle SQL agree row-for-row.

Also pins the HUGEINT regression: DuckDB's integer ``sum()`` yields
decimal128, which the driver's hasher distinguishes from Spark's BIGINT; the
oracle SQL must CAST to BIGINT (round-1 hash-fail root cause).
"""

from __future__ import annotations

import datetime as dt
import decimal
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry


def _write_tied_events(tmp_path) -> str:
    """events table where 40 of 60 rows share one microsecond per user."""
    base = dt.datetime(2024, 3, 1, 12, 0, 0, 500_000)
    rows = []
    eid = 0
    for user in (1, 2):
        t = base
        for burst in range(3):
            # a burst of 10 events at the IDENTICAL microsecond
            for _ in range(10):
                rows.append((eid, t, user, "click", float(eid % 7) + 0.25, "{}"))
                eid += 1
            # then a >1h gap so sessionize splits here
            t = t + dt.timedelta(hours=2)
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    path = os.path.join(str(tmp_path), "events.parquet")
    df.to_parquet(path, index=False)
    return str(tmp_path)


@pytest.fixture(scope="module")
def tied_dir(tmp_path_factory):
    return _write_tied_events(tmp_path_factory.mktemp("tied_events"))


def _duck_frame(sf_dir: str, sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{os.path.join(sf_dir, 'events.parquet')}')"
    )
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    return cols, res.fetchall()


def _assert_agree(spark_df, dcols, drows):
    scols = spark_df.columns
    assert sorted(scols) == sorted(dcols)
    skey = {c: i for i, c in enumerate(scols)}
    dkey = {c: i for i, c in enumerate(dcols)}
    order = sorted(scols)
    srows = sorted(tuple(r[skey[c]] for c in order) for r in spark_df.collect())
    drows = sorted(tuple(r[dkey[c]] for c in order) for r in drows)
    assert srows == drows


def test_sessionize_stable_under_microsecond_ties(spark, tied_dir):
    sdf = entry.events_sessionize(spark, tied_dir)
    dcols, drows = _duck_frame(tied_dir, entry._SESSION_SQL)
    _assert_agree(sdf, dcols, drows)
    # semantic check: 3 bursts -> 3 sessions per user
    sess = {
        (r.user_id, r.session_id) for r in entry.events_sessionize(spark, tied_dir).collect()
    }
    assert len(sess) == 6


def test_running_totals_stable_under_microsecond_ties(spark, tied_dir):
    sdf = entry.events_running_totals(spark, tied_dir)
    dcols, drows = _duck_frame(tied_dir, entry._RUNNING_SQL)
    _assert_agree(sdf, dcols, drows)


def test_oracle_sums_are_bigint_not_hugeint(tied_dir):
    """The driver's hasher sees DuckDB HUGEINT as decimal128 != int64."""
    for sql in (entry._SESSION_SQL, entry._RUNNING_SQL):
        _, drows = _duck_frame(tied_dir, sql)
        for row in drows[:5]:
            for v in row:
                assert not isinstance(v, decimal.Decimal), (
                    "uncast DuckDB integer sum leaked HUGEINT into an oracle"
                )
