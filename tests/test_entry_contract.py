"""Driver-contract invariants for __spark_entry__."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_queries_and_oracles_align():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o).issubset(set(q)), "every oracle must have a query"
    assert len(q) >= 30


def test_entry_runs_and_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"l_returnflag", "l_linestatus", "count_order"} <= set(df.columns)


def test_queries_run_at_smallest_sf(spark):
    """Every queries() entry must at least build a plan and execute at
    sf0.001 (smoke; value correctness is the oracle gate)."""
    sf = "/root/testdata/sf0.001"
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf)
        df.limit(5).collect()  # force execution of the plan
