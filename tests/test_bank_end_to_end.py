"""ExampleBank end-to-end (SURVEY §7 Phase 1, the spine): golden
transactions ingested as a changelog STREAM into a keyed table
(changelog_sink = S4+S7+W1), then every ExampleBankSpec query answered
from the materialized state (P3/P4/R3/E2/E3) with the reference's own
expected results — the streaming counterpart of the batch goldens in
test_golden_fixtures.py."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from affinity_spark import TimeRange
from affinity_spark.operators.kv import prefix_scan
from affinity_spark.streaming import changelog_sink, read_keyed_table

SCHEMA = StructType(
    [
        StructField("sortcode", StringType()),
        StructField("account", IntegerType()),
        StructField("txn", LongType()),
        StructField("amount", DoubleType()),
        StructField("ts", LongType()),
    ]
)

BATCH_1 = [  # first day's transactions arrive
    {"sortcode": "11-10-30", "account": 10233321, "txn": 1001, "amount": 99.9, "ts": 1530000000000},
    {"sortcode": "33-55-10", "account": 49772300, "txn": 1002, "amount": 99.9, "ts": 1530000000000},
    {"sortcode": "11-10-30", "account": 10233321, "txn": 1003, "amount": 99.9, "ts": 1530086400000},
]
BATCH_2 = [  # later days
    {"sortcode": "11-10-30", "account": 88885454, "txn": 1004, "amount": 99.9, "ts": 1530090000000},
    {"sortcode": "11-10-30", "account": 10233321, "txn": 1005, "amount": 99.9, "ts": 1530172800000},
    {"sortcode": "11-10-30", "account": 88885454, "txn": 1006, "amount": 99.9, "ts": 1530172800000},
]


@pytest.fixture(scope="module")
def bank_table(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bank")
    src, table, ckpt = str(base / "in"), str(base / "table"), str(base / "ckpt")
    os.makedirs(src)

    def feed(name, rows):
        tmp = os.path.join(src, f".{name}.tmp")
        with open(tmp, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.rename(tmp, os.path.join(src, name))

    stream = spark.readStream.schema(SCHEMA).json(src)
    # state key = (sortcode, account, txn) — the reference's StorageKey
    q = changelog_sink(stream, table, ckpt, ["sortcode", "account", "txn"], "ts").start()
    try:
        feed("b1.json", BATCH_1)
        q.processAllAvailable()
        # mid-stream checkpoint: partial state is already queryable
        partial = read_keyed_table(spark, table)
        assert partial.count() == 3
        feed("b2.json", BATCH_2)
        q.processAllAvailable()
    finally:
        q.stop()
    return read_keyed_table(spark, table)


def test_account_queries_from_materialized_state(spark, bank_table):
    def account(sortcode, number):
        return prefix_scan(bank_table, {"sortcode": sortcode, "account": number})

    assert account("11-10-30", 10233321).count() == 3
    assert account("11-10-30", 88885454).count() == 2
    assert account("33-55-10", 49772300).count() == 1


def test_branch_scatter_from_materialized_state(spark, bank_table):
    assert prefix_scan(bank_table, {"sortcode": "11-10-30"}).count() == 5
    assert prefix_scan(bank_table, {"sortcode": "33-55-10"}).count() == 1
    assert prefix_scan(bank_table, {"sortcode": "xx-xx-xx"}).count() == 0


def test_branch_before_cutoff(spark, bank_table):
    got = prefix_scan(
        bank_table,
        {"sortcode": "11-10-30"},
        TimeRange.until(1530144000000),
        "ts",
        "millis",
    )
    assert got.count() == 3


def test_batch_timerange_scans(spark, bank_table):
    def ids(tr):
        return sorted(
            r.txn for r in bank_table.filter(tr.predicate(F.col("ts"), "millis")).collect()
        )

    assert ids(TimeRange.inclusive(1530090000000, 1530172800000)) == [1004, 1005, 1006]
    assert ids(TimeRange.inclusive(1530086400000, 1530090000000)) == [1003, 1004]
    assert ids(TimeRange.inclusive(1530000000000, 1530090000000)) == [1001, 1002, 1003, 1004]


def test_replayed_transaction_is_idempotent(spark, bank_table, tmp_path):
    """At-least-once ingest: replaying a record (same key, same ts) must not
    change the state — W1 blind replace absorbs duplicates."""
    from affinity_spark.operators.upsert import merge_upsert

    replay = spark.createDataFrame(
        [("11-10-30", 10233321, 1001, 99.9, 1530000000000)], SCHEMA
    )
    merged = merge_upsert(bank_table, replay, ["sortcode", "account", "txn"], "ts")
    assert merged.count() == bank_table.count()
    amounts = merged.filter("txn = 1001").collect()
    assert len(amounts) == 1 and amounts[0].amount == 99.9
