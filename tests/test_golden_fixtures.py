"""Golden fixtures from FIXTURES.md — each mirrors a reference end-to-end
test with the reference's OWN expected results (ExampleBankSpec,
ESecondaryIndexSpec, ExampleWordCountSpec, AnalyticsSystemSpec, LogRDDSpec,
KVStoreLocalSpec, ExampleESGateway)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from affinity_spark import TimeRange
from affinity_spark.functions.text import tokenize
from affinity_spark.operators.graph import connected_components
from affinity_spark.operators.index import build_inverted_index, delete_by_index, index_lookup
from affinity_spark.operators.kv import compact_latest, prefix_scan, ttl_filter
from affinity_spark.operators.topk import top_n_per_group
from affinity_spark.operators.upsert import merge_upsert


# --- §1 bank: prefix + time-range + scatter (ExampleBankSpec:75-178) --------

BANK_TXNS = [
    ("11-10-30", 10233321, 1001, 99.9, 1530000000000),
    ("33-55-10", 49772300, 1002, 99.9, 1530000000000),
    ("11-10-30", 10233321, 1003, 99.9, 1530086400000),
    ("11-10-30", 88885454, 1004, 99.9, 1530090000000),
    ("11-10-30", 10233321, 1005, 99.9, 1530172800000),
    ("11-10-30", 88885454, 1006, 99.9, 1530172800000),
]


@pytest.fixture(scope="module")
def bank(spark):
    return spark.createDataFrame(
        BANK_TXNS, "sortcode string, account int, txn long, amount double, ts long"
    )


def test_bank_account_queries(spark, bank):
    def account_txns(sortcode, number):
        return prefix_scan(bank, {"sortcode": sortcode, "account": number})

    assert account_txns("11-10-30", 10233321).count() == 3
    assert account_txns("11-10-30", 88885454).count() == 2
    assert account_txns("33-55-10", 49772300).count() == 1


def test_bank_branch_scatter(spark, bank):
    assert prefix_scan(bank, {"sortcode": "11-10-30"}).count() == 5
    assert prefix_scan(bank, {"sortcode": "33-55-10"}).count() == 1
    # unknown branch: empty, not error
    assert prefix_scan(bank, {"sortcode": "xx-xx-xx"}).count() == 0


def test_bank_branch_before_cutoff(spark, bank):
    got = prefix_scan(
        bank, {"sortcode": "11-10-30"}, TimeRange.until(1530144000000), "ts", "millis"
    )
    assert got.count() == 3  # before 2018-06-28T00:00Z


def test_bank_batch_timerange_scans(spark, bank):
    def ids(tr):
        return sorted(
            r.txn for r in bank.filter(tr.predicate(F.col("ts"), "millis")).collect()
        )

    # the spec's scans include the record AT the end bound (FIXTURES §1 note)
    assert ids(TimeRange.inclusive(1530090000000, 1530172800000)) == [1004, 1005, 1006]
    assert ids(TimeRange.inclusive(1530086400000, 1530090000000)) == [1003, 1004]
    assert ids(TimeRange.inclusive(1530000000000, 1530090000000)) == [1001, 1002, 1003, 1004]


# --- §2 articles: secondary index + deindex (ESecondaryIndexSpec) -----------


@pytest.fixture(scope="module")
def articles(spark):
    rows = [
        # author, title, ts — overlapping words within and across authors
        ("alice", "spark streaming basics", 1530000000000),
        ("alice", "advanced spark joins", 1530090000000),
        ("alice", "python tips", 1530172800000),
        ("bob", "spark on kubernetes", 1530000000000),
        ("bob", "kafka internals", 1530090000000),
        ("bob", "kafka spark pipelines", 1530172800000),
    ]
    df = spark.createDataFrame(rows, "author string, title string, ts long")
    # per-author auto-increment id starting at 1 (A4)
    return top_n_per_group(
        df, ["author"], [F.col("ts").asc(), F.col("title").asc()], 1 << 30, rank_col="auto"
    )


def test_articles_author_query(spark, articles):
    assert prefix_scan(articles, {"author": "alice"}).count() == 3
    got = prefix_scan(
        articles, {"author": "alice"}, TimeRange.since(1530086400000), "ts", "millis"
    )
    assert got.count() == 2  # strict subset since t


def test_articles_word_query(spark, articles):
    idx = build_inverted_index(
        articles, ["author", "auto"], lambda d: tokenize(d["title"]), ts_col="ts", index_col="word"
    )
    got = index_lookup(idx, articles, "spark", ["author", "auto"], index_col="word")
    assert got.count() == 4  # all articles of all authors containing 'spark'
    bounded = index_lookup(
        idx, articles, "spark", ["author", "auto"],
        time_range=TimeRange.since(1530086400000), ts_col="ts", ts_unit="millis",
        index_col="word",
    )
    assert bounded.count() == 2  # older spark articles dropped


def test_articles_delete_by_word_deindexes(spark, articles):
    idx = build_inverted_index(
        articles, ["author", "auto"], lambda d: tokenize(d["title"]), index_col="word"
    )
    remaining = delete_by_index(idx, articles, "kafka", ["author", "auto"], index_col="word")
    idx2 = build_inverted_index(
        remaining, ["author", "auto"], lambda d: tokenize(d["title"]), index_col="word"
    )
    assert index_lookup(idx2, remaining, "kafka", ["author", "auto"], index_col="word").count() == 0
    # unrelated articles survive
    assert remaining.count() == 4


# --- §3 wordcount: exact per-key emission sequence (ExampleWordCountSpec) ---


def test_wordcount_exact_sequence(spark, tmp_path):
    from pyspark.sql.types import StringType, StructField, StructType

    from affinity_spark.streaming import running_count_stream

    src = str(tmp_path / "in")
    os.makedirs(src)

    def feed(name, line):
        tmp = os.path.join(src, f".{name}.tmp")
        with open(tmp, "w") as f:
            for w in line.split():
                f.write(json.dumps({"word": w.lower()}) + "\n")
        os.rename(tmp, os.path.join(src, name))

    schema = StructType([StructField("word", StringType())])
    feed("b1.json", "Hello")
    stream = spark.readStream.schema(schema).json(src)
    q = (
        running_count_stream(stream, "word")
        .writeStream.format("memory")
        .queryName("golden_wc")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        for name, line in [("b2.json", "Hello"), ("b3.json", "Hello"), ("b4.json", "World")]:
            feed(name, line)
            q.processAllAvailable()
        rows = [
            (r.word, r["count"])
            for r in spark.sql("select * from golden_wc").collect()
        ]
        # per-key ordered emissions: hello 1,2,3 then world 1
        assert [c for w, c in rows if w == "hello"] == [1, 2, 3]
        assert [c for w, c in rows if w == "world"] == [1]

        feed("b5.json", "Hello World")
        q.processAllAvailable()
        rows = [
            (r.word, r["count"])
            for r in spark.sql("select * from golden_wc").collect()
        ]
        # final batch: {hello:4, world:2} — unordered across keys
        assert set(rows[-2:]) == {("hello", 4), ("world", 2)}
    finally:
        q.stop()


# --- §4 graph: connected components + writeback (AnalyticsSystemSpec) -------


def test_graph_golden_components(spark):
    edges = spark.createDataFrame([(1, 2), (3, 4), (2, 3)], "src long, dst long")
    got = {r.vertex: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}
    # exactly one component record, keyed by min vertex id
    assert set(got.values()) == {1}


def test_graph_writeback_compacted_reread(spark):
    # components state after the run: {1: Component(...)}; writeback appends
    # a tombstone for key 1 and a fresh record for key 2, then compacted
    # re-read must yield exactly [(2, ...)] (AnalyticsSystemSpec:64-101)
    state = spark.createDataFrame(
        [(1, 100, "comp-1", False)], "key int, ts long, payload string, dead boolean"
    )
    writeback = spark.createDataFrame(
        [(1, 200, None, True), (2, 200, "comp-0-empty", False)],
        "key int, ts long, payload string, dead boolean",
    )
    got = merge_upsert(state, writeback, ["key"], "ts", tombstone_col="dead").collect()
    assert [(r.key, r.payload) for r in got] == [(2, "comp-0-empty")]


# --- §5 compaction: latest-by-event-time, not last-in-log (LogRDDSpec) ------


@pytest.fixture(scope="module")
def compaction_log(spark):
    rows = []
    for i in range(100):
        # log append order: January, February, then December-2017 (oldest
        # event time written LAST)
        rows.append((i, f"jan-{i}", 1514764801000 + i * 1000, 0))
        rows.append((i, f"feb-{i}", 1517443201000 + i * 1000, 1))
        rows.append((i, f"dec-{i}", 1512086401000 + i * 1000, 2))
    return spark.createDataFrame(rows, "key int, data string, ts long, offset long")


def test_compaction_max_by_event_time(spark, compaction_log):
    got = compact_latest(compaction_log, ["key"], "ts", tiebreak_cols=["offset"])
    rows = got.collect()
    assert len(rows) == 100
    assert all(r.data.startswith("feb-") for r in rows)


def test_compaction_timerange_bounded(spark, compaction_log):
    # last 50 seconds of the February window
    tr = TimeRange.inclusive(1517443201000 + 50 * 1000, 1517443201000 + 99 * 1000)
    got = compact_latest(
        compaction_log.filter(tr.predicate(F.col("ts"), "millis")), ["key"], "ts"
    ).collect()
    assert len(got) == 50
    assert all(r.data.startswith("feb-") for r in got)


def test_compaction_join_subset(spark, compaction_log):
    compacted = compact_latest(compaction_log, ["key"], "ts", tiebreak_cols=["offset"])
    keys = spark.createDataFrame([(49,), (50,)], "key int")
    got = sorted(r.data for r in compacted.join(keys, "key").collect())
    assert got == ["feb-49", "feb-50"]


# --- §6 kv unit fixtures: TTL, read-only, 1-N prefix ------------------------


def test_kv_ttl_expiry_reads_as_miss(spark):
    df = spark.createDataFrame(
        [("a", "v1", 1000), ("b", "v2", 9000)], "key string, value string, ts long"
    )
    live = ttl_filter(df, "ts", ttl_ms=5000, now_ms=10000, ts_unit="millis")
    assert [r.key for r in live.collect()] == ["b"]


def test_kv_external_table_rejects_writes(spark, tmp_path):
    from affinity_spark.sources.keyed_table import KeyedTable

    t = KeyedTable(spark, str(tmp_path / "ext"), ["k"], "ts", external=True)
    with pytest.raises(PermissionError):
        t.upsert(spark.createDataFrame([(1, 100, "x")], "k long, ts long, v string"))


def test_kv_one_to_n_prefix(spark):
    rows = [(7, sub, f"v{sub}") for sub in range(5)] + [(8, 0, "other")]
    df = spark.createDataFrame(rows, "prefix int, sub int, value string")
    got = prefix_scan(df, {"prefix": 7})
    assert sorted(r.sub for r in got.collect()) == [0, 1, 2, 3, 4]


# --- §7 latest-news: last-3-per-partition window (ExampleESGateway) ---------


def test_latest_news_last3_per_partition(spark):
    rows = [(p, seq, f"news-{p}-{seq}") for p in range(2) for seq in range(10)]
    df = spark.createDataFrame(rows, "partition int, seq long, item string")
    got = top_n_per_group(df, ["partition"], [F.col("seq").desc()], 3)
    by_p = {}
    for r in got.collect():
        by_p.setdefault(r.partition, []).append(r.item)
    assert sorted(by_p[0]) == ["news-0-7", "news-0-8", "news-0-9"]
    assert sorted(by_p[1]) == ["news-1-7", "news-1-8", "news-1-9"]


# --- §8 schema evolution (Spark mapping of AvroProjectionSpec) --------------


def test_schema_evolution_added_defaulted_field(spark, tmp_path):
    """Data written under schema v1 must read under v2 (added nullable
    field) — the parquet-side analog of Avro writer→reader projection."""
    p = str(tmp_path / "evo.parquet")
    spark.createDataFrame([(1, "a")], "id int, name string").write.parquet(p)
    v2 = "id int, name string, score double"
    got = spark.read.schema(v2).parquet(p).collect()
    assert got[0].score is None and got[0].name == "a"
