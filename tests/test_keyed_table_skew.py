"""KeyedTable (versioned keyed parquet table) and skew-mitigation operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from affinity_spark.operators.skew import replicate_join, salted_aggregate
from affinity_spark.sources.keyed_table import KeyedTable
from affinity_spark.timerange import TimeRange


def _table(spark, tmp_path):
    return KeyedTable(
        spark, str(tmp_path / "kt"), ["k"], "ts", tiebreak_cols=["seq"], num_buckets=4
    )


def test_keyed_table_upsert_and_get(spark, tmp_path):
    t = _table(spark, tmp_path)
    assert not t.exists()
    t.upsert(spark.createDataFrame([(1, 100, 1, "a"), (2, 100, 1, "b")], "k long, ts long, seq int, v string"))
    assert t.exists()
    assert {r.k: r.v for r in t.read().collect()} == {1: "a", 2: "b"}
    t.upsert(spark.createDataFrame([(1, 200, 1, "a2"), (3, 100, 1, "c")], "k long, ts long, seq int, v string"))
    assert {r.k: r.v for r in t.read().collect()} == {1: "a2", 2: "b", 3: "c"}
    got = t.get({"k": 1}).collect()
    assert len(got) == 1 and got[0].v == "a2"


def test_keyed_table_stale_update_loses(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.upsert(spark.createDataFrame([(1, 500, 1, "fresh")], "k long, ts long, seq int, v string"))
    t.upsert(spark.createDataFrame([(1, 100, 1, "stale")], "k long, ts long, seq int, v string"))
    assert t.read().collect()[0].v == "fresh"


def test_keyed_table_snapshot_isolation(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.upsert(spark.createDataFrame([(1, 100, 1, "a")], "k long, ts long, seq int, v string"))
    snapshot = t.read()  # reader on version N
    t.upsert(spark.createDataFrame([(1, 200, 1, "b")], "k long, ts long, seq int, v string"))
    # new reader sees the new version
    assert t.read().collect()[0].v == "b"
    # Note: the old snapshot df's files are deleted on overwrite — this is
    # the documented parquet-backed gap vs a real table format; reading the
    # CURRENT version is always consistent via the atomic pointer.


def test_keyed_table_scan_with_range(spark, tmp_path):
    t = _table(spark, tmp_path)
    rows = [(1, 100, 1, "x"), (2, 200, 1, "y"), (3, 300, 1, "z")]
    t.upsert(spark.createDataFrame(rows, "k long, ts long, seq int, v string"))
    got = t.scan({}, TimeRange.of(150, 250), ts_unit="millis").collect()
    assert [r.v for r in got] == ["y"]


def test_salted_aggregate_matches_plain(spark):
    rows = [(i % 3, i, float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "g int, i long, x double")
    plain = {
        (r.g): (r.n, r.s, r.mn, r.mx)
        for r in df.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("i").alias("s"),
            F.min("x").alias("mn"),
            F.max("x").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.g): (r.n, r.s, r.mn, r.mx)
        for r in salted_aggregate(
            df,
            ["g"],
            {
                "n": (F.lit(1), "count"),
                "s": (F.col("i"), "sum"),
                "mn": (F.col("x"), "min"),
                "mx": (F.col("x"), "max"),
            },
            n_salts=7,
        ).collect()
    }
    assert salted == plain


def test_replicate_join_matches_plain(spark):
    big = spark.createDataFrame([(i % 5, i) for i in range(500)], "k int, v long")
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(5)], "k int, name string")
    plain = sorted((r.v, r.name) for r in big.join(small, "k").collect())
    salted = sorted((r.v, r.name) for r in replicate_join(big, small, ["k"], n_salts=4).collect())
    assert salted == plain


def test_keyed_table_vacuum(spark, tmp_path):
    t = _table(spark, tmp_path)
    rows = [(1, 100, 1, "old"), (2, 900, 1, "fresh"), (3, 950, 1, "fresher")]
    t.upsert(spark.createDataFrame(rows, "k long, ts long, seq int, v string"))
    removed = t.vacuum(ttl_ms=200, now_ms=1000)
    assert removed == 1
    assert sorted(r.k for r in t.read().collect()) == [2, 3]


def test_keyed_table_readable_by_vanilla_engine(spark, tmp_path):
    """Interop (SURVEY §5 tier 6 analog): state written by the engine must
    be readable by a vanilla external reader — here DuckDB reading the
    committed version's parquet directly, as KafkaStorageSpec proves with
    a vanilla Confluent consumer."""
    import duckdb

    t = _table(spark, tmp_path)
    t.upsert(
        spark.createDataFrame(
            [(1, 100, 1, "a"), (2, 200, 1, "b")], "k long, ts long, seq int, v string"
        )
    )
    vdir = t._current_version_dir()
    con = duckdb.connect()
    got = con.execute(
        f"SELECT k, v FROM read_parquet('{vdir}/*.parquet') ORDER BY k"
    ).fetchall()
    assert got == [(1, "a"), (2, "b")]
