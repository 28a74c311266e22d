"""SQL-API surface (register_views + spark.sql must agree with the
DataFrame plans) and Kafka source option builders (TimeRange → broker-side
seek translation, S1)."""

from __future__ import annotations

import json

from affinity_spark import TimeRange
from affinity_spark.sources.kafka import kafka_batch_options, kafka_stream_options
from affinity_spark.tables import register_views

SF = "/root/testdata/sf0.001"


def test_sql_surface_matches_dataframe(spark):
    import __spark_entry__ as e

    register_views(spark, SF)
    sql_rows = spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    ).collect()
    df_rows = {
        (r.l_returnflag, r.l_linestatus): r.count_order
        for r in e.q1_pricing_summary(spark, SF).collect()
    }
    assert {(r.l_returnflag, r.l_linestatus): r.n for r in sql_rows} == df_rows


def test_kafka_batch_options_bounded_range():
    tr = TimeRange.of(1000, 2000)
    opts = kafka_batch_options("broker:9092", "events", 3, tr)
    assert opts["subscribe"] == "events"
    starting = json.loads(opts["startingOffsetsByTimestamp"])
    ending = json.loads(opts["endingOffsetsByTimestamp"])
    assert starting == {"events": {"0": 1000, "1": 1000, "2": 1000}}
    assert ending == {"events": {"0": 2000, "1": 2000, "2": 2000}}


def test_kafka_batch_options_unbounded():
    opts = kafka_batch_options("b:9092", "t", 2, None)
    assert opts["startingOffsets"] == "earliest"
    assert opts["endingOffsets"] == "latest"
    assert "startingOffsetsByTimestamp" not in opts


def test_kafka_batch_options_half_bounded():
    opts = kafka_batch_options("b:9092", "t", 2, TimeRange.since(5000))
    assert "startingOffsetsByTimestamp" in opts
    assert opts["endingOffsets"] == "latest"


def test_kafka_stream_options_backpressure():
    opts = kafka_stream_options("b:9092", "t", max_offsets_per_trigger=10_000)
    assert opts["maxOffsetsPerTrigger"] == "10000"
    assert opts["startingOffsets"] == "earliest"
