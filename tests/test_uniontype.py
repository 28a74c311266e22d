"""Tagged-union encoding (sealed-trait mapping, SURVEY §7 hard part 2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from affinity_spark.functions.uniontype import (
    make_union,
    match_union,
    split_by_variant,
    union_get,
    union_is,
    union_tag,
)


def _events(spark):
    # a payment|refund event union, driven by a tag column
    rows = [
        (1, "payment", 100.0, None),
        (2, "refund", None, "fraud"),
        (3, "payment", 25.0, None),
    ]
    df = spark.createDataFrame(rows, "id int, kind string, amount double, reason string")
    return df.select(
        "id",
        make_union(
            {
                "payment": F.struct(F.col("amount").alias("amount")),
                "refund": F.struct(F.col("reason").alias("reason")),
            },
            F.col("kind"),
        ).alias("event"),
    )


def test_tag_and_variant_access(spark):
    df = _events(spark)
    got = df.select(
        "id",
        union_tag(F.col("event")).alias("tag"),
        union_get(F.col("event"), "payment").getField("amount").alias("amt"),
    ).collect()
    by_id = {r.id: (r.tag, r.amt) for r in got}
    assert by_id[1] == ("payment", 100.0)
    assert by_id[2] == ("refund", None)  # wrong-variant access is NULL, not error


def test_match_union(spark):
    df = _events(spark)
    got = df.select(
        "id",
        match_union(
            F.col("event"),
            {
                "payment": union_get(F.col("event"), "payment").getField("amount"),
                "refund": F.lit(-1.0),
            },
        ).alias("value"),
    ).collect()
    assert {r.id: r.value for r in got} == {1: 100.0, 2: -1.0, 3: 25.0}


def test_split_by_variant(spark):
    df = _events(spark)
    parts = split_by_variant(df, "event")
    assert set(parts) == {"payment", "refund"}
    pay = parts["payment"].select("id", F.col("payment").getField("amount").alias("amount"))
    assert sorted((r.id, r.amount) for r in pay.collect()) == [(1, 100.0), (3, 25.0)]
    assert parts["refund"].count() == 1


def test_filter_by_variant_prunes(spark):
    df = _events(spark)
    assert df.filter(union_is(F.col("event"), "payment")).count() == 2
