"""Driver contract for the spark-graft builder (PySpark target).

Every entry in ``queries()`` is an operator from SURVEY.md §2 (or the
LLM-pipeline extension set) expressed as an idiomatic Spark plan through
``affinity_spark``; ``oracle_sql()`` holds the DuckDB-equivalent ANSI SQL.
Cross-engine determinism rules used throughout:

- aggregates/computed columns aliased identically on both sides;
- float ratios compared via exact integer arithmetic (e.g. Jaccard >= 1/2
  as ``2*n_common >= n_union``) or emitted as ``floor(10000*x)`` ints;
- sums of 2-decimal money values rounded to 2 (true sums are whole cents);
- timestamps emitted as formatted strings, never raw timestamps;
- all text hashing is md5-derived so DuckDB reproduces it bit-for-bit
  (see affinity_spark.functions.murmur2.stable_token_hash).
"""

from __future__ import annotations

import math
import os
from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from affinity_spark import TimeRange
from affinity_spark.cache import track as _track_cache
from affinity_spark.tables import load as load_table
from affinity_spark.functions.text import (
    EN_STOPWORDS,
    doc_fingerprint,
    lang_id,
    let_bound,
    quality_columns,
    token_count,
    tokenize,
)
from affinity_spark.operators import dedup as dd
from affinity_spark.operators.asof import asof_join
from affinity_spark.operators.multimodal import blob_metadata, extract_features
from affinity_spark.operators.upsert import merge_upsert
from affinity_spark.operators import similarity as sim
from affinity_spark.operators.graph import connected_components
from affinity_spark.operators.index import build_inverted_index, index_lookup
from affinity_spark.operators.kv import compact_latest, point_get, prefix_scan, ttl_filter
from affinity_spark.operators.topk import global_top_n, top_n_per_group


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _postings(spark: SparkSession, sf_dir: str):
    """Materialized postings index over the documents corpus — built ONCE
    per process and shared by the whole retrieval family (bm25 / tfidf /
    phrase), the maintained-index architecture of the reference's X1/X2
    (``KVStoreLocal.scala:195-248``, incremental maintenance pinned by
    tests/test_incremental_index.py).  Unigram positional + trigram tf
    tables cover every current consumer."""
    from affinity_spark.operators.postings import shared_postings

    return shared_postings(
        spark,
        _t(spark, sf_dir, "documents"),
        corpus_key=os.path.abspath(sf_dir),
        grams=(1, 3),
    )


# --------------------------------------------------------------------------
# TPC-H-shaped analytical queries (headline bench workload)
# --------------------------------------------------------------------------


def _cents(col):
    """Exact integer cents of a non-negative 2-decimal money expression.

    ``floor(x*100 + 0.5)`` is a single deterministic IEEE-double pipeline, so
    Spark and DuckDB produce bit-identical longs per row; summing longs is
    then order-independent (unlike summing doubles, which differs across
    engines by accumulation order).
    """
    return F.floor(col * 100 + F.lit(0.5))


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + hash aggregate (S10/A1/A3 spine)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_price_cents"),
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "sum_disc_price_cents"
            ),
            F.sum(
                _cents(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                )
            ).alias("sum_charge_cents"),
            F.sum(F.floor(F.col("l_discount") * 10000 + F.lit(0.5))).alias("sum_disc_bp"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_base_price_cents,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_disc_price_cents,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_charge_cents,
       CAST(sum(CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_bp,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: join + agg + global top-k (TakeOrderedAndProject)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).filter(
        (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue_cents"
        )
    )
    return global_top_n(
        agg.select(
            "l_orderkey",
            "revenue_cents",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        ),
        [F.col("revenue_cents").desc(), F.col("l_orderkey").asc()],
        10,
    )


_Q3_SQL = """
SELECT l_orderkey,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue_cents DESC, l_orderkey ASC
LIMIT 10
"""


def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with broadcast dims + agg.

    Join order is fact-first: the selective o_orderdate filter lands on the
    orders SCAN, the filtered orders join lineitem (the one unavoidable big
    shuffle shrinks by the filter's selectivity), and customer joins the
    already-reduced fact side — at 100x scale this halves the bytes through
    the first shuffle vs joining customer x orders first.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"]) & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_cents"
            )
        )
    )


_Q5_SQL = """
SELECT n_name,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure pushed-down filter + single-row agg (R2/A1)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue_cents"))
    )


_Q6_SQL = """
SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT)
  AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery → left-semi join
    (Catalyst decorrelation)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # "late" = a lineitem shipped more than 60 days after the order date
    # (the fixtures carry no receipt/commit dates; EXISTS shape preserved)
    joined = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    late = li.select("l_orderkey", "l_shipdate")
    return (
        joined.join(
            late,
            (joined["o_orderkey"] == late["l_orderkey"])
            & (late["l_shipdate"] > joined["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: 4-way join + agg + top-20 (customers losing revenue
    to returned items)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    agg = (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .filter(
            (F.col("l_returnflag") == "R")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_cents"
            )
        )
    )
    return global_top_n(
        agg, [F.col("revenue_cents").desc(), F.col("c_custkey").asc()], 20
    )


_Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_cents DESC, c_custkey ASC
LIMIT 20
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair volume (supplier nation ≠
    customer nation), per year."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("s_nk"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("c_nk"))
        .filter(
            (F.col("supp_nation") != F.col("cust_nation"))
            & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "volume_cents"
            )
        )
    )


_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS volume_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3
"""


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregate over a part join — promo
    revenue share in basis points (exact integer ratio of cents sums)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).alias(
            "promo_cents"
        ),
        F.sum(rev).alias("total_cents"),
    )
    # integer division, not floor(double ratio): cents*10000 can pass 2^53
    # at large SF where double division would misround. Guarded: ANSI mode
    # turns total_cents=0 (empty-but-not-NULL month) into DIVIDE_BY_ZERO.
    return agg.select(
        "promo_cents",
        "total_cents",
        F.when(
            F.col("total_cents") != 0,
            F.expr("promo_cents * 10000 div total_cents"),
        ).alias("promo_bp"),
    )


_Q14_SQL = """
WITH j AS (
  SELECT CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS rev,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
)
SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT) AS promo_cents,
       CAST(sum(rev) AS BIGINT) AS total_cents,
       CAST(CASE WHEN sum(rev) <> 0
                 THEN sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) * 10000
                      // sum(rev)
            END AS BIGINT) AS promo_bp
FROM j
"""


def parts_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part dimension profile: per (brand, type) count, size spread, and
    retail price cents — the catalog-maintenance scan over `part`."""
    p = _t(spark, sf_dir, "part")
    return p.groupBy("p_brand", "p_type").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_size").alias("min_size"),
        F.max("p_size").alias("max_size"),
        F.sum(_cents(F.col("p_retailprice"))).alias("retail_cents"),
    )


_PART_STATS_SQL = """
SELECT p_brand, p_type, count(*) AS n_parts,
       min(p_size) AS min_size, max(p_size) AS max_size,
       CAST(sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS retail_cents
FROM part
GROUP BY p_brand, p_type
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join + two-level aggregate (orders-per-
    customer histogram, including zero-order customers)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


_Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN (SELECT * FROM orders WHERE o_orderstatus <> 'F') o
    ON c_custkey = o.o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join (the §2.6 anti-join the reference
    lacks), with a selective residual predicate."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1997-06-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
    )


_ANTI_SQL = """
SELECT c_custkey, c_name, c_nationkey
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1997-06-01 00:00:00')
"""


# --------------------------------------------------------------------------
# KV / state read semantics (SURVEY §2.2, §2.1 S10)
# --------------------------------------------------------------------------


def events_point_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 point get: key-equality predicate pushed to the parquet scan."""
    ev = _t(spark, sf_dir, "events")
    return point_get(ev, {"event_id": 4242}).select(
        "event_id", "user_id", "event_type", F.col("value").alias("val")
    )


_POINT_GET_SQL = """
SELECT event_id, user_id, event_type, "value" AS val
FROM events WHERE event_id = 4242
"""


def events_prefix_timerange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 prefix + time-range scan (the ExampleBank account query shape)."""
    ev = _t(spark, sf_dir, "events")
    tr = TimeRange.of("2024-01-10T00:00:00Z", "2024-01-20T00:00:00Z")
    return prefix_scan(ev, {"user_id": 42}, tr, "ts").select(
        "event_id", "event_type", F.col("value").alias("val")
    )


_PREFIX_SCAN_SQL = """
SELECT event_id, event_type, "value" AS val
FROM events
WHERE user_id = 42
  AND ts >= TIMESTAMP '2024-01-10 00:00:00'
  AND ts < TIMESTAMP '2024-01-20 00:00:00'
"""


def events_compact_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10/A3 log compaction: latest record per key by event time."""
    ev = _t(spark, sf_dir, "events")
    return compact_latest(
        ev, ["user_id"], "ts", tiebreak_cols=["event_id"]
    ).select(
        "user_id", "event_id", "event_type", F.col("value").alias("val")
    )


_COMPACT_SQL = """
SELECT user_id, event_id, event_type, "value" AS val
FROM (
  SELECT user_id, event_id, event_type, "value",
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def events_ttl_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 TTL expiry as a read-time filter (fixed 'now' for determinism)."""
    ev = _t(spark, sf_dir, "events")
    now_ms = TimeRange.since("2024-01-31T00:00:00Z").start_ms
    ttl_ms = 6 * 24 * 3600 * 1000  # 6 days
    return ttl_filter(ev, "ts", ttl_ms, now_ms).select("event_id", "user_id", "event_type")


_TTL_SQL = """
SELECT event_id, user_id, event_type
FROM events
WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
"""


def events_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/T3 time-block stats: tumbling daily window per event type."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("sum_value_cents"),
        )
    )


_WINDOW_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(floor("value" * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events
GROUP BY 1, 2
"""


def events_sliding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows — the §2.11 window shape tumbling can't
    express: 2-hour windows every 1 hour, so each event lands in exactly
    two overlapping windows. Built on F.window(ts, '2 hours', '1 hour');
    the window start is emitted as a formatted string (timestamps never
    hash raw). The oracle replays the hop membership arithmetic
    (start = hour(ts) - k, k in {0,1}) in closed form."""
    ev = _t(spark, sf_dir, "events")
    w = F.window("ts", "2 hours", "1 hour")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("sum_value_cents"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value_cents",
        )
    )


_SLIDING_SQL = """
WITH hopped AS (
  SELECT event_type, "value",
         date_trunc('hour', ts) - (k.k * INTERVAL 1 HOUR) AS win_start
  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) k
)
SELECT strftime(win_start, '%Y-%m-%d %H:%M') AS win_start, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(floor("value" * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM hopped
GROUP BY 1, 2
"""



def events_topn_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6/O2 latest-N per key: rank-limited window (top-3 per user)."""
    ev = _t(spark, sf_dir, "events")
    return top_n_per_group(
        ev,
        ["user_id"],
        [F.col("ts").desc(), F.col("event_id").desc()],
        3,
        rank_col="recency_rank",
    ).select("user_id", "event_id", "event_type", "recency_rank")


_TOPN_SQL = """
SELECT user_id, event_id, event_type, recency_rank
FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
           AS recency_rank
  FROM events
) WHERE recency_rank <= 3
"""


def orders_auto_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 per-group auto-increment id (monotonic per customer by order date)."""
    o = _t(spark, sf_dir, "orders")
    return top_n_per_group(
        o,
        ["o_custkey"],
        [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()],
        1 << 30,
        rank_col="auto_id",
    ).select("o_custkey", "o_orderkey", "auto_id")


_AUTOINC_SQL = """
SELECT o_custkey, o_orderkey,
       row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
         AS auto_id
FROM orders
"""


def events_num_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 key count (exact here; approx_count_distinct is the serving path)."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("num_keys"),
        F.count(F.lit(1)).alias("num_records"),
    )


_NUMKEYS_SQL = """
SELECT count(DISTINCT user_id) AS num_keys, count(*) AS num_records FROM events
"""


# --------------------------------------------------------------------------
# Joins / enrichment / set ops (SURVEY §2.6, §2.9)
# --------------------------------------------------------------------------


def join_enrich_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 stream-table lookup join (batch view): event enriched by dim row."""
    ev = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(c), ev["user_id"] == c["c_custkey"], "inner")
        .select("event_id", "user_id", "c_name", "c_mktsegment", "event_type")
    )


_ENRICH_SQL = """
SELECT event_id, user_id, c_name, c_mktsegment, event_type
FROM events JOIN customer ON user_id = c_custkey
"""


def mktsegment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+A1 equi-join + aggregate: order revenue per market segment."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_cents(F.col("o_totalprice"))).alias("total_revenue_cents"),
        )
    )


_SEGMENT_SQL = """
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_revenue_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 set operations: INTERSECT then EXCEPT over customer key sets."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    with_orders = o.select(F.col("o_custkey").alias("custkey")).distinct()
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    nation3 = c.filter(F.col("c_nationkey") == 3).select(F.col("c_custkey").alias("custkey"))
    return with_orders.intersect(building).exceptAll(nation3)


_SETOPS_SQL = """
(SELECT DISTINCT o_custkey AS custkey FROM orders
 INTERSECT
 SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING')
EXCEPT
SELECT c_custkey AS custkey FROM customer WHERE c_nationkey = 3
"""


def scatter_gather_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2/A1 scatter-gather reduce: partial-per-partition + final combine."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("total_qty"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("first_ship"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("last_ship"),
    )


_SCATTER_SQL = """
SELECT count(*) AS n_rows,
       sum(l_quantity) AS total_qty,
       strftime(min(l_shipdate), '%Y-%m-%d') AS first_ship,
       strftime(max(l_shipdate), '%Y-%m-%d') AS last_ship
FROM lineitem
"""


def distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (dropDuplicates) — dedup primitive on a low-card column."""
    return _t(spark, sf_dir, "events").select("event_type").distinct()


_DISTINCT_SQL = "SELECT DISTINCT event_type FROM events"


# --------------------------------------------------------------------------
# As-of / range / window analytics / rollup (SURVEY §2.6 end-note, §2.7)
# --------------------------------------------------------------------------


def asof_last_order_before_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks the user's latest order at-or-before the
    event time (union+window scheme, one shuffle — §2.6 as-of mapping)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    joined = asof_join(
        ev, o, ["user_id"], "ts", "o_orderdate", ["o_orderkey", "o_orderdate"]
    )
    return joined.select(
        "user_id",
        "event_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("last_orderdate"),
    )


_ASOF_SQL = """
WITH r AS (
  SELECT o_custkey AS user_id, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT e.user_id, e.event_id,
       r.o_orderkey AS last_orderkey,
       strftime(r.o_orderdate, '%Y-%m-%d') AS last_orderdate
FROM events e ASOF LEFT JOIN r
  ON e.user_id = r.user_id AND e.ts >= r.o_orderdate
"""


def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (year, month): subtotal + grand-total rows (§2.7 grouping
    sets, a Spark built-in the reference lacks)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            F.col("o_totalprice"),
        )
        .rollup("y", "m")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_cents(F.col("o_totalprice"))).alias("revenue_cents"),
        )
    )


_ROLLUP_SQL = """
SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
       count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders
GROUP BY ROLLUP(year(o_orderdate), month(o_orderdate))
"""


def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (year, priority) with grouping_id: all four grouping sets in one
    pass (§2.7 grouping sets — rollup's sibling; one shuffle, the expand
    happens map-side)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("y"),
            F.col("o_orderpriority").alias("prio"),
            F.col("o_totalprice"),
        )
        .cube("y", "prio")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_cents(F.col("o_totalprice"))).alias("revenue_cents"),
        )
    )


_CUBE_SQL = """
SELECT year(o_orderdate) AS y, o_orderpriority AS prio,
       CAST(GROUPING(year(o_orderdate)) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
       count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders
GROUP BY CUBE(year(o_orderdate), o_orderpriority)
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: per-user sessions split on >1h inactivity gaps
    (batch analog of session_window, T3).

    Window order is by unique ``event_id`` alone — events.parquet carries
    TIMESTAMP(NANOS) and cross-engine ts ordering is precision-dependent
    (Spark truncates to micros); event_id is generated in ts order, unique,
    and identical in every engine. The gap test itself uses whole seconds,
    which are unaffected by the nanos truncation.
    """
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").asc())
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 3600), F.lit(1)).otherwise(F.lit(0)),
    )
    return flagged.withColumn(
        "session_id", F.sum("new_session").over(w)
    ).select("user_id", "event_id", "session_id")


# CAST the windowed sum: DuckDB's integer sum() yields HUGEINT (arrow
# decimal128), which value-hashes differently from Spark's BIGINT even when
# numerically equal — every integer-sum oracle in this file casts to BIGINT.
_SESSION_SQL = """
SELECT user_id, event_id,
       CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY event_id ASC
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY event_id ASC)
                   IS NULL
               OR date_diff('second',
                            lag(ts) OVER (PARTITION BY user_id ORDER BY event_id ASC),
                            ts) > 3600
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
"""


def events_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 via the NATIVE session_window operator in batch: per-user sessions
    merging events with gaps < 30 min; a gap of exactly 30 min starts a new
    session (window is [ts, ts+gap)). The oracle replays the same semantics
    as gaps-and-islands SQL (new session iff diff_us >= 1800e6), with the
    session start emitted as a formatted string (never a raw timestamp)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


_SESSION_WINDOW_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
ids AS (
  SELECT user_id, ts,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM flagged
)
SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events
FROM ids
GROUP BY user_id, sid
"""



def orders_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: per order, count the same customer's other
    orders in the preceding 30 days (inequality join — Spark built-in the
    reference lacks, §2.6 end-note). Equi-key on customer keeps the range
    condition a within-group band, never a cartesian."""
    o = _t(spark, sf_dir, "orders")
    a = o.select("o_orderkey", "o_custkey", "o_orderdate")
    b = o.select(
        F.col("o_custkey").alias("b_custkey"),
        F.col("o_orderkey").alias("b_orderkey"),
        F.col("o_orderdate").alias("b_orderdate"),
    )
    joined = a.join(
        b,
        (a["o_custkey"] == b["b_custkey"])
        & (b["b_orderdate"] < a["o_orderdate"])
        & (b["b_orderdate"] >= a["o_orderdate"] - F.expr("INTERVAL 30 DAYS")),
        "left",
    )
    return joined.groupBy("o_orderkey").agg(
        F.count("b_orderkey").alias("n_prior_30d")
    )


_RANGE_JOIN_SQL = """
SELECT a.o_orderkey, count(b.o_orderkey) AS n_prior_30d
FROM orders a
LEFT JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND b.o_orderdate < a.o_orderdate
 AND b.o_orderdate >= a.o_orderdate - INTERVAL 30 DAY
GROUP BY a.o_orderkey
"""


def events_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window analytics: per-user running event count + value total."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    # Ordered by unique event_id (ts-monotone) — see events_sessionize note
    # on TIMESTAMP(NANOS) precision and cross-engine ordering.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("running_n"),
        F.sum(_cents(F.col("value"))).over(w).alias("running_value_cents"),
    )


_RUNNING_SQL = """
SELECT user_id, event_id,
       count(*) OVER w AS running_n,
       CAST(sum(CAST(floor("value" * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT)
           AS running_value_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id ASC ROWS UNBOUNDED PRECEDING)
"""


def events_update_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5/W6 ``getAndUpdate``/``updateAndGet`` observable contract replayed
    as a batch changelog (the driver-checkable twin of
    ``streaming/state.py::get_and_update_stream``, whose batch-oracle the
    streaming engine itself can never provide): per user, ordered by the
    log offset (unique ts-monotone event_id), state is the running
    value-cents total; every event emits its (old, new) state pair, old
    NULL on first touch — the reference's ``Option[V]`` read-modify-write
    pair (``core/.../state/KVStoreLocal.scala:413-464``).

    Plan shape: both window expressions share one (user_id, event_id)
    sort — a single exchange, state one running long per key, exactly the
    streaming operator's cost model."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lag = Window.partitionBy("user_id").orderBy(F.col("event_id").asc())
    stepped = ev.select(
        "user_id",
        "event_id",
        F.sum(_cents(F.col("value"))).over(w_run).alias("new_cents"),
    )
    return stepped.select(
        "user_id",
        "event_id",
        F.lag("new_cents", 1).over(w_lag).alias("old_cents"),
        "new_cents",
    )


_UPDATE_PAIRS_SQL = """
SELECT user_id, event_id,
       CAST(lag(new_cents) OVER (PARTITION BY user_id ORDER BY event_id)
            AS BIGINT) AS old_cents,
       CAST(new_cents AS BIGINT) AS new_cents
FROM (
  SELECT user_id, event_id,
         sum(CAST(floor("value" * 100 + 0.5) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING)
           AS new_cents
  FROM events
)
"""


def events_latest_n_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 latest-N ring buffer FINAL state replayed in batch (the
    driver-checkable twin of ``streaming/state.py::latest_n_stream``): per
    user the last 3 event_ids in arrival order (newest last) as a joined
    string, plus the buffer fill count — exactly the state the streaming
    ring buffer holds once the changelog drains (the reference's
    latest-news listener deque, ``ExampleESGateway.scala:63-69``).

    Plan shape: the per-key top-3 rides WindowGroupLimit (rank pushdown),
    so each group materializes 3 rows before the final tiny aggregate —
    never a full per-key sort spill."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    last3 = ev.select("user_id", "event_id").withColumn(
        "rn", F.row_number().over(w)
    ).filter(F.col("rn") <= 3)
    return last3.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("event_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("latest_ids"),
        F.count(F.lit(1)).alias("n_items"),
    )


_LATEST_N_STATE_SQL = """
WITH top3 AS (
  SELECT user_id, event_id
  FROM events
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) <= 3
)
SELECT user_id,
       string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id) AS latest_ids,
       count(*) AS n_items
FROM top3
GROUP BY user_id
"""


_DEBOUNCE_INTERVAL_MS = 6 * 3600 * 1000


def events_debounce_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 per-key push debounce replayed in batch (the driver-checkable
    twin of ``streaming/state.py::debounce_stream``, completing the
    batch-twin set for the stateful operators): per user, emit a row only
    when >= 6 h passed since the user's LAST EMITTED row, carrying the
    count of rows suppressed since that emission. The fold depends on the
    last EMITTED ts (not the previous row), so it is no window function —
    it runs as ONE engine-side ``aggregate`` over the per-key sorted ts
    array (``debounce_replay``): one shuffle, integer ms arithmetic, the
    same (last, pending) state per key the streaming operator checkpoints.
    Streaming/batch equivalence on a shared changelog is pinned by
    tests/test_streaming_batch_twins.py."""
    from affinity_spark.streaming.state import debounce_replay

    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_millis(F.col("ts")).alias("ts_ms")
    )
    return debounce_replay(ev, "user_id", "ts_ms", _DEBOUNCE_INTERVAL_MS)


def _debounce_state_sql() -> str:
    # greedy emission sequence via recursive CTE (per-user chain of
    # "next ts >= last_emitted + interval"); the suppressed count for an
    # emission is the rows in [prev_emit, this_emit) minus the emitted
    # prev row itself.  (A list_reduce fold would mirror the Spark
    # aggregate directly, but DuckDB 1.0's list_reduce corrupts
    # list-valued struct fields in the accumulator - probed in r5.)
    i = _DEBOUNCE_INTERVAL_MS
    nxt = (
        "(SELECT min(e.ts_ms) FROM e "
        f"WHERE e.user_id = em.user_id AND e.ts_ms >= em.ts_ms + {i})"
    )
    return f"""
WITH RECURSIVE e AS (
  -- NULL ts pinned out explicitly: Spark's collect_list skips NULLs (a
  -- key with only-NULL ts emits nothing), while min(ts_ms) over an
  -- all-NULL group would emit a (user, NULL, 0) seed row here
  SELECT user_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms FROM events
  WHERE ts IS NOT NULL
),
em(user_id, ts_ms) AS (
  SELECT user_id, min(ts_ms) FROM e GROUP BY user_id
  UNION ALL
  SELECT em.user_id, {nxt} FROM em WHERE {nxt} IS NOT NULL
),
w AS (
  SELECT user_id, ts_ms,
         lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) AS prev
  FROM em
)
SELECT w.user_id, w.ts_ms,
       CASE WHEN w.prev IS NULL THEN CAST(0 AS BIGINT)
            ELSE (SELECT CAST(count(*) AS BIGINT) - 1 FROM e
                  WHERE e.user_id = w.user_id
                    AND e.ts_ms >= w.prev AND e.ts_ms < w.ts_ms)
       END AS suppressed_before
FROM w
"""


def docs_proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR/k proximity search from the materialized positional index
    (the slop relaxation of phrase search): docs where the corpus's top
    bigram's two words co-occur within 5 positions in either order, with
    the pair count. Data-derived terms keep the query regeneration-proof;
    the whole query reads only the postings index — per-term
    partition-pruned scans and a posting-list-sized position join."""
    from affinity_spark.operators.index import proximity_lookup

    idx = _postings(spark, sf_dir)
    top = idx.top_bigram()
    w1 = top.select(F.split(F.col("phrase"), " ").getItem(0))
    w2 = top.select(F.split(F.col("phrase"), " ").getItem(1))
    near = proximity_lookup(idx.positional(), w1, w2, 5, ["doc_id"])
    return near.crossJoin(F.broadcast(top)).select("doc_id", "phrase", "n_near")


_PROXIMITY_SQL = r"""
WITH t AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                             x -> x <> '') AS toks
  FROM documents
),
bg AS (
  SELECT toks[i] || ' ' || toks[i+1] AS bg
  FROM t, unnest(range(1, len(toks))) AS r(i)
),
top AS (
  SELECT bg AS phrase,
         string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2
  FROM bg GROUP BY bg ORDER BY count(*) DESC, bg LIMIT 1
),
pos AS (
  SELECT doc_id, i AS p, toks[i] AS term
  FROM t, unnest(range(1, len(toks) + 1)) AS r(i)
),
m AS (
  SELECT a.doc_id, top.phrase, CAST(count(*) AS BIGINT) AS n_near
  FROM top, pos a JOIN pos b ON a.doc_id = b.doc_id
  WHERE a.term = top.w1 AND b.term = top.w2
    AND abs(a.p - b.p) <= 5 AND a.p <> b.p
  GROUP BY a.doc_id, top.phrase
)
SELECT doc_id, phrase, n_near FROM m
"""


def docs_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the share of a doc's trigram shingles that
    appear in NO other document (integer basis points) — the duplication
    profile corpus reports publish (high novelty = unique prose, low =
    boilerplate/template; the doc-level complement of the dedup tiers).
    One shingle-df aggregate + one per-doc aggregate, both postings-sized;
    df==1 shingles are by construction unique to their doc, so the join
    back is exact, not approximate."""
    docs = _t(spark, sf_dir, "documents")
    sh = dd.shingle_table(docs, "doc_id", "text", 3).select("doc_id", "shingle")
    dfc = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    per = (
        sh.join(dfc, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("_df") == 1).cast("long")).alias("n_unique"),
        )
    )
    return per.select(
        "doc_id",
        "n_shingles",
        "n_unique",
        F.expr("(n_unique * 10000) div n_shingles").alias("novelty_bp"),
    )


_NOVELTY_SQL = r"""
WITH t AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                             x -> x <> '') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 2, 0) + 1),
           i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
  FROM t WHERE len(toks) >= 3
),
dfc AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY shingle),
per AS (
  SELECT sh.doc_id,
         CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN dfc.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
  FROM sh JOIN dfc USING (shingle)
  GROUP BY sh.doc_id
)
SELECT doc_id, n_shingles, n_unique,
       (n_unique * 10000) // n_shingles AS novelty_bp
FROM per
"""


def docs_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-composition drift monitor: the 20 terms whose usage RATE
    diverges most between two sources ('src0' vs 'src1' — the
    lexicographically-first pair, regeneration-stable), with both rates in
    integer parts-per-billion and a support floor of 20 total occurrences.
    The between-crawl drift check a corpus pipeline runs before mixing a
    new snapshot into training data. Term counts come from the postings
    index joined to the doc→source map; rates are integer ppb
    (c·10⁹ div N, overflow-safe at any corpus size), so the ranking is
    engine-exact."""
    idx = _postings(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    tf = idx.tf_postings(1).join(
        F.broadcast(docs.filter(F.col("source").isin("src0", "src1"))), "doc_id"
    )
    per = tf.groupBy("term", "source").agg(F.sum("tf").alias("c"))
    tot = per.groupBy("source").agg(F.sum("c").alias("n"))
    wide = per.groupBy("term").agg(
        F.sum(F.when(F.col("source") == "src0", F.col("c")).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("source") == "src1", F.col("c")).otherwise(0)).alias("c1"),
    )
    totals = tot.groupBy().pivot("source", ["src0", "src1"]).sum("n")
    wide = (
        wide.crossJoin(F.broadcast(totals.select(F.col("src0").alias("n0"), F.col("src1").alias("n1"))))
        .filter(F.col("c0") + F.col("c1") >= 20)
        .select(
            "term",
            "c0",
            "c1",
            F.expr("(c0 * 1000000000) div n0").alias("rate0_ppb"),
            F.expr("(c1 * 1000000000) div n1").alias("rate1_ppb"),
            F.abs(
                F.expr("(c0 * 1000000000) div n0") - F.expr("(c1 * 1000000000) div n1")
            ).alias("drift_ppb"),
        )
    )
    return wide.orderBy(F.desc("drift_ppb"), F.asc("term")).limit(20)


_SOURCE_DRIFT_SQL = r"""
WITH t AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS toks
  FROM documents WHERE source IN ('src0', 'src1')
),
e AS (SELECT source, unnest(toks) AS term FROM t),
per AS (SELECT term, source, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1, 2),
tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM per GROUP BY source),
wide AS (
  SELECT term,
         CAST(coalesce(sum(CASE WHEN source = 'src0' THEN c END), 0) AS BIGINT) AS c0,
         CAST(coalesce(sum(CASE WHEN source = 'src1' THEN c END), 0) AS BIGINT) AS c1
  FROM per GROUP BY term
),
n0 AS (SELECT n FROM tot WHERE source = 'src0'),
n1 AS (SELECT n FROM tot WHERE source = 'src1')
SELECT term, c0, c1,
       (c0 * 1000000000) // n0.n AS rate0_ppb,
       (c1 * 1000000000) // n1.n AS rate1_ppb,
       abs((c0 * 1000000000) // n0.n - (c1 * 1000000000) // n1.n) AS drift_ppb
FROM wide CROSS JOIN n0 CROSS JOIN n1
WHERE c0 + c1 >= 20
ORDER BY drift_ppb DESC, term
LIMIT 20
"""


def docs_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word collocations by integer PMI from the positional postings index
    (Church & Hanks 1990): ordered pairs within a 2-token window, support
    >= 5, scored 4 + fl2(n_ab) + 2·fl2(U) − fl2(n_a) − fl2(n_b) − fl2(P)
    (decomposed floor-log2 sum — int64-safe at any corpus size, where the
    single-product form overflows at ~1e7 tokens; ±3-bit precision bound
    documented in ranking.pmi_collocations) — independence reads ~4, each
    doubling of association +1 — bit-exact in any engine. Pair generation is an offset
    equi-join on (doc, pos+d), postings-LINEAR, never per-doc quadratic;
    the corpus is never re-tokenized. Tokenizer/embedding diagnostics —
    which adjacent words glue together — straight off the index."""
    from affinity_spark.operators.ranking import pmi_collocations

    return pmi_collocations(_postings(spark, sf_dir), window=2, min_count=5, k=30)


_PMI_SQL = r"""
WITH t AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                             x -> x <> '') AS toks
  FROM documents
),
pos AS (
  SELECT doc_id, i AS p, toks[i] AS term
  FROM t, unnest(range(1, len(toks) + 1)) AS r(i)
),
uni AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM pos GROUP BY term),
pr AS (
  SELECT a.term AS w1, b.term AS w2, CAST(count(*) AS BIGINT) AS n_ab
  FROM pos a JOIN pos b
    ON a.doc_id = b.doc_id AND b.p - a.p BETWEEN 1 AND 2
  GROUP BY 1, 2
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS u FROM uni),
tp AS (SELECT CAST(sum(n_ab) AS BIGINT) AS np FROM pr),
scored AS (
  -- decomposed floor-log2 sum (never a single product: 16*n_ab*u*u
  -- overflows int64 at ~1e7 tokens; the sum is int64-safe at any scale)
  SELECT w1, w2, n_ab,
         CAST(4 + (length(bin(n_ab)) - 1) + 2 * (length(bin(u)) - 1)
                - (length(bin(na.n)) - 1) - (length(bin(nb.n)) - 1)
                - (length(bin(np)) - 1) AS BIGINT)
           AS pmi_log2_x16
  FROM pr
  JOIN uni na ON na.term = pr.w1
  JOIN uni nb ON nb.term = pr.w2
  CROSS JOIN tot CROSS JOIN tp
  WHERE n_ab >= 5
)
SELECT w1, w2, n_ab, pmi_log2_x16
FROM scored
WHERE pmi_log2_x16 > 0
ORDER BY pmi_log2_x16 DESC, n_ab DESC, w1, w2
LIMIT 30
"""


def docs_postings_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 index-build evidence, checked DIRECTLY (not through a consumer
    query): the 20 highest-df unigram terms with document frequency and
    total term frequency, computed ENTIRELY from the materialized postings
    index (``operators/postings.py``) — df and tf derive from the
    positional table, the documents corpus is never rescanned. The oracle
    recomputes the same statistics from raw text, so a drifted or stale
    index build fails loudly here before it skews bm25/tfidf/phrase."""
    idx = _postings(spark, sf_dir)
    return (
        idx.tf_postings(1)
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
        )
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(20)
    )


_POSTINGS_STATS_SQL = r"""
WITH t AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                             x -> x <> '') AS toks
  FROM documents
),
e AS (SELECT doc_id, unnest(toks) AS term FROM t),
g AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM e GROUP BY 1, 2)
SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
FROM g
GROUP BY term
ORDER BY df DESC, term
LIMIT 20
"""


def docs_online_lsh_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup bucket state replayed in batch (the
    driver-checkable twin of
    ``streaming/dedup_stream.py::streaming_near_dup_candidates``): the
    corpus arrives in doc-id order, each LSH band bucket stores its first
    1024 members, and an arriving doc emits one row PER SHARED BAND BUCKET
    for every stored earlier member whose exact Jaccard >= 1/2 — exactly
    the streaming operator's per-band emission cadence before the caller's
    sink-side collapse. Jaccard is emitted as integer basis points (the
    no-float-hash rule). Streaming/batch equivalence on a shared changelog
    is pinned by tests/test_streaming_batch_twins.py."""
    from affinity_spark.streaming.dedup_stream import online_lsh_replay

    docs = _t(spark, sf_dir, "documents")
    return online_lsh_replay(docs, "doc_id", "text", 3)


def _online_lsh_state_sql() -> str:
    return f"""
WITH {_duck_shingles_cte(3)},
{_duck_lsh_bands_cte()},
ranked AS (
  SELECT doc_id, band_id, band_hash,
         row_number() OVER (PARTITION BY band_id, band_hash ORDER BY doc_id) AS rk
  FROM bands
),
bp AS (
  SELECT a.doc_id AS dup_of, b.doc_id AS doc_id
  FROM ranked a
  JOIN bands b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
              AND a.doc_id < b.doc_id
  WHERE a.rk <= 1024
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nsh FROM h GROUP BY doc_id),
common AS (
  SELECT p.dup_of, p.doc_id, CAST(count(*) AS BIGINT) AS n_common
  FROM (SELECT DISTINCT dup_of, doc_id FROM bp) p
  JOIN h x ON x.doc_id = p.dup_of
  JOIN h y ON y.doc_id = p.doc_id AND y.shingle = x.shingle
  GROUP BY 1, 2
)
SELECT bp.doc_id, bp.dup_of,
       (c.n_common * 10000) // (sa.nsh + sb.nsh - c.n_common) AS jacc_bp
FROM bp
JOIN common c ON c.dup_of = bp.dup_of AND c.doc_id = bp.doc_id
JOIN sizes sa ON sa.doc_id = bp.dup_of
JOIN sizes sb ON sb.doc_id = bp.doc_id
WHERE 2 * c.n_common >= (sa.nsh + sb.nsh - c.n_common)
"""


def events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles (p50/p90/p99 of value, in cents) per
    event_type by RANK SELECTION: the value at 1-based sorted position
    (n-1)*q div 100 + 1. percentile_approx/quantile_cont interpolate in
    doubles and diverge across engines; rank selection is integer-exact
    and tie-order-independent (equal cents at a rank pick the same cents
    whatever the tie order). One shuffle on event_type; the sort is
    per-type within partitions, never global."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    cents = _cents(F.col("value"))
    w = Window.partitionBy("event_type").orderBy(
        cents.asc(), F.col("event_id").asc()
    )
    ranked = ev.select(
        "event_type",
        cents.alias("cents"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    pick = lambda q: F.min(  # noqa: E731
        F.when(F.col("rn") == F.expr(f"(n - 1) * {q} div 100 + 1"), F.col("cents"))
    )
    return ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        pick(50).alias("p50_cents"),
        pick(90).alias("p90_cents"),
        pick(99).alias("p99_cents"),
    )


_QUANTILES_SQL = """
WITH r AS (
  SELECT event_type,
         CAST(floor("value" * 100 + 0.5) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY CAST(floor("value" * 100 + 0.5) AS BIGINT),
                                     event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       CAST(min(CASE WHEN rn = (n - 1) * 50 // 100 + 1 THEN cents END) AS BIGINT)
         AS p50_cents,
       CAST(min(CASE WHEN rn = (n - 1) * 90 // 100 + 1 THEN cents END) AS BIGINT)
         AS p90_cents,
       CAST(min(CASE WHEN rn = (n - 1) * 99 // 100 + 1 THEN cents END) AS BIGINT)
         AS p99_cents
FROM r GROUP BY event_type
"""


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix: for each (from, to)
    pair, the count of consecutive same-user transitions and its share of
    the from-type's outgoing transitions in integer ppm — the Markov-
    chain view behavioral analytics builds funnels and anomaly baselines
    from (a sudden ppm shift in a transition row is a product change or
    a bot). Consecutive = event_id order per user (ts-monotone; see the
    sessionize note on timestamp precision). One window shuffle on
    user_id + one |types|²-bounded aggregate; corpus-linear."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").asc())
    steps = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = steps.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    outs = counts.groupBy("from_type").agg(F.sum("n").alias("_out"))
    return (
        counts.join(F.broadcast(outs), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr("(n * 1000000) div _out").alias("share_ppm"),
        )
    )


_TRANSITION_SQL = """
WITH steps AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
           AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, count(*) AS n
  FROM steps WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
),
outs AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS o FROM counts GROUP BY from_type)
SELECT c.from_type, c.to_type, c.n, (c.n * 1000000) // o.o AS share_ppm
FROM counts c JOIN outs o USING (from_type)
"""


def events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival gap statistics in integer milliseconds
    (lead/lag family): gaps from consecutive events in event_id order
    (ts-monotone — see events_sessionize note), min/max/integer-mean.
    Users with one event have no gaps and are excluded. One shuffle."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    ms = F.expr("unix_micros(ts) div 1000")
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").asc())
    gaps = ev.select(
        "user_id", (ms - F.lag(ms).over(w)).alias("gap_ms")
    ).filter(F.col("gap_ms").isNotNull())
    return gaps.groupBy("user_id").agg(
        (F.count(F.lit(1)) + 1).alias("n_events"),
        F.min("gap_ms").alias("min_gap_ms"),
        F.max("gap_ms").alias("max_gap_ms"),
        F.expr("sum(gap_ms) div count(*)").alias("mean_gap_ms"),
    )


_INTERARRIVAL_SQL = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) // 1000
           - lag(epoch_us(ts) // 1000) OVER (PARTITION BY user_id
                                             ORDER BY event_id) AS gap_ms
  FROM events
)
SELECT user_id, CAST(count(*) + 1 AS BIGINT) AS n_events,
       CAST(min(gap_ms) AS BIGINT) AS min_gap_ms,
       CAST(max(gap_ms) AS BIGINT) AS max_gap_ms,
       CAST(sum(gap_ms) // count(*) AS BIGINT) AS mean_gap_ms
FROM g WHERE gap_ms IS NOT NULL
GROUP BY user_id
"""


def events_changelog_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1-W4 batch MERGE: base table (compacted pre-cutoff state) merged
    with the post-cutoff changelog; last write wins per key."""
    ev = _t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    base = compact_latest(
        ev.filter(F.col("ts") < cutoff), ["user_id"], "ts", tiebreak_cols=["event_id"]
    )
    updates = ev.filter(F.col("ts") >= cutoff)
    merged = merge_upsert(base, updates, ["user_id"], "ts", tiebreak_cols=["event_id"])
    return merged.select(
        "user_id", "event_id", "event_type", F.col("value").alias("val")
    )


_CHANGELOG_APPLY_SQL = """
SELECT user_id, event_id, event_type, "value" AS val
FROM (
  SELECT user_id, event_id, event_type, "value",
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# Multimodal binary columns (LLM-pipeline surface; decode stubbed)
# --------------------------------------------------------------------------


def docs_blob_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata (size/hash/magic/modality) — JVM-side only.
    Text bytes stand in for media blobs; the schema/plumbing is the same."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "blob", F.encode(F.col("text"), "utf-8")
    )
    return blob_metadata(docs, "blob", ["doc_id"])


_BLOB_META_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_md5,
       upper(substr(hex(encode(text)), 1, 8)) AS magic,
       CASE WHEN upper(substr(hex(encode(text)), 1, 8)) LIKE '89504E47%' THEN 'image/png'
            WHEN upper(substr(hex(encode(text)), 1, 8)) LIKE 'FFD8FF%' THEN 'image/jpeg'
            WHEN upper(substr(hex(encode(text)), 1, 8)) LIKE '52494646%' THEN 'audio/wav'
            WHEN upper(substr(hex(encode(text)), 1, 8)) LIKE '1A45DFA3%' THEN 'video/mkv'
            ELSE 'application/octet-stream' END AS modality
FROM documents
"""


def docs_feature_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction (stub decode): Arrow-batched Python
    over binary blobs; features emitted as exact integer basis points."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "blob", F.encode(F.col("text"), "utf-8")
    ).withColumn("doc_id", F.col("doc_id").cast("long"))
    feats = extract_features(docs, "doc_id", "blob")
    return feats.select(
        "doc_id",
        "n_bytes",
        *[
            F.floor(F.element_at("feature", i + 1) * 10000).cast("long").alias(f"f{i}_bp")
            for i in range(4)
        ],
    )


_FEATURE_STUB_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       CAST(floor(CAST(('0x' || substr(md5(text), 1, 2)) AS INTEGER) / 255.0 * 10000) AS BIGINT) AS f0_bp,
       CAST(floor(CAST(('0x' || substr(md5(text), 3, 2)) AS INTEGER) / 255.0 * 10000) AS BIGINT) AS f1_bp,
       CAST(floor(CAST(('0x' || substr(md5(text), 5, 2)) AS INTEGER) / 255.0 * 10000) AS BIGINT) AS f2_bp,
       CAST(floor(CAST(('0x' || substr(md5(text), 7, 2)) AS INTEGER) / 255.0 * 10000) AS BIGINT) AS f3_bp
FROM documents
"""


def events_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (user_id, hour): bit
    interleaving as plain integer expressions (``functions/zorder.py``),
    the multi-dimensional data-skipping layout of Delta/Iceberg ZORDER BY.
    The oracle replays the interleave bit-for-bit; the layout benefit
    (per-file min/max envelopes tight in BOTH dimensions) is pinned by
    tests/test_zorder.py. Pure projection — zero shuffle."""
    from affinity_spark.functions.zorder import morton_interleave

    ev = _t(spark, sf_dir, "events")
    hour = F.expr("unix_micros(ts) div 3600000000")
    return ev.select(
        "event_id",
        (F.col("user_id") % 65536).alias("u16"),
        (hour % 65536).alias("h16"),
        morton_interleave(F.col("user_id") % 65536, hour % 65536).alias("zkey"),
    )


def _zorder_oracle_sql() -> str:
    from affinity_spark.functions.zorder import morton_sql

    z = morton_sql("user_id % 65536", "(epoch_us(ts) // 3600000000) % 65536")
    return f"""
SELECT event_id,
       CAST(user_id % 65536 AS BIGINT) AS u16,
       CAST((epoch_us(ts) // 3600000000) % 65536 AS BIGINT) AS h16,
       CAST({z} AS BIGINT) AS zkey
FROM events
"""


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase per user: each stage must
    happen strictly AFTER the user's first event of the previous stage
    (event_id order, ts-monotone). Three chained min-over-window passes
    on the SAME partitioning — one shuffle total, no self-joins (the
    naive funnel is two self-joins on the fact table). Nullable stage
    ids make drop-off visible per user."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    fv = F.min(F.when(F.col("event_type") == "view", F.col("event_id"))).over(w)
    step1 = ev.withColumn("fv", fv)
    fc = F.min(
        F.when((F.col("event_type") == "click") & (F.col("event_id") > F.col("fv")),
               F.col("event_id"))
    ).over(w)
    step2 = step1.withColumn("fc", fc)
    fp = F.min(
        F.when((F.col("event_type") == "purchase") & (F.col("event_id") > F.col("fc")),
               F.col("event_id"))
    ).over(w)
    # collapse per-user via groupBy on the window's own partitioning key —
    # reuses the single exchange (a distinct over all four columns would
    # re-shuffle on the compound key)
    return (
        step2.withColumn("fp", fp)
        .groupBy("user_id")
        .agg(
            F.min("fv").alias("first_view_id"),
            F.min("fc").alias("first_click_id"),
            F.min("fp").alias("first_purchase_id"),
        )
        .withColumn("converted", F.col("first_purchase_id").isNotNull())
    )


_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, event_id, event_type,
         min(CASE WHEN event_type = 'view' THEN event_id END)
           OVER (PARTITION BY user_id) AS fv
  FROM events
),
s2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND event_id > fv
                     THEN event_id END)
              OVER (PARTITION BY user_id) AS fc
  FROM s1
),
s3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND event_id > fc
                     THEN event_id END)
              OVER (PARTITION BY user_id) AS fp
  FROM s2
)
SELECT DISTINCT user_id,
       CAST(fv AS BIGINT) AS first_view_id,
       CAST(fc AS BIGINT) AS first_click_id,
       CAST(fp AS BIGINT) AS first_purchase_id,
       fp IS NOT NULL AS converted
FROM s3
"""


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen hour; how many were
    active again in the NEXT hour. One pass over events: per-user
    (first hour, distinct-hour set) in a single aggregation, then the
    k=+1 membership test is an array_contains — no self-join of the fact
    table (the textbook formulation joins activity back to cohorts).
    Two shuffles; the per-user hour set is bounded by hours-in-retention
    window (~10^4 at a year of hourly granularity), not event count."""
    ev = _t(spark, sf_dir, "events")
    hour = F.expr("unix_micros(ts) div 3600000000")
    per_user = (
        ev.select("user_id", hour.alias("h"))
        .groupBy("user_id")
        .agg(F.min("h").alias("cohort_h"), F.collect_set("h").alias("hs"))
    )
    retained = F.array_contains(F.col("hs"), F.col("cohort_h") + 1)
    return per_user.groupBy("cohort_h").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(retained.cast("long")).alias("n_retained_next"),
    )


_COHORT_SQL = """
WITH seen AS (
  SELECT user_id, epoch_us(ts) // 3600000000 AS h FROM events
),
per_user AS (
  SELECT user_id, min(h) AS cohort_h, list(DISTINCT h) AS hs
  FROM seen GROUP BY user_id
)
SELECT cohort_h,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN list_contains(hs, cohort_h + 1) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_retained_next
FROM per_user GROUP BY cohort_h
"""


def docs_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG decode end to end: each doc row becomes a
    genuine JPEG (SOI/DQT/SOF0/DHT/SOS, Annex-K huffman, forward DCT)
    of a flat gray tile whose geometry and level derive from doc_id,
    then is decoded back by the pure-python baseline decoder
    (``functions/codecs.py``: marker walk, canonical huffman, dequant,
    IDCT). With the all-8s quant table a flat tile round-trips EXACTLY
    (DC = 8*(v-128) quantizes losslessly), so the oracle recomputes
    width/height/mean/checksum in closed form — any huffman, zigzag,
    dequant or IDCT defect breaks the value hash."""
    from collections.abc import Iterator

    import pandas as pd

    from affinity_spark.functions.codecs import decode_jpeg, encode_jpeg_baseline

    docs = _t(spark, sf_dir, "documents").select(F.col("doc_id").cast("long"))
    schema = "doc_id long, width int, height int, mean_gray long, checksum long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "mean_gray": [],
                   "checksum": []}
            for did in pdf["doc_id"]:
                did = int(did)
                w, h, g = 8 + (did % 3) * 4, 8 + (did % 5) * 2, (did * 13) % 256
                img = decode_jpeg(encode_jpeg_baseline(w, h, bytes([g] * (w * h))))
                assert (img.width, img.height) == (w, h)
                out["doc_id"].append(did)
                out["width"].append(img.width)
                out["height"].append(img.height)
                out["mean_gray"].append(sum(img.pixels) // len(img.pixels))
                out["checksum"].append(sum(img.pixels))
            yield pd.DataFrame(out)

    return docs.mapInPandas(run, schema)


_JPEG_DECODE_SQL = """
SELECT doc_id,
       CAST(8 + (doc_id % 3) * 4 AS INT) AS width,
       CAST(8 + (doc_id % 5) * 2 AS INT) AS height,
       CAST((doc_id * 13) % 256 AS BIGINT) AS mean_gray,
       CAST((doc_id * 13) % 256
            * (8 + (doc_id % 3) * 4) * (8 + (doc_id % 5) * 2) AS BIGINT)
         AS checksum
FROM documents
"""


def docs_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode through the multimodal path: each document row is
    turned into a genuine PNG (even doc_id) or 16-bit PCM WAV (odd) whose
    geometry/content derive deterministically from doc_id, then decoded by
    the pure-python codecs (``functions/codecs.py``: chunk walk, zlib
    inflate, scanline unfilter / RIFF PCM parse) inside Arrow-batched
    mapInPandas. The oracle recomputes width/height/sample counts and the
    pixel/amplitude checksum in closed form — a wrong decoder (skipped
    chunk, bad unfilter, wrong endianness) breaks the hash.

    Reference parity: the multimodal story the reference lacks entirely;
    decode runs where the data lives, no driver collect, schema fixed.
    """
    from collections.abc import Iterator

    import pandas as pd

    from affinity_spark.functions.codecs import (
        decode_png,
        decode_wav,
        encode_png_gray,
        encode_wav_pcm16,
    )

    docs = _t(spark, sf_dir, "documents").select(F.col("doc_id").cast("long"))
    schema = "doc_id long, modality string, d1 int, d2 int, checksum long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "modality": [], "d1": [], "d2": [], "checksum": []}
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 2 == 0:
                    w, h = 1 + did % 16, 1 + did % 8
                    pixels = bytes((did * 7 + i * 3) % 256 for i in range(w * h))
                    img = decode_png(encode_png_gray(w, h, pixels))
                    out["doc_id"].append(did)
                    out["modality"].append("image/png")
                    out["d1"].append(img.width)
                    out["d2"].append(img.height)
                    out["checksum"].append(sum(img.pixels))
                else:
                    rate, n = 8000 + did % 100, 16 + did % 17
                    samples = [((did * 11 + i * 5) % 2048) - 1024 for i in range(n)]
                    wav = decode_wav(encode_wav_pcm16(rate, 1, samples))
                    out["doc_id"].append(did)
                    out["modality"].append("audio/wav")
                    out["d1"].append(wav.sample_rate)
                    out["d2"].append(len(wav.samples))
                    out["checksum"].append(sum(abs(s) for s in wav.samples))
            yield pd.DataFrame(out)

    return docs.mapInPandas(run, schema)


_MEDIA_DECODE_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS modality,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 16
                 ELSE 8000 + doc_id % 100 END AS INTEGER) AS d1,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 8
                 ELSE 16 + doc_id % 17 END AS INTEGER) AS d2,
       CAST(CASE WHEN doc_id % 2 = 0 THEN
              list_sum(list_transform(
                range(0, (1 + doc_id % 16) * (1 + doc_id % 8)),
                i -> (doc_id * 7 + i * 3) % 256))
            ELSE
              list_sum(list_transform(
                range(0, 16 + doc_id % 17),
                i -> abs(((doc_id * 11 + i * 5) % 2048) - 1024)))
            END AS BIGINT) AS checksum
FROM documents
"""


def docs_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container frame sampling: each doc becomes a genuine
    Matroska file (EBML header/track/cluster, ``codecs.encode_mkv``) with
    2 + doc_id % 7 frames at 40 ms spacing, keyframes every 4th, payload
    md5(doc_id-i); ``sample_frames(decode_stub=False)`` then walks the
    container for real (VINT parse, SimpleBlock timestamps + flags) and
    picks 3 uniformly-spaced frames by integer math. The oracle recomputes
    indices/timestamps/flags/payload-md5 in closed form — a wrong EBML
    walk or timestamp reconstruction breaks the hash."""
    import hashlib
    from collections.abc import Iterator

    import pandas as pd

    from affinity_spark.functions.codecs import encode_mkv
    from affinity_spark.operators.multimodal import sample_frames

    docs = _t(spark, sf_dir, "documents").select(F.col("doc_id").cast("long"))

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                did = int(did)
                frames = [
                    (
                        i * 40,
                        i % 4 == 0,
                        hashlib.md5(f"{did}-{i}".encode()).digest(),
                    )
                    for i in range(2 + did % 7)
                ]
                blobs.append(encode_mkv(64, 48, frames))
            out = pdf.copy()
            out["blob"] = pd.Series(blobs, index=out.index, dtype="object")
            yield out

    videos = docs.mapInPandas(build, "doc_id long, blob binary")
    sampled = sample_frames(videos, "doc_id", "blob", n_frames=3, decode_stub=False)
    return sampled.select(
        "doc_id",
        "frame_idx",
        "ts_ms",
        "keyframe",
        F.lower(F.hex(F.col("frame"))).alias("payload_md5"),
    )


_FRAME_SAMPLE_SQL = """
WITH base AS (SELECT doc_id, 2 + doc_id % 7 AS total FROM documents),
idx AS (
  SELECT doc_id,
         unnest(CASE WHEN total <= 3 THEN range(0, total)
                     ELSE list_distinct([0, (total - 1) // 2, total - 1])
                END) AS fi
  FROM base
)
SELECT doc_id,
       CAST(fi AS INTEGER) AS frame_idx,
       CAST(fi * 40 AS BIGINT) AS ts_ms,
       fi % 4 = 0 AS keyframe,
       md5(CAST(doc_id AS VARCHAR) || '-' || CAST(fi AS VARCHAR)) AS payload_md5
FROM idx
"""


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 JSON source decode: parse the props JSON column, project a typed
    field, aggregate on it (from_json → Catalyst JsonToStructs, pruned)."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id",
        F.from_json(F.col("props"), "k int").alias("p"),
    )
    return (
        parsed.select(F.col("p.k").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_JSON_SQL = """
SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS k, count(*) AS n
FROM events
GROUP BY 1
"""


def events_xml_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 XML source decode: build an XML payload then parse it back with
    from_xml (attribute + nested element), proving the decode path without
    an XML table in the fixtures."""
    ev = _t(spark, sf_dir, "events")
    xml = F.concat(
        F.lit('<e id="'),
        F.col("event_id").cast("string"),
        F.lit('"><t>'),
        F.col("event_type"),
        F.lit("</t></e>"),
    )
    parsed = ev.select(
        "event_id",
        F.from_xml(xml, "_id BIGINT, t STRING").alias("x"),
    )
    return parsed.select(
        "event_id",
        F.col("x._id").alias("xml_id"),
        F.col("x.t").alias("xml_type"),
    )


_XML_SQL = """
SELECT event_id, event_id AS xml_id, event_type AS xml_type FROM events
"""


_AVRO_V1 = """{"type":"record","name":"Ev","fields":[
  {"name":"id","type":"long"},
  {"name":"etype","type":"string"},
  {"name":"cents","type":"int"}]}"""
_AVRO_V2 = """{"type":"record","name":"Ev","fields":[
  {"name":"id","type":"long"},
  {"name":"kind","type":"string"},
  {"name":"cents","type":"long"},
  {"name":"source","type":"string"}]}"""
_AVRO_READER = """{"type":"record","name":"Ev","fields":[
  {"name":"id","type":"long"},
  {"name":"etype","type":"string","aliases":["kind"]},
  {"name":"cents","type":"long"},
  {"name":"source","type":"string","default":"unknown"}]}"""


def events_avro_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full AvroSerde read path with NO spark-avro jar (reference
    AvroSerde.scala:123-173 + AvroProjectionSpec.scala): events are encoded
    to REAL Avro binary in executors under two writer schemas (v1 for even
    ids — int cents, 'etype'; v2 for odd ids — long cents, renamed 'kind',
    extra 'source'), enveloped [magic 0][BE schema id], then decoded back
    through decode_enveloped's pure-python engine, which resolves both
    writers onto one reader shape (alias match, int->long promotion,
    reader default). The oracle recomputes the expected field values in
    SQL, so the value hash certifies the entire binary round trip."""
    from affinity_spark.functions.avro_envelope import (
        SchemaRegistry,
        decode_enveloped,
        encode_enveloped_python,
    )

    reg = SchemaRegistry()
    sid1, sid2 = reg.register(_AVRO_V1), reg.register(_AVRO_V2)
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    even = ev.filter(F.col("event_id") % 2 == 0).select(
        F.struct(
            F.col("event_id").alias("id"),
            F.col("event_type").alias("etype"),
            F.col("cents").cast("int").alias("cents"),
        ).alias("rec")
    )
    odd = ev.filter(F.col("event_id") % 2 == 1).select(
        F.struct(
            F.col("event_id").alias("id"),
            F.col("event_type").alias("kind"),
            F.col("cents"),
            F.lit("stream-v2").alias("source"),
        ).alias("rec")
    )
    log = (
        encode_enveloped_python(even, "rec", reg, sid1)
        .select("value")
        .unionByName(encode_enveloped_python(odd, "rec", reg, sid2).select("value"))
    )
    out = decode_enveloped(log, "value", reg, _AVRO_READER, engine="auto")
    return out.select(
        F.col("record.id").alias("event_id"),
        F.col("record.etype").alias("etype"),
        F.col("record.cents").alias("cents"),
        F.col("record.source").alias("source"),
    )


_AVRO_SQL = """
SELECT event_id,
       event_type AS etype,
       CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
       CASE WHEN event_id % 2 = 1 THEN 'stream-v2' ELSE 'unknown' END AS source
FROM events
"""


def events_uuid_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 UUID <-> 16-byte fixed codec: deterministic uuid from md5 of the
    key, hyphen-formatted, and its 16-byte binary length — the reference's
    @Fixed(16) UUID mapping (AvroRecord.scala:494-509)."""
    ev = _t(spark, sf_dir, "events").select("event_id").distinct()
    h = F.md5(F.col("event_id").cast("string"))
    uuid_str = F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
    return ev.select(
        "event_id",
        uuid_str.alias("uuid"),
        F.length(F.unhex(h)).alias("n_bytes"),
    )


_UUID_SQL = """
SELECT event_id,
       substr(md5(CAST(event_id AS VARCHAR)), 1, 8) || '-' ||
       substr(md5(CAST(event_id AS VARCHAR)), 9, 4) || '-' ||
       substr(md5(CAST(event_id AS VARCHAR)), 13, 4) || '-' ||
       substr(md5(CAST(event_id AS VARCHAR)), 17, 4) || '-' ||
       substr(md5(CAST(event_id AS VARCHAR)), 21, 12) AS uuid,
       octet_length(unhex(md5(CAST(event_id AS VARCHAR)))) AS n_bytes
FROM (SELECT DISTINCT event_id FROM events)
"""


def events_timelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S14 event/processing-time projection: (event millis, arrival seq)
    for compaction analysis — deterministic arrival order by (ts, id).

    A global sequence number WITHOUT a global single-partition sort: rank
    within hour buckets (parallel windows over the big data), prefix-sum
    only the per-bucket counts (a window over #hours rows, broadcast back).
    The hour bucket is a prefix of the global sort key, so bucket-local rank
    + bucket offset equals the global row_number — same output, but the
    only unpartitioned window runs over thousands of rows, not the corpus.
    """
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        (F.col("ts").cast("double") * 1000).cast("long").alias("event_ms"),
        F.col("event_id"),
        F.date_trunc("hour", "ts").alias("bkt"),
    )
    w_in = Window.partitionBy("bkt").orderBy(
        F.col("event_ms").asc(), F.col("event_id").asc()
    )
    ranked = ev.withColumn("rk", F.row_number().over(w_in))
    w_off = (
        Window.orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        ev.groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("off", F.coalesce(F.sum("n").over(w_off), F.lit(0)))
        .select("bkt", "off")
    )
    return (
        ranked.join(F.broadcast(offsets), "bkt")
        .select(
            "event_ms",
            "event_id",
            (F.col("off") + F.col("rk")).cast("long").alias("arrival_seq"),
        )
    )


_TIMELOG_SQL = """
SELECT CAST(epoch_ms(ts) AS BIGINT) AS event_ms, event_id,
       row_number() OVER (ORDER BY ts ASC, event_id ASC) AS arrival_seq
FROM events
"""


def events_partition_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1/T8 kafka-compatible murmur2 routing of serialized keys.

    Oracle-checked for real since round 2: the DuckDB side replays Kafka's
    murmur2 bit-exactly via ``duckdb_murmur2_partition_sql`` (the 4-byte
    block loop unrolled into CTE stages with mod-2^32 BIGINT arithmetic),
    upgrading this from the one rows-only WEAK check to a full value-hash
    comparison. Java-vector parity is additionally pinned in
    tests/test_murmur2.py."""
    from affinity_spark.functions.murmur2 import kafka_partition_udf

    ev = _t(spark, sf_dir, "events").select("user_id").distinct()
    key_bytes = F.encode(F.col("user_id").cast("string"), "utf-8")
    return ev.select(
        "user_id", kafka_partition_udf(32)(key_bytes).alias("partition")
    )


def _routing_oracle_sql() -> str:
    from affinity_spark.functions.murmur2 import duckdb_murmur2_partition_sql

    return duckdb_murmur2_partition_sql(
        32, "SELECT DISTINCT user_id FROM events"
    )


# --------------------------------------------------------------------------
# Secondary index & text search (SURVEY §2.4)
# --------------------------------------------------------------------------


def index_word_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X2/J3 inverted index lookup: word -> documents (semi-join)."""
    docs = _t(spark, sf_dir, "documents")
    idx = build_inverted_index(docs, ["doc_id"], lambda d: tokenize(d["text"]), index_col="word")
    return index_lookup(idx, docs, "spark", ["doc_id"], index_col="word").select(
        "doc_id", "lang", "source", "n_chars"
    )


_INDEX_SQL = """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                      t -> t = 'spark')) > 0
"""


def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 word count (batch view of the continuous counter)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_WORDCOUNT_SQL = """
SELECT word, count(*) AS n
FROM (
  SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                            t -> t <> '')) AS word
  FROM documents
)
GROUP BY word
"""


# --------------------------------------------------------------------------
# Text analysis (LLM-pipeline surface)
# --------------------------------------------------------------------------


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", token_count(F.col("text")).alias("n_tokens"))


_TOKCOUNT_SQL = """
SELECT doc_id,
       len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> t <> ''))
         AS n_tokens
FROM documents
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals: token stats, type/token ratio, stopword density."""
    docs = _t(spark, sf_dir, "documents")
    q = quality_columns(F.col("text"))
    return docs.select(
        "doc_id",
        q["n_tokens"].alias("n_tokens"),
        q["n_distinct_tokens"].alias("n_distinct_tokens"),
        F.floor(q["type_token_ratio"] * 10000).cast("long").alias("ttr_bp"),
        F.floor(q["stopword_ratio"] * 10000).cast("long").alias("stopword_bp"),
    )


_STOPWORDS_SQL_LIST = ", ".join(f"'{w}'" for w in EN_STOPWORDS)

_QUALITY_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> t <> '') AS t
  FROM documents
)
SELECT doc_id,
       len(t) AS n_tokens,
       len(list_distinct(t)) AS n_distinct_tokens,
       CAST(floor(round(len(list_distinct(t)) * 1.0 / len(t), 4) * 10000) AS BIGINT) AS ttr_bp,
       CAST(floor(round(len(list_filter(t, x -> x IN ({_STOPWORDS_SQL_LIST}))) * 1.0 / len(t), 4) * 10000) AS BIGINT)
         AS stopword_bp
FROM toks
"""


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID from English-stopword density."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id(F.col("text")).alias("lang_pred"))


_LANGID_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> t <> '') AS t
  FROM documents
)
SELECT doc_id,
       CASE WHEN len(t) > 0
              AND len(list_filter(t, x -> x IN ({_STOPWORDS_SQL_LIST}))) * 1.0 / len(t) >= 0.05
            THEN 'en' ELSE 'und' END AS lang_pred
FROM toks
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 of whitespace-normalized text)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", doc_fingerprint(F.col("text")).alias("fp"))


_FINGERPRINT_SQL = """
SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
FROM documents
"""


def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token estimate per doc: one codegen'd regexp_count of the
    GPT-2-style pattern (functions/text.py::BPE_TOKEN_PATTERN) — the token
    accounting a training pipeline budgets with, no vocab or UDF needed."""
    from affinity_spark.functions.text import bpe_token_estimate

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", bpe_token_estimate(F.col("text")).alias("n_bpe"))


_BPE_SQL = """
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text),
            $re$'[a-z]+| ?[a-z]+| ?[0-9]{1,3}| ?[^a-z0-9\\s']+|\\s+$re$)) AS BIGINT)
         AS n_bpe
FROM documents
"""


def docs_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per (source, lang): subword-per-word
    ratio (BPE-ish token estimate over whitespace words) and bytes per
    subword, in integer ppm — the per-language tokenizer-efficiency
    numbers a training pipeline watches when choosing vocab size and
    per-language sampling (a language with 2x fertility pays 2x context
    per word; compression-ratio drift per source flags boilerplate or
    encoding damage). One map-side projection (two codegen'd regexes +
    octet_length, no UDF) and one partial-aggregated groupBy on a tiny
    key space — corpus-linear, shuffle carries |sources x langs| rows."""
    from affinity_spark.functions.text import bpe_token_estimate, token_count

    docs = _t(spark, sf_dir, "documents")
    per = docs.select(
        "source",
        "lang",
        token_count(F.col("text")).cast("long").alias("_w"),
        bpe_token_estimate(F.col("text")).alias("_t"),
        F.octet_length("text").cast("long").alias("_b"),
    )
    g = per.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_w").alias("words"),
        F.sum("_t").alias("bpe_tokens"),
        F.sum("_b").alias("bytes"),
    )
    return g.select(
        "source",
        "lang",
        "n_docs",
        "words",
        "bpe_tokens",
        "bytes",
        F.expr("(bpe_tokens * 1000000) div greatest(words, 1)").alias(
            "fertility_ppm"
        ),
        F.expr("(bytes * 1000000) div greatest(bpe_tokens, 1)").alias(
            "bytes_per_token_ppm"
        ),
    )


_TOKENIZER_FERTILITY_SQL = """
WITH per AS (
  SELECT source, lang,
         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                              t -> t <> '')) AS BIGINT) AS w,
         CAST(len(regexp_extract_all(lower(text),
              $re$'[a-z]+| ?[a-z]+| ?[0-9]{1,3}| ?[^a-z0-9\\s']+|\\s+$re$)) AS BIGINT) AS t,
         CAST(strlen(text) AS BIGINT) AS b
  FROM documents
),
g AS (
  SELECT source, lang,
         count(*) AS n_docs,
         CAST(sum(w) AS BIGINT) AS words,
         CAST(sum(t) AS BIGINT) AS bpe_tokens,
         CAST(sum(b) AS BIGINT) AS bytes
  FROM per GROUP BY source, lang
)
SELECT source, lang, n_docs, words, bpe_tokens, bytes,
       (bpe_tokens * 1000000) // greatest(words, 1) AS fertility_ppm,
       (bytes * 1000000) // greatest(bpe_tokens, 1) AS bytes_per_token_ppm
FROM g
"""


def text_winnow_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (MOSS, Schleimer et al. 2003) per doc:
    k=7 char grams, window w=4, md5-derived hashes — the guaranteed-recall
    substring-match fingerprint family. Emits the count and an md5 digest of
    the sorted fingerprint set so the value hash verifies every selected
    fingerprint."""
    from affinity_spark.functions.text import winnow_fingerprints

    docs = _t(spark, sf_dir, "documents")
    fps = winnow_fingerprints(F.col("text"), k=7, w=4)
    # materialize the O(n*k) fingerprint array ONCE behind an alias:
    # CollapseProject won't inline a non-cheap expression referenced twice,
    # so size + digest both read the computed array (shared-subexpr trap).
    return docs.select("doc_id", fps.alias("fps")).select(
        "doc_id",
        F.size("fps").cast("long").alias("n_fps"),
        F.md5(
            F.array_join(F.transform("fps", lambda x: x.cast("string")), ",")
        ).alias("fp_digest"),
    )


_WINNOW_SQL = """
WITH n AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
  FROM documents
), h AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 7
              THEN list_transform(range(1, len(t) - 5),
                   i -> CAST(('0x' || substr(md5(substr(t, i, 7)), 1, 8)) AS BIGINT))
              ELSE CAST([] AS BIGINT[]) END AS hs
  FROM n
), w AS (
  SELECT doc_id,
         CASE WHEN len(hs) >= 4
              THEN list_sort(list_distinct(list_transform(range(1, len(hs) - 2),
                   j -> list_min(hs[j:j+3]))))
              ELSE CAST([] AS BIGINT[]) END AS fps
  FROM h
)
SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fps,
       md5(array_to_string(fps, ',')) AS fp_digest
FROM w
"""


# --------------------------------------------------------------------------
# Deduplication (LLM-pipeline surface)
# --------------------------------------------------------------------------


def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dd.dedup_exact(docs, "doc_id", "text")


_DEDUP_EXACT_SQL = """
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
       min(doc_id) AS keep_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
"""


def _duck_shingles_cte(n: int = 3) -> str:
    """DuckDB CTEs reproducing shingle_table(): (doc_id, shingle, h0)."""
    return f"""
d AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(t) - {n - 1}, 0) + 1),
           i -> array_to_string(t[i:i+{n - 1}], ' ')))) AS shingle
  FROM d WHERE len(t) >= {n}
),
h AS (SELECT doc_id, shingle,
             CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h0
      FROM sh)
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-Jaccard-verified (J >= 1/2).

    Bands come from the ZERO-shuffle single-expression path
    (``lsh_bands_mapside``): one md5 per shingle, minima folded and band
    structs built inside one aggregate — no shingle explode/groupBy shuffle
    and no per-permutation re-hashing. The only shuffles left are the LSH
    band bucket join and the candidate verify — both candidate-count sized,
    never corpus-sized.

    Output uses exact integer columns (n_common, n_union) so the hash
    comparison is float-free.
    """
    docs = _t(spark, sf_dir, "documents")
    arrs = _track_cache(dd.doc_shingle_arrays(docs, "doc_id", "text", 3).persist())
    cand = dd.lsh_candidate_pairs(dd.lsh_bands_mapside(arrs, "doc_id"), "doc_id")
    return dd.jaccard_verify_arrays(cand, arrs, "doc_id", 1, 2)


def _duck_lsh_bands_cte() -> str:
    """DuckDB CTEs reproducing the LSH banding over a prior
    ``h(doc_id, shingle, h0)`` CTE: sig → bands(doc_id, band_id, band_hash).

    Same md5-derived h0, LCG permutation constants and band hashing as the
    Spark side, so band buckets are bit-identical across engines.
    """
    sig_cols = ",\n       ".join(
        f"min(({a} * h0 + {b}) % {dd.MINHASH_P}) AS sig_{i}"
        for i, (a, b) in enumerate(dd.MINHASH_COEF)
    )
    band_selects = "\nUNION ALL\n".join(
        "SELECT doc_id, {band} AS band_id, md5({concat}) AS band_hash FROM sig".format(
            band=band,
            concat=" || '-' || ".join(
                f"CAST(sig_{band * dd.BAND_ROWS + r} AS VARCHAR)"
                for r in range(dd.BAND_ROWS)
            ),
        )
        for band in range(dd.NUM_BANDS)
    )
    return f"""
sig AS (SELECT doc_id, {sig_cols} FROM h GROUP BY doc_id),
bands AS ({band_selects})"""


def _duck_lsh_cand_cte() -> str:
    """:func:`_duck_lsh_bands_cte` + the distinct candidate-pair join:
    cand(id_a, id_b)."""
    return f"""{_duck_lsh_bands_cte()},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
)"""


def _minhash_oracle_sql() -> str:
    return f"""
WITH {_duck_shingles_cte(3)},
{_duck_lsh_cand_cte()},
sizes AS (SELECT doc_id, count(*) AS n FROM h GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, count(*) AS n_common
  FROM cand c
  JOIN h x ON x.doc_id = c.id_a
  JOIN h y ON y.doc_id = c.id_b AND y.shingle = x.shingle
  GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b, n_common,
       (sa.n + sb.n - n_common) AS n_union
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE 2 * n_common >= (sa.n + sb.n - n_common)
"""


def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS, not just pairs: LSH candidates → exact-Jaccard
    verify (J >= 1/2) → connected components → one canonical doc per
    cluster (min doc_id, the reference's component-id convention,
    ``AnalyticsSystemSpec.scala:50-52``). This is the dedup endgame a real
    corpus pipeline runs: transitive duplicate groups with a single
    survivor, where pairwise drop-the-higher-id would over- or under-drop
    on chains (a~b, b~c but a!~c).

    Scale shape: zero-shuffle map-side signatures, candidate-sized verify
    join, hash-to-min CC with per-round lineage cuts. The oracle replays
    the banding bit-exactly and closes the components with a recursive
    CTE."""
    from affinity_spark.operators.graph import connected_components

    docs = _t(spark, sf_dir, "documents")
    arrs = _track_cache(dd.doc_shingle_arrays(docs, "doc_id", "text", 3).persist())
    cand = dd.lsh_candidate_pairs(dd.lsh_bands_mapside(arrs, "doc_id"), "doc_id")
    pairs = dd.jaccard_verify_arrays(cand, arrs, "doc_id", 1, 2).select(
        "id_a", "id_b"
    )
    cc = connected_components(pairs, "id_a", "id_b")
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return cc.join(sizes, "component").select(
        F.col("vertex").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("vertex") == F.col("component")).alias("is_canonical"),
        "cluster_size",
    )


def _cluster_canonical_oracle_sql() -> str:
    return f"""
WITH RECURSIVE {_duck_shingles_cte(3)},
{_duck_lsh_cand_cte()},
sizes AS (SELECT doc_id, count(*) AS n FROM h GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, count(*) AS n_common
  FROM cand c
  JOIN h x ON x.doc_id = c.id_a
  JOIN h y ON y.doc_id = c.id_b AND y.shingle = x.shingle
  GROUP BY c.id_a, c.id_b
),
pairs AS (
  SELECT id_a, id_b
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE 2 * n_common >= (sa.n + sb.n - n_common)
),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
verts AS (SELECT DISTINCT a AS v FROM edges),
walk AS (
  SELECT v, v AS r FROM verts
  UNION
  SELECT w.v, e.b AS r FROM walk w JOIN edges e ON e.a = w.r
),
comp AS (SELECT v AS doc_id, min(r) AS cluster_id FROM walk GROUP BY v),
csize AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
          FROM comp GROUP BY cluster_id)
SELECT doc_id, cluster_id, doc_id = cluster_id AS is_canonical, cluster_size
FROM comp JOIN csize USING (cluster_id)
"""


def dedup_quality_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY-AWARE cluster survivor selection: within each near-dup
    cluster (LSH → exact-Jaccard verify → connected components) keep the
    LONGEST member (max n_chars, doc_id tie-break) instead of the min-id
    convention — the policy a crawl pipeline actually wants, because
    near-dup clusters routinely hold truncated or boilerplate-stripped
    copies of one page and min-id keeps an arbitrary one. Emits only
    real clusters (>= 2 members): cluster_id, the kept doc, its length,
    and the member count. Same scale shape as dedup_cluster_canonical
    plus one per-cluster WindowGroupLimit top-1 (bounded, no cluster's
    members buffered)."""
    from pyspark.sql import Window

    from affinity_spark.operators.graph import connected_components

    docs = _t(spark, sf_dir, "documents")
    arrs = _track_cache(dd.doc_shingle_arrays(docs, "doc_id", "text", 3).persist())
    cand = dd.lsh_candidate_pairs(dd.lsh_bands_mapside(arrs, "doc_id"), "doc_id")
    pairs = dd.jaccard_verify_arrays(cand, arrs, "doc_id", 1, 2).select(
        "id_a", "id_b"
    )
    cc = connected_components(pairs, "id_a", "id_b")
    # cluster membership is verified-pairs-sized << corpus: broadcast it
    # so the docs side is a pushed-down semi-join read, never shuffled
    members = F.broadcast(cc).join(
        docs.select("doc_id", "n_chars"),
        cc["vertex"] == F.col("doc_id"),
    ).select(F.col("component").alias("cluster_id"), "doc_id", "n_chars")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    sizes = members.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return (
        members.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .join(F.broadcast(sizes), "cluster_id")
        .select(
            "cluster_id",
            F.col("doc_id").alias("keep_id"),
            F.col("n_chars").alias("keep_chars"),
            "n_members",
        )
    )


def _quality_canonical_oracle_sql() -> str:
    return f"""
WITH RECURSIVE {_duck_shingles_cte(3)},
{_duck_lsh_cand_cte()},
sizes AS (SELECT doc_id, count(*) AS n FROM h GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, count(*) AS n_common
  FROM cand c
  JOIN h x ON x.doc_id = c.id_a
  JOIN h y ON y.doc_id = c.id_b AND y.shingle = x.shingle
  GROUP BY c.id_a, c.id_b
),
pairs AS (
  SELECT id_a, id_b
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE 2 * n_common >= (sa.n + sb.n - n_common)
),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
verts AS (SELECT DISTINCT a AS v FROM edges),
walk AS (
  SELECT v, v AS r FROM verts
  UNION
  SELECT w.v, e.b AS r FROM walk w JOIN edges e ON e.a = w.r
),
comp AS (SELECT v AS doc_id, min(r) AS cluster_id FROM walk GROUP BY v),
mem AS (
  SELECT comp.cluster_id, comp.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY comp.cluster_id
                            ORDER BY d.n_chars DESC, comp.doc_id ASC) AS rn
  FROM comp JOIN documents d ON d.doc_id = comp.doc_id
),
csize AS (SELECT cluster_id, count(*) AS n_members FROM mem GROUP BY cluster_id)
SELECT m.cluster_id, m.doc_id AS keep_id, m.n_chars AS keep_chars,
       CAST(c.n_members AS BIGINT) AS n_members
FROM mem m JOIN csize c USING (cluster_id)
WHERE m.rn = 1
"""


def docs_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-AWARE train/val/test split — the leakage-free form of
    ``docs_train_split``: hash-splitting raw doc ids puts near-duplicate
    pairs on both sides of the train/eval boundary (the classic
    contamination bug benchmark papers keep re-finding), so the split key
    here is the near-dup CLUSTER id (LSH candidates → exact-Jaccard
    verify → connected components; singletons are their own cluster).
    Every member of a cluster lands in the same split BY CONSTRUCTION
    (split is a pure function of cluster_id), and the assignment stays
    stable as the corpus grows — same md5 bucket bounds as train_split.

    Scale shape: identical to dedup_cluster_canonical (zero-shuffle
    signatures, candidate-sized verify, lineage-cut CC) plus one
    broadcast-sized left join of the cluster map back onto doc ids."""
    from affinity_spark.operators.graph import connected_components
    from affinity_spark.operators.sampling import hash_bucket

    docs = _t(spark, sf_dir, "documents")
    arrs = _track_cache(dd.doc_shingle_arrays(docs, "doc_id", "text", 3).persist())
    cand = dd.lsh_candidate_pairs(dd.lsh_bands_mapside(arrs, "doc_id"), "doc_id")
    pairs = dd.jaccard_verify_arrays(cand, arrs, "doc_id", 1, 2).select(
        "id_a", "id_b"
    )
    cc = connected_components(pairs, "id_a", "id_b").withColumnRenamed(
        "vertex", "doc_id"
    )
    lab = (
        docs.select("doc_id")
        .join(cc, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("component", "doc_id").alias("cluster_id")
        )
    )
    b = hash_bucket(F.col("cluster_id"))
    return lab.select(
        "doc_id",
        "cluster_id",
        F.when(b < 900, F.lit("train"))
        .when(b < 950, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def _leakage_free_split_sql() -> str:
    return f"""
WITH RECURSIVE {_duck_shingles_cte(3)},
{_duck_lsh_cand_cte()},
sizes AS (SELECT doc_id, count(*) AS n FROM h GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, count(*) AS n_common
  FROM cand c
  JOIN h x ON x.doc_id = c.id_a
  JOIN h y ON y.doc_id = c.id_b AND y.shingle = x.shingle
  GROUP BY c.id_a, c.id_b
),
pairs AS (
  SELECT id_a, id_b
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE 2 * n_common >= (sa.n + sb.n - n_common)
),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
verts AS (SELECT DISTINCT a AS v FROM edges),
walk AS (
  SELECT v, v AS r FROM verts
  UNION
  SELECT w.v, e.b AS r FROM walk w JOIN edges e ON e.a = w.r
),
comp AS (SELECT v AS doc_id, min(r) AS cluster_id FROM walk GROUP BY v),
lab AS (
  SELECT d.doc_id, coalesce(comp.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp ON comp.doc_id = d.doc_id
),
b AS (
  SELECT doc_id, cluster_id,
         CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 1000 AS bucket
  FROM lab
)
SELECT doc_id, cluster_id,
       CASE WHEN bucket < 900 THEN 'train'
            WHEN bucket < 950 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs n-gram Jaccard >= 1/2 via the inverted shingle index."""
    docs = _t(spark, sf_dir, "documents")
    arrs, sh = dd.shingles_shared(docs, "doc_id", "text", 3)
    sa = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    pairs = (
        sa.join(sb, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return dd.jaccard_verify_arrays(pairs, arrs, "doc_id", 1, 2)


def dedup_ppjoin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs Jaccard >= 1/2 via PREFIX FILTERING (PPJoin family,
    Xiao et al. 2008): only each doc's |x| - ceil(|x|/2) + 1 globally
    rarest shingles are indexed, plus the length-band filter — the
    candidate join touches a fraction of the postings while the result
    stays bit-identical to the exhaustive inverted-shingle join. The
    oracle IS that exhaustive join, so a prefix bug that drops a true
    pair hash-fails (false-negative detection, not just shape). Same
    output contract as ``dedup_ngram_jaccard``."""
    docs = _t(spark, sf_dir, "documents")
    arrs = _track_cache(dd.doc_shingle_arrays(docs, "doc_id", "text", 3).persist())
    return dd.ppjoin_pairs(arrs, "doc_id", 1, 2)


def _ngram_jaccard_oracle_sql() -> str:
    return f"""
WITH {_duck_shingles_cte(3)},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM h a JOIN h b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM h GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, count(*) AS n_common
  FROM cand c
  JOIN h x ON x.doc_id = c.id_a
  JOIN h y ON y.doc_id = c.id_b AND y.shingle = x.shingle
  GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b, n_common,
       (sa.n + sb.n - n_common) AS n_union
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE 2 * n_common >= (sa.n + sb.n - n_common)
"""


def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup: a NEW batch (doc_id % 10 == 0, ~10% of
    the corpus — a day's crawl increment) is deduped AGAINST the existing
    corpus (the other 90%) by probing the existing docs' LSH band buckets
    with the batch's bands — candidates are (new x existing) only, never
    all-pairs and never existing x existing. The batch's bands are
    broadcast, so the corpus-side band table is NEVER shuffled: at 100 TB
    the existing bands are a maintained table (the batch analogue of
    ``streaming/dedup_stream.py``'s online band state) and each
    increment costs O(batch + matched buckets), independent of corpus
    size. Exact integer Jaccard >= 1/2 verify on candidates
    (``dedup.incremental_lsh_pairs``). The maintained-table machinery
    itself — band KeyedTable with partition-pruned ``admit()`` merges and
    an index-served probe pinned equal to this derivation — is
    ``operators/bandindex.py`` (tests/test_bandindex.py); the query keeps
    the self-contained derivation so its bench time measures the
    increment's full cost."""
    docs = _t(spark, sf_dir, "documents")
    arrs = _track_cache(dd.doc_shingle_arrays(docs, "doc_id", "text", 3).persist())
    existing = arrs.filter(F.col("doc_id") % 10 != 0)
    new_batch = arrs.filter(F.col("doc_id") % 10 == 0)
    return dd.incremental_lsh_pairs(existing, new_batch, "doc_id", 1, 2)


def _dedup_incremental_oracle_sql() -> str:
    # banding is per-doc, so banding the FULL corpus and restricting the
    # join sides is identical to banding each subset separately
    return f"""
WITH {_duck_shingles_cte(3)},
{_duck_lsh_bands_cte()},
cand AS (
  SELECT DISTINCT b.doc_id AS new_id, a.doc_id AS dup_of
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
  WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
),
sizes AS (SELECT doc_id, count(*) AS n FROM h GROUP BY doc_id),
common AS (
  SELECT c.new_id, c.dup_of, count(*) AS n_common
  FROM cand c
  JOIN h x ON x.doc_id = c.new_id
  JOIN h y ON y.doc_id = c.dup_of AND y.shingle = x.shingle
  GROUP BY c.new_id, c.dup_of
)
SELECT new_id, dup_of, n_common,
       (sa.n + sb.n - n_common) AS n_union
FROM common
JOIN sizes sa ON sa.doc_id = new_id
JOIN sizes sb ON sb.doc_id = dup_of
WHERE 2 * n_common >= (sa.n + sb.n - n_common)
"""


def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix — which sources copy from which:
    LSH-candidate, exact-Jaccard-verified near-dup pairs (J >= 1/2, the
    ``dedup_minhash_lsh`` result) joined to each side's ``source`` and
    counted per unordered source pair. The corpus-forensics view a crawl
    pipeline uses to find mirror sites and syndication before CHOOSING
    which source to keep (``docs_source_mix`` gives composition; this
    gives overlap). Verified-pair-count sized aggregation on top of the
    banded join — no new corpus-sized work."""
    docs = _t(spark, sf_dir, "documents")
    arrs = _track_cache(dd.doc_shingle_arrays(docs, "doc_id", "text", 3).persist())
    cand = dd.lsh_candidate_pairs(dd.lsh_bands_mapside(arrs, "doc_id"), "doc_id")
    pairs = dd.jaccard_verify_arrays(cand, arrs, "doc_id", 1, 2)
    src = docs.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("_sa"))
    sb = src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("_sb"))
    return (
        pairs.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def _dedup_cross_source_oracle_sql() -> str:
    return f"""
WITH {_duck_shingles_cte(3)},
{_duck_lsh_cand_cte()},
sizes AS (SELECT doc_id, count(*) AS n FROM h GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, count(*) AS n_common
  FROM cand c
  JOIN h x ON x.doc_id = c.id_a
  JOIN h y ON y.doc_id = c.id_b AND y.shingle = x.shingle
  GROUP BY c.id_a, c.id_b
),
pairs AS (
  SELECT id_a, id_b
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE 2 * n_common >= (sa.n + sb.n - n_common)
)
SELECT least(da.source, db.source) AS source_a,
       greatest(da.source, db.source) AS source_b,
       count(*) AS n_pairs
FROM pairs
JOIN documents da ON da.doc_id = id_a
JOIN documents db ON db.doc_id = id_b
GROUP BY 1, 2
"""


def docs_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer trained ON the corpus (operators/bpe.py: one
    word-count shuffle, vocab-sized driver merge loop, 24 merges), then
    applied to every document — with the OUTPUT shaped so the driver can
    cross-check it even though merge training is an argmax-iterated loop
    no SQL oracle can replay.

    The oracle-checkable invariants, all computed FROM the BPE token
    stream on the Spark side and from the raw text in DuckDB:
    - ``detok_md5``: md5 of the concatenated token stream. BPE symbols
      concatenate back to ``word || '</w>'`` per word, so the digest
      equals md5 of the normalized text with word boundaries marked —
      any dropped/duplicated character or symbol anywhere in
      segmentation breaks the hash (losslessness, the reversibility
      property of ``AvroRecordPropSpec.scala:35-71`` in query form).
    - ``n_words``: count of tokens carrying the end-of-word marker —
      exactly one per word iff segmentation preserves word boundaries;
      DuckDB counts words from the raw text.

    Merge ORDER (the trained table itself) remains pinned by
    tests/test_bpe.py goldens + the pure-python agreement model."""
    from affinity_spark.operators.bpe import END, bpe_segment, train_bpe

    docs = _t(spark, sf_dir, "documents")
    merges = train_bpe(docs, "text", n_merges=24, min_count=2)
    seg = bpe_segment(docs, "doc_id", "text", merges)
    return seg.select(
        "doc_id",
        F.size(F.filter(F.col("tokens"), lambda t: t.endswith(END))).alias("n_words"),
        F.md5(F.array_join(F.col("tokens"), "")).alias("detok_md5"),
    )


_BPE_SEGMENT_SQL = """
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                     x -> x <> '') AS words
  FROM documents
)
SELECT doc_id,
       CAST(len(words) AS BIGINT) AS n_words,
       md5(array_to_string(list_transform(words, x -> x || '</w>'), ''))
         AS detok_md5
FROM w
"""


def docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3/Pile style): training docs sharing
    a word n-gram with the held-out eval slice (doc_id % 97 == 0) are
    flagged. n=4 here — the synthetic corpus's small vocabulary means
    13-grams (the production default) never repeat across docs; the
    operator takes n as a parameter. Broadcast semi-join: zero shuffle
    over the training corpus."""
    from affinity_spark.operators.decontam import contamination_hits

    docs = _t(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return contamination_hits(train, eval_docs, "doc_id", "text", n=4)


_DECONTAM_SQL = """
WITH d AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
           FROM documents),
g AS (SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(t) - 3, 0) + 1),
               i -> array_to_string(t[i:i+3], ' ')))) AS gram
      FROM d WHERE len(t) >= 4),
e AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
hits AS (SELECT doc_id, count(*) AS n
         FROM g JOIN e USING (gram) WHERE doc_id % 97 <> 0 GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(hits.n, 0) AS BIGINT) AS n_contaminated_grams,
       COALESCE(hits.n, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
LEFT JOIN hits USING (doc_id)
"""


def docs_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality gate (word-repetition family, Rae et al. 2021):
    integer mean-word-length and top-token-dominance signals plus the pass
    flag. Thresholds picked from this corpus's distributions (mwl_x100
    370-530, top_token_bp 515-3000, n_words 10-99) so both outcomes
    occur. Zero shuffle: every signal is map-side."""
    from affinity_spark.functions.text import gopher_rule_struct

    docs = _t(spark, sf_dir, "documents")
    g = docs.select("doc_id", gopher_rule_struct(F.col("text")).alias("g"))
    out = g.select(
        "doc_id",
        F.col("g.n_words").alias("n_words"),
        F.col("g.mean_word_len_x100").alias("mwl_x100"),
        F.col("g.top_token_bp").alias("top_token_bp"),
    )
    passes = (
        (F.col("n_words") >= 20)
        & F.col("mwl_x100").between(300, 1000)
        & (F.col("top_token_bp") <= 1500)
    )
    return out.withColumn("quality_pass", passes)


_GOPHER_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                     t -> t <> '') AS t
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_words,
         CAST(COALESCE(list_sum(list_transform(t, w -> len(w))), 0) * 100
              // greatest(len(t), 1) AS BIGINT) AS mwl_x100,
         CAST(COALESCE(list_max(list_transform(list_distinct(t),
                w -> len(list_filter(t, x -> x = w)))), 0) * 10000
              // greatest(len(t), 1) AS BIGINT) AS top_token_bp
  FROM toks
)
SELECT doc_id, n_words, mwl_x100, top_token_bp,
       (n_words >= 20 AND mwl_x100 BETWEEN 300 AND 1000
        AND top_token_bp <= 1500) AS quality_pass
FROM m
"""


def docs_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (§2.13 training-pipeline extension): per-class match
    counts + redacted-text digest + a ``clean`` partition-prune flag.

    The synthetic corpus contains no PII (no digits, no '@' anywhere), so
    the query derives an augmented text column by deterministically
    injecting synthetic PII for two of every three doc_ids — the SAME
    derivation in the oracle — leaving doc_id % 3 == 2 rows clean so both
    outcomes occur. Everything is a map-side regexp projection: zero
    shuffle, codegen end to end (see ``operators/pii.py``)."""
    from affinity_spark.operators.pii import pii_counts, scrub_text

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(F.lit(" contact user"), did, F.lit("@mail.example.com now")),
        )
        .when(
            did % 3 == 1,
            F.concat(
                F.lit(" from 10."),
                did % 256,
                F.lit(".0."),
                (did * 7) % 256,
                F.lit(" call 555-"),
                F.lpad((did % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad(((did * 13) % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.lit("")),
    )
    base = docs.select("doc_id", aug.alias("aug"))
    counts = pii_counts(F.col("aug"))
    out = base.select(
        "doc_id",
        *[c.alias(name) for name, c in counts.items()],
        F.md5(scrub_text(F.col("aug"))).alias("masked_md5"),
    )
    total = sum((F.col(n) for n in counts), F.lit(0).cast("long"))
    return out.withColumn("clean", total == 0)


_PII_SQL = r"""
WITH aug AS (
  SELECT doc_id,
         text || CASE
           WHEN doc_id % 3 = 0 THEN
             ' contact user' || doc_id || '@mail.example.com now'
           WHEN doc_id % 3 = 1 THEN
             ' from 10.' || (doc_id % 256) || '.0.' || ((doc_id * 7) % 256)
             || ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
             || '-' || lpad(CAST((doc_id * 13) % 10000 AS VARCHAR), 4, '0')
           ELSE ''
         END AS aug
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(aug, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(aug, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phone,
  md5(regexp_replace(regexp_replace(regexp_replace(aug,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g')) AS masked_md5,
  (len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
   + len(regexp_extract_all(aug, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
   + len(regexp_extract_all(aug, '\b\d{3}-\d{3}-\d{4}\b'))) = 0 AS clean
FROM aug
"""


_BM25_TERMS = ("vector", "stream", "merge")


def docs_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-style top-20 ranked retrieval for an OR-of-terms query
    (§2.13 extension of the inverted-index family, X1/X2). Integer
    fixed-point scoring so the oracle matches bit-for-bit; per-term tf is
    a map-side array filter (no explode), corpus stats reduce to ONE
    broadcast row, top-k is TakeOrderedAndProject (see
    ``operators/ranking.py``).

    Served from the MATERIALIZED postings index (shared with
    tfidf/phrase): the term filter prunes the postings scan, df/N/L derive
    from the index alone, zero document scans at query time — the
    reference's maintained-index lookup shape (``KVStoreIndex.scala:20-66``)."""
    from affinity_spark.operators.ranking import bm25_topk_postings

    return bm25_topk_postings(_postings(spark, sf_dir), _BM25_TERMS, k=20)


def _bm25_oracle_sql() -> str:
    tfs = ",\n         ".join(
        f"CAST(len(list_filter(t, x -> x = '{term}')) AS BIGINT) AS tf{i}"
        for i, term in enumerate(_BM25_TERMS)
    )
    dfs = ",\n         ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    contribs = "\n       + ".join(
        f"CASE WHEN tf{i} > 0 THEN ((n - df{i}) * 1000 // n) * "
        f"((tf{i} * 2200 * l * 1000) // (tf{i} * 1000 * l + 300 * l + 900 * dl * n)) "
        f"ELSE 0 END"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
WITH d AS (SELECT doc_id,
                  list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                              t -> t <> '') AS t
           FROM documents),
base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
         {tfs}
         FROM d),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS l,
         {dfs}
          FROM base),
scored AS (SELECT doc_id,
       CAST({contribs} AS BIGINT) AS score_x1e6
  FROM base, stats)
SELECT doc_id, score_x1e6 FROM scored
WHERE score_x1e6 > 0
ORDER BY score_x1e6 DESC, doc_id
LIMIT 20
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash 32-bit fingerprints (integer math, engine-portable)."""
    docs = _t(spark, sf_dir, "documents")
    return dd.simhash_fingerprints(docs, "doc_id", "text", 3)


def _simhash_oracle_sql() -> str:
    s_cols = ",\n       ".join(
        f"sum(((h0 >> {j}) % 2) * 2 - 1) AS s_{j}" for j in range(dd.SIMHASH_BITS)
    )
    fp_expr = " + ".join(
        f"(CASE WHEN s_{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(dd.SIMHASH_BITS)
    )
    return f"""
WITH {_duck_shingles_cte(3)},
sums AS (SELECT doc_id, {s_cols} FROM h GROUP BY doc_id)
SELECT doc_id, CAST({fp_expr} AS BIGINT) AS simhash FROM sums
"""


def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LLM-pipeline ops COMPOSED end to end: quality filter (>= 10
    tokens) → exact dedup (keep min id per fingerprint) → near-dup removal
    via MinHash-LSH candidates + exact-Jaccard >= 1/2 verify (drop the
    higher id of each confirmed pair) → surviving (doc_id, n_tokens).

    This is the SCALE tier composed end to end: signatures are the
    zero-shuffle map-side array transform, candidates come from the LSH
    band join (bucket-sized, never the all-pairs shingle self-join — that
    tier lives in dedup_ngram_jaccard as the small-scale verifier), and
    the verify step touches candidate pairs only. The shingle arrays are
    materialized ONCE (persist — the RDD checkpoint path loses AQE/codegen) and shared by the signature and
    verify branches.
    """
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select("doc_id", "text", token_count(F.col("text")).alias("n_tokens"))
    quality = scored.filter(F.col("n_tokens") >= 10)
    # Exact dedup as a window (keep min doc_id per fingerprint): one shuffle
    # on fp, no self-join — documents is scanned ONCE for the whole pipeline
    # (keepers is checkpointed and feeds both the LSH branch and the final
    # anti-join).
    w_fp = Window.partitionBy(doc_fingerprint(F.col("text"))).orderBy("doc_id")
    keepers = (
        quality.withColumn("rn", F.row_number().over(w_fp))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .persist()
    )
    keepers = _track_cache(keepers)
    arrs = _track_cache(dd.doc_shingle_arrays(keepers, "doc_id", "text", 3).persist())
    cand = dd.lsh_candidate_pairs(dd.lsh_bands_mapside(arrs, "doc_id"), "doc_id")
    near_dups = dd.jaccard_verify_arrays(cand, arrs, "doc_id", 1, 2).select(
        F.col("id_b").alias("doc_id")
    ).distinct()
    clean = keepers.join(near_dups, "doc_id", "left_anti")
    return clean.select("doc_id", "n_tokens")


def _pipeline_oracle_sql() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, text,
         len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> ''))
           AS n_tokens
  FROM documents
),
q AS (SELECT * FROM t WHERE n_tokens >= 10),
k AS (
  SELECT min(doc_id) AS doc_id
  FROM q GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
),
kd AS (SELECT q.* FROM q JOIN k USING (doc_id)),
d AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM kd),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(t) - 2, 0) + 1),
           i -> array_to_string(t[i:i+2], ' ')))) AS shingle
  FROM d WHERE len(t) >= 3
),
h AS (SELECT doc_id, shingle,
             CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h0
      FROM sh),
{_duck_lsh_cand_cte()},
sizes AS (SELECT doc_id, count(*) AS n FROM h GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, count(*) AS n_common
  FROM cand c
  JOIN h x ON x.doc_id = c.id_a
  JOIN h y ON y.doc_id = c.id_b AND y.shingle = x.shingle
  GROUP BY c.id_a, c.id_b
),
dups AS (
  SELECT DISTINCT id_b AS doc_id
  FROM common JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
  WHERE 2 * n_common >= (sa.n + sb.n - n_common)
)
SELECT doc_id, n_tokens FROM kd
WHERE doc_id NOT IN (SELECT doc_id FROM dups)
"""


# --------------------------------------------------------------------------
# Embedding similarity search (LLM-pipeline surface)
# --------------------------------------------------------------------------


def emb_knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 to the vec_id=0 query vector.

    Similarity emitted as floor(10000*cos) so the hash is float-free.
    """
    emb = _t(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    scored = sim.knn_to_query(
        emb.filter(F.col("vec_id") != 0), query, 10, "vec_id", "embedding"
    )
    return scored.select(
        "vec_id", F.floor(F.col("cosine_raw") * 10000).cast("long").alias("cos_bp")
    )


_KNN_SQL = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
         list_sum(list_transform(range(1, len(e.embedding) + 1),
                  i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
           AS cosine
  FROM embeddings e, q
  WHERE e.vec_id <> 0
)
SELECT vec_id, CAST(floor(cosine * 10000) AS BIGINT) AS cos_bp
FROM scored
ORDER BY cosine DESC, vec_id ASC
LIMIT 10
"""


def emb_filtered_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search: cosine top-10 to the vec_id=0 query among
    vectors satisfying a metadata predicate (label = 3) — the
    filtered-ANN problem real retrieval systems hit the moment vectors
    carry attributes (tenant, language, date). Strategy here is
    PRE-FILTER: the predicate is applied before scoring, so it reaches
    the parquet scan as a pushed filter and the distance work is
    filtered-set sized; at selective predicates this beats post-filtering
    a k'-oversized ANN result, and the same pre-filter composes with the
    IVF path by pruning cells first (`emb_ivf_search`). Scores in
    integer basis points (float-free hash)."""
    emb = _t(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    scored = sim.knn_to_query(
        emb.filter((F.col("vec_id") != 0) & (F.col("label") == 3)),
        query,
        10,
        "vec_id",
        "embedding",
    )
    return scored.select(
        "vec_id", F.floor(F.col("cosine_raw") * 10000).cast("long").alias("cos_bp")
    )


_FILTERED_KNN_SQL = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
         list_sum(list_transform(range(1, len(e.embedding) + 1),
                  i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
           AS cosine
  FROM embeddings e, q
  WHERE e.vec_id <> 0 AND e.label = 3
)
SELECT vec_id, CAST(floor(cosine * 10000) AS BIGINT) AS cos_bp
FROM scored
ORDER BY cosine DESC, vec_id ASC
LIMIT 10
"""


def emb_cosine_pairs_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-cell pairwise similarity: pairs within label cell, cos >= 0.35
    (threshold sits just inside the regenerated corpus's within-cell cosine
    range, max ~0.47/0.51 at sf0.01/0.1, so the pair set is non-trivial)."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = sim.cosine_join_within(emb, "label", 0.35, "vec_id", "embedding")
    return pairs.select(
        "id_a", "id_b", F.floor(F.col("cosine") * 10000).cast("long").alias("cos_bp")
    )


_COSPAIR_SQL = """
WITH n AS (
  SELECT vec_id, label, embedding,
         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           AS nrm
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(floor(
         list_sum(list_transform(range(1, len(a.embedding) + 1),
                  i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
         / (a.nrm * b.nrm) * 10000) AS BIGINT) AS cos_bp
FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_sum(list_transform(range(1, len(a.embedding) + 1),
               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      / (a.nrm * b.nrm) >= 0.35
"""


def emb_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell assignment (ANN scale path): nearest of 8 seed centroids
    (the 8 lowest-id vectors — SQL-reproducible codebook; the trained
    k-means variant lives in operators/ivf.py with its own tests)."""
    from affinity_spark.operators.ivf import assign

    emb = _t(spark, sf_dir, "embeddings")
    seeds = [
        [float(x) for x in r.embedding]
        for r in emb.select("vec_id", "embedding").orderBy("vec_id").limit(8).collect()
    ]
    return assign(emb, seeds).select("vec_id", "cell")


_IVF_SQL = """
WITH seeds AS (
  SELECT vec_id AS cell, embedding AS cv
  FROM embeddings ORDER BY vec_id LIMIT 8
),
dists AS (
  SELECT e.vec_id, s.cell,
         list_sum(list_transform(range(1, len(e.embedding) + 1),
                  i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(s.cv[i] AS DOUBLE))
                     * (CAST(e.embedding[i] AS DOUBLE) - CAST(s.cv[i] AS DOUBLE))))
           AS d
  FROM embeddings e CROSS JOIN seeds s
)
SELECT vec_id, CAST(cell AS INT) AS cell
FROM (
  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
  FROM dists
) WHERE rn = 1
"""


_PQ_M, _PQ_K, _PQ_DIM = 4, 8, 64


def _pq_seed_books(emb) -> list[list[list[float]]]:
    """Seed codebooks: subvector slices of the 8 lowest-id vectors —
    SQL-reproducible, like the IVF seed cells (trained PQ lives in
    operators/pq.py with its own tests)."""
    d_sub = _PQ_DIM // _PQ_M
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(_PQ_K).collect()
    return [
        [[float(x) for x in r.embedding[s * d_sub : (s + 1) * d_sub]] for r in rows]
        for s in range(_PQ_M)
    ]


def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (Jégou et al. 2011): 64-dim vectors
    compressed to 4 subspace codes against the seed codebooks — map-side
    argmin per subspace, zero shuffle (the memory-scale half of ANN;
    operators/ivf.py is the pruning half)."""
    from affinity_spark.operators.pq import assign_codes

    emb = _t(spark, sf_dir, "embeddings")
    return assign_codes(emb, _pq_seed_books(emb))


def _pq_dist_sql(s: int) -> str:
    d = _PQ_DIM // _PQ_M
    off = s * d
    return (
        f"list_sum(list_transform(range(1, {d + 1}), "
        f"i -> (CAST(e.embedding[{off} + i] AS DOUBLE) - CAST(s.sv[{off} + i] AS DOUBLE))"
        f" * (CAST(e.embedding[{off} + i] AS DOUBLE) - CAST(s.sv[{off} + i] AS DOUBLE))))"
    )


_PQ_SEEDS_CTE = f"""seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx, embedding AS sv
  FROM embeddings ORDER BY vec_id LIMIT {_PQ_K}
)"""


def _pq_code_ctes(where: str = "") -> str:
    """c0..c{m-1} CTEs: per-subspace argmin codes (ties -> lowest idx,
    matching array_position-first semantics)."""
    return ",\n".join(
        f"""c{s} AS (
  SELECT vec_id, CAST(idx AS INT) AS code_{s} FROM (
    SELECT e.vec_id, s.idx,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_pq_dist_sql(s)} ASC, s.idx ASC) AS rn
    FROM embeddings e CROSS JOIN seeds s {where}) WHERE rn = 1
)"""
        for s in range(_PQ_M)
    )


def _pq_codes_sql() -> str:
    joins = " ".join(f"JOIN c{s} USING (vec_id)" for s in range(1, _PQ_M))
    cols = ", ".join(f"code_{s}" for s in range(_PQ_M))
    return f"""
WITH {_PQ_SEEDS_CTE},
{_pq_code_ctes()}
SELECT vec_id, {cols} FROM c0 {joins}
"""


def emb_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-10 over PQ codes: the vec_id=0 query's per-subspace distance
    table is a literal array, each row costs 4 lookups — the scan touches
    codes (4 ints/row), never raw vectors. Distances in basis points so the
    hash is float-free."""
    from affinity_spark.operators.pq import adc_search, assign_codes

    emb = _t(spark, sf_dir, "embeddings")
    books = _pq_seed_books(emb)
    codes = assign_codes(emb.filter(F.col("vec_id") != 0), books)
    query = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    ]
    top = adc_search(codes, books, query, 10)
    return top.select(
        "vec_id", F.floor(F.col("adc_dist") * 10000).cast("long").alias("adc_bp")
    )


def _pq_search_sql() -> str:
    table_ctes = ",\n".join(
        f"""t{s} AS (
  SELECT s.idx, {_pq_dist_sql(s)} AS d
  FROM (SELECT embedding FROM embeddings WHERE vec_id = 0) e CROSS JOIN seeds s
)"""
        for s in range(_PQ_M)
    )
    code_joins = " ".join(f"JOIN t{s} ON t{s}.idx = c{s}.code_{s}" for s in range(_PQ_M))
    cjoins = " ".join(f"JOIN c{s} USING (vec_id)" for s in range(1, _PQ_M))
    adc = " + ".join(f"t{s}.d" for s in range(_PQ_M))
    return f"""
WITH {_PQ_SEEDS_CTE},
{_pq_code_ctes("WHERE e.vec_id <> 0")},
{table_ctes}
SELECT c0.vec_id, CAST(floor(({adc}) * 10000) AS BIGINT) AS adc_bp
FROM c0 {cjoins} {code_joins}
ORDER BY ({adc}) ASC, c0.vec_id ASC
LIMIT 10
"""


def emb_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end IVF ANN read: assign vectors to the 8-seed codebook,
    probe the query's nprobe=2 nearest cells only, cosine top-10 inside
    them. At scale `cell` is a partition column, so the non-probed ~6/8 of
    the corpus is never scanned — the partition-pruned ANN read the
    SURVEY's similarity family targets (IVF per Jégou et al.).

    Query vector = embedding of vec_id 0 (excluded from candidates);
    similarity emitted as floor(10000*cos) so the hash is float-free.
    """
    from affinity_spark.operators.ivf import assign, search

    emb = _t(spark, sf_dir, "embeddings")
    seeds = [
        [float(x) for x in r.embedding]
        for r in emb.select("vec_id", "embedding").orderBy("vec_id").limit(8).collect()
    ]
    assigned = assign(emb.filter(F.col("vec_id") != 0), seeds)
    res = search(assigned, seeds, seeds[0], 10, nprobe=2)
    return res.select(
        "vec_id",
        F.col("cell").cast("int").alias("cell"),
        F.floor(F.col("cosine") * 10000).cast("long").alias("cos_bp"),
    )


_IVF_SEARCH_SQL = """
WITH seeds AS (
  SELECT vec_id AS cell, embedding AS cv
  FROM embeddings ORDER BY vec_id LIMIT 8
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
probes AS (
  SELECT s.cell FROM seeds s, q
  ORDER BY list_sum(list_transform(range(1, len(s.cv) + 1),
             i -> (CAST(s.cv[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE))
                * (CAST(s.cv[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE)))) ASC,
           s.cell ASC
  LIMIT 2
),
assigned AS (
  SELECT vec_id, cell, embedding FROM (
    SELECT e.vec_id, s.cell, e.embedding,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             list_sum(list_transform(range(1, len(e.embedding) + 1),
               i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(s.cv[i] AS DOUBLE))
                  * (CAST(e.embedding[i] AS DOUBLE) - CAST(s.cv[i] AS DOUBLE)))) ASC,
             s.cell ASC) AS rn
    FROM embeddings e CROSS JOIN seeds s
    WHERE e.vec_id <> 0
  ) WHERE rn = 1
),
scored AS (
  SELECT a.vec_id, a.cell,
         list_sum(list_transform(range(1, len(a.embedding) + 1),
                  i -> CAST(a.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
           AS cosine
  FROM assigned a, q
  WHERE a.cell IN (SELECT cell FROM probes)
)
SELECT vec_id, CAST(cell AS INT) AS cell,
       CAST(floor(cosine * 10000) AS BIGINT) AS cos_bp
FROM scored
ORDER BY cosine DESC, vec_id ASC
LIMIT 10
"""


def emb_batch_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCHED IVF ANN read — many queries in one pass (the online-serving
    and hard-negative-mining shape; ``emb_ivf_search`` is the single-query
    probe). The 4 lowest-id vectors each probe their nprobe=2 nearest of
    the 8 seed cells; the exploded (query, cell) probe set broadcasts into
    ONE join against the assigned corpus (only probed cells scanned —
    partition-pruned at scale), and per-query top-5 rides a rank window
    (WindowGroupLimit, never a global sort). Similarity in floored basis
    points, rank long — float-free hash."""
    from affinity_spark.operators.ivf import assign, batch_search

    emb = _t(spark, sf_dir, "embeddings")
    seeds = [
        [float(x) for x in r.embedding]
        for r in emb.select("vec_id", "embedding").orderBy("vec_id").limit(8).collect()
    ]
    assigned = assign(emb, seeds)
    qs = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = batch_search(assigned, seeds, qs, k=5, nprobe=2)
    return out.select(
        "qid",
        "vec_id",
        F.floor(F.col("cosine") * 10000).cast("long").alias("cos_bp"),
        F.col("rnk").cast("long").alias("rnk"),
    )


_BATCH_SEARCH_SQL = """
WITH seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS cv
  FROM embeddings ORDER BY vec_id LIMIT 8
),
qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 4),
probes AS (
  SELECT qid, cell FROM (
    SELECT q.qid, s.cell,
           row_number() OVER (PARTITION BY q.qid ORDER BY
             list_sum(list_transform(range(1, len(s.cv) + 1),
               i -> (CAST(s.cv[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE))
                  * (CAST(s.cv[i] AS DOUBLE) - CAST(q.qv[i] AS DOUBLE)))) ASC,
             s.cell ASC) AS rn
    FROM qs q CROSS JOIN seeds s
  ) WHERE rn <= 2
),
assigned AS (
  SELECT vec_id, cell, embedding FROM (
    SELECT e.vec_id, s.cell, e.embedding,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             list_sum(list_transform(range(1, len(e.embedding) + 1),
               i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(s.cv[i] AS DOUBLE))
                  * (CAST(e.embedding[i] AS DOUBLE) - CAST(s.cv[i] AS DOUBLE)))) ASC,
             s.cell ASC) AS rn
    FROM embeddings e CROSS JOIN seeds s
  ) WHERE rn = 1
),
scored AS (
  SELECT p.qid, a.vec_id,
         list_sum(list_transform(range(1, len(a.embedding) + 1),
                  i -> CAST(a.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
           AS cosine
  FROM assigned a
  JOIN probes p ON a.cell = p.cell
  JOIN qs q ON q.qid = p.qid
),
ranked AS (
  SELECT qid, vec_id, cosine,
         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id ASC) AS rnk
  FROM scored
)
SELECT qid, vec_id,
       CAST(floor(cosine * 10000) AS BIGINT) AS cos_bp,
       CAST(rnk AS BIGINT) AS rnk
FROM ranked
WHERE rnk <= 5
"""


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRS (hamming <= 3) via pigeonhole bucketing:
    the 32-bit fingerprint splits into 4 chunks, any pair within radius 3
    agrees on >= 1 full chunk, so candidates come from 4 chunk-equality
    bucket joins and only candidates pay the bit_count verify. The oracle
    is the exhaustive all-pairs hamming — a bucketing bug that DROPS a
    true pair breaks the hash (false-negative detection, not just shape)."""
    docs = _t(spark, sf_dir, "documents")
    fps = dd.simhash_fingerprints(docs, "doc_id", "text", 3)
    return dd.simhash_near_pairs(fps, "doc_id", max_hamming=3).select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


def _simhash_pairs_oracle_sql() -> str:
    s_cols = ",\n       ".join(
        f"sum(((h0 >> {j}) % 2) * 2 - 1) AS s_{j}" for j in range(dd.SIMHASH_BITS)
    )
    fp_expr = " + ".join(
        f"(CASE WHEN s_{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(dd.SIMHASH_BITS)
    )
    return f"""
WITH {_duck_shingles_cte(3)},
sums AS (SELECT doc_id, {s_cols} FROM h GROUP BY doc_id),
fp AS (SELECT doc_id, CAST({fp_expr} AS BIGINT) AS simhash FROM sums)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def mktsegment_revenue_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase (salted) aggregate — same result as
    mktsegment_revenue, verified against the same oracle. The pattern for
    hot group keys at 100 TB (alongside AQE skew-join splitting)."""
    from affinity_spark.operators.skew import salted_aggregate

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    joined = o.join(c, o["o_custkey"] == c["c_custkey"])
    return salted_aggregate(
        joined,
        ["c_mktsegment"],
        {
            "n_orders": (F.lit(1), "count"),
            "total_revenue_cents": (_cents(F.col("o_totalprice")), "sum"),
        },
        n_salts=8,
    )


def emb_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket assignment (ANN scale path): 8 sign
    bits against deterministic ±1 hyperplanes."""
    emb = _t(spark, sf_dir, "embeddings")
    return sim.lsh_hyperplane_buckets(emb, 64, 8).select("vec_id", "bucket")


def _lsh_bucket_expr() -> str:
    """DuckDB expression for the 8-bit hyperplane bucket of `embedding`
    (identical deterministic planes as the Spark side)."""
    planes = sim._hyperplanes(64, 8)  # noqa: SLF001 - shared deterministic constants
    bits = []
    for j, plane in enumerate(planes):
        lit = "[" + ", ".join(f"{float(x):.1f}" for x in plane) + "]"
        bits.append(
            f"(CASE WHEN list_sum(list_transform(range(1, 65), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({lit}::DOUBLE[])[i])) > 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return " + ".join(bits)


def _lsh_oracle_sql() -> str:
    return (
        f"SELECT vec_id, CAST({_lsh_bucket_expr()} AS BIGINT) AS bucket "
        f"FROM embeddings"
    )


def emb_lsh_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end hyperplane-LSH ANN read: bucket every vector by 8 sign
    bits, probe ONLY the query's bucket, cosine top-10 inside it. At scale
    `bucket` is the partition/cluster column, so ~255/256 of the corpus is
    never scanned — the LSH twin of emb_ivf_search (nprobe=1; multi-probe =
    flipping low-confidence bits adds buckets, same plan shape).

    Query vector = vec_id 0's embedding (excluded from candidates);
    similarity emitted as floor(10000*cos) so the hash is float-free.
    Multi-probe: the query probes its own bucket plus the 8 one-bit flips
    (Lv et al. 2007) — 9/256 of the corpus scanned instead of 1/256, the
    standard recall/scan-fraction dial."""
    emb = _t(spark, sf_dir, "embeddings")
    bucketed = sim.lsh_hyperplane_buckets(emb, 64, 8)
    probes = F.array(*[F.lit(0)] + [F.lit(1 << j) for j in range(8)])
    q = (
        bucketed.filter(F.col("vec_id") == 0)
        .select(
            F.explode(probes).alias("flip"),
            F.col("bucket").alias("qb"),
            F.col("embedding").alias("qv"),
        )
        .select(
            (F.col("qb").bitwiseXOR(F.col("flip"))).alias("bucket"), F.col("qv")
        )
    )
    cands = bucketed.filter(F.col("vec_id") != 0).join(F.broadcast(q), "bucket")
    scored = cands.select(
        "vec_id",
        sim.cosine_similarity(F.col("embedding"), F.col("qv")).alias("c"),
    )
    return (
        scored.orderBy(F.col("c").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", F.floor(F.col("c") * 10000).cast("long").alias("cos_bp"))
    )


def _lsh_search_oracle_sql() -> str:
    return f"""
WITH b AS (
  SELECT vec_id, embedding, CAST({_lsh_bucket_expr()} AS BIGINT) AS bucket
  FROM embeddings
),
q0 AS (SELECT bucket, embedding AS qv FROM b WHERE vec_id = 0),
q AS (
  SELECT xor(q0.bucket, f.flip) AS bucket, q0.qv
  FROM q0 CROSS JOIN (SELECT unnest([0, 1, 2, 4, 8, 16, 32, 64, 128]) AS flip) f
),
scored AS (
  SELECT e.vec_id,
         list_sum(list_transform(range(1, len(e.embedding) + 1),
                  i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
           AS cosine
  FROM b e JOIN q ON e.bucket = q.bucket
  WHERE e.vec_id <> 0
)
SELECT vec_id, CAST(floor(cosine * 10000) AS BIGINT) AS cos_bp
FROM scored
ORDER BY cosine DESC, vec_id ASC
LIMIT 10
"""


def custom_gather_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/§2.12 user-defined gather combinator as a pandas UDAF: per event
    type, the integer-cents median of event values.

    DELIBERATE surface demo, not a recipe: Spark's built-in
    ``percentile``/``median``/``percentile_approx`` computes this JVM-side
    and is the production answer (~5x cheaper — a GROUPED_AGG pandas UDAF
    pays Arrow transfer + Python per group and disables partial
    aggregation). This exists to mirror the reference's arbitrary Scala
    ``gather(r1, r2)`` combinators through the Arrow GROUPED_AGG path; copy
    the built-in, not this, for real medians."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def median_cents(v: pd.Series) -> int:
        # discrete lower median: element at index (n-1)//2 of the sorted
        # cents — an exact integer both engines can reproduce (float median
        # interpolation differs between pandas and SQL engines)
        cents = (v * 100 + 0.5).apply(math.floor).astype("int64")
        s = cents.sort_values().reset_index(drop=True)
        return int(s.iloc[(len(s) - 1) // 2])

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        # grouped-agg pandas UDFs can't mix with JVM aggregates in one agg,
        # so the count is a (trivial) second gather combinator
        return len(v)

    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        median_cents(F.col("value")).alias("median_value_cents"),
        n_rows(F.col("value")).alias("n"),
    )


_GATHER_SQL = """
WITH cents AS (
  SELECT event_type, CAST(floor("value" * 100 + 0.5) AS BIGINT) AS c,
         row_number() OVER (PARTITION BY event_type ORDER BY CAST(floor("value" * 100 + 0.5) AS BIGINT)) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       max(CASE WHEN rn = (n - 1) // 2 + 1 THEN c END) AS median_value_cents,
       max(n) AS n
FROM cents
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Corpus management: deterministic split / stratified sample / sequence
# packing / semantic near-dup (training-data pipeline extension set).
# All randomness is md5-derived from stable ids so both engines agree
# bit-for-bit (operators/sampling.py docstring has the scale rationale).
# --------------------------------------------------------------------------


def docs_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-split the corpus 90/5/5 into train/val/test and account for it.

    The split of a row is a pure function of md5(doc_id) — stable across
    runs, engines, and data growth (new docs never move old ones between
    splits). The aggregate output verifies every row's assignment *and* the
    token accounting a loader would consume.
    """
    from affinity_spark.operators.sampling import train_split

    docs = _t(spark, sf_dir, "documents")
    lab = train_split(docs.select("doc_id", "text"), "doc_id")
    return lab.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(F.col("text"))).cast("long").alias("tok_sum"),
    )


_TRAIN_SPLIT_SQL = """
WITH b AS (
  SELECT doc_id, text,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000
           AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 900 THEN 'train'
            WHEN bucket < 950 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       CAST(sum(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                t -> t <> ''))) AS BIGINT) AS tok_sum
FROM b
GROUP BY 1
"""


def docs_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate line removal (CCNet/RefinedWeb paragraph
    dedup). The synthetic docs are single-line, so the query derives a
    multi-line column first: a per-source header (25 docs share it → df 25
    > 10, dropped), the original text (kept unless genuinely duplicated
    across >10 docs), and a per-doc footer (df 1, kept — also guarantees
    no doc loses every line). The SAME derivation runs in the oracle.
    Shape: line-df agg + AQE-broadcast anti-join + per-doc regroup (see
    ``dedup.line_dedup``)."""
    docs = _t(spark, sf_dir, "documents")
    aug = F.concat_ws(
        "\n",
        F.concat(F.lit("(c) boilerplate of "), F.col("source")),
        F.col("text"),
        F.concat(F.lit("footer "), F.col("doc_id")),
    )
    base = docs.select("doc_id", aug.alias("aug"))
    return dd.line_dedup(base, "doc_id", "aug", 10)


_LINE_DEDUP_SQL = """
WITH a AS (
  SELECT doc_id,
         '(c) boilerplate of ' || source || chr(10) || text
           || chr(10) || 'footer ' || doc_id AS aug
  FROM documents
),
d AS (SELECT doc_id, string_split(aug, chr(10)) AS l FROM a),
lines AS (
  SELECT doc_id, CAST(len(l) AS BIGINT) AS n_lines,
         unnest(range(1, len(l) + 1)) AS pos, unnest(l) AS line
  FROM d
),
bl AS (SELECT line FROM lines GROUP BY line
       HAVING count(DISTINCT doc_id) > 10),
kept AS (SELECT doc_id, n_lines, pos, line FROM lines ANTI JOIN bl USING (line))
SELECT doc_id,
       CAST(min(n_lines) AS BIGINT) AS n_lines,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(min(n_lines) - count(*) AS BIGINT) AS n_dropped,
       md5(string_agg(line, chr(10) ORDER BY pos)) AS clean_md5
FROM kept GROUP BY doc_id
"""


def docs_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus mixing: fill a 600-token budget PER SOURCE in
    stable hash order (take-while on the exclusive running token sum, last
    doc may overshoot). The stop condition is token mass, not a row
    percentage — the "equal tokens per source" mixing move a training
    pipeline actually wants. One partition-aligned shuffle; selection is a
    pure function of ids (rerun/retry-stable)."""
    from affinity_spark.operators.sampling import token_budget_sample

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    picked = token_budget_sample(scored, "doc_id", "source", "n_tokens", 600)
    return picked.select("doc_id", "source", "n_tokens", "cum_before")


_SOURCE_MIX_SQL = """
WITH t AS (
  SELECT doc_id, source,
         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 2147483648 AS hk
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         CAST(COALESCE(sum(n_tokens) OVER (
           PARTITION BY source ORDER BY hk, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM t
)
SELECT doc_id, source, n_tokens, cum_before
FROM c WHERE cum_before < 600
"""


def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic subsample (corpus mixing): keep 100% of en,
    50% of fr, 25% of everything else — a zero-shuffle md5-bucket filter, the
    scalable alternative to sample() whose membership survives reruns."""
    from affinity_spark.operators.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    rates = {"en": 100, "fr": 50, "de": 25, "es": 25, "zh": 25}
    kept = stratified_sample(docs, "doc_id", "lang", rates)
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars_sum"),
    )


_STRATIFIED_SQL = """
WITH b AS (
  SELECT lang, n_chars,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000
           AS bucket
  FROM documents
)
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars_sum
FROM b
WHERE (lang = 'en' AND bucket < 1000)
   OR (lang = 'fr' AND bucket < 500)
   OR (lang IN ('de', 'es', 'zh') AND bucket < 250)
GROUP BY lang
"""


def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing into 2048-token context windows, per source
    shard: pack_id = exclusive running token count div 2048. Shards pack
    independently (one parallel per-shard window, never a global sort); a
    straddling doc continues into the next pack — block packing with zero
    padding waste. Output: per-pack doc/token accounting."""
    from affinity_spark.operators.sampling import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    with_tok = docs.select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_sequences(with_tok, "source", "doc_id", "n_tokens", 2048)
    return packed.groupBy("source", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("pack_tokens"),
    )


_PACK_SQL = """
WITH tok AS (
  SELECT doc_id, source,
         len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         t -> t <> '')) AS n_tokens
  FROM documents
), cum AS (
  SELECT source, n_tokens,
         (CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id ASC
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
          - n_tokens) // 2048 AS pack_id
  FROM tok
)
SELECT source, pack_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
FROM cum
GROUP BY source, pack_id
"""


def docs_reservoir_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-per-source subsample (distributed reservoir stand-in):
    rank by md5(doc_id) within each source, keep the 5 smallest —
    selection is a pure function of ids, so retries/engines agree, and
    WindowGroupLimit prunes to 5 rows per group before the shuffle."""
    from affinity_spark.operators.sampling import per_group_sample

    docs = _t(spark, sf_dir, "documents")
    kept = per_group_sample(docs.select("doc_id", "source"), "doc_id", "source", 5)
    return kept.select("doc_id", "source")


_RESERVOIR_SQL = """
SELECT doc_id, source
FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                      % 2147483648 ASC,
                    doc_id ASC) AS rk
  FROM documents
)
WHERE rk <= 5
"""



def docs_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus QA: token-length histogram (50-token buckets, capped at 19) —
    the distribution readout that gates length filters before training.
    One map-side projection + one small agg; bucket math is integer so both
    engines bin identically."""
    docs = _t(spark, sf_dir, "documents")
    nt = token_count(F.col("text")).cast("long")
    return (
        docs.select(nt.alias("nt"))
        .select(F.expr("least(nt div 50, 19L)").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"))
    )


_TOKEN_HIST_SQL = """
SELECT least(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                             t -> t <> '')) // 50, 19) AS bucket,
       count(*) AS n_docs
FROM documents
GROUP BY 1
"""



def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-candidate near-dup pairs: docs sharing >= 2 RARE winnow
    fingerprints. Common fingerprints carry no signal in a template-heavy
    corpus (this one's median fp appears in 16 docs), so fps seen in > 3
    docs are dropped first — the df-cutoff MOSS applies, and the guard that
    keeps the fp-keyed candidate work bounded at corpus scale (per-fp pair
    work <= df²/2, df <= 3).

    Pairs are enumerated MAP-SIDE from per-fp posting lists
    (``dedup.rare_key_pairs``): collect_list runs only on kept df<=3
    groups so memory is cap-bounded, and there is no postings self-join.
    The fingerprint frame is PERSISTED (shared-frame registry) because the
    df count and the join both consume it — without the persist the gram
    hashing, the dominant cost (r5 profile: ~7.5 s of the 16.7 s 10x
    rehearsal, vs ~1 s for all shuffles), runs twice."""
    from affinity_spark.functions.text import winnow_fingerprints

    docs = _t(spark, sf_dir, "documents")
    fps = _track_cache(
        docs.select(
            "doc_id", F.explode(winnow_fingerprints(F.col("text"))).alias("fp")
        ).persist()
    )
    return dd.rare_key_pairs(fps, "fp", "doc_id", max_df=3, min_shared=2)


_WINNOW_PAIRS_SQL = """
WITH n AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
  FROM documents
), h AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 7
              THEN list_transform(range(1, len(t) - 5),
                   i -> CAST(('0x' || substr(md5(substr(t, i, 7)), 1, 8)) AS BIGINT))
              ELSE CAST([] AS BIGINT[]) END AS hs
  FROM n
), w AS (
  SELECT doc_id,
         CASE WHEN len(hs) >= 4
              THEN list_distinct(list_transform(range(1, len(hs) - 2),
                   j -> list_min(hs[j:j+3])))
              ELSE CAST([] AS BIGINT[]) END AS fps
  FROM h
), e AS (
  SELECT doc_id, unnest(fps) AS fp FROM w
), rare AS (
  SELECT fp FROM e GROUP BY fp HAVING count(*) <= 3
), er AS (
  SELECT e.doc_id, e.fp FROM e JOIN rare USING (fp)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
FROM er a JOIN er b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 2
"""



def docs_lang_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tab via the pivot operator (§2.7 aggregation family): doc
    counts per source × language with an explicit pivot column list —
    explicit values keep the plan a single pass (no extra distinct scan to
    discover them) and pin the output schema for the oracle."""
    docs = _t(spark, sf_dir, "documents")
    langs = ["de", "en", "es", "fr", "zh"]
    return (
        docs.groupBy("source")
        .pivot("lang", langs)
        .agg(F.count(F.lit(1)))
        .na.fill(0, langs)
        .select("source", *[F.col(l).cast("long").alias(f"n_{l}") for l in langs])
    )


_LANG_PIVOT_SQL = """
SELECT source,
       count(*) FILTER (lang = 'de') AS n_de,
       count(*) FILTER (lang = 'en') AS n_en,
       count(*) FILTER (lang = 'es') AS n_es,
       count(*) FILTER (lang = 'fr') AS n_fr,
       count(*) FILTER (lang = 'zh') AS n_zh
FROM documents
GROUP BY source
"""



def docs_lang_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt (unpivot) back to long form: the wide source × language counts
    from the pivot flow into (source, lang, n) rows — the §2.7 reshaping
    pair. Zero-filled cells survive the round trip, so the output is the
    full source × lang grid (the oracle builds the same grid with a cross
    join + left join)."""
    wide = docs_lang_pivot(spark, sf_dir)
    langs = ["de", "en", "es", "fr", "zh"]
    return (
        wide.unpivot(
            "source", [f"n_{l}" for l in langs], "lang", "n"
        )
        .withColumn("lang", F.regexp_replace("lang", "^n_", ""))
        .select("source", "lang", F.col("n").cast("long").alias("n"))
    )


_LANG_UNPIVOT_SQL = """
WITH s AS (SELECT DISTINCT source FROM documents),
l AS (SELECT unnest(['de', 'en', 'es', 'fr', 'zh']) AS lang),
c AS (SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2)
SELECT s.source, l.lang, COALESCE(c.n, 0) AS n
FROM s CROSS JOIN l LEFT JOIN c ON c.source = s.source AND c.lang = l.lang
"""



def pipeline_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-side ops COMPOSED end to end: quality filter (>= 10
    tokens) -> exact dedup (min doc_id per content fingerprint, window on
    fp, no self-join) -> deterministic 90% train split (zero-shuffle md5
    bucket) -> concat-and-chunk packing into 2048-token context windows per
    source shard -> per-pack accounting.

    Two shuffles total: the fingerprint window and the shard window (the
    final groupBy reuses the shard partitioning). The split adds none —
    membership is a projection of doc_id. This is the batch a training
    loader would mount, produced by one declarative plan.
    """
    from pyspark.sql import Window

    from affinity_spark.operators.sampling import pack_sequences, train_split

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", "text", token_count(F.col("text")).alias("n_tokens")
    )
    quality = scored.filter(F.col("n_tokens") >= 10)
    w_fp = Window.partitionBy(doc_fingerprint(F.col("text"))).orderBy("doc_id")
    keepers = (
        quality.withColumn("rn", F.row_number().over(w_fp))
        .filter(F.col("rn") == 1)
        .drop("rn", "text")
    )
    train = train_split(keepers, "doc_id").filter(F.col("split") == "train")
    packed = pack_sequences(train, "source", "doc_id", "n_tokens", 2048)
    return packed.groupBy("source", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("pack_tokens"),
    )


_TRAIN_PIPE_SQL = """
WITH t AS (
  SELECT doc_id, source, text,
         len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> ''))
           AS n_tokens
  FROM documents
),
q AS (SELECT * FROM t WHERE n_tokens >= 10),
k AS (
  SELECT min(doc_id) AS doc_id
  FROM q GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
),
kd AS (SELECT q.doc_id, q.source, q.n_tokens FROM q JOIN k USING (doc_id)),
tr AS (
  SELECT * FROM kd
  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 < 900
),
cum AS (
  SELECT source, n_tokens,
         (CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id ASC
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
          - n_tokens) // 2048 AS pack_id
  FROM tr
)
SELECT source, pack_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
FROM cum
GROUP BY source, pack_id
"""



def emb_near_dup_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-dup dedup (SemDeDup, Abbas et al. 2023): within each
    IVF cell (label), a vector is dropped iff some lower-id vector in the
    cell has cosine >= 0.35 with it; survivors keep the corpus. Candidate
    pairs are cell-confined (Σ|cell|², never n²) and the drop set is one
    distinct + left-anti join."""
    from affinity_spark.operators.sampling import near_dup_survivors

    emb = _t(spark, sf_dir, "embeddings")
    pairs = sim.cosine_join_within(emb, "label", 0.35, "vec_id", "embedding")
    return near_dup_survivors(pairs, emb.select("vec_id", "label"))


_NEAR_DUP_SQL = """
WITH n AS (
  SELECT vec_id, label, embedding,
         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           AS nrm
  FROM embeddings
),
drops AS (
  SELECT DISTINCT b.vec_id
  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE list_sum(list_transform(range(1, len(a.embedding) + 1),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        / (a.nrm * b.nrm) >= 0.35
)
SELECT e.vec_id, e.label
FROM embeddings e
WHERE NOT EXISTS (SELECT 1 FROM drops d WHERE d.vec_id = e.vec_id)
"""


# --------------------------------------------------------------------------
# Graph (SURVEY §2.6 J4)
# --------------------------------------------------------------------------


def graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 connected components by iterative min-label propagation.

    Graph: bipartite customer <-> (nation + 1e6). True components are the
    nation groups, so the oracle is a plain aggregate — the Spark side runs
    the real iterative algorithm and must converge to the same labeling.
    """
    c = _t(spark, sf_dir, "customer")
    edges = c.select(
        F.col("c_custkey").alias("src"),
        (F.col("c_nationkey").cast("long") + F.lit(1_000_000)).alias("dst"),
    )
    return connected_components(edges, "src", "dst", max_iter=8)


_GRAPH_SQL = """
WITH m AS (SELECT c_nationkey, min(c_custkey) AS comp FROM customer GROUP BY c_nationkey)
SELECT c_custkey AS vertex, comp AS component
FROM customer JOIN m USING (c_nationkey)
UNION ALL
SELECT 1000000 + c_nationkey AS vertex, comp AS component FROM m
"""


# --------------------------------------------------------------------------
# TPC-H subquery family (Q8/Q15/Q17/Q18/Q19/Q21/Q22 shapes) — correlated
# scalar subqueries, EXISTS / NOT EXISTS, IN-with-HAVING, disjunctive
# pushdown, CTE + scalar max. Columns the trimmed testdata lacks
# (commit/receipt dates, c_phone, p_container) are substituted with
# shape-preserving predicates; each docstring notes the swap.
# --------------------------------------------------------------------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 6-way star join + per-year ratio of conditional sums
    (NATION_1's share of AMERICA-region ECONOMY revenue, basis points).

    lineitem is the only shuffled input; every dimension broadcasts. The
    share is an exact integer ratio (cents*10000 div cents) — never a
    double division, so the hash is engine-independent.
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), c["c_nationkey"] == n1["n_nationkey"])
        .join(F.broadcast(r), n1["n_regionkey"] == r["r_regionkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n2), s["s_nationkey"] == F.col("sn_key"))
    )
    agg = (
        j.select(
            F.year("o_orderdate").alias("o_year"),
            rev.alias("rev"),
            F.col("supp_nation"),
        )
        .groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_1", F.col("rev")).otherwise(
                    F.lit(0)
                )
            ).alias("nation_cents"),
            F.sum("rev").alias("total_cents"),
        )
    )
    return agg.select(
        "o_year",
        "nation_cents",
        "total_cents",
        F.when(
            F.col("total_cents") != 0,
            F.expr("nation_cents * 10000 div total_cents"),
        ).alias("share_bp"),
    )


_Q8_SQL = """
WITH j AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS rev,
         n2.n_name AS supp_nation
  FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
)
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN rev ELSE 0 END) AS BIGINT)
         AS nation_cents,
       CAST(sum(rev) AS BIGINT) AS total_cents,
       CAST(CASE WHEN sum(rev) <> 0
                 THEN sum(CASE WHEN supp_nation = 'NATION_1' THEN rev ELSE 0 END)
                      * 10000 // sum(rev)
            END AS BIGINT) AS share_bp
FROM j
GROUP BY o_year
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue CTE + scalar-max subquery. The max is a
    1-row broadcast joined back on equality (ties kept, per spec)."""
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "total_rev_cents"
            )
        )
    )
    mx = rev.agg(F.max("total_rev_cents").alias("total_rev_cents"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), "total_rev_cents")
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_rev_cents")
    )


_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_rev_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev_cents
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE total_rev_cents = (SELECT max(total_rev_cents) FROM revenue)
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery — revenue from lineitems
    whose quantity is below 20% of their part's average quantity.

    p_container (absent) → `p_size <= 10`. The correlated avg folds into a
    window over l_partkey AFTER the part filter (per-part avg is invariant
    to a part-level filter), so the whole query is one scan + one shuffle.
    The `qty < 0.2*avg` comparison is exact integers: 5*qty*cnt < sum
    (quantities are whole numbers).
    """
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 10)
    )
    fl = li.join(F.broadcast(p.select("p_partkey")), li["l_partkey"] == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    below = fl.select(
        "l_extendedprice",
        (5 * F.col("l_quantity").cast("long")).alias("qty5"),
        F.sum(F.col("l_quantity").cast("long")).over(w).alias("sum_qty"),
        F.count(F.lit(1)).over(w).alias("cnt_qty"),
    ).filter(F.col("qty5") * F.col("cnt_qty") < F.col("sum_qty"))
    return below.agg(
        F.sum(_cents(F.col("l_extendedprice"))).alias("total_cents")
    ).select("total_cents", F.expr("total_cents div 7").alias("avg_weekly_cents"))


_Q17_SQL = """
WITH fl AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23' AND p_size <= 10
), w AS (
  SELECT l_extendedprice,
         5 * CAST(l_quantity AS BIGINT) AS qty5,
         CAST(sum(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_partkey) AS BIGINT) AS sum_qty,
         count(*) OVER (PARTITION BY l_partkey) AS cnt_qty
  FROM fl
)
SELECT CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) // 7 AS BIGINT) AS avg_weekly_cents
FROM w
WHERE qty5 * cnt_qty < sum_qty
"""


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery over a grouped HAVING (orders whose
    total quantity exceeds 300) re-joined to orders + customer."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(big, o["o_orderkey"] == big["l_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            _cents(F.col("o_totalprice")).alias("total_price_cents"),
            "sum_qty",
        )
    )


_Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_price_cents,
       sum_qty
FROM orders
JOIN (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
) b ON o_orderkey = b.l_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE sum_qty > 300
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs band predicates across a join. Catalyst
    extracts the common join key and pushes the OR-combined residuals to
    both scans. p_container/l_shipmode (absent) → brand/size/qty bands."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).filter(
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "total_cents"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


_Q19_SQL = """
SELECT CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: correlated EXISTS + NOT EXISTS against the same
    fact — a semi-join then an anti-join with inequality residuals.

    commit/receipt dates (absent) → `l_returnflag = 'R'` marks the failed
    line: suppliers who returned a line on a finalized multi-supplier
    order where no co-supplier returned one.
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .join(o.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .drop("o_orderkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    waiting = l1.join(
        l2,
        (l1["l_orderkey"] == l2["l2_orderkey"]) & (l1["l_suppkey"] != l2["l2_suppkey"]),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == l3["l3_orderkey"])
        & (F.col("l_suppkey") != l3["l3_suppkey"]),
        "left_anti",
    )
    return (
        waiting.join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


_Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar AVG subquery + NOT EXISTS anti-join +
    group-by country. c_phone's country code (absent) → c_nationkey. The
    `acctbal > avg(positive acctbal)` compare is exact integer arithmetic:
    cents*count > sum_cents. Every customer in this data has ≥1 order, so
    the NOT EXISTS is scoped to orders from 1999 on (dormant customers) —
    same correlated-anti shape, non-empty answer.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    stats = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_cents(F.col("c_acctbal"))).alias("sum_c"),
        F.count(F.lit(1)).alias("cnt_c"),
    )
    rich = c.crossJoin(F.broadcast(stats)).filter(
        _cents(F.col("c_acctbal")) * F.col("cnt_c") > F.col("sum_c")
    )
    noorders = rich.join(
        o.select("o_custkey"), rich["c_custkey"] == F.col("o_custkey"), "left_anti"
    )
    return noorders.groupBy(F.col("c_nationkey").alias("cntrycode")).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(_cents(F.col("c_acctbal"))).alias("totacctbal_cents"),
    )


_Q22_SQL = """
WITH stats AS (
  SELECT CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_c,
         count(*) AS cnt_c
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS totacctbal_cents
FROM customer, stats
WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * cnt_c > sum_c
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY c_nationkey
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: min-cost supplier per part within a region — the
    correlated MIN subquery. partsupp (absent from this dataset) → supply
    offers derived from lineitem: a (part, supplier) pair's cost is its
    cheapest observed unit price, exact integers (price cents div
    whole-unit quantity, truncating on both engines).

    The correlated min folds into a window over p_partkey; the part filter
    is part-level, so pushing it BEFORE the offer aggregation prunes the
    shuffle without changing the per-part minimum. One lineitem shuffle,
    every dimension broadcast.
    """
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    offers = (
        li.join(
            F.broadcast(p.select("p_partkey", "p_name")),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .select(
            "p_partkey",
            "p_name",
            "l_suppkey",
            _cents(F.col("l_extendedprice")).alias("ep_cents"),
            F.col("l_quantity").cast("long").alias("qty"),
        )
        .select(
            "p_partkey",
            "p_name",
            "l_suppkey",
            F.expr("ep_cents div qty").alias("unit_cents"),
        )
        .groupBy("p_partkey", "p_name", "l_suppkey")
        .agg(F.min("unit_cents").alias("cost_cents"))
    )
    eu = (
        offers.join(F.broadcast(s), offers["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .join(F.broadcast(r), F.col("n_regionkey") == r["r_regionkey"])
        .select("p_partkey", "p_name", "s_name", "n_name", "cost_cents")
    )
    w = Window.partitionBy("p_partkey")
    return (
        eu.withColumn("min_cost", F.min("cost_cents").over(w))
        .filter(F.col("cost_cents") == F.col("min_cost"))
        .select("s_name", "n_name", "p_partkey", "p_name", "cost_cents")
    )


_Q2_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(min(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
                  // CAST(l_quantity AS BIGINT)) AS BIGINT) AS cost_cents
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eu AS (
  SELECT ps.l_partkey, ps.cost_cents, s_name, n_name
  FROM ps JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), w AS (
  SELECT *, min(cost_cents) OVER (PARTITION BY l_partkey) AS min_cost FROM eu
)
SELECT s_name, n_name, p_partkey, p_name, cost_cents
FROM w JOIN part ON l_partkey = p_partkey
WHERE cost_cents = min_cost AND p_size <= 15 AND p_type = 'LARGE'
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for a
    part-name pattern. ps_supplycost (absent) → cost modeled as 10% of the
    part's retail price per unit, all in exact integer cents
    (retail_cents * qty div 10 — truncating division on both engines).

    lineitem ⋈ orders is the single shuffle; part (name-filtered),
    supplier, and nation broadcast.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
    )
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "rev_cents"
            ),
            (
                _cents(F.col("p_retailprice")) * F.col("l_quantity").cast("long")
            ).alias("cost10"),
        )
        .select(
            "nation",
            "o_year",
            (F.col("rev_cents") - F.expr("cost10 div 10")).alias("profit"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("profit").alias("profit_cents"))
    )


_Q9_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
  CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100+0.5) AS BIGINT)
         - CAST(floor(p_retailprice*100+0.5) AS BIGINT)
           * CAST(l_quantity AS BIGINT) // 10) AS BIGINT) AS profit_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, year(o_orderdate)
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value for one nation's suppliers, kept
    when above a fraction of the total — the scalar-aggregate HAVING.
    partsupp value (absent) → sum of observed sale value per part from
    that nation's suppliers. The 0.1% threshold compares exact integers
    (value*1000 > total); the 1-row total broadcasts back.
    """
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    sup = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey"
    )
    val = (
        li.join(F.broadcast(sup), li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_cents(F.col("l_extendedprice"))).alias("value_cents"))
    )
    tot = val.agg(F.sum("value_cents").alias("total_cents"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select("partkey", "value_cents")
    )


_Q11_SQL = """
WITH val AS (
  SELECT l_partkey AS partkey,
         CAST(sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
), tot AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents FROM val)
SELECT partkey, value_cents FROM val, tot WHERE value_cents * 1000 > total_cents
"""


def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority-class conditional counts over late lines.
    l_shipmode/l_receiptdate (absent) → class by l_returnflag, lateness as
    shipped ≥ 60 days after the order date (timestamp interval arithmetic,
    identical on both engines). One lineitem⋈orders shuffle; the
    ship-year conjuncts push to the lineitem scan.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("flag_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


_Q12_SQL = """
SELECT l_returnflag AS flag_class,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
       AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
       AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
"""


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute with a
    NOT-IN supplier exclusion. The partsupp relation (absent) → observed
    (part, supplier) pairs from lineitem; the excluded-supplier subquery
    (spec: complaint comments) → suppliers with negative account balance,
    executed as a broadcast anti-join. count(DISTINCT) dedups pairs, so no
    separate distinct shuffle is needed.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), F.col("l_partkey") == p["p_partkey"])
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
  AND p_size IN (1,4,9,14,19,23,36,45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN-subqueries → semi-join chain. Suppliers
    in a region who, for some name-pattern part, shipped more in 1996 than
    half their all-time quantity for that part (ps_availqty's '> half of
    yearly shipments' test re-based on observed shipments; exact integer
    compare 2*qty_1996 > qty_total). Part filter broadcasts into the
    lineitem aggregation; the qualifying-supplier set broadcasts into a
    semi-join against supplier.
    """
    li = _t(spark, sf_dir, "lineitem")
    pf = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    in96 = (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")
    )
    qty = F.col("l_quantity").cast("long")
    shipped = (
        li.join(F.broadcast(pf), li["l_partkey"] == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in96, qty).otherwise(F.lit(0))).alias("qty_1996"),
            F.sum(qty).alias("qty_total"),
        )
    )
    excess = (
        shipped.filter(
            (F.col("qty_1996") * 2 > F.col("qty_total")) & (F.col("qty_1996") > 0)
        )
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        s.join(F.broadcast(excess), s["s_suppkey"] == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .join(F.broadcast(r), F.col("n_regionkey") == r["r_regionkey"])
        .select("s_name", "n_name")
    )


_Q20_SQL = """
WITH shipped AS (
  SELECT l_suppkey, l_partkey,
    CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_1996,
    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_total
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
  GROUP BY l_suppkey, l_partkey
)
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (SELECT l_suppkey FROM shipped
                    WHERE qty_1996 * 2 > qty_total AND qty_1996 > 0)
"""


def docs_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (64-token windows, 16-token
    overlap) — the retrieval/context-prep splitter run before embedding, and
    the long-document fallback when a doc exceeds the context window.
    Zero shuffles: chunk boundaries are a pure function of each document's
    own token count (map-side posexplode, no global numbering), and the
    chunk fingerprint is md5-derived so any engine reproduces it."""
    from affinity_spark.operators.chunking import chunk_tokens

    docs = _t(spark, sf_dir, "documents")
    return chunk_tokens(docs, "doc_id", "text", chunk_size=64, overlap=16)


# stride = 64 - 16 = 48; n_chunks = max(ceil((n-16)/48), 1) in pure integer
# math; DuckDB list slice is 1-based inclusive and clamps at the list end,
# mirroring Spark's slice(toks, start, 64).
_CHUNK_SQL = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                     x -> x <> '') AS toks
  FROM documents
),
p AS (
  SELECT doc_id, toks, len(toks) AS n,
         greatest((len(toks) - 16 + 47) // 48, 1) AS n_chunks
  FROM t WHERE len(toks) > 0
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(len(toks[1 + i*48 : i*48 + 64]) AS BIGINT) AS chunk_tokens,
       md5(array_to_string(toks[1 + i*48 : i*48 + 64], ' ')) AS chunk_md5
FROM p, unnest(range(0, n_chunks)) AS r(i)
"""


def docs_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase search from a positional inverted index (X1/X2 extended with
    positions): the phrase is itself data-derived — the corpus's most
    frequent bigram (ties broken by bigram text) — so the query is
    regeneration-proof, then matched by aligning per-term posting lists on
    (doc, pos - term_offset). At scale the positional index is persisted
    partitioned by term, so each phrase term is a partition-pruned scan and
    the alignment join is bounded by posting-list sizes, never corpus size.

    Answered ENTIRELY from the materialized positional postings index
    (shared with bm25/tfidf): the top bigram derives from a (doc, pos+1)
    postings self-join and the phrase match from posting-list alignment —
    zero document scans at query time."""
    from affinity_spark.operators.index import phrase_lookup

    idx = _postings(spark, sf_dir)
    top = idx.top_bigram()
    terms = top.select(
        F.split(F.col("phrase"), " ").getItem(0).alias("term_0"),
        F.split(F.col("phrase"), " ").getItem(1).alias("term_1"),
    )
    matches = phrase_lookup(idx.positional(), terms, ["doc_id"])
    return matches.crossJoin(F.broadcast(top)).select(
        "doc_id", "phrase", "n_matches"
    )


_PHRASE_SQL = """
WITH t AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                             x -> x <> '') AS toks
  FROM documents
),
bg AS (
  SELECT toks[i] || ' ' || toks[i+1] AS bg
  FROM t, unnest(range(1, len(toks))) AS r(i)
),
top AS (
  SELECT bg AS phrase FROM bg GROUP BY bg ORDER BY count(*) DESC, bg LIMIT 1
),
m AS (
  SELECT t.doc_id, top.phrase,
         CAST(len(list_filter(range(1, len(t.toks)),
                              i -> t.toks[i] || ' ' || t.toks[i+1] = top.phrase))
              AS BIGINT) AS n_matches
  FROM t CROSS JOIN top
)
SELECT doc_id, phrase, n_matches FROM m WHERE n_matches >= 1
"""


def docs_lm_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity filtering (Wenzek et al. 2020, public): score
    every document against a bigram model trained on the lang='en' reference
    slice, in integer floor-log2 "bits" (length(bin(x))-1 — exact in any
    engine, unlike float logs). High bits-per-bigram ranks out-of-domain /
    low-quality docs for the quality gate. Model tables are vocab-sized and
    broadcast; ONE corpus-sized shuffle (groupBy doc)."""
    from affinity_spark.operators.lm import lm_score_bits, train_bigram_model

    docs = _t(spark, sf_dir, "documents")
    model = train_bigram_model(docs.filter(F.col("lang") == "en"))
    return lm_score_bits(docs, model)


_LM_BITS_SQL = """
WITH t AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                     x -> x <> '') AS toks
  FROM documents
),
db AS (
  SELECT doc_id, lang, toks[i] AS w1, toks[i+1] AS w2
  FROM t, unnest(range(1, len(toks))) AS r(i)
),
c2 AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM db WHERE lang = 'en' GROUP BY 1, 2
),
c1 AS (
  SELECT w1, CAST(sum(c) AS BIGINT) AS c1 FROM c2 GROUP BY 1
),
v AS (SELECT CAST(count(DISTINCT w1) AS BIGINT) AS v FROM c2),
scored AS (
  SELECT db.doc_id,
         (length(bin(COALESCE(c1.c1, 0) + v.v)) - 1)
       - (length(bin(COALESCE(c2.c, 0) + 1)) - 1) AS bits
  FROM db CROSS JOIN v
  LEFT JOIN c2 ON db.w1 = c2.w1 AND db.w2 = c2.w2
  LEFT JOIN c1 ON db.w1 = c1.w1
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(bits) AS BIGINT) AS nll_bits,
       CAST(sum(bits) AS BIGINT) * 100 // CAST(count(*) AS BIGINT)
         AS bits_per_bigram_x100
FROM scored GROUP BY doc_id
"""


def docs_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, public): hashed-unigram
    floor-log2 likelihood ratio between the lang='en' target slice and the
    whole corpus, summed per document — the score used to importance-
    resample pretraining data toward a target domain. md5-derived buckets
    so any engine reproduces the weights; 1024-row model broadcast."""
    from affinity_spark.operators.lm import dsir_weights

    docs = _t(spark, sf_dir, "documents")
    return dsir_weights(docs, F.col("lang") == "en")


_DUCK_DSIR_WTS_CTE = """WITH toks AS (
  SELECT doc_id, lang = 'en' AS is_target,
         CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 1024 AS b
  FROM (
    SELECT doc_id, lang,
           unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                              x -> x <> '')) AS tok
    FROM documents
  )
),
counts AS (
  SELECT b,
         CAST(count(*) AS BIGINT) AS cs,
         CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS ct
  FROM toks GROUP BY b
),
wts AS (
  SELECT toks.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum((length(bin(ct + 1)) - 1) - (length(bin(cs + 1)) - 1)) AS BIGINT)
           AS weight_bits
  FROM toks JOIN counts ON toks.b = counts.b
  GROUP BY toks.doc_id
)"""
# one weight-model definition shared by BOTH dsir oracles so a model fix
# cannot silently diverge them (the _duck_shingles_cte convention)


_DSIR_SQL = _DUCK_DSIR_WTS_CTE + """
SELECT doc_id, n_tokens, weight_bits FROM wts
"""


def docs_gopher_rep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher duplicate-n-gram repetition rules at n=2 (Rae et al. 2021
    §A.1.1): per doc, the top bigram's share and the duplicate-bigram share
    in integer basis points. Complements docs_gopher_rules' token-level
    signals; all map-side (let-bound bigram + distinct arrays, no explode,
    zero shuffle)."""
    from affinity_spark.functions.text import gopher_rep_struct

    docs = _t(spark, sf_dir, "documents")
    rep = docs.select("doc_id", gopher_rep_struct(F.col("text")).alias("r"))
    return rep.select(
        "doc_id", "r.n_bigrams", "r.top_bigram_bp", "r.dup_bigram_bp"
    ).where(F.col("n_bigrams") >= 1)


_GOPHER_REP_SQL = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                     x -> x <> '') AS toks
  FROM documents
),
b AS (
  SELECT doc_id,
         list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS bg
  FROM t WHERE len(toks) >= 2
),
s AS (
  SELECT doc_id,
         CAST(len(bg) AS BIGINT) AS m,
         CAST(len(list_distinct(bg)) AS BIGINT) AS d,
         CAST(list_max(list_transform(list_distinct(bg),
                                      w -> len(list_filter(bg, x -> x = w))))
              AS BIGINT) AS top
  FROM b
)
SELECT doc_id,
       m AS n_bigrams,
       top * 10000 // m AS top_bigram_bp,
       (m - d) * 10000 // m AS dup_bigram_bp
FROM s WHERE m >= 1
"""


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer→supplier purchase graph (edges = distinct
    (custkey, suppkey) pairs through orders⋈lineitem), 3 fixed iterations in
    integer parts-per-million — the rank recurrence is defined in integer
    div so both engines reproduce it bit-for-bit (float PR diverges by
    accumulation order). Extends the J4 iterative family beyond connected
    components; per-iteration cost is edge-sized, lineage cut per round."""
    from affinity_spark.operators.graph import pagerank_ppm

    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    edges = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey").cast("long") + F.lit(1_000_000_000_000)).alias("dst"),
        )
    )
    return pagerank_ppm(edges, iters=3)


_PAGERANK_SQL = """
WITH e AS (
  SELECT DISTINCT o_custkey AS u,
         CAST(l_suppkey AS BIGINT) + 1000000000000 AS v
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY u),
verts AS (SELECT u AS vertex FROM e UNION SELECT v FROM e),
r0 AS (SELECT vertex, CAST(1000000 AS BIGINT) AS r FROM verts),
s1 AS (
  SELECT e.v, CAST(sum(r0.r // deg.outdeg) AS BIGINT) AS in_sum
  FROM e JOIN deg USING (u) JOIN r0 ON r0.vertex = e.u GROUP BY e.v
),
r1 AS (
  SELECT vertex, CAST(150000 + (85 * COALESCE(s1.in_sum, 0)) // 100 AS BIGINT) AS r
  FROM verts LEFT JOIN s1 ON s1.v = verts.vertex
),
s2 AS (
  SELECT e.v, CAST(sum(r1.r // deg.outdeg) AS BIGINT) AS in_sum
  FROM e JOIN deg USING (u) JOIN r1 ON r1.vertex = e.u GROUP BY e.v
),
r2 AS (
  SELECT vertex, CAST(150000 + (85 * COALESCE(s2.in_sum, 0)) // 100 AS BIGINT) AS r
  FROM verts LEFT JOIN s2 ON s2.v = verts.vertex
),
s3 AS (
  SELECT e.v, CAST(sum(r2.r // deg.outdeg) AS BIGINT) AS in_sum
  FROM e JOIN deg USING (u) JOIN r2 ON r2.vertex = e.u GROUP BY e.v
),
r3 AS (
  SELECT vertex, CAST(150000 + (85 * COALESCE(s3.in_sum, 0)) // 100 AS BIGINT) AS r
  FROM verts LEFT JOIN s3 ON s3.v = verts.vertex
)
SELECT vertex, r AS rank_ppm FROM r3
"""


def events_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch of per-user event frequencies: the d×w counter
    table (d=3, w=256) built in ONE pass — each row contributes its d
    (depth, bucket) cells via an inline array, partial aggregation makes
    the shuffle sketch-sized (768 rows) regardless of event volume. The
    integer counter table IS the cross-engine contract; estimates are a
    driver-side min over a key's cells (unit-tested)."""
    from affinity_spark.operators.sketches import cms_sketch

    ev = _t(spark, sf_dir, "events")
    return cms_sketch(ev, F.col("user_id").cast("string"), depth=3, width=256)


_CMS_SQL = """
WITH cells AS (
  SELECT i AS depth,
         CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':' ||
                                  CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 256 AS bucket
  FROM events, unnest(range(0, 3)) AS r(i)
)
SELECT depth, bucket, CAST(count(*) AS BIGINT) AS cnt
FROM cells GROUP BY depth, bucket
"""


def events_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog register table for distinct users (p=8 → 256 buckets):
    60-bit md5 hash split into bucket + rank field, register = max leading-
    zero rank per bucket, computed exactly via length(bin(x))−1. The
    INTEGER register table is the engine contract (merge = elementwise
    max); the float estimate is a driver post-step. Shuffle is 256 rows at
    any data volume — the approx-distinct shape that replaces exact key
    state when it stops fitting."""
    from affinity_spark.operators.sketches import hll_registers

    ev = _t(spark, sf_dir, "events")
    return hll_registers(ev, F.col("user_id").cast("string"), p=8)


_HLL_SQL = """
WITH h AS (
  SELECT CAST(('0x' || substr(md5('0:' || CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hv
  FROM events
),
split AS (
  SELECT hv % 256 AS bucket, hv // 256 AS w FROM h
)
SELECT bucket,
       CAST(max(CASE WHEN w > 0 THEN 52 - (length(bin(w)) - 1)
                     ELSE 53 END) AS BIGINT) AS register
FROM split GROUP BY bucket
"""


def docs_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (τ=2, the XLM-R α=0.5 move): each
    source's token budget ∝ isqrt(its token mass), filled in stable hash
    order — between raw-proportional (giant sources drown the mix) and
    uniform (tiny sources overweighted). All integer math (exact isqrt +
    integer div), so the selection is engine- and rerun-exact."""
    from affinity_spark.operators.sampling import temperature_budget_sample

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    picked = temperature_budget_sample(scored, "doc_id", "source", "n_tokens", 3000)
    return picked.select("doc_id", "source", "n_tokens", "grp_budget", "cum_before")


_TEMP_MIX_SQL = """
WITH t AS (
  SELECT doc_id, source,
         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 2147483648 AS hk
  FROM documents
),
tot AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS tt FROM t GROUP BY source),
sq AS (
  SELECT source, tt,
         CASE WHEN (s0 + 1) * (s0 + 1) <= tt THEN s0 + 1
              WHEN s0 * s0 > tt THEN s0 - 1
              ELSE s0 END AS w
  FROM (SELECT source, tt, CAST(floor(sqrt(tt)) AS BIGINT) AS s0 FROM tot)
),
b AS (
  SELECT source, (3000 * w) // (SELECT CAST(sum(w) AS BIGINT) FROM sq) AS grp_budget
  FROM sq
),
c AS (
  SELECT t.doc_id, t.source, t.n_tokens, b.grp_budget,
         CAST(COALESCE(sum(t.n_tokens) OVER (
           PARTITION BY t.source ORDER BY t.hk, t.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM t JOIN b USING (source)
)
SELECT doc_id, source, n_tokens, grp_budget, cum_before
FROM c WHERE cum_before < grp_budget
"""


def emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: each vector's most
    similar DIFFERENT-label neighbor among its 4-bit LSH bucket candidates —
    the negative the retrieval index would actually confuse it with.
    Candidates are bucket-confined (Σ|bucket|² cross-label pairs, never n²);
    the per-anchor argmax orders by integer (cos_bp DESC, id ASC) so ties
    resolve identically in any engine."""
    emb = _t(spark, sf_dir, "embeddings")
    buckets = sim.lsh_hyperplane_buckets(emb, 64, 4, keep_cols=["label"])
    return sim.hard_negatives(buckets, "bucket", "label")


def _lsh_bucket_expr_n(nbits: int) -> str:
    """DuckDB expression for the nbits-bit hyperplane bucket of `embedding`
    (same deterministic planes as the Spark side)."""
    planes = sim._hyperplanes(64, nbits)  # noqa: SLF001 - shared deterministic constants
    bits = []
    for j, plane in enumerate(planes):
        lit = "[" + ", ".join(f"{float(x):.1f}" for x in plane) + "]"
        bits.append(
            f"(CASE WHEN list_sum(list_transform(range(1, 65), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({lit}::DOUBLE[])[i])) > 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return " + ".join(bits)


def _hard_neg_oracle_sql() -> str:
    return f"""
WITH n AS (
  SELECT vec_id, label, embedding,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
         {_lsh_bucket_expr_n(4)} AS bucket
  FROM embeddings
),
cand AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS id_b,
         CAST(floor(
           list_sum(list_transform(range(1, 65),
                    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
           / (a.nrm * b.nrm) * 10000) AS BIGINT) AS cos_bp
  FROM n a JOIN n b ON a.bucket = b.bucket AND a.label <> b.label
  WHERE a.nrm > 0 AND b.nrm > 0  -- zero-norm vectors have no cosine; Spark side filters NULL cos_bp identically
)
SELECT vec_id, id_b AS hard_neg_id, cos_bp
FROM cand
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos_bp DESC, id_b ASC) = 1
"""


def docs_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum phasing: rank docs by length into 4 ntile phases
    (short→long, the classic length-curriculum) and assign a stable md5
    shard within each phase — the (phase, shard) layout a curriculum
    training loop reads in order. ntile over the total order
    (n_tokens, doc_id) is engine-identical; shard is md5-derived.

    Scale note: ntile is a GLOBAL window — exact equal-count phases
    require a total order by definition. At 100 TB the same layout is
    produced with approximate phase BOUNDARIES (percentile_approx on
    n_tokens, broadcast, map-side compare), trading exact equal counts for
    a boundary-sized slop; this query keeps the exact form because the
    oracle contract is exact ntile."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    nt = token_count(F.col("text")).cast("long")
    w = Window.orderBy(F.col("n_tokens").asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", nt.alias("n_tokens"))
        .withColumn("phase", F.ntile(4).over(w).cast("long"))
        .withColumn(
            "shard",
            (
                F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
                .cast("long") % 8
            ),
        )
    )


_CURRICULUM_SQL = """
SELECT doc_id,
       CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                            x -> x <> '')) AS BIGINT) AS n_tokens,
       CAST(ntile(4) OVER (ORDER BY
            len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                            x -> x <> '')) ASC, doc_id ASC) AS BIGINT) AS phase,
       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8
         AS shard
FROM documents
"""


def nation_account_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join readout: per-nation customer vs supplier account
    totals in cents, nations missing either side zero-filled — the join
    type the registry lacked a driver row for. Both aggregates are
    nation-keyed (tiny) so the full-outer is a coalesced broadcast-side
    merge, not a data-sized shuffle."""
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cents = lambda col: F.floor(F.col(col) * 100 + F.lit(0.5)).cast("long")  # noqa: E731
    ca = c.groupBy("c_nationkey").agg(
        F.sum(cents("c_acctbal")).alias("cust_cents"),
        F.count("*").alias("n_cust"),
    )
    sa = s.groupBy("s_nationkey").agg(
        F.sum(cents("s_acctbal")).alias("supp_cents"),
        F.count("*").alias("n_supp"),
    )
    j = ca.join(sa, ca["c_nationkey"] == sa["s_nationkey"], "full_outer").select(
        F.coalesce(ca["c_nationkey"], sa["s_nationkey"]).alias("nationkey"),
        F.coalesce(F.col("cust_cents"), F.lit(0)).alias("cust_cents"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("supp_cents"), F.lit(0)).alias("supp_cents"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
    )
    return j.join(F.broadcast(n), j["nationkey"] == n["n_nationkey"]).select(
        "n_name", "cust_cents", "n_cust", "supp_cents", "n_supp"
    )


_NATION_BALANCE_SQL = """
WITH ca AS (
  SELECT c_nationkey AS k,
         CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cust_cents,
         CAST(count(*) AS BIGINT) AS n_cust
  FROM customer GROUP BY c_nationkey
),
sa AS (
  SELECT s_nationkey AS k,
         CAST(sum(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS supp_cents,
         CAST(count(*) AS BIGINT) AS n_supp
  FROM supplier GROUP BY s_nationkey
)
SELECT n_name,
       COALESCE(cust_cents, 0) AS cust_cents,
       COALESCE(n_cust, 0) AS n_cust,
       COALESCE(supp_cents, 0) AS supp_cents,
       COALESCE(n_supp, 0) AS n_supp
FROM ca FULL OUTER JOIN sa USING (k)
JOIN nation ON COALESCE(ca.k, sa.k) = n_nationkey
"""


def emb_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: recall@10 of single-probe LSH search versus
    exact brute-force, for 4 query vectors — the measurement that justifies
    (or rejects) an index's scan-fraction/recall trade before it ships.
    Output is integer (query_id, k_lsh, n_hits): k_lsh = LSH candidate
    top-k size (bucket may hold < 10), n_hits = overlap with the exact
    top-10. Both searches rank by (cosine DESC, vec_id ASC); both engines
    fold the dot product in the same order so ranks agree exactly.
    At scale the brute side runs on a SAMPLE of queries only — recall is a
    statistic, the full corpus never needs the exact search."""
    from pyspark.sql import Window

    emb = _t(spark, sf_dir, "embeddings")
    bucketed = sim.lsh_hyperplane_buckets(emb, 64, 8)
    qs = bucketed.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"),
        F.col("bucket").alias("qb"),
        F.col("embedding").alias("qv"),
    )
    cands = bucketed.filter(F.col("vec_id") >= 4)
    scored = cands.crossJoin(F.broadcast(qs)).select(
        "qid",
        "vec_id",
        "bucket",
        "qb",
        sim.cosine_similarity(F.col("embedding"), F.col("qv")).alias("c"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("c").desc(), F.col("vec_id").asc())
    brute_top = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 10)
        .select("qid", "vec_id")
    )
    lsh_top = (
        scored.filter(F.col("bucket") == F.col("qb"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 10)
        .select("qid", "vec_id")
    )
    k_lsh = lsh_top.groupBy("qid").agg(F.count("*").alias("k_lsh"))
    hits = (
        brute_top.join(lsh_top, ["qid", "vec_id"], "inner")
        .groupBy("qid")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        qs.select("qid")
        .join(k_lsh, "qid", "left")
        .join(hits, "qid", "left")
        .select(
            F.col("qid").alias("query_id"),
            F.coalesce(F.col("k_lsh"), F.lit(0)).alias("k_lsh"),
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        )
    )


def _lsh_recall_oracle_sql() -> str:
    return f"""
WITH b AS (
  SELECT vec_id, embedding,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
         {_lsh_bucket_expr_n(8)} AS bucket
  FROM embeddings
),
q AS (SELECT vec_id AS qid, bucket AS qb, embedding AS qv, nrm AS qn
      FROM b WHERE vec_id < 4),
scored AS (
  SELECT q.qid, b.vec_id, b.bucket, q.qb,
         list_sum(list_transform(range(1, 65),
                  i -> CAST(b.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
           / (b.nrm * q.qn) AS c
  FROM b CROSS JOIN q WHERE b.vec_id >= 4
),
brute AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY c DESC, vec_id ASC) AS rn
    FROM scored) WHERE rn <= 10
),
lsht AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY c DESC, vec_id ASC) AS rn
    FROM scored WHERE bucket = qb) WHERE rn <= 10
),
k AS (SELECT qid, CAST(count(*) AS BIGINT) AS k_lsh FROM lsht GROUP BY qid),
h AS (SELECT brute.qid, CAST(count(*) AS BIGINT) AS n_hits
      FROM brute JOIN lsht ON brute.qid = lsht.qid AND brute.vec_id = lsht.vec_id
      GROUP BY brute.qid)
SELECT q.qid AS query_id,
       COALESCE(k.k_lsh, 0) AS k_lsh,
       COALESCE(h.n_hits, 0) AS n_hits
FROM q LEFT JOIN k ON q.qid = k.qid LEFT JOIN h ON q.qid = h.qid
"""


def emb_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN read (the canonical billion-scale shape, Jégou
    et al. 2011): coarse IVF cells prune the scan to the query's nprobe=2
    nearest cells, then PQ asymmetric distance ranks ONLY those candidates
    from their 4-byte codes — the scan never touches a raw vector outside
    the probed cells, and inside them touches codes, not vectors. Composes
    the two operators this repo already certifies separately
    (emb_ivf_search, emb_pq_search); distances in basis points."""
    from affinity_spark.operators.ivf import assign
    from affinity_spark.operators.pq import adc_search, assign_codes

    emb = _t(spark, sf_dir, "embeddings")
    # ONE driver collect: the PQ codebooks are subspace slices of the same
    # 8 lowest-id vectors the IVF seeds are, so the seeds reconstruct by
    # concatenating each row's slices (review finding: three identical
    # 8-row collects = two wasted Spark jobs per run).
    books = _pq_seed_books(emb)
    seeds = [
        [x for s in range(_PQ_M) for x in books[s][r]] for r in range(_PQ_K)
    ]
    query = seeds[0]  # vec_id 0's embedding, excluded from candidates
    qd = sorted(
        (sum((a - b) ** 2 for a, b in zip(query, c)), i) for i, c in enumerate(seeds)
    )
    probe_cells = [i for _, i in qd[:2]]

    assigned = assign(emb.filter(F.col("vec_id") != 0), seeds)
    cands = assigned.filter(F.col("cell").isin(probe_cells))
    codes = assign_codes(cands, books)
    top = adc_search(codes, books, query, 10)
    return top.select(
        "vec_id", F.floor(F.col("adc_dist") * 10000).cast("long").alias("adc_bp")
    )


def _ivfpq_search_sql() -> str:
    dist = (
        "list_sum(list_transform(range(1, 65), "
        "i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(s.cv[i] AS DOUBLE))"
        " * (CAST(e.embedding[i] AS DOUBLE) - CAST(s.cv[i] AS DOUBLE))))"
    )
    qdist = dist.replace("e.embedding", "q.embedding")
    table_ctes = ",\n".join(
        f"""t{s} AS (
  SELECT s.idx, {_pq_dist_sql(s)} AS d
  FROM (SELECT embedding FROM embeddings WHERE vec_id = 0) e CROSS JOIN seeds s
)"""
        for s in range(_PQ_M)
    )
    code_joins = " ".join(f"JOIN t{s} ON t{s}.idx = c{s}.code_{s}" for s in range(_PQ_M))
    cjoins = " ".join(f"JOIN c{s} USING (vec_id)" for s in range(1, _PQ_M))
    adc = " + ".join(f"t{s}.d" for s in range(_PQ_M))
    return f"""
WITH ivfseeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS cv
  FROM embeddings ORDER BY vec_id LIMIT 8
),
{_PQ_SEEDS_CTE},
qcells AS (
  SELECT cell FROM (
    SELECT s.cell, row_number() OVER (ORDER BY {qdist} ASC, s.cell ASC) AS rn
    FROM ivfseeds s CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
  ) WHERE rn <= 2
),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, s.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {dist} ASC, s.cell ASC) AS rn
    FROM embeddings e CROSS JOIN ivfseeds s WHERE e.vec_id <> 0
  ) WHERE rn = 1
),
cand AS (SELECT vec_id FROM assigned WHERE cell IN (SELECT cell FROM qcells)),
{_pq_code_ctes("JOIN cand ON cand.vec_id = e.vec_id")},
{table_ctes}
SELECT c0.vec_id, CAST(floor(({adc}) * 10000) AS BIGINT) AS adc_bp
FROM c0 {cjoins} {code_joins}
ORDER BY ({adc}) ASC, c0.vec_id ASC
LIMIT 10
"""


def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage near-dup tier: 24-char-prefix blocking then exact
    Levenshtein verification in basis points of the longer doc — the
    sequence-preserving near-identity notion the set-based tiers (minhash /
    simhash / winnow) don't measure. Candidates are block-confined
    (Σ|block|², never n²); levenshtein is built-in and character-identical
    on both engines."""
    docs = _t(spark, sf_dir, "documents")
    return dd.edit_distance_pairs(docs, "doc_id", "text", 24, 2000)


_EDIT_DIST_SQL = """
WITH t AS (
  SELECT doc_id,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
  FROM documents
),
b AS (SELECT doc_id, norm, substr(norm, 1, 24) AS blk FROM t WHERE len(norm) > 0),
p AS (
  SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
         CAST(levenshtein(a.norm, b2.norm) AS BIGINT) AS lev,
         CAST(greatest(len(a.norm), len(b2.norm)) AS BIGINT) AS mx
  FROM b a JOIN b b2 ON a.blk = b2.blk AND a.doc_id < b2.doc_id
)
SELECT id_a, id_b, lev, (lev * 10000) // mx AS lev_bp
FROM p WHERE (lev * 10000) // mx <= 2000
"""


def events_hll_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped HLL: distinct-user register tables PER EVENT TYPE — the
    "distinct per tenant/day/type" readout at sketch cost: the shuffle is
    groups × 256 rows at any event volume, and per-type estimates are a
    driver post-step over each type's registers. Register state is
    engine-exact (shiftright rank field, length(bin)−1)."""
    from affinity_spark.operators.sketches import hll_registers_by_group

    ev = _t(spark, sf_dir, "events")
    return hll_registers_by_group(
        ev, "event_type", F.col("user_id").cast("string"), p=8
    )


_HLL_GROUP_SQL = """
WITH h AS (
  SELECT event_type,
         CAST(('0x' || substr(md5('0:' || CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hv
  FROM events
),
split AS (
  SELECT event_type, hv % 256 AS bucket, hv // 256 AS w FROM h
)
SELECT event_type, bucket,
       CAST(max(CASE WHEN w > 0 THEN 52 - (length(bin(w)) - 1)
                     ELSE 53 END) AS BIGINT) AS register
FROM split GROUP BY event_type, bucket
"""


def orders_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over orders: not-null / set-membership
    / range rules compiled to ONE conditional-sum aggregate, key-uniqueness
    as one grouped pass, lineitem→orders referential integrity as one
    anti-join — the single-pass pre-publish report (deequ/Delta-constraints
    capability). Output is one constant-sized row at any table size; a
    nonzero column is a blocked publish (assert_clean)."""
    from affinity_spark.operators import constraints as C

    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    rules = [
        C.not_null("o_custkey"),
        C.in_set("o_orderstatus", ["O", "F", "P"]),
        C.in_range("o_totalprice", 0.0, 1_000_000.0),
        C.matches("o_orderpriority", r"^[1-5]-"),
    ]
    counts = C.violation_counts(o, rules)
    dups = C.duplicate_key_count(o, ["o_orderkey"])
    orphans = C.orphan_count(
        l.select("l_orderkey"), o.select("o_orderkey"), [("l_orderkey", "o_orderkey")]
    )
    row = counts.crossJoin(dups).crossJoin(orphans)
    return row.select(
        F.col("not_null(o_custkey)").alias("null_custkey"),
        F.col("in_set(o_orderstatus)").alias("bad_status"),
        F.col("in_range(o_totalprice)").alias("bad_price"),
        F.col("matches(o_orderpriority)").alias("bad_priority"),
        "duplicate_rows",
        "orphan_rows",
    )


_ORDERS_QUALITY_SQL = """
WITH counts AS (
  SELECT
    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') OR o_orderstatus IS NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS bad_status,
    CAST(sum(CASE WHEN o_totalprice NOT BETWEEN 0.0 AND 1000000.0
                   OR o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS bad_price,
    CAST(sum(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-')
                   OR o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS bad_priority
  FROM orders
),
dups AS (
  SELECT CAST(sum(n - 1) AS BIGINT) AS duplicate_rows
  FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey)
),
orphans AS (
  SELECT CAST(count(*) AS BIGINT) AS orphan_rows
  FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
)
SELECT null_custkey, bad_status, bad_price, bad_priority, duplicate_rows, orphan_rows
FROM counts, dups, orphans
"""


def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST outlier counts per event type: median / MAD (median
    absolute deviation) instead of mean / sigma — the 3-sigma test
    (`events_value_outliers`) is itself dragged by the outliers it hunts
    (one 1e6 value inflates sigma enough to hide real anomalies), while
    the median/MAD breakdown point is 50%. Flag: |x − med| > 3·1.4826·MAD
    evaluated in PURE INTEGER cents (|c−med|·10000 > 44478·mad — the
    Gaussian consistency constant as a fixed-point ratio), medians as
    EXACT lower-median selection (the smallest value whose cumulative
    count reaches (n+1) div 2 — a data value, never interpolated, so
    any engine selects the identical one).

    Plan for LOW-CARDINALITY group keys (the 100 TB trap): a naive
    row-rank window partitioned by event_type serializes ALL events of a
    type through one task. Here the events collapse to a per-(type,
    cents) HISTOGRAM first (map-side combine; the shuffle key is
    type x cents — well distributed), and every window/median step runs
    over histogram-sized data (distinct cents per type, bounded by the
    value domain regardless of row count). The oracle derives the same
    medians by row-level rank selection — two independent derivations
    agreeing on the exact value."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    # the histogram feeds counts + median + deviation branches; persist so
    # the event scan and histogram shuffle run once (dual-consumer trap)
    h = _track_cache(
        ev.select("event_type", cents.alias("c"))
        .groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    counts = h.groupBy("event_type").agg(F.sum("cnt").alias("n"))

    def hist_median(hist: DataFrame, val_col: str) -> DataFrame:
        w = (
            Window.partitionBy("event_type")
            .orderBy(F.asc(val_col))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            hist.withColumn("_cum", F.sum("cnt").over(w))
            .join(F.broadcast(counts), "event_type")
            .filter(F.col("_cum") >= F.expr("(n + 1) div 2"))
            .groupBy("event_type")
            .agg(F.min(val_col).alias(f"med_{val_col}"))
        )

    med = hist_median(h, "c").withColumnRenamed("med_c", "med_cents")
    devh = _track_cache(
        h.join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            F.abs(F.col("c") - F.col("med_cents")).alias("ad"),
            "cnt",
        )
        .groupBy("event_type", "ad")
        .agg(F.sum("cnt").alias("cnt"))
        .persist()
    )
    mad = hist_median(devh, "ad").withColumnRenamed("med_ad", "mad_cents")
    return (
        devh.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum("cnt").alias("n_values"),
            F.first("med_cents").alias("med_cents"),
            F.first("mad_cents").alias("mad_cents"),
            F.sum(
                F.when(
                    F.col("ad") * 10000 > F.lit(44478) * F.col("mad_cents"),
                    F.col("cnt"),
                ).otherwise(F.lit(0))
            ).alias("n_outliers"),
        )
    )


_MAD_OUTLIERS_SQL = """
WITH t AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c, event_id
  FROM events
),
cn AS (SELECT event_type, count(*) AS n FROM t GROUP BY event_type),
r1 AS (
  SELECT t.event_type, c,
         row_number() OVER (PARTITION BY t.event_type
                            ORDER BY c ASC, event_id ASC) AS rn, n
  FROM t JOIN cn USING (event_type)
),
med AS (SELECT event_type, c AS med_cents FROM r1 WHERE rn = (n + 1) // 2),
dev AS (
  SELECT t.event_type, t.c, t.event_id, m.med_cents,
         abs(t.c - m.med_cents) AS ad
  FROM t JOIN med m USING (event_type)
),
r2 AS (
  SELECT dev.event_type, ad,
         row_number() OVER (PARTITION BY dev.event_type
                            ORDER BY ad ASC, event_id ASC) AS rn, n
  FROM dev JOIN cn USING (event_type)
),
mad AS (SELECT event_type, ad AS mad_cents FROM r2 WHERE rn = (n + 1) // 2)
SELECT d.event_type,
       CAST(count(*) AS BIGINT) AS n_values,
       CAST(min(d.med_cents) AS BIGINT) AS med_cents,
       CAST(min(m.mad_cents) AS BIGINT) AS mad_cents,
       CAST(sum(CASE WHEN d.ad * 10000 > 44478 * m.mad_cents
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
"""


def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-sigma outlier flags per event type with EXACT integer math: the
    test |v−μ| > 3σ is evaluated as (n·v − S1)² > 9·(n·S2 − S1²) over
    integer cents (both sides × n²), in decimal(38) so no float enters the
    comparison — any engine flags the identical rows. Plan: one grouped
    pass for (n, S1, S2), tiny stats broadcast back, map-side flag, count.
    The anomaly-detection readout a metrics pipeline runs per window."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    t = ev.select("event_type", cents.alias("c"))
    # accumulate IN decimal — a long sum of c*c overflows ANSI-fatally near
    # 1e5 rows of 1e7-cent values while the oracle's HUGEINT does not
    c_dec = F.col("c").cast("decimal(38,0)")
    stats = t.groupBy("event_type").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum(c_dec).cast("decimal(38,0)").alias("s1"),
        F.sum(c_dec * F.col("c")).cast("decimal(38,0)").alias("s2"),
    )
    j = t.join(F.broadcast(stats), "event_type")
    lhs = (F.col("n") * F.col("c").cast("decimal(38,0)") - F.col("s1"))
    flagged = j.select(
        "event_type",
        F.when(
            (lhs * lhs) > F.lit(9).cast("decimal(38,0)")
            * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")),
            1,
        )
        .otherwise(0)
        .alias("is_out"),
    )
    return flagged.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("is_out").cast("long").alias("n_outliers"),
    )


_OUTLIER_SQL = """
WITH t AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS HUGEINT) AS c
  FROM events
),
stats AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(c) AS HUGEINT) AS s1,
         CAST(sum(c * c) AS HUGEINT) AS s2
  FROM t GROUP BY event_type
)
SELECT t.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN (n * c - s1) * (n * c - s1) > 9 * (n * s2 - s1 * s1)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM t JOIN stats USING (event_type)
GROUP BY t.event_type
"""


def docs_bloom_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom membership bitmap over document content fingerprints, exported
    as (word_idx, bits) rows — the "have we trained on this doc" artifact a
    DOWNSTREAM pipeline probes without rescanning this corpus. bit_or per
    63-bit word is associative/mergeable, so the shuffle is bitmap-sized at
    any corpus size and bitmaps from different runs OR together."""
    from affinity_spark.operators.sketches import bloom_bitmap

    docs = _t(spark, sf_dir, "documents")
    return bloom_bitmap(docs, doc_fingerprint(F.col("text")), 4096, 3)


_BLOOM_SQL = """
WITH k AS (
  SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
  FROM documents
),
pos AS (
  SELECT CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || fp), 1, 8))
              AS BIGINT) % 4096 AS p
  FROM k, unnest(range(0, 3)) AS r(i)
)
SELECT p // 63 AS word_idx,
       CAST(bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INT)) AS BIGINT) AS bits
FROM pos GROUP BY 1
"""


def docs_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass corpus health report per language: doc count, token mass,
    mean tokens (x100 integer), and exact-duplicate doc count (docs beyond
    the first per content fingerprint) — the summary a corpus owner reads
    before any training run. Token stats fold into one aggregate; the dup
    count is one fingerprint-grouped pass joined back at language grain."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "lang",
        token_count(F.col("text")).cast("long").alias("nt"),
        doc_fingerprint(F.col("text")).alias("fp"),
    )
    stats = base.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("total_tokens"),
    )
    dups = (
        base.groupBy("lang", "fp")
        .agg(F.count("*").alias("_n"))
        .groupBy("lang")
        .agg(F.sum(F.col("_n") - 1).cast("long").alias("dup_docs"))
    )
    return (
        stats.join(dups, "lang")
        .select(
            "lang",
            "n_docs",
            "total_tokens",
            F.expr("(total_tokens * 100) div n_docs").alias("mean_tokens_x100"),
            "dup_docs",
        )
    )


_CORPUS_REPORT_SQL = """
WITH base AS (
  SELECT lang,
         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS nt,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
  FROM documents
),
stats AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(nt) AS BIGINT) AS total_tokens
  FROM base GROUP BY lang
),
dups AS (
  SELECT lang, CAST(sum(n - 1) AS BIGINT) AS dup_docs
  FROM (SELECT lang, fp, count(*) AS n FROM base GROUP BY lang, fp)
  GROUP BY lang
)
SELECT lang, n_docs, total_tokens,
       (total_tokens * 100) // n_docs AS mean_tokens_x100,
       dup_docs
FROM stats JOIN dups USING (lang)
"""


def events_daily_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users: exact per-day distinct user counts — the DAU
    readout (the HLL variant `events_hll_by_type` is the sketch form for
    when exact per-key state stops fitting). Dates emitted as strings per
    the repo's timestamp-hash rule."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("long").alias("dau"))
    )


_DAU_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS dau
FROM events GROUP BY 1
"""


def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS through the SQL surface (rollup/cube's general form,
    and the demonstration that every registered table is queryable with
    plain ANSI SQL via tables.register_views): status-level, priority-
    level, and grand-total aggregates in ONE pass — the single-scan
    multi-grain aggregation that would otherwise be three scans unioned."""
    from affinity_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS total_cents
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


_GROUPING_SETS_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# --------------------------------------------------------------------------
# contract surface
# --------------------------------------------------------------------------




def docs_repeated_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup signal (Lee et al. 2022, public) with
    winnowing-anchored windows (``dedup.repeated_windows``): every 40-char
    gram hashed, each 20-gram window keeps its min (MOSS selection), so
    any cross-doc verbatim run >= 59 chars yields a shared fingerprint
    REGARDLESS of the run's byte offset in either doc — the phase
    misalignment a strided position sample silently misses.

    Scale shape: single-expression map-side gram hashing + winnow select
    over the let-bound char split, then ONE hash aggregate on the 8-byte
    fingerprint (~2/21 of gram count). No joins, no candidate pairs."""
    docs = _t(spark, sf_dir, "documents")
    return dd.repeated_windows(docs, "doc_id", "text", win=40, stride=20)


_REPEATED_WINDOWS_SQL = r"""
WITH nn AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
  FROM documents
), h AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 40
              THEN list_transform(range(1, len(t) - 38),
                   i -> CAST(('0x' || substr(md5(substr(t, CAST(i AS INT), 40)), 1, 8)) AS BIGINT))
              ELSE CAST([] AS BIGINT[]) END AS hs
  FROM nn
), w AS (
  SELECT doc_id,
         CASE WHEN len(hs) >= 20 AND len(t) >= 59
              THEN list_distinct(list_transform(range(1, len(hs) - 18),
                   j -> list_min(hs[CAST(j AS INT):CAST(j AS INT)+19])))
              ELSE CAST([] AS BIGINT[]) END AS fps
  FROM h JOIN nn USING (doc_id)
), f AS (SELECT doc_id, unnest(fps) AS win_hash FROM w)
SELECT win_hash, count(DISTINCT doc_id) AS n_docs
FROM f GROUP BY win_hash HAVING count(DISTINCT doc_id) >= 2
"""


def docs_tfidf_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 most similar document PAIRS by sparse TF-IDF dot product —
    doc-to-doc similarity through the inverted postings index
    (``operators/ranking.py::tfidf_pairs``), the retrieval-side complement
    of BM25's query-to-doc scoring.

    Integer weighting w = tf * floor_log2(N div df) is engine-exact; terms
    with df > 100 are dropped (posting-list cap bounding the self-join at
    max_df * total_postings) and corpus-majority terms get idf 0 — the
    integer idf IS the stopword cut. TakeOrderedAndProject finishes.

    Terms are word TRIGRAMS: the synthetic corpus's ~31-word unigram
    vocabulary saturates at scale (every word in most docs -> idf 0
    corpus-wide, an empty result at sf0.1), while trigram df shrinks
    geometrically and stays discriminative at every sf.

    Reads the MATERIALIZED postings index (built once per process, shared
    with bm25/phrase): zero corpus re-tokenization at query time - the
    maintained-index shape of the reference's X1/X2
    (``KVStoreLocal.scala:195-248``)."""
    from affinity_spark.operators.ranking import tfidf_pairs_postings

    return tfidf_pairs_postings(
        _postings(spark, sf_dir), n=3, max_df=100, k=50
    )


_TFIDF_PAIRS_SQL = r"""
WITH words AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), y -> y <> '') AS ws
  FROM documents
),
toks AS (
  SELECT doc_id, ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT) + 1] || ' ' || ws[CAST(i AS INT) + 2] AS term
  FROM words, LATERAL unnest(range(1, greatest(len(ws) - 2, 0) + 1)) AS u(i)
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
nn AS (SELECT count(*) AS n FROM documents),
w AS (
  SELECT doc_id, term, CAST(tf * (length(bin(n // df)) - 1) AS BIGINT) AS w
  FROM tf JOIN dfq USING (term), nn
  WHERE df <= 100 AND (length(bin(n // df)) - 1) > 0
),
dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(sum(a.w * b.w) AS BIGINT) AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, dot FROM dots ORDER BY dot DESC, id_a, id_b LIMIT 50
"""


def events_dd_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable log-linear quantile sketch (DDSketch family, Masson et
    al. 2019) completing the sketch set: CMS = frequency, HLL = distinct,
    bloom = membership, DD = quantiles. Octave floor_log2 buckets with 8
    linear sub-buckets (relative error <= 12.5%), counts mergeable by
    addition; estimates are first-bucket-at-rank lower bounds — all
    integer arithmetic, so the oracle reproduces them bit-for-bit.

    Scale shape: one hash aggregate on (event_type, bucket) — the shuffle
    carries at most keys x 512 rows regardless of input size — then a
    window over the sketch itself (sketch-sized, not data-sized)."""
    from affinity_spark.operators.sketches import dd_quantiles, dd_sketch

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    return dd_quantiles(dd_sketch(ev, ["event_type"], "cents"), ["event_type"])


_DD_QUANTILES_SQL = r"""
WITH v AS (SELECT event_type, greatest(CAST(floor("value" * 100 + 0.5) AS BIGINT), 1) AS v FROM events),
b AS (
  SELECT event_type,
         (length(bin(v)) - 1) * 8
         + ((v - (1::BIGINT << (length(bin(v)) - 1))) * 8) // (1::BIGINT << (length(bin(v)) - 1)) AS bucket
  FROM v
),
s AS (SELECT event_type, bucket, count(*) AS n FROM b GROUP BY 1, 2),
c AS (
  SELECT event_type, bucket, n,
         CAST(sum(n) OVER (PARTITION BY event_type ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot,
         (1::BIGINT << CAST(bucket // 8 AS INT)) AS pw
  FROM s
),
l AS (SELECT *, pw + ((bucket % 8) * pw) // 8 AS lo FROM c)
SELECT event_type, CAST(max(tot) AS BIGINT) AS n,
       CAST(min(CASE WHEN cum >= (tot - 1) * 50 // 100 + 1 THEN lo END) AS BIGINT) AS p50_est,
       CAST(min(CASE WHEN cum >= (tot - 1) * 90 // 100 + 1 THEN lo END) AS BIGINT) AS p90_est,
       CAST(min(CASE WHEN cum >= (tot - 1) * 99 // 100 + 1 THEN lo END) AS BIGINT) AS p99_est
FROM l GROUP BY event_type
"""




def events_kmv_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (theta) sketch SET ALGEBRA over per-event-type distinct users:
    for every unordered pair of event types, the estimated distinct-user
    count of each side, of their UNION (merged from the two k=64 sketches
    alone — mergeability, no raw re-read), and of their INTERSECTION
    (inclusion-exclusion) — the set-operation questions HLL registers
    cannot answer (`events_hll_by_type` gives per-group cardinality only;
    audience-overlap needs intersections). Exact union/intersection
    columns ride along, so the sketch error is VISIBLE in the result
    (the accuracy-discipline pattern of ``dedup_lsh_recall``).

    Plan: sketches are built with a WindowGroupLimit bounded top-k (no
    group's hash set is buffered), the pair frame is sketch-count sized
    (|types|² rows of k-length arrays — a broadcast nested loop over a
    tiny frame), and the exact columns cost one (type,user) distinct +
    a user-keyed self-join, dropped in a deployment once the estimates
    are trusted. All arithmetic integer; md5-derived hashes make the
    sketch state bit-identical in DuckDB."""
    from affinity_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
        kmv_union,
    )

    k = 64
    ev = _t(spark, sf_dir, "events")
    # ONE (type, user) distinct feeds all three consumers (sketch, sizes,
    # intersection self-join) — persisted so the events scan + distinct
    # shuffle run once, not per branch (the dual-consumer recompute trap)
    tu = _track_cache(
        ev.select("event_type", "user_id").distinct().persist()
    )
    sk = kmv_sketch(tu, ["event_type"], F.col("user_id").cast("string"), k)
    a = sk.select(F.col("event_type").alias("type_a"), F.col("kmv").alias("_ka"))
    b = sk.select(F.col("event_type").alias("type_b"), F.col("kmv").alias("_kb"))
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    est = pairs.select(
        "type_a",
        "type_b",
        kmv_estimate(F.col("_ka"), k).alias("est_a"),
        kmv_estimate(F.col("_kb"), k).alias("est_b"),
        kmv_estimate(kmv_union(F.col("_ka"), F.col("_kb"), k), k).alias(
            "est_union"
        ),
    ).withColumn(
        "est_intersect",
        F.greatest(
            F.lit(0).cast("long"),
            F.col("est_a") + F.col("est_b") - F.col("est_union"),
        ),
    )
    sizes = tu.groupBy("event_type").agg(F.count(F.lit(1)).alias("_n"))
    ia = tu.select(F.col("event_type").alias("type_a"), "user_id")
    ib = tu.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        ia.join(ib, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("_xi"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("_n").alias("_nb"))
    return (
        est.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .join(F.broadcast(inter), ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            "est_a",
            "est_b",
            "est_union",
            "est_intersect",
            (F.col("_na") + F.col("_nb") - F.coalesce("_xi", F.lit(0)))
            .cast("long")
            .alias("exact_union"),
            F.coalesce("_xi", F.lit(0)).cast("long").alias("exact_intersect"),
        )
    )


_KMV_THETA_SQL = """
WITH tu AS (SELECT DISTINCT event_type AS g, user_id AS u FROM events),
dh AS (
  SELECT DISTINCT g,
         CAST(('0x' || substr(md5('0:' || CAST(u AS VARCHAR)), 1, 8)) AS BIGINT) AS h
  FROM tu
),
rk AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM dh),
sk AS (SELECT g, list_sort(list(h)) AS kmv FROM rk WHERE rn <= 64 GROUP BY g),
pr AS (
  SELECT a.g AS type_a, b.g AS type_b, a.kmv AS ka, b.kmv AS kb,
         (list_sort(list_distinct(a.kmv || b.kmv)))[1:64] AS km
  FROM sk a JOIN sk b ON a.g < b.g
),
est AS (
  SELECT type_a, type_b,
    CAST(CASE WHEN len(ka) < 64 THEN len(ka)
              ELSE (63 * 4294967296) // greatest(ka[64], 1) END AS BIGINT) AS est_a,
    CAST(CASE WHEN len(kb) < 64 THEN len(kb)
              ELSE (63 * 4294967296) // greatest(kb[64], 1) END AS BIGINT) AS est_b,
    CAST(CASE WHEN len(km) < 64 THEN len(km)
              ELSE (63 * 4294967296) // greatest(km[64], 1) END AS BIGINT) AS est_union
  FROM pr
),
sizes AS (SELECT g, count(*) AS n FROM tu GROUP BY g),
inter AS (
  SELECT a.g AS type_a, b.g AS type_b, count(*) AS xi
  FROM tu a JOIN tu b ON a.u = b.u AND a.g < b.g
  GROUP BY 1, 2
)
SELECT e.type_a, e.type_b, est_a, est_b, est_union,
       CAST(greatest(0, est_a + est_b - est_union) AS BIGINT) AS est_intersect,
       CAST(sa.n + sb.n - coalesce(xi, 0) AS BIGINT) AS exact_union,
       CAST(coalesce(xi, 0) AS BIGINT) AS exact_intersect
FROM est e
JOIN sizes sa ON sa.g = e.type_a
JOIN sizes sb ON sb.g = e.type_b
LEFT JOIN inter i ON i.type_a = e.type_a AND i.type_b = e.type_b
"""


def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (keys with count > N/(k+1), k=10) via two-pass
    Misra-Gries (``operators/sketches.py::heavy_hitters``): per-partition
    k-counter summaries (bounded memory regardless of partition size),
    provably-superset candidate union, broadcast-semi-join exact recount.
    The point is the PLAN: at 100 TB with billions of distinct keys,
    groupBy-count shuffles the whole key space to answer a question about
    <= k keys — here the shuffle carries only candidates. The oracle
    computes the same answer the naive way, certifying the two-pass
    plan's exactness guarantee (no false negatives, recount removes
    false positives)."""
    from affinity_spark.operators.sketches import heavy_hitters

    ev = _t(spark, sf_dir, "events")
    return heavy_hitters(ev, "event_type", k=10).withColumnRenamed(
        "event_type", "key"
    )


_HEAVY_HITTERS_SQL = """
WITH nn AS (SELECT count(*) AS n FROM events)
SELECT event_type AS key, count(*) AS n_occ
FROM events, nn
GROUP BY event_type, n
HAVING count(*) * 11 > n
"""




def dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured RECALL of the MinHash-LSH candidate generator against
    exact ground truth — the quality-evaluation discipline every
    approximate dedup deployment needs (the banding config promises ~90%
    candidate probability at J=0.5; this MEASURES it on the corpus, the
    same move as emb_lsh_recall for ANN).

    Truth = all pairs with exact n-gram Jaccard >= 1/2 (inverted-index
    verifier tier); candidates = the zero-shuffle banded LSH tier. One
    row: pair counts + recall in basis points (integer division; empty
    truth reads 10000 by convention)."""
    docs = _t(spark, sf_dir, "documents")
    arrs, sh = dd.shingles_shared(docs, "doc_id", "text", 3)
    sa = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    exact_pairs = (
        sa.join(sb, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    truth = dd.jaccard_verify_arrays(exact_pairs, arrs, "doc_id", 1, 2).select(
        "id_a", "id_b"
    )
    cand = dd.lsh_candidate_pairs(dd.lsh_bands_mapside(arrs, "doc_id"), "doc_id")
    hit = truth.join(cand, ["id_a", "id_b"], "left_semi")
    t = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    h = hit.agg(F.count(F.lit(1)).alias("n_hit"))
    c = cand.agg(F.count(F.lit(1)).alias("n_cand"))
    return (
        t.crossJoin(h)
        .crossJoin(c)
        .select(
            "n_truth",
            "n_cand",
            "n_hit",
            F.when(F.col("n_truth") == 0, F.lit(10000).cast("long"))
            .otherwise(F.expr("(n_hit * 10000) div n_truth"))
            .alias("recall_bp"),
        )
    )


def _dedup_lsh_recall_oracle_sql() -> str:
    return f"""
WITH {_duck_shingles_cte(3)},
{_duck_lsh_cand_cte()},
exact_cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM h a JOIN h b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM h GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, count(*) AS n_common
  FROM exact_cand c
  JOIN h x ON x.doc_id = c.id_a
  JOIN h y ON y.doc_id = c.id_b AND y.shingle = x.shingle
  GROUP BY c.id_a, c.id_b
),
truth AS (
  SELECT id_a, id_b FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE 2 * n_common >= (sa.n + sb.n - n_common)
),
counts AS (
  SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
         CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_cand,
         CAST((SELECT count(*) FROM truth t
               WHERE EXISTS (SELECT 1 FROM cand c
                             WHERE c.id_a = t.id_a AND c.id_b = t.id_b))
              AS BIGINT) AS n_hit
)
SELECT n_truth, n_cand, n_hit,
       CASE WHEN n_truth = 0 THEN 10000
            ELSE (n_hit * 10000) // n_truth END AS recall_bp
FROM counts
"""


def emb_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension scalar int8 quantization
    (``similarity.scalar_quantize_int8``) — the 4x compressor vector
    deployments apply before or instead of PQ — digested per vector:
    md5 of the dim-ordered code string, code sum, and total integer
    reconstruction error. Fixed-point micros + non-negative integer
    division everywhere, so the oracle reproduces codes bit-for-bit.

    Scale shape: one posexplode, a 64-row range broadcast, map-side
    codes, one groupBy(vec) digest aggregate."""
    emb = _t(spark, sf_dir, "embeddings")
    q = sim.scalar_quantize_int8(emb)
    ordered = F.array_sort(F.collect_list(F.struct("dim", "code")))
    return q.groupBy("vec_id").agg(
        F.md5(
            F.array_join(
                F.transform(ordered, lambda s: s["code"].cast("string")), ","
            )
        ).alias("codes_md5"),
        F.sum("code").alias("code_sum"),
        F.sum("abs_err").alias("sum_abs_err"),
    )


_INT8_QUANT_SQL = """
WITH vals AS (
  SELECT vec_id, i AS dim,
         CAST(floor(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) * 1000000) AS BIGINT) AS vi
  FROM embeddings, LATERAL unnest(range(0, len(embedding))) AS u(i)
),
ranges AS (SELECT dim, min(vi) AS mn, max(vi) AS mx FROM vals GROUP BY dim),
q AS (
  SELECT vec_id, v.dim, vi,
         CASE WHEN mx > mn THEN ((vi - mn) * 255) // (mx - mn) ELSE 0 END AS code,
         mn, mx
  FROM vals v JOIN ranges r ON v.dim = r.dim
),
e AS (
  SELECT vec_id, dim, code,
         abs(vi - (mn + (code * (mx - mn)) // 255)) AS abs_err
  FROM q
)
SELECT vec_id,
       md5(string_agg(CAST(code AS VARCHAR), ',' ORDER BY dim)) AS codes_md5,
       CAST(sum(code) AS BIGINT) AS code_sum,
       CAST(sum(abs_err) AS BIGINT) AS sum_abs_err
FROM e GROUP BY vec_id
"""




def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment pairs (|A∩B|/|A| per direction, in
    basis points, threshold 20%) — catches a doc EMBEDDED in a larger one
    where symmetric Jaccard stays low because the union is dominated by
    the big doc (Broder containment; the quote/concatenation case every
    corpus dedup eventually needs). Candidates via the inverted shingle
    index (verifier tier; the scale path feeds LSH candidates instead).
    Integer basis points on both sides of the comparison."""
    docs = _t(spark, sf_dir, "documents")
    return dd.containment_pairs(docs, "doc_id", "text", 3, 2000)


def _containment_oracle_sql() -> str:
    return f"""
WITH {_duck_shingles_cte(3)},
sizes AS (SELECT doc_id, count(*) AS n FROM h GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM h a JOIN h b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_common,
       (n_common * 10000) // sa.n AS cont_a_bp,
       (n_common * 10000) // sb.n AS cont_b_bp
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE (n_common * 10000) // sa.n >= 2000 OR (n_common * 10000) // sb.n >= 2000
"""




def docs_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance RESAMPLING — the selection step that consumes
    ``docs_dsir_weights`` (Xie et al. 2023): per source, take docs in
    descending weight order until a 600-token budget fills (exclusive
    running sum, the ``token_budget_sample`` stop rule), i.e. "the most
    target-like data from each source, budgeted in tokens".

    Deterministic: (weight_bits DESC, doc_id) is a total order and the
    budget test is integer. Scale shape: the window partitions by source
    (the 100 TB partition column); for a GLOBAL budget use the
    ``token_budget_sample_scalable`` two-phase bucket cutoff instead."""
    from affinity_spark.operators.lm import dsir_weights
    from affinity_spark.operators.sampling import token_budget_sample

    docs = _t(spark, sf_dir, "documents")
    wts = dsir_weights(docs, F.col("lang") == "en")
    j = wts.join(docs.select("doc_id", "source"), "doc_id")
    return token_budget_sample(
        j, "doc_id", "source", "n_tokens", 600,
        order_by=[F.col("weight_bits").desc(), F.col("doc_id").asc()],
    ).select("doc_id", "source", "weight_bits", "n_tokens", "cum_before")


_DSIR_SAMPLE_SQL = _DUCK_DSIR_WTS_CTE + """,
j AS (
  SELECT w.doc_id, d.source, w.weight_bits, w.n_tokens
  FROM wts w JOIN documents d USING (doc_id)
),
c AS (
  SELECT *,
         CAST(coalesce(sum(n_tokens) OVER (
           PARTITION BY source ORDER BY weight_bits DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM j
)
SELECT doc_id, source, weight_bits, n_tokens, cum_before
FROM c WHERE cum_before < 600
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordered for the driver's time-budgeted CORRECTNESS pass (~50 rows),
    # strictly by driver-evidence age: 1) flagship; then every round-5
    # addition (never driver-checked, newest first); then the queries
    # with no r4-data driver row (oldest evidence first, prior relative
    # order kept); the CORRECTNESS_r04-green queries freshest-last.
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "dedup_incremental_batch": dedup_incremental_batch,
        "dedup_cross_source_matrix": dedup_cross_source_matrix,
        "events_kmv_theta": events_kmv_theta,
        "docs_tokenizer_fertility": docs_tokenizer_fertility,
        "dedup_quality_canonical": dedup_quality_canonical,
        "emb_filtered_knn": emb_filtered_knn,
        "events_transition_matrix": events_transition_matrix,
        "events_mad_outliers": events_mad_outliers,
        "events_debounce_state": events_debounce_state,
        "docs_online_lsh_state": docs_online_lsh_state,
        "docs_postings_stats": docs_postings_stats,
        "docs_leakage_free_split": docs_leakage_free_split,
        "emb_batch_search": emb_batch_search,
        "dedup_ppjoin_pairs": dedup_ppjoin_pairs,
        "docs_proximity_search": docs_proximity_search,
        "docs_pmi_collocations": docs_pmi_collocations,
        "docs_source_drift": docs_source_drift,
        "docs_novelty_score": docs_novelty_score,
        "docs_train_split": docs_train_split,
        "docs_stratified_sample": docs_stratified_sample,
        "docs_pack_sequences": docs_pack_sequences,
        "emb_near_dup_drop": emb_near_dup_drop,
        "text_bpe_tokens": text_bpe_tokens,
        "text_winnow_fps": text_winnow_fps,
        "pipeline_training_corpus": pipeline_training_corpus,
        "docs_reservoir_per_source": docs_reservoir_per_source,
        "docs_token_histogram": docs_token_histogram,
        "docs_lang_pivot": docs_lang_pivot,
        "docs_lang_unpivot": docs_lang_unpivot,
        "dedup_winnow_pairs": dedup_winnow_pairs,
        "emb_lsh_search": emb_lsh_search,
        "q8_market_share": q8_market_share,
        "q15_top_supplier": q15_top_supplier,
        "q17_small_quantity_revenue": q17_small_quantity_revenue,
        "q18_large_volume_customers": q18_large_volume_customers,
        "q19_disjunctive_revenue": q19_disjunctive_revenue,
        "q21_suppliers_kept_waiting": q21_suppliers_kept_waiting,
        "q22_sales_opportunity": q22_sales_opportunity,
        "q2_min_cost_supplier": q2_min_cost_supplier,
        "q9_product_profit": q9_product_profit,
        "q11_important_stock": q11_important_stock,
        "q12_late_shipments": q12_late_shipments,
        "q16_supplier_count": q16_supplier_count,
        "q20_excess_stock_suppliers": q20_excess_stock_suppliers,
        "q3_top_unshipped": q3_top_unshipped,
        "q5_nation_revenue": q5_nation_revenue,
        "q6_forecast_revenue": q6_forecast_revenue,
        "q4_order_priority": q4_order_priority,
        "q7_nation_volume": q7_nation_volume,
        "q10_returned_items": q10_returned_items,
        "q13_customer_distribution": q13_customer_distribution,
        "q14_promo_share": q14_promo_share,
        "parts_brand_stats": parts_brand_stats,
        "customers_without_orders": customers_without_orders,
        "events_point_get": events_point_get,
        "events_prefix_timerange": events_prefix_timerange,
        "events_compact_latest": events_compact_latest,
        "events_ttl_scan": events_ttl_scan,
        "events_sessionize": events_sessionize,
        "events_running_totals": events_running_totals,
        "events_sliding_stats": events_sliding_stats,
        "events_session_window_agg": events_session_window_agg,
        "events_partition_routing": events_partition_routing,
        "events_avro_decode": events_avro_decode,
        "docs_decontaminate": docs_decontaminate,
        "docs_gopher_rules": docs_gopher_rules,
        "docs_frame_sample": docs_frame_sample,
        "emb_pq_codes": emb_pq_codes,
        "emb_pq_search": emb_pq_search,
        "docs_pii_scrub": docs_pii_scrub,
        "docs_bm25_search": docs_bm25_search,
        "dedup_cluster_canonical": dedup_cluster_canonical,
        "docs_source_mix": docs_source_mix,
        "docs_line_dedup": docs_line_dedup,
        "events_value_quantiles": events_value_quantiles,
        "events_interarrival": events_interarrival,
        "docs_jpeg_decode": docs_jpeg_decode,
        "events_funnel": events_funnel,
        "events_cohort_retention": events_cohort_retention,
        "events_zorder_key": events_zorder_key,
        "docs_chunk_overlap": docs_chunk_overlap,
        "docs_phrase_search": docs_phrase_search,
        "docs_lm_bits": docs_lm_bits,
        "docs_dsir_weights": docs_dsir_weights,
        "docs_gopher_rep": docs_gopher_rep,
        "graph_pagerank": graph_pagerank,
        "events_cms_counts": events_cms_counts,
        "events_hll_registers": events_hll_registers,
        "docs_temperature_mix": docs_temperature_mix,
        "docs_curriculum": docs_curriculum,
        "nation_account_balance": nation_account_balance,
        "emb_lsh_recall": emb_lsh_recall,
        "emb_ivfpq_search": emb_ivfpq_search,
        "dedup_edit_distance": dedup_edit_distance,
        "events_hll_by_type": events_hll_by_type,
        "orders_quality_report": orders_quality_report,
        "events_value_outliers": events_value_outliers,
        "docs_bloom_export": docs_bloom_export,
        "docs_corpus_report": docs_corpus_report,
        "events_daily_active": events_daily_active,
        "orders_grouping_sets": orders_grouping_sets,
        "events_window_stats": events_window_stats,
        "events_topn_per_key": events_topn_per_key,
        "events_num_keys": events_num_keys,
        "orders_auto_increment": orders_auto_increment,
        "events_update_pairs": events_update_pairs,
        "events_latest_n_state": events_latest_n_state,
        "docs_repeated_windows": docs_repeated_windows,
        "docs_tfidf_pairs": docs_tfidf_pairs,
        "events_dd_quantiles": events_dd_quantiles,
        "events_heavy_hitters": events_heavy_hitters,
        "dedup_lsh_recall": dedup_lsh_recall,
        "emb_int8_quantize": emb_int8_quantize,
        "dedup_containment": dedup_containment,
        "docs_dsir_sample": docs_dsir_sample,
        "docs_bpe_segment": docs_bpe_segment,
        "emb_hard_negatives": emb_hard_negatives,
        "asof_last_order_before_event": asof_last_order_before_event,
        "orders_rollup": orders_rollup,
        "orders_range_join": orders_range_join,
        "events_changelog_apply": events_changelog_apply,
        "docs_blob_metadata": docs_blob_metadata,
        "docs_feature_stub": docs_feature_stub,
        "events_json_extract": events_json_extract,
        "events_xml_decode": events_xml_decode,
        "events_uuid_codec": events_uuid_codec,
        "events_timelog": events_timelog,
        "join_enrich_events": join_enrich_events,
        "mktsegment_revenue": mktsegment_revenue,
        "set_ops_customers": set_ops_customers,
        "scatter_gather_totals": scatter_gather_totals,
        "distinct_event_types": distinct_event_types,
        "index_word_lookup": index_word_lookup,
        "word_count": word_count,
        "text_token_count": text_token_count,
        "text_quality": text_quality,
        "text_lang_id": text_lang_id,
        "text_fingerprint": text_fingerprint,
        "dedup_exact_groups": dedup_exact_groups,
        "pipeline_clean_corpus": pipeline_clean_corpus,
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "dedup_simhash": dedup_simhash,
        "emb_knn_brute": emb_knn_brute,
        "emb_cosine_pairs_bucketed": emb_cosine_pairs_bucketed,
        "emb_lsh_buckets": emb_lsh_buckets,
        "emb_ivf_assign": emb_ivf_assign,
        "mktsegment_revenue_salted": mktsegment_revenue_salted,
        "graph_components": graph_components,
        "custom_gather_agg": custom_gather_agg,
        "orders_cube": orders_cube,
        "docs_media_decode": docs_media_decode,
        "emb_ivf_search": emb_ivf_search,
        "dedup_simhash_pairs": dedup_simhash_pairs,
    }

def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": _Q1_SQL,
        "events_debounce_state": _debounce_state_sql(),
        "docs_online_lsh_state": _online_lsh_state_sql(),
        "docs_postings_stats": _POSTINGS_STATS_SQL,
        "docs_leakage_free_split": _leakage_free_split_sql(),
        "emb_batch_search": _BATCH_SEARCH_SQL,
        "dedup_ppjoin_pairs": _ngram_jaccard_oracle_sql(),
        "docs_proximity_search": _PROXIMITY_SQL,
        "docs_pmi_collocations": _PMI_SQL,
        "docs_source_drift": _SOURCE_DRIFT_SQL,
        "docs_novelty_score": _NOVELTY_SQL,
        "q3_top_unshipped": _Q3_SQL,
        "q5_nation_revenue": _Q5_SQL,
        "q6_forecast_revenue": _Q6_SQL,
        "q4_order_priority": _Q4_SQL,
        "q7_nation_volume": _Q7_SQL,
        "q10_returned_items": _Q10_SQL,
        "q13_customer_distribution": _Q13_SQL,
        "q14_promo_share": _Q14_SQL,
        "parts_brand_stats": _PART_STATS_SQL,
        "customers_without_orders": _ANTI_SQL,
        "events_point_get": _POINT_GET_SQL,
        "events_prefix_timerange": _PREFIX_SCAN_SQL,
        "events_compact_latest": _COMPACT_SQL,
        "events_ttl_scan": _TTL_SQL,
        "events_window_stats": _WINDOW_SQL,
        "events_sliding_stats": _SLIDING_SQL,
        "events_topn_per_key": _TOPN_SQL,
        "events_num_keys": _NUMKEYS_SQL,
        "orders_auto_increment": _AUTOINC_SQL,
        "asof_last_order_before_event": _ASOF_SQL,
        "orders_rollup": _ROLLUP_SQL,
        "orders_cube": _CUBE_SQL,
        "events_sessionize": _SESSION_SQL,
        "events_session_window_agg": _SESSION_WINDOW_SQL,
        "orders_range_join": _RANGE_JOIN_SQL,
        "events_running_totals": _RUNNING_SQL,
        "events_changelog_apply": _CHANGELOG_APPLY_SQL,
        "docs_blob_metadata": _BLOB_META_SQL,
        "docs_feature_stub": _FEATURE_STUB_SQL,
        "docs_media_decode": _MEDIA_DECODE_SQL,
        "events_json_extract": _JSON_SQL,
        "events_xml_decode": _XML_SQL,
        "events_uuid_codec": _UUID_SQL,
        "events_avro_decode": _AVRO_SQL,
        "docs_decontaminate": _DECONTAM_SQL,
        "docs_bpe_segment": _BPE_SEGMENT_SQL,
        "events_update_pairs": _UPDATE_PAIRS_SQL,
        "events_latest_n_state": _LATEST_N_STATE_SQL,
        "docs_repeated_windows": _REPEATED_WINDOWS_SQL,
        "docs_tfidf_pairs": _TFIDF_PAIRS_SQL,
        "events_dd_quantiles": _DD_QUANTILES_SQL,
        "events_heavy_hitters": _HEAVY_HITTERS_SQL,
        "dedup_lsh_recall": _dedup_lsh_recall_oracle_sql(),
        "emb_int8_quantize": _INT8_QUANT_SQL,
        "dedup_containment": _containment_oracle_sql(),
        "docs_dsir_sample": _DSIR_SAMPLE_SQL,
        "docs_gopher_rules": _GOPHER_SQL,
        "docs_frame_sample": _FRAME_SAMPLE_SQL,
        "emb_pq_codes": _pq_codes_sql(),
        "emb_pq_search": _pq_search_sql(),
        "docs_pii_scrub": _PII_SQL,
        "docs_bm25_search": _bm25_oracle_sql(),
        "dedup_cluster_canonical": _cluster_canonical_oracle_sql(),
        "docs_source_mix": _SOURCE_MIX_SQL,
        "docs_line_dedup": _LINE_DEDUP_SQL,
        "events_value_quantiles": _QUANTILES_SQL,
        "events_interarrival": _INTERARRIVAL_SQL,
        "docs_jpeg_decode": _JPEG_DECODE_SQL,
        "events_funnel": _FUNNEL_SQL,
        "events_cohort_retention": _COHORT_SQL,
        "events_zorder_key": _zorder_oracle_sql(),
        "docs_chunk_overlap": _CHUNK_SQL,
        "docs_phrase_search": _PHRASE_SQL,
        "docs_lm_bits": _LM_BITS_SQL,
        "docs_dsir_weights": _DSIR_SQL,
        "docs_gopher_rep": _GOPHER_REP_SQL,
        "graph_pagerank": _PAGERANK_SQL,
        "events_cms_counts": _CMS_SQL,
        "events_hll_registers": _HLL_SQL,
        "docs_temperature_mix": _TEMP_MIX_SQL,
        "emb_hard_negatives": _hard_neg_oracle_sql(),
        "docs_curriculum": _CURRICULUM_SQL,
        "nation_account_balance": _NATION_BALANCE_SQL,
        "emb_lsh_recall": _lsh_recall_oracle_sql(),
        "emb_ivfpq_search": _ivfpq_search_sql(),
        "dedup_edit_distance": _EDIT_DIST_SQL,
        "events_hll_by_type": _HLL_GROUP_SQL,
        "orders_quality_report": _ORDERS_QUALITY_SQL,
        "events_value_outliers": _OUTLIER_SQL,
        "docs_bloom_export": _BLOOM_SQL,
        "docs_corpus_report": _CORPUS_REPORT_SQL,
        "events_daily_active": _DAU_SQL,
        "orders_grouping_sets": _GROUPING_SETS_SQL,
        "events_timelog": _TIMELOG_SQL,
        "events_partition_routing": _routing_oracle_sql(),
        # events_partition_routing: deliberately no oracle (murmur2 not
        # SQL-expressible); driver records the rows-only check.
        "join_enrich_events": _ENRICH_SQL,
        "mktsegment_revenue": _SEGMENT_SQL,
        "set_ops_customers": _SETOPS_SQL,
        "scatter_gather_totals": _SCATTER_SQL,
        "distinct_event_types": _DISTINCT_SQL,
        "index_word_lookup": _INDEX_SQL,
        "word_count": _WORDCOUNT_SQL,
        "text_token_count": _TOKCOUNT_SQL,
        "text_quality": _QUALITY_SQL,
        "text_lang_id": _LANGID_SQL,
        "text_fingerprint": _FINGERPRINT_SQL,
        "dedup_exact_groups": _DEDUP_EXACT_SQL,
        "pipeline_clean_corpus": _pipeline_oracle_sql(),
        "dedup_minhash_lsh": _minhash_oracle_sql(),
        "dedup_incremental_batch": _dedup_incremental_oracle_sql(),
        "dedup_cross_source_matrix": _dedup_cross_source_oracle_sql(),
        "events_kmv_theta": _KMV_THETA_SQL,
        "docs_tokenizer_fertility": _TOKENIZER_FERTILITY_SQL,
        "dedup_quality_canonical": _quality_canonical_oracle_sql(),
        "emb_filtered_knn": _FILTERED_KNN_SQL,
        "events_transition_matrix": _TRANSITION_SQL,
        "events_mad_outliers": _MAD_OUTLIERS_SQL,
        "dedup_ngram_jaccard": _ngram_jaccard_oracle_sql(),
        "dedup_simhash": _simhash_oracle_sql(),
        "emb_knn_brute": _KNN_SQL,
        "emb_cosine_pairs_bucketed": _COSPAIR_SQL,
        "emb_lsh_buckets": _lsh_oracle_sql(),
        "emb_ivf_assign": _IVF_SQL,
        "emb_ivf_search": _IVF_SEARCH_SQL,
        "dedup_simhash_pairs": _simhash_pairs_oracle_sql(),
        "docs_train_split": _TRAIN_SPLIT_SQL,
        "docs_stratified_sample": _STRATIFIED_SQL,
        "docs_pack_sequences": _PACK_SQL,
        "emb_near_dup_drop": _NEAR_DUP_SQL,
        "text_bpe_tokens": _BPE_SQL,
        "text_winnow_fps": _WINNOW_SQL,
        "pipeline_training_corpus": _TRAIN_PIPE_SQL,
        "docs_reservoir_per_source": _RESERVOIR_SQL,
        "docs_token_histogram": _TOKEN_HIST_SQL,
        "docs_lang_pivot": _LANG_PIVOT_SQL,
        "docs_lang_unpivot": _LANG_UNPIVOT_SQL,
        "dedup_winnow_pairs": _WINNOW_PAIRS_SQL,
        "emb_lsh_search": _lsh_search_oracle_sql(),
        "mktsegment_revenue_salted": _SEGMENT_SQL,
        "graph_components": _GRAPH_SQL,
        "custom_gather_agg": _GATHER_SQL,
        "q8_market_share": _Q8_SQL,
        "q15_top_supplier": _Q15_SQL,
        "q17_small_quantity_revenue": _Q17_SQL,
        "q18_large_volume_customers": _Q18_SQL,
        "q19_disjunctive_revenue": _Q19_SQL,
        "q21_suppliers_kept_waiting": _Q21_SQL,
        "q22_sales_opportunity": _Q22_SQL,
        "q2_min_cost_supplier": _Q2_SQL,
        "q9_product_profit": _Q9_SQL,
        "q11_important_stock": _Q11_SQL,
        "q12_late_shipments": _Q12_SQL,
        "q16_supplier_count": _Q16_SQL,
        "q20_excess_stock_suppliers": _Q20_SQL,
    }
