"""TPC-H-shaped analytical queries (headline bench workload + subquery family).

Split from the single-file ``__spark_entry__.py`` registry (round 6):
one module per query family, each with its OWN helper namespace, so a
same-named oracle helper in another family can never silently clobber
this one's (the r3 ``_QUALITY_SQL`` collision trap). The driver contract
(``entry``/``queries``/``oracle_sql``) stays in ``__spark_entry__.py``
and references these modules by qualified name.

Cross-engine determinism rules (aliased aggregates, integer money/ratio
arithmetic, formatted timestamps, md5-derived text hashes) are inherited
from the original registry header — see ``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from affinity_spark.operators.topk import global_top_n

from affinity_spark.registry._shared import _cents, _t


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
