"""Z-order (Morton) clustering for multi-dimensional data skipping.

A table clustered on ONE key prunes scans on that key only; interleaving
the bits of two keys into a Morton code and range-partitioning on it
gives every file a tight min/max envelope in BOTH dimensions — the
standard Delta/Iceberg ``ZORDER BY`` move, built here from plain integer
expressions so it works on any DataFrame write (and so a DuckDB oracle
can replay the code bit-for-bit).

At 100 TB this is the difference between "point/range predicates on
(user, time) read ~sqrt(files)" and "read everything": parquet row-group
stats + file pruning do the skipping, no index structure needed. The
z-value is a pure projection — clustering cost is the one range exchange
of the rewrite job (see ``KeyedTable.compact`` for the rewrite shell).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_interleave(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative longs:
    result bit 2i = bit i of ``a``, bit 2i+1 = bit i of ``b``.

    Built as a sum of masked shifts (integer-exact, engine-portable);
    callers bucket/clamp inputs into [0, 2^bits) first.
    """
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def morton_sql(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """The identical interleave as a DuckDB SQL expression string.

    Every shift term is fully parenthesized: DuckDB binds ``+`` tighter
    than ``<<``, so ``x << 0 + y << 1`` parses as ``x << (0 + y) << 1``.
    """
    terms = []
    for i in range(bits):
        terms.append(f"(((({a_expr}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({b_expr}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def cluster_by_zorder(
    df: DataFrame, a: Column, b: Column, n_partitions: int, bits: int = 16
) -> DataFrame:
    """Range-partition rows by their Morton code (one range exchange).

    Each output partition — hence each written file — covers a compact
    z-range, i.e. a small rectangle in (a, b) space, so min/max stats
    prune on either dimension. Drop the helper column after write if the
    caller doesn't want it persisted.
    """
    with_z = df.withColumn("_z", morton_interleave(a, b, bits))
    return with_z.repartitionByRange(n_partitions, F.col("_z"))
