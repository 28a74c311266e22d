"""Declarative data-quality constraints, evaluated in one pass.

The quality gate a 100 TB ingest runs BEFORE publishing a table: not-null,
range, set-membership, uniqueness and referential checks declared as data,
compiled to ONE aggregate over the table (conditional sums — no per-rule
scans) plus one grouped pass for key uniqueness and one anti-join per
referential rule. The deequ/Delta-constraints capability, Spark-first.

Violation counts (not booleans) so operators can rank fixes; a publish
gate is ``assert_clean`` — loud failure with per-rule counts, mirroring
the repo's dead-letter stance: bad data is surfaced, never silently
shipped.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return (f"not_null({col})", F.col(col).isNull())

def in_range(col: str, lo, hi) -> tuple[str, Column]:
    # name carries no bound values: dots/commas in a column name read as
    # nested-field paths downstream
    return (
        f"in_range({col})",
        ~F.col(col).between(F.lit(lo), F.lit(hi)) | F.col(col).isNull(),
    )

def in_set(col: str, values: Sequence) -> tuple[str, Column]:
    return (f"in_set({col})", ~F.col(col).isin(*values) | F.col(col).isNull())

def matches(col: str, pattern: str) -> tuple[str, Column]:
    return (
        f"matches({col})",
        ~F.col(col).rlike(pattern) | F.col(col).isNull(),
    )


def violation_counts(df: DataFrame, rules: Sequence[tuple[str, Column]]) -> DataFrame:
    """ONE aggregate: per-rule violation counts as a long column each.
    Output is a single row — constant-sized whatever the table size."""
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
        for name, cond in rules
    ]
    return df.agg(*aggs)


def duplicate_key_count(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Rows beyond the first per key — 0 means the key is unique. One
    grouped pass with map-side partial aggregation."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("_n"))
        .agg(F.sum(F.col("_n") - 1).cast("long").alias("duplicate_rows"))
    )


def orphan_count(
    child: DataFrame, parent: DataFrame, on: Sequence[tuple[str, str]]
) -> DataFrame:
    """Referential integrity: child rows whose key has no parent (anti-join;
    broadcast when the parent key set is small, AQE decides)."""
    cond = [child[c] == parent[p] for c, p in on]
    return child.join(parent, cond, "left_anti").agg(
        F.count("*").cast("long").alias("orphan_rows")
    )


def assert_clean(report_row, rules_desc: str = "") -> None:
    """Publish gate: raise with every nonzero rule count."""
    bad = {k: v for k, v in report_row.asDict().items() if v}
    if bad:
        raise ValueError(f"data-quality violations {rules_desc}: {bad}")
