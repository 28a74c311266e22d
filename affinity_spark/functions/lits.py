"""Single-round-trip literal constructors for array/matrix constants.

``F.lit(seq)`` (and ``F.array(*[F.lit(x) ...])``) recurses ONE py4j socket
round trip per SCALAR — a k×dim codebook costs k·dim JVM calls at plan
construction time, ~1 ms each (the r14 profile measured ~1.3 s for ~1.1k
scalars; see CLAUDE.md's F.lit rule). Building the same constant as one
SQL expression string parses JVM-side in a single call.

Value/type parity with ``F.lit``:

- ints carry an ``L`` suffix → BIGINT elements, matching the LongType
  PySpark infers for python-int arrays on every call site these replace;
- floats go through ``repr`` (shortest round-trip) inside
  ``CAST('…' AS DOUBLE)`` → bit-identical doubles (plain ``1.5`` would
  parse as DECIMAL in Spark SQL, hence the cast form).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _d(x: float) -> str:
    v = float(x)
    if v != v:
        return "CAST('NaN' AS DOUBLE)"
    if v in (float("inf"), float("-inf")):
        sign = "-" if v < 0 else ""
        return f"CAST('{sign}Infinity' AS DOUBLE)"
    return f"CAST('{v!r}' AS DOUBLE)"


def long_array_lit(vals: Iterable[int]) -> Column:
    """``array<bigint>`` literal in one JVM call."""
    return F.expr("array(" + ",".join(f"{int(x)}L" for x in vals) + ")")


def double_array_lit(vals: Iterable[float]) -> Column:
    """``array<double>`` literal in one JVM call."""
    return F.expr("array(" + ",".join(_d(x) for x in vals) + ")")


def double_matrix_lit(rows: Sequence[Iterable[float]]) -> Column:
    """``array<array<double>>`` literal in one JVM call."""
    return F.expr(
        "array("
        + ",".join("array(" + ",".join(_d(x) for x in r) + ")" for r in rows)
        + ")"
    )


def _sql_str(s: str) -> str:
    """Spark SQL string literal (default parser escaping — the repo never
    sets ``spark.sql.parser.escapedStringLiterals``)."""
    return "'" + str(s).replace("\\", "\\\\").replace("'", "\\'") + "'"


def _render_value(v, dt: T.DataType) -> str:
    s = dt.simpleString()
    if v is None:
        return f"CAST(NULL AS {s})"
    if isinstance(dt, T.ArrayType):
        if len(v) == 0:
            return f"CAST(array() AS {s})"
        return "array(" + ",".join(_render_value(x, dt.elementType) for x in v) + ")"
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        if isinstance(v, bool) or not isinstance(v, int):
            raise TypeError(f"{v!r} is not an int for {s} column")
        return f"CAST({int(v)} AS {s})"
    if isinstance(dt, T.DoubleType):
        return _d(v)
    if isinstance(dt, T.BooleanType):
        return "TRUE" if v else "FALSE"
    if isinstance(dt, T.StringType):
        return _sql_str(v)
    raise TypeError(f"local_df: unsupported column type {s}")


def local_df(
    spark: SparkSession,
    rows: Sequence[Sequence | Mapping],
    ddl: str,
    max_inline_rows: int = 20_000,
) -> DataFrame:
    """Driver-side rows -> a **LocalRelation** DataFrame in one JVM call.

    ``SparkSession.createDataFrame`` parallelizes python data into an
    RDD of ``defaultParallelism`` partitions — every later job over the
    frame (each broadcast build included) runs a 32-task python scan
    stage whose tasks are pure python-worker round trips (~250 ms
    runtime each at ~0 CPU; an r14 stage profile found one such stage
    PER broadcast of a tiny driver-built frame, ~8 s of parked
    executorRunTime per kmeans iteration). Rendering the same rows as a
    typed ``VALUES`` inline table parses to a LocalRelation: broadcast
    builds collect it driver-side with ZERO tasks, and the measured
    broadcast-join A/B is ~0.7 s -> ~0.23 s per query.

    Every value is rendered with an explicit ``CAST`` to the DDL type, so
    the schema is pinned exactly (the mixed-width parquet rule) and
    value/type parity with ``createDataFrame(rows, ddl)`` is bit-exact
    (tests/test_lits.py pins ints at both extremes, escaping-hostile
    strings, ±0.0/inf/NaN doubles, None, arrays, empty input).

    Supported column types: integral, double, boolean, string, arrays
    thereof. Row sets larger than ``max_inline_rows`` fall back to
    ``createDataFrame`` (same ddl, same values) — parse time grows with
    the SQL text while the python-scan tax is flat, so the inline form
    only wins for driver-sized row sets."""
    st = T.StructType.fromDDL(ddl)
    if len(rows) > max_inline_rows:
        return spark.createDataFrame(rows, ddl)
    cols = ", ".join(f"`{f.name}`" for f in st.fields)
    # one all-NULL row behind a FALSE marker: the inline table's column
    # nullability is the union over rows, so every column analyzes as
    # nullable (createDataFrame parity); the optimizer folds the filter
    # back to a LocalRelation of just the real rows.
    nulls = ", ".join(
        f"CAST(NULL AS {f.dataType.simpleString()})" for f in st.fields
    )
    vals = ", ".join(
        "(TRUE, "
        + ", ".join(
            _render_value(v, f.dataType)
            for v, f in zip(row, st.fields, strict=True)
        )
        + ")"
        for row in rows
    )
    vals = (vals + ", " if vals else "") + f"(FALSE, {nulls})"
    return spark.sql(
        f"SELECT {cols} FROM VALUES {vals} AS t(`_lr_m`, {cols}) WHERE `_lr_m`"
    )
