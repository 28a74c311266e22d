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

from collections.abc import Iterable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


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
