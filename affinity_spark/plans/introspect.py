"""Physical-plan introspection: the engine's scale guardrails.

The reference has no optimizer — its performance engineering is physical
layout (SURVEY §4). On Spark the equivalent discipline is asserting the
*shape* of the Catalyst physical plan: filters reached the scan, small dims
broadcast, shuffle count is what the algebra requires, codegen spans are
wide. These helpers make those properties testable (tests/test_plan_quality
pins them for the headline queries), so a regression that silently turns a
broadcast join into a sort-merge join or strips pushdown fails CI — at
100 TB those regressions are outages, not slowdowns.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def formatted_plan(df: DataFrame) -> str:
    """`explain("formatted")` text — unlike the operator toString it never
    truncates scan details (PushedFilters/ReadSchema)."""
    jdf = df._jdf  # noqa: SLF001
    jvm = df.sparkSession._jvm  # noqa: SLF001
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every scan in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def n_exchanges(df: DataFrame) -> int:
    """Shuffle count (Exchange operators, minus broadcast exchanges and
    AQE reuse).

    Counted as DISTINCT plan ids, not raw text matches: a plan that
    references a shared subtree from several parents (persisted frames,
    reused exchanges) PRINTS that subtree once per reference, so a text
    count inflates — pagerank's fused 3-iteration DAG printed 103
    "exchanges" for a handful of real shuffles. Lines without a plan_id
    (older formats) fall back to positional counting."""
    plan = executed_plan(df)
    ids = set()
    anon = 0
    for m in re.finditer(
        r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)[^\n]*",
        plan,
    ):
        pid = re.search(r"\[plan_id=(\d+)\]", m.group(0))
        if pid:
            ids.add(pid.group(1))
        else:
            anon += 1
    return len(ids) + anon


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def wholestage_codegen_ids(df: DataFrame) -> list[int]:
    """Distinct WholeStageCodegen span ids — wider/fewer spans mean more of
    the plan runs as fused generated code. Spans print as ``*(N)`` in the
    simple plan string and ``WholeStageCodegen (N)`` in the verbose one."""
    plan = executed_plan(df)
    ids = re.findall(r"WholeStageCodegen \((\d+)\)", plan) + re.findall(r"\*\((\d+)\)", plan)
    return sorted({int(x) for x in ids})
