"""Physical-plan introspection & assertions.

The engine adds no custom optimizer (Catalyst does the planning —
SURVEY.md §4); what it adds is the ability to ASSERT that the plans
Catalyst produces have the shape the 100-TB design requires:

* filters pushed into the parquet scan (``pushed_filters``),
* scans pruned to the referenced columns (``scan_columns``),
* dimension joins broadcast instead of shuffled (``join_strategies``),
* no accidental cartesian products,
* a bounded number of shuffles (``count_shuffles``).

Tests pin these properties per operator so a refactor that silently
de-optimizes a plan (e.g. a cast that blocks pushdown) fails CI rather
than a production run. All functions work on the ANALYZED dataframe —
they trigger planning, not execution.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "formatted_plan",
    "simple_plan",
    "count_shuffles",
    "pushed_filters",
    "scan_columns",
    "join_strategies",
    "has_broadcast_join",
    "has_cartesian",
    "codegen_stage_count",
]


def formatted_plan(df: DataFrame) -> str:
    """`explain("formatted")` as a string (executedPlan, pre-AQE-final)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )


def count_shuffles(df: DataFrame) -> int:
    """Number of Exchange operators (shuffles) in the physical plan.
    Broadcast exchanges are NOT counted — they ship only the small side."""
    plan = simple_plan(df)
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning|\bExchange RoundRobinPartitioning", plan))


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_columns(df: DataFrame) -> dict[str, list[str]]:
    """Map of scan location -> columns actually read (ReadSchema).
    Verifies column pruning: a 2-column projection over a 16-column
    table must read 2 columns, not 16."""
    plan = formatted_plan(df)
    result: dict[str, list[str]] = {}
    scans = re.split(r"\(\d+\) Scan parquet\s*", plan)[1:]
    for chunk in scans:
        loc = re.search(r"Location: \S+ \[([^\]]*)\]", chunk)
        schema = re.search(r"ReadSchema: struct<([^>]*)>", chunk)
        if loc and schema:
            cols = [
                c.split(":")[0].strip()
                for c in schema.group(1).split(",")
                if c.strip()
            ]
            result[loc.group(1)] = cols
    return result


def join_strategies(df: DataFrame) -> list[str]:
    """Join operators in the plan, e.g. ['BroadcastHashJoin', 'SortMergeJoin']."""
    plan = simple_plan(df)
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in join_strategies(df)


def has_cartesian(df: DataFrame) -> bool:
    strategies = join_strategies(df)
    return "CartesianProduct" in strategies or "BroadcastNestedLoopJoin" in strategies


def executed_plan(df: DataFrame, execute: bool = True) -> str:
    """FINAL physical plan — post-AQE. The static explain shows
    ``AdaptiveSparkPlan isFinalPlan=false`` with the pre-runtime shape;
    AQE's actual decisions (partition coalescing ``AQEShuffleRead
    coalesced``, skew splits ``skew=true``, SMJ→BHJ demotions) only
    appear after an action has run the query. ``execute=True`` runs a
    driver-discarding ``foreach`` pass over THIS DataFrame's own query
    execution so the returned string is the adaptive final plan."""
    if execute:
        df.foreach(lambda _: None)
    return str(df._jdf.queryExecution().executedPlan())


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees — >0 means the plan's hot
    path runs in generated fused JVM loops (the AQE simple plan hides
    codegen markers; the "codegen" explain mode reports them)."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan)
    return int(m.group(1)) if m else 0
