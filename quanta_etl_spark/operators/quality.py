"""Data-quality assertion operators.

Generalizes the reference's two hand-rolled null-check queries
(/root/reference/dags/spark/etl.py:166-175: filter IS NULL → select
keys → dropDuplicates → write) into a reusable ``expect`` surface, and
adds the pass/fail semantics the reference lacks (its checks were pure
observability — nothing failed on violations, SURVEY.md §5).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def offenders(
    df: DataFrame, predicate: Column | str, keys: Sequence[str]
) -> DataFrame:
    """Distinct key combinations violating a rule — the reference's
    `missing_isin` / `missing_underlying` shape (etl.py:167-168).
    ``predicate`` selects the BAD rows."""
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    return df.where(pred).select(*keys).dropDuplicates()


@dataclass
class CheckResult:
    name: str
    violations: int
    passed: bool


def expect(
    df: DataFrame,
    predicate: Column | str,
    name: str = "check",
    max_violations: int = 0,
) -> CheckResult:
    """Assert that no more than ``max_violations`` rows violate the rule.
    ``predicate`` states what GOOD rows satisfy. Single count action."""
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    n = df.where(~pred | pred.isNull()).count()
    return CheckResult(name=name, violations=n, passed=n <= max_violations)


def expect_unique(df: DataFrame, keys: Sequence[str], name: str = "unique") -> CheckResult:
    """Key-uniqueness check: one aggregation, counts keys seen >1 time."""
    dup = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1)
        .count()
    )
    return CheckResult(name=name, violations=dup, passed=dup == 0)


def null_report(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column null counts in ONE aggregation pass (no per-column jobs)."""
    cols = list(cols or df.columns)
    return df.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
    )
