"""Set operations (SURVEY.md §2C — absent from the reference).

Thin wrappers; noted semantics matter more than code: ``union`` is
positional and keeps duplicates (SQL UNION ALL), ``intersect``/
``except_`` are DISTINCT set semantics (one hash-aggregate shuffle),
``*_all`` variants keep multiplicity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(*dfs: DataFrame, by_name: bool = True) -> DataFrame:
    """UNION ALL of n frames. ``by_name=True`` resolves columns by name
    (safer across lineages); positional otherwise."""
    if not dfs:
        raise ValueError("need at least one DataFrame")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df) if by_name else out.union(df)
    return out


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b).distinct()


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def intersect_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersectAll(b)


def except_(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.subtract(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)
