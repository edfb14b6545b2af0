"""Driver-contract integrity: the invariants the correctness gate
assumes about __spark_entry__ itself."""

from __future__ import annotations

import __spark_entry__ as E


def test_every_query_has_an_oracle():
    qs, osql = E.queries(), E.oracle_sql()
    missing = sorted(set(qs) - set(osql))
    orphans = sorted(set(osql) - set(qs))
    assert not missing, f"queries without oracle SQL: {missing}"
    assert not orphans, f"oracle SQL without a query: {orphans}"


def test_registry_is_callable_and_unique():
    qs = E.queries()
    assert len(qs) == len(set(qs)), "duplicate query names"
    for name, fn in qs.items():
        assert callable(fn), name


def test_oracle_sql_names_registered_tables_only():
    """Oracle SQL may only reference the driver's pre-registered views;
    a typo'd table name would fail at gate time, not review time."""
    import re

    tables = {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
        # DuckDB table functions (FROM generate_series(...) s(g)) are
        # not table refs; allowlist the ones oracles legitimately use
        "generate_series", "range",
    }
    for name, sql in E.oracle_sql().items():
        refs = set(
            m.group(2).lower()
            for m in re.finditer(
                r"\b(FROM|JOIN)\s+([A-Za-z_][A-Za-z0-9_]*)", sql, re.I
            )
        )
        unknown = refs - tables
        # CTE names are legitimate non-table refs; only flag refs that
        # are neither known tables nor defined as CTEs in the same SQL
        # CTE form: name [(col, ...)] AS (
        ctes = set(
            m.group(1).lower()
            for m in re.finditer(
                r"\b([A-Za-z_][A-Za-z0-9_]*)\s*(?:\([^)]*\))?\s+AS\s*\(",
                sql,
                re.I,
            )
        )
        unknown -= ctes
        # parenthesized subqueries: FROM ( — captured group would be
        # empty/non-identifier, regex already excludes
        assert not unknown, f"{name}: unknown table refs {sorted(unknown)}"
