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
                r"\b([A-Za-z_][A-Za-z0-9_]*)\s*(?:\([^)]*\))?\s+AS\s*"
                r"(?:MATERIALIZED\s*)?\(",
                sql,
                re.I,
            )
        )
        unknown -= ctes
        # parenthesized subqueries: FROM ( — captured group would be
        # empty/non-identifier, regex already excludes
        assert not unknown, f"{name}: unknown table refs {sorted(unknown)}"


def _duck_con(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_duck_gate_unsafe_detector_flags_uncast_sum_case(sf_dir):
    """The r6 gate failures (profile_columns/referential_check) were
    caused by bare integer sum(CASE...) columns: DuckDB types them
    HUGEINT, and the driver's pandas fetch renders HUGEINT as float64
    ("3.000000" vs Spark long "3") — values equal, hash red.  The
    replica must flag that oracle shape red even though fetchall()
    values would match."""
    from tools.check_oracle import duck_gate_unsafe_columns

    con = _duck_con(sf_dir)
    rel = con.sql(
        "SELECT sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS n "
        "FROM orders"
    )
    assert duck_gate_unsafe_columns(rel) == ["n:HUGEINT"]
    ok = con.sql(
        "SELECT CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n FROM orders"
    )
    assert duck_gate_unsafe_columns(ok) == []
    # DECIMAL final columns are equally pandas-hazardous
    dec = con.sql(
        "SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s FROM orders"
    )
    assert duck_gate_unsafe_columns(dec) == ["s:DECIMAL(38,2)"]


def test_all_oracles_emit_gate_safe_duckdb_types(sf_dir):
    """Every oracle's FINAL columns must be pandas-safe DuckDB types:
    no HUGEINT/UHUGEINT/DECIMAL may reach the driver's canonicalizer."""
    from tools.check_oracle import duck_gate_unsafe_columns

    con = _duck_con(sf_dir)
    bad = {}
    for name, sql in E.oracle_sql().items():
        unsafe = duck_gate_unsafe_columns(con.sql(sql))
        if unsafe:
            bad[name] = unsafe
    assert not bad, f"gate-unsafe DuckDB oracle output types: {bad}"


def test_r8_gate_window_composition():
    """The driver gates the FIRST 50 queries() entries; the r8 window
    must be exactly (VERDICT r7 #1): the 23 r7-new queries that have
    never held a driver row, then 27 of the 50 queries last
    driver-gated in r5 (alphabetical), with the remaining 23 r5-stale
    rows immediately after the cap so they lead the r9 window.
    Counted from the CORRECTNESS history, not assumed (r5/r6 lesson)."""
    import json
    import os

    names = list(E.queries().keys())
    window = names[:50]
    rounds: dict[str, list[int]] = {}
    for r in range(1, 8):
        p = f"/root/repo/CORRECTNESS_r0{r}.json"
        if os.path.exists(p):
            for k in json.load(open(p)):
                rounds.setdefault(k, []).append(r)
    never = [n for n in names if n not in rounds]
    # positions 1-23: exactly the never-driver-gated queries, no others
    assert window[: len(never)] == never
    assert len(never) == 23, never
    stale5 = sorted(n for n in names if n in rounds and max(rounds[n]) == 5)
    assert len(stale5) == 50
    # positions 24-50: the alphabetically-first 27 of the r5 cohort
    assert window[23:50] == stale5[:27]
    # the remaining 23 r5-stale rows sit right after the cap (r9 lead)
    assert names[50:73] == stale5[27:]
    # nothing newer than r5-stale occupies a window slot
    assert all(
        n in never or (n in rounds and max(rounds[n]) == 5) for n in window
    )
