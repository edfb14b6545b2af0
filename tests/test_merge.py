"""Upsert / SCD2 operators (operators.merge)."""

from __future__ import annotations

import pytest

from quanta_etl_spark.operators import merge as merge_ops


def test_merge_upsert_replaces_and_inserts(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "s", "v"]
    )
    source = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], ["k", "s", "v"]
    )
    got = {
        r["k"]: (r["s"], r["v"])
        for r in merge_ops.merge_upsert(target, source, ["k"]).collect()
    }
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_upsert_columns_partial_update(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["k", "s", "v"]
    )
    source = spark.createDataFrame(
        [(2, "IGNORED", 99.0), (5, "e", 50.0)], ["k", "s", "v"]
    )
    got = {
        r["k"]: (r["s"], r["v"])
        for r in merge_ops.merge_upsert_columns(
            target, source, ["k"], ["v"]
        ).collect()
    }
    # matched row 2 keeps its target "s" but takes source "v";
    # unmatched source row 5 is inserted whole
    assert got == {1: ("a", 10.0), 2: ("b", 99.0), 5: ("e", 50.0)}


def test_scd2_versions_and_validity(spark):
    log = spark.createDataFrame(
        [
            (1, 1, "new"),
            (1, 2, "new"),       # no change -> collapsed
            (1, 3, "shipped"),
            (1, 4, "done"),
            (2, 1, "new"),
        ],
        ["k", "ts", "status"],
    )
    rows = sorted(
        (r["k"], r["valid_from"], r["valid_to"], r["status"], r["is_current"])
        for r in merge_ops.scd2_from_changelog(
            log, "k", "ts", ["status"]
        ).collect()
    )
    assert rows == [
        (1, 1, 3, "new", False),
        (1, 3, 4, "shipped", False),
        (1, 4, None, "done", True),
        (2, 1, None, "new", True),
    ]


def test_scd2_tiebreak_makes_order_total(spark):
    # two events with the same ts: the tiebreaker decides version order
    log = spark.createDataFrame(
        [(1, 5, 2, "b"), (1, 5, 1, "a")], ["k", "ts", "seq", "status"]
    )
    rows = sorted(
        (r["status"], r["is_current"])
        for r in merge_ops.scd2_from_changelog(
            log, "k", "ts", ["status"], tiebreak_cols=["seq"]
        ).collect()
    )
    assert rows == [("a", False), ("b", True)]


def test_merge_upsert_plan_broadcasts_small_delta(spark):
    import pyspark.sql.functions as F

    target = spark.range(0, 100_000).withColumn("v", F.col("id") * 2)
    source = spark.range(0, 10).withColumn("v", F.lit(-1).cast("bigint"))
    plan = merge_ops.merge_upsert(target, source, ["id"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
