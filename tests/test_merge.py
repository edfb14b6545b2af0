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


def test_incremental_agg_maintain_equals_recompute(spark, tmp_path):
    """Maintaining a rollup from the CDC delta must equal recomputing
    it from the new table version — inserts, updates, deletes, and a
    group emptied to zero all covered."""
    from pyspark.sql import functions as F

    from quanta_etl_spark.operators.merge import incremental_agg_maintain
    from quanta_etl_spark.sources import readers

    path = str(tmp_path / "fact")
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 5.0), (3, "b", 7.0), (4, "c", 2.0)],
        "k int, grp string, v double",
    )
    readers.write_versioned_parquet(v1, path)
    v2 = spark.createDataFrame(
        # a: value update; k=2 MOVES group a->d; b: insert; c: deleted
        # entirely; d: new group (move + fresh insert)
        [(1, "a", 12.0), (2, "d", 5.0), (3, "b", 7.0), (5, "b", 1.0), (6, "d", 9.0)],
        "k int, grp string, v double",
    )
    readers.write_versioned_parquet(v2, path)

    agg_v1 = v1.groupBy("grp").agg(
        F.sum("v").alias("total"), F.count(F.lit(1)).alias("n")
    )
    cdc = readers.diff_versions(spark, path, 1, 2, ["k"])
    maintained = incremental_agg_maintain(
        agg_v1, cdc, ["grp"], {"total": ("old_v", "new_v")}, count_col="n"
    )
    expected = v2.groupBy("grp").agg(
        F.sum("v").alias("total"), F.count(F.lit(1)).alias("n")
    )
    got = {r.grp: (r.total, r.n) for r in maintained.collect()}
    want = {r.grp: (r.total, r.n) for r in expected.collect()}
    assert got == want, (got, want)
