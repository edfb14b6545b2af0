from __future__ import annotations

from pyspark.sql import functions as F

from quanta_etl_spark.operators import joins as J


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [("a", 5, "q1"), ("a", 10, "q2"), ("a", 1, "q0"), ("b", 7, "q3")],
        "k string, ts int, qid string",
    )
    right = spark.createDataFrame(
        [("a", 3, 30.0), ("a", 5, 50.0), ("a", 9, 90.0), ("b", 8, 80.0)],
        "k string, ts int, px double",
    )
    out = J.asof_join(left, right, "k", "ts", "ts", ["px"]).collect()
    got = {r.qid: r.px for r in out}
    # q0 @1: nothing before → null; q1 @5: exact match 5 → 50 (inclusive);
    # q2 @10: last <=10 is 9 → 90; q3 @7 on b: nothing <=7 → null
    assert got == {"q0": None, "q1": 50.0, "q2": 90.0, "q3": None}
    assert len(out) == 4  # every left row survives exactly once


def test_asof_join_forward(spark):
    left = spark.createDataFrame([("a", 4, "q")], "k string, ts int, qid string")
    right = spark.createDataFrame(
        [("a", 2, 1.0), ("a", 6, 2.0), ("a", 9, 3.0)], "k string, ts int, px double"
    )
    out = J.asof_join(left, right, "k", "ts", "ts", ["px"], direction="forward")
    assert out.collect()[0].px == 2.0


def test_range_join_binned_equals_naive(spark):
    left = spark.createDataFrame(
        [(float(v),) for v in [0, 4, 9, 10, 24, 25, 59]], "v double"
    )
    right = spark.createDataFrame(
        [("low", 0.0, 10.0), ("mid", 10.0, 25.0), ("high", 25.0, 60.0)],
        "band string, lo double, hi double",
    )
    naive = J.range_join(left, right, None, "v", "lo", "hi")
    binned = J.range_join(left, right, None, "v", "lo", "hi", bin_width=7.0)
    a = sorted((r.v, r.band) for r in naive.collect())
    b = sorted((r.v, r.band) for r in binned.collect())
    assert a == b
    assert a == [
        (0.0, "low"), (4.0, "low"), (9.0, "low"), (10.0, "mid"),
        (24.0, "mid"), (25.0, "high"), (59.0, "high"),
    ]


def test_salted_join_matches_plain(spark):
    left = spark.createDataFrame(
        [(i % 3, i) for i in range(100)], "k int, v int"
    )
    right = spark.createDataFrame([(0, "x"), (1, "y")], "k int, tag string")
    plain = left.join(right, "k").groupBy("tag").count().collect()
    salted = J.salted_join(left, right, "k").groupBy("tag").count().collect()
    assert sorted((r.tag, r["count"]) for r in plain) == sorted(
        (r.tag, r["count"]) for r in salted
    )


def test_salted_join_rejects_right_outer(spark):
    left = spark.createDataFrame([(1, 1)], "k int, v int")
    right = spark.createDataFrame([(1, "x")], "k int, tag string")
    import pytest

    for bad in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError):
            J.salted_join(left, right, "k", how=bad)
    # left-flavored joins still accepted
    assert J.salted_join(left, right, "k", how="left_anti").count() == 0


def test_broadcast_dim_join_rejects_column_cond_with_dim_cols(spark):
    left = spark.createDataFrame([(1,)], "k int")
    dim = spark.createDataFrame([(1, "x")], "dk int, name string")
    import pytest

    with pytest.raises(ValueError):
        J.broadcast_dim_join(
            left, dim, left["k"] == dim["dk"], dim_cols=["name"]
        )
    # Column condition without dim_cols still works
    assert J.broadcast_dim_join(left, dim, left["k"] == dim["dk"]).count() == 1


def test_broadcast_dim_join_plan_is_broadcast(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    out = J.broadcast_dim_join(
        o.withColumnRenamed("o_custkey", "c_custkey"), c, "c_custkey",
        dim_cols=["c_name"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_semi_anti_partition(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    right = spark.createDataFrame([(2,), (3,), (4,)], "k int")
    semi = {r.k for r in J.semi_join(left, right, "k").collect()}
    anti = {r.k for r in J.anti_join(left, right, "k").collect()}
    assert semi == {2, 3} and anti == {1}
    assert semi | anti == {1, 2, 3}


def test_null_safe_join_matches_null_keys(spark):
    from quanta_etl_spark.operators import joins as join_ops

    left = spark.createDataFrame(
        [(None, 1), ("x", 2), ("y", 3)], ["k", "a"]
    )
    right = spark.createDataFrame(
        [(None, 10), ("x", 20), ("z", 30)], ["k", "b"]
    )
    inner = {
        (r["k"], r["a"], r["b"])
        for r in join_ops.null_safe_join(left, right, ["k"]).collect()
    }
    assert inner == {(None, 1, 10), ("x", 2, 20)}
    # plan stays a hash/sort-merge join, never a cartesian
    plan = (
        join_ops.null_safe_join(left, right, ["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_temporal_join_validity_semantics(spark):
    """Facts match the version whose [from, to) interval holds their
    ts; pre-first-version facts keep NULLs; open version catches the
    tail."""
    from quanta_etl_spark.operators import joins as J2

    versions = spark.createDataFrame(
        [
            (1, "bronze", "2024-01-01 00:00:00", "2024-02-01 00:00:00"),
            (1, "gold", "2024-02-01 00:00:00", None),
            (2, "silver", "2024-03-01 00:00:00", None),
        ],
        "user long, status string, f string, t string",
    ).select(
        "user", "status",
        F.to_timestamp("f").alias("valid_from"),
        F.to_timestamp("t").alias("valid_to"),
    )
    facts = spark.createDataFrame(
        [
            (10, 1, "2023-12-31 23:59:59"),  # before first version
            (11, 1, "2024-01-15 00:00:00"),  # bronze
            (12, 1, "2024-02-01 00:00:00"),  # boundary -> gold ([from,to))
            (13, 2, "2024-04-01 00:00:00"),  # silver (open)
        ],
        "fid long, user long, d string",
    ).withColumn("ts", F.to_timestamp("d"))
    out = {r["fid"]: r["status"] for r in J2.temporal_join(
        facts, versions, "user", "ts"
    ).collect()}
    assert out == {10: None, 11: "bronze", 12: "gold", 13: "silver"}


def test_temporal_join_inner_drops_unmatched(spark):
    from quanta_etl_spark.operators import joins as J2

    versions = spark.createDataFrame(
        [(1, "v1", "2024-01-01 00:00:00", None)],
        "user long, status string, f string, t string",
    ).select("user", "status",
             F.to_timestamp("f").alias("valid_from"),
             F.to_timestamp("t").alias("valid_to"))
    facts = spark.createDataFrame(
        [(1, 1, "2023-01-01 00:00:00"), (2, 1, "2024-06-01 00:00:00")],
        "fid long, user long, d string",
    ).withColumn("ts", F.to_timestamp("d"))
    got = J2.temporal_join(facts, versions, "user", "ts", how="inner")
    assert [r["fid"] for r in got.collect()] == [2]


def test_interval_overlap_join_banded_equals_naive(spark):
    from quanta_etl_spark.operators import joins as J3

    lrows = [(1, 0.0, 10.0), (2, 20.0, 25.0), (3, 38.0, 42.0)]
    rrows = [(7, 5.0, 8.0), (8, 9.0, 21.0), (9, 42.0, 50.0)]
    left = spark.createDataFrame(lrows, "lid long, s double, e double")
    right = spark.createDataFrame(rrows, "rid long, s2 double, e2 double")
    naive = J3.interval_overlap_join(
        left, right, "lid", "rid", "s", "e", "s2", "e2"
    )
    banded = J3.interval_overlap_join(
        left, right, "lid", "rid", "s", "e", "s2", "e2", bin_width=7.0
    )
    want = {(1, 7), (1, 8), (2, 8)}  # [38,42) vs [42,50) do NOT touch
    got_n = {(r["lid"], r["rid"]) for r in naive.collect()}
    got_b = {(r["lid"], r["rid"]) for r in banded.collect()}
    assert got_n == want and got_b == want
    ov = {(r["lid"], r["rid"]): r["overlap"] for r in banded.collect()}
    assert ov[(1, 7)] == 3.0 and ov[(1, 8)] == 1.0 and ov[(2, 8)] == 1.0


def test_interval_overlap_empty_and_inverted_intervals(spark):
    """[x,x) is empty under half-open semantics (no pair, review r6);
    inverted intervals must yield nothing, not a descending-sequence
    bin explosion."""
    from quanta_etl_spark.operators import joins as J4

    left = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 100.0, 0.0)], "lid long, s double, e double"
    )
    right = spark.createDataFrame(
        [(7, 4.0, 6.0)], "rid long, s2 double, e2 double"
    )
    for bw in (None, 7.0):
        out = J4.interval_overlap_join(
            left, right, "lid", "rid", "s", "e", "s2", "e2", bin_width=bw
        )
        assert out.count() == 0


def test_interval_overlap_integer_bins_exact_at_epoch_magnitude(spark):
    """Integer inputs take the exact long-arithmetic bin path (ADVICE
    r6: the old double epsilon was a no-op at microsecond-epoch
    magnitudes). An interval ending exactly on a bin boundary must not
    occupy the boundary bin, and banded must equal naive at 1.5e15."""
    from pyspark.sql import functions as F
    from quanta_etl_spark.operators import joins as J5

    w = 3_600_000_000  # 1h bins
    base = 416_667 * w  # bin-aligned epoch micros ~1.5e15, ulp(double) ~ 0.25
    lrows = [
        (1, base, base + w),          # ends exactly on a boundary
        (2, base + 2 * w, base + 2 * w + 10),
    ]
    rrows = [
        (7, base + w, base + w + 5),  # starts where lid=1 ends: no pair
        (8, base + w - 3, base + w),  # overlaps lid=1's tail
        (9, base + 2 * w + 5, base + 3 * w),
    ]
    left = spark.createDataFrame(lrows, "lid long, s long, e long")
    right = spark.createDataFrame(rrows, "s2r long, s2 long, e2 long") \
        .withColumnRenamed("s2r", "rid")
    naive = J5.interval_overlap_join(
        left, right, "lid", "rid", "s", "e", "s2", "e2"
    )
    banded = J5.interval_overlap_join(
        left, right, "lid", "rid", "s", "e", "s2", "e2", bin_width=w
    )
    want = {(1, 8), (2, 9)}
    assert {(r["lid"], r["rid"]) for r in naive.collect()} == want
    assert {(r["lid"], r["rid"]) for r in banded.collect()} == want
    # the boundary-ending interval generates exactly one bin cell
    cells = left.where(F.col("lid") == 1).select(
        F.explode(
            F.sequence(
                ((F.col("s") - F.pmod("s", F.lit(w))) / w).cast("long"),
                (
                    ((F.col("e") - 1) - F.pmod(F.col("e") - 1, F.lit(w))) / w
                ).cast("long"),
            )
        )
    ).count()
    assert cells == 1


def test_range_join_integer_bins_exact_at_epoch_magnitude(spark):
    """VERDICT r7 #4: range_join's banded path now mirrors the
    interval_overlap integer-bin rewrite — exact long floor division
    (probe AND interval side) and a true end-exclusive upper bin
    (upper−1), replacing the 1e-9 epsilon that was a double no-op at
    epoch magnitudes. Banded must equal naive at ~1.5e15, and a
    bin-aligned interval must occupy exactly len/width cells."""
    w = 3_600_000_000  # 1h bins in epoch micros
    base = 416_667 * w  # bin-aligned, ~1.5e15
    left = spark.createDataFrame(
        [(1, base), (2, base + w - 1), (3, base + w), (4, base + 2 * w)],
        "qid long, v long",
    )
    right = spark.createDataFrame(
        [("a", base, base + w),          # exactly one bin wide, aligned
         ("b", base + w, base + 3 * w)], # two bins wide, aligned
        "band string, lo long, hi long",
    )
    naive = J.range_join(left, right, None, "v", "lo", "hi")
    banded = J.range_join(left, right, None, "v", "lo", "hi", bin_width=w)
    want = {(1, "a"), (2, "a"), (3, "b"), (4, "b")}
    assert {(r.qid, r.band) for r in naive.collect()} == want
    assert {(r.qid, r.band) for r in banded.collect()} == want
    # the boundary-aligned one-bin interval generates exactly ONE cell
    # (end-exclusive upper bin on integer arithmetic, not epsilon)
    cells = right.where(F.col("band") == "a").select(
        F.explode(
            F.sequence(
                ((F.col("lo") - F.pmod("lo", F.lit(w))) / w).cast("long"),
                (
                    ((F.col("hi") - 1) - F.pmod(F.col("hi") - 1, F.lit(w)))
                    / w
                ).cast("long"),
            )
        )
    ).count()
    assert cells == 1


def test_range_join_empty_and_inverted_intervals(spark):
    """An empty [x,x) or inverted interval matches nothing — and must
    not explode a descending bin sequence on the banded path."""
    left = spark.createDataFrame([(1, 5.0)], "qid long, v double")
    right = spark.createDataFrame(
        [("empty", 5.0, 5.0), ("inv", 100.0, 0.0), ("ok", 4.0, 6.0)],
        "band string, lo double, hi double",
    )
    for bw in (None, 7.0):
        out = J.range_join(
            left, right, None, "v", "lo", "hi", bin_width=bw
        ).collect()
        assert [(r.qid, r.band) for r in out] == [(1, "ok")]
