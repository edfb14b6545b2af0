from __future__ import annotations

from pyspark.sql import functions as F

from quanta_etl_spark.operators import aggregates as A
from quanta_etl_spark.operators import quality as Q
from quanta_etl_spark.operators import resample as R
from quanta_etl_spark.operators import setops as S


def test_summarize(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0)], "k string, v double"
    )
    out = {
        r.k: (r.total, r.n)
        for r in A.summarize(df, ["k"], {"total": ("sum", "v"), "n": ("count", "v")}).collect()
    }
    assert out == {"a": (4.0, 2), "b": (5.0, 1)}


def test_group_stat_operators_support_global_case(spark):
    """r9 second review: every by=[]-documented operator crashed with a
    bare IndexError inside pyspark's join (join on an empty key list).
    The global case is a 1-row aggregate broadcast cross-joined back —
    it must work and must agree with the single-group equivalent."""
    rows = [(float(i),) for i in range(1, 21)] + [(1000.0,), (None,)]
    df = spark.createDataFrame(rows, "v double")
    one_group = df.withColumn("g", F.lit("all"))

    # iqr_outliers: global flags == single-group flags
    glob = {
        r.v: r.is_outlier
        for r in Q.iqr_outliers(df, "v", []).collect()
    }
    ref = {
        r.v: r.is_outlier
        for r in Q.iqr_outliers(one_group, "v", ["g"]).collect()
    }
    assert glob == ref and glob[1000.0] is True

    # winsorize: bounds clip identically
    gw = sorted(
        r.v_winsorized
        for r in Q.winsorize(df, [], "v").collect()
        if r.v_winsorized is not None
    )
    rw = sorted(
        r.v_winsorized
        for r in Q.winsorize(one_group, ["g"], "v").collect()
        if r.v_winsorized is not None
    )
    assert gw == rw

    # impute_group_mean: the docstring's own "global fillna" case
    imp = Q.impute_group_mean(df, "v", [])
    assert imp.where(F.col("v").isNull()).count() == 0

    # mad_outliers and outlier_ensemble: run and flag the spike
    mad = {r.v: r.is_outlier for r in Q.mad_outliers(df, "v", []).collect()}
    assert mad[1000.0] is True
    ens = Q.outlier_ensemble(df, [], "v")
    flagged = {r.value for r in ens.collect()}
    assert 1000.0 in flagged


def test_summarize_shared_percentile_buffer_equivalence(spark):
    """r9: percentile_P specs on the same column compile to ONE
    array-percentage Percentile aggregate + post-projection. The
    rewrite must be invisible: bit-identical values, same aliases,
    same column order (group cols first, then aggs insertion order),
    mixed non-percentile specs untouched."""
    import random

    rng = random.Random(7)
    rows = [
        (rng.choice("abc"), rng.uniform(-1e6, 1e6), rng.randint(0, 99))
        for _ in range(500)
    ] + [("a", None, 5)]  # NULLs must behave identically too
    df = spark.createDataFrame(rows, "k string, v double, w int")
    aggs = {
        "p25": ("percentile_25", "v"),
        "total_w": ("sum", "w"),
        "p99": ("percentile_99", "v"),
        "p50": ("percentile_50", "v"),
        "wp50": ("percentile_50", "w"),  # single spec on another col
        "n": ("count", "v"),
    }
    shared = A.summarize(df, ["k"], aggs)
    assert shared.columns == ["k", "p25", "total_w", "p99", "p50", "wp50", "n"]
    # reference: force the scalar path by asking one quantile at a time
    ref = {}
    for alias, (fn, col) in aggs.items():
        got = {
            r.k: r.x
            for r in df.groupBy("k")
            .agg(A._agg_exprs({"x": (fn, col)})[0])
            .collect()
        }
        ref[alias] = got
    for r in shared.collect():
        for alias in aggs:
            assert getattr(r, alias) == ref[alias][r.k], (alias, r.k)


def test_summarize_percentile_column_specs_and_alias_collisions(spark):
    """ADVICE r9 #1/#2: (a) percentile specs whose SOURCE is a Column
    object must fall through to the unshared path (Column.__hash__ is
    None — the sharing dict would raise TypeError), and (b) a user
    alias that collides with the internal ``__pct_`` slot prefix must
    not shadow or duplicate the shared-buffer columns."""
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(10)] + [("b", float(i)) for i in range(5)],
        "k string, v double",
    )
    # (a) two Column-source percentile specs: pre-r9 behavior preserved
    col_aggs = {
        "p50": ("percentile_50", F.col("v") * 2),
        "p90": ("percentile_90", F.col("v") * 2),
    }
    got = {r.k: (r.p50, r.p90) for r in A.summarize(df, ["k"], col_aggs).collect()}
    assert got["b"] == (4.0, 7.2)
    # (b) user aliases squatting on the internal prefix
    clash_aggs = {
        "__pct_0": ("percentile_25", "v"),
        "__pct_1": ("percentile_75", "v"),
        "n": ("count", "v"),
    }
    out = A.summarize(df, ["k"], clash_aggs)
    assert out.columns == ["k", "__pct_0", "__pct_1", "n"]
    row = {r.k: r for r in out.collect()}["a"]
    assert (row["__pct_0"], row["__pct_1"], row["n"]) == (2.25, 6.75, 10)


def test_rollup_has_grand_total(spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 3)], "k1 string, k2 string, v int"
    )
    out = A.rollup_agg(df, ["k1", "k2"], {"s": ("sum", "v")}).collect()
    rows = {(r.k1, r.k2): r.s for r in out}
    assert rows[(None, None)] == 6
    assert rows[("a", None)] == 3
    assert len(out) == 6  # 3 leaves + 2 k1-subtotals + 1 grand total


def test_cube_counts(spark):
    df = spark.createDataFrame([("a", "x", 1)], "k1 string, k2 string, v int")
    assert A.cube_agg(df, ["k1", "k2"], {"s": ("sum", "v")}).count() == 4


def test_grouping_sets(spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("b", "y", 2)], "k1 string, k2 string, v int"
    )
    out = A.grouping_sets_agg(df, [["k1"], ["k2"]], ["k1", "k2"], {"s": ("sum", "v")})
    assert out.count() == 4  # 2 k1 groups + 2 k2 groups


def test_pivot_explicit_values(spark):
    df = spark.createDataFrame(
        [("n1", "s1", 1.0), ("n1", "s2", 2.0), ("n2", "s1", 3.0)],
        "k string, seg string, v double",
    )
    out = A.pivot_agg(df, ["k"], "seg", ["s1", "s2"], ("sum", "v"))
    rows = {r.k: (r.s1, r.s2) for r in out.collect()}
    assert rows == {"n1": (1.0, 2.0), "n2": (3.0, None)}


def test_expect_and_offenders(spark):
    df = spark.createDataFrame(
        [("m1", "a", None), ("m1", "b", "i1"), ("m2", "c", None)],
        "seg string, leg string, isin string",
    )
    res = Q.expect(df, F.col("isin").isNotNull(), name="isin_present")
    assert res.violations == 2 and not res.passed
    off = Q.offenders(df, "isin is null", ["seg"])
    assert sorted(r.seg for r in off.collect()) == ["m1", "m2"]


def test_expect_unique(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], "k int")
    assert not Q.expect_unique(df, ["k"]).passed
    assert Q.expect_unique(df.distinct(), ["k"]).passed


def test_null_report_single_row(spark):
    df = spark.createDataFrame(
        [(1, None), (None, None), (3, "x")], "a int, b string"
    )
    row = Q.null_report(df).first()
    assert row.a == 1 and row.b == 2


def test_ohlcv_resample(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1, 9, 0)
    bars = [
        ("X", base + dt.timedelta(minutes=m), o, h, l, c, v, n)
        for m, (o, h, l, c, v, n) in enumerate(
            [(10.0, 12.0, 9.0, 11.0, 100, 5), (11.0, 15.0, 10.0, 14.0, 200, 7),
             (14.0, 16.0, 13.0, 13.5, 50, 2)]
        )
    ]
    df = spark.createDataFrame(
        bars,
        "isin string, ts timestamp, start_price double, max_price double, "
        "min_price double, end_price double, traded_volume long, number_of_trades long",
    )
    out = R.ohlcv_resample(df, "ts", ["isin"], "1 hour").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.start_price, r.max_price, r.min_price, r.end_price) == (10.0, 16.0, 9.0, 13.5)
    assert (r.traded_volume, r.number_of_trades) == (350, 14)


def test_setops(spark):
    a = spark.createDataFrame([(1,), (2,), (2,)], "k int")
    b = spark.createDataFrame([(2,), (3,)], "k int")
    assert S.union_all(a, b).count() == 5
    assert S.union_distinct(a, b).count() == 3
    assert {r.k for r in S.intersect(a, b).collect()} == {2}
    assert {r.k for r in S.except_(a, b).collect()} == {1}
    assert S.except_all(a, b).count() == 2  # one 2 survives multiplicity


def test_approx_aggregates_within_tolerance(spark, sf_dir):
    """approx_count_distinct (HLL++) and percentile approximations can't
    hash-match an oracle; pin them to tolerance bands vs exact instead."""
    from pyspark.sql import functions as F

    from quanta_etl_spark.sources.testdata import load_table

    o = load_table(spark, sf_dir, "orders")
    row = o.agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50_exact"),
        F.expr("percentile_approx(o_totalprice, 0.5, 10000)").alias("p50_approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05
    assert abs(row["p50_approx"] - row["p50_exact"]) / row["p50_exact"] < 0.01


def test_hll_sketch_distinct_and_merge(spark, sf_dir):
    """Sketch estimate within 5% of exact; daily sketches merged to a
    global estimate match a directly-computed global sketch."""
    from pyspark.sql import functions as F

    from quanta_etl_spark.operators.aggregates import sketch_distinct, sketch_merge
    from quanta_etl_spark.sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    daily = sketch_distinct(ev, ["day"], "user_id", sketch_col="sk")
    exact_daily = ev.groupBy("day").agg(F.countDistinct("user_id").alias("exact"))
    joined = daily.join(exact_daily, "day").collect()
    assert joined
    for r in joined:
        assert abs(r["approx_distinct_user_id"] - r["exact"]) / max(r["exact"], 1) < 0.05

    merged = sketch_merge(daily, [], "sk").collect()[0]["approx_distinct"]
    exact_total = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    assert abs(merged - exact_total) / exact_total < 0.05


def test_two_stage_agg_matches_plain(spark, sf_dir):
    from pyspark.sql import functions as F

    from quanta_etl_spark.operators.aggregates import two_stage_agg
    from quanta_etl_spark.sources.testdata import load_table

    li = load_table(spark, sf_dir, "lineitem")
    staged = two_stage_agg(
        li, ["l_returnflag"],
        {"n": ("count", "l_orderkey"), "max_qty": ("max", "l_quantity")},
        salt=8,
    )
    plain = li.groupBy("l_returnflag").agg(
        F.count("l_orderkey").alias("n"), F.max("l_quantity").alias("max_qty")
    )
    assert sorted(tuple(r) for r in staged.collect()) == \
        sorted(tuple(r) for r in plain.collect())


def test_two_stage_agg_rejects_non_algebraic(spark, sf_dir):
    import pytest as _pytest

    from quanta_etl_spark.operators.aggregates import two_stage_agg
    from quanta_etl_spark.sources.testdata import load_table

    li = load_table(spark, sf_dir, "lineitem")
    with _pytest.raises(ValueError):
        two_stage_agg(li, ["l_returnflag"], {"m": ("median", "l_quantity")})


def test_impute_group_mean(spark):
    from quanta_etl_spark.operators import quality as Q

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", None), ("b", 10.0), ("b", None)],
        "k string, v double",
    )
    out = {(r.k, i): r.v for i, r in enumerate(
        Q.impute_group_mean(df, "v", ["k"]).orderBy("k", "v").collect())}
    vals = sorted(v for (k, _), v in out.items() if k == "a")
    assert vals == [1.0, 2.0, 3.0]  # null got the group mean 2.0
    vals_b = sorted(v for (k, _), v in out.items() if k == "b")
    assert vals_b == [10.0, 10.0]


def test_iqr_outliers_modes(spark):
    from quanta_etl_spark.operators import quality as Q

    rows = [("g", float(v)) for v in [10, 11, 12, 13, 14, 100]]
    df = spark.createDataFrame(rows, "k string, v double")
    only = Q.iqr_outliers(df, "v", ["k"], k=1.5, mode="only").collect()
    assert [r.v for r in only] == [100.0]
    drop = Q.iqr_outliers(df, "v", ["k"], k=1.5, mode="drop")
    assert drop.count() == 5
    flag = Q.iqr_outliers(df, "v", ["k"], k=1.5, mode="flag")
    assert flag.where("is_outlier").count() == 1
    import pytest as _pt
    with _pt.raises(ValueError):
        Q.iqr_outliers(df, "v", ["k"], mode="bogus")


def test_l2_normalize(spark):
    from quanta_etl_spark.functions import vectors as V

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "id long, v array<double>"
    )
    got = {r.id: r.u for r in df.select("id", V.l2_normalize("v").alias("u")).collect()}
    assert got[1] == [0.6, 0.8]
    assert got[2] == [0.0, 0.0]  # zero vector stays zero, no NaN


def test_validate_split_quarantine(spark):
    from quanta_etl_spark.operators import quality as quality_ops
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [
            (1, 10.0, "a"),
            (2, -5.0, "b"),      # fails positive
            (3, None, "c"),      # NULL predicate -> quarantined
            (4, 7.0, None),      # fails named
            (5, -1.0, None),     # fails both
        ],
        ["id", "v", "name"],
    )
    good, bad = quality_ops.validate_split(
        df,
        {
            "positive": F.col("v") > 0,
            "named": F.col("name").isNotNull(),
        },
    )
    assert sorted(r["id"] for r in good.collect()) == [1]
    got = {r["id"]: r["failed_rules"] for r in bad.collect()}
    assert got == {
        2: "positive",
        3: "positive",
        4: "named",
        5: "positive,named",
    }


def test_iqr_outliers_approx_mode(spark):
    """approx_percentile mode: bounded sketch state for unbounded
    groups. At high accuracy on small groups it matches exact quartiles
    bit-for-bit, so the fence decisions agree."""
    rows = [("a", float(v)) for v in range(1, 101)] + [("a", 1000.0)] + [
        ("b", float(v)) for v in (1, 2, 3, 500)
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    exact = Q.iqr_outliers(df, "v", ["k"], k=1.5, mode="only", exact=True)
    approx = Q.iqr_outliers(df, "v", ["k"], k=1.5, mode="only", exact=False)
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, approx.collect())
    )
    assert {tuple(r) for r in approx.select("k", "v").collect()} >= {
        ("a", 1000.0)
    }


def test_profile_columns_one_pass(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "a", None), (3, None, 3.5), (3, "b", 3.5)],
        "id long, name string, v double",
    )
    out = {r["column"]: r for r in Q.profile_columns(df).collect()}
    assert set(out) == {"id", "name", "v"}
    assert out["id"].n_rows == 4 and out["id"].n_null == 0
    assert out["id"].n_distinct == 3
    assert (out["id"].min_str, out["id"].max_str) == ("1", "3")
    assert out["name"].n_null == 1 and out["name"].n_distinct == 2
    assert out["v"].n_null == 1 and out["v"].n_distinct == 2
    # single aggregation + map-side stack: exactly one shuffle
    from quanta_etl_spark.plans import inspect as P

    assert P.count_shuffles(Q.profile_columns(df)) <= 1


def test_profile_columns_hostile_names(spark):
    """ADVICE r5: names with spaces, dots, quotes, and backticks must
    profile correctly — the unpivot is typed Column API, no SQL text."""
    df = (
        spark.range(3)
        .withColumnRenamed("id", "col with space")
        .withColumn("a.dotted`tick", F.lit("x'y"))
    )
    out = {r["column"]: r for r in Q.profile_columns(df).collect()}
    assert set(out) == {"col with space", "a.dotted`tick"}
    assert out["col with space"].n_distinct == 3
    assert out["a.dotted`tick"].n_distinct == 1
    assert out["a.dotted`tick"].min_str == "x'y"


def test_profile_columns_approx_mode(spark):
    df = spark.createDataFrame(
        [(i % 7, f"s{i % 3}") for i in range(1000)], "a int, b string"
    )
    out = {r["column"]: r for r in
           Q.profile_columns(df, exact_distinct=False).collect()}
    # HLL at these cardinalities is exact
    assert out["a"].n_distinct == 7
    assert out["b"].n_distinct == 3
    assert out["a"].n_rows == 1000


def test_reconcile_totals(spark):
    import pytest

    fact = spark.createDataFrame(
        [(1, 100.0), (2, 50.0), (3, 10.0)], "k long, total double"
    )
    detail = spark.createDataFrame(
        [(1, 60.0), (1, 40.0), (2, 49.0)], "fk long, amt double"
    )
    out = {r["k"]: r for r in Q.reconcile_totals(
        fact, detail, "k", "fk", "total", F.col("amt"), tolerance=0.05
    ).collect()}
    assert out[1]["recomputed"] == 100.0 and out[1]["within_tolerance"]
    assert out[2]["rel_diff"] == pytest.approx(0.02)
    assert out[2]["within_tolerance"] is True
    # no detail rows: NULL recomputed, surfaced as out-of-tolerance
    assert out[3]["recomputed"] is None
    assert out[3]["within_tolerance"] is False


def test_table_checksum_order_invariant_and_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, None, 0.25)],
        "k long, s string, v double",
    )
    base = Q.table_checksum(df, ["k", "s", "v"]).collect()[0]
    assert base["n_rows"] == 3
    # row order / partitioning invariance
    shuffled = Q.table_checksum(
        df.orderBy(F.desc("k")).repartition(5), ["k", "s", "v"]
    ).collect()[0]
    assert shuffled["checksum"] == base["checksum"]
    # any single-value change moves the checksum
    changed = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, None, 0.250001)],
        "k long, s string, v double",
    )
    assert Q.table_checksum(changed, ["k", "s", "v"]).collect()[0][
        "checksum"
    ] != base["checksum"]


def test_exact_group_percentiles_matches_percentile_aggregate(spark):
    """r13: the sort-based exact_group_percentiles must be BIT-identical
    to Spark's Percentile aggregate — same interpolation arithmetic
    ((hi−pos)·v_lo + (pos−lo)·v_hi with both shortcut branches) — over
    randomized ragged groups, ties, nulls, and a null group key."""
    import numpy as np

    rng = np.random.default_rng(17)
    rows = []
    for gi in range(9):
        n = int(rng.integers(1, 700))
        vals = rng.normal(0, 1e5, n)
        vals[rng.random(n) < 0.25] = float(np.round(vals[0]))  # ties
        rows += [(f"g{gi}", float(x)) for x in vals]
    rows += [("g0", None)] * 5 + [(None, 1.0), (None, 5.0), (None, 9.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    fracs = [0.0, 0.005, 0.25, 1 / 3, 0.5, 0.75, 0.995, 1.0]
    names = [f"p{i}" for i in range(len(fracs))]
    ref = (
        df.groupBy("k")
        .agg(F.percentile("v", F.array(*[F.lit(x) for x in fracs])).alias("p"))
        .select("k", *[F.col("p")[i].alias(n) for i, n in enumerate(names)])
    )
    got = Q.exact_group_percentiles(df, ["k"], "v", fracs, names)
    r = {row["k"]: [row[n] for n in names] for row in ref.collect()}
    g = {row["k"]: [row[n] for n in names] for row in got.collect()}
    assert set(r) == set(g)
    for k in r:
        for a, b in zip(r[k], g[k]):
            assert a == b or (a is None and b is None), (k, a, b)


def test_outlier_ensemble_sort_path_bit_equal(spark, monkeypatch):
    """The size-adaptive percentile strategy must not change results:
    force the big (sort) path via the threshold and compare every row
    against the aggregate path."""
    import numpy as np

    rng = np.random.default_rng(23)
    rows = []
    for gi, flag in enumerate(["A", "N", "R"]):
        base = rng.normal(1000 * (gi + 1), 50, 400)
        base[:5] += 5000  # definite outliers
        rows += [(i, flag, float(v)) for i, v in enumerate(base)]
    df = spark.createDataFrame(rows, "rid int, flag string, v double")

    def run():
        return sorted(
            map(
                tuple,
                Q.outlier_ensemble(
                    df, ["flag"], "v", id_cols=["rid"]
                ).collect(),
            )
        )

    # ADVICE r14 (medium): createDataFrame plans estimate sizeInBytes
    # = Long.MaxValue, so without forcing the estimate DOWN the
    # "small" baseline would ALSO take the sort path and the test
    # would compare the big path to itself. Pin the aggregate path
    # explicitly (a threshold bump cannot exceed Long.MaxValue), then
    # pin the sort path for the comparison run.
    monkeypatch.setattr(Q, "_plan_size_bytes", lambda _df: 0)
    small = run()
    monkeypatch.setattr(Q, "_plan_size_bytes", lambda _df: 1 << 62)
    big = run()
    assert small == big and len(small) > 0


def test_quantile_normalize_sort_path_bit_equal(spark, monkeypatch):
    """r14: the size-adaptive percent-rank strategy must not change
    results — window rank vs range-sort rank, bit-for-bit, over
    randomized ragged groups with heavy ties, NULL values, a NULL
    group key, and a single-row group."""
    import numpy as np

    rng = np.random.default_rng(41)
    rows = []
    for gi in range(5):
        n = int(rng.integers(1, 500))
        vals = np.round(rng.normal(0, 100, n), 1)  # 1-decimal => ties
        rows += [
            (1000 * gi + i, f"g{gi}", float(x)) for i, x in enumerate(vals)
        ]
    rows += [(9001, "g0", None), (9002, None, 3.5), (9003, None, 3.5)]
    rows += [(9004, "solo", 42.0)]  # single-value group -> p = 0.0
    df = spark.createDataFrame(rows, "rid long, k string, v double")

    def run():
        out = Q.quantile_normalize(df, ["k"], "v", grid=20)
        return sorted(
            (r["rid"], r["v_qnorm"]) for r in out.collect()
        )

    monkeypatch.setattr(Q, "_plan_size_bytes", lambda _df: 0)
    small = run()
    monkeypatch.setattr(Q, "_plan_size_bytes", lambda _df: 1 << 62)
    big = run()
    assert len(small) == len(rows)
    assert small == big


def test_iqr_mad_winsorize_sort_path_bit_equal(spark, monkeypatch):
    """r14: _group_percentile_stats gates iqr_outliers, mad_outliers
    and winsorize onto the range-sort percentile path at scale — both
    strategies must agree bit-for-bit, grouped AND global (by=[]),
    with ties, NULL values, a NULL group key, and an all-NULL group."""
    import numpy as np

    rng = np.random.default_rng(29)
    rows = []
    rid = 0
    for gi in range(4):
        n = int(rng.integers(2, 400))
        vals = np.round(rng.normal(50 * gi, 30, n), 1)
        vals[: max(1, n // 50)] += 4000  # definite outliers
        for x in vals:
            rows.append((rid, f"g{gi}", float(x))); rid += 1
    rows += [(9001, "g0", None), (9002, None, 7.5), (9003, None, 7.5)]
    rows += [(9004, "allnull", None), (9005, "allnull", None)]
    df = spark.createDataFrame(rows, "rid long, k string, v double")

    def runs():
        out = []
        for by in (["k"], []):
            out.append(sorted(
                (r["rid"], r["is_outlier"])
                for r in Q.iqr_outliers(df, "v", by).collect()
            ))
            out.append(sorted(
                (r["rid"], r["is_outlier"], r["mad_score"])
                for r in Q.mad_outliers(df, "v", by).collect()
            ))
            out.append(sorted(
                (r["rid"], r["v_winsorized"])
                for r in Q.winsorize(df, by, "v").collect()
            ))
        return out

    monkeypatch.setattr(Q, "_plan_size_bytes", lambda _df: 0)
    small = runs()
    monkeypatch.setattr(Q, "_plan_size_bytes", lambda _df: 1 << 62)
    big = runs()
    assert all(len(s) == len(rows) for s in small)  # row-preserving
    assert small == big
