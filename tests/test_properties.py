"""Property tests (SURVEY.md §5): algebraic invariants that hold for
any input — cheap to check, catch whole classes of operator bugs.

* forward-fill is idempotent;
* resample composes: hourly(minutely(x)) == hourly(x);
* returns of a constant price series are 0;
* as-of join never attaches a future value (backward direction);
* sessionize: session ids are 1..k per key, non-decreasing in time;
* MinHash LSH pairs are a subset of exact-Jaccard pairs at the same
  threshold (verification step removes all false positives);
* salted join equals the plain join exactly.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from quanta_etl_spark.operators import dedup as dedup_ops
from quanta_etl_spark.operators import joins as join_ops
from quanta_etl_spark.operators import resample as resample_ops
from quanta_etl_spark.operators import windows as win_ops


def _collect_sorted(df):
    return sorted([tuple(r) for r in df.collect()])


@pytest.fixture(scope="module")
def bars(spark):
    base = dt.datetime(2020, 11, 24, 8, 0)
    rows = []
    for isin in ["A", "B"]:
        for m in range(0, 180, 7):  # sparse minutes over 3 hours
            price = 100.0 + (m % 13) + (0.5 if isin == "B" else 0.0)
            rows.append((isin, base + dt.timedelta(minutes=m), price, 10.0 + m))
    return spark.createDataFrame(
        rows, "isin string, trading_ts timestamp, end_price double, traded_volume double"
    )


def test_forward_fill_idempotent(spark, bars):
    sparse = bars.withColumn(
        "end_price", F.when(F.minute("trading_ts") % 3 == 0, F.col("end_price"))
    )
    once = win_ops.forward_fill(sparse, ["end_price"], ["isin"], ["trading_ts"])
    twice = win_ops.forward_fill(once, ["end_price"], ["isin"], ["trading_ts"])
    assert _collect_sorted(once) == _collect_sorted(twice)


def test_resample_composes(spark, bars):
    ohlc = bars.select(
        "isin", "trading_ts",
        F.col("end_price").alias("start_price"),
        F.col("end_price").alias("max_price"),
        F.col("end_price").alias("min_price"),
        "end_price", "traded_volume",
    )

    def rs(df, interval):
        return resample_ops.ohlcv_resample(
            df, ts="trading_ts", keys=["isin"], interval=interval,
            volume_cols=("traded_volume",),
        )

    minutely = rs(ohlc, "1 minute")
    hourly_direct = rs(ohlc, "1 hour")
    hourly_of_minutely = rs(
        minutely.withColumnRenamed("bucket_ts", "trading_ts"), "1 hour"
    )

    def key(df):
        return {
            (r["isin"], r["bucket_ts"]): (
                r["start_price"], r["max_price"], r["min_price"],
                r["end_price"], r["traded_volume"],
            )
            for r in df.collect()
        }

    assert key(hourly_direct) == key(hourly_of_minutely)


def test_constant_price_zero_returns(spark):
    base = dt.datetime(2021, 1, 1)
    rows = [("X", base + dt.timedelta(minutes=i), 50.0) for i in range(20)]
    df = spark.createDataFrame(rows, "isin string, ts timestamp, price double")
    out = win_ops.lag_returns(df, "price", ["isin"], ["ts"], out="ret")
    vals = [r["ret"] for r in out.where(F.col("ret").isNotNull()).collect()]
    assert len(vals) == 19
    assert all(v == 0.0 for v in vals)


def test_asof_never_attaches_future(spark):
    base = dt.datetime(2021, 1, 1)
    left = spark.createDataFrame(
        [(i + 1, "k", base + dt.timedelta(seconds=s)) for i, s in enumerate((5, 15, 25))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k", base + dt.timedelta(seconds=s), float(s)) for s in (0, 10, 20, 30)],
        "k string, ts timestamp, v double",
    )
    out = join_ops.asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        value_cols=["v"], direction="backward",
    )
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got == {1: 0.0, 2: 10.0, 3: 20.0} or list(got.values()) == [0.0, 10.0, 20.0]


def test_sessionize_monotone_dense(spark):
    base = dt.datetime(2021, 6, 1)
    gaps = [0, 5, 10, 100, 105, 300, 305, 310]  # minutes
    df = spark.createDataFrame(
        [(7, i, base + dt.timedelta(minutes=m)) for i, m in enumerate(gaps)],
        "user_id long, event_id long, ts timestamp",
    )
    out = win_ops.sessionize(df, "user_id", "ts", gap_seconds=1800,
                             order_tiebreak=["event_id"])
    rows = sorted(out.collect(), key=lambda r: r["event_id"])
    ids = [r["session_id"] for r in rows]
    assert ids == [1, 1, 1, 2, 2, 3, 3, 3]


def test_minhash_subset_of_exact(spark, sf_dir):
    from quanta_etl_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 80)
    exact = dedup_ops.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5)
    lsh = dedup_ops.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5)
    exact_pairs = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    lsh_pairs = {(r["id_a"], r["id_b"]) for r in lsh.collect()}
    assert lsh_pairs <= exact_pairs  # verification kills false positives


def test_salted_join_equals_plain(spark, sf_dir):
    from quanta_etl_spark.sources.testdata import load_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("custkey")
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    salted = join_ops.salted_join(o, c, "custkey", salt=4)
    plain = o.join(c, "custkey")
    assert _collect_sorted(salted.select("o_orderkey", "custkey", "c_mktsegment")) == \
        _collect_sorted(plain.select("o_orderkey", "custkey", "c_mktsegment"))


# ---- round 6 invariants (event analytics / interpolation / frontier) ----


def test_interpolate_dense_series_is_identity(spark, sf_dir):
    """Interpolating a series with NO nulls must change nothing."""
    from quanta_etl_spark.sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events").limit(500)
    out = win_ops.linear_interpolate(
        ev, "user_id", "ts", "value", tiebreak_cols=["event_id"],
        out_col="f",
    )
    assert out.where(F.col("f") != F.col("value")).count() == 0


def test_interpolate_idempotent(spark, sf_dir):
    """interpolate(interpolate(x)) == interpolate(x): after one pass no
    nulls remain between observations, so a second pass is identity."""
    from quanta_etl_spark.sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value", F.when(F.col("event_type") != "error", F.col("value"))
    )
    once = win_ops.linear_interpolate(
        ev, "user_id", "ts", "value", tiebreak_cols=["event_id"],
        out_col="value",
    )
    twice = win_ops.linear_interpolate(
        once, "user_id", "ts", "value", tiebreak_cols=["event_id"],
        out_col="value2",
    )
    # exact equality: pass 2 sees no nulls, takes the v-not-null branch
    assert twice.where(
        ~F.col("value2").eqNullSafe(F.col("value"))
    ).count() == 0


def test_funnel_counts_monotone_nonincreasing(spark, sf_dir):
    """Each funnel step can only lose users."""
    from quanta_etl_spark.operators import events as event_ops
    from quanta_etl_spark.sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = event_ops.funnel_report(
        ev, ["signup", "view", "click", "purchase"]
    ).orderBy("step_index").collect()
    users = [r.users for r in rows]
    assert all(a >= b for a, b in zip(users, users[1:]))


def test_skyline_mutually_nondominating_and_sound(spark, sf_dir):
    """No output point strictly dominates another; and every output
    point survives a brute-force dominance check against ALL points."""
    from quanta_etl_spark.sources.testdata import load_table

    li = load_table(spark, sf_dir, "lineitem").limit(300)
    pts = [(r.l_extendedprice, r.l_quantity)
           for r in li.select("l_extendedprice", "l_quantity").collect()]
    sky = [(r.l_extendedprice, r.l_quantity)
           for r in win_ops.skyline_2d(li, "l_extendedprice", "l_quantity").collect()]

    def dominated(p, qs):
        return any(
            q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
            for q in qs
        )

    assert sky, "frontier cannot be empty on non-empty input"
    for p in sky:
        assert not dominated(p, sky), f"{p} dominated within frontier"
        assert not dominated(p, pts), f"{p} dominated by a dropped point"
    # completeness: every non-dominated input point is in the frontier
    expect = {p for p in set(pts) if not dominated(p, pts)}
    assert set(sky) == expect


def test_skyline_band_count_invariant(spark, sf_dir):
    """The banded two-phase skyline must give identical results for any
    band count (1 band == the textbook single-pass algorithm)."""
    from quanta_etl_spark.sources.testdata import load_table

    li = load_table(spark, sf_dir, "lineitem").limit(500)
    a = set(map(tuple, win_ops.skyline_2d(
        li, "l_extendedprice", "l_quantity", num_bands=1).collect()))
    b = set(map(tuple, win_ops.skyline_2d(
        li, "l_extendedprice", "l_quantity", num_bands=17).collect()))
    assert a == b


def test_twap_constant_series_equals_constant(spark, sf_dir):
    from quanta_etl_spark.operators import events as event_ops
    from quanta_etl_spark.sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events").withColumn("value", F.lit(7.5))
    out = event_ops.time_weighted_avg(ev, "value").collect()
    assert all(abs(r.twap - 7.5) < 1e-9 for r in out)


def test_pagerank_mass_conserved_without_dangling(spark):
    """On a graph where every node has an out-edge, total rank mass is
    exactly 1 after any number of iterations (decimal-exact sums)."""
    from quanta_etl_spark.operators import graph as graph_ops

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")],
        "src string, dst string",
    )
    out = graph_ops.pagerank(edges, iterations=7).collect()
    assert abs(sum(r.rank for r in out) - 1.0) < 1e-12


# --- round-7 operator invariants ---


def test_merge_intervals_covers_same_point_set(spark):
    """Islands cover exactly the union of input intervals: every
    input start is inside some island, islands are disjoint and
    non-touching, and total island length >= any single interval."""
    import random

    rng = random.Random(7)
    rows = []
    for k in range(4):
        for _ in range(40):
            s = rng.randrange(0, 1000)
            rows.append((k, s, s + rng.randrange(1, 60)))
    df = spark.createDataFrame(rows, "k long, s long, e long")
    islands = win_ops.merge_intervals(df, ["k"], "s", "e").collect()
    per_key: dict = {}
    for r in islands:
        per_key.setdefault(r.k, []).append((r.island_start, r.island_end))
    for k, isl in per_key.items():
        isl.sort()
        # disjoint and non-touching (touching would have merged)
        for (s1, e1), (s2, e2) in zip(isl, isl[1:]):
            assert e1 < s2, (k, (s1, e1), (s2, e2))
        # exact cover: union of inputs == union of islands
        pts = set()
        for kk, s, e in rows:
            if kk == k:
                pts.update(range(s, e))
        ipts = set()
        for s, e in isl:
            ipts.update(range(s, e))
        assert pts == ipts, k
    # island count + gaps are consistent duals
    gaps = win_ops.interval_gaps(df, ["k"], "s", "e").collect()
    n_gaps: dict = {}
    for r in gaps:
        n_gaps[r.k] = n_gaps.get(r.k, 0) + 1
    for k, isl in per_key.items():
        assert n_gaps.get(k, 0) == len(isl) - 1


def test_winsorize_bounds_interior_and_order(spark):
    """Winsorize invariants: output lies within [p_lo, p_hi], interior
    values pass through UNCHANGED, and clipping preserves order.
    (Exact idempotence does NOT hold under interpolated quantiles —
    clamped boundary mass shifts the interpolation on a second pass —
    so it is deliberately not asserted.)"""
    import random

    from quanta_etl_spark.operators import quality as Q

    rng = random.Random(13)
    rows = [("g", rng.gauss(0, 100)) for _ in range(500)]
    df = spark.createDataFrame(rows, "g string, v double")
    once = Q.winsorize(df, ["g"], "v", lower=0.1, upper=0.9)
    got = sorted((r.v, r.v_winsorized) for r in once.collect())
    ws = [w for _, w in got]
    lo, hi = min(ws), max(ws)
    n_clipped = 0
    for v, w in got:
        assert lo <= w <= hi
        if lo < v < hi:
            assert w == v  # interior untouched
        else:
            n_clipped += 1
    assert 0 < n_clipped < len(got)  # both tails actually clipped
    # order preserving: v1 <= v2 => w1 <= w2
    for (v1, w1), (v2, w2) in zip(got, got[1:]):
        assert w1 <= w2


def test_quantile_normalize_pooled_identity(spark):
    """Normalizing a SINGLE group onto its own pooled distribution is
    the identity at every grid point (rank p maps to the pooled
    quantile at p, which is the value itself when the pool IS the
    group) — up to grid interpolation, which is exact when group size
    matches the grid."""
    from quanta_etl_spark.operators import quality as Q

    rows = [("g", float(v)) for v in range(101)]  # 0..100, grid=100
    df = spark.createDataFrame(rows, "g string, v double")
    out = Q.quantile_normalize(df, ["g"], "v", grid=100).collect()
    for r in out:
        assert abs(r.v_qnorm - r.v) < 1e-9, r


def test_mode_by_majority_invariant(spark):
    """Whatever value holds a strict majority in a group IS the mode,
    under any partitioning."""
    import random

    from quanta_etl_spark.operators import aggregates as A

    rng = random.Random(3)
    rows = [("g", "maj")] * 60 + [
        ("g", f"m{rng.randrange(20)}") for _ in range(40)
    ]
    df = spark.createDataFrame(rows, "g string, v string").repartition(11)
    got = A.mode_by(df, ["g"], "v").collect()
    assert [(r.g, r.mode_value, r.n) for r in got] == [("g", "maj", 60)]


def test_kcore_is_subgraph_fixpoint(spark):
    """Every node in the reported k-core has degree >= k WITHIN the
    core (fixpoint property), for a random graph."""
    import random

    from quanta_etl_spark.operators import graph as G

    rng = random.Random(5)
    edges = list({
        (min(a, b), max(a, b))
        for a, b in (
            (rng.randrange(30), rng.randrange(30)) for _ in range(120)
        )
        if a != b
    })
    df = spark.createDataFrame(edges, "src long, dst long")
    core = {r.node: r.deg for r in G.k_core(df, k=3, max_peels=12).collect()}
    # recompute degrees inside the reported core
    for n0, d0 in core.items():
        d = sum(
            1 for a, b in edges
            if (a == n0 and b in core) or (b == n0 and a in core)
        )
        assert d == d0 and d >= 3, (n0, d, d0)
