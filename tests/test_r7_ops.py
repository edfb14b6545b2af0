"""Unit tests for the round-7 operator additions: gaps-and-islands
interval merging, deterministic mode, rolling OLS, dictionary
encoding, and the embedding covariance matrix."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from quanta_etl_spark.operators import aggregates as agg_ops
from quanta_etl_spark.operators import reshape as reshape_ops
from quanta_etl_spark.operators import similarity as sim_ops
from quanta_etl_spark.operators import windows as win_ops


class TestMergeIntervals:
    def test_overlap_touch_and_disjoint(self, spark):
        rows = [
            (1, 0, 10),   # overlaps next
            (1, 5, 12),
            (1, 12, 20),  # touches previous (half-open: merges)
            (1, 30, 40),  # disjoint island
            (2, 0, 5),
        ]
        df = spark.createDataFrame(rows, "k long, s long, e long")
        got = sorted(
            tuple(r)
            for r in win_ops.merge_intervals(df, ["k"], "s", "e").collect()
        )
        assert got == [(1, 0, 20, 3), (1, 30, 40, 1), (2, 0, 5, 1)]

    def test_contained_interval_does_not_split_island(self, spark):
        # [0, 100) contains [10, 20); a later [50, 60) must not open a
        # new island even though it starts after the PREVIOUS ROW's end
        # — the running max over ALL previous ends is what decides.
        rows = [(1, 0, 100), (1, 10, 20), (1, 50, 60), (1, 150, 160)]
        df = spark.createDataFrame(rows, "k long, s long, e long")
        got = sorted(
            tuple(r)
            for r in win_ops.merge_intervals(df, ["k"], "s", "e").collect()
        )
        assert got == [(1, 0, 100, 3), (1, 150, 160, 1)]

    def test_gaps(self, spark):
        rows = [(1, 0, 10), (1, 5, 12), (1, 30, 40), (1, 100, 110), (2, 0, 5)]
        df = spark.createDataFrame(rows, "k long, s long, e long")
        got = sorted(
            tuple(r)
            for r in win_ops.interval_gaps(df, ["k"], "s", "e").collect()
        )
        # key 2 has one island -> no gap rows
        assert got == [(1, 12, 30, 18), (1, 40, 100, 60)]


class TestModeBy:
    def test_tie_breaks_to_smallest_value(self, spark):
        rows = [("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c")]
        df = spark.createDataFrame(rows, "g string, v string")
        got = agg_ops.mode_by(df, ["g"], "v").collect()
        assert [(r.g, r.mode_value, r.n) for r in got] == [("g", "a", 2)]

    def test_nulls_do_not_compete(self, spark):
        rows = [("g", None), ("g", None), ("g", None), ("g", "z")]
        df = spark.createDataFrame(rows, "g string, v string")
        got = agg_ops.mode_by(df, ["g"], "v").collect()
        assert [(r.g, r.mode_value, r.n) for r in got] == [("g", "z", 1)]


class TestRollingRegress:
    def test_recovers_exact_line_on_both_paths(self, spark):
        rows = [(1, i, float(i), 2.0 * i + 1.0) for i in range(6)]
        df = spark.createDataFrame(rows, "k long, o long, x double, y double")
        for scale in (None, 100):
            out = (
                win_ops.rolling_regress(
                    df, ["k"], "o", "x", "y", window_rows=3, scale=scale
                )
                .orderBy("o")
                .collect()
            )
            assert [r.slope for r in out[:2]] == [None, None]
            for r in out[2:]:
                assert math.isclose(r.slope, 2.0, abs_tol=1e-12)
                assert math.isclose(r.intercept, 1.0, abs_tol=1e-9)

    def test_zero_variance_is_null(self, spark):
        rows = [(1, i, 5.0, float(i)) for i in range(4)]
        df = spark.createDataFrame(rows, "k long, o long, x double, y double")
        out = win_ops.rolling_regress(
            df, ["k"], "o", "x", "y", window_rows=3
        ).collect()
        assert all(r.slope is None and r.intercept is None for r in out)

    def test_decimal_overflow_rows_leave_n_and_sums_together(self, spark):
        # one absurd x beyond decimal(18,6): that row must vanish from
        # the fit entirely, so frames containing it have n < window
        rows = [(1, 0, 1.0, 3.0), (1, 1, 1e15, 9.9), (1, 2, 2.0, 5.0),
                (1, 3, 3.0, 7.0), (1, 4, 4.0, 9.0)]
        df = spark.createDataFrame(rows, "k long, o long, x double, y double")
        out = (
            win_ops.rolling_regress(df, ["k"], "o", "x", "y", window_rows=3)
            .orderBy("o")
            .collect()
        )
        # frames ending at o=2,3 contain the overflow row -> n=2 -> NULL
        assert [r.slope for r in out[:4]] == [None, None, None, None]
        assert math.isclose(out[4].slope, 2.0, abs_tol=1e-12)


class TestDictionaryEncode:
    def test_dense_lexicographic_and_partition_independent(self, spark):
        rows = [("b",), ("a",), ("c",), ("a",), (None,)]
        df = spark.createDataFrame(rows, "v string").repartition(5)
        enc, dic = reshape_ops.dictionary_encode(df, "v")
        assert sorted(tuple(r) for r in dic.collect()) == [
            ("a", 0), ("b", 1), ("c", 2)
        ]
        got = sorted(
            (r.v if r.v is not None else "~", r.code)
            for r in enc.collect()
        )
        assert got == [("a", 0), ("a", 0), ("b", 1), ("c", 2), ("~", None)]

    def test_start_offset(self, spark):
        df = spark.createDataFrame([("x",), ("y",)], "v string")
        _, dic = reshape_ops.dictionary_encode(df, "v", start=10)
        assert sorted(tuple(r) for r in dic.collect()) == [("x", 10), ("y", 11)]


class TestEmbeddingCovariance:
    def test_matches_numpy_cov(self, spark):
        rng = np.random.default_rng(7)
        mat = rng.normal(size=(40, 5))
        rows = [(i, [float(v) for v in mat[i]]) for i in range(40)]
        df = spark.createDataFrame(rows, "id long, embedding array<double>")
        got = {
            (r.i, r.j): r.cov
            for r in sim_ops.embedding_covariance(df).collect()
        }
        want = np.cov(mat, rowvar=False)  # sample covariance (ddof=1)
        assert len(got) == 5 * 6 // 2
        for (i, j), v in got.items():
            assert math.isclose(v, want[i][j], rel_tol=1e-9), (i, j)

    def test_null_vectors_excluded(self, spark):
        rows = [(0, [1.0, 2.0]), (1, None), (2, [3.0, 4.0])]
        df = spark.createDataFrame(rows, "id long, embedding array<double>")
        got = {
            (r.i, r.j): r.cov
            for r in sim_ops.embedding_covariance(df).collect()
        }
        assert math.isclose(got[(0, 0)], 2.0)  # var([1,3]) with ddof=1
        assert math.isclose(got[(0, 1)], 2.0)
        assert math.isclose(got[(1, 1)], 2.0)


class TestClusteringCoefficient:
    def test_triangle_and_star(self, spark):
        from quanta_etl_spark.operators import graph as G

        # triangle 1-2-3 plus a pendant 4 attached to 1
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (1, 4)], "src long, dst long"
        )
        got = {r.node: r for r in G.clustering_coefficient(edges).collect()}
        assert got[2].clustering_coeff == 1.0        # deg2, 1 triangle
        assert got[3].clustering_coeff == 1.0
        # node 1: deg 3, 1 triangle -> 2/ (3*2) = 1/3
        assert abs(got[1].clustering_coeff - 1 / 3) < 1e-12
        assert got[4].clustering_coeff is None       # deg 1 -> NULL


class TestKCore:
    def test_peels_tail_chain(self, spark):
        from quanta_etl_spark.operators import graph as G

        # K4 core {1,2,3,4} with a chain 4-5-6 hanging off
        k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        edges = spark.createDataFrame(
            k4 + [(4, 5), (5, 6)], "src long, dst long"
        )
        got = sorted(
            (r.node, r.deg) for r in G.k_core(edges, k=3).collect()
        )
        assert got == [(1, 3), (2, 3), (3, 3), (4, 3)]

    def test_cascading_peel_needs_iterations(self, spark):
        from quanta_etl_spark.operators import graph as G

        # path graph: every 2-core peel removes the two current
        # endpoints; k=2 on a path peels everything, but only after
        # length/2 cascading rounds
        path = [(i, i + 1) for i in range(1, 7)]
        edges = spark.createDataFrame(path, "src long, dst long")
        assert G.k_core(edges, k=2, max_peels=8).count() == 0
        # a cycle, by contrast, IS its own 2-core
        cycle = path + [(7, 1)]
        edges2 = spark.createDataFrame(cycle, "src long, dst long")
        got = sorted(r.node for r in G.k_core(edges2, k=2).collect())
        assert got == [1, 2, 3, 4, 5, 6, 7]


class TestWinsorize:
    def test_clips_to_exact_percentiles(self, spark):
        from quanta_etl_spark.operators import quality as Q

        rows = [("g", float(v)) for v in range(1, 11)]  # 1..10
        df = spark.createDataFrame(rows, "g string, v double")
        out = Q.winsorize(df, ["g"], "v", lower=0.1, upper=0.9)
        got = sorted(r.v_winsorized for r in out.collect())
        # p10 of 1..10 = 1.9, p90 = 9.1 (continuous interpolation)
        assert abs(got[0] - 1.9) < 1e-12
        assert abs(got[-1] - 9.1) < 1e-12
        assert got[1] == 2.0 and got[-2] == 9.0  # interior untouched

    def test_null_passthrough(self, spark):
        from quanta_etl_spark.operators import quality as Q

        df = spark.createDataFrame(
            [("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", None)],
            "g string, v double",
        )
        out = Q.winsorize(df, ["g"], "v", lower=0.25, upper=0.75)
        assert sum(1 for r in out.collect() if r.v_winsorized is None) == 1


class TestFunnelWindowed:
    def test_budget_excludes_slow_converters(self, spark):
        import datetime as dt

        from quanta_etl_spark.operators import events as E2

        base = dt.datetime(2024, 1, 1)

        def t(minutes):
            return base + dt.timedelta(minutes=minutes)

        rows = [
            # u1 converts fast: within 10 min
            (1, t(0), "signup"), (1, t(5), "click"), (1, t(10), "purchase"),
            # u2 clicks in budget but purchases too late
            (2, t(0), "signup"), (2, t(5), "click"), (2, t(120), "purchase"),
            # u3's click is already out of budget
            (3, t(0), "signup"), (3, t(90), "click"), (3, t(95), "purchase"),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string"
        )
        got = {
            r.step_name: r.users
            for r in E2.funnel_report(
                df, ["signup", "click", "purchase"],
                max_span_seconds=3600,
            ).collect()
        }
        assert got == {"signup": 3, "click": 2, "purchase": 1}
        # without the budget everyone converts
        got2 = {
            r.step_name: r.users
            for r in E2.funnel_report(
                df, ["signup", "click", "purchase"]
            ).collect()
        }
        assert got2 == {"signup": 3, "click": 3, "purchase": 3}


class TestPositionAttribution:
    def test_u_shaped_weights(self, spark):
        import datetime as dt

        from quanta_etl_spark.operators import events as E4

        base = dt.datetime(2024, 1, 1)

        def t(minutes):
            return base + dt.timedelta(minutes=minutes)

        rows = [
            # u1: 4 clicks (campaigns 1,2,3,4) then one 100.0 purchase
            (1, t(0), "click", 1, None), (1, t(1), "click", 2, None),
            (1, t(2), "click", 3, None), (1, t(3), "click", 4, None),
            (1, t(4), "purchase", None, 100.0),
            # u2: single click -> full credit
            (2, t(0), "click", 7, None), (2, t(1), "purchase", None, 10.0),
            # u3: click after the purchase attributes nothing
            (3, t(0), "purchase", None, 5.0), (3, t(1), "click", 9, None),
        ]
        df = spark.createDataFrame(
            rows,
            "user_id long, ts timestamp, event_type string, "
            "camp int, value double",
        ).withColumn("event_id", F.monotonically_increasing_id())
        out = E4.attribute_position_based(
            df, "user_id", "ts",
            conversion_pred=F.col("event_type") == "purchase",
            touch_pred=F.col("event_type") == "click",
            touch_key=F.col("camp"),
            value_col="value",
            tiebreak_cols=["event_id"],
        ).collect()
        got = {(r.user_id, r.touch_key): (r.weight, r.credit) for r in out}
        assert got[(1, 1)] == (0.4, 40.0)   # first touch
        assert got[(1, 4)] == (0.4, 40.0)   # last touch
        w2, c2 = got[(1, 2)]
        assert abs(w2 - 0.1) < 1e-12 and abs(c2 - 10.0) < 1e-9
        assert got[(2, 7)] == (1.0, 10.0)   # single touch: 100%
        assert (3, 9) not in got            # post-conversion touch

    def test_two_touch_renormalizes_to_half(self, spark):
        import datetime as dt

        from quanta_etl_spark.operators import events as E5

        base = dt.datetime(2024, 1, 1)
        rows = [
            (1, base, "click", 1, None),
            (1, base + dt.timedelta(minutes=1), "click", 2, None),
            (1, base + dt.timedelta(minutes=2), "purchase", None, 8.0),
        ]
        df = spark.createDataFrame(
            rows,
            "user_id long, ts timestamp, event_type string, "
            "camp int, value double",
        ).withColumn("event_id", F.monotonically_increasing_id())
        out = E5.attribute_position_based(
            df, "user_id", "ts",
            conversion_pred=F.col("event_type") == "purchase",
            touch_pred=F.col("event_type") == "click",
            touch_key=F.col("camp"),
            value_col="value",
            tiebreak_cols=["event_id"],
        ).collect()
        assert sorted((r.touch_key, r.weight, r.credit) for r in out) == [
            (1, 0.5, 4.0), (2, 0.5, 4.0)
        ]


class TestHoltWinters:
    def test_recovers_pure_seasonal_series(self, spark):
        """A perfectly periodic series (no trend): after warmup the
        one-step fitted values converge to the observations, and the
        forecast repeats the cycle."""
        import datetime as dt

        from quanta_etl_spark.operators import resample as RS

        cycle = [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0]
        rows = []
        for d in range(35):  # 5 full weeks
            rows.append(
                (dt.datetime(2024, 1, 1) + dt.timedelta(days=d),
                 cycle[d % 7])
            )
        df = spark.createDataFrame(rows, "ts timestamp, value double")
        out = RS.holt_winters_forecast(
            df, "ts", "value", period=7, horizon=7
        ).orderBy("day").collect()
        hist = [r for r in out if not r.is_forecast]
        fc = [r for r in out if r.is_forecast]
        assert len(hist) == 35 and len(fc) == 7
        # warmup rows carry no fit
        assert all(r.fitted is None for r in hist[:14])
        # trend of a flat-cycled series ~ 0; fits track the cycle
        for r in hist[14:]:
            assert abs(r.fitted - r.observed) < 1e-6, r
        for i, r in enumerate(fc):
            assert abs(r.fitted - cycle[i % 7]) < 1e-6, r

    def test_short_series_raises(self, spark):
        import datetime as dt

        import pytest
        from py4j.protocol import Py4JJavaError

        from quanta_etl_spark.operators import resample as RS

        rows = [
            (dt.datetime(2024, 1, 1) + dt.timedelta(days=d), 1.0)
            for d in range(10)
        ]
        df = spark.createDataFrame(rows, "ts timestamp, value double")
        with pytest.raises(Exception):
            RS.holt_winters_forecast(df, "ts", "value", period=7).collect()


class TestSlidingActiveUsers:
    def test_wau_window_counts(self, spark):
        import datetime as dt

        from quanta_etl_spark.operators import events as E6

        base = dt.datetime(2024, 1, 1)
        rows = []
        # u1 active days 0 and 3; u2 active day 3 only (twice: dedup)
        for d, u in [(0, 1), (3, 1), (3, 2), (3, 2)]:
            rows.append((u, base + dt.timedelta(days=d, hours=5)))
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {
            r.day.day: (r.dau, r.wau, r.stickiness)
            for r in E6.sliding_active_users(df, window_days=7).collect()
        }
        # day 1 (Jan 1): dau=1 (u1), wau=1
        assert got[1] == (1, 1, 1.0)
        # day 4 (Jan 4): dau=2, wau covers both days -> {u1, u2} = 2
        assert got[4] == (2, 2, 1.0)
        # only active days are emitted
        assert set(got) == {1, 4}

    def test_user_counted_once_per_window(self, spark):
        import datetime as dt

        from quanta_etl_spark.operators import events as E7

        base = dt.datetime(2024, 1, 1)
        # u1 active on days 0,1,2 — WAU on day 3 must count them once
        rows = [(1, base + dt.timedelta(days=d)) for d in range(3)]
        rows.append((2, base + dt.timedelta(days=3)))
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {
            r.day.day: (r.dau, r.wau)
            for r in E7.sliding_active_users(df, window_days=7).collect()
        }
        assert got[4] == (1, 2)  # day 4: dau=u2 only; wau={u1,u2}


class TestQuantileNormalize:
    def test_groups_map_to_pooled_shape(self, spark):
        from quanta_etl_spark.operators import quality as Q2

        # group a: 1..5, group b: 101..105 — after normalization both
        # groups span the POOLED distribution identically
        rows = [("a", float(v)) for v in range(1, 6)] + [
            ("b", float(v)) for v in range(101, 106)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        out = Q2.quantile_normalize(df, ["g"], "v", grid=100)
        a = sorted(r.v_qnorm for r in out.where(F.col("g") == "a").collect())
        b = sorted(r.v_qnorm for r in out.where(F.col("g") == "b").collect())
        assert a == b  # identical post-normalization profiles
        # min maps to pooled min, max to pooled max
        assert a[0] == 1.0 and a[-1] == 105.0

    def test_null_rows_survive_with_null_output(self, spark):
        from quanta_etl_spark.operators import quality as Q3

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("a", None)], "g string, v double"
        )
        out = Q3.quantile_normalize(df, ["g"], "v").collect()
        assert len(out) == 3
        nulls = [r for r in out if r.v is None]
        assert len(nulls) == 1 and nulls[0].v_qnorm is None


def test_emb_covariance_arrow_catalyst_bit_parity(spark):
    """The vectorized Arrow path and the Catalyst generator fallback
    quantize per term to the same int64s, so their covariance outputs
    must be BIT-identical (not merely close) — the dedup-module
    dual-path contract."""
    import numpy as np

    from quanta_etl_spark.operators import similarity as S2

    rng = np.random.default_rng(11)
    mat = rng.normal(size=(60, 6))
    # include exact-half quantization boundaries and negatives
    mat[0, :] = 0.5e-12 * np.arange(1, 7)
    rows = [(i, [float(v) for v in mat[i]]) for i in range(60)]
    df = spark.createDataFrame(
        rows, "id long, embedding array<double>"
    ).repartition(7)
    a = {(r.i, r.j): r.cov
         for r in S2.embedding_covariance(df, use_arrow=True).collect()}
    c = {(r.i, r.j): r.cov
         for r in S2.embedding_covariance(df, use_arrow=False).collect()}
    assert a == c


class TestKaplanMeier:
    def test_textbook_curve(self, spark):
        from quanta_etl_spark.operators import events as E8

        subs = spark.createDataFrame(
            [(6, True), (6, True), (6, False), (7, True), (10, False),
             (13, True), (16, False), (22, True), (23, True)],
            "dur long, ev boolean",
        )
        got = E8.kaplan_meier(subs, "dur", "ev").collect()
        # classic Kleinbaum example: S(6)=7/9, S(7)=S(6)*5/6, ...
        want = {6: 7 / 9, 7: 7 / 9 * 5 / 6, 13: 7 / 9 * 5 / 6 * 3 / 4,
                22: 7 / 9 * 5 / 6 * 3 / 4 * 1 / 2, 23: 0.0}
        for r in got:
            assert abs(r.survival - want[r.t]) < 1e-9, r
        # wiped-out final risk set: survival 0, log undefined
        last = [r for r in got if r.t == 23][0]
        assert last.survival == 0.0 and last.log_survival is None
        # censored-only times never appear
        assert {r.t for r in got} == set(want)

    def test_no_censoring_matches_empirical(self, spark):
        from quanta_etl_spark.operators import events as E9

        subs = spark.createDataFrame(
            [(t, True) for t in [1, 2, 2, 3, 5]], "dur long, ev boolean"
        )
        got = {r.t: r.survival for r in
               E9.kaplan_meier(subs, "dur", "ev").collect()}
        # without censoring KM equals the empirical survivor function
        assert abs(got[1] - 4 / 5) < 1e-12
        assert abs(got[2] - 2 / 5) < 1e-12
        assert abs(got[3] - 1 / 5) < 1e-12
        assert got[5] == 0.0


class TestScoreAuc:
    def test_perfect_reversed_and_tied(self, spark):
        from quanta_etl_spark.operators import aggregates as A2

        perfect = spark.createDataFrame(
            [(0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1)], "s double, y int"
        )
        assert A2.score_auc(perfect, "s", "y").collect()[0].auc == 1.0
        reverse = spark.createDataFrame(
            [(0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1)], "s double, y int"
        )
        assert A2.score_auc(reverse, "s", "y").collect()[0].auc == 0.0
        tied = spark.createDataFrame(
            [(0.5, 0), (0.5, 1)] * 5, "s double, y int"
        )
        assert A2.score_auc(tied, "s", "y").collect()[0].auc == 0.5

    def test_matches_pair_counting(self, spark):
        import random

        from quanta_etl_spark.operators import aggregates as A3

        rng = random.Random(17)
        rows = [(round(rng.random(), 2), rng.randrange(2)) for _ in range(80)]
        df = spark.createDataFrame(rows, "s double, y int")
        got = A3.score_auc(df, "s", "y").collect()[0]
        pos = [s for s, y in rows if y == 1]
        neg = [s for s, y in rows if y == 0]
        wins = sum(
            1.0 if p > q else (0.5 if p == q else 0.0)
            for p in pos for q in neg
        )
        assert abs(got.auc - wins / (len(pos) * len(neg))) < 1e-12
        # single-class input -> NULL, not a crash or a fake 0.5
        one = spark.createDataFrame([(0.3, 1), (0.7, 1)], "s double, y int")
        assert A3.score_auc(one, "s", "y").collect()[0].auc is None


class TestPsiDrift:
    def test_identical_distributions_zero(self, spark):
        from quanta_etl_spark.operators import aggregates as A4

        base = spark.createDataFrame(
            [(float(v),) for v in range(500)], "v double"
        )
        total = A4.psi_drift(base, base, "v", bins=10).where(
            F.col("bucket") == -1
        ).collect()[0]
        assert total.psi_term == 0.0
        assert total.n_base == total.n_current == 500

    def test_shift_raises_psi(self, spark):
        from quanta_etl_spark.operators import aggregates as A5

        base = spark.createDataFrame(
            [(float(v),) for v in range(500)], "v double"
        )
        cur = spark.createDataFrame(
            [(float(v) + 150,) for v in range(500)], "v double"
        )
        total = A5.psi_drift(base, cur, "v", bins=10).where(
            F.col("bucket") == -1
        ).collect()[0]
        assert total.psi_term > 0.25  # a 30% shift is a "shifted" alarm

    def test_empty_current_side_null_fracs_not_abort(self, spark):
        """An empty current side (e.g. a day with no data yet) must
        yield NULL frac_current, not an ANSI 0/0 job abort (r9 sweep)."""
        from quanta_etl_spark.operators import aggregates as A6

        base = spark.createDataFrame(
            [(float(v),) for v in range(100)], "v double"
        )
        cur = spark.createDataFrame([], "v double")
        rows = A6.psi_drift(base, cur, "v", bins=5).collect()
        per = [r for r in rows if r.bucket != -1]
        assert per and all(r.frac_current is None for r in per)
        assert all(r.n_current == 0 for r in per)
        assert all(r.frac_base is not None for r in per)


class TestCrossCorrelation:
    def test_acf_of_exact_ar_series(self, spark):
        import datetime as dt
        import math

        from quanta_etl_spark.operators import resample as RS2

        # deterministic weekly-cycled series: ACF must peak at lag 7
        base = dt.datetime(2024, 1, 1)
        rows = []
        for d in range(28):
            v = [100.0, 80.0, 60.0, 40.0, 60.0, 80.0, 90.0][d % 7]
            rows.append((base + dt.timedelta(days=d, hours=3), v))
        df = spark.createDataFrame(rows, "ts timestamp, value double")
        out = {r.lag: (r.n, r.corr) for r in RS2.cross_correlation(
            df, "ts", "value", "value", max_lag=7
        ).collect()}
        assert out[0][1] == 1.0 or abs(out[0][1] - 1.0) < 1e-9
        assert abs(out[7][1] - 1.0) < 1e-9   # perfect weekly cycle
        assert out[7][0] == 21               # 28 days, lag 7 -> 21 pairs
        assert out[1][1] < 0.9               # off-cycle lags decorrelate

    def test_cross_lead_detection(self, spark):
        import datetime as dt

        from quanta_etl_spark.operators import resample as RS3

        # y is x shifted 2 days: xcorr must peak at lag 2
        base = dt.datetime(2024, 1, 1)
        xs = [float((d * 37) % 11) for d in range(20)]
        rows = []
        for d in range(20):
            rows.append((base + dt.timedelta(days=d), xs[d], 0.0))
        for d in range(18):
            rows.append(
                (base + dt.timedelta(days=d + 2), 0.0, xs[d])
            )
        df = spark.createDataFrame(rows, "ts timestamp, x double, y double")
        from pyspark.sql import functions as F2

        out = {r.lag: r.corr for r in RS3.cross_correlation(
            df, "ts", F2.col("x"), F2.col("y"), max_lag=4
        ).collect()}
        best = max((v, k) for k, v in out.items() if v is not None)
        assert best[1] == 2 and best[0] > 0.99


class TestOutlierEnsemble:
    def test_votes_and_detectors(self, spark):
        from quanta_etl_spark.operators import quality as Q4

        rows = [(i, "g", 100.0 + (i % 7)) for i in range(200)]
        rows += [(900, "g", 100000.0), (901, "g", -50000.0)]
        df = spark.createDataFrame(rows, "id long, g string, v double")
        out = Q4.outlier_ensemble(
            df, ["g"], "v", id_cols=["id"]
        ).collect()
        flagged = {r.id: r for r in out}
        assert flagged[900].is_outlier and flagged[900].votes == 3
        assert flagged[901].is_outlier
        # the bulk never appears (votes >= 1 filter)
        assert all(r.id >= 900 or r.votes >= 1 for r in out)
        assert len(out) < 30

    def test_zero_mad_disables_mad_detector(self, spark):
        from quanta_etl_spark.operators import quality as Q5

        # >50% identical values -> MAD = 0 -> detector off, not
        # everything-flagged; IQR/extreme still catch the spike
        rows = [(i, "g", 5.0) for i in range(100)] + [(999, "g", 500.0)]
        df = spark.createDataFrame(rows, "id long, g string, v double")
        out = Q5.outlier_ensemble(df, ["g"], "v", id_cols=["id"]).collect()
        ids = {r.id for r in out}
        assert ids == {999}
        assert not [r for r in out if r.id == 999][0].flag_mad


class TestReviewFixesR7:
    def test_winsorize_null_group_rows_pass_through(self, spark):
        """Review r7: NULL-group rows must survive (unclipped), not
        vanish through an inner bounds join."""
        from quanta_etl_spark.operators import quality as Q6

        rows = [("g", float(v)) for v in range(10)] + [(None, 4.2)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = Q6.winsorize(df, ["g"], "v", lower=0.1, upper=0.9).collect()
        assert len(out) == 11
        nulls = [r for r in out if r.g is None]
        assert len(nulls) == 1 and nulls[0].v_winsorized == 4.2

    def test_attribution_weight_validation_and_renormalization(self, spark):
        import datetime as dt

        import pytest

        from quanta_etl_spark.operators import events as E10

        base = dt.datetime(2024, 1, 1)
        rows = [
            (1, base, "click", 1, None),
            (1, base + dt.timedelta(minutes=1), "click", 2, None),
            (1, base + dt.timedelta(minutes=2), "purchase", None, 10.0),
        ]
        df = spark.createDataFrame(
            rows,
            "user_id long, ts timestamp, event_type string, "
            "camp int, value double",
        ).withColumn("event_id", F.monotonically_increasing_id())
        kw = dict(
            conversion_pred=F.col("event_type") == "purchase",
            touch_pred=F.col("event_type") == "click",
            touch_key=F.col("camp"),
            value_col="value",
            tiebreak_cols=["event_id"],
        )
        # over-unity pair rejected (middle credit would go negative)
        with pytest.raises(ValueError, match="sum <= 1"):
            E10.attribute_position_based(
                df, "user_id", "ts",
                first_weight=0.6, last_weight=0.6, **kw,
            )
        # asymmetric 2-touch renormalizes proportionally, not 50/50
        out = E10.attribute_position_based(
            df, "user_id", "ts", first_weight=0.6, last_weight=0.2, **kw
        ).collect()
        got = {r.touch_key: r.weight for r in out}
        assert abs(got[1] - 0.75) < 1e-12 and abs(got[2] - 0.25) < 1e-12

    def test_holt_winters_rejects_gapped_series(self, spark):
        import datetime as dt

        import pytest

        from quanta_etl_spark.operators import resample as RS4

        rows = [
            (dt.datetime(2024, 1, 1) + dt.timedelta(days=d), 1.0 + d % 7)
            for d in range(20)
            if d != 9  # one missing calendar day
        ]
        df = spark.createDataFrame(rows, "ts timestamp, value double")
        with pytest.raises(Exception, match="contiguous"):
            RS4.holt_winters_forecast(
                df, "ts", "value", period=7, horizon=3
            ).collect()

    def test_funnel_budget_accepts_scientific_notation_floats(self, spark):
        import datetime as dt

        from quanta_etl_spark.operators import events as E11

        base = dt.datetime(2024, 1, 1)
        rows = [(1, base, "a"), (1, base + dt.timedelta(seconds=1), "b")]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string"
        )
        # 1e-05 seconds: the old INTERVAL f-string was unparseable here
        got = {
            r.step_name: r.users
            for r in E11.funnel_report(
                df, ["a", "b"], max_span_seconds=1e-05
            ).collect()
        }
        assert got == {"a": 1, "b": 0}
        got2 = {
            r.step_name: r.users
            for r in E11.funnel_report(
                df, ["a", "b"], max_span_seconds=1e05
            ).collect()
        }
        assert got2 == {"a": 1, "b": 1}


class TestAdviceFixesR8:
    """Regression tests for the five ADVICE r7 findings."""

    def test_xcorr_zero_overlap_lag_reports_null_not_vanishes(self, spark):
        """A lag with zero overlapping periods must appear as
        (lag, 0, NULL) — previously the inner join dropped it."""
        import datetime as dt

        from quanta_etl_spark.operators import resample as RS

        base = dt.datetime(2024, 1, 1)
        rows = [
            (base + dt.timedelta(days=d), float((d * 13) % 5) * 1000.0)
            for d in range(5)
        ]
        df = spark.createDataFrame(rows, "ts timestamp, value double")
        out = {
            r.lag: (r.n, r.corr)
            for r in RS.cross_correlation(
                df, "ts", "value", "value", max_lag=6
            ).collect()
        }
        assert sorted(out) == [0, 1, 2, 3, 4, 5, 6]
        assert out[5] == (0, None) and out[6] == (0, None)
        # lags 3/4 overlap in 2/1 periods: n kept, corr NULL (< 3)
        assert out[3] == (2, None) and out[4] == (1, None)
        assert out[0][0] == 5 and abs(out[0][1] - 1.0) < 1e-12

    def test_attribution_rejects_zero_end_weights(self, spark):
        """fw + lw == 0 made the 2-touch renormalization 0/0 -> NaN."""
        import datetime as dt

        import pytest

        from quanta_etl_spark.operators import events as E

        base = dt.datetime(2024, 1, 1)
        rows = [
            (1, base, "click", 1, None),
            (1, base + dt.timedelta(minutes=1), "click", 2, None),
            (1, base + dt.timedelta(minutes=2), "purchase", None, 10.0),
        ]
        df = spark.createDataFrame(
            rows,
            "user_id long, ts timestamp, event_type string, "
            "camp int, value double",
        ).withColumn("event_id", F.monotonically_increasing_id())
        with pytest.raises(ValueError, match="must be > 0"):
            E.attribute_position_based(
                df, "user_id", "ts",
                conversion_pred=F.col("event_type") == "purchase",
                touch_pred=F.col("event_type") == "click",
                touch_key=F.col("camp"),
                value_col="value",
                tiebreak_cols=["event_id"],
                first_weight=0.0, last_weight=0.0,
            )

    def test_holt_winters_rejects_null_day(self, spark):
        """A calendar-contiguous day whose values are all NULL must
        raise, not silently poison the recursion with NaN."""
        import datetime as dt

        import pytest

        from quanta_etl_spark.operators import resample as RS

        rows = [
            (
                dt.datetime(2024, 1, 1) + dt.timedelta(days=d),
                None if d == 9 else 1.0 + d % 7,
            )
            for d in range(20)
        ]
        df = spark.createDataFrame(rows, "ts timestamp, value double")
        with pytest.raises(Exception, match="NULL/NaN"):
            RS.holt_winters_forecast(
                df, "ts", "value", period=7, horizon=3
            ).collect()

    def test_calibration_bins_requires_tiebreaks_or_optin(self, spark):
        import pytest

        rows = [(float(i % 10), i % 2 == 0, i) for i in range(100)]
        df = spark.createDataFrame(rows, "s double, y boolean, id long")
        with pytest.raises(ValueError, match="nondeterministic"):
            agg_ops.calibration_bins(df, "s", "y", bins=5)
        # explicit opt-in still runs (duplicate-free-score callers)
        out = agg_ops.calibration_bins(
            df, "s", "y", bins=5, allow_nondeterministic_ties=True
        ).collect()
        assert [r.n for r in out] == [20, 20, 20, 20, 20]
        # and the deterministic spelling is unchanged
        out2 = agg_ops.calibration_bins(
            df, "s", "y", bins=5, tiebreak_cols=["id"]
        ).collect()
        assert [r.n for r in out2] == [20, 20, 20, 20, 20]


class TestStrictExclusionAccounting:
    """VERDICT r7 #5: the decimal stat paths silently drop rows whose
    values overflow decimal(18,6) (|x| >= 1e12); strict=True must turn
    that into an execution-time error with an explicit count."""

    def _frames(self, spark):
        rows = [("g", float(i), float(2 * i)) for i in range(1, 25)]
        clean = spark.createDataFrame(rows, "g string, x double, y double")
        dirty = clean.union(
            spark.createDataFrame(
                [("g", 1e13, 2e13)], "g string, x double, y double"
            )
        )
        return clean, dirty

    def test_ols_regress_strict(self, spark):
        import pytest

        clean, dirty = self._frames(spark)
        # default: silent exclusion, n reflects the smaller sample
        r = agg_ops.ols_regress(dirty, "y", "x", ["g"]).collect()[0]
        assert r.n == 24 and abs(r.slope - 2.0) < 1e-9
        # strict: clean passes, dirty raises with the explicit signal
        ok = agg_ops.ols_regress(clean, "y", "x", ["g"], strict=True)
        assert ok.collect()[0].n == 24
        with pytest.raises(Exception, match="at least one row.*excluded"):
            agg_ops.ols_regress(
                dirty, "y", "x", ["g"], strict=True
            ).collect()

    def test_rolling_corr_strict(self, spark):
        import pytest

        clean, dirty = self._frames(spark)
        ok = win_ops.rolling_corr(
            clean, ["g"], "x", "x", "y", window_rows=5, strict=True
        )
        assert ok.count() == 24
        with pytest.raises(Exception, match="rolling_corr.*excluded"):
            win_ops.rolling_corr(
                dirty, ["g"], "x", "x", "y", window_rows=5, strict=True
            ).collect()
        # non-strict on the same input: runs, row silently excluded
        assert win_ops.rolling_corr(
            dirty, ["g"], "x", "x", "y", window_rows=5
        ).count() == 25

    def test_rolling_regress_strict(self, spark):
        import pytest

        clean, dirty = self._frames(spark)
        ok = win_ops.rolling_regress(
            clean, ["g"], "x", "x", "y", window_rows=5, strict=True
        )
        assert ok.count() == 24
        with pytest.raises(Exception, match="rolling_regress.*excluded"):
            win_ops.rolling_regress(
                dirty, ["g"], "x", "x", "y", window_rows=5, strict=True
            ).collect()

    def test_strict_with_scale_raises_immediately(self, spark):
        """ADVICE r8: strict=True was silently ignored when scale was
        set — the int64 fast path has no exclusion semantics, so the
        combination must be rejected loudly, not no-op'd."""
        import pytest

        clean, _ = self._frames(spark)
        for fn in (win_ops.rolling_corr, win_ops.rolling_regress):
            with pytest.raises(ValueError, match="strict=True is only"):
                fn(
                    clean, ["g"], "x", "x", "y",
                    window_rows=5, scale=100, strict=True,
                )
        # scale without strict still works (fast path unaffected)
        assert (
            win_ops.rolling_corr(
                clean, ["g"], "x", "x", "y", window_rows=5, scale=100
            ).count()
            == 24
        )

    def test_exclusion_guard_is_eager_and_action_proof(self, spark):
        """The guard must raise no matter how the caller consumes (or
        never consumes) the result. Three successive LAZY formulations
        each left a silent-no-op hole — empty result plan (ADVICE r8),
        take/limit partition short-circuit (r9 self-review), and any
        caller filter above the union being constant-folded into the
        guard branch and pruned with the assertion (r9 second review,
        confirmed by execution). The guard is therefore EAGER: it
        raises ValueError at attach time when excluded is non-empty."""
        import pytest
        from pyspark.sql import functions as F

        from quanta_etl_spark.operators.util import attach_exclusion_guard

        base = spark.range(100).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        )
        excluded = base.where(F.col("id") < 5)  # 5 "excluded" rows
        # failure path is a single take(1) job (ADVICE r9 #4): the
        # message reports existence, not an exact count
        with pytest.raises(ValueError, match="at least one row.*excluded"):
            attach_exclusion_guard(base, excluded, "eager_op")
        # the historical bypass shapes cannot recur: the raise happens
        # before ANY action — take, filter-then-collect, or no action
        # at all — because there is no guarded plan to mis-optimize.

        # clean guard: result returned untouched (same plan object),
        # rows flow through take(), filters, and full collects
        clean = attach_exclusion_guard(
            base, base.where(F.lit(False)), "eager_op"
        )
        assert clean is base
        got = clean.where(F.col("v") > 10).take(3)
        assert len(got) == 3 and all(r.id is not None for r in got)
        # empty clean result stays empty with its schema intact
        empty_ok = attach_exclusion_guard(
            base.where(F.lit(False)),
            base.where(F.lit(False)),
            "eager_op",
        )
        assert empty_ok.collect() == []
        assert empty_ok.columns == ["id", "v"]

    def test_strict_raises_even_when_output_is_filtered(self, spark):
        """The r9-second-review bypass, end-to-end: a caller who
        filters a strict operator's output (e.g. dropping NULL
        correlations — natural code) must still get the exclusion
        error, not silently pruned rows."""
        import pytest
        from pyspark.sql import functions as F

        clean, dirty = self._frames(spark)
        with pytest.raises(Exception, match="rolling_corr.*excluded"):
            win_ops.rolling_corr(
                dirty, ["g"], "x", "x", "y", window_rows=5, strict=True
            ).where(F.col("rolling_corr").isNotNull()).collect()
