"""Unit tests for operators/events.py (funnel, cohort, TWAP) and the
round-6 window/aggregate additions (interpolation, rolling median,
histogram, skyline)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from quanta_etl_spark.operators import aggregates as agg_ops
from quanta_etl_spark.operators import events as event_ops
from quanta_etl_spark.operators import windows as win_ops


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _events(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


class TestFunnel:
    def test_ordered_funnel_counts(self, spark):
        rows = [
            # u1 completes in order: A(1) B(2) C(3)
            (1, _ts(1), 1, "A", 0.0),
            (2, _ts(2), 1, "B", 0.0),
            (3, _ts(3), 1, "C", 0.0),
            # u2 does B BEFORE A, never again -> stops at A
            (4, _ts(1), 2, "B", 0.0),
            (5, _ts(2), 2, "A", 0.0),
            (6, _ts(3), 2, "C", 0.0),  # C without qualifying B: no count
            # u3 A then B only
            (7, _ts(1), 3, "A", 0.0),
            (8, _ts(5), 3, "B", 0.0),
            # u4 never enters
            (9, _ts(1), 4, "C", 0.0),
        ]
        out = event_ops.funnel_report(
            _events(spark, rows), ["A", "B", "C"]
        ).collect()
        by_step = {r.step_name: r.users for r in out}
        assert by_step == {"A": 3, "B": 2, "C": 1}
        assert [r.step_index for r in sorted(out, key=lambda r: r.step_index)] == [0, 1, 2]

    def test_same_timestamp_counts(self, spark):
        # B at exactly t(A) counts (>= semantics)
        rows = [
            (1, _ts(1), 1, "A", 0.0),
            (2, _ts(1), 1, "B", 0.0),
        ]
        out = event_ops.funnel_report(_events(spark, rows), ["A", "B"]).collect()
        assert {r.step_name: r.users for r in out} == {"A": 1, "B": 1}

    def test_user_steps_keeps_broken_chain_users(self, spark):
        # u1's only B precedes their A: must still appear with t_1 null
        rows = [
            (1, _ts(5), 1, "A", 0.0),
            (2, _ts(1), 1, "B", 0.0),
        ]
        out = event_ops.funnel_user_steps(
            _events(spark, rows), ["A", "B"]
        ).collect()
        assert len(out) == 1
        assert out[0].t_0 is not None and out[0].t_1 is None


class TestCohortRetention:
    def test_weekly_triangle(self, spark):
        # week of 2024-01-01 (Mon) and week of 2024-01-08
        rows = [
            (1, dt.datetime(2024, 1, 2), 1, "x", 0.0),   # cohort w1
            (2, dt.datetime(2024, 1, 9), 1, "x", 0.0),   # w1 + 1
            (3, dt.datetime(2024, 1, 3), 2, "x", 0.0),   # cohort w1
            (4, dt.datetime(2024, 1, 10), 3, "x", 0.0),  # cohort w2
        ]
        out = event_ops.cohort_retention(_events(spark, rows)).collect()
        got = {(str(r.cohort), r.period_offset): r.active_users for r in out}
        assert got == {
            ("2024-01-01", 0): 2,
            ("2024-01-01", 1): 1,
            ("2024-01-08", 0): 1,
        }


class TestTimeWeightedAvg:
    def test_holding_time_weights(self, spark):
        # value 10 held 60s, value 20 held 120s, value 99 held 0 (last)
        rows = [
            (1, _ts(0), 1, "x", 10.0),
            (2, _ts(1), 1, "x", 20.0),
            (3, _ts(3), 1, "x", 99.0),
        ]
        out = event_ops.time_weighted_avg(_events(spark, rows), "value").collect()
        assert len(out) == 1
        expect = (10.0 * 60 + 20.0 * 120) / 180
        assert abs(out[0].twap - expect) < 1e-9
        assert out[0].n_obs == 3

    def test_single_observation_falls_back_to_value(self, spark):
        rows = [(1, _ts(0), 1, "x", 42.0)]
        out = event_ops.time_weighted_avg(_events(spark, rows), "value").collect()
        assert out[0].twap == 42.0


class TestLinearInterpolate:
    def test_interior_interpolation(self, spark):
        rows = [
            (1, _ts(0), 1, "x", 10.0),
            (2, _ts(1), 1, "x", None),   # 1/3 of the way 10 -> 40
            (3, _ts(3), 1, "x", 40.0),
        ]
        out = win_ops.linear_interpolate(
            _events(spark, rows), "user_id", "ts", "value",
            tiebreak_cols=["event_id"], out_col="f",
        ).orderBy("event_id").collect()
        assert [r.f for r in out] == [10.0, 20.0, 40.0]

    def test_edges_fall_back_to_nearest(self, spark):
        rows = [
            (1, _ts(0), 1, "x", None),  # before first obs -> back-fill
            (2, _ts(1), 1, "x", 5.0),
            (3, _ts(2), 1, "x", None),  # after last obs -> forward-fill
        ]
        out = win_ops.linear_interpolate(
            _events(spark, rows), "user_id", "ts", "value",
            tiebreak_cols=["event_id"], out_col="f",
        ).orderBy("event_id").collect()
        assert [r.f for r in out] == [5.0, 5.0, 5.0]

    def test_all_null_key_stays_null(self, spark):
        rows = [(1, _ts(0), 1, "x", None), (2, _ts(1), 1, "x", None)]
        out = win_ops.linear_interpolate(
            _events(spark, rows), "user_id", "ts", "value",
            tiebreak_cols=["event_id"], out_col="f",
        ).collect()
        assert all(r.f is None for r in out)


class TestRollingMedian:
    def test_trailing_window_median(self, spark):
        rows = [
            (i, _ts(i), 1, "x", float(v))
            for i, v in enumerate([1, 9, 5, 3, 7])
        ]
        out = win_ops.rolling_median(
            _events(spark, rows), "user_id", "ts", "value",
            window_rows=3, tiebreak_cols=["event_id"],
        ).orderBy("event_id").collect()
        meds = [r.rolling_median for r in out]
        assert meds == [1.0, 5.0, 5.0, 5.0, 5.0]


class TestHistogram:
    def test_buckets_dense_with_clamping(self, spark):
        df = spark.createDataFrame(
            [(float(v),) for v in [-5, 0, 10, 10, 25, 99, 150]], "x double"
        )
        out = agg_ops.histogram_fixed(df, "x", lo=0.0, hi=100.0, num_bins=4)
        got = {r.bucket: (r.bucket_lo, r.bucket_hi, r.n) for r in out.collect()}
        # -5 clamps into bucket 0; 150 clamps into bucket 3
        assert got[0] == (0.0, 25.0, 4)
        assert got[1] == (25.0, 50.0, 1)
        assert got[2] == (50.0, 75.0, 0)   # zero-count bucket present
        assert got[3] == (75.0, 100.0, 2)

    def test_nulls_excluded(self, spark):
        df = spark.createDataFrame([(1.0,), (None,)], "x double")
        out = agg_ops.histogram_fixed(df, "x", 0.0, 10.0, 2)
        assert sum(r.n for r in out.collect()) == 1


class TestSkyline:
    def test_strict_dominance_frontier(self, spark):
        # minimize x, maximize y
        pts = [(1.0, 5.0), (2.0, 9.0), (3.0, 9.0), (2.0, 1.0), (0.5, 2.0)]
        df = spark.createDataFrame(pts, "x double, y double")
        out = {(r.x, r.y) for r in win_ops.skyline_2d(df, "x", "y").collect()}
        # (3,9) dominated by (2,9); (2,1) dominated by (1,5); rest survive
        assert out == {(0.5, 2.0), (1.0, 5.0), (2.0, 9.0)}

    def test_duplicates_collapse(self, spark):
        df = spark.createDataFrame(
            [(1.0, 1.0), (1.0, 1.0)], "x double, y double"
        )
        out = win_ops.skyline_2d(df, "x", "y").collect()
        assert len(out) == 1


class TestMaxDrawdown:
    def test_deepest_peak_to_trough(self, spark):
        # path: 100, 80 (dd .2), 120 (peak), 60 (dd .5), 90
        rows = [
            (1, _ts(0), 1, "x", 100.0),
            (2, _ts(1), 1, "x", 80.0),
            (3, _ts(2), 1, "x", 120.0),
            (4, _ts(3), 1, "x", 60.0),
            (5, _ts(4), 1, "x", 90.0),
        ]
        out = win_ops.max_drawdown(
            _events(spark, rows), "user_id", "ts", "value",
            tiebreak_cols=["event_id"],
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert abs(r.max_drawdown - 0.5) < 1e-12
        assert r.peak_value == 120.0 and r.trough_value == 60.0

    def test_monotonic_series_zero_drawdown(self, spark):
        rows = [(i, _ts(i), 1, "x", float(10 + i)) for i in range(4)]
        out = win_ops.max_drawdown(
            _events(spark, rows), "user_id", "ts", "value",
            tiebreak_cols=["event_id"],
        ).collect()
        assert out[0].max_drawdown == 0.0

    def test_zero_peak_rows_excluded_not_abort(self, spark):
        """A zero running peak (series starting at 0) has no defined
        drawdown fraction: those rows are excluded from the argmax and
        never ANSI-abort the job (r9 division-hazard sweep)."""
        rows = [
            (1, _ts(0), 1, "x", 0.0),     # run_max = 0 -> undefined dd
            (2, _ts(1), 1, "x", 100.0),
            (3, _ts(2), 1, "x", 40.0),    # real dd = 0.6
        ]
        out = win_ops.max_drawdown(
            _events(spark, rows), "user_id", "ts", "value",
            tiebreak_cols=["event_id"],
        ).collect()
        assert len(out) == 1
        assert abs(out[0].max_drawdown - 0.6) < 1e-12
        assert out[0].peak_value == 100.0 and out[0].trough_value == 40.0

    def test_null_values_cannot_win_argmax(self, spark):
        """NULL values previously produced a NULL neg_dd struct field,
        which sorts FIRST under min and silently won the argmax; they
        must be ignored."""
        rows = [
            (1, _ts(0), 1, "x", 100.0),
            (2, _ts(1), 1, "x", None),
            (3, _ts(2), 1, "x", 75.0),
        ]
        out = win_ops.max_drawdown(
            _events(spark, rows), "user_id", "ts", "value",
            tiebreak_cols=["event_id"],
        ).collect()
        assert abs(out[0].max_drawdown - 0.25) < 1e-12
        assert out[0].trough_value == 75.0


class TestAnomalyZscore:
    def test_flags_spike_not_baseline(self, spark):
        vals = [10.0, 11.0, 9.0, 10.0, 10.5, 9.5, 10.0, 500.0, 10.0]
        rows = [(i, _ts(i), 1, "x", v) for i, v in enumerate(vals)]
        out = win_ops.anomaly_zscore(
            _events(spark, rows), "user_id", "ts", "value",
            window_rows=20, threshold=3.0, tiebreak_cols=["event_id"],
        ).collect()
        flagged = {r.event_id for r in out if r.is_anomaly}
        assert flagged == {7}

    def test_first_rows_never_flagged(self, spark):
        rows = [(1, _ts(0), 1, "x", 1e9), (2, _ts(1), 1, "x", 0.0)]
        out = win_ops.anomaly_zscore(
            _events(spark, rows), "user_id", "ts", "value",
            tiebreak_cols=["event_id"],
        ).collect()
        assert not any(r.is_anomaly for r in out)


class TestVwap:
    def test_volume_weighting(self, spark):
        from quanta_etl_spark.operators import resample as resample_ops
        df = spark.createDataFrame(
            [("a", 10.0, 1.0), ("a", 20.0, 3.0), ("b", 5.0, 0.0)],
            "k string, p double, v double",
        )
        out = {r.k: r for r in resample_ops.vwap(df, "k", "p", "v").collect()}
        assert abs(out["a"].vwap - (10 * 1 + 20 * 3) / 4.0) < 1e-9
        # zero total volume falls back to plain mean
        assert out["b"].vwap == 5.0
        assert out["a"].n_obs == 2


class TestPagerank:
    def test_star_graph_center_ranks_highest(self, spark):
        from quanta_etl_spark.operators import graph as graph_ops
        edges = spark.createDataFrame(
            [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")],
            "src string, dst string",
        )
        # the hub↔a 2-cycle oscillates while converging (amplitude decays
        # by the damping factor per round); run past it so the fixpoint
        # ordering (hub on top) is reached
        out = {r.node: r.rank for r in graph_ops.pagerank(edges, iterations=25).collect()}
        assert out["hub"] == max(out.values())
        assert abs(sum(out.values())) <= 1.0 + 1e-9  # mass leaks, never grows

    def test_uniform_cycle_stays_uniform(self, spark):
        from quanta_etl_spark.operators import graph as graph_ops
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
        )
        out = [r.rank for r in graph_ops.pagerank(edges, iterations=3).collect()]
        assert all(abs(r - 1.0 / 3) < 1e-12 for r in out)


class TestEventTransitions:
    def test_counts_and_row_normalized_probs(self, spark):
        rows = [
            (1, _ts(0), 1, "A", 0.0),
            (2, _ts(1), 1, "B", 0.0),
            (3, _ts(2), 1, "A", 0.0),
            (4, _ts(3), 1, "C", 0.0),
            (5, _ts(0), 2, "A", 0.0),
            (6, _ts(1), 2, "B", 0.0),
        ]
        out = {(r.from_type, r.to_type): (r.n, r.prob)
               for r in event_ops.event_transitions(_events(spark, rows)).collect()}
        # from A: ->B twice, ->C once
        assert out[("A", "B")] == (2, 2 / 3)
        assert out[("A", "C")] == (1, 1 / 3)
        assert out[("B", "A")] == (1, 1.0)
        # no cross-user transition (u1's C -> u2's A must not exist)
        assert ("C", "A") not in out

    def test_probs_sum_to_one_per_from_state(self, spark, sf_dir):
        from quanta_etl_spark.sources.testdata import load_table
        ev = load_table(spark, sf_dir, "events")
        out = event_ops.event_transitions(ev)
        sums = out.groupBy("from_type").agg(F.sum("prob").alias("s")).collect()
        assert all(abs(r.s - 1.0) < 1e-9 for r in sums)


class TestReferentialCheck:
    def test_orphans_and_nulls_counted(self, spark):
        from quanta_etl_spark.operators import quality as quality_ops
        fact = spark.createDataFrame(
            [(1, 10), (2, 11), (3, 99), (4, None)], "id long, fk long"
        )
        dim = spark.createDataFrame([(10,), (11,), (12,)], "k long")
        out = quality_ops.referential_check(
            fact, {"fact_dim": (dim, "fk", "k")}
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.relation, r.total_rows, r.null_keys, r.orphans) == (
            "fact_dim", 4, 1, 1
        )


class TestActivityStreaks:
    def test_islands_split_on_gaps(self, spark):
        days = [1, 2, 3, 5, 6, 10]  # runs: 3, 2, 1
        rows = [
            (i, dt.datetime(2024, 1, d), 1, "x", 0.0)
            for i, d in enumerate(days)
        ] + [(99, dt.datetime(2024, 1, 2, 23), 1, "x", 0.0)]  # same day
        out = win_ops.activity_streaks(
            _events(spark, rows), "user_id", "ts"
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.longest_streak, r.active_days, r.n_streaks) == (3, 6, 3)


class TestContribution:
    def test_shares_sum_to_one(self, spark):
        from quanta_etl_spark.operators import aggregates as agg_ops2
        df = spark.createDataFrame(
            [("a", "x", 10.0), ("a", "y", 30.0), ("b", "x", 60.0)],
            "g string, s string, v double",
        )
        out = agg_ops2.contribution(df, "v", ["g", "s"], within=["g"])
        rows = {(r.g, r.s): r for r in out.collect()}
        assert abs(sum(r.pct_of_total for r in rows.values()) - 1.0) < 1e-12
        assert abs(rows[("a", "x")].pct_of_parent - 0.25) < 1e-12
        assert rows[("b", "x")].pct_of_parent == 1.0
        assert rows[("b", "x")].group_value == 60.0

    def test_zero_total_null_not_abort(self, spark):
        """A net-zero grand total (e.g. P&L adjustments) makes shares
        undefined: NULL pct columns, never an ANSI divide-by-zero abort."""
        from quanta_etl_spark.operators import aggregates as agg_ops2
        df = spark.createDataFrame(
            [("a", "x", 10.0), ("a", "y", -10.0)],
            "g string, s string, v double",
        )
        out = agg_ops2.contribution(df, "v", ["g", "s"], within=["g"]).collect()
        assert all(r.pct_of_total is None for r in out)
        assert all(r.pct_of_parent is None for r in out)
        assert {r.group_value for r in out} == {10.0, -10.0}


class TestWeightedMedian:
    def test_weights_shift_the_median(self, spark):
        from quanta_etl_spark.operators import aggregates as agg_ops2
        # unweighted median of [1,2,3] is 2; weight 3 heavily -> 3
        df = spark.createDataFrame(
            [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 10.0)],
            "g string, v double, w double",
        )
        out = agg_ops2.weighted_median(df, "v", "w", ["g"]).collect()
        assert out[0].weighted_median == 3.0

    def test_equal_weights_pick_lower_median(self, spark):
        from quanta_etl_spark.operators import aggregates as agg_ops2
        df = spark.createDataFrame(
            [("g", float(v), 1.0) for v in (1, 2, 3, 4)],
            "g string, v double, w double",
        )
        out = agg_ops2.weighted_median(df, "v", "w", ["g"]).collect()
        assert out[0].weighted_median == 2.0  # cum 2/4 reaches half at v=2


class TestSurvivorPolicy:
    def test_policy_overrides_min_id(self, spark):
        from quanta_etl_spark.operators import dedup as dedup_ops2
        df = spark.createDataFrame(
            [(1, "c1", "short"), (2, "c1", "much longer text"),
             (3, "c2", "only")],
            "doc_id long, cluster string, text string",
        )
        out = dedup_ops2.survivor_per_cluster(
            df, "cluster", [F.length("text").desc(), F.col("doc_id").asc()]
        )
        got = {r.cluster: (r.doc_id, r.cluster_size) for r in out.collect()}
        # longest wins, NOT min doc_id
        assert got == {"c1": (2, 2), "c2": (3, 1)}


class TestConversionLatency:
    def test_latency_first_to_first_after(self, spark):
        import pytest
        from quanta_etl_spark.operators import events as E2

        rows = [
            # user 1: signup at t0, purchases at +10s and +100s -> 10s
            (1, "2024-01-01 10:00:00", "signup"),
            (1, "2024-01-01 10:00:10", "purchase"),
            (1, "2024-01-01 10:01:40", "purchase"),
            # user 2: purchase BEFORE signup doesn't count; +30s after
            (2, "2024-01-01 09:59:00", "purchase"),
            (2, "2024-01-01 10:00:00", "signup"),
            (2, "2024-01-01 10:00:30", "purchase"),
            # user 3: signup, never purchases -> excluded
            (3, "2024-01-01 10:00:00", "signup"),
            # user 4: purchase only -> excluded
            (4, "2024-01-01 10:00:00", "purchase"),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, d string, event_type string"
        ).withColumn("ts", F.to_timestamp("d"))
        out = E2.conversion_latency(
            df, "user_id", "ts", "event_type", "signup", "purchase"
        ).collect()[0]
        assert out["n_converted"] == 2
        assert out["mean_latency_s"] == pytest.approx(20.0)
        assert out["p50_latency_s"] == pytest.approx(20.0)


class TestSequenceMining:
    def test_trigram_paths(self, spark):
        rows = [
            (1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "b"),
            (2, 1, "a"), (2, 2, "b"), (2, 3, "c"),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, o long, event_type string"
        ).withColumn("ts", F.to_timestamp(F.lit("2024-01-01")) +
                     F.make_interval(secs=F.col("o")))
        from quanta_etl_spark.operators import events as E2

        out = E2.event_ngram_paths(
            df, "user_id", "ts", "event_type", n=3, top_k=5
        ).collect()
        got = {r["path"]: r["n_paths"] for r in out}
        # user1: a>b>c, b>c>b; user2: a>b>c — no cross-user paths
        assert got == {"a > b > c": 2, "b > c > b": 1}
        # deterministic order: count desc then path asc
        assert [r["path"] for r in out] == ["a > b > c", "b > c > b"]

    def test_sequence_conformance(self, spark):
        rows = [
            (1, 1, "signup"), (1, 2, "click"), (1, 3, "purchase"),
            (2, 1, "click"), (2, 2, "purchase"),
            (3, 1, "signup"), (3, 2, "error"),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, o long, event_type string"
        ).withColumn("ts", F.to_timestamp(F.lit("2024-01-01")) +
                     F.make_interval(secs=F.col("o")))
        from quanta_etl_spark.operators import events as E2

        out = {r["user"]: r for r in E2.sequence_conformance(
            df, "user_id", "ts", "event_type",
            pattern=r"^signup(>(click|view))*>purchase",
        ).collect()}
        assert out[1]["sequence"] == "signup>click>purchase"
        assert out[1]["conforms"] is True
        assert out[2]["conforms"] is False  # no signup first
        assert out[3]["conforms"] is False  # never purchases
        # repartition determinism of the serialized sequence
        again = {r["user"]: r["sequence"] for r in E2.sequence_conformance(
            df.repartition(4), "user_id", "ts", "event_type",
            pattern=r"^signup",
        ).collect()}
        assert again == {u: r["sequence"] for u, r in out.items()}


def test_ngram_paths_interior_null_dropped(spark):
    """A path containing a NULL event type anywhere must emit nothing
    (ADVICE r6: concat_ws would silently collapse 'a > NULL > c' into
    a still-counted 'a > c', diverging from SQL || concatenation)."""
    from pyspark.sql import functions as F
    from quanta_etl_spark.operators import events as E3

    rows = [
        (1, 1, "a"), (1, 2, None), (1, 3, "c"), (1, 4, "d"), (1, 5, "e"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, o long, event_type string"
    ).withColumn("ts", F.to_timestamp(F.lit("2024-01-01")) +
                 F.make_interval(secs=F.col("o")))
    out = E3.event_ngram_paths(
        df, "user_id", "ts", "event_type", n=3, top_k=10
    ).collect()
    got = {r["path"]: r["n_paths"] for r in out}
    # a>NULL>c, NULL>c>d dropped entirely; only the clean c>d>e remains
    assert got == {"c > d > e": 1}


def test_histogram_fixed_rejects_degenerate_params(spark):
    """hi<=lo or num_bins<1 would make every bucket expression an ANSI
    divide-by-zero at execution — fail loudly at plan time instead
    (hits callers auto-deriving bounds from a constant column)."""
    import pytest
    from quanta_etl_spark.operators import aggregates as agg_ops3
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="hi > lo"):
        agg_ops3.histogram_fixed(df, "x", 5.0, 5.0, 4)
    with pytest.raises(ValueError, match="num_bins"):
        agg_ops3.histogram_fixed(df, "x", 0.0, 10.0, 0)
