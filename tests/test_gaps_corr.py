"""Round-6 batch 6: inter-event gaps, rolling correlation,
fulfillment lag (query-level)."""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from quanta_etl_spark.operators import events as E
from quanta_etl_spark.operators import windows as W


def test_inter_event_gaps(spark):
    rows = [
        (1, "2024-01-01 10:00:00", "click", 1),
        (1, "2024-01-01 10:00:10", "click", 2),   # gap 10
        (1, "2024-01-01 10:00:40", "click", 3),   # gap 30
        (1, "2024-01-01 10:00:05", "view", 4),    # other type interleaved
        (2, "2024-01-01 11:00:00", "click", 5),   # other user: no gap yet
        (2, "2024-01-01 11:00:20", "click", 6),   # gap 20
    ]
    df = spark.createDataFrame(
        rows, "user_id long, d string, event_type string, event_id long"
    ).withColumn("ts", F.to_timestamp("d"))
    out = {r["event_type"]: r for r in E.inter_event_gaps(
        df, "user_id", "ts", "event_type", ["event_id"]
    ).collect()}
    assert "view" not in out  # single event -> no gaps
    c = out["click"]
    assert c["n_gaps"] == 3
    assert c["mean_gap_s"] == pytest.approx(20.0)
    assert c["p50_gap_s"] == pytest.approx(20.0)


def test_rolling_corr_perfect_line(spark):
    # y = 2x -> corr exactly 1 wherever the frame is full
    rows = [("g", i, float(i), 2.0 * i) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, o long, x double, y double")
    out = W.rolling_corr(df, ["k"], "o", "x", "y", window_rows=5).collect()
    vals = {r["o"]: r["rolling_corr"] for r in out}
    assert vals[3] is None                     # frame not full yet
    assert vals[4] == pytest.approx(1.0, abs=1e-9)
    assert vals[9] == pytest.approx(1.0, abs=1e-9)


def test_rolling_corr_matches_numpy(spark):
    import numpy as np

    xs = [float((i * 17) % 13) for i in range(30)]
    ys = [float((i * 11) % 7) + 0.5 * x for i, x in enumerate(xs)]
    df = spark.createDataFrame(
        [("g", i, x, y) for i, (x, y) in enumerate(zip(xs, ys))],
        "k string, o long, x double, y double",
    )
    out = {r["o"]: r["rolling_corr"] for r in W.rolling_corr(
        df, ["g_k" if False else "k"], "o", "x", "y", window_rows=10
    ).collect()}
    for end in (9, 19, 29):
        wx, wy = xs[end - 9:end + 1], ys[end - 9:end + 1]
        expect = np.corrcoef(wx, wy)[0, 1]
        assert out[end] == pytest.approx(expect, rel=1e-9), end


def test_rolling_corr_zero_variance_null(spark):
    rows = [("g", i, 5.0, float(i)) for i in range(6)]
    df = spark.createDataFrame(rows, "k string, o long, x double, y double")
    out = W.rolling_corr(df, ["k"], "o", "x", "y", window_rows=3).collect()
    assert all(r["rolling_corr"] is None for r in out)


def test_rolling_corr_scaled_path_equals_decimal_path(spark):
    # 2-decimal inputs: the int64 fast path must agree with the
    # decimal path to float precision
    rows = [("g", i, round((i * 17 % 13) + 0.25, 2),
             round((i * 11 % 7) * 1.5 + 3.75, 2)) for i in range(30)]
    df = spark.createDataFrame(rows, "k string, o long, x double, y double")
    slow = {r["o"]: r["rolling_corr"] for r in W.rolling_corr(
        df, ["k"], "o", "x", "y", window_rows=10).collect()}
    fast = {r["o"]: r["rolling_corr"] for r in W.rolling_corr(
        df, ["k"], "o", "x", "y", window_rows=10, scale=100).collect()}
    for o in slow:
        if slow[o] is None:
            assert fast[o] is None
        else:
            assert fast[o] == pytest.approx(slow[o], abs=1e-9)


# ---------- cusum / diversified_topk / time_in_state ----------

def test_cusum_detects_small_shift(spark):
    # baseline 10, then persistent +1 shift: z-scores never fire but
    # CUSUM accumulates past the threshold
    vals = [10.0, 10.2, 9.8, 10.0] + [11.0] * 6
    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, o long, v double")
    out = {r["o"]: r for r in W.cusum(
        df, "k", "o", "v", target=10.0, slack=0.5, threshold=1.2
    ).collect()}
    # hand recursion: drift = v - 10.5
    s, exp = 0.0, {}
    for i, v in enumerate(vals):
        s = max(0.0, s + (v - 10.5))
        exp[i] = s
    for i in exp:
        assert out[i]["cusum"] == pytest.approx(exp[i], abs=1e-12), i
    assert out[3]["alarm"] is False
    assert out[9]["alarm"] is True


def test_diversified_topk_cap(spark):
    rows = [
        ("a", 1, 100.0), ("a", 2, 90.0), ("a", 3, 80.0),
        ("b", 4, 95.0), ("b", 5, 85.0),
        ("c", 6, 70.0),
    ]
    df = spark.createDataFrame(rows, "grp string, id long, score double")
    out = W.diversified_topk(
        df, [F.col("score").desc(), F.col("id").asc()], "grp",
        per_group=2, k=4,
    ).collect()
    assert [(r["grp"], r["id"]) for r in out] == [
        ("a", 1), ("b", 4), ("a", 2), ("b", 5)
    ]  # a's third-best (80) is capped out; c's 70 misses the top 4


def test_time_in_state(spark):
    from quanta_etl_spark.operators import events as E2

    rows = [
        (1, "2024-01-01 10:00:00", "browse", 1),
        (1, "2024-01-01 11:00:00", "cart", 2),     # browse held 1h
        (1, "2024-01-01 11:30:00", "browse", 3),   # cart held 0.5h
        (2, "2024-01-01 09:00:00", "browse", 4),
        (2, "2024-01-01 10:30:00", "done", 5),     # browse held 1.5h
    ]
    df = spark.createDataFrame(
        rows, "user_id long, d string, event_type string, event_id long"
    ).withColumn("ts", F.to_timestamp("d"))
    out = {r["state"]: r for r in E2.time_in_state(
        df, "user_id", "ts", "event_type", ["event_id"]
    ).collect()}
    assert out["browse"]["total_hours"] == pytest.approx(2.5)
    assert out["browse"]["n_intervals"] == 2
    assert out["cart"]["total_hours"] == pytest.approx(0.5)
    assert "done" not in out  # terminal events hold nothing


def test_rolling_corr_null_input_excluded_from_n_and_sums(spark):
    """A NULL observation must leave n AND every power sum together:
    counting it in n while the sums skip it would return a corr built
    from inconsistent moments (ADVICE r6). With the NULL excluded, the
    frame has too few valid observations and must yield NULL."""
    rows = [(1, i, float(i), float(2 * i) if i != 3 else None)
            for i in range(1, 6)]
    df = spark.createDataFrame(rows, "k long, o long, x double, y double")
    out = {r["o"]: r["rolling_corr"] for r in W.rolling_corr(
        df, ["k"], "o", "x", "y", window_rows=3
    ).collect()}
    # frames containing o=3 (the NULL y) have only 2 valid obs -> NULL
    assert out[3] is None and out[4] is None and out[5] is None


def test_rolling_corr_decimal_overflow_row_fully_excluded(spark):
    """|x| >= 1e12 overflows the decimal(18,6) cast to NULL; the row
    must drop from n as well as the sums (not skew the estimate)."""
    rows = [(1, 1, 1.0, 2.0), (1, 2, 2.0, 4.0), (1, 3, 5e12, 6.0),
            (1, 4, 4.0, 8.0)]
    df = spark.createDataFrame(rows, "k long, o long, x double, y double")
    out = {r["o"]: r["rolling_corr"] for r in W.rolling_corr(
        df, ["k"], "o", "x", "y", window_rows=3
    ).collect()}
    # every 3-row frame that includes o=3 has only 2 valid obs
    assert out[3] is None and out[4] is None
