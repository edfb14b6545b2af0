"""Round-6 batch 17: new-vs-returning growth accounting, Benford
first-digit audit, largest-remainder proportional allocation."""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from quanta_etl_spark.operators import aggregates as A
from quanta_etl_spark.operators import events as E
from quanta_etl_spark.operators import quality as Q


def test_new_vs_returning(spark):
    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00"),  # dup day
        (2, "2024-01-01 11:00:00"),
        (1, "2024-01-02 09:00:00"),
        (3, "2024-01-02 10:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, d string").withColumn(
        "ts", F.to_timestamp("d")
    )
    out = {r["day"].day: r for r in
           E.new_vs_returning(df, "user_id", "ts").collect()}
    assert out[1]["n_new"] == 2 and out[1]["n_returning"] == 0
    assert out[2]["n_new"] == 1 and out[2]["n_returning"] == 1
    assert out[1]["cum_users"] == 2 and out[2]["cum_users"] == 3


def test_benford_check(spark):
    # values with known first digits: 1x5, 2x3, 9x2
    vals = [1.5, 12.0, 0.19, 100.0, 0.0001234, 2.0, 25.0, -2.9, 9.0, 0.95]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r["digit"]: r for r in Q.benford_check(df, "v").collect()}
    assert out[1]["n"] == 5 and out[2]["n"] == 3 and out[9]["n"] == 2
    assert out[1]["observed_freq"] == pytest.approx(0.5)
    assert out[1]["benford_freq"] == pytest.approx(math.log10(2), rel=1e-12)
    # zero and null rows never contribute
    df2 = spark.createDataFrame([(0.0,), (None,), (3.0,)], "v double")
    out2 = {r["digit"]: r["n"] for r in Q.benford_check(df2, "v").collect()}
    assert out2 == {3: 1}


def test_allocate_proportional_exact_sum(spark):
    rows = [("g", 1, 1.0), ("g", 2, 1.0), ("g", 3, 1.0)]
    df = spark.createDataFrame(rows, "k string, id long, w double")
    out = {r["id"]: r["allocated"] for r in A.allocate_proportional(
        df, "id", "w", 100, ["k"]
    ).collect()}
    # 100/3: two rows get 33, one gets 34; leftover goes to lowest id
    assert sum(out.values()) == 100
    assert sorted(out.values()) == [33, 33, 34]
    assert out[1] == 34  # remainder tie -> id tiebreak


def test_allocate_proportional_weighted_groups(spark):
    rows = [("a", 1, 3.0), ("a", 2, 1.0), ("b", 3, 5.0)]
    df = spark.createDataFrame(rows, "k string, id long, w double")
    out = {r["id"]: r for r in A.allocate_proportional(
        df, "id", "w", 10, ["k"]
    ).collect()}
    # group a: quotas 7.5/2.5 -> floors 7/2, leftover 1 -> both .5 rem,
    # id tiebreak gives it to id 1
    assert out[1]["allocated"] + out[2]["allocated"] == 10
    assert out[1]["allocated"] == 8 and out[2]["allocated"] == 2
    assert out[3]["allocated"] == 10  # sole member takes the group total


def test_debounce_leading_edge(spark):
    rows = [
        (1, "2024-01-01 10:00:00.000000", 1),
        (1, "2024-01-01 10:00:02.000000", 2),   # <5s: dropped
        (1, "2024-01-01 10:00:04.500000", 3),   # <5s since PREV: dropped
        (1, "2024-01-01 10:00:30.000000", 4),   # new burst
        (2, "2024-01-01 10:00:01.000000", 5),   # other key unaffected
    ]
    df = spark.createDataFrame(
        rows, "user_id long, d string, event_id long"
    ).withColumn("ts", F.to_timestamp("d"))
    out = [r["event_id"] for r in E.debounce(
        df, ["user_id"], "ts", 5.0, ["event_id"]
    ).orderBy("event_id").collect()]
    assert out == [1, 4, 5]


def test_rate_alerts_sliding(spark):
    # 4 events in 10s, then quiet, then 2 events
    rows = [
        (1, "2024-01-01 10:00:00", 1), (1, "2024-01-01 10:00:03", 2),
        (1, "2024-01-01 10:00:06", 3), (1, "2024-01-01 10:00:09", 4),
        (1, "2024-01-01 10:05:00", 5), (1, "2024-01-01 10:05:01", 6),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, d string, event_id long"
    ).withColumn("ts", F.to_timestamp("d"))
    out = {r["event_id"]: r["n_in_window"] for r in E.rate_alerts(
        df, "user_id", "ts", window_seconds=10, threshold=3
    ).collect()}
    # event 3 is the 3rd within 10s; event 4 the 4th; the rest never
    # reach 3 in any trailing window
    assert out == {3: 3, 4: 4}


def test_ab_test_proportions(spark):
    rows = (
        [("A", i, i < 20) for i in range(100)]      # 20% conversion
        + [("B", 100 + i, i < 30) for i in range(100)]  # 30%
    )
    df = spark.createDataFrame(rows, "grp string, uid long, conv boolean")
    out = A.ab_test_proportions(df, "uid", "grp", "conv").collect()[0]
    assert out["n_a"] == 100 and out["conv_a"] == 20
    assert out["rate_b"] == pytest.approx(0.3)
    assert out["lift_abs"] == pytest.approx(0.1)
    # hand z: pool=0.25, se=sqrt(.25*.75*(2/100))
    se = (0.25 * 0.75 * 0.02) ** 0.5
    assert out["z_stat"] == pytest.approx(0.1 / se, rel=1e-12)
    # three arms must raise
    df3 = df.union(spark.createDataFrame([("C", 999, True)],
                                         "grp string, uid long, conv boolean"))
    with pytest.raises(ValueError):
        A.ab_test_proportions(df3, "uid", "grp", "conv")


def test_basket_lift(spark):
    # bread+butter always together (10 baskets); milk independent-ish
    rows = []
    for b in range(10):
        rows += [(b, "bread"), (b, "butter")]
        if b < 5:
            rows.append((b, "milk"))
    for b in range(10, 20):
        rows.append((b, "milk"))
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {(r["item_a"], r["item_b"]): r for r in A.basket_lift(
        df, "basket", "item", min_support=3, top_k=10
    ).collect()}
    bb = out[("bread", "butter")]
    assert bb["n_pair"] == 10
    assert bb["confidence"] == pytest.approx(1.0)
    # lift = (10/20) / ((10/20)*(10/20)) = 2.0
    assert bb["lift"] == pytest.approx(2.0)
    # bread+milk: 5 pairs; lift = (5/20)/((10/20)*(15/20)) = 0.666..
    bm = out[("bread", "milk")]
    assert bm["lift"] == pytest.approx(2 / 3, rel=1e-12)


def test_holt_forecast_linear_series_exact(spark):
    """On a perfectly linear series Holt recovers the line: fitted
    one-step-ahead values equal the observations, and forecasts
    extend the line exactly."""
    import datetime as dtm

    from quanta_etl_spark.operators import resample as R2

    rows = [
        (dtm.datetime(2024, 1, 1) + dtm.timedelta(days=d), 10.0 + 3.0 * d)
        for d in range(10)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = R2.holt_forecast(df, "ts", "v", alpha=0.5, beta=0.3, horizon=3)
    rows_out = sorted(out.collect(), key=lambda r: r["day"])
    hist = [r for r in rows_out if not r["is_forecast"]]
    fc = [r for r in rows_out if r["is_forecast"]]
    assert len(hist) == 10 and len(fc) == 3
    # one-step fitted on a line = exact
    for r in hist[1:]:
        assert r["fitted"] == pytest.approx(r["observed"], abs=1e-9)
    # forecasts continue the line: 10 + 3*10, 3*11, 3*12
    assert [r["fitted"] for r in fc] == pytest.approx(
        [40.0, 43.0, 46.0], abs=1e-9
    )
    assert all(r["observed"] is None for r in fc)


def test_holt_forecast_days_evenly_spaced(spark):
    """Forecast days advance by exactly one step each (regression: an
    aliasing bug made the horizon triangular — +1, +2, +3 days)."""
    import datetime as dtm

    from quanta_etl_spark.operators import resample as R2

    rows = [
        (dtm.datetime(2024, 3, 1) + dtm.timedelta(days=d), float(d))
        for d in range(5)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    fc = sorted(
        [r for r in R2.holt_forecast(df, "ts", "v", horizon=4).collect()
         if r["is_forecast"]],
        key=lambda r: r["day"],
    )
    got = [r["day"].day for r in fc]
    assert got == [6, 7, 8, 9]
