"""Round-6 batch 3: RFM segmentation, Gini/HHI concentration,
heavy-key skew diagnostics, day-of-week seasonality."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quanta_etl_spark.operators import aggregates as A
from quanta_etl_spark.operators import events as E
from quanta_etl_spark.operators import quality as Q
from quanta_etl_spark.operators import resample as R


# ---------- rfm_segments ----------

def _orders(spark):
    rows = []
    # cust 1: 4 recent big orders; cust 2: 2 mid; cust 3: 1 old tiny;
    # cust 4: 1 old tiny (tie with 3 broken by id)
    for d, c, amt in [
        ("2024-03-10", 1, 500.0), ("2024-03-11", 1, 500.0),
        ("2024-03-12", 1, 500.0), ("2024-03-13", 1, 500.0),
        ("2024-02-01", 2, 100.0), ("2024-02-15", 2, 100.0),
        ("2024-01-01", 3, 10.0),
        ("2024-01-01", 4, 10.0),
    ]:
        rows.append((c, d, amt))
    return spark.createDataFrame(
        rows, "cust long, d string, amt double"
    ).withColumn("ts", F.to_timestamp("d"))


def test_rfm_scores_and_segment(spark):
    out = {r["customer"]: r for r in
           E.rfm_segments(_orders(spark), "cust", "ts", "amt",
                          n_tiles=4).collect()}
    assert out[1]["recency_days"] == 0
    assert out[1]["frequency"] == 4
    assert out[1]["monetary"] == 2000.0
    # best on all three axes
    assert out[1]["segment"] == "444"
    # worst recency/frequency/monetary: cust 3 and 4 tie; id tiebreak
    assert out[3]["r_score"] <= 2 and out[3]["m_score"] <= 2
    assert out[4]["frequency"] == 1
    # codes are deterministic across runs
    again = {r["customer"]: r["segment"] for r in
             E.rfm_segments(_orders(spark), "cust", "ts", "amt",
                            n_tiles=4).collect()}
    assert again == {c: r["segment"] for c, r in out.items()}


# ---------- gini_coefficient ----------

def test_gini_uniform_is_zero_ish(spark):
    df = spark.createDataFrame(
        [("g", i, 10.0) for i in range(10)], "k string, u long, v double"
    )
    out = A.gini_coefficient(df, "v", ["u"], ["k"]).collect()[0]
    # exact formula on equal shares: 2*(n+1)/(2n) - (n+1)/n = 0
    assert out["gini"] == pytest.approx(0.0, abs=1e-12)
    assert out["n_units"] == 10 and out["total"] == 100.0


def test_gini_total_concentration(spark):
    rows = [("g", 0, 100.0)] + [("g", i, 0.0) for i in range(1, 10)]
    df = spark.createDataFrame(rows, "k string, u long, v double")
    out = A.gini_coefficient(df, "v", ["u"], ["k"]).collect()[0]
    # one unit holds everything: G = 2*10/10 - 11/10 = 0.9 = (n-1)/n
    assert out["gini"] == pytest.approx(0.9, abs=1e-12)


def test_gini_known_value(spark):
    # units 1,2,3,4: G = 2*(1*1+2*2+3*3+4*4)/(4*10) - 5/4 = 60/40-1.25 = 0.25
    df = spark.createDataFrame(
        [("g", i, float(i)) for i in (1, 2, 3, 4)], "k string, u long, v double"
    )
    out = A.gini_coefficient(df, "v", ["u"], ["k"]).collect()[0]
    assert out["gini"] == pytest.approx(0.25, abs=1e-12)


# ---------- hhi_concentration ----------

def test_hhi_even_and_monopoly(spark):
    even = spark.createDataFrame(
        [("g", i, 25.0) for i in range(4)], "k string, u long, v double"
    )
    out = A.hhi_concentration(even, "v", ["u"], ["k"]).collect()[0]
    assert out["hhi"] == pytest.approx(0.25, abs=1e-12)
    mono = spark.createDataFrame(
        [("g", 0, 99.0), ("g", 1, 0.0)], "k string, u long, v double"
    )
    out = A.hhi_concentration(mono, "v", ["u"], ["k"]).collect()[0]
    assert out["hhi"] == pytest.approx(1.0, abs=1e-12)


# ---------- heavy_keys ----------

def test_heavy_keys_order_share(spark):
    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 15 + [("d",)] * 5
    df = spark.createDataFrame(rows, "k string")
    out = Q.heavy_keys(df, ["k"], top_n=3).collect()
    assert [(r["k"], r["rank"], r["n"]) for r in out] == [
        ("a", 1, 50), ("b", 2, 30), ("c", 3, 15)
    ]
    assert out[0]["share"] == pytest.approx(0.5)
    assert out[1]["cum_share"] == pytest.approx(0.8)
    assert out[2]["cum_share"] == pytest.approx(0.95)


def test_heavy_keys_tie_break(spark):
    rows = [("b",)] * 3 + [("a",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    out = Q.heavy_keys(df, ["k"], top_n=2).collect()
    assert [r["k"] for r in out] == ["a", "b"]  # key asc on count tie


# ---------- dow_seasonality ----------

def test_dow_seasonality(spark):
    # 2024-03-10 is a Sunday (dow 1), 2024-03-11 Monday (dow 2)
    df = spark.createDataFrame(
        [("2024-03-10", 10.0), ("2024-03-10", 30.0), ("2024-03-11", 20.0)],
        "d string, v double",
    ).withColumn("ts", F.to_timestamp("d"))
    out = {r["dow"]: r for r in R.dow_seasonality(df, "ts", "v").collect()}
    assert set(out) == {1, 2}
    assert out[1]["n"] == 2 and out[1]["mean_value"] == 20.0
    assert out[2]["mean_value"] == 20.0
    assert out[1]["seasonal_index"] == pytest.approx(1.0)


# ---------- zero-total concentration guards (r9 probe) ----------

def test_gini_zero_total_group_null_not_abort(spark):
    """An all-zero-value group has no defined concentration: NULL gini,
    never an ANSI divide-by-zero job abort; sibling groups unaffected."""
    df = spark.createDataFrame(
        [("z", "u1", 0.0), ("z", "u2", 0.0), ("g", "u1", 1.0), ("g", "u2", 3.0)],
        "k string, u string, v double",
    )
    out = {r["k"]: r for r in A.gini_coefficient(df, "v", ["u"], ["k"]).collect()}
    assert out["z"]["gini"] is None
    assert out["g"]["gini"] == pytest.approx(0.25, abs=1e-12)


def test_hhi_zero_total_group_null_not_abort(spark):
    df = spark.createDataFrame(
        [("z", "u1", 0.0), ("z", "u2", 0.0), ("g", "u1", 1.0), ("g", "u2", 1.0)],
        "k string, u string, v double",
    )
    out = {r["k"]: r for r in A.hhi_concentration(df, "v", ["u"], ["k"]).collect()}
    assert out["z"]["hhi"] is None
    assert out["g"]["hhi"] == pytest.approx(0.5, abs=1e-12)


# ---------- resample division guards (r9 sweep) ----------

def test_weighted_index_zero_weight_bucket_null_not_abort(spark):
    from quanta_etl_spark.operators import resample as R2
    df = spark.createDataFrame(
        [("2024-03-10 10:00:01", 5.0, 0.0), ("2024-03-10 10:00:02", 7.0, 0.0),
         ("2024-03-10 11:00:01", 10.0, 2.0), ("2024-03-10 11:00:02", 20.0, 2.0)],
        "d string, price double, w double",
    ).withColumn("ts", F.to_timestamp("d"))
    out = {r["bucket_ts"].hour: r for r in R2.weighted_index(
        df, "ts", "price", "w", interval="1 hour"
    ).collect()}
    assert out[10]["index_value"] is None          # zero-weight bucket
    assert out[11]["index_value"] == pytest.approx(15.0)


def test_period_growth_zero_base_null_not_abort(spark):
    from quanta_etl_spark.operators import resample as R2
    df = spark.createDataFrame(
        [("2024-01-05", 0.0), ("2024-02-05", 50.0), ("2024-03-05", 75.0)],
        "d string, v double",
    ).withColumn("ts", F.to_timestamp("d"))
    out = {r["period"].month: r for r in R2.period_growth(
        df, "ts", "v", interval="month"
    ).collect()}
    assert out[2]["pct_change"] is None            # growth from zero base
    assert out[2]["abs_change"] == pytest.approx(50.0)
    assert out[3]["pct_change"] == pytest.approx(0.5)


def test_dow_seasonality_zero_overall_null_not_abort(spark):
    from quanta_etl_spark.operators import resample as R2
    df = spark.createDataFrame(
        [("2024-03-10", 10.0), ("2024-03-11", -10.0)],
        "d string, v double",
    ).withColumn("ts", F.to_timestamp("d"))
    out = R2.dow_seasonality(df, "ts", "v").collect()
    assert all(r["seasonal_index"] is None for r in out)
    assert {r["mean_value"] for r in out} == {10.0, -10.0}
