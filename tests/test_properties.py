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
