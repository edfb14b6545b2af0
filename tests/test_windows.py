from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from quanta_etl_spark.operators import windows as W


def test_forward_fill(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, None), ("a", 3, None), ("a", 4, 40.0),
         ("b", 1, None), ("b", 2, 5.0)],
        "k string, t int, v double",
    )
    out = W.forward_fill(df, ["v"], ["k"], ["t"])
    got = {(r.k, r.t): r.v for r in out.collect()}
    assert got == {
        ("a", 1): 10.0, ("a", 2): 10.0, ("a", 3): 10.0, ("a", 4): 40.0,
        ("b", 1): None, ("b", 2): 5.0,
    }


def test_forward_fill_idempotent(spark):
    df = spark.createDataFrame(
        [("a", i, None if i % 3 else float(i)) for i in range(1, 20)],
        "k string, t int, v double",
    )
    once = W.forward_fill(df, ["v"], ["k"], ["t"])
    twice = W.forward_fill(once, ["v"], ["k"], ["t"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_time_spine_dense(spark):
    base = dt.datetime(2024, 1, 1, 0, 0)
    df = spark.createDataFrame(
        [("x", base), ("x", base + dt.timedelta(minutes=5))],
        "k string, ts timestamp",
    )
    spine = W.time_spine(df, "k", "ts", "interval 1 minute")
    assert spine.count() == 6  # inclusive grid 0..5


def test_densify_and_fill(spark):
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("x", base, 1.0), ("x", base + dt.timedelta(minutes=3), 4.0)],
        "k string, ts timestamp, px double",
    )
    out = W.densify_and_fill(df, "k", "ts", ["px"])
    vals = [r.px for r in out.orderBy("ts").collect()]
    assert vals == [1.0, 1.0, 1.0, 4.0]


def test_lag_returns_constant_price_is_zero(spark):
    df = spark.createDataFrame(
        [("a", i, 50.0) for i in range(1, 6)], "k string, t int, px double"
    )
    out = W.lag_returns(df, "px", ["k"], ["t"], out="ret")
    rets = [r.ret for r in out.orderBy("t").collect()]
    assert rets[0] is None and all(r == 0.0 for r in rets[1:])


def test_rolling_agg_window_size(spark):
    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(1, 8)], "k string, t int, v double"
    )
    out = W.rolling_agg(df, "v", ["k"], ["t"], 3, {"m": "avg", "n": "count"})
    rows = {r.t: (r.m, r.n) for r in out.collect()}
    assert rows[1] == (1.0, 1)
    assert rows[3] == (2.0, 3)
    assert rows[7] == (6.0, 3)  # frame capped at 3 trailing rows


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [("g1", i) for i in range(10)] + [("g2", i) for i in range(3)],
        "g string, v int",
    )
    out = W.topk_per_group(df, ["g"], [F.col("v").desc()], 2)
    got = sorted((r.g, r.v) for r in out.collect())
    assert got == [("g1", 8), ("g1", 9), ("g2", 1), ("g2", 2)]


def test_global_top_k_plan_avoids_global_sort(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = W.global_top_k(li, [F.col("l_extendedprice").desc()], 5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert out.count() == 5


def test_rolling_time_agg_gappy_series(spark):
    """Time frame counts by timestamp VALUE: a 60s lookback sees only
    rows within the last minute, regardless of row positions."""
    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:00:30", 2.0),   # 30s later  -> frame {1,2}
        (1, "2024-01-01 00:01:00", 4.0),   # 60s after r1 -> frame {1,2,4}
        (1, "2024-01-01 01:00:00", 8.0),   # big gap -> frame {8} only
        (2, "2024-01-01 00:00:10", 16.0),  # other partition untouched
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = W.rolling_time_agg(
        df, "value", ["user_id"], "ts", lookback_seconds=60,
        aggs={"n": "count", "s": "sum"},
    )
    got = {(r.user_id, r.value): (r.n, r.s) for r in out.collect()}
    assert got[(1, 1.0)] == (1, 1.0)
    assert got[(1, 2.0)] == (2, 3.0)
    assert got[(1, 4.0)] == (3, 7.0)   # inclusive 60s boundary
    assert got[(1, 8.0)] == (1, 8.0)   # row frame would have seen 3 rows
    assert got[(2, 16.0)] == (1, 16.0)


def test_ewma_recursion_values(spark):
    from quanta_etl_spark.operators import windows as win_ops

    df = spark.createDataFrame(
        [
            (1, 1, 1, 10.0),
            (1, 2, 2, 20.0),
            (1, 3, 3, 20.0),
            (2, 1, 4, 5.0),
        ],
        ["k", "ts", "eid", "v"],
    )
    out = {
        r["eid"]: r["ewma"]
        for r in win_ops.ewma(
            df, "k", "ts", "v", alpha=0.5, tiebreak_cols=["eid"]
        ).collect()
    }
    # y0=10; y1=0.5*10+0.5*20=15; y2=0.5*15+0.5*20=17.5
    assert out[1] == 10.0
    assert out[2] == 15.0
    assert out[3] == 17.5
    assert out[4] == 5.0


def test_sessionize_timestamp_ntz_input(spark):
    """Driver testdata drift (VERDICT r4): events.ts now reads as
    TIMESTAMP_NTZ, which forbids cast("long"). sessionize must accept
    TIMESTAMP, TIMESTAMP_NTZ, and numeric-epoch-seconds inputs and
    produce identical session ids."""
    base = dt.datetime(2024, 1, 1, 8, 0)
    rows = [
        (1, base, 100),
        (1, base + dt.timedelta(minutes=10), 101),
        (1, base + dt.timedelta(minutes=50), 102),  # 40min gap -> new session
        (2, base, 103),
    ]
    expected = {100: 1, 101: 1, 102: 2, 103: 1}
    for ts_type in ("timestamp", "timestamp_ntz"):
        df = spark.createDataFrame(rows, f"k int, ts {ts_type}, eid int")
        out = W.sessionize(df, "k", "ts", gap_seconds=1800,
                           order_tiebreak=["eid"])
        got = {r.eid: r.session_id for r in out.collect()}
        assert got == expected, ts_type
    # numeric epoch-seconds path
    num = spark.createDataFrame(
        [(k, int(t.timestamp()), e) for k, t, e in rows],
        "k int, ts long, eid int",
    )
    out = W.sessionize(num, "k", "ts", gap_seconds=1800, order_tiebreak=["eid"])
    assert {r.eid: r.session_id for r in out.collect()} == expected


def test_grouped_sorted_map_group_spans_arrow_batches(spark):
    """r13: ewma/cusum moved from per-group applyInPandas to the
    batch-recut mapInPandas shape (_grouped_sorted_map). A group larger
    than one Arrow batch must be carried across batch boundaries and
    evaluated ONCE — pin it by shrinking the batch size below the
    group length and checking against the per-group reference."""
    import numpy as np
    import pandas as pd

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        rng = np.random.default_rng(11)
        rows = []
        eid = 0
        for k, n in [(1, 300), (2, 5), (3, 64), (4, 1)]:  # 300 >> 64
            for _ in range(n):
                rows.append((k, eid, float(rng.normal(55, 20))))
                eid += 1
        df = spark.createDataFrame(rows, "k int, ts long, v double")

        out = {
            r["ts"]: r["ewma"]
            for r in W.ewma(df, "k", "ts", "v", alpha=0.2).collect()
        }
        cus = {
            (r["ts"]): (r["cusum"], r["alarm"])
            for r in W.cusum(
                df, "k", "ts", "v", target=50.0, slack=10.0, threshold=120.0
            ).collect()
        }
        pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
        for k, g in pdf.groupby("k"):
            g = g.sort_values("ts")
            ref = g["v"].ewm(alpha=0.2, adjust=False).mean()
            for t, e in zip(g["ts"], ref):
                assert out[t] == e, (k, t)
            acc = 0.0
            for t, v in zip(g["ts"], g["v"]):
                acc = max(0.0, acc + (v - 60.0))
                assert cus[t] == (acc, acc > 120.0), (k, t)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_clamped_cusum_batch_matches_scalar_recursion():
    """The time-step-vectorized clamp (np.fmax matrix sweep) must be
    bit-identical to the scalar per-row recursion, including NaN
    drift (max(0.0, NaN) == 0.0) and never emit -0.0."""
    import numpy as np

    from quanta_etl_spark.operators.windows import _clamped_cusum_batch

    rng = np.random.default_rng(5)
    keys, drift = [], []
    for g in range(200):
        n = int(rng.integers(1, 50))
        keys += [g] * n
        d = rng.normal(0, 8, n)
        d[rng.random(n) < 0.05] = np.nan
        drift += list(d)
    keys = np.asarray(keys)
    drift = np.asarray(drift)
    ref = np.empty_like(drift)
    acc, prev_k = 0.0, None
    for i in range(len(drift)):
        if keys[i] != prev_k:
            acc, prev_k = 0.0, keys[i]
        acc = max(0.0, acc + drift[i])
        ref[i] = acc
    got = _clamped_cusum_batch(keys, drift)
    assert (ref == got).all()
    assert not np.any(np.signbit(got) & (got == 0.0))
