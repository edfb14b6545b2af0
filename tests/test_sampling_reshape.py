"""Deterministic sampling/split (operators/sampling.py), reshape
(operators/reshape.py), and TF-IDF (operators/text_stats.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from quanta_etl_spark.operators import reshape as R
from quanta_etl_spark.operators import sampling as S
from quanta_etl_spark.operators import text_stats as TS


@pytest.fixture(scope="module")
def keyed(spark):
    return spark.createDataFrame(
        [(i, ["a", "b"][i % 2]) for i in range(1000)], "id long, cls string"
    )


def test_hash_sample_deterministic_and_consistent(keyed):
    s1 = {r.id for r in S.hash_sample(keyed, "id", 0.3).collect()}
    s2 = {r.id for r in S.hash_sample(keyed, "id", 0.3).collect()}
    assert s1 == s2  # stable across runs
    assert 0.2 < len(s1) / 1000 < 0.4  # ~fraction
    # consistency: a 0.3 sample is a SUBSET of a 0.5 sample (same key)
    s5 = {r.id for r in S.hash_sample(keyed, "id", 0.5).collect()}
    assert s1 <= s5


def test_hash_split_partitions_everything(keyed):
    out = S.hash_split(keyed, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == 1000  # total partition, no row lost
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"]
    with pytest.raises(ValueError):
        S.hash_split(keyed, "id", {"a": 0.5, "b": 0.2})


def test_stratified_hash_sample(keyed):
    out = S.stratified_hash_sample(
        keyed, "id", "cls", {"a": 1.0, "b": 0.2}
    )
    got = out.groupBy("cls").count().collect()
    by = {r.cls: r["count"] for r in got}
    assert by["a"] == 500  # fraction 1.0 keeps every 'a'
    assert 50 < by.get("b", 0) < 150  # ~20% of 500
    # absent stratum with default 0 drops out
    none = S.stratified_hash_sample(keyed, "id", "cls", {"a": 0.5})
    assert none.where(F.col("cls") == "b").count() == 0


def test_unpivot_roundtrip_values(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 100), (2, 20.0, 200)], "k long, x double, y long"
    )
    out = R.unpivot(df, ["k"], ["x", "y"], "m", "v")
    got = {(r.k, r.m): r.v for r in out.collect()}
    assert got == {
        (1, "x"): 10.0, (1, "y"): 100.0,
        (2, "x"): 20.0, (2, "y"): 200.0,
    }
    assert dict(out.dtypes)["v"] == "double"  # ints harmonized to double


def test_tfidf_smoothed_scores(spark):
    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "cherry date")],
        "doc_id long, text string",
    )
    out = {(r.doc_id, r.term): r for r in TS.tfidf(docs, "doc_id", "text").collect()}
    # 'apple' appears twice in doc 1, in 1 of 3 docs
    r = out[(1, "apple")]
    assert r.tf == 2 and r.df == 1
    assert r.tfidf == pytest.approx(2 * (math.log(4 / 2) + 1))
    # top_k trims per doc with deterministic tie order
    top1 = TS.tfidf(docs, "doc_id", "text", top_k=1)
    assert top1.count() == 3
    # doc2: banana/cherry tie exactly (same tf, df) -> term order wins;
    # doc3: 'date' (df=1) out-scores 'cherry' (df=2)
    assert {(r.doc_id, r.term) for r in top1.collect()} == {
        (1, "apple"), (2, "banana"), (3, "date")
    }


def test_quantile_bins_deterministic_and_balanced(spark):
    from quanta_etl_spark.operators import sampling as samp2

    rows = [(i, float(i % 7)) for i in range(40)]  # heavy ties
    df = spark.createDataFrame(rows, "id long, v double")
    out = samp2.quantile_bins(df, "v", num_bins=4, tiebreak_cols=["id"])
    got = {r["id"]: r["bin"] for r in out.collect()}
    # 40 rows / 4 bins -> exactly 10 per bin
    from collections import Counter
    assert Counter(got.values()) == {1: 10, 2: 10, 3: 10, 4: 10}
    # deterministic across runs and partitionings
    again = {r["id"]: r["bin"] for r in samp2.quantile_bins(
        df.repartition(5), "v", num_bins=4, tiebreak_cols=["id"]
    ).collect()}
    assert again == got
    # bins are ordered by value: every bin-1 value <= every bin-4 value
    by_bin = {}
    for r in out.collect():
        by_bin.setdefault(r["bin"], []).append(r["v"])
    assert max(by_bin[1]) <= min(by_bin[4])


def test_fixed_n_per_group(spark):
    from quanta_etl_spark.operators import sampling as samp2

    rows = [(g, i) for g in "abc" for i in range(g == "c" and 2 or 10)]
    df = spark.createDataFrame(
        [(g, f"{g}{i}") for g, i in rows], "grp string, id string"
    )
    out = samp2.fixed_n_per_group(df, ["grp"], 3, "id")
    from collections import Counter

    counts = Counter(r["grp"] for r in out.collect())
    assert counts == {"a": 3, "b": 3, "c": 2}  # small group keeps all
    # deterministic pick across partitionings
    again = samp2.fixed_n_per_group(df.repartition(7), ["grp"], 3, "id")
    assert sorted(r["id"] for r in out.collect()) == sorted(
        r["id"] for r in again.collect()
    )


def test_weighted_sample_bias_and_determinism(spark):
    from quanta_etl_spark.operators import sampling as samp3

    # 1000 ids: 100 "heavy" (weight 50) vs 900 light (weight 1)
    rows = [(i, 50.0 if i < 100 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w double")
    out = samp3.weighted_sample(df, "id", "w", k=100)
    picked = [r["id"] for r in out.collect()]
    assert len(picked) == 100
    heavy = sum(1 for i in picked if i < 100)
    # heavy ids carry 5000/5900 of the mass; expect far more than the
    # 10 a uniform sample would give (loose bound to avoid flakiness:
    # the hash is fixed, so this is deterministic anyway)
    assert heavy > 40
    # deterministic across partitionings
    again = [r["id"] for r in samp3.weighted_sample(
        df.repartition(7), "id", "w", k=100).collect()]
    assert again == picked
    # zero/negative weights never sampled
    df2 = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 5.0)], "id long, w double"
    )
    assert [r["id"] for r in samp3.weighted_sample(
        df2, "id", "w", 10).collect()] == [3]
