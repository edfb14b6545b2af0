"""Round-6 batch 12: PMI collocations, BM25 retrieval,
nearest-centroid confusion."""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from quanta_etl_spark.operators import similarity as S
from quanta_etl_spark.operators import text_stats as TS


def test_collocations_pmi(spark):
    # "new york" always adjacent; "a b" pairs random-ish filler
    docs = [("new york city",)] * 6 + [("a b a c b a",)] * 3
    df = spark.createDataFrame(docs, "text string")
    out = TS.collocations(df, "text", min_count=3, top_k=5).collect()
    got = {r["bigram"]: r for r in out}
    assert "new york" in got and got["new york"]["n_ab"] == 6
    # PMI of a deterministic pair: verify against the hand formula
    r = got["new york"]
    # corpus: tokens 18+18=36? 6*3 + 3*6 = 36 tokens; bigrams with
    # n_ab>=3: new york(6), york city(6), and from filler: none reach 3
    # except... compute directly instead:
    uni = {}
    big = {}
    for (t,) in docs:
        ws = t.split()
        for w_ in ws:
            uni[w_] = uni.get(w_, 0) + 1
        for x, y in zip(ws, ws[1:]):
            big[(x, y)] = big.get((x, y), 0) + 1
    tu = sum(uni.values())
    tb = sum(big.values())  # ALL bigram positions, not just scored ones
    exp = math.log((6 / tb) / ((uni["new"] / tu) * (uni["york"] / tu)))
    assert r["pmi"] == pytest.approx(exp, rel=1e-9)


def test_bm25_ranks_exact_match_higher(spark):
    docs = [
        (1, "spark shuffle join"),          # both terms, short
        (2, "spark " + "filler " * 30),     # one term, long
        (3, "unrelated words entirely"),    # no terms
        (4, "shuffle shuffle shuffle"),     # one term, repeated
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = TS.bm25_topk(df, "doc_id", "text", ["spark", "shuffle"], top_k=10)
    rows = out.collect()
    ids = [r["doc_id"] for r in rows]
    assert 3 not in ids                 # zero-hit docs never surface
    assert ids[0] == 1                  # both-terms short doc wins
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[1]["n_terms_hit"] == 2
    assert by_id[2]["n_terms_hit"] == 1
    # deterministic across partitionings
    again = TS.bm25_topk(
        df.repartition(4), "doc_id", "text", ["spark", "shuffle"], top_k=10
    ).collect()
    assert [r["doc_id"] for r in again] == ids


def test_centroid_confusion_separable(spark):
    rows = (
        [(i, [1.0, 0.0], 0) for i in range(5)]
        + [(10 + i, [0.0, 1.0], 1) for i in range(5)]
        + [(20, [0.9, 0.1], 1)]  # mislabeled: sits in cluster 0
    )
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {(r["label"], r["predicted"]): r["n"]
           for r in S.centroid_confusion(df).collect()}
    assert out[(0, 0)] == 5
    # the mislabeled vector pulls label-1's centroid, but 5 clean ones
    # dominate; vector 20 itself classifies as 0
    assert out[(1, 1)] == 5
    assert out[(1, 0)] == 1
