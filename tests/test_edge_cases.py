"""Edge-case semantics the reference's data model depends on
(SURVEY.md §5): null join keys, empty inputs, degenerate text.

Null-key semantics matter because the reference's quality checks exist
precisely BECAUSE null isins/underlyings occur (etl.py:166-175): a left
join must KEEP null-key fact rows (unmatched), an inner join must DROP
them — SQL null-equality is never true.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from quanta_etl_spark.functions import text as T
from quanta_etl_spark.operators import dedup as dedup_ops
from quanta_etl_spark.operators import joins as join_ops
from quanta_etl_spark.operators import windows as win_ops


def test_null_keys_kept_by_left_dropped_by_inner(spark):
    fact = spark.createDataFrame(
        [(1, "A"), (2, None), (3, "B"), (4, None)], "id long, k string"
    )
    dim = spark.createDataFrame([("A", "dimA"), ("B", "dimB")], "k string, v string")
    left = join_ops.broadcast_dim_join(fact, dim, "k", "left")
    inner = join_ops.broadcast_dim_join(fact, dim, "k", "inner")
    assert left.count() == 4
    assert inner.count() == 2
    null_rows = left.where(F.col("k").isNull()).collect()
    assert {r["id"] for r in null_rows} == {2, 4}
    assert all(r["v"] is None for r in null_rows)


def test_two_key_join_null_never_matches(spark):
    l = spark.createDataFrame([(1, "A", None), (2, "A", "t1")], "id long, k string, ts string")
    r = spark.createDataFrame([("A", None, 9.0), ("A", "t1", 1.0)], "k string, ts string, v double")
    out = join_ops.two_key_join(l, r, ["k", "ts"], ["k", "ts"])
    rows = out.collect()
    # only the (A, t1) pair joins; (A, NULL) = (A, NULL) is NOT a match
    assert len(rows) == 1 and rows[0]["v"] == 1.0


def test_empty_input_operators(spark):
    empty = spark.createDataFrame([], "isin string, ts timestamp, price double")
    assert win_ops.forward_fill(empty, ["price"], ["isin"], ["ts"]).count() == 0
    assert win_ops.lag_returns(empty, "price", ["isin"], ["ts"]).count() == 0
    assert win_ops.sessionize(empty, "isin", "ts").count() == 0
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert dedup_ops.exact_dedup_by_fingerprint(empty_docs, "text", "doc_id").count() == 0
    assert dedup_ops.minhash_dedup_pairs(empty_docs, "doc_id", "text").count() == 0


def test_degenerate_text(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "a"), (4, None), (5, "über café 日本語")],
        "doc_id long, text string",
    )
    out = docs.select(
        "doc_id",
        T.token_count("text").alias("n"),
        T.lang_id("text").alias("lang"),
        T.quality_score("text").alias("q"),
        T.fingerprint("text").alias("fp"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["n"] == 0 and by_id[2]["n"] == 0
    assert by_id[3]["n"] == 1
    assert by_id[1]["lang"] == "und"
    assert 0.0 <= by_id[3]["q"] <= 1.0
    assert by_id[5]["n"] == 3  # unicode whitespace tokenization
    # null text: expressions propagate null rather than erroring
    assert by_id[4]["n"] is None or by_id[4]["n"] == 0


def test_dropduplicates_deterministic_survivor(spark):
    """exact_dedup_by_fingerprint picks the MIN id, run after run —
    unlike bare dropDuplicates whose survivor is partition-order luck."""
    docs = spark.createDataFrame(
        [(10, "same text"), (3, "same  text"), (7, "SAME TEXT"), (1, "other")],
        "doc_id long, text string",
    )
    for _ in range(3):
        out = dedup_ops.exact_dedup_by_fingerprint(docs, "text", "doc_id")
        assert {r["doc_id"] for r in out.collect()} == {1, 3}


def test_empty_input_round2_operators(spark):
    from quanta_etl_spark.operators import quality as Q
    from quanta_etl_spark.operators import reshape as R
    from quanta_etl_spark.operators import sampling as S
    from quanta_etl_spark.operators import text_stats as TS

    empty = spark.createDataFrame([], "k string, v double, id long")
    assert R.unpivot(empty, ["k"], ["v"], "m", "x").count() == 0
    assert S.hash_split(empty, "id", {"a": 0.5, "b": 0.5}).count() == 0
    assert S.hash_sample(empty, "id", 0.5).count() == 0
    assert Q.impute_group_mean(empty, "v", ["k"]).count() == 0
    assert Q.iqr_outliers(empty, "v", ["k"]).count() == 0
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert TS.tfidf(empty_docs, "doc_id", "text").count() == 0
    assert TS.ngram_counts(empty_docs, "text").count() == 0


def test_all_null_group_imputation(spark):
    from quanta_etl_spark.operators import quality as Q

    df = spark.createDataFrame(
        [("a", None), ("a", None), ("b", 1.0)], "k string, v double"
    )
    out = {(r.k): r.v for r in Q.impute_group_mean(df, "v", ["k"]).collect()
           if r.k == "a"}
    # no non-null values in group 'a' -> stays null (no fabricated fill)
    assert out == {"a": None}


def test_ngram_counts_short_docs(spark):
    from quanta_etl_spark.operators import text_stats as TS

    docs = spark.createDataFrame(
        [(1, "one two three"), (2, "one two"), (3, "single")],
        "doc_id long, text string",
    )
    got = {r.ngram: r.occurrences for r in TS.ngram_counts(docs, "text", n=2).collect()}
    assert got == {"one two": 2, "two three": 1}
    # docs shorter than n tokens contribute nothing (ML convention)
    assert TS.ngram_counts(docs.where("doc_id = 3"), "text", n=2).count() == 0


def test_round5_operators_edge_cases(spark):
    """Degenerate inputs for the round-5 surface: empty frames, absent
    sources, single-element buckets."""
    from quanta_etl_spark.operators import corpus as corpus_ops
    from quanta_etl_spark.operators import quality as Q
    from quanta_etl_spark.streaming import ingest

    empty_docs = spark.createDataFrame([], "doc_id long, source string")
    # mix_sources on empty corpus: no rows, no division blowups
    assert corpus_ops.mix_sources(
        empty_docs, "source", "doc_id", {"web": 1.0}
    ).count() == 0
    # weights naming only absent sources: everything dropped
    some = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, source string")
    assert corpus_ops.mix_sources(
        some, "source", "doc_id", {"nope": 1.0}
    ).count() == 0
    # fuzzy pairs: empty and single-row inputs produce no pairs
    assert dedup_ops.fuzzy_match_pairs(
        empty_docs.withColumnRenamed("source", "name"), "doc_id", "name"
    ).count() == 0
    one = spark.createDataFrame([(1, "solo")], "doc_id long, name string")
    assert dedup_ops.fuzzy_match_pairs(one, "doc_id", "name").count() == 0
    # profile of an all-NULL column
    nulls = spark.createDataFrame([(None,), (None,)], "x string")
    row = Q.profile_columns(nulls).collect()[0]
    assert (row.n_rows, row.n_null, row.n_distinct) == (2, 2, 0)
    assert row.min_str is None and row.max_str is None
    # normalize_event_time leaves a TIMESTAMP column untouched
    import datetime as dt

    ts_df = spark.createDataFrame([(dt.datetime(2024, 1, 1),)], "ts timestamp")
    assert ingest.normalize_event_time(ts_df).schema == ts_df.schema


def test_bucket_pair_indices_edge_cases():
    """Pure-numpy helper: singleton runs emit nothing; a size-2 hot run
    (> cap=1) emits exactly the chain pair; cap boundary is inclusive.
    The third return flags spanning (hot-run) pairs — the emit-once
    banding exemption set."""
    import numpy as np

    from quanta_etl_spark.operators.dedup import _bucket_pair_indices

    # all singletons
    gi, gj, sp = _bucket_pair_indices(
        np.array([0, 1, 2]), np.array([1, 1, 1]), 64
    )
    assert len(gi) == 0 and len(sp) == 0
    # size-2 run over cap → chain only (1 pair), star degenerate
    gi, gj, sp = _bucket_pair_indices(np.array([0]), np.array([2]), 1)
    assert list(zip(gi, gj)) == [(0, 1)]
    assert sp.all()  # hot-run pair flagged spanning
    # at the cap → full triangle, none spanning
    gi, gj, sp = _bucket_pair_indices(np.array([0]), np.array([3]), 3)
    assert len(gi) == 3 and not sp.any()
    # just past the cap → 2s-3 spanning pairs
    gi, gj, sp = _bucket_pair_indices(np.array([0]), np.array([4]), 3)
    assert len(gi) == 2 * 4 - 3 and sp.all()
