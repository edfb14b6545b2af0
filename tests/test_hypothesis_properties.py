"""Randomized property tests (hypothesis): operator invariants over
generated inputs — the layer of the §5 pyramid above hand-picked
examples. Example counts are small (Spark jobs per example), but every
run explores fresh inputs and shrinks failures to minimal cases.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from quanta_etl_spark.operators import corpus as corpus_ops
from quanta_etl_spark.operators import merge as merge_ops
from quanta_etl_spark.operators import quality as quality_ops

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_token = st.text(alphabet="abcdefg", min_size=1, max_size=4)
_doc = st.lists(_token, min_size=0, max_size=40).map(" ".join)


@given(docs=st.lists(_doc, min_size=1, max_size=6), chunk=st.integers(2, 8),
       overlap=st.integers(0, 3))
@settings(**_SETTINGS)
def test_chunking_covers_every_token_once_per_stride(spark, docs, chunk, overlap):
    if overlap >= chunk:
        overlap = chunk - 1
    stride = chunk - overlap
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    out = corpus_ops.chunk_documents(
        df, "doc_id", "text", chunk_tokens=chunk, overlap=overlap
    ).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in enumerate(docs):
        toks = text.lower().split() if text.strip() else []
        rows = sorted(by_doc[doc_id], key=lambda r: r["chunk_id"])
        # chunk starts advance by exactly the stride
        assert [r["chunk_start"] for r in rows] == [
            i * stride for i in range(len(rows))
        ]
        # reconstruction: drop each chunk's first `overlap` tokens
        # (except chunk 0) and the concatenation equals the doc
        rebuilt: list[str] = []
        for i, r in enumerate(rows):
            ts = r["chunk_text"].split() if r["chunk_text"] else []
            rebuilt.extend(ts if i == 0 else ts[overlap:])
        assert rebuilt == toks
        # every chunk except the last holds exactly chunk_tokens
        for r in rows[:-1]:
            assert r["n_chunk_tokens"] == chunk


@given(
    target=st.lists(
        st.tuples(st.integers(0, 9), st.floats(0, 100, allow_nan=False)),
        min_size=0, max_size=8, unique_by=lambda t: t[0],
    ),
    source=st.lists(
        st.tuples(st.integers(0, 9), st.floats(0, 100, allow_nan=False)),
        min_size=1, max_size=8, unique_by=lambda t: t[0],
    ),
)
@settings(**_SETTINGS)
def test_merge_upsert_idempotent_and_complete(spark, target, source):
    t = spark.createDataFrame(target or [(99, -1.0)], ["k", "v"])
    if not target:
        t = t.where("k < 0")  # empty frame with the right schema
    s = spark.createDataFrame(source, ["k", "v"])
    once = merge_ops.merge_upsert(t, s, ["k"])
    twice = merge_ops.merge_upsert(once, s, ["k"])
    got_once = sorted(map(tuple, once.collect()))
    got_twice = sorted(map(tuple, twice.collect()))
    assert got_once == got_twice  # idempotent
    # completeness: every source key present with the source value;
    # every unmatched target key survives untouched
    expect = dict(target)
    expect.update(dict(source))
    assert got_once == sorted(expect.items())


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 50),
                  st.one_of(st.none(), st.floats(-10, 10, allow_nan=False))),
        min_size=1, max_size=12,
    )
)
@settings(**_SETTINGS)
def test_validate_split_is_a_partition(spark, rows):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)],
        "id int, k int, v double",
    )
    good, bad = quality_ops.validate_split(
        df, {"v_pos": F.col("v") > 0, "k_small": F.col("k") < 25}
    )
    good_ids = {r["id"] for r in good.collect()}
    bad_ids = {r["id"] for r in bad.collect()}
    assert good_ids | bad_ids == set(range(len(rows)))
    assert not (good_ids & bad_ids)
    # NULL predicate results quarantine
    for i, (k, v) in enumerate(rows):
        if v is None:
            assert i in bad_ids


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    v1=st.lists(
        st.tuples(
            st.integers(0, 30),                       # key
            st.sampled_from(["a", "b", "c"]),        # group
            st.integers(-50, 50),                     # value (int: exact)
        ),
        min_size=0,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    v2=st.lists(
        st.tuples(
            st.integers(0, 30),
            st.sampled_from(["a", "b", "c"]),
            st.integers(-50, 50),
        ),
        min_size=0,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
)
def test_incremental_maintain_equals_recompute_random(spark, v1, v2):
    """For ANY two table versions (random inserts/deletes/updates,
    including group moves and groups emptied either way), maintaining
    the v1 rollup with the v1→v2 CDC must equal recomputing from v2."""
    from pyspark.sql import functions as F

    from quanta_etl_spark.operators.merge import incremental_agg_maintain

    schema = "k int, grp string, v int"
    d1 = spark.createDataFrame(v1, schema) if v1 else spark.createDataFrame([], schema)
    d2 = spark.createDataFrame(v2, schema) if v2 else spark.createDataFrame([], schema)
    # synthesize the CDC frame the diff_versions layout produces
    o = d1.select("k", F.struct("grp", "v").alias("__old"))
    n = d2.select("k", F.struct("grp", "v").alias("__new"))
    j = o.join(n, "k", "full_outer")
    change = (
        F.when(F.col("__old").isNull(), F.lit("insert"))
        .when(F.col("__new").isNull(), F.lit("delete"))
        .when(F.col("__old") != F.col("__new"), F.lit("update"))
    )
    cdc = (
        j.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(
            "k",
            "change_type",
            F.col("__old.grp").alias("old_grp"),
            F.col("__old.v").alias("old_v"),
            F.col("__new.grp").alias("new_grp"),
            F.col("__new.v").alias("new_v"),
        )
    )
    agg1 = d1.groupBy("grp").agg(
        F.sum("v").alias("total"), F.count(F.lit(1)).alias("n")
    )
    maintained = incremental_agg_maintain(
        agg1, cdc, ["grp"], {"total": ("old_v", "new_v")}, count_col="n"
    )
    expected = d2.groupBy("grp").agg(
        F.sum("v").alias("total"), F.count(F.lit(1)).alias("n")
    )
    got = {r.grp: (r.total, r.n) for r in maintained.collect()}
    want = {r.grp: (r.total, r.n) for r in expected.collect()}
    assert got == want, (got, want)


_pos_vals = st.lists(
    st.floats(min_value=0.015625, max_value=1e4, allow_nan=False,
              allow_infinity=False, width=32),
    min_size=2, max_size=12,
)


@given(vals=_pos_vals)
@settings(**_SETTINGS)
def test_gini_bounds_and_scale_invariance(spark, vals):
    """0 <= G <= (n-1)/n, and G is invariant under scaling all values."""
    from quanta_etl_spark.operators import aggregates as agg_ops

    rows = [("g", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, u long, v double")
    g1 = agg_ops.gini_coefficient(df, "v", ["u"], ["k"]).collect()[0]
    n = len(vals)
    assert -1e-9 <= g1["gini"] <= (n - 1) / n + 1e-9
    scaled = spark.createDataFrame(
        [("g", i, float(v) * 7.0) for i, v in enumerate(vals)],
        "k string, u long, v double",
    )
    g2 = agg_ops.gini_coefficient(scaled, "v", ["u"], ["k"]).collect()[0]
    assert abs(g1["gini"] - g2["gini"]) < 1e-6


@given(vals=_pos_vals)
@settings(**_SETTINGS)
def test_hhi_bounds(spark, vals):
    """1/n <= HHI <= 1 for positive shares."""
    from quanta_etl_spark.operators import aggregates as agg_ops

    rows = [("g", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, u long, v double")
    out = agg_ops.hhi_concentration(df, "v", ["u"], ["k"]).collect()[0]
    n = len(vals)
    assert 1.0 / n - 1e-9 <= out["hhi"] <= 1.0 + 1e-9


@given(texts=st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
             min_size=1, max_size=5),
    min_size=1, max_size=6,
))
@settings(**_SETTINGS)
def test_paragraph_dedup_identity_and_counts(spark, texts):
    """n_kept <= n_paras always; with min_repeats above the doc count
    nothing is ever removed (reconstruction identity)."""
    docs = [(i, ". ".join(paras)) for i, (paras) in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in corpus_ops.paragraph_dedup(
        df, min_repeats=len(texts) + 1
    ).collect()}
    assert set(out) == {i for i, _ in docs}
    for i, text in docs:
        assert out[i]["clean_text"] == text
        assert out[i]["n_kept"] == out[i]["n_paras"]
    strict = {r["doc_id"]: r for r in corpus_ops.paragraph_dedup(
        df, min_repeats=2
    ).collect()}
    for i, _ in docs:
        assert strict[i]["n_kept"] <= strict[i]["n_paras"]


@given(xs=st.lists(st.integers(-50, 50), min_size=2, max_size=20))
@settings(**_SETTINGS)
def test_chi_square_self_dependence(spark, xs):
    """A column crossed with itself: chi2 is finite and >= 0; dof =
    (k-1)^2 for k distinct values."""
    from quanta_etl_spark.operators import aggregates as agg_ops

    rows = [(str(x), str(x)) for x in xs]
    df = spark.createDataFrame(rows, "a string, b string")
    out = agg_ops.chi_square(df, "a", "b").collect()[0]
    k = len(set(xs))
    assert out["dof"] == (k - 1) ** 2
    assert out["chi2"] >= -1e-9
    assert out["n"] == len(xs)


@given(weights=st.lists(
    st.floats(min_value=0.015625, max_value=100.0, allow_nan=False,
              allow_infinity=False, width=32),
    min_size=1, max_size=15,
), k=st.integers(1, 20))
@settings(**_SETTINGS)
def test_weighted_sample_is_subset_with_exact_size(spark, weights, k):
    """The sample is always a subset of the positive-weight rows, of
    size min(k, n); rows are never duplicated."""
    from quanta_etl_spark.operators import sampling as samp_ops

    rows = [(i, float(w)) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "id long, w double")
    picked = [r["id"] for r in
              samp_ops.weighted_sample(df, "id", "w", k).collect()]
    assert len(picked) == min(k, len(weights))
    assert len(set(picked)) == len(picked)
    assert set(picked) <= {i for i, _ in rows}


@given(vals=st.lists(st.integers(0, 30), min_size=4, max_size=24),
       bins=st.integers(2, 6))
@settings(**_SETTINGS)
def test_quantile_bins_partition_properties(spark, vals, bins):
    """Bins partition the rows; sizes differ by at most 1; bin order
    respects value order."""
    from quanta_etl_spark.operators import sampling as samp_ops

    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = samp_ops.quantile_bins(df, "v", num_bins=bins,
                                 tiebreak_cols=["id"]).collect()
    assert len(out) == len(vals)
    from collections import Counter
    sizes = Counter(r["bin"] for r in out)
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # monotone: sort rows by (v, id); bins must be non-decreasing
    ordered = sorted(out, key=lambda r: (r["v"], r["id"]))
    assert all(a["bin"] <= b["bin"] for a, b in zip(ordered, ordered[1:]))
