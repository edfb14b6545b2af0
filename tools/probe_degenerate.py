"""Degenerate-input probe over the operator library (r9 audit tool).

Feeds every operator family adversarial single-row / zero-variance /
zero-norm / empty inputs and classifies the outcome:

  OK      -- ran; output checked for NaN/Inf leakage
  VALERR  -- raised ValueError (a deliberate guard firing)
  CRASH   -- execution error (ANSI arithmetic abort, Py4J, numpy) = bug

Run from the repo root: ``python tools/probe_degenerate.py``.
Exit code 1 if any CRASH or NaN/Inf leak is found.

r9 findings fixed by this probe: zero-norm cosine ANSI aborts
(cosine_topk_*, label_cohesion, centroid_confusion), n=1
embedding_covariance, zero-total gini/hhi, zero-peak max_drawdown,
net-zero contribution shares -- see the round-9 commits.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import math
import traceback

from pyspark.sql import SparkSession, functions as F

from quanta_etl_spark.operators import (
    aggregates as A,
    corpus as C,
    events as E,
    graph as G,
    quality as Q,
    resample as R,
    similarity as S,
)

spark = (
    SparkSession.builder.master("local[4]")
    .appName("probe")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import datetime as dt

TS = dt.datetime(2024, 1, 1)


def mk(rows, schema):
    return spark.createDataFrame(rows, schema)


def _bad_float_in(v):
    """Recursive NaN/Inf scan: floats nested in array/struct/map
    columns (Row, list, dict values) must not escape the leak check —
    a normalized-vector or forecast array with a NaN element is the
    same audit failure as a top-level NaN scalar (r9 self-review)."""
    if isinstance(v, float):
        return math.isnan(v) or math.isinf(v)
    if isinstance(v, dict):
        # keys too: a map<double,...> keyed by a computed NaN is the
        # same leak as a NaN value (r9 second review)
        return any(
            _bad_float_in(x) for kv in v.items() for x in kv
        )
    if isinstance(v, (list, tuple)):  # Row is a tuple subclass
        return any(_bad_float_in(x) for x in v)
    return False


def has_bad_float(rows):
    return any(_bad_float_in(r) for r in rows)


probes = []


def probe(name):
    def deco(fn):
        probes.append((name, fn))
        return fn
    return deco


# ---------- aggregates ----------
@probe("ols_constant_x")
def _():
    df = mk([("g", 1.0, 2.0), ("g", 1.0, 3.0), ("g", 1.0, 4.0)], "g string, x double, y double")
    return A.ols_regress(df, "y", "x", ["g"])

@probe("ols_single_point")
def _():
    df = mk([("g", 1.0, 2.0)], "g string, x double, y double")
    return A.ols_regress(df, "y", "x", ["g"])

@probe("chi_square_single_level")
def _():
    df = mk([("a", "x")] * 5, "a string, b string")
    return A.chi_square(df, "a", "b")

@probe("gini_all_zero")
def _():
    df = mk([("u1", 0.0), ("u2", 0.0)], "unit string, v double")
    return A.gini_coefficient(df, "v", ["unit"])

@probe("hhi_zero_total")
def _():
    df = mk([("u1", 0.0), ("u2", 0.0)], "unit string, v double")
    return A.hhi_concentration(df, "v", ["unit"])

@probe("allocate_zero_weights")
def _():
    df = mk([("a", 0.0), ("b", 0.0)], "id string, w double")
    return A.allocate_proportional(df, "id", "w", 10)

@probe("ab_test_one_arm")
def _():
    df = mk([("u1", "A", 1), ("u2", "A", 0)], "unit string, grp string, conv int")
    return A.ab_test_proportions(df, "unit", "grp", "conv")

@probe("ab_test_zero_conv")
def _():
    df = mk([("u1", "A", 0), ("u2", "B", 0), ("u3", "A", 0), ("u4", "B", 0)],
            "unit string, grp string, conv int")
    return A.ab_test_proportions(df, "unit", "grp", "conv")

@probe("basket_single_item")
def _():
    df = mk([(1, "x")] * 6, "basket long, item string")
    return A.basket_lift(df, "basket", "item", min_support=1)

@probe("mode_all_ties")
def _():
    df = mk([("g", "a"), ("g", "b")], "g string, v string")
    return A.mode_by(df, ["g"], "v")

@probe("auc_single_class")
def _():
    df = mk([(0.1, 1), (0.9, 1)], "score double, label int")
    return A.score_auc(df, "score", "label")

@probe("psi_empty_bucket")
def _():
    base = mk([(float(i),) for i in range(20)], "v double")
    cur = mk([(100.0,), (101.0,)], "v double")
    return A.psi_drift(base, cur, "v")

@probe("weighted_median_zero_w")
def _():
    df = mk([("g", 1.0, 0.0), ("g", 2.0, 0.0)], "g string, v double, w double")
    return A.weighted_median(df, "v", "w", ["g"])

# ---------- resample ----------
@probe("seasonal_short_series")
def _():
    df = mk([(TS, 1.0), (TS + dt.timedelta(days=1), 2.0)], "ts timestamp, v double")
    return R.seasonal_decompose(df, "ts", "v")

@probe("holt_one_point")
def _():
    df = mk([(TS, 1.0)], "ts timestamp, v double")
    return R.holt_forecast(df, "ts", "v")

@probe("hw_min_valid_series")
def _():
    rows = [(TS + dt.timedelta(days=i), float(i)) for i in range(15)]
    return R.holt_winters_forecast(mk(rows, "ts timestamp, v double"), "ts", "v", period=7)

@probe("xcorr_constant_series")
def _():
    rows = [(TS + dt.timedelta(days=i), 1.0, 2.0) for i in range(10)]
    return R.cross_correlation(mk(rows, "ts timestamp, x double, y double"), "ts", "x", "y", max_lag=2)

@probe("dow_single_day")
def _():
    df = mk([(TS, 1.0), (TS, 3.0)], "ts timestamp, v double")
    return R.dow_seasonality(df, "ts", "v")

# ---------- events ----------
@probe("km_all_censored")
def _():
    df = mk([(5.0, 0), (7.0, 0)], "dur double, event int")
    return E.kaplan_meier(df, "dur", "event")

@probe("km_zero_duration")
def _():
    df = mk([(0.0, 1), (3.0, 1)], "dur double, event int")
    return E.kaplan_meier(df, "dur", "event")

@probe("conv_latency_no_conversion")
def _():
    df = mk([("u", TS, "visit")], "u string, ts timestamp, t string")
    return E.conversion_latency(df, "u", "ts", "t", "visit", "buy")

@probe("time_in_state_single_event")
def _():
    df = mk([("u", TS, "on")], "u string, ts timestamp, s string")
    return E.time_in_state(df, "u", "ts", "s")

@probe("attrib_conversion_no_touch")
def _():
    df = mk([("u", TS, "conv", 5.0)], "u string, ts timestamp, t string, val double")
    return E.attribute_position_based(
        df, "u", "ts", F.col("t") == "conv", F.col("t") == "touch", F.col("t"), "val"
    )

@probe("attrib_single_touch")
def _():
    df = mk(
        [("u", TS, "touch", 0.0), ("u", TS + dt.timedelta(hours=1), "conv", 5.0)],
        "u string, ts timestamp, t string, val double",
    )
    return E.attribute_position_based(
        df, "u", "ts", F.col("t") == "conv", F.col("t") == "touch", F.col("t"), "val"
    )

@probe("rfm_single_customer")
def _():
    df = mk([("c", TS, 5.0)], "c string, ts timestamp, amt double")
    return E.rfm_segments(df, "c", "ts", "amt")

@probe("sliding_active_empty")
def _():
    df = mk([], "user_id string, ts timestamp")
    return E.sliding_active_users(df)

@probe("seq_conformance_empty_pattern_user")
def _():
    df = mk([("u", TS, "z")], "u string, ts timestamp, t string")
    return E.sequence_conformance(df, "u", "ts", "t", "a>b")

# ---------- similarity ----------
@probe("cosine_zero_vector")
def _():
    df = mk([(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
            "vec_id long, embedding array<double>")
    return S.cosine_topk_bruteforce(df, df, k=2)

@probe("cosine_k_gt_n")
def _():
    df = mk([(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>")
    return S.cosine_topk_bruteforce(df, df, k=10)

@probe("lsh_two_vectors")
def _():
    df = mk([(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>")
    return S.cosine_topk_lsh(df, df, k=1)

@probe("ivf_fewer_rows_than_centroids")
def _():
    df = mk([(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
            "vec_id long, embedding array<double>")
    return S.cosine_topk_ivf(df, df, k=1, num_centroids=16)

@probe("cohesion_single_label_single_vec")
def _():
    df = mk([(1, [1.0, 0.0], "a")], "vec_id long, embedding array<double>, label string")
    return S.label_cohesion(df)

@probe("confusion_single_label")
def _():
    df = mk([(1, [1.0, 0.0], "a"), (2, [0.9, 0.1], "a")],
            "vec_id long, embedding array<double>, label string")
    return S.centroid_confusion(df)

@probe("emb_cov_single_row")
def _():
    df = mk([(1, [1.0, 2.0])], "vec_id long, embedding array<double>")
    return S.embedding_covariance(df)

@probe("emb_cov_empty")
def _():
    df = mk([], "vec_id long, embedding array<double>")
    return S.embedding_covariance(df)

# ---------- graph ----------
@probe("pagerank_self_loop")
def _():
    df = mk([(1, 1), (1, 2)], "src long, dst long")
    return G.pagerank(df)

@probe("pagerank_empty")
def _():
    df = mk([], "src long, dst long")
    return G.pagerank(df)

@probe("bfs_unreachable")
def _():
    e = mk([(1, 2), (3, 4)], "src long, dst long")
    return G.bfs_depths(e, e.sparkSession.createDataFrame([(1,)], "node long"))

@probe("kcore_everything_peels")
def _():
    e = mk([(1, 2), (2, 3)], "src long, dst long")
    return G.k_core(e, k=5)

@probe("triangles_self_loop")
def _():
    e = mk([(1, 1), (1, 2), (2, 3), (1, 3)], "src long, dst long")
    return G.triangle_counts(e)

@probe("linkpred_no_common")
def _():
    e = mk([(1, 2), (3, 4)], "src long, dst long")
    return G.link_prediction_jaccard(e)

@probe("clustering_isolated_pair")
def _():
    e = mk([(1, 2)], "src long, dst long")
    return G.clustering_coefficient(e)

# ---------- corpus ----------
@probe("pack_doc_exceeds_budget")
def _():
    df = mk([(1, 100), (2, 3)], "doc_id long, n_tok int")
    return C.pack_sequences(df, "doc_id", "n_tok", budget=10)

@probe("pack_zero_tokens")
def _():
    df = mk([(1, 0), (2, 0)], "doc_id long, n_tok int")
    return C.pack_sequences(df, "doc_id", "n_tok", budget=10)

@probe("chunk_empty_text")
def _():
    df = mk([(1, ""), (2, None)], "doc_id long, text string")
    return C.chunk_documents(df, "doc_id", "text")

@probe("chunk_overlap_ge_chunk")
def _():
    df = mk([(1, "a b c d e")], "doc_id long, text string")
    return C.chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)

@probe("mix_zero_weight")
def _():
    df = mk([(1, "web"), (2, "web"), (3, "book")], "doc_id long, source string")
    return C.mix_sources(df, "source", "doc_id", {"web": 0.0, "book": 1.0})

@probe("paragraph_dedup_no_sep")
def _():
    df = mk([(1, "no separator here")], "doc_id long, text string")
    return C.paragraph_dedup(df)

@probe("decontaminate_short_docs")
def _():
    corpus = mk([(1, "too short")], "doc_id long, text string")
    bench = mk([(1, "also short")], "doc_id long, text string")
    return C.decontaminate(corpus, bench, "doc_id", "text")

@probe("quality_filter_null_text")
def _():
    df = mk([(1, None), (2, "hello world " * 20)], "doc_id long, text string")
    return C.quality_filter(df, "doc_id", "text", min_tokens=1, langs=None)

# ---------- quality ----------
@probe("mad_zero_mad")
def _():
    df = mk([("g", 1.0), ("g", 1.0), ("g", 1.0), ("g", 9.0)], "g string, v double")
    return Q.mad_outliers(df, "v", ["g"])

@probe("winsorize_constant")
def _():
    df = mk([("g", 5.0)] * 4, "g string, v double")
    return Q.winsorize(df, ["g"], "v")

@probe("qnorm_single_row_group")
def _():
    df = mk([("a", 1.0), ("b", 2.0), ("b", 3.0)], "g string, v double")
    return Q.quantile_normalize(df, ["g"], "v")

@probe("benford_nonpositive")
def _():
    df = mk([(0.0,), (-12.0,), (5.0,), (None,)], "v double")
    return Q.benford_check(df, "v")

@probe("outlier_ensemble_constant")
def _():
    df = mk([("g", 2.0)] * 5, "g string, v double")
    return Q.outlier_ensemble(df, ["g"], "v")

@probe("reconcile_empty_detail")
def _():
    fact = mk([(1, 10.0)], "k long, total double")
    det = mk([], "k long, amt double")
    return Q.reconcile_totals(fact, det, "k", "k", "total", F.col("amt"))

@probe("heavy_keys_null_key")
def _():
    df = mk([(None,), ("a",), (None,)], "k string")
    return Q.heavy_keys(df, ["k"])


@probe("cohesion_zero_vector")
def _():
    df = mk([(1, [0.0, 0.0], "a"), (2, [1.0, 0.0], "a"), (3, [0.0, 0.0], "b")],
            "vec_id long, embedding array<double>, label string")
    return S.label_cohesion(df)

@probe("confusion_zero_vector")
def _():
    df = mk([(1, [0.0, 0.0], "a"), (2, [1.0, 0.0], "a"), (3, [0.0, 1.0], "b")],
            "vec_id long, embedding array<double>, label string")
    return S.centroid_confusion(df)

@probe("lsh_zero_vector")
def _():
    df = mk([(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
            "vec_id long, embedding array<double>")
    return S.cosine_topk_lsh(df, df, k=2)

@probe("gini_mixed_zero_group")
def _():
    df = mk([("g1", "u1", 0.0), ("g1", "u2", 0.0), ("g2", "u1", 1.0), ("g2", "u2", 3.0)],
            "g string, unit string, v double")
    return A.gini_coefficient(df, "v", ["unit"], ["g"])

@probe("drawdown_zero_peak")
def _():
    from quanta_etl_spark.operators import windows as W
    df = mk([("x", TS, 0.0), ("x", TS + dt.timedelta(days=1), 100.0),
             ("x", TS + dt.timedelta(days=2), 40.0)],
            "k string, ts timestamp, v double")
    return W.max_drawdown(df, "k", "ts", "v")

@probe("contribution_net_zero_total")
def _():
    df = mk([("a", 10.0), ("b", -10.0)], "g string, v double")
    return A.contribution(df, "v", ["g"])

@probe("psi_empty_current")
def _():
    base = mk([(float(i),) for i in range(100)], "v double")
    cur = mk([], "v double")
    return A.psi_drift(base, cur, "v", bins=5)

@probe("weighted_index_zero_weights")
def _():
    df = mk([(TS, 5.0, 0.0), (TS, 7.0, 0.0)], "ts timestamp, p double, w double")
    return R.weighted_index(df, "ts", "p", "w", interval="1 hour")

@probe("growth_from_zero_base")
def _():
    df = mk([(TS, 0.0), (TS + dt.timedelta(days=31), 50.0)], "ts timestamp, v double")
    return R.period_growth(df, "ts", "v", interval="month")

@probe("dow_net_zero_overall")
def _():
    df = mk([(TS, 10.0), (TS + dt.timedelta(days=1), -10.0)], "ts timestamp, v double")
    return R.dow_seasonality(df, "ts", "v")


# ---------- windows ----------
@probe("ewma_single_row")
def _():
    from quanta_etl_spark.operators import windows as W
    df = mk([("k", TS, 5.0)], "k string, ts timestamp, v double")
    return W.ewma(df, "k", "ts", "v")

@probe("ewma_null_values")
def _():
    from quanta_etl_spark.operators import windows as W
    df = mk([("k", TS, None), ("k", TS + dt.timedelta(minutes=1), 3.0)],
            "k string, ts timestamp, v double")
    return W.ewma(df, "k", "ts", "v")

@probe("interpolate_all_null")
def _():
    from quanta_etl_spark.operators import windows as W
    df = mk([("k", TS, None), ("k", TS + dt.timedelta(minutes=1), None)],
            "k string, ts timestamp, v double")
    return W.linear_interpolate(df, "k", "ts", "v")

@probe("interpolate_same_ts")
def _():
    from quanta_etl_spark.operators import windows as W
    df = mk([("k", TS, 1.0), ("k", TS, None), ("k", TS, 3.0)],
            "k string, ts timestamp, v double")
    return W.linear_interpolate(df, "k", "ts", "v")

@probe("rolling_median_single")
def _():
    from quanta_etl_spark.operators import windows as W
    df = mk([("k", TS, 5.0)], "k string, ts timestamp, v double")
    return W.rolling_median(df, "k", "ts", "v", window_rows=10)

@probe("cusum_constant_series")
def _():
    from quanta_etl_spark.operators import windows as W
    df = mk([("k", TS + dt.timedelta(minutes=i), 5.0) for i in range(5)],
            "k string, ts timestamp, v double")
    return W.cusum(df, "k", "ts", "v", target=5.0, slack=0.5, threshold=2.0)

@probe("merge_intervals_point")
def _():
    from quanta_etl_spark.operators import windows as W
    df = mk([("k", TS, TS)], "k string, s timestamp, e timestamp")
    return W.merge_intervals(df, "k", "s", "e")

# ---------- joins ----------
@probe("asof_empty_right")
def _():
    from quanta_etl_spark.operators import joins as J
    left = mk([("a", TS, 1.0)], "k string, ts timestamp, v double")
    right = mk([], "k string, ts timestamp, px double")
    return J.asof_join(left, right, "k", "ts", "ts", ["px"])

@probe("salted_join_tiny")
def _():
    from quanta_etl_spark.operators import joins as J
    left = mk([("a", 1)], "k string, v int")
    right = mk([("a", 9)], "k string, w int")
    return J.salted_join(left, right, "k")

# ---------- text ----------
@probe("tfidf_empty_and_punct_docs")
def _():
    from quanta_etl_spark.operators import text_stats as T
    df = mk([(1, ""), (2, "..."), (3, "hello world hello")],
            "doc_id long, text string")
    return T.tfidf(df, "doc_id", "text")

@probe("entropy_single_token")
def _():
    from quanta_etl_spark.operators import text_stats as T
    df = mk([(1, "word")], "doc_id long, text string")
    return T.token_entropy(df, "doc_id", "text")

@probe("repetition_single_token_doc")
def _():
    from quanta_etl_spark.operators import text_stats as T
    df = mk([(1, "word"), (2, "a b a b")], "doc_id long, text string")
    return T.repetition_stats(df, "doc_id", "text")

@probe("bm25_query_term_absent")
def _():
    from quanta_etl_spark.operators import text_stats as T
    df = mk([(1, "spark shuffles data"), (2, "duckdb scans parquet")],
            "doc_id long, text string")
    return T.bm25_topk(df, "doc_id", "text", ["zzzzz"], top_k=3)

# ---------- multimodal ----------
@probe("media_empty_payload")
def _():
    from quanta_etl_spark.multimodal import media as M
    df = mk([(1, bytearray(b""), "image", 2, 2),
             (2, bytearray(b"\x01\x02\x03\x04" * 3), "image", 2, 2)],
            "media_id long, content binary, kind string, width int, height int")
    return M.image_features(M.decode_image(df))

@probe("audio_odd_byte_payload")
def _():
    from quanta_etl_spark.multimodal import media as M
    df = mk([(1, bytearray(b"\x01\x02\x03"))], "media_id long, content binary")
    return M.audio_features(df, sample_width=2)


results = {"OK": [], "VALERR": [], "CRASH": [], "BADFLOAT": []}
for name, fn in probes:
    try:
        out = fn()
        rows = out.collect() if hasattr(out, "collect") else out
        if isinstance(rows, list) and has_bad_float(rows):
            print(f"[BADFLOAT] {name}: {len(rows)} rows  <-- NaN/Inf in output!")
            for r in rows[:6]:
                print(f"        {r}")
            results["BADFLOAT"].append(name)
        else:
            nrows = len(rows) if isinstance(rows, list) else "?"
            print(f"[OK]    {name}: {nrows} rows")
            results["OK"].append(name)
    except ValueError as e:
        print(f"[VALERR] {name}: {e}")
        results["VALERR"].append(name)
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"[CRASH] {name}: {type(e).__name__}: {msg}")
        results["CRASH"].append(name)

print("\n==== SUMMARY ====")
for k, v in results.items():
    print(f"{k}: {len(v)}  {v if k != 'OK' else ''}")
spark.stop()
sys.exit(1 if results["CRASH"] or results["BADFLOAT"] else 0)
