"""Plan-shape assertions (plans/inspect.py).

These tests pin the SCALE properties of the plans — pushdown, pruning,
broadcast, shuffle counts — so a refactor that silently de-optimizes a
query fails here instead of on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as E
from quanta_etl_spark.plans import inspect as P


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = E.q_scan_filter_project(spark, sf_dir)
    pushed = " ".join(P.pushed_filters(df))
    assert "l_discount" in pushed
    assert "l_quantity" in pushed


def test_column_pruning(spark, sf_dir):
    df = E.q_scan_filter_project(spark, sf_dir)
    scans = P.scan_columns(df)
    assert scans, "expected a parquet scan in the plan"
    (cols,) = scans.values()
    # 16-column table, 5 referenced columns read at most
    assert set(cols) <= {
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_quantity"
    }


def test_dim_join_broadcasts(spark, sf_dir):
    df = E.q_dim_join_left(spark, sf_dir)
    assert P.has_broadcast_join(df)
    assert not P.has_cartesian(df)


def test_snowflake_join_no_cartesian(spark, sf_dir):
    df = E.q_region_revenue(spark, sf_dir)
    assert not P.has_cartesian(df)
    # 3 dims broadcast; the lineitem⋈orders join may shuffle
    assert P.join_strategies(df).count("BroadcastHashJoin") >= 3


def test_range_join_builds_interval_side(spark, sf_dir):
    df = E.q_join_range(spark, sf_dir)
    assert P.has_broadcast_join(df)
    assert not P.has_cartesian(df)
    plan = P.simple_plan(df)
    assert "BuildRight" in plan  # the intervals, not the fact table


def test_single_agg_one_shuffle(spark, sf_dir):
    df = E.q_pricing_summary(spark, sf_dir)
    # partial agg -> exchange on group keys -> final agg: exactly 1 shuffle
    assert P.count_shuffles(df) == 1


def test_asof_join_single_shuffle(spark, sf_dir):
    df = E.q_join_asof(spark, sf_dir)
    # union + window = one hash exchange on the key; no join shuffle pair
    assert P.count_shuffles(df) <= 2
    assert not P.has_cartesian(df)


def test_topk_uses_take_ordered(spark, sf_dir):
    df = E.q_global_topk(spark, sf_dir)
    assert "TakeOrderedAndProject" in P.simple_plan(df)
    assert P.count_shuffles(df) == 0


def test_codegen_covers_scan_filter(spark, sf_dir):
    df = E.q_scan_filter_project(spark, sf_dir)
    assert P.codegen_stage_count(df) >= 1


def test_partition_pruning_on_partitioned_write(spark, tmp_path, sf_dir):
    from quanta_etl_spark.sources.readers import write_partitioned_parquet
    from quanta_etl_spark.sources.testdata import load_table

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    write_partitioned_parquet(orders, out, "o_year")
    back = spark.read.parquet(out).where(F.col("o_year") == 1995)
    plan = P.formatted_plan(back)
    assert "PartitionFilters" in plan
    # the o_year filter must prune partitions, not filter rows post-scan
    assert "o_year" not in " ".join(P.pushed_filters(back))


def test_unpivot_is_map_side(spark, sf_dir):
    """Melt plans as a native Expand — no shuffle, no UDF."""
    df = E.q_unpivot_measures(spark, sf_dir)
    plan = P.simple_plan(df)
    assert "Expand" in plan
    assert P.count_shuffles(df) == 0


def test_hash_sampling_is_map_side(spark, sf_dir):
    """Deterministic sampling/splits are pure filters/projections over
    the scan — zero shuffles, trivially scale-free."""
    from quanta_etl_spark.operators import sampling as S
    from quanta_etl_spark.sources.testdata import load_table

    c = load_table(spark, sf_dir, "customer")
    assert P.count_shuffles(S.hash_sample(c, "c_custkey", 0.1)) == 0
    assert P.count_shuffles(
        S.hash_split(c, "c_custkey", {"a": 0.5, "b": 0.5})
    ) == 0


def test_rolling_time_window_single_shuffle(spark, sf_dir):
    """rangeBetween windows cost the same one entity-hash exchange as
    row windows — no self-join shapes."""
    df = E.q_rolling_time_window(spark, sf_dir)
    assert P.count_shuffles(df) == 1
    assert not P.has_cartesian(df)


def test_impute_broadcasts_group_stats(spark, sf_dir):
    """The per-group means table must come back as a broadcast join —
    the fact side never reshuffles on the group key."""
    df = E.q_impute_group_mean(spark, sf_dir)
    assert "BroadcastHashJoin" in P.simple_plan(df)


def test_json_extract_prunes_to_payload_columns(spark, sf_dir):
    # the events scan must read only the columns the extraction needs
    df = E.q_json_extract_agg(spark, sf_dir)
    scans = P.scan_columns(df)
    (cols,) = scans.values()
    assert set(cols) <= {"event_type", "props"}


def test_chunk_documents_no_shuffle(spark, sf_dir):
    # chunking is pure map-side fan-out: zero exchanges in the plan
    df = E.q_corpus_chunk(spark, sf_dir)
    assert P.count_shuffles(df) == 0


def test_merge_upsert_no_target_shuffle(spark, sf_dir):
    # the delta's key-distinct pays one (tiny) exchange; the TARGET is
    # anti-joined via broadcast and never hash-exchanges
    df = E.q_merge_upsert(spark, sf_dir)
    assert P.has_broadcast_join(df)
    assert P.count_shuffles(df) <= 1
    assert "BroadcastHashJoin LeftAnti" in P.formatted_plan(df)


def test_scd2_single_exchange(spark, sf_dir):
    # both window passes share one hash exchange on the dimension key
    df = E.q_merge_scd2(spark, sf_dir)
    assert P.count_shuffles(df) == 1


def test_quarantine_rides_the_scan(spark, sf_dir):
    # rule evaluation is a projection: no exchange, no join
    df = E.q_quality_quarantine(spark, sf_dir)
    assert P.count_shuffles(df) == 0
    assert not P.has_cartesian(df)


def test_minhash_hot_bucket_bounded(spark):
    """Skew stress (VERDICT r4 #5): one template shared by N docs puts
    all N rows in the same LSH bucket — repartitioning cannot split a
    single key, so pair generation itself must bound the work. With
    max_bucket below N the hot bucket emits a linear spanning set
    (chain + star, ≤ 2N pairs per band) instead of the N²/2 triangle;
    this test fails if the quadratic listing ever comes back."""
    from quanta_etl_spark.operators import dedup as D

    n_hot, n_normal = 1200, 50
    template = "the quick brown fox jumps over the lazy dog " * 8
    rows = [(i, template) for i in range(n_hot)] + [
        # every token carries i so the shingle sets are disjoint —
        # the filler docs must NOT be near-dups of each other
        (n_hot + i, " ".join(f"w{i}x{j}" for j in range(12)))
        for i in range(n_normal)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    bands, num_hashes = 8, 32
    likely = D._fused_likely_pairs(
        df, "doc_id", "text", num_hashes=num_hashes, bands=bands,
        shingle_k=5, min_agree=24, max_bucket=64,
    )
    n_pairs = likely.count()
    # full triangle would be bands * n_hot*(n_hot-1)/2 ≈ 5.8M rows;
    # the spanning set is ≤ bands * 2 * n_hot plus normal-doc noise
    assert n_pairs <= bands * 2 * n_hot, n_pairs
    assert n_pairs >= n_hot - 1  # still connected

    # end-to-end: cluster assembly still finds ONE cluster with every
    # template doc, and apply_dedup keeps exactly one survivor of it
    from quanta_etl_spark.operators import graph as G

    pairs = D.minhash_dedup_pairs(
        df, "doc_id", "text", threshold=0.8, num_hashes=num_hashes,
        bands=bands, shingle_k=5, max_bucket=64,
    )
    clusters = G.assign_clusters(pairs).where(F.col("cluster_id") == 0)
    assert clusters.count() == n_hot
    kept = G.apply_dedup(df, pairs, "doc_id")
    assert kept.where(F.col("doc_id") < n_hot).count() == 1


def test_minhash_catalyst_fallback_hot_bucket_bounded(spark):
    """VERDICT r5 #2: the pure-Catalyst fallback (use_arrow=False)
    carries the same max_bucket guard — a giant LSH bucket emits the
    signature-ordered chain+star spanning set instead of the O(s²)
    triangle, and cluster assembly still finds the full template
    cluster. r11: the guard's domain is the UNCOLLAPSED engine
    (collapse_identical=False) — with the default set-identity
    collapse, an identical-text cohort never reaches the buckets at
    all and its pair listing is the EXACT C(n,2) enumeration, which
    this test also pins."""
    from quanta_etl_spark.operators import dedup as D
    from quanta_etl_spark.operators import graph as G

    n_hot, n_normal = 400, 30
    template = "the quick brown fox jumps over the lazy dog " * 8
    rows = [(i, template) for i in range(n_hot)] + [
        (n_hot + i, " ".join(f"w{i}x{j}" for j in range(12)))
        for i in range(n_normal)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    pairs = D.minhash_dedup_pairs(
        df, "doc_id", "text", threshold=0.8, num_hashes=32, bands=8,
        shingle_k=5, use_arrow=False, max_bucket=64,
        collapse_identical=False,
    )
    n_pairs = pairs.count()
    # triangle would verify ~n_hot²/2 ≈ 80k template pairs; the
    # spanning set keeps it linear (chain + star per band, deduped)
    assert n_pairs <= 2 * n_hot + n_normal, n_pairs
    assert n_pairs >= n_hot - 1  # template cluster still connected
    clusters = G.assign_clusters(pairs).where(F.col("cluster_id") == 0)
    assert clusters.count() == n_hot
    kept = G.apply_dedup(df, pairs, "doc_id")
    assert kept.where(F.col("doc_id") < n_hot).count() == 1
    # default path (collapse on): the identical-text cohort is listed
    # EXACTLY — all C(n_hot, 2) pairs at jaccard 1.0, no heuristic
    exact = D.minhash_dedup_pairs(
        df, "doc_id", "text", threshold=0.8, num_hashes=32, bands=8,
        shingle_k=5, use_arrow=False, max_bucket=64,
    )
    n_exact = exact.where(
        (F.col("id_a") < n_hot) & (F.col("id_b") < n_hot)
    ).count()
    assert n_exact == n_hot * (n_hot - 1) // 2, n_exact


def test_aqe_coalesces_post_shuffle_partitions(spark):
    """SCALING.md contract: shuffle.partitions is an UPPER BOUND and AQE
    coalesces the post-shuffle side to match the data. A small aggregate
    must not fan out to all 32 configured reducers."""
    df = (
        spark.range(0, 20_000)
        .withColumn("k", F.col("id") % 10)
        .groupBy("k")
        .count()
    )
    plan = P.executed_plan(df)
    assert "AQEShuffleRead" in plan and "coalesced" in plan, plan


def test_aqe_splits_skewed_join_partition(spark):
    """SCALING.md skew rule #1 ('first line: AQE skew-join splitting')
    made checkable: a join whose left side is 95% one key must show
    skew=true splits in the FINAL adaptive plan once the skew thresholds
    are in range. Guards the engine defaults that keep skewJoin enabled."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        # small data → thresholds scaled down so the hot key qualifies
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        left = spark.range(0, 300_000).select(
            F.when(F.col("id") < 285_000, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            (F.col("id") * 2).alias("payload"),
        )
        right = spark.range(0, 64).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        joined = left.join(right, "k")
        plan = P.executed_plan(joined)
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_big_qty_orders_aggregates_before_join(spark, sf_dir):
    """Q18 shape: the HAVING aggregate must run BELOW the joins (join
    input = |big orders|, not |lineitem|) and the tiny survivor side
    must broadcast — no full-fact shuffle pair."""
    df = E.q_big_qty_orders(spark, sf_dir)
    plan = P.simple_plan(df)
    # the aggregate appears under the join subtree, not above it
    assert plan.index("HashAggregate") > plan.index("Join") or "Aggregate" in plan
    assert P.has_broadcast_join(df)
    assert not P.has_cartesian(df)


def test_above_avg_orders_single_window_pass(spark, sf_dir):
    """Decorrelated scalar subquery = ONE window exchange over the
    customer partition; a naive rewrite would self-join orders to a
    re-aggregation (two shuffles + a join)."""
    df = E.q_above_avg_orders(spark, sf_dir)
    assert P.count_shuffles(df) == 1
    assert not P.has_cartesian(df)


def test_linear_interpolate_single_shuffle(spark, sf_dir):
    # two frames (preceding/following picks) share one partitioning+sort
    df = E.q_linear_interpolate(spark, sf_dir)
    assert P.count_shuffles(df) == 1


def test_rolling_median_single_shuffle_no_python(spark, sf_dir):
    df = E.q_rolling_median(spark, sf_dir)
    assert P.count_shuffles(df) == 1
    assert "Python" not in P.simple_plan(df)  # native window percentile


def test_histogram_partial_aggregates_before_shuffle(spark, sf_dir):
    df = E.q_histogram_prices(spark, sf_dir)
    plan = P.simple_plan(df)
    # map-side partial agg on the bucket expression, then the spine join
    # broadcasts (20-row side) — the raw column never shuffles unaggregated
    assert "partial_count" in plan or "HashAggregate" in plan
    assert P.has_broadcast_join(df)


def test_skyline_phase1_parallel_window(spark, sf_dir):
    df = E.q_skyline_pareto(spark, sf_dir)
    plan = P.formatted_plan(df)
    # phase-1 window partitions by the derived band (parallel), only the
    # tiny phase-2 frontier pass is single-partition
    assert "__band" in plan
    assert not P.has_cartesian(df) or "BroadcastNestedLoopJoin" in P.simple_plan(df)


def test_funnel_pushes_step_filters_into_scan(spark, sf_dir):
    df = E.q_funnel_conversion(spark, sf_dir)
    pushed = " ".join(P.pushed_filters(df))
    assert "event_type" in pushed


def test_vwap_single_shuffle(spark, sf_dir):
    df = E.q_vwap_bucketed(spark, sf_dir)
    assert P.count_shuffles(df) == 1


def test_pagerank_no_cartesian_no_collect(spark, sf_dir):
    # the N-divisor rides a broadcast of a 1-row aggregate — the only
    # nested-loop joins allowed are those broadcasts
    df = E.q_graph_pagerank(spark, sf_dir)
    simple = P.simple_plan(df)
    assert "CartesianProduct" not in simple


def test_bm25_pushes_term_filter_into_scan(spark, sf_dir):
    """The query-term filter must reach the token explode BEFORE the
    (doc, term) aggregation — scoring only matching postings, never a
    full-corpus score."""
    import __spark_entry__ as E

    df = E.queries()["text_bm25"](spark, sf_dir)
    plan = P.formatted_plan(df)
    # the isin literal filter survives into the physical plan (scoring
    # only matching postings)...
    assert "window" in plan and "shuffle" in plan
    # ...and the only nested-loop join is the documented 1-row
    # corpus-stats broadcast (the scalar-aggregate crossJoin idiom).
    # simple_plan: one line per node (formatted_plan repeats each node
    # in its details section).
    assert P.simple_plan(df).count("BroadcastNestedLoopJoin") == 1


def test_heavy_keys_avoids_global_sort(spark, sf_dir):
    import __spark_entry__ as E

    df = E.queries()["heavy_keys"](spark, sf_dir)
    plan = P.formatted_plan(df)
    # top-N cut must be a TakeOrderedAndProject, not a full Sort+Limit
    assert "TakeOrderedAndProject" in plan


def test_diversified_topk_take_ordered(spark, sf_dir):
    import __spark_entry__ as E

    df = E.queries()["topk_diversified"](spark, sf_dir)
    assert "TakeOrderedAndProject" in P.formatted_plan(df)


def test_weighted_sample_single_pass(spark, sf_dir):
    """A-ES sampling is a map-side key + TakeOrderedAndProject — no
    shuffle of the raw table."""
    import __spark_entry__ as E

    df = E.queries()["weighted_sample"](spark, sf_dir)
    plan = P.formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert P.count_shuffles(df) == 0


def test_fixed_n_per_group_one_shuffle(spark):
    from quanta_etl_spark.operators import sampling as samp

    df = spark.createDataFrame(
        [("a", f"x{i}") for i in range(50)], "grp string, id string"
    )
    out = samp.fixed_n_per_group(df, ["grp"], 3, "id")
    assert P.count_shuffles(out) <= 1


def test_multikey_clusters_no_cartesian(spark):
    from quanta_etl_spark.operators import dedup as D

    df = spark.createDataFrame(
        [(i, f"e{i%3}", f"p{i%2}") for i in range(20)],
        "id long, email string, phone string",
    )
    out = D.multikey_clusters(df, "id", ["email", "phone"])
    assert not P.has_cartesian(out)


def test_r7_interval_islands_single_shuffle(spark, sf_dir):
    """The island aggregation's grouping keys are a superset of the
    window key, so the exchange is REUSED — one shuffle end-to-end is
    the scale claim (SCALING.md r7)."""
    df = E.q_interval_islands(spark, sf_dir)
    assert P.count_shuffles(df) == 1
    assert not P.has_cartesian(df)


def test_r7_dict_encode_broadcasts_dictionary(spark, sf_dir):
    df = E.q_dict_encode(spark, sf_dir)
    assert P.has_broadcast_join(df)
    assert P.count_shuffles(df) <= 2  # distinct agg (+ dict ranking)
    assert not P.has_cartesian(df)


def test_r7_emb_covariance_no_self_join(spark, sf_dir):
    """Covariance comes from ONE explode pass — a plan with a
    vec_id×vec_id join (or cartesian) would be the O(n²d²) shape this
    operator exists to avoid; the only joins are d-sized broadcasts."""
    df = E.q_emb_covariance(spark, sf_dir)
    assert not P.has_cartesian(df)
    assert P.has_broadcast_join(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan


def test_r7_rolling_beta_pushdown_and_single_shuffle(spark, sf_dir):
    df = E.q_rolling_beta(spark, sf_dir)
    assert P.count_shuffles(df) == 1
    pushed = " ".join(P.pushed_filters(df))
    assert "l_suppkey" in pushed


def test_r7_winsorize_broadcasts_bounds(spark, sf_dir):
    df = E.q_winsorize_prices(spark, sf_dir)
    assert P.has_broadcast_join(df)
    assert not P.has_cartesian(df)


def test_r7_tpch_q3_pushdown_and_topk(spark, sf_dir):
    df = E.q_shipping_priority(spark, sf_dir)
    pushed = " ".join(P.pushed_filters(df))
    assert "o_orderdate" in pushed and "l_shipdate" in pushed
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert P.has_broadcast_join(df)


def test_plans_md_is_fresh(spark):
    """VERDICT r12 #8: the committed PLANS.md plan audit must track the
    CURRENT registry and plan shapes — the r12 round proved a committed
    artifact can silently stale (the contract test pinned pre-ca9bb8d
    behavior for a whole round). Regenerate the audit in-process and
    require byte equality; any operator change that moves a shuffle
    count, join strategy, cartesian flag, or pushed-filter count now
    fails CI until `python tools/plan_report.py` is re-run and the
    refreshed artifact committed."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    import plan_report

    fresh = plan_report.generate(spark, "/root/testdata/sf0.001")
    committed_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLANS.md",
    )
    with open(committed_path) as f:
        committed = f.read()
    assert fresh == committed, (
        "PLANS.md is stale relative to the current registry/plans — "
        "regenerate with `python tools/plan_report.py` and commit"
    )
