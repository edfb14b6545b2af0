"""Driver contract: entry() smoke, queries() + oracle_sql() correctness gate.

Each query exercises operators from SURVEY.md §2 through the
``quanta_etl_spark`` library (the engine under test), expressed over the
driver's TPC-H-ish testdata. Every computed column is aliased
identically in the Spark code and the oracle SQL; double aggregates are
computed via exact decimal(20,6) sums cast back to double so that both
engines produce bit-identical values regardless of accumulation order.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Python-UDF closures (pandas_udf / mapInPandas) from this package must
# pickle BY VALUE: the driver may run this module from any cwd, and the
# executors' python workers have no /root/repo on sys.path — a
# by-reference pickle would fail to unpickle there.
try:  # pragma: no cover - environment guard
    import quanta_etl_spark as _pkg
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_pkg)
except Exception:
    pass

from quanta_etl_spark.functions import text as T
from quanta_etl_spark.operators import aggregates as agg_ops
from quanta_etl_spark.operators import corpus as corpus_ops
from quanta_etl_spark.operators import dedup as dedup_ops
from quanta_etl_spark.operators import events as event_ops
from quanta_etl_spark.operators import graph as graph_ops
from quanta_etl_spark.operators import joins as join_ops
from quanta_etl_spark.operators import merge as merge_ops
from quanta_etl_spark.operators import quality as quality_ops
from quanta_etl_spark.operators import resample as resample_ops
from quanta_etl_spark.operators import setops as set_ops
from quanta_etl_spark.operators import similarity as sim_ops
from quanta_etl_spark.operators import reshape as reshape_ops
from quanta_etl_spark.operators import sampling as samp_ops
from quanta_etl_spark.operators import text_stats as ts_ops
from quanta_etl_spark.operators import windows as win_ops
from quanta_etl_spark.sources.testdata import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


def _dec(c: str | F.Column) -> F.Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(20,6)")


def _dsum(c: str | F.Column, alias: str) -> F.Column:
    """Order-independent double sum: exact decimal accumulation."""
    return F.sum(_dec(c)).cast("double").alias(alias)


def _dsum2(c: str | F.Column) -> F.Column:
    """Scale-STABLE money sum: exact decimal accumulation rounded to
    cents BEFORE the double cast (VERDICT r9 #3). The raw
    decimal(38,6)→double cast is engine-divergent once the sum needs
    >15.95 significant digits (Spark BigDecimal.doubleValue vs DuckDB's
    HUGEINT path round a half-ulp opposite ways — the r9 sf1
    `pricing_summary.sum_charge` one-ulp divergence). Rounding the
    EXACT decimal to scale 2 first makes the scaled integer exactly
    double-representable up to 2^53 cents (~9e13 dollars — for this
    query's ~4.9e10/sf sums, stable through roughly sf2000 per
    aggregation group; coarser rounding buys 100× per 2 digits if a
    deployment ever exceeds it), so both engines perform one identical
    IEEE division by 100 — verified hex-equal at 9e15-cent magnitudes,
    and verified to DIVERGE again past 2^53 cents, so the bound is
    measured, not assumed."""
    return F.round(F.sum(_dec(c)), 2).cast("double")


# ---------------------------------------------------------------------------
# A-series: the reference's executed operators (SURVEY.md §2A)
# ---------------------------------------------------------------------------


def q_scan_filter_project(spark: SparkSession, sf: str) -> DataFrame:
    """A1/A2/A8/A9: scan → filter → derived-column projection."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.where((F.col("l_discount") > 0.05) & (F.col("l_quantity") >= 30))
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


def q_derive_date_parts(spark: SparkSession, sf: str) -> DataFrame:
    """A2-A5: timestamp derivation, date parse/format, datediff, arithmetic."""
    o = load_table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date_str"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        (F.col("o_totalprice") / 30.5).alias("price_per_month"),
    )


def q_dim_join_left(spark: SparkSession, sf: str) -> DataFrame:
    """A6/A7: manual column pruning + broadcast left fact⋈dim join
    (the reference's product-spec enrichment shape, etl.py:160-164)."""
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    return join_ops.broadcast_dim_join(
        o.withColumnRenamed("o_custkey", "c_custkey"),
        c,
        on="c_custkey",
        how="left",
        dim_cols=["c_name", "c_mktsegment"],
    ).select("o_orderkey", "c_custkey", "c_name", "c_mktsegment", "o_totalprice")


def q_quality_offenders(spark: SparkSession, sf: str) -> DataFrame:
    """A8-A10 (etl.py:166-175 generalized): predicate → distinct offender keys."""
    ev = load_table(spark, sf, "events")
    return quality_ops.offenders(
        ev, F.col("value") >= 400.0, ["event_type", "user_id"]
    )


def q_distinct_flags(spark: SparkSession, sf: str) -> DataFrame:
    """A10: dropDuplicates over a projection."""
    li = load_table(spark, sf, "lineitem")
    return dedup_ops.exact_dedup(
        li.select("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Aggregation surface (§2B B5-ish / §2C)
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """Flagship (TPC-H Q1 shape): full scan, grouped multi-aggregate.
    All money sums and averages go through the scale-stable ``_dsum2``
    cents-rounded conversion so the oracle hash holds at ANY scale
    factor, not just where the sums fit double exactly (r9's documented
    sf1 one-ulp `sum_charge` divergence, closed per VERDICT r9 #3)."""
    li = load_table(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-06-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum2("l_quantity").alias("sum_qty"),
            _dsum2("l_extendedprice").alias("sum_base_price"),
            _dsum2(disc_price).alias("sum_disc_price"),
            _dsum2(charge).alias("sum_charge"),
            (_dsum2("l_quantity") / n).alias("avg_qty"),
            (_dsum2("l_extendedprice") / n).alias("avg_price"),
            (_dsum2("l_discount") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


def q_agg_priority_stats(spark: SparkSession, sf: str) -> DataFrame:
    """count_distinct + exact median + min/max per group."""
    o = load_table(spark, sf, "orders")
    return agg_ops.summarize(
        o,
        ["o_orderpriority"],
        {
            "n_orders": ("count", "o_orderkey"),
            "n_customers": ("count_distinct", "o_custkey"),
            "median_price": ("median", "o_totalprice"),
            "max_price": ("max", "o_totalprice"),
            "min_price": ("min", "o_totalprice"),
        },
    )


def q_rollup_flag_status(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals + grand total."""
    li = load_table(spark, sf, "lineitem")
    return agg_ops.rollup_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": F.sum(_dec("l_quantity")).cast("double"),
            "n": ("count", "l_orderkey"),
        },
    )


def q_cube_status_priority(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE: all grouping combinations."""
    o = load_table(spark, sf, "orders")
    return agg_ops.cube_agg(
        o,
        ["o_orderstatus", "o_orderpriority"],
        {
            "n": ("count", "o_orderkey"),
            "sum_price": F.sum(_dec("o_totalprice")).cast("double"),
        },
    )


def q_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS (each status total, each priority total,
    grand total — but NOT the cross product, unlike CUBE)."""
    o = load_table(spark, sf, "orders")
    return agg_ops.grouping_sets_agg(
        o,
        sets=[["o_orderstatus"], ["o_orderpriority"], []],
        all_keys=["o_orderstatus", "o_orderpriority"],
        aggs={"n": ("count", "o_orderkey"), "max_price": ("max", "o_totalprice")},
    )


def q_decimal_money_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-money aggregation over DECIMAL(18,4) prices (SURVEY §1.2 /
    schemas.MONEY): cast once at the edge, keep all arithmetic in
    decimal — sums are exact, no binary-float drift. Output columns are
    cast decimal→double at the very end: the internal arithmetic stays
    exact, and the emitted types are gate-safe (ADVICE r2: the driver's
    canonicalizer stringifies Decimals engine-dependently — Spark
    Decimal('1.0000') vs DuckDB Decimal('1.0') hash-mismatch even when
    the values are equal)."""
    li = load_table(spark, sf, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    one_minus_disc = (F.lit(1) - F.col("l_discount")).cast("decimal(5,4)")
    # Sums are rounded to cents on the EXACT decimal before the double
    # cast (the _dsum2 discipline): the r10 sf1 sweep caught
    # sum_disc_price (decimal(38,8) sum, scaled value past 2^63)
    # double-rounding a half-ulp apart on DuckDB's HUGEINT path vs
    # Spark's BigDecimal. The cents integer is exactly
    # double-representable to 2^53 (~9e13 dollars), so both engines do
    # one identical IEEE divide. avg is derived as the SAME rounded sum
    # over count(*) — one identical division on both sides — instead of
    # each engine's internal decimal-avg path.
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum(price), 2).cast("double").alias("sum_price"),
        F.round(F.sum(price * one_minus_disc), 2)
        .cast("double")
        .alias("sum_disc_price"),
        F.max(price).cast("double").alias("max_price"),
        F.min(price).cast("double").alias("min_price"),
        (
            F.round(F.sum(price), 2).cast("double") / F.count(F.lit(1))
        ).alias("avg_price"),
    )


def q_pivot_segments(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot with explicit values (conditional aggregation under the hood)."""
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner"
    )
    # count(CASE WHEN ...) never yields NULL and is unambiguously bigint on
    # both engines (VERDICT r1 #1: sum-of-CASE hash-mismatched in the
    # driver's canonicalization despite matching rows/schema).
    return joined.groupBy("n_name").agg(
        *[
            F.count(F.when(F.col("c_mktsegment") == s, 1)).alias(s)
            for s in segs
        ]
    )


# ---------------------------------------------------------------------------
# Join variety (§2B B2 / §2C)
# ---------------------------------------------------------------------------


def q_join_semi(spark: SparkSession, sf: str) -> DataFrame:
    """Left-semi: customers that have at least one order."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return join_ops.semi_join(
        c, o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey"
    ).select("c_custkey", "c_name")


def q_join_anti(spark: SparkSession, sf: str) -> DataFrame:
    """Left-anti: parts never shipped in bulk (no lineitem with qty > 45)."""
    p = load_table(spark, sf, "part")
    li = load_table(spark, sf, "lineitem")
    bulk = li.where(F.col("l_quantity") > 45).select(
        F.col("l_partkey").alias("p_partkey")
    )
    return join_ops.anti_join(p, bulk, "p_partkey").select("p_partkey", "p_name")


def q_join_two_key(spark: SparkSession, sf: str) -> DataFrame:
    """B2: composite-key equi-join (the derivative↔underlying shape,
    reference README.md:175-176) — join lineitem back to per-(part,flag)
    aggregates on BOTH keys."""
    li = load_table(spark, sf, "lineitem")
    stats = li.groupBy(
        F.col("l_partkey").alias("s_partkey"), F.col("l_returnflag").alias("s_flag")
    ).agg(_dsum("l_quantity", "part_flag_qty"))
    joined = join_ops.two_key_join(
        li, stats, ["l_partkey", "l_returnflag"], ["s_partkey", "s_flag"]
    )
    return joined.select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_returnflag", "part_flag_qty"
    )


def q_top_revenue_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filter, group, global top-k (limit
    plans TakeOrderedAndProject — no global sort)."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    revenue = F.sum(
        _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    ).cast("double")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .where(F.col("c_mktsegment") == "BUILDING")
        .where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    grouped = joined.groupBy(
        "l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date")
    ).agg(revenue.alias("revenue"))
    return win_ops.global_top_k(
        grouped, [F.col("revenue").desc(), F.col("l_orderkey").asc()], 10
    )


def q_region_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way snowflake join with broadcast dims."""
    r = load_table(spark, sf, "region")
    n = load_table(spark, sf, "nation")
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_array_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Array function family as a gated surface (used internally by the
    vector/dedup ops, here exercised directly): collect → sort_array →
    distinct/slice/contains plus a higher-order aggregate fold. Arrays
    are emitted as joined strings (gate outputs must be scalar)."""
    li = load_table(spark, sf, "lineitem").where(F.col("l_orderkey") < 1000)
    g = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_linenumber")).alias("arr")
    )
    return g.select(
        "l_orderkey",
        F.concat_ws(",", F.col("arr").cast("array<string>")).alias("lines"),
        F.size(F.array_distinct("arr")).alias("n_distinct"),
        F.aggregate(
            "arr", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("line_sum"),
        F.array_contains("arr", F.lit(1)).alias("has_first"),
        F.concat_ws(
            ",", F.slice("arr", 1, 2).cast("array<string>")
        ).alias("first_two"),
    )


def q_sql_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """The SQL-text API end-to-end (TPC-H Q6 shape): the engine's
    tables registered as views and queried with spark.sql — same
    Catalyst plan as the DataFrame form, proving both front doors reach
    the same engine. Decimal-summed like every money aggregate."""
    from quanta_etl_spark.sources.testdata import register_views

    register_views(spark, sf)
    return spark.sql(
        """
        SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(20,6)))
                    AS DOUBLE) AS revenue_delta,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    )


def q_above_avg_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Decorrelated scalar subquery (TPC-H Q17/Q22 family): orders
    priced above 1.5× their own customer's average order value. The
    correlated subquery rewrites to ONE window aggregate over the
    customer partition — one hash shuffle, no self-join, no
    re-aggregation pass. The average is decimal-summed then divided in
    double so both engines run the identical IEEE expression."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey")
    cust_avg = (
        F.sum(_dec("o_totalprice")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        o.withColumn("cust_avg", cust_avg)
        .where(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
    )


def q_big_qty_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): HAVING over a lineitem
    rollup, then join the surviving orders to orders⋈customer. The
    aggregate runs BEFORE the joins, so the join input is |big orders|
    (hundreds), not |lineitem| — and AQE broadcasts it."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
        .where(F.col("total_qty") > 250.0)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "o_totalprice",
            "total_qty",
        )
    )


def q_join_range(spark: SparkSession, sf: str) -> DataFrame:
    """Range join (binned → equi-join + residual filter): classify
    lineitems into quantity bands."""
    li = load_table(spark, sf, "lineitem")
    spark_bands = spark.createDataFrame(
        [("low", 0.0, 10.0), ("mid", 10.0, 25.0), ("high", 25.0, 60.0)],
        "band string, lo double, hi double",
    )
    joined = join_ops.range_join(
        li, spark_bands, key=None, left_value="l_quantity",
        right_lower="lo", right_upper="hi", bin_width=5.0,
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"), _dsum("l_quantity", "qty")
    )


def q_join_asof(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join (B1 cousin): for every click, the most recent prior-or-
    equal purchase value of the same user. Union + forward-fill plan —
    one shuffle, no point lookups."""
    ev = load_table(spark, sf, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("last_purchase_value")
    )
    out = join_ops.asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["last_purchase_value"],
        direction="backward",
    )
    return out.select("event_id", "user_id", "last_purchase_value")


def q_text_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document token-distribution Shannon entropy (bits) — the
    diversity signal complementing the repetition fractions. Computed
    as log2(n) - Σ c·log2(c)/n in one map-side-combinable pass."""
    docs = load_table(spark, sf, "documents")
    return ts_ops.token_entropy(docs, "doc_id", "text")


def q_join_asof_forward(spark: SparkSession, sf: str) -> DataFrame:
    """FORWARD as-of join: for every click, the NEXT purchase value of
    the same user at-or-after the click — same union + single-window
    plan as backward (one shuffle), direction flipped."""
    ev = load_table(spark, sf, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("next_purchase_value")
    )
    out = join_ops.asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["next_purchase_value"],
        direction="forward",
    )
    return out.select("event_id", "user_id", "next_purchase_value")


# ---------------------------------------------------------------------------
# Window / time-series (§2B B1, B3-B6)
# ---------------------------------------------------------------------------


def q_lag_returns(spark: SparkSession, sf: str) -> DataFrame:
    """B3: per-entity lag returns."""
    ev = load_table(spark, sf, "events")
    out = win_ops.lag_returns(
        ev, "value", ["user_id"], ["ts", "event_id"], out="ret"
    )
    return out.select("user_id", "event_id", "ret")


def q_rolling_stats(spark: SparkSession, sf: str) -> DataFrame:
    """B4: rolling mean/stddev over the trailing 5 observations."""
    ev = load_table(spark, sf, "events")
    out = win_ops.rolling_agg(
        ev,
        "value",
        ["user_id"],
        ["ts", "event_id"],
        window_rows=5,
        aggs={"roll_avg": "avg", "roll_std": "stddev_samp"},
    )
    return out.select("user_id", "event_id", "roll_avg", "roll_std")


def q_impute_group_mean(spark: SparkSession, sf: str) -> DataFrame:
    """Group-mean imputation: null discounts (synthesized on a
    deterministic subset) refilled with their order-priority mean."""
    o = load_table(spark, sf, "orders")
    # knock out a deterministic subset so there is something to impute
    holed = o.withColumn(
        "price_holed",
        F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(
            F.col("o_totalprice")
        ),
    )
    out = quality_ops.impute_group_mean(
        holed, "price_holed", ["o_orderpriority"], out_col="price_filled"
    )
    return out.select(
        "o_orderkey", "o_orderpriority", "price_holed", "price_filled"
    )


def q_profile_columns(spark: SparkSession, sf: str) -> DataFrame:
    """Single-pass column profiling of the orders fact: counts, nulls,
    exact distincts, stringified min/max — one aggregation + map-side
    stack unpivot (no per-column jobs)."""
    o = load_table(spark, sf, "orders")
    return quality_ops.profile_columns(
        o, ["o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"]
    )


def q_iqr_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Tukey-fence outliers per order priority (exact quartiles +
    bounds join; k tightened to 0.5 — the testdata totals have thin
    tails and the classic 1.5 fence flags nothing)."""
    o = load_table(spark, sf, "orders")
    out = quality_ops.iqr_outliers(
        o, "o_totalprice", ["o_orderpriority"], k=0.5, mode="only"
    )
    return out.select("o_orderkey", "o_orderpriority", "o_totalprice")


def q_vector_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """L2 unit-normalization of embeddings, checked value-for-value by
    the oracle. The unit vector is posexploded to one (vec_id, pos,
    comp) row per component: array-typed output columns crash the
    driver's canonicalizer (ADVICE r2 — pandas factorize on lists), so
    gated queries emit scalars only."""
    from quanta_etl_spark.functions import vectors as V

    emb = load_table(spark, sf, "embeddings").where(F.col("vec_id") < 100)
    return emb.select(
        "vec_id",
        F.posexplode(V.l2_normalize("embedding")).alias("pos", "comp"),
        V.l2_norm("embedding").alias("norm"),
    )


def q_date_parts_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Temporal function family over order dates: trunc, extract,
    add_months, datediff, last_day — the scalar surface a time-series
    user leans on daily."""
    o = load_table(spark, sf, "orders").where(F.col("o_orderkey") < 2000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.year(d).alias("yr"),
        F.quarter(d).alias("qtr"),
        F.dayofweek(d).alias("dow"),
        F.add_months(d, 3).alias("plus_quarter"),
        F.last_day(d).alias("month_end"),
        F.datediff(F.lit("1998-12-31").cast("date"), d).alias("days_to_eoy"),
    )


def q_stream_sliding_window(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming SLIDING window aggregation (1h window / 30min slide —
    each event lands in 2 overlapping windows). Bucket starts are
    emitted as epoch seconds so the oracle is timezone-proof; DuckDB
    reproduces Spark's epoch-aligned window starts arithmetically."""
    from quanta_etl_spark.streaming import ingest

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # NTZ→TIMESTAMP conversion (normalize_event_time) reads the session
    # tz; pin it so a driver-built session in a non-UTC environment
    # can't shift instants relative to the DuckDB oracle's epoch().
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf}/events.parquet").schema
    stream = ingest.read_stream(spark, f"{sf}/events.parque[t]", raw_schema)
    ev = ingest.normalize_event_time(stream)
    agg = (
        ingest.with_late_data_policy(ev, "ts", delay="1 hour")
        .groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("win"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("value").alias("high"),
        )
    )
    q = ingest.write_stream_memory(
        agg, "stream_sliding_window", output_mode="complete"
    )
    q.awaitTermination()
    return spark.table("stream_sliding_window").select(
        F.unix_timestamp(F.col("win.start")).alias("bucket_start"),
        "event_type",
        "n_events",
        "high",
    )


def q_text_cleanup(spark: SparkSession, sf: str) -> DataFrame:
    """Scrape-cleanup pipeline: HTML strip → entity decode → PII
    redaction → URL/domain extraction. The documents corpus is clean
    text, so markup/PII/URLs are injected deterministically per doc and
    the whole chain is reproduced in the oracle (all patterns are
    RE2-compatible by design)."""
    docs = load_table(spark, sf, "documents").where(F.col("doc_id") < 100)
    key = F.col("doc_id").cast("string")
    marked = F.concat(
        F.lit("<p>"),
        F.col("text"),
        F.lit('</p> <a href="https://ex'),
        key,
        F.lit('.example.com/d">link</a> contact: user'),
        F.lit("@example.com or +1 415-555-0100 &amp; more"),
    )
    return docs.select(
        "doc_id",
        T.redact_pii(T.strip_html(marked)).alias("clean"),
        F.size(T.extract_urls(marked)).cast("long").alias("n_urls"),
        # joined to one string: array-typed outputs crash the driver's
        # canonicalizer (ADVICE r2) — gated queries emit scalars only
        F.concat_ws(",", T.url_domains(marked)).alias("domains"),
    )


def q_stream_stateful_running(spark: SparkSession, sf: str) -> DataFrame:
    """Custom STATEFUL streaming operator end-to-end
    (applyInPandasWithState): per-user running count/max across
    micro-batches. Bounded single-batch input ⇒ equals the batch
    cumulative window, so this streaming path is hash-checked against
    a plain SQL window oracle."""
    from quanta_etl_spark.streaming import ingest

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # NTZ→TIMESTAMP conversion (normalize_event_time) reads the session
    # tz; pin it so a driver-built session in a non-UTC environment
    # can't shift instants relative to the DuckDB oracle's epoch().
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf}/events.parquet").schema
    stream = ingest.read_stream(spark, f"{sf}/events.parque[t]", raw_schema)
    out = ingest.running_event_stats(stream)
    q = ingest.write_stream_memory(
        out, "stream_stateful_running", output_mode="append"
    )
    q.awaitTermination()
    return spark.table("stream_stateful_running")


def q_stream_forward_fill(spark: SparkSession, sf: str) -> DataFrame:
    """Stateful streaming forward-fill end-to-end
    (streaming/ingest.running_forward_fill, applyInPandasWithState):
    per-key last observation carried forward across null readings,
    state = one (price, ts) pair per key. Bounded single-batch input ⇒
    equals the batch last_value-ignore-nulls window, so this streaming
    adapter is hash-checked against a plain SQL oracle (VERDICT r5 #6 —
    it previously had only pytest coverage). (user_id, ts) is unique in
    the events data, so the within-batch sort by event time is
    tie-free and deterministic."""
    from quanta_etl_spark.streaming import ingest

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf}/events.parquet").schema
    stream = ingest.read_stream(spark, f"{sf}/events.parque[t]", raw_schema)
    feed = ingest.normalize_event_time(stream).select(
        F.concat(F.lit("u"), F.col("user_id")).alias("isin"),
        F.col("ts").alias("trading_ts"),
        F.when(F.col("event_type") == "purchase", F.col("value")).alias(
            "end_price"
        ),
    )
    out = ingest.running_forward_fill(feed)
    q = ingest.write_stream_memory(
        out, "stream_forward_fill", output_mode="append"
    )
    q.awaitTermination()
    return spark.table("stream_forward_fill")


def q_unpivot_measures(spark: SparkSession, sf: str) -> DataFrame:
    """Wide→long melt of the four lineitem measures (§2C reshape — the
    inverse of pivot_segments)."""
    li = load_table(spark, sf, "lineitem").where(F.col("l_orderkey") < 200)
    return reshape_ops.unpivot(
        li,
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        var_name="measure",
        value_name="value",
    )


def q_sample_hash_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic train/val/test assignment by md5 key hash —
    reproducible row-for-row in any engine (the oracle recomputes every
    bucket and split from first principles)."""
    c = load_table(spark, sf, "customer").where(F.col("c_custkey") <= 500)
    out = samp_ops.hash_split(
        c, "c_custkey", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return out.select(
        "c_custkey",
        samp_ops.hash_bucket("c_custkey", 100).alias("bucket"),
        "split",
    )


def q_text_tfidf(spark: SparkSession, sf: str) -> DataFrame:
    """Top-5 TF-IDF terms per document (smoothed idf, sklearn
    formulation), ties broken by term for a total order."""
    docs = load_table(spark, sf, "documents").where(F.col("doc_id") < 100)
    return ts_ops.tfidf(docs, "doc_id", "text", top_k=5)


def q_text_ngram_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Top-50 corpus 3-grams (boilerplate detection), total-ordered by
    (occurrences desc, ngram)."""
    docs = load_table(spark, sf, "documents").where(
        F.length(F.trim("text")) > 0
    )
    return ts_ops.ngram_counts(docs, "text", n=3, top_k=50)


def q_window_cumulative(spark: SparkSession, sf: str) -> DataFrame:
    """Running count/sum/max per user (unbounded-preceding frame);
    decimal running sums internally (drift-free), final cast to double
    so the emitted types are gate-safe (ADVICE r2)."""
    ev = load_table(spark, sf, "events").withColumn(
        "__v", F.col("value").cast("decimal(20,6)")
    )
    out = win_ops.cumulative_agg(
        ev,
        "__v",
        ["user_id"],
        ["ts", "event_id"],
        aggs={"run_n": "count", "run_sum": "sum", "run_max": "max"},
    )
    return out.select(
        "user_id",
        "event_id",
        F.col("run_n").cast("long").alias("run_n"),
        F.col("run_sum").cast("double").alias("run_sum"),
        F.col("run_max").cast("double").alias("run_max"),
    )


def q_agg_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ≡
    DuckDB `quantile_cont`). Exact percentile buffers every group value,
    so the input is cut by a pushdown-able date predicate — at real
    scale you use the mergeable sketches (aggregates.sketch_*) and keep
    exact percentiles for bounded slices exactly like this."""
    # cutoff sits inside the testdata shipdate range (1995..2001) so the
    # percentile surface is actually exercised — ADVICE r2 flagged the
    # previous 1994 cutoff selecting 0 rows and passing vacuously
    li = load_table(spark, sf, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1997-06-30").cast("timestamp")
    )
    return agg_ops.summarize(
        li,
        ["l_returnflag"],
        {
            "p25": ("percentile_25", "l_extendedprice"),
            "p50": ("percentile_50", "l_extendedprice"),
            "p75": ("percentile_75", "l_extendedprice"),
            "p95": ("percentile_95", "l_extendedprice"),
            "med_qty": ("median", "l_quantity"),
        },
    )


def q_agg_corr_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Bivariate statistics per group: Pearson correlation, sample
    covariance, sample stddev."""
    li = load_table(spark, sf, "lineitem")
    return agg_ops.summarize(
        li,
        ["l_linestatus"],
        {
            "corr_qty_price": F.corr("l_quantity", "l_extendedprice"),
            "covar_qty_price": F.covar_samp("l_quantity", "l_extendedprice"),
            "std_price": ("stddev", "l_extendedprice"),
        },
    )


def q_rolling_time_window(spark: SparkSession, sf: str) -> DataFrame:
    """B4 time-based frame: trailing 10-MINUTE window by timestamp value
    (rangeBetween), not row position — correct on gappy series. Decimal
    sums internally (no float-ordering discipline needed), final cast
    to double for gate-safe output types (ADVICE r2)."""
    ev = load_table(spark, sf, "events").withColumn(
        "__v", F.col("value").cast("decimal(20,6)")
    )
    out = win_ops.rolling_time_agg(
        ev,
        "__v",
        ["user_id"],
        "ts",
        lookback_seconds=600,
        aggs={"n_10m": "count", "sum_10m": "sum"},
    )
    return out.select(
        "user_id",
        "event_id",
        F.col("n_10m").cast("long").alias("n_10m"),
        F.col("sum_10m").cast("double").alias("sum_10m"),
    )


def q_rolling_volatility(spark: SparkSession, sf: str) -> DataFrame:
    """B4 verbatim (reference README.md:177): rolling volatility =
    stddev of lag-returns over a trailing window, composed from the two
    window operators — one shuffle total (same key partitioning reused
    by both windows)."""
    ev = load_table(spark, sf, "events")
    rets = win_ops.lag_returns(ev, "value", ["user_id"], ["ts", "event_id"], out="ret")
    out = win_ops.rolling_agg(
        rets, "ret", ["user_id"], ["ts", "event_id"],
        window_rows=20, aggs={"volatility": "stddev_samp"},
    )
    return out.select("user_id", "event_id", "volatility")


def q_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group top-k via row_number (deterministic total order)."""
    o = load_table(spark, sf, "orders")
    return win_ops.topk_per_group(
        o,
        ["o_orderpriority"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
        keep_rank=True,
    ).select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")


def q_window_rank(spark: SparkSession, sf: str) -> DataFrame:
    """Ranking family: rank + dense_rank + ntile over a keyed window."""
    c = load_table(spark, sf, "customer")
    base = c.select("c_custkey", "c_mktsegment", "c_acctbal")
    r1 = win_ops.ranked(
        base, ["c_mktsegment"], [F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
        "rank", out="bal_rank",
    )
    r2 = win_ops.ranked(
        r1, ["c_mktsegment"], [F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
        "ntile", out="quartile", ntiles=4,
    )
    return r2.select("c_custkey", "c_mktsegment", "c_acctbal", "bal_rank", "quartile")


def q_window_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution window family (percent_rank + cume_dist) over the
    customer balance per segment — completes the ranking surface
    (window_rank gates rank/ntile)."""
    c = load_table(spark, sf, "customer")
    base = c.select("c_custkey", "c_mktsegment", "c_acctbal")
    order = [F.col("c_acctbal").desc(), F.col("c_custkey").asc()]
    r1 = win_ops.ranked(
        base, ["c_mktsegment"], order, "percent_rank", out="pct_rank"
    )
    r2 = win_ops.ranked(r1, ["c_mktsegment"], order, "cume_dist", out="cume")
    return r2.select("c_custkey", "c_mktsegment", "c_acctbal", "pct_rank", "cume")


def q_window_value_picks(spark: SparkSession, sf: str) -> DataFrame:
    """Value-picking analytic windows: first_value / last_value /
    nth_value over the FULL partition frame (the default running frame
    makes last_value useless — a classic trap) plus lead. All picks,
    no arithmetic, so the hash is drift-proof; total order via the
    (balance, key) tiebreak."""
    from pyspark.sql.window import Window

    c = load_table(spark, sf, "customer")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    )
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.first_value("c_acctbal").over(full).alias("seg_top"),
        F.last_value("c_acctbal").over(full).alias("seg_bottom"),
        F.nth_value("c_acctbal", 3).over(full).alias("seg_third"),
        F.lead("c_acctbal", 1).over(w).alias("next_bal"),
    )


def q_fuzzy_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Entity-resolution fuzzy matching: customer-name pairs within
    edit distance 2 under (first-char, length) blocking — verification
    by levenshtein, reproduced verbatim by the oracle."""
    c = load_table(spark, sf, "customer").where(F.col("c_custkey") < 300)
    return dedup_ops.fuzzy_match_pairs(c, "c_custkey", "c_name", max_distance=2)


def q_forward_fill(spark: SparkSession, sf: str) -> DataFrame:
    """B1: carry the last purchase value forward over every event of a
    user (nulls before the first purchase remain null)."""
    ev = load_table(spark, sf, "events")
    tagged = ev.withColumn(
        "purchase_value",
        F.when(F.col("event_type") == "purchase", F.col("value")),
    )
    out = win_ops.forward_fill(
        tagged, ["purchase_value"], ["user_id"], ["ts", "event_id"]
    )
    return out.select("user_id", "event_id", "purchase_value")


def q_resample_hourly(spark: SparkSession, sf: str) -> DataFrame:
    """B5: OHLC downsample of the event stream to 1-hour bars per type."""
    ev = load_table(spark, sf, "events")
    bucket = resample_ops.time_bucket("ts", "1 hour")
    return (
        ev.groupBy(
            F.date_format(bucket, "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
            "event_type",
        )
        .agg(
            F.min_by("value", "event_id").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "event_id").alias("close"),
            _dsum("value", "volume"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def q_weighted_index(spark: SparkSession, sf: str) -> DataFrame:
    """B6: weighted cross-entity index per hour bucket."""
    ev = load_table(spark, sf, "events")
    w = (F.col("user_id") % 10 + 1).cast("double")
    weighted = ev.groupBy(
        F.date_format(
            resample_ops.time_bucket("ts", "1 hour"), "yyyy-MM-dd HH:mm:ss"
        ).alias("bucket_ts")
    ).agg(
        (
            F.sum(_dec(F.col("value") * w)).cast("double")
            / F.sum(_dec(w)).cast("double")
        ).alias("index_value")
    )
    return weighted


def q_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization of the event stream (30-min inactivity
    closes a session)."""
    ev = load_table(spark, sf, "events")
    out = win_ops.sessionize(
        ev, "user_id", "ts", gap_seconds=1800, order_tiebreak=["event_id"]
    )
    return out.select("user_id", "event_id", "session_id")


def q_join_salted(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-salted equi-join — salting must be semantics-preserving, so
    the oracle is the PLAIN join: any result drift means the salt leaked
    into the semantics."""
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    out = join_ops.salted_join(
        o.select("o_orderkey", F.col("o_custkey").alias("custkey"), "o_totalprice"),
        c.select(F.col("c_custkey").alias("custkey"), "c_mktsegment"),
        "custkey",
        salt=8,
    )
    return out.select("o_orderkey", "custkey", "o_totalprice", "c_mktsegment")


def q_stream_hourly_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Structured Streaming end-to-end (readStream → watermark →
    event-time windowed agg → memory sink, availableNow): hourly
    high/low/count per event type. Deterministic aggregates only, so
    the BATCH SQL oracle must match — streaming and batch semantics
    agree on bounded input."""
    from quanta_etl_spark.streaming import ingest

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # NTZ→TIMESTAMP conversion (normalize_event_time) reads the session
    # tz; pin it so a driver-built session in a non-UTC environment
    # can't shift instants relative to the DuckDB oracle's epoch().
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf}/events.parquet").schema
    # file streams take a directory/glob, not a bare file path
    stream = ingest.read_stream(spark, f"{sf}/events.parque[t]", raw_schema)
    ev = ingest.normalize_event_time(stream)
    agg = (
        ingest.with_late_data_policy(ev, "ts", delay="1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    q = ingest.write_stream_memory(agg, "stream_hourly_stats", output_mode="complete")
    q.awaitTermination()
    return spark.table("stream_hourly_stats").select(
        F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "event_type",
        "high",
        "low",
        "n_events",
    )


def q_stream_ohlcv(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming OHLCV bars over the events stream (the B5 resample's
    streaming twin, windowed_ohlcv): hourly open/high/low/close of
    `value` per event type. Open/close are pinned by a composite
    (fixed-width ts string + zero-padded event_id) ordering key so ties
    at the same microsecond stay deterministic; the value sum goes
    through decimal(20,6) on both sides so the hash can't drift."""
    from quanta_etl_spark.streaming import ingest

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # NTZ→TIMESTAMP conversion (normalize_event_time) reads the session
    # tz; pin it so a driver-built session in a non-UTC environment
    # can't shift instants relative to the DuckDB oracle's epoch().
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf}/events.parquet").schema
    stream = ingest.read_stream(spark, f"{sf}/events.parque[t]", raw_schema)
    ev = ingest.normalize_event_time(stream).withColumn(
        "vol", F.col("value").cast("decimal(20,6)")
    )
    order_key = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    agg = ingest.windowed_ohlcv(
        ingest.with_late_data_policy(ev, "ts", delay="1 hour"),
        "ts",
        ["event_type"],
        window="1 hour",
        price_col="value",
        volume_col="vol",
        order_col=order_key,
    )
    q = ingest.write_stream_memory(agg, "stream_ohlcv", output_mode="complete")
    q.awaitTermination()
    return spark.table("stream_ohlcv").select(
        F.unix_timestamp(F.col("win.start")).alias("bucket_start"),
        "event_type",
        "open",
        "high",
        "low",
        "close",
        F.col("volume").cast("double").alias("volume"),
        "n_bars",
    )


def q_stream_static_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-static enrichment: the events stream left-joined to the
    static customer dimension (broadcast — stateless, no watermark
    needed). Bounded input ⇒ equals the batch left join, which is the
    oracle."""
    from quanta_etl_spark.streaming import ingest

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # NTZ→TIMESTAMP conversion (normalize_event_time) reads the session
    # tz; pin it so a driver-built session in a non-UTC environment
    # can't shift instants relative to the DuckDB oracle's epoch().
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf}/events.parquet").schema
    stream = ingest.read_stream(spark, f"{sf}/events.parque[t]", raw_schema)
    dim = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment", "c_nationkey"
    )
    joined = ingest.enrich_stream(
        ingest.normalize_event_time(stream), dim, "user_id"
    ).select("event_id", "user_id", "event_type", "c_mktsegment", "c_nationkey")
    q = ingest.write_stream_memory(joined, "stream_static_join")
    q.awaitTermination()
    return spark.table("stream_static_join")


def q_densify_fill(spark: SparkSession, sf: str) -> DataFrame:
    """B1 end-to-end: daily aggregate → dense per-user day spine
    (sequence + explode, no driver loops) → forward-fill over gaps."""
    ev = load_table(spark, sf, "events").where(F.col("user_id") < 50)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(_dsum("value", "day_value"))
    filled = win_ops.densify_and_fill(
        daily, "user_id", "day", ["day_value"], step="interval 1 day"
    )
    return filled.select(
        "user_id", F.date_format("day", "yyyy-MM-dd").alias("day_str"), "day_value"
    )


def q_join_theta(spark: SparkSession, sf: str) -> DataFrame:
    """Theta join (§2C): pure inequality predicate — suppliers paired
    with customers whose balance is within (0, 10] above theirs."""
    s = load_table(spark, sf, "supplier")
    c = load_table(spark, sf, "customer")
    return join_ops.theta_join(
        c.select("c_custkey", "c_acctbal"),
        s.select("s_suppkey", "s_acctbal"),
        (F.col("c_acctbal") > F.col("s_acctbal"))
        & (F.col("c_acctbal") <= F.col("s_acctbal") + 10.0),
    ).select("c_custkey", "s_suppkey", "c_acctbal", "s_acctbal")


def q_agg_collect_sorted(spark: SparkSession, sf: str) -> DataFrame:
    """collect_list made deterministic: sort_array + concat_ws (a bare
    collect_list is order-nondeterministic under parallelism — never
    hashable, never reproducible)."""
    li = load_table(spark, sf, "lineitem").where(F.col("l_orderkey") < 200)
    return li.groupBy("l_orderkey").agg(
        F.concat_ws(
            ",",
            F.sort_array(F.collect_list(F.col("l_linenumber").cast("string"))),
        ).alias("line_numbers"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q_emb_topk_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-flat ANN top-k. Fully deterministic (centroids = every 7th of
    the first 112 vectors by id; nearest-centroid ties break by centroid
    id), so the inverted-list probe is reproducible in the SQL oracle —
    the approximate index is hash-match-checkable, not just rows-only."""
    emb = load_table(spark, sf, "embeddings")
    return sim_ops.cosine_topk_ivf(
        emb, emb.where(F.col("vec_id") < 10), k=5, num_centroids=16, nprobe=4
    )


def q_emb_topk_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Sign-LSH multiprobe ANN top-k (the other scale path beside IVF):
    probe the query's bucket plus all Hamming-1 neighbors. Seeded
    hyperplanes → bucketing reproducible in the SQL oracle."""
    emb = load_table(spark, sf, "embeddings")
    return sim_ops.cosine_topk_lsh(
        emb,
        emb.where(F.col("vec_id") < 10),
        k=5,
        num_planes=6,
        multiprobe=True,
        dim=64,
    )


def q_media_pixel_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal plumbing over testdata: documents' bytes as opaque
    media payloads → canonical media table → stub decode → numpy
    feature extraction via mapInPandas. The decode stub is
    deterministic (tiled payload bytes), so even this path is
    oracle-checked against a SQL twin of the tiling."""
    from quanta_etl_spark.multimodal import media as mm

    docs = load_table(spark, sf, "documents").where(F.col("doc_id") < 200)
    payloads = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("image/fake").alias("mime_type"),
        F.lit(8).alias("width"),
        F.lit(8).alias("height"),
    )
    feats = mm.image_features(mm.decode_image(mm.media_table(payloads)))
    return feats.select("media_id", "mean_intensity", "std_intensity")


# ---------------------------------------------------------------------------
# Set operations / global sort (§2C)
# ---------------------------------------------------------------------------


def q_setop_union(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    s = load_table(spark, sf, "supplier")
    return set_ops.union_distinct(
        c.select(F.col("c_nationkey").alias("nationkey")),
        s.select(F.col("s_nationkey").alias("nationkey")),
    )


def q_setop_intersect(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return set_ops.intersect(
        c.where(F.col("c_mktsegment") == "BUILDING").select(
            F.col("c_custkey").alias("custkey")
        ),
        o.select(F.col("o_custkey").alias("custkey")),
    )


def q_setop_except(spark: SparkSession, sf: str) -> DataFrame:
    """Customers with finished ('F') orders but no open ('O') orders."""
    o = load_table(spark, sf, "orders")
    return set_ops.except_(
        o.where(F.col("o_orderstatus") == "F").select(
            F.col("o_custkey").alias("custkey")
        ),
        o.where(F.col("o_orderstatus") == "O").select(
            F.col("o_custkey").alias("custkey")
        ),
    )


def q_setop_except_all(spark: SparkSession, sf: str) -> DataFrame:
    """EXCEPT ALL — multiplicity-preserving difference (one survivor per
    unmatched duplicate), vs the set semantics of setop_except."""
    li = load_table(spark, sf, "lineitem")
    return set_ops.except_all(
        li.where(F.col("l_quantity") >= 48).select(
            F.col("l_partkey").alias("partkey")
        ),
        li.where(F.col("l_returnflag") == "R").select(
            F.col("l_partkey").alias("partkey")
        ),
    )


def q_global_topk(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return win_ops.global_top_k(
        li.select("l_orderkey", "l_linenumber", "l_extendedprice"),
        [
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        ],
        10,
    )


# ---------------------------------------------------------------------------
# North-star: dedup / text analysis / similarity search (BASELINE.json)
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact content dedup with deterministic min-id survivors, exercised
    on documents ∪ (documents re-keyed) so real duplicates exist."""
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    dupes = docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    out = dedup_ops.exact_dedup_by_fingerprint(
        docs.unionByName(dupes), "text", "doc_id"
    )
    return out.select("doc_id", T.fingerprint("text").alias("fp"))


def q_text_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish subword-boundary tokens."""
    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_ws_tokens"),
        T.bpe_ish_token_count("text").alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_measured"),
    )


def q_text_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Stopword-vote language identification (deterministic heuristic)."""
    docs = load_table(spark, sf, "documents")
    return docs.select("doc_id", T.lang_id("text").alias("lang_pred"))


def q_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Composite quality scoring: length + stopword ratio - punctuation."""
    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        T.quality_score("text").alias("quality"),
    )


def q_text_winnow(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints (MOSS algorithm) with the
    md5_60 portable gram hash: the ENTIRE fingerprint set — rolling
    hashes, window minima, distinct selection — is reproduced in the
    DuckDB oracle from first principles (was the last rows-only query;
    the xxhash64 default stays for production speed). Exploded to one
    (doc_id, fingerprint) row per fingerprint: array-typed outputs
    crash the driver's canonicalizer (ADVICE r2)."""
    docs = dedup_ops._spread(load_table(spark, sf, "documents"))
    fps = T.winnow_fingerprints("text", k=7, window=4, variant="md5_60")
    return docs.select(
        "doc_id", F.explode(F.array_distinct(fps)).alias("fingerprint")
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact n-gram Jaccard similarity join (inverted shingle index) over
    a 100-doc slice; pairs with jaccard >= 0.2."""
    docs = load_table(spark, sf, "documents").where(F.col("doc_id") < 100)
    return dedup_ops.ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.2, shingle_k=5
    )


def q_dedup_minhash(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified by exact Jaccard. Oracle: a
    full all-pairs exact-Jaccard SQL — equivalent because LSH recall is
    1.0 on this corpus (every true pair sits at jaccard >= 0.92, where
    the 16-band S-curve collision probability is ~1) and the verify
    stage removes all false positives."""
    docs = load_table(spark, sf, "documents")
    return dedup_ops.minhash_dedup_pairs(
        docs, "doc_id", "text", threshold=0.5, num_hashes=64, bands=16
    )


def q_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming distance <= 3, using the
    md5_60 token-hash variant so the full pipeline — fingerprint bit
    votes, pigeonhole banding, Hamming verify — is reproduced in the
    DuckDB oracle from first principles."""
    docs = load_table(spark, sf, "documents")
    return dedup_ops.simhash_dedup_pairs(
        docs, "doc_id", "text", max_hamming=3, variant="md5_60"
    )


def q_emb_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for the first 10 vectors."""
    emb = load_table(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return sim_ops.cosine_topk_bruteforce(emb, queries, k=5)


def q_emb_neardup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact embedding near-duplicates (cosine >= 0.2) within a 100-vector
    slice — the oracle-checkable baseline for the LSH variant."""
    emb = load_table(spark, sf, "embeddings").where(F.col("vec_id") < 100)
    e = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("__va"))
    f_ = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("__vb"))
    from quanta_etl_spark.functions.vectors import cosine_similarity

    return (
        e.crossJoin(f_)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_similarity(F.col("__va"), F.col("__vb")).alias("cosine"),
        )
        .where(F.col("cosine") >= 0.2)
    )


def q_emb_neardup_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Sign-LSH bucketed embedding near-dup pairs (scale path). The
    hyperplanes are seeded, so the oracle inlines them as literals and
    reproduces bucketing + verification exactly. Plane count is
    auto-sized to the corpus (quadratic-in-bucket pairing stays ~linear
    in n); the oracle derives the SAME count from count(*) and joins on
    the seeded planes' prefix-stable sign bits, so the contract holds
    at every scale factor (r10 — previously sf0.01-only)."""
    emb = load_table(spark, sf, "embeddings")
    return dedup_ops.embedding_neardup_pairs(
        emb, "vec_id", "embedding", threshold=0.2, num_planes="auto", dim=64
    )


# ---------------------------------------------------------------------------
# Corpus assembly (training-data pipeline surface, round 3)
# ---------------------------------------------------------------------------


def q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup pairs → connected components → survivor selection: the
    full dedup pipeline end-to-end (pairs alone don't dedup anything).
    Spark side runs alternating large-star/small-star contraction
    (operators/graph.py); the oracle computes the same exact-Jaccard
    pairs as dedup_minhash, then min-reachable-label via a recursive
    CTE — clusters must agree exactly."""
    docs = load_table(spark, sf, "documents")
    pairs = dedup_ops.minhash_dedup_pairs(
        docs, "doc_id", "text", threshold=0.5, num_hashes=64, bands=16
    )
    out = graph_ops.assign_clusters(pairs.select("id_a", "id_b"))
    return out.select(
        "id", "cluster_id", F.col("is_survivor").cast("int").alias("is_survivor")
    )


def q_corpus_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination (the GPT-3 8-gram protocol): every
    20th document plays the benchmark/eval set; the rest of the corpus
    is screened for any shared word 8-gram. Corpus is never shuffled —
    the benchmark gram set broadcasts."""
    docs = load_table(spark, sf, "documents")
    bench = docs.where(F.col("doc_id") % 20 == 0)
    rest = docs.where(F.col("doc_id") % 20 != 0)
    out = corpus_ops.decontaminate(rest, bench, "doc_id", "text", n=8)
    return out.select(
        "doc_id",
        "n_overlap",
        F.col("contaminated").cast("int").alias("contaminated"),
    )


def q_corpus_cap_per_source(spark: SparkSession, sf: str) -> DataFrame:
    """Per-domain quota capping (anti-spam corpus balance): at most 10
    docs per source, chosen by deterministic md5_60 hash rank — stable
    across runs, partitionings, and retries. Cap 10 < the ~25 docs per
    source at sf0.01, so the quota actually cuts (no vacuous pass)."""
    docs = load_table(spark, sf, "documents")
    return corpus_ops.cap_per_group(
        docs, "source", "doc_id", 10, hash_variant="md5_60"
    ).select("doc_id", "source")


def q_corpus_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget sequence packing: per-language streams in md5_60
    hash order, cut into ~2048-token packs by cumulative sum (one
    shuffle; contiguous-chunking approximation)."""
    docs = load_table(spark, sf, "documents").withColumn(
        "__toks", T.token_count("text").cast("long")
    )
    return corpus_ops.pack_sequences(
        docs,
        "doc_id",
        "__toks",
        budget=2048,
        partition_cols="lang",
        hash_variant="md5_60",
    )


def q_dedup_apply(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup applied end-to-end: corpus minus every non-survivor of the
    minhash near-dup clusters — what a user actually runs to clean a
    corpus (pairs and clusters are the intermediate artifacts)."""
    docs = load_table(spark, sf, "documents")
    pairs = dedup_ops.minhash_dedup_pairs(
        docs, "doc_id", "text", threshold=0.5, num_hashes=64, bands=16
    )
    out = graph_ops.apply_dedup(docs, pairs.select("id_a", "id_b"), "doc_id")
    return out.select("doc_id", "lang", "source")


def q_text_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher/MassiveText repetition signals: distinct-token fraction,
    top-token fraction, top-bigram fraction per document — the quality
    gate that drops boilerplate/spam before training."""
    docs = load_table(spark, sf, "documents")
    return ts_ops.repetition_stats(docs, "doc_id", "text")


def q_stream_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming deduplication: the events file is ingested TWICE (two
    unioned streams of the same source) and dropDuplicates state emits
    each event_id exactly once — output equals the single batch copy.
    At scale the watermarked form (dropDuplicatesWithinWatermark)
    bounds the state; bounded backfill here, so exact dedup."""
    from quanta_etl_spark.streaming import ingest

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # NTZ→TIMESTAMP conversion (normalize_event_time) reads the session
    # tz; pin it so a driver-built session in a non-UTC environment
    # can't shift instants relative to the DuckDB oracle's epoch().
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf}/events.parquet").schema
    # single-FILE stream sources need a glob spelling (a bare file path
    # fails FileStreamSource's "basePath must be a directory" check);
    # two distinct spellings keep the sources independent.
    s1 = ingest.read_stream(spark, f"{sf}/events.parque[t]", raw_schema)
    s2 = ingest.read_stream(spark, f"{sf}/events.[p]arquet", raw_schema)
    deduped = ingest.dedup_stream(s1.unionByName(s2), ["event_id"])
    q = ingest.write_stream_memory(
        deduped.select("event_id", "user_id", "event_type", "value"),
        "stream_dedup",
        output_mode="append",
    )
    q.awaitTermination()
    return spark.table("stream_dedup")


def q_udtf_sentences(spark: SparkSession, sf: str) -> DataFrame:
    """Python UDTF (Spark 4 table function) splitting documents into
    sentences via LATERAL — one row per sentence with its index. The
    boundary regex is RE2-compatible so the oracle reproduces the split
    exactly."""
    from quanta_etl_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    # the synthetic corpus has no sentence boundaries, so build
    # multi-sentence payloads deterministically (first 40 chars as a
    # lead sentence, then the doc, then a fixed tail question)
    docs = (
        load_table(spark, sf, "documents")
        .where(F.col("doc_id") < 300)
        .select(
            "doc_id",
            F.concat(
                F.substring("text", 1, 40),
                F.lit(". "),
                F.col("text"),
                F.lit("! Is this the end? Yes."),
            ).alias("text"),
        )
    )
    docs.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_id, s.sentence
        FROM __udtf_docs d, LATERAL split_sentences(d.text) s
        """
    )


def q_media_phash_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Hamming-tolerant media near-dup: perceptual hashes banded into 4
    pigeonhole blocks (complete for distance <= 3), verified by per-half
    XOR popcounts. Oracle = all-pairs Hamming over the same SQL-derived
    hashes — equivalent because the banding has no false negatives."""
    from quanta_etl_spark.multimodal import media as mm

    docs = load_table(spark, sf, "documents").where(F.col("doc_id") < 500)
    payloads = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("image/fake").alias("mime_type"),
        F.lit(8).alias("width"),
        F.lit(8).alias("height"),
    )
    hashed = mm.perceptual_hash(mm.decode_image(mm.media_table(payloads)))
    return mm.phash_neardup_pairs(hashed, max_hamming=3)


def q_window_ewma(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user exponential moving average of event values (alpha=0.2,
    adjust=False recursion). Genuinely sequential, so the engine side
    is applyInPandas; the oracle expands the recursion to its closed
    form y_t = (1-a)^t x_0 + Σ a(1-a)^(t-j) x_j via a bounded
    self-join (groups are small at gate scale)."""
    ev = load_table(spark, sf, "events")
    out = win_ops.ewma(
        ev,
        "user_id",
        "ts",
        "value",
        alpha=0.2,
        tiebreak_cols=["event_id"],
    )
    return out.select("user_id", "event_id", "value", "ewma")


def q_media_phash_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual-hash (aHash) media dedup over the stubbed decode
    path: identical payloads hash equal, so duplicate media collapse to
    one group with a deterministic min-id survivor. The bit threshold
    is integer-exact, so the SQL oracle reproduces the full 64-bit hash
    from the tiled payload bytes."""
    from quanta_etl_spark.multimodal import media as mm

    docs = load_table(spark, sf, "documents").where(F.col("doc_id") < 500)
    payloads = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("image/fake").alias("mime_type"),
        F.lit(8).alias("width"),
        F.lit(8).alias("height"),
    )
    hashed = mm.perceptual_hash(mm.decode_image(mm.media_table(payloads)))
    return (
        hashed.groupBy("phash_hi", "phash_lo")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("media_id").alias("survivor_id"),
        )
        .where(F.col("n_copies") >= 2)
    )


def q_stream_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-stream interval join: views joined to same-user purchases
    within the following 30 minutes, both sides unbounded streams with
    watermarks bounding the join state. Bounded backfill here, so the
    oracle is the equivalent batch interval join."""
    from quanta_etl_spark.streaming import ingest

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # NTZ→TIMESTAMP conversion (normalize_event_time) reads the session
    # tz; pin it so a driver-built session in a non-UTC environment
    # can't shift instants relative to the DuckDB oracle's epoch().
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf}/events.parquet").schema
    s1 = ingest.read_stream(spark, f"{sf}/events.parque[t]", raw_schema)
    s2 = ingest.read_stream(spark, f"{sf}/events.[p]arquet", raw_schema)
    views = (
        ingest.normalize_event_time(s1)
        .where(F.col("event_type") == "view")
        .select("user_id", "event_id", "ts")
    )
    purchases = (
        ingest.normalize_event_time(s2)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("r_user_id"),
            F.col("event_id").alias("r_event_id"),
            F.col("ts").alias("r_ts"),
        )
    )
    joined = ingest.interval_join_streams(
        views,
        purchases,
        "user_id",
        "ts",
        "r_ts",
        lower="0 seconds",
        upper="30 minutes",
    )
    out = joined.select(
        "user_id",
        F.col("event_id").alias("view_event"),
        F.col("r_event_id").alias("purchase_event"),
        F.unix_micros("ts").alias("view_ts_us"),
        F.unix_micros("r_ts").alias("purchase_ts_us"),
    )
    q = ingest.write_stream_memory(out, "stream_stream_join")
    q.awaitTermination()
    return spark.table("stream_stream_join")


def q_quality_quarantine(spark: SparkSession, sf: str) -> DataFrame:
    """Row-level validation with quarantine: the bad frame carries the
    comma-joined names of every violated rule, so the quarantine sink
    is self-describing. NULL predicate results quarantine (the SQL
    three-valued-logic trap)."""
    li = load_table(spark, sf, "lineitem")
    _good, bad = quality_ops.validate_split(
        li,
        {
            "discount_le_6pct": F.col("l_discount") <= 0.06,
            "tax_le_5pct": F.col("l_tax") <= 0.05,
            "qty_positive": F.col("l_quantity") > 0,
        },
    )
    return bad.select(
        "l_orderkey", "l_linenumber", "l_discount", "l_tax", "failed_rules"
    )


def q_dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental dedup of a new batch against the fingerprint
    registry of the already-ingested corpus: even doc_ids form the
    registry, the batch is the odd docs plus re-keyed copies of
    registry docs (must be dropped) and re-keyed copies of batch docs
    (in-batch duplicates — min-id survivor wins)."""
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    registry = (
        docs.where(F.col("doc_id") % 2 == 0)
        .select(T.fingerprint("text").alias("fp"))
        .distinct()
    )
    batch = (
        docs.where(F.col("doc_id") % 2 == 1)
        .unionByName(
            docs.where(F.col("doc_id") % 10 == 0).select(
                (F.col("doc_id") + 500000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            docs.where(
                (F.col("doc_id") % 7 == 1) & (F.col("doc_id") % 2 == 1)
            ).select((F.col("doc_id") + 600000).alias("doc_id"), "text")
        )
    )
    out = dedup_ops.dedup_against_registry(batch, registry, "doc_id", "text")
    return out.select("doc_id", "fp")


def q_corpus_chunk(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-token-window document chunking with overlap (32-token
    chunks, 8-token overlap → 24-token stride) — the step that turns a
    cleaned corpus into training/embedding inputs. Chunk boundaries are
    pure arithmetic over the whitespace token array, so the oracle
    reproduces them with list slicing."""
    docs = load_table(spark, sf, "documents")
    return corpus_ops.chunk_documents(
        docs, "doc_id", "text", chunk_tokens=32, overlap=8
    )


def q_join_null_safe(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe equi-join (IS NOT DISTINCT FROM): one event_type is
    mapped to NULL on both sides; the plain == join would silently drop
    that group, the null-safe join must match it."""
    ev = load_table(spark, sf, "events")
    k = F.when(F.col("event_type") == "click", F.lit(None)).otherwise(
        F.col("event_type")
    )
    a = ev.select(k.alias("k")).groupBy("k").agg(F.count(F.lit(1)).alias("n_a"))
    b = (
        ev.where(F.col("value") > 50)
        .select(k.alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    return join_ops.null_safe_join(a, b, ["k"])


def q_corpus_quality_filter(spark: SparkSession, sf: str) -> DataFrame:
    """The combined corpus quality gate: language allowlist + composite
    quality score + token bounds + Gopher repetition rules, in one
    auditable keep decision (the step between raw scrape and dedup)."""
    docs = load_table(spark, sf, "documents")
    return corpus_ops.quality_filter(
        docs,
        "doc_id",
        "text",
        min_tokens=20,
        max_tokens=5000,
        min_quality=0.25,
        max_top_token_frac=0.2,
        min_distinct_frac=0.3,
        langs=("en", "de", "es", "fr"),
    )


def q_stream_session_window(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming SESSION windows: per-user sessions close after 30min
    of inactivity; session_window merges intervals engine-side with
    bounded state. Bounds are emitted as epoch MICROseconds (the
    testdata carries sub-second timestamps) and the value sum goes
    through decimal(20,6) on both sides so the hash can't drift in the
    6th decimal."""
    from quanta_etl_spark.streaming import ingest

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # NTZ→TIMESTAMP conversion (normalize_event_time) reads the session
    # tz; pin it so a driver-built session in a non-UTC environment
    # can't shift instants relative to the DuckDB oracle's epoch().
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf}/events.parquet").schema
    stream = ingest.read_stream(spark, f"{sf}/events.parque[t]", raw_schema)
    ev = ingest.normalize_event_time(stream)
    agg = ingest.windowed_sessions(
        ingest.with_late_data_policy(ev, "ts", delay="1 hour"),
        "ts",
        ["user_id"],
        gap="30 minutes",
        agg_exprs=[
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,6)"))
            .cast("double")
            .alias("sum_value"),
        ],
    )
    q = ingest.write_stream_memory(
        agg, "stream_session_window", output_mode="complete"
    )
    q.awaitTermination()
    return spark.table("stream_session_window").select(
        "user_id",
        F.unix_micros(F.col("session.start")).alias("session_start_us"),
        F.unix_micros(F.col("session.end")).alias("session_end_us"),
        "n_events",
        "sum_value",
    )


def q_json_extract_agg(spark: SparkSession, sf: str) -> DataFrame:
    """JSON payload analytics on events.props (a JSON string column):
    one from_json parse feeds a typed field, aggregated per event_type.
    Everything stays JVM-side — no Python touches the payloads."""
    from quanta_etl_spark.functions import semistructured as SS

    ev = load_table(spark, sf, "events")
    with_k = SS.with_json_fields(ev, "props", {"k": "bigint"})
    return (
        with_k.groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.avg("k").alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count(F.when(F.col("k") > 50, 1)).alias("n_hi"),
        )
    )


def q_json_map_explode(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-free JSON handling via MapType: parse props into
    map<string,string> and explode to (event_id, key, value) rows —
    the dynamic-payload path when keys aren't known at plan time
    (with_json_fields is the typed path). Map columns can't be gated
    (canonicalizer), so the EXPLODED pairs are — which also exercises
    the map→rows explode the corpus ops lean on."""
    from quanta_etl_spark.functions import semistructured as SS

    ev = load_table(spark, sf, "events").where(F.col("event_id") < 3000)
    return ev.select(
        "event_id", F.explode(SS.map_from_json("props")).alias("key", "value")
    )


def q_merge_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """SQL MERGE (SCD1 upsert) on the orders fact: a deterministic
    correction batch (keys % 97, price bumped 10%, priority rewritten)
    replaces matching rows whole, and a synthetic insert batch
    (keys % 997, shifted key space) is appended. Plan: one anti-join
    (delta broadcast by AQE) + union — the target is never shuffled."""
    orders = load_table(spark, sf, "orders")
    upd = (
        orders.where(F.col("o_orderkey") % 97 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * F.lit(1.1))
        .withColumn("o_orderpriority", F.lit("CORRECTED"))
    )
    ins = orders.where(F.col("o_orderkey") % 997 == 0).select(
        (F.col("o_orderkey") + F.lit(10_000_000)).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        F.lit("NEW").alias("o_orderpriority"),
    )
    return merge_ops.merge_upsert(orders, upd.unionByName(ins), ["o_orderkey"])


def q_merge_update_cols(spark: SparkSession, sf: str) -> DataFrame:
    """Partial-column MERGE: matched orders take only o_totalprice from
    the delta (their other columns untouched — the delta's decoy
    o_orderstatus must NOT leak through); unmatched delta rows insert
    whole. One left join + one anti-join on the key."""
    orders = load_table(spark, sf, "orders")
    upd = (
        orders.where(F.col("o_orderkey") % 53 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * F.lit(2.0))
        .withColumn("o_orderstatus", F.lit("IGNORED"))
    )
    ins = orders.where(F.col("o_orderkey") % 991 == 0).select(
        (F.col("o_orderkey") + F.lit(20_000_000)).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        F.lit("NEW").alias("o_orderpriority"),
    )
    return merge_ops.merge_upsert_columns(
        orders, upd.unionByName(ins), ["o_orderkey"], ["o_totalprice"]
    )


def q_merge_scd2(spark: SparkSession, sf: str) -> DataFrame:
    """Type-2 slowly-changing dimension built from the orders log: each
    customer's o_orderstatus history becomes versions with
    valid_from/valid_to intervals and an is_current flag. o_orderkey
    tiebreaks same-date events so the version order is total."""
    orders = load_table(spark, sf, "orders")
    return merge_ops.scd2_from_changelog(
        orders,
        "o_custkey",
        "o_orderdate",
        ["o_orderstatus"],
        tiebreak_cols=["o_orderkey"],
    )


def q_corpus_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Target-mixture source sampling (50/30/20 over three sources):
    per-source rates derived in-plan from counts vs target shares, rows
    kept by the portable md5 60-bit bucket — the oracle recomputes the
    identical rates and bucket cut in SQL."""
    docs = load_table(spark, sf, "documents")
    out = corpus_ops.mix_sources(
        docs,
        "source",
        "doc_id",
        {"src0": 0.5, "src1": 0.3, "src2": 0.2},
    )
    return out.select("doc_id", "source", "lang")


def q_corpus_shuffle_index(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic global training order: contiguous 0-based index
    over the hash-permuted corpus via two-stage bucket ranking — no
    global single-partition window, no zipWithIndex, retry-safe."""
    docs = load_table(spark, sf, "documents")
    return corpus_ops.shuffle_index(
        docs, "doc_id", num_buckets=16, hash_variant="md5_60"
    ).select("doc_id", "shuffle_idx")


def q_funnel_conversion(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered conversion funnel (signup → click → purchase) over the
    event log: per-step distinct-user counts where step i only counts
    at-or-after the user's earliest qualifying step i-1 event. Lazy
    end-to-end (operators/events.py funnel_report) — no driver-side
    counting loop."""
    ev = load_table(spark, sf, "events")
    return event_ops.funnel_report(
        ev, ["signup", "click", "purchase"]
    ).select("step_index", "step_name", "users")


def q_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly cohort retention triangle: users bucketed by first-active
    week, distinct active users per (cohort, week offset)."""
    ev = load_table(spark, sf, "events")
    return event_ops.cohort_retention(ev, period="week").select(
        "cohort", "period_offset", "active_users"
    )


def q_time_weighted_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user time-weighted average of `value` (TWAP): weights are
    integer microseconds until the next observation, weighted sums
    accumulate in decimal so the result is partitioning-independent."""
    ev = load_table(spark, sf, "events")
    return event_ops.time_weighted_avg(ev, "value").select(
        "user_id", "twap", "n_obs"
    )


def q_linear_interpolate(spark: SparkSession, sf: str) -> DataFrame:
    """Linear interpolation fill (the drift-aware refinement of B1
    forward-fill): `error` events' values are nulled, then interpolated
    between each user's neighboring observations by event-time
    distance; edges back/forward-fill."""
    ev = load_table(spark, sf, "events").withColumn(
        "value",
        F.when(F.col("event_type") != "error", F.col("value")),
    )
    out = win_ops.linear_interpolate(
        ev,
        "user_id",
        "ts",
        "value",
        tiebreak_cols=["event_id"],
        out_col="value_filled",
    )
    return out.select("event_id", "user_id", "value_filled")


def q_rolling_median(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated rolling median of the trailing 10
    observations per user — native window `percentile`, no UDF."""
    ev = load_table(spark, sf, "events")
    return win_ops.rolling_median(
        ev, "user_id", "ts", "value", window_rows=10,
        tiebreak_cols=["event_id"],
    ).select("event_id", "user_id", "rolling_median")


def q_histogram_prices(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-width 20-bin histogram of order totals over [0, 500000)
    with zero-count buckets materialized from a sequence spine —
    map-side bucketing, one partial-agg shuffle."""
    o = load_table(spark, sf, "orders")
    return agg_ops.histogram_fixed(
        o, "o_totalprice", lo=0.0, hi=500_000.0, num_bins=20
    ).select("bucket", "bucket_lo", "bucket_hi", "n")


def q_skyline_pareto(spark: SparkSession, sf: str) -> DataFrame:
    """2-D Pareto frontier over distinct (price, quantity) pairs:
    cheapest-price / largest-quantity skyline via one running-max
    window pass over the distinct pair set (no O(n²) dominance join)."""
    li = load_table(spark, sf, "lineitem")
    return win_ops.skyline_2d(li, "l_extendedprice", "l_quantity")


def q_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Per-stratum deterministic sampling (reproducible `sampleBy`):
    md5-hash-bucket keep-fractions per order priority — stable across
    runs, partitionings, and engines."""
    o = load_table(spark, sf, "orders")
    return samp_ops.stratified_hash_sample(
        o,
        "o_orderkey",
        "o_orderpriority",
        {"1-URGENT": 0.5, "2-HIGH": 0.25, "3-MEDIUM": 0.1},
        default_fraction=0.05,
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


def q_max_drawdown(spark: SparkSession, sf: str) -> DataFrame:
    """Path-dependent risk analytic: deepest peak-to-trough fraction of
    `value` per user (running-max window + argmax-by-struct-min pick).
    Positive values only — drawdown is undefined at a 0 peak."""
    ev = load_table(spark, sf, "events").where(F.col("value") > 0)
    return win_ops.max_drawdown(
        ev, "user_id", "ts", "value", tiebreak_cols=["event_id"]
    ).select("user_id", "max_drawdown", "peak_value", "trough_value")


def q_anomaly_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling z-score outlier flags (trailing 20 observations,
    current row excluded so an outlier can't mask itself); rows with
    <2 prior observations are never flagged."""
    ev = load_table(spark, sf, "events")
    out = win_ops.anomaly_zscore(
        ev, "user_id", "ts", "value",
        window_rows=20, threshold=2.5, tiebreak_cols=["event_id"],
    )
    return out.where(F.col("is_anomaly")).select(
        "event_id", "user_id", "zscore"
    )


def q_vwap_bucketed(spark: SparkSession, sf: str) -> DataFrame:
    """Volume-weighted average price per part (price=l_extendedprice
    weighted by l_quantity) — decimal-accumulated, zero-volume fallback
    to plain mean."""
    li = load_table(spark, sf, "lineitem")
    return resample_ops.vwap(
        li, "l_partkey", "l_extendedprice", "l_quantity"
    ).select("l_partkey", "vwap", "total_volume", "n_obs")


def q_graph_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """5-iteration PageRank over the part→supplier bipartite graph
    (distinct lineitem edges, keys disambiguated by prefix) — the
    engine's iterative-join fixpoint pattern with decimal-exact
    per-round sums and lineage truncation. The oracle unrolls the same
    5 rounds as chained CTEs."""
    li = load_table(spark, sf, "lineitem")
    edges = li.select(
        F.concat(F.lit("p"), F.col("l_partkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    ).distinct()
    return graph_ops.pagerank(edges, iterations=5).select("node", "rank")


def q_activity_streaks(spark: SparkSession, sf: str) -> DataFrame:
    """Gaps-and-islands engagement metric: longest run of consecutive
    active days, total active days, and streak count per user (classic
    day − row_number() islands pattern, distinct-days-first)."""
    ev = load_table(spark, sf, "events")
    return win_ops.activity_streaks(ev, "user_id", "ts").select(
        "user_id", "longest_streak", "active_days", "n_streaks"
    )


def q_contribution_margin(spark: SparkSession, sf: str) -> DataFrame:
    """Percent-of-total contribution analysis: revenue per
    (status, priority) with share of the status super-group and of the
    global total — window sums over the aggregate frame, decimal-exact
    numerators/denominators, double division only at the end."""
    o = load_table(spark, sf, "orders")
    return agg_ops.contribution(
        o, "o_totalprice", ["o_orderstatus", "o_orderpriority"],
        within=["o_orderstatus"],
    ).select(
        "o_orderstatus", "o_orderpriority",
        "group_value", "pct_of_total", "pct_of_parent",
    )


def q_weighted_median(spark: SparkSession, sf: str) -> DataFrame:
    """Lower weighted median of price weighted by quantity per return
    flag — no native Spark aggregate exists; built from a decimal
    cumsum window + first-pick, no UDF."""
    li = load_table(spark, sf, "lineitem")
    return agg_ops.weighted_median(
        li, "l_extendedprice", "l_quantity", ["l_returnflag"]
    ).select("l_returnflag", "weighted_median")


def q_dedup_survivor(spark: SparkSession, sf: str) -> DataFrame:
    """Survivorship policy demo: cluster by 40-char normalized-prefix
    fingerprint (originals ∪ tail-padded copies share prefixes), keep
    the LONGEST text per cluster (doc_id tiebreak) — the policy picks
    the padded copy over the original, proving survivor selection is
    the caller's ranking, not hard-coded min-id."""
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    padded = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" duplicated tail padding")).alias(
            "text"
        ),
    )
    both = docs.unionByName(padded).withColumn(
        "fp", F.md5(F.substring(T.normalize_text(F.col("text")), 1, 40))
    )
    out = dedup_ops.survivor_per_cluster(
        both, "fp", [F.length("text").desc(), F.col("doc_id").asc()]
    )
    return out.select("doc_id", "fp", "cluster_size")


def q_stream_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming rolling z-score anomaly alerts end-to-end
    (streaming/ingest.streaming_anomaly_zscore,
    applyInPandasWithState): per-user trailing-20 window carried
    across micro-batches in a bounded array state. Bounded
    single-batch input ⇒ equals the batch anomaly window, so the
    streaming path is hash-checked against the same SQL oracle (with
    the zero-variance guard both sides implement)."""
    from quanta_etl_spark.streaming import ingest

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf}/events.parquet").schema
    stream = ingest.read_stream(spark, f"{sf}/events.parque[t]", raw_schema)
    out = ingest.streaming_anomaly_zscore(stream)
    q = ingest.write_stream_memory(
        out, "stream_anomaly", output_mode="append"
    )
    q.awaitTermination()
    return (
        spark.table("stream_anomaly")
        .where(F.col("is_anomaly"))
        .select("event_id", "user_id", "zscore")
    )


def q_event_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    timelines: exact counts + row-normalized next-action
    probabilities."""
    ev = load_table(spark, sf, "events")
    return event_ops.event_transitions(ev).select(
        "from_type", "to_type", "n", "prob"
    )


def q_referential_check(spark: SparkSession, sf: str) -> DataFrame:
    """Referential-integrity report over three FK relations of the
    star schema (generalizes the reference's null-check reports,
    etl.py:166-175): totals + null keys + orphans per relation —
    never vacuously empty even on a healthy warehouse."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    orders_report = quality_ops.referential_check(
        o,
        {"orders_customer": (load_table(spark, sf, "customer"), "o_custkey", "c_custkey")},
    )
    lineitem_report = quality_ops.referential_check(
        li,
        {
            "lineitem_part": (load_table(spark, sf, "part"), "l_partkey", "p_partkey"),
            "lineitem_supplier": (load_table(spark, sf, "supplier"), "l_suppkey", "s_suppkey"),
        },
    )
    return orders_report.unionByName(lineitem_report)


def q_ols_regression(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group closed-form OLS (extendedprice on quantity per return
    flag): the moment sums accumulate in exact decimal, the fit algebra
    runs once per group — regression as a single partial-agg shuffle,
    not an iterative solver."""
    li = load_table(spark, sf, "lineitem")
    return agg_ops.ols_regress(
        li, "l_extendedprice", "l_quantity", ["l_returnflag"]
    ).select("l_returnflag", "n", "slope", "intercept", "r2")


def q_chi_square(spark: SparkSession, sf: str) -> DataFrame:
    """Pearson chi-squared independence test of order status vs
    priority — one count aggregation at the cell grain, marginals as
    window sums over the tiny contingency frame, exact-integer
    observed/expected algebra."""
    o = load_table(spark, sf, "orders")
    return agg_ops.chi_square(o, "o_orderstatus", "o_orderpriority")


def q_mad_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Robust (median/MAD) outlier report per event type — the 50%-
    breakdown-point alternative to the Tukey-fence iqr_outliers query;
    two exact-percentile aggregation passes + a broadcast bounds
    join."""
    ev = load_table(spark, sf, "events")
    out = quality_ops.mad_outliers(
        ev, "value", ["event_type"], k=3.0, mode="only"
    )
    return out.select("event_id", "event_type", "value", "mad_score")


def q_revenue_mom_growth(spark: SparkSession, sf: str) -> DataFrame:
    """Month-over-month revenue: aggregate to the month grain first
    (decimal sums), then lag-window the tiny aggregate frame — the
    'aggregate first, window the aggregate' discipline."""
    o = load_table(spark, sf, "orders")
    return resample_ops.period_growth(
        o, "o_orderdate", "o_totalprice", "month"
    ).select("period", "value", "prev_value", "abs_change", "pct_change")


def q_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus PII scrub: inject synthetic emails/phones into every 5th
    document (so the pass provably fires), then mask via the native
    regex chain (functions/text.redact_pii) — per-doc email/phone hit
    counts + an md5 of the scrubbed text. Pattern-based redaction is
    the standard cheap pre-release pass at corpus scale; it runs at
    parquet-scan speed (no Python in the row path)."""
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    injected = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"),
                F.lit(" Contact u"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or call 555-123-4567."),
            ),
        ).otherwise(F.col("text")),
    )
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\+?[0-9][0-9()\s.-]{7,}[0-9]"
    return injected.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(email_re), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all("text", F.lit(phone_re), F.lit(0))).alias(
            "n_phones"
        ),
        F.md5(T.redact_pii(F.col("text"))).alias("clean_md5"),
    )


def _cosupply_edges(spark: SparkSession, sf: str) -> DataFrame:
    """Supplier co-occurrence graph: an edge joins two suppliers that
    both shipped a high-quantity (≥48) line in the same order. The
    quantity cut keeps per-order fan-out tiny, so the pair self-join
    is bounded per order — the blocking discipline every pairing
    operator in this engine follows."""
    li = load_table(spark, sf, "lineitem").where(F.col("l_quantity") >= 48)
    ps = li.select("l_orderkey", "l_suppkey").distinct()
    a = ps.alias("a")
    b = ps.alias("b")
    return (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
        .distinct()
    )


def q_graph_triangles(spark: SparkSession, sf: str) -> DataFrame:
    """Per-supplier triangle counts over the co-supply graph — the
    degree-ordered wedge join (each triangle closed exactly once,
    hub fan-out bounded by O(√m)); the oracle recomputes triangles
    declaratively from the same edge set."""
    return graph_ops.triangle_counts(_cosupply_edges(spark, sf)).select(
        "node", "triangles"
    )


def q_graph_bfs(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-source BFS (min hop count, budget 3) from the three
    lowest-keyed suppliers across the co-supply graph — the fixed-
    budget iterative-join fixpoint with frontier-proportional work;
    the oracle unrolls the same three rounds as chained CTEs."""
    edges = _cosupply_edges(spark, sf)
    sources = (
        load_table(spark, sf, "supplier")
        .where(F.col("s_suppkey") <= 3)
        .select(F.col("s_suppkey").alias("node"))
    )
    return graph_ops.bfs_depths(edges, sources, max_hops=3).select(
        "node", "depth"
    )


def q_rfm_segments(spark: SparkSession, sf: str) -> DataFrame:
    """RFM customer segmentation over orders — quantile tiles with
    id tiebreaks so the rank-based codes are deterministic across
    engines and partitionings (operators/events.rfm_segments)."""
    o = load_table(spark, sf, "orders")
    return event_ops.rfm_segments(
        o, "o_custkey", "o_orderdate", "o_totalprice", n_tiles=4
    )


def q_gini_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Gini coefficient of customer revenue within each nation —
    inequality from the sorted-rank identity on exact decimal totals
    (tie-safe: equal totals permuting leave the rank sum unchanged)."""
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    joined = o.join(
        F.broadcast(c.select("c_custkey", "c_nationkey")),
        o["o_custkey"] == c["c_custkey"],
    )
    return agg_ops.gini_coefficient(
        joined, "o_totalprice", ["c_custkey"], ["c_nationkey"]
    ).select("c_nationkey", "gini", "n_units", "total")


def q_hhi_brands(spark: SparkSession, sf: str) -> DataFrame:
    """Herfindahl–Hirschman supplier-concentration index per part
    brand (squared revenue shares over exact decimal totals) — the
    market-structure rollup."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    joined = li.join(
        F.broadcast(p.select("p_partkey", "p_brand")),
        li["l_partkey"] == p["p_partkey"],
    )
    return agg_ops.hhi_concentration(
        joined, "l_extendedprice", ["l_suppkey"], ["p_brand"]
    ).select("p_brand", "hhi", "n_units")


def q_heavy_keys(spark: SparkSession, sf: str) -> DataFrame:
    """Join/agg skew diagnostic: the 20 heaviest part keys in lineitem
    with share and cumulative share — the report that decides whether
    a key needs salting before a cluster-scale join."""
    li = load_table(spark, sf, "lineitem")
    return quality_ops.heavy_keys(li, ["l_partkey"], top_n=20)


def q_dow_seasonality(spark: SparkSession, sf: str) -> DataFrame:
    """Day-of-week seasonal profile of event values (1 = Sunday …
    7 = Saturday): count, mean, and seasonal index per weekday from
    one 7-row aggregation."""
    ev = load_table(spark, sf, "events")
    return resample_ops.dow_seasonality(ev, "ts", "value")


def q_paragraph_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Paragraph-scope boilerplate removal (corpus.paragraph_dedup):
    repeated nav/footer paragraphs are injected into a third/quarter
    of the documents, the pass drops every paragraph appearing in ≥2
    documents corpus-wide, and survivors are reassembled in order —
    the intra-document dedup that document-level fingerprints miss."""
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    injected = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit(". Subscribe to our newsletter today"),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit(". All rights reserved"),
            ).otherwise(F.lit("")),
        ),
    )
    out = corpus_ops.paragraph_dedup(
        injected, "doc_id", "text", sep=". ", min_repeats=2
    )
    return out.select(
        "doc_id", "n_paras", "n_kept",
        F.md5("clean_text").alias("clean_md5"),
    )


def q_attribution_last_touch(spark: SparkSession, sf: str) -> DataFrame:
    """Last-touch marketing attribution: purchase revenue credited to
    the user's most recent preceding click's campaign (props.k mod 10)
    — one IGNORE NULLS window pass, no self-join
    (events.attribute_last_touch); NULL campaign = organic purchases."""
    ev = load_table(spark, sf, "events")
    campaign = (
        F.get_json_object(F.col("props"), "$.k").cast("int") % 10
    )
    attributed = event_ops.attribute_last_touch(
        ev, "user_id", "ts",
        conversion_pred=F.col("event_type") == "purchase",
        touch_pred=F.col("event_type") == "click",
        touch_key=campaign,
        tiebreak_cols=["event_id"],
    )
    return attributed.groupBy(
        F.col("attributed_key").alias("campaign")
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(30,6)"))
        .cast("double")
        .alias("attributed_value"),
    )


def q_attribution_position(spark: SparkSession, sf: str) -> DataFrame:
    """Position-based (U-shaped 40/20/40) multi-touch attribution
    (events.attribute_position_based): purchase revenue split across
    the full click path per conversion — paths assigned via a
    reverse-cumulative conversion count (no range join), weights as
    column constants so the oracle's IEEE arithmetic matches bitwise."""
    ev = load_table(spark, sf, "events")
    campaign = (
        F.get_json_object(F.col("props"), "$.k").cast("int") % 10
    )
    credited = event_ops.attribute_position_based(
        ev, "user_id", "ts",
        conversion_pred=F.col("event_type") == "purchase",
        touch_pred=F.col("event_type") == "click",
        touch_key=campaign,
        value_col="value",
        tiebreak_cols=["event_id"],
    )
    return credited.groupBy(
        F.col("touch_key").alias("campaign")
    ).agg(
        F.count(F.lit(1)).alias("n_credits"),
        F.sum(F.col("credit").cast("decimal(38,12)"))
        .cast("double")
        .alias("credited_value"),
    )


def q_order_reconciliation(spark: SparkSession, sf: str) -> DataFrame:
    """Header-vs-detail reconciliation (quality.reconcile_totals):
    each order's recorded total against the exact-decimal recomputed
    sum of its discounted line amounts — detail aggregates to the key
    grain BEFORE the join, so line rows never join row-to-row."""
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    amount = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    out = quality_ops.reconcile_totals(
        o, li, "o_orderkey", "l_orderkey", "o_totalprice", amount,
        tolerance=0.5,
    )
    return out.select(
        "o_orderkey", "recorded", "recomputed", "rel_diff",
        "within_tolerance",
    )


def q_top_unshipped(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape (shipping-priority): BUILDING-segment orders
    placed before the cutoff with lines still unshipped after it —
    top 10 by open revenue. Dimension side aggregated after two
    broadcast joins; the top-k is a TakeOrderedAndProject (no global
    sort), revenue tie broken by order key."""
    cutoff = "1998-06-01"
    li = load_table(spark, sf, "lineitem").where(
        F.col("l_shipdate") > cutoff
    )
    o = load_table(spark, sf, "orders").where(F.col("o_orderdate") < cutoff)
    c = load_table(spark, sf, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    rev = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(30,6)")
    joined = li.join(
        F.broadcast(o.join(
            F.broadcast(c.select("c_custkey")),
            o["o_custkey"] == c["c_custkey"],
        ).select("o_orderkey", "o_orderdate", "o_orderpriority")),
        li["l_orderkey"] == F.col("o_orderkey"),
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(rev).cast("double").alias("revenue")
    )
    return agg.orderBy(
        F.col("revenue").desc(), F.col("l_orderkey").asc()
    ).limit(10)


def q_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): NATION_7 suppliers'
    share of delivered revenue per (region, order year) — a five-table
    join where every dimension is broadcast and only the lineitem⋈
    orders equi-join shuffles; exact decimal numerator/denominator,
    one final division."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    dim = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "n_name", "r_name")
    )
    rev = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(30,6)")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(dim), li["l_suppkey"] == dim["s_suppkey"])
    )
    agg = joined.groupBy(
        "r_name", F.year("o_orderdate").alias("o_year")
    ).agg(
        F.sum(F.when(F.col("n_name") == "NATION_7", rev)).alias("__n7"),
        F.sum(rev).alias("__all"),
    )
    return agg.select(
        "r_name",
        "o_year",
        (
            F.coalesce(F.col("__n7"), F.lit(0).cast("decimal(30,6)"))
            .cast("double")
            / F.col("__all").cast("double")
        ).alias("mkt_share"),
    )


def q_stream_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming distinct-user counts per hour — count_distinct is
    unsupported on streams, so this gates the documented two-stage
    shape (watermarked dropDuplicates on (bucket, user), then a
    windowed count; streaming/ingest.windowed_distinct_users), checked
    against the batch count(DISTINCT) oracle."""
    from quanta_etl_spark.streaming import ingest

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf}/events.parquet").schema
    stream = ingest.read_stream(spark, f"{sf}/events.parque[t]", raw_schema)
    ev = ingest.normalize_event_time(stream)
    agg = ingest.windowed_distinct_users(ev)
    q = ingest.write_stream_memory(
        agg, "stream_distinct_users", output_mode="complete"
    )
    q.awaitTermination()
    return spark.table("stream_distinct_users").select(
        F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "bucket_ts"
        ),
        "distinct_users",
    )


def q_inter_event_gap(spark: SparkSession, sf: str) -> DataFrame:
    """Inter-arrival cadence per event type (events.inter_event_gaps):
    microsecond-exact gaps between consecutive same-type events on a
    user timeline — count / decimal-mean / exact p50+p90 seconds."""
    ev = load_table(spark, sf, "events")
    return event_ops.inter_event_gaps(
        ev, "user_id", "ts", "event_type", ["event_id"]
    )


def q_fulfillment_lag(spark: SparkSession, sf: str) -> DataFrame:
    """Order-to-first-shipment lead time per priority class: detail
    aggregates to first ship date per order BEFORE joining the header
    (never row-to-row), then day-lag stats with exact percentiles."""
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    first_ship = li.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("first_ship")
    )
    lag = o.join(
        first_ship, o["o_orderkey"] == first_ship["l_orderkey"]
    ).withColumn(
        "lag_days",
        F.datediff(F.to_date("first_ship"), F.to_date("o_orderdate")),
    )
    return lag.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (
            F.sum(F.col("lag_days").cast("decimal(30,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_lag_days"),
        F.percentile("lag_days", F.lit(0.5)).alias("p50_lag_days"),
        F.percentile("lag_days", F.lit(0.9)).alias("p90_lag_days"),
    )


def q_rolling_corr(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing-20-observation price/quantity correlation per part
    (windows.rolling_corr): exact decimal power sums over the frame,
    correlation algebra once per row — engine-stable where native
    sliding corr() state is not. Only full-frame rows emit."""
    li = load_table(spark, sf, "lineitem")
    # scale=100: qty/price are 2-decimal, so the power sums run as
    # exact primitive longs (~5x the BigDecimal window path).
    out = win_ops.rolling_corr(
        li, ["l_partkey"], "l_shipdate", "l_quantity", "l_extendedprice",
        window_rows=20, tiebreak_cols=["l_orderkey", "l_linenumber"],
        scale=100,
    )
    return out.where(F.col("rolling_corr").isNotNull()).select(
        "l_partkey", "l_orderkey", "l_linenumber", "rolling_corr"
    )


def q_emb_cohesion(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding cluster cohesion per label (similarity.label_cohesion):
    mean member→centroid cosine, every float reduction decimal-
    accumulated so the metric is order- and engine-stable."""
    emb = load_table(spark, sf, "embeddings")
    return sim_ops.label_cohesion(emb, "embedding", "label", "vec_id")


def q_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-resistant two-stage aggregation gated for value parity:
    pre-aggregate on (key, salt) so a hot key splits across reducers,
    then combine partials — decimal sums make the two-stage result
    EXACTLY the plain aggregate the oracle computes (float sums would
    drift with the salt regrouping)."""
    li = load_table(spark, sf, "lineitem")
    out = agg_ops.two_stage_agg(
        li,
        ["l_returnflag"],
        {
            "sum_qty": ("sum", F.col("l_quantity").cast("decimal(20,6)")),
            "n_rows": ("count", "l_quantity"),
            "max_price": ("max", "l_extendedprice"),
        },
        salt=16,
    )
    return out.select(
        "l_returnflag",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        "n_rows",
        "max_price",
    )


def q_holt_forecast(spark: SparkSession, sf: str) -> DataFrame:
    """Holt double-exponential smoothing + 7-day forecast over daily
    event revenue (resample.holt_forecast, applyInPandas recursion —
    bit-identical to the oracle's recursive CTE; the oracle writes
    (1 − β), not its decimal value, because 1−0.3 and the literal 0.7
    differ by one ulp)."""
    ev = load_table(spark, sf, "events")
    return resample_ops.holt_forecast(
        ev, "ts", "value", alpha=0.5, beta=0.3, horizon=7
    )


def q_ab_test(spark: SparkSession, sf: str) -> DataFrame:
    """Two-proportion A/B readout (aggregates.ab_test_proportions):
    users hash-split into two arms (md5 parity — deterministic
    assignment), conversion = any purchase; sizes, rates, lift, and
    the pooled z statistic from exact integer counts."""
    ev = load_table(spark, sf, "events")
    units = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("long"))
        .alias("converted")
    ).withColumn(
        "grp",
        F.when(
            T.portable_hash60(F.col("user_id").cast("string")) % 2 == 0,
            F.lit("A"),
        ).otherwise(F.lit("B")),
    )
    return agg_ops.ab_test_proportions(units, "user_id", "grp", "converted")


def q_basket_lift(spark: SparkSession, sf: str) -> DataFrame:
    """Market-basket association over order contents
    (aggregates.basket_lift): top-20 part-brand pairs by lift, pair
    fan-out blocked per order — support/confidence/lift from exact
    counts."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    baskets = li.join(
        F.broadcast(p.select("p_partkey", "p_brand")),
        li["l_partkey"] == p["p_partkey"],
    ).select("l_orderkey", "p_brand")
    return agg_ops.basket_lift(
        baskets, "l_orderkey", "p_brand", min_support=5, top_k=20
    )


def q_debounce_events(spark: SparkSession, sf: str) -> DataFrame:
    """Leading-edge debounce per (user, type) — only burst onsets
    (≥60s since the previous same-key event) survive
    (events.debounce); µs-exact gap arithmetic."""
    ev = load_table(spark, sf, "events")
    out = event_ops.debounce(
        ev, ["user_id", "event_type"], "ts", 60.0, ["event_id"]
    )
    return out.select("event_id", "user_id", "event_type")


def q_rate_alerts(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-window rate alerting (events.rate_alerts): every event
    that is the 4th-or-later of its user within the trailing day —
    an exact RANGE-frame count, no tumbling-boundary misses."""
    ev = load_table(spark, sf, "events")
    out = event_ops.rate_alerts(
        ev, "user_id", "ts", window_seconds=86400, threshold=4
    )
    return out.select("event_id", "user_id", "n_in_window")


def q_new_vs_returning(spark: SparkSession, sf: str) -> DataFrame:
    """Growth accounting (events.new_vs_returning): daily first-ever
    vs returning actives + the cumulative user curve — distinct
    (user, day) collapse first, windows only over the day frame."""
    ev = load_table(spark, sf, "events")
    return event_ops.new_vs_returning(ev, "user_id", "ts")


def q_benford_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Benford first-digit screen over order totals
    (quality.benford_check): observed vs log10(1+1/d) frequencies and
    per-digit chi-squared contributions, from exact integer counts."""
    o = load_table(spark, sf, "orders")
    return quality_ops.benford_check(o, "o_totalprice")


def q_allocate_budget(spark: SparkSession, sf: str) -> DataFrame:
    """Largest-remainder (Hamilton) allocation
    (aggregates.allocate_proportional): one million units split across
    priority classes ∝ revenue, integer allocations summing EXACTLY
    to the total — remainder ranking tie-broken by class name."""
    o = load_table(spark, sf, "orders")
    rev = o.groupBy("o_orderpriority").agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
        .cast("double")
        .alias("revenue")
    )
    out = agg_ops.allocate_proportional(
        rev, "o_orderpriority", "revenue", 1_000_000
    )
    return out.select("o_orderpriority", "revenue", "quota", "allocated")


def q_graph_link_predict(spark: SparkSession, sf: str) -> DataFrame:
    """Jaccard link prediction over the co-supply graph
    (graph.link_prediction_jaccard): top-20 unconnected supplier pairs
    by shared-neighbor Jaccard — candidates only ever materialize
    through the wedge join, never the all-pairs square."""
    return graph_ops.link_prediction_jaccard(
        _cosupply_edges(spark, sf), top_k=20
    )


def q_seasonal_decompose(spark: SparkSession, sf: str) -> DataFrame:
    """Classic additive decomposition of daily event value
    (resample.seasonal_decompose): centered 7-day moving-average
    trend, day-of-week seasonal means, residual — decimal-exact daily
    sums underneath every component."""
    ev = load_table(spark, sf, "events")
    return resample_ops.seasonal_decompose(ev, "ts", "value")


def q_entity_resolution(spark: SparkSession, sf: str) -> DataFrame:
    """Fuzzy entity resolution END-TO-END: blocked levenshtein pairs
    (dedup.fuzzy_match_pairs) → connected components →
    min-id survivors, singletons kept — the full dedupe-people
    pipeline in one gated plan; the oracle chains the same pair SQL
    into a recursive min-label CTE."""
    c = load_table(spark, sf, "customer").where(F.col("c_custkey") < 300)
    pairs = dedup_ops.fuzzy_match_pairs(
        c, "c_custkey", "c_name", max_distance=2
    )
    clustered = graph_ops.assign_clusters(pairs.select("id_a", "id_b"))
    ids = c.select(F.col("c_custkey").alias("id"))
    return ids.join(clustered, "id", "left").select(
        "id",
        F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id"),
        F.coalesce(F.col("is_survivor"), F.lit(True)).alias("is_survivor"),
    )


def q_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (sampling.weighted_sample, Efraimidis–Spirakis): 100 orders with
    inclusion probability ∝ order value — hash-derived uniforms, so
    the sample reproduces on any engine; one TakeOrderedAndProject."""
    o = load_table(spark, sf, "orders")
    out = samp_ops.weighted_sample(o, "o_orderkey", "o_totalprice", k=100)
    return out.select("o_orderkey", "o_totalprice", "sample_key")


def q_stream_cusum(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming CUSUM drift scores end-to-end
    (streaming/ingest.streaming_cusum, applyInPandasWithState with an
    O(1)-per-key accumulator): bounded single-batch input equals the
    batch recursion, so the same recursive-CTE oracle checks it."""
    from quanta_etl_spark.streaming import ingest

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf}/events.parquet").schema
    stream = ingest.read_stream(spark, f"{sf}/events.parque[t]", raw_schema)
    ev = ingest.normalize_event_time(stream)
    out = ingest.streaming_cusum(ev)
    q = ingest.write_stream_memory(out, "stream_cusum", output_mode="append")
    q.awaitTermination()
    return spark.table("stream_cusum").select(
        "event_id", "user_id", "cusum", "alarm"
    )


def q_anomaly_cusum(spark: SparkSession, sf: str) -> DataFrame:
    """One-sided CUSUM drift detection per user (windows.cusum,
    applyInPandas): the max-clamp recursion's clamp resets make
    exact-boundary alarms bit-reproducible across engines (the faster
    closed-form rewrite was measured to flip 3 knife-edge alarms at
    sf1 on engine-internal window-sum order and reverted — see the
    operator docstring); the oracle's recursive CTE evaluates the
    identical sequential arithmetic."""
    ev = load_table(spark, sf, "events")
    out = win_ops.cusum(
        ev, "user_id", "ts", "value",
        target=50.0, slack=10.0, threshold=120.0,
        tiebreak_cols=["event_id"],
    )
    return out.select("event_id", "user_id", "cusum", "alarm")


def q_topk_diversified(spark: SparkSession, sf: str) -> DataFrame:
    """Diversity-capped ranking (windows.diversified_topk): the 10
    highest-value orders with at most 2 per priority class (5 classes
    × 2 = the cap is reachable and binding) — per-group window prune,
    then TakeOrderedAndProject; no global sort."""
    o = load_table(spark, sf, "orders")
    return win_ops.diversified_topk(
        o,
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        "o_orderpriority",
        per_group=2,
        k=10,
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


def q_time_in_state(spark: SparkSession, sf: str) -> DataFrame:
    """State-duration accounting per event type
    (events.time_in_state): µs-exact held time until each user's next
    event, decimal-summed to hours."""
    ev = load_table(spark, sf, "events")
    return event_ops.time_in_state(
        ev, "user_id", "ts", "event_type", ["event_id"]
    )


def q_text_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 PMI collocations over the corpus
    (text_stats.collocations): adjacent bigram vs unigram probability
    ratio, min-count 5, linear zip-based pairing — the phrase-mining /
    tokenizer-merge-candidate extractor."""
    docs = load_table(spark, sf, "documents")
    return ts_ops.collocations(docs, "text", min_count=5, top_k=20)


def q_text_bm25(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 top-20 retrieval for a fixed query
    (text_stats.bm25_topk): inverted-index-style postings filter
    inside the explode, broadcast df/corpus-stats joins, decimal-
    accumulated per-document score — the lexical-search baseline."""
    docs = load_table(spark, sf, "documents")
    return ts_ops.bm25_topk(
        docs, "doc_id", "text", ["window", "shuffle", "vector"], top_k=20
    )


def q_emb_confusion(spark: SparkSession, sf: str) -> DataFrame:
    """Nearest-centroid confusion matrix over the embeddings table
    (similarity.centroid_confusion): decimal-exact centroids + cosine
    argmax with (score, label) tiebreaks — the cluster-separability
    eval."""
    emb = load_table(spark, sf, "embeddings")
    return sim_ops.centroid_confusion(emb, "embedding", "label", "vec_id")


def q_dedup_multikey(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-key transitive entity resolution
    (dedup.multikey_clusters): synthetic email/phone identifiers over
    customers (congruence classes mod 700 / mod 900, so the two keys
    chain records the other can't) — linear star edges per key value +
    one connected-components pass; the oracle recomputes the clusters
    with a recursive min-label CTE."""
    c = load_table(spark, sf, "customer")
    ents = c.select(
        F.col("c_custkey").alias("id"),
        F.concat(F.lit("e"), (F.col("c_custkey") % 700)).alias("email_key"),
        F.concat(F.lit("p"), (F.col("c_custkey") % 900)).alias("phone_key"),
    )
    return dedup_ops.multikey_clusters(
        ents, "id", ["email_key", "phone_key"]
    ).select("id", "cluster_id", "cluster_size")


def q_interval_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Interval×interval overlap join (joins.interval_overlap_join,
    banded onto a 10-minute grid): per user, 10-minute click windows
    intersected with 10-minute purchase windows, overlap in exact
    integer microseconds — the session-intersection primitive, as an
    equi-join on (user, grid cell) + residual filter."""
    ev = load_table(spark, sf, "events")
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    us = lambda c: F.timestamp_diff("MICROSECOND", epoch, F.col(c))  # noqa: E731
    win_us = 600 * 1_000_000
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        us("ts").alias("c_start"),
        (us("ts") + win_us).alias("c_end"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        us("ts").alias("p_start"),
        (us("ts") + win_us).alias("p_end"),
    )
    out = join_ops.interval_overlap_join(
        clicks, purchases, "click_id", "purchase_id",
        "c_start", "c_end", "p_start", "p_end",
        keys=["user_id"], bin_width=float(win_us),
    )
    return out.select(
        "user_id", "click_id", "purchase_id", "overlap"
    )


def q_sample_per_class(spark: SparkSession, sf: str) -> DataFrame:
    """Exactly-5-per-source deterministic document sample
    (sampling.fixed_n_per_group): md5-rank pick, stable across runs,
    partitionings, and engines — the balanced eval-set primitive."""
    docs = load_table(spark, sf, "documents")
    out = samp_ops.fixed_n_per_group(docs, ["source"], 5, "doc_id")
    return out.select("source", "doc_id", "n_chars")


def q_table_checksum(spark: SparkSession, sf: str) -> DataFrame:
    """Order-invariant dataset checksum over lineitem's key columns
    (quality.table_checksum): decimal sum of a 60-bit portable row
    hash — the sort-free data-equality certificate for migrations and
    compactions."""
    li = load_table(spark, sf, "lineitem")
    return quality_ops.table_checksum(
        li, ["l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate"]
    )


def q_event_trigrams(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 three-step event paths (events.event_ngram_paths):
    lead()-built consecutive trigrams per user timeline, counted on
    the tiny path key; ties break on the path string."""
    ev = load_table(spark, sf, "events")
    return event_ops.event_ngram_paths(
        ev, "user_id", "ts", "event_type", n=3, top_k=20,
        tiebreak_cols=["event_id"],
    )


def q_sequence_conformance(spark: SparkSession, sf: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite: per-user event timelines serialized
    deterministically (array_sort over (ts, id, type) structs) and
    regex-tested for the signup→(click|view)*→purchase shape
    (events.sequence_conformance)."""
    ev = load_table(spark, sf, "events")
    return event_ops.sequence_conformance(
        ev, "user_id", "ts", "event_type",
        pattern=r"^signup(>(click|view))*>purchase",
        tiebreak_cols=["event_id"],
    )


def q_conversion_latency(spark: SparkSession, sf: str) -> DataFrame:
    """Signup→purchase time-to-convert distribution
    (events.conversion_latency): first purchase at-or-after the first
    signup per user, µs-exact latencies, decimal mean + exact
    percentiles."""
    ev = load_table(spark, sf, "events")
    return event_ops.conversion_latency(
        ev, "user_id", "ts", "event_type", "signup", "purchase"
    )


def q_temporal_join(spark: SparkSession, sf: str) -> DataFrame:
    """Validity-interval dimension lookup (joins.temporal_join):
    per-user status versions derived from signup/error events (ts →
    next status ts = [from, to)), clicks joined to the version active
    at their timestamp; clicks before any status keep NULL — the SCD2
    lookup semantics as-of joins don't give you."""
    ev = load_table(spark, sf, "events")
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    versions = (
        ev.where(F.col("event_type").isin("signup", "error"))
        .select(
            "user_id",
            F.col("event_type").alias("status"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = join_ops.temporal_join(
        clicks, versions, "user_id", "ts", how="left"
    )
    return joined.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.sum(F.col("value").cast("decimal(30,6)"))
        .cast("double")
        .alias("sum_value"),
    )


def q_quantile_bins(spark: SparkSession, sf: str) -> DataFrame:
    """Equal-frequency decile binning of part retail prices
    (sampling.quantile_bins — id tiebreaks make the ntile total-
    ordered, so bins are engine-stable): per-bin count and price
    range."""
    p = load_table(spark, sf, "part")
    binned = samp_ops.quantile_bins(
        p, "p_retailprice", num_bins=10, tiebreak_cols=["p_partkey"]
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("p_retailprice").alias("min_price"),
        F.max("p_retailprice").alias("max_price"),
    )


def q_interval_islands(spark: SparkSession, sf: str) -> DataFrame:
    """Gaps-and-islands coverage merge (windows.merge_intervals): each
    event opens a 30-minute half-open activity interval; per-user
    overlapping/touching intervals merge into maximal islands. Bounds
    are exact epoch microseconds (long), sidestepping cross-engine
    timestamp canonicalization."""
    ev = load_table(spark, sf, "events")
    iv = ev.select(
        "user_id",
        # NTZ ts: unix_micros needs TIMESTAMP; session tz is pinned UTC
        # so the cast is value-preserving (events.py:176 idiom)
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.lit(1_800_000_000)
        ).alias("e"),
    )
    return win_ops.merge_intervals(iv, ["user_id"], "s", "e").select(
        "user_id", "island_start", "island_end", "n_intervals"
    )


def q_interval_coverage_gaps(spark: SparkSession, sf: str) -> DataFrame:
    """Uncovered spans between activity islands (windows.
    interval_gaps): per user, the [island_end, next_island_start)
    holes in 30-minute-padded event coverage, lengths in exact
    microseconds."""
    ev = load_table(spark, sf, "events")
    iv = ev.select(
        "user_id",
        # NTZ ts: unix_micros needs TIMESTAMP; session tz is pinned UTC
        # so the cast is value-preserving (events.py:176 idiom)
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.lit(1_800_000_000)
        ).alias("e"),
    )
    return win_ops.interval_gaps(iv, ["user_id"], "s", "e")


def q_group_mode(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic per-group mode (aggregates.mode_by): the most
    frequent part type per brand, ties to the smallest value —
    the hash-gateable alternative to tie-nondeterministic F.mode."""
    p = load_table(spark, sf, "part")
    return agg_ops.mode_by(p, ["p_brand"], "p_type")


def q_rolling_beta(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling OLS price~quantity per supplier (windows.
    rolling_regress): trailing-20-shipment slope/intercept on the
    exact int64 scale=100 path (every sum and the closed-form algebra
    stay exactly representable in doubles — cross-engine
    deterministic), keyed back to (suppkey, orderkey, linenumber)."""
    li = load_table(spark, sf, "lineitem").where(F.col("l_suppkey") <= 25)
    out = win_ops.rolling_regress(
        li,
        ["l_suppkey"],
        "l_shipdate",
        "l_quantity",
        "l_extendedprice",
        window_rows=20,
        tiebreak_cols=["l_orderkey", "l_linenumber"],
        scale=100,
    )
    return out.select(
        "l_suppkey", "l_orderkey", "l_linenumber", "slope", "intercept"
    )


def q_dict_encode(spark: SparkSession, sf: str) -> DataFrame:
    """Stable dictionary encoding (reshape.dictionary_encode): dense
    lexicographic integer codes for part brands, joined back onto the
    corpus — the id-compaction step of a training-data pipeline."""
    p = load_table(spark, sf, "part")
    enc, _ = reshape_ops.dictionary_encode(
        p.select("p_partkey", "p_brand"), "p_brand", id_col="brand_code"
    )
    return enc.select("p_partkey", "p_brand", "brand_code")


def q_graph_clustering(spark: SparkSession, sf: str) -> DataFrame:
    """Local clustering coefficient per supplier over the co-supply
    graph (graph.clustering_coefficient): 2T/(d(d-1)) from the same
    hub-safe degree-ordered wedge join as graph_triangles; degree<2
    nodes report NULL, not 0."""
    return graph_ops.clustering_coefficient(_cosupply_edges(spark, sf))


def q_graph_kcore(spark: SparkSession, sf: str) -> DataFrame:
    """3-core of the co-supply graph (graph.k_core): iterative peel of
    degree<3 nodes, fixed-round semantics (8 peels) so the oracle can
    unroll the identical rounds as chained CTEs — the pagerank
    discipline for iterative algorithms."""
    return graph_ops.k_core(_cosupply_edges(spark, sf), k=3, max_peels=8)


def q_winsorize_prices(spark: SparkSession, sf: str) -> DataFrame:
    """Per-flag winsorization of extended price at the exact
    interpolated [p05, p95] (quality.winsorize): one group-percentile
    aggregation broadcast back onto the rows; clipping is a pure
    projection, so the corpus shuffles once."""
    li = load_table(spark, sf, "lineitem")
    out = quality_ops.winsorize(
        li, ["l_returnflag"], "l_extendedprice", lower=0.05, upper=0.95
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_extendedprice",
        "l_extendedprice_winsorized",
    )


def q_funnel_windowed(spark: SparkSession, sf: str) -> DataFrame:
    """Time-budget conversion funnel (events.funnel_report with
    max_span_seconds): signup → click → purchase where every step must
    land within 24h of the user's first signup — first-entry
    semantics, pure timestamp comparisons."""
    ev = load_table(spark, sf, "events")
    return event_ops.funnel_report(
        ev,
        ["signup", "click", "purchase"],
        max_span_seconds=86400,
    ).select("step_index", "step_name", "users")


def q_revenue_acf(spark: SparkSession, sf: str) -> DataFrame:
    """Autocorrelation function of daily event revenue, lags 0-7
    (resample.cross_correlation with x ≡ y): calendar-sized lag
    self-join, power sums per-term decimal(38,6)-rounded so every
    decimal→double conversion is single-step exact."""
    ev = load_table(spark, sf, "events")
    return resample_ops.cross_correlation(
        ev, "ts", F.col("value"), F.col("value"), max_lag=7
    )


def q_click_purchase_xcorr(spark: SparkSession, sf: str) -> DataFrame:
    """Lead-lag discovery (resample.cross_correlation): daily click
    VOLUME against purchase REVENUE shifted 0-5 days forward — 'do
    clicks lead purchases'."""
    ev = load_table(spark, sf, "events")
    clicks = F.when(F.col("event_type") == "click", 1.0).otherwise(0.0)
    purch = F.when(
        F.col("event_type") == "purchase", F.col("value")
    ).otherwise(0.0)
    return resample_ops.cross_correlation(
        ev, "ts", clicks, purch, max_lag=5
    )


def q_outlier_ensemble(spark: SparkSession, sf: str) -> DataFrame:
    """Three-detector outlier vote per return flag (quality.
    outlier_ensemble): Tukey IQR + MAD modified z-score + extreme
    percentiles — all order-statistic based (no moment sums, no
    decimal→double hazard), two group-sized aggregations broadcast
    back."""
    li = load_table(spark, sf, "lineitem")
    out = quality_ops.outlier_ensemble(
        li.select("l_orderkey", "l_linenumber", "l_returnflag",
                  "l_extendedprice"),
        ["l_returnflag"],
        "l_extendedprice",
        id_cols=["l_orderkey", "l_linenumber"],
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "value",
        "flag_iqr",
        "flag_mad",
        "flag_extreme",
        F.col("votes").cast("int").alias("votes"),
        "is_outlier",
    )


def q_survival_curve(spark: SparkSession, sf: str) -> DataFrame:
    """Kaplan-Meier time-to-conversion (events.kaplan_meier): per-user
    signup → first-purchase duration in exact microseconds,
    right-censored at the corpus max timestamp; risk sets and event
    counts are exact integers, survival accumulates in log space with
    decimal per-term rounding (summation-order independent)."""
    ev = load_table(spark, sf, "events")
    ts = F.col("ts").cast("timestamp")
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(ts).alias("t0"))
    )
    pu = (
        ev.where(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .where(ts >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min(ts).alias("tp"))
    )
    mx = ev.agg(F.max(ts).alias("tmax"))
    subjects = (
        su.join(pu, "user_id", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            F.coalesce(
                F.unix_micros(F.col("tp").cast("timestamp")),
                F.unix_micros(F.col("tmax").cast("timestamp")),
            ).alias("__end"),
            F.unix_micros(F.col("t0").cast("timestamp")).alias("__t0"),
            F.col("tp").isNotNull().alias("ev"),
        )
        .select(
            "user_id",
            (F.col("__end") - F.col("__t0")).alias("dur"),
            "ev",
        )
    )
    out = event_ops.kaplan_meier(subjects, "dur", "ev")
    return out.select(
        "t",
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("n_events").cast("long").alias("n_events"),
        "log_survival",
        "survival",
    )


def q_score_auc(spark: SparkSession, sf: str) -> DataFrame:
    """Rank-sum (Mann-Whitney) ROC AUC of discount as a
    returned-line-flag predictor (aggregates.score_auc): exact
    integer arithmetic with average ranks for the heavily tied score
    until one final division — a one-row metric over 60k+ rows."""
    li = load_table(spark, sf, "lineitem")
    return agg_ops.score_auc(
        li, "l_discount", F.col("l_returnflag") == "R"
    )


def q_calibration_bins(spark: SparkSession, sf: str) -> DataFrame:
    """Reliability-diagram deciles (aggregates.calibration_bins):
    order totalprice into 10 equal-count bins (ntile over a total
    order with key tiebreak) and report exact-decimal mean score and
    the urgent-priority rate per bin."""
    o = load_table(spark, sf, "orders")
    return agg_ops.calibration_bins(
        o,
        "o_totalprice",
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        bins=10,
        tiebreak_cols=["o_orderkey"],
    )


def q_psi_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Population Stability Index of extended price, 1995 shipments
    (baseline) vs 1998 (current) — buckets are the baseline's exact
    inner deciles via exact_quantile_grid, PSI terms decimal-summed
    (aggregates.psi_drift)."""
    li = load_table(spark, sf, "lineitem")
    base = li.where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    cur = li.where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    return agg_ops.psi_drift(base, cur, "l_extendedprice", bins=10)


def q_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): BUILDING-segment orders
    placed before the cut whose lines ship after it, ranked by
    outstanding revenue. Both date predicates push into the scans, the
    customer side broadcasts, and the top-10 is a
    TakeOrderedAndProject with full tiebreaks — the classic
    multi-predicate join pipeline."""
    c = load_table(spark, sf, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    joined = li.join(o, li.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(30,6)"
            )
        )
        .cast("double")
        .alias("revenue")
    )
    return agg.orderBy(
        F.col("revenue").desc(), F.col("o_orderdate").asc(),
        F.col("l_orderkey").asc(),
    ).limit(10)


def q_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): revenue lost to
    'R'-flagged lines per customer over a quarter, nation attached via
    a broadcast dim, top-20 by lost revenue with key tiebreak."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf, "nation")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    agg = joined.groupBy(
        "c_custkey", "c_name", "c_acctbal", "n_name"
    ).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(30,6)"
            )
        )
        .cast("double")
        .alias("revenue")
    )
    return agg.orderBy(
        F.col("revenue").desc(), F.col("c_custkey").asc()
    ).limit(20)


def q_active_users_sliding(spark: SparkSession, sf: str) -> DataFrame:
    """Per-day DAU / trailing-7-day WAU / stickiness
    (events.sliding_active_users): the sliding distinct is computed by
    a BOUNDED fan-out (each user-day explodes to its 7 window-end
    days after a first dedup) — never a day×events range join, never
    window-framed distinct state."""
    ev = load_table(spark, sf, "events")
    return event_ops.sliding_active_users(ev, "user_id", "ts", 7)


def q_quantile_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """Quantile normalization of extended price across return flags
    (quality.quantile_normalize): within-group percent rank mapped
    onto the pooled distribution through a 101-point exact percentile
    grid with linear interpolation — O(grid) broadcast state, one
    group-key shuffle."""
    li = load_table(spark, sf, "lineitem")
    out = quality_ops.quantile_normalize(
        li, ["l_returnflag"], "l_extendedprice", grid=100
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_extendedprice",
        "l_extendedprice_qnorm",
    )


def q_holt_winters(spark: SparkSession, sf: str) -> DataFrame:
    """Holt-Winters additive triple-exponential smoothing of daily
    event revenue (resample.holt_winters_forecast): weekly seasonal
    ring + level/trend recursion + 14-day forecast, bit-matched by a
    recursive-CTE oracle carrying the seasonal ring as a DOUBLE[]."""
    ev = load_table(spark, sf, "events")
    return resample_ops.holt_winters_forecast(
        ev, "ts", "value", period=7, horizon=14
    )


def q_emb_covariance(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding covariance matrix (similarity.embedding_covariance):
    64×64 upper triangle from one explode-free-of-joins pass with
    decimal-exact product sums."""
    e = load_table(spark, sf, "embeddings")
    out = sim_ops.embedding_covariance(e, "embedding")
    return out.select(
        F.col("i").cast("long").alias("i"),
        F.col("j").cast("long").alias("j"),
        "cov",
    )


# ---------------------------------------------------------------------------
# Contract surface
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001 (driver smoke check)."""
    return q_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, QueryFn]:
    # The driver's correctness gate records the FIRST 50 entries only
    # (observed r1-r12). Rotation policy (VERDICT r4 #2 .. r12 #2) so
    # every query holds a recent green driver row. Round-13 window,
    # COUNTED programmatically by tests/test_contract.py:
    #   (A) positions 1-49: the FULL 49-query cohort last driver-gated
    #       in r9 (the stalest driver rows — judge re-verified 49/49
    #       hash-green at sf0.01 in the r12 session), alphabetical;
    #   (B) position 50: graph_pagerank — VERDICT r12 #4 + ADVICE
    #       change its checkpoint path this round (adaptive storage
    #       level + real RDD-level unpersist), so it takes the
    #       changed-code slot (last gated r10).
    #   Then the r10-stale (minus the promoted graph_pagerank) / r11 /
    #   r12 cohorts in cohort-staleness order, each alphabetical.
    #   Every entry past the cap is re-verified each round by
    #   tools/check_oracle.py --json; full-sweep records:
    #   SWEEP_r12.json (sf0.01), SF1_SWEEP_r10.json + SF1_GAP_r11.json
    #   (sf1), SF10_SWEEP_r12.json (sf10), SF100_PROBE_r12.json,
    #   CLUSTER_SWEEP_r12.json (multi-JVM).
    return {
        # -- r13 window positions 1-49: the full r9-stale cohort ----
        "agg_percentiles": q_agg_percentiles,
        "global_topk": q_global_topk,
        "join_asof_forward": q_join_asof_forward,
        "join_null_safe": q_join_null_safe,
        "json_extract_agg": q_json_extract_agg,
        "merge_scd2": q_merge_scd2,
        "merge_update_cols": q_merge_update_cols,
        "merge_upsert": q_merge_upsert,
        "quality_offenders": q_quality_offenders,
        "quality_quarantine": q_quality_quarantine,
        "region_revenue": q_region_revenue,
        "resample_hourly": q_resample_hourly,
        "rolling_stats": q_rolling_stats,
        "rolling_time_window": q_rolling_time_window,
        "rolling_volatility": q_rolling_volatility,
        "rollup_flag_status": q_rollup_flag_status,
        "sample_hash_split": q_sample_hash_split,
        "scan_filter_project": q_scan_filter_project,
        "sessionize": q_sessionize,
        "setop_except": q_setop_except,
        "setop_except_all": q_setop_except_all,
        "setop_intersect": q_setop_intersect,
        "setop_union": q_setop_union,
        "stream_dedup": q_stream_dedup,
        "stream_hourly_stats": q_stream_hourly_stats,
        "stream_ohlcv": q_stream_ohlcv,
        "stream_session_window": q_stream_session_window,
        "stream_sliding_window": q_stream_sliding_window,
        "stream_stateful_running": q_stream_stateful_running,
        "stream_static_join": q_stream_static_join,
        "stream_stream_join": q_stream_stream_join,
        "text_cleanup": q_text_cleanup,
        "text_entropy": q_text_entropy,
        "text_lang_id": q_text_lang_id,
        "text_ngram_counts": q_text_ngram_counts,
        "text_quality": q_text_quality,
        "text_repetition": q_text_repetition,
        "text_tfidf": q_text_tfidf,
        "text_token_stats": q_text_token_stats,
        "text_winnow": q_text_winnow,
        "top_revenue_orders": q_top_revenue_orders,
        "topk_per_group": q_topk_per_group,
        "udtf_sentences": q_udtf_sentences,
        "unpivot_measures": q_unpivot_measures,
        "vector_normalize": q_vector_normalize,
        "weighted_index": q_weighted_index,
        "window_cumulative": q_window_cumulative,
        "window_ewma": q_window_ewma,
        "window_rank": q_window_rank,
        # -- position 50: graph_pagerank (r13 engine change:
        #    adaptive checkpoint storage + real RDD unpersist) ------
        # ---- 50-entry gate cap lands after the entry below ----------
        "graph_pagerank": q_graph_pagerank,
        # -- r10-stale cohort (minus the promoted graph_pagerank) -----
        "activity_streaks": q_activity_streaks,
        "anomaly_zscore": q_anomaly_zscore,
        "array_functions": q_array_functions,
        "attribution_last_touch": q_attribution_last_touch,
        "chi_square": q_chi_square,
        "cohort_retention": q_cohort_retention,
        "contribution_margin": q_contribution_margin,
        "conversion_latency": q_conversion_latency,
        "dedup_survivor": q_dedup_survivor,
        "emb_neardup_lsh": q_emb_neardup_lsh,
        "event_transitions": q_event_transitions,
        "fulfillment_lag": q_fulfillment_lag,
        "funnel_conversion": q_funnel_conversion,
        "fuzzy_pairs": q_fuzzy_pairs,
        "gini_revenue": q_gini_revenue,
        "graph_bfs": q_graph_bfs,
        "graph_triangles": q_graph_triangles,
        "heavy_keys": q_heavy_keys,
        "hhi_brands": q_hhi_brands,
        "histogram_prices": q_histogram_prices,
        "inter_event_gap": q_inter_event_gap,
        "json_map_explode": q_json_map_explode,
        "linear_interpolate": q_linear_interpolate,
        "mad_outliers": q_mad_outliers,
        "market_share": q_market_share,
        "max_drawdown": q_max_drawdown,
        "ols_regression": q_ols_regression,
        "order_reconciliation": q_order_reconciliation,
        "paragraph_dedup": q_paragraph_dedup,
        "pii_redact": q_pii_redact,
        "pricing_summary": q_pricing_summary,
        "revenue_mom_growth": q_revenue_mom_growth,
        "rfm_segments": q_rfm_segments,
        "rolling_corr": q_rolling_corr,
        "rolling_median": q_rolling_median,
        "skyline_pareto": q_skyline_pareto,
        "sql_forecast_revenue": q_sql_forecast_revenue,
        "stratified_sample": q_stratified_sample,
        "stream_anomaly": q_stream_anomaly,
        "stream_distinct_users": q_stream_distinct_users,
        "stream_forward_fill": q_stream_forward_fill,
        "temporal_join": q_temporal_join,
        "time_weighted_avg": q_time_weighted_avg,
        "top_unshipped": q_top_unshipped,
        "vwap_bucketed": q_vwap_bucketed,
        "weighted_median": q_weighted_median,
        "window_distribution": q_window_distribution,
        "window_value_picks": q_window_value_picks,
        # -- r11-gated cohort ------------------------------------------
        "ab_test": q_ab_test,
        "above_avg_orders": q_above_avg_orders,
        "allocate_budget": q_allocate_budget,
        "anomaly_cusum": q_anomaly_cusum,
        "basket_lift": q_basket_lift,
        "benford_audit": q_benford_audit,
        "corpus_cap_per_source": q_corpus_cap_per_source,
        "corpus_chunk": q_corpus_chunk,
        "corpus_decontaminate": q_corpus_decontaminate,
        "corpus_pack_sequences": q_corpus_pack_sequences,
        "corpus_quality_filter": q_corpus_quality_filter,
        "corpus_shuffle_index": q_corpus_shuffle_index,
        "debounce_events": q_debounce_events,
        "decimal_money_agg": q_decimal_money_agg,
        "dedup_apply": q_dedup_apply,
        "dedup_clusters": q_dedup_clusters,
        "dedup_exact": q_dedup_exact,
        "dedup_incremental": q_dedup_incremental,
        "dedup_minhash": q_dedup_minhash,
        "dedup_multikey": q_dedup_multikey,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_simhash": q_dedup_simhash,
        "dow_seasonality": q_dow_seasonality,
        "emb_confusion": q_emb_confusion,
        "emb_cosine_topk": q_emb_cosine_topk,
        "emb_neardup_exact": q_emb_neardup_exact,
        "entity_resolution": q_entity_resolution,
        "event_trigrams": q_event_trigrams,
        "graph_link_predict": q_graph_link_predict,
        "holt_forecast": q_holt_forecast,
        "interval_overlap": q_interval_overlap,
        "media_phash_dedup": q_media_phash_dedup,
        "media_phash_neardup": q_media_phash_neardup,
        "media_pixel_stats": q_media_pixel_stats,
        "new_vs_returning": q_new_vs_returning,
        "profile_columns": q_profile_columns,
        "quantile_bins": q_quantile_bins,
        "rate_alerts": q_rate_alerts,
        "referential_check": q_referential_check,
        "salted_agg": q_salted_agg,
        "sample_per_class": q_sample_per_class,
        "seasonal_decompose": q_seasonal_decompose,
        "sequence_conformance": q_sequence_conformance,
        "stream_cusum": q_stream_cusum,
        "table_checksum": q_table_checksum,
        "text_bm25": q_text_bm25,
        "text_collocations": q_text_collocations,
        "time_in_state": q_time_in_state,
        "topk_diversified": q_topk_diversified,
        "weighted_sample": q_weighted_sample,
        # -- r12-gated cohort (freshest rows) --------------------------
        "active_users_sliding": q_active_users_sliding,
        "agg_collect_sorted": q_agg_collect_sorted,
        "agg_corr_stats": q_agg_corr_stats,
        "agg_priority_stats": q_agg_priority_stats,
        "attribution_position": q_attribution_position,
        "big_qty_orders": q_big_qty_orders,
        "calibration_bins": q_calibration_bins,
        "click_purchase_xcorr": q_click_purchase_xcorr,
        "corpus_mix": q_corpus_mix,
        "cube_status_priority": q_cube_status_priority,
        "date_parts_functions": q_date_parts_functions,
        "densify_fill": q_densify_fill,
        "derive_date_parts": q_derive_date_parts,
        "dict_encode": q_dict_encode,
        "dim_join_left": q_dim_join_left,
        "distinct_flags": q_distinct_flags,
        "emb_cohesion": q_emb_cohesion,
        "emb_covariance": q_emb_covariance,
        "emb_topk_ivf": q_emb_topk_ivf,
        "emb_topk_lsh": q_emb_topk_lsh,
        "forward_fill": q_forward_fill,
        "funnel_windowed": q_funnel_windowed,
        "graph_clustering": q_graph_clustering,
        "graph_kcore": q_graph_kcore,
        "group_mode": q_group_mode,
        "grouping_sets": q_grouping_sets,
        "holt_winters": q_holt_winters,
        "impute_group_mean": q_impute_group_mean,
        "interval_coverage_gaps": q_interval_coverage_gaps,
        "interval_islands": q_interval_islands,
        "iqr_outliers": q_iqr_outliers,
        "join_anti": q_join_anti,
        "join_asof": q_join_asof,
        "join_range": q_join_range,
        "join_salted": q_join_salted,
        "join_semi": q_join_semi,
        "join_theta": q_join_theta,
        "join_two_key": q_join_two_key,
        "lag_returns": q_lag_returns,
        "outlier_ensemble": q_outlier_ensemble,
        "pivot_segments": q_pivot_segments,
        "psi_drift": q_psi_drift,
        "quantile_normalize": q_quantile_normalize,
        "returned_items": q_returned_items,
        "revenue_acf": q_revenue_acf,
        "rolling_beta": q_rolling_beta,
        "score_auc": q_score_auc,
        "shipping_priority": q_shipping_priority,
        "survival_curve": q_survival_curve,
        "winsorize_prices": q_winsorize_prices,
    }


def _shingle_pair_ctes() -> str:
    """Shared candidate-generation CTE chain for the exact-Jaccard
    document-pair oracles (dedup_minhash / dedup_clusters /
    dedup_apply), emitting a ``pairs(id_a, id_b, jaccard)`` CTE of
    every pair with 5-char-shingle jaccard >= 0.5.

    The r10 full-panel sf1 sweep showed the previous all-pairs
    formulation (sh × sh with per-pair list_intersect) is Ω(n²) — the
    point of a brute-force spec at the 500-doc gate scale, but 1.25B
    shingle-list intersections at a 50k-doc replica (oracle_timeout).
    This form stays EXACT while reaching sf1 via set-identity
    collapse: jaccard depends only on the shingle SET, and the corpus
    is template-generated — 50k sf1 docs hold only 4,991 distinct
    sets — so the oracle (1) groups docs by their sorted shingle list
    (the list itself is the group key: exact set identity, no hash-
    collision caveat), (2) computes intersection sizes between the
    ~5k representatives with one inverted-index co-occurrence join
    (the dedup_ngram_jaccard pattern — a pair sharing zero tokens has
    jaccard 0 and is correctly absent), then (3) expands qualifying
    set pairs to every member doc pair and adds intra-group pairs
    (identical sets ⟹ jaccard exactly 1.0, the same value the old
    arithmetic produced). Every emitted (id_a, id_b, jaccard) value —
    and the gate hash — is unchanged (verified bit-identical at
    sf0.01; sf1 completes in ~85s where all-pairs needed 1.25B
    intersections and a textbook prefix filter still measured 8.9B
    candidate join rows on this common-shingle-heavy corpus)."""
    return """norm AS (
                SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                FROM documents
            ), shd AS (
                SELECT doc_id,
                       list_distinct([substr(t, CAST(i AS INT), 5)
                                      FOR i IN generate_series(1, greatest(len(t) - 4, 1))]) AS shingles
                FROM norm
            ), sigs AS MATERIALIZED (
                SELECT doc_id, list_sort(shingles) AS sig, shingles FROM shd
            ), grp AS MATERIALIZED (
                SELECT sig, min(doc_id) AS rep, any_value(shingles) AS shingles
                FROM sigs GROUP BY sig
            ), post AS (
                SELECT rep, unnest(shingles) AS s FROM grp
            ), inter AS (
                SELECT a.rep AS rep_a, b.rep AS rep_b, count(*) AS i
                FROM post a JOIN post b ON a.s = b.s AND a.rep < b.rep
                GROUP BY 1, 2
            ), rep_pairs AS (
                SELECT ga.sig AS sig_a, gb.sig AS sig_b,
                       CAST(i AS DOUBLE) /
                       (len(ga.shingles) + len(gb.shingles) - i) AS jaccard
                FROM inter
                JOIN grp ga ON ga.rep = inter.rep_a
                JOIN grp gb ON gb.rep = inter.rep_b
                WHERE CAST(i AS DOUBLE) /
                      (len(ga.shingles) + len(gb.shingles) - i) >= 0.5
            ), pairs AS (
                SELECT least(sa.doc_id, sb.doc_id) AS id_a,
                       greatest(sa.doc_id, sb.doc_id) AS id_b, rp.jaccard
                FROM rep_pairs rp
                JOIN sigs sa ON sa.sig = rp.sig_a
                JOIN sigs sb ON sb.sig = rp.sig_b
                UNION ALL
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       CAST(1.0 AS DOUBLE) AS jaccard
                FROM sigs a JOIN sigs b
                  ON a.sig = b.sig AND a.doc_id < b.doc_id
            )"""


def _cc_label_ctes(rounds: int = 8) -> str:
    """Unrolled min-label propagation over the symmetric ``edges`` of
    the ``pairs`` CTE (from _shingle_pair_ctes), emitting
    ``cc_final(node, lbl)`` — lbl = the minimum doc_id within
    ``rounds`` hops, i.e. the component minimum once rounds ≥ the
    component's eccentricity. Replaces the UNION-based recursive CTE,
    which materializes O(m²) (node, label) states on a near-clique:
    the r10 sf1 corpus has 1,560-doc cliques, turning 250.6k pairs
    into ~2B recursion join rows (oracle_timeout at 900s), while every
    measured component there has diameter ≤ 2 — 8 min-rounds converge
    with a 4× margin. Under-provisioned rounds fail LOUDLY (an
    unconverged label cannot equal Spark's fixpoint label, so the gate
    hash mismatches), never silently. Every CTE is AS MATERIALIZED:
    each round references the previous one twice, and DuckDB's CTE
    inlining would otherwise expand the chain 2^rounds times (the
    r6 pagerank/kcore "Too many open files" lesson)."""
    parts = [
        """, edges AS MATERIALIZED (
                SELECT id_a AS a, id_b AS b FROM pairs
                UNION
                SELECT id_b AS a, id_a AS b FROM pairs
            ), l0 AS MATERIALIZED (
                SELECT DISTINCT a AS node, a AS lbl FROM edges
            )"""
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f""", l{k} AS MATERIALIZED (
                SELECT n.node,
                       least(n.lbl, coalesce(m.ml, n.lbl)) AS lbl
                FROM l{k - 1} n LEFT JOIN (
                    SELECT e.b AS node, min(p.lbl) AS ml
                    FROM edges e JOIN l{k - 1} p ON p.node = e.a
                    GROUP BY e.b
                ) m ON m.node = n.node
            )"""
        )
    parts.append(f", cc_final AS (SELECT node, lbl FROM l{rounds})")
    return "".join(parts)


def _pagerank_oracle(iterations: int = 5, damping: float = 0.85) -> str:
    """SQL twin of graph_ops.pagerank over the part→supplier edge
    list: the K iterations unroll into chained CTEs with the identical
    arithmetic — per-round contribution sums in DECIMAL(38,18) (order-
    independent, so both engines agree bit-for-bit after the final
    double cast), and the damping constants injected as string-parsed
    doubles so `1-d` is the same IEEE value Python produced.
    The reused CTEs (e, nodes, deg, each round r{k}) are MATERIALIZED —
    the r10 lesson: DuckDB re-evaluates a multiply-referenced CTE
    inline, and at the sf10 replica the ~24M-row DISTINCT edge scan
    re-ran ~7 times, overflowing 77 GB of temp before any round
    finished (NOTES r11).

    Spill discipline (r13, bought by the sf30 run): node ids are
    carried as BIGINTs internally (src = 2*partkey, dst = 2*suppkey+1
    — injective and disjoint by parity, so DISTINCT/UNION/joins see
    the same key sets) and rendered to the 'p…'/'s…' strings only in
    the final projection, and each round joins the edge list exactly
    once against a node-count-sized weight CTE (r{k-1} ⋈ deg first).
    The original shape — two joins per round against a 177M-row
    varchar-keyed e, with rank/out_deg divided per edge — made DuckDB
    build hash tables on the edge side and spilled >75 GB under a
    40 GB memory cap at sf30; this shape keeps every build side at
    node count. Arithmetic is unchanged: the per-edge contribution
    double is the identical IEEE division result whether computed per
    edge row or once per src and fanned out by the join, and the
    DECIMAL(38,18) sum sees the same multiset (sf0.01 hash pinned
    unchanged)."""
    one_minus_d = repr(1.0 - damping)
    d = repr(damping)
    parts = [
        """
        WITH e AS MATERIALIZED (
            SELECT DISTINCT l_partkey * 2 AS src,
                            l_suppkey * 2 + 1 AS dst
            FROM lineitem
        ), nodes AS MATERIALIZED (
            SELECT src AS node FROM e UNION SELECT dst FROM e
        ), nf AS (
            SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
        ), deg AS MATERIALIZED (
            SELECT src, count(*) AS out_deg FROM e GROUP BY src
        ), r0 AS (
            SELECT node, CAST(1.0 AS DOUBLE) / nf.n AS rank
            FROM nodes CROSS JOIN nf
        )"""
    ]
    for k in range(1, iterations + 1):
        parts.append(
            f""", w{k} AS (
            SELECT deg.src, r.rank / deg.out_deg AS c
            FROM r{k - 1} r JOIN deg ON r.node = deg.src
        ), s{k} AS (
            SELECT e.dst AS node,
                   CAST(sum(CAST(w.c AS DECIMAL(38,18))) AS DOUBLE) AS s
            FROM e JOIN w{k} w ON e.src = w.src
            GROUP BY e.dst
        ), r{k} AS MATERIALIZED (
            SELECT nodes.node,
                   CAST('{one_minus_d}' AS DOUBLE) / nf.n
                   + CAST('{d}' AS DOUBLE)
                     * COALESCE(s{k}.s, CAST(0.0 AS DOUBLE)) AS rank
            FROM nodes
            CROSS JOIN nf
            LEFT JOIN s{k} ON nodes.node = s{k}.node
        )"""
        )
    parts.append(
        f"""
        SELECT CASE WHEN node % 2 = 0 THEN 'p' || CAST(node // 2 AS VARCHAR)
                    ELSE 's' || CAST(node // 2 AS VARCHAR) END AS node,
               rank
        FROM r{iterations}"""
    )
    return "".join(parts)


def _lsh_neardup_oracle(max_planes: int = 20) -> str:
    """SQL twin of embedding_neardup_pairs(num_planes="auto", seed=42),
    SCALE-STABLE (VERDICT r9 #3): the operator auto-sizes the plane
    count to ``max(4, ceil(log2(n / 256)))``, and the seeded planes are
    PREFIX-STABLE (plane i's gaussians depend only on the draws before
    it, so the first 4 planes of a 7-plane set equal the 4-plane set).
    The oracle therefore inlines ``max_planes`` plane literals, derives
    the same plane count from ``count(*)`` in SQL, and joins on the
    first-p bit prefix — two vectors share a Spark bucket iff their
    sign-bit prefixes agree, so the pairing is identical at every scale
    up to 256·2^max_planes vectors (~268M at the default). The log2
    boundary is exact in both engines when n/256 is a power of two and
    ulps away from an integer otherwise, so ceil never splits."""
    import random

    rng = random.Random(42)
    planes = [
        [rng.gauss(0.0, 1.0) for _ in range(64)] for _ in range(max_planes)
    ]
    lits = ["[" + ", ".join(repr(v) for v in p) + "]" for p in planes]
    bit_list = ", ".join(
        f"(CASE WHEN list_dot_product(v, {lit}) >= 0 THEN 1 ELSE 0 END)"
        for lit in lits
    )
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), np AS (
            SELECT GREATEST(
                4, CAST(ceil(log2(GREATEST(count(*), 1) / 256.0)) AS INT)
            ) AS p
            FROM e
        ), b AS (
            SELECT vec_id, v,
                   list_slice([{bit_list}], 1, (SELECT p FROM np)) AS pre
            FROM e
        )
        SELECT a.vec_id AS id_a, c.vec_id AS id_b,
               list_cosine_similarity(a.v, c.v) AS cosine
        FROM b a JOIN b c ON a.pre = c.pre AND a.vec_id < c.vec_id
        WHERE list_cosine_similarity(a.v, c.v) >= 0.2
    """


def _lsh_topk_oracle(num_planes: int = 6, k: int = 5) -> str:
    """SQL twin of cosine_topk_lsh(num_planes=6, multiprobe=True)."""
    import random

    rng = random.Random(42)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(64)] for _ in range(num_planes)]
    lits = ["[" + ", ".join(repr(v) for v in p) + "]" for p in planes]
    bits = " + ".join(
        f"(CASE WHEN list_dot_product(v, {lit}) >= 0 THEN 1 ELSE 0 END)"
        f" * {1 << (num_planes - 1 - i)}"
        for i, lit in enumerate(lits)
    )
    probe_list = ", ".join(
        ["qbkt"] + [f"xor(qbkt, {1 << i})" for i in range(num_planes)]
    )
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), b AS (
            SELECT vec_id, v, {bits} AS bkt FROM e
        ), q AS (
            SELECT vec_id AS query_id, v AS qv, bkt AS qbkt FROM b WHERE vec_id < 10
        ), probes AS (
            SELECT query_id, qv, unnest([{probe_list}]) AS bkt FROM q
        ), scored AS (
            SELECT p.query_id, c.vec_id AS neighbor_id,
                   list_cosine_similarity(p.qv, c.v) AS cosine
            FROM probes p JOIN b c ON p.bkt = c.bkt
            WHERE p.query_id != c.vec_id
        )
        SELECT query_id, neighbor_id, cosine,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
        FROM scored QUALIFY rank <= {k}
    """


def _holt_winters_oracle(
    m: int = 7,
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.2,
    horizon: int = 14,
) -> str:
    """SQL twin of resample.holt_winters_forecast: one recursive CTE
    walks the daily series row-by-row carrying (suma, sumb, ys2, l, b,
    ring) — the warmup sums accumulate left-to-right exactly like the
    operator's Python loop, the seasonal ring is a DOUBLE[] rotated
    with list ops, and every update expression is written in the
    operator's exact IEEE shape (computed ``1.0 − α``, no precomputed
    constants), so the two engines agree bit-for-bit."""
    a, bt, g = repr(alpha), repr(beta), repr(gamma)
    mf = repr(float(m))
    m2 = 2 * m
    # expression macros (SQL cannot reference same-SELECT aliases, so
    # l' is repeated inside b'/ring' — identical IEEE result)
    lnew = f"({a} * (o.y - h.ring[1]) + (1.0 - {a}) * (h.l + h.b))"
    linit = f"((h.sumb + o.y) / {mf})"
    binit = f"(((h.sumb + o.y) / {mf} - h.suma / {mf}) / {mf})"
    return f"""
        WITH RECURSIVE daily AS MATERIALIZED (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS y
            FROM events GROUP BY 1
        ), o AS MATERIALIZED (
            SELECT day, y, row_number() OVER (ORDER BY day) AS rn
            FROM daily
        ), hw(rn, day, y, suma, sumb, ys2, l, b, ring,
              fitted, seasonal, level_o, trend_o) AS (
            SELECT o.rn, o.day, o.y, o.y, CAST(0.0 AS DOUBLE),
                   CAST([] AS DOUBLE[]),
                   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                   CAST([] AS DOUBLE[]),
                   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
            FROM o WHERE o.rn = 1
            UNION ALL
            SELECT o.rn, o.day, o.y,
                   CASE WHEN o.rn <= {m} THEN h.suma + o.y
                        ELSE h.suma END,
                   CASE WHEN o.rn > {m} AND o.rn <= {m2}
                        THEN h.sumb + o.y ELSE h.sumb END,
                   CASE WHEN o.rn > {m} AND o.rn <= {m2}
                        THEN list_append(h.ys2, o.y) ELSE h.ys2 END,
                   CASE WHEN o.rn = {m2} THEN {linit}
                        WHEN o.rn > {m2} THEN {lnew}
                        ELSE CAST(NULL AS DOUBLE) END,
                   CASE WHEN o.rn = {m2} THEN {binit}
                        WHEN o.rn > {m2}
                        THEN {bt} * ({lnew} - h.l) + (1.0 - {bt}) * h.b
                        ELSE CAST(NULL AS DOUBLE) END,
                   CASE WHEN o.rn = {m2} THEN
                            list_transform(list_append(h.ys2, o.y),
                                x -> x - (h.sumb + o.y) / {mf})
                        WHEN o.rn > {m2} THEN
                            list_append(h.ring[2:],
                                {g} * (o.y - {lnew})
                                + (1.0 - {g}) * h.ring[1])
                        ELSE h.ring END,
                   CASE WHEN o.rn > {m2}
                        THEN h.l + h.b + h.ring[1] END,
                   CASE WHEN o.rn > {m2} THEN h.ring[1] END,
                   CASE WHEN o.rn > {m2} THEN {lnew} END,
                   CASE WHEN o.rn > {m2}
                        THEN {bt} * ({lnew} - h.l) + (1.0 - {bt}) * h.b
                        END
            FROM hw h JOIN o ON o.rn = h.rn + 1
        ), hist AS (
            SELECT day, y AS observed, level_o AS level,
                   trend_o AS trend, seasonal, fitted,
                   FALSE AS is_forecast
            FROM hw
        ), last_row AS (
            SELECT day, l, b, ring FROM hw
            ORDER BY rn DESC LIMIT 1
        ), fc AS (
            SELECT last_row.day + to_days(CAST(h AS INTEGER)) AS day,
                   CAST(NULL AS DOUBLE) AS observed,
                   l AS level, b AS trend,
                   ring[((h - 1) % {m}) + 1] AS seasonal,
                   l + h * b + ring[((h - 1) % {m}) + 1] AS fitted,
                   TRUE AS is_forecast
            FROM last_row,
                 (SELECT unnest(generate_series(1, {horizon})) AS h)
        )
        SELECT * FROM hist
        UNION ALL
        SELECT * FROM fc
    """


def _kcore_oracle(k: int = 3, rounds: int = 8) -> str:
    """SQL twin of graph_ops.k_core over the co-supply edge list: the
    fixed ``rounds`` peels unroll into chained MATERIALIZED CTEs
    (inlined CTEs would expand ~3^rounds references — DuckDB runs out
    of file handles re-opening the scan; k-core's
    early-exit is a pure optimization — once the edge set is stable,
    further peels are no-ops, so the unrolled result is identical)."""
    parts = [
        """
        WITH ps AS MATERIALIZED (
            SELECT DISTINCT l_orderkey, l_suppkey
            FROM lineitem WHERE l_quantity >= 48
        ), e0 AS MATERIALIZED (
            SELECT DISTINCT a.l_suppkey AS a, b.l_suppkey AS b
            FROM ps a JOIN ps b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_suppkey < b.l_suppkey
        )"""
    ]
    prev = "e0"
    for i in range(1, rounds + 1):
        parts.append(
            f""", k{i} AS MATERIALIZED (
            SELECT node FROM (
                SELECT a AS node FROM {prev}
                UNION ALL SELECT b FROM {prev}
            ) GROUP BY node HAVING count(*) >= {k}
        ), e{i} AS MATERIALIZED (
            SELECT a, b FROM {prev}
            WHERE a IN (SELECT node FROM k{i})
              AND b IN (SELECT node FROM k{i})
        )"""
        )
        prev = f"e{i}"
    parts.append(
        f"""
        SELECT node, count(*) AS deg FROM (
            SELECT a AS node FROM {prev}
            UNION ALL SELECT b FROM {prev}
        ) GROUP BY node HAVING count(*) >= {k}"""
    )
    return "".join(parts)


def _roundtrip_decimal_double_casts(sql: str) -> str:
    """Rewrite every ``CAST(<decimal-expr> AS DOUBLE)`` in an oracle to
    ``CAST(CAST(<decimal-expr> AS VARCHAR) AS DOUBLE)``.

    Why (r12, found by the sf10 sweep): DuckDB's DECIMAL→DOUBLE cast
    is not correctly rounded — e.g. the exact decimal sum
    753509526545.000000 casts to 753509526544.9999 (one ulp low)
    while Spark's BigDecimal.doubleValue() yields exactly
    753509526545.0. Below ~8.6e9 the gate's 6-decimal rounding masks
    the ulp; at sf10 money-sum magnitudes (~7.5e11 per priority
    class) one ulp is ~1.2e-4 and the hash diverges
    (allocate_budget, cube_status_priority). The VARCHAR roundtrip is
    correctly rounded (DuckDB's decimal→varchar is exact text, its
    varchar→double parse is shortest-round), so the oracle double
    equals Spark's double at ANY magnitude. Provably a no-op wherever
    the lossy cast already agreed — applying it to every oracle
    changes no green hash, it only removes magnitude-dependent luck.

    Mechanics: balanced-paren scan for ``CAST(`` whose operand ends
    with ``AS DOUBLE`` at that cast's own paren depth; EVERY such cast
    is rewritten (r12 follow-up: the original pass only rewrote
    operands whose text mentioned DECIMAL, which missed columns that
    are decimal via a CTE — gini_revenue's ``CAST(sum(x) AS DOUBLE)``
    diverged at sf100's ~9e11 totals). Wrapping unconditionally is
    safe: int→double and double→double casts are exact, and DuckDB's
    double→varchar is shortest-roundtrip (verified over 3k
    bit-pattern-random doubles — varchar→double parse returns the
    identical bits), so the wrap is the identity wherever the direct
    cast was already exact and the correct rounding wherever it was
    not. Any operand type that cannot round-trip through VARCHAR
    fails the oracle loudly, never silently. Operands already ending
    in ``AS VARCHAR)`` are skipped, which also terminates the
    fixpoint loop."""
    out = sql
    changed = True
    while changed:
        changed = False
        i = 0
        while True:
            j = out.find("CAST(", i)
            if j < 0:
                break
            # find the matching close paren of this CAST(
            depth = 0
            k = j + 4  # index of '('
            end = -1
            for p in range(k, len(out)):
                if out[p] == "(":
                    depth += 1
                elif out[p] == ")":
                    depth -= 1
                    if depth == 0:
                        end = p
                        break
            if end < 0:
                break
            inner = out[j + 5 : end]
            m = re.search(r"\s+AS\s+DOUBLE\s*$", inner, re.IGNORECASE)
            if m:
                operand = inner[: m.start()]
                if not operand.rstrip().upper().endswith("AS VARCHAR)"):
                    out = (
                        out[:j]
                        + f"CAST(CAST({operand} AS VARCHAR) AS DOUBLE)"
                        + out[end + 1 :]
                    )
                    changed = True
                    # restart scan past the rewritten cast's operand
                    i = j + len("CAST(CAST(")
                    continue
            i = j + 5
    return out


def oracle_sql() -> dict[str, str]:
    return {k: _roundtrip_decimal_double_casts(v) for k, v in _oracle_sql_raw().items()}


def sample_keys() -> dict[str, list[str]]:
    """Output key columns for SAMPLED differential checks (r13,
    VERDICT r12 #6) — NOT part of the driver contract; consumed by
    ``tools/check_oracle.py --sample-prefix``.

    Large-output queries (output rows scale with the input) cannot be
    fully collected at sf100 (6e8-row outputs), so the sf100 ladder
    previously carried no hash signal for them. The sampled check
    filters BOTH engines' outputs to the deterministic hash bucket
    ``md5(concat_ws('|', keys...)) LIKE '<prefix>%'`` before the
    normal canonical compare — a 1/16^len(prefix) row sample whose
    hash equality is as binding per-row as the full check.

    Key columns must render IDENTICALLY under Spark's
    ``CAST(x AS STRING)`` and DuckDB's ``CAST(x AS VARCHAR)``: bigint/
    int/plain-string only (doubles and timestamps render differently
    and would silently sample different buckets per engine — caught
    loudly anyway by the rowcount compare, but pick stable keys).
    Prefer the row's natural key so every output row has a uniform,
    independent chance of selection."""
    return {
        "derive_date_parts": ["o_orderkey"],
        "dim_join_left": ["o_orderkey"],
        "fuzzy_pairs": ["id_a", "id_b"],
        "impute_group_mean": ["o_orderkey"],
        "join_salted": ["o_orderkey"],
        "join_two_key": ["l_orderkey", "l_linenumber"],
        "linear_interpolate": ["event_id"],
        "merge_update_cols": ["o_orderkey"],
        "merge_upsert": ["o_orderkey"],
        "order_reconciliation": ["o_orderkey"],
        "quality_quarantine": ["l_orderkey", "l_linenumber"],
        "quantile_normalize": ["l_orderkey", "l_linenumber"],
        "rolling_beta": ["l_orderkey", "l_linenumber"],
        "rolling_corr": ["l_orderkey", "l_linenumber"],
        "rolling_stats": ["event_id"],
        "scan_filter_project": ["l_orderkey", "l_linenumber"],
        "sessionize": ["event_id"],
        "text_winnow": ["doc_id", "fingerprint"],
        "window_cumulative": ["event_id"],
        "window_ewma": ["event_id"],
        "winsorize_prices": ["l_orderkey", "l_linenumber"],
    }


def _oracle_sql_raw() -> dict[str, str]:
    return {
        "stream_cusum": """
            WITH RECURSIVE ordered AS (
                SELECT event_id, user_id, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events
            ), cs(user_id, rn, event_id, s) AS (
                SELECT user_id, rn, event_id,
                       greatest(0.0, value - 50.0 - 10.0)
                FROM ordered WHERE rn = 1
                UNION ALL
                SELECT o.user_id, o.rn, o.event_id,
                       greatest(0.0, c.s + (o.value - 50.0 - 10.0))
                FROM cs c JOIN ordered o
                  ON o.user_id = c.user_id AND o.rn = c.rn + 1
            )
            SELECT event_id, user_id, s AS cusum,
                   s > 120.0 AS alarm
            FROM cs
        """,
        "anomaly_cusum": """
            WITH RECURSIVE ordered AS (
                SELECT event_id, user_id, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events
            ), cs(user_id, rn, event_id, s) AS (
                SELECT user_id, rn, event_id,
                       greatest(0.0, value - 50.0 - 10.0)
                FROM ordered WHERE rn = 1
                UNION ALL
                SELECT o.user_id, o.rn, o.event_id,
                       greatest(0.0, c.s + (o.value - 50.0 - 10.0))
                FROM cs c JOIN ordered o
                  ON o.user_id = c.user_id AND o.rn = c.rn + 1
            )
            SELECT event_id, user_id, s AS cusum,
                   s > 120.0 AS alarm
            FROM cs
        """,
        "holt_forecast": """
            WITH RECURSIVE daily AS (
                SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                       CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
                           AS y
                FROM events GROUP BY 1
            ), o AS (
                SELECT day, y, row_number() OVER (ORDER BY day) AS rn
                FROM daily
            ), hl(rn, day, y, l, b, fitted) AS (
                SELECT o.rn, o.day, o.y, o.y,
                       (SELECT y FROM o WHERE rn = 2) - o.y,
                       CAST(NULL AS DOUBLE)
                FROM o WHERE o.rn = 1
                UNION ALL
                SELECT o.rn, o.day, o.y,
                       0.5 * o.y + (1 - 0.5) * (h.l + h.b),
                       0.3 * ((0.5 * o.y + (1 - 0.5) * (h.l + h.b)) - h.l)
                       + (1 - 0.3) * h.b,
                       h.l + h.b
                FROM hl h JOIN o ON o.rn = h.rn + 1
            ), hist AS (
                SELECT day, y AS observed, l AS level, b AS trend,
                       fitted, FALSE AS is_forecast
                FROM hl
            ), last_row AS (
                SELECT day, l, b FROM hl
                ORDER BY rn DESC LIMIT 1
            ), fc AS (
                SELECT last_row.day + to_days(CAST(h AS INTEGER)) AS day,
                       CAST(NULL AS DOUBLE) AS observed,
                       l AS level, b AS trend,
                       l + h * b AS fitted,
                       TRUE AS is_forecast
                FROM last_row,
                     (SELECT unnest(generate_series(1, 7)) AS h)
            )
            SELECT * FROM hist
            UNION ALL
            SELECT * FROM fc
        """,
        "ab_test": """
            WITH units AS (
                SELECT user_id,
                       max(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS converted,
                       CASE WHEN CAST(('0x' || substr(
                               md5(CAST(user_id AS VARCHAR)), 1, 15))
                               AS UBIGINT) % 2 = 0
                            THEN 'A' ELSE 'B' END AS grp
                FROM events GROUP BY user_id
            ), per AS (
                SELECT grp, count(*) AS n, sum(converted) AS conv
                FROM units GROUP BY grp
            ), one AS (
                SELECT
                    max(CASE WHEN grp = 'A' THEN n END) AS n_a,
                    max(CASE WHEN grp = 'A' THEN conv END) AS conv_a,
                    max(CASE WHEN grp = 'B' THEN n END) AS n_b,
                    max(CASE WHEN grp = 'B' THEN conv END) AS conv_b
                FROM per
            )
            SELECT 'A' AS group_a, n_a,
                   CAST(conv_a AS BIGINT) AS conv_a,
                   CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
                   'B' AS group_b, n_b,
                   CAST(conv_b AS BIGINT) AS conv_b,
                   CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
                   CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                   - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                       AS lift_abs,
                   CASE WHEN sqrt(
                            ((CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))
                             / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                            * (1 - (CAST(conv_a AS DOUBLE)
                                    + CAST(conv_b AS DOUBLE))
                                   / (CAST(n_a AS DOUBLE)
                                      + CAST(n_b AS DOUBLE)))
                            * (1 / CAST(n_a AS DOUBLE)
                               + 1 / CAST(n_b AS DOUBLE))) > 0
                   THEN (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                         - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                        / sqrt(
                            ((CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))
                             / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                            * (1 - (CAST(conv_a AS DOUBLE)
                                    + CAST(conv_b AS DOUBLE))
                                   / (CAST(n_a AS DOUBLE)
                                      + CAST(n_b AS DOUBLE)))
                            * (1 / CAST(n_a AS DOUBLE)
                               + 1 / CAST(n_b AS DOUBLE)))
                   END AS z_stat
            FROM one
        """,
        "basket_lift": """
            WITH bi AS (
                SELECT DISTINCT l.l_orderkey AS b, p.p_brand AS i
                FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            ), nb AS (
                SELECT CAST(count(DISTINCT b) AS DOUBLE) AS n_baskets
                FROM bi
            ), item_n AS (
                SELECT i, count(*) AS n_item FROM bi GROUP BY i
            ), pairs AS (
                SELECT a.i AS item_a, b2.i AS item_b, count(*) AS n_pair
                FROM bi a JOIN bi b2
                  ON a.b = b2.b AND a.i < b2.i
                GROUP BY 1, 2 HAVING count(*) >= 5
            )
            SELECT p.item_a, p.item_b, p.n_pair,
                   CAST(p.n_pair AS DOUBLE) / nb.n_baskets AS support,
                   CAST(p.n_pair AS DOUBLE) / ia.n_item AS confidence,
                   (CAST(p.n_pair AS DOUBLE) / nb.n_baskets)
                   / ((CAST(ia.n_item AS DOUBLE) / nb.n_baskets)
                      * (CAST(ib.n_item AS DOUBLE) / nb.n_baskets))
                       AS lift
            FROM pairs p
            JOIN item_n ia ON ia.i = p.item_a
            JOIN item_n ib ON ib.i = p.item_b
            CROSS JOIN nb
            ORDER BY lift DESC, item_a ASC, item_b ASC
            LIMIT 20
        """,
        "debounce_events": """
            WITH g AS (
                SELECT event_id, user_id, event_type,
                       epoch_us(ts) - epoch_us(
                           lag(ts) OVER (PARTITION BY user_id, event_type
                                         ORDER BY ts, event_id)
                       ) AS gap_us
                FROM events
            )
            SELECT event_id, user_id, event_type
            FROM g WHERE gap_us IS NULL OR gap_us >= 60000000
        """,
        "rate_alerts": """
            WITH s AS (
                SELECT event_id, user_id,
                       count(*) OVER (
                           PARTITION BY user_id
                           ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                           RANGE BETWEEN 86400 PRECEDING
                                     AND CURRENT ROW
                       ) AS n_in_window
                FROM events
            )
            SELECT event_id, user_id, n_in_window
            FROM s WHERE n_in_window >= 4
        """,
        "new_vs_returning": """
            WITH act AS (
                SELECT DISTINCT user_id,
                       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
                FROM events
            ), fst AS (
                SELECT user_id, min(day) AS first_day
                FROM act GROUP BY 1
            ), daily AS (
                SELECT a.day,
                       sum(CASE WHEN a.day = f.first_day
                                THEN 1 ELSE 0 END) AS n_new,
                       count(*) - sum(CASE WHEN a.day = f.first_day
                                           THEN 1 ELSE 0 END)
                           AS n_returning
                FROM act a JOIN fst f USING (user_id)
                GROUP BY a.day
            )
            SELECT day, CAST(n_new AS BIGINT) AS n_new,
                   CAST(n_returning AS BIGINT) AS n_returning,
                   CAST(sum(n_new) OVER (ORDER BY day
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND CURRENT ROW)
                        AS BIGINT) AS cum_users
            FROM daily
        """,
        "benford_audit": """
            WITH d AS (
                SELECT CAST(regexp_extract(
                           CAST(abs(o_totalprice) AS VARCHAR),
                           '([1-9])', 1) AS INT) AS digit
                FROM orders
                WHERE o_totalprice IS NOT NULL AND o_totalprice <> 0
                  AND regexp_extract(CAST(abs(o_totalprice) AS VARCHAR),
                                     '([1-9])', 1) <> ''
            ), cnt AS (
                SELECT digit, count(*) AS n FROM d GROUP BY digit
            ), tot AS (
                SELECT CAST(sum(n) OVER () AS DOUBLE) AS t, digit, n
                FROM cnt
            )
            SELECT digit, n,
                   CAST(n AS DOUBLE) / t AS observed_freq,
                   log10(1.0 + 1.0 / digit) AS benford_freq,
                   (CAST(n AS DOUBLE) / t - log10(1.0 + 1.0 / digit))
                   * (CAST(n AS DOUBLE) / t - log10(1.0 + 1.0 / digit))
                   / log10(1.0 + 1.0 / digit) * t AS chi2_contrib
            FROM tot
        """,
        "allocate_budget": """
            WITH rev AS (
                SELECT o_orderpriority,
                       CAST(sum(CAST(o_totalprice AS DECIMAL(30,6)))
                            AS DOUBLE) AS revenue
                FROM orders GROUP BY 1
            ), based AS (
                SELECT o_orderpriority, revenue,
                       CAST(revenue AS DOUBLE) * 1000000
                       / CAST(sum(CAST(revenue AS DECIMAL(30,6)))
                              OVER () AS DOUBLE) AS quota
                FROM rev WHERE revenue > 0
            ), fl AS (
                SELECT o_orderpriority, revenue, quota,
                       CAST(floor(quota) AS BIGINT) AS f,
                       quota - floor(quota) AS rem
                FROM based
            )
            SELECT o_orderpriority, revenue, quota,
                   f + CASE WHEN row_number() OVER (
                                ORDER BY rem DESC, o_orderpriority ASC)
                            <= 1000000 - CAST(sum(f) OVER () AS BIGINT)
                            THEN 1 ELSE 0 END AS allocated
            FROM fl
        """,
        "graph_link_predict": """
            WITH ps AS (
                SELECT DISTINCT l_orderkey, l_suppkey
                FROM lineitem WHERE l_quantity >= 48
            ), e AS (
                SELECT DISTINCT a.l_suppkey AS a, b.l_suppkey AS b
                FROM ps a JOIN ps b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_suppkey < b.l_suppkey
            ), adj AS (
                SELECT a AS n, b AS nb FROM e
                UNION ALL SELECT b, a FROM e
            ), deg AS (
                SELECT n, count(*) AS deg FROM adj GROUP BY n
            ), common AS (
                SELECT w1.n AS x, w2.n AS y, count(*) AS common
                FROM adj w1 JOIN adj w2
                  ON w1.nb = w2.nb AND w1.n < w2.n
                GROUP BY 1, 2
            ), cand AS (
                SELECT c.x, c.y, c.common
                FROM common c
                LEFT JOIN e ON e.a = c.x AND e.b = c.y
                WHERE e.a IS NULL
            )
            SELECT c.x AS node_a, c.y AS node_b, c.common,
                   CAST(c.common AS DOUBLE)
                   / (dx.deg + dy.deg - c.common) AS jaccard
            FROM cand c
            JOIN deg dx ON dx.n = c.x
            JOIN deg dy ON dy.n = c.y
            ORDER BY jaccard DESC, node_a ASC, node_b ASC
            LIMIT 20
        """,
        "seasonal_decompose": """
            WITH daily AS (
                SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                       CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
                           AS observed
                FROM events GROUP BY 1
            ), tr AS (
                SELECT day, observed,
                       CASE WHEN count(*) OVER w >= 7 THEN
                           CAST(sum(CAST(observed AS DECIMAL(30,6)))
                                OVER w AS DOUBLE)
                           / count(*) OVER w
                       END AS trend
                FROM daily
                WINDOW w AS (ORDER BY day
                             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
            ), seas AS (
                SELECT dayofweek(day) + 1 AS dow,
                       CAST(sum(CAST(observed - trend AS DECIMAL(30,6)))
                            AS DOUBLE) / count(*) AS seasonal
                FROM tr WHERE trend IS NOT NULL
                GROUP BY 1
            )
            SELECT t.day, t.observed, t.trend, s.seasonal,
                   t.observed - t.trend - s.seasonal AS residual
            FROM tr t LEFT JOIN seas s
              ON dayofweek(t.day) + 1 = s.dow
        """,
        "entity_resolution": """
            WITH RECURSIVE c AS (
                SELECT c_custkey, c_name,
                       lower(substr(c_name, 1, 1)) AS b0,
                       length(c_name) AS b1
                FROM customer WHERE c_custkey < 300
            ), pairs AS (
                SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
                FROM c a JOIN c b
                  ON a.b0 = b.b0 AND a.b1 = b.b1
                 AND a.c_custkey < b.c_custkey
                WHERE levenshtein(a.c_name, b.c_name) <= 2
            ), edges AS (
                SELECT id_a AS a, id_b AS b FROM pairs
                UNION
                SELECT id_b AS a, id_a AS b FROM pairs
            ), cc(node, lbl) AS (
                SELECT c_custkey, c_custkey FROM c
                UNION
                SELECT e.b, x.lbl FROM cc x JOIN edges e ON e.a = x.node
                WHERE x.lbl < e.b
            )
            SELECT node AS id, min(lbl) AS cluster_id,
                   node = min(lbl) AS is_survivor
            FROM cc GROUP BY node
        """,
        "weighted_sample": """
            SELECT o_orderkey, o_totalprice,
                   ln((CAST(CAST(('0x' || substr(
                           md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
                           AS UBIGINT) AS DOUBLE) + 1.0)
                      / 1152921504606846976.0) / o_totalprice
                       AS sample_key
            FROM orders WHERE o_totalprice > 0
            ORDER BY sample_key DESC, o_orderkey ASC
            LIMIT 100
        """,
        "topk_diversified": """
            WITH pruned AS (
                SELECT o_orderkey, o_orderpriority, o_totalprice,
                       row_number() OVER (
                           PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey ASC
                       ) AS rn
                FROM orders
            )
            SELECT o_orderkey, o_orderpriority, o_totalprice
            FROM pruned WHERE rn <= 2
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 10
        """,
        "time_in_state": """
            WITH held AS (
                SELECT event_type AS state,
                       epoch_us(lead(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id))
                       - epoch_us(ts) AS dur
                FROM events
            )
            SELECT state,
                   count(*) AS n_intervals,
                   CAST(sum(CAST(dur AS DECIMAL(38,6))) AS DOUBLE)
                       / 3600e6 AS total_hours
            FROM held WHERE dur IS NOT NULL
            GROUP BY state
        """,
        "text_collocations": """
            WITH norm AS (
                -- empty-text guard: DuckDB string_split('') yields
                -- [''] (one empty token) where Spark ws_tokens('')
                -- yields []; excluding empty docs keeps both engines
                -- on identical token totals
                SELECT string_split(
                    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                    ' ') AS t
                FROM documents
                WHERE trim(regexp_replace(lower(text),
                                          '\\s+', ' ', 'g')) <> ''
            ), uni AS (
                SELECT unnest(t) AS a FROM norm
            ), ucnt AS (
                SELECT a, count(*) AS n_a FROM uni GROUP BY a
            ), bg AS (
                SELECT unnest([t[i] || ' ' || t[i + 1]
                               FOR i IN generate_series(1,
                                   greatest(len(t) - 1, 0))]) AS bigram
                FROM norm
            ), bcnt AS (
                SELECT bigram, count(*) AS n_ab FROM bg GROUP BY bigram
            ), tot AS (
                SELECT (SELECT CAST(sum(n_a) AS BIGINT) FROM ucnt) AS tu,
                       (SELECT CAST(sum(n_ab) AS BIGINT) FROM bcnt) AS tb
            ), scored AS (
                SELECT b.bigram, b.n_ab,
                       ln((CAST(b.n_ab AS DOUBLE) / tb)
                          / ((CAST(ua.n_a AS DOUBLE) / tu)
                             * (CAST(ub.n_a AS DOUBLE) / tu))) AS pmi
                FROM bcnt b
                JOIN ucnt ua ON ua.a = string_split(b.bigram, ' ')[1]
                JOIN ucnt ub ON ub.a = string_split(b.bigram, ' ')[2]
                CROSS JOIN tot
                WHERE b.n_ab >= 5
            )
            SELECT bigram, n_ab, pmi FROM scored
            ORDER BY pmi DESC, bigram ASC LIMIT 20
        """,
        "text_bm25": """
            WITH toks AS (
                -- empty-text guard (see text_collocations): keeps dl/
                -- n_docs/avgdl identical to Spark's empty-array
                -- tokenization of empty documents
                SELECT doc_id,
                       unnest(string_split(trim(regexp_replace(
                           lower(text), '\\s+', ' ', 'g')), ' ')) AS term
                FROM documents
                WHERE trim(regexp_replace(lower(text),
                                          '\\s+', ' ', 'g')) <> ''
            ), dl AS (
                SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1
            ), corpus AS (
                SELECT count(*) AS n_docs,
                       CAST(sum(CAST(dl AS DECIMAL(30,6))) AS DOUBLE)
                           / count(*) AS avgdl
                FROM dl
            ), tf AS (
                SELECT doc_id, term, count(*) AS tf FROM toks
                WHERE term IN ('window', 'shuffle', 'vector')
                GROUP BY 1, 2
            ), dfreq AS (
                SELECT term, count(*) AS df FROM tf GROUP BY 1
            ), per_term AS (
                SELECT tf.doc_id,
                       ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
                       * (tf.tf * (1.2 + 1))
                         / (tf.tf + 1.2 * (1 - 0.75
                            + 0.75 * dl.dl / c.avgdl)) AS s
                FROM tf
                JOIN dfreq d USING (term)
                JOIN dl ON tf.doc_id = dl.doc_id
                CROSS JOIN corpus c
            )
            SELECT doc_id,
                   CAST(sum(CAST(s AS DECIMAL(38,18))) AS DOUBLE)
                       AS score,
                   count(*) AS n_terms_hit
            FROM per_term GROUP BY doc_id
            ORDER BY score DESC, doc_id ASC LIMIT 20
        """,
        "emb_confusion": """
            WITH ex AS (
                SELECT label, vec_id AS vid,
                       generate_subscripts(embedding, 1) AS pos,
                       CAST(unnest(embedding) AS DOUBLE) AS v
                FROM embeddings
            ), cent AS (
                SELECT label AS clabel, pos,
                       CAST(sum(CAST(v AS DECIMAL(38,12))) AS DOUBLE)
                           / count(*) AS c
                FROM ex GROUP BY 1, 2
            ), scored AS (
                SELECT e.label, e.vid, ct.clabel,
                       CAST(sum(CAST(e.v * ct.c AS DECIMAL(38,18)))
                            AS DOUBLE) AS dot,
                       CAST(sum(CAST(e.v * e.v AS DECIMAL(38,18)))
                            AS DOUBLE) AS nv,
                       CAST(sum(CAST(ct.c * ct.c AS DECIMAL(38,18)))
                            AS DOUBLE) AS nc
                FROM ex e JOIN cent ct USING (pos)
                GROUP BY 1, 2, 3
            ), ranked AS (
                SELECT label, vid, clabel,
                       row_number() OVER (
                           PARTITION BY vid
                           ORDER BY dot / (sqrt(nv) * sqrt(nc)) DESC,
                                    clabel ASC) AS rn
                FROM scored
            )
            SELECT label, clabel AS predicted, count(*) AS n
            FROM ranked WHERE rn = 1
            GROUP BY 1, 2
        """,
        "dedup_multikey": """
            WITH RECURSIVE ents AS (
                SELECT c_custkey AS id,
                       'e' || CAST(c_custkey % 700 AS VARCHAR) AS ek,
                       'p' || CAST(c_custkey % 900 AS VARCHAR) AS pk
                FROM customer
            ), ce AS (
                SELECT ek, min(id) AS ctr FROM ents GROUP BY ek
            ), cp AS (
                SELECT pk, min(id) AS ctr FROM ents GROUP BY pk
            ), star AS (
                SELECT ce.ctr AS a, e.id AS b
                FROM ents e JOIN ce USING (ek) WHERE e.id <> ce.ctr
                UNION
                SELECT cp.ctr AS a, e.id AS b
                FROM ents e JOIN cp USING (pk) WHERE e.id <> cp.ctr
            ), edges AS (
                SELECT a, b FROM star
                UNION
                SELECT b AS a, a AS b FROM star
            ), cc(node, lbl) AS (
                SELECT id, id FROM ents
                UNION
                SELECT e.b, c.lbl FROM cc c JOIN edges e ON e.a = c.node
                WHERE c.lbl < e.b
            ), lab AS (
                SELECT node AS id, min(lbl) AS cluster_id
                FROM cc GROUP BY node
            )
            SELECT id, cluster_id,
                   count(*) OVER (PARTITION BY cluster_id) AS cluster_size
            FROM lab
        """,
        "interval_overlap": """
            WITH c AS (
                SELECT user_id, event_id AS click_id,
                       epoch_us(ts) AS cs,
                       epoch_us(ts) + 600000000 AS ce
                FROM events WHERE event_type = 'click'
            ), p AS (
                SELECT user_id, event_id AS purchase_id,
                       epoch_us(ts) AS ps,
                       epoch_us(ts) + 600000000 AS pe
                FROM events WHERE event_type = 'purchase'
            )
            SELECT c.user_id, c.click_id, p.purchase_id,
                   least(c.ce, p.pe) - greatest(c.cs, p.ps) AS overlap
            FROM c JOIN p ON c.user_id = p.user_id
             AND c.cs < p.pe AND p.ps < c.ce
        """,
        "sample_per_class": """
            WITH ranked AS (
                SELECT source, doc_id, n_chars,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY CAST(('0x' || substr(
                                   md5(CAST(doc_id AS VARCHAR)), 1, 15))
                               AS UBIGINT) ASC,
                               doc_id ASC
                       ) AS rn
                FROM documents
            )
            SELECT source, doc_id, n_chars FROM ranked WHERE rn <= 5
        """,
        "table_checksum": """
            WITH rows_c AS (
                -- per-value COALESCE with the chr(30) sentinel mirrors
                -- the operator: DuckDB's concat_ws silently DROPS a
                -- NULL and its separator, which would desynchronize
                -- the canonical row string on nullable columns
                SELECT concat_ws(chr(31),
                           COALESCE(CAST(l_orderkey AS VARCHAR),
                                    chr(30) || 'null'),
                           COALESCE(CAST(l_linenumber AS VARCHAR),
                                    chr(30) || 'null'),
                           COALESCE(l_returnflag, chr(30) || 'null'),
                           COALESCE(CAST(l_shipdate AS VARCHAR),
                                    chr(30) || 'null')) AS row_str
                FROM lineitem
            )
            SELECT count(*) AS n_rows,
                   CAST(sum(CAST(CAST(('0x' || substr(md5(row_str), 1, 15))
                                      AS UBIGINT) AS DECIMAL(38,0)))
                        AS VARCHAR) AS checksum
            FROM rows_c
        """,
        "event_trigrams": """
            WITH s AS (
                SELECT event_type AS a,
                       lead(event_type, 1) OVER w AS b,
                       lead(event_type, 2) OVER w AS c
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), p AS (
                SELECT a || ' > ' || b || ' > ' || c AS path
                FROM s WHERE c IS NOT NULL
            )
            SELECT path, count(*) AS n_paths
            FROM p GROUP BY path
            ORDER BY n_paths DESC, path ASC
            LIMIT 20
        """,
        "sequence_conformance": """
            WITH per AS (
                SELECT user_id AS "user",
                       string_agg(event_type, '>'
                                  ORDER BY ts, event_id) AS sequence
                FROM events GROUP BY 1
            )
            SELECT "user", sequence,
                   regexp_matches(sequence,
                       '^signup(>(click|view))*>purchase') AS conforms
            FROM per
        """,
        "conversion_latency": """
            WITH f AS (
                SELECT user_id, min(ts) AS t0 FROM events
                WHERE event_type = 'signup' GROUP BY 1
            ), conv AS (
                SELECT e.user_id, min(e.ts) AS t1, any_value(f.t0) AS t0
                FROM events e JOIN f ON e.user_id = f.user_id
                WHERE e.event_type = 'purchase' AND e.ts >= f.t0
                GROUP BY e.user_id
            ), lat AS (
                SELECT epoch_us(t1) - epoch_us(t0) AS lat_us FROM conv
            )
            SELECT count(*) AS n_converted,
                   CAST(sum(CAST(lat_us AS DECIMAL(30,6))) AS DOUBLE)
                       / count(*) / 1e6 AS mean_latency_s,
                   median(lat_us) / 1e6 AS p50_latency_s,
                   quantile_cont(lat_us, 0.9) / 1e6 AS p90_latency_s
            FROM lat
        """,
        "temporal_join": """
            WITH st AS (
                SELECT user_id, event_type AS status,
                       ts AS valid_from,
                       lead(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS valid_to
                FROM events WHERE event_type IN ('signup', 'error')
            ), c AS (
                SELECT event_id, user_id, ts, value FROM events
                WHERE event_type = 'click'
            )
            SELECT st.status,
                   count(*) AS n_clicks,
                   CAST(sum(CAST(c.value AS DECIMAL(30,6))) AS DOUBLE)
                       AS sum_value
            FROM c LEFT JOIN st
              ON c.user_id = st.user_id
             AND c.ts >= st.valid_from
             AND c.ts < coalesce(st.valid_to,
                                 TIMESTAMP '9999-12-31 23:59:59.999999')
            GROUP BY st.status
        """,
        "quantile_bins": """
            WITH b AS (
                SELECT p_retailprice,
                       ntile(10) OVER (ORDER BY p_retailprice,
                                       p_partkey) AS bin
                FROM part
            )
            SELECT bin, count(*) AS n,
                   min(p_retailprice) AS min_price,
                   max(p_retailprice) AS max_price
            FROM b GROUP BY bin
        """,
        "emb_cohesion": """
            -- centroids: decimal component means (order-free); member
            -- scoring: fixed-index-order double folds via
            -- list_dot_product, matching the Spark-side
            -- zip_with/aggregate fold under the gate's 6-decimal
            -- rounding (the emb_cosine_topk discipline; ADVICE r11:
            -- DuckDB's DECIMAL(38,18)->DOUBLE cast can differ in the
            -- last ulp, masked by the rounding protocol).
            -- PRECONDITIONS (ADVICE r11): embedding elements are
            -- non-NULL and dims are homogeneous per label — the
            -- testdata embeddings satisfy both by construction
            -- (fixed-dim generator, no NULL components). On NULL
            -- elements list_dot_product ERRORS here while Spark
            -- yields a NULL cosine; see label_cohesion's docstring.
            WITH ex AS (
                SELECT label,
                       generate_subscripts(embedding, 1) AS pos,
                       CAST(unnest(embedding) AS DOUBLE) AS v
                FROM embeddings
            ), cent AS (
                SELECT label, pos,
                       CAST(sum(CAST(v AS DECIMAL(38,12))) AS DOUBLE)
                           / count(*) AS c
                FROM ex GROUP BY 1, 2
            ), carr AS (
                SELECT label, list(c ORDER BY pos) AS cv
                FROM cent GROUP BY label
            ), member AS (
                SELECT e.label,
                       list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cv)
                         / nullif(
                             sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                   CAST(e.embedding AS DOUBLE[])))
                             * sqrt(list_dot_product(c.cv, c.cv)), 0)
                           AS cos
                FROM embeddings e JOIN carr c USING (label)
                WHERE len(e.embedding) > 0
            )
            SELECT label,
                   count(*) AS n_vectors,
                   CAST(sum(CAST(cos AS DECIMAL(38,18))) AS DOUBLE)
                       / count(cos) AS cohesion
            FROM member GROUP BY label
        """,
        "salted_agg": """
            SELECT l_returnflag,
                   CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE)
                       AS sum_qty,
                   count(l_quantity) AS n_rows,
                   max(l_extendedprice) AS max_price
            FROM lineitem GROUP BY l_returnflag
        """,
        "inter_event_gap": """
            WITH g AS (
                SELECT event_type,
                       epoch_us(ts) - epoch_us(
                           lag(ts) OVER (PARTITION BY user_id, event_type
                                         ORDER BY ts, event_id)
                       ) AS gap
                FROM events
            )
            SELECT event_type,
                   count(*) AS n_gaps,
                   CAST(sum(CAST(gap AS DECIMAL(30,6))) AS DOUBLE)
                       / count(*) / 1e6 AS mean_gap_s,
                   median(gap) / 1e6 AS p50_gap_s,
                   quantile_cont(gap, 0.9) / 1e6 AS p90_gap_s
            FROM g WHERE gap IS NOT NULL
            GROUP BY event_type
        """,
        "fulfillment_lag": """
            WITH fs AS (
                SELECT l_orderkey, min(l_shipdate) AS first_ship
                FROM lineitem GROUP BY 1
            ), lagd AS (
                SELECT o.o_orderpriority,
                       date_diff('day', CAST(o.o_orderdate AS DATE),
                                 CAST(fs.first_ship AS DATE)) AS lag_days
                FROM orders o JOIN fs ON o.o_orderkey = fs.l_orderkey
            )
            SELECT o_orderpriority,
                   count(*) AS n_orders,
                   CAST(sum(CAST(lag_days AS DECIMAL(30,6))) AS DOUBLE)
                       / count(*) AS mean_lag_days,
                   median(lag_days) AS p50_lag_days,
                   quantile_cont(lag_days, 0.9) AS p90_lag_days
            FROM lagd GROUP BY 1
        """,
        "rolling_corr": """
            WITH scaled AS (
                SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
                       CAST(round(l_quantity * 100) AS BIGINT) AS xs,
                       CAST(round(l_extendedprice * 100) AS BIGINT) AS ys
                FROM lineitem
            ), s AS (
                SELECT l_partkey, l_orderkey, l_linenumber,
                       count(*) OVER w AS n,
                       sum(xs) OVER w AS sx,
                       sum(ys) OVER w AS sy,
                       sum(xs * ys) OVER w AS sxy,
                       sum(xs * xs) OVER w AS sxx,
                       sum(ys * ys) OVER w AS syy
                FROM scaled
                WINDOW w AS (PARTITION BY l_partkey
                             ORDER BY l_shipdate, l_orderkey, l_linenumber
                             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
            ), f AS (
                SELECT l_partkey, l_orderkey, l_linenumber,
                       CAST(n AS DOUBLE) AS nd,
                       CAST(sx AS DOUBLE) AS sxd,
                       CAST(sy AS DOUBLE) AS syd,
                       CAST(sxy AS DOUBLE) AS sxyd,
                       CAST(sxx AS DOUBLE) AS sxxd,
                       CAST(syy AS DOUBLE) AS syyd,
                       n
                FROM s
            ), c AS (
                SELECT l_partkey, l_orderkey, l_linenumber, n,
                       sxyd / nd - (sxd / nd) * (syd / nd) AS cov,
                       sxxd / nd - (sxd / nd) * (sxd / nd) AS varx,
                       syyd / nd - (syd / nd) * (syd / nd) AS vary
                FROM f
            )
            SELECT l_partkey, l_orderkey, l_linenumber,
                   cov / sqrt(varx * vary) AS rolling_corr
            FROM c
            WHERE n >= 20 AND varx > 0 AND vary > 0
        """,
        "order_reconciliation": """
            WITH sums AS (
                SELECT l_orderkey,
                       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                                     AS DECIMAL(30,6))) AS DOUBLE)
                           AS recomputed
                FROM lineitem GROUP BY 1
            )
            SELECT o.o_orderkey,
                   CAST(o.o_totalprice AS DOUBLE) AS recorded,
                   s.recomputed,
                   abs(s.recomputed - CAST(o.o_totalprice AS DOUBLE))
                       / abs(CAST(o.o_totalprice AS DOUBLE)) AS rel_diff,
                   CASE WHEN s.recomputed IS NULL THEN FALSE
                        ELSE abs(s.recomputed
                                 - CAST(o.o_totalprice AS DOUBLE))
                             / abs(CAST(o.o_totalprice AS DOUBLE)) <= 0.5
                   END AS within_tolerance
            FROM orders o LEFT JOIN sums s
              ON o.o_orderkey = s.l_orderkey
        """,
        "top_unshipped": """
            SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
                   CAST(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                                 AS DECIMAL(30,6))) AS DOUBLE) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
              AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
            GROUP BY 1, 2, 3
            ORDER BY revenue DESC, l.l_orderkey ASC
            LIMIT 10
        """,
        "market_share": """
            WITH j AS (
                SELECT r.r_name,
                       year(o.o_orderdate) AS o_year,
                       n.n_name,
                       CAST(l.l_extendedprice * (1.0 - l.l_discount)
                            AS DECIMAL(30,6)) AS rev
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN supplier s ON l.l_suppkey = s.s_suppkey
                JOIN nation n ON s.s_nationkey = n.n_nationkey
                JOIN region r ON n.n_regionkey = r.r_regionkey
            )
            SELECT r_name, o_year,
                   CAST(COALESCE(sum(CASE WHEN n_name = 'NATION_7'
                                          THEN rev END),
                                 0) AS DOUBLE)
                   / CAST(sum(rev) AS DOUBLE) AS mkt_share
            FROM j GROUP BY 1, 2
        """,
        "stream_distinct_users": """
            SELECT strftime(date_trunc('hour', ts),
                            '%Y-%m-%d %H:%M:%S') AS bucket_ts,
                   count(DISTINCT user_id) AS distinct_users
            FROM events GROUP BY 1
        """,
        "paragraph_dedup": """
            WITH inj AS (
                SELECT doc_id,
                       text
                       || CASE WHEN doc_id % 3 = 0
                          THEN '. Subscribe to our newsletter today'
                          ELSE '' END
                       || CASE WHEN doc_id % 4 = 0
                          THEN '. All rights reserved'
                          ELSE '' END AS text
                FROM documents
            ), p AS (
                SELECT doc_id,
                       unnest(string_split(text, '. ')) AS para,
                       generate_subscripts(string_split(text, '. '), 1)
                           AS pos
                FROM inj
            ), f AS (
                SELECT para, count(DISTINCT doc_id) AS docs
                FROM p GROUP BY 1
            ), k AS (
                SELECT p.doc_id, p.pos, p.para
                FROM p JOIN f USING (para) WHERE f.docs < 2
            ), r AS (
                SELECT doc_id, count(*) AS n_kept,
                       string_agg(para, '. ' ORDER BY pos) AS clean
                FROM k GROUP BY 1
            ), t AS (
                -- spine = INPUT frame, not the exploded one:
                -- unnest(string_split(NULL)) emits zero rows, so a
                -- NULL-text document would otherwise vanish while the
                -- operator keeps it as (0, 0, md5('')) — ADVICE r6
                SELECT i.doc_id, COALESCE(pc.n_paras, 0) AS n_paras
                FROM inj i LEFT JOIN (
                    SELECT doc_id, count(*) AS n_paras FROM p GROUP BY 1
                ) pc USING (doc_id)
            )
            SELECT t.doc_id, t.n_paras,
                   COALESCE(r.n_kept, 0) AS n_kept,
                   md5(COALESCE(r.clean, '')) AS clean_md5
            FROM t LEFT JOIN r USING (doc_id)
        """,
        "attribution_last_touch": """
            WITH c AS (
                SELECT event_id, event_type, value,
                       last_value(
                           CASE WHEN event_type = 'click'
                                THEN CAST(json_extract_string(props, '$.k')
                                          AS INT) % 10 END
                           IGNORE NULLS
                       ) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS campaign
                FROM events
            )
            SELECT campaign,
                   count(*) AS n_purchases,
                   CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
                       AS attributed_value
            FROM c WHERE event_type = 'purchase'
            GROUP BY campaign
        """,
        "rfm_segments": """
            WITH per AS (
                SELECT o_custkey AS customer,
                       max(o_orderdate) AS last_ts,
                       count(*) AS frequency,
                       sum(CAST(o_totalprice AS DECIMAL(30,6))) AS m
                FROM orders GROUP BY 1
            ), ref AS (
                SELECT max(o_orderdate) AS ref_ts FROM orders
            ), scored AS (
                SELECT customer,
                       date_diff('day', CAST(last_ts AS DATE),
                                 CAST(ref_ts AS DATE)) AS recency_days,
                       frequency,
                       CAST(m AS DOUBLE) AS monetary
                FROM per CROSS JOIN ref
            ), tiles AS (
                SELECT customer, recency_days, frequency, monetary,
                       ntile(4) OVER (ORDER BY recency_days DESC,
                                      customer) AS r_score,
                       ntile(4) OVER (ORDER BY frequency ASC,
                                      customer) AS f_score,
                       ntile(4) OVER (ORDER BY monetary ASC,
                                      customer) AS m_score
                FROM scored
            )
            SELECT customer, recency_days, frequency, monetary,
                   r_score, f_score, m_score,
                   CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
                       || CAST(m_score AS VARCHAR) AS segment
            FROM tiles
        """,
        "gini_revenue": """
            WITH totals AS (
                SELECT c.c_nationkey, o.o_custkey,
                       sum(CAST(o.o_totalprice AS DECIMAL(30,6))) AS x
                FROM orders o JOIN customer c
                  ON o.o_custkey = c.c_custkey
                GROUP BY 1, 2
            ), ranked AS (
                SELECT c_nationkey, x,
                       row_number() OVER (PARTITION BY c_nationkey
                                          ORDER BY x) AS i
                FROM totals
            )
            SELECT c_nationkey,
                   2.0 * CAST(sum(CAST(i * x AS DECIMAL(38,6))) AS DOUBLE)
                       / (CAST(count(*) AS DOUBLE)
                          * CAST(sum(x) AS DOUBLE))
                   - CAST(count(*) + 1 AS DOUBLE)
                     / CAST(count(*) AS DOUBLE) AS gini,
                   count(*) AS n_units,
                   CAST(sum(x) AS DOUBLE) AS total
            FROM ranked GROUP BY c_nationkey
        """,
        "hhi_brands": """
            WITH totals AS (
                SELECT p.p_brand, l.l_suppkey,
                       sum(CAST(l.l_extendedprice AS DECIMAL(30,6))) AS x
                FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
                GROUP BY 1, 2
            ), shares AS (
                SELECT p_brand,
                       CAST(x AS DOUBLE)
                       / CAST(sum(x) OVER (PARTITION BY p_brand)
                              AS DOUBLE) AS s
                FROM totals
            )
            SELECT p_brand, sum(s * s) AS hhi, count(*) AS n_units
            FROM shares GROUP BY p_brand
        """,
        "heavy_keys": """
            WITH counts AS (
                SELECT l_partkey, count(*) AS n
                FROM lineitem GROUP BY 1
            ), tot AS (
                SELECT sum(n) AS t FROM counts
            ), top AS (
                SELECT l_partkey, n FROM counts
                ORDER BY n DESC, l_partkey ASC LIMIT 20
            )
            SELECT l_partkey,
                   row_number() OVER (ORDER BY n DESC, l_partkey ASC)
                       AS rank,
                   n,
                   CAST(n AS DOUBLE) / CAST(t AS DOUBLE) AS share,
                   CAST(sum(n) OVER (ORDER BY n DESC, l_partkey ASC
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND CURRENT ROW) AS DOUBLE)
                       / CAST(t AS DOUBLE) AS cum_share
            FROM top CROSS JOIN tot
        """,
        "dow_seasonality": """
            WITH agg AS (
                SELECT dayofweek(ts) + 1 AS dow,
                       count(*) AS n,
                       sum(CAST(value AS DECIMAL(30,6))) AS v
                FROM events GROUP BY 1
            )
            SELECT dow, n,
                   CAST(v AS DOUBLE) / CAST(n AS DOUBLE) AS mean_value,
                   (CAST(v AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(sum(v) OVER () AS DOUBLE)
                      / CAST(sum(n) OVER () AS DOUBLE)) AS seasonal_index
            FROM agg
        """,
        "ols_regression": """
            WITH m AS (
                SELECT l_returnflag,
                       count(*) AS n,
                       sum(CAST(l_quantity AS DECIMAL(18,6))) AS sx,
                       sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS sy,
                       -- one operand at DECIMAL(19,6): forces DuckDB's
                       -- int128 multiply path (pure 18,6 x 18,6 runs in
                       -- int64 and overflows); values identical to
                       -- Spark's (18,6)x(18,6) -> (37,12) exact product
                       sum(CAST(CAST(l_quantity AS DECIMAL(19,6))
                                * CAST(l_extendedprice AS DECIMAL(18,6))
                                AS DECIMAL(38,12))) AS sxy,
                       sum(CAST(CAST(l_quantity AS DECIMAL(19,6))
                                * CAST(l_quantity AS DECIMAL(18,6))
                                AS DECIMAL(38,12))) AS sxx,
                       sum(CAST(CAST(l_extendedprice AS DECIMAL(19,6))
                                * CAST(l_extendedprice AS DECIMAL(18,6))
                                AS DECIMAL(38,12))) AS syy
                FROM lineitem
                WHERE l_quantity IS NOT NULL
                  AND l_extendedprice IS NOT NULL
                GROUP BY l_returnflag
            ), d AS (
                SELECT l_returnflag, n,
                       CAST(n AS DOUBLE) AS nd,
                       CAST(sx AS DOUBLE) AS sxd,
                       CAST(sy AS DOUBLE) AS syd,
                       CAST(sxy AS DOUBLE) AS sxyd,
                       CAST(sxx AS DOUBLE) AS sxxd,
                       CAST(syy AS DOUBLE) AS syyd
                FROM m
            ), f AS (
                SELECT l_returnflag, n, nd, sxd, syd,
                       sxyd / nd - (sxd / nd) * (syd / nd) AS cov,
                       sxxd / nd - (sxd / nd) * (sxd / nd) AS varx,
                       syyd / nd - (syd / nd) * (syd / nd) AS vary
                FROM d
            )
            SELECT l_returnflag, n,
                   CASE WHEN varx > 0 THEN cov / varx END AS slope,
                   syd / nd - (CASE WHEN varx > 0 THEN cov / varx END)
                       * (sxd / nd) AS intercept,
                   CASE WHEN varx > 0 AND vary > 0
                        THEN (cov * cov) / (varx * vary) END AS r2
            FROM f
        """,
        "chi_square": """
            WITH cells AS (
                SELECT o_orderstatus AS a, o_orderpriority AS b,
                       count(*) AS o
                FROM orders
                WHERE o_orderstatus IS NOT NULL
                  AND o_orderpriority IS NOT NULL
                GROUP BY 1, 2
            ), m AS (
                SELECT a, b, o,
                       sum(o) OVER (PARTITION BY a) AS ra,
                       sum(o) OVER (PARTITION BY b) AS rb,
                       sum(o) OVER () AS tot
                FROM cells
            )
            SELECT sum(
                       pow(CAST(o AS DOUBLE)
                           - CAST(ra AS DOUBLE) * CAST(rb AS DOUBLE)
                             / CAST(tot AS DOUBLE), 2)
                       / (CAST(ra AS DOUBLE) * CAST(rb AS DOUBLE)
                          / CAST(tot AS DOUBLE))
                   ) AS chi2,
                   (count(DISTINCT a) - 1) * (count(DISTINCT b) - 1) AS dof,
                   CAST(sum(o) AS BIGINT) AS n
            FROM m
        """,
        "mad_outliers": """
            WITH med AS (
                SELECT event_type, median(value) AS med
                FROM events GROUP BY 1
            ), mads AS (
                SELECT e.event_type,
                       median(abs(e.value - m.med)) AS mad,
                       any_value(m.med) AS med
                FROM events e JOIN med m USING (event_type)
                GROUP BY e.event_type
            )
            SELECT e.event_id, e.event_type, e.value,
                   CASE WHEN m.mad > 0
                        THEN abs(e.value - m.med) / (1.4826 * m.mad)
                   END AS mad_score
            FROM events e JOIN mads m USING (event_type)
            WHERE CASE WHEN m.mad > 0
                       THEN abs(e.value - m.med) / (1.4826 * m.mad) > 3.0
                       ELSE e.value <> m.med END
        """,
        "revenue_mom_growth": """
            WITH agg AS (
                SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                           AS period,
                       sum(CAST(o_totalprice AS DECIMAL(30,6))) AS v
                FROM orders GROUP BY 1
            ), w AS (
                SELECT period,
                       CAST(v AS DOUBLE) AS value,
                       CAST(lag(v) OVER (ORDER BY period) AS DOUBLE)
                           AS prev_value
                FROM agg
            )
            SELECT period, value, prev_value,
                   value - prev_value AS abs_change,
                   (value - prev_value) / prev_value AS pct_change
            FROM w
        """,
        "pii_redact": """
            WITH inj AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 5 = 0
                            THEN text || ' Contact u' || CAST(doc_id AS VARCHAR)
                                 || '@example.com or call 555-123-4567.'
                            ELSE text END AS text
                FROM documents
            )
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                       AS n_emails,
                   len(regexp_extract_all(text,
                       '\\+?[0-9][0-9()\\s.-]{7,}[0-9]')) AS n_phones,
                   md5(regexp_replace(
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                           '[REDACTED]', 'g'),
                       '\\+?[0-9][0-9()\\s.-]{7,}[0-9]',
                       '[REDACTED]', 'g')) AS clean_md5
            FROM inj
        """,
        "graph_triangles": """
            WITH ps AS (
                SELECT DISTINCT l_orderkey, l_suppkey
                FROM lineitem WHERE l_quantity >= 48
            ), e AS (
                SELECT DISTINCT a.l_suppkey AS a, b.l_suppkey AS b
                FROM ps a JOIN ps b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_suppkey < b.l_suppkey
            ), tri AS (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM e e1
                JOIN e e2 ON e2.a = e1.b
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
            ), nodes AS (
                SELECT a AS node FROM e
                UNION SELECT b FROM e
            ), per AS (
                SELECT node, count(*) AS t FROM (
                    SELECT x AS node FROM tri
                    UNION ALL SELECT y FROM tri
                    UNION ALL SELECT z FROM tri
                ) GROUP BY node
            )
            SELECT n.node, COALESCE(p.t, 0) AS triangles
            FROM nodes n LEFT JOIN per p USING (node)
        """,
        "graph_bfs": """
            WITH ps AS (
                SELECT DISTINCT l_orderkey, l_suppkey
                FROM lineitem WHERE l_quantity >= 48
            ), eu AS (
                SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
                FROM ps a JOIN ps b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_suppkey <> b.l_suppkey
            ), d0 AS (
                SELECT s_suppkey AS node FROM supplier WHERE s_suppkey <= 3
            ), d1 AS (
                SELECT DISTINCT eu.v AS node
                FROM eu JOIN d0 ON eu.u = d0.node
                WHERE eu.v NOT IN (SELECT node FROM d0)
            ), d2 AS (
                SELECT DISTINCT eu.v AS node
                FROM eu JOIN d1 ON eu.u = d1.node
                WHERE eu.v NOT IN (SELECT node FROM d0)
                  AND eu.v NOT IN (SELECT node FROM d1)
            ), d3 AS (
                SELECT DISTINCT eu.v AS node
                FROM eu JOIN d2 ON eu.u = d2.node
                WHERE eu.v NOT IN (SELECT node FROM d0)
                  AND eu.v NOT IN (SELECT node FROM d1)
                  AND eu.v NOT IN (SELECT node FROM d2)
            )
            SELECT node, 0 AS depth FROM d0
            UNION ALL SELECT node, 1 FROM d1
            UNION ALL SELECT node, 2 FROM d2
            UNION ALL SELECT node, 3 FROM d3
        """,
        "funnel_conversion": """
            WITH s0 AS (
                SELECT user_id, min(ts) AS t0 FROM events
                WHERE event_type = 'signup' GROUP BY user_id
            ), s1 AS (
                SELECT e.user_id, min(e.ts) AS t1
                FROM events e JOIN s0 ON e.user_id = s0.user_id
                WHERE e.event_type = 'click' AND e.ts >= s0.t0
                GROUP BY e.user_id
            ), s2 AS (
                SELECT e.user_id, min(e.ts) AS t2
                FROM events e JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'purchase' AND e.ts >= s1.t1
                GROUP BY e.user_id
            )
            SELECT 0 AS step_index, 'signup' AS step_name,
                   (SELECT count(*) FROM s0) AS users
            UNION ALL
            SELECT 1, 'click', (SELECT count(*) FROM s1)
            UNION ALL
            SELECT 2, 'purchase', (SELECT count(*) FROM s2)
        """,
        "cohort_retention": """
            WITH act AS (
                SELECT DISTINCT user_id AS u,
                       date_trunc('week', ts) AS p
                FROM events
            ), first AS (
                SELECT u, min(p) AS cohort FROM act GROUP BY u
            )
            SELECT CAST(first.cohort AS DATE) AS cohort,
                   CAST(date_diff('day', first.cohort, act.p) / 7 AS INT)
                       AS period_offset,
                   count(DISTINCT act.u) AS active_users
            FROM act JOIN first ON act.u = first.u
            GROUP BY 1, 2
        """,
        "time_weighted_avg": """
            WITH d AS (
                SELECT user_id, value,
                       lead(epoch_us(ts)) OVER w - epoch_us(ts) AS dur
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id,
                   COALESCE(
                       CAST(sum(CAST(value * dur AS DECIMAL(30,6)))
                            AS DOUBLE)
                       / CAST(NULLIF(sum(dur), 0) AS DOUBLE),
                       CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
                       / count(value)
                   ) AS twap,
                   count(*) AS n_obs
            FROM d GROUP BY user_id
        """,
        "linear_interpolate": """
            WITH base AS (
                SELECT event_id, user_id, ts,
                       CASE WHEN event_type <> 'error' THEN value END AS v
                FROM events
            ), w AS (
                SELECT event_id, user_id, ts, v,
                       last_value(v IGNORE NULLS) OVER wp AS pv,
                       first_value(v IGNORE NULLS) OVER wn AS nv,
                       last_value(CASE WHEN v IS NOT NULL
                                       THEN epoch_us(ts) END IGNORE NULLS)
                           OVER wp AS pt,
                       first_value(CASE WHEN v IS NOT NULL
                                        THEN epoch_us(ts) END IGNORE NULLS)
                           OVER wn AS nt
                FROM base
                WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW),
                       wn AS (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN CURRENT ROW
                                       AND UNBOUNDED FOLLOWING)
            )
            SELECT event_id, user_id,
                   CASE WHEN v IS NOT NULL THEN v
                        ELSE COALESCE(
                            pv + (nv - pv)
                                 * (CAST(epoch_us(ts) - pt AS DOUBLE)
                                    / NULLIF(CAST(nt - pt AS DOUBLE), 0.0)),
                            pv, nv)
                   END AS value_filled
            FROM w
        """,
        "rolling_median": """
            SELECT event_id, user_id,
                   quantile_cont(value, 0.5) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
                   ) AS rolling_median
            FROM events
        """,
        "histogram_prices": """
            WITH counts AS (
                SELECT CAST(least(greatest(
                           floor(o_totalprice / 25000.0), 0), 19) AS INT)
                           AS bucket,
                       count(*) AS n
                FROM orders WHERE o_totalprice IS NOT NULL
                GROUP BY 1
            ), spine AS (
                SELECT CAST(g AS INT) AS bucket
                FROM generate_series(0, 19) s(g)
            )
            SELECT spine.bucket,
                   CAST(0.0 AS DOUBLE) + spine.bucket * CAST(25000.0 AS DOUBLE)
                       AS bucket_lo,
                   CAST(0.0 AS DOUBLE) + (spine.bucket + 1) * CAST(25000.0 AS DOUBLE)
                       AS bucket_hi,
                   COALESCE(counts.n, 0) AS n
            FROM spine LEFT JOIN counts ON spine.bucket = counts.bucket
        """,
        "skyline_pareto": """
            WITH pairs AS (
                SELECT DISTINCT l_extendedprice, l_quantity FROM lineitem
            ), runm AS (
                SELECT l_extendedprice, l_quantity,
                       max(l_quantity) OVER (
                           ORDER BY l_extendedprice ASC, l_quantity DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING
                       ) AS m
                FROM pairs
            )
            SELECT l_extendedprice, l_quantity
            FROM runm WHERE m IS NULL OR l_quantity > m
        """,
        "max_drawdown": """
            WITH s AS (
                SELECT user_id, event_id, ts, value,
                       max(value) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS peak
                FROM events WHERE value > 0
            ), d AS (
                SELECT user_id, peak, value,
                       1.0 - value / peak AS dd,
                       row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY 1.0 - value / peak DESC, ts, event_id
                       ) AS rn
                FROM s
            )
            SELECT user_id, dd AS max_drawdown, peak AS peak_value,
                   value AS trough_value
            FROM d WHERE rn = 1
        """,
        "anomaly_zscore": """
            WITH w AS (
                SELECT event_id, user_id, value,
                       avg(value) OVER win AS mu,
                       stddev_samp(value) OVER win AS sd
                FROM events
                WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
            )
            SELECT event_id, user_id, (value - mu) / sd AS zscore
            FROM w WHERE sd > 0 AND abs((value - mu) / sd) > 2.5
        """,
        "vwap_bucketed": """
            SELECT l_partkey,
                   COALESCE(
                       CAST(sum(CAST(l_extendedprice * l_quantity
                                     AS DECIMAL(30,6))) AS DOUBLE)
                       / NULLIF(CAST(sum(CAST(l_quantity AS DECIMAL(30,6)))
                                     AS DOUBLE), 0.0),
                       CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6)))
                            AS DOUBLE) / count(l_extendedprice)
                   ) AS vwap,
                   CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE)
                       AS total_volume,
                   count(*) AS n_obs
            FROM lineitem GROUP BY l_partkey
        """,
        "graph_pagerank": _pagerank_oracle(),
        "activity_streaks": """
            WITH days AS (
                SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
            ), g AS (
                SELECT user_id, d,
                       d - CAST(row_number() OVER (
                           PARTITION BY user_id ORDER BY d) AS INT) AS grp
                FROM days
            ), s AS (
                SELECT user_id, grp, count(*) AS len
                FROM g GROUP BY 1, 2
            )
            SELECT user_id,
                   max(len) AS longest_streak,
                   CAST(sum(len) AS BIGINT) AS active_days,
                   count(*) AS n_streaks
            FROM s GROUP BY user_id
        """,
        "contribution_margin": """
            WITH agg AS (
                SELECT o_orderstatus, o_orderpriority,
                       sum(CAST(o_totalprice AS DECIMAL(30,6))) AS v
                FROM orders GROUP BY 1, 2
            )
            SELECT o_orderstatus, o_orderpriority,
                   CAST(v AS DOUBLE) AS group_value,
                   CAST(v AS DOUBLE) / CAST(sum(v) OVER () AS DOUBLE)
                       AS pct_of_total,
                   CAST(v AS DOUBLE)
                   / CAST(sum(v) OVER (PARTITION BY o_orderstatus)
                          AS DOUBLE) AS pct_of_parent
            FROM agg
        """,
        "weighted_median": """
            WITH vals AS (
                SELECT l_returnflag, l_extendedprice,
                       sum(CAST(l_quantity AS DECIMAL(30,6))) AS w
                FROM lineitem GROUP BY 1, 2
            ), r AS (
                SELECT l_returnflag, l_extendedprice,
                       sum(w) OVER (PARTITION BY l_returnflag
                                    ORDER BY l_extendedprice
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS cum,
                       sum(w) OVER (PARTITION BY l_returnflag) AS tot
                FROM vals
            ), h AS (
                SELECT l_returnflag, l_extendedprice,
                       row_number() OVER (PARTITION BY l_returnflag
                                          ORDER BY l_extendedprice) AS rn
                FROM r WHERE cum * 2 >= tot
            )
            SELECT l_returnflag, l_extendedprice AS weighted_median
            FROM h WHERE rn = 1
        """,
        "dedup_survivor": """
            WITH base AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 100000,
                       text || ' duplicated tail padding'
                FROM documents
            ), c AS (
                SELECT doc_id, text,
                       md5(substr(trim(regexp_replace(lower(text),
                                                      '\\s+', ' ', 'g')),
                                  1, 40)) AS fp
                FROM base
            ), r AS (
                SELECT doc_id, fp,
                       row_number() OVER (
                           PARTITION BY fp
                           ORDER BY length(text) DESC, doc_id ASC) AS rn,
                       count(*) OVER (PARTITION BY fp) AS cluster_size
                FROM c
            )
            SELECT doc_id, fp, cluster_size FROM r WHERE rn = 1
        """,
        "stream_anomaly": """
            WITH w AS (
                SELECT event_id, user_id, value,
                       avg(value) OVER win AS mu,
                       stddev_samp(value) OVER win AS sd
                FROM events
                WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
            )
            SELECT event_id, user_id, (value - mu) / sd AS zscore
            FROM w
            WHERE sd > 0 AND abs((value - mu) / sd) > 2.5
        """,
        "event_transitions": """
            WITH p AS (
                SELECT event_type AS from_type,
                       lead(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS to_type
                FROM events
            ), c AS (
                SELECT from_type, to_type, count(*) AS n
                FROM p WHERE to_type IS NOT NULL
                GROUP BY 1, 2
            )
            SELECT from_type, to_type, n,
                   CAST(n AS DOUBLE)
                   / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE)
                       AS prob
            FROM c
        """,
        "referential_check": """
            SELECT 'orders_customer' AS relation,
                   count(*) AS total_rows,
                   CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS null_keys,
                   CAST(sum(CASE WHEN o_custkey IS NOT NULL
                                 AND c.c_custkey IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS orphans
            FROM orders LEFT JOIN (
                SELECT DISTINCT c_custkey FROM customer
            ) c ON o_custkey = c.c_custkey
            UNION ALL
            SELECT 'lineitem_part', count(*),
                   CAST(sum(CASE WHEN l_partkey IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(sum(CASE WHEN l_partkey IS NOT NULL
                                 AND p.p_partkey IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT)
            FROM lineitem LEFT JOIN (
                SELECT DISTINCT p_partkey FROM part
            ) p ON l_partkey = p.p_partkey
            UNION ALL
            SELECT 'lineitem_supplier', count(*),
                   CAST(sum(CASE WHEN l_suppkey IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(sum(CASE WHEN l_suppkey IS NOT NULL
                                 AND s.s_suppkey IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT)
            FROM lineitem LEFT JOIN (
                SELECT DISTINCT s_suppkey FROM supplier
            ) s ON l_suppkey = s.s_suppkey
        """,
        "stratified_sample": """
            WITH b AS (
                SELECT o_orderkey, o_orderpriority, o_totalprice,
                       CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                            1, 15))::UBIGINT
                            % 10000 AS BIGINT) AS bucket
                FROM orders
            )
            SELECT o_orderkey, o_orderpriority, o_totalprice
            FROM b
            WHERE bucket < CASE o_orderpriority
                               WHEN '1-URGENT' THEN 5000
                               WHEN '2-HIGH' THEN 2500
                               WHEN '3-MEDIUM' THEN 1000
                               ELSE 500 END
        """,
        "emb_neardup_lsh": _lsh_neardup_oracle(),
        "emb_topk_lsh": _lsh_topk_oracle(),
        "media_pixel_stats": """
            -- SQL twin of the deterministic decode stub: UTF-8 payload
            -- bytes tiled cyclically to an 8x8x3 buffer. Valid while the
            -- corpus is ASCII (true for the driver testdata), where
            -- ord(char) == payload byte.
            WITH d AS (
                SELECT doc_id AS media_id, text,
                       CAST(length(text) AS INT) AS L
                FROM documents WHERE doc_id < 200
            ), px AS (
                SELECT media_id,
                       CASE WHEN L = 0
                            THEN [0 FOR i IN generate_series(0, 191)]
                            ELSE [ord(substr(text, CAST(i % L AS INT) + 1, 1))
                                  FOR i IN generate_series(0, 191)]
                       END AS p
                FROM d
            )
            SELECT media_id,
                   list_avg(p) AS mean_intensity,
                   sqrt(list_avg([CAST(x AS DOUBLE) * x FOR x IN p])
                        - list_avg(p) * list_avg(p)) AS std_intensity
            FROM px
        """,
        "scan_filter_project": """
            SELECT l_orderkey, l_linenumber,
                   l_extendedprice * (1 - l_discount) AS net_price
            FROM lineitem
            WHERE l_discount > 0.05 AND l_quantity >= 30
        """,
        "derive_date_parts": """
            SELECT o_orderkey,
                   CAST(year(o_orderdate) AS INT) AS o_year,
                   CAST(month(o_orderdate) AS INT) AS o_month,
                   strftime(o_orderdate, '%Y-%m-%d') AS o_date_str,
                   CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
                       AS days_since_epoch_start,
                   o_totalprice / 30.5 AS price_per_month
            FROM orders
        """,
        "dim_join_left": """
            SELECT o_orderkey, o_custkey AS c_custkey, c_name, c_mktsegment,
                   o_totalprice
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        """,
        "quality_offenders": """
            SELECT DISTINCT event_type, user_id
            FROM events WHERE value >= 400.0
        """,
        "distinct_flags": """
            SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        """,
        "pricing_summary": """
            -- sums rounded to cents on the EXACT decimal before the
            -- double cast: scale-stable vs Spark at any sf (r9 #3)
            SELECT l_returnflag, l_linestatus,
                   CAST(round(sum(CAST(l_quantity AS DECIMAL(20,6))), 2) AS DOUBLE) AS sum_qty,
                   CAST(round(sum(CAST(l_extendedprice AS DECIMAL(20,6))), 2) AS DOUBLE) AS sum_base_price,
                   CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))), 2) AS DOUBLE) AS sum_disc_price,
                   CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(20,6))), 2) AS DOUBLE) AS sum_charge,
                   CAST(round(sum(CAST(l_quantity AS DECIMAL(20,6))), 2) AS DOUBLE) / count(*) AS avg_qty,
                   CAST(round(sum(CAST(l_extendedprice AS DECIMAL(20,6))), 2) AS DOUBLE) / count(*) AS avg_price,
                   CAST(round(sum(CAST(l_discount AS DECIMAL(20,6))), 2) AS DOUBLE) / count(*) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2001-06-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "agg_priority_stats": """
            SELECT o_orderpriority,
                   count(o_orderkey) AS n_orders,
                   count(DISTINCT o_custkey) AS n_customers,
                   median(o_totalprice) AS median_price,
                   max(o_totalprice) AS max_price,
                   min(o_totalprice) AS min_price
            FROM orders GROUP BY o_orderpriority
        """,
        "rollup_flag_status": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty,
                   count(l_orderkey) AS n
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "cube_status_priority": """
            SELECT o_orderstatus, o_orderpriority,
                   count(o_orderkey) AS n,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) AS sum_price
            FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "grouping_sets": """
            SELECT o_orderstatus, o_orderpriority,
                   count(o_orderkey) AS n, max(o_totalprice) AS max_price
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """,
        "decimal_money_agg": """
            -- sums rounded to cents on the exact decimal BEFORE the
            -- double cast (scale-stable _dsum2 discipline; r10 sf1
            -- sweep: sum_disc_price's int128 sum double-rounded on the
            -- HUGEINT path); avg = the same rounded sum / count(*) so
            -- both engines perform one identical IEEE division
            SELECT l_returnflag,
                   CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_price,
                   CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                       * CAST(1 - l_discount AS DECIMAL(5,4))), 2) AS DOUBLE) AS sum_disc_price,
                   CAST(max(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS max_price,
                   CAST(min(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS min_price,
                   CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                       / count(*) AS avg_price
            FROM lineitem
            GROUP BY l_returnflag
        """,
        "pivot_segments": """
            SELECT n_name,
                   count(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 END) AS "AUTOMOBILE",
                   count(CASE WHEN c_mktsegment = 'BUILDING'   THEN 1 END) AS "BUILDING",
                   count(CASE WHEN c_mktsegment = 'FURNITURE'  THEN 1 END) AS "FURNITURE",
                   count(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN 1 END) AS "HOUSEHOLD",
                   count(CASE WHEN c_mktsegment = 'MACHINERY'  THEN 1 END) AS "MACHINERY"
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "join_semi": """
            SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "join_anti": """
            SELECT p_partkey, p_name FROM part
            WHERE NOT EXISTS (SELECT 1 FROM lineitem
                              WHERE l_partkey = p_partkey AND l_quantity > 45)
        """,
        "join_two_key": """
            WITH stats AS (
                SELECT l_partkey AS s_partkey, l_returnflag AS s_flag,
                       CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS part_flag_qty
                FROM lineitem GROUP BY 1, 2
            )
            SELECT l_orderkey, l_linenumber, l_partkey, l_returnflag, part_flag_qty
            FROM lineitem JOIN stats
              ON l_partkey = s_partkey AND l_returnflag = s_flag
        """,
        "top_revenue_orders": """
            SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY l_orderkey, o_date
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "region_revenue": """
            SELECT r_name, n_name,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        """,
        "join_range": """
            WITH bands(band, lo, hi) AS (
                VALUES ('low', 0.0, 10.0), ('mid', 10.0, 25.0), ('high', 25.0, 60.0)
            )
            SELECT band, count(*) AS n,
                   CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS qty
            FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
            GROUP BY band
        """,
        "join_asof": """
            SELECT c.event_id, c.user_id, p.value AS last_purchase_value
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
              ON c.user_id = p.user_id AND p.ts <= c.ts
        """,
        # H = log2(n) - sum(c*log2(c))/n over per-doc token counts;
        # same normalization as the repetition oracle
        "text_entropy": """
            WITH norm AS (
                SELECT doc_id,
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                FROM documents
            ), words AS (
                SELECT doc_id, string_split(t, ' ') AS w
                FROM norm WHERE t <> ''
            ), tc AS (
                SELECT doc_id, tk, count(*) AS c
                FROM (SELECT doc_id, unnest(w) AS tk FROM words)
                GROUP BY doc_id, tk
            ), st AS (
                SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                       sum(c * log2(c)) AS clog
                FROM tc GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(st.n_tokens, 0) AS n_tokens,
                   log2(st.n_tokens) - st.clog / st.n_tokens AS entropy_bits
            FROM documents d LEFT JOIN st ON d.doc_id = st.doc_id
        """,
        "join_asof_forward": """
            SELECT c.event_id, c.user_id, p.value AS next_purchase_value
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
              ON c.user_id = p.user_id AND p.ts >= c.ts
        """,
        "lag_returns": """
            SELECT user_id, event_id,
                   value / nullif(lag(value, 1) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id), 0) - 1.0 AS ret
            FROM events
        """,
        "rolling_stats": """
            SELECT user_id, event_id,
                   avg(value) OVER w AS roll_avg,
                   stddev_samp(value) OVER w AS roll_std
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        """,
        "impute_group_mean": """
            WITH holed AS (
                SELECT o_orderkey, o_orderpriority,
                       CASE WHEN o_orderkey % 7 = 0 THEN NULL
                            ELSE o_totalprice END AS price_holed
                FROM orders
            ), means AS (
                -- exact decimal total / count, like the operator (r13:
                -- double-accumulated avg is partition-order-dependent
                -- in its ulps and diverged at sf100 magnitudes)
                SELECT o_orderpriority,
                       CASE WHEN count(price_holed) > 0 THEN
                           CAST(sum(CAST(price_holed AS DECIMAL(30,6)))
                                AS DOUBLE) / count(price_holed)
                       END AS m
                FROM holed GROUP BY 1
            )
            SELECT o_orderkey, h.o_orderpriority, price_holed,
                   coalesce(price_holed, m) AS price_filled
            FROM holed h JOIN means USING (o_orderpriority)
        """,
        "iqr_outliers": """
            WITH b AS (
                SELECT o_orderpriority,
                       quantile_cont(o_totalprice, 0.25) AS q1,
                       quantile_cont(o_totalprice, 0.75) AS q3
                FROM orders GROUP BY 1
            )
            SELECT o_orderkey, o.o_orderpriority, o_totalprice
            FROM orders o JOIN b USING (o_orderpriority)
            WHERE o_totalprice < q1 - 0.5 * (q3 - q1)
               OR o_totalprice > q3 + 0.5 * (q3 - q1)
        """,
        "vector_normalize": """
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id < 100
            ), n AS (
                SELECT vec_id, v,
                       sqrt(list_sum([x * x FOR x IN v])) AS nrm
                FROM e
            )
            SELECT vec_id,
                   CAST(unnest(range(len(v))) AS INTEGER) AS pos,
                   unnest([CASE WHEN nrm = 0 OR nrm IS NULL THEN 0.0
                                ELSE x / nrm END FOR x IN v]) AS comp,
                   nrm AS norm
            FROM n
        """,
        "date_parts_functions": """
            SELECT o_orderkey,
                   CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
                   CAST(year(o_orderdate) AS INTEGER) AS yr,
                   CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
                   CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
                   CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_quarter,
                   last_day(o_orderdate) AS month_end,
                   CAST(date_diff('day', o_orderdate, DATE '1998-12-31') AS INTEGER) AS days_to_eoy
            FROM orders WHERE o_orderkey < 2000
        """,
        "text_cleanup": """
            WITH m AS (
                SELECT doc_id,
                       '<p>' || text || '</p> <a href="https://ex'
                       || CAST(doc_id AS VARCHAR)
                       || '.example.com/d">link</a> contact: user'
                       || '@example.com or +1 415-555-0100 &amp; more' AS t
                FROM documents WHERE doc_id < 100
            ), stripped AS (
                SELECT doc_id, t,
                       trim(regexp_replace(
                           replace(replace(replace(replace(replace(replace(
                               regexp_replace(t, '<[^>]+>', ' ', 'g'),
                               '&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'),
                               '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
                           '\\s+', ' ', 'g')) AS s
                FROM m
            )
            SELECT doc_id,
                   regexp_replace(
                       regexp_replace(s,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                           '[REDACTED]', 'g'),
                       '\\+?[0-9][0-9()\\s.-]{7,}[0-9]',
                       '[REDACTED]', 'g') AS clean,
                   CAST(len(regexp_extract_all(t, 'https?://[^\\s<>"'')\\]]+')) AS BIGINT) AS n_urls,
                   array_to_string([lower(regexp_extract(u, 'https?://([^/:?#]+)', 1))
                    FOR u IN regexp_extract_all(t, 'https?://[^\\s<>"'')\\]]+')], ',') AS domains
            FROM stripped
        """,
        # Sliding windows from first principles: with a 1h window and
        # 30min slide each event belongs to exactly 2 epoch-aligned
        # windows — starts floor(t/1800)*1800 and that minus 1800.
        "stream_sliding_window": """
            WITH e AS (
                SELECT event_type, value,
                       CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 AS s1
                FROM events
            ), exploded AS (
                SELECT event_type, value,
                       unnest([s1, s1 - 1800]) AS bucket_start
                FROM e
            )
            SELECT bucket_start, event_type,
                   count(*) AS n_events,
                   max(value) AS high
            FROM exploded
            GROUP BY 1, 2
        """,
        "stream_stateful_running": """
            SELECT user_id, event_id,
                   count(*) OVER w AS run_n,
                   max(value) OVER w AS run_max
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "stream_forward_fill": """
            SELECT 'u' || CAST(user_id AS VARCHAR) AS isin,
                   ts AS trading_ts,
                   CASE WHEN event_type = 'purchase' THEN value END
                       AS end_price,
                   last_value(
                       CASE WHEN event_type = 'purchase' THEN value END
                       IGNORE NULLS) OVER w AS filled_price
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "unpivot_measures": """
            SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
                   CAST(l_quantity AS DOUBLE) AS value
            FROM lineitem WHERE l_orderkey < 200
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_extendedprice',
                   CAST(l_extendedprice AS DOUBLE)
            FROM lineitem WHERE l_orderkey < 200
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_discount',
                   CAST(l_discount AS DOUBLE)
            FROM lineitem WHERE l_orderkey < 200
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_tax',
                   CAST(l_tax AS DOUBLE)
            FROM lineitem WHERE l_orderkey < 200
        """,
        "sample_hash_split": """
            WITH b AS (
                SELECT c_custkey,
                       CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::UBIGINT
                            % 100 AS BIGINT) AS bucket
                FROM customer WHERE c_custkey <= 500
            )
            SELECT c_custkey, bucket,
                   CASE WHEN bucket < 80 THEN 'train'
                        WHEN bucket < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM b
        """,
        "text_tfidf": """
            WITH d AS (
                SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                FROM documents WHERE doc_id < 100
            ), tok AS (
                SELECT doc_id, unnest(string_split(t, ' ')) AS term
                FROM d WHERE t <> ''
            ), tf AS (
                SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
            ), dfq AS (
                SELECT term, count(*) AS df FROM tf GROUP BY 1
            ), n AS (
                SELECT CAST(count(*) AS DOUBLE) AS nd FROM d
            ), scored AS (
                SELECT doc_id, term, tf, df,
                       tf * (ln((nd + 1) / (df + 1)) + 1.0) AS tfidf
                FROM tf JOIN dfq USING (term) CROSS JOIN n
            ), ranked AS (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
                FROM scored
            )
            SELECT doc_id, term, tf, df, tfidf FROM ranked WHERE rn <= 5
        """,
        "text_ngram_counts": """
            WITH norm AS (
                SELECT trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                FROM documents WHERE length(trim(text)) > 0
            ), toks AS (
                SELECT string_split(t, ' ') AS w FROM norm WHERE t <> ''
            ), grams AS (
                SELECT unnest([array_to_string(w[CAST(i AS INT):CAST(i + 2 AS INT)], ' ')
                               FOR i IN generate_series(1, len(w) - 2)]) AS ngram
                FROM toks WHERE len(w) >= 3
            )
            SELECT ngram, count(*) AS occurrences
            FROM grams GROUP BY 1
            ORDER BY occurrences DESC, ngram
            LIMIT 50
        """,
        "window_cumulative": """
            SELECT user_id, event_id,
                   count(CAST(value AS DECIMAL(20,6))) OVER w AS run_n,
                   CAST(sum(CAST(value AS DECIMAL(20,6))) OVER w AS DOUBLE) AS run_sum,
                   CAST(max(CAST(value AS DECIMAL(20,6))) OVER w AS DOUBLE) AS run_max
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "agg_percentiles": """
            SELECT l_returnflag,
                   quantile_cont(l_extendedprice, 0.25) AS p25,
                   quantile_cont(l_extendedprice, 0.50) AS p50,
                   quantile_cont(l_extendedprice, 0.75) AS p75,
                   quantile_cont(l_extendedprice, 0.95) AS p95,
                   quantile_cont(l_quantity, 0.50) AS med_qty
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1997-06-30'
            GROUP BY l_returnflag
        """,
        "agg_corr_stats": """
            SELECT l_linestatus,
                   corr(l_quantity, l_extendedprice) AS corr_qty_price,
                   covar_samp(l_quantity, l_extendedprice) AS covar_qty_price,
                   stddev_samp(l_extendedprice) AS std_price
            FROM lineitem GROUP BY l_linestatus
        """,
        "rolling_time_window": """
            SELECT user_id, event_id,
                   count(CAST(value AS DECIMAL(20,6))) OVER w AS n_10m,
                   CAST(sum(CAST(value AS DECIMAL(20,6))) OVER w AS DOUBLE) AS sum_10m
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                         RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
        """,
        "rolling_volatility": """
            WITH rets AS (
                SELECT user_id, event_id, ts,
                       value / nullif(lag(value, 1) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id), 0) - 1.0
                           AS ret
                FROM events
            )
            SELECT user_id, event_id,
                   stddev_samp(ret) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS volatility
            FROM rets
        """,
        "topk_per_group": """
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
            FROM orders
            QUALIFY rn <= 3
        """,
        "window_rank": """
            SELECT c_custkey, c_mktsegment, c_acctbal,
                   CAST(rank() OVER (PARTITION BY c_mktsegment
                        ORDER BY c_acctbal DESC, c_custkey ASC) AS INT) AS bal_rank,
                   CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                        ORDER BY c_acctbal DESC, c_custkey ASC) AS INT) AS quartile
            FROM customer
        """,
        "forward_fill": """
            SELECT user_id, event_id,
                   last_value(CASE WHEN event_type = 'purchase' THEN value END
                              IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS purchase_value
            FROM events
        """,
        "resample_hourly": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_ts,
                   event_type,
                   arg_min(value, event_id) AS open,
                   max(value) AS high,
                   min(value) AS low,
                   arg_max(value, event_id) AS close,
                   CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS volume,
                   count(*) AS n_events
            FROM events
            GROUP BY 1, 2
        """,
        "weighted_index": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_ts,
                   CAST(sum(CAST(value * (user_id % 10 + 1) AS DECIMAL(20,6))) AS DOUBLE)
                     / CAST(sum(CAST((user_id % 10 + 1) AS DECIMAL(20,6))) AS DOUBLE)
                       AS index_value
            FROM events
            GROUP BY 1
        """,
        "sessionize": """
            WITH flags AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR date_diff('second', lag(ts) OVER w, ts) > 1800
                            THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id, event_id,
                   CAST(sum(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
                       AS session_id
            FROM flags
        """,
        "join_salted": """
            SELECT o_orderkey, o_custkey AS custkey, o_totalprice, c_mktsegment
            FROM orders JOIN customer ON o_custkey = c_custkey
        """,
        "array_functions": """
            WITH g AS (
                SELECT l_orderkey, list_sort(list(l_linenumber)) AS arr
                FROM lineitem WHERE l_orderkey < 1000
                GROUP BY l_orderkey
            )
            SELECT l_orderkey,
                   array_to_string(arr, ',') AS lines,
                   CAST(len(list_distinct(arr)) AS INT) AS n_distinct,
                   CAST(list_aggregate(arr, 'sum') AS BIGINT) AS line_sum,
                   list_contains(arr, 1) AS has_first,
                   array_to_string(arr[1:2], ',') AS first_two
            FROM g
        """,
        "sql_forecast_revenue": """
            SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(20,6)))
                        AS DOUBLE) AS revenue_delta,
                   count(*) AS n_rows
            FROM lineitem
            WHERE l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "json_map_explode": """
            SELECT e.event_id, k AS key,
                   CAST(e.props ->> k AS VARCHAR) AS value
            FROM events e, unnest(json_keys(e.props)) AS t(k)
            WHERE e.event_id < 3000
        """,
        "window_value_picks": """
            SELECT c_custkey, c_mktsegment, c_acctbal,
                   first_value(c_acctbal) OVER wf AS seg_top,
                   last_value(c_acctbal) OVER wf AS seg_bottom,
                   nth_value(c_acctbal, 3) OVER wf AS seg_third,
                   lead(c_acctbal, 1) OVER w AS next_bal
            FROM customer
            WINDOW w AS (PARTITION BY c_mktsegment
                         ORDER BY c_acctbal DESC, c_custkey ASC),
                   wf AS (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal DESC, c_custkey ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND UNBOUNDED FOLLOWING)
        """,
        "window_distribution": """
            SELECT c_custkey, c_mktsegment, c_acctbal,
                   percent_rank() OVER w AS pct_rank,
                   cume_dist() OVER w AS cume
            FROM customer
            WINDOW w AS (PARTITION BY c_mktsegment
                         ORDER BY c_acctbal DESC, c_custkey ASC)
        """,
        "fuzzy_pairs": """
            WITH c AS (
                SELECT c_custkey, c_name,
                       lower(substr(c_name, 1, 1)) AS b0,
                       length(c_name) AS b1
                FROM customer WHERE c_custkey < 300
            )
            SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
                   levenshtein(a.c_name, b.c_name) AS distance
            FROM c a JOIN c b
              ON a.b0 = b.b0 AND a.b1 = b.b1 AND a.c_custkey < b.c_custkey
            WHERE levenshtein(a.c_name, b.c_name) <= 2
        """,
        "profile_columns": """
            WITH s AS (SELECT * FROM orders)
            SELECT 'o_orderkey' AS "column", count(*) AS n_rows,
                   CAST(sum(CASE WHEN o_orderkey IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                   count(DISTINCT o_orderkey) AS n_distinct,
                   CAST(min(o_orderkey) AS VARCHAR) AS min_str,
                   CAST(max(o_orderkey) AS VARCHAR) AS max_str
            FROM s
            UNION ALL
            SELECT 'o_custkey', count(*),
                   CAST(sum(CASE WHEN o_custkey IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT),
                   count(DISTINCT o_custkey),
                   CAST(min(o_custkey) AS VARCHAR),
                   CAST(max(o_custkey) AS VARCHAR)
            FROM s
            UNION ALL
            SELECT 'o_orderpriority', count(*),
                   CAST(sum(CASE WHEN o_orderpriority IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT),
                   count(DISTINCT o_orderpriority),
                   CAST(min(o_orderpriority) AS VARCHAR),
                   CAST(max(o_orderpriority) AS VARCHAR)
            FROM s
            UNION ALL
            SELECT 'o_totalprice', count(*),
                   CAST(sum(CASE WHEN o_totalprice IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT),
                   count(DISTINCT o_totalprice),
                   CAST(min(o_totalprice) AS VARCHAR),
                   CAST(max(o_totalprice) AS VARCHAR)
            FROM s
        """,
        "stream_static_join": """
            SELECT e.event_id, e.user_id, e.event_type,
                   c.c_mktsegment, c.c_nationkey
            FROM events e
            LEFT JOIN customer c ON e.user_id = c.c_custkey
        """,
        "corpus_mix": """
            -- doubles throughout (not DuckDB's default DECIMAL literal
            -- arithmetic) so the rate and the round() cut bit-match
            -- Spark's double math at .5 boundaries (ADVICE r5)
            WITH counts AS (
                SELECT source, count(*) AS n,
                       CASE source WHEN 'src0' THEN CAST(0.5 AS DOUBLE)
                                   WHEN 'src1' THEN CAST(0.3 AS DOUBLE)
                                   WHEN 'src2' THEN CAST(0.2 AS DOUBLE) END
                           AS share
                FROM documents GROUP BY source
            ), eligible AS (
                SELECT * FROM counts WHERE share IS NOT NULL AND share > 0
            ), tgt AS (
                SELECT min(CAST(n AS DOUBLE) / share) AS n_target FROM eligible
            ), rates AS (
                SELECT source,
                       least(CAST(1.0 AS DOUBLE), share * n_target / n) AS rate
                FROM eligible CROSS JOIN tgt
            )
            SELECT d.doc_id, d.source, d.lang
            FROM documents d JOIN rates r ON d.source = r.source
            WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::UBIGINT
                       % 10000 AS BIGINT)
                  < greatest(CAST(round(r.rate * 10000) AS BIGINT), 1)
        """,
        "above_avg_orders": """
            WITH w AS (
                SELECT o_orderkey, o_custkey, o_totalprice,
                       CAST(sum(CAST(o_totalprice AS DECIMAL(20,6)))
                                OVER (PARTITION BY o_custkey) AS DOUBLE)
                           / count(*) OVER (PARTITION BY o_custkey) AS cust_avg
                FROM orders
            )
            SELECT o_orderkey, o_custkey, o_totalprice, cust_avg
            FROM w
            WHERE o_totalprice > 1.5 * cust_avg
        """,
        "big_qty_orders": """
            WITH big AS (
                SELECT l_orderkey,
                       CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE)
                           AS total_qty
                FROM lineitem
                GROUP BY l_orderkey
                HAVING total_qty > 250.0
            )
            SELECT c_name, o_custkey, o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS o_date,
                   o_totalprice, total_qty
            FROM big
            JOIN orders ON big.l_orderkey = orders.o_orderkey
            JOIN customer ON orders.o_custkey = customer.c_custkey
        """,
        "stream_hourly_stats": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_ts,
                   event_type,
                   max(value) AS high,
                   min(value) AS low,
                   count(*) AS n_events
            FROM events
            GROUP BY 1, 2
        """,
        # OHLCV: open/close via arg_min/arg_max on the same composite
        # (fixed-width ts string + zero-padded event_id) ordering key
        # the Spark query uses — tie-proof in both engines.
        "stream_ohlcv": """
            WITH e AS (
                SELECT event_type, value,
                       CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS bucket_start,
                       strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
                           || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord_key
                FROM events
            )
            SELECT bucket_start, event_type,
                   arg_min(value, ord_key) AS "open",
                   max(value) AS high,
                   min(value) AS low,
                   arg_max(value, ord_key) AS "close",
                   CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS volume,
                   count(*) AS n_bars
            FROM e
            GROUP BY 1, 2
        """,
        "densify_fill": """
            WITH daily AS (
                SELECT user_id, date_trunc('day', ts) AS day,
                       CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS day_value
                FROM events WHERE user_id < 50 GROUP BY 1, 2
            ), spine AS (
                SELECT user_id,
                       unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS day
                FROM daily GROUP BY user_id
            )
            SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day_str,
                   last_value(d.day_value IGNORE NULLS) OVER (
                       PARTITION BY s.user_id ORDER BY s.day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS day_value
            FROM spine s LEFT JOIN daily d
              ON s.user_id = d.user_id AND s.day = d.day
        """,
        "join_theta": """
            SELECT c_custkey, s_suppkey, c_acctbal, s_acctbal
            FROM customer JOIN supplier
              ON c_acctbal > s_acctbal AND c_acctbal <= s_acctbal + 10.0
        """,
        "agg_collect_sorted": """
            SELECT l_orderkey,
                   array_to_string(list_sort(list(CAST(l_linenumber AS VARCHAR))), ',')
                       AS line_numbers,
                   count(*) AS n_lines
            FROM lineitem WHERE l_orderkey < 200
            GROUP BY l_orderkey
        """,
        "setop_union": """
            SELECT c_nationkey AS nationkey FROM customer
            UNION
            SELECT s_nationkey AS nationkey FROM supplier
        """,
        "setop_intersect": """
            SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            INTERSECT
            SELECT o_custkey AS custkey FROM orders
        """,
        "setop_except": """
            SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
            EXCEPT
            SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        """,
        "setop_except_all": """
            SELECT l_partkey AS partkey FROM lineitem WHERE l_quantity >= 48
            EXCEPT ALL
            SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'R'
        """,
        "global_topk": """
            SELECT l_orderkey, l_linenumber, l_extendedprice
            FROM lineitem
            ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
            LIMIT 10
        """,
        "dedup_exact": """
            WITH dup AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 100000 AS doc_id, text FROM documents
            )
            SELECT min(doc_id) AS doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
            FROM dup GROUP BY fp
        """,
        "text_token_stats": """
            SELECT doc_id,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END AS INT)
                       AS n_ws_tokens,
                   CAST(len(regexp_extract_all(text,
                        '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS INT) AS n_bpe_tokens,
                   CAST(length(text) AS INT) AS n_chars_measured
            FROM documents
        """,
        "text_lang_id": """
            -- stopword OCCURRENCE counts via one unnest + vectorized
            -- IN-set filters (r10: per-token list_filter lambdas are
            -- interpreted per element and blow any sane wall budget at
            -- a 50k-doc replica; identical counts — zero-token docs
            -- coalesce to 0 through the LEFT JOIN)
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(lower(text)) = '' THEN []::VARCHAR[]
                            ELSE string_split_regex(trim(lower(text)), '\\s+') END AS tk
                FROM documents
            ), tok_rows AS (
                SELECT doc_id, unnest(tk) AS tok FROM toks
            ), hitc AS (
                SELECT doc_id,
                  count(*) FILTER (WHERE tok IN ('der','die','und','das','ist','von','mit','den','nicht','ein','eine','auf','sich','des','im','dem','für','als','auch','es')) AS s_de,
                  count(*) FILTER (WHERE tok IN ('the','of','and','to','in','is','that','it','was','for','on','are','as','with','his','they','at','be','this','have')) AS s_en,
                  count(*) FILTER (WHERE tok IN ('el','la','los','las','de','que','y','en','un','una','es','por','con','para','su','se','del','al','lo','como')) AS s_es,
                  count(*) FILTER (WHERE tok IN ('le','la','les','de','des','et','est','en','que','qui','dans','pour','pas','une','au','sur','avec','son','ne','se')) AS s_fr
                FROM tok_rows GROUP BY doc_id
            ), scores AS (
                SELECT t.doc_id,
                       COALESCE(h.s_de, 0) AS s_de, COALESCE(h.s_en, 0) AS s_en,
                       COALESCE(h.s_es, 0) AS s_es, COALESCE(h.s_fr, 0) AS s_fr
                FROM toks t LEFT JOIN hitc h ON t.doc_id = h.doc_id
            )
            SELECT doc_id,
                   CASE WHEN greatest(s_de, s_en, s_es, s_fr) > 0 AND s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                        WHEN greatest(s_de, s_en, s_es, s_fr) > 0 AND s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                        WHEN greatest(s_de, s_en, s_es, s_fr) > 0 AND s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                        WHEN greatest(s_de, s_en, s_es, s_fr) > 0 AND s_fr = greatest(s_de, s_en, s_es, s_fr) THEN 'fr'
                        ELSE 'und' END AS lang_pred
            FROM scores
        """,
        "text_quality": """
            -- en-stopword hits via unnest + vectorized IN filter
            -- (r10: same lambda-interpreter hazard as text_lang_id)
            WITH tok_rows AS (
                SELECT doc_id, unnest(
                    CASE WHEN trim(lower(text)) = '' THEN []::VARCHAR[]
                         ELSE string_split_regex(trim(lower(text)), '\\s+') END) AS tok
                FROM documents
            ), hitc AS (
                SELECT doc_id,
                       count(*) FILTER (WHERE tok IN ('the','of','and','to','in','is','that','it','was','for','on','are','as','with','his','they','at','be','this','have')) AS hits
                FROM tok_rows GROUP BY doc_id
            ), base AS (
                SELECT d.doc_id, d.text,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(string_split_regex(trim(text), '\\s+')) END AS n,
                       COALESCE(h.hits, 0) AS hits,
                       length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{}\\-]', '', 'g')) AS punct,
                       length(text) AS nchars
                FROM documents d LEFT JOIN hitc h ON d.doc_id = h.doc_id
            ), ratios AS (
                SELECT doc_id, n,
                       CASE WHEN n = 0 THEN 0.0 ELSE CAST(hits AS DOUBLE) / n END AS sw_ratio,
                       CASE WHEN nchars = 0 THEN 0.0 ELSE CAST(punct AS DOUBLE) / nchars END AS punct_ratio,
                       nchars
                FROM base
            )
            SELECT doc_id, CAST(n AS INT) AS n_tokens,
                   0.4 * least(CAST(nchars AS DOUBLE) / 2000.0, 1.0)
                 + 0.4 * least(sw_ratio / 0.4, 1.0)
                 + 0.2 * (1.0 - least(greatest(punct_ratio - 0.1, 0.0) / 0.4, 1.0))
                       AS quality
            FROM ratios
        """,
        # SimHash from first principles: per-token 60-bit md5-derived
        # hashes (identical to Spark's conv(substr(md5,1,15),16,10)),
        # per-bit majority votes with the same strict tie rule
        # (c*2 > n), then ALL-PAIRS Hamming <= 3 — equivalent to the
        # Spark side's pigeonhole banding because the banding is
        # complete (any pair within distance k agrees on >= 1 of k+1
        # blocks).
        # Winnowing from first principles: rolling 7-gram md5_60 hashes,
        # min of each 4-window (list slice is 1-based inclusive, matching
        # F.slice(arr, i, 4)), distinct + sort. Short docs (< k chars)
        # hash the whole remaining tail, same as Spark's substr.
        "text_winnow": """
            WITH norm AS (
                SELECT doc_id,
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                FROM documents
            ), h AS (
                SELECT doc_id,
                       [('0x' || substr(md5(substr(t, CAST(i AS INT), 7)), 1, 15))::UBIGINT::BIGINT
                        FOR i IN generate_series(1, greatest(len(t) - 6, 1))] AS hs
                FROM norm
            )
            SELECT doc_id,
                   unnest(list_distinct(
                       [list_min(hs[CAST(j AS INT):CAST(j + 3 AS INT)])
                        FOR j IN generate_series(1, greatest(len(hs) - 3, 1))]
                   )) AS fingerprint
            FROM h
        """,
        "dedup_simhash": """
            WITH norm AS (
                SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                FROM documents
            ), tok AS (
                SELECT doc_id, unnest(string_split(t, ' ')) AS tk
                FROM norm WHERE t <> ''
            ), th AS (
                SELECT doc_id, ('0x' || substr(md5(tk), 1, 15))::UBIGINT::BIGINT AS h
                FROM tok
            ), votes AS (
                SELECT doc_id, b,
                       sum(CAST((h >> b) & 1 AS BIGINT)) AS c,
                       count(*) AS n
                FROM th, range(60) r(b)
                GROUP BY doc_id, b
            ), fp AS (
                SELECT d.doc_id,
                       coalesce(sum(CASE WHEN v.c * 2 > v.n
                                         THEN (1::BIGINT << v.b) ELSE 0 END), 0) AS f
                FROM documents d LEFT JOIN votes v ON d.doc_id = v.doc_id
                GROUP BY d.doc_id
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.f, b.f)) AS INTEGER) AS hamming
            FROM fp a JOIN fp b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.f, b.f)) <= 3
        """,
        # Exact Jaccard >= 0.5 over every pair, generated via the
        # lossless prefix filter (see _shingle_pair_ctes): valid as an
        # oracle for the LSH query because every true pair at sf0.01
        # has jaccard >= 0.92, far above the 16-band/r=4 S-curve knee
        # (collision prob ~ 1.0), so LSH recall is exactly 1.0 and the
        # verify stage guarantees zero false positives.
        "dedup_minhash": f"""
            WITH {_shingle_pair_ctes()}
            SELECT id_a, id_b, jaccard FROM pairs
        """,
        "dedup_ngram_jaccard": """
            WITH norm AS (
                SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                FROM documents WHERE doc_id < 100
            ), sh AS (
                SELECT doc_id,
                       list_distinct([substr(t, CAST(i AS INT), 5)
                                      FOR i IN generate_series(1, greatest(len(t) - 4, 1))]) AS shingles
                FROM norm
            ), sizes AS (
                SELECT doc_id, len(shingles) AS n FROM sh
            ), post AS (
                SELECT doc_id, unnest(shingles) AS s FROM sh
            ), inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
                FROM post a JOIN post b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.2
        """,
        "emb_topk_ivf": """
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            ), cent AS (
                SELECT CAST((rn - 1) // 7 AS INT) AS cid, v AS cv
                FROM (SELECT v, row_number() OVER (ORDER BY vec_id) AS rn FROM e)
                WHERE rn <= 112 AND (rn - 1) % 7 = 0
            ), dists AS (
                SELECT e.vec_id, e.v, c.cid, list_distance(e.v, c.cv) AS d
                FROM e CROSS JOIN cent c
            ), assign AS (
                SELECT vec_id, v, cid FROM (
                    SELECT vec_id, v, cid,
                           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS r
                    FROM dists
                ) WHERE r = 1
            ), probes AS (
                SELECT vec_id AS query_id, v AS qv, cid FROM (
                    SELECT vec_id, v, cid,
                           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS r
                    FROM dists WHERE vec_id < 10
                ) WHERE r <= 4
            ), scored AS (
                SELECT p.query_id, a.vec_id AS neighbor_id,
                       list_cosine_similarity(p.qv, a.v) AS cosine
                FROM probes p JOIN assign a ON p.cid = a.cid
                WHERE p.query_id != a.vec_id
            )
            SELECT query_id, neighbor_id, cosine,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
            FROM scored QUALIFY rank <= 5
        """,
        "emb_cosine_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                FROM embeddings WHERE vec_id < 10
            ), c AS (
                SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
                FROM embeddings
            ), s AS (
                SELECT query_id, neighbor_id,
                       list_dot_product(qv, cv)
                         / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                           AS cosine
                FROM c CROSS JOIN q
                WHERE query_id != neighbor_id
            )
            SELECT query_id, neighbor_id, cosine,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
            FROM s QUALIFY rank <= 5
        """,
        "emb_neardup_exact": """
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id < 100
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
                       AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
                  >= 0.2
        """,
        # Connected components from first principles: the same exact-
        # Jaccard pairs as dedup_minhash (LSH recall 1.0 argument, see
        # that oracle), then min-reachable-label via a recursive CTE —
        # propagating only strictly-smaller labels bounds the state and
        # terminates at the same fixpoint as star contraction.
        "dedup_clusters": f"""
            WITH {_shingle_pair_ctes()}{_cc_label_ctes()}
            SELECT node AS id, lbl AS cluster_id,
                   CAST(node = lbl AS INTEGER) AS is_survivor
            FROM cc_final
        """,
        # Word 8-grams from first principles; the oracle joins raw gram
        # strings where Spark joins xxhash64(gram) — identical counts
        # absent a 64-bit collision inside one doc-benchmark gram set.
        "corpus_decontaminate": """
            WITH w AS (
                SELECT doc_id,
                       CASE WHEN trim(lower(text)) = '' THEN []
                            ELSE string_split_regex(trim(lower(text)), '\\s+')
                       END AS ws
                FROM documents
            ), g AS (
                SELECT doc_id,
                       CASE WHEN len(ws) >= 8 THEN
                           list_distinct([array_to_string(ws[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')
                                          FOR i IN generate_series(1, len(ws) - 7)])
                       ELSE [] END AS grams
                FROM w
            ), bg AS (
                SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 20 = 0
            ), hits AS (
                SELECT cg.doc_id, count(DISTINCT cg.gram) AS n_overlap
                FROM (SELECT doc_id, unnest(grams) AS gram FROM g
                      WHERE doc_id % 20 <> 0) cg
                JOIN bg USING (gram)
                GROUP BY cg.doc_id
            )
            SELECT d.doc_id,
                   coalesce(h.n_overlap, 0) AS n_overlap,
                   CAST(coalesce(h.n_overlap, 0) >= 1 AS INTEGER) AS contaminated
            FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
            WHERE d.doc_id % 20 <> 0
        """,
        "corpus_cap_per_source": """
            SELECT doc_id, source FROM (
                SELECT doc_id, source,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT::BIGINT,
                                    doc_id) AS rn
                FROM documents)
            WHERE rn <= 10
        """,
        "corpus_pack_sequences": """
            WITH t AS (
                SELECT lang, doc_id,
                       CAST(CASE WHEN trim(text) = '' THEN 0
                            ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT)
                           AS n_tokens,
                       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT::BIGINT AS h
                FROM documents
            ), c AS (
                SELECT lang, doc_id, n_tokens,
                       CAST(sum(n_tokens) OVER (
                           PARTITION BY lang ORDER BY h, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         - n_tokens AS BIGINT) AS pack_offset
                FROM t
            )
            SELECT lang, doc_id, n_tokens,
                   CAST(floor(pack_offset / 2048.0) AS BIGINT) AS pack_id,
                   pack_offset
            FROM c
        """,
        "corpus_shuffle_index": """
            WITH t AS (
                SELECT doc_id,
                       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT::BIGINT AS h
                FROM documents
            )
            SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY h % 16, h, doc_id) - 1 AS BIGINT)
                       AS shuffle_idx
            FROM t
        """,
        # same pairs + recursive-CTE components as dedup_clusters; the
        # corpus keeps every doc that is not a non-survivor
        "dedup_apply": f"""
            WITH {_shingle_pair_ctes()}{_cc_label_ctes()}, losers AS (
                SELECT node FROM cc_final WHERE node <> lbl
            )
            SELECT d.doc_id, d.lang, d.source
            FROM documents d
            WHERE d.doc_id NOT IN (SELECT node FROM losers)
        """,
        "text_repetition": """
            WITH norm AS (
                SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                FROM documents
            ), words AS (
                SELECT doc_id, string_split(t, ' ') AS w FROM norm WHERE t <> ''
            ), tc AS (
                SELECT doc_id, tk, count(*) AS c
                FROM (SELECT doc_id, unnest(w) AS tk FROM words)
                GROUP BY doc_id, tk
            ), ts AS (
                SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct,
                       max(c) AS top_c
                FROM tc GROUP BY doc_id
            ), bc AS (
                SELECT doc_id, g, count(*) AS c
                FROM (SELECT doc_id, unnest([w[CAST(i AS INT)] || ' ' || w[CAST(i + 1 AS INT)]
                                             FOR i IN generate_series(1, len(w) - 1)]) AS g
                      FROM words) bgs
                GROUP BY doc_id, g
            ), bs AS (
                SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bg
                FROM bc GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(ts.n_tokens, 0) AS BIGINT) AS n_tokens,
                   CAST(ts.n_distinct AS DOUBLE) / ts.n_tokens AS distinct_token_frac,
                   CAST(ts.top_c AS DOUBLE) / ts.n_tokens AS top_token_frac,
                   CAST(bs.top_bg AS DOUBLE) / bs.n_bigrams AS top_bigram_frac
            FROM documents d
            LEFT JOIN ts ON d.doc_id = ts.doc_id
            LEFT JOIN bs ON d.doc_id = bs.doc_id
        """,
        "stream_dedup": """
            SELECT event_id, user_id, event_type, value FROM events
        """,
        "merge_upsert": """
            WITH src AS (
                SELECT o_orderkey, o_custkey, o_orderstatus,
                       o_totalprice * 1.1 AS o_totalprice, o_orderdate,
                       'CORRECTED' AS o_orderpriority
                FROM orders WHERE o_orderkey % 97 = 0
                UNION ALL
                SELECT o_orderkey + 10000000, o_custkey, 'N',
                       o_totalprice, o_orderdate, 'NEW'
                FROM orders WHERE o_orderkey % 997 = 0
            )
            SELECT * FROM orders
            WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
            UNION ALL
            SELECT * FROM src
        """,
        "merge_update_cols": """
            WITH src AS (
                SELECT o_orderkey, o_custkey, 'IGNORED' AS o_orderstatus,
                       o_totalprice * 2.0 AS o_totalprice, o_orderdate,
                       o_orderpriority
                FROM orders WHERE o_orderkey % 53 = 0
                UNION ALL
                SELECT o_orderkey + 20000000, o_custkey, 'N',
                       o_totalprice, o_orderdate, 'NEW'
                FROM orders WHERE o_orderkey % 991 = 0
            )
            SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus,
                   coalesce(s.o_totalprice, t.o_totalprice) AS o_totalprice,
                   t.o_orderdate, t.o_orderpriority
            FROM orders t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
            UNION ALL
            SELECT * FROM src
            WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders)
        """,
        # EWMA closed form: y_t = (1-a)^t x_0 + sum_{j=1..t} a(1-a)^(t-j) x_j
        # (adjust=False recursion unrolled); self-join bounded by the
        # small per-user group sizes at gate scale.
        "window_ewma": """
            WITH e AS (
                SELECT user_id, event_id, value,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) - 1 AS t
                FROM events
            ), x0 AS (
                SELECT user_id, value AS v0 FROM e WHERE t = 0
            )
            SELECT a.user_id, a.event_id, a.value,
                   power(0.8, a.t) * x0.v0
                   + coalesce(sum(0.2 * power(0.8, a.t - b.t) * b.value), 0.0)
                       AS ewma
            FROM e a
            JOIN x0 ON a.user_id = x0.user_id
            LEFT JOIN e b
              ON b.user_id = a.user_id AND b.t >= 1 AND b.t <= a.t
            GROUP BY a.user_id, a.event_id, a.value, a.t, x0.v0
        """,
        "udtf_sentences": """
            WITH s AS (
                SELECT doc_id,
                       list_filter(
                           [trim(x) FOR x IN
                            string_split_regex(
                                substr(text, 1, 40) || '. ' || text
                                || '! Is this the end? Yes.',
                                '[.!?]+\\s+')],
                           x -> x <> '') AS l
                FROM documents WHERE doc_id < 300
            ), e AS (
                SELECT doc_id, l,
                       unnest(generate_series(1, len(l))) AS i
                FROM s
            )
            SELECT doc_id,
                   CAST(i - 1 AS INT) AS sent_id,
                   l[CAST(i AS INT)] AS sentence
            FROM e
        """,
        # All-pairs Hamming over the SQL-derived aHash halves — equal to
        # the engine's pigeonhole banding (complete for distance <= 3).
        "media_phash_neardup": """
            WITH d AS (
                SELECT doc_id AS media_id, text,
                       CAST(length(text) AS INT) AS L
                FROM documents WHERE doc_id < 500
            ), px AS (
                SELECT media_id,
                       CASE WHEN L = 0
                            THEN [0 FOR i IN generate_series(0, 191)]
                            ELSE [ord(substr(text, CAST(i % L AS INT) + 1, 1))
                                  FOR i IN generate_series(0, 191)]
                       END AS p
                FROM d
            ), gs AS (
                SELECT media_id,
                       [p[3 * i + 1] + p[3 * i + 2] + p[3 * i + 3]
                        FOR i IN generate_series(0, 63)] AS g
                FROM px
            ), ph AS (
                SELECT media_id,
                       CAST(list_sum(
                           [CASE WHEN g[i + 1] * 64 > list_sum(g)
                                 THEN (CAST(1 AS BIGINT) << (i - 32))
                                 ELSE 0 END
                            FOR i IN generate_series(32, 63)]) AS BIGINT)
                           AS hi,
                       CAST(list_sum(
                           [CASE WHEN g[i + 1] * 64 > list_sum(g)
                                 THEN (CAST(1 AS BIGINT) << i)
                                 ELSE 0 END
                            FOR i IN generate_series(0, 31)]) AS BIGINT)
                           AS lo
                FROM gs
            )
            SELECT a.media_id AS id_a, b.media_id AS id_b,
                   bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
                       AS hamming
            FROM ph a JOIN ph b ON a.media_id < b.media_id
            WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
        """,
        # aHash bits from the tiled-payload stub, integer-exact:
        # bit_i = (R+G+B at grid cell i) * 64 > sum of all cells
        "media_phash_dedup": """
            WITH d AS (
                SELECT doc_id AS media_id, text,
                       CAST(length(text) AS INT) AS L
                FROM documents WHERE doc_id < 500
            ), px AS (
                SELECT media_id,
                       CASE WHEN L = 0
                            THEN [0 FOR i IN generate_series(0, 191)]
                            ELSE [ord(substr(text, CAST(i % L AS INT) + 1, 1))
                                  FOR i IN generate_series(0, 191)]
                       END AS p
                FROM d
            ), gs AS (
                SELECT media_id,
                       [p[3 * i + 1] + p[3 * i + 2] + p[3 * i + 3]
                        FOR i IN generate_series(0, 63)] AS g
                FROM px
            ), ph AS (
                SELECT media_id,
                       CAST(list_sum(
                           [CASE WHEN g[i + 1] * 64 > list_sum(g)
                                 THEN (CAST(1 AS BIGINT) << (i - 32))
                                 ELSE 0 END
                            FOR i IN generate_series(32, 63)]) AS BIGINT)
                           AS phash_hi,
                       CAST(list_sum(
                           [CASE WHEN g[i + 1] * 64 > list_sum(g)
                                 THEN (CAST(1 AS BIGINT) << i)
                                 ELSE 0 END
                            FOR i IN generate_series(0, 31)]) AS BIGINT)
                           AS phash_lo
                FROM gs
            )
            SELECT phash_hi, phash_lo,
                   count(*) AS n_copies,
                   min(media_id) AS survivor_id
            FROM ph
            GROUP BY phash_hi, phash_lo
            HAVING count(*) >= 2
        """,
        "stream_stream_join": """
            SELECT v.user_id,
                   v.event_id AS view_event,
                   p.event_id AS purchase_event,
                   epoch_us(v.ts) AS view_ts_us,
                   epoch_us(p.ts) AS purchase_ts_us
            FROM events v
            JOIN events p
              ON v.user_id = p.user_id
             AND p.ts >= v.ts
             AND p.ts <= v.ts + INTERVAL 30 MINUTE
            WHERE v.event_type = 'view' AND p.event_type = 'purchase'
        """,
        "quality_quarantine": """
            WITH tagged AS (
                SELECT l_orderkey, l_linenumber, l_discount, l_tax,
                       concat_ws(',',
                           CASE WHEN l_discount <= 0.06 THEN NULL
                                ELSE 'discount_le_6pct' END,
                           CASE WHEN l_tax <= 0.05 THEN NULL
                                ELSE 'tax_le_5pct' END,
                           CASE WHEN l_quantity > 0 THEN NULL
                                ELSE 'qty_positive' END
                       ) AS failed_rules
                FROM lineitem
            )
            SELECT * FROM tagged WHERE failed_rules <> ''
        """,
        "dedup_incremental": """
            WITH reg AS (
                SELECT DISTINCT
                       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
                FROM documents WHERE doc_id % 2 = 0
            ), batch AS (
                SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
                UNION ALL
                SELECT doc_id + 500000, text FROM documents
                WHERE doc_id % 10 = 0
                UNION ALL
                SELECT doc_id + 600000, text FROM documents
                WHERE doc_id % 7 = 1 AND doc_id % 2 = 1
            ), fps AS (
                SELECT doc_id,
                       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
                FROM batch
            ), surv AS (
                SELECT fp, min(doc_id) AS doc_id FROM fps GROUP BY fp
            )
            SELECT doc_id, fp FROM surv
            WHERE fp NOT IN (SELECT fp FROM reg)
        """,
        "corpus_chunk": """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(lower(text)) = '' THEN []::VARCHAR[]
                            ELSE string_split_regex(trim(lower(text)), '\\s+')
                       END AS w
                FROM documents
            ), st AS (
                SELECT doc_id, w,
                       greatest(CAST(ceil((len(w) - 32) / 24.0) AS INT), 0)
                           AS last_k
                FROM toks
            ), ch AS (
                SELECT doc_id, w, unnest(generate_series(0, last_k)) AS k
                FROM st
            )
            SELECT doc_id,
                   k AS chunk_id,
                   k * 24 AS chunk_start,
                   len(w[k * 24 + 1 : k * 24 + 32]) AS n_chunk_tokens,
                   array_to_string(w[k * 24 + 1 : k * 24 + 32], ' ')
                       AS chunk_text
            FROM ch
        """,
        "join_null_safe": """
            WITH a AS (
                SELECT CASE WHEN event_type = 'click' THEN NULL
                            ELSE event_type END AS k,
                       count(*) AS n_a
                FROM events GROUP BY 1
            ), b AS (
                SELECT CASE WHEN event_type = 'click' THEN NULL
                            ELSE event_type END AS k,
                       count(*) AS n_b
                FROM events WHERE value > 50 GROUP BY 1
            )
            SELECT a.k, a.n_a, b.n_b
            FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
        """,
        # Composition of the text_lang_id, text_quality, and
        # text_repetition oracle blocks, joined and filtered with the
        # same thresholds as corpus.quality_filter.
        "corpus_quality_filter": """
            -- stopword OCCURRENCE counts via one unnest + vectorized
            -- IN-set filters (r10: the five per-token list_filter
            -- lambdas timed out a 300s oracle budget at the 50k-doc
            -- sf1 replica; identical counts — zero-token docs coalesce
            -- to 0 through the LEFT JOIN, and qbase reuses s_en since
            -- its en list is the same literal)
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(lower(text)) = '' THEN []::VARCHAR[]
                            ELSE string_split_regex(trim(lower(text)), '\\s+') END AS tk
                FROM documents
            ), tok_rows AS (
                SELECT doc_id, unnest(tk) AS tok FROM toks
            ), hitc AS (
                SELECT doc_id,
                  count(*) FILTER (WHERE tok IN ('der','die','und','das','ist','von','mit','den','nicht','ein','eine','auf','sich','des','im','dem','für','als','auch','es')) AS s_de,
                  count(*) FILTER (WHERE tok IN ('the','of','and','to','in','is','that','it','was','for','on','are','as','with','his','they','at','be','this','have')) AS s_en,
                  count(*) FILTER (WHERE tok IN ('el','la','los','las','de','que','y','en','un','una','es','por','con','para','su','se','del','al','lo','como')) AS s_es,
                  count(*) FILTER (WHERE tok IN ('le','la','les','de','des','et','est','en','que','qui','dans','pour','pas','une','au','sur','avec','son','ne','se')) AS s_fr
                FROM tok_rows GROUP BY doc_id
            ), scores AS (
                SELECT t.doc_id,
                       COALESCE(h.s_de, 0) AS s_de, COALESCE(h.s_en, 0) AS s_en,
                       COALESCE(h.s_es, 0) AS s_es, COALESCE(h.s_fr, 0) AS s_fr
                FROM toks t LEFT JOIN hitc h ON t.doc_id = h.doc_id
            ), lang AS (
                SELECT doc_id,
                   CASE WHEN greatest(s_de, s_en, s_es, s_fr) > 0 AND s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                        WHEN greatest(s_de, s_en, s_es, s_fr) > 0 AND s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                        WHEN greatest(s_de, s_en, s_es, s_fr) > 0 AND s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                        WHEN greatest(s_de, s_en, s_es, s_fr) > 0 AND s_fr = greatest(s_de, s_en, s_es, s_fr) THEN 'fr'
                        ELSE 'und' END AS lang_pred
                FROM scores
            ), qbase AS (
                SELECT d.doc_id,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(string_split_regex(trim(text), '\\s+')) END AS n,
                       s.s_en AS hits,
                       length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{}\\-]', '', 'g')) AS punct,
                       length(text) AS nchars
                FROM documents d JOIN scores s ON d.doc_id = s.doc_id
            ), qual AS (
                SELECT doc_id,
                   0.4 * least(CAST(nchars AS DOUBLE) / 2000.0, 1.0)
                 + 0.4 * least((CASE WHEN n = 0 THEN 0.0 ELSE CAST(hits AS DOUBLE) / n END) / 0.4, 1.0)
                 + 0.2 * (1.0 - least(greatest((CASE WHEN nchars = 0 THEN 0.0 ELSE CAST(punct AS DOUBLE) / nchars END) - 0.1, 0.0) / 0.4, 1.0))
                       AS quality
                FROM qbase
            ), norm AS (
                SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                FROM documents
            ), words AS (
                SELECT doc_id, string_split(t, ' ') AS w FROM norm WHERE t <> ''
            ), tc AS (
                SELECT doc_id, tk, count(*) AS c
                FROM (SELECT doc_id, unnest(w) AS tk FROM words)
                GROUP BY doc_id, tk
            ), rep AS (
                SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                       CAST(count(*) AS DOUBLE) / sum(c) AS distinct_token_frac,
                       CAST(max(c) AS DOUBLE) / sum(c) AS top_token_frac
                FROM tc GROUP BY doc_id
            )
            SELECT d.doc_id, lang.lang_pred, rep.n_tokens, qual.quality,
                   rep.top_token_frac, rep.distinct_token_frac
            FROM documents d
            JOIN lang ON d.doc_id = lang.doc_id
            JOIN qual ON d.doc_id = qual.doc_id
            JOIN rep ON d.doc_id = rep.doc_id
            WHERE rep.n_tokens BETWEEN 20 AND 5000
              AND qual.quality >= 0.25
              AND rep.top_token_frac <= 0.2
              AND rep.distinct_token_frac >= 0.3
              AND lang.lang_pred IN ('en','de','es','fr')
        """,
        # Spark's session_window semantics: an event at EXACTLY the
        # previous session's end still merges — new session iff the gap
        # to the previous event is STRICTLY > 30min; end = last + gap.
        "stream_session_window": """
            WITH e AS (
                SELECT user_id, epoch_us(ts) AS tu, value FROM events
            ), flags AS (
                SELECT user_id, tu, value,
                       CASE WHEN lag(tu) OVER w IS NULL
                                 OR tu - lag(tu) OVER w > 1800000000
                            THEN 1 ELSE 0 END AS is_new
                FROM e
                WINDOW w AS (PARTITION BY user_id ORDER BY tu)
            ), s AS (
                SELECT user_id, tu, value,
                       sum(is_new) OVER (
                           PARTITION BY user_id ORDER BY tu
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS sid
                FROM flags
            )
            SELECT user_id,
                   min(tu) AS session_start_us,
                   max(tu) + 1800000000 AS session_end_us,
                   count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE)
                       AS sum_value
            FROM s GROUP BY user_id, sid
        """,
        "json_extract_agg": """
            WITH ex AS (
                SELECT event_type,
                       CAST(props->>'$.k' AS BIGINT) AS k
                FROM events
            )
            SELECT event_type,
                   count(k) AS n_with_k,
                   avg(k) AS avg_k,
                   min(k) AS min_k,
                   max(k) AS max_k,
                   count(CASE WHEN k > 50 THEN 1 END) AS n_hi
            FROM ex GROUP BY event_type
        """,
        "merge_scd2": """
            WITH seq AS (
                SELECT o_custkey, o_orderdate AS ts, o_orderkey AS tb,
                       o_orderstatus AS st,
                       lag(o_orderstatus) OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey) AS prev
                FROM orders
            ), v AS (
                SELECT o_custkey, ts, tb, st
                FROM seq WHERE prev IS NULL OR prev <> st
            )
            SELECT o_custkey,
                   st AS o_orderstatus,
                   ts AS valid_from,
                   lead(ts) OVER (PARTITION BY o_custkey ORDER BY ts, tb)
                       AS valid_to,
                   lead(ts) OVER (PARTITION BY o_custkey ORDER BY ts, tb)
                       IS NULL AS is_current
            FROM v
        """,
        "interval_islands": """
            WITH iv AS (
                SELECT user_id, epoch_us(ts) AS s,
                       epoch_us(ts) + 1800000000 AS e
                FROM events
            ), o AS (
                SELECT user_id, s, e,
                       max(e) OVER (PARTITION BY user_id ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS pmax
                FROM iv
            ), flagged AS (
                SELECT user_id, s, e,
                       CASE WHEN pmax IS NULL OR s > pmax
                            THEN 1 ELSE 0 END AS brk
                FROM o
            ), grp AS (
                SELECT user_id, s, e,
                       CAST(sum(brk) OVER (PARTITION BY user_id
                           ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS isl
                FROM flagged
            )
            SELECT user_id, min(s) AS island_start, max(e) AS island_end,
                   count(*) AS n_intervals
            FROM grp GROUP BY user_id, isl
        """,
        "interval_coverage_gaps": """
            WITH iv AS (
                SELECT user_id, epoch_us(ts) AS s,
                       epoch_us(ts) + 1800000000 AS e
                FROM events
            ), o AS (
                SELECT user_id, s, e,
                       max(e) OVER (PARTITION BY user_id ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS pmax
                FROM iv
            ), grp AS (
                SELECT user_id, s, e,
                       CAST(sum(CASE WHEN pmax IS NULL OR s > pmax
                                     THEN 1 ELSE 0 END)
                            OVER (PARTITION BY user_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS isl
                FROM o
            ), islands AS (
                SELECT user_id, min(s) AS island_start,
                       max(e) AS island_end
                FROM grp GROUP BY user_id, isl
            ), nxt AS (
                SELECT user_id, island_end,
                       lead(island_start) OVER (PARTITION BY user_id
                           ORDER BY island_start) AS next_start
                FROM islands
            )
            SELECT user_id, island_end AS gap_start, next_start AS gap_end,
                   next_start - island_end AS gap_length
            FROM nxt WHERE next_start IS NOT NULL
        """,
        "group_mode": """
            WITH c AS (
                SELECT p_brand, p_type, count(*) AS n
                FROM part WHERE p_type IS NOT NULL
                GROUP BY 1, 2
            )
            SELECT p_brand, p_type AS mode_value, n
            FROM c
            QUALIFY row_number() OVER (PARTITION BY p_brand
                ORDER BY n DESC, p_type ASC) = 1
        """,
        "rolling_beta": """
            WITH t AS (
                SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
                       CAST(round(l_quantity * 100) AS BIGINT) AS x,
                       CAST(round(l_extendedprice * 100) AS BIGINT) AS y
                FROM lineitem WHERE l_suppkey <= 25
            ), w AS (
                SELECT l_suppkey, l_orderkey, l_linenumber,
                       CAST(count(*) OVER fr AS DOUBLE) AS n,
                       CAST(sum(x) OVER fr AS DOUBLE) AS sx,
                       CAST(sum(y) OVER fr AS DOUBLE) AS sy,
                       CAST(sum(x * y) OVER fr AS DOUBLE) AS sxy,
                       CAST(sum(x * x) OVER fr AS DOUBLE) AS sxx
                FROM t
                WINDOW fr AS (PARTITION BY l_suppkey
                    ORDER BY l_shipdate, l_orderkey, l_linenumber
                    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
            ), s AS (
                SELECT l_suppkey, l_orderkey, l_linenumber,
                       CASE WHEN n >= 20 AND n * sxx - sx * sx > 0
                            THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                       END AS slope,
                       n, sx, sy
                FROM w
            )
            SELECT l_suppkey, l_orderkey, l_linenumber, slope,
                   (sy - slope * sx) / n / 100.0 AS intercept
            FROM s
        """,
        "dict_encode": """
            SELECT p_partkey, p_brand,
                   CAST(dense_rank() OVER (ORDER BY p_brand) - 1 AS INT)
                       AS brand_code
            FROM part
        """,
        "emb_covariance": """
            WITH ex AS (
                SELECT vec_id,
                       generate_subscripts(embedding, 1) - 1 AS pos,
                       CAST(unnest(embedding) AS DOUBLE) AS v
                FROM embeddings WHERE embedding IS NOT NULL
            ), pr AS (
                -- per-term round(x*1e12)->int64: exact integer sums,
                -- engine-portable (the rolling_corr scale discipline)
                SELECT a.pos AS i, b.pos AS j,
                       sum(CAST(round(a.v * b.v * 1000000000000.0)
                                AS BIGINT)) AS sij
                FROM ex a JOIN ex b
                  ON a.vec_id = b.vec_id AND a.pos <= b.pos
                GROUP BY 1, 2
            ), s AS (
                SELECT pos,
                       sum(CAST(round(v * 1000000000000.0) AS BIGINT))
                           AS sv,
                       CAST(count(*) AS DOUBLE) AS n
                FROM ex GROUP BY pos
            )
            SELECT p.i, p.j,
                   (CAST(p.sij AS DOUBLE) / 1000000000000.0
                    - (CAST(si.sv AS DOUBLE) / 1000000000000.0)
                      * (CAST(sj.sv AS DOUBLE) / 1000000000000.0)
                      / si.n)
                   / (si.n - 1.0) AS cov
            FROM pr p
            JOIN s si ON si.pos = p.i
            JOIN s sj ON sj.pos = p.j
        """,
        "attribution_position": """
            WITH tagged AS (
                SELECT user_id, ts, event_id, event_type, value,
                       CASE WHEN event_type = 'click'
                            THEN CAST(json_extract_string(props, '$.k')
                                      AS INT) % 10 END AS campaign,
                       CAST(sum(CASE WHEN event_type = 'purchase'
                                     THEN 1 ELSE 0 END)
                            OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS BIGINT)
                           AS path
                FROM events
            ), convs AS (
                SELECT user_id, path, value
                FROM tagged WHERE event_type = 'purchase'
            ), ranked AS (
                SELECT user_id, path, campaign,
                       row_number() OVER w AS position,
                       count(*) OVER (PARTITION BY user_id, path)
                           AS path_size
                FROM tagged
                WHERE event_type = 'click' AND path > 0
                WINDOW w AS (PARTITION BY user_id, path
                             ORDER BY ts, event_id)
            ), credited AS (
                SELECT r.campaign,
                       c.value * (
                           CASE WHEN r.path_size = 1 THEN 1.0
                                WHEN r.path_size = 2 THEN 0.5
                                WHEN r.position = 1 THEN 0.4
                                WHEN r.position = r.path_size THEN 0.4
                                ELSE (1.0 - 0.4 - 0.4)
                                     / CAST(r.path_size - 2 AS DOUBLE)
                           END
                       ) AS credit
                FROM ranked r
                JOIN convs c
                  ON c.user_id = r.user_id AND c.path = r.path
            )
            SELECT campaign,
                   count(*) AS n_credits,
                   CAST(sum(CAST(credit AS DECIMAL(38,12))) AS DOUBLE)
                       AS credited_value
            FROM credited GROUP BY campaign
        """,
        "graph_clustering": """
            WITH ps AS (
                SELECT DISTINCT l_orderkey, l_suppkey
                FROM lineitem WHERE l_quantity >= 48
            ), e AS (
                SELECT DISTINCT a.l_suppkey AS a, b.l_suppkey AS b
                FROM ps a JOIN ps b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_suppkey < b.l_suppkey
            ), tri AS (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM e e1
                JOIN e e2 ON e2.a = e1.b
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
            ), per AS (
                SELECT node, count(*) AS t FROM (
                    SELECT x AS node FROM tri
                    UNION ALL SELECT y FROM tri
                    UNION ALL SELECT z FROM tri
                ) GROUP BY node
            ), deg AS (
                SELECT node, count(*) AS deg FROM (
                    SELECT a AS node FROM e
                    UNION ALL SELECT b FROM e
                ) GROUP BY node
            )
            SELECT d.node, d.deg,
                   COALESCE(p.t, 0) AS triangles,
                   CASE WHEN d.deg >= 2 THEN
                       2.0 * CAST(COALESCE(p.t, 0) AS DOUBLE)
                       / (CAST(d.deg AS DOUBLE)
                          * (CAST(d.deg AS DOUBLE) - 1.0))
                   END AS clustering_coeff
            FROM deg d LEFT JOIN per p ON p.node = d.node
        """,
        "graph_kcore": _kcore_oracle(k=3, rounds=8),
        "active_users_sliding": """
            WITH act AS (
                SELECT DISTINCT user_id AS u,
                       CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
                FROM events
            ), ends AS (
                SELECT DISTINCT u, d + to_days(CAST(o AS INTEGER)) AS e
                FROM act, (SELECT unnest(generate_series(0, 6)) AS o)
            ), wau AS (
                SELECT e, count(*) AS wau FROM ends GROUP BY e
            ), dau AS (
                SELECT d AS e, count(*) AS dau FROM act GROUP BY d
            )
            SELECT dau.e AS day, dau.dau, wau.wau,
                   CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE)
                       AS stickiness
            FROM dau JOIN wau ON wau.e = dau.e
        """,
        "quantile_normalize": """
            WITH g AS (
                SELECT quantile_cont(l_extendedprice, [0.0, 0.01, 0.02, 0.03, 0.04, 0.05, 0.06, 0.07, 0.08, 0.09, 0.1, 0.11, 0.12, 0.13, 0.14, 0.15, 0.16, 0.17, 0.18, 0.19, 0.2, 0.21, 0.22, 0.23, 0.24, 0.25, 0.26, 0.27, 0.28, 0.29, 0.3, 0.31, 0.32, 0.33, 0.34, 0.35, 0.36, 0.37, 0.38, 0.39, 0.4, 0.41, 0.42, 0.43, 0.44, 0.45, 0.46, 0.47, 0.48, 0.49, 0.5, 0.51, 0.52, 0.53, 0.54, 0.55, 0.56, 0.57, 0.58, 0.59, 0.6, 0.61, 0.62, 0.63, 0.64, 0.65, 0.66, 0.67, 0.68, 0.69, 0.7, 0.71, 0.72, 0.73, 0.74, 0.75, 0.76, 0.77, 0.78, 0.79, 0.8, 0.81, 0.82, 0.83, 0.84, 0.85, 0.86, 0.87, 0.88, 0.89, 0.9, 0.91, 0.92, 0.93, 0.94, 0.95, 0.96, 0.97, 0.98, 0.99, 1.0]) AS gr
                FROM lineitem
            ), r AS (
                SELECT l_orderkey, l_linenumber, l_returnflag,
                       l_extendedprice,
                       percent_rank() OVER (PARTITION BY l_returnflag
                           ORDER BY l_extendedprice) AS p
                FROM lineitem
            )
            SELECT r.l_orderkey, r.l_linenumber, r.l_returnflag,
                   r.l_extendedprice,
                   CASE WHEN CAST(floor(p * 100) AS INT) >= 100
                        THEN gr[101]
                        ELSE gr[CAST(floor(p * 100) AS INT) + 1]
                             + (p * 100 - floor(p * 100))
                               * (gr[CAST(floor(p * 100) AS INT) + 2]
                                  - gr[CAST(floor(p * 100) AS INT) + 1])
                   END AS l_extendedprice_qnorm
            FROM r, g
        """,
        "shipping_priority": """
            SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
                   CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(30,6))) AS DOUBLE) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
              AND l.l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
            ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
            LIMIT 10
        """,
        "returned_items": """
            SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
                   CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(30,6))) AS DOUBLE) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE l.l_returnflag = 'R'
              AND o.o_orderdate >= TIMESTAMP '1995-07-01'
              AND o.o_orderdate < TIMESTAMP '1995-10-01'
            GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20
        """,
        "survival_curve": """
            WITH su AS (
                SELECT user_id, min(ts) AS t0 FROM events
                WHERE event_type = 'signup' GROUP BY user_id
            ), pu AS (
                SELECT e.user_id, min(e.ts) AS tp
                FROM events e JOIN su USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts >= su.t0
                GROUP BY e.user_id
            ), mx AS (
                SELECT max(ts) AS tmax FROM events
            ), subj AS (
                SELECT su.user_id,
                       COALESCE(epoch_us(pu.tp), epoch_us(mx.tmax))
                           - epoch_us(su.t0) AS dur,
                       pu.tp IS NOT NULL AS ev
                FROM su LEFT JOIN pu USING (user_id) CROSS JOIN mx
            ), per AS (
                SELECT dur AS t, count(*) AS c_all,
                       CAST(sum(CASE WHEN ev THEN 1 ELSE 0 END)
                            AS BIGINT) AS d
                FROM subj GROUP BY dur
            ), cum AS (
                SELECT t, c_all, d,
                       CAST((SELECT count(*) FROM subj)
                            - COALESCE(sum(c_all) OVER (ORDER BY t
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
                FROM per
            ), logd AS (
                SELECT t, n_risk, d,
                       CASE WHEN d > 0 AND n_risk > d
                            THEN CAST(ln(CAST(n_risk - d AS DOUBLE)
                                         / CAST(n_risk AS DOUBLE))
                                      AS DECIMAL(28,12))
                            ELSE CAST(0 AS DECIMAL(28,12)) END AS term,
                       CASE WHEN n_risk = d THEN 1 ELSE 0 END AS z
                FROM cum
            ), curve AS (
                SELECT t, n_risk, d,
                       CASE WHEN CAST(sum(z) OVER w AS BIGINT) = 0
                            THEN CAST(sum(term) OVER w AS DOUBLE)
                       END AS log_survival
                FROM logd
                WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW)
            )
            SELECT t, n_risk, d AS n_events, log_survival,
                   COALESCE(exp(log_survival), 0.0) AS survival
            FROM curve WHERE d > 0
        """,
        "score_auc": """
            WITH rows AS (
                SELECT l_discount AS s,
                       CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
                FROM lineitem WHERE l_discount IS NOT NULL
            ), per AS (
                SELECT s, count(*) AS c,
                       CAST(sum(y) AS BIGINT) AS p
                FROM rows GROUP BY s
            ), r AS (
                SELECT s, c, p,
                       CAST(COALESCE(sum(c) OVER (ORDER BY s
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS BIGINT) AS bef
                FROM per
            ), agg AS (
                SELECT CAST(sum(p * (2 * (bef + 1) + (c - 1)))
                            AS BIGINT) AS rs2,
                       CAST(sum(p) AS BIGINT) AS np,
                       CAST(sum(c - p) AS BIGINT) AS nn
                FROM r
            )
            SELECT CASE WHEN np > 0 AND nn > 0 THEN
                       (CAST(rs2 AS DOUBLE) / 2.0
                        - CAST(np * (np + 1) AS DOUBLE) / 2.0)
                       / CAST(np * nn AS DOUBLE)
                   END AS auc,
                   np AS n_pos, nn AS n_neg
            FROM agg
        """,
        "calibration_bins": """
            WITH rows AS (
                SELECT o_totalprice AS s,
                       CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END AS y,
                       o_orderkey AS k
                FROM orders WHERE o_totalprice IS NOT NULL
            ), b AS (
                SELECT s, y,
                       CAST(ntile(10) OVER (ORDER BY s, k) AS INT) AS bin
                FROM rows
            )
            SELECT bin, count(*) AS n,
                   CAST(sum(CAST(s AS DECIMAL(30,6))) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS mean_score,
                   CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                       AS frac_positive
            FROM b GROUP BY bin
        """,
        "psi_drift": """
            WITH base AS (
                SELECT l_extendedprice AS v FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1995-01-01'
                  AND l_shipdate < TIMESTAMP '1996-01-01'
                  AND l_extendedprice IS NOT NULL
            ), cur AS (
                SELECT l_extendedprice AS v FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1998-01-01'
                  AND l_shipdate < TIMESTAMP '1999-01-01'
                  AND l_extendedprice IS NOT NULL
            ), g AS (
                SELECT quantile_cont(v, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS gr FROM base
            ), nb AS (
                SELECT CAST(length(list_filter(g.gr, x -> b.v > x))
                            AS INT) AS bucket,
                       count(*) AS n_base
                FROM base b, g GROUP BY 1
            ), nc AS (
                SELECT CAST(length(list_filter(g.gr, x -> c.v > x))
                            AS INT) AS bucket,
                       count(*) AS n_current
                FROM cur c, g GROUP BY 1
            ), j AS (
                SELECT COALESCE(nb.bucket, nc.bucket) AS bucket,
                       COALESCE(n_base, 0) AS n_base,
                       COALESCE(n_current, 0) AS n_current
                FROM nb FULL JOIN nc ON nb.bucket = nc.bucket
            ), t AS (
                SELECT bucket, n_base, n_current,
                       CAST(sum(n_base) OVER () AS BIGINT) AS tb,
                       CAST(sum(n_current) OVER () AS BIGINT) AS tc
                FROM j
            ), per AS (
                SELECT bucket, n_base, n_current,
                       CAST(n_base AS DOUBLE) / CAST(tb AS DOUBLE)
                           AS frac_base,
                       CAST(n_current AS DOUBLE) / CAST(tc AS DOUBLE)
                           AS frac_current,
                       CASE WHEN n_base > 0 AND n_current > 0 THEN
                           (CAST(n_base AS DOUBLE) / CAST(tb AS DOUBLE)
                            - CAST(n_current AS DOUBLE)
                              / CAST(tc AS DOUBLE))
                           * ln((CAST(n_base AS DOUBLE)
                                 / CAST(tb AS DOUBLE))
                                / (CAST(n_current AS DOUBLE)
                                   / CAST(tc AS DOUBLE)))
                       END AS psi_term
                FROM t
            )
            SELECT bucket, n_base, n_current, frac_base, frac_current,
                   psi_term
            FROM per
            UNION ALL
            SELECT -1, CAST(sum(n_base) AS BIGINT),
                   CAST(sum(n_current) AS BIGINT),
                   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                   CAST(sum(CAST(psi_term AS DECIMAL(28,12)))
                        AS DOUBLE)
            FROM per
        """,
        "revenue_acf": """
            WITH d AS MATERIALIZED (
                SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS dd,
                       CAST(sum(CAST(value AS DECIMAL(30,6)))
                            AS DOUBLE) / 10000.0 AS x,
                       CAST(sum(CAST(value AS DECIMAL(30,6)))
                            AS DOUBLE) / 10000.0 AS y
                FROM events GROUP BY 1
            ), lags AS (
                SELECT unnest(generate_series(0, 7)) AS lag
            ), paired AS (
                SELECT l.lag, a.x AS xx, b.y AS yy
                FROM d a CROSS JOIN lags l
                JOIN d b ON b.dd = a.dd + l.lag * INTERVAL 1 DAY
            ), agg AS (
                SELECT lag, count(*) AS n,
                       CAST(sum(CAST(round(xx * 1000000.0) AS BIGINT))
                            AS DOUBLE) / 1000000.0 AS sx,
                       CAST(sum(CAST(round(yy * 1000000.0) AS BIGINT))
                            AS DOUBLE) / 1000000.0 AS sy,
                       CAST(sum(CAST(round(xx * yy * 1000000.0)
                                     AS BIGINT))
                            AS DOUBLE) / 1000000.0 AS sxy,
                       CAST(sum(CAST(round(xx * xx * 1000000.0)
                                     AS BIGINT))
                            AS DOUBLE) / 1000000.0 AS sxx,
                       CAST(sum(CAST(round(yy * yy * 1000000.0)
                                     AS BIGINT))
                            AS DOUBLE) / 1000000.0 AS syy
                FROM paired GROUP BY lag
            ), c AS (
                SELECT l.lag, coalesce(a.n, 0) AS n,
                       CAST(a.n AS DOUBLE) AS nd, sx, sy, sxy, sxx, syy
                FROM lags l LEFT JOIN agg a ON a.lag = l.lag
            )
            SELECT CAST(lag AS INT) AS lag, n,
                   CASE WHEN n >= 3
                             AND sxx / nd - (sx / nd) * (sx / nd) > 0
                             AND syy / nd - (sy / nd) * (sy / nd) > 0
                        THEN (sxy / nd - (sx / nd) * (sy / nd))
                             / sqrt((sxx / nd - (sx / nd) * (sx / nd))
                                    * (syy / nd - (sy / nd) * (sy / nd)))
                   END AS corr
            FROM c
        """,
        "click_purchase_xcorr": """
            WITH d AS MATERIALIZED (
                SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS dd,
                       CAST(sum(CAST(CASE WHEN event_type = 'click' THEN 1.0 ELSE 0.0 END AS DECIMAL(30,6)))
                            AS DOUBLE) / 10000.0 AS x,
                       CAST(sum(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(30,6)))
                            AS DOUBLE) / 10000.0 AS y
                FROM events GROUP BY 1
            ), lags AS (
                SELECT unnest(generate_series(0, 5)) AS lag
            ), paired AS (
                SELECT l.lag, a.x AS xx, b.y AS yy
                FROM d a CROSS JOIN lags l
                JOIN d b ON b.dd = a.dd + l.lag * INTERVAL 1 DAY
            ), agg AS (
                SELECT lag, count(*) AS n,
                       CAST(sum(CAST(round(xx * 1000000.0) AS BIGINT))
                            AS DOUBLE) / 1000000.0 AS sx,
                       CAST(sum(CAST(round(yy * 1000000.0) AS BIGINT))
                            AS DOUBLE) / 1000000.0 AS sy,
                       CAST(sum(CAST(round(xx * yy * 1000000.0)
                                     AS BIGINT))
                            AS DOUBLE) / 1000000.0 AS sxy,
                       CAST(sum(CAST(round(xx * xx * 1000000.0)
                                     AS BIGINT))
                            AS DOUBLE) / 1000000.0 AS sxx,
                       CAST(sum(CAST(round(yy * yy * 1000000.0)
                                     AS BIGINT))
                            AS DOUBLE) / 1000000.0 AS syy
                FROM paired GROUP BY lag
            ), c AS (
                SELECT l.lag, coalesce(a.n, 0) AS n,
                       CAST(a.n AS DOUBLE) AS nd, sx, sy, sxy, sxx, syy
                FROM lags l LEFT JOIN agg a ON a.lag = l.lag
            )
            SELECT CAST(lag AS INT) AS lag, n,
                   CASE WHEN n >= 3
                             AND sxx / nd - (sx / nd) * (sx / nd) > 0
                             AND syy / nd - (sy / nd) * (sy / nd) > 0
                        THEN (sxy / nd - (sx / nd) * (sy / nd))
                             / sqrt((sxx / nd - (sx / nd) * (sx / nd))
                                    * (syy / nd - (sy / nd) * (sy / nd)))
                   END AS corr
            FROM c
        """,
        "outlier_ensemble": """
            WITH s1 AS (
                SELECT l_returnflag,
                       quantile_cont(l_extendedprice, 0.25) AS q1,
                       quantile_cont(l_extendedprice, 0.75) AS q3,
                       quantile_cont(l_extendedprice, 0.5) AS med,
                       quantile_cont(l_extendedprice, 0.005) AS plo,
                       quantile_cont(l_extendedprice, 0.995) AS phi
                FROM lineitem GROUP BY 1
            ), wm AS (
                SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
                       l.l_extendedprice AS v,
                       s1.q1, s1.q3, s1.med, s1.plo, s1.phi
                FROM lineitem l JOIN s1 USING (l_returnflag)
            ), mad AS (
                SELECT l_returnflag,
                       quantile_cont(abs(v - med), 0.5) AS madv
                FROM wm GROUP BY 1
            ), f AS (
                SELECT wm.l_orderkey, wm.l_linenumber, wm.l_returnflag,
                       wm.v,
                       (wm.v < wm.q1 - 1.5 * (wm.q3 - wm.q1))
                       OR (wm.v > wm.q3 + 1.5 * (wm.q3 - wm.q1))
                           AS flag_iqr,
                       CASE WHEN mad.madv > 0
                            THEN 0.6745 * abs(wm.v - wm.med) / mad.madv
                                 > 3.5
                            ELSE FALSE END AS flag_mad,
                       (wm.v < wm.plo) OR (wm.v > wm.phi) AS flag_extreme
                FROM wm JOIN mad USING (l_returnflag)
            ), v AS (
                SELECT l_orderkey, l_linenumber, l_returnflag,
                       v AS value, flag_iqr, flag_mad, flag_extreme,
                       CAST(flag_iqr AS INT) + CAST(flag_mad AS INT)
                           + CAST(flag_extreme AS INT) AS votes
                FROM f
            )
            SELECT l_orderkey, l_linenumber, l_returnflag, value,
                   flag_iqr, flag_mad, flag_extreme, votes,
                   votes >= 2 AS is_outlier
            FROM v WHERE votes >= 1
        """,
        "holt_winters": _holt_winters_oracle(
            m=7, alpha=0.5, beta=0.3, gamma=0.2, horizon=14
        ),
        "winsorize_prices": """
            WITH b AS (
                SELECT l_returnflag,
                       quantile_cont(l_extendedprice, 0.05) AS lo,
                       quantile_cont(l_extendedprice, 0.95) AS hi
                FROM lineitem GROUP BY l_returnflag
            )
            SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
                   l.l_extendedprice,
                   CASE WHEN l.l_extendedprice < b.lo THEN b.lo
                        WHEN l.l_extendedprice > b.hi THEN b.hi
                        ELSE l.l_extendedprice
                   END AS l_extendedprice_winsorized
            FROM lineitem l JOIN b USING (l_returnflag)
        """,
        "funnel_windowed": """
            WITH s0 AS (
                SELECT user_id, min(ts) AS t0 FROM events
                WHERE event_type = 'signup' GROUP BY user_id
            ), s1 AS (
                SELECT e.user_id, s0.t0, min(e.ts) AS t1
                FROM events e JOIN s0 ON e.user_id = s0.user_id
                WHERE e.event_type = 'click' AND e.ts >= s0.t0
                  AND e.ts <= s0.t0 + INTERVAL 86400 SECOND
                GROUP BY e.user_id, s0.t0
            ), s2 AS (
                SELECT e.user_id, min(e.ts) AS t2
                FROM events e JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'purchase' AND e.ts >= s1.t1
                  AND e.ts <= s1.t0 + INTERVAL 86400 SECOND
                GROUP BY e.user_id
            )
            SELECT 0 AS step_index, 'signup' AS step_name,
                   (SELECT count(*) FROM s0) AS users
            UNION ALL
            SELECT 1, 'click', (SELECT count(*) FROM s1)
            UNION ALL
            SELECT 2, 'purchase', (SELECT count(*) FROM s2)
        """,
    }
