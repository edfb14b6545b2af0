"""Bucketed-table joins skip the shuffle (sources.write_bucketed_table).

This is the plan-level proof of the §7 scale play: two tables bucketed
on the join key with the same bucket count join with ZERO exchanges,
while the same join over plain parquet needs two.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quanta_etl_spark.plans import inspect as P
from quanta_etl_spark.sources.readers import write_bucketed_table
from quanta_etl_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # default session warehouse; DROP TABLE removes the managed files
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed_table(
        orders, "orders_b", "o_orderkey", 8, sort_by="o_orderkey"
    )
    write_bucketed_table(
        lineitem, "lineitem_b", "l_orderkey", 8, sort_by="l_orderkey"
    )
    yield spark.table("orders_b"), spark.table("lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _join(o, li):
    # disable broadcast so the join strategy (and its exchanges) is
    # driven purely by the physical layout
    return li.hint("merge").join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )


def test_bucketed_join_is_shuffle_free(spark, sf_dir, bucketed):
    o_b, li_b = bucketed
    assert P.count_shuffles(_join(o_b, li_b)) == 0

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    assert P.count_shuffles(_join(o, li)) == 2


def test_bucketed_join_result_matches_plain(spark, sf_dir, bucketed):
    o_b, li_b = bucketed
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    bucketed_sum = _join(o_b, li_b).agg(
        F.sum(F.col("l_quantity").cast("decimal(20,6)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    plain_sum = _join(o, li).agg(
        F.sum(F.col("l_quantity").cast("decimal(20,6)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert bucketed_sum == plain_sum


def test_bucketed_groupby_is_shuffle_free(bucketed):
    o_b, _ = bucketed
    agg = o_b.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    assert P.count_shuffles(agg) == 0
