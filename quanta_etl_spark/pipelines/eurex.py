"""Eurex derivatives pipeline — re-design of the reference's
``process_eurex_data`` (/root/reference/dags/spark/etl.py:65-175).

Reference behavior re-expressed with intended types and the
anti-patterns fixed:

* ``trading_ts`` TimestampType, ``maturity_date`` DateType (the
  reference's date_format wrappers at etl.py:102-111 emit strings —
  SURVEY.md §1.4).
* The product-spec dimension join (etl.py:160-164) carries an explicit
  ``broadcast`` hint: 2,728 dim rows vs an unbounded fact side.
* The frame is ``persist()``-ed before the multi-sink fan-out — the
  reference recomputes the full scan+join for each of its three write
  actions (etl.py:162-175, SURVEY.md §3.4).
* Quality checks (missing_isin / missing_underlying, etl.py:166-168)
  come from the generic ``offenders`` operator.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quanta_etl_spark.operators.joins import broadcast_dim_join
from quanta_etl_spark.operators.quality import offenders
from quanta_etl_spark.pipelines.xetra import with_trading_ts
from quanta_etl_spark.schemas import EUREX_SCHEMA, PRODUCT_SPEC_SCHEMA
from quanta_etl_spark.sources.readers import read_csv, write_partitioned_parquet

# Dimension columns consumed by the enrichment (reference etl.py:160-161).
DIM_COLS = ["product_name", "product_type", "underlying_name", "underlying_category"]


def with_maturity(df: DataFrame) -> DataFrame:
    """Maturity derivations (reference etl.py:108-126):
    maturity_string "yyyyMMdd" → DateType maturity_date → day count from
    trading_date → months via the reference's literal /30.5."""
    return (
        df.withColumn("maturity_date", F.to_date("maturity_string", "yyyyMMdd"))
        .withColumn(
            "maturity_days",
            F.datediff(F.col("maturity_date"), F.col("trading_date")),
        )
        .withColumn("maturity_months", F.col("maturity_days") / 30.5)
    )


def load_eurex(spark: SparkSession, path: str) -> DataFrame:
    return read_csv(spark, path, EUREX_SCHEMA)


def load_product_spec(spark: SparkSession, path: str) -> DataFrame:
    """Dimension CSV (reference etl.py:158): positional header bind maps
    header ``Product,Name,Product ISIN,…`` onto our field names."""
    return read_csv(spark, path, PRODUCT_SPEC_SCHEMA)


def enrich_with_product_spec(df: DataFrame, dim: DataFrame) -> DataFrame:
    """Left join on market_segment with broadcast (reference etl.py:160-164)."""
    return broadcast_dim_join(df, dim, "market_segment", "left", DIM_COLS)


@dataclass
class EurexResult:
    enriched: DataFrame
    missing_isin: DataFrame
    missing_underlying: DataFrame


def process_eurex(
    spark: SparkSession,
    input_path: str,
    dim_path: str,
    output_path: str | None = None,
) -> EurexResult:
    """scan → trading_ts → maturity → dim join → quality checks →
    (optionally) 3 partitioned sinks off ONE persisted lineage."""
    df = enrich_with_product_spec(
        with_maturity(with_trading_ts(load_eurex(spark, input_path))),
        load_product_spec(spark, dim_path),
    )
    missing_isin = offenders(df, F.col("isin").isNull(), ["market_segment", "mleg"])
    missing_underlying = offenders(
        df, F.col("underlying_symbol").isNull(), ["market_segment", "mleg"]
    )
    if output_path is not None:
        df = df.persist()
        try:
            write_partitioned_parquet(df, f"{output_path}/eurex", "trading_date")
            write_partitioned_parquet(
                missing_isin, f"{output_path}/missing_isin", "market_segment"
            )
            write_partitioned_parquet(
                missing_underlying,
                f"{output_path}/missing_underlying",
                "market_segment",
            )
        finally:
            df.unpersist()
    return EurexResult(df, missing_isin, missing_underlying)


def join_derivative_to_underlying(
    eurex: DataFrame, xetra: DataFrame
) -> DataFrame:
    """The documented derivative↔underlying 2-key equi-join (reference
    README.md:175-176): eurex.underlying_isin = xetra.isin AND
    eurex.trading_ts = xetra.trading_ts. Inner join; at scale both
    sides bucket by isin to keep the shuffle one-pass."""
    x = xetra.select(
        F.col("isin").alias("u_isin"),
        F.col("trading_ts").alias("u_ts"),
        F.col("end_price").alias("underlying_end_price"),
        F.col("traded_volume").alias("underlying_traded_volume"),
    )
    return eurex.join(
        x,
        (eurex.underlying_isin == x.u_isin) & (eurex.trading_ts == x.u_ts),
        "inner",
    ).drop("u_isin", "u_ts")
