"""Schema registry for the market-data model.

Re-expresses the reference's three hand-written StructTypes
(/root/reference/dags/spark/etl.py:33-48 xetra, :73-94 eurex,
:129-155 product spec) with the intended — not accidental — semantics
(SURVEY.md §1.4):

* every field is nullable=True (Spark file sources force nullability;
  the reference declared False and got True anyway),
* derived time columns are real TimestampType/DateType, not
  ``date_format`` strings.

CSV headers do NOT match these field names — the readers bind
positionally (header row is only skipped), exactly like the reference
(SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _schema(fields: list[tuple[str, object]]) -> StructType:
    return StructType([StructField(n, t(), True) for n, t in fields])


# Money as DECIMAL(18,4): exact cents, no binary-float drift in sums —
# SURVEY.md §1.2's cheap improvement over the reference's DoubleType
# prices (/root/reference/dags/spark/etl.py:42-45). 18 digits cover any
# realistic notional; scale 4 covers sub-cent ticks. Doubles stay the
# DEFAULT (the reference's published semantics, and what most contract
# queries oracle-check); wrap a schema in ``with_decimal_prices`` for
# the exact variant.
MONEY = DecimalType(18, 4)

_PRICE_FIELDS = frozenset(
    {"start_price", "max_price", "min_price", "end_price",
     "strike_price", "tick_size", "tick_value"}
)


def with_decimal_prices(schema: StructType) -> StructType:
    """The same schema with every price-typed column switched from
    DoubleType to DECIMAL(18,4)."""
    return StructType(
        [
            StructField(
                f.name,
                MONEY if f.name in _PRICE_FIELDS else f.dataType,
                f.nullable,
            )
            for f in schema.fields
        ]
    )




# Cash-market minute bars (etl.py:33-48). CSV header:
# ISIN,Mnemonic,SecurityDesc,SecurityType,Currency,SecurityID,Date,Time,
# StartPrice,MaxPrice,MinPrice,EndPrice,TradedVolume,NumberOfTrades
XETRA_SCHEMA = _schema(
    [
        ("isin", StringType),
        ("mnemonic", StringType),
        ("security_description", StringType),
        ("security_type", StringType),
        ("currency", StringType),
        ("security_id", StringType),
        ("trading_date", DateType),
        ("trading_time", StringType),  # "HH:mm"
        ("start_price", DoubleType),
        ("max_price", DoubleType),
        ("min_price", DoubleType),
        ("end_price", DoubleType),
        ("traded_volume", LongType),
        ("number_of_trades", LongType),
    ]
)

# Derivatives minute bars (etl.py:73-94). CSV column MaturityDate binds
# to maturity_string (yyyyMMdd string), per the reference.
EUREX_SCHEMA = _schema(
    [
        ("isin", StringType),
        ("market_segment", StringType),
        ("underlying_symbol", StringType),
        ("underlying_isin", StringType),
        ("currency", StringType),
        ("security_type", StringType),
        ("maturity_string", StringType),
        ("strike_price", DoubleType),
        ("put_or_call", StringType),
        ("mleg", StringType),
        ("contract_generation_number", IntegerType),
        ("security_id", StringType),
        ("trading_date", DateType),
        ("trading_time", StringType),
        ("start_price", DoubleType),
        ("max_price", DoubleType),
        ("min_price", DoubleType),
        ("end_price", DoubleType),
        ("number_of_contracts", LongType),
        ("number_of_trades", LongType),
    ]
)

# Eurex product-specification dimension (etl.py:129-155), keyed by
# market_segment; 25 columns. Broadcast-join candidate at any scale.
PRODUCT_SPEC_SCHEMA = _schema(
    [
        ("market_segment", StringType),
        ("product_name", StringType),
        ("product_isin", StringType),
        ("product_line", StringType),
        ("product_type", StringType),
        ("product_type_symbol", StringType),
        ("liquidity_class", StringType),
        ("trading_environment", StringType),
        ("partition", StringType),
        ("currency", StringType),
        ("us_approval_type", StringType),
        ("settlement_type", StringType),
        ("contract_size", LongType),
        ("tick_size", DoubleType),
        ("tick_value", DoubleType),
        ("max_order_qty_tsl", LongType),
        ("max_tes_qty_tsl", LongType),
        ("max_future_spread_qty_tsl", LongType),
        ("max_market_order_qty", LongType),
        ("position_limit", LongType),
        ("pre_trade_limits", StringType),
        ("underlying", StringType),
        ("underlying_isin", StringType),
        ("underlying_name", StringType),
        ("underlying_category", StringType),
    ]
)
