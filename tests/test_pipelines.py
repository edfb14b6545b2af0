"""End-to-end golden tests of the rebuilt reference pipelines over the
reference's own sample data (read-only at /root/reference/sample-data;
row counts per SURVEY.md §5: xetra 15,057, eurex 3,546, dim 2,728)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from quanta_etl_spark.pipelines import eurex as EX
from quanta_etl_spark.pipelines import xetra as XT

SAMPLE = "/root/reference/sample-data"
XETRA_CSV = f"{SAMPLE}/2020-11-24_BINS_XETR08.csv"
EUREX_CSV = f"{SAMPLE}/2020-11-24_BINS_XEUR08.csv"
DIM_CSV = "/root/reference/dags/dimension_data/eurex_product_specification.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(XETRA_CSV), reason="reference sample data unavailable"
)


def test_xetra_pipeline_golden(spark, tmp_path):
    out = XT.process_xetra(spark, XETRA_CSV, str(tmp_path / "xetra"))
    assert out.count() == 15057
    # positional header bind: CSV header ISIN,... lands in field isin
    row = out.where(F.col("mnemonic") == "SANT").orderBy("trading_time").first()
    assert row.isin == "AT0000A0E9W5"
    # typed derivation: real timestamp, hour-08 file
    assert isinstance(row.trading_ts, dt.datetime)
    assert row.trading_ts.hour == 8
    # reference-format string view
    sref = XT.as_reference_strings(out).where(F.col("mnemonic") == "SANT")
    assert sref.first().trading_ts.startswith("2020-11-24 08:")
    # partitioned parquet sink round-trips
    back = spark.read.parquet(str(tmp_path / "xetra"))
    assert back.count() == 15057
    assert any(f.name.startswith("trading_date=") for f in (tmp_path / "xetra").iterdir())


def test_eurex_pipeline_golden(spark):
    res = EX.process_eurex(spark, EUREX_CSV, DIM_CSV)
    df = res.enriched
    assert df.count() == 3546
    # dimension enrichment (positional bind of 25-col dim; 2,729 data
    # rows — the file's last line has no trailing newline, so wc -l
    # undercounts by one vs the actual data rows)
    assert EX.load_product_spec(spark, DIM_CSV).count() == 2729
    enriched = df.where(F.col("product_name").isNotNull())
    assert enriched.count() > 0
    # maturity semantics: date-typed, days/months arithmetic
    r = df.where(F.col("maturity_string") == "20201218").first()
    assert r.maturity_date == dt.date(2020, 12, 18)
    assert r.maturity_days == (dt.date(2020, 12, 18) - dt.date(2020, 11, 24)).days
    assert r.maturity_months == pytest.approx(r.maturity_days / 30.5)


def test_eurex_quality_checks_match_reference_shape(spark):
    res = EX.process_eurex(spark, EUREX_CSV, DIM_CSV)
    for qc in (res.missing_isin, res.missing_underlying):
        assert qc.columns == ["market_segment", "mleg"]
        # distinct: no duplicate offender pairs
        assert qc.count() == qc.dropDuplicates().count()


def test_derivative_underlying_join(spark):
    xetra = XT.process_xetra(spark, XETRA_CSV)
    res = EX.process_eurex(spark, EUREX_CSV, DIM_CSV)
    joined = EX.join_derivative_to_underlying(res.enriched, xetra)
    n = joined.count()
    assert n > 0  # sample hour has overlapping (underlying_isin, minute) pairs
    assert "underlying_end_price" in joined.columns
    # inner-join semantics: rows with null underlying_isin are dropped
    assert joined.where(F.col("underlying_isin").isNull()).count() == 0


# README.md:120-171 data-model tables, name → Spark simpleString.
_README_XETRA = {
    "isin": "string", "mnemonic": "string",
    "security_description": "string", "security_type": "string",
    "currency": "string", "security_id": "string",
    "trading_date": "date", "trading_time": "string",
    "start_price": "double", "max_price": "double",
    "min_price": "double", "end_price": "double",
    "traded_volume": "bigint", "number_of_trades": "bigint",
    "trading_ts": "timestamp",
}
_README_EUREX = {
    "isin": "string", "market_segment": "string",
    "underlying_symbol": "string", "underlying_isin": "string",
    "currency": "string", "security_type": "string",
    "maturity_string": "string", "strike_price": "double",
    "put_or_call": "string", "mleg": "string",
    "contract_generation_number": "int", "security_id": "string",
    "trading_date": "date", "trading_time": "string",
    "start_price": "double", "max_price": "double",
    "min_price": "double", "end_price": "double",
    "number_of_contracts": "bigint", "number_of_trades": "bigint",
    "trading_ts": "timestamp", "maturity_date": "date",
    # README says LongType; datediff is int — documented divergence
    # (narrower, lossless: day counts fit int), pipelines/eurex.py
    "maturity_days": "int",
    "maturity_months": "double", "product_name": "string",
    "product_type": "string", "underlying_name": "string",
    "underlying_category": "string",
}


def test_pipeline_schemas_match_reference_data_model(spark):
    """Golden schema check against the reference README's data-model
    tables (README.md:120-171): every documented column exists with
    the documented type — name→type equality, order-insensitive
    (the one divergence, maturity_days int vs Long, is annotated
    above)."""
    x = XT.process_xetra(spark, XETRA_CSV)
    got_x = {f.name: f.dataType.simpleString() for f in x.schema.fields}
    assert got_x == _README_XETRA
    res = EX.process_eurex(spark, EUREX_CSV, DIM_CSV)
    got_e = {
        f.name: f.dataType.simpleString() for f in res.enriched.schema.fields
    }
    assert got_e == _README_EUREX


def test_job_registry_runs_reference_main(spark, tmp_path):
    """The job registry's full_etl mirrors the reference main():
    both pipelines run sequentially to partitioned parquet."""
    import os

    from quanta_etl_spark import jobs

    assert set(jobs.available_jobs()) >= {"xetra", "eurex", "full_etl"}
    out = str(tmp_path / "etl_out")
    jobs.get_job("full_etl")(
        spark,
        input=XETRA_CSV,
        eurex_input=EUREX_CSV,
        dim_input=DIM_CSV,
        output=out,
    )
    x = spark.read.parquet(f"{out}/xetra")
    # eurex_job's output dir holds the fact + the two quality reports
    e = spark.read.parquet(f"{out}/eurex/eurex")
    assert x.count() == 15057
    assert e.count() == 3546
    assert os.path.isdir(f"{out}/eurex/missing_isin")
    # hive-partitioned layout on trading_date (reference etl.py:62,171)
    assert any(
        d.startswith("trading_date=") for d in os.listdir(f"{out}/xetra")
    )
    with pytest.raises(KeyError):
        jobs.get_job("nope")
