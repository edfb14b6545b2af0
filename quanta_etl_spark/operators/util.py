"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Ensure full cluster parallelism before per-row heavy compute
    (signatures, vector math — CPU-bound expressions). A corpus read
    from few parquet files/row-groups otherwise runs on few tasks.
    Conditional: when the upstream layout is already parallel (the
    normal case at scale — a 100 TB scan has ~10^6 splits) this is a
    no-op, so the round-robin shuffle is only paid when it buys CPU."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
