"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def attach_exclusion_guard(
    result: DataFrame, excluded: DataFrame, op_name: str
) -> DataFrame:
    """Fail a lazy plan at EXECUTION time when any input row was
    silently excluded (VERDICT r7 #5 — ``strict=True`` on the decimal
    stat paths).

    ``excluded`` must be a frame whose rows are exactly the excluded
    input rows; it is counted and the 1-row count broadcast-joined
    onto ``result`` behind an ``assert_true`` column, so the check
    rides the same job (no eager action here, and the result plan is
    untouched when the guard isn't attached). Cost: one extra scan of
    the guarded input — strict is an opt-in integrity mode.
    """
    from pyspark.sql import functions as F

    guard = excluded.agg(F.count(F.lit(1)).alias("__nexcl")).select(
        F.col("__nexcl"), F.lit(1).alias("__gj")
    )
    # The assertion lives in a FILTER predicate (assert_true returns
    # NULL when the condition holds, raises otherwise): a filter can't
    # be column-pruned away, whereas an unused assert_true column in a
    # select is — the optimizer silently dropped the first version.
    check = F.assert_true(
        F.col("__nexcl") == 0,
        F.concat(
            F.lit(f"{op_name}: strict=True and "),
            F.col("__nexcl").cast("string"),
            F.lit(
                " row(s) were excluded from the fit (value beyond "
                "the exact-decimal input range |x| < 1e12); rescale "
                "the inputs or drop strict to accept the smaller n"
            ),
        ),
    ).isNull()
    cols = result.columns
    return (
        result.withColumn("__gj", F.lit(1))
        .join(F.broadcast(guard), "__gj")
        .where(check)
        .select(*cols)
    )


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
