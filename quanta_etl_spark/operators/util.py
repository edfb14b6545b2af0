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
    input rows; it is counted (a global aggregate — always exactly one
    row, even over an empty input) and the count row is checked behind
    an ``assert_true`` filter, then reduced to ZERO rows and unioned
    IN FRONT of ``result``. The union forces Spark to execute the
    guard branch regardless of how many rows ``result`` produces — an
    earlier broadcast-join formulation short-circuited on an empty
    ``result`` plan and the assertion never evaluated (ADVICE r8) —
    and the guard side comes FIRST because limit-style actions
    (``take``/``show``/``limit``) evaluate union partitions in order
    and stop once the limit is satisfied: with the guard appended
    last, ``strict=True`` silently no-opped under ``take(n)`` when the
    result partitions alone covered n (r9 self-review). ``take(0)`` /
    ``limit(0)`` still skip the guard — Spark plans an empty relation
    without scanning anything. No eager action here, and the result
    plan is untouched when the guard isn't attached. Cost: one extra
    scan of the guarded input — strict is an opt-in integrity mode.
    """
    from pyspark.sql import functions as F

    guard = excluded.agg(F.count(F.lit(1)).alias("__nexcl"))
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
    # After the assert passes, __nexcl == 0 necessarily holds, so the
    # second predicate drops the count row and the union contributes
    # nothing. When __nexcl > 0 the conjunction cannot resolve without
    # evaluating the assert (its companion is true), so the raise fires
    # under either predicate evaluation order.
    empty_when_ok = guard.where(check).where(F.col("__nexcl") != 0)
    zero_rows = empty_when_ok.select(
        *[
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in result.schema.fields
        ]
    )
    return zero_rows.unionByName(result)


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
