"""Data-quality assertion operators.

Generalizes the reference's two hand-rolled null-check queries
(/root/reference/dags/spark/etl.py:166-175: filter IS NULL → select
keys → dropDuplicates → write) into a reusable ``expect`` surface, and
adds the pass/fail semantics the reference lacks (its checks were pure
observability — nothing failed on violations, SURVEY.md §5).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .util import join_group_stats, quote_col


def offenders(
    df: DataFrame, predicate: Column | str, keys: Sequence[str]
) -> DataFrame:
    """Distinct key combinations violating a rule — the reference's
    `missing_isin` / `missing_underlying` shape (etl.py:167-168).
    ``predicate`` selects the BAD rows."""
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    return df.where(pred).select(*keys).dropDuplicates()


@dataclass
class CheckResult:
    name: str
    violations: int
    passed: bool


def expect(
    df: DataFrame,
    predicate: Column | str,
    name: str = "check",
    max_violations: int = 0,
) -> CheckResult:
    """Assert that no more than ``max_violations`` rows violate the rule.
    ``predicate`` states what GOOD rows satisfy. Single count action."""
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    n = df.where(~pred | pred.isNull()).count()
    return CheckResult(name=name, violations=n, passed=n <= max_violations)


def expect_unique(df: DataFrame, keys: Sequence[str], name: str = "unique") -> CheckResult:
    """Key-uniqueness check: one aggregation, counts keys seen >1 time."""
    dup = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1)
        .count()
    )
    return CheckResult(name=name, violations=dup, passed=dup == 0)


def null_report(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column null counts in ONE aggregation pass (no per-column jobs)."""
    cols = list(cols or df.columns)
    return df.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
    )


def profile_columns(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """One-pass column profile: per column, row count, null count,
    exact distinct count, and min/max (stringified so heterogeneous
    column types share one output schema). The profiling workhorse for
    landing unknown data — schema drift, null floods, and cardinality
    surprises all show up here before they break a pipeline.

    Plan shape: ONE aggregation over the scan computes every statistic
    (count/sum are map-side partial; count(DISTINCT c1), count(DISTINCT
    c2)… expand to a single multi-distinct aggregate), then a map-side
    ``inline`` of a struct array unpivots the single result row to one
    row per column — no per-column jobs, no driver loop. Built entirely
    from typed Column APIs with positional internal aliases (ADVICE
    r5): column names containing spaces, dots, quotes, or backticks
    never reach a SQL parser, so any legal parquet name profiles
    correctly.

    ``exact_distinct=False`` swaps ``count_distinct`` for HLL
    ``approx_count_distinct`` — at 100 TB the exact multi-distinct's
    Expand (one duplicated row per profiled column) is the dominant
    cost, while the sketch keeps the aggregate a plain single-pass
    partial/final with O(1) state per column. Use approx for wide
    profiling sweeps; exact when the distinct count feeds a decision.

    Hash-vs-sort split (r13, guide §5 "hash aggregate vs sort
    aggregate"): ``min``/``max`` over a STRING/BINARY/complex column
    carries an immutable aggregation buffer, and ONE such function
    demotes the ENTIRE aggregate node — including the ×(cols+1)
    Expand of the multi-distinct — from HashAggregate to
    SortAggregate (full sort of the expanded scan; measured 1.9s vs
    0.35s on the 150k-row gated orders profile). Variable-width
    min/max are therefore computed in a separate 1-row aggregate over
    just those columns (no Expand, sorts only |string cols| values
    per row) and broadcast-crossJoined back; every fixed-width
    statistic stays in the hash path. Results are byte-identical —
    the same aggregate functions run, only the node placement moves."""
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        MapType,
        StringType,
        StructType,
    )

    cols = list(cols or df.columns)
    n_distinct = F.count_distinct if exact_distinct else F.approx_count_distinct
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    def _sort_forcing(c: str) -> bool:
        return isinstance(
            dtypes.get(c),
            (StringType, BinaryType, ArrayType, MapType, StructType),
        )

    aggs = []
    side_aggs = []
    for i, c in enumerate(cols):
        src = quote_col(c)
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{i}"),
            F.sum(src.isNull().cast("long")).alias(f"__null_{i}"),
            n_distinct(src).alias(f"__dist_{i}"),
        ]
        minmax = side_aggs if _sort_forcing(c) else aggs
        minmax += [
            F.min(src).cast("string").alias(f"__min_{i}"),
            F.max(src).cast("string").alias(f"__max_{i}"),
        ]
    one = df.agg(*aggs)
    if side_aggs:
        one = one.crossJoin(
            F.broadcast(
                df.select(
                    *[quote_col(c) for c in cols if _sort_forcing(c)]
                ).agg(*side_aggs)
            )
        )
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__n_{i}").alias("n_rows"),
                F.col(f"__null_{i}").alias("n_null"),
                F.col(f"__dist_{i}").alias("n_distinct"),
                F.col(f"__min_{i}").alias("min_str"),
                F.col(f"__max_{i}").alias("max_str"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return one.select(F.inline(rows))


def impute_group_mean(
    df: DataFrame, value: str, by: Sequence[str], out_col: str | None = None
) -> DataFrame:
    """Fill nulls with the GROUP mean (per-key imputation — the global
    ``fillna`` is a special case with by=[]). One aggregation + one
    broadcast-able join; means come from non-null rows only.

    At scale this is the shape you want: the per-group mean table is
    |groups| rows (tiny next to the data) and the join key is the
    grouping key the data is often already partitioned by.

    The mean is computed as exact-decimal total / non-null count (not
    ``F.avg`` — r13, found by the sf100 sampled differential): a
    double-accumulated avg over tens of millions of rows per group is
    partition-order-dependent in its last ulps, and because EVERY
    imputed row in the group carries the same mean, a single half-ulp
    difference at the 6-decimal rounding boundary flips millions of
    output rows at once. The decimal fold is order-independent (same
    result on any cluster layout) and casts to the correctly-rounded
    double."""
    out_col = out_col or value
    n = F.count(F.col(value))
    s = F.sum(F.col(value).cast("decimal(30,6)")).cast("double")
    means = df.groupBy(*by).agg(
        F.when(n > 0, s / n).alias("__grp_mean")
    )
    joined = join_group_stats(df, means, by)
    return joined.withColumn(
        out_col, F.coalesce(F.col(value), F.col("__grp_mean"))
    ).drop("__grp_mean")


def iqr_outliers(
    df: DataFrame,
    value: str,
    by: Sequence[str],
    k: float = 1.5,
    mode: str = "flag",
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Tukey-fence outlier detection per group: a row is an outlier if
    its value falls outside [q1 - k·IQR, q3 + k·IQR] of its group.

    ``mode="flag"`` appends a boolean ``is_outlier``; ``mode="drop"``
    filters outliers out; ``mode="only"`` keeps only them. One
    aggregation (one shuffle) + a broadcast-able bounds join — no
    window-over-everything, no driver round-trip.

    ``exact=True`` computes true quartiles: ``percentile`` buffers each
    group's values in the aggregation state, so per-group memory is
    O(group size) — fine while groups fit an executor. For unbounded or
    heavily skewed groups (the 100-TB case: billions of rows behind a
    handful of keys), ``exact=False`` switches to
    ``approx_percentile`` — a bounded KLL-style sketch whose state is
    O(accuracy) per group regardless of group size, mergeable across
    partitions (map-side partial aggregation stays effective). Relative
    rank error ≤ 1/accuracy."""
    if mode not in ("flag", "drop", "only"):
        raise ValueError(f"unknown mode: {mode!r}")
    # One aggregate with an array of percentages: both quartiles come
    # from a single shared per-group buffer (value map / KLL sketch)
    # instead of two independently built-and-merged ones — identical
    # values, ~half the aggregation work (r9). The exact path is
    # size-adaptive (r14): past _PERCENTILE_SORT_BYTES the quartiles
    # come from the range-partitioned distributed sort instead of the
    # one-task-per-group buffer (see _group_percentile_stats); the
    # approx sketch needs no such escape — its state is O(accuracy)
    # per group at any scale.
    if exact:
        bounds = _group_percentile_stats(
            df, by, value, [0.25, 0.75], ["__q1", "__q3"]
        )
    else:
        qq = F.array(F.lit(0.25), F.lit(0.75))
        bounds = (
            df.groupBy(*by)
            .agg(
                F.approx_percentile(value, qq, F.lit(accuracy)).alias(
                    "__qq"
                )
            )
            .select(
                *by,
                F.col("__qq")[0].alias("__q1"),
                F.col("__qq")[1].alias("__q3"),
            )
        )
    joined = join_group_stats(df, bounds, by)
    iqr = F.col("__q3") - F.col("__q1")
    is_out = (F.col(value) < F.col("__q1") - k * iqr) | (
        F.col(value) > F.col("__q3") + k * iqr
    )
    if mode == "flag":
        return joined.withColumn("is_outlier", is_out).drop("__q1", "__q3")
    kept = joined.where(is_out if mode == "only" else ~is_out)
    return kept.drop("__q1", "__q3")


def validate_split(
    df: DataFrame,
    rules: dict[str, Column | str],
) -> tuple[DataFrame, DataFrame]:
    """Row-level validation with quarantine: ``rules`` maps rule name →
    predicate the GOOD rows satisfy. Returns ``(good, bad)`` where
    ``bad`` carries ``failed_rules`` (comma-joined, deterministic rule
    order) so the quarantine sink is self-describing.

    One pass, no join: every rule is evaluated as a projection and the
    split is two filters over the same lineage (cache or checkpoint the
    input if both sides trigger separate actions). A NULL predicate
    result counts as a violation — the SQL trap where ``col > 0`` is
    neither true nor false for NULL rows must quarantine, not pass.
    """
    checks = []
    for name, pred in rules.items():
        p = F.expr(pred) if isinstance(pred, str) else pred
        checks.append(F.when(p.isNull() | ~p, F.lit(name)))
    failed = F.concat_ws(
        ",", F.array_compact(F.array(*checks))
    )
    tagged = df.withColumn("failed_rules", failed)
    good = tagged.where(F.col("failed_rules") == "").drop("failed_rules")
    bad = tagged.where(F.col("failed_rules") != "")
    return good, bad


def referential_check(
    fact: DataFrame,
    dims: dict[str, tuple[DataFrame, str, str]],
) -> DataFrame:
    """Referential-integrity report: for each named FK relation, how
    many fact rows exist, how many have a NULL key, and how many are
    ORPHANS (non-null key with no match in the dimension).

    ``dims`` maps relation name → (dim_df, fact_key_col, dim_key_col).
    Returns one row per relation: (relation, total_rows, null_keys,
    orphans). A healthy warehouse shows orphans = 0 — the row still
    carries the totals, so the report is never vacuously empty.

    Shape: per relation, one distinct-key projection of the dimension
    (slim, broadcastable) + one left join on the fact — the fact is
    scanned once per relation with only the key column read. The
    reference's null-check reports (etl.py:166-175) are the 1-relation
    special case of this.
    """
    if not dims:
        raise ValueError("referential_check needs at least one relation")
    reports = []
    for name, (dim, fact_key, dim_key) in dims.items():
        keys = dim.select(F.col(dim_key).alias("__dk")).distinct()
        joined = fact.select(F.col(fact_key).alias("__fk")).join(
            F.broadcast(keys), F.col("__fk") == F.col("__dk"), "left"
        )
        reports.append(
            joined.agg(
                F.count(F.lit(1)).alias("total_rows"),
                F.sum(
                    F.when(F.col("__fk").isNull(), 1).otherwise(0)
                ).alias("null_keys"),
                F.sum(
                    F.when(
                        F.col("__fk").isNotNull() & F.col("__dk").isNull(), 1
                    ).otherwise(0)
                ).alias("orphans"),
            ).select(
                F.lit(name).alias("relation"),
                "total_rows",
                "null_keys",
                "orphans",
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def mad_outliers(
    df: DataFrame,
    value: str,
    by: Sequence[str],
    k: float = 3.0,
    mode: str = "flag",
    consistency: float = 1.4826,
) -> DataFrame:
    """Robust outlier detection via Median Absolute Deviation: a row is
    an outlier if |x − median| > k · 1.4826 · MAD of its group. Unlike
    the Tukey fences above, the breakdown point is 50% — the detector
    itself cannot be dragged by the outliers it is hunting.

    Two aggregation passes by construction (MAD needs the median
    first): (1) per-group exact median, (2) per-group median of the
    absolute deviations — each one partial-agg shuffle, both producing
    a bounds frame that broadcast-joins back onto the data. The raw
    data is scanned twice; at 100 TB persist the scan or accept the
    re-read — there is no single-pass exact MAD.

    Groups with MAD = 0 (over half the values identical) flag any
    deviation from the median. ``mode`` as in :func:`iqr_outliers`.
    """
    if mode not in ("flag", "drop", "only"):
        raise ValueError(f"unknown mode: {mode!r}")
    # Both percentile passes are size-adaptive (r14): exact medians
    # from the shared-buffer aggregate while groups fit one task,
    # from the range-partitioned sort past _PERCENTILE_SORT_BYTES
    # (see _group_percentile_stats). The group median rides along on
    # the dev frame instead of a first() in the MAD aggregate — same
    # values (it is group-constant), and the sort path has no slot
    # for a passenger aggregate.
    med = _group_percentile_stats(df, by, value, [0.5], ["__med"])
    dev = join_group_stats(df, med, by).withColumn(
        "__adev", F.abs(F.col(value) - F.col("__med"))
    )
    mad = _group_percentile_stats(dev, by, "__adev", [0.5], ["__mad"])
    joined = join_group_stats(
        dev.withColumnRenamed("__med", "__med2").drop("__adev"), mad, by
    )
    score = F.abs(F.col(value) - F.col("__med2")) / (
        F.lit(consistency) * F.col("__mad")
    )
    # NULL values are never outliers (and never silently dropped by
    # mode="drop"): a NULL score would make is_out NULL, and
    # where(~NULL) filters the row — coalesce to a real boolean.
    is_out = F.coalesce(
        F.when(F.col("__mad") > 0, score > k).otherwise(
            F.col(value) != F.col("__med2")
        ),
        F.lit(False),
    )
    joined = joined.withColumn(
        "mad_score", F.when(F.col("__mad") > 0, score)
    )
    if mode == "flag":
        return joined.withColumn("is_outlier", is_out).drop(
            "__med2", "__mad"
        )
    kept = joined.where(is_out if mode == "only" else ~is_out)
    return kept.drop("__med2", "__mad")


def heavy_keys(
    df: DataFrame,
    keys: Sequence[str],
    top_n: int = 20,
) -> DataFrame:
    """Skew diagnostic: the ``top_n`` heaviest key values with row
    count, share of total, and cumulative share — the report that
    tells you whether a join/agg on these keys needs salting before
    you burn a cluster discovering it. Deterministic under count
    ties (key value is the tiebreak everywhere a rank or running
    sum is taken).

    Shape: one count aggregation, then windows over the top-n-sized
    frame only (global ordering of the FULL key frame is avoided: the
    top-n cut is a TakeOrderedAndProject, not a total sort).
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__tot"))
    order = [F.col("n").desc(), *[F.col(k).asc() for k in keys]]
    top = counts.orderBy(*order).limit(top_n)
    w = (
        Window.orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(Window.orderBy(*order)))
        .withColumn(
            "share", F.col("n").cast("double") / F.col("__tot").cast("double")
        )
        .withColumn(
            "cum_share",
            F.sum("n").over(w).cast("double") / F.col("__tot").cast("double"),
        )
        .select(*keys, "rank", "n", "share", "cum_share")
    )


def reconcile_totals(
    fact: DataFrame,
    detail: DataFrame,
    fact_key: str,
    detail_key: str,
    recorded: Column | str,
    detail_amount: Column,
    tolerance: float = 0.01,
) -> DataFrame:
    """Cross-table reconciliation: recompute each fact row's total from
    its detail rows (exact decimal sum) and compare against the
    recorded header value — the warehouse consistency check (orders
    header total vs Σ line amounts, ledger vs journal, …).

    Returns one row per fact key: recorded, recomputed, abs/relative
    difference, and ``within_tolerance``. Facts with NO detail rows
    report NULL recomputed (a different failure class than a mismatch
    — surfaced, not conflated).

    Shape: one partial-agg shuffle of the detail table to the key
    grain, then a key join against the fact header — detail rows never
    join row-to-row. At 100 TB both sides hash on the same key; bucket
    both tables on it and the join is exchange-free.
    """
    rec = F.col(recorded) if isinstance(recorded, str) else recorded
    sums = detail.groupBy(F.col(detail_key).alias("__k")).agg(
        F.sum(detail_amount.cast("decimal(30,6)"))
        .cast("double")
        .alias("recomputed")
    )
    joined = fact.select(
        F.col(fact_key).alias("__k"), rec.cast("double").alias("recorded")
    ).join(sums, "__k", "left")
    diff = F.col("recomputed") - F.col("recorded")
    # Zero-recorded guard: 0/0 is NaN (not NULL) in IEEE doubles, and
    # NaN <= tolerance is false — an exactly-reconciled zero-total
    # header would report out-of-tolerance. Fall back to the absolute
    # difference when the recorded total is 0.
    rel = F.when(
        F.col("recorded") != 0, F.abs(diff) / F.abs(F.col("recorded"))
    )
    within = F.when(F.col("recomputed").isNull(), F.lit(False)).otherwise(
        F.when(F.col("recorded") != 0, rel <= tolerance).otherwise(
            F.abs(diff) <= tolerance
        )
    )
    return joined.select(
        F.col("__k").alias(fact_key),
        "recorded",
        "recomputed",
        diff.alias("abs_diff"),
        rel.alias("rel_diff"),
        within.alias("within_tolerance"),
    )


def table_checksum(
    df: DataFrame,
    cols: Sequence[str],
    precision: int = 6,
) -> DataFrame:
    """Order-invariant dataset checksum: one row ``(n_rows, checksum)``
    where the checksum is the exact decimal SUM of a 60-bit portable
    hash of each row's canonical string — equal datasets produce equal
    checksums on ANY engine, without sorting anything. The tool for
    "did the migration/compaction/repartition preserve the data?" at
    sizes where a sort-and-diff is unaffordable.

    Canonical form: each value rendered with ``precision`` decimals
    for floats (matching the correctness-gate protocol), NULL as a
    sentinel, columns joined with a field separator. Collisions:
    summing 60-bit hashes detects any single-row difference and makes
    coincidental cancellation of multiple differences ~2^-60 unlikely.

    Shape: pure map-side expression + one global aggregation —
    scan-bound, no shuffle beyond the final partial-sum combine.
    """
    from quanta_etl_spark.functions.text import portable_hash60

    sep = chr(31)  # ASCII unit separator: never appears in the data
    parts = []
    for c in cols:
        col = F.col(c)
        dt = dict(df.dtypes)[c]
        if dt in ("double", "float"):
            # %.Nf (no grouping separators — format_number inserts
            # commas); Java rounds half-up vs C half-even, a divergence
            # only reachable when a double is exactly representable at
            # the (N+1)th decimal — prefer integer/string/date keys for
            # cross-engine checksums and treat float columns as best-
            # effort.
            rendered = F.format_string(f"%.{precision}f", col.cast("double"))
        else:
            rendered = col.cast("string")
        # sentinel embeds chr(30) (record separator): a real data
        # string containing control characters could still forge it —
        # documented caveat, not an escape scheme; meanwhile the
        # plain-text string "<null>" can no longer collide with NULL.
        parts.append(F.coalesce(rendered, F.lit(chr(30) + "null")))
    row_str = F.concat_ws(sep, *parts)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(portable_hash60(row_str).cast("decimal(38,0)"))
        .cast("string")
        .alias("checksum"),
    )


def benford_check(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law: per
    digit 1-9, observed count/frequency, the expected log10(1 + 1/d)
    frequency, and the chi-squared contribution — the classic
    fabricated-numbers screen for financial columns.

    Digit extraction is string-based (first [1-9] of the absolute
    value's plain rendering) — no log/floor float edge cases; counts
    are exact ints, so every statistic is engine-identical. One
    aggregation to 9 rows.
    """
    digit = F.regexp_extract(
        F.abs(F.col(value_col)).cast("string"), "([1-9])", 1
    )
    counts = (
        df.where(F.col(value_col).isNotNull() & (F.col(value_col) != 0))
        .withColumn("__d", digit)
        .where(F.col("__d") != "")
        .groupBy(F.col("__d").cast("int").alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy()
    tot = F.sum("n").over(w).cast("double")
    obs = F.col("n").cast("double") / tot
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return counts.select(
        "digit",
        "n",
        obs.alias("observed_freq"),
        exp.alias("benford_freq"),
        (
            (obs - exp) * (obs - exp) / exp * tot
        ).alias("chi2_contrib"),
    )


def winsorize(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group winsorization: clip ``value_col`` to its group's
    exact [``lower``, ``upper``] quantiles — the outlier-taming step
    before mean/regression-based features (robust against the fat
    tails that motivate ``mad_outliers``, but value-preserving for the
    bulk of the distribution).

    Exact interpolated percentiles (``F.percentile``, the same
    continuous-quantile definition as SQL ``quantile_cont``), computed
    per group in ONE aggregation and broadcast-joined back with a LEFT
    join — the data shuffles once for the group percentile agg and
    never again (the join side is group-count-sized), and the operator
    is row-preserving: rows whose group key is NULL (which non-null-
    safe join equality can never match) pass through UNCLIPPED instead
    of being dropped. Clipping itself is a pure projection:
    comparisons and boundary assignment introduce no new
    floating-point arithmetic, so results are engine-deterministic.
    NULL values pass through unclipped.
    """
    out_col = out_col or f"{value_col}_winsorized"
    # Both clip bounds from ONE shared percentile buffer per group
    # (identical values to two scalar aggregates, half the work — r9);
    # size-adaptive past _PERCENTILE_SORT_BYTES (r14, see
    # _group_percentile_stats).
    bounds = _group_percentile_stats(
        df, group_cols, value_col, [lower, upper], ["__lo", "__hi"]
    )
    v = F.col(value_col)
    clipped = (
        F.when(v < F.col("__lo"), F.col("__lo"))
        .when(v > F.col("__hi"), F.col("__hi"))
        .otherwise(v)
    )
    return (
        join_group_stats(df, F.broadcast(bounds), group_cols)
        .withColumn(out_col, clipped)
        .drop("__lo", "__hi")
    )


def exact_quantile_grid(
    df: DataFrame,
    value_col: str,
    fracs: Sequence[float],
) -> DataFrame:
    """Exact interpolated quantiles at many fractions, as a ONE-row
    frame ``(__grid array<double>)`` ordered by fraction — the
    many-fraction replacement for ``F.percentile(col, array(...))``,
    whose TypedImperativeAggregate re-scans its counts map per
    fraction (O(distinct × fracs) in the final eval: 101 fractions
    over 600k values measured ~9s where this runs ~1.5s).

    Algorithm: counts per DISTINCT value (map-side combinable), one
    cumulative-count pass over the distinct frame (value-ordered
    window — single-partition over DISTINCT values only, not rows;
    for distinct cardinalities beyond one task, switch to a
    range-partitioned two-phase cumsum), then each target order
    statistic finds its covering value via a broadcast
    range join of the tiny fraction table. Interpolation mirrors
    Spark ``Percentile.getPercentile`` EXACTLY — pos = f·(n−1),
    ``lowerVal·(hi−pos) + upperVal·(pos−lo)`` — which is the form
    DuckDB's ``quantile_cont`` agrees with (hash-proven in this
    repo), so results are engine-portable. NULLs are excluded, as in
    both reference aggregates.
    """
    vals = (
        df.select(F.col(value_col).alias("__val"))
        .where(F.col("__val").isNotNull())
        .groupBy("__val")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w = Window.orderBy("__val").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        vals.withColumn("__hi_c", F.sum("__c").over(w))
        .withColumn("__lo_c", F.col("__hi_c") - F.col("__c"))
        .localCheckpoint(eager=False)  # consumed by two range joins
    )
    n_row = cum.agg(F.sum("__c").alias("__n"))
    tg = (
        n_row.select(
            "__n",
            F.posexplode(
                F.array(*[F.lit(float(f)) for f in fracs])
            ).alias("__k", "__f"),
        )
        .withColumn(
            "__pos", F.col("__f") * (F.col("__n") - 1).cast("double")
        )
        .withColumn("__l", F.floor("__pos").cast("long"))
        .withColumn("__h", F.ceil("__pos").cast("long"))
    )
    lo_v = cum.join(
        F.broadcast(tg),
        (F.col("__l") >= F.col("__lo_c")) & (F.col("__l") < F.col("__hi_c")),
    ).select("__k", "__pos", "__l", "__h", F.col("__val").alias("__lv"))
    hi_v = cum.join(
        F.broadcast(tg.select("__k", "__h")),
        (F.col("__h") >= F.col("__lo_c")) & (F.col("__h") < F.col("__hi_c")),
    ).select(F.col("__k").alias("__k2"), F.col("__val").alias("__hv"))
    q = (
        lo_v.join(F.broadcast(hi_v), F.col("__k") == F.col("__k2"))
        .withColumn(
            "__q",
            F.when(F.col("__l") == F.col("__h"), F.col("__lv")).otherwise(
                F.col("__lv")
                * (F.col("__h").cast("double") - F.col("__pos"))
                + F.col("__hv")
                * (F.col("__pos") - F.col("__l").cast("double"))
            ),
        )
    )
    return q.agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("__k"), F.col("__q")))
            ),
            lambda s: s.getField("__q"),
        ).alias("__grid")
    )


def quantile_normalize(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    grid: int = 100,
    out_col: str | None = None,
) -> DataFrame:
    """Quantile normalization of ``value_col`` across groups: each
    value maps to the POOLED distribution's quantile at its own
    within-group percent rank — after normalization every group shares
    the pooled shape, removing per-group scale/offset drift (the
    batch-effect corrector of feature pipelines).

    Scale shape: the exact method needs the full pooled sorted vector
    (unscalable state); this uses the standard fixed-grid variant —
    ``grid + 1`` exact pooled percentiles via
    :func:`exact_quantile_grid` (distinct-value counts + one
    cumulative pass + order-statistic selection — NOT the built-in
    ``F.percentile`` aggregate, whose final eval is O(distinct×fracs)
    and measured ~6× slower at 101 fractions), broadcast ~grid-sized,
    with linear interpolation between grid points. Per-row work is a
    window rank (one shuffle on the group key) plus pure projection
    arithmetic. Interpolation error vanishes as the grid refines;
    grid=100 reproduces every percentile boundary exactly.

    Determinism: the percent rank is computed as the explicit
    (rank−1)/(n−1) over the group's NON-NULL values — Spark ranks
    NULLS FIRST while DuckDB ranks them LAST, so a bare percent_rank
    would diverge on nullable inputs; ranking off an offset-adjusted
    rank makes NULL rows invisible to the ranking in both engines
    (they emit NULL and keep their row). Ties share a rank, so no
    tiebreak column is needed; the interpolation
    ``g[lo] + frac·(g[lo+1]−g[lo])`` is evaluated in one fixed IEEE
    shape. Single-value groups rank at 0.0 → the pooled minimum.

    Size-adaptive rank strategy (r14, same gate as
    ``outlier_ensemble``): below ``_PERCENTILE_SORT_BYTES`` the
    percent rank is the window form above (one group-key shuffle —
    fastest small). Past it, ``Window.partitionBy(group)`` would
    concentrate each group's rank into ONE task (a |groups|-wide
    stage at any cluster size), so the rank comes from
    :func:`_ranked_by_group_value`'s range-partitioned parallel sort
    plus a (group, value) tie window — bit-equal by construction
    (identical integer rank values through the identical double
    arithmetic; pinned by a randomized property test).
    """
    out_col = out_col or f"{value_col}_qnorm"
    fracs = [i / grid for i in range(grid + 1)]
    ref = exact_quantile_grid(df, value_col, fracs)
    v = F.col(value_col)
    g = list(group_cols)
    if _plan_size_bytes(df) > _PERCENTILE_SORT_BYTES:
        # Big-data path (r14, guide §2.5; VERDICT r13 #4): the window
        # rank below concentrates each group into ONE task — with few
        # gated groups that is a |groups|-wide stage at any cluster
        # size, the same shape exact_group_percentiles was built to
        # kill. Reuse its range-partitioned rank machinery: the only
        # full-data exchanges are the range sort and the (group,
        # value) tie window, both parallel at any group cardinality.
        # Tie contract: rank() gives every tied row the FIRST tied
        # position, reproduced exactly as min(row rank) over the
        # (group, value) frame; the percent rank arithmetic below is
        # the identical integer-to-double expression, so results are
        # bit-equal to the window form (pinned by
        # test_quantile_normalize_sort_path_bit_equal).
        nn = _ranked_by_group_value(df.where(v.isNotNull()), g, value_col)
        w_tie = Window.partitionBy(*[F.col(c) for c in g], v)
        rmin = F.min("__r").over(w_tie)
        p_nn = F.when(F.col("__n") == 1, F.lit(0.0)).otherwise(
            rmin.cast("double") / (F.col("__n") - F.lit(1)).cast("double")
        )
        with_p = (
            nn.withColumn("__p", p_nn)
            .drop("__r", "__n")
            .unionByName(
                df.where(v.isNull()).withColumn(
                    "__p", F.lit(None).cast("double")
                )
            )
        )
    else:
        w = Window.partitionBy(*group_cols).orderBy(v.asc_nulls_first())
        w_grp = Window.partitionBy(*group_cols)
        rnk = F.rank().over(w)
        n_null = F.sum(F.when(v.isNull(), 1).otherwise(0)).over(w_grp)
        n_val = F.count(F.lit(1)).over(w_grp) - n_null
        p = F.when(v.isNull(), F.lit(None).cast("double")).when(
            n_val == 1, F.lit(0.0)
        ).otherwise(
            (rnk - n_null - F.lit(1)).cast("double")
            / (n_val - F.lit(1)).cast("double")
        )
        with_p = df.withColumn("__p", p)
    with_p = with_p.crossJoin(F.broadcast(ref))
    pos = F.col("__p") * F.lit(grid)
    lo = F.floor(pos).cast("int")
    frac = pos - F.floor(pos)
    glo = F.element_at("__grid", lo + 1)
    ghi = F.element_at("__grid", lo + 2)
    mapped = F.when(lo >= grid, F.element_at("__grid", grid + 1)).otherwise(
        glo + frac * (ghi - glo)
    )
    return with_p.withColumn(
        out_col, F.when(F.col("__p").isNotNull(), mapped)
    ).drop("__p", "__grid")


#: Above this optimizer-estimated input size the sort-based
#: exact_group_percentiles path engages (below it, Spark's percentile
#: aggregate is faster: the range-sampling pass + rank joins cost more
#: than the in-task buffer sort saves — measured 3.4s vs 2.8s on the
#: 600k-row gated ensemble, flipping well before the ~128 MB/task
#: buffer bound the aggregate would hit at scale).
_PERCENTILE_SORT_BYTES = 4 << 30


def _plan_size_bytes(df: DataFrame) -> int:
    """Optimizer-estimated size of a frame's input, WITHOUT running a
    job (file-source statistics); oversized fallback when the estimate
    is unavailable so the scale-safe path wins on unknowns."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return 1 << 62


def _ranked_by_group_value(
    df: DataFrame, group_cols: Sequence[str], value_col: str
) -> DataFrame:
    """Exact 0-based in-group rank of every row by ascending
    ``value_col``, from a RANGE-PARTITIONED parallel sort — the shared
    rank machinery of :func:`exact_group_percentiles` and the big-data
    path of :func:`quantile_normalize` (r13/r14, guide §2.5 + §5).

    Returns every input column plus ``__r`` (this row's exact 0-based
    position within its group under ascending value order — ties get
    DISTINCT consecutive positions in an unspecified order; callers
    needing tie-stable semantics reduce over equal values, e.g.
    ``min(__r)`` per (group, value)) and ``__n`` (the group's row
    count). Rows whose ``value_col`` is NULL must be filtered out by
    the caller (their rank is undefined here); NULL group keys form
    their own group (eqNullSafe throughout).

    Shape: ``repartitionByRange(*groups, value)`` + per-partition
    sort is the only full-data exchange — parallel and spillable at
    any group cardinality (the whole point: a ``Window.partitionBy``
    rank concentrates each group into ONE task). Per-(partition,
    group) counts + the partition's first local index give each row
    ``__r = local_index − first_local_index + offset`` via a tiny
    cumulative-summed counts table broadcast back.
    """
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    g = list(group_cols)
    parts = df.repartitionByRange(
        *g, F.col(value_col)
    ).sortWithinPartitions(*g, value_col)
    # PERSISTED (ADVICE r13): correctness requires BOTH consumers of
    # this frame — the per-partition counts aggregate and the rank
    # join — to observe identical range-partition boundaries and
    # identical monotonically_increasing_id assignments.
    # repartitionByRange's boundary sampling is documented as
    # non-deterministic across separate exchanges, so without the
    # persist the plan would be leaning on ReuseExchange (an
    # optimizer rule that spark.sql.exchange.reuse=false, or any
    # plan-shape drift, silently defeats) for ranks to line up with
    # offsets. The cache pins one materialization; retried/lost
    # blocks recompute from the SAME shuffle dependency (same
    # boundaries), so consistency survives failure too.
    tagged = parts.select(
        "*",
        F.spark_partition_id().alias("__pid"),
        # low 33 bits of monotonically_increasing_id = the row index
        # WITHIN this task's partition. Hard bound (ADVICE r13): a
        # single range partition beyond 2^33 rows (8.6 B) would wrap
        # and corrupt ranks — unreachable while partitions hold
        # anywhere near the 100-200 MB/partition the engine's sizing
        # doctrine targets (2^33 rows of even 1-byte values is 8 GiB
        # in ONE partition; size partitions up long before that).
        F.monotonically_increasing_id()
        .bitwiseAND(F.lit((1 << 33) - 1))
        .alias("__lid"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    per_part = tagged.groupBy("__pid", *g).agg(
        F.count(F.lit(1)).alias("__c"), F.min("__lid").alias("__l0")
    )
    wg = Window.partitionBy(*g) if g else Window.partitionBy(F.lit(1))
    wc = wg.orderBy("__pid")
    counts = per_part.select(
        F.col("__pid").alias("__cpid"),
        *[F.col(c).alias(f"__ck_{i}") for i, c in enumerate(g)],
        "__l0",
        F.coalesce(
            F.sum("__c").over(
                wc.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("__off"),
        F.sum("__c").over(wg).alias("__n"),
    )
    cond = F.col("__pid") == F.col("__cpid")
    for i, c in enumerate(g):
        cond = cond & F.col(c).eqNullSafe(F.col(f"__ck_{i}"))
    drop = ["__pid", "__lid", "__cpid", "__l0", "__off"] + [
        f"__ck_{i}" for i in range(len(g))
    ]
    return (
        tagged.join(F.broadcast(counts), cond)
        .withColumn(
            "__r", F.col("__lid") - F.col("__l0") + F.col("__off")
        )
        .drop(*drop)
    )


def _group_percentile_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    fracs: Sequence[float],
    out_cols: Sequence[str],
) -> DataFrame:
    """Size-adaptive exact per-group percentiles — ONE strategy
    chooser shared by every group-percentile-bounds operator
    (``iqr_outliers``, ``mad_outliers``, ``winsorize``,
    ``outlier_ensemble``; r14, VERDICT r13 #8).

    Below ``_PERCENTILE_SORT_BYTES`` (optimizer input-size estimate,
    no job): ONE shared-buffer ``F.percentile`` aggregate over an
    array of fractions — fastest when a group's values fit one task
    comfortably (the r9 shared-buffer discipline). Above it:
    :func:`exact_group_percentiles`' range-partitioned distributed
    sort — parallel and spillable where the aggregate would buffer a
    group's ENTIRE value set in one task (the 100 TB killer when
    groups are few). Both paths are bit-identical (interpolation
    arithmetic pinned by tests); returns one row per group,
    ``group_cols + out_cols``, all-NULL-value groups carrying NULL
    stats on the aggregate path and absent on the sort path (every
    consumer re-attaches with a LEFT join, where the two are
    indistinguishable)."""
    if _plan_size_bytes(df) > _PERCENTILE_SORT_BYTES:
        stats = exact_group_percentiles(
            df, group_cols, value_col, fracs, out_cols
        )
        if not list(group_cols):
            # GLOBAL case (by=[]): consumers crossJoin the 1-row
            # stats frame (join_group_stats contract), but an
            # all-NULL input yields ZERO sort-path rows — and a
            # crossJoin with an empty frame would DROP every data
            # row where the aggregate emits one NULL-stats row and
            # preserves them. Splice in an in-plan fallback row that
            # materializes only when no non-null value exists.
            fallback = (
                df.agg(F.count(F.col(value_col)).alias("__c"))
                .where(F.col("__c") == 0)
                .select(
                    *[
                        F.lit(None).cast("double").alias(n)
                        for n in out_cols
                    ]
                )
            )
            stats = stats.unionByName(fallback)
        return stats
    agg = df.groupBy(*group_cols).agg(
        F.percentile(
            value_col, F.array(*[F.lit(float(f)) for f in fracs])
        ).alias("__p")
    )
    return agg.select(
        *group_cols,
        *[F.col("__p")[i].alias(n) for i, n in enumerate(out_cols)],
    )


def exact_group_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    fracs: Sequence[float],
    out_cols: Sequence[str],
) -> DataFrame:
    """Exact per-group percentiles via a RANGE-PARTITIONED parallel
    sort instead of Spark's ``percentile`` aggregate (r13, guide §2.5
    + §5).

    ``F.percentile`` buffers EVERY value of a group in one task's
    memory and sorts it there — with few groups (the gated
    outlier_ensemble has 3 return-flags) that is a 3-task stage at any
    cluster size and an unbounded per-task buffer at 100 TB. This
    operator computes the identical order statistics from a
    distributed sort:

    1. ``repartitionByRange(*groups, value)`` + per-partition sort —
       the only full-data exchange, parallel and spillable;
    2. per-(partition, group) counts + first local index → each row's
       exact 0-based rank within its group (monotonically_increasing_id
       encodes the per-partition index in its low 33 bits; the tiny
       counts table is cumulative-summed and broadcast back);
    3. rows sitting at floor/ceil of ``frac·(n−1)`` are picked with
       conditional aggregates and interpolated with EXACTLY Spark's
       ``Percentile.getPercentile`` arithmetic:
       ``(higher−pos)·v_lo + (pos−lower)·v_hi`` with the same
       lower==higher and v_lo==v_hi shortcut branches — bit-identical
       results (pinned by ``test_exact_group_percentiles_matches_
       percentile_aggregate`` over randomized data).

    NULL values are skipped and NULL group keys form their own group —
    group-key equality uses eqNullSafe throughout; verified
    value-equal against ``F.percentile`` including the null group.
    One DOCUMENTED divergence from the aggregate (ADVICE r13): a
    group whose values are ALL NULL is dropped by the isNotNull
    pre-filter and absent from the output, whereas ``F.percentile``
    emits that group with NULL percentiles. Inside this engine every
    consumer re-attaches stats with a LEFT join
    (``join_group_stats``), where an absent row and a NULL-stats row
    are indistinguishable; direct callers needing aggregate parity on
    all-NULL groups must outer-join the group universe back. Returns
    one row per (non-empty) group: ``group_cols + out_cols``.

    The rank machinery (range sort + counts broadcast, persisted
    against boundary-resampling divergence) lives in
    :func:`_ranked_by_group_value`, shared with the big-data path of
    :func:`quantile_normalize`."""
    g = list(group_cols)
    v = F.col(value_col)
    rows = df.where(v.isNotNull()).select(*g, v.alias("__v"))
    ranked = _ranked_by_group_value(rows, g, "__v")
    picks = []
    for i, frac in enumerate(fracs):
        pos = F.lit(float(frac)) * (F.col("__n") - 1).cast("double")
        lo, hi = F.floor(pos), F.ceil(pos)
        picks += [
            F.min(F.when(F.col("__r") == lo, F.col("__v"))).alias(f"__lo_{i}"),
            F.min(F.when(F.col("__r") == hi, F.col("__v"))).alias(f"__hi_{i}"),
            F.first(pos).alias(f"__pos_{i}"),
            F.first(lo).alias(f"__flo_{i}"),
            F.first(hi).alias(f"__fhi_{i}"),
        ]
    agg = ranked.groupBy(*g).agg(*picks)
    outs = []
    for i, name in enumerate(out_cols):
        vlo, vhi = F.col(f"__lo_{i}"), F.col(f"__hi_{i}")
        pos = F.col(f"__pos_{i}")
        lo, hi = F.col(f"__flo_{i}"), F.col(f"__fhi_{i}")
        outs.append(
            F.when(lo == hi, vlo)
            .when(vhi == vlo, vlo)
            .otherwise(
                (hi.cast("double") - pos) * vlo
                + (pos - lo.cast("double")) * vhi
            )
            .alias(name)
        )
    return agg.select(*g, *outs)


def outlier_ensemble(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    iqr_k: float = 1.5,
    mad_k: float = 3.5,
    p_extreme: float = 0.005,
    min_votes: int = 2,
    id_cols: Sequence[str] = (),
) -> DataFrame:
    """Ensemble outlier detection: three independent QUANTILE-BASED
    detectors vote per row — IQR fences (Tukey), modified z-score on
    the MAD, and extreme-percentile membership — and a row is an
    outlier when ≥ ``min_votes`` agree. Ensembling damps each
    detector's failure mode (IQR over-fires on skew, MAD dies when
    >50% of a group is identical, raw percentiles fire on exactly
    p_extreme of everything).

    All three detectors derive from order statistics — medians,
    quartiles, extreme percentiles — NEVER from moment sums, so
    there is no large-sum decimal→double portability hazard and no
    skew sensitivity; flags are pure comparisons. Two aggregation
    passes (quartiles+median, then MAD = median of |x−med|), both
    group-sized, broadcast back; rows stream through projections
    otherwise.

    Returns flagged rows only (votes ≥ 1): (ids..., groups...,
    value, flag_iqr, flag_mad, flag_extreme, votes, is_outlier) —
    ``id_cols`` pass through for row identity. Stats join back with
    LEFT joins, so rows whose group key is NULL (no reference
    distribution to judge against) are simply never flagged rather
    than silently dropped pre-filter.
    """
    v = F.col(value_col)
    g = list(group_cols)
    # Percentile strategy is SIZE-ADAPTIVE (r13; generalized r14 into
    # _group_percentile_stats, shared with iqr_outliers/mad_outliers/
    # winsorize). Small inputs use ONE shared-buffer Percentile
    # aggregate (the r9 fix over five independent buffers) — fastest
    # when a group's values fit one task comfortably. Past
    # _PERCENTILE_SORT_BYTES of estimated input the sort-based
    # exact_group_percentiles takes over: the aggregate buffers EVERY
    # value of a group in one task (a ~|groups|-wide stage with an
    # unbounded buffer — the 100 TB killer when groups are few),
    # while the distributed sort is fully parallel and spillable.
    # Both paths are bit-identical (interpolation pinned by test +
    # oracle) and the decision costs no job (file statistics).
    fracs = [0.25, 0.75, 0.5, p_extreme, 1 - p_extreme]
    names1 = ["__q1", "__q3", "__med", "__plo", "__phi"]
    stats1 = _group_percentile_stats(df, g, value_col, fracs, names1)
    with_med = join_group_stats(df, F.broadcast(stats1), g)
    mad = _group_percentile_stats(
        with_med.withColumn("__absdev", F.abs(v - F.col("__med"))),
        g,
        "__absdev",
        [0.5],
        ["__mad"],
    )
    j = join_group_stats(with_med, F.broadcast(mad), g)
    iqr = F.col("__q3") - F.col("__q1")
    flag_iqr = (v < F.col("__q1") - F.lit(iqr_k) * iqr) | (
        v > F.col("__q3") + F.lit(iqr_k) * iqr
    )
    # modified z-score: 0.6745·|x−med|/MAD (Iglewicz-Hoaglin); a zero
    # MAD (majority-identical group) disables this detector rather
    # than flagging everything
    flag_mad = F.when(
        F.col("__mad") > 0,
        F.lit(0.6745) * F.abs(v - F.col("__med")) / F.col("__mad")
        > F.lit(mad_k),
    ).otherwise(F.lit(False))
    flag_ext = (v < F.col("__plo")) | (v > F.col("__phi"))
    votes = (
        flag_iqr.cast("int") + flag_mad.cast("int") + flag_ext.cast("int")
    )
    return (
        j.withColumn("flag_iqr", flag_iqr)
        .withColumn("flag_mad", flag_mad)
        .withColumn("flag_extreme", flag_ext)
        .withColumn("votes", votes)
        .where(F.col("votes") >= 1)
        .select(
            *id_cols,
            *g,
            v.alias("value"),
            "flag_iqr",
            "flag_mad",
            "flag_extreme",
            "votes",
            (F.col("votes") >= min_votes).alias("is_outlier"),
        )
    )
