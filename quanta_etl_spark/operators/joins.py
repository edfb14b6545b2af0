"""Join operator library.

Covers the reference's executed joins (left fact⋈dim join,
/root/reference/dags/spark/etl.py:160-164) and documented ones (2-key
derivative↔underlying join, reference README.md:175-176), plus the join
variety the reference lacks (SURVEY.md §2C): semi/anti, broadcast,
as-of, range, and skew-salted joins.

Scale doctrine:
* dimension joins BROADCAST (no shuffle of the 100-TB fact side);
* big-big equi-joins shuffle on the join key — pre-bucketing both sides
  on the key makes them shuffle-free across stages;
* as-of joins are re-written to a union + forward-fill window, which is
  one shuffle (by key) + one sort — no per-row lookups, no cross joins;
* skewed keys get salting (`salted_join`) or AQE skew handling.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str] | Column,
    how: str = "left",
    dim_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Fact ⋈ small-dimension join with an explicit broadcast hint.

    Mirrors the reference's product-spec enrichment (etl.py:160-164) —
    there the 2,728-row dim auto-broadcasts; here we hint explicitly so
    the plan is deterministic on any cluster profile.
    ``dim_cols`` pre-prunes the dimension (Catalyst would anyway; keeps
    the broadcast payload minimal and the intent obvious).
    """
    if dim_cols is not None:
        if isinstance(on, Column):
            # A Column condition references dim columns by attribute —
            # pruning could drop the join keys and break analysis, and
            # we cannot see which columns the condition needs. Leave
            # pruning to Catalyst in that case (ADVICE r1).
            raise ValueError(
                "dim_cols requires string join keys; with a Column "
                "condition pass dim pre-selected instead"
            )
        keys = [on] if isinstance(on, str) else list(on)
        dim = dim.select(*dict.fromkeys([*keys, *dim_cols]))
    return fact.join(F.broadcast(dim), on, how)


def two_key_join(
    left: DataFrame,
    right: DataFrame,
    left_keys: Sequence[str],
    right_keys: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Multi-key equi-join (reference README.md:175-176: eurex joins
    xetra on (underlying_isin, trading_ts)). Plain equi-join so Catalyst
    plans a hash/sort-merge join on the composite key; at scale, bucket
    both tables by the first key to keep the shuffle one-sided.
    """
    cond = None
    for lk, rk in zip(left_keys, right_keys, strict=True):
        c = left[lk] == right[rk]
        cond = c if cond is None else cond & c
    return left.join(right, cond, how)


def null_safe_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join where NULL keys match NULL keys — SQL ``IS NOT
    DISTINCT FROM`` / Spark ``eqNullSafe``. A plain ``==`` join drops
    every NULL-keyed row silently (NULL never equals NULL), which is
    almost never what a dimension lookup with optional keys wants.

    Null-safe equality is still a hashable condition, so Catalyst plans
    a regular hash/sort-merge join (keys wrapped in ``coalesce``-style
    knownNotNull handling) — NOT a cartesian product. Right-side key
    columns are dropped from the output, like a USING join. Note the
    NULL key is one join group: if both sides carry many NULL-keyed
    rows their match is a full cross of that group, the same hazard as
    any skewed hot key.
    """
    renamed = {k: f"__r_{k}" for k in keys}
    r = right
    for k, a in renamed.items():
        r = r.withColumnRenamed(k, a)
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(r[renamed[k]])
        cond = c if cond is None else cond & c
    return left.join(r, cond, how).drop(*renamed.values())


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    return left.join(right, on, "left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """Distributed as-of join: for every left row, attach the most recent
    right row (per ``key``) with ``right_ts <= left_ts`` (backward) or
    the next one (forward).

    Spark-first plan (no point-lookups, no range cross-join):
      1. union both sides into one stream tagged by origin,
      2. single window per key ordered by (ts, origin): ``last(value,
         ignorenulls=True)`` forward-fills right-side values onto left
         rows,
      3. filter back to left rows.
    Cost: ONE shuffle on ``key`` + ONE sort — the same lower bound as a
    sort-merge join. Survives any scale where a per-key history fits a
    sort spill (it always does; sorting spills to disk).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)

    lcols = left.columns
    # 0 sorts before 1, so at equal timestamps the right row is seen
    # first and IS visible to the left row (asof is inclusive).
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__origin"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*value_cols).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__origin"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*value_cols).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").asc(), F.col("__origin").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = unioned.withColumn("__rff", F.last("__r", ignorenulls=True).over(w))
    else:
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").desc(), F.col("__origin").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = unioned.withColumn("__rff", F.last("__r", ignorenulls=True).over(w))

    out = filled.where(F.col("__origin") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__rff.{c}").alias(c) for c in value_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str | None,
    left_value: str,
    right_lower: str,
    right_upper: str,
    bin_width: float | None = None,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Interval join: left.value ∈ [right.lower, right.upper), optionally
    within an equi-key.

    Without ``bin_width`` this is a conditional join (Catalyst plans
    broadcast-nested-loop unless ``key`` gives it an equi-component).
    With ``bin_width`` the intervals are exploded into fixed-width bins
    and the join becomes an EQUI-join on (key, bin) + residual filter —
    the standard trick that makes range joins shuffle-partitionable at
    scale (each interval lands in ceil(len/width) bins).

    ``broadcast_intervals`` (default) hints the interval side: it is
    usually a small driver-created table with UNKNOWN stats, and without
    the hint Catalyst may build the broadcast from the known-size FACT
    side — shipping the big table to every executor. Set False only
    when the interval table is genuinely large (then the bin equi-join
    shuffles both sides on __bin, which is the scalable path).
    """
    if bin_width is None:
        cond = (left[left_value] >= right[right_lower]) & (
            left[left_value] < right[right_upper]
        )
        if key is not None:
            cond = (left[key] == right[key]) & cond
        return left.join(
            F.broadcast(right) if broadcast_intervals else right, cond
        )

    # Bin assignment mirrors interval_overlap_join's r7 rewrite
    # (VERDICT r7 #4): on integer bound columns with an integral
    # bin_width, exact long arithmetic — floor division via pmod (no
    # double-ulp misbinning at epoch magnitudes, which on the PROBE
    # side would silently drop matches) and a true end-exclusive upper
    # bin (upper−1, not the former 1e-9 epsilon, a double no-op above
    # ~1e12 that wasted one fan-out cell per boundary-aligned
    # interval). Fractional/double inputs keep the inclusive upper bin:
    # one extra cell of join fan-out, never a correctness issue — the
    # residual [lower, upper) filter discards the spurious pairings.
    int_types = {"tinyint", "smallint", "int", "bigint"}
    ldt, rdt = dict(left.dtypes), dict(right.dtypes)
    # An empty/inverted interval matches nothing under [lower, upper) —
    # and would make sequence() DESCEND, exploding spurious bin cells.
    right = right.where(F.col(right_upper) > F.col(right_lower))
    exact = (
        float(bin_width) == int(bin_width)
        and ldt[left_value] in int_types
        and rdt[right_lower] in int_types
        and rdt[right_upper] in int_types
    )
    if exact:
        w = int(bin_width)

        def _fdiv(col):
            # (col - pmod) is exactly divisible by w, so the one double
            # division is exact for |col| < 2^53 (µs epochs to ~2255)
            return ((col - F.pmod(col, F.lit(w))) / F.lit(w)).cast("long")

        lb = left.withColumn("__bin", _fdiv(F.col(left_value)))
        rbins = F.sequence(
            _fdiv(F.col(right_lower)),
            _fdiv(F.col(right_upper) - F.lit(1)),
        )
    else:
        lb = left.withColumn(
            "__bin", F.floor(F.col(left_value) / bin_width)
        )
        rbins = F.sequence(
            F.floor(F.col(right_lower) / bin_width),
            F.floor(F.col(right_upper) / bin_width),
        )
    rb = (
        right.withColumn("__bins", rbins)
        .withColumn("__bin", F.explode("__bins"))
        .drop("__bins")
    )
    if broadcast_intervals:
        rb = F.broadcast(rb)
    on = ["__bin", key] if key is not None else ["__bin"]
    return (
        lb.join(rb, on)
        .where(
            (F.col(left_value) >= F.col(right_lower))
            & (F.col(left_value) < F.col(right_upper))
        )
        .drop("__bin")
    )


def theta_join(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    broadcast_right: bool = True,
) -> DataFrame:
    """General theta join (arbitrary predicate, SURVEY.md §2C): cross
    join + filter, planned as BroadcastNestedLoopJoin when one side is
    small. There is no scalable general theta join — at scale, first
    extract an equi- or band-component from the predicate (see
    ``range_join`` for the banded rewrite); keep this for small-×-big
    shapes only, and broadcast the small side."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, condition)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: explode the (small, replicable) right
    side ``salt`` ways and scatter the left side's hot keys across salt
    buckets, so one hot key no longer lands on one reducer.

    Use when AQE skew-join splitting isn't enough (e.g. one key is >50%
    of the table). ``right`` is replicated ×salt — keep it the smaller
    side.

    Only inner/left-flavored joins are semantics-preserving: with
    right/full outer joins every UNMATCHED replicated right row would be
    emitted ``salt`` times (ADVICE r1). Those are rejected — salt the
    other side instead (swap the inputs).
    """
    safe = {"inner", "left", "leftouter", "leftsemi", "semi",
            "leftanti", "anti"}
    if how.lower().replace("_", "") not in safe:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched "
            "replicated right rows; use inner/left/left_semi/left_anti "
            "(swap sides for right-flavored joins)"
        )
    l_s = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    r_s = right.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = l_s.join(r_s, [key, "__salt"], how)
    return out.drop("__salt")


def temporal_join(
    facts: DataFrame,
    versions: DataFrame,
    key: str | Sequence[str],
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Validity-interval (temporal / SCD2 lookup) join: each fact row
    matches the dimension version whose ``[valid_from, valid_to)``
    interval contains the fact's timestamp; an open current version
    has NULL ``valid_to``. Facts before the first version match
    nothing (kept as NULLs under ``how="left"``) — the semantics a
    versioned-dimension lookup needs, distinct from as-of (which
    matches the nearest row regardless of validity).

    Shape: equi-join on the key with the interval predicate as a
    post-join filter — Spark executes a hash/sort-merge join on the
    key, never a cartesian; per-key work is |facts_k| · |versions_k|,
    bounded by version counts (slowly-changing by definition). With
    non-overlapping intervals per key (what scd2_from_changelog
    emits), at most one version matches each fact.
    """
    keys = [key] if isinstance(key, str) else list(key)
    cond = None
    for k in keys:
        c = facts[k] == versions[k]
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (facts[fact_ts] >= versions[valid_from])
        & (
            versions[valid_to].isNull()
            | (facts[fact_ts] < versions[valid_to])
        )
    )
    out = facts.join(versions, cond, how)
    # drop the duplicated key columns from the version side
    for k in keys:
        out = out.drop(versions[k])
    return out


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_id: str,
    r_id: str,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    keys: Sequence[str] = (),
    bin_width: float | None = None,
) -> DataFrame:
    """Interval × interval overlap join (half-open [start, end)):
    every (left, right) pair whose ranges intersect, with the overlap
    length — the calendar/genomics/session-intersection primitive
    ``range_join`` (point ∈ interval) doesn't cover.

    Without ``bin_width``: a conditional join (nested-loop unless
    ``keys`` give an equi component) — fine for dimension-scale
    interval sets. With ``bin_width``: both sides explode onto a
    fixed-width grid and the join becomes an EQUI-join on (keys, bin)
    + residual overlap filter + pair dedup — each interval lands in
    ceil(len/width) cells, so the join shuffles/partitions like any
    equi-join at 100 TB. Size the grid to the typical interval length
    (cells ≈ interval → ~2 cells per interval).
    """
    overlap_cond = (F.col("__ls") < F.col("__re")) & (
        F.col("__rs") < F.col("__le")
    )
    # start < end guards: an empty interval [x, x) intersects nothing
    # under half-open semantics (the bare condition would still pair
    # it), and an INVERTED interval would make the banded path's
    # sequence() descend — exploding one malformed row into millions
    # of bin cells instead of zero.
    lsel = left.where(F.col(l_start) < F.col(l_end)).select(
        *keys,
        F.col(l_id).alias("__lid"),
        F.col(l_start).alias("__ls"),
        F.col(l_end).alias("__le"),
    )
    rsel = right.where(F.col(r_start) < F.col(r_end)).select(
        *keys,
        F.col(r_id).alias("__rid"),
        F.col(r_start).alias("__rs"),
        F.col(r_end).alias("__re"),
    )
    if bin_width is None:
        joined = lsel.join(rsel, list(keys)) if keys else lsel.crossJoin(rsel)
        pairs = joined.where(overlap_cond)
    else:
        def _floor_div(col, w):
            # Exact floor division in long arithmetic. F.floor(col/w)
            # routes through DOUBLE division, whose ulp at
            # microsecond-epoch magnitudes (~0.25 at 1.5e15) can put a
            # boundary-adjacent value in the wrong bin — a missing
            # lower cell would silently DROP pairs that overlap only
            # there. pmod keeps it floor (not truncate-toward-zero)
            # for negative epochs too. (col - pmod) is exactly
            # divisible by w, so the one double division is exact for
            # |col| < 2^53 ≈ 9.0e15 — microsecond epochs to year 2255.
            return (
                (col - F.pmod(col, F.lit(w))) / F.lit(w)
            ).cast("long")

        def bins(dtypes, s, e):
            int_types = {"tinyint", "smallint", "int", "bigint"}
            if (
                float(bin_width) == int(bin_width)
                and dtypes[s] in int_types
                and dtypes[e] in int_types
            ):
                # Integer path: end-exclusive on integer arithmetic —
                # an interval ending exactly on a bin boundary does
                # NOT occupy the boundary bin (the former 1e-9 epsilon
                # was a no-op at epoch magnitudes — ADVICE r6).
                w = int(bin_width)
                return F.sequence(
                    _floor_div(F.col(s), w),
                    _floor_div(F.col(e) - F.lit(1), w),
                )
            # Fractional/double path: no end-exclusive adjustment — a
            # boundary-ending interval occupies one extra cell. That
            # costs a little join fan-out, never correctness: the
            # residual overlap filter + dedup below discard the
            # spurious pairings.
            return F.sequence(
                F.floor(F.col(s) / bin_width),
                F.floor(F.col(e) / bin_width),
            )

        ldt = dict(lsel.dtypes)
        rdt = dict(rsel.dtypes)
        lb = lsel.withColumn("__bin", F.explode(bins(ldt, "__ls", "__le")))
        rb = rsel.withColumn("__bin", F.explode(bins(rdt, "__rs", "__re")))
        pairs = (
            lb.join(rb, [*keys, "__bin"])
            .where(overlap_cond)
            .drop("__bin")
            .dropDuplicates([*keys, "__lid", "__rid"])
        )
    return pairs.select(
        *keys,
        F.col("__lid").alias(l_id),
        F.col("__rid").alias(r_id),
        F.col("__ls").alias(l_start),
        F.col("__le").alias(l_end),
        F.col("__rs").alias(r_start),
        F.col("__re").alias(r_end),
        (
            F.least(F.col("__le"), F.col("__re"))
            - F.greatest(F.col("__ls"), F.col("__rs"))
        ).alias("overlap"),
    )
