"""Behavioral / event-log analytics operators.

The reference's minute-bar model is an event log in disguise (one row
per observation, entity key + event time — SURVEY.md §1.1); this module
adds the log-analytics workload every large clickstream/telemetry
pipeline runs on such data: ordered conversion funnels, cohort
retention, and time-weighted averages (the TWAP cousin of the
reference's OHLCV resample, README.md:178).

Scale doctrine: every operator here aggregates or windows **per user /
per entity**, so all shuffles hash on the entity key — at 100 TB,
bucketing the event table by that key (SCALING.md) makes the whole
module exchange-free. No driver-side actions, no UDFs: each step is a
native filter/groupBy/join/window, fully inside WholeStageCodegen.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel_user_steps(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_span_seconds: float | None = None,
) -> DataFrame:
    """Per-user ordered conversion funnel: one row per user who entered
    the funnel, with the timestamp at which they completed each step
    (null from the step where the chain breaks onward).

    ``t_i`` is the user's earliest ``steps[i]`` event at-or-after their
    ``t_{i-1}`` (strict-order funnel; ties at the same timestamp count,
    matching the common product-analytics definition).

    ``max_span_seconds`` adds the time-budget variant: every step must
    also land within that many seconds of the user's FIRST-step entry
    (first-entry semantics, as product-analytics tools define it — a
    later funnel entry that would have fit the budget is not
    re-attempted; comparisons are pure timestamp ordering, no float
    arithmetic).

    Shape: step 0 is a filtered min-aggregation (shuffle on the user
    key); each later step left-joins the (slim, one-row-per-user)
    funnel frame to the step's filtered events and re-aggregates — the
    step filter pushes into the event scan, and every shuffle hashes on
    the same user key, so consecutive exchanges collapse under
    co-partitioning. Entirely lazy: no counts, no collects.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    out = (
        df.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_0"))
    )
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            df.where(F.col(type_col) == step)
            .select(F.col(user_col), F.col(ts_col).alias("__ts"))
        )
        prev_cols = [f"t_{j}" for j in range(i)]
        ok = F.col("__ts") >= F.col(f"t_{i - 1}")
        if max_span_seconds is not None:
            # make_interval, not an INTERVAL f-string: float reprs in
            # scientific notation (1e-05, 1e16) are unparseable there
            ok = ok & (
                F.col("__ts")
                <= F.col("t_0")
                + F.make_interval(secs=F.lit(float(max_span_seconds)))
            )
        out = (
            out.join(nxt, user_col, "left")
            .groupBy(user_col, *prev_cols)
            .agg(F.min(F.when(ok, F.col("__ts"))).alias(f"t_{i}"))
        )
    return out


def funnel_report(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_span_seconds: float | None = None,
) -> DataFrame:
    """Funnel summary: (step_index, step_name, users) — how many users
    reached each step in order (optionally within ``max_span_seconds``
    of first-step entry). A lazy unpivot over
    :func:`funnel_user_steps` (count of non-null ``t_i``), so the whole
    report is one Spark job with no driver-side loops over data.
    """
    per_user = funnel_user_steps(
        df, steps, user_col, ts_col, type_col, max_span_seconds
    )
    agg = per_user.agg(
        *[F.count(f"t_{i}").alias(f"c_{i}") for i in range(len(steps))]
    )
    pairs = []
    for i, name in enumerate(steps):
        pairs.append(
            F.struct(
                F.lit(i).alias("step_index"),
                F.lit(name).alias("step_name"),
                F.col(f"c_{i}").alias("users"),
            )
        )
    return (
        agg.select(F.explode(F.array(*pairs)).alias("s"))
        .select("s.step_index", "s.step_name", "s.users")
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention triangle: bucket each user into the period of
    their FIRST activity (the cohort), then count distinct active users
    per (cohort, period-offset).

    Returns (cohort, period_offset, active_users), where
    ``period_offset`` = whole periods between the cohort period and the
    activity period (0 = the cohort period itself).

    Shape: distinct (user, period) pairs first — collapsing the event
    stream to at most users × periods rows before anything else — then
    one per-user min-aggregation and one final aggregation on (cohort,
    offset). All three shuffles hash on the user key or a key derived
    from it; none touches the raw event volume twice.
    """
    per_days = {"day": 1, "week": 7}[period]
    act = df.select(
        F.col(user_col).alias("__u"),
        F.date_trunc(period, F.col(ts_col)).alias("__p"),
    ).distinct()
    first = act.groupBy("__u").agg(F.min("__p").alias("__cohort"))
    return (
        act.join(first, "__u")
        .select(
            F.to_date("__cohort").alias("cohort"),
            (
                F.datediff(F.col("__p"), F.col("__cohort")) / per_days
            ).cast("int").alias("period_offset"),
            F.col("__u"),
        )
        .groupBy("cohort", "period_offset")
        .agg(F.count_distinct("__u").alias("active_users"))
    )


def time_weighted_avg(
    df: DataFrame,
    value_col: str,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average per entity (TWAP): each observation's
    weight is its holding time — the microseconds until the entity's
    next observation. The final observation of each entity has no
    successor and weight 0 (it never "held"); entities with a single
    observation fall back to the plain average of their values.

    Weights use integer microseconds (``unix_micros``) so the exact
    same arithmetic is reproducible in any engine with microsecond
    timestamps — no double-epoch rounding drift. ``tiebreak_col``
    makes the lead() ordering total when two observations share a
    timestamp.

    Determinism: the per-row products are doubles (IEEE-exact given
    identical inputs), but their SUM is accumulated in decimal and the
    weight sum in int64 — so the result is independent of partition
    count and task order, a property every gated aggregate in this
    engine keeps (partition-order-dependent floats are flaky at scale).

    Shape: one window (lead) + one aggregation, both on the entity key.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col, tiebreak_col)
    # NTZ-safe: parquet event times may read as TIMESTAMP_NTZ, which
    # unix_micros rejects; the session tz is pinned UTC so the cast is
    # the identity on the wall-clock value.
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    dur = F.lead(micros).over(w) - micros
    wv = (F.col(value_col) * F.col("__dur")).cast("decimal(30,6)")
    mean = (
        F.sum(F.col(value_col).cast("decimal(30,6)")).cast("double")
        / F.count(value_col)
    )
    return (
        df.withColumn("__dur", dur)
        .groupBy(entity_col)
        .agg(
            F.coalesce(
                F.sum(wv).cast("double")
                / F.nullif(F.sum("__dur"), F.lit(0)).cast("double"),
                mean,
            ).alias("twap"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of the event stream: for
    each (from_type, to_type) adjacent pair within a user's timeline,
    the transition count and the row-normalized probability
    P(next=to | current=from). The standard session-flow / next-action
    model over clickstream data.

    Shape: one lead() window per user (shuffle on the user key), one
    count aggregation on the tiny (from, to) key, and a window sum over
    the from-state marginal — the last two run on a frame whose size is
    |event types|², not the event volume. Counts are exact ints; the
    probability division is the only float op, so results are
    partitioning-independent.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = df.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    marg = Window.partitionBy("from_type")
    return counts.withColumn(
        "prob",
        F.col("n").cast("double") / F.sum("n").over(marg).cast("double"),
    )


def rfm_segments(
    orders: DataFrame,
    customer_col: str,
    ts_col: str,
    amount_col: str,
    n_tiles: int = 4,
) -> DataFrame:
    """RFM customer segmentation: per customer, Recency (days since
    last order, measured against the dataset's max date so the result
    is reproducible), Frequency (order count), Monetary (decimal-exact
    spend) — each scored into ``n_tiles`` quantile tiles (1 = worst,
    n = best) and concatenated into the classic segment code.

    Determinism: ntile() over a non-unique ordering is partition-order
    dependent, so every tile ordering carries the customer id as the
    tiebreak — the canonical trick that makes rank-based scores safe
    to gate. Recency ties break by id too, keeping codes stable across
    runs and engines.

    Shape: one aggregation to the customer grain, then three window
    ntiles over that (customer-count-sized, far smaller than orders)
    frame; the reference-point max(ts) is a 1-row broadcast, never a
    driver round-trip.
    """
    per_cust = orders.groupBy(F.col(customer_col).alias("customer")).agg(
        F.max(ts_col).alias("__last"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col(amount_col).cast("decimal(30,6)")).alias("__m"),
    )
    ref = orders.agg(F.max(ts_col).alias("__ref"))
    scored = per_cust.crossJoin(F.broadcast(ref)).withColumn(
        "recency_days",
        F.datediff(F.to_date("__ref"), F.to_date("__last")),
    ).withColumn("monetary", F.col("__m").cast("double"))
    # Best = most recent, most frequent, highest spend.
    r_w = Window.orderBy(F.col("recency_days").desc(), F.col("customer"))
    f_w = Window.orderBy(F.col("frequency").asc(), F.col("customer"))
    m_w = Window.orderBy(F.col("monetary").asc(), F.col("customer"))
    out = (
        scored.withColumn("r_score", F.ntile(n_tiles).over(r_w))
        .withColumn("f_score", F.ntile(n_tiles).over(f_w))
        .withColumn("m_score", F.ntile(n_tiles).over(m_w))
        .withColumn(
            "segment",
            F.concat_ws(
                "", F.col("r_score"), F.col("f_score"), F.col("m_score")
            ),
        )
    )
    return out.select(
        "customer", "recency_days", "frequency", "monetary",
        "r_score", "f_score", "m_score", "segment",
    )


def attribute_last_touch(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    conversion_pred: Column,
    touch_pred: Column,
    touch_key: Column,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Last-touch marketing attribution: each conversion event is
    credited to the user's most recent touch event at-or-before it
    (``touch_key`` of that event; NULL when no touch precedes).

    One IGNORE NULLS window pass — no self-join: touch rows project
    their key, everything else projects NULL, and ``last(...,
    ignorenulls)`` over the user timeline carries the latest touch
    forward onto each conversion row. Shuffles once on the user key;
    scales like any forward-fill. Ordering carries ``tiebreak_cols``
    so same-timestamp rows attribute deterministically.

    Returns the conversion rows plus ``attributed_key``.
    """
    key = F.when(touch_pred, touch_key)
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), *[F.col(c) for c in tiebreak_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = df.withColumn(
        "attributed_key", F.last(key, ignorenulls=True).over(w)
    )
    return carried.where(conversion_pred)


def inter_event_gaps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Inter-arrival-time profile per event type: for consecutive
    events of the SAME type on a user's timeline, the gap in seconds —
    aggregated to count / mean / exact p50 / p90 per type. The cadence
    fingerprint behind rate-limit tuning, bot detection, and session
    gap selection.

    One lag window per (user, type) — shuffles once on that key; the
    percentile aggregation state is O(gaps per type) (switch to
    approx_percentile beyond memory). Gaps are computed in exact
    integer MICROSECONDS (second-level truncation differs between
    engines on fractional timestamps) and only converted to seconds
    at the end; the mean derives from an exact decimal sum.
    """
    w = Window.partitionBy(user_col, type_col).orderBy(
        F.col(ts_col), *[F.col(c) for c in tiebreak_cols]
    )
    # timestamp_diff is NTZ-safe AND timezone-independent (unix_micros
    # rejects TIMESTAMP_NTZ, which parquet timestamp[us] reads as).
    gap_us = F.timestamp_diff(
        "MICROSECOND", F.lag(ts_col).over(w), F.col(ts_col)
    )
    gaps = df.withColumn("__gap", gap_us).where(F.col("__gap").isNotNull())
    # p50/p90 share one percentile buffer per group (r9).
    return (
        gaps.groupBy(F.col(type_col))
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            (
                F.sum(F.col("__gap").cast("decimal(30,6)")).cast("double")
                / F.count(F.lit(1))
                / F.lit(1e6)
            ).alias("mean_gap_s"),
            F.percentile(
                "__gap", F.array(F.lit(0.5), F.lit(0.9))
            ).alias("__p"),
        )
        .select(
            type_col,
            "n_gaps",
            "mean_gap_s",
            (F.col("__p")[0] / 1e6).alias("p50_gap_s"),
            (F.col("__p")[1] / 1e6).alias("p90_gap_s"),
        )
    )


def conversion_latency(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    from_type: str,
    to_type: str,
) -> DataFrame:
    """Time-to-convert distribution: for each user, the latency from
    their FIRST ``from_type`` event to their first ``to_type`` event
    at-or-after it — summarized as count, decimal-exact mean, and
    exact p50/p90 (seconds). The product-analytics companion to the
    funnel report: not just who converted, but how fast.

    Microsecond-exact arithmetic (timestamp_diff — NTZ-safe and
    timezone-independent); two tiny min-aggregations per user, one
    join, one stats aggregation. Never a window over raw events.
    """
    first_from = df.where(F.col(type_col) == from_type).groupBy(
        F.col(user_col).alias("__u")
    ).agg(F.min(ts_col).alias("__t0"))
    to_events = df.where(F.col(type_col) == to_type).select(
        F.col(user_col).alias("__u"), F.col(ts_col).alias("__t1")
    )
    converted = (
        to_events.join(first_from, "__u")
        .where(F.col("__t1") >= F.col("__t0"))
        .groupBy("__u")
        .agg(F.min("__t1").alias("__t1"), F.first("__t0").alias("__t0"))
    )
    lat_us = F.timestamp_diff("MICROSECOND", F.col("__t0"), F.col("__t1"))
    lats = converted.select(lat_us.alias("__lat"))
    # p50/p90 share one percentile buffer (r9).
    return (
        lats.agg(
            F.count(F.lit(1)).alias("n_converted"),
            (
                F.sum(F.col("__lat").cast("decimal(30,6)")).cast("double")
                / F.count(F.lit(1))
                / F.lit(1e6)
            ).alias("mean_latency_s"),
            F.percentile(
                "__lat", F.array(F.lit(0.5), F.lit(0.9))
            ).alias("__p"),
        )
        .select(
            "n_converted",
            "mean_latency_s",
            (F.col("__p")[0] / 1e6).alias("p50_latency_s"),
            (F.col("__p")[1] / 1e6).alias("p90_latency_s"),
        )
    )


def event_ngram_paths(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    n: int = 3,
    top_k: int = 20,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Top-k most frequent length-``n`` event paths (consecutive-event
    n-grams on the per-user timeline) — the sequence-mining rollup
    behind "what do users do next" sankeys. A path never crosses
    users; rows whose lookahead runs off the user's timeline emit
    nothing, and a path containing a NULL event type anywhere emits
    nothing either (``concat_ws`` alone would silently skip the NULL
    and collapse 'a > NULL > c' into the still-counted 'a > c' —
    SQL's ``||`` concatenation propagates the NULL and drops the row,
    so we filter on every step, not just the last lead — ADVICE r6).

    Shape: n−1 lead() picks over ONE window pass (same frame, Catalyst
    fuses them into a single Window node), then a count aggregation on
    the tiny path key and a TakeOrderedAndProject — raw events shuffle
    once, on the user key. Count ties break on the path string so the
    top-k is deterministic.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), *[F.col(c) for c in tiebreak_cols]
    )
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)
    ]
    path = F.concat_ws(" > ", *steps)
    all_steps_present = reduce(
        lambda a, b: a & b, [s.isNotNull() for s in steps]
    )
    complete = df.withColumn(
        "__ok", all_steps_present
    ).withColumn("path", path).where(F.col("__ok"))
    counts = complete.groupBy("path").agg(F.count(F.lit(1)).alias("n_paths"))
    return (
        counts.orderBy(F.col("n_paths").desc(), F.col("path").asc())
        .limit(top_k)
    )


def sequence_conformance(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    pattern: str,
    sep: str = ">",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-user sequence-pattern conformance (MATCH_RECOGNIZE-lite):
    serialize each user's full event-type timeline into a delimited
    string (order restored by an array_sort over (ts, tiebreaks, type)
    structs — deterministic under any partitioning) and test it
    against a regex ``pattern``. Returns (user, sequence, conforms).

    The regex runs ONCE per user on the serialized timeline — pattern
    logic stays declarative instead of a hand-built state machine of
    window flags. State per user is its event-type string; for users
    with millions of events, pre-aggregate to run-length-encoded types
    first.
    """
    order_struct = F.struct(
        F.col(ts_col).alias("__t"),
        *[F.col(c).alias(f"__tb{i}") for i, c in enumerate(tiebreak_cols)],
        F.col(type_col).alias("__e"),
    )
    per_user = df.groupBy(F.col(user_col).alias("user")).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(order_struct)),
                lambda s: s["__e"],
            ),
            sep,
        ).alias("sequence")
    )
    return per_user.withColumn(
        "conforms", F.regexp_like(F.col("sequence"), F.lit(pattern))
    )


def time_in_state(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """State-duration accounting: treat each event as entering a state
    held until the user's NEXT event, and aggregate total held time
    per state — "how long do users sit in each status" (the last event
    of each user holds nothing, mirroring time_weighted_avg's
    convention).

    Durations are exact integer microseconds (timestamp_diff; NTZ-safe
    and tz-independent), decimal-summed, reported as hours. One lead
    window on the user key + one tiny aggregation.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), *[F.col(c) for c in tiebreak_cols]
    )
    dur_us = F.timestamp_diff(
        "MICROSECOND", F.col(ts_col), F.lead(ts_col).over(w)
    )
    held = df.withColumn("__dur", dur_us).where(F.col("__dur").isNotNull())
    return held.groupBy(F.col(state_col).alias("state")).agg(
        F.count(F.lit(1)).alias("n_intervals"),
        (
            F.sum(F.col("__dur").cast("decimal(38,6)")).cast("double")
            / F.lit(3600e6)
        ).alias("total_hours"),
    )


def new_vs_returning(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Daily new-vs-returning split: per day, how many active users saw
    their FIRST-ever activity that day vs earlier — the growth-
    accounting curve every product dashboard opens with. Also emits
    the cumulative distinct-user count (running total of new users —
    no rescan of history needed).

    Shape: collapse to distinct (user, day) first, one min-agg for
    first days, flag by comparison, aggregate per day, one lag-free
    cumulative window over the tiny day frame.
    """
    act = df.select(
        F.col(user_col).alias("__u"),
        F.date_trunc("day", F.col(ts_col)).alias("day"),
    ).distinct()
    first = act.groupBy("__u").agg(F.min("day").alias("__first"))
    flagged = act.join(first, "__u").withColumn(
        "__is_new", (F.col("day") == F.col("__first")).cast("long")
    )
    daily = flagged.groupBy("day").agg(
        F.sum("__is_new").alias("n_new"),
        (F.count(F.lit(1)) - F.sum("__is_new")).alias("n_returning"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.withColumn(
        "cum_users", F.sum("n_new").over(w)
    ).select("day", "n_new", "n_returning", "cum_users")


def debounce(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    min_gap_seconds: float,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Debounce/throttle: within each key, keep only the FIRST event of
    every burst — an event survives iff at least ``min_gap_seconds``
    passed since the previous event of the same key (the leading-edge
    debounce every telemetry/click pipeline applies before counting).

    Gap arithmetic is exact integer microseconds (timestamp_diff —
    NTZ-safe); one lag window per key, rows dropped map-side after it.
    Unlike sessionize (which LABELS bursts) this SELECTS one row per
    burst onset — the two compose: debounce to onsets, sessionize the
    onsets.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col), *[F.col(c) for c in tiebreak_cols]
    )
    gap_us = F.timestamp_diff(
        "MICROSECOND", F.lag(ts_col).over(w), F.col(ts_col)
    )
    keep = gap_us.isNull() | (
        gap_us >= F.lit(int(min_gap_seconds * 1_000_000))
    )
    return df.withColumn("__keep", keep).where(F.col("__keep")).drop(
        "__keep"
    )


def rate_alerts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    window_seconds: int,
    threshold: int,
) -> DataFrame:
    """Sliding-window rate alerting: flag every event that is the
    ``threshold``-th (or later) event of its key within the trailing
    ``window_seconds`` — abuse/rate-limit detection with exact sliding
    semantics (a tumbling bucket misses bursts straddling the
    boundary).

    One RANGE-frame count window ordered by integer epoch seconds —
    evaluated with a sliding pointer inside each sorted key partition,
    no self-join. Same-second peers all share the frame (RANGE
    includes value ties symmetrically), so no tiebreak is needed for
    determinism. Adds ``n_in_window``; returns only alerting rows.
    """
    secs = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(key_col)
        .orderBy(secs)
        .rangeBetween(-window_seconds, 0)
    )
    out = df.withColumn("n_in_window", F.count(F.lit(1)).over(w))
    return out.where(F.col("n_in_window") >= threshold)


def attribute_position_based(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    conversion_pred: Column,
    touch_pred: Column,
    touch_key: Column,
    value_col: str,
    tiebreak_cols: Sequence[str] = (),
    first_weight: float = 0.4,
    last_weight: float = 0.4,
) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: each
    conversion's value splits across ALL touches on the user's path
    to it — ``first_weight`` to the first touch, ``last_weight`` to
    the last, the remainder evenly over the middle (1 touch → 100%,
    2 touches → 50/50, the standard renormalization). A path is the
    touches strictly between the previous conversion (exclusive) and
    this conversion (inclusive-by-order); touches after the user's
    final conversion attribute nothing.

    ``first_weight + last_weight`` must be ≤ 1 (validated — an
    over-unity pair would give middle touches negative credit); a
    2-touch path renormalizes the two weights proportionally
    (defaults 0.4/0.4 → 0.5/0.5, the standard convention).

    Shape: conversion paths are assigned WITHOUT a range join — a
    reverse-cumulative count of conversions over the user timeline
    gives every row the id of its next-at-or-after conversion (one
    window pass), so touches and conversions equi-join on (user,
    path-id). Ranking within the path is a second pass over the SAME
    user-key partitioning; consecutive exchanges collapse. Weight
    arithmetic is expressed as column constants (1.0 − fw − lw), so a
    SQL oracle computing the same IEEE expression matches bitwise.

    Returns one row per credited touch: (user, path id, touch key,
    position, path_size, weight, credit).
    """
    if first_weight < 0 or last_weight < 0 or first_weight + last_weight > 1:
        raise ValueError(
            "need first_weight >= 0, last_weight >= 0 and their sum <= 1 "
            f"(got {first_weight} + {last_weight}): an over-unity pair "
            "would hand middle touches negative credit"
        )
    if first_weight + last_weight == 0:
        # The 2-touch renormalization fw/(fw+lw) would evaluate 0/0 →
        # NaN weight/credit on every 2-touch path (ADVICE r7). A pure
        # linear split is a different model — ask for it explicitly.
        raise ValueError(
            "first_weight + last_weight must be > 0: with both end "
            "weights zero the 2-touch renormalization is 0/0; use a "
            "linear-attribution model instead of position-based"
        )
    order_desc = [F.col(ts_col).desc()] + [
        F.col(c).desc() for c in tiebreak_cols
    ]
    w_rev = (
        Window.partitionBy(user_col)
        .orderBy(*order_desc)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = df.withColumn(
        "__isconv", F.when(conversion_pred, 1).otherwise(0)
    ).withColumn("__path", F.sum("__isconv").over(w_rev))
    convs = tagged.where(conversion_pred).select(
        F.col(user_col).alias("__u"),
        F.col("__path").alias("__p"),
        F.col(value_col).alias("__value"),
    )
    passthrough = [ts_col] + [c for c in tiebreak_cols if c != ts_col]
    touches = tagged.where(touch_pred & (F.col("__path") > 0)).select(
        user_col,
        "__path",
        touch_key.alias("touch_key"),
        *passthrough,
    )
    w_path = Window.partitionBy(user_col, "__path").orderBy(
        F.col(ts_col), *[F.col(c) for c in tiebreak_cols]
    )
    ranked = touches.select(
        user_col,
        "__path",
        "touch_key",
        F.row_number().over(w_path).alias("position"),
        F.count(F.lit(1))
        .over(w_path.rowsBetween(Window.unboundedPreceding,
                                 Window.unboundedFollowing))
        .alias("path_size"),
    )
    k = F.col("path_size")
    rn = F.col("position")
    fw, lw = F.lit(first_weight), F.lit(last_weight)
    weight = (
        F.when(k == 1, F.lit(1.0))
        .when((k == 2) & (rn == 1), fw / (fw + lw))
        .when(k == 2, lw / (fw + lw))
        .when(rn == 1, fw)
        .when(rn == k, lw)
        .otherwise(
            (F.lit(1.0) - fw - lw) / (k - F.lit(2)).cast("double")
        )
    )
    credited = ranked.join(
        convs,
        (F.col(user_col) == F.col("__u"))
        & (F.col("__path") == F.col("__p")),
    )
    return credited.select(
        user_col,
        F.col("__path").alias("path_id"),
        "touch_key",
        "position",
        "path_size",
        weight.alias("weight"),
        (F.col("__value") * weight).alias("credit"),
    )


def sliding_active_users(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Per-day DAU, trailing-``window_days`` active users (WAU/MAU),
    and the DAU/WAU "stickiness" ratio — the engagement rollup every
    product dashboard runs.

    Scale shape: a sliding COUNT(DISTINCT) cannot ride a window frame
    (distinct state is not frame-mergeable), and a day×events range
    join fans out on data size. Instead each distinct (user, day)
    activity row fans out to the ``window_days`` window-END days it
    participates in — a BOUNDED explode (× window length, after the
    first dedup collapses events to at most users×days rows) followed
    by one exact distinct aggregation per (end-day, user). Days are
    emitted only when the day itself had activity (calendar-complete
    spines come from windows.time_spine).

    Returns (day, dau, wau, stickiness) with stickiness = dau/wau as
    double.
    """
    act = df.select(
        F.col(user_col).alias("__u"),
        F.date_trunc("day", F.col(ts_col)).alias("__d"),
    ).distinct()
    # fan out each activity day to the window-end days it belongs to
    ends = act.select(
        "__u",
        "__d",
        F.explode(
            F.sequence(
                F.col("__d"),
                F.col("__d") + F.expr(f"INTERVAL {window_days - 1} DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("__end"),
    )
    wau = (
        ends.select("__u", "__end").distinct()
        .groupBy("__end")
        .agg(F.count(F.lit(1)).alias("wau"))
    )
    dau = act.groupBy(F.col("__d").alias("__end")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    return (
        dau.join(wau, "__end")
        .select(
            F.col("__end").alias("day"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau").cast("double"))
            .alias("stickiness"),
        )
    )


def kaplan_meier(
    subjects: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier survival curve over right-censored durations: one
    row per distinct EVENT time t with the risk-set size, event count,
    and the product-limit survival estimate S(t) = Π_{s≤t}
    (1 − d_s/n_s) — the time-to-event summary behind churn /
    conversion-lag analysis. ``subjects`` has one row per subject:
    ``duration_col`` (numeric time-to-event-or-censoring) and
    ``event_col`` (true = event observed, false = censored).

    Shape: subjects collapse to one row per (duration, any-event)
    grain immediately (hash agg, map-side combinable), so every
    window below runs over DISTINCT TIMES, not subjects. n_risk(t) =
    N − (subjects strictly before t) via one cumulative count;
    survival accumulates in LOG space with per-term
    decimal(28,12) rounding — ln((n−d)/n) is an exact-integer-ratio
    double (engine-portable), the decimal cumsum is associative (no
    float-ordering dependence between engines' window-sum
    implementations), and one exp at the end restores S(t).

    Returns (t, n_risk, n_events, log_survival, survival), event
    times only, ascending.
    """
    per_t = (
        subjects.groupBy(F.col(duration_col).alias("t"))
        .agg(
            F.count(F.lit(1)).alias("__c_all"),
            F.sum(
                F.when(F.col(event_col).cast("boolean"), 1).otherwise(0)
            ).alias("n_events"),
        )
    )
    w_all = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # total N enters as a broadcast 1-row aggregate — no driver
    # round-trip, fully lazy (the TF-IDF corpus-size idiom).
    n_total = subjects.agg(F.count(F.lit(1)).alias("__N"))
    # single-partition windows over the DISTINCT-times frame only —
    # curve cardinality, not data cardinality (range-partition a
    # two-phase cumsum beyond ~1e7 distinct times)
    curve = per_t.crossJoin(F.broadcast(n_total)).withColumn(
        "n_risk",
        F.col("__N") - F.coalesce(F.sum("__c_all").over(w_all), F.lit(0)),
    )
    # a time where the whole remaining risk set has events zeroes the
    # product permanently: ln(0) = −inf has no decimal form, so track
    # it as a flag instead of a term (survival 0, log_survival NULL)
    term = F.when(
        (F.col("n_events") > 0) & (F.col("n_risk") > F.col("n_events")),
        F.log(
            (F.col("n_risk") - F.col("n_events")).cast("double")
            / F.col("n_risk").cast("double")
        ).cast("decimal(28,12)"),
    ).otherwise(F.lit(0).cast("decimal(28,12)"))
    zeroed = F.sum(
        F.when(F.col("n_risk") == F.col("n_events"), 1).otherwise(0)
    ).over(w_cum)
    curve = curve.withColumn(
        "log_survival",
        F.when(zeroed == 0, F.sum(term).over(w_cum).cast("double")),
    )
    return (
        curve.where(F.col("n_events") > 0)
        .select(
            "t",
            "n_risk",
            "n_events",
            "log_survival",
            F.coalesce(F.exp("log_survival"), F.lit(0.0)).alias(
                "survival"
            ),
        )
        .orderBy("t")
    )
