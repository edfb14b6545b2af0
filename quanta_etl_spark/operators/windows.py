"""Window / time-series operator library.

Implements the reference's documented analytical workload (SURVEY.md
§2B, reference README.md:22-24,177): forward-fill (B1), lag returns
(B3), rolling volatility (B4), plus the ranking/top-k surface the
reference lacks (§2C).

Scale doctrine: every window here partitions by the entity key (isin /
user_id), so state per partition = one entity's history — bounded and
sort-spillable. Never ``Window.orderBy`` without ``partitionBy`` on big
data (single-partition sort); `global_rank` documents the exception.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _order_cols(order_by: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_by]


def forward_fill(
    df: DataFrame,
    cols: Sequence[str],
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
) -> DataFrame:
    """Carry the last non-null observation forward within each entity
    (reference README.md:22-24: "price needs to be inferred from the
    previous observation"). One shuffle + one sort per entity partition.
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*_order_cols(order_by))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def time_spine(
    df: DataFrame,
    key: str,
    ts: str,
    step: str = "interval 1 minute",
) -> DataFrame:
    """Dense (key, ts) grid from each key's min(ts) to max(ts) —
    ``sequence()`` + ``explode``, no driver-side loops. Left-join facts
    onto this and forward-fill to materialize "price at every minute".
    """
    return (
        df.groupBy(key)
        .agg(F.min(ts).alias("__lo"), F.max(ts).alias("__hi"))
        .select(
            key,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.expr(step))
            ).alias(ts),
        )
    )


def densify_and_fill(
    df: DataFrame,
    key: str,
    ts: str,
    value_cols: Sequence[str],
    step: str = "interval 1 minute",
) -> DataFrame:
    """B1 composed end-to-end: dense spine ⟕ facts, then forward-fill
    the value columns. Rows that had no trade carry the previous
    observation's values (nulls before the first observation remain)."""
    spine = time_spine(df, key, ts, step)
    joined = spine.join(df, [key, ts], "left")
    return forward_fill(joined, value_cols, [key], [ts])


def lag_returns(
    df: DataFrame,
    value: str,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    out: str = "returns",
) -> DataFrame:
    """Per-entity simple returns: value / lag(value) - 1 (reference
    README.md:177). NULL for each entity's first observation and wherever
    the previous value is 0 (try_divide — keeps ANSI mode enabled without
    failing the whole job on one degenerate tick)."""
    w = Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by))
    prev = F.lag(value, 1).over(w)
    return df.withColumn(out, F.try_divide(F.col(value), prev) - 1.0)


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int = 1800,
    order_tiebreak: Sequence[str] = (),
    out: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: within each key, a new session starts
    when the time since the previous event exceeds ``gap_seconds``.
    Two stacked windows over ONE shuffle+sort (lag flag, then running
    sum) — the standard distributed sessionize; at scale the state per
    partition is one key's ordered history."""
    # Gap arithmetic needs epoch seconds. `cast("long")` is illegal on
    # TIMESTAMP_NTZ (which parquet `timestamp[us]` columns read as), so
    # pick the conversion off the actual dtype: numeric ts columns are
    # already epoch seconds; timestamp/ntz go through unix_timestamp
    # (NTZ-safe, same truncate-to-seconds semantics as the old cast).
    from pyspark.sql.types import NumericType

    if isinstance(df.schema[ts].dataType, NumericType):
        ts_secs = F.col(ts).cast("long")
    else:
        ts_secs = F.unix_timestamp(F.col(ts))
    order = [F.col(ts), *_order_cols(order_tiebreak)]
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(ts_secs).over(w)
    is_new = F.when(
        prev.isNull() | ((ts_secs - prev) > gap_seconds), 1
    ).otherwise(0)
    running = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn(out, F.sum(is_new).over(running).cast("int"))


def rolling_agg(
    df: DataFrame,
    value: str,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    window_rows: int,
    aggs: dict[str, str],
) -> DataFrame:
    """Trailing-row-frame rolling aggregates (B4: rolling volatility =
    stddev of returns over the previous N observations).

    ``aggs`` maps output column → agg fn name ('stddev', 'avg', 'sum',
    'min', 'max', 'count'). Frame = [current-window_rows+1, current].
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*_order_cols(order_by))
        .rowsBetween(-(window_rows - 1), 0)
    )
    out = df
    for name, fn in aggs.items():
        out = out.withColumn(name, getattr(F, fn)(value).over(w))
    return out


def rolling_time_agg(
    df: DataFrame,
    value: str,
    partition_by: Sequence[str],
    ts_col: str,
    lookback_seconds: int,
    aggs: dict[str, str],
) -> DataFrame:
    """Trailing TIME-frame rolling aggregates (B4's other frame type):
    the frame holds every row whose timestamp lies within
    ``lookback_seconds`` BEFORE the current row's — by value, not by
    row position, so irregular/gappy series aggregate correctly
    (a 10-row frame spans 10 minutes on a dense series but hours on a
    sparse one; a time frame always spans exactly the window).

    Implemented with ``Window.rangeBetween`` over the timestamp cast to
    epoch seconds — one shuffle on the partition keys, same as any
    window; the range frame is evaluated with a sliding pointer inside
    each sorted partition, no self-join.
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(F.unix_timestamp(F.col(ts_col)))
        .rangeBetween(-lookback_seconds, 0)
    )
    out = df
    for name, fn in aggs.items():
        out = out.withColumn(name, getattr(F, fn)(value).over(w))
    return out


def cumulative_agg(
    df: DataFrame,
    value: str,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    aggs: dict[str, str],
) -> DataFrame:
    """Running (cumulative) aggregates: frame = [unbounded preceding,
    current row]. ``order_by`` must be a total order for deterministic
    running values (include a unique tiebreaker)."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*_order_cols(order_by))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for name, fn in aggs.items():
        out = out.withColumn(name, getattr(F, fn)(value).over(w))
    return out


def topk_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Per-group top-k via row_number. ``order_by`` must be a TOTAL order
    (include a unique tiebreaker) for deterministic results."""
    w = Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by))
    out = df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def ranked(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    method: str = "rank",
    out: str = "rank",
    ntiles: int = 4,
) -> DataFrame:
    """Ranking surface: row_number / rank / dense_rank / ntile / percent_rank /
    cume_dist over a keyed window."""
    w = Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by))
    fns: dict[str, Column] = {
        "row_number": F.row_number().over(w),
        "rank": F.rank().over(w),
        "dense_rank": F.dense_rank().over(w),
        "ntile": F.ntile(ntiles).over(w),
        "percent_rank": F.percent_rank().over(w),
        "cume_dist": F.cume_dist().over(w),
    }
    return df.withColumn(out, fns[method])


def global_top_k(df: DataFrame, order_by: Sequence[str | Column], k: int) -> DataFrame:
    """Global top-k: ``orderBy().limit(k)`` — Spark plans TakeOrderedAndProject
    (per-partition heap + driver merge of k rows), NOT a global sort, so
    it's safe at any scale for small k."""
    return df.orderBy(*_order_cols(order_by)).limit(k)


def ewma(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.2,
    tiebreak_cols: Sequence[str] = (),
    out_col: str = "ewma",
) -> DataFrame:
    """Exponential moving average per key:
    ``y_0 = x_0;  y_t = (1-alpha)*y_{t-1} + alpha*x_t`` over the key's
    events in ``(ts, *tiebreak)`` order — the standard smoothing for
    noisy series (and the recursion behind RSI/MACD-style indicators on
    the reference's minute bars).

    The recursion is genuinely sequential — no window frame expresses
    it — so this is the textbook ``applyInPandas`` case: one shuffle on
    the key, pandas' C-implemented ``ewm(adjust=False)`` inside each
    group. Output keeps (key, ts, tiebreaks, value, ewma).

    Memory bound: one key's full history per task (same bound as every
    per-key window in this engine); a key too hot for that needs period
    chunking with carried state, which is what the streaming twin
    (applyInPandasWithState) does per micro-batch.
    """
    import pandas as pd

    order = [ts_col, *tiebreak_cols]
    cols = [key, *order, value_col]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*cols).schema.fields
    ) + f", {out_col} double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        pdf[out_col] = (
            pdf[value_col].astype(float).ewm(alpha=alpha, adjust=False).mean()
        )
        return pdf

    return df.select(*cols).groupBy(key).applyInPandas(fn, out_schema)
