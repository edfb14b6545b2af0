"""Deterministic sampling & dataset-split operators.

Training pipelines need REPRODUCIBLE row selection: the same row must
land in the same split on every run, on any cluster size, from any
engine that re-implements the pipeline. Random sampling (``df.sample``)
gives none of that. These operators hash a stable row key instead —
md5-derived 60-bit buckets, the same construction the portable simhash
variant uses (operators/dedup.py), reproducible in any engine with md5.

Scale: pure map-side expressions — no shuffle, no driver involvement;
a filter on the bucket pushes into the scan where the key is a stored
column.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hash_bucket(key: Column | str, num_buckets: int = 100) -> Column:
    """Stable bucket in [0, num_buckets): md5 of the key's string form,
    first 15 hex chars as a 60-bit int, mod buckets. Engine-portable
    (``('0x' || substr(md5(k),1,15))::UBIGINT % n`` in DuckDB)."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10)
    return F.pmod(h.cast("long"), F.lit(num_buckets))


def hash_sample(
    df: DataFrame, key: str, fraction: float, num_buckets: int = 10_000
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose bucket falls
    below fraction × num_buckets. Unlike ``df.sample`` this is stable
    across runs/partitionings AND consistent — related tables sampled
    on the same key keep referential integrity (sample orders and
    lineitem on order key and the join still works)."""
    cut = int(round(fraction * num_buckets))
    return df.where(hash_bucket(key, num_buckets) < cut)


def hash_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    split_col: str = "split",
    num_buckets: int = 100,
) -> DataFrame:
    """Assign every row to a named split (train/val/test…) by stable
    key hash. ``weights`` maps split name → fraction; fractions must sum
    to 1. Assignment is by cumulative bucket ranges in the given order,
    so it is reproducible and documented: {"train": .8, "val": .1,
    "test": .1} → buckets [0,80) / [80,90) / [90,100)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(key, num_buckets)
    expr = None
    edge = 0.0
    for name, w in weights.items():
        edge += w
        cond = bucket < int(round(edge * num_buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # floating rounding could leave the last bucket uncovered — close it
    out = expr.otherwise(list(weights)[-1])
    return df.withColumn(split_col, out)


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    strata: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    num_buckets: int = 10_000,
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy``'s reproducible
    cousin): each stratum value gets its own keep-fraction. Rows in
    strata absent from ``fractions`` keep ``default_fraction``."""
    bucket = hash_bucket(key, num_buckets)
    cut = None
    for val, frac in fractions.items():
        c = F.when(F.col(strata) == val, int(round(frac * num_buckets)))
        cut = c if cut is None else cut.when(
            F.col(strata) == val, int(round(frac * num_buckets))
        )
    cut = (
        cut.otherwise(int(round(default_fraction * num_buckets)))
        if cut is not None
        else F.lit(int(round(default_fraction * num_buckets)))
    )
    return df.where(bucket < cut)


def quantile_bins(
    df: DataFrame,
    value_col: str,
    num_bins: int = 10,
    tiebreak_cols: Sequence[str] = (),
    out: str = "bin",
) -> DataFrame:
    """Equal-frequency (quantile) binning: assign each row its
    ``num_bins``-tile by ``value_col`` — the feature-engineering
    discretizer (deciles, quartile flags). ``tiebreak_cols`` complete
    the ordering so equal values bin deterministically across runs,
    partitionings, and engines — ntile over a non-total order is a
    correctness bug every rank-based feature pipeline hits eventually.

    Shape: one global-order window. At 100 TB a single total order is
    the bottleneck by design — switch to approx_percentile cut points
    + a map-side bucket lookup when the column no longer fits a sort
    (the histogram/iqr operators show that pattern); exact ntile is
    the right tool at dimension-table scale.
    """
    w = Window.orderBy(
        F.col(value_col), *[F.col(c) for c in tiebreak_cols]
    )
    return df.withColumn(out, F.ntile(num_bins).over(w))


def fixed_n_per_group(
    df: DataFrame,
    by: Sequence[str],
    n: int,
    id_col: str,
) -> DataFrame:
    """Exactly-N-per-group deterministic sampling: keep the ``n`` rows
    of each group with the smallest md5-hash of their id — the
    "N examples per class" primitive (eval set construction, balanced
    debugging samples). Unlike fraction-based sampling the group
    quota is exact; unlike ORDER BY rand() the pick is stable across
    runs, partitionings, and engines (the hash is a pure function of
    the id).

    Shape: one window (row_number over the hash order) per group —
    shuffles once on the group key. Groups smaller than ``n`` keep
    everything.
    """
    from quanta_etl_spark.functions.text import portable_hash60

    h = portable_hash60(F.col(id_col).cast("string"))
    w = Window.partitionBy(*by).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis):
    each row draws a deterministic uniform u from the md5 hash of its
    id and ranks by ln(u)/w — the top ``k`` constitute a sample where
    inclusion probability scales with weight. Deterministic end to
    end (same ids + weights → same sample on any engine or cluster),
    which ordinary rand()-weighted sampling never is.

    Rows with non-positive weight are excluded (A-ES is undefined
    there). Shape: a pure map-side key expression + one
    TakeOrderedAndProject — no shuffle of the raw data, no global
    sort; the classic distributed one-pass weighted reservoir.
    """
    from quanta_etl_spark.functions.text import portable_hash60

    u = (
        portable_hash60(F.col(id_col).cast("string")).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(2**60))
    key = F.log(u) / F.col(weight_col)
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("sample_key", key)
        .orderBy(F.col("sample_key").desc(), F.col(id_col).asc())
        .limit(k)
    )
