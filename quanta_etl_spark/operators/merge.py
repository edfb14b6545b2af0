"""Upsert (MERGE) and slowly-changing-dimension operators.

The reference pipeline is append-only (its four sinks are plain
``write.parquet`` overwrites, dags/spark/etl.py:62,171,174,175), but any
engine fed by a change stream needs MERGE semantics: apply a correction
batch to a fact table, or maintain a versioned dimension. These are the
table-maintenance counterparts of the append-only sinks in
``sources.readers``.

Scale design:

* ``merge_upsert`` is ONE left-anti join + a union — no full outer
  join, no window. The delta is almost always orders of magnitude
  smaller than the target, so the anti-join's build side is the delta
  and AQE broadcasts it; the target is never shuffled in that case.
* ``merge_upsert_columns`` (partial-column update) needs the matched
  target row's other columns, so it is a left join on the key — still
  one shuffle at worst, broadcast when the delta fits.
* ``scd2_from_changelog`` is a single window pass (lag/lead over the
  key's event sequence) — the standard way to turn a CDC/event log into
  a type-2 dimension with validity intervals.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def merge_upsert(
    target: DataFrame, source: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """SQL ``MERGE … WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
    THEN INSERT *``: source rows replace whole matching target rows and
    unmatched source rows are appended.

    The plan is ``target ANTI-JOIN source`` + ``UNION source``: matched
    target rows are dropped and the source provides their replacement.
    Requires ``source`` to be unique per key (assert upstream with
    ``quality.expect_unique`` if the delta may carry duplicates).
    """
    keys = list(keys)
    kept = target.join(source.select(*keys).distinct(), keys, "left_anti")
    return kept.unionByName(source.select(*target.columns))


def merge_upsert_columns(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str],
) -> DataFrame:
    """MERGE with a column subset: matched rows take ``update_cols``
    from the source and keep every other target column; unmatched
    source rows are inserted (their non-listed columns come from the
    source row as-is). One left join + one anti-join on the key."""
    keys = list(keys)
    upd = {c: f"__src_{c}" for c in update_cols}
    src_renamed = source.select(
        *keys, *[F.col(c).alias(a) for c, a in upd.items()]
    )
    matched = target.join(src_renamed, keys, "left").select(
        *keys,
        *[
            F.coalesce(F.col(upd[c]), F.col(c)).alias(c)
            if c in upd
            else F.col(c)
            for c in target.columns
            if c not in keys
        ],
    )
    inserts = source.join(target.select(*keys).distinct(), keys, "left_anti")
    return matched.unionByName(inserts.select(*target.columns))


def scd2_from_changelog(
    changelog: DataFrame,
    key: str,
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from an event/CDC log:
    one row per (key, change), with ``valid_from`` = the change's
    timestamp, ``valid_to`` = the next change's timestamp (null while
    current) and ``is_current``. Consecutive events whose attributes
    did not change are collapsed first (a lag comparison), so the
    output rows are genuine versions.

    One window partition per key — the partition key carries all of a
    key's history, exactly like the forward-fill operator, so the
    shuffle is a single hash exchange on the dimension key.

    ``tiebreak_cols`` make the event order total when ``ts_col`` can
    repeat within a key (e.g. date-grained CDC) — without them the
    version sequence is nondeterministic.
    """
    attrs = list(attr_cols)
    order = [ts_col, *tiebreak_cols]
    w = Window.partitionBy(key).orderBy(*order)
    changed = F.lit(False)
    for c in attrs:
        prev = F.lag(c).over(w)
        changed = changed | ~(
            F.col(c).eqNullSafe(prev)
        )
    # first event per key is always a version start (lag is null on all)
    first = F.lag(ts_col).over(w).isNull()
    versions = (
        changelog.select(key, ts_col, *tiebreak_cols, *attrs)
        .withColumn("__start", first | changed)
        .where(F.col("__start"))
        .drop("__start")
    )
    w2 = Window.partitionBy(key).orderBy(*order)
    return versions.select(
        key,
        *attrs,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def incremental_agg_maintain(
    agg: DataFrame,
    cdc: DataFrame,
    group_keys: Sequence[str],
    sum_cols: dict[str, tuple[str, str]],
    count_col: str | None = None,
) -> DataFrame:
    """Incremental maintenance of a sum/count rollup from a CDC delta
    (``sources.readers.diff_versions`` output) — the
    materialized-view-refresh primitive: updating a 100-TB table's
    rollup costs O(delta), not O(table).

    ``sum_cols`` maps aggregate column → (old_image_col, new_image_col)
    in the CDC frame; ``count_col`` names the row-count aggregate if the
    rollup keeps one. Per CDC row the contribution is
    ``coalesce(new, 0) - coalesce(old, 0)`` (insert adds, delete
    subtracts, update adds the difference), summed per group and
    full-outer-merged into the rollup. Groups whose count reaches 0
    drop out. Only works for ALGEBRAIC aggregates (sum/count/avg via
    sum+count) — min/max need the base table on deletes, by design.

    Group keys resolve from the row IMAGES (``old_<key>`` /
    ``new_<key>`` when present in the CDC frame, the plain column when
    the group key is the join key): an update that MOVES a row between
    groups subtracts its old image from the old group and adds the new
    image to the new group — the case a single-sided delta gets wrong.

    Plan: one aggregation over the (small) delta + one outer join keyed
    on the group key — the rollup is never rescanned beyond the join,
    and AQE broadcasts the delta side when it fits."""
    keys = list(group_keys)

    def side(prefix: str, change_types: tuple[str, ...], sign: int) -> DataFrame:
        key_cols = [
            (
                F.col(f"{prefix}_{k}") if f"{prefix}_{k}" in cdc.columns
                else F.col(k)
            ).alias(k)
            for k in keys
        ]
        contribs = [
            (F.lit(sign) * F.coalesce(F.col(img[0 if sign < 0 else 1]), F.lit(0))).alias(
                f"__d_{out}"
            )
            for out, img in sum_cols.items()
        ]
        if count_col is not None:
            contribs.append(F.lit(sign).alias(f"__d_{count_col}"))
        return cdc.where(F.col("change_type").isin(*change_types)).select(
            *key_cols, *contribs
        )

    contributions = side("old", ("delete", "update"), -1).unionByName(
        side("new", ("insert", "update"), +1)
    )
    deltas = contributions.groupBy(*keys).agg(
        *[
            F.sum(f"__d_{c}").alias(f"__d_{c}")
            for c in list(sum_cols) + ([count_col] if count_col else [])
        ]
    )
    merged = agg.join(deltas, keys, "full_outer")
    out_cols = list(sum_cols) + ([count_col] if count_col else [])
    for c in out_cols:
        merged = merged.withColumn(
            c,
            F.coalesce(F.col(c), F.lit(0)) + F.coalesce(F.col(f"__d_{c}"), F.lit(0)),
        )
    merged = merged.drop(*[f"__d_{c}" for c in out_cols])
    if count_col is not None:
        merged = merged.where(F.col(count_col) > 0)
    return merged
