"""Reshape operators: wide↔long transforms.

The wide→long direction (unpivot/melt) complements the pivot in
aggregates.py (§2C pivot — /root/repo SURVEY.md). Spark has a native
``DataFrame.unpivot`` since 3.4 — this wraps it with the engine's
conventions (explicit output names, type harmonization) rather than
re-implementing it with explode(array(struct)), which would defeat
column pruning on the value columns.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unpivot(
    df: DataFrame,
    ids: Sequence[str],
    values: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
    value_type: str = "double",
) -> DataFrame:
    """Melt ``values`` columns into (variable, value) rows keyed by
    ``ids``. All value columns are cast to ``value_type`` first — Spark's
    unpivot requires a common type, and making the cast explicit here
    beats letting analysis pick a surprise common supertype.

    Scale: narrow map-side transform, no shuffle; output is
    len(values)× the rows but prunes to only the referenced columns.
    """
    casted = df.select(
        *ids, *[F.col(c).cast(value_type).alias(c) for c in values]
    )
    return casted.unpivot(list(ids), list(values), var_name, value_name)


def dictionary_encode(
    df: DataFrame,
    col: str,
    id_col: str = "code",
    start: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Stable dictionary encoding of a string/categorical column:
    assigns each distinct value a dense integer id in lexicographic
    order (deterministic — no dependence on partitioning or insertion
    order, unlike ``monotonically_increasing_id``), the id-compaction
    step behind label/token/feature-id assignment in training-data
    pipelines.

    Returns ``(encoded_df, dict_df)``: the input with ``id_col``
    appended, and the (value, id) dictionary itself.

    Shape: the ranking window runs over the DISTINCT value set only —
    dictionary-sized, not corpus-sized (that is the point of
    encoding), so the single-partition sort the global window implies
    is a dictionary sort, never a data sort. The corpus itself is
    touched by one hash aggregation (distinct) and one equi-join that
    Spark auto-broadcasts whenever the dictionary is under the
    broadcast threshold; a billion-value dictionary would need the
    sort-merge path — still one shuffle of dictionary-sized data.
    NULL values get NULL ids (absent from the dictionary).
    """
    from pyspark.sql.window import Window

    dict_df = (
        df.select(col)
        .where(F.col(col).isNotNull())
        .distinct()
        .withColumn(
            id_col,
            F.dense_rank().over(Window.orderBy(col)) - 1 + F.lit(start),
        )
    )
    encoded = df.join(dict_df, on=col, how="left")
    return encoded, dict_df
