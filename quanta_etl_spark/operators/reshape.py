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
