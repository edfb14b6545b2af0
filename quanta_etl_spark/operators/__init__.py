"""Operator library — the engine's public surface.

Import the families directly::

    from quanta_etl_spark.operators import joins, windows, aggregates
    from quanta_etl_spark.operators.dedup import minhash_dedup_pairs
"""

from quanta_etl_spark.operators import (  # noqa: F401
    aggregates,
    dedup,
    joins,
    quality,
    resample,
    setops,
    similarity,
    windows,
)
