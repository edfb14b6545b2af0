"""Scalar/expression function families (pure Catalyst columns).

``text``: tokenization, language ID, quality scoring, fingerprints,
shingles. ``vectors``: dot/norm/cosine/L2 over array columns.
``semistructured``: JSON path extraction, typed struct parsing, map
fallback, JSON packing.
"""

from quanta_etl_spark.functions import (  # noqa: F401
    semistructured,
    text,
    vectors,
)
