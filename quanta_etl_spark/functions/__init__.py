"""Scalar/expression function families (pure Catalyst columns).

``text``: tokenization, language ID, quality scoring, fingerprints,
shingles. ``vectors``: dot/norm/cosine/L2 over array columns.
"""

from quanta_etl_spark.functions import text, vectors  # noqa: F401
