"""Vector math over ``array<float|double>`` columns — pure Catalyst
expressions, no Python UDFs.

``F.zip_with`` + ``F.aggregate`` keep the arithmetic inside whole-stage
codegen: on a 1000-executor cluster this is the difference between a
scan-speed similarity pass and a Python-serialization bottleneck.
Accumulation is DoubleType regardless of input element type so 32-dim
float embeddings dot-product identically to a DuckDB DOUBLE[] oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL (not an ANSI divide-by-zero error) when
    either vector has zero norm — one all-zero embedding in a 100-TB
    corpus must not abort the whole job. Callers rank/threshold on the
    result, and NULL drops out of both ``>=`` filters and top-k windows."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize a vector (array<double> out). Zero vectors come
    back unchanged (all-zero), not NaN — ``try_divide`` semantics."""
    a = F.col(a) if isinstance(a, str) else a
    n = l2_norm(a)
    return F.transform(
        a,
        lambda v: F.coalesce(
            F.try_divide(v.cast("double"), n), F.lit(0.0)
        ),
    )


def l2_distance(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
