"""Semi-structured (JSON / map) column functions — pure Catalyst.

The reference's tables are flat strings/doubles (SURVEY.md §1.2: no
ArrayType/MapType/JSON anywhere), but real event feeds carry JSON
payload columns (the testdata ``events.props`` column is exactly that).
These helpers expose Spark's JVM-side JSON path machinery behind the
engine API — no Python UDFs, so extraction stays inside whole-stage
codegen and the parquet scan only reads the payload column when a path
is actually selected.

Scale notes: ``get_json_object`` re-parses the document per call, so
for >2 extracted paths prefer ``parse_json_struct`` (one ``from_json``
parse, struct fields pruned by Catalyst) or ``json_tuple`` (one parse,
N top-level fields).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def json_path(col: str | Column, path: str) -> Column:
    """Extract one JSON path (``$.a.b``) as a string column."""
    return F.get_json_object(col if isinstance(col, Column) else F.col(col), path)


def json_path_typed(col: str | Column, path: str, dtype: str) -> Column:
    """Extract one JSON path and cast it (``dtype`` e.g. 'bigint')."""
    return json_path(col, path).cast(dtype)


def parse_json_struct(col: str | Column, schema: str) -> Column:
    """Parse the whole JSON document once into a typed struct
    (``schema`` is DDL, e.g. ``'k BIGINT, tags ARRAY<STRING>'``).
    Malformed documents yield null fields (PERMISSIVE mode)."""
    return F.from_json(col if isinstance(col, Column) else F.col(col), schema)


def with_json_fields(
    df: DataFrame, col: str, fields: Mapping[str, str]
) -> DataFrame:
    """Explode selected JSON fields into top-level typed columns:
    ``fields`` maps new column name -> DDL type; field names are looked
    up at the JSON top level. One ``from_json`` parse for all fields."""
    schema = ", ".join(f"{name} {dtype}" for name, dtype in fields.items())
    parsed = parse_json_struct(col, schema)
    out = df
    for name in fields:
        out = out.withColumn(name, parsed[name])
    return out


def map_from_json(col: str | Column) -> Column:
    """Parse a flat JSON object into a ``map<string,string>`` — the
    schemaless fallback when payload keys vary by row."""
    return F.from_json(
        col if isinstance(col, Column) else F.col(col), "map<string,string>"
    )


def to_json_payload(*cols: str, **named: Column) -> Column:
    """Pack columns into a JSON string payload (the writer-side twin of
    the extractors): ``to_json(struct(...))``."""
    parts: list[Column] = [F.col(c) for c in cols]
    parts += [c.alias(n) for n, c in named.items()]
    return F.to_json(F.struct(*parts))
