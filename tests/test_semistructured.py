"""JSON / map function family (functions.semistructured)."""

from __future__ import annotations

import pyspark.sql.functions as F

from quanta_etl_spark.functions import semistructured as SS


def _df(spark):
    return spark.createDataFrame(
        [
            (1, '{"k": 7, "tag": "a", "nested": {"x": 1.5}}'),
            (2, '{"k": 42, "tag": "b"}'),
            (3, "not json"),
            (4, None),
        ],
        ["id", "props"],
    )


def test_json_path_typed_and_malformed(spark):
    df = _df(spark)
    got = {
        r["id"]: r["k"]
        for r in df.select(
            "id", SS.json_path_typed("props", "$.k", "bigint").alias("k")
        ).collect()
    }
    assert got == {1: 7, 2: 42, 3: None, 4: None}


def test_json_path_nested(spark):
    df = _df(spark)
    got = df.select(
        SS.json_path_typed("props", "$.nested.x", "double").alias("x")
    ).collect()
    assert sorted((r["x"] for r in got), key=lambda v: (v is None, v)) == [
        1.5,
        None,
        None,
        None,
    ]


def test_with_json_fields_single_parse(spark):
    df = _df(spark)
    out = SS.with_json_fields(df, "props", {"k": "bigint", "tag": "string"})
    rows = {r["id"]: (r["k"], r["tag"]) for r in out.collect()}
    assert rows[1] == (7, "a")
    assert rows[2] == (42, "b")
    assert rows[3] == (None, None)
    # exactly one from_json evaluation in the plan (fields share a parse)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("from_json") <= 2  # alias in two withColumns pre-CSE


def test_map_from_json_fallback(spark):
    df = _df(spark)
    got = {
        r["id"]: r["m"]
        for r in df.select("id", SS.map_from_json("props").alias("m")).collect()
    }
    assert got[2] == {"k": "42", "tag": "b"}
    assert got[4] is None


def test_to_json_roundtrip(spark):
    df = spark.createDataFrame([(5, "x")], ["a", "b"])
    payload = df.select(SS.to_json_payload("a", "b").alias("j")).first()["j"]
    assert payload == '{"a":5,"b":"x"}'
    back = df.select(
        SS.parse_json_struct(SS.to_json_payload("a", "b"), "a BIGINT, b STRING")
        .alias("s")
    ).first()["s"]
    assert back["a"] == 5 and back["b"] == "x"
