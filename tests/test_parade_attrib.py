"""Round-6 batch 4: paragraph-scope dedup + last-touch attribution."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quanta_etl_spark.operators import corpus as C
from quanta_etl_spark.operators import events as E


# ---------- paragraph_dedup ----------

def test_paragraph_dedup_removes_boilerplate(spark):
    docs = spark.createDataFrame(
        [
            (1, "unique alpha. SUBSCRIBE NOW. more alpha"),
            (2, "unique beta. SUBSCRIBE NOW"),
            (3, "unique gamma"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           C.paragraph_dedup(docs, min_repeats=2).collect()}
    assert out[1]["n_paras"] == 3 and out[1]["n_kept"] == 2
    assert out[1]["clean_text"] == "unique alpha. more alpha"
    assert out[2]["clean_text"] == "unique beta"
    assert out[3]["clean_text"] == "unique gamma"


def test_paragraph_dedup_all_boilerplate_doc_survives(spark):
    docs = spark.createDataFrame(
        [(1, "SPAM"), (2, "SPAM"), (3, "real content")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           C.paragraph_dedup(docs, min_repeats=2).collect()}
    assert set(out) == {1, 2, 3}  # no rows vanish
    assert out[1]["n_kept"] == 0 and out[1]["clean_text"] == ""
    assert out[3]["clean_text"] == "real content"


def test_paragraph_dedup_within_doc_repeat_not_removed(spark):
    # repeats WITHIN one doc don't count toward the corpus threshold
    # (count_distinct on doc id)
    docs = spark.createDataFrame(
        [(1, "echo. echo. echo"), (2, "other")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           C.paragraph_dedup(docs, min_repeats=2).collect()}
    assert out[1]["n_kept"] == 3
    assert out[1]["clean_text"] == "echo. echo. echo"


# ---------- attribute_last_touch ----------

def _events(spark):
    rows = [
        # user 1: click(c1) -> purchase(100) -> click(c2) -> purchase(50)
        (1, "2024-01-01 10:00:00", "click", "c1", 0.0, 1),
        (1, "2024-01-01 11:00:00", "purchase", None, 100.0, 2),
        (1, "2024-01-01 12:00:00", "click", "c2", 0.0, 3),
        (1, "2024-01-01 13:00:00", "purchase", None, 50.0, 4),
        # user 2: purchase with no prior touch
        (2, "2024-01-01 09:00:00", "purchase", None, 70.0, 5),
        (2, "2024-01-01 10:00:00", "click", "c9", 0.0, 6),
    ]
    return spark.createDataFrame(
        rows, "user_id long, d string, event_type string, camp string,"
              " value double, event_id long"
    ).withColumn("ts", F.to_timestamp("d"))


def test_last_touch_attribution(spark):
    out = E.attribute_last_touch(
        _events(spark), "user_id", "ts",
        conversion_pred=F.col("event_type") == "purchase",
        touch_pred=F.col("event_type") == "click",
        touch_key=F.col("camp"),
        tiebreak_cols=["event_id"],
    ).collect()
    by_id = {r["event_id"]: r["attributed_key"] for r in out}
    assert by_id == {2: "c1", 4: "c2", 5: None}


def test_last_touch_same_ts_tiebreak(spark):
    rows = [
        (1, "2024-01-01 10:00:00", "click", "cA", 0.0, 1),
        (1, "2024-01-01 10:00:00", "purchase", None, 10.0, 2),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, d string, event_type string, camp string,"
              " value double, event_id long"
    ).withColumn("ts", F.to_timestamp("d"))
    out = E.attribute_last_touch(
        df, "user_id", "ts",
        F.col("event_type") == "purchase",
        F.col("event_type") == "click",
        F.col("camp"), tiebreak_cols=["event_id"],
    ).collect()
    # click sorts before the purchase (smaller event_id) -> attributed
    assert out[0]["attributed_key"] == "cA"


def test_paragraph_dedup_null_text_doc_survives(spark):
    """split(NULL) explodes to nothing — the id spine must still carry
    the document through with 0 paragraphs (review r6 finding)."""
    docs = spark.createDataFrame(
        [(1, "real content"), (2, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           C.paragraph_dedup(docs, min_repeats=2).collect()}
    assert set(out) == {1, 2}
    assert out[2]["n_paras"] == 0 and out[2]["n_kept"] == 0
    assert out[2]["clean_text"] == ""


def test_paragraph_dedup_oracle_keeps_null_text_doc():
    """Differential pin for the ADVICE r6 oracle fix: the DuckDB
    oracle's doc spine must come from the input table (a NULL-text doc
    stays as (0, 0, md5(''))), mirroring the operator's no-rows-vanish
    contract — unnest(string_split(NULL)) emits zero rows, so a spine
    derived from the exploded frame would drop the document."""
    import duckdb

    import __spark_entry__ as E

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(0, CAST(NULL AS VARCHAR)), "
        "(1, 'alpha beta. gamma delta'), "
        "(2, 'epsilon zeta. gamma delta')"
        ") AS v(doc_id, text)"
    )
    rows = {
        r[0]: r for r in con.sql(E.oracle_sql()["paragraph_dedup"]).fetchall()
    }
    assert 0 in rows, "NULL-text doc vanished from the oracle spine"
    doc0 = rows[0]
    # (doc_id, n_paras, n_kept, clean_md5) — md5('') for empty clean
    assert doc0[1] == 0 and doc0[2] == 0
    assert doc0[3] == "d41d8cd98f00b204e9800998ecf8427e"
    assert set(rows) == {0, 1, 2}
