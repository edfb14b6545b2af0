from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quanta_etl_spark.functions import text as T


@pytest.fixture(scope="module")
def tdf(spark):
    rows = [
        (1, "The cat sat on the mat and it was happy."),
        (2, "Der Hund und die Katze sind auf der Straße."),
        (3, "Le chat est dans la maison avec le chien."),
        (4, ""),
        (5, "xyzzy plugh 12345 !!!"),
    ]
    return spark.createDataFrame(rows, "id int, text string")


def test_token_count(tdf):
    out = {r.id: r.n for r in tdf.select("id", T.token_count("text").alias("n")).collect()}
    assert out[1] == 10
    assert out[4] == 0
    assert out[5] == 4


def test_bpe_ish_tokens(tdf):
    out = {
        r.id: r.toks
        for r in tdf.select("id", T.bpe_ish_tokens("text").alias("toks")).collect()
    }
    assert out[5] == ["xyzzy", "plugh", "12345", "!", "!", "!"]


def test_lang_id(tdf):
    out = {r.id: r.lang for r in tdf.select("id", T.lang_id("text").alias("lang")).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "fr"
    assert out[5] == "und"


def test_quality_score_bounds_and_monotonicity(spark):
    rows = [
        (1, "the " * 300 + "of and to in is that it was for on"),  # long, stopword-rich
        (2, "!!!! ???? ;;;; ((((" * 5),  # pure punctuation
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {r.id: r.q for r in df.select("id", T.quality_score("text").alias("q")).collect()}
    assert 0.0 <= out[2] < out[1] <= 1.0


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "  HELLO\tWORLD ")],
        "id int, text string",
    )
    fps = [r.fp for r in df.select(T.fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1] == fps[2]


def test_char_shingles(spark):
    df = spark.createDataFrame([(1, "abcdef")], "id int, text string")
    sh = df.select(T.char_shingles("text", 3).alias("s")).first().s
    assert sh == ["abc", "bcd", "cde", "def"]
    short = spark.createDataFrame([(1, "ab")], "id int, text string")
    assert short.select(T.char_shingles("text", 5).alias("s")).first().s == ["ab"]


def test_winnow_fingerprints_properties(spark):
    """Winnowing guarantees: identical (normalized) docs have identical
    fingerprints; docs sharing a long substring share >=1 fingerprint;
    fingerprint density is ~2/(w+1) of the hash count."""
    from pyspark.sql import functions as F

    from quanta_etl_spark.functions.text import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (1, shared),
        (2, "THE  quick   brown fox jumps over the lazy dog near the river bank"),
        (3, "completely different content about database query optimization"),
        (4, "intro text then " + shared + " and some trailing words"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    fps = {
        r["id"]: set(r["fp"])
        for r in df.select(
            "id", winnow_fingerprints("text", k=7, window=4).alias("fp")
        ).collect()
    }
    assert fps[1] == fps[2]  # normalization: case + whitespace invariant
    assert fps[1] & fps[4]  # shared substring -> shared fingerprint
    assert not (fps[1] & fps[3])
    assert len(fps[5]) == 1  # degenerate doc -> single hash of ''
    # density: selected fingerprints are a small fraction of all hashes
    n_hashes = len(shared) - 6
    assert len(fps[1]) < n_hashes * 0.6


def test_strip_html_and_entities(spark):
    df = spark.createDataFrame(
        [("<div>a &amp; b</div><br/>c &lt;tag&gt; &#39;q&#39;",)], "t string"
    )
    out = df.select(T.strip_html("t").alias("s")).collect()[0]["s"]
    assert out == "a & b c <tag> 'q'"


def test_extract_urls_and_domains(spark):
    txt = "see https://A.Example.com/x?q=1 and http://b.org/p, done"
    df = spark.createDataFrame([(txt,)], "t string")
    r = df.select(
        T.extract_urls("t").alias("u"), T.url_domains("t").alias("d")
    ).collect()[0]
    assert r["u"] == ["https://A.Example.com/x?q=1", "http://b.org/p,"]
    assert r["d"] == ["a.example.com", "b.org"]


def test_redact_pii(spark):
    txt = "mail jane.doe+x@corp.io or call +44 (0)20-7946 0958 now"
    df = spark.createDataFrame([(txt,)], "t string")
    out = df.select(T.redact_pii("t").alias("s")).collect()[0]["s"]
    assert "jane.doe" not in out and "7946" not in out
    assert out.count("[REDACTED]") == 2
    assert out.startswith("mail [REDACTED] or call ")


def test_udtf_split_sentences(spark):
    from quanta_etl_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "First one. Second!  Third? "), (2, "no boundary"), (3, None)],
        ["doc_id", "text"],
    )
    df.createOrReplaceTempView("__udtf_test_docs")
    rows = spark.sql(
        "SELECT d.doc_id, s.sent_id, s.sentence "
        "FROM __udtf_test_docs d, LATERAL split_sentences(d.text) s"
    ).collect()
    got = {(r["doc_id"], r["sent_id"]): r["sentence"] for r in rows}
    assert got == {
        (1, 0): "First one",
        (1, 1): "Second",
        (1, 2): "Third",  # trailing "? " is itself a boundary match
        (2, 0): "no boundary",
    }


def test_token_entropy_values(spark):
    import math
    from quanta_etl_spark.operators import text_stats as ts_ops

    df = spark.createDataFrame(
        [
            (1, "a a a a"),            # one token: H = 0
            (2, "a b c d"),            # uniform over 4: H = 2 bits
            (3, "a a b b b b"),        # p = (1/3, 2/3)
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["entropy_bits"])
        for r in ts_ops.token_entropy(df, "doc_id", "text").collect()
    }
    assert got[1] == (4, 0.0)
    assert got[2][1] == pytest.approx(2.0)
    expect3 = -(1 / 3) * math.log2(1 / 3) - (2 / 3) * math.log2(2 / 3)
    assert got[3][1] == pytest.approx(expect3)
    assert got[4] == (0, None)


def test_parse_kv_polymorphic_schema(spark):
    """The analyze() hook derives a DIFFERENT output schema per call
    site from the constant `keys` argument; missing keys are NULL."""
    from quanta_etl_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "a=1;b=two;c=3"), (2, "b=only"), (3, None)], "id long, payload string"
    )
    df.createOrReplaceTempView("kv_payloads")
    two = spark.sql(
        "SELECT p.id, s.* FROM kv_payloads p, "
        "LATERAL parse_kv(p.payload, 'a,b') s"
    )
    assert two.columns == ["id", "a", "b"]
    got = {r.id: (r.a, r.b) for r in two.collect()}
    assert got == {1: ("1", "two"), 2: (None, "only"), 3: (None, None)}
    # same UDTF, different call site, different schema
    three = spark.sql(
        "SELECT s.* FROM kv_payloads p, "
        "LATERAL parse_kv(p.payload, 'c, b, missing') s"
    )
    assert three.columns == ["c", "b", "missing"]
    assert {tuple(r) for r in three.collect()} == {
        ("3", "two", None), (None, "only", None), (None, None, None)
    }
