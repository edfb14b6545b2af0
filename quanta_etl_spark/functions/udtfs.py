"""Python user-defined table functions (Spark 4 UDTF API).

The engine's row-to-rows expansions are Catalyst-native where possible
(``explode``/``posexplode`` — see ``corpus.chunk_documents``); the UDTF
API is the escape hatch for expansions whose logic doesn't reduce to
array building, and the modern replacement for flatMap-style RDD code.
This module keeps the demonstrable, test-covered template.

``split_sentences``: one row per sentence with its 0-based index.
The boundary pattern ``[.!?]+\\s+`` is RE2-compatible ON PURPOSE
(the oracle-portability discipline: Java/Python regex extras like
lookbehind would make SQL engines unable to reproduce the split);
terminal punctuation is consumed by the split, which is the documented
trade for portability.

Register + use::

    spark.udtf.register("split_sentences", SplitSentences)
    spark.sql("SELECT d.doc_id, s.* FROM docs d, "
              "LATERAL split_sentences(d.text) s")

Scale notes: a UDTF evaluates per input row inside the executor's
Python worker — same placement as any Python UDF, so keep it OFF hot
paths that a native explode can express. Output rows stream back per
input row; nothing buffers beyond one row's expansion.
"""

from __future__ import annotations

import re
from typing import Iterator


class SplitSentences:
    """UDTF: (text) -> rows of (sent_id int, sentence string)."""

    _BOUNDARY = re.compile(r"[.!?]+\s+")

    def eval(self, text: str | None) -> Iterator[tuple[int, str]]:
        if not text:
            return
        parts = [p.strip() for p in self._BOUNDARY.split(text)]
        sent_id = 0
        for p in parts:
            if p:
                yield sent_id, p
                sent_id += 1


SPLIT_SENTENCES_RETURN_TYPE = "sent_id int, sentence string"


def register_udtfs(spark) -> None:
    """Register the engine's UDTFs on a session (idempotent)."""
    from pyspark.sql.functions import udtf

    spark.udtf.register(
        "split_sentences",
        udtf(SplitSentences, returnType=SPLIT_SENTENCES_RETURN_TYPE),
    )
    # no returnType: the analyze() hook computes it per call site
    spark.udtf.register("parse_kv", udtf(ParseKV))


class ParseKV:
    """POLYMORPHIC UDTF (Spark 4 ``analyze`` hook): parse ``k=v;k2=v2``
    payloads into one STRING column per requested key — the output
    schema is computed at PLAN TIME from the constant ``keys`` argument,
    so each call site gets exactly the columns it asked for (the
    capability ``explode``/static UDTFs can't express: schema varies per
    call, not per deployment).

    ``keys`` must be a foldable (constant) comma-separated string;
    ``analyze`` rejects non-constant arguments with a plan-time error
    instead of a runtime surprise. Missing keys yield NULL. One output
    row per input row — flat parse, no fan-out."""

    @staticmethod
    def analyze(text, keys):
        from pyspark.sql.types import StringType, StructField, StructType

        if keys.value is None:
            raise Exception("parse_kv: `keys` must be a constant string")
        names = [k.strip() for k in str(keys.value).split(",") if k.strip()]
        if not names:
            raise Exception("parse_kv: `keys` names at least one column")
        from pyspark.sql.udtf import AnalyzeResult

        return AnalyzeResult(
            StructType([StructField(n, StringType()) for n in names])
        )

    def eval(self, text: str | None, keys: str) -> Iterator[tuple]:
        names = [k.strip() for k in keys.split(",") if k.strip()]
        d: dict[str, str] = {}
        if text:
            for pair in text.split(";"):
                if "=" in pair:
                    k, v = pair.split("=", 1)
                    d[k.strip()] = v
        yield tuple(d.get(n) for n in names)
