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
