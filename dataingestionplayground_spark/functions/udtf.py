"""Python UDTFs (Spark 4 user-defined table functions) — the engine's
generator-function surface (SURVEY.md §2.11: the reference's exploding
parsers act as UDTFs; here is the first-class variant).

``SentenceSplit`` mirrors the chunker's sentence stage as a lateral-join
table function: one input row -> N (sentence_idx, sentence, n_tokens)
rows, usable directly from SQL:

    SELECT d.doc_id, s.* FROM documents d,
    LATERAL sentence_split(d.text) s
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_SENT_RE = re.compile(r"(?<=[.!?])\s+")


@udtf(returnType="sentence_idx int, sentence string, n_tokens int")
class SentenceSplit:
    def eval(self, text: str):
        if not text:
            return
        for i, s in enumerate(p for p in _SENT_RE.split(text) if p.strip()):
            yield i, s.strip(), len(s.split())


def register_udtfs(spark) -> None:
    """Expose the UDTF surface to SQL (idempotent)."""
    spark.udtf.register("sentence_split", SentenceSplit)
