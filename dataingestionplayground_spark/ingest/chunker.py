"""Chunking (D7 in SURVEY.md §2.9).

The reference chunks with ``SemanticSimilarityChunker`` (library-side:
split at semantic-similarity boundaries under a BertTokenizer token
budget, ``VectorStoreCommands.cs:150-151``, ``Program.cs:70``). Internals
are not in the snapshot, so the engine defines its own documented,
deterministic contract (SURVEY.md §7.4):

* **token-window chunker** (default, fully deterministic): concatenate a
  document's element texts in order, split into fixed ``max_tokens``
  windows with ``overlap`` carried tokens.
* **semantic chunker**: sentence-split, embed sentences (any embedding
  fn — deterministic hash embedding by default), start a new chunk when
  adjacent-sentence cosine falls below ``threshold`` or the token budget
  would overflow.

Both run per-document inside ``applyInPandas`` over a doc-id grouping —
the natural Spark unit for "one document at a time" semantics the
reference applies (``VectorStoreCommands.cs:30-48``), but distributed.

Chunk context := the document's first header (title), mirroring the
context field the reference writes alongside content
(``VectorStoreCommands.cs:100-102``).
"""

from __future__ import annotations

import re
from typing import Callable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_SENT_RE = re.compile(r"(?<=[.!?])\s+")

CHUNK_STAGE_SCHEMA = T.StructType(
    [
        T.StructField("documentid", T.StringType(), False),
        T.StructField("chunk_idx", T.IntegerType(), False),
        T.StructField("content", T.StringType(), False),
        T.StructField("context", T.StringType(), True),
    ]
)


def token_windows(tokens: list[str], max_tokens: int, overlap: int = 0) -> list[list[str]]:
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    out = []
    step = max_tokens - overlap
    for start in range(0, len(tokens), step):
        win = tokens[start : start + max_tokens]
        if not win:
            break
        out.append(win)
        if start + max_tokens >= len(tokens):
            break
    return out


def semantic_splits(
    sentences: list[str],
    embed: Callable[[str], list[float]],
    threshold: float,
    max_tokens: int,
) -> list[str]:
    """Greedy semantic chunking: break where adjacent-sentence cosine drops
    below ``threshold`` or the token budget would overflow."""
    if not sentences:
        return []
    vecs = [np.array(embed(s)) for s in sentences]
    chunks: list[list[str]] = [[sentences[0]]]
    budget = len(sentences[0].split())
    for i in range(1, len(sentences)):
        a, b = vecs[i - 1], vecs[i]
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        cos = float(a @ b / (na * nb)) if na > 0 and nb > 0 else 0.0
        n_tok = len(sentences[i].split())
        if cos < threshold or budget + n_tok > max_tokens:
            chunks.append([sentences[i]])
            budget = n_tok
        else:
            chunks[-1].append(sentences[i])
            budget += n_tok
    return [" ".join(c) for c in chunks]


def _chunk_doc(
    pdf: pd.DataFrame,
    strategy: str,
    max_tokens: int,
    overlap: int,
    threshold: float,
    embed,
) -> pd.DataFrame:
    """Chunk ONE document's (already sorted) element rows."""
    doc_id = pdf["doc_id"].iloc[0]
    headers = pdf[pdf["kind"] == "header"]
    body = " ".join(t for t in pdf["text"].tolist() if t)
    if len(headers):
        context = headers["text"].iloc[0]
    else:
        # header-less sources (PDF pages, plain-text corpora): lead words
        head = body.split()[:8]
        context = " ".join(head) if head else None
    if strategy == "token_window":
        contents = [" ".join(w) for w in token_windows(body.split(), max_tokens, overlap)]
    else:
        sentences = [s for s in _SENT_RE.split(body) if s.strip()]
        contents = semantic_splits(sentences, embed, threshold, max_tokens)
    return pd.DataFrame(
        {
            "documentid": [doc_id] * len(contents),
            "chunk_idx": list(range(len(contents))),
            "content": contents,
            "context": [context] * len(contents),
        }
    )


def chunk_elements(
    elements: DataFrame,
    max_tokens: int = 64,
    overlap: int = 8,
    strategy: str = "token_window",
    threshold: float = 0.25,
    embed: Callable[[str], list[float]] | None = None,
) -> DataFrame:
    """Element rows -> chunk-stage rows (documentid, chunk_idx, content,
    context); one shuffle on doc_id.

    Implementation: repartition+sort by doc_id, then ``mapInPandas`` with
    a carry-over buffer for documents that straddle Arrow batches — one
    Python call per ~10k-row batch instead of one per document
    (``applyInPandas`` per tiny group was the pipeline's bottleneck:
    ~5ms/doc of per-group overhead).
    """
    if strategy not in ("token_window", "semantic"):
        raise ValueError(strategy)
    if strategy == "semantic" and embed is None:
        from dataingestionplayground_spark.ingest.embed import hash_embed

        embed = hash_embed

    prepared = (
        elements.select("doc_id", "section_idx", "block_idx", "kind", "text")
        .repartition("doc_id")
        .sortWithinPartitions("doc_id", "section_idx", "block_idx")
    )
    cols = [f.name for f in CHUNK_STAGE_SCHEMA.fields]

    def chunk_docs(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = [
            _chunk_doc(g, strategy, max_tokens, overlap, threshold, embed)
            for _, g in pdf.groupby("doc_id", sort=False)
        ]
        return pd.concat(outs) if outs else pd.DataFrame(columns=cols)

    def run(batches):
        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            # hold back the last document: it may continue in the next batch
            last_doc = pdf["doc_id"].iloc[-1]
            carry = pdf[pdf["doc_id"] == last_doc]
            main = pdf[pdf["doc_id"] != last_doc]
            if len(main):
                yield chunk_docs(main)
        if carry is not None and len(carry):
            yield chunk_docs(carry)

    return prepared.mapInPandas(run, schema=CHUNK_STAGE_SCHEMA)
