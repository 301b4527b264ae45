"""Embedding generation (D8 in SURVEY.md §2.9).

The reference embeds with a local all-MiniLM-L6-v2 ONNX model, 384 dims,
used at both ingest and search time (``Program.cs:64-73``,
``VectorStoreOptions.cs:13,17``). Two engines here:

* ``hash_embed`` — deterministic, dependency-free 384-d embedding: each
  token hashes (sha256-seeded) to a pseudo-random unit direction, the
  document vector is the normalized token sum. Same shape/contract as a
  real model, fully reproducible -> usable in correctness oracles and CI.
* real sentence-transformers/ONNX path — gated behind an import-try; the
  container does not ship the model, so it raises with guidance.

Both run as an Arrow-batched ``pandas_udf``: the model (or hash state) is
initialized once per executor python worker, vectors never round-trip
through the driver, and batches amortize the JVM<->Python boundary —
the Spark analogue of the reference's in-process ONNX calls.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

DIMS = 384  # VectorStoreOptions.cs:17


def _token_vec(token: str, dims: int = DIMS) -> np.ndarray:
    """Deterministic unit-ish direction for a token: sha256 bytes expanded
    to dims via a seeded Generator (stable across platforms/processes)."""
    seed = int.from_bytes(hashlib.sha256(token.encode("utf-8")).digest()[:8], "big")
    rng = np.random.Generator(np.random.PCG64(seed))
    v = rng.standard_normal(dims)
    return v


def hash_embed(text: str, dims: int = DIMS) -> list[float]:
    """Embed one string deterministically (driver-side use: query vectors)."""
    toks = [t for t in text.lower().split() if t]
    if not toks:
        return [0.0] * dims
    acc = np.zeros(dims)
    for t in toks:
        acc += _token_vec(t, dims)
    n = float(np.linalg.norm(acc))
    if n > 0:
        acc = acc / n
    return [float(np.float32(x)) for x in acc]


def embed_text_udf(dims: int = DIMS):
    """pandas_udf embedding a STRING column -> ARRAY<FLOAT>.

    Iterator form: per-executor state (the token-vector cache) initializes
    once and persists across batches — the pattern a real model loader
    uses (load ONNX once per worker, not per batch).
    """

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        cache: dict[str, np.ndarray] = {}

        def tv(tok: str) -> np.ndarray:
            v = cache.get(tok)
            if v is None:
                v = _token_vec(tok, dims)
                if len(cache) < 200_000:  # bound executor memory
                    cache[tok] = v
            return v

        for s in batches:
            out = []
            for text in s:
                toks = [t for t in (text or "").lower().split() if t]
                if not toks:
                    out.append([0.0] * dims)
                    continue
                acc = np.zeros(dims)
                for t in toks:
                    acc += tv(t)
                n = float(np.linalg.norm(acc))
                if n > 0:
                    acc /= n
                out.append(np.float32(acc).tolist())
            yield pd.Series(out)

    return embed


def real_model_udf(model_name: str = "sentence-transformers/all-MiniLM-L6-v2"):
    """Real-model path (not available in this container) — kept as the
    production wiring: broadcast model files, load once per worker."""
    try:
        import sentence_transformers  # noqa: F401
    except ImportError as e:  # pragma: no cover - env without the lib
        raise NotImplementedError(
            "sentence-transformers not installed; use embed_text_udf() "
            "(deterministic hash embedding) or install the model runtime"
        ) from e

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:  # pragma: no cover
        from sentence_transformers import SentenceTransformer

        model = SentenceTransformer(model_name)
        for s in batches:
            vecs = model.encode([t or "" for t in s], normalize_embeddings=True)
            yield pd.Series([v.tolist() for v in vecs])

    return embed
