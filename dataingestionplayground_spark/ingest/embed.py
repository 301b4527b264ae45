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


def numpy_transformer_udf(model_path: str):
    """REAL transformer forward-pass embedding, executable in this
    container: WordPiece -> BERT-style encoder stack -> masked mean
    pool -> projection -> L2 norm, all numpy (``ingest/np_encoder.py``),
    weights from an ``.npz`` checkpoint. Same iterator-pandas_udf
    plumbing as ``onnx_model_udf`` — checkpoint loads ONCE per executor
    python worker (process-level cache), batches stream through Arrow.

    This is the D8 wiring proven end-to-end
    (``tests/test_np_encoder.py`` ingests the reference's Content corpus
    with it and asserts 3-format search parity); swapping the vendored
    tiny checkpoint for an exported MiniLM one changes quality, not code.
    """

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from dataingestionplayground_spark.ingest.np_encoder import get_encoder

        enc = get_encoder(model_path)
        for s in batches:
            vecs = enc.encode([t or "" for t in s])
            yield pd.Series([v.tolist() for v in vecs])

    return embed


def onnx_model_udf(model_path: str, tokenizer_path: str, max_seq: int = 256):
    """ONNX-runtime embedding path — the closest analogue of the
    reference's in-process ONNX all-MiniLM-L6-v2 calls (``Program.cs:64-73``:
    local .onnx + vocab file, 384-d output).

    Session + tokenizer load ONCE per executor python worker (inside the
    iterator udf, before the batch loop); mean-pooled last hidden state,
    L2-normalized — the standard sentence-transformers pooling. Raises
    NotImplementedError when onnxruntime/tokenizers are absent (this
    container); the deterministic ``embed_text_udf`` is the CI/oracle path.
    """
    try:
        import onnxruntime  # noqa: F401
        import tokenizers  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "onnxruntime/tokenizers not installed; use embed_text_udf() "
            "(deterministic hash embedding) or install the model runtime"
        ) from e

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:  # pragma: no cover
        import onnxruntime as ort
        from tokenizers import Tokenizer

        sess = ort.InferenceSession(model_path, providers=["CPUExecutionProvider"])
        tok = Tokenizer.from_file(tokenizer_path)
        tok.enable_truncation(max_length=max_seq)
        tok.enable_padding()
        input_names = {i.name for i in sess.get_inputs()}
        for s in batches:
            enc = tok.encode_batch([t or "" for t in s])
            ids = np.array([e.ids for e in enc], dtype=np.int64)
            mask = np.array([e.attention_mask for e in enc], dtype=np.int64)
            feeds = {"input_ids": ids, "attention_mask": mask}
            if "token_type_ids" in input_names:
                feeds["token_type_ids"] = np.zeros_like(ids)
            hidden = sess.run(None, feeds)[0]  # (batch, seq, dims)
            m = mask[..., None].astype(np.float32)
            pooled = (hidden * m).sum(axis=1) / np.clip(m.sum(axis=1), 1e-9, None)
            pooled /= np.clip(np.linalg.norm(pooled, axis=1, keepdims=True), 1e-12, None)
            yield pd.Series([row.astype(np.float32).tolist() for row in pooled])

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
