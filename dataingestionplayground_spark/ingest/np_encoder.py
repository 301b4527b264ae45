"""Pure-numpy MiniLM-style sentence encoder (D8 in SURVEY.md §2.9).

The reference embeds with a local all-MiniLM-L6-v2 ONNX model through
onnxruntime (``Program.cs:64-73``, ``VectorStoreOptions.cs:13,17``).
This container ships neither onnxruntime nor model weights, so the
real-model path (``ingest/embed.py:onnx_model_udf``) could never
execute. This module closes that gap with the same COMPUTATION in
numpy: WordPiece tokenization, a BERT-style transformer encoder stack
(multi-head self-attention, GELU feed-forward, post-layernorm
residuals, learned positions), masked mean pooling, a dense projection
head, and L2 normalization — exactly the sentence-transformers recipe
the reference model uses, minus the C runtime.

Weights load from a single ``.npz`` checkpoint whose arrays use the
names below; the vendored test checkpoint
(``tests/fixtures/tiny_encoder/encoder.npz``, generated once by
``scripts/make_tiny_encoder.py`` with seeded init and a vocabulary
built from the reference's own Content corpus) makes the path
executable and byte-reproducible offline. A checkpoint exported from
the real MiniLM (same array names) drops in unchanged.

Checkpoint arrays (H=hidden, F=ffn, V=vocab, S=max_seq, D=out dims):
``vocab`` (V, unicode), ``tok_emb`` (V,H), ``pos_emb`` (S,H),
``emb_ln_g/b`` (H), per layer i ``li_{Wq,Wk,Wv,Wo}`` (H,H) +
``li_{bq,bk,bv,bo}`` (H) + ``li_ln1_g/b`` (H) + ``li_W1`` (H,F) /
``li_b1`` (F) / ``li_W2`` (F,H) / ``li_b2`` (H) + ``li_ln2_g/b`` (H),
``proj_W`` (H,D), ``proj_b`` (D), ``meta`` = [layers, heads, max_seq].
Arrays may be stored float16 (exact to load) — compute is float32.
"""

from __future__ import annotations

import re

import numpy as np

_WORD_RE = re.compile(r"[a-z0-9]+|[^\sa-z0-9]")

PAD, UNK, CLS, SEP = "[PAD]", "[UNK]", "[CLS]", "[SEP]"


def _layernorm(x: np.ndarray, g: np.ndarray, b: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * g + b


def _gelu(x: np.ndarray) -> np.ndarray:
    # tanh approximation (the BERT original; deterministic everywhere)
    return 0.5 * x * (1.0 + np.tanh(0.7978845608028654 * (x + 0.044715 * x**3)))


def _softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


class WordPieceTokenizer:
    """Greedy longest-match-first WordPiece over a lowercased
    letters/digits/punctuation pre-split — the all-MiniLM tokenizer's
    algorithm. Words with no matchable piece become [UNK] (the vendored
    vocab carries every single character + ##continuation, so ascii
    never hits UNK)."""

    def __init__(self, vocab: list[str]):
        self.vocab = list(vocab)
        self.ids = {t: i for i, t in enumerate(self.vocab)}

    def _wordpiece(self, word: str) -> list[str]:
        pieces: list[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.ids:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [UNK]
            pieces.append(cur)
            start = end
        return pieces

    def encode(self, text: str, max_seq: int) -> list[int]:
        toks = [CLS]
        for w in _WORD_RE.findall((text or "").lower()):
            toks.extend(self._wordpiece(w))
            if len(toks) >= max_seq - 1:
                break
        toks = toks[: max_seq - 1] + [SEP]
        return [self.ids[t] for t in toks]


class NumpyEncoder:
    """Loads an ``.npz`` checkpoint once; ``encode()`` runs the full
    transformer forward pass on a batch (padded + attention-masked) and
    returns L2-normalized float32 sentence vectors."""

    def __init__(self, path: str):
        z = np.load(path, allow_pickle=False)
        self.w = {k: np.asarray(z[k], dtype=np.float32) for k in z.files if k != "vocab"}
        self.tokenizer = WordPieceTokenizer([str(t) for t in z["vocab"]])
        self.n_layers, self.n_heads, self.max_seq = (int(v) for v in z["meta"])
        self.dims = int(self.w["proj_W"].shape[1])

    def encode(self, texts: list[str]) -> np.ndarray:
        w = self.w
        seqs = [self.tokenizer.encode(t, self.max_seq) for t in texts]
        L = max(len(s) for s in seqs)
        ids = np.zeros((len(seqs), L), dtype=np.int64)  # 0 == [PAD]
        mask = np.zeros((len(seqs), L), dtype=np.float32)
        for i, s in enumerate(seqs):
            ids[i, : len(s)] = s
            mask[i, : len(s)] = 1.0

        x = w["tok_emb"][ids] + w["pos_emb"][:L][None, :, :]
        x = _layernorm(x, w["emb_ln_g"], w["emb_ln_b"])
        H = x.shape[-1]
        hd = H // self.n_heads
        # additive mask: padded KEYS score -inf for every query position
        att_bias = (1.0 - mask)[:, None, None, :] * -1e9

        def heads(m: np.ndarray) -> np.ndarray:  # (B,L,H) -> (B,h,L,hd)
            return m.reshape(m.shape[0], m.shape[1], self.n_heads, hd).transpose(0, 2, 1, 3)

        for i in range(self.n_layers):
            p = f"l{i}_"
            q = heads(x @ w[p + "Wq"] + w[p + "bq"])
            k = heads(x @ w[p + "Wk"] + w[p + "bk"])
            v = heads(x @ w[p + "Wv"] + w[p + "bv"])
            scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(hd) + att_bias
            a = _softmax(scores) @ v  # (B,h,L,hd)
            a = a.transpose(0, 2, 1, 3).reshape(x.shape)
            x = _layernorm(x + (a @ w[p + "Wo"] + w[p + "bo"]), w[p + "ln1_g"], w[p + "ln1_b"])
            f = _gelu(x @ w[p + "W1"] + w[p + "b1"]) @ w[p + "W2"] + w[p + "b2"]
            x = _layernorm(x + f, w[p + "ln2_g"], w[p + "ln2_b"])

        m = mask[:, :, None]
        pooled = (x * m).sum(1) / np.clip(m.sum(1), 1e-9, None)
        out = pooled @ w["proj_W"] + w["proj_b"]
        out /= np.clip(np.linalg.norm(out, axis=1, keepdims=True), 1e-12, None)
        return out.astype(np.float32)


_CACHE: dict[str, NumpyEncoder] = {}


def get_encoder(path: str) -> NumpyEncoder:
    """Process-level cache: one checkpoint load per python worker."""
    enc = _CACHE.get(path)
    if enc is None:
        enc = _CACHE[path] = NumpyEncoder(path)
    return enc


def encode_texts(path: str, texts: list[str]) -> list[list[float]]:
    """Driver-side helper (query embedding for search)."""
    return [v.tolist() for v in get_encoder(path).encode(texts)]
