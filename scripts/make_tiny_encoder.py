"""Generate the vendored tiny transformer checkpoint
(tests/fixtures/tiny_encoder/encoder.npz) used to exercise the
real-model embedding path offline (see ingest/np_encoder.py).

Seeded init => byte-reproducible. The vocabulary is built from the
reference's own Content corpus (markdown + the CMS.DB articles — public
sample text shipped with the reference app) plus full single-character
coverage so ascii words never tokenize to [UNK]. Standard BERT init
scale (0.02): residual streams dominate, so pooled outputs retain
token-identity information and corpus-vocabulary retrieval works, while
every transformer component (attention mixing, GELU FFN, layernorm,
masking) genuinely executes.

Run from the repo root: python scripts/make_tiny_encoder.py
Commits the .npz plus a golden-activation record used as a
forward-pass regression test.
"""

from __future__ import annotations

import json
import os
import re
import sqlite3
import string
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataingestionplayground_spark.ingest.np_encoder import (  # noqa: E402
    CLS,
    PAD,
    SEP,
    UNK,
    NumpyEncoder,
)

REF_CONTENT = "/root/reference/DataIngestionPlayground/Content"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "tiny_encoder",
)

HIDDEN, HEADS, LAYERS, FFN, OUT_DIMS, MAX_SEQ = 96, 4, 2, 384, 384, 128
VOCAB_WORDS = 3000
SEED = 20260813
# untrained weights need a token:position variance ratio that favors
# token identity, or random position vectors (which a TRAINED model
# turns into structure) drown the lexical signal that makes retrieval
# work; attention/FFN weights keep the standard BERT 0.02 scale
TOK_STD, POS_STD, W_STD = 0.1, 0.01, 0.02


def corpus_words() -> Counter:
    texts: list[str] = []
    md_dir = os.path.join(REF_CONTENT, "Markdown")
    if os.path.isdir(md_dir):
        for f in sorted(os.listdir(md_dir)):
            if f.endswith(".md"):
                texts.append(open(os.path.join(md_dir, f), encoding="utf-8", errors="replace").read())
    db = os.path.join(REF_CONTENT, "Database", "CMS.DB")
    if os.path.exists(db):
        with sqlite3.connect(db) as con:
            for title, body in con.execute("SELECT Title, Body FROM Items"):
                texts.append(f"{title}\n{body}")
    words = Counter()
    for t in texts:
        words.update(re.findall(r"[a-z0-9]+", t.lower()))
    return words


def build_vocab() -> list[str]:
    vocab = [PAD, UNK, CLS, SEP]
    chars = list(string.ascii_lowercase + string.digits) + list(".,;:!?()[]'\"-#*")
    vocab += chars + ["##" + c for c in string.ascii_lowercase + string.digits]
    seen = set(vocab)
    for w, _ in sorted(corpus_words().items(), key=lambda kv: (-kv[1], kv[0])):
        if w not in seen:
            vocab.append(w)
            seen.add(w)
        if len(vocab) >= VOCAB_WORDS:
            break
    return vocab


def main() -> None:
    vocab = build_vocab()
    rng = np.random.Generator(np.random.PCG64(SEED))

    def init(*shape, std=W_STD):
        return (rng.standard_normal(shape) * std).astype(np.float16)

    arrays: dict[str, np.ndarray] = {
        "tok_emb": init(len(vocab), HIDDEN, std=TOK_STD),
        "pos_emb": init(MAX_SEQ, HIDDEN, std=POS_STD),
        "emb_ln_g": np.ones(HIDDEN, dtype=np.float16),
        "emb_ln_b": np.zeros(HIDDEN, dtype=np.float16),
        "proj_W": init(HIDDEN, OUT_DIMS),
        "proj_b": np.zeros(OUT_DIMS, dtype=np.float16),
        "meta": np.array([LAYERS, HEADS, MAX_SEQ], dtype=np.int64),
    }
    # [PAD] embeds to zero (masked anyway; keeps padding inert)
    arrays["tok_emb"][0] = 0
    for i in range(LAYERS):
        p = f"l{i}_"
        for nm in ("Wq", "Wk", "Wv", "Wo"):
            arrays[p + nm] = init(HIDDEN, HIDDEN)
        for nm in ("bq", "bk", "bv", "bo", "b2"):
            arrays[p + nm] = np.zeros(HIDDEN, dtype=np.float16)
        arrays[p + "W1"] = init(HIDDEN, FFN)
        arrays[p + "b1"] = np.zeros(FFN, dtype=np.float16)
        arrays[p + "W2"] = init(FFN, HIDDEN)
        for nm in ("ln1_g", "ln2_g"):
            arrays[p + nm] = np.ones(HIDDEN, dtype=np.float16)
        for nm in ("ln1_b", "ln2_b"):
            arrays[p + nm] = np.zeros(HIDDEN, dtype=np.float16)

    os.makedirs(OUT_DIR, exist_ok=True)
    out = os.path.join(OUT_DIR, "encoder.npz")
    np.savez_compressed(out, vocab=np.array(vocab), **arrays)

    # golden activations: regression-pin the forward pass
    enc = NumpyEncoder(out)
    gtexts = [
        "Ancient Egypt was a civilization along the Nile River.",
        "a black hole is a region in space",
    ]
    vecs = enc.encode(gtexts)
    golden = {
        "texts": gtexts,
        "dims": int(vecs.shape[1]),
        "first8": [[float(x) for x in v[:8]] for v in vecs],
        "vocab_size": len(vocab),
    }
    with open(os.path.join(OUT_DIR, "golden.json"), "w") as f:
        json.dump(golden, f, indent=2)
    print(f"wrote {out} ({os.path.getsize(out)} bytes), vocab={len(vocab)}")


if __name__ == "__main__":
    main()
