"""Convert a locally-available all-MiniLM-L6-v2 checkpoint (HuggingFace
sentence-transformers layout) into the ``np_encoder`` ``.npz`` format,
so the moment real weights are present, D8 parity with the reference's
actual model (``Program.cs:64-73``) is one command:

    python scripts/export_minilm_npz.py /path/to/all-MiniLM-L6-v2 out.npz

Reads ``model.safetensors`` (parsed with a pure-python reader — the
format is an 8-byte little-endian header length, a JSON tensor index,
then raw row-major bytes — so no safetensors/torch dependency) plus
``vocab.txt`` and ``config.json``. Mapping to the np_encoder layout
(see ``ingest/np_encoder.py`` module docstring):

- HF stores Linear weights as (out, in); np_encoder computes ``x @ W``,
  so every weight matrix is transposed on export.
- ``token_type_embeddings`` row 0 (the only type sentence-transformers
  ever feeds) is folded into every ``pos_emb`` row — identical sums,
  one table fewer.
- all-MiniLM-L6-v2 has no Dense head (Transformer -> mean Pooling ->
  Normalize), so ``proj_W`` is the identity and ``proj_b`` zeros; the
  encoder's trailing L2-normalize matches the Normalize module.
"""

from __future__ import annotations

import json
import os
import struct
import sys

import numpy as np

_ST_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "I64": np.int64,
    "I32": np.int32,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


def load_safetensors(path: str) -> dict[str, np.ndarray]:
    """Minimal safetensors reader: header-length u64, JSON index with
    {name: {dtype, shape, data_offsets}}, then the raw tensor bytes."""
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        index = json.loads(f.read(hlen))
        blob = f.read()
    out = {}
    for name, meta in index.items():
        if name == "__metadata__":
            continue
        a, b = meta["data_offsets"]
        arr = np.frombuffer(blob[a:b], dtype=_ST_DTYPES[meta["dtype"]])
        out[name] = arr.reshape(meta["shape"])
    return out


def export(src_dir: str, out_path: str) -> dict:
    cfg = json.load(open(os.path.join(src_dir, "config.json")))
    n_layers = cfg["num_hidden_layers"]
    n_heads = cfg["num_attention_heads"]
    max_seq = cfg["max_position_embeddings"]
    hidden = cfg["hidden_size"]

    st_path = os.path.join(src_dir, "model.safetensors")
    if not os.path.exists(st_path):
        raise FileNotFoundError(
            f"{st_path} not found (only the safetensors layout is supported; "
            "convert .bin checkpoints with huggingface-hub first)"
        )
    w = load_safetensors(st_path)
    # some exports prefix everything with "bert." — normalize
    if not any(k.startswith("embeddings.") for k in w):
        w = {k.split(".", 1)[1]: v for k, v in w.items() if "." in k}

    vocab = [
        line.rstrip("\n")
        for line in open(os.path.join(src_dir, "vocab.txt"), encoding="utf-8")
    ]

    def t(name: str) -> np.ndarray:  # HF (out,in) -> x@W orientation
        return np.ascontiguousarray(w[name].T.astype(np.float32))

    arrs: dict[str, np.ndarray] = {
        "vocab": np.array(vocab),
        "tok_emb": w["embeddings.word_embeddings.weight"].astype(np.float32),
        # fold token_type row 0 (always fed by sentence-transformers)
        # into every position embedding: same per-position sum
        "pos_emb": (
            w["embeddings.position_embeddings.weight"]
            + w["embeddings.token_type_embeddings.weight"][0][None, :]
        ).astype(np.float32),
        "emb_ln_g": w["embeddings.LayerNorm.weight"].astype(np.float32),
        "emb_ln_b": w["embeddings.LayerNorm.bias"].astype(np.float32),
        "proj_W": np.eye(hidden, dtype=np.float32),
        "proj_b": np.zeros(hidden, dtype=np.float32),
        "meta": np.array([n_layers, n_heads, max_seq], dtype=np.int64),
    }
    for i in range(n_layers):
        hf = f"encoder.layer.{i}."
        p = f"l{i}_"
        arrs[p + "Wq"] = t(hf + "attention.self.query.weight")
        arrs[p + "bq"] = w[hf + "attention.self.query.bias"].astype(np.float32)
        arrs[p + "Wk"] = t(hf + "attention.self.key.weight")
        arrs[p + "bk"] = w[hf + "attention.self.key.bias"].astype(np.float32)
        arrs[p + "Wv"] = t(hf + "attention.self.value.weight")
        arrs[p + "bv"] = w[hf + "attention.self.value.bias"].astype(np.float32)
        arrs[p + "Wo"] = t(hf + "attention.output.dense.weight")
        arrs[p + "bo"] = w[hf + "attention.output.dense.bias"].astype(np.float32)
        arrs[p + "ln1_g"] = w[hf + "attention.output.LayerNorm.weight"].astype(np.float32)
        arrs[p + "ln1_b"] = w[hf + "attention.output.LayerNorm.bias"].astype(np.float32)
        arrs[p + "W1"] = t(hf + "intermediate.dense.weight")
        arrs[p + "b1"] = w[hf + "intermediate.dense.bias"].astype(np.float32)
        arrs[p + "W2"] = t(hf + "output.dense.weight")
        arrs[p + "b2"] = w[hf + "output.dense.bias"].astype(np.float32)
        arrs[p + "ln2_g"] = w[hf + "output.LayerNorm.weight"].astype(np.float32)
        arrs[p + "ln2_b"] = w[hf + "output.LayerNorm.bias"].astype(np.float32)

    np.savez_compressed(out_path, **arrs)
    return {
        "layers": n_layers,
        "heads": n_heads,
        "max_seq": max_seq,
        "hidden": hidden,
        "vocab": len(vocab),
    }


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    info = export(sys.argv[1], sys.argv[2])
    print(json.dumps(info))
