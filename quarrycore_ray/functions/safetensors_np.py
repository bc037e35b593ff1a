"""safetensors writer/reader (pure numpy) + a tiny real text encoder.

The reference embeds with sentence-transformers all-MiniLM-L6-v2
(`deduplicator/semantic_dedup.py:256-306`). No torch/transformers exist
here, so — completing the real-artifact hook trio started by
`tokenizer_json.py` and `fasttext_bin.py` — this module supplies:

- `save_safetensors` / `load_safetensors`: the REAL safetensors
  interchange format from its public spec (huggingface/safetensors):
  8-byte little-endian header length, JSON header mapping tensor name
  -> {dtype, shape, data_offsets} over a contiguous byte buffer.
  A file written here loads unchanged in the actual `safetensors`
  library (and vice versa for the supported dtypes).
- `NumpyMeanPoolEncoder`: a genuinely-executed embedding model over
  those weights — vocab lookup, mean-pooled token embeddings, linear
  projection, L2 normalization — exposing the sentence-transformers
  call surface (`encode(texts, normalize_embeddings=True)`), so
  `EmbedderStage` runs its real-model code path on real bytes.
- `build_corpus_encoder`: deterministic construction of a small
  encoder from corpus texts (top-K vocab, seeded weights).

Only the dtypes this engine needs (F32/F64/I64) are mapped; anything
else raises rather than mis-parsing.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

_DTYPES = {"F32": np.float32, "F64": np.float64, "I64": np.int64}
_DTYPE_NAMES = {np.dtype(v): k for k, v in _DTYPES.items()}


def save_safetensors(
    path: str, tensors: dict[str, np.ndarray],
    metadata: dict[str, str] | None = None,
) -> None:
    header: dict = {}
    if metadata:
        header["__metadata__"] = metadata
    bufs: list[bytes] = []
    off = 0
    for name, arr in tensors.items():
        dt = _DTYPE_NAMES.get(arr.dtype)
        if dt is None:
            raise ValueError(f"unsupported dtype {arr.dtype} for {name!r}")
        raw = np.ascontiguousarray(arr).tobytes()
        header[name] = {
            "dtype": dt,
            "shape": list(arr.shape),
            "data_offsets": [off, off + len(raw)],
        }
        bufs.append(raw)
        off += len(raw)
    hjson = json.dumps(header, separators=(",", ":")).encode("utf-8")
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in bufs:
            f.write(b)


def load_safetensors(path: str) -> dict[str, np.ndarray]:
    with open(path, "rb") as f:
        data = f.read()
    (hlen,) = struct.unpack_from("<Q", data, 0)
    header = json.loads(data[8 : 8 + hlen].decode("utf-8"))
    base = 8 + hlen
    out: dict[str, np.ndarray] = {}
    for name, spec in header.items():
        if name == "__metadata__":
            continue
        dt = _DTYPES.get(spec["dtype"])
        if dt is None:
            raise ValueError(f"unsupported dtype {spec['dtype']} for {name!r}")
        a, b = spec["data_offsets"]
        arr = np.frombuffer(data, dtype=dt, count=(b - a) // np.dtype(dt).itemsize,
                            offset=base + a)
        out[name] = arr.reshape(spec["shape"]).copy()
    return out


class NumpyMeanPoolEncoder:
    """Mean-pooled embedding + linear projection over safetensors
    weights; the sentence-transformers `encode` surface."""

    def __init__(self, vocab: dict[str, int], emb: np.ndarray,
                 w: np.ndarray, b: np.ndarray):
        self.vocab = vocab
        self.emb = emb.astype(np.float32)
        self.w = w.astype(np.float32)
        self.b = b.astype(np.float32)

    @classmethod
    def load(cls, model_dir: str) -> "NumpyMeanPoolEncoder":
        """model_dir holds model.safetensors + vocab.json. Prefers the
        actual `safetensors` library when importable; the from-spec
        reader parses the same file otherwise."""
        st_path = os.path.join(model_dir, "model.safetensors")
        tensors: dict[str, np.ndarray] | None = None
        try:
            from safetensors.numpy import load_file  # type: ignore

            tensors = dict(load_file(st_path))
        except ImportError:
            tensors = load_safetensors(st_path)
        with open(os.path.join(model_dir, "vocab.json"), encoding="utf-8") as f:
            vocab = json.load(f)
        return cls(
            vocab, tensors["embedding.weight"],
            tensors["projection.weight"], tensors["projection.bias"],
        )

    def encode(self, texts, normalize_embeddings: bool = True) -> np.ndarray:
        out = np.zeros((len(texts), self.w.shape[1]), dtype=np.float32)
        for i, t in enumerate(texts):
            ids = [
                self.vocab[tok]
                for tok in (t or "").lower().split()
                if tok in self.vocab
            ]
            if not ids:
                continue
            pooled = self.emb[ids].mean(axis=0)
            out[i] = pooled @ self.w + self.b
        if normalize_embeddings:
            norms = np.linalg.norm(out, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            out = out / norms
        return out


def build_corpus_encoder(
    texts: list[str], model_dir: str, dim_in: int = 32, dim_out: int = 16,
    max_vocab: int = 4096, seed: int = 17,
) -> NumpyMeanPoolEncoder:
    """Deterministically build + persist a tiny encoder from corpus
    texts: top-`max_vocab` tokens by frequency (ties lexicographic),
    seeded Gaussian weights, written as real safetensors + vocab.json."""
    from collections import Counter

    counts: Counter = Counter()
    for t in texts:
        counts.update((t or "").lower().split())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:max_vocab]
    vocab = {tok: i for i, (tok, _) in enumerate(top)}
    rng = np.random.default_rng(seed)
    emb = rng.standard_normal((len(vocab), dim_in)).astype(np.float32)
    w = rng.standard_normal((dim_in, dim_out)).astype(np.float32)
    b = rng.standard_normal(dim_out).astype(np.float32)
    os.makedirs(model_dir, exist_ok=True)
    save_safetensors(
        os.path.join(model_dir, "model.safetensors"),
        {"embedding.weight": emb, "projection.weight": w, "projection.bias": b},
        metadata={"format": "np-meanpool-v1"},
    )
    with open(os.path.join(model_dir, "vocab.json"), "w", encoding="utf-8") as f:
        json.dump(vocab, f)
    return NumpyMeanPoolEncoder(vocab, emb, w, b)
