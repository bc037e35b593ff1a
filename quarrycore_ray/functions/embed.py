"""Embedding stage (semantic-dedup plumbing).

Reference: `deduplicator/semantic_dedup.py:256-306` embeds with
sentence-transformers all-MiniLM-L6-v2 behind a lazily-loaded model and
OOM-adaptive batches. No model weights exist in this environment, so
the embedder is a DETERMINISTIC STUB with the real pipeline shape: a
callable class (model "loaded" once per actor), batched encode,
normalized float32 vectors. Swapping in a real model changes only
`_encode`.

The stub embedding is a hashed bag-of-words projection: each token
hashes to a coordinate of a `dim`-vector (feature hashing, Weinberger
et al. 2009), then L2-normalize — deterministic, meaningful cosine
structure (shared vocabulary => higher similarity).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data


class EmbedderStage:
    def __init__(
        self,
        dim: int = 64,
        text_col: str = "canonical_text",
        model_name: str = "all-MiniLM-L6-v2",
    ):
        from .models import try_sentence_transformer

        self.dim = dim
        self.text_col = text_col
        self._cache: dict[str, tuple[int, float]] = {}
        # real-model hook: when sentence-transformers is installed the
        # actor loads the actual model once and _encode delegates to it;
        # otherwise the deterministic feature-hash stub runs (see
        # functions/models.py)
        self._model = try_sentence_transformer(model_name)

    def _token_coord(self, tok: str) -> tuple[int, float]:
        hit = self._cache.get(tok)
        if hit is None:
            h = hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest()
            idx = int.from_bytes(h[:4], "little") % self.dim
            sign = 1.0 if h[4] & 1 else -1.0
            hit = (idx, sign)
            if len(self._cache) < 1_000_000:
                self._cache[tok] = hit
        return hit

    def _encode(self, texts: list[str]) -> np.ndarray:
        if self._model is not None:
            emb = np.asarray(
                self._model.encode(texts, normalize_embeddings=True),
                dtype=np.float32,
            )
            return emb
        out = np.zeros((len(texts), self.dim), dtype=np.float64)
        for i, t in enumerate(texts):
            for tok in (t or "").split():
                idx, sign = self._token_coord(tok)
                out[i, idx] += sign
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return (out / norms).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = self._encode(batch[self.text_col].to_pylist())
        return batch.append_column(
            "embedding", pa.array(emb.tolist(), pa.list_(pa.float32()))
        )


def embed(ds: "ray.data.Dataset", dim: int = 64, text_col: str = "canonical_text"):
    """Actor-pool embedding: model state amortized per actor."""
    return ds.map_batches(
        EmbedderStage,
        fn_constructor_kwargs={"dim": dim, "text_col": text_col},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
    )
