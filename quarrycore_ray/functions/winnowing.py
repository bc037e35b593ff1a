"""Winnowing fingerprints for distributed exact-substring detection.

Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
Fingerprinting" (SIGMOD 2003): hash every w-byte gram of a document,
then in every window of `window` consecutive gram hashes select the
minimum (rightmost on ties). The guarantee: any shared substring of
length >= t = w + window - 1 between two documents yields at least one
selected fingerprint with the same hash in both.

Containment corollary used by `substring_containment`
(pipelines/documents.py): if needle N (with >= `window` gram positions)
is a substring of haystack H, the window of H that lies entirely inside
N and covers N's global-minimum gram hash selects exactly that hash —
so `min(gram_hashes(N))` is always a member of H's winnowed set. One
key per needle + the winnowed set per haystack gives an inverted-index
join whose buckets hold only documents genuinely sharing a w-gram (the
reference's analog is the difflib partial matcher,
`/root/reference/src/quarrycore/deduplicator/fuzzy_matcher.py:213-236`,
an all-pairs scan).

Hashes are 31-bit polynomial rolling hashes (Mersenne 2^31-1 modulus so
the uint64 intermediate never overflows); collisions only add false
candidates, which the exact `in` verification removes.
"""

from __future__ import annotations

import numpy as np

BASE = np.uint64(1_000_003)
MOD = np.uint64((1 << 31) - 1)

W_GRAM = 16  # gram width, bytes
WINDOW = 8  # winnowing window (t = W_GRAM + WINDOW - 1 = 23)


def gram_hashes(text: str, w: int = W_GRAM) -> np.ndarray:
    """Polynomial rolling hashes of all w-byte grams of utf-8 `text`."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    m = len(b) - w + 1
    if m <= 0:
        return np.zeros(0, dtype=np.uint64)
    h = np.zeros(m, dtype=np.uint64)
    for j in range(w):
        h = (h * BASE + b[j : j + m]) % MOD
    return h


def winnow(hashes: np.ndarray, window: int = WINDOW) -> np.ndarray:
    """Selected (winnowed) hash values: per window the rightmost minimum."""
    m = len(hashes)
    if m == 0:
        return hashes
    if m <= window:
        return np.unique(hashes.min(keepdims=True))
    sw = np.lib.stride_tricks.sliding_window_view(hashes, window)
    rev = sw[:, ::-1]
    j = window - 1 - rev.argmin(axis=1)
    idx = np.unique(np.arange(m - window + 1) + j)
    return np.unique(hashes[idx])


def needle_key(hashes: np.ndarray) -> int:
    """The needle-side index key: the document's global-minimum gram hash."""
    return int(hashes.min())
