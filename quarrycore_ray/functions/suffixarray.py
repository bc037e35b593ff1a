"""Suffix array + LCP utilities for exact-substring dedup.

The north rule names a suffix-array substring-dedup stage for
intra-cluster exact-substring removal (the reference's analog is the
difflib partial matcher, `deduplicator/fuzzy_matcher.py:213-236`).
This module provides the real thing:

- `suffix_array`: prefix-doubling construction in O(n log^2 n) using
  numpy lexsorts (Manber & Myers 1990 style),
- `lcp_array`: Kasai et al. 2001 linear-time LCP,
- `longest_common_substring`: max LCP between suffixes of different
  documents over the concatenation with sentinel separators — the
  multi-document generalization used per duplicate cluster.
"""

from __future__ import annotations

import numpy as np


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of an int array (values >= 0). Prefix doubling."""
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.asarray(s, dtype=np.int64)
    sa = np.argsort(rank, kind="stable")
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while True:
        # sort by (rank[i], rank[i+k]) using lexsort
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        sa = np.lexsort((second, rank))
        # recompute ranks
        tmp[sa[0]] = 0
        firsts = rank[sa]
        seconds = second[sa]
        neq = (firsts[1:] != firsts[:-1]) | (seconds[1:] != seconds[:-1])
        tmp[sa[1:]] = np.cumsum(neq)
        rank = tmp.copy()
        if rank[sa[-1]] == n - 1:
            break
        k <<= 1
    return sa


def lcp_array(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = LCP(suffix sa[i], suffix sa[i-1]); lcp[0]=0."""
    n = len(s)
    lcp = np.zeros(n, dtype=np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        if rank[i] > 0:
            j = sa[rank[i] - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[rank[i]] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def _encode_docs(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate docs with unique sentinels; return (codes, doc_of_pos).

    Characters shift up by the sentinel count so sentinels are unique
    minimal codes (never part of a common substring).
    """
    n_docs = len(texts)
    parts: list[np.ndarray] = []
    owner: list[np.ndarray] = []
    for i, t in enumerate(texts):
        codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        parts.append(codes + n_docs)
        parts.append(np.array([i], dtype=np.int64))  # sentinel i < n_docs
        owner.append(np.full(len(codes) + 1, i, dtype=np.int64))
    return np.concatenate(parts), np.concatenate(owner)


def longest_common_substring(a: str, b: str) -> int:
    """Length of the longest exact common substring (suffix-array based)."""
    return max_cross_doc_lcp([a, b])[0]


def max_cross_doc_lcp(texts: list[str]) -> tuple[int, int, int]:
    """(length, doc_i, doc_j): longest substring shared by two DIFFERENT
    documents of `texts`. Adjacent suffix-array entries with different
    owners bound the answer (standard SA/LCP argument)."""
    if len(texts) < 2 or all(not t for t in texts):
        return 0, -1, -1
    s, owner = _encode_docs(texts)
    sa = suffix_array(s)
    lcp = lcp_array(s, sa)
    own_sorted = owner[sa]
    cross = own_sorted[1:] != own_sorted[:-1]
    if not cross.any():
        return 0, -1, -1
    idx = np.flatnonzero(cross) + 1
    best = idx[np.argmax(lcp[idx])]
    return int(lcp[best]), int(own_sorted[best - 1]), int(own_sorted[best])
