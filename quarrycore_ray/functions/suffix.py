"""Suffix arrays (prefix doubling) + LCP (Kasai) + longest-repeat.

The north rule names a *suffix-array substring-dedup stage* for
intra-cluster exact-substring removal; the reference's substring tier
is `deduplicator/fuzzy_matcher` partial-overlap scanning. This module
supplies the classic machinery from the published algorithms:

- `suffix_array`: Manber–Myers prefix doubling with vectorized numpy
  rank updates — O(n log^2 n) overall (each of the O(log n) doubling
  rounds pays one comparison-based np.lexsort; the O(n log n) variant
  needs a radix sort per round, not worth it at KB-document scale).
- `lcp_array`: Kasai et al. 2001 linear-time LCP from the SA.
- `longest_repeat`: length + minimal starting position of the longest
  repeated subsequence — max over adjacent-pair LCPs (the textbook
  reduction: the max LCP over ALL suffix pairs is attained by an
  SA-adjacent pair).

Tokens are arbitrary ints, so the same code serves character-level and
word-level inputs; the engine query (`documents.longest_repeat_docs`)
runs word-level, which a DuckDB recursive-CTE oracle can replay
exactly.
"""

from __future__ import annotations

import numpy as np


def suffix_array(tokens: np.ndarray) -> np.ndarray:
    """SA of an int token sequence via prefix doubling."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n == 1:
        return np.zeros(1, dtype=np.int64)
    # initial ranks: dense-encode token values
    rank = np.unique(tokens, return_inverse=True)[1].astype(np.int64)
    sa = np.empty(0, dtype=np.int64)
    k = 1
    while k < n:
        # sort key: (rank[i], rank[i+k] or -1)
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        sa = np.lexsort((second, rank)).astype(np.int64)
        # new ranks: increment where the (pair) key changes
        r1 = rank[sa]
        r2 = second[sa]
        changed = np.ones(n, dtype=np.int64)
        changed[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_rank = np.cumsum(changed) - 1
        rank = np.empty(n, dtype=np.int64)
        rank[sa] = new_rank
        if new_rank[-1] == n - 1:  # all ranks distinct: done
            break
        k *= 2
    return sa


def lcp_array(tokens: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai: lcp[i] = LCP(suffix sa[i-1], suffix sa[i]); lcp[0] = 0."""
    n = len(tokens)
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r == 0:
            h = 0
            continue
        j = sa[r - 1]
        m = n - max(i, j)
        while h < m and tokens[i + h] == tokens[j + h]:
            h += 1
        lcp[r] = h
        if h:
            h -= 1
    return lcp


def longest_repeat(tokens: np.ndarray) -> tuple[int, int]:
    """(length, minimal starting position) of the longest subsequence
    occurring at least twice; (0, -1) when every token is unique."""
    n = len(tokens)
    if n < 2:
        return 0, -1
    sa = suffix_array(np.asarray(tokens, dtype=np.int64))
    lcp = lcp_array(np.asarray(tokens, dtype=np.int64), sa)
    best = int(lcp.max())
    if best == 0:
        return 0, -1
    # every suffix inside a maximal-LCP run starts a longest repeat;
    # min over both endpoints of each achieving adjacent pair
    hits = np.nonzero(lcp == best)[0]
    pos = min(int(min(sa[i], sa[i - 1])) for i in hits)
    return best, pos
