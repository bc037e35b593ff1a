"""Fuzzy string matching (legacy L4 analog).

Reference: `deduplicator/fuzzy_matcher.py` scores candidate pairs with
rapidfuzz `ratio` / `token_sort_ratio` / `token_set_ratio` or normalized
Levenshtein (fuzzy_matcher.py:107-125) and classifies matches by ratio
plus length ratio (fuzzy_matcher.py:200-211: `near_exact` >= 0.95,
`very_similar` >= 0.85, `contains`/`contained_in` when the length ratio
exceeds 1.5x, else `similar`). rapidfuzz isn't available here, so the
same scores are computed from first principles:

- `ratio`: SequenceMatcher-style similarity = 2*M/(len_a+len_b) with M
  from difflib matching blocks (the public algorithm rapidfuzz mirrors),
- `levenshtein_ratio`: 1 - dist/max_len with a banded O(n*d) DP,
- `token_sort_ratio`: ratio over whitespace-token-sorted strings,
- `token_set_ratio`: max ratio over the intersect/rest decomposition.

Used per candidate cluster (`map_groups` over clusters) — bounded pair
counts, as in the substring stage.
"""

from __future__ import annotations

from difflib import SequenceMatcher

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def ratio(a: str, b: str) -> float:
    if not a and not b:
        return 1.0
    m = SequenceMatcher(None, a, b, autojunk=False)
    return round(2.0 * sum(bl.size for bl in m.get_matching_blocks()) / (len(a) + len(b)), 6)


def levenshtein(a: str, b: str) -> int:
    """Vectorized row-DP: the sequential cur[j-1]+1 chain is a running
    prefix-min, computed as accumulate(cand - j) + j (standard trick)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    n = len(b)
    idx = np.arange(n + 1, dtype=np.int32)
    prev = idx.copy()
    for i, ca in enumerate(np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32), 1):
        cand = np.empty(n + 1, dtype=np.int32)
        cand[0] = i
        np.minimum(prev[1:] + 1, prev[:-1] + (bb != ca), out=cand[1:])
        adj = cand - idx
        np.minimum.accumulate(adj, out=adj)
        prev = adj + idx
    return int(prev[-1])


def levenshtein_ratio(a: str, b: str) -> float:
    m = max(len(a), len(b))
    return round(1.0 - levenshtein(a, b) / m, 6) if m else 1.0


def token_sort_ratio(a: str, b: str) -> float:
    return ratio(" ".join(sorted(a.split())), " ".join(sorted(b.split())))


def token_set_ratio(a: str, b: str) -> float:
    ta, tb = set(a.split()), set(b.split())
    inter = " ".join(sorted(ta & tb))
    sa = (inter + " " + " ".join(sorted(ta - tb))).strip()
    sb = (inter + " " + " ".join(sorted(tb - ta))).strip()
    return max(ratio(inter, sa), ratio(inter, sb), ratio(sa, sb))


ALGORITHMS = {
    "ratio": ratio,
    "levenshtein": levenshtein_ratio,
    "token_sort": token_sort_ratio,
    "token_set": token_set_ratio,
}


def classify_match(similarity: float, len_a: int, len_b: int) -> str:
    """Reference classification (fuzzy_matcher.py:200-211)."""
    if similarity >= 0.95:
        return "near_exact"
    if similarity >= 0.85:
        return "very_similar"
    longer, shorter = max(len_a, len_b), max(min(len_a, len_b), 1)
    if longer / shorter > 1.5:
        return "contains" if len_a > len_b else "contained_in"
    return "similar"


def make_fuzzy_scorer(algorithm: str = "ratio", threshold: float = 0.8, max_members: int = 32):
    """Per-cluster pairwise fuzzy scoring (map_groups partition fn)."""
    fn = ALGORITHMS[algorithm]

    def _score(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values("conv_id").head(max_members)
        ids = g["conv_id"].tolist()
        texts = g["canonical_text"].tolist()
        cluster = g["cluster_id"].iloc[0]
        rows = []
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                sim = fn(texts[i], texts[j])
                if sim >= threshold:
                    rows.append(
                        (cluster, ids[i], ids[j], sim,
                         classify_match(sim, len(texts[i]), len(texts[j])))
                    )
        return pa.table(
            {
                "cluster_id": pa.array([r[0] for r in rows], pa.string()),
                "a_id": pa.array([r[1] for r in rows], pa.string()),
                "b_id": pa.array([r[2] for r in rows], pa.string()),
                "similarity": pa.array([r[3] for r in rows], pa.float64()),
                "match_type": pa.array([r[4] for r in rows], pa.string()),
            }
        )

    return _score


def fuzzy_cluster_scores(
    clustered: "ray.data.Dataset", algorithm: str = "ratio", threshold: float = 0.8
) -> "ray.data.Dataset":
    """clustered (conv_id, cluster_id, canonical_text) -> fuzzy pair scores.

    Coarse-partitioned on cluster_id (stages/grouped.py): duplicate
    clusters are unbounded in number at corpus scale, so per-cluster
    Ray dispatch is replaced by one task per hash partition."""
    from ..stages.grouped import partitioned_group_map, per_group_in_partition

    return partitioned_group_map(
        clustered,
        "cluster_id",
        per_group_in_partition(make_fuzzy_scorer(algorithm, threshold), "cluster_id"),
    )
