"""Stage S7 — intra-cluster exact-substring detection.

Reference semantics: partial-overlap detection with
`difflib.SequenceMatcher.get_matching_blocks()` and a 100-char minimum
overlap (`/root/reference/src/quarrycore/deduplicator/fuzzy_matcher.py:213-236`),
plus containment classification by length ratio
(`fuzzy_matcher.py:200-211`). The north rule scopes this to *intra-
cluster* exact-substring removal: within each duplicate cluster, find
members whose canonical text is wholly contained in another member
(classified `contained_in`/`contains`) or shares an exact common
substring >= `min_overlap` chars.

Runs as `groupby(cluster_id).map_groups` — clusters are small by
construction (bounded by the LSH bucket cap chains), so the pairwise
scan inside one group is bounded. The common-substring search uses the
stdlib SequenceMatcher on the candidate pair, exactly like the
reference.
"""

from __future__ import annotations

from difflib import SequenceMatcher

import pandas as pd

import ray.data

import pyarrow as pa

_EMPTY = pa.table(
    {
        "cluster_id": pa.array([], pa.string()),
        "a_id": pa.array([], pa.string()),
        "b_id": pa.array([], pa.string()),
        "match_type": pa.array([], pa.string()),
        "overlap_chars": pa.array([], pa.int64()),
    }
)


def make_substring_scanner(
    min_overlap: int = 100, max_members: int = 64, method: str = "suffix_array"
):
    """Per-cluster scanner. `method`:

    - "suffix_array" (default): exact longest-common-substring via one
      suffix array + Kasai LCP over the pair (O((n+m) log^2) build) —
      the north rule's substring-dedup primitive
      (`functions/suffixarray.py`).
    - "difflib": the reference-identical SequenceMatcher matching-block
      scan (fuzzy_matcher.py:213-236).
    Containment short-circuits through C-speed `in` either way.
    """
    from ..functions.suffixarray import longest_common_substring

    def _scan(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values("conv_id", kind="mergesort").head(max_members)
        if len(g) < 2:
            return _EMPTY
        ids = g["conv_id"].tolist()
        texts = g["canonical_text"].tolist()
        cluster = g["cluster_id"].iloc[0]
        rows = []
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                ta, tb = texts[i], texts[j]
                if len(ta) >= len(tb):
                    big, small, big_id, small_id = ta, tb, ids[i], ids[j]
                else:
                    big, small, big_id, small_id = tb, ta, ids[j], ids[i]
                if small and small in big:
                    rows.append((cluster, small_id, big_id, "contained_in", len(small)))
                    continue
                if method == "suffix_array":
                    size = longest_common_substring(small, big)
                else:
                    sm = SequenceMatcher(None, small, big, autojunk=False)
                    size = max(sm.get_matching_blocks(), key=lambda m: m.size).size
                if size >= min_overlap:
                    rows.append((cluster, small_id, big_id, "partial_overlap", size))
        if not rows:
            return _EMPTY
        return pa.table(
            {
                "cluster_id": pa.array([r[0] for r in rows], pa.string()),
                "a_id": pa.array([r[1] for r in rows], pa.string()),
                "b_id": pa.array([r[2] for r in rows], pa.string()),
                "match_type": pa.array([r[3] for r in rows], pa.string()),
                "overlap_chars": pa.array([r[4] for r in rows], pa.int64()),
            }
        )

    return _scan


def substring_matches(
    clustered: "ray.data.Dataset", min_overlap: int = 100
) -> "ray.data.Dataset":
    """clustered conversations (conv_id, cluster_id, canonical_text) ->
    substring-match edges within clusters."""
    multi = clustered.select_columns(["conv_id", "cluster_id", "canonical_text"])
    from .grouped import partitioned_group_map, per_group_in_partition

    return partitioned_group_map(
        multi,
        "cluster_id",
        per_group_in_partition(make_substring_scanner(min_overlap), "cluster_id"),
    )
