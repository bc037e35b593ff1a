"""Stage S6 — duplicate clustering (connected components over verified edges).

Reference semantics: greedy transitive closure over LSH query results
(`/root/reference/src/quarrycore/deduplicator/minhash_lsh.py:224-241`).
We compute proper connected components; the deterministic cluster
representative is the minimum `conv_id` of the component (SURVEY.md
§2.10: the reference's "first-arrival wins" is nondeterministic under
concurrency, so determinism is part of our spec).

Two implementations:

- `driver_union_find`: edges are the *verified duplicate pairs* — a set
  whose size is O(duplicates), orders of magnitude smaller than the
  corpus. Collecting them to the driver and running path-compressed
  union-find is the right call up to billions of edges of budget; this
  is NOT a full-dataset materialization.
- `label_propagation`: the scale path for adversarially huge edge sets:
  iterative min-label propagation expressed as Ray Data groupbys
  (bounded rounds, each a shuffle keyed on node id). Converges in
  O(diameter) rounds; duplicate-cluster diameters are tiny. (See
  PAPERS.md: BTS load-balanced union-find, ICDE 2024, for the general
  distributed formulation.)
"""

from __future__ import annotations

import pandas as pd

import ray.data

from ..oracle import UnionFind


def driver_union_find(edges: "ray.data.Dataset | list[tuple[str, str]]") -> dict[str, str]:
    """edges (a_id, b_id) -> {conv_id: cluster_rep(min id)} for non-singletons."""
    uf = UnionFind()
    if isinstance(edges, list):
        for a, b in edges:
            uf.union(a, b)
    else:
        # stream edge blocks to the driver; only ids cross the wire
        for batch in edges.select_columns(["a_id", "b_id"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        ):
            for a, b in zip(batch["a_id"].to_pylist(), batch["b_id"].to_pylist()):
                uf.union(a, b)
    return uf.components()


def label_propagation(
    edges: "ray.data.Dataset", max_rounds: int = 20
) -> "ray.data.Dataset":
    """Distributed min-label propagation -> (node, label) dataset.

    Each round: every node broadcasts its current label along incident
    edges; each node takes the min of its own and received labels. Stops
    early when a round changes nothing. Each round is one groupby
    shuffle keyed on node id.
    """

    def to_directed(batch: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame({"node": batch["a_id"], "peer": batch["b_id"]})
        bwd = pd.DataFrame({"node": batch["b_id"], "peer": batch["a_id"]})
        return pd.concat([fwd, bwd], ignore_index=True)

    adj = edges.select_columns(["a_id", "b_id"]).map_batches(
        to_directed, batch_format="pandas"
    )
    adj = adj.materialize()  # reused every round; edge set is small

    def init_labels(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": batch["node"], "label": batch["node"]})

    labels = (
        adj.map_batches(init_labels, batch_format="pandas")
        .groupby("node")
        .map_groups(lambda g: g.head(1), batch_format="pandas")
        .materialize()
    )

    for _ in range(max_rounds):
        # send labels across edges: join labels onto adjacency by node,
        # emit (peer, label) messages, then min-reduce with own label.
        label_map = {r["node"]: r["label"] for r in labels.take_all()}

        def send(batch: pd.DataFrame, lm=label_map) -> pd.DataFrame:
            return pd.DataFrame(
                {"node": batch["peer"], "label": batch["node"].map(lm)}
            )

        msgs = adj.map_batches(send, batch_format="pandas")
        merged = msgs.union(labels)
        new_labels = (
            merged.groupby("node")
            .map_groups(
                lambda g: pd.DataFrame(
                    {"node": [g["node"].iloc[0]], "label": [g["label"].min()]}
                ),
                batch_format="pandas",
            )
            .materialize()
        )
        new_map = {r["node"]: r["label"] for r in new_labels.take_all()}
        if new_map == label_map:
            labels = new_labels
            break
        labels = new_labels
    return labels
