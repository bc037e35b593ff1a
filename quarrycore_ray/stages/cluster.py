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
    edges: "ray.data.Dataset", max_rounds: int = 20, num_partitions: int | None = None
) -> "ray.data.Dataset":
    """Distributed min-label propagation -> (node, label) dataset.

    Pure dataflow — no driver-side label maps: each round UNIONs the
    adjacency list with the current labels, groups by node (coarse hash
    partitions, stages/grouped.py), resolves each node's label, sends it
    to every neighbor, and min-reduces; per-node `changed` flags are
    summed for the convergence test. Labels move monotonically down the
    min-semilattice, so `sum(changed) == 0` is exact convergence.
    Rounds needed = component diameter (tiny for dup clusters).
    """
    from .grouped import default_num_partitions, partitioned_group_map

    # block-count discipline: Ray's sort-based groupby emits one output
    # block per input block and the round's 3-way union stacks all of
    # them, so without coalescing the label table's block count grows
    # geometrically (measured 18 -> 54 -> 126 -> 270 in 3 rounds) and
    # per-round scheduling cost turns quadratic. Repartitioning each
    # round's (tiny) label table back to a fixed count keeps every BSP
    # round constant-cost.
    nparts = num_partitions or default_num_partitions()

    def to_directed(batch: pa.Table) -> pa.Table:
        # zero-Python symmetrization: stack the two id columns with
        # Arrow concat (chunked arrays combine zero-copy per chunk)
        import pyarrow as _pa

        a = batch["a_id"]
        b = batch["b_id"]
        return _pa.table(
            {
                "node": _pa.chunked_array(a.chunks + b.chunks, _pa.string()),
                "peer": _pa.chunked_array(b.chunks + a.chunks, _pa.string()),
            }
        )

    adj = (
        edges.select_columns(["a_id", "b_id"])
        .map_batches(to_directed, batch_format="pyarrow")
        .repartition(nparts)
        .materialize()  # reused every round
    )

    import pyarrow as _pa

    _LBL_SCHEMA = _pa.schema([("node", _pa.string()), ("label", _pa.string())])

    def init_labels(tb: _pa.Table) -> _pa.Table:
        import polars as pl

        nodes = pl.from_arrow(tb).select("node").unique()
        return (
            nodes.with_columns(pl.col("node").alias("label"))
            .to_arrow()
            .cast(_LBL_SCHEMA)
        )

    labels = (
        partitioned_group_map(adj, "node", init_labels, num_partitions, arrow=True)
        .repartition(nparts)
        .materialize()
    )

    for _ in range(max_rounds):
        def with_peer_null(batch: _pa.Table) -> _pa.Table:
            return _pa.table(
                {
                    "node": batch["node"],
                    "peer": _pa.nulls(batch.num_rows, _pa.string()),
                    "label": batch["label"],
                }
            )

        def with_label_null(batch: _pa.Table) -> _pa.Table:
            return _pa.table(
                {
                    "node": batch["node"],
                    "peer": batch["peer"],
                    "label": _pa.nulls(batch.num_rows, _pa.string()),
                }
            )

        def label_shortcut_edges(batch: _pa.Table) -> _pa.Table:
            # treat (node <-> label) as extra edges: labels then hop along
            # star centers, giving O(log diameter) convergence (hash-to-min
            # style, Rastogi et al. 2013) instead of one hop per round.
            # Zero-Python: Arrow chunk stacking, a typed null column.
            n = batch["node"]
            l = batch["label"]
            return _pa.table(
                {
                    "node": _pa.chunked_array(n.chunks + l.chunks, _pa.string()),
                    "peer": _pa.chunked_array(l.chunks + n.chunks, _pa.string()),
                    "label": _pa.nulls(2 * batch.num_rows, _pa.string()),
                }
            )

        tagged = (
            adj.map_batches(with_label_null, batch_format="pyarrow")
            .union(labels.map_batches(label_shortcut_edges, batch_format="pyarrow"))
            .union(labels.map_batches(with_peer_null, batch_format="pyarrow"))
        )

        _SEND_SCHEMA = _pa.schema(
            [
                ("node", _pa.string()),
                ("label", _pa.string()),
                ("self", _pa.bool_()),
            ]
        )

        def send(tb: _pa.Table) -> _pa.Table:
            # per node: resolve its current label, forward to all peers,
            # and re-emit the node's own (old) label for the reduce
            # step — one polars grouped-min + one join, no per-row
            # Python anywhere in the round
            import polars as pl

            df = pl.from_arrow(tb)
            lbl = (
                df.filter(pl.col("peer").is_null())
                .group_by("node")
                .agg(pl.col("label").min())
            )
            fwd = (
                df.filter(pl.col("peer").is_not_null())
                .select(["node", "peer"])
                .join(lbl, on="node", how="left")
                .select(
                    pl.col("peer").alias("node"),
                    pl.col("label"),
                    pl.lit(False).alias("self"),
                )
            )
            own = lbl.select(
                pl.col("node"), pl.col("label"), pl.lit(True).alias("self")
            )
            return pl.concat([fwd, own]).to_arrow().cast(_SEND_SCHEMA)

        msgs = partitioned_group_map(
            tagged, "node", send, num_partitions, arrow=True
        )

        _RED_SCHEMA = _pa.schema(
            [
                ("node", _pa.string()),
                ("label", _pa.string()),
                ("changed", _pa.int64()),
            ]
        )

        def reduce_min(tb: _pa.Table) -> _pa.Table:
            import polars as pl

            df = pl.from_arrow(tb)
            new = df.group_by("node").agg(pl.col("label").min())
            old = df.filter(pl.col("self")).select(
                pl.col("node"), pl.col("label").alias("_old")
            )
            out = new.join(old, on="node", how="left").select(
                pl.col("node"),
                pl.col("label"),
                # a node with no prior label row counts as changed
                # (matches the pandas NaN != value semantics)
                (
                    pl.col("label").ne_missing(pl.col("_old"))
                ).cast(pl.Int64).alias("changed"),
            )
            return out.to_arrow().cast(_RED_SCHEMA)

        reduced = partitioned_group_map(
            msgs, "node", reduce_min, num_partitions, arrow=True
        ).materialize()
        n_changed = reduced.sum("changed")
        labels = (
            reduced.select_columns(["node", "label"])
            .repartition(nparts)
            .materialize()
        )
        if not n_changed:
            break
    return labels
