"""Link-graph operators over the `documents` table.

Web-curation pipelines rank pages by link structure before sampling
training data (Common Crawl publishes harmonic/PageRank centrality per
host; the reference keeps per-URL metadata but has no graph step, so
this extends SURVEY.md §2 the same way the curation/training modules
do). The graph here is derived *deterministically* from doc_id — the
same construction trick as `documents.extract_structured`'s synthetic
HTML — so the DuckDB oracle can rebuild the identical edge set and the
whole iterative computation is exact-checked end to end.

Edge rule: doc `d` links to `(d*31 + j*17 + 1) % n` for
`j in 0..(d % 3)` (n = corpus size), duplicate targets collapsed —
out-degree 1..3, self-loops possible and kept.

PageRank runs a FIXED number of synchronous power-iteration rounds in
fixed-point integer arithmetic (scale 1e12, damping 85/100, floor
division everywhere), so the result is bit-identical to the oracle's
unrolled CTE chain regardless of block layout, batch size or CPU
count — the same exactness discipline as `relational._micros` /
`similarity.embedding_top_component`.

Scale shape: the edge table is materialized ONCE (it is re-read every
round); each round is one partitioned hash join (ranks attached to
edges on src — broadcast under `attach_lookup`'s byte threshold, tagged
-union partitioned join above it) plus one hash-partitioned sum on dst.
Rank rows are 2 int64s per node — ~16 bytes/doc, far smaller than the
corpus — and nothing ever materializes on the driver.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..stages.grouped import attach_lookup, partitioned_group_map

#: fixed-point scale: 1.0 of PageRank mass == 1e12 units
PR_SCALE = 10**12
#: damping factor as an exact rational (85/100)
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100
PR_ITERS = 5

#: node-count ceiling for the single-task local-rounds path (same
#: auto-switch discipline as the dedup clusterer's driver-union-find ↔
#: BSP switch): below it the whole iteration state is a few MB and the
#: per-round shuffle fabric costs 10-100x the arithmetic, so the rounds
#: run vectorized inside ONE Ray task with bit-identical integer math;
#: above it the distributed BSP path takes over. Tests force the BSP
#: path with local_max=0.
GRAPH_LOCAL_MAX = 200_000

_EDGE_SCHEMA = pa.schema(
    [("src", pa.int64()), ("dst", pa.int64()), ("odeg", pa.int64())]
)
_RANK_SCHEMA = pa.schema([("node", pa.int64()), ("r", pa.int64())])
_RANK_IND_SCHEMA = pa.schema(
    [("node", pa.int64()), ("r", pa.int64()), ("ind", pa.int64())]
)
_SUM_SCHEMA = pa.schema(
    [("node", pa.int64()), ("s", pa.int64()), ("b", pa.int8())]
)


def _docs_ids(sf_dir: str) -> "rd.Dataset":
    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )


def _graph_parts(n: int) -> int:
    """Partition count for per-round score-table shuffles: the
    CPU-proportional default is right when the table is big, but an
    iterative round over a small score table pays the per-partition
    dispatch cost every round — clamp so each partition holds at least
    ~5k rows, floor 8 (n is the node count, known before the loop)."""
    from ..stages.grouped import default_num_partitions

    return max(8, min(default_num_partitions(), n // 5000 + 1))


def link_edges(ds_ids: "rd.Dataset", n: int) -> "rd.Dataset":
    """(src, dst, odeg) with duplicate targets collapsed.

    All of a src's candidate targets are generated from its own row, so
    dedup and out-degree are batch-local — no shuffle.
    """

    def _edges(batch: pa.Table) -> pa.Table:
        import polars as pl

        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        srcs, dsts = [], []
        for j in range(3):
            sel = ids[(ids % 3) >= j]
            srcs.append(sel)
            dsts.append((sel * 31 + j * 17 + 1) % n)
        df = pl.DataFrame(
            {"src": np.concatenate(srcs), "dst": np.concatenate(dsts)}
        ).unique(["src", "dst"])
        df = df.with_columns(pl.len().over("src").cast(pl.Int64).alias("odeg"))
        return df.to_arrow().select(["src", "dst", "odeg"]).cast(_EDGE_SCHEMA)

    return ds_ids.map_batches(_edges, batch_format="pyarrow")


def _local_graph_arrays(*tbls) -> tuple:
    """Assemble doc_ids + the deterministic edge arrays inside a task.

    Shared by the local-rounds paths: returns (ids, src, dst, odeg)
    with duplicate (src, dst) targets collapsed and odeg per src —
    byte-identical semantics to `link_edges`."""
    import polars as pl

    parts = [
        t if isinstance(t, pa.Table) else pa.Table.from_pandas(t, preserve_index=False)
        for t in tbls
    ]
    ids = np.concatenate(
        [np.asarray(t["doc_id"], dtype=np.int64) for t in parts if t.num_rows]
        or [np.empty(0, np.int64)]
    )
    n = len(ids)
    srcs, dsts = [], []
    for j in range(3):
        sel = ids[(ids % 3) >= j]
        srcs.append(sel)
        dsts.append((sel * 31 + j * 17 + 1) % n)
    df = (
        pl.DataFrame({"src": np.concatenate(srcs), "dst": np.concatenate(dsts)})
        .unique(["src", "dst"])
        .with_columns(pl.len().over("src").cast(pl.Int64).alias("odeg"))
    )
    return ids, df["src"].to_numpy(), df["dst"].to_numpy(), df["odeg"].to_numpy()


@ray.remote(num_returns=1)
def _local_pagerank_task(iters: int, with_indeg: bool, *tbls) -> pa.Table:
    """All PageRank rounds in one task — bit-identical to the BSP path:
    same collapsed edges, same int64 sums, same floor divisions."""
    ids, src, dst, odeg = _local_graph_arrays(*tbls)
    n = len(ids)
    teleport = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN) // n
    sorted_ids = np.sort(ids)
    pos = np.searchsorted(sorted_ids, src)
    # contributions land only on real doc nodes (phantom dsts drop)
    dpos = np.searchsorted(sorted_ids, np.clip(dst, sorted_ids[0], sorted_ids[-1]))
    real = sorted_ids[dpos] == dst
    r = np.full(n, PR_SCALE // n, dtype=np.int64)
    for _ in range(iters):
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, dpos[real], (r[pos] // odeg)[real])
        r = teleport + (PR_DAMP_NUM * s) // PR_DAMP_DEN
    cols = {"node": pa.array(sorted_ids, pa.int64()), "r": pa.array(r, pa.int64())}
    if with_indeg:
        ind = np.zeros(n, dtype=np.int64)
        np.add.at(ind, dpos[real], 1)
        cols["ind"] = pa.array(ind, pa.int64())
    return pa.table(cols)


def _pagerank(
    ds_ids: "rd.Dataset",
    n: int,
    iters: int = PR_ITERS,
    with_indeg: bool = False,
    local_max: int = GRAPH_LOCAL_MAX,
) -> "rd.Dataset":
    """(node, r) after `iters` exact fixed-point power-iteration rounds.

    With `with_indeg`, the FINAL round's reduce also emits `ind` — the
    node's in-degree, which is exactly the number of contribution rows
    (one per collapsed (src, dst) edge) in its group — so callers that
    want both get in-degree for free instead of paying a second
    edge-table shuffle plus an attach join.

    `local_max`: below this node count all rounds run vectorized inside
    ONE Ray task (`_local_pagerank_task`, bit-identical integer math);
    the per-round shuffle fabric only pays for itself at cluster scale.
    Tests force the BSP path with local_max=0."""
    if n <= local_max:
        tbl = ray.get(
            _local_pagerank_task.remote(iters, with_indeg, *ds_ids.to_arrow_refs())
        )
        return rd.from_arrow(tbl)
    teleport = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN) // n
    r0 = PR_SCALE // n

    edges = link_edges(ds_ids, n).materialize()

    def _init(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.table(
            {
                "node": batch["doc_id"].cast(pa.int64()),
                "r": pa.array(np.full(m, r0, dtype=np.int64)),
            }
        ).cast(_RANK_SCHEMA)

    def _base(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.table(
            {
                "node": batch["doc_id"].cast(pa.int64()),
                "s": pa.array(np.zeros(m, dtype=np.int64)),
                "b": pa.array(np.ones(m, dtype=np.int8)),
            }
        ).cast(_SUM_SCHEMA)

    def _contrib(batch: pa.Table) -> pa.Table:
        r = np.asarray(batch["r_src"], dtype=np.int64)
        odeg = np.asarray(batch["odeg"], dtype=np.int64)
        return pa.table(
            {
                "node": batch["dst"],
                "s": pa.array(r // odeg, pa.int64()),
                "b": pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
            }
        ).cast(_SUM_SCHEMA)

    def _reduce(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .group_by("node")
            .agg(pl.col("s").sum(), pl.col("b").max())
            # contributions to a dst that is not a real doc_id carry no
            # base row — dropped, same as the oracle's nodes LEFT JOIN
            .filter(pl.col("b") == 1)
            .with_columns(
                (teleport + (PR_DAMP_NUM * pl.col("s")) // PR_DAMP_DEN).alias("r")
            )
            .select(["node", "r"])
        )
        return out.to_arrow().cast(_RANK_SCHEMA)

    def _reduce_ind(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .group_by("node")
            .agg(
                pl.col("s").sum(),
                pl.col("b").max(),
                # in-degree == contribution rows (b == 0) in the group
                (pl.len().cast(pl.Int64) - pl.col("b").cast(pl.Int64).sum()).alias(
                    "ind"
                ),
            )
            .filter(pl.col("b") == 1)
            .with_columns(
                (teleport + (PR_DAMP_NUM * pl.col("s")) // PR_DAMP_DEN).alias("r")
            )
            .select(["node", "r", "ind"])
        )
        return out.to_arrow().cast(_RANK_IND_SCHEMA)

    # materialized once — unioned into every round's reduce
    base = ds_ids.map_batches(_base, batch_format="pyarrow").materialize()
    ranks = ds_ids.map_batches(_init, batch_format="pyarrow")
    for it in range(iters):
        attached = attach_lookup(
            edges,
            _EDGE_SCHEMA,
            ["src"],
            ranks,
            "node",
            "r",
            pa.int64(),
            ["r_src"],
        )
        contribs = attached.map_batches(_contrib, batch_format="pyarrow")
        reduce_fn = _reduce_ind if (with_indeg and it == iters - 1) else _reduce
        ranks = partitioned_group_map(
            contribs.union(base), "node", reduce_fn, _graph_parts(n), arrow=True
        )
    return ranks


def link_pagerank_docs(
    sf_dir: str, iters: int = PR_ITERS, local_max: int = GRAPH_LOCAL_MAX
) -> "rd.Dataset":
    """(doc_id, in_degree, pagerank_fx): PageRank in 1e-12 fixed-point
    units plus in-degree over the deterministic link graph."""
    ds_ids = _docs_ids(sf_dir)
    n = ds_ids.count()
    if n == 0:  # empty corpus: no nodes, no edges — typed empty result
        return rd.from_arrow(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("in_degree", pa.int64()),
                    ("pagerank_fx", pa.int64()),
                ]
            ).empty_table()
        )
    # in-degree rides the final PageRank round's reduce (count of
    # contribution rows per node) — no second edge shuffle, no attach
    out = _pagerank(ds_ids, n, max(iters, 1), with_indeg=True, local_max=local_max)

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["node"],
                "in_degree": batch["ind"].cast(pa.int64()),
                "pagerank_fx": batch["r"],
            }
        )

    return out.map_batches(_final, batch_format="pyarrow")


@ray.remote(num_returns=1)
def _local_components_task(*tbls) -> pa.Table:
    """Union-find over the whole edge set in one task — identical
    semantics to the BSP min-label propagation: phantom nodes conduct
    connectivity (and can be the min label); sizes count real docs."""
    ids, src, dst, _ = _local_graph_arrays(*tbls)
    parent: dict = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(src.tolist(), dst.tolist()):
        a, b = find(u), find(v)
        if a != b:
            parent[max(a, b)] = min(a, b)
    comp = {d: find(d) for d in ids.tolist()}
    from collections import Counter

    sizes = Counter(comp.values())
    sorted_ids = np.sort(ids)
    labels = np.array([comp[d] for d in sorted_ids.tolist()], dtype=np.int64)
    szs = np.array([sizes[c] for c in labels.tolist()], dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(sorted_ids, pa.int64()),
            "component_id": pa.array(labels, pa.int64()),
            "component_size": pa.array(szs, pa.int64()),
        }
    )


def link_components_docs(
    sf_dir: str, local_max: int = GRAPH_LOCAL_MAX
) -> "rd.Dataset":
    """(doc_id, component_id, component_size): weakly-connected
    components of the link graph via the SAME distributed min-label
    propagation that clusters duplicate pairs (stages/cluster.py) —
    components here are a second, independent consumer of that BSP
    machinery. component_id = min node id reachable (phantom targets —
    `% n` values that are not real doc_ids — conduct connectivity and
    can even be the min, exactly as in the oracle's closure);
    component_size counts REAL docs only.

    ids ride through label_propagation as zero-padded strings so its
    lexicographic min IS the numeric min. The oracle is a recursive-CTE
    transitive closure — exact but O(n * component size), fine at the
    driver's sf0.01 gate; the engine side stays O(edges * diameter).
    """
    from ..stages.cluster import label_propagation

    ds_ids = _docs_ids(sf_dir)
    n = ds_ids.count()
    if n == 0:  # empty corpus: typed empty result
        return rd.from_arrow(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("component_id", pa.int64()),
                    ("component_size", pa.int64()),
                ]
            ).empty_table()
        )
    if n <= local_max:
        return rd.from_arrow(
            ray.get(_local_components_task.remote(*ds_ids.to_arrow_refs()))
        )
    edges = link_edges(ds_ids, n)

    _PAD = 20  # int64 max is 19 digits

    def _to_str(batch: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(batch.select(["src", "dst"]))
            .select(
                pl.col("src").cast(pl.String).str.zfill(_PAD).alias("a_id"),
                pl.col("dst").cast(pl.String).str.zfill(_PAD).alias("b_id"),
            )
            .to_arrow()
            .cast(pa.schema([("a_id", pa.string()), ("b_id", pa.string())]))
        )

    labels = label_propagation(
        edges.map_batches(_to_str, batch_format="pyarrow"),
        num_partitions=_graph_parts(n),
    )

    def _to_int(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["node"].cast(pa.int64()),
                "component_id": batch["label"].cast(pa.int64()),
            }
        )

    as_int = labels.map_batches(_to_int, batch_format="pyarrow")
    _LBL_SCHEMA = pa.schema([("doc_id", pa.int64()), ("component_id", pa.int64())])

    def _mark(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.table(
            {
                "node": batch["doc_id"].cast(pa.int64()),
                "one": pa.array(np.ones(m, dtype=np.int64)),
            }
        )

    # phantom nodes got labels too — keep only real doc_ids
    marked = attach_lookup(
        as_int,
        _LBL_SCHEMA,
        ["doc_id"],
        ds_ids.map_batches(_mark, batch_format="pyarrow"),
        "node",
        "one",
        pa.int64(),
        ["is_real"],
    )
    import pyarrow.compute as pc

    real = marked.map_batches(
        lambda b: b.filter(pc.equal(b["is_real"], 1)).drop_columns(["is_real"]),
        batch_format="pyarrow",
    )

    def _sizes(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .group_by("component_id")
            .agg(pl.len().cast(pl.Int64).alias("sz"))
        )
        return out.to_arrow().cast(
            pa.schema([("component_id", pa.int64()), ("sz", pa.int64())])
        )

    sizes = partitioned_group_map(
        real.select_columns(["component_id"]), "component_id", _sizes,
        _graph_parts(n), arrow=True,
    )
    out = attach_lookup(
        real, _LBL_SCHEMA, ["component_id"], sizes, "component_id", "sz",
        pa.int64(), ["component_size"],
    )
    return out


def components_oracle_sql() -> str:
    """Recursive-CTE transitive-closure twin of `link_components_docs`."""
    return """
        WITH RECURSIVE nn AS MATERIALIZED (SELECT COUNT(*) AS c FROM documents),
        raw AS MATERIALIZED (
            SELECT DISTINCT d.doc_id AS src,
                   (d.doc_id * 31 + j.j * 17 + 1) % (SELECT c FROM nn) AS dst
            FROM documents d
            CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) j
            WHERE j.j <= d.doc_id % 3
        ),
        und AS MATERIALIZED (
            SELECT src AS a, dst AS b FROM raw
            UNION
            SELECT dst AS a, src AS b FROM raw
        ),
        reach(node, lab) AS (
            SELECT a, a FROM (SELECT DISTINCT a FROM und)
            UNION
            SELECT u.a, r.lab FROM und u JOIN reach r ON r.node = u.b
        ),
        comp AS MATERIALIZED (
            SELECT node, MIN(lab) AS component_id FROM reach GROUP BY node
        ),
        realc AS MATERIALIZED (
            SELECT d.doc_id, c.component_id
            FROM documents d JOIN comp c ON c.node = d.doc_id
        )
        SELECT doc_id,
               CAST(component_id AS BIGINT) AS component_id,
               CAST(COUNT(*) OVER (PARTITION BY component_id) AS BIGINT)
                   AS component_size
        FROM realc
    """


def pagerank_oracle_sql(iters: int = PR_ITERS) -> str:
    """Unrolled-iteration DuckDB twin of `link_pagerank_docs`.

    Multiply-referenced CTEs are MATERIALIZED (DuckDB re-inlines the
    whole chain otherwise — the sqlgen.py lesson); every SUM/COUNT is
    cast back to BIGINT to dodge the HUGEINT->float64 dtype drift."""
    s, num, den = PR_SCALE, PR_DAMP_NUM, PR_DAMP_DEN
    parts = [
        "WITH nn AS MATERIALIZED (SELECT COUNT(*) AS c FROM documents),",
        "nodes AS MATERIALIZED (SELECT doc_id AS node FROM documents),",
        """edges AS MATERIALIZED (
            SELECT src, dst, CAST(COUNT(*) OVER (PARTITION BY src) AS BIGINT) AS odeg
            FROM (
                SELECT DISTINCT d.doc_id AS src,
                       (d.doc_id * 31 + j.j * 17 + 1) % (SELECT c FROM nn) AS dst
                FROM documents d
                CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) j
                WHERE j.j <= d.doc_id % 3
            )
        ),""",
        f"""r0 AS (SELECT node, {s} // (SELECT c FROM nn) AS r FROM nodes),""",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""c{t} AS (
            SELECT e.dst AS node, CAST(SUM(r.r // e.odeg) AS BIGINT) AS sm
            FROM edges e JOIN r{t - 1} r ON r.node = e.src
            GROUP BY e.dst
        ),
        r{t} AS {"MATERIALIZED" if t == iters else ""} (
            SELECT nd.node,
                   ({s} * {den - num} // {den}) // (SELECT c FROM nn)
                   + ({num} * COALESCE(c.sm, 0)) // {den} AS r
            FROM nodes nd LEFT JOIN c{t} c ON c.node = nd.node
        ),"""
        )
    parts.append(
        f"""ideg AS (SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS ind
                 FROM edges GROUP BY dst)
        SELECT nd.node AS doc_id,
               CAST(COALESCE(ideg.ind, 0) AS BIGINT) AS in_degree,
               CAST(r{iters}.r AS BIGINT) AS pagerank_fx
        FROM nodes nd
        JOIN r{iters} ON r{iters}.node = nd.node
        LEFT JOIN ideg ON ideg.node = nd.node"""
    )
    return "\n".join(parts)


def link_assortativity_docs(sf_dir: str) -> "rd.Dataset":
    """One-row degree-assortativity profile of the link graph: the
    second-moment sums of (out-degree of src, in-degree of dst) over
    every edge — the graph-health diagnostic (Newman 2002, PRL 89) a
    crawl-curation run uses to spot hub-dominated link farms. The
    Pearson correlation is kept division-free as exact integer moments:

        r = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2))

    Output (n_edges, sxy_num, varx_num, vary_num) — all int64; the
    consumer takes one final sqrt. Scale shape: in-degree is one
    hash-partitioned count; one broadcast/partitioned attach puts it on
    the edges; the moments are a per-batch integer combiner + driver
    fold of O(blocks) rows.
    """
    ds_ids = _docs_ids(sf_dir)
    n = ds_ids.count()
    out_schema = pa.schema(
        [
            ("n_edges", pa.int64()),
            ("sxy_num", pa.int64()),
            ("varx_num", pa.int64()),
            ("vary_num", pa.int64()),
        ]
    )
    if n == 0:
        return rd.from_arrow(out_schema.empty_table())
    edges = link_edges(ds_ids, n).materialize()

    def _ones(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.table(
            {
                "node": batch["dst"],
                "c": pa.array(np.ones(m, dtype=np.int64)),
            }
        )

    def _count(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .group_by("node")
            .agg(pl.col("c").sum().alias("ind"))
        )
        return out.to_arrow().cast(
            pa.schema([("node", pa.int64()), ("ind", pa.int64())])
        )

    indeg = partitioned_group_map(
        edges.map_batches(_ones, batch_format="pyarrow"), "node", _count,
        _graph_parts(n), arrow=True,
    )
    with_ind = attach_lookup(
        edges, _EDGE_SCHEMA, ["dst"], indeg, "node", "ind", pa.int64(), ["ind"]
    )

    def _moments(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch["odeg"], dtype=np.int64)
        # a dst with no in-edge cannot appear here (it IS an in-edge
        # target), and in-degree was counted over edges themselves, so
        # the attached column is never null
        y = np.asarray(batch["ind"], dtype=np.int64)
        return pa.table(
            {
                "m": pa.array([batch.num_rows], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
                "syy": pa.array([int((y * y).sum())], pa.int64()),
            }
        )

    parts = with_ind.map_batches(_moments, batch_format="pyarrow").to_pandas()
    m = int(parts["m"].sum())
    sx, sy = int(parts["sx"].sum()), int(parts["sy"].sum())
    sxy, sxx, syy = (
        int(parts["sxy"].sum()),
        int(parts["sxx"].sum()),
        int(parts["syy"].sum()),
    )
    return rd.from_arrow(
        pa.table(
            {
                "n_edges": pa.array([m], pa.int64()),
                "sxy_num": pa.array([m * sxy - sx * sy], pa.int64()),
                "varx_num": pa.array([m * sxx - sx * sx], pa.int64()),
                "vary_num": pa.array([m * syy - sy * sy], pa.int64()),
            }
        ).cast(out_schema)
    )


def assortativity_oracle_sql() -> str:
    """DuckDB twin of `link_assortativity_docs`."""
    return """
        WITH nn AS MATERIALIZED (SELECT COUNT(*) AS c FROM documents),
        edges AS MATERIALIZED (
            SELECT src, dst, CAST(COUNT(*) OVER (PARTITION BY src) AS BIGINT) AS odeg
            FROM (
                SELECT DISTINCT d.doc_id AS src,
                       (d.doc_id * 31 + j.j * 17 + 1) % (SELECT c FROM nn) AS dst
                FROM documents d
                CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) j
                WHERE j.j <= d.doc_id % 3
            )
        ),
        ideg AS MATERIALIZED (
            SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS ind
            FROM edges GROUP BY dst
        ),
        xy AS (
            SELECT e.odeg AS x, i.ind AS y
            FROM edges e JOIN ideg i ON i.node = e.dst
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
                   SUM(CAST(x AS HUGEINT) * y) AS sxy,
                   SUM(CAST(x AS HUGEINT) * x) AS sxx,
                   SUM(CAST(y AS HUGEINT) * y) AS syy
            FROM xy
        )
        SELECT m AS n_edges,
               CAST(m * sxy - sx * sy AS BIGINT) AS sxy_num,
               CAST(m * sxx - sx * sx AS BIGINT) AS varx_num,
               CAST(m * syy - sy * sy AS BIGINT) AS vary_num
        FROM agg
    """


HITS_SCALE = 10**6
HITS_ITERS = 3


@ray.remote(num_returns=1)
def _local_hits_task(iters: int, *tbls) -> pa.Table:
    """All HITS rounds in one task — bit-identical to the BSP path:
    same int64 sums, same max-normalization floor divisions, phantom
    dst nodes carry authority mass on both paths."""
    ids, src, dst, _ = _local_graph_arrays(*tbls)
    sorted_ids = np.sort(ids)
    spos = np.searchsorted(sorted_ids, src)
    dst_nodes = np.unique(dst)
    dpos = np.searchsorted(dst_nodes, dst)
    h = np.full(len(sorted_ids), HITS_SCALE, dtype=np.int64)
    a = np.zeros(len(dst_nodes), dtype=np.int64)
    for _ in range(iters):
        a = np.zeros(len(dst_nodes), dtype=np.int64)
        np.add.at(a, dpos, h[spos])
        a = a * HITS_SCALE // a.max()
        h = np.zeros(len(sorted_ids), dtype=np.int64)
        np.add.at(h, spos, a[dpos])
        h = h * HITS_SCALE // h.max()
    ap = np.searchsorted(
        dst_nodes, np.clip(sorted_ids, dst_nodes[0], dst_nodes[-1])
    )
    is_dst = dst_nodes[ap] == sorted_ids
    auth = np.where(is_dst, a[ap], 0)
    return pa.table(
        {
            "doc_id": pa.array(sorted_ids, pa.int64()),
            "hub_fx": pa.array(h, pa.int64()),
            "auth_fx": pa.array(auth, pa.int64()),
        }
    )


def link_hits_docs(
    sf_dir: str, iters: int = HITS_ITERS, local_max: int = GRAPH_LOCAL_MAX
) -> "rd.Dataset":
    """(doc_id, hub_fx, auth_fx): HITS hubs-and-authorities (Kleinberg
    1999, JACM 46(5)) over the deterministic link graph, in exact
    fixed-point integers. Each round:

        a(v) = sum_{u->v} h(u),  then a <- a * 1e6 // max(a)
        h(u) = sum_{u->v} a(v),  then h <- h * 1e6 // max(h)

    Max-normalization (the standard bound-keeping variant) uses integer
    floor division, so every round is bit-deterministic across block
    layouts and matches the oracle's unrolled CTE chain exactly.
    Phantom targets (`% n` values that are not doc_ids) carry authority
    mass and feed hub scores, on both sides identically; only the final
    output is restricted to real docs (auth 0 for docs nobody links).

    Scale shape: per round, two broadcast/partitioned attaches and two
    hash-partitioned sums over score tables of 2 int64s per node; the
    max is a per-batch combiner + driver scalar. Edges materialized
    once.
    """
    ds_ids = _docs_ids(sf_dir)
    n = ds_ids.count()
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("hub_fx", pa.int64()), ("auth_fx", pa.int64())]
    )
    if n == 0:
        return rd.from_arrow(out_schema.empty_table())
    if n <= local_max:
        return rd.from_arrow(
            ray.get(_local_hits_task.remote(iters, *ds_ids.to_arrow_refs()))
        )
    edges = link_edges(ds_ids, n).materialize()
    _SCORE = pa.schema([("node", pa.int64()), ("v", pa.int64())])

    def _init(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.table(
            {
                "node": batch["doc_id"].cast(pa.int64()),
                "v": pa.array(np.full(m, HITS_SCALE, dtype=np.int64)),
            }
        ).cast(_SCORE)

    def _sum_by(key_out: str):
        def _reduce(tb: pa.Table) -> pa.Table:
            import polars as pl

            out = (
                pl.from_arrow(tb)
                .group_by("node")
                .agg(pl.col("v").sum())
            )
            return out.to_arrow().cast(_SCORE)

        return _reduce

    def _normalize(ds: "rd.Dataset") -> "rd.Dataset":
        ds = ds.materialize()
        mx = int(ds.max("v"))

        def _scale(batch: pa.Table) -> pa.Table:
            v = np.asarray(batch["v"], dtype=np.int64)
            return pa.table(
                {"node": batch["node"], "v": pa.array(v * HITS_SCALE // mx)}
            ).cast(_SCORE)

        return ds.map_batches(_scale, batch_format="pyarrow")

    hubs = ds_ids.map_batches(_init, batch_format="pyarrow")
    auths = None
    for _ in range(iters):
        eh = attach_lookup(
            edges, _EDGE_SCHEMA, ["src"], hubs, "node", "v", pa.int64(), ["hs"]
        )

        def _to_dst(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"node": batch["dst"], "v": batch["hs"].cast(pa.int64())}
            ).cast(_SCORE)

        auths = _normalize(
            partitioned_group_map(
                eh.map_batches(_to_dst, batch_format="pyarrow"),
                "node",
                _sum_by("dst"),
                _graph_parts(n),
                arrow=True,
            )
        )
        ea = attach_lookup(
            edges, _EDGE_SCHEMA, ["dst"], auths, "node", "v", pa.int64(), ["as_"]
        )

        def _to_src(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"node": batch["src"], "v": batch["as_"].cast(pa.int64())}
            ).cast(_SCORE)

        hubs = _normalize(
            partitioned_group_map(
                ea.map_batches(_to_src, batch_format="pyarrow"),
                "node",
                _sum_by("src"),
                _graph_parts(n),
                arrow=True,
            )
        )

    hubs_final = hubs  # covers every real doc (out-degree >= 1)
    _H = pa.schema([("node", pa.int64()), ("hub_fx", pa.int64())])

    def _rename_h(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"node": batch["node"], "hub_fx": batch["v"]}
        ).cast(_H)

    out = attach_lookup(
        hubs_final.map_batches(_rename_h, batch_format="pyarrow"),
        _H,
        ["node"],
        auths,
        "node",
        "v",
        pa.int64(),
        ["auth_fx"],
    )

    def _final(batch: pa.Table) -> pa.Table:
        auth = batch["auth_fx"]
        auth = pc.fill_null(auth, 0)
        return pa.table(
            {
                "doc_id": batch["node"],
                "hub_fx": batch["hub_fx"],
                "auth_fx": auth.cast(pa.int64()),
            }
        ).cast(out_schema)

    import pyarrow.compute as pc

    return out.map_batches(_final, batch_format="pyarrow")


def hits_oracle_sql(iters: int = HITS_ITERS) -> str:
    """Unrolled-CTE DuckDB twin of `link_hits_docs`."""
    s = HITS_SCALE
    parts = [
        "WITH nn AS MATERIALIZED (SELECT COUNT(*) AS c FROM documents),",
        "nodes AS MATERIALIZED (SELECT doc_id AS node FROM documents),",
        """edges AS MATERIALIZED (
            SELECT DISTINCT d.doc_id AS src,
                   (d.doc_id * 31 + j.j * 17 + 1) % (SELECT c FROM nn) AS dst
            FROM documents d
            CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) j
            WHERE j.j <= d.doc_id % 3
        ),""",
        f"h0 AS (SELECT node, CAST({s} AS BIGINT) AS v FROM nodes),",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""ar{t} AS MATERIALIZED (
            SELECT e.dst AS node, CAST(SUM(h.v) AS BIGINT) AS v
            FROM edges e JOIN h{t - 1} h ON h.node = e.src
            GROUP BY e.dst
        ),
        a{t} AS MATERIALIZED (
            SELECT node,
                   CAST(v AS BIGINT) * {s} // (SELECT MAX(v) FROM ar{t}) AS v
            FROM ar{t}
        ),
        hr{t} AS MATERIALIZED (
            SELECT e.src AS node, CAST(SUM(a.v) AS BIGINT) AS v
            FROM edges e JOIN a{t} a ON a.node = e.dst
            GROUP BY e.src
        ),
        h{t} AS MATERIALIZED (
            SELECT node,
                   CAST(v AS BIGINT) * {s} // (SELECT MAX(v) FROM hr{t}) AS v
            FROM hr{t}
        ),"""
        )
    parts.append(
        f"""fin AS (
            SELECT h.node AS doc_id,
                   CAST(h.v AS BIGINT) AS hub_fx,
                   CAST(COALESCE(a.v, 0) AS BIGINT) AS auth_fx
            FROM h{iters} h LEFT JOIN a{iters} a ON a.node = h.node
        )
        SELECT f.doc_id, f.hub_fx, f.auth_fx
        FROM fin f JOIN nodes nd ON nd.node = f.doc_id"""
    )
    return "\n".join(parts)


# ---------------------------------------------------------------------------
# Triangle counting / local clustering structure
# ---------------------------------------------------------------------------

_TRI_STAGE_SCHEMA = pa.schema(
    [("x", pa.int64()), ("y", pa.int64()), ("c", pa.int64()), ("tag", pa.int8())]
)
_TRI_CRED_SCHEMA = pa.schema(
    [("node", pa.int64()), ("d", pa.int64()), ("t", pa.int64()), ("b", pa.int8())]
)
_TRI_OUT_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("degree", pa.int64()), ("triangles", pa.int64())]
)


@ray.remote(num_returns=1)
def _local_triangles_task(*tbls) -> pa.Table:
    """Whole wedge-join in one task (small graphs) — identical counting
    to the distributed path: lowest-id orientation, self-loops dropped,
    credits only to real doc nodes."""
    import polars as pl

    ids, src, dst, _ = _local_graph_arrays(*tbls)
    n = len(ids)
    sorted_ids = np.sort(ids)
    keep = src != dst
    a = np.minimum(src[keep], dst[keep])
    b = np.maximum(src[keep], dst[keep])
    und = pl.DataFrame({"a": a, "b": b}).unique(["a", "b"]).sort(["a", "b"])
    av, bv = und["a"].to_numpy(), und["b"].to_numpy()
    wx, wy, wc = [], [], []
    starts = np.flatnonzero(np.r_[True, av[1:] != av[:-1]]) if len(av) else []
    ends = np.r_[starts[1:], len(av)] if len(av) else []
    for s, e in zip(starts, ends):
        k = e - s
        if k < 2:
            continue
        nb = bv[s:e]
        iu, ju = np.triu_indices(k, k=1)
        wx.append(nb[iu])
        wy.append(nb[ju])
        wc.append(np.full(len(iu), av[s], dtype=np.int64))
    deg_nodes = np.concatenate([av, bv]) if len(av) else np.empty(0, np.int64)
    tri_nodes = np.empty(0, np.int64)
    if wx:
        w = pl.DataFrame(
            {"x": np.concatenate(wx), "y": np.concatenate(wy), "c": np.concatenate(wc)}
        )
        hit = w.join(und.rename({"a": "x", "b": "y"}), on=["x", "y"], how="inner")
        if hit.height:
            tri_nodes = np.concatenate(
                [hit["c"].to_numpy(), hit["x"].to_numpy(), hit["y"].to_numpy()]
            )

    def _cred(nodes: np.ndarray) -> np.ndarray:
        cnt = np.zeros(n, dtype=np.int64)
        if len(nodes):
            p = np.searchsorted(
                sorted_ids, np.clip(nodes, sorted_ids[0], sorted_ids[-1])
            )
            real = sorted_ids[p] == nodes
            np.add.at(cnt, p[real], 1)
        return cnt

    return pa.table(
        {
            "doc_id": pa.array(sorted_ids, pa.int64()),
            "degree": pa.array(_cred(deg_nodes), pa.int64()),
            "triangles": pa.array(_cred(tri_nodes), pa.int64()),
        }
    ).cast(_TRI_OUT_SCHEMA)


def link_triangles_docs(
    sf_dir: str, local_max: int = GRAPH_LOCAL_MAX
) -> "rd.Dataset":
    """(doc_id, degree, triangles): per-node triangle participation and
    undirected degree over the link graph — the integer numerators of
    the local clustering coefficient 2T/(k(k-1)) (division-free, the
    same exactness discipline as `link_assortativity_docs`).

    Node-iterator with lowest-id orientation (Schank & Wagner 2005):
    every triangle x<y<z is found exactly once, as the wedge (y, z)
    emitted from its lowest node x matched against the edge (y, z).
    Id orientation is safe here because the deterministic graph's
    degrees are bounded (out-degree <= 3, in-degree ~Poisson); for a
    power-law web graph the same stage would orient low-degree ->
    high-degree to cap wedge fan-out.

    Scale shape: three hash shuffles over edge-sized tables — (1)
    partition pairs by lower endpoint: batch-dup'd pairs become
    distinct, each node's sorted higher-neighbor list emits its wedges;
    (2) partition wedges+edges by wedge first endpoint: vectorized
    (x, y) hash join per partition, matched wedges explode to 3 credit
    rows; (3) partition credits by node: one integer sum. Self-loops
    drop; nothing driver-side; the oracle replays the identical
    wedge-join in SQL.
    """
    ds_ids = _docs_ids(sf_dir)
    n = ds_ids.count()
    if n == 0:
        return rd.from_arrow(_TRI_OUT_SCHEMA.empty_table())
    if n <= local_max:
        return rd.from_arrow(
            ray.get(_local_triangles_task.remote(*ds_ids.to_arrow_refs()))
        )
    edges = link_edges(ds_ids, n)

    def _pairs(batch: pa.Table) -> pa.Table:
        import polars as pl

        src = np.asarray(batch["src"], dtype=np.int64)
        dst = np.asarray(batch["dst"], dtype=np.int64)
        keep = src != dst
        a = np.minimum(src[keep], dst[keep])
        b = np.maximum(src[keep], dst[keep])
        df = pl.DataFrame({"a": a, "b": b}).unique(["a", "b"])
        return df.to_arrow().cast(
            pa.schema([("a", pa.int64()), ("b", pa.int64())])
        )

    def _wedges(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(tb).unique(["a", "b"])
        av = df["a"].to_numpy()
        bv = df["b"].to_numpy()
        order = np.lexsort((bv, av))
        av, bv = av[order], bv[order]
        # per-node sorted higher-neighbor runs -> all (b, c) pairs
        xs, ys, cs = [np.empty(0, np.int64)] * 3
        wx, wy, wc = [], [], []
        starts = np.flatnonzero(np.r_[True, av[1:] != av[:-1]])
        ends = np.r_[starts[1:], len(av)]
        for s, e in zip(starts, ends):
            k = e - s
            if k < 2:
                continue
            nb = bv[s:e]
            iu, ju = np.triu_indices(k, k=1)
            wx.append(nb[iu])
            wy.append(nb[ju])
            wc.append(np.full(len(iu), av[s], dtype=np.int64))
        if wx:
            xs = np.concatenate(wx)
            ys = np.concatenate(wy)
            cs = np.concatenate(wc)
        edge_tb = pa.table(
            {
                "x": pa.array(av, pa.int64()),
                "y": pa.array(bv, pa.int64()),
                "c": pa.array(np.zeros(len(av), np.int64)),
                "tag": pa.array(np.ones(len(av), np.int8)),
            }
        )
        wedge_tb = pa.table(
            {
                "x": pa.array(xs, pa.int64()),
                "y": pa.array(ys, pa.int64()),
                "c": pa.array(cs, pa.int64()),
                "tag": pa.array(np.zeros(len(xs), np.int8)),
            }
        )
        return pa.concat_tables([edge_tb, wedge_tb]).cast(_TRI_STAGE_SCHEMA)

    staged = partitioned_group_map(
        edges.map_batches(_pairs, batch_format="pyarrow"),
        "a",
        _wedges,
        _graph_parts(n),
        arrow=True,
    ).materialize()

    def _match(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(tb)
        e = df.filter(pl.col("tag") == 1).select(["x", "y"])
        w = df.filter(pl.col("tag") == 0)
        hit = w.join(e, on=["x", "y"], how="inner")
        if hit.height == 0:
            return _TRI_CRED_SCHEMA.empty_table()
        nodes = np.concatenate(
            [hit["c"].to_numpy(), hit["x"].to_numpy(), hit["y"].to_numpy()]
        )
        m = len(nodes)
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "d": pa.array(np.zeros(m, np.int64)),
                "t": pa.array(np.ones(m, np.int64)),
                "b": pa.array(np.zeros(m, np.int8)),
            }
        ).cast(_TRI_CRED_SCHEMA)

    tri_credits = partitioned_group_map(
        staged, "x", _match, _graph_parts(n), arrow=True
    )

    def _deg_credits(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch).filter(pl.col("tag") == 1)
        nodes = np.concatenate([df["x"].to_numpy(), df["y"].to_numpy()])
        m = len(nodes)
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "d": pa.array(np.ones(m, np.int64)),
                "t": pa.array(np.zeros(m, np.int64)),
                "b": pa.array(np.zeros(m, np.int8)),
            }
        ).cast(_TRI_CRED_SCHEMA)

    def _base(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.table(
            {
                "node": batch["doc_id"].cast(pa.int64()),
                "d": pa.array(np.zeros(m, np.int64)),
                "t": pa.array(np.zeros(m, np.int64)),
                "b": pa.array(np.ones(m, np.int8)),
            }
        ).cast(_TRI_CRED_SCHEMA)

    def _reduce(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .group_by("node")
            .agg(pl.col("d").sum(), pl.col("t").sum(), pl.col("b").max())
            .filter(pl.col("b") == 1)
            .select(
                pl.col("node").alias("doc_id"),
                pl.col("d").alias("degree"),
                pl.col("t").alias("triangles"),
            )
        )
        return out.to_arrow().cast(_TRI_OUT_SCHEMA)

    credits = (
        tri_credits.union(
            staged.map_batches(_deg_credits, batch_format="pyarrow")
        ).union(ds_ids.map_batches(_base, batch_format="pyarrow"))
    )
    return partitioned_group_map(
        credits, "node", _reduce, _graph_parts(n), arrow=True
    )


def triangles_oracle_sql() -> str:
    """Wedge-join DuckDB twin of `link_triangles_docs`."""
    return """
        WITH nn AS MATERIALIZED (SELECT COUNT(*) AS c FROM documents),
        raw AS MATERIALIZED (
            SELECT DISTINCT d.doc_id AS src,
                   (d.doc_id * 31 + j.j * 17 + 1) % (SELECT c FROM nn) AS dst
            FROM documents d
            CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) j
            WHERE j.j <= d.doc_id % 3
        ),
        und AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM raw WHERE src != dst
        ),
        tri AS MATERIALIZED (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM und e1
            JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
            JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
        ),
        cred AS (
            SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri
        ),
        deg AS (
            SELECT a AS node FROM und UNION ALL SELECT b FROM und
        ),
        tcnt AS MATERIALIZED (SELECT node, COUNT(*) AS c FROM cred GROUP BY node),
        dcnt AS MATERIALIZED (SELECT node, COUNT(*) AS c FROM deg GROUP BY node)
        SELECT d.doc_id,
               CAST(COALESCE(dc.c, 0) AS BIGINT) AS degree,
               CAST(COALESCE(tc.c, 0) AS BIGINT) AS triangles
        FROM documents d
        LEFT JOIN dcnt dc ON dc.node = d.doc_id
        LEFT JOIN tcnt tc ON tc.node = d.doc_id
    """


# ---------------------------------------------------------------------------
# BFS reachability layers
# ---------------------------------------------------------------------------

BFS_DEPTH = 6

_BFS_SCHEMA = pa.schema([("node", pa.int64()), ("d", pa.int64())])
_BFS_OUT_SCHEMA = pa.schema([("doc_id", pa.int64()), ("depth", pa.int64())])


@ray.remote(num_returns=1)
def _local_bfs_task(max_depth: int, *tbls) -> pa.Table:
    """Whole BFS in one task — identical frontier/min semantics to the
    BSP path; phantom nodes conduct reachability."""
    ids, src, dst, _ = _local_graph_arrays(*tbls)
    root = int(ids.min())
    depth: dict = {root: 0}
    frontier = {root}
    for d in range(1, max_depth + 1):
        nxt = set()
        for u, v in zip(src.tolist(), dst.tolist()):
            if u in frontier and v not in depth:
                nxt.add(v)
        for v in nxt:
            depth[v] = d
        frontier = nxt
        if not frontier:
            break
    id_set = set(ids.tolist())
    rows = sorted((n, dd) for n, dd in depth.items() if n in id_set)
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "depth": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def link_bfs_layers(
    sf_dir: str, max_depth: int = BFS_DEPTH, local_max: int = GRAPH_LOCAL_MAX
) -> "rd.Dataset":
    """(doc_id, depth): shortest directed-hop distance from the
    smallest doc_id to every node reachable within `max_depth` hops —
    the crawl-frontier / influence-radius computation, and the third
    iterative BSP class (frontier expansion) next to power iteration
    and label propagation.

    Each round: attach the current depth table to edges on src (only
    frontier rows propagate), emit (dst, d+1) candidates, then one
    hash-partitioned MIN per node merges candidates with existing
    depths — new nodes enter with round number d, visited nodes keep
    their (smaller) depth, exactly BFS layer semantics. Phantom `% n`
    targets conduct reachability (as in components); only real docs
    appear in the output. Small graphs auto-switch to the single-task
    path (`_local_bfs_task`, parity-tested)."""
    ds_ids = _docs_ids(sf_dir)
    n = ds_ids.count()
    if n == 0:
        return rd.from_arrow(_BFS_OUT_SCHEMA.empty_table())
    if n <= local_max:
        return rd.from_arrow(
            ray.get(_local_bfs_task.remote(max_depth, *ds_ids.to_arrow_refs()))
        )
    edges = link_edges(ds_ids, n).materialize()
    root = int(ds_ids.min("doc_id"))

    depths = rd.from_arrow(
        pa.table({"node": pa.array([root], pa.int64()),
                  "d": pa.array([0], pa.int64())})
    )

    def _min_part(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .group_by("node")
            .agg(pl.col("d").min())
        )
        return out.to_arrow().cast(_BFS_SCHEMA)

    for rnd in range(1, max_depth + 1):
        attached = attach_lookup(
            edges, _EDGE_SCHEMA, ["src"], depths, "node", "d",
            pa.int64(), ["d_src"],
        )

        def _expand(batch: pa.Table, _r=rnd) -> pa.Table:
            import polars as pl

            out = (
                pl.from_arrow(batch)
                # only the CURRENT frontier (depth == round-1) expands;
                # older layers already propagated in earlier rounds
                .filter(pl.col("d_src") == _r - 1)
                .select(
                    pl.col("dst").alias("node"),
                    pl.lit(_r, dtype=pl.Int64).alias("d"),
                )
            )
            return out.to_arrow().cast(_BFS_SCHEMA)

        cands = attached.map_batches(_expand, batch_format="pyarrow")
        depths = partitioned_group_map(
            depths.union(cands), "node", _min_part, _graph_parts(n), arrow=True
        ).materialize()

    # restrict to real docs (phantoms conducted but are not output)
    def _mark(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.table(
            {
                "node": batch["doc_id"].cast(pa.int64()),
                "one": pa.array(np.ones(m, dtype=np.int64)),
            }
        )

    marked = attach_lookup(
        depths, _BFS_SCHEMA, ["node"],
        ds_ids.map_batches(_mark, batch_format="pyarrow"),
        "node", "one", pa.int64(), ["is_doc"],
    )

    def _final(batch: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(batch)
            .filter(pl.col("is_doc").is_not_null())
            .select(pl.col("node").alias("doc_id"), pl.col("d").alias("depth"))
        )
        return out.to_arrow().cast(_BFS_OUT_SCHEMA)

    return marked.map_batches(_final, batch_format="pyarrow")


def bfs_oracle_sql(max_depth: int = BFS_DEPTH) -> str:
    """Unrolled frontier-expansion DuckDB twin of `link_bfs_layers`."""
    parts = [
        "WITH nn AS MATERIALIZED (SELECT COUNT(*) AS c FROM documents),",
        """edges AS MATERIALIZED (
            SELECT DISTINCT d.doc_id AS src,
                   (d.doc_id * 31 + j.j * 17 + 1) % (SELECT c FROM nn) AS dst
            FROM documents d
            CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) j
            WHERE j.j <= d.doc_id % 3
        ),""",
        """r0 AS (SELECT MIN(doc_id) AS node, 0 AS d FROM documents),""",
    ]
    for t in range(1, max_depth + 1):
        parts.append(
            f"""c{t} AS (
            SELECT e.dst AS node, {t} AS d
            FROM edges e JOIN r{t - 1} r ON r.node = e.src AND r.d = {t - 1}
        ),
        r{t} AS MATERIALIZED (
            SELECT node, MIN(d) AS d
            FROM (SELECT node, d FROM r{t - 1}
                  UNION ALL SELECT node, d FROM c{t})
            GROUP BY node
        ),"""
        )
    parts.append(
        f"""fin AS (SELECT * FROM r{max_depth})
        SELECT d2.doc_id, CAST(f.d AS BIGINT) AS depth
        FROM fin f JOIN documents d2 ON d2.doc_id = f.node"""
    )
    return "\n".join(parts)


#: k-core parameters: degree threshold and the FIXED number of peel
#: rounds. Like PR_ITERS/HITS_ITERS, the operator is defined as the
#: R-round prefix of the peel (deterministic, unrollable in SQL); run
#: with a larger `rounds` for full convergence — each round only
#: removes nodes, so the sequence is monotone.
KCORE_K = 3
KCORE_ROUNDS = 6

_KCORE_AB_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])
_KCORE_ALIVE_SCHEMA = pa.schema([("node", pa.int64()), ("one", pa.int64())])
_KCORE_OUT_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("core_deg", pa.int64())]
)


@ray.remote(num_returns=1)
def _local_kcore_task(k: int, rounds: int, *tbls) -> pa.Table:
    """All peel rounds in one task — identical semantics to the BSP
    path: undirected deduped edges, self-loops dropped, both endpoints
    real docs; a node survives a round iff its degree among surviving
    edges is >= k."""
    import polars as pl

    ids, src, dst, _ = _local_graph_arrays(*tbls)
    if len(ids) == 0:
        return _KCORE_OUT_SCHEMA.empty_table()
    ids_sorted = np.sort(ids)

    def _real(x: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(ids_sorted, x)
        pos_c = np.minimum(pos, len(ids_sorted) - 1)
        return ids_sorted[pos_c] == x

    a = np.minimum(src, dst)
    b = np.maximum(src, dst)
    keep = (a != b) & _real(a) & _real(b)
    und = pl.DataFrame({"a": a[keep], "b": b[keep]}).unique(["a", "b"])
    ai = np.searchsorted(ids_sorted, und["a"].to_numpy())
    bi = np.searchsorted(ids_sorted, und["b"].to_numpy())
    n = len(ids_sorted)
    alive = np.ones(n, dtype=bool)
    for _ in range(rounds):
        m = alive[ai] & alive[bi]
        deg = np.bincount(ai[m], minlength=n) + np.bincount(bi[m], minlength=n)
        alive = deg >= k
    m = alive[ai] & alive[bi]
    deg = np.bincount(ai[m], minlength=n) + np.bincount(bi[m], minlength=n)
    out = alive & (deg >= 1)
    return pa.table(
        {
            "doc_id": pa.array(ids_sorted[out], pa.int64()),
            "core_deg": pa.array(deg[out].astype(np.int64), pa.int64()),
        }
    )


def link_kcore_docs(
    sf_dir: str,
    k: int = KCORE_K,
    rounds: int = KCORE_ROUNDS,
    local_max: int = GRAPH_LOCAL_MAX,
) -> "rd.Dataset":
    """(doc_id, core_deg): the R-round k-core peel of the UNDIRECTED
    link graph — iteratively remove nodes with fewer than `k` surviving
    neighbors, the dense-subgraph extraction web curators use to find
    tightly-linked hub communities (and the fourth iterative BSP class
    here: monotone set shrinkage, next to power iteration, label
    propagation and frontier expansion).

    Edges are the deterministic link edges, made undirected (min, max),
    self-loops dropped, both endpoints restricted to real docs, then
    deduped — materialized ONCE. Each round: attach the alive flag to
    both edge endpoints (broadcast under `attach_lookup`'s limit,
    partitioned above), keep both-alive edges, count degrees with a
    per-batch combiner + one hash-partitioned sum, and keep nodes with
    degree >= k. After the final round the surviving subgraph's degrees
    are recomputed the same way and returned (nodes that end isolated
    drop out — inner-join semantics, same on both engine paths and in
    the unrolled oracle). Small graphs auto-switch to the single-task
    path (`_local_kcore_task`, parity-tested with local_max=0)."""
    ds_ids = _docs_ids(sf_dir)
    n = ds_ids.count()
    if n == 0:
        return rd.from_arrow(_KCORE_OUT_SCHEMA.empty_table())
    if n <= local_max:
        return rd.from_arrow(
            ray.get(_local_kcore_task.remote(k, rounds, *ds_ids.to_arrow_refs()))
        )

    def _mark(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.table(
            {
                "node": batch["doc_id"].cast(pa.int64()),
                "one": pa.array(np.ones(m, dtype=np.int64)),
            }
        )

    marks = ds_ids.map_batches(_mark, batch_format="pyarrow")

    def _und(batch: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(batch.select(["src", "dst"]))
            .select(
                pl.min_horizontal("src", "dst").alias("a"),
                pl.max_horizontal("src", "dst").alias("b"),
            )
            .filter(pl.col("a") != pl.col("b"))
        )
        return out.to_arrow().cast(_KCORE_AB_SCHEMA)

    raw = link_edges(ds_ids, n).map_batches(_und, batch_format="pyarrow")
    s_real = pa.schema(
        list(_KCORE_AB_SCHEMA)
        + [pa.field("ra", pa.int64()), pa.field("rb", pa.int64())]
    )
    realed = attach_lookup(
        raw, _KCORE_AB_SCHEMA, ["a", "b"], marks, "node", "one",
        pa.int64(), ["ra", "rb"],
    )

    def _keep_real(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(pc.is_valid(batch["ra"]), pc.is_valid(batch["rb"]))
        return batch.filter(m).select(["a", "b"]).cast(_KCORE_AB_SCHEMA)

    def _uniq(tb: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(tb)
            .unique(["a", "b"])
            .to_arrow()
            .cast(_KCORE_AB_SCHEMA)
        )

    edges = partitioned_group_map(
        realed.map_batches(_keep_real, batch_format="pyarrow"),
        "a",
        _uniq,
        _graph_parts(n),
        arrow=True,
    ).materialize()

    alive = marks
    from ray.data.aggregate import Sum

    def _deg_partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        import pyarrow.compute as pc

        m = pc.and_(pc.is_valid(batch["xa"]), pc.is_valid(batch["xb"]))
        kept = batch.filter(m)
        df = pl.concat(
            [
                pl.from_arrow(kept.select(["a"])).rename({"a": "node"}),
                pl.from_arrow(kept.select(["b"])).rename({"b": "node"}),
            ]
        )
        out = (
            df.group_by("node")
            .len()
            .with_columns(pl.col("len").cast(pl.Int64).alias("_cnt"))
            .select(["node", "_cnt"])
        )
        return out.to_arrow().cast(
            pa.schema([("node", pa.int64()), ("_cnt", pa.int64())])
        )

    def _degrees(alive_ds: "rd.Dataset") -> "rd.Dataset":
        att = attach_lookup(
            edges, _KCORE_AB_SCHEMA, ["a", "b"], alive_ds, "node", "one",
            pa.int64(), ["xa", "xb"],
        )
        return (
            att.map_batches(_deg_partial, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("_cnt", alias_name="deg"))
        )

    def _alive_next(batch: pa.Table, _k=k) -> pa.Table:
        import pyarrow.compute as pc

        kept = batch.filter(pc.greater_equal(batch["deg"], _k))
        m = kept.num_rows
        return pa.table(
            {
                "node": kept["node"].cast(pa.int64()),
                "one": pa.array(np.ones(m, dtype=np.int64)),
            }
        )

    for _ in range(rounds):
        alive = (
            _degrees(alive)
            .map_batches(_alive_next, batch_format="pyarrow")
            .materialize()
        )

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["node"].cast(pa.int64()),
                "core_deg": batch["deg"].cast(pa.int64()),
            }
        )

    return _degrees(alive).map_batches(_final, batch_format="pyarrow")


def kcore_oracle_sql(k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    """Unrolled R-round peel: DuckDB twin of `link_kcore_docs`."""
    parts = [
        "WITH nn AS MATERIALIZED (SELECT COUNT(*) AS c FROM documents),",
        """e0 AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM (
                SELECT d.doc_id AS src,
                       (d.doc_id * 31 + j.j * 17 + 1) % (SELECT c FROM nn)
                           AS dst
                FROM documents d
                CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) j
                WHERE j.j <= d.doc_id % 3
            )
            WHERE src != dst
              AND dst IN (SELECT doc_id FROM documents)
        ),
        a0 AS (SELECT doc_id AS node FROM documents),""",
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"""d{t} AS (
            SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
                SELECT e.a AS node FROM e0 e
                JOIN a{t - 1} x ON x.node = e.a JOIN a{t - 1} y ON y.node = e.b
                UNION ALL
                SELECT e.b FROM e0 e
                JOIN a{t - 1} x ON x.node = e.a JOIN a{t - 1} y ON y.node = e.b
            ) GROUP BY node
        ),
        a{t} AS MATERIALIZED (SELECT node FROM d{t} WHERE deg >= {k}),"""
        )
    parts.append(
        f"""dfin AS (
            SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
                SELECT e.a AS node FROM e0 e
                JOIN a{rounds} x ON x.node = e.a
                JOIN a{rounds} y ON y.node = e.b
                UNION ALL
                SELECT e.b FROM e0 e
                JOIN a{rounds} x ON x.node = e.a
                JOIN a{rounds} y ON y.node = e.b
            ) GROUP BY node
        )
        SELECT node AS doc_id, deg AS core_deg FROM dfin"""
    )
    return "\n".join(parts)
