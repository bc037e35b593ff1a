"""Similarity search over embedding columns.

The reference's semantic layer holds a FAISS index behind a shared
service (`/root/reference/src/quarrycore/deduplicator/semantic_dedup.py:211-254`);
here the equivalents are dataflow-native:

- `knn_cosine`: brute-force top-k — the query matrix is broadcast via
  `ray.put` once, each batch does one float64 matmul against it. The
  correct baseline at any scale where the query side is small.
- `ann_lsh_knn`: a scale path — random-hyperplane LSH (Charikar 2002)
  buckets both corpus and queries; candidates are scored only within
  matching buckets. Approximate (rows-only check), recall tunable via
  n_planes/n_tables.
- `ann_ivf_knn`: the second scale path, mirroring the reference's FAISS
  IVF configuration (semantic_dedup.py:74-76: index_type=IVF, nlist=100,
  nprobe=10) — spherical k-means coarse quantizer trained on a
  deterministic sample, one cell per corpus vector, queries probe their
  `nprobe` nearest cells. The cell groupby is the only shuffle; the
  trained centroid matrix (nlist x dim, tiny) is broadcast via ray.put.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..exactmath import floor_round_np


def _embeddings(sf_dir: str) -> "rd.Dataset":
    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _to_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(ids, float64 matrix) via the zero-copy flattened-values path —
    list<float> columns expose one contiguous child buffer, so the only
    copy is the float32 -> float64 cast (no per-row Python lists)."""
    ids = np.asarray(batch["vec_id"], dtype=np.int64)
    emb_col = batch["embedding"].combine_chunks()
    flat = np.asarray(emb_col.values, dtype=np.float64)
    return ids, flat.reshape(len(ids), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_cosine(sf_dir: str, n_queries: int = 5, k: int = 5) -> pd.DataFrame:
    """Exact top-k cosine neighbors for query vectors vec_id < n_queries.

    Output (q_id, n_id, rank, cosine) with cosine rounded to 6 dp and
    deterministic tie-break by neighbor id.
    """
    qdf = _embeddings(sf_dir).filter(expr=f"vec_id < {n_queries}").to_pandas()
    if qdf.empty:  # empty corpus: no queries, no neighbors
        return _EMPTY_TOPK.copy()
    qdf = qdf.sort_values("vec_id")
    q_ids = qdf["vec_id"].to_numpy(dtype=np.int64)
    q_mat = _normalize(np.asarray(qdf["embedding"].tolist(), dtype=np.float64))
    q_ref = ray.put((q_ids, q_mat))

    def _score(batch: pa.Table) -> pa.Table:
        # per-batch top-k combiner: only k candidates per (batch, query)
        # cross the q_id shuffle, so the exchanged table is O(k *
        # n_batches * n_queries) — not O(corpus * n_queries). Per-batch
        # selection uses the same (cosine desc, n_id asc) order as the
        # final reduce, so the global top-k is preserved exactly.
        qids, qmat = ray.get(q_ref)
        ids, emb = _to_matrix(batch)
        emb = _normalize(emb)
        cos = emb @ qmat.T  # (n_batch, n_queries)
        n, nq = cos.shape
        out_q: list[np.ndarray] = []
        out_n: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        for j in range(nq):
            keep = ids != qids[j]  # self-match excluded BEFORE selection
            cids, ccos = ids[keep], cos[keep, j]
            order = np.lexsort((cids, -ccos))[: min(k, len(cids))]
            out_q.append(np.full(len(order), qids[j], dtype=np.int64))
            out_n.append(cids[order])
            out_c.append(ccos[order])
        return pa.table(
            {
                "q_id": pa.array(np.concatenate(out_q), pa.int64()),
                "n_id": pa.array(np.concatenate(out_n), pa.int64()),
                "cosine": pa.array(np.concatenate(out_c), pa.float64()),
            }
        )

    scored = _embeddings(sf_dir).map_batches(_score, batch_format="pyarrow")

    def _topk(g: pd.DataFrame) -> pa.Table:
        g = g[g["n_id"] != g["q_id"]]
        g = g.sort_values(["cosine", "n_id"], ascending=[False, True], kind="mergesort").head(k)
        return pa.table(
            {
                "q_id": pa.array(g["q_id"].to_numpy(), pa.int64()),
                "n_id": pa.array(g["n_id"].to_numpy(), pa.int64()),
                "rank": pa.array(np.arange(1, len(g) + 1), pa.int64()),
                "cosine": pa.array(floor_round_np(g["cosine"].to_numpy(), 6), pa.float64()),
            }
        )

    out = scored.groupby("q_id").map_groups(_topk, batch_format="pandas").to_pandas()
    return out.sort_values(["q_id", "rank"]).reset_index(drop=True)


def _block_matrix(tb: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(ids, L2-normalized float64 matrix) from a normalized-block table."""
    ids = np.asarray(tb["vec_id"], dtype=np.int64)
    emb_col = tb["embedding"].combine_chunks()
    flat = np.asarray(emb_col.values, dtype=np.float64)
    return ids, flat.reshape(len(ids), -1)


def embedding_dup_pairs(
    sf_dir: str, threshold: float = 0.45, block_rows: int = 8192
) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs (semantic dedup, reference
    semantic_dedup.py cosine-threshold semantics). Output (a_id, b_id,
    cosine) with floor-rounded cosine; exact DuckDB oracle.

    Exact all-pairs is inherently O(n^2) compute, but the *memory* shape
    is distributed: the corpus is normalized and repartitioned into
    blocks that stay in the object store, and a Dataset of (i, j) block
    index pairs fans out — each task pulls exactly its two blocks (no
    full-matrix broadcast, no O(n) state per task). The sub-quadratic
    scale path is the hyperplane-LSH bucketing below (`ann_lsh_knn`).
    """

    def _norm(batch: pa.Table) -> pa.Table:
        ids, emb = _to_matrix(batch)
        emb = _normalize(emb)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(list(emb), pa.list_(pa.float64())),
            }
        )

    n_rows = _embeddings(sf_dir).count()
    if n_rows == 0:  # no vectors, no pairs
        return pd.DataFrame(
            {"a_id": pd.Series([], dtype="int64"),
             "b_id": pd.Series([], dtype="int64"),
             "cosine": pd.Series([], dtype="float64")}
        )
    n_blocks = max(1, -(-n_rows // block_rows))
    blocks = (
        _embeddings(sf_dir)
        .map_batches(_norm, batch_format="pyarrow")
        .repartition(n_blocks)
        .materialize()
        .to_arrow_refs()
    )
    refs = ray.put(blocks)

    def _score(batch: pa.Table) -> pa.Table:
        blks = ray.get(refs)
        rows_a, rows_b, rows_c = [], [], []
        for i, j in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            ids_i, mat_i = _block_matrix(ray.get(blks[i]))
            ids_j, mat_j = _block_matrix(ray.get(blks[j]))
            cos = mat_i @ mat_j.T
            keep = cos >= threshold
            ai, bj = np.nonzero(keep)
            ia, ib = ids_i[ai], ids_j[bj]
            if i == j:
                # diagonal block: strict triangle kills self-pairs and
                # double counting
                tri = ia < ib
                ia, ib, c = ia[tri], ib[tri], cos[ai, bj][tri]
            else:
                # off-diagonal block pair is visited once; emit each pair
                # in canonical (min, max) id order (ids are disjoint)
                c = cos[ai, bj]
                ia, ib = np.minimum(ia, ib), np.maximum(ia, ib)
            rows_a.append(ia)
            rows_b.append(ib)
            rows_c.append(c)
        if not rows_a:
            return pa.table(
                {
                    "a_id": pa.array([], pa.int64()),
                    "b_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "a_id": pa.array(np.concatenate(rows_a), pa.int64()),
                "b_id": pa.array(np.concatenate(rows_b), pa.int64()),
                "cosine": pa.array(
                    floor_round_np(np.concatenate(rows_c)), pa.float64()
                ),
            }
        )

    idx = [{"i": i, "j": j} for i in range(n_blocks) for j in range(i, n_blocks)]
    tasks = rd.from_items(idx).repartition(max(1, len(idx)))
    out = tasks.map_batches(_score, batch_format="pyarrow").to_pandas()
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


def embedding_dup_pairs_ann(
    emb_ds: "rd.Dataset",
    threshold: float = 0.9,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 13,
    bucket_cap: int = 1024,
) -> pd.DataFrame:
    """Scale-safe twin of `embedding_dup_pairs`: hyperplane-LSH buckets
    prefilter the candidate pairs, then each candidate is verified with
    the EXACT cosine — output-identical to the all-pairs scan whenever
    every >=threshold pair collides in at least one table (for the
    high-similarity dedup regime this operator targets, a cosine-0.999
    near-copy misses an 8-plane bucket in all 8 tables with probability
    ~5e-9; the all-pairs `embedding_dup_pairs` remains the oracle and
    the low-threshold fallback).

    Scale shape: ONE bucket-keyed shuffle (n_tables copies of each
    normalized vector ride it, exactly like `ann_lsh_knn`); per-bucket
    pairing is a triangular index + chunked row-wise einsum — the same
    pair always scores from the same two float64 rows, so cross-table
    duplicates are bit-identical and dedup by value is safe. Degenerate
    buckets (everything identical) are truncated at `bucket_cap`
    vectors (deterministic vec_id order); the sf corpora never bind the
    cap (asserted in tests).
    """
    import polars as _pl

    from ..stages.grouped import partitioned_group_map, run_bounds

    empty = pd.DataFrame(
        {
            "a_id": pd.Series([], dtype="int64"),
            "b_id": pd.Series([], dtype="int64"),
            "cosine": pd.Series([], dtype="float64"),
        }
    )
    probe = emb_ds.take(1)
    if not probe:
        return empty
    dim = len(probe[0]["embedding"])
    planes_ref = ray.put(lsh_planes_u(dim, n_planes, n_tables, seed))

    _BUCKET_SCHEMA = pa.schema(
        [
            ("bucket", pa.int64()),
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float64())),
        ]
    )

    def _buckets(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # typed empty for direct callers
            return _BUCKET_SCHEMA.empty_table()
        planes = ray.get(planes_ref)
        ids, emb = _to_matrix(batch)
        emb_u = _quantize_u(emb)
        nemb = _normalize(emb)
        keys = lsh_bucket_keys(emb_u, planes, n_planes, n_tables)
        norm_col = pa.array(list(nemb), pa.list_(pa.float64()))
        return pa.table(
            {
                "bucket": pa.array(keys, pa.int64()),
                "vec_id": pa.array(np.tile(ids, n_tables), pa.int64()),
                "embedding": pa.concat_arrays([norm_col] * n_tables),
            }
        )

    bucketed = emb_ds.map_batches(_buckets, batch_format="pyarrow")

    _PAIR_SCHEMA = pa.schema(
        [
            ("a_id", pa.int64()),
            ("b_id", pa.int64()),
            ("cosine", pa.float64()),
        ]
    )

    def _pairs_part(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:  # typed empty for direct callers
            return _PAIR_SCHEMA.empty_table()
        df = (
            _pl.from_arrow(tb)
            .sort(["bucket", "vec_id"])
            .unique(["bucket", "vec_id"], keep="first", maintain_order=True)
        )
        at = df.to_arrow()
        keys = df["bucket"].to_numpy()
        ids = np.asarray(at["vec_id"], dtype=np.int64)
        flat = np.asarray(at["embedding"].combine_chunks().values, np.float64)
        mat = flat.reshape(len(ids), -1)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        bounds = run_bounds(keys)
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s > bucket_cap:  # deterministic skew truncation
                e = s + bucket_cap
            m = e - s
            if m < 2:
                continue
            bids = ids[s:e]
            bm = mat[s:e]
            iu, ju = np.triu_indices(m, k=1)
            # chunked row-wise dot: bounded gather memory on fat buckets
            for c0 in range(0, len(iu), 65536):
                ic, jc = iu[c0 : c0 + 65536], ju[c0 : c0 + 65536]
                cos = np.einsum("ij,ij->i", bm[ic], bm[jc])
                keep = cos >= threshold
                if keep.any():
                    out_a.append(bids[ic[keep]])
                    out_b.append(bids[jc[keep]])
                    out_c.append(cos[keep])
        if not out_a:
            return _PAIR_SCHEMA.empty_table()
        return pa.table(
            {
                "a_id": pa.array(np.concatenate(out_a), pa.int64()),
                "b_id": pa.array(np.concatenate(out_b), pa.int64()),
                "cosine": pa.array(np.concatenate(out_c), pa.float64()),
            }
        )

    pairs = partitioned_group_map(bucketed, "bucket", _pairs_part, arrow=True)
    out = pairs.to_pandas()  # O(duplicate pairs) — query-sized
    if out.empty:
        return empty
    out = out.drop_duplicates(["a_id", "b_id"])
    out["cosine"] = floor_round_np(out["cosine"].to_numpy())
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


def embedding_dup_pairs_ann_planted(sf_dir: str) -> pd.DataFrame:
    """Driver query for the ANN-prefiltered dup-pair twin: plant a
    deterministic near-copy (components at index % 7 == 0 scaled by
    1.1, cosine ~0.9995 to its source) for every vec_id % 10 == 0, then
    run `embedding_dup_pairs_ann` at threshold 0.9 over original +
    planted rows. The DuckDB oracle derives the SAME planted corpus
    (pure IEEE-double ops, bit-identical on both sides) and scans ALL
    pairs exactly — so the driver check proves the prefiltered engine
    equals all-pairs semantics on an ANN-recallable duplicate
    structure, clearing `embedding_dup_pairs`' O(n^2) design watch."""

    def _plant(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # typed empty for direct callers
            return pa.schema(
                [("vec_id", pa.int64()),
                 ("embedding", pa.list_(pa.float64()))]
            ).empty_table()
        ids, emb = _to_matrix(batch)
        sel = ids % 10 == 0
        pm = emb[sel].copy()
        pm[:, 0::7] *= 1.1
        out_ids = np.concatenate([ids, ids[sel] + 1_000_000])
        out_emb = np.concatenate([emb, pm])
        return pa.table(
            {
                "vec_id": pa.array(out_ids, pa.int64()),
                "embedding": pa.array(
                    list(out_emb), pa.list_(pa.float64())
                ),
            }
        )

    planted = _embeddings(sf_dir).map_batches(_plant, batch_format="pyarrow")
    return embedding_dup_pairs_ann(planted, threshold=0.9)


#: micro-unit quantum for the hyperplane-LSH integer arithmetic
_LSH_Q = 1_000_000


def lsh_planes_u(
    dim: int, n_planes: int = 8, n_tables: int = 8, seed: int = 13
) -> np.ndarray:
    """(n_tables, n_planes, dim) int64 hyperplanes: standard-normal
    draws quantized to micro-units. Shared by the engine and the
    generated DuckDB oracle (which embeds the same integers as
    literals), so bucket membership is EXACT integer arithmetic on both
    sides — no float summation-order dependence anywhere."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    return np.floor(planes * _LSH_Q + 0.5).astype(np.int64)


def _quantize_u(emb: np.ndarray) -> np.ndarray:
    """Micro-unit quantization of raw embedding components — the same
    floor(x * 1e6 + 0.5) the SQL side computes from the parquet floats."""
    return np.floor(emb * _LSH_Q + 0.5).astype(np.int64)


def lsh_bucket_keys(
    emb_u: "np.ndarray", planes: "np.ndarray", n_planes: int, n_tables: int
) -> "np.ndarray":
    """Concatenated per-table bucket keys for quantized embeddings:
    sign bits of exact int64 projections packed into an n_planes-bit
    key, table index mixed into the high bits. Shared by `ann_lsh_knn`
    and `embedding_dup_pairs_ann` (identical arithmetic keeps their
    bucket structure — and the generated SQL oracles — aligned)."""
    keys = []
    for t in range(n_tables):
        proj = emb_u @ planes[t].T  # (n, n_planes) exact int64
        bits = (proj > 0).astype(np.int64)
        key = bits @ (1 << np.arange(n_planes, dtype=np.int64))
        keys.append(key | (t << 32))
    return np.concatenate(keys)


def ivf_centroids_u(dim: int, nlist: int = 100, seed: int = 29) -> np.ndarray:
    """(nlist, dim) int64 fixed coarse-quantizer centroids: standard
    normal draws quantized to micro-units, same discipline as
    `lsh_planes_u`. Used by `ivf_assign_knn`, whose DuckDB oracle embeds
    the same integers as literals — the IVF assign/probe/top-k step is
    then EXACT on both sides; only centroid *training* (spherical
    k-means, `ann_ivf_knn`) stays iterative and rows-only."""
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((nlist, dim))
    return np.floor(cents * _LSH_Q + 0.5).astype(np.int64)


def ann_lsh_knn(
    sf_dir: str,
    n_queries: int = 5,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 13,
) -> pd.DataFrame:
    """Approximate top-k via random-hyperplane LSH bucketing
    (Charikar 2002), in EXACT integer arithmetic: embeddings and planes
    are quantized to 1e-6 micro-units, bucket bits are signs of integer
    dot products, and cosines derive from integer dots and norms
    (float ops limited to one correctly-rounded sqrt/divide pair) — so
    the whole operator is bit-reproducible in the generated DuckDB
    oracle (`__ray_entry__._ann_lsh_sql`), summation order be damned.

    Each of `n_tables` tables hashes a vector to an `n_planes`-bit
    bucket; queries scan only their bucket per table. The bucket
    groupby is the shuffle; per-bucket scoring is a small matmul.
    """
    probe = _embeddings(sf_dir).take(1)
    if not probe:  # empty corpus: no planes to fit, no queries
        return _EMPTY_TOPK.copy()
    dim = len(probe[0]["embedding"])
    planes_u = lsh_planes_u(dim, n_planes, n_tables, seed)
    planes_ref = ray.put(planes_u)

    qdf = _embeddings(sf_dir).filter(expr=f"vec_id < {n_queries}").to_pandas()
    q_ids = qdf["vec_id"].to_numpy(dtype=np.int64)
    q_u = _quantize_u(np.asarray(qdf["embedding"].tolist(), dtype=np.float64))
    q_ref = ray.put((q_ids, q_u))

    def _buckets(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        ids, emb = _to_matrix(batch)
        emb_u = _quantize_u(emb)
        out_key = lsh_bucket_keys(emb_u, pl, n_planes, n_tables)
        return pa.table(
            {
                "bucket": pa.array(out_key, pa.int64()),
                "vec_id": pa.array(np.tile(ids, n_tables), pa.int64()),
                "embedding": pa.concat_arrays(
                    [batch["embedding"].combine_chunks()] * n_tables
                ),
            }
        )

    bucketed = _embeddings(sf_dir).map_batches(_buckets, batch_format="pyarrow")

    def _bucket_scores_part(tb: pa.Table) -> pa.Table:
        # all buckets hashed into this partition in one pass
        # (stages/grouped.py): sort by bucket, slice per run, score only
        # buckets that contain a query vector
        import polars as pl

        from ..stages.grouped import run_bounds

        qids, qmat = ray.get(q_ref)
        qset = set(qids.tolist())
        df = (
            pl.from_arrow(tb)
            .sort(["bucket", "vec_id"])
            .unique(["bucket", "vec_id"], keep="first", maintain_order=True)
        )
        keys = df["bucket"].to_numpy()
        ids = df["vec_id"].to_numpy()
        bounds = run_bounds(keys)
        emb_all: np.ndarray | None = None
        n2_all: np.ndarray | None = None
        rows_q: list[np.ndarray] = []
        rows_n: list[np.ndarray] = []
        rows_c: list[np.ndarray] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            bucket_ids = ids[s:e]
            present = [q for q in bucket_ids if q in qset]
            if not present:
                continue
            if emb_all is None:  # decode + quantize lazily, once
                emb_all = _quantize_u(
                    np.asarray(df["embedding"].to_list(), dtype=np.float64)
                )
                n2_all = (emb_all * emb_all).sum(axis=1)  # exact int64
            emb = emb_all[s:e]
            n2 = n2_all[s:e]
            for q in present:
                qrow = np.where(qids == q)[0][0]
                qv = qmat[qrow]
                qn2 = float((qv * qv).sum())
                # cosine from exact integer dot/norms; the only float
                # ops are one correctly-rounded multiply/sqrt/divide —
                # identical in DuckDB
                dots = (emb @ qv).astype(np.float64)
                cos = dots / np.sqrt(n2.astype(np.float64) * qn2)
                mask = bucket_ids != q
                rows_q.append(np.full(int(mask.sum()), q, dtype=np.int64))
                rows_n.append(bucket_ids[mask])
                rows_c.append(cos[mask])
        if not rows_q:
            return pa.table(
                {
                    "q_id": pa.array([], pa.int64()),
                    "n_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "q_id": pa.array(np.concatenate(rows_q), pa.int64()),
                "n_id": pa.array(np.concatenate(rows_n), pa.int64()),
                "cosine": pa.array(np.concatenate(rows_c), pa.float64()),
            }
        )

    from ..stages.grouped import partitioned_group_map

    scored = partitioned_group_map(bucketed, "bucket", _bucket_scores_part, arrow=True)
    pdf = scored.to_pandas().drop_duplicates(["q_id", "n_id"])
    return _finalize_topk(pdf, k)


#: typed empty (q_id, n_id, rank, cosine) result for empty-corpus paths
_EMPTY_TOPK = pd.DataFrame(
    {
        "q_id": pd.Series([], dtype="int64"),
        "n_id": pd.Series([], dtype="int64"),
        "rank": pd.Series([], dtype="int64"),
        "cosine": pd.Series([], dtype="float64"),
    }
)


def _finalize_topk(pdf: pd.DataFrame, k: int) -> pd.DataFrame:
    """Deterministic (q_id, n_id, rank, cosine) top-k from scored pairs."""
    out = (
        pdf.sort_values(["q_id", "cosine", "n_id"], ascending=[True, False, True])
        .groupby("q_id")
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = out.groupby("q_id").cumcount() + 1
    out["cosine"] = floor_round_np(out["cosine"].to_numpy(), 6)
    return out[["q_id", "n_id", "rank", "cosine"]]


def spherical_kmeans(
    sample: np.ndarray, n_cells: int, iters: int = 10, seed: int = 13
) -> np.ndarray:
    """Deterministic spherical k-means (Lloyd's, cosine assignment).

    The coarse-quantizer training step of an IVF index (what
    `faiss.IndexIVFFlat.train` does for the reference,
    semantic_dedup.py:212-236). Input rows must be L2-normalized;
    returns an (n_cells, dim) L2-normalized centroid matrix. Empty
    cells re-seed from the sample deterministically.
    """
    n = len(sample)
    n_cells = max(1, min(n_cells, n))
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(n, size=n_cells, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(n_cells):
            members = sample[assign == c]
            if len(members) == 0:
                centroids[c] = sample[rng.integers(0, n)]
            else:
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def ann_ivf_knn(
    sf_dir: str,
    n_queries: int = 5,
    k: int = 5,
    nlist: int = 100,
    nprobe: int = 10,
    seed: int = 13,
    train_sample: int = 16384,
) -> pd.DataFrame:
    """Approximate top-k via an IVF coarse quantizer (reference FAISS
    config semantic_dedup.py:74-76: nlist=100, nprobe=10).

    Scale shape: centroids are trained once on a deterministic
    hash-stride sample (driver-side — the quantizer is nlist x dim,
    tiny) and broadcast; every corpus vector is assigned to exactly ONE
    cell (vs n_tables copies in the LSH variant, so the shuffled volume
    is 1x corpus); queries probe their `nprobe` nearest cells. Scoring
    runs inside a partitioned group map over cells — no driver-side
    candidate materialization.
    """
    ds = _embeddings(sf_dir)
    n_rows = ds.count()
    if n_rows == 0:  # empty corpus: no index to train, no queries
        return _EMPTY_TOPK.copy()
    # standard IVF sizing: cap cells at ~sqrt(n) so small corpora are not
    # over-partitioned (reference nlist=100 assumes a large index)
    nlist = max(1, min(nlist, int(np.sqrt(n_rows)) + 1))

    # deterministic training sample: every stride-th vec_id
    stride = max(1, n_rows // train_sample)

    def _stride_filter(batch: pa.Table) -> pa.Table:
        keep = np.asarray(batch["vec_id"], dtype=np.int64) % stride == 0
        return batch.filter(pa.array(keep))

    sample_df = ds.map_batches(_stride_filter, batch_format="pyarrow").to_pandas()
    sample = _normalize(np.asarray(sample_df["embedding"].tolist(), dtype=np.float64))
    centroids = spherical_kmeans(sample, nlist, seed=seed)
    cent_ref = ray.put(centroids)

    qdf = ds.filter(expr=f"vec_id < {n_queries}").to_pandas().sort_values("vec_id")
    q_ids = qdf["vec_id"].to_numpy(dtype=np.int64)
    q_mat = _normalize(np.asarray(qdf["embedding"].tolist(), dtype=np.float64))
    n_probe = min(nprobe, len(centroids))
    # per-query probe cells: nprobe nearest centroids
    q_cells = np.argsort(-(q_mat @ centroids.T), axis=1, kind="stable")[:, :n_probe]
    q_ref = ray.put((q_ids, q_mat, q_cells))

    def _assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        ids, emb = _to_matrix(batch)
        emb_n = _normalize(emb)
        cell = np.argmax(emb_n @ cent.T, axis=1).astype(np.int64)
        return pa.table(
            {
                "cell": pa.array(cell, pa.int64()),
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": batch["embedding"],
            }
        )

    celled = ds.map_batches(_assign, batch_format="pyarrow")

    def _cell_scores_part(tb: pa.Table) -> pa.Table:
        import polars as pl

        from ..stages.grouped import run_bounds

        qids, qmat, qcells = ray.get(q_ref)
        # cell -> row indices of probing queries
        probing: dict[int, list[int]] = {}
        for qi in range(len(qids)):
            for c in qcells[qi]:
                probing.setdefault(int(c), []).append(qi)
        df = pl.from_arrow(tb).sort(["cell", "vec_id"])
        keys = df["cell"].to_numpy()
        ids = df["vec_id"].to_numpy()
        bounds = run_bounds(keys)
        emb_all: np.ndarray | None = None
        rows_q: list[np.ndarray] = []
        rows_n: list[np.ndarray] = []
        rows_c: list[np.ndarray] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            qrows = probing.get(int(keys[s]))
            if not qrows:
                continue
            if emb_all is None:  # decode embeddings lazily, once
                emb_all = _normalize(
                    np.asarray(df["embedding"].to_list(), dtype=np.float64)
                )
            emb = emb_all[s:e]
            bucket_ids = ids[s:e]
            cos = emb @ qmat[qrows].T  # (bucket, n_probing)
            for col, qi in enumerate(qrows):
                mask = bucket_ids != qids[qi]
                rows_q.append(np.full(int(mask.sum()), qids[qi], dtype=np.int64))
                rows_n.append(bucket_ids[mask])
                rows_c.append(cos[mask, col])
        if not rows_q:
            return pa.table(
                {
                    "q_id": pa.array([], pa.int64()),
                    "n_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "q_id": pa.array(np.concatenate(rows_q), pa.int64()),
                "n_id": pa.array(np.concatenate(rows_n), pa.int64()),
                "cosine": pa.array(np.concatenate(rows_c), pa.float64()),
            }
        )

    from ..stages.grouped import partitioned_group_map

    scored = partitioned_group_map(celled, "cell", _cell_scores_part, arrow=True)
    pdf = scored.to_pandas().drop_duplicates(["q_id", "n_id"])
    return _finalize_topk(pdf, k)


def ivf_assign_knn(
    sf_dir: str,
    n_queries: int = 5,
    k: int = 5,
    nlist: int = 100,
    nprobe: int = 10,
    seed: int = 29,
) -> pd.DataFrame:
    """IVF assign + probe + top-k with a FIXED coarse quantizer
    (`ivf_centroids_u`), in exact integer arithmetic.

    The non-iterative 90% of `ann_ivf_knn` (reference FAISS config
    semantic_dedup.py:74-76, nlist=100 / nprobe=10), split out so it can
    be bit-exactly SQL-oracled: given the quantizer, every corpus vector
    is assigned to the cell maximizing the integer inner product (ties:
    lowest cell — a maximum-inner-product quantizer, faiss
    METRIC_INNER_PRODUCT), each query probes its `nprobe` best cells by
    the same rule, and candidates are scored by exact cosine from
    integer dots/norms (float ops limited to one correctly-rounded
    multiply/sqrt/divide, as in `ann_lsh_knn`). Only the k-means
    *training* of `ann_ivf_knn` remains iterative / rows-only.

    Scale shape matches `ann_ivf_knn`: centroids broadcast once
    (`ray.put`), ONE cell per corpus vector (1x shuffle volume), scoring
    inside a partitioned group map over cells.
    """
    probe = _embeddings(sf_dir).take(1)
    if not probe:  # empty corpus
        return _EMPTY_TOPK.copy()
    dim = len(probe[0]["embedding"])
    cent_u = ivf_centroids_u(dim, nlist, seed)
    cent_ref = ray.put(cent_u)

    qdf = (
        _embeddings(sf_dir)
        .filter(expr=f"vec_id < {n_queries}")
        .to_pandas()
        .sort_values("vec_id")
    )
    q_ids = qdf["vec_id"].to_numpy(dtype=np.int64)
    q_u = _quantize_u(np.asarray(qdf["embedding"].tolist(), dtype=np.float64))
    n_probe = min(nprobe, nlist)
    # stable argsort on -dot keeps ascending cell order among ties —
    # the SQL's ORDER BY d DESC, cell
    q_cells = np.argsort(-(q_u @ cent_u.T), axis=1, kind="stable")[:, :n_probe]
    q_ref = ray.put((q_ids, q_u, q_cells))

    def _assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        ids, emb = _to_matrix(batch)
        emb_u = _quantize_u(emb)
        # argmax returns the FIRST maximum -> lowest cell on ties
        cell = np.argmax(emb_u @ cent.T, axis=1).astype(np.int64)
        return pa.table(
            {
                "cell": pa.array(cell, pa.int64()),
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": batch["embedding"],
            }
        )

    celled = _embeddings(sf_dir).map_batches(_assign, batch_format="pyarrow")

    def _cell_scores_part(tb: pa.Table) -> pa.Table:
        import polars as pl

        from ..stages.grouped import run_bounds

        qids, qmat_u, qcells = ray.get(q_ref)
        probing: dict[int, list[int]] = {}
        for qi in range(len(qids)):
            for c in qcells[qi]:
                probing.setdefault(int(c), []).append(qi)
        df = pl.from_arrow(tb).sort(["cell", "vec_id"])
        keys = df["cell"].to_numpy()
        ids = df["vec_id"].to_numpy()
        bounds = run_bounds(keys)
        emb_all: np.ndarray | None = None
        n2_all: np.ndarray | None = None
        rows_q: list[np.ndarray] = []
        rows_n: list[np.ndarray] = []
        rows_c: list[np.ndarray] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            qrows = probing.get(int(keys[s]))
            if not qrows:
                continue
            if emb_all is None:  # decode + quantize lazily, once
                emb_all = _quantize_u(
                    np.asarray(df["embedding"].to_list(), dtype=np.float64)
                )
                n2_all = (emb_all * emb_all).sum(axis=1)  # exact int64
            emb = emb_all[s:e]
            n2 = n2_all[s:e]
            bucket_ids = ids[s:e]
            for qi in qrows:
                qv = qmat_u[qi]
                qn2 = float((qv * qv).sum())
                dots = (emb @ qv).astype(np.float64)
                cos = dots / np.sqrt(n2.astype(np.float64) * qn2)
                mask = bucket_ids != qids[qi]
                rows_q.append(
                    np.full(int(mask.sum()), qids[qi], dtype=np.int64)
                )
                rows_n.append(bucket_ids[mask])
                rows_c.append(cos[mask])
        if not rows_q:
            return pa.table(
                {
                    "q_id": pa.array([], pa.int64()),
                    "n_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "q_id": pa.array(np.concatenate(rows_q), pa.int64()),
                "n_id": pa.array(np.concatenate(rows_n), pa.int64()),
                "cosine": pa.array(np.concatenate(rows_c), pa.float64()),
            }
        )

    from ..stages.grouped import partitioned_group_map

    scored = partitioned_group_map(celled, "cell", _cell_scores_part, arrow=True)
    pdf = scored.to_pandas()  # one cell per vector -> (q, n) already unique
    return _finalize_topk(pdf, k)


def label_scatter(sf_dir: str) -> "rd.Dataset":
    """Within-cluster scatter: per label, the mean squared distance of
    its vectors to the label centroid — the compactness diagnostic
    behind k-means quality and semantic-dedup threshold tuning.
    Output: (label, n_vecs, mean_sq_dist).

    Exactness across engines: centroids are the floor-rounded means of
    `label_centroids` (bit-equal to the oracle by construction); each
    squared per-dimension term is then quantized to integer micro-units
    so the per-vector and per-label sums are order-independent.

    Scale shape: the centroid matrix is labels x dim — k-means-sized,
    broadcast once via `ray.put` (the standard small-side pattern; a
    10^6-label model at dim 64 is ~500 MB and would switch to the
    partitioned attach). Distances are one vectorized numpy pass per
    batch; the final reduce is a labels-sized groupby.
    """
    from ray.data.aggregate import Count, Sum

    from ..exactmath import floor_round_np

    cent = label_centroids(sf_dir).to_pandas()
    if cent.empty:  # no vectors -> no clusters to measure
        return pd.DataFrame(
            {"label": pd.Series([], dtype="int64"),
             "n_vecs": pd.Series([], dtype="int64"),
             "mean_sq_dist": pd.Series([], dtype="float64")}
        )
    dim = int(cent["dim"].max()) + 1
    mats: dict[int, np.ndarray] = {}
    for lab, g in cent.groupby("label"):
        m = np.zeros(dim, dtype=np.float64)
        m[g["dim"].to_numpy()] = g["mean_val"].to_numpy()
        mats[int(lab)] = m
    cent_ref = ray.put(mats)

    def _dist(batch: pa.Table) -> pa.Table:
        lut = ray.get(cent_ref)
        labels = np.asarray(batch["label"], dtype=np.int64)
        emb_col = batch["embedding"].combine_chunks()
        emb = np.asarray(emb_col.values, dtype=np.float64).reshape(
            batch.num_rows, -1
        )
        cmat = np.stack([lut[int(lb)] for lb in labels])
        diff = emb - cmat
        term_u = np.floor(diff * diff * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(labels, pa.int64()),
                "d2_u": pa.array(term_u.sum(axis=1), pa.int64()),
            }
        )

    agg = (
        _embeddings(sf_dir)
        .map_batches(_dist, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Count(alias_name="n_vecs"), Sum("d2_u", alias_name="s"))
    )

    def _mean(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["s"], dtype=np.float64)
        n = np.asarray(batch["n_vecs"], dtype=np.float64)
        out = batch.drop_columns(["s"])
        return out.append_column(
            "mean_sq_dist",
            pa.array(floor_round_np(s / 1e6 / np.maximum(n, 1), 6), pa.float64()),
        )

    return agg.map_batches(_mean, batch_format="pyarrow")


def label_centroids(sf_dir: str) -> "rd.Dataset":
    """Per-label embedding centroids as (label, dim, mean_val) rows —
    the vector aggregate behind k-means/IVF training and class
    prototypes, with the combiner pattern aggregates need at scale.

    Each batch pre-reduces to ONE partial row per (label, dim): vector
    components are quantized to exact integer micro-units (order-
    independent sums, see relational._micros) and summed per label with
    numpy, so the shuffle carries O(labels x dim x n_batches) tiny rows
    instead of every embedding. A labels x dim groupby-sum then derives
    mean = sum_u / 1e6 / n, floor-rounded to 6 dp in lockstep with the
    DuckDB oracle.
    """
    from ray.data.aggregate import Sum

    from ..exactmath import floor_round_np

    def _partials(batch: pa.Table) -> pa.Table:
        labels = np.asarray(batch["label"], dtype=np.int64)
        emb_col = batch["embedding"].combine_chunks()
        emb = np.asarray(emb_col.values, dtype=np.float64).reshape(
            batch.num_rows, -1
        )
        emb_u = np.floor(emb * 1e6 + 0.5).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        n_lab, dim = len(uniq), emb_u.shape[1]
        sums = np.zeros((n_lab, dim), dtype=np.int64)
        np.add.at(sums, inv, emb_u)
        counts = np.bincount(inv, minlength=n_lab).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, dim), pa.int64()),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), n_lab)),
                "sum_u": pa.array(sums.reshape(-1), pa.int64()),
                "n": pa.array(np.repeat(counts, dim), pa.int64()),
            }
        )

    agg = (
        _embeddings(sf_dir)
        .map_batches(_partials, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("sum_u", alias_name="s"), Sum("n", alias_name="n"))
    )

    def _mean(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["s"], dtype=np.float64)
        n = np.asarray(batch["n"], dtype=np.float64)
        return pa.table(
            {
                "label": batch["label"],
                "dim": batch["dim"],
                "mean_val": pa.array(
                    floor_round_np(s / 1e6 / np.maximum(n, 1), 6), pa.float64()
                ),
            }
        )

    return agg.map_batches(_mean, batch_format="pyarrow")


def quantize_embeddings(sf_dir: str) -> "rd.Dataset":
    """Per-vector int8 scalar quantization stats — the compression pass
    a 100 TB embedding corpus runs before shipping vectors through a
    shuffle (4x smaller blocks): scale = max|v| / 127,
    q_i = clip(floor(v_i/scale + 0.5), -127, 127), and the
    reconstruction MSE. One stateless vectorized map_batches, no
    shuffle; squared errors are floored to 1e-12 integer units before
    the per-vector sum so the reduction is exact against the oracle.

    Output (vec_id, dim, scale, mse), floats floor-rounded to 9 dp.
    """

    def _q(batch: pa.Table) -> pa.Table:
        ids, v = _to_matrix(batch)
        amax = np.abs(v).max(axis=1)
        scale = amax / 127.0
        sc = scale[:, None]
        q = np.floor(
            np.divide(v, sc, out=np.zeros_like(v), where=sc > 0) + 0.5
        )
        q = np.clip(q, -127.0, 127.0)
        recon = q * sc
        d = v - recon
        tu = np.floor(d * d * 1e12 + 0.5).astype(np.int64).sum(axis=1)
        dim = v.shape[1]
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "dim": pa.array(np.full(len(ids), dim, dtype=np.int64)),
                "scale": pa.array(floor_round_np(scale, 9), pa.float64()),
                "mse": pa.array(
                    floor_round_np(tu / 1e12 / dim, 9), pa.float64()
                ),
            }
        )

    return _embeddings(sf_dir).map_batches(_q, batch_format="pyarrow")


def semdedup_prune(sf_dir: str, threshold: float = 0.35) -> "rd.Dataset":
    """SemDeDup-shaped semantic prune (Abbas et al. 2023, public
    recipe): within each embedding cluster, drop every vector that has
    an earlier (smaller vec_id) neighbor at cosine >= threshold.

    Clusters come from the table's `label` column (when absent, the
    spherical k-means quantizer behind `ann_ivf_knn` produces the same
    assignment). The O(n^2) cosine work is confined to each cluster —
    the whole point of the recipe — and clusters are processed with one
    vectorized numpy pass per hash partition via
    `partitioned_group_map`, never per-cluster Python dispatch.

    Output (vec_id, label, kept_id): the pruned vector, its cluster,
    and the smallest earlier neighbor that keeps it out — an all-integer
    result, so oracle comparison is exact PROVIDED no pair sits within
    float rounding of the threshold (engine computes normalize+GEMM in
    float64, the DuckDB oracle list_cosine_similarity; the two can
    differ by ~1 ulp). The driver fixtures keep a wide margin — min
    |cos - 0.35| is ~4.8e-4 at sf0.01 — asserted by
    tests/test_ops.py::TestSemDedupMargin so a testdata change surfaces
    as a test failure, not a silent oracle flake.
    """
    from ..stages.grouped import partitioned_group_map

    def _part(tb: pa.Table) -> pa.Table:
        labels = np.asarray(tb["label"], dtype=np.int64)
        ids, emb = _to_matrix(tb)
        out_vec, out_lab, out_kept = [], [], []
        for lab in np.unique(labels):
            sel = labels == lab
            lids = ids[sel]
            order = np.argsort(lids, kind="stable")
            lids = lids[order]
            m = _normalize(emb[sel][order])
            cos = m @ m.T
            # earlier neighbor: strictly lower triangle, at/above threshold
            hit = np.tril(cos >= threshold, k=-1)
            has = hit.any(axis=1)
            if not has.any():
                continue
            kept = np.where(hit[has], lids[None, :], np.iinfo(np.int64).max).min(
                axis=1
            )
            out_vec.append(lids[has])
            out_lab.append(np.full(int(has.sum()), lab, dtype=np.int64))
            out_kept.append(kept)
        if not out_vec:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                    "kept_id": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "vec_id": pa.array(np.concatenate(out_vec), pa.int64()),
                "label": pa.array(np.concatenate(out_lab), pa.int64()),
                "kept_id": pa.array(np.concatenate(out_kept), pa.int64()),
            }
        )

    return partitioned_group_map(_embeddings(sf_dir), "label", _part, arrow=True)


def embedding_top_component(
    sf_dir: str, n_iter: int = 8
) -> pd.DataFrame:
    """Top principal direction of the (uncentered) embedding second-moment
    matrix via distributed power iteration — the iterative numerical
    class beyond BSP label propagation: v <- normalize(sum_i x_i (x_i . v)).

    Each iteration is one map_batches pass: every row's contribution
    vector x_i (x_i . v) is quantized to 1e-9 integer units BEFORE any
    summation, and all sums over quantized rows are exact int64 adds
    (order-independent). Quantizing per row — not per batch — makes the
    result bit-deterministic across block layouts, batch sizes AND CPU
    counts (a per-batch quantize would still depend on which rows share
    a batch); renormalization is O(dim) driver work. Deterministic
    init: v0 = e_0.
    No SQL oracle (iterative, not relational); pytest checks against a
    serial numpy replica and the dominant-eigenvector property.

    Output: (dim, component) rows, the unit vector with component[0]
    sign-normalized to >= 0."""
    ds = _embeddings(sf_dir).materialize()
    probe = ds.take(1)
    if not probe:  # empty corpus: no direction to report
        return pd.DataFrame({"dim": pd.array([], dtype="int64"),
                             "component": pd.array([], dtype="float64")})
    dim = len(probe[0]["embedding"])
    v = np.zeros(dim, dtype=np.float64)
    v[0] = 1.0

    for _ in range(n_iter):
        v_ref = ray.put(v)

        def _partial(batch: pa.Table) -> pa.Table:
            vv = ray.get(v_ref)
            _, emb = _to_matrix(batch)
            # per-ROW quantization before the sum: each row's x_i(x_i.v)
            # depends only on that row and v, so the int64 partial is
            # independent of batch boundaries and block layout
            w = emb @ vv
            q = np.floor(emb * w[:, None] * 1e9 + 0.5).astype(np.int64)
            qsum = q.sum(axis=0)
            return pa.table({"j": pa.array(np.arange(len(qsum), dtype=np.int64)),
                             "u": pa.array(qsum, pa.int64())})

        parts = (
            ds.map_batches(_partial, batch_format="pyarrow")
            .groupby("j")
            .sum("u")
            .to_pandas()
            .sort_values("j")
        )
        s = parts["sum(u)"].to_numpy().astype(np.float64) / 1e9
        norm = float(np.linalg.norm(s))
        if norm == 0:
            break
        v = s / norm
        # sign convention: first nonzero coordinate positive
        nz = np.nonzero(np.abs(v) > 1e-12)[0]
        if len(nz) and v[nz[0]] < 0:
            v = -v

    return pd.DataFrame(
        {"dim": np.arange(dim, dtype=np.int64), "component": v}
    )


def ann_recall_eval(
    sf_dir: str, n_queries: int = 5, k: int = 5
) -> pd.DataFrame:
    """Recall@k of the hyperplane-LSH ANN against the exact cosine
    top-k — the index-quality evaluation the reference runs informally
    when tuning its FAISS config (deduplicator/semantic_dedup.py IVF
    nlist/nprobe); here it is a first-class operator so index-parameter
    changes are regression-tested, not eyeballed.

    Both inputs are top-k result tables (n_queries x k rows — bounded
    by construction, never corpus-sized), so the set intersection runs
    on the driver. Output (q_id, n_exact, n_hit, recall) with recall
    floor-rounded to 6 dp, one row per query that has exact
    neighbors."""
    ex = knn_cosine(sf_dir, n_queries=n_queries, k=k)
    ap = ann_lsh_knn(sf_dir, n_queries=n_queries, k=k)
    if ex.empty:
        return pd.DataFrame(
            {
                "q_id": pd.Series([], dtype="int64"),
                "n_exact": pd.Series([], dtype="int64"),
                "n_hit": pd.Series([], dtype="int64"),
                "recall": pd.Series([], dtype="float64"),
            }
        )
    n_exact = ex.groupby("q_id").size()
    hits = ex.merge(ap[["q_id", "n_id"]], on=["q_id", "n_id"])
    n_hit = hits.groupby("q_id").size()
    out = pd.DataFrame(
        {
            "q_id": n_exact.index.to_numpy(dtype=np.int64),
            "n_exact": n_exact.to_numpy(dtype=np.int64),
            "n_hit": n_hit.reindex(n_exact.index, fill_value=0).to_numpy(
                dtype=np.int64
            ),
        }
    )
    out["recall"] = floor_round_np(
        out["n_hit"].to_numpy(dtype=np.float64)
        / out["n_exact"].to_numpy(dtype=np.float64),
        6,
    )
    return out.sort_values("q_id").reset_index(drop=True)


_RP_SIGN_CACHE: dict = {}


def _rp_signs(dim: int, k: int) -> np.ndarray:
    """Deterministic ±1 sign matrix (dim x k): sign(d, j) = +1 iff the
    first hex nibble of md5(f"{d}:{j}") is even — reproducible in
    DuckDB as CAST('0x' || substring(md5(d || ':' || j), 1, 1) AS INT) % 2."""
    key = (dim, k)
    if key not in _RP_SIGN_CACHE:
        import hashlib

        s = np.empty((dim, k), dtype=np.int64)
        for d in range(dim):
            for j in range(k):
                nib = int(hashlib.md5(f"{d}:{j}".encode()).hexdigest()[0], 16)
                s[d, j] = 1 if nib % 2 == 0 else -1
        _RP_SIGN_CACHE[key] = s
    return _RP_SIGN_CACHE[key]


def random_projection_embeddings(sf_dir: str, k: int = 8) -> "rd.Dataset":
    """Johnson–Lindenstrauss sign projection (Achlioptas 2003, JCSS
    66(4) — the database-friendly ±1 variant): project each embedding
    to `k` dimensions with a deterministic md5-derived sign matrix.
    The dimensionality-reduction pass a 100 TB pipeline runs before
    brute-force candidate scoring or index build; distance distortion
    is bounded by the JL lemma while the projected table is dim/k times
    smaller on the wire.

    Exactness: components are micro-unit quantized BEFORE the matmul
    (floor(x*1e6+0.5), the ann_lsh convention) and the projection is an
    int64 matmul, so (vec_id, p0..p{k-1}) is bit-exact against the
    DuckDB twin that recomputes the same signs from md5. Stateless
    map_batches; the sign matrix is a module-level cache, built once
    per worker."""

    def _proj(batch: pa.Table) -> pa.Table:
        ids, emb = _to_matrix(batch)
        xm = _quantize_u(emb)
        s = _rp_signs(xm.shape[1], k)
        p = xm @ s
        cols: dict = {"vec_id": pa.array(ids, pa.int64())}
        for j in range(k):
            cols[f"p{j}"] = pa.array(p[:, j], pa.int64())
        return pa.table(cols)

    return _embeddings(sf_dir).map_batches(_proj, batch_format="pyarrow")


def random_projection_oracle_sql(k: int = 8) -> str:
    """DuckDB twin of `random_projection_embeddings`."""
    sign = (
        "CASE WHEN CAST(('0x' || substring(md5(CAST(di - 1 AS VARCHAR) "
        "|| ':' || '{j}'), 1, 1)) AS INTEGER) % 2 = 0 THEN 1 ELSE -1 END"
    )
    cols = ",\n               ".join(
        f"CAST(SUM(xm * {sign.format(j=j)}) AS BIGINT) AS p{j}"
        for j in range(k)
    )
    return f"""
        WITH e AS (
            SELECT vec_id, di,
                   CAST(floor(CAST(embedding[di] AS DOUBLE) * 1000000 + 0.5)
                        AS BIGINT) AS xm
            FROM (
                SELECT vec_id, embedding,
                       unnest(range(1, len(embedding) + 1)) AS di
                FROM embeddings
            )
        )
        SELECT vec_id,
               {cols}
        FROM e GROUP BY vec_id
    """


MMR_N, MMR_K = 50, 10
MMR_LAMBDA_NUM, MMR_LAMBDA_DEN = 7, 10  # lambda = 0.7


def mmr_rerank_docs(sf_dir: str, n_cand: int = MMR_N, k: int = MMR_K) -> pd.DataFrame:
    """MMR diverse re-ranking (Carbonell & Goldstein, SIGIR 1998): from
    the semantic top-`n_cand` for the vec_id=0 query, greedily pick `k`
    results maximizing 7*rel - 3*max_sim_to_selected (lambda=0.7 kept
    as integers; constant factor 10 dropped — ordering unchanged). The
    de-duplicating re-rank step a retrieval pipeline runs so the
    context window isn't filled with near-identical passages.

    Exactness: relevance and pairwise cosines are floored to 1e-6
    micro-units before ANY comparison, so the greedy trace is integer
    -deterministic and the oracle (an unrolled 10-step CTE chain over
    the same candidate set) reproduces it bit-for-bit — PROVIDED no
    cosine sits within float rounding of a micro boundary, the same
    caveat (and margin headroom on the driver fixtures) as
    `semdedup_prune`.

    Scale shape: candidate selection is the distributed per-batch
    top-N combiner; everything after runs on the n_cand x n_cand
    candidate matrix — 50 vectors — which is driver-trivial by
    construction (a re-ranker operates on a candidate page, not the
    corpus).

    Output (rank, doc_id, rel_micro, obj_micro), rank 1..k.
    """
    out_cols = ["rank", "doc_id", "rel_micro", "obj_micro"]
    emb = _embeddings(sf_dir)
    qdf = emb.filter(expr="vec_id == 0").to_pandas()
    if qdf.empty:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in out_cols})
    qv = _normalize(np.asarray([qdf["embedding"].iloc[0]], dtype=np.float64))[0]
    q_ref = ray.put(qv)

    def _score(batch: pa.Table) -> pa.Table:
        import polars as pl

        qv = ray.get(q_ref)
        ids, m = _to_matrix(batch)
        cos = _normalize(m) @ qv
        rel = np.floor(cos * 1_000_000.0 + 0.5).astype(np.int64)
        out = (
            pl.DataFrame({"doc_id": ids, "rel": rel})
            .sort(["rel", "doc_id"], descending=[True, False])
            .head(n_cand)
        )
        return out.to_arrow().cast(
            pa.schema([("doc_id", pa.int64()), ("rel", pa.int64())])
        )

    cand = (
        emb.map_batches(_score, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["rel", "doc_id"], ascending=[False, True])
        .head(n_cand)
        .reset_index(drop=True)
    )
    cand_ids = cand["doc_id"].astype(int).tolist()
    rels = dict(zip(cand_ids, cand["rel"].astype(int)))

    id_set = set(cand_ids)

    def _gather(batch: pa.Table) -> pa.Table:
        ids, m = _to_matrix(batch)
        keep = np.isin(ids, list(id_set))
        if not keep.any():
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], pa.list_(pa.float64())),
                }
            )
        return pa.table(
            {
                "vec_id": pa.array(ids[keep], pa.int64()),
                "embedding": pa.array(list(m[keep]), pa.list_(pa.float64())),
            }
        )

    got = emb.map_batches(_gather, batch_format="pyarrow").to_pandas()
    mat = _normalize(
        np.asarray(got.sort_values("vec_id")["embedding"].tolist(), dtype=np.float64)
    )
    order_ids = got.sort_values("vec_id")["vec_id"].astype(int).tolist()
    idx = {d: i for i, d in enumerate(order_ids)}
    sim_f = mat @ mat.T
    sim = np.floor(sim_f * 1_000_000.0 + 0.5).astype(np.int64)

    selected: list[tuple[int, int, int, int]] = []
    remaining = set(cand_ids)
    for r in range(1, min(k, len(cand_ids)) + 1):
        best = None
        for d in sorted(remaining):
            ms = (
                max(int(sim[idx[d], idx[s[1]]]) for s in selected)
                if selected
                else 0
            )
            obj = MMR_LAMBDA_NUM * rels[d] - (MMR_LAMBDA_DEN - MMR_LAMBDA_NUM) * ms
            if best is None or obj > best[0]:
                best = (obj, d)
        obj, d = best
        selected.append((r, d, rels[d], obj))
        remaining.discard(d)
    return pd.DataFrame(selected, columns=out_cols).astype("int64")


def mmr_oracle_sql(n_cand: int = MMR_N, k: int = MMR_K) -> str:
    """Unrolled greedy-CTE DuckDB twin of `mmr_rerank_docs`."""
    lam, rest = MMR_LAMBDA_NUM, MMR_LAMBDA_DEN - MMR_LAMBDA_NUM
    parts = [
        """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
                 FROM embeddings WHERE vec_id = 0),""",
        f"""cand AS MATERIALIZED (
            SELECT e.vec_id AS id, CAST(e.embedding AS DOUBLE[]) AS v,
                   CAST(floor(list_cosine_similarity(
                        q.qe, CAST(e.embedding AS DOUBLE[])) * 1000000.0 + 0.5)
                        AS BIGINT) AS rel
            FROM embeddings e, q
            ORDER BY rel DESC, id LIMIT {n_cand}
        ),""",
        """sim AS MATERIALIZED (
            SELECT a.id AS ai, b.id AS bi,
                   CAST(floor(list_cosine_similarity(a.v, b.v) * 1000000.0 + 0.5)
                        AS BIGINT) AS s
            FROM cand a, cand b
        ),""",
        f"""s1 AS MATERIALIZED (
            SELECT id, rel, {lam} * rel AS obj FROM cand
            ORDER BY obj DESC, id LIMIT 1
        ),
        sel1 AS (SELECT id FROM s1),""",
    ]
    for t in range(2, k + 1):
        parts.append(
            f"""p{t} AS (
            SELECT c.id, c.rel, MAX(s.s) AS ms
            FROM cand c
            JOIN sim s ON s.ai = c.id AND s.bi IN (SELECT id FROM sel{t - 1})
            WHERE c.id NOT IN (SELECT id FROM sel{t - 1})
            GROUP BY c.id, c.rel
        ),
        s{t} AS MATERIALIZED (
            SELECT id, rel, {lam} * rel - {rest} * ms AS obj FROM p{t}
            ORDER BY obj DESC, id LIMIT 1
        ),
        sel{t} AS (SELECT id FROM sel{t - 1} UNION ALL SELECT id FROM s{t}),"""
        )
    unions = "\n            UNION ALL ".join(
        f"SELECT {t} AS rank, id AS doc_id, rel AS rel_micro, obj AS obj_micro FROM s{t}"
        for t in range(1, k + 1)
    )
    parts.append(
        f"""fin AS (
            {unions}
        )
        SELECT CAST(rank AS BIGINT) AS rank, doc_id,
               CAST(rel_micro AS BIGINT) AS rel_micro,
               CAST(obj_micro AS BIGINT) AS obj_micro
        FROM fin"""
    )
    return "\n".join(parts)


def label_medoids(sf_dir: str) -> "rd.Dataset":
    """Per-label medoid: the member minimizing the total squared
    euclidean distance to its co-members — the k-medoids assignment /
    "most central real example" selection step (PAM, Kaufman &
    Rousseeuw 1990), here made ALL-INTEGER so the oracle is exact with
    no cosine-boundary caveat: components quantize to 1e6 micro-units
    first, then

        cost(a) = sum_b |a - b|^2 = n*|a|^2 - 2*(a . S) + Q

    with S = sum of member vectors and Q = sum of member squared norms
    — an O(n*dim) identity per label, NO pairwise matrix. Ties break to
    the smallest vec_id. int64 headroom: cost ~ n_label * dim * 1e12,
    safe to ~2.8e5 members/label at dim 32; beyond that drop the
    quantization scale a decade (both sides — it's a shared constant).

    Scale shape: ONE hash partition by label; each partition reduces
    its labels with numpy (quantize, one matmul against the label's sum
    vector). Output (label, medoid_id, cost_u).
    """
    from ..stages.grouped import partitioned_group_map

    out_schema = pa.schema(
        [("label", pa.int64()), ("medoid_id", pa.int64()), ("cost_u", pa.int64())]
    )

    def _part(tb: pa.Table) -> pa.Table:
        import polars as pl

        labels = np.asarray(tb["label"], dtype=np.int64)
        ids, emb = _to_matrix(tb)
        q = np.floor(emb * 1_000_000.0 + 0.5).astype(np.int64)
        rows = []
        for lab in np.unique(labels):
            sel = labels == lab
            a = q[sel]
            lids = ids[sel]
            n = a.shape[0]
            s = a.sum(axis=0)
            normsq = (a * a).sum(axis=1)
            qtot = int(normsq.sum())
            cost = n * normsq - 2 * (a @ s) + qtot
            df = pl.DataFrame({"id": lids, "cost": cost}).sort(["cost", "id"])
            rows.append((int(lab), int(df["id"][0]), int(df["cost"][0])))
        if not rows:
            return out_schema.empty_table()
        return pa.table(
            {
                "label": pa.array([r[0] for r in rows], pa.int64()),
                "medoid_id": pa.array([r[1] for r in rows], pa.int64()),
                "cost_u": pa.array([r[2] for r in rows], pa.int64()),
            }
        )

    return partitioned_group_map(_embeddings(sf_dir), "label", _part, arrow=True)


def medoids_oracle_sql() -> str:
    """DuckDB twin of `label_medoids` (same quantization, same integer
    cost identity, same (cost, vec_id) tie-break)."""
    return """
        WITH e AS MATERIALIZED (
            SELECT vec_id, CAST(label AS BIGINT) AS label, dim,
                   CAST(floor(CAST(embedding[dim] AS DOUBLE) * 1000000.0 + 0.5)
                        AS BIGINT) AS q
            FROM (
                SELECT vec_id, label, embedding,
                       unnest(range(1, len(embedding) + 1)) AS dim
                FROM embeddings
            )
        ),
        sums AS MATERIALIZED (
            SELECT label, dim, CAST(SUM(q) AS BIGINT) AS s
            FROM e GROUP BY label, dim
        ),
        stats AS MATERIALIZED (
            SELECT label,
                   CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n,
                   CAST(SUM(q * q) AS BIGINT) AS qtot
            FROM e GROUP BY label
        ),
        per_vec AS (
            SELECT e.label, e.vec_id,
                   CAST(SUM(e.q * e.q) AS BIGINT) AS normsq,
                   CAST(SUM(e.q * s.s) AS BIGINT) AS dots
            FROM e JOIN sums s ON s.label = e.label AND s.dim = e.dim
            GROUP BY e.label, e.vec_id
        ),
        costs AS (
            SELECT p.label, p.vec_id,
                   st.n * p.normsq - 2 * p.dots + st.qtot AS cost
            FROM per_vec p JOIN stats st ON st.label = p.label
        )
        SELECT label,
               CAST(vec_id AS BIGINT) AS medoid_id,
               CAST(cost AS BIGINT) AS cost_u
        FROM costs
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY label ORDER BY cost, vec_id) = 1
    """
