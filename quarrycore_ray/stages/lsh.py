"""Stage S4 — LSH banding, bucket groupby, candidate-pair generation.

Reference semantics: datasketch `MinHashLSH` with threshold=0.85 /
num_perm=128 over Redis buckets
(`/root/reference/src/quarrycore/dedup/minhash_redis.py:140-155,204-255`;
band/bucket key layout documented at `/root/reference/docs/dedup.md:97-103`).
The shared Redis bucket probe becomes a dataflow shuffle: every
signature explodes into `b` band rows keyed by a 64-bit band-content
hash (band id mixed in), and a `groupby(band_key)` brings co-bucketed
conversations together — the distributed equivalent of "any two docs
sharing a band bucket are candidates".

Skew handling (north-rule "skew-aware bucket splitting"): boilerplate
text creates giant buckets whose naive pair enumeration is O(n^2). A
bucket larger than `bucket_cap` is deterministically split (members
sorted by conv_id) into sub-buckets of at most `bucket_cap` members;
pairs are emitted within sub-buckets plus one chain pair linking
consecutive sub-buckets. Connectivity of genuinely-duplicate buckets is
preserved (components still merge through the chain) while emitted
pairs drop from O(n^2) to O(n * bucket_cap). Dropped-pair counts are
recorded per bucket for lineage.

This stage is the big shuffle (#3). Payload per band row = conv_id +
1 KiB signature + fingerprint; at 10^12-turn scale the band explosion
factor `b` (8 with the default plan) is the dominant shuffle-volume
knob — `num_perm`/plan changes should be weighed against it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..config import DedupConfig
from .minhash_stage import bytes_to_sigs


class BandExplode:
    """signatures -> b LIGHT band rows each: (band_key, conv_id) only.

    Signatures/fingerprints do NOT travel through the band shuffle —
    pair generation needs only identities, and the verification payload
    is joined back afterwards (`attach_signatures`). This cuts the big
    shuffle's volume by the full signature width (~40x lighter rows).
    """

    def __init__(self, config: DedupConfig | None = None):
        self.cfg = config or DedupConfig()
        self.bands, self.rows = self.cfg.band_plan()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..minhash import band_hashes

        n = batch.num_rows
        sigs = bytes_to_sigs(batch["minhash_sig"].to_pylist(), self.cfg.num_perm)
        bh = band_hashes(sigs, self.bands, self.rows)  # (n, bands) uint64
        idx = np.repeat(np.arange(n), self.bands)
        band_key = bh.reshape(-1).view(np.int64)  # row-major: doc0 b0..b7, doc1 ...
        ids = np.asarray(batch["conv_id"].to_pylist(), dtype=object)[idx]
        return pa.table(
            {
                "band_key": pa.array(band_key, pa.int64()),
                "conv_id": pa.array(ids.tolist(), pa.string()),
            }
        )


def _bucket_pair_indices(n: int, bucket_cap: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Local (a, b) index pairs for one bucket of n members, skew-capped.

    n <= cap: full triangle. Else: triangles within cap-sized chunks plus
    redundant chain pairs bridging consecutive chunks (pair count stays
    O(n * cap)); returns dropped-pair count for lineage.

    Bridge robustness: a single chain pair would split a genuinely-
    duplicate component if that one pair failed verification (e.g. a
    mixed boilerplate bucket whose boundary members are not mutual
    duplicates), so each boundary emits up to 4 cross-chunk pairs
    ({last two of chunk i} x {first two of chunk i+1}) — the component
    survives any single failed bridge verification. Connectivity is
    still only guaranteed when the bucket's true duplicate structure
    spans the boundary; a bucket mixing several distinct duplicate
    groups can split them across chunks by construction (the accepted
    cost of the cap, recorded via dropped_pairs lineage).
    """
    if n <= bucket_cap:
        ai, bi = np.triu_indices(n, k=1)
        return ai, bi, 0
    parts_a: list[np.ndarray] = []
    parts_b: list[np.ndarray] = []
    for start in range(0, n, bucket_cap):
        end = min(start + bucket_cap, n)
        ai, bi = np.triu_indices(end - start, k=1)
        parts_a.append(ai + start)
        parts_b.append(bi + start)
        if end < n:
            left = [i for i in (end - 2, end - 1) if i >= start]
            right = [j for j in (end, end + 1) if j < n]
            bridge = [(i, j) for i in left for j in right]
            parts_a.append(np.array([p[0] for p in bridge]))
            parts_b.append(np.array([p[1] for p in bridge]))
    a = np.concatenate(parts_a)
    b = np.concatenate(parts_b)
    return a, b, n * (n - 1) // 2 - len(a)


def make_pair_emitter(bucket_cap: int):
    """Partition-level pair generation: one vectorized pass over all
    buckets hashed into this partition (see stages/grouped.py)."""

    def _emit_pairs(tb: pa.Table) -> pa.Table:
        import polars as pl

        from .grouped import run_bounds

        df = (
            pl.from_arrow(tb)
            .sort(["band_key", "conv_id"])
            .unique(["band_key", "conv_id"], keep="first", maintain_order=True)
        )
        keys = df["band_key"].to_numpy()
        bounds = run_bounds(keys)
        ids = df["conv_id"].to_numpy()
        all_a: list[np.ndarray] = []
        all_b: list[np.ndarray] = []
        sizes: list[np.ndarray] = []
        dropped_col: list[np.ndarray] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            n = int(e - s)
            if n < 2:
                continue
            ai, bi, dropped = _bucket_pair_indices(n, bucket_cap)
            all_a.append(ai + s)
            all_b.append(bi + s)
            sizes.append(np.full(len(ai), n, dtype=np.int64))
            d = np.zeros(len(ai), dtype=np.int64)
            d[0] = dropped
            dropped_col.append(d)
        if not all_a:
            return _EMPTY_PAIRS
        a_idx = np.concatenate(all_a)
        b_idx = np.concatenate(all_b)
        return pa.table(
            {
                "a_id": pa.array(ids[a_idx].tolist(), pa.string()),
                "b_id": pa.array(ids[b_idx].tolist(), pa.string()),
                "bucket_size": pa.array(np.concatenate(sizes)),
                "dropped_pairs": pa.array(np.concatenate(dropped_col)),
            }
        )

    return _emit_pairs


def make_cross_pair_emitter(bucket_cap: int, left_prefix: str = "h|"):
    """Partition-level pair generation for the INCREMENTAL (two-sided)
    case: pairs only span sides — left ids (historical index, prefixed
    `left_prefix`) x right ids (new batch) within a band bucket.
    Side membership rides in the id prefix, so band rows stay as light
    as the self-join path's (band_key, conv_id).

    Skew cap: the historical side of a bucket is truncated to its first
    `bucket_cap` members (sorted ids, deterministic). Unlike the
    self-join emitter no chain links are needed — cross pairs carry no
    connectivity obligation, each new doc just needs >= 1 surviving
    verified match; a true near-dup shares ~all bands with its twin, so
    a cap in one bucket is recovered by the other bands. Dropped-pair
    counts are recorded for lineage as in the self-join path.
    """

    def _emit_pairs(tb: pa.Table) -> pa.Table:
        import polars as pl

        from .grouped import run_bounds

        df = (
            pl.from_arrow(tb)
            .sort(["band_key", "conv_id"])
            .unique(["band_key", "conv_id"], keep="first", maintain_order=True)
        )
        keys = df["band_key"].to_numpy()
        bounds = run_bounds(keys)
        ids = df["conv_id"].to_numpy()
        is_left = np.array(
            [s.startswith(left_prefix) for s in ids], dtype=bool
        )
        all_a: list[np.ndarray] = []
        all_b: list[np.ndarray] = []
        sizes: list[np.ndarray] = []
        dropped_col: list[np.ndarray] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            lmask = is_left[s:e]
            nl = int(lmask.sum())
            nr = int(e - s) - nl
            if nl == 0 or nr == 0:
                continue
            # ids are sorted within the run and left_prefix sorts left
            # ids first, so positions split contiguously at s+nl
            li = np.arange(s, s + min(nl, bucket_cap))
            ri = np.arange(s + nl, e)
            ai = np.repeat(li, len(ri))
            bi = np.tile(ri, len(li))
            all_a.append(ai)
            all_b.append(bi)
            n_pairs = len(ai)
            sizes.append(np.full(n_pairs, e - s, dtype=np.int64))
            d = np.zeros(n_pairs, dtype=np.int64)
            d[0] = max(nl - bucket_cap, 0) * nr
            dropped_col.append(d)
        if not all_a:
            return _EMPTY_PAIRS
        a_idx = np.concatenate(all_a)
        b_idx = np.concatenate(all_b)
        return pa.table(
            {
                "a_id": pa.array(ids[a_idx].tolist(), pa.string()),
                "b_id": pa.array(ids[b_idx].tolist(), pa.string()),
                "bucket_size": pa.array(np.concatenate(sizes)),
                "dropped_pairs": pa.array(np.concatenate(dropped_col)),
            }
        )

    return _emit_pairs


# typed empty result as Arrow (a typed empty pandas frame with object
# columns trips Ray's block-size estimation on zero-length inputs)
_EMPTY_PAIRS = pa.table(
    {
        "a_id": pa.array([], pa.string()),
        "b_id": pa.array([], pa.string()),
        "bucket_size": pa.array([], pa.int64()),
        "dropped_pairs": pa.array([], pa.int64()),
    }
)


def _attach_side(side: str, next_key: str | None):
    """Partition fn: join one side's (sig, fp) onto pair rows by id.

    Input partitions hold a UNION of signature rows (sig non-null) and
    pair rows (sig null) sharing the partition key `_k`; pair rows leave
    with `{side}_sig` / `{side}_fp` attached and re-keyed on `next_key`
    for the following join pass (an explicit partitioned hash join —
    the small pair table rides along with the signature table).
    """

    def _fn(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(tb)
        lut = (
            df.filter(pl.col("sig").is_not_null())
            .select(["_k", "sig", "fp", "thr"])
            .rename({"_k": "_jk", "sig": f"{side}_sig", "fp": f"{side}_fp",
                     "thr": f"{side}_thr"})
        )
        pairs = df.filter(pl.col("sig").is_null()).drop(["sig", "fp", "thr"])
        if side == "a":
            pairs = pairs.sort(["a_id", "b_id", "bucket_size", "dropped_pairs"]).unique(
                ["a_id", "b_id"], keep="first", maintain_order=True
            )
        if pairs.height == 0:
            return _EMPTY_ATTACH[side]
        joined = pairs.join(lut, left_on="_k", right_on="_jk", how="left").drop(["_k"])
        cols = ["a_id", "b_id", "bucket_size", "dropped_pairs",
                f"{side}_sig", f"{side}_fp", f"{side}_thr"]
        if side == "b":
            cols += ["a_sig", "a_fp", "a_thr"]
        out = joined.select(cols).to_arrow()
        return out.cast(_EMPTY_ATTACH[side].schema)

    return _fn


_EMPTY_ATTACH = {
    "a": pa.table(
        {
            "a_id": pa.array([], pa.string()),
            "b_id": pa.array([], pa.string()),
            "bucket_size": pa.array([], pa.int64()),
            "dropped_pairs": pa.array([], pa.int64()),
            "a_sig": pa.array([], pa.binary()),
            "a_fp": pa.array([], pa.int64()),
            "a_thr": pa.array([], pa.float64()),
        }
    ),
    "b": pa.table(
        {
            "a_id": pa.array([], pa.string()),
            "b_id": pa.array([], pa.string()),
            "bucket_size": pa.array([], pa.int64()),
            "dropped_pairs": pa.array([], pa.int64()),
            "b_sig": pa.array([], pa.binary()),
            "b_fp": pa.array([], pa.int64()),
            "b_thr": pa.array([], pa.float64()),
            "a_sig": pa.array([], pa.binary()),
            "a_fp": pa.array([], pa.int64()),
            "a_thr": pa.array([], pa.float64()),
        }
    ),
}


def attach_signatures(
    pairs: "ray.data.Dataset",
    sigs: "ray.data.Dataset",
    num_partitions: int | None = None,
    staged: bool = False,
) -> "ray.data.Dataset":
    """Join (minhash_sig, simhash) onto pair rows for both endpoints.

    Two partitioned hash-join passes keyed on a_id then b_id. Shuffle
    volume = 2x the signature table + the (small) pair table, instead of
    b copies of every signature through the band shuffle.

    ``staged=True`` materializes the a-side pass before building the
    b-side union, halving the number of CONCURRENT operators the
    streaming executor budgets for. Ray 2.49's reservation-based
    backpressure divides the object store across every operator of a
    DAG; a probe pipeline that unions several parquet re-reads with two
    chained all-to-all passes can drop per-operator budgets below a
    single signature block under a deliberately small store and
    livelock (observed at 3 GiB x 30 operators in the 10x incremental
    smoke). Staging trades one spillable barrier for that failure mode;
    use it when the attach sits inside an already-wide DAG.
    """
    from .grouped import partitioned_group_map

    def _sig_rows(key_from: str):
        def _f(batch: pa.Table) -> pa.Table:
            cols = {
                "_k": batch["conv_id"],
                "sig": batch["minhash_sig"],
                "fp": batch["simhash"],
                "thr": batch["thr"],
                "a_id": pa.array([None] * batch.num_rows, pa.string()),
                "b_id": pa.array([None] * batch.num_rows, pa.string()),
                "bucket_size": pa.array([0] * batch.num_rows, pa.int64()),
                "dropped_pairs": pa.array([0] * batch.num_rows, pa.int64()),
            }
            if key_from == "b":
                cols["a_sig"] = pa.array([None] * batch.num_rows, pa.binary())
                cols["a_fp"] = pa.array([0] * batch.num_rows, pa.int64())
                cols["a_thr"] = pa.array([0.0] * batch.num_rows, pa.float64())
            return pa.table(cols)

        return _f

    def _pair_rows_a(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_k": batch["a_id"],
                "sig": pa.array([None] * batch.num_rows, pa.binary()),
                "fp": pa.array([0] * batch.num_rows, pa.int64()),
                "thr": pa.array([0.0] * batch.num_rows, pa.float64()),
                "a_id": batch["a_id"],
                "b_id": batch["b_id"],
                "bucket_size": batch["bucket_size"],
                "dropped_pairs": batch["dropped_pairs"],
            }
        )

    def _pair_rows_b(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_k": batch["b_id"],
                "sig": pa.array([None] * batch.num_rows, pa.binary()),
                "fp": pa.array([0] * batch.num_rows, pa.int64()),
                "thr": pa.array([0.0] * batch.num_rows, pa.float64()),
                "a_id": batch["a_id"],
                "b_id": batch["b_id"],
                "bucket_size": batch["bucket_size"],
                "dropped_pairs": batch["dropped_pairs"],
                "a_sig": batch["a_sig"],
                "a_fp": batch["a_fp"],
                "a_thr": batch["a_thr"],
            }
        )

    union_a = pairs.map_batches(_pair_rows_a, batch_format="pyarrow").union(
        sigs.map_batches(_sig_rows("a"), batch_format="pyarrow")
    )
    with_a = partitioned_group_map(
        union_a, "_k", _attach_side("a", "b_id"), num_partitions, arrow=True
    )
    if staged:
        with_a = with_a.materialize()

    union_b = with_a.map_batches(_pair_rows_b, batch_format="pyarrow").union(
        sigs.map_batches(_sig_rows("b"), batch_format="pyarrow")
    )
    return partitioned_group_map(
        union_b, "_k", _attach_side("b", None), num_partitions, arrow=True
    )


def _dedup_pairs_partition(tb: pa.Table) -> pa.Table:
    """Global (a_id, b_id) dedup: one vectorized pass per a_id-keyed
    partition. The same pair is emitted once per matching LSH band, and
    band keys hash to different partitions — so a dedicated pass keyed
    on a_id (all copies of a pair colocate) is required before the
    broadcast attach; the join attach dedups in its own a_id pass. Sort
    covers every column so keep-first is deterministic.
    """
    import polars as pl

    df = pl.from_arrow(tb)
    return (
        df.sort(["a_id", "b_id", "bucket_size", "dropped_pairs"])
        .unique(["a_id", "b_id"], keep="first", maintain_order=True)
        .to_arrow()
        .cast(_EMPTY_PAIRS.schema)
    )


def _concat_sig_blocks(blocks) -> pa.Table:
    """Task body: assemble the broadcast signature table from Dataset
    block refs INSIDE a Ray task, so the driver never holds the payload
    (it only forwards refs). Output is one combined Arrow table in the
    object store, read zero-copy by every attach actor."""
    import ray as _ray

    tables = _ray.get(list(blocks))
    tb = pa.concat_tables(
        [t.select(["conv_id", "minhash_sig", "simhash", "thr"]) for t in tables]
    )
    return tb.combine_chunks()


class _BroadcastAttach:
    """Actor-pool attach stage: the shared signature table stays one
    zero-copy Arrow object; each actor keeps a (conv_id, row-index)
    polars frame built ONCE in __init__ — zero-copy from the Arrow id
    column, ints only; the ~1 KiB signature payloads never leave the
    Arrow buffers — and resolves pair ids to row indices per batch with
    two vectorized joins, then gathers rows with `Table.take`."""

    def __init__(self, sig_ref):
        import polars as pl

        import ray as _ray

        self.tbl = _ray.get(sig_ref)
        self.lut = pl.from_arrow(
            self.tbl.select(["conv_id"])
        ).with_row_index("_ri")

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import polars as pl

        df = pl.from_arrow(batch)
        df = df.sort(["a_id", "b_id"]).unique(
            ["a_id", "b_id"], keep="first", maintain_order=True
        )
        out = df.to_arrow().cast(_EMPTY_PAIRS.schema)
        # row-index sort pins the joined indices back to df order
        # (polars left joins don't guarantee it)
        j = (
            df.select(["a_id", "b_id"])
            .with_row_index("_i")
            .join(
                self.lut.rename({"conv_id": "a_id", "_ri": "_ai"}),
                on="a_id", how="left",
            )
            .join(
                self.lut.rename({"conv_id": "b_id", "_ri": "_bi"}),
                on="b_id", how="left",
            )
            .sort("_i")
        )
        # a pair id absent from the signature table joins to null, and
        # null -> to_numpy() NaN -> astype(int64) is an undefined index
        # that fails much later inside Table.take — fail HERE with the
        # offending ids instead (parity with the old dict KeyError)
        if j["_ai"].null_count() or j["_bi"].null_count():
            missing = (
                j.filter(
                    pl.col("_ai").is_null() | pl.col("_bi").is_null()
                )
                .select(["a_id", "b_id"])
                .head(5)
                .rows()
            )
            raise KeyError(
                "pair ids missing from the broadcast signature table: "
                f"{missing}"
            )
        ai = pa.array(j["_ai"].to_numpy().astype(np.int64))
        bi = pa.array(j["_bi"].to_numpy().astype(np.int64))
        rows_a = self.tbl.take(ai)
        rows_b = self.tbl.take(bi)
        out = out.append_column("a_sig", rows_a["minhash_sig"])
        out = out.append_column("b_sig", rows_b["minhash_sig"])
        out = out.append_column("a_fp", rows_a["simhash"])
        out = out.append_column("b_fp", rows_b["simhash"])
        out = out.append_column("a_thr", rows_a["thr"])
        return out.append_column("b_thr", rows_b["thr"])


def attach_signatures_broadcast(
    pairs: "ray.data.Dataset", sigs: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """Small-side variant: broadcast the signature table once and attach
    per batch — no shuffle. Used when the distinct-text table fits
    comfortably in the object store (the guide's broadcast-join
    pattern); `attach_signatures` is the at-scale partitioned join.

    The broadcast object is the Arrow table itself, assembled inside a
    Ray task from the Dataset's block refs — the driver's footprint is
    O(#blocks) refs, flat across the broadcast<->join switch point
    (previously a driver-side dict of per-row Python tuples, ~1.3 GB
    of driver heap at the size cutover). Callers must globally dedup
    pairs first (`_dedup_pairs_partition` via candidate_pairs) — the
    per-batch unique below only tidies within-block duplicates.
    """
    import ray as _ray

    from ..config import fixed_probe_pool

    build = _ray.remote(num_cpus=1)(_concat_sig_blocks)
    sig_ref = build.remote(sigs.to_arrow_refs())

    return pairs.map_batches(
        _BroadcastAttach,
        fn_constructor_kwargs={"sig_ref": sig_ref},
        batch_format="pyarrow",
        # pre-started fixed pool (autoscaling ramps one actor at a
        # time; config.sig_pool_size rationale). Each actor holds one
        # zero-copy view of the broadcast table, so pool size costs no
        # extra payload memory; frac=0.25 reaches the old autoscale
        # ceiling of 8 actors on the 32-CPU reference box.
        concurrency=fixed_probe_pool(frac=0.25, hi=8),
    )


# above this signature-table footprint the sig table stops being a
# "small side" and verification payloads move via partitioned joins.
# Byte-based: what actually matters is whether one copy fits in a
# worker heap + the object store, not the row count (signature rows
# are ~1.1 KiB: 1024 B sig + id + fp + thr).
BROADCAST_SIG_BYTES = 1_500_000_000


def candidate_pairs(
    with_sigs: "ray.data.Dataset",
    config: DedupConfig | None = None,
    num_partitions: int | None = None,
    lineage: bool = False,
    attach_strategy: str = "auto",
) -> "ray.data.Dataset":
    """signatures dataset -> candidate pair dataset (the LSH shuffle).

    `attach_strategy`: "broadcast" (small sig table, no extra shuffle),
    "join" (partitioned hash join, any scale), or "auto" (broadcast
    below BROADCAST_SIG_BYTES of signature payload).
    """
    from .grouped import partitioned_group_map

    cfg = config or DedupConfig()
    # multiple consumers (band explode + attach) — materialize once.
    # `thr` (per-row verification threshold, from a domain column
    # upstream — config.domain_minhash_thresholds) is synthesized at the
    # global default when absent so the attach schemas stay uniform.
    with_sigs = with_sigs.materialize()
    if "thr" not in with_sigs.schema().names:
        def _default_thr(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "thr", pa.array([cfg.threshold] * batch.num_rows, pa.float64())
            )

        with_sigs = with_sigs.map_batches(
            _default_thr, batch_format="pyarrow"
        ).materialize()
    banded = with_sigs.select_columns(["conv_id", "minhash_sig"]).map_batches(
        BandExplode(cfg), batch_format="pyarrow", batch_size=cfg.batch_size
    )
    pair_refs = partitioned_group_map(
        banded, "band_key", make_pair_emitter(cfg.bucket_cap), num_partitions,
        lineage_stage="lsh_pairs" if lineage else None, arrow=True,
    )
    if attach_strategy == "auto":
        size = with_sigs.size_bytes() or 0
        attach_strategy = "broadcast" if size <= BROADCAST_SIG_BYTES else "join"
    if attach_strategy == "broadcast":
        # global pair dedup keyed on a_id: the same pair is emitted once
        # per matching band across different partitions; the join path
        # dedups inside its own a_id-keyed attach pass instead.
        deduped = partitioned_group_map(
            pair_refs, "a_id", _dedup_pairs_partition, num_partitions, arrow=True
        )
        return attach_signatures_broadcast(deduped, with_sigs)
    return attach_signatures(pair_refs, with_sigs, num_partitions)
