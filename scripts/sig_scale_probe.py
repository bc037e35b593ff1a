"""Isolated signature-stage scaling probe.

Times ONLY the compute-dominated stage of the flagship (MinHash+SimHash
signatures over distinct canonical texts) at a given CPU count, with no
all-to-all shuffle in the timed region — the instrument that separates
"the engine stops scaling" from "the box's shared memory bus stops
scaling" (BASELINE.md round-2 analysis).

Usage:
    # one-time input prep (any cpu count):
    python scripts/sig_scale_probe.py prep [corpus_transcript_dir] [out_dir]
    # timed leg (fresh process per N):
    python scripts/sig_scale_probe.py run <num_cpus> [input_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _init(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def prep(tdir: str, out: str) -> None:
    _init(32)
    import ray.data as rd

    from quarrycore_ray.stages.canonical import assemble_conversations
    from quarrycore_ray.stages.exact import exact_dedup

    reps = exact_dedup(assemble_conversations(rd.read_parquet(tdir)))
    reps.select_columns(["conv_id", "canonical_text"]).write_parquet(out)
    print("prep done:", out)


def run(num_cpus: int, inp: str) -> None:
    _init(num_cpus)
    import ray.data as rd

    from quarrycore_ray.config import DedupConfig
    from quarrycore_ray.stages.minhash_stage import MinHashSimHashStage

    cfg = DedupConfig()
    ds = rd.read_parquet(inp)
    n = ds.count()  # warm page cache, untimed
    pool = cfg.resolved_minhash_concurrency()
    t0 = time.perf_counter()
    out_n = (
        ds.repartition(pool * 4)
        .map_batches(
            MinHashSimHashStage,
            fn_constructor_kwargs={"config": cfg},
            batch_format="pyarrow",
            batch_size=cfg.sig_batch_size,
            concurrency=(1, pool),
        )
        .select_columns(["conv_id"])
        .count()
    )
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "stage": "minhash_simhash_signatures",
                "num_cpus": num_cpus,
                "pool": pool,
                "rows": int(out_n),
                "sec": round(dt, 2),
                "rows_per_sec": round(n / dt, 1),
            }
        )
    )


def run_shuffle(num_cpus: int, inp: str) -> None:
    """The bus-bound counterpart to `run`: times ONLY one all-to-all
    hash-partitioned exchange of the same prepped (conv_id, text) table
    — no signature arithmetic in the timed region. On a single box this
    leg rides the shared DRAM bus (the flat region of the whole-pipeline
    ratio); on a real N -> 4N cluster each node brings its own memory
    and NIC, so the pair (compute leg ~linear, shuffle leg flat-on-one-
    box) is the decomposition BASELINE.md documents."""
    _init(num_cpus)
    import pyarrow as pa

    import ray.data as rd

    from quarrycore_ray.stages.grouped import partitioned_group_map

    ds = rd.read_parquet(inp).materialize()  # warm, untimed
    n = ds.count()

    def _count(tb: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([tb.num_rows], pa.int64())})

    t0 = time.perf_counter()
    out_n = int(
        sum(
            sum(b["n"].to_pylist())
            for b in partitioned_group_map(
                ds, "conv_id", _count, arrow=True
            ).iter_batches(batch_format="pyarrow")
        )
    )
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "stage": "hash_partition_shuffle",
                "num_cpus": num_cpus,
                "rows": int(out_n),
                "sec": round(dt, 2),
                "rows_per_sec": round(n / dt, 1),
            }
        )
    )


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "prep":
        tdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/qc_bench_corpus/n300000_s42/transcripts"
        out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sig_probe_input"
        prep(tdir, out)
    elif mode == "shuffle":
        ncpu = int(sys.argv[2])
        inp = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sig_probe_input"
        run_shuffle(ncpu, inp)
    else:
        ncpu = int(sys.argv[2])
        inp = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sig_probe_input"
        run(ncpu, inp)
    import ray

    ray.shutdown()
