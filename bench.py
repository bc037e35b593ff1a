"""Benchmark harness.

Prints ONE JSON line:
    {"metric": "...", "value": <headline seconds>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

Headline: the flagship multi-level transcript dedup pipeline
(canonical -> exact -> MinHash -> LSH -> verify -> cluster) over a
deterministic synthetic transcript corpus (~GRAFT_BENCH_CONVS
conversations, default 20k, ~8 turns each) generated once and cached
under /tmp — the same input at every parallelism level.

Also times representative operators over $GRAFT_SF_DIR (default
/root/testdata/sf0.1).

`--scaling`: runs the plain bench twice in fresh subprocesses at
RAY_GRAFT_CPUS=$GRAFT_SCALING_LO and =$GRAFT_SCALING_HI (default 4 and
16) on the GRAFT_SCALING_CONVS corpus and reports throughput scaling
efficiency (T_lo/T_hi)/(hi/lo) — the sandbox protocol for the
N-vs-4N-nodes criterion (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_CONVS = int(os.environ.get("GRAFT_BENCH_CONVS", "100000"))
# scaling runs need a compute-dominated corpus so fixed session/barrier
# latency does not mask the CPU scaling (see BASELINE.md)
SCALING_CONVS = int(os.environ.get("GRAFT_SCALING_CONVS", "1000000"))
# N vs 4N parallelism pair. (4, 16) by default: actor pools scale exactly
# 4x (2 -> 8 actors) under the CPU-proportional sizing rule, and this
# single box shares one memory bus and object store across all workers,
# so beyond ~16 CPUs shuffle/hash stages hit the DRAM-bandwidth ceiling
# that a multi-node cluster (per-node memory + store) does not — measured
# and documented in BASELINE.md alongside the (2,8) and (8,32) pairs.
SCALING_LO = int(os.environ.get("GRAFT_SCALING_LO", "4"))
SCALING_HI = int(os.environ.get("GRAFT_SCALING_HI", "16"))
CORPUS_DIR = os.environ.get("GRAFT_BENCH_CORPUS_DIR", "/tmp/qc_bench_corpus")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _filter_empty_schema_warnings() -> None:
    """Silence Ray's 'RefBundle with a different schema ... new schema: .'
    warning — and ONLY that one. Ray 2.49's map operators skip the UDF
    for zero-row input blocks and emit a schemaless empty bundle, so
    even fully-typed empty tables (the stages/lsh.py:_EMPTY_* discipline
    used by every map fn in this repo) trigger it. Framework noise;
    filtered so bench tails carry signal only."""
    from quarrycore_ray.util import silence_empty_bundle_warnings

    silence_empty_bundle_warnings()


def host_first_touch_gbps(mb: int = 128) -> float:
    """First-touch page-fault bandwidth probe (BASELINE.md host-state
    advisory): the sandbox VM intermittently degrades to ~0.01 GB/s
    faulting fresh pages from the hypervisor (vs >= 1 GB/s healthy),
    which inflates every wall-clock number ~2.5-3x while leaving
    correctness untouched. Recording the probe beside each bench run
    makes cross-run comparisons interpretable."""
    import numpy as np

    n = mb * 1024 * 1024 // 8
    t0 = time.perf_counter()
    np.ones(n)
    return round(mb / 1024.0 / (time.perf_counter() - t0), 3)


def run_bench() -> dict:
    import ray

    probe_gbps = host_first_touch_gbps()
    log(f"host first-touch probe: {probe_gbps} GB/s (healthy >= 1)")

    _filter_empty_schema_warnings()
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import ray.data as rd

    from quarrycore_ray.pipelines.dedup import dedup_transcripts
    from quarrycore_ray.synth import write_corpus

    root = write_corpus(CORPUS_DIR, BENCH_CONVS, seed=42, boilerplate_group=BENCH_CONVS // 50)
    tdir = os.path.join(root, "transcripts")

    # warm page cache + count turns (untimed)
    n_turns = rd.read_parquet(tdir).count()
    log(f"bench corpus: {tdir} ({n_turns} turns), num_cpus={NUM_CPUS}")

    t0 = time.perf_counter()
    res = dedup_transcripts(rd.read_parquet(tdir))
    n_clusters = res.metrics["n_clusters"]
    headline = time.perf_counter() - t0
    turns_per_sec = n_turns / headline
    log(
        f"headline dedup: {headline:.2f}s, {turns_per_sec:.0f} turns/s, "
        f"{n_clusters} clusters, metrics={res.metrics}"
    )

    queries: dict[str, float] = {}
    if os.environ.get("GRAFT_SKIP_QUERIES"):
        ray.shutdown()
        return {
            "metric": "transcript_dedup_e2e_seconds",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": queries,
            "sf": 0.1,
            "num_cpus": NUM_CPUS,
            "n_turns": int(n_turns),
            "turns_per_sec": round(turns_per_sec, 1),
            "n_clusters": int(n_clusters),
            "host_first_touch_gbps": probe_gbps,
        }

    def timed(name: str, fn) -> None:
        t = time.perf_counter()
        out = fn(SF_DIR)
        # consume lazily-returned datasets
        import ray.data

        if isinstance(out, ray.data.Dataset):
            out.count()
        dt = time.perf_counter() - t
        queries[name] = round(dt, 3)
        log(f"query {name}: {dt:.2f}s")

    from quarrycore_ray.functions import similarity
    from quarrycore_ray.pipelines import documents as docs
    from quarrycore_ray.pipelines import graph as grf
    from quarrycore_ray.pipelines import relational as rel

    timed("exact_dedup_docs", docs.exact_dedup_docs)
    timed("minhash_dedup_docs", docs.minhash_dedup_docs)
    timed("events_hourly", rel.events_hourly)
    timed("events_user_sessions", rel.events_user_sessions)
    timed("temporal_split", rel.temporal_split)
    timed("lineitem_pricing_summary", rel.lineitem_pricing_summary)
    timed("knn_cosine", similarity.knn_cosine)
    timed("ann_ivf_knn", similarity.ann_ivf_knn)
    timed("extract_structured", docs.extract_structured)
    timed("search_docs", docs.search_docs)

    from quarrycore_ray.pipelines import curation as cur

    timed("segment_dedup_docs", cur.segment_dedup_docs)
    timed("events_asof_join", rel.events_asof_join)
    timed("top_revenue_orders", rel.top_revenue_orders)
    timed("top_terms", docs.top_terms)

    from quarrycore_ray.pipelines import training as trn

    timed("tfidf_top_terms", trn.tfidf_top_terms)
    timed("unigram_logprob_docs", trn.unigram_logprob_docs)
    timed("reading_metrics_docs", docs.reading_metrics_docs)
    timed("cohort_retention", rel.cohort_retention)
    # round-3 operators
    timed("domain_classify_docs", docs.domain_classify_docs)
    timed("dedup_docs_domain_thresholds", docs.dedup_docs_domain_thresholds)
    timed("extract_html_docs", docs.extract_html_docs)
    timed("exact_substr_spans", cur.exact_substr_spans)
    timed("gif_decode_stats", docs.gif_decode_stats)
    timed("curation_pipeline_docs", cur.curation_pipeline_docs)
    timed("ngram_novelty_docs", cur.ngram_novelty_docs)
    timed("shard_pack_assignments", trn.shard_pack_assignments)
    timed("shard_docs_deterministic", trn.shard_docs_deterministic)
    timed("setsim_join_docs", docs.setsim_join_docs)
    timed("link_pagerank_docs", grf.link_pagerank_docs)
    timed("events_window_dedup", rel.events_window_dedup)
    timed("zipf_profile_docs", trn.zipf_profile_docs)
    timed("source_quality_regression", trn.source_quality_regression)
    timed("random_projection_embeddings", similarity.random_projection_embeddings)
    timed("link_triangles_docs", grf.link_triangles_docs)
    timed("mmr_rerank_docs", similarity.mmr_rerank_docs)

    from quarrycore_ray.pipelines.incremental import corpus_snapshot_diff
    from quarrycore_ray.pipelines.transcripts import truncate_conversations
    from quarrycore_ray.synth import transcripts_from_documents

    timed("corpus_snapshot_diff", corpus_snapshot_diff)
    timed(
        "truncate_conversations_stats",
        lambda sf: truncate_conversations(
            rd.from_arrow(transcripts_from_documents(sf))
        ),
    )
    timed("image_dhash_dedup", docs.image_dhash_dedup)
    timed("audio_fingerprint_dedup", docs.audio_fingerprint_dedup)
    timed("video_scene_changes", docs.video_scene_changes)
    timed("events_dau_wau", rel.events_dau_wau)
    timed("events_hourly_anomalies", rel.events_hourly_anomalies)
    timed("part_supplier_diversity", rel.part_supplier_diversity)
    timed("source_quality_audit", trn.source_quality_audit)
    timed("winsorize_lengths_by_source", docs.winsorize_lengths_by_source)
    # session-3 operators
    timed("link_kcore_docs", grf.link_kcore_docs)
    timed("large_volume_orders", rel.large_volume_orders)
    timed("customer_order_count_distribution", rel.customer_order_count_distribution)
    timed("vocab_coverage_curve", trn.vocab_coverage_curve)

    from quarrycore_ray.pipelines.transcripts import (
        tool_chain_stats,
        turn_stutter_stats,
    )

    timed(
        "turn_stutter_stats",
        lambda sf: turn_stutter_stats(
            rd.from_arrow(transcripts_from_documents(sf))
        ),
    )
    timed(
        "tool_chain_stats",
        lambda sf: tool_chain_stats(
            rd.from_arrow(transcripts_from_documents(sf))
        ),
    )
    # round-5 operators
    timed("html_curate_dedup_docs", cur.html_curate_dedup_docs)
    timed(
        "embedding_dup_pairs_ann",
        similarity.embedding_dup_pairs_ann_planted,
    )

    ray.shutdown()
    return {
        "metric": "transcript_dedup_e2e_seconds",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "num_cpus": NUM_CPUS,
        "n_turns": int(n_turns),
        "turns_per_sec": round(turns_per_sec, 1),
        "n_clusters": int(n_clusters),
        "host_first_touch_gbps": probe_gbps,
    }


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_CONVS=str(SCALING_CONVS),
            GRAFT_SKIP_QUERIES="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = SCALING_LO, SCALING_HI
    r_lo = run(lo)
    r_hi = run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    out = {
        "metric": "scaling_efficiency",
        "cpus_lo": lo,
        "cpus_hi": hi,
        f"sec_{lo}": r_lo["value"],
        f"sec_{hi}": r_hi["value"],
        f"turns_per_sec_{lo}": r_lo["turns_per_sec"],
        f"turns_per_sec_{hi}": r_hi["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "n_turns": r_lo["n_turns"],
        "host_first_touch_gbps": [
            r_lo.get("host_first_touch_gbps"),
            r_hi.get("host_first_touch_gbps"),
        ],
    }
    if not os.environ.get("GRAFT_SCALING_NO_SIG"):
        out["sig_stage"] = run_sig_stage_scaling(lo, hi)
    return out


def run_sig_stage_scaling(lo: int, hi: int) -> dict:
    """Stage-isolated scaling pair for the driver artifact: times ONLY
    the compute-dominated signature stage (no all-to-all shuffle in the
    timed region) at the same CPU pair, fresh process per leg
    (scripts/sig_scale_probe.py). This is the decomposition BASELINE.md
    documents: on a single box the shuffle legs flatten against the
    shared DRAM bus while compute stages keep scaling — per-node memory
    on a real N -> 4N cluster multiplies the bus away, so the compute
    ratio is the portable signal. Embedded in the --scaling JSON so the
    per-round BENCH artifact carries the evidence."""
    here = os.path.dirname(os.path.abspath(__file__))
    probe = os.path.join(here, "scripts", "sig_scale_probe.py")
    corpus = os.path.join(CORPUS_DIR, f"n{BENCH_CONVS}_s42", "transcripts")
    inp = f"/tmp/sig_probe_input_n{BENCH_CONVS}"
    if not os.path.exists(os.path.join(inp, "_PREPPED")):
        # corpus prep (idempotent; synth.write_corpus keys the dir)
        subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, %r); " % here
             + "from quarrycore_ray.synth import write_corpus; "
             + "write_corpus(%r, %d, seed=42, boilerplate_group=%d)"
             % (CORPUS_DIR, BENCH_CONVS, BENCH_CONVS // 50)],
            check=True,
        )
        subprocess.run(
            [sys.executable, probe, "prep", corpus, inp],
            check=True,
            capture_output=True,
        )
        with open(os.path.join(inp, "_PREPPED"), "w") as f:
            f.write("ok")

    def leg(ncpu: int) -> dict:
        r = subprocess.run(
            [sys.executable, probe, "run", str(ncpu), inp],
            check=True,
            capture_output=True,
            text=True,
        )
        return json.loads(r.stdout.strip().splitlines()[-1])

    s_lo, s_hi = leg(lo), leg(hi)
    eff = (s_lo["sec"] / s_hi["sec"]) / (hi / lo)
    out = {
        "stage": "minhash_simhash_signatures",
        "rows": s_lo["rows"],
        f"sec_{lo}": s_lo["sec"],
        f"sec_{hi}": s_hi["sec"],
        "efficiency": round(eff, 3),
        "host_first_touch_gbps": host_first_touch_gbps(),
    }

    # the bus-bound counterpart: one isolated all-to-all exchange of
    # the same table (no signature arithmetic) — documents WHICH half
    # of the pipeline stops scaling on a single box (BASELINE.md)
    def shuffle_leg(ncpu: int) -> dict:
        r = subprocess.run(
            [sys.executable, probe, "shuffle", str(ncpu), inp],
            check=True,
            capture_output=True,
            text=True,
        )
        return json.loads(r.stdout.strip().splitlines()[-1])

    sh_lo, sh_hi = shuffle_leg(lo), shuffle_leg(hi)
    sh_eff = (sh_lo["sec"] / sh_hi["sec"]) / (hi / lo)
    out["shuffle_stage"] = {
        "stage": "hash_partition_shuffle",
        "rows": sh_lo["rows"],
        f"sec_{lo}": sh_lo["sec"],
        f"sec_{hi}": sh_hi["sec"],
        "efficiency": round(sh_eff, 3),
        "host_first_touch_gbps": host_first_touch_gbps(),
    }
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
