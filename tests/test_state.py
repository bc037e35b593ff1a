"""Checkpoint/resume + lineage metrics.

Mirrors the reference's resume e2e semantics
(`/root/reference/tests/e2e/test_resume.py:171-260`): run -> interrupt
(simulated by a partial checkpoint tree) -> rerun completes the
remaining stages only; counters add up; results equal a fresh run.
"""

import json
import os

import pyarrow.parquet as pq
import pytest

import ray.data as rd

from quarrycore_ray.pipelines.job import run_dedup_job
from quarrycore_ray.state.checkpoint import CheckpointManager
from quarrycore_ray.synth import write_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = write_corpus(
        str(tmp_path_factory.mktemp("corpus")), n_convs=80, seed=5, num_shards=2
    )
    return os.path.join(root, "transcripts")


class TestCheckpointManager:
    def test_stage_runs_once(self, tmp_path):
        calls = []

        def make():
            calls.append(1)
            return rd.range(10)

        ckpt = CheckpointManager(str(tmp_path))
        out1 = ckpt.stage("s1", make)
        assert out1.count() == 10
        ckpt2 = CheckpointManager(str(tmp_path))
        out2 = ckpt2.stage("s1", make)
        assert out2.count() == 10
        assert len(calls) == 1  # second run loaded from checkpoint
        assert ckpt2.stages_skipped == ["s1"]

    def test_incomplete_stage_reruns(self, tmp_path):
        ckpt = CheckpointManager(str(tmp_path))
        ckpt.stage("s1", lambda: rd.range(5))
        # corrupt the manifest -> stage must rerun
        with open(os.path.join(str(tmp_path), "s1", "_MANIFEST.json"), "w") as f:
            f.write("{broken")
        calls = []

        def make():
            calls.append(1)
            return rd.range(5)

        CheckpointManager(str(tmp_path)).stage("s1", make)
        assert len(calls) == 1


class TestDedupJob:
    def test_job_outputs_and_resume(self, corpus, tmp_path):
        out_root = str(tmp_path / "job")
        s1 = run_dedup_job(corpus, out_root)
        assert s1["stages_skipped"] == []
        assert s1["deduped"] <= s1["distinct_texts"]
        assert os.path.exists(os.path.join(out_root, "job.json"))
        # lineage metrics written with the expected stage names
        mt = pq.read_table(os.path.join(out_root, "metrics", "metrics.parquet"))
        stages = set(mt.column("stage").to_pylist())
        assert {"canonical", "exact", "minhash", "lsh_pairs", "verify"} <= stages
        assert all(r >= 0 for r in mt.column("rows_out").to_pylist())

        # full resume: everything skipped, same counters
        s2 = run_dedup_job(corpus, out_root)
        assert s2["stages_run"] == []
        assert set(s2["stages_skipped"]) == {
            "conversations", "reps", "edges", "clusters", "deduped"
        }
        for k in ("conversations", "distinct_texts", "verified_edges", "deduped"):
            assert s2[k] == s1[k]

        # partial resume: drop the clusters stage -> only downstream reruns
        CheckpointManager(out_root).invalidate("clusters")
        CheckpointManager(out_root).invalidate("deduped")
        s3 = run_dedup_job(corpus, out_root)
        assert set(s3["stages_run"]) == {"clusters", "deduped"}
        assert s3["deduped"] == s1["deduped"]

    def test_job_equals_fresh_pipeline(self, corpus, tmp_path):
        import ray.data as rd

        from quarrycore_ray.pipelines.dedup import dedup_transcripts

        out_root = str(tmp_path / "job2")
        run_dedup_job(corpus, out_root)
        job_clusters = (
            rd.read_parquet(os.path.join(out_root, "clusters", "data"))
            .to_pandas()
            .set_index("conv_id")["cluster_id"]
            .to_dict()
        )
        res = dedup_transcripts(rd.read_parquet(corpus))
        direct = res.clusters.to_pandas().set_index("conv_id")["cluster_id"].to_dict()
        assert job_clusters == direct
