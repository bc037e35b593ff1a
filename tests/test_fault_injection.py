"""Fault-injection e2e: actor death mid-run, job interrupt + resume,
dead-letter routing of structurally broken input rows.

Reference analog: `/root/reference/tests/e2e/test_resume.py:171-260`
(checkpoint resume bit-stability) and the DeadLetterQueue enqueue path
(`recovery/dead_letter.py`, `pipeline.py:859-877`).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from quarrycore_ray.config import DedupConfig
from quarrycore_ray.synth import write_corpus


def _clusters_frame(ds) -> pd.DataFrame:
    return (
        ds.to_pandas()
        .sort_values(["conv_id"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = write_corpus(
        str(tmp_path_factory.mktemp("fi") / "corpus"),
        n_convs=200,
        seed=31,
        boilerplate_group=20,
    )
    return os.path.join(root, "transcripts")


class TestVerifyActorKill:
    def test_actor_death_mid_run_is_retried_bit_identical(self, corpus, tmp_path):
        from quarrycore_ray.pipelines.dedup import dedup_transcripts

        baseline = _clusters_frame(
            dedup_transcripts(rd.read_parquet(corpus)).clusters
        )

        flag = str(tmp_path / "killed.flag")
        cfg = DedupConfig(fault_kill_verify_once=flag)
        res = dedup_transcripts(rd.read_parquet(corpus), config=cfg)
        got = _clusters_frame(res.clusters)

        # the fault genuinely fired: one verify actor hard-exited
        assert os.path.exists(flag)
        # Ray restarted the actor / retried the task; output bit-identical
        pd.testing.assert_frame_equal(got, baseline)


class TestJobInterruptResume:
    def test_interrupt_between_manifests_then_resume(self, corpus, tmp_path):
        from quarrycore_ray.pipelines.job import run_dedup_job
        from quarrycore_ray.state.checkpoint import CheckpointManager

        out_ref = str(tmp_path / "ref")
        ref = run_dedup_job(corpus, out_ref, lineage=False)
        ref_clusters = (
            pd.read_parquet(os.path.join(out_ref, "clusters", "data"))
            .sort_values(["conv_id"])
            .reset_index(drop=True)
        )

        # interrupt the job BETWEEN the edges and clusters manifests
        out_int = str(tmp_path / "interrupted")
        orig_stage = CheckpointManager.stage

        def _interrupting(self, name, fn, **kw):
            if name == "clusters":
                raise KeyboardInterrupt("simulated ctrl-c between manifests")
            return orig_stage(self, name, fn, **kw)

        CheckpointManager.stage = _interrupting
        try:
            with pytest.raises(KeyboardInterrupt):
                run_dedup_job(corpus, out_int, lineage=False)
        finally:
            CheckpointManager.stage = orig_stage

        # manifests for the finished stages exist, later stages absent
        ck = CheckpointManager(out_int)
        assert ck.is_complete("conversations")
        assert ck.is_complete("reps")
        assert ck.is_complete("edges")
        assert not ck.is_complete("clusters")

        # resume: completed stages are skipped, output is bit-identical
        summary = run_dedup_job(corpus, out_int, lineage=False)
        assert {"conversations", "reps", "edges"} <= set(
            summary["stages_skipped"]
        )
        assert "clusters" in summary["stages_run"]
        got = (
            pd.read_parquet(os.path.join(out_int, "clusters", "data"))
            .sort_values(["conv_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, ref_clusters)
        assert summary["cluster_rows"] == ref["cluster_rows"]
        assert summary["deduped"] == ref["deduped"]


class TestJobDeadLetter:
    def test_broken_rows_routed_not_fatal(self, corpus, tmp_path):
        from quarrycore_ray.pipelines.job import run_dedup_job

        # corrupt the input: add turn rows with null conv_id / turn_idx
        tb = pq.read_table(corpus)
        bad = pa.table(
            {
                "conv_id": pa.array([None, "conv-broken"], pa.string()),
                "turn_idx": pa.array([0, None], pa.int32()),
                "role": pa.array(["user", "user"], pa.string()),
                "text": pa.array(["orphan text", "unplaceable text"]),
                "tool": pa.array([None, None], pa.string()),
                "ts": pa.array(
                    [None, None], tb.schema.field("ts").type
                ),
            }
        ).cast(tb.schema)
        broken_dir = str(tmp_path / "broken_in")
        os.makedirs(broken_dir)
        pq.write_table(
            pa.concat_tables([tb, bad]),
            os.path.join(broken_dir, "part-0.parquet"),
        )

        out = str(tmp_path / "out")
        summary = run_dedup_job(broken_dir, out, lineage=False)
        assert summary["dead_letter_rows"] == 2

        dead = pd.read_parquet(os.path.join(out, "dead_letter"))
        from quarrycore_ray.stages.deadletter import ERROR_COL
        assert sorted(dead[ERROR_COL]) == ["null_conv_id", "null_turn_idx"]
        assert set(dead["text"]) == {"orphan text", "unplaceable text"}

        # resume after the conversations manifest: dead-letter rows are
        # NOT duplicated (the routed table is replaced, never appended)
        # and the resumed summary recovers the true counter instead of 0
        from quarrycore_ray.state.checkpoint import CheckpointManager

        CheckpointManager(out).invalidate("clusters")
        CheckpointManager(out).invalidate("deduped")
        resumed = run_dedup_job(broken_dir, out, lineage=False)
        assert resumed["dead_letter_rows"] == 2
        assert len(pd.read_parquet(os.path.join(out, "dead_letter"))) == 2

        # a FULL rerun over the same out_root also replaces (not
        # appends) the routed table
        for st in ("conversations", "reps", "edges", "clusters", "deduped"):
            CheckpointManager(out).invalidate(st)
        rerun = run_dedup_job(broken_dir, out, lineage=False)
        assert rerun["dead_letter_rows"] == 2
        assert len(pd.read_parquet(os.path.join(out, "dead_letter"))) == 2

        # the clean side is unaffected: same clusters as the pristine run
        out_ref = str(tmp_path / "out_ref")
        ref = run_dedup_job(corpus, out_ref, lineage=False)
        a = (
            pd.read_parquet(os.path.join(out, "clusters", "data"))
            .sort_values(["conv_id"]).reset_index(drop=True)
        )
        b = (
            pd.read_parquet(os.path.join(out_ref, "clusters", "data"))
            .sort_values(["conv_id"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
        assert ref["dead_letter_rows"] == 0
