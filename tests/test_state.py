"""Checkpoint/resume + lineage metrics.

Mirrors the reference's resume e2e semantics
(`/root/reference/tests/e2e/test_resume.py:171-260`): run -> interrupt
(simulated by a partial checkpoint tree) -> rerun completes the
remaining stages only; counters add up; results equal a fresh run.
"""

import json
import os

import pyarrow as pa
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


class TestRetention:
    """Warm -> cold retention + hot-store backups (state/retention.py;
    reference RetentionConfig/BackupConfig, config.py:106-148)."""

    def _mk_partition(self, root, name, written_at):
        import json as _json

        d = os.path.join(root, name)
        os.makedirs(d)
        with open(os.path.join(d, "part-0.parquet"), "wb") as f:
            f.write(b"x" * 16)
        with open(os.path.join(d, "_manifest.json"), "w") as f:
            _json.dump({"written_at": written_at}, f)
        return d

    def test_archives_only_old_partitions(self, tmp_path):
        from quarrycore_ray.state.retention import (
            archive_partitions,
            load_archive_manifest,
        )

        warm = str(tmp_path / "warm")
        cold = str(tmp_path / "cold")
        os.makedirs(warm)
        now = 1_000_000_000.0
        self._mk_partition(warm, "p_old", now - 40 * 86400)
        self._mk_partition(warm, "p_new", now - 1 * 86400)
        got = archive_partitions(warm, cold, archive_after_days=30, now=now)
        assert got == ["p_old"]
        assert sorted(os.listdir(warm)) == ["p_new"]
        assert os.path.exists(os.path.join(cold, "p_old", "part-0.parquet"))
        mf = load_archive_manifest(cold)
        assert [m["partition"] for m in mf] == ["p_old"]

    def test_reconciles_after_crash_between_copy_and_remove(self, tmp_path):
        import shutil as _shutil

        from quarrycore_ray.state.retention import archive_partitions

        warm = str(tmp_path / "warm")
        cold = str(tmp_path / "cold")
        os.makedirs(warm)
        now = 1_000_000_000.0
        self._mk_partition(warm, "p_old", now - 40 * 86400)
        # simulate the crash window: cold copy exists, warm not removed
        _shutil.copytree(os.path.join(warm, "p_old"), os.path.join(cold, "p_old"))
        got = archive_partitions(warm, cold, archive_after_days=30, now=now)
        assert got == ["p_old"]
        assert not os.path.exists(os.path.join(warm, "p_old"))
        # idempotent on rerun
        assert archive_partitions(warm, cold, 30, now=now) == []

    def test_backup_snapshots_and_prunes(self, tmp_path):
        from quarrycore_ray.state.retention import backup_store

        store = tmp_path / "hot.db"
        store.write_bytes(b"state-v1")
        bdir = str(tmp_path / "backups")
        snaps = [
            backup_store(str(store), bdir, keep=2, now=1_000_000_000 + i)
            for i in range(4)
        ]
        kept = sorted(p for p in os.listdir(bdir) if p.endswith(".bak"))
        assert len(kept) == 2
        assert os.path.basename(snaps[-1]) in kept
        with open(os.path.join(bdir, kept[-1]), "rb") as f:
            assert f.read() == b"state-v1"

    def test_checkpoint_stage_dirs_are_retention_ready(self, tmp_path):
        """A CheckpointManager stage directory (its _MANIFEST.json uses
        ISO written_at) ages out through archive_partitions directly."""
        import time as _time

        from quarrycore_ray.state.checkpoint import CheckpointManager
        from quarrycore_ray.state.retention import archive_partitions

        root = str(tmp_path / "job")
        ckpt = CheckpointManager(root)
        ckpt.stage("edges", lambda: rd.range(5))
        now = _time.time() + 40 * 86400
        cold = str(tmp_path / "cold")
        got = archive_partitions(root, cold, archive_after_days=30, now=now)
        assert got == ["edges"]
        assert os.path.exists(os.path.join(cold, "edges", "_MANIFEST.json"))
        # the fresh warm side is empty; a rerun is a no-op
        assert archive_partitions(root, cold, 30, now=now) == []


class TestTieredReadAndCompact:
    """Cold tier stays queryable + fragment compaction (VACUUM analog;
    reference storage_manager.py:266-276, sqlite_manager.py:158-174)."""

    def _write_partition(self, root, name, ids, n_files=1):
        import pyarrow as pa
        import pyarrow.parquet as _pq

        d = os.path.join(root, name)
        os.makedirs(d, exist_ok=True)
        chunks = [ids[i::n_files] for i in range(n_files)]
        for i, chunk in enumerate(chunks):
            _pq.write_table(
                pa.table({"doc_id": pa.array(chunk, pa.int64())}),
                os.path.join(d, f"part-{i}.parquet"),
            )
        return d

    def test_read_tiered_unions_warm_and_cold(self, tmp_path):
        from quarrycore_ray.state.retention import (
            archive_partitions,
            read_tiered,
            stamp_partition,
        )

        warm = str(tmp_path / "warm")
        cold = str(tmp_path / "cold")
        os.makedirs(warm)
        now = 1_000_000_000.0
        old = self._write_partition(warm, "p_old", list(range(10)))
        new = self._write_partition(warm, "p_new", list(range(10, 25)))
        stamp_partition(old, now=now - 40 * 86400)
        stamp_partition(new, now=now - 86400)
        assert archive_partitions(warm, cold, 30, now=now) == ["p_old"]
        got = read_tiered(warm, cold).to_pandas()
        assert sorted(got["doc_id"]) == list(range(25))
        # projection + empty tiers
        got2 = read_tiered(warm, cold, columns=["doc_id"]).to_pandas()
        assert len(got2) == 25
        empty = read_tiered(str(tmp_path / "nope"), str(tmp_path / "nope2"))
        assert empty.count() == 0

    def test_read_tiered_warm_wins_collision(self, tmp_path):
        from quarrycore_ray.state.retention import read_tiered

        warm = str(tmp_path / "warm")
        cold = str(tmp_path / "cold")
        os.makedirs(warm), os.makedirs(cold)
        self._write_partition(warm, "p", [1, 2, 3])
        self._write_partition(cold, "p", [1, 2, 3, 99])  # stale copy
        got = read_tiered(warm, cold).to_pandas()
        assert sorted(got["doc_id"]) == [1, 2, 3]

    def test_compact_merges_fragments_and_keeps_stamp(self, tmp_path):
        from quarrycore_ray.state.retention import (
            compact_partition,
            stamp_partition,
        )

        warm = str(tmp_path / "warm")
        os.makedirs(warm)
        d = self._write_partition(
            warm, "p_frag", list(range(200)), n_files=10
        )
        stamp_partition(d, now=123.0)
        assert compact_partition(d, min_fragments=8) is True
        frags = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(frags) < 10
        got = pq.read_table(
            [os.path.join(d, f) for f in frags]
        ).to_pandas()
        assert sorted(got["doc_id"]) == list(range(200))
        with open(os.path.join(d, "_manifest.json")) as f:
            assert json.load(f)["written_at"] == 123.0
        assert not os.path.exists(d + ".compact.tmp")
        assert not os.path.exists(d + ".compact.old")

    def test_compact_skips_small_partitions(self, tmp_path):
        from quarrycore_ray.state.retention import compact_partition

        warm = str(tmp_path / "warm")
        os.makedirs(warm)
        d = self._write_partition(warm, "p_ok", list(range(20)), n_files=3)
        before = sorted(os.listdir(d))
        assert compact_partition(d, min_fragments=8) is False
        assert sorted(os.listdir(d)) == before


class TestObservabilityExport:
    """Prometheus text-format export of the lineage metrics
    (state/observability.py; reference observability/metrics.py parity:
    quarrycore_ prefix, stage labels, duration histogram)."""

    def _table(self):
        from quarrycore_ray.state.metrics import metrics_table

        rows = [
            ("minhash", 1, 100, 100, 50.0, 0, 0),
            ("minhash", 2, 120, 120, 2600.0, 0, 0),
            ("lsh_pairs", 1, 220, 4000, 400.0, 4000, 7),
        ]
        return metrics_table(rows)

    def test_text_format_shape(self):
        from quarrycore_ray.state.observability import prometheus_text

        text = prometheus_text(self._table())
        lines = text.splitlines()
        # exposition-format basics: HELP/TYPE pairs precede samples
        assert "# TYPE quarrycore_rows_in_total counter" in lines
        assert 'quarrycore_rows_in_total{stage="minhash"} 220' in lines
        assert 'quarrycore_rows_out_total{stage="lsh_pairs"} 4000' in lines
        assert 'quarrycore_candidate_pairs_total{stage="lsh_pairs"} 4000' in lines
        assert 'quarrycore_dropped_pairs_skew_cap_total{stage="lsh_pairs"} 7' in lines
        # histogram: cumulative buckets, +Inf == count, sum in seconds
        assert "# TYPE quarrycore_processing_duration_seconds histogram" in lines
        b = [l for l in lines if l.startswith(
            'quarrycore_processing_duration_seconds_bucket{stage="minhash"'
        )]
        counts = [int(l.rsplit(" ", 1)[1]) for l in b]
        assert counts == sorted(counts)  # cumulative
        assert counts[-1] == 2  # +Inf bucket == observation count
        # 50ms falls in le=0.05; 2.6s only in le=5.0 and up
        assert 'le="0.05"} 1' in b[3]
        assert (
            'quarrycore_processing_duration_seconds_count{stage="minhash"} 2'
            in lines
        )
        s = [l for l in lines if l.startswith(
            'quarrycore_processing_duration_seconds_sum{stage="minhash"'
        )][0]
        assert abs(float(s.rsplit(" ", 1)[1]) - 2.65) < 1e-9

    def test_textfile_export_atomic(self, tmp_path):
        from quarrycore_ray.state.observability import (
            export_prometheus_textfile,
        )

        path = str(tmp_path / "quarrycore.prom")
        text = export_prometheus_textfile(path, self._table())
        assert open(path).read() == text
        assert not os.path.exists(path + ".tmp")

    def test_live_http_scrape(self):
        import urllib.request

        from quarrycore_ray.state.metrics import drain_metrics, report
        from quarrycore_ray.state.observability import (
            start_metrics_http_server,
        )

        drain_metrics()  # clean slate
        report("scrape_stage", 10, 9, 12.5)
        srv = start_metrics_http_server()
        try:
            # the report is async fire-and-forget; retry briefly
            import time as _t

            body = ""
            for _ in range(50):
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{srv.port}/metrics", timeout=5
                ) as r:
                    assert r.status == 200
                    assert "text/plain" in r.headers["Content-Type"]
                    body = r.read().decode()
                if "scrape_stage" in body:
                    break
                _t.sleep(0.1)
            assert 'quarrycore_rows_in_total{stage="scrape_stage"} 10' in body
            # scrape is non-destructive: the lineage drain still sees it
            t = drain_metrics()
            assert "scrape_stage" in t["stage"].to_pylist()
            with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/nope", timeout=5
            ) as r:  # pragma: no cover - urllib raises on 404
                pass
        except urllib.error.HTTPError as e:
            assert e.code == 404
        finally:
            srv.stop()


class TestJobSegmentTier:
    """segment_tier=True gives the job the full multi-level stack: turn
    SimHash removal (checkpointed as `turns/`) -> conversation exact ->
    conversation near (reference deduplicator.py:202-251 L1-L4)."""

    def _turn_corpus(self, tmp_path, with_dead=False):
        boiler = "welcome to the support channel please describe your issue"
        rows = {"conv_id": [], "turn_idx": [], "text": []}
        for c in range(6):
            rows["conv_id"] += [f"c{c:02d}"] * 3
            rows["turn_idx"] += [0, 1, 2]
            rows["text"] += [
                boiler,  # identical across conversations -> segment dup
                f"unique question number {c} about topic {c * 7}",
                f"unique answer number {c} with details {c * 13}",
            ]
        if with_dead:
            rows["conv_id"].append(None)
            rows["turn_idx"].append(0)
            rows["text"].append("orphan row")
        tb = pa.table(
            {
                "conv_id": pa.array(rows["conv_id"], pa.string()),
                "turn_idx": pa.array(rows["turn_idx"], pa.int64()),
                "text": pa.array(rows["text"], pa.string()),
            }
        )
        d = str(tmp_path / "turns_in")
        os.makedirs(d, exist_ok=True)
        pq.write_table(tb, os.path.join(d, "part-0.parquet"))
        return d

    def test_tier_runs_checkpointed_and_resumes(self, tmp_path):
        corpus = self._turn_corpus(tmp_path)
        out = str(tmp_path / "job_seg")
        s1 = run_dedup_job(corpus, out, segment_tier=True)
        assert s1["segment_tier"] is True
        # 6 boilerplate copies -> 1 survivor: 18 - 5 = 13 turns
        assert s1["surviving_turns"] == 13
        assert "turns" in s1["stages_run"]
        # the turn-dedup lineage row is exported with the stage metrics
        mt = pq.read_table(os.path.join(out, "metrics", "metrics.parquet"))
        td = mt.filter(
            pa.compute.equal(mt["stage"], pa.scalar("turn_dedup"))
        )
        assert td.num_rows == 1
        assert td["rows_in"][0].as_py() == 18
        assert td["rows_out"][0].as_py() == 13

        # full resume: the tier (and everything else) is skipped,
        # counters identical
        s2 = run_dedup_job(corpus, out, segment_tier=True)
        assert s2["stages_run"] == []
        assert "turns" in s2["stages_skipped"]
        for k in ("surviving_turns", "conversations", "deduped"):
            assert s2[k] == s1[k]

        # interrupt mid-stack: invalidate downstream stages only -> the
        # checkpointed turn tier is NOT recomputed and the rerun's
        # outputs are bit-identical to the uninterrupted run
        cl1 = (
            rd.read_parquet(os.path.join(out, "clusters", "data"))
            .to_pandas()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        for st in ("conversations", "reps", "edges", "clusters", "deduped"):
            CheckpointManager(out).invalidate(st)
        s3 = run_dedup_job(corpus, out, segment_tier=True)
        assert "turns" not in s3["stages_run"]
        cl3 = (
            rd.read_parquet(os.path.join(out, "clusters", "data"))
            .to_pandas()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        assert cl1.equals(cl3)

    def test_tier_dead_letter_safe(self, tmp_path):
        corpus = self._turn_corpus(tmp_path, with_dead=True)
        out = str(tmp_path / "job_seg_dead")
        s = run_dedup_job(corpus, out, segment_tier=True)
        assert s["dead_letter_rows"] == 1
        # the null-key row is routed BEFORE the tier, not counted in it
        assert s["surviving_turns"] == 13
        dead = rd.read_parquet(os.path.join(out, "dead_letter")).to_pandas()
        assert list(dead["_error"]) == ["null_conv_id"]


class TestJobDomainThresholds:
    """The optional `domain` column must ride turn rows -> assembly ->
    exact reps -> per-domain verification thresholds inside the job
    (VERDICT r4 #7): the SAME corpus clusters differently when its
    domain's threshold is lenient vs unreachable."""

    def _corpus(self, tmp_path):
        base = " ".join(f"word{i:02d}" for i in range(60))
        near = base.replace("word59", "word99")
        tb = pa.table(
            {
                "conv_id": pa.array(["conv-a", "conv-b", "conv-c"], pa.string()),
                "turn_idx": pa.array([0, 0, 0], pa.int64()),
                "text": pa.array(
                    [base, near, "totally different text entirely"], pa.string()
                ),
                "domain": pa.array(["tagged", "tagged", "tagged"], pa.string()),
            }
        )
        d = str(tmp_path / "dom_in")
        os.makedirs(d, exist_ok=True)
        pq.write_table(tb, os.path.join(d, "part-0.parquet"))
        return d

    def _clusters(self, corpus, out, thr):
        from quarrycore_ray.config import DedupConfig

        cfg = DedupConfig(
            # disable the SimHash rescue so the domain threshold alone
            # decides the borderline pair
            strict_hamming=-1,
            domain_minhash_thresholds=(("tagged", thr),),
        )
        run_dedup_job(corpus, out, config=cfg, lineage=False)
        cl = rd.read_parquet(os.path.join(out, "clusters", "data")).to_pandas()
        return dict(zip(cl["conv_id"], cl["cluster_id"]))

    def test_threshold_changes_job_clusters(self, tmp_path):
        corpus = self._corpus(tmp_path)
        lenient = self._clusters(corpus, str(tmp_path / "j_len"), 0.5)
        strict = self._clusters(corpus, str(tmp_path / "j_str"), 1.01)
        # lenient domain threshold merges the near pair...
        assert lenient["conv-b"] == "conv-a"
        assert lenient["conv-c"] == "conv-c"
        # ...the unreachable one keeps every conversation apart
        assert strict == {c: c for c in ("conv-a", "conv-b", "conv-c")}


class TestJobLabelPropPath:
    """Force the job's distributed label-propagation branch
    (labelprop_edge_threshold=0) and check it produces the same
    clusters/deduped outputs as the driver union-find branch, with the
    `labels` stage checkpointed and resumable."""

    def _corpus(self, tmp_path):
        base = " ".join(f"tok{i:02d}" for i in range(60))
        near = base.replace("tok59", "tok99")
        tb = pa.table(
            {
                "conv_id": pa.array(["a", "b", "c", "d"], pa.string()),
                "turn_idx": pa.array([0, 0, 0, 0], pa.int64()),
                "text": pa.array(
                    [base, near, base + " extra tail", "unrelated text"],
                    pa.string(),
                ),
            }
        )
        d = str(tmp_path / "lp_in")
        os.makedirs(d, exist_ok=True)
        pq.write_table(tb, os.path.join(d, "part-0.parquet"))
        return d

    def test_labelprop_branch_matches_union_find(self, tmp_path):
        from quarrycore_ray.config import DedupConfig

        corpus = self._corpus(tmp_path)
        out_uf = str(tmp_path / "j_uf")
        out_lp = str(tmp_path / "j_lp")
        run_dedup_job(corpus, out_uf, lineage=False)
        s = run_dedup_job(
            corpus, out_lp,
            config=DedupConfig(labelprop_edge_threshold=0), lineage=False,
        )
        assert s["cluster_path"] == "label_propagation"
        assert "labels" in s["stages_run"]

        def clmap(root):
            cl = rd.read_parquet(os.path.join(root, "clusters", "data")).to_pandas()
            return dict(zip(cl["conv_id"], cl["cluster_id"]))

        assert clmap(out_uf) == clmap(out_lp)
        dd_uf = sorted(
            rd.read_parquet(os.path.join(out_uf, "deduped", "data"))
            .to_pandas()["conv_id"]
        )
        dd_lp = sorted(
            rd.read_parquet(os.path.join(out_lp, "deduped", "data"))
            .to_pandas()["conv_id"]
        )
        assert dd_uf == dd_lp

        # resume skips everything including the labels stage
        s2 = run_dedup_job(
            corpus, out_lp,
            config=DedupConfig(labelprop_edge_threshold=0), lineage=False,
        )
        assert s2["stages_run"] == []
        assert "labels" in s2["stages_skipped"]


class TestStagedAttachParity:
    """attach_signatures(staged=True) must be row-identical to the
    unstaged join (the staging only adds a materialize barrier)."""

    def test_parity(self):
        import numpy as np

        from quarrycore_ray.stages.lsh import attach_signatures
        from quarrycore_ray.stages.minhash_stage import sig_to_bytes

        sigs = pa.table(
            {
                "conv_id": pa.array([f"c{i}" for i in range(6)], pa.string()),
                "minhash_sig": pa.array(
                    [sig_to_bytes(np.arange(128, dtype=np.uint64) + i)
                     for i in range(6)],
                    pa.binary(),
                ),
                "simhash": pa.array(list(range(6)), pa.int64()),
                "thr": pa.array([0.85] * 6, pa.float64()),
            }
        )
        pairs = pa.table(
            {
                "a_id": pa.array(["c0", "c2", "c4"], pa.string()),
                "b_id": pa.array(["c1", "c3", "c5"], pa.string()),
                "bucket_size": pa.array([2, 2, 2], pa.int64()),
                "dropped_pairs": pa.array([0, 0, 0], pa.int64()),
            }
        )
        pd_sort = lambda d: d.sort_values(["a_id", "b_id"]).reset_index(drop=True)  # noqa: E731
        plain = pd_sort(
            attach_signatures(
                rd.from_arrow(pairs), rd.from_arrow(sigs)
            ).to_pandas()
        )
        staged = pd_sort(
            attach_signatures(
                rd.from_arrow(pairs), rd.from_arrow(sigs), staged=True
            ).to_pandas()
        )
        assert plain.equals(staged)
