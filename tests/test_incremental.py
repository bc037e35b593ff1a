"""Bloom filter, incremental anti-join dedup, HTML extraction cascade."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from quarrycore_ray.state.bloom import BloomFilter


class TestBloom:
    def test_membership(self):
        bf = BloomFilter(capacity=1000, error_rate=0.001)
        keys = [f"key-{i}" for i in range(500)]
        bf.add_many(keys)
        assert all(k in bf for k in keys)  # no false negatives, ever
        fp = sum(f"other-{i}" in bf for i in range(2000))
        assert fp <= 10  # ~0.1% error rate

    def test_serialization_roundtrip(self):
        bf = BloomFilter(capacity=100)
        bf.add("hello")
        bf2 = BloomFilter.from_bytes(bf.to_bytes())
        assert "hello" in bf2 and "goodbye" not in bf2

    def test_contains_many_vectorized(self):
        bf = BloomFilter(capacity=100)
        bf.add_many(["a", "b"])
        got = bf.contains_many(["a", "b", "c"])
        assert got.tolist() == [True, True, False]


def _conv_table(texts: dict[str, str]) -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array(list(texts), pa.string()),
            "canonical_text": pa.array(list(texts.values()), pa.string()),
            "n_turns": pa.array([1] * len(texts), pa.int32()),
        }
    )


class TestIncrementalDedup:
    @pytest.mark.parametrize("use_bloom", [False, True])
    def test_anti_join(self, tmp_path, use_bloom):
        from quarrycore_ray.pipelines.incremental import (
            incremental_new_only,
            write_seen_hashes,
        )

        hist = _conv_table({"h-1": "seen text one", "h-2": "seen text two"})
        seen_path = str(tmp_path / f"seen_{use_bloom}")
        write_seen_hashes(rd.from_arrow(hist), seen_path)

        new = _conv_table(
            {
                "n-1": "seen text one",  # duplicate of history
                "n-2": "genuinely novel text",
                "n-3": "seen text two",  # duplicate
                "n-4": "another novel document",
            }
        )
        out = incremental_new_only(
            rd.from_arrow(new), seen_path, use_bloom=use_bloom
        ).to_pandas()
        assert sorted(out["conv_id"]) == ["n-2", "n-4"]

    def test_partitioned_confirmation(self, tmp_path):
        """Bloom blob broadcast + partitioned anti-join of the positive
        minority: same novel rows as the broadcast path, without an
        exact-set broadcast."""
        from quarrycore_ray.pipelines.incremental import (
            incremental_new_only,
            write_seen_hashes,
        )

        hist = _conv_table(
            {f"h-{i}": f"historical document number {i}" for i in range(50)}
        )
        seen_path = str(tmp_path / "seen_part")
        write_seen_hashes(rd.from_arrow(hist), seen_path)

        new = _conv_table(
            {
                **{f"d-{i}": f"historical document number {i}" for i in range(0, 50, 5)},
                **{f"n-{i}": f"fresh document {i}" for i in range(7)},
            }
        )
        out = incremental_new_only(
            rd.from_arrow(new), seen_path, use_bloom=True, confirm="partitioned"
        ).to_pandas()
        assert sorted(out["conv_id"]) == sorted(f"n-{i}" for i in range(7))

        with pytest.raises(ValueError):
            incremental_new_only(
                rd.from_arrow(new), seen_path, use_bloom=False, confirm="partitioned"
            )


class TestHtmlExtract:
    def test_cascade_and_gate(self):
        from quarrycore_ray.stages.extract import extract_html

        docs = rd.from_items(
            [
                {
                    "doc_id": 1,
                    "html": "<html><head><title>T1</title></head>"
                    "<body><p>Body content that is long enough to pass.</p></body></html>",
                },
                {  # no <body> -> falls through to lenient strategy
                    "doc_id": 2,
                    "html": "<div>Loose markup content long enough to pass the gate.</div>",
                },
                {"doc_id": 3, "html": "<body>tiny</body>"},  # rejected
            ]
        )
        out = extract_html(docs).to_pandas().set_index("doc_id")
        assert out.loc[1, "extractor"] == "dom"
        assert out.loc[1, "title"] == "T1"
        assert "Body content" in out.loc[1, "text"]
        assert out.loc[2, "extractor"] == "dom"
        assert out.loc[3, "extractor"] == "" and out.loc[3, "reject_reason"] == "below_min_length"

    def test_strategy2_reached_when_readability_empty(self):
        # all-link page: readability drops every block -> strict_body
        from quarrycore_ray.stages.extract import HtmlExtractStage

        import pyarrow as pa

        html = (
            "<html><body><p>"
            + " ".join(f'<a href="/x{i}">link text number {i}</a>' for i in range(9))
            + "</p></body></html>"
        )
        out = HtmlExtractStage()(
            pa.table({"doc_id": pa.array([1]), "html": pa.array([html])})
        )
        assert out["extractor"].to_pylist() == ["strict_body"]

    def test_domain_cascade_override(self):
        # per-domain extractor ordering (reference ExtractionSettings.
        # domain_overrides, config/config.py:376-378): technical pages
        # skip the strict body pass, others keep the default cascade
        import pyarrow as pa

        from quarrycore_ray.stages.extract import HtmlExtractStage

        html = (
            "<html><head><title>T</title></head>"
            "<body><p>Body content that is long enough to pass.</p></body></html>"
        )
        batch = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "html": pa.array([html, html]),
                "domain": pa.array(["technical", "general"]),
            }
        )
        stage = HtmlExtractStage(domain_overrides={"technical": ("lenient",)})
        out = stage(batch)
        assert out["extractor"].to_pylist() == ["lenient", "dom"]

    def test_unknown_strategy_rejected(self):
        import pytest as _pytest

        from quarrycore_ray.stages.extract import HtmlExtractStage

        with _pytest.raises(ValueError):
            HtmlExtractStage(domain_overrides={"x": ("nope",)})
        with _pytest.raises(ValueError):
            HtmlExtractStage(cascade_order=())


class TestIncrementalNearDup:
    def test_planted_truth_split(self, tmp_path):
        """Split a synthetic corpus with planted dup variants into a
        historical side (cluster bases) and a new batch (exact /
        whitespace / near variants + moved unique singletons): every
        variant must match its base in the index, every moved unique
        conv must come out in new_only."""
        import pyarrow.parquet as pq

        from quarrycore_ray.pipelines.incremental import (
            incremental_near_dup,
            write_signature_index,
        )
        from quarrycore_ray.stages.canonical import assemble_conversations
        from quarrycore_ray.synth import write_corpus

        root = write_corpus(str(tmp_path / "corpus"), n_convs=150, seed=23)
        truth = pq.read_table(root + "/truth_clusters.parquet").to_pandas()
        is_base = truth["conv_id"] == truth["truth_cluster_id"]
        variants = truth[
            ~is_base & truth["dup_kind"].isin(["exact", "whitespace", "near"])
        ]
        # new side: the cross-catchable variants + 20 unique singletons
        # (only bases NOT referenced by any variant may move — a moved
        # base would leave its variants nothing to match in the index)
        referenced = set(truth[~is_base]["truth_cluster_id"])
        singles = truth[is_base & (truth["dup_kind"] == "unique")]["conv_id"]
        moved_unique = set(sorted(set(singles) - referenced)[:20])
        new_ids = set(variants["conv_id"]) | moved_unique
        hist_ids = set(truth["conv_id"]) - new_ids

        convs = assemble_conversations(
            rd.read_parquet(root + "/transcripts")
        ).materialize()
        hist = convs.filter(lambda r: r["conv_id"] in hist_ids)
        new = convs.filter(lambda r: r["conv_id"] in new_ids)
        idx = str(tmp_path / "sig_index")
        write_signature_index(hist, idx)

        res = incremental_near_dup(new, idx)
        matches = res.matches.to_pandas()
        new_only = set(res.new_only.to_pandas()["conv_id"])

        # recall: every planted variant matched >= 1 historical doc of
        # its truth cluster
        matched_by = matches.groupby("new_id")["hist_id"].apply(set).to_dict()
        base_of = dict(zip(truth["conv_id"], truth["truth_cluster_id"]))
        cluster_members = truth.groupby("truth_cluster_id")["conv_id"].apply(set)
        missed = []
        for v in variants["conv_id"]:
            want = (cluster_members[base_of[v]] & hist_ids)
            if not (matched_by.get(v, set()) & want):
                missed.append(v)
        assert not missed, f"variants with no historical match: {missed[:5]}"
        # precision of the anti-join: unique movers all come through,
        # matched variants never do
        assert moved_unique <= new_only
        assert not (set(variants["conv_id"]) & new_only)
        # ids round-trip unprefixed
        assert all(not c.startswith(("h|", "n|")) for c in new_only)

    def test_empty_new_batch(self, tmp_path):
        from quarrycore_ray.pipelines.incremental import (
            incremental_near_dup,
            write_signature_index,
        )

        hist = rd.from_arrow(_conv_table({"h-1": "some historical text here"}))
        idx = str(tmp_path / "idx")
        write_signature_index(hist, idx)
        new = rd.from_arrow(_conv_table({})).filter(lambda r: True)
        res = incremental_near_dup(new, idx)
        assert res.matches.count() == 0
        assert res.new_only.count() == 0


class TestBloomZeroCopy:
    def test_readonly_view_membership(self):
        from quarrycore_ray.state.bloom import BloomFilter

        bf = BloomFilter(capacity=100)
        bf.add_many([f"k{i}" for i in range(50)])
        blob = bf.to_bytes()
        view = BloomFilter.from_bytes(blob, copy=False)
        assert all(f"k{i}" in view for i in range(50))
        assert not view.bits.flags.writeable
        import pytest as _pytest

        with _pytest.raises(ValueError):
            view.add("new-key")
        # the default copy mode stays writable
        writable = BloomFilter.from_bytes(blob)
        writable.add("new-key")
        assert "new-key" in writable


class TestSnapshotDiff:
    def test_classes(self):
        import pyarrow as pa
        import ray.data as rd

        from quarrycore_ray.pipelines.incremental import snapshot_diff

        old = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                    "text": pa.array(["a", "b", "c", None], pa.string()),
                }
            )
        )
        new = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([2, 3, 4, 5], pa.int64()),
                    "text": pa.array(["b", "C!", "", "e"], pa.string()),
                }
            )
        )
        out = snapshot_diff(old, new).to_pandas().set_index("doc_id")["change"]
        assert out.to_dict() == {1: "removed", 3: "changed", 5: "added"}
        # doc 2 unchanged -> absent; doc 4 None -> "" hashes equal -> absent
        assert 2 not in out.index and 4 not in out.index
