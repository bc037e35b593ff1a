"""Dataset-construction ops, dead-letter routing, multimodal plumbing,
distributed label propagation."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

SF = "/root/testdata/sf0.001"


class TestChunker:
    def test_chunk_windows_and_overlap(self):
        from quarrycore_ray.pipelines.dataset import TokenChunker

        words = [f"w{i}" for i in range(150)]
        batch = pa.table(
            {"doc_id": pa.array([1], pa.int64()), "canonical": pa.array([" ".join(words)])}
        )
        out = TokenChunker(chunk_tokens=64, overlap=8)(batch)
        assert out.num_rows == 3
        texts = out["chunk_text"].to_pylist()
        assert texts[0].split()[:64] == words[:64]
        # overlap: second chunk starts at 56
        assert texts[1].split()[0] == "w56"
        assert out["n_chunk_tokens"].to_pylist() == [64, 64, 38]

    def test_chunk_documents_runs(self):
        from quarrycore_ray.pipelines.dataset import chunk_documents

        out = chunk_documents(SF).to_pandas()
        assert len(out) >= 500  # every doc produces >= 1 chunk
        assert (out["n_chunk_tokens"] > 0).all()


class TestDatasetOps:
    def test_split_sums_to_total(self):
        from quarrycore_ray.pipelines.dataset import train_val_test_split

        out = train_val_test_split(SF).to_pandas().set_index("split")["n_docs"]
        assert out.sum() == 500
        assert out["train"] > out["val"] and out["train"] > out["test"]

    def test_curriculum_rank_monotone(self):
        from quarrycore_ray.pipelines.dataset import curriculum_sample

        out = curriculum_sample(SF, k=50)
        assert list(out["rank"]) == list(range(1, 51))
        assert out["n_chars"].is_monotonic_increasing

    def test_export_roundtrip(self, tmp_path):
        from quarrycore_ray.pipelines.dataset import export_dataset

        p = export_dataset(SF, str(tmp_path), "parquet")
        back = rd.read_parquet(p).to_pandas()
        assert len(back) == 500
        assert back["formatted"].str.startswith("### Instruction:").all()


class TestDeadLetter:
    def test_split_clean_and_dead(self):
        from quarrycore_ray.stages.deadletter import FallibleRowStage, split_dead_letter

        def parse(v: str) -> int:
            return int(v)

        ds = rd.from_items([{"x": "1"}, {"x": "nope"}, {"x": "3"}, {"x": "bad"}])
        tagged = ds.map_batches(
            FallibleRowStage(parse, "x", "parsed"), batch_format="pyarrow"
        )
        clean, dead = split_dead_letter(tagged)
        cp = clean.to_pandas()
        dp = dead.to_pandas()
        assert sorted(cp["parsed"]) == [1, 3]
        assert len(dp) == 2
        assert dp["_error"].str.contains("ValueError").all()


class TestMultimodal:
    def test_decode_features(self):
        from quarrycore_ray.multimodal import media_features, synth_media_table

        media = rd.from_arrow(synth_media_table(20))
        out = media_features(media).to_pandas()
        assert len(out) == 20
        assert (out["width"] >= 16).all() and (out["height"] >= 16).all()
        assert out["mean_intensity"].between(0, 255).all()

    def test_resize(self):
        from quarrycore_ray.multimodal import DecodeImageStage, ResizeStage, synth_media_table

        t = synth_media_table(5)
        resized = ResizeStage(target=8)(t)
        decoded = DecodeImageStage()(resized)
        assert decoded["width"].to_pylist() == [8] * 5
        assert decoded["height"].to_pylist() == [8] * 5

    def test_real_codec_is_stubbed(self):
        from quarrycore_ray.multimodal import DecodeImageStage, synth_media_table

        with pytest.raises(NotImplementedError):
            DecodeImageStage(decode_stub=False)(synth_media_table(1))


class TestLabelPropagation:
    def test_matches_union_find(self):
        from quarrycore_ray.oracle import UnionFind
        from quarrycore_ray.stages.cluster import label_propagation

        # small-diameter graph: each BSP round costs two fixed-latency
        # shuffles, so the test budget allows only a few rounds
        rng = np.random.default_rng(7)
        nodes = [f"n{i:03d}" for i in range(16)]
        edges = [(nodes[i], nodes[i + 1]) for i in range(0, 4)]  # one 5-chain
        for _ in range(14):
            i, j = rng.integers(0, 16, 2)
            if i != j:
                edges.append((nodes[min(i, j)], nodes[max(i, j)]))
        uf = UnionFind()
        for a, b in edges:
            uf.union(a, b)
        expected = uf.components()

        eds = rd.from_items([{"a_id": a, "b_id": b} for a, b in edges])
        labels = label_propagation(eds, max_rounds=4, num_partitions=2).to_pandas()
        got = dict(zip(labels["node"], labels["label"]))
        assert got == {n: r for n, r in expected.items()}


class TestSketches:
    def test_hll_accuracy_and_merge(self):
        from quarrycore_ray.functions.sketches import HyperLogLog

        h1, h2 = HyperLogLog(), HyperLogLog()
        for i in range(6000):
            h1.add(f"w{i}")
        for i in range(4000, 10000):
            h2.add(f"w{i}")
        m = h1.merge(h2)
        assert abs(m.cardinality() - 10000) / 10000 < 0.05
        rt = HyperLogLog.from_bytes(m.to_bytes())
        assert rt.cardinality() == m.cardinality()

    def test_approx_vocab_close_to_exact(self):
        from quarrycore_ray.functions.sketches import approx_vocab_size
        from quarrycore_ray.pipelines.documents import canonical_docs, vocab_stats

        est = approx_vocab_size(canonical_docs(SF))
        exact = int(vocab_stats(SF)["vocab_size"].iloc[0])
        assert abs(est - exact) / exact < 0.05


class TestFrameSample:
    def test_every_kth_frame_decodable(self):
        import struct

        import pyarrow as pa

        from quarrycore_ray.multimodal import (
            DecodeImageStage,
            FrameSampleStage,
            make_fake_video,
        )

        batch = pa.table(
            {
                "media_id": pa.array([7], pa.int64()),
                "payload": pa.array([make_fake_video(10, 8, 6, seed=1)], pa.binary()),
            }
        )
        frames = FrameSampleStage(every=3)(batch)
        assert frames["frame_idx"].to_pylist() == [0, 3, 6, 9]
        assert frames["media_id"].to_pylist() == [7] * 4
        # sampled frames chain into the image decode stage
        decoded = DecodeImageStage()(frames)
        assert decoded["width"].to_pylist() == [8] * 4
        assert decoded["height"].to_pylist() == [6] * 4
        # each frame payload carries exactly one raster
        for p in frames["payload"].to_pylist():
            w, h = struct.unpack("<HH", p[4:8])
            assert len(p) == 8 + w * h

    def test_y4m_roundtrip_real_parser(self):
        import numpy as np
        import pyarrow as pa

        from quarrycore_ray.multimodal import (
            DecodeImageStage,
            FrameSampleStage,
            encode_y4m,
            iter_y4m_frames,
        )

        rng = np.random.default_rng(5)
        # even dims -> C420jpeg with chroma planes; odd dims -> Cmono
        for h, w in [(6, 8), (7, 9)]:
            frames = rng.integers(0, 256, (5, h, w), dtype=np.uint8)
            payload = encode_y4m(frames)
            got = list(iter_y4m_frames(payload))
            assert [(gw, gh) for gw, gh, _ in got] == [(w, h)] * 5
            for i, (_, _, luma) in enumerate(got):
                assert luma == frames[i].tobytes()
            batch = pa.table(
                {
                    "media_id": pa.array([1], pa.int64()),
                    "payload": pa.array([payload], pa.binary()),
                }
            )
            sampled = FrameSampleStage(every=2, decode_stub=False)(batch)
            assert sampled["frame_idx"].to_pylist() == [0, 2, 4]
            decoded = DecodeImageStage()(sampled)
            assert decoded["width"].to_pylist() == [w] * 3
            means = decoded["mean_intensity"].to_pylist()
            for fi, m in zip([0, 2, 4], means):
                assert m == float(frames[fi].astype(np.float64).mean())

    def test_y4m_default_colorspace_and_errors(self):
        import pytest

        from quarrycore_ray.multimodal import FrameSampleStage, iter_y4m_frames

        # C absent -> 420jpeg default plane sizing (spec default)
        payload = (
            b"YUV4MPEG2 W2 H2 F25:1\n"
            + b"FRAME\n" + bytes(4) + bytes(1) + bytes(1)
            + b"FRAME\n" + bytes(range(4)) + bytes(1) + bytes(1)
        )
        got = list(iter_y4m_frames(payload))
        assert len(got) == 2 and got[1][2] == bytes(range(4))
        with pytest.raises(NotImplementedError):
            list(iter_y4m_frames(b"YUV4MPEG2 W2 H2 C411\nFRAME\n" + bytes(6)))
        with pytest.raises(ValueError):
            list(iter_y4m_frames(b"YUV4MPEG2 W2 H2 Cmono\nFRAME\n" + bytes(3)))
        # VID1 stub container is rejected when stub decode is off
        with pytest.raises(NotImplementedError):
            list(FrameSampleStage(decode_stub=False)._frames(b"VID1" + bytes(6)))


class TestIvfAnn:
    def test_kmeans_deterministic_normalized(self):
        from quarrycore_ray.functions.similarity import spherical_kmeans

        rng = np.random.default_rng(0)
        sample = rng.standard_normal((200, 16))
        sample /= np.linalg.norm(sample, axis=1, keepdims=True)
        c1 = spherical_kmeans(sample, 8, seed=13)
        c2 = spherical_kmeans(sample, 8, seed=13)
        assert np.array_equal(c1, c2)
        assert c1.shape == (8, 16)
        assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)
        # more cells than points clamps
        assert spherical_kmeans(sample[:3], 8, seed=13).shape[0] == 3

    def test_ivf_recall_vs_exact(self):
        from quarrycore_ray.functions.similarity import ann_ivf_knn, knn_cosine

        exact = knn_cosine(SF, n_queries=5, k=5)
        approx = ann_ivf_knn(SF, n_queries=5, k=5)
        hits = 0
        for q in exact["q_id"].unique():
            truth = set(exact[exact["q_id"] == q]["n_id"])
            got = set(approx[approx["q_id"] == q]["n_id"])
            hits += len(truth & got)
        recall = hits / len(exact)
        # synthetic embeddings are label-clustered; the probed cells
        # should recover most exact neighbors
        assert recall >= 0.6, recall
        # output contract matches the exact variant
        assert list(approx.columns) == ["q_id", "n_id", "rank", "cosine"]
        assert (approx.groupby("q_id")["rank"].min() == 1).all()

    def test_ivf_assign_fixed_quantizer(self):
        """ivf_assign_knn (fixed seeded quantizer, exact-oracled split
        of the IVF path): deterministic, contract-shaped, and a probe
        over ALL cells degenerates to exact brute-force top-k."""
        from quarrycore_ray.functions.similarity import (
            ivf_assign_knn, knn_cosine,
        )

        a = ivf_assign_knn(SF, n_queries=3, k=5)
        b = ivf_assign_knn(SF, n_queries=3, k=5)
        assert a.equals(b)
        assert list(a.columns) == ["q_id", "n_id", "rank", "cosine"]
        assert (a["q_id"] != a["n_id"]).all()
        assert (a.groupby("q_id")["rank"].max() <= 5).all()
        # nprobe = nlist probes every cell -> identical to exact knn
        full = ivf_assign_knn(SF, n_queries=3, k=5, nprobe=100)
        exact = knn_cosine(SF, n_queries=3, k=5)
        assert list(full["n_id"]) == list(exact["n_id"])
        assert np.allclose(full["cosine"], exact["cosine"], atol=2e-6)


class TestWarmStore:
    def test_partitioned_roundtrip(self, tmp_path):
        from quarrycore_ray.sources.io import read_warm_store, write_partitioned

        out = str(tmp_path / "warm")
        ds = rd.read_parquet(f"{SF}/events.parquet")
        n = ds.count()
        write_partitioned(ds, out, partition_cols=["event_type"], date_col="ts")
        import os

        # hive key=value layout, one directory level per partition col
        types = sorted(d for d in os.listdir(out) if d.startswith("event_type="))
        assert types, os.listdir(out)
        days = os.listdir(os.path.join(out, types[0]))
        assert all(d.startswith("date=") for d in days)

        back = read_warm_store(out)
        assert back.count() == n
        pdf = back.to_pandas()
        # derived date partition matches the preserved timestamp column
        assert (pdf["ts"].dt.strftime("%Y-%m-%d") == pdf["date"].astype(str)).all()


class TestBenchContract:
    def test_bench_emits_one_json_line(self, tmp_path):
        """The external driver parses bench.py's stdout as ONE JSON line
        with a fixed key contract — a silent format break would void the
        round's bench artifact, so pin it here. Runs the headline on a
        tiny corpus in a fresh subprocess (bench owns its own Ray
        session; queries skipped)."""
        import json
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS="4",
            GRAFT_BENCH_CONVS="300",
            GRAFT_SKIP_QUERIES="1",
            GRAFT_BENCH_CORPUS_DIR=str(tmp_path / "corpus"),
        )
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "bench.py")],
            env=env, capture_output=True, text=True, timeout=420, check=True,
        ).stdout
        lines = [ln for ln in out.strip().splitlines() if ln.strip()]
        assert len(lines) == 1, f"stdout must be one JSON line, got: {lines}"
        rec = json.loads(lines[0])
        for key in ("metric", "value", "unit", "queries", "sf", "num_cpus",
                    "n_turns", "turns_per_sec", "n_clusters"):
            assert key in rec, f"missing key {key}"
        assert rec["unit"] == "sec" and rec["value"] > 0
        assert rec["num_cpus"] == 4 and rec["n_turns"] > 0


class TestSemDedupMargin:
    """semdedup_prune's oracle agreement relies on every candidate
    cosine keeping a wide margin from the 0.35 threshold (engine GEMM
    vs DuckDB list_cosine_similarity can differ by ~1 ulp). Assert the
    margin on the driver corpora so a testdata change fails loudly."""

    @pytest.mark.parametrize(
        "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    )
    def test_threshold_margin(self, sf):
        import collections

        import pyarrow.parquet as pq

        tb = pq.read_table(f"{sf}/embeddings.parquet",
                           columns=["vec_id", "label", "embedding"])
        by = collections.defaultdict(list)
        for vid, lab, e in zip(tb["vec_id"].to_pylist(),
                               tb["label"].to_pylist(),
                               tb["embedding"].to_pylist()):
            by[lab].append((vid, np.asarray(e, dtype=np.float64)))
        worst = 1.0
        for rows in by.values():
            rows.sort()
            m = np.stack([r[1] for r in rows])
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            cos = m @ m.T
            iu = np.tril_indices(len(rows), k=-1)
            if len(iu[0]):
                worst = min(worst, float(np.abs(cos[iu] - 0.35).min()))
        assert worst > 1e-6, worst


class TestRealImageCodecs:
    """decode_png / decode_bmp are real from-spec codecs (multimodal.py):
    pin them against hand-built files covering every PNG filter type and
    the BMP 24-bit/8-bit layouts."""

    def _png_with_filters(self, img, filters):
        """Build a PNG whose y-th scanline uses filters[y], applying the
        spec's filter functions in reverse (test-side reference)."""
        import struct as _s
        import zlib as _z

        h, w = img.shape[:2]
        ch = 1 if img.ndim == 2 else img.shape[2]
        flat = img.reshape(h, w * ch).astype(np.int32)
        out = bytearray()
        prev = np.zeros(w * ch, dtype=np.int32)
        for y in range(h):
            f = filters[y]
            row = flat[y]
            enc = np.zeros(w * ch, dtype=np.int32)
            for x in range(w * ch):
                a = row[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                enc[x] = (row[x] - pred) & 0xFF
            out += bytes([f]) + bytes(enc.astype(np.uint8))
            prev = row
        from quarrycore_ray.multimodal import _PNG_MAGIC

        def chunk(t, d):
            return _s.pack(">I", len(d)) + t + d + _s.pack(">I", _z.crc32(t + d) & 0xFFFFFFFF)

        color = {1: 0, 3: 2, 4: 6}[ch]
        ihdr = _s.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", _z.compress(bytes(out))) + chunk(b"IEND", b""))

    def test_png_all_filters_gray_and_rgb(self):
        from quarrycore_ray.multimodal import decode_png

        rng = np.random.default_rng(5)
        gray = rng.integers(0, 256, (5, 7), dtype=np.uint8)
        png = self._png_with_filters(gray, [0, 1, 2, 3, 4])
        assert np.array_equal(decode_png(png), gray)
        rgb = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
        png = self._png_with_filters(rgb, [4, 3, 2, 1, 0])
        assert np.array_equal(decode_png(png), rgb)

    def test_png_roundtrip_writer(self):
        from quarrycore_ray.multimodal import decode_png, encode_png

        rng = np.random.default_rng(6)
        for shape in [(9, 11), (6, 5, 3), (4, 4, 4)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            assert np.array_equal(decode_png(encode_png(img)), img)

    def test_bmp_24bit(self):
        import struct as _s

        from quarrycore_ray.multimodal import decode_bmp

        rng = np.random.default_rng(7)
        h, w = 3, 5
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        row_bytes = (w * 3 + 3) & ~3
        body = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up
            row = img[y][:, ::-1].tobytes()  # RGB -> BGR
            body += row + b"\x00" * (row_bytes - len(row))
        off = 14 + 40
        hdr = (b"BM" + _s.pack("<IHHI", off + len(body), 0, 0, off)
               + _s.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0))
        assert np.array_equal(decode_bmp(hdr + bytes(body)), img)

    def test_decode_stage_handles_real_png(self):
        from quarrycore_ray.multimodal import DecodeImageStage, encode_png

        img = np.full((10, 20), 7, dtype=np.uint8)
        t = pa.table(
            {
                "media_id": pa.array([1], pa.int64()),
                "payload": pa.array([encode_png(img)], pa.binary()),
            }
        )
        out = DecodeImageStage(decode_stub=False)(t)
        assert out["width"].to_pylist() == [20]
        assert out["height"].to_pylist() == [10]
        assert out["mean_intensity"].to_pylist() == [7.0]

    def test_resize_real_png_end_to_end(self):
        from quarrycore_ray.multimodal import (
            DecodeImageStage,
            ResizeStage,
            encode_png,
        )

        rng = np.random.default_rng(8)
        img = rng.integers(0, 256, (40, 30, 3), dtype=np.uint8)
        t = pa.table(
            {
                "media_id": pa.array([1], pa.int64()),
                "payload": pa.array([encode_png(img)], pa.binary()),
            }
        )
        resized = ResizeStage(target=8, decode_stub=False)(t)
        out = DecodeImageStage(decode_stub=False)(resized)
        assert out["width"].to_pylist() == [8]
        assert out["height"].to_pylist() == [8]


class TestAudioDecode:
    def test_wav_roundtrip_features(self):
        from quarrycore_ray.multimodal import DecodeAudioStage, encode_wav

        t = np.arange(16000, dtype=np.float64) / 16000.0
        sine = (np.sin(2 * np.pi * 440 * t) * 10000).astype(np.int16)
        payload = encode_wav(sine, sample_rate=16000)
        out = DecodeAudioStage()(
            pa.table(
                {
                    "media_id": pa.array([1], pa.int64()),
                    "payload": pa.array([payload], pa.binary()),
                }
            )
        )
        assert out["sample_rate"].to_pylist() == [16000]
        assert out["n_channels"].to_pylist() == [1]
        assert out["n_samples"].to_pylist() == [16000]
        assert abs(out["duration_s"].to_pylist()[0] - 1.0) < 1e-9
        # RMS of a full-cycle sine = amplitude / sqrt(2)
        assert abs(out["rms"].to_pylist()[0] - 10000 / np.sqrt(2)) < 25

    def test_non_wav_raises(self):
        from quarrycore_ray.multimodal import DecodeAudioStage

        with pytest.raises(NotImplementedError):
            DecodeAudioStage()(
                pa.table(
                    {
                        "media_id": pa.array([1], pa.int64()),
                        "payload": pa.array([b"ID3\x03fakemp3"], pa.binary()),
                    }
                )
            )


class TestAnnRecallEval:
    def test_matches_manual_intersection(self):
        from quarrycore_ray.functions.similarity import (
            ann_lsh_knn,
            ann_recall_eval,
            knn_cosine,
        )

        exact = knn_cosine(SF, n_queries=5, k=5)
        approx = ann_lsh_knn(SF, n_queries=5, k=5)
        out = ann_recall_eval(SF, n_queries=5, k=5).set_index("q_id")
        for q in exact["q_id"].unique():
            truth = set(exact[exact["q_id"] == q]["n_id"])
            got = set(approx[approx["q_id"] == q]["n_id"])
            assert out.loc[q, "n_exact"] == len(truth)
            assert out.loc[q, "n_hit"] == len(truth & got)
            assert 0.0 <= out.loc[q, "recall"] <= 1.0
        assert list(out.columns) == ["n_exact", "n_hit", "recall"]


class TestLangConfusionMatrix:
    def test_counts_partition_the_corpus(self):
        from quarrycore_ray.pipelines.documents import (
            lang_confusion_matrix,
            langid_docs,
        )

        out = lang_confusion_matrix(SF)
        pred = langid_docs(SF).to_pandas()
        # total count equals corpus size; cells are positive
        assert out["n"].sum() == len(pred)
        assert (out["n"] > 0).all()
        # cell (t, p) equals the direct join count for one spot cell
        import pyarrow.parquet as _pq

        truth = _pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "lang"]
        ).to_pandas()
        j = pred.merge(truth, on="doc_id")
        spot = (
            j.groupby(["lang", "pred_lang"]).size().reset_index(name="n")
        )
        t, p, n = spot.iloc[0]["lang"], spot.iloc[0]["pred_lang"], spot.iloc[0]["n"]
        cell = out[(out["true_lang"] == t) & (out["pred_lang"] == p)]
        assert int(cell["n"].iloc[0]) == int(n)


class TestRandomProjection:
    def test_signs_and_projection_match_hand(self, tmp_path):
        import hashlib
        import math

        import pyarrow.parquet as pq

        from quarrycore_ray.functions.similarity import (
            random_projection_embeddings,
        )

        vecs = {
            0: [0.5, -0.25, 1.0],
            1: [0.0, 0.000001, -0.000001],
        }
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(sorted(vecs), pa.int64()),
                    "embedding": pa.array(
                        [vecs[i] for i in sorted(vecs)], pa.list_(pa.float32())
                    ),
                    "label": pa.array([0, 1], pa.int32()),
                }
            ),
            str(tmp_path / "embeddings.parquet"),
        )
        out = (
            random_projection_embeddings(str(tmp_path), k=4)
            .to_pandas()
            .set_index("vec_id")
        )

        def sign(d, j):
            nib = int(hashlib.md5(f"{d}:{j}".encode()).hexdigest()[0], 16)
            return 1 if nib % 2 == 0 else -1

        import numpy as np

        for vid, v in vecs.items():
            xm = [
                int(math.floor(float(np.float32(x)) * 1e6 + 0.5)) for x in v
            ]
            for j in range(4):
                want = sum(xm[d] * sign(d, j) for d in range(3))
                assert out.loc[vid, f"p{j}"] == want, (vid, j)


class TestHybridSearch:
    def test_rrf_fusion_matches_hand(self, tmp_path):
        import math

        import numpy as np
        import pyarrow.parquet as pq

        from quarrycore_ray.pipelines.documents import hybrid_search_docs

        texts = {
            0: "table scan merge table",        # hits all three terms
            1: "table only here",
            2: "nothing relevant at all",
            3: "merge merge merge",
        }
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(sorted(texts), pa.int64()),
                    "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        vecs = {
            0: [1.0, 0.0], 1: [0.9, 0.1], 2: [0.0, 1.0], 3: [0.5, 0.5],
        }
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(sorted(vecs), pa.int64()),
                    "embedding": pa.array(
                        [vecs[i] for i in sorted(vecs)], pa.list_(pa.float32())
                    ),
                    "label": pa.array([0] * 4, pa.int32()),
                }
            ),
            str(tmp_path / "embeddings.parquet"),
        )
        out = hybrid_search_docs(str(tmp_path), k=10).set_index("doc_id")

        # hand BM25 over terms (table, scan, merge)
        toks = {d: t.split(" ") for d, t in texts.items()}
        dls = {d: len(t) for d, t in toks.items()}
        n, total = 4, sum(dls.values())
        scores = {}
        for d in texts:
            s = 0
            for term in ("table", "scan", "merge"):
                tf = toks[d].count(term)
                if tf == 0:
                    continue
                df = sum(1 for dd in texts if term in toks[dd])
                idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
                tfn = (tf * 2.2) / (
                    tf + 1.2 * (0.25 + 0.75 * ((dls[d] * n) / total))
                )
                s += int(math.floor((idf * tfn) * 1_000_000.0 + 0.5))
            scores[d] = s
        lex_order = sorted(texts, key=lambda d: (-scores[d], d))
        # semantic: cosine vs normalized vec 0
        qv = np.array(vecs[0]) / np.linalg.norm(vecs[0])
        cos = {
            d: float(np.dot(np.array(v, dtype=np.float32).astype(np.float64)
                            / np.linalg.norm(np.array(v, dtype=np.float32).astype(np.float64)), qv))
            for d, v in vecs.items()
        }
        sem_order = sorted(vecs, key=lambda d: (-cos[d], d))
        for d in texts:
            lr = lex_order.index(d) + 1
            sr = sem_order.index(d) + 1
            want = 1_000_000 // (60 + lr) + 1_000_000 // (60 + sr)
            assert out.loc[d, "fused_micro"] == want, d
            assert out.loc[d, "lex_rank"] == lr
            assert out.loc[d, "sem_rank"] == sr


class TestMmrRerank:
    def test_greedy_trace_matches_hand(self, tmp_path):
        import numpy as np
        import pyarrow.parquet as pq

        from quarrycore_ray.functions.similarity import mmr_rerank_docs

        # query = doc0's direction. Step 2 of MMR reduces to 4*rel (the
        # only selected doc IS the query direction), so diversity can
        # only reorder from step 3 on: doc2 is a near-duplicate twin of
        # doc1, doc3 is diverse with moderate relevance — MMR must pick
        # doc3 third even though pure relevance ranks doc2 above it
        # (obj3 = 7*500000 - 3*500000 = 2.0e6 vs
        #  obj2 = 7*702070 - 3*999987 ~= 1.91e6, ~85k micro margin).
        vecs = {
            0: [1.0, 0.0, 0.0],      # query itself, rel = 1
            1: [0.7, 0.7, 0.0],      # high relevance
            2: [0.70, 0.71, 0.0],    # near-duplicate of doc1
            3: [0.5, 0.0, 0.86603],  # diverse, moderate relevance
        }
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(sorted(vecs), pa.int64()),
                    "embedding": pa.array(
                        [vecs[i] for i in sorted(vecs)], pa.list_(pa.float32())
                    ),
                    "label": pa.array([0] * 4, pa.int32()),
                }
            ),
            str(tmp_path / "embeddings.parquet"),
        )
        out = mmr_rerank_docs(str(tmp_path), n_cand=4, k=4)

        def norm(v):
            v = np.array(v, dtype=np.float32).astype(np.float64)
            return v / np.linalg.norm(v)

        mat = np.array([norm(vecs[i]) for i in range(4)])
        rel = np.floor(mat @ norm(vecs[0]) * 1e6 + 0.5).astype(int)
        sim = np.floor(mat @ mat.T * 1e6 + 0.5).astype(int)
        sel, remaining = [], set(range(4))
        for _ in range(4):
            best = None
            for d in sorted(remaining):
                ms = max((int(sim[d, s]) for s in sel), default=0)
                obj = 7 * int(rel[d]) - 3 * ms
                if best is None or obj > best[0]:
                    best = (obj, d)
            sel.append(best[1])
            remaining.discard(best[1])
        assert out["doc_id"].tolist() == sel
        # the diverse doc must outrank the near-duplicate twin, even
        # though pure relevance orders them the other way
        assert sel.index(3) < sel.index(2)
        assert rel[2] > rel[3]


class TestEmbeddingDupPairsAnn:
    """`embedding_dup_pairs_ann` (LSH prefilter -> exact cosine verify)
    must be output-identical to brute-force all-pairs on a corpus whose
    duplicate structure is ANN-recallable (VERDICT r4 #4: clears the
    all-pairs O(n^2) design watch; all-pairs stays the oracle)."""

    def _corpus(self, n=400, dim=64, n_groups=25, seed=7):
        import numpy as np

        rng = np.random.default_rng(seed)
        base = rng.standard_normal((n, dim))
        ids = np.arange(n, dtype=np.int64)
        # planted near-copies: tiny perturbation -> cosine ~0.999
        dup = base[:n_groups] + 0.02 * rng.standard_normal((n_groups, dim))
        emb = np.concatenate([base, dup])
        vids = np.concatenate([ids, ids[:n_groups] + 10_000])
        return pa.table(
            {
                "vec_id": pa.array(vids, pa.int64()),
                "embedding": pa.array(list(emb), pa.list_(pa.float64())),
            }
        )

    def test_parity_with_all_pairs(self):
        import numpy as np

        import ray.data as rd

        from quarrycore_ray.exactmath import floor_round_np
        from quarrycore_ray.functions.similarity import (
            _normalize,
            embedding_dup_pairs_ann,
        )

        tb = self._corpus()
        got = embedding_dup_pairs_ann(rd.from_arrow(tb), threshold=0.9)

        # brute-force reference on the driver
        ids = np.asarray(tb["vec_id"], dtype=np.int64)
        m = _normalize(
            np.asarray(tb["embedding"].combine_chunks().values).reshape(
                len(ids), -1
            )
        )
        cos = m @ m.T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = cos[iu, ju] >= 0.9
        import pandas as pd

        a, b = ids[iu[keep]], ids[ju[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        want = (
            pd.DataFrame(
                {
                    "a_id": lo,
                    "b_id": hi,
                    "cosine": floor_round_np(cos[iu, ju][keep]),
                }
            )
            .sort_values(["a_id", "b_id"])
            .reset_index(drop=True)
        )
        assert len(want) >= 25  # every planted pair is present
        pd.testing.assert_frame_equal(got, want)

    def test_bucket_cap_never_binds_on_sf(self):
        """The deterministic skew truncation must not fire on the test
        corpora (output-identity precondition)."""
        import numpy as np

        from quarrycore_ray.functions.similarity import (
            _quantize_u,
            _to_matrix,
            lsh_planes_u,
        )
        import pyarrow.parquet as pq

        tb = pq.read_table("/root/testdata/sf0.01/embeddings.parquet")
        ids = np.asarray(tb["vec_id"], dtype=np.int64)
        emb = np.asarray(
            tb["embedding"].combine_chunks().values, dtype=np.float64
        ).reshape(len(ids), -1)
        planes = lsh_planes_u(emb.shape[1], 8, 8, 13)
        emb_u = _quantize_u(emb)
        for t in range(8):
            bits = (emb_u @ planes[t].T > 0).astype(np.int64)
            key = bits @ (1 << np.arange(8, dtype=np.int64))
            _, counts = np.unique(key, return_counts=True)
            assert counts.max() <= 1024
