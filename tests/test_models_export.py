"""Optional real-model hooks + exporter round-trips.

The environment has no fasttext / sentence-transformers / tokenizers,
so the hooks are exercised with fake modules injected into sys.modules
— proving a real model drops in with zero call-site changes
(functions/models.py) — and the fallbacks stay deterministic.
"""

import json
import os
import sys
import types

import numpy as np
import pyarrow as pa

import ray.data as rd


class TestModelHooks:
    def test_embedder_uses_injected_sentence_transformer(self, monkeypatch):
        calls = {}

        class FakeModel:
            def __init__(self, name):
                calls["model"] = name

            def encode(self, texts, normalize_embeddings=False):
                calls["n"] = len(texts)
                return np.full((len(texts), 3), 0.5, dtype=np.float32)

        fake = types.ModuleType("sentence_transformers")
        fake.SentenceTransformer = FakeModel
        monkeypatch.setitem(sys.modules, "sentence_transformers", fake)

        from quarrycore_ray.functions.embed import EmbedderStage

        stage = EmbedderStage()
        out = stage(pa.table({"canonical_text": ["a", "b"]}))
        assert calls == {"model": "all-MiniLM-L6-v2", "n": 2}
        assert out["embedding"].to_pylist() == [[0.5] * 3, [0.5] * 3]

    def test_embedder_fallback_deterministic(self):
        from quarrycore_ray.functions.embed import EmbedderStage

        stage = EmbedderStage(dim=16)
        assert stage._model is None  # library absent in this env
        a = stage(pa.table({"canonical_text": ["hello world"]}))
        b = stage(pa.table({"canonical_text": ["hello world"]}))
        assert a["embedding"].to_pylist() == b["embedding"].to_pylist()

    def test_langid_uses_injected_fasttext(self, monkeypatch, tmp_path):
        model_file = tmp_path / "lid.bin"
        model_file.write_bytes(b"x")

        class FakeFT:
            def predict(self, texts):
                return ([["__label__fr"]] * len(texts), [[0.9375]] * len(texts))

        fake = types.ModuleType("fasttext")
        fake.load_model = lambda path: FakeFT()
        monkeypatch.setitem(sys.modules, "fasttext", fake)
        monkeypatch.setenv("FASTTEXT_LID_PATH", str(model_file))

        from quarrycore_ray.functions.textstats import LangIdStage

        out = LangIdStage()(pa.table({"text": ["bonjour le monde"]}))
        assert out["pred_lang"].to_pylist() == ["fr"]
        assert out["lang_conf"].to_pylist() == [0.9375]

    def test_chunker_uses_injected_tokenizer(self, monkeypatch):
        class FakeEnc:
            def __init__(self, ids):
                self.ids = ids

        class FakeTok:
            @staticmethod
            def from_pretrained(name):
                return FakeTok()

            def encode(self, text):
                return FakeEnc(list(range(len(text.split()))))

            def decode(self, ids):
                return f"<{len(ids)} toks>"

        fake = types.ModuleType("tokenizers")
        fake.Tokenizer = FakeTok
        monkeypatch.setitem(sys.modules, "tokenizers", fake)

        from quarrycore_ray.pipelines.dataset import TokenChunker

        ch = TokenChunker(chunk_tokens=4, overlap=1)
        out = ch(
            pa.table({"doc_id": [1], "canonical": ["one two three four five six"]})
        )
        # 6 tokens, windows of 4 step 3: [0..3], [3..5]
        assert out["chunk_text"].to_pylist() == ["<4 toks>", "<3 toks>"]
        assert out["n_chunk_tokens"].to_pylist() == [4, 3]


class TestExporters:
    def test_hf_export_fallback_roundtrip(self, tmp_path):
        from quarrycore_ray.pipelines.dataset import export_dataset

        path = export_dataset("/root/testdata/sf0.001", str(tmp_path), fmt="hf")
        infos = json.load(open(os.path.join(path, "dataset_infos.json")))
        assert "default" in infos and "features" in infos["default"]
        back = rd.read_parquet(os.path.join(path, "data")).to_pandas()
        assert {"doc_id", "formatted"} <= set(back.columns)
        assert len(back) > 0

    def test_conversation_nested_shape(self):
        from quarrycore_ray.pipelines.dataset import to_conversation_batch

        out = to_conversation_batch(
            pa.table({"doc_id": [1], "text": ["Title line\nbody text"]})
        )
        msgs = out["messages"].to_pylist()[0]
        assert msgs[0]["role"] == "user"
        assert msgs[0]["content"] == "Can you tell me about: Title line"
        assert msgs[1]["content"] == "Title line\nbody text"
        assert out["format"].to_pylist() == ["conversation"]
