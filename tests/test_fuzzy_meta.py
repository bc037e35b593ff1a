"""Fuzzy matching algorithms, metadata extraction, pipeline registry."""

import pyarrow as pa
import pytest

import ray.data as rd

from quarrycore_ray.functions.fuzzy import (
    classify_match,
    levenshtein,
    levenshtein_ratio,
    ratio,
    token_set_ratio,
    token_sort_ratio,
)


class TestFuzzy:
    def test_levenshtein_known_values(self):
        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein("", "abc") == 3
        assert levenshtein("abc", "abc") == 0
        assert levenshtein("flaw", "lawn") == 2

    def test_ratio_bounds(self):
        assert ratio("same text", "same text") == 1.0
        assert ratio("abc", "xyz") == 0.0
        assert 0 < ratio("hello world", "hello there") < 1

    def test_token_sort_handles_reordering(self):
        a, b = "quick brown fox", "fox brown quick"
        assert token_sort_ratio(a, b) == 1.0
        assert ratio(a, b) < 1.0

    def test_token_set_handles_subset(self):
        assert token_set_ratio("a b c", "a b c d e f") == 1.0

    def test_classification_thresholds(self):
        # reference fuzzy_matcher.py:200-211
        assert classify_match(0.96, 100, 100) == "near_exact"
        assert classify_match(0.9, 100, 100) == "very_similar"
        assert classify_match(0.8, 300, 100) == "contains"
        assert classify_match(0.8, 100, 300) == "contained_in"
        assert classify_match(0.8, 100, 110) == "similar"

    def test_cluster_scoring(self):
        from quarrycore_ray.functions.fuzzy import fuzzy_cluster_scores

        ds = rd.from_items(
            [
                {"conv_id": "a", "cluster_id": "a",
                 "canonical_text": "the quick brown fox jumps over the lazy dog"},
                {"conv_id": "b", "cluster_id": "a",
                 "canonical_text": "the quick brown fox jumps over the hazy dog"},
                {"conv_id": "c", "cluster_id": "c",
                 "canonical_text": "unrelated single document"},
            ]
        )
        out = fuzzy_cluster_scores(ds).to_pandas()
        assert len(out) == 1
        assert out["similarity"].iloc[0] > 0.9
        assert out["match_type"].iloc[0] in ("near_exact", "very_similar")


class TestMetadata:
    def test_meta_tags_parsed(self):
        from quarrycore_ray.functions.metadata import parse_meta

        html = """<html><head><title> Page  Title </title>
        <meta property="og:title" content="OG Title">
        <meta name="description" content="A description here">
        <meta content="summary" name="twitter:card">
        <meta name="author" content="Jane Doe">
        </head><body>Published on 2024-03-15.</body></html>"""
        m = parse_meta(html)
        assert m["og_title"] == "OG Title"
        assert m["og_description"] == "A description here"
        assert m["twitter_card"] == "summary"
        assert m["author"] == "Jane Doe"
        assert m["title"] == "Page Title"
        assert m["published_date"] == "2024-03-15"

    def test_stage_over_dataset(self):
        from quarrycore_ray.functions.metadata import metadata_stage

        ds = rd.from_items(
            [{"doc_id": 1, "html": '<meta property="og:title" content="X"><title>t</title>'}]
        )
        out = metadata_stage(ds).to_pandas()
        assert out["og_title"].iloc[0] == "X"


class TestRegistry:
    def test_build_and_run_pipeline(self):
        from quarrycore_ray.registry import available_stages, build_pipeline

        assert "normalize_text" in available_stages()
        pipe = build_pipeline(
            [
                {"stage": "normalize_text"},
                {"stage": "quality_score"},
                {"stage": "filter_min_quality", "min_quality": 0.5},
            ]
        )
        ds = rd.from_items(
            [
                {"text": "the quick brown fox and the lazy dog " * 10},
                {"text": "x"},
            ]
        )
        out = pipe(ds).to_pandas()
        assert len(out) == 1
        assert out["quality"].iloc[0] >= 0.5

    def test_unknown_stage_raises(self):
        from quarrycore_ray.registry import build_pipeline

        with pytest.raises(KeyError):
            build_pipeline([{"stage": "nope"}])


class TestEmbedSources:
    def test_embedder_deterministic_and_normalized(self):
        from quarrycore_ray.functions.embed import EmbedderStage, embed

        t = pa.table(
            {
                "conv_id": pa.array(["a", "b", "c"]),
                "canonical_text": pa.array(
                    ["shared words here", "shared words there", "totally different thing"]
                ),
            }
        )
        e1 = EmbedderStage()(t)
        e2 = EmbedderStage()(t)
        import numpy as np

        m1 = np.asarray(e1["embedding"].to_pylist())
        m2 = np.asarray(e2["embedding"].to_pylist())
        assert np.allclose(m1, m2)
        assert np.allclose(np.linalg.norm(m1, axis=1), 1.0, atol=1e-5)
        # shared-vocab pair more similar than unrelated pair
        assert m1[0] @ m1[1] > m1[0] @ m1[2]
        out = embed(rd.from_arrow(t)).to_pandas()
        assert len(out) == 3

    def test_read_transcripts_validates_schema(self, tmp_path):
        import pyarrow.parquet as pq

        from quarrycore_ray.sources.io import read_transcripts

        bad = pa.table({"conv_id": pa.array(["a"]), "text": pa.array(["x"])})
        pq.write_table(bad, str(tmp_path / "bad.parquet"))
        with pytest.raises(ValueError, match="missing columns"):
            read_transcripts(str(tmp_path / "bad.parquet"))

    def test_read_url_list(self, tmp_path):
        from quarrycore_ray.sources.io import read_url_list

        p = tmp_path / "urls.txt"
        p.write_text("http://a.example\n\n# comment\nhttp://b.example \n")
        urls = read_url_list(str(p)).to_pandas()["url"].tolist()
        assert urls == ["http://a.example", "http://b.example"]


class TestSuffixArray:
    def test_lcs_known(self):
        from quarrycore_ray.functions.suffixarray import longest_common_substring

        assert longest_common_substring("abcdef", "zabcq") == 3  # "abc"
        assert longest_common_substring("", "abc") == 0
        assert longest_common_substring("same", "same") == 4

    def test_multi_doc(self):
        from quarrycore_ray.functions.suffixarray import max_cross_doc_lcp

        l, i, j = max_cross_doc_lcp(["xx shared run yy", "zz shared run qq", "none"])
        assert l == len(" shared run ") and {i, j} == {0, 1}

    def test_substring_stage_suffix_method(self):
        from quarrycore_ray.stages.substring import make_substring_scanner
        import pandas as pd

        g = pd.DataFrame(
            {
                "conv_id": ["a", "b"],
                "cluster_id": ["a", "a"],
                "canonical_text": [
                    "PREFIX " + "common overlapping section here " * 8,
                    "common overlapping section here " * 8 + "SUFFIX",
                ],
            }
        )
        out = make_substring_scanner(min_overlap=50)(g).to_pandas()
        assert len(out) == 1
        assert out["match_type"].iloc[0] == "partial_overlap"
        assert out["overlap_chars"].iloc[0] >= 8 * len("common overlapping section here ") - 2
