"""Config-driven pipeline composition (the user-extension surface).

Reference: protocol interfaces + DI container + config-driven strategy
selection (`/root/reference/src/quarrycore/protocols.py:537-893`,
`container.py:81-187`, extractor cascade order config
`config/config.py:363-384`). The dataflow equivalent: a registry of
named stages (each a `Dataset -> Dataset` callable) and a declarative
spec — `[{"stage": name, **params}, ...]` — compiled into a pipeline.

Users extend the engine by registering a callable; specs can then be
stored as plain JSON/YAML-shaped dicts in config.
"""

from __future__ import annotations

from typing import Any, Callable

from .config import fixed_probe_pool

import ray.data

StageFactory = Callable[..., Callable[["ray.data.Dataset"], "ray.data.Dataset"]]

_REGISTRY: dict[str, StageFactory] = {}


def register_stage(name: str):
    """Decorator: register a stage factory under `name`.

    A factory takes the spec's params and returns `Dataset -> Dataset`.
    """

    def deco(factory: StageFactory) -> StageFactory:
        if name in _REGISTRY:
            raise ValueError(f"stage already registered: {name}")
        _REGISTRY[name] = factory
        return factory

    return deco


def available_stages() -> list[str]:
    return sorted(_REGISTRY)


def build_pipeline(spec: list[dict[str, Any]]):
    """spec -> one `Dataset -> Dataset` function (stages composed in order)."""
    steps = []
    for item in spec:
        item = dict(item)
        name = item.pop("stage")
        if name not in _REGISTRY:
            raise KeyError(f"unknown stage '{name}'; available: {available_stages()}")
        steps.append(_REGISTRY[name](**item))

    def _run(ds: "ray.data.Dataset") -> "ray.data.Dataset":
        for step in steps:
            ds = step(ds)
        return ds

    return _run


# --- built-in stage registrations -------------------------------------------


@register_stage("normalize_text")
def _normalize_factory(text_col: str = "text"):
    import pyarrow as pa

    from .text import normalize_whitespace_array

    def _stage(ds):
        def _f(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "canonical", normalize_whitespace_array(batch[text_col])
            )

        return ds.map_batches(_f, batch_format="pyarrow")

    return _stage


@register_stage("quality_score")
def _quality_factory(text_col: str = "canonical"):
    from .functions.textstats import quality_scores

    def _stage(ds):
        return ds.map_batches(
            lambda b: quality_scores(b, text_col), batch_format="pyarrow"
        )

    return _stage


@register_stage("filter_min_quality")
def _quality_filter_factory(min_quality: float = 0.6):
    import pyarrow as pa
    import pyarrow.compute as pc

    def _stage(ds):
        def _f(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.greater_equal(batch["quality"], pa.scalar(min_quality))
            )

        return ds.map_batches(_f, batch_format="pyarrow")

    return _stage


@register_stage("langid")
def _langid_factory():
    from .functions.textstats import LangIdStage

    def _stage(ds):
        return ds.map_batches(LangIdStage, batch_format="pyarrow", concurrency=fixed_probe_pool())

    return _stage


@register_stage("chunk")
def _chunk_factory(chunk_tokens: int = 64, overlap: int = 8):
    from .pipelines.dataset import TokenChunker

    def _stage(ds):
        return ds.map_batches(
            TokenChunker,
            fn_constructor_kwargs={"chunk_tokens": chunk_tokens, "overlap": overlap},
            batch_format="pyarrow",
            concurrency=fixed_probe_pool(),
        )

    return _stage


@register_stage("extract_html")
def _extract_factory(min_chars: int = 20):
    from .stages.extract import extract_html

    def _stage(ds):
        return extract_html(ds, min_chars)

    return _stage


@register_stage("extract_metadata")
def _metadata_factory(html_col: str = "html"):
    from .functions.metadata import metadata_stage

    def _stage(ds):
        return metadata_stage(ds, html_col)

    return _stage


@register_stage("extract_structured")
def _structured_factory(html_col: str = "html", base_url: str = ""):
    from .functions.structured import structured_extract_batch

    def _stage(ds):
        return ds.map_batches(
            lambda b: structured_extract_batch(b, html_col, base_url),
            batch_format="pyarrow",
        )

    return _stage


@register_stage("extract_metadata_full")
def _metadata_full_factory(html_col: str = "html"):
    from .functions.metadata import extract_metadata_full

    def _stage(ds):
        return ds.map_batches(
            lambda b: extract_metadata_full(b, html_col), batch_format="pyarrow"
        )

    return _stage


@register_stage("embed")
def _embed_factory(dim: int = 64, text_col: str = "canonical_text"):
    from .functions.embed import embed

    def _stage(ds):
        return embed(ds, dim, text_col)

    return _stage


@register_stage("gopher_quality")
def _gopher_factory():
    from .pipelines.training import gopher_stats_batch

    def _stage(ds):
        return ds.map_batches(gopher_stats_batch, batch_format="pyarrow")

    return _stage


@register_stage("filter_gopher_keep")
def _gopher_filter_factory():
    import pyarrow as pa
    import pyarrow.compute as pc

    def _stage(ds):
        def _f(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch["keep"], pa.scalar(1)))

        return ds.map_batches(_f, batch_format="pyarrow")

    return _stage


@register_stage("classify_domain")
def _domain_factory(text_col: str = "text", url_col: str | None = None):
    from .functions.domains import DomainClassifyStage

    def _stage(ds):
        return ds.map_batches(
            DomainClassifyStage,
            fn_constructor_kwargs={"text_col": text_col, "url_col": url_col},
            batch_format="pyarrow",
            concurrency=fixed_probe_pool(),
        )

    return _stage


@register_stage("decode_image")
def _decode_image_factory(decode_stub: bool = True, batch_size: int = 64):
    from .multimodal import DecodeImageStage

    def _stage(ds):
        return ds.map_batches(
            DecodeImageStage,
            fn_constructor_kwargs={"decode_stub": decode_stub},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=fixed_probe_pool(),
        )

    return _stage


@register_stage("decode_audio")
def _decode_audio_factory(batch_size: int = 64):
    from .multimodal import DecodeAudioStage

    def _stage(ds):
        return ds.map_batches(
            DecodeAudioStage,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=fixed_probe_pool(),
        )

    return _stage
