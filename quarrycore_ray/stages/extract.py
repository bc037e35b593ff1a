"""HTML extraction cascade + quality gate.

Reference semantics: `ExtractorManager.extract` runs a quality-gated
cascade of extractors per document
(`/root/reference/src/quarrycore/extractor/manager.py:119-236`:
trafilatura -> readability -> soup, first result whose quality score
clears the bar wins; rejects get a reason). Those third-party
extractors aren't available here, so the cascade runs over our own
strategies — strict HTML text extraction, then the lenient regex
fallback (`quarrycore_ray.text.canonicalize_html`, itself the port of
the reference's regex path canonical.py:127-153) — with the same
gate-and-fallthrough control flow and a reject reason column.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data

from ..text import canonicalize_html, normalize_whitespace

_BODY_RE = re.compile(r"<body\b[^>]*>(.*?)</body>", re.DOTALL | re.IGNORECASE)
_TITLE_RE = re.compile(r"<title\b[^>]*>(.*?)</title>", re.DOTALL | re.IGNORECASE)


def _extract_strict(html: str) -> str | None:
    """Strategy 1: body-scoped extraction; None when no <body>."""
    m = _BODY_RE.search(html)
    if not m:
        return None
    return canonicalize_html(m.group(1))


def _extract_lenient(html: str) -> str | None:
    """Strategy 2: whole-document regex extraction (always succeeds)."""
    return canonicalize_html(html)


CASCADE = (("strict_body", _extract_strict), ("lenient", _extract_lenient))

_STRATEGIES = dict(CASCADE)
DEFAULT_ORDER = tuple(name for name, _ in CASCADE)


class HtmlExtractStage:
    """Per-row extraction cascade with a min-length quality gate.

    Output columns: text (extracted or ''), title, extractor (winning
    strategy name or ''), reject_reason ('' when accepted). The reject
    path mirrors the reference's quality-gated rejection (docs shorter
    than `min_chars` after every strategy are rejected, manager.py
    quality gate).

    `domain_overrides` maps a content domain to a strategy ordering,
    the reference's per-domain cascade override
    (config/config.py:376-378 `ExtractionSettings.domain_overrides`;
    applied in manager.py's cascade selection). Rows carry an optional
    `domain` column; domains without an override use `cascade_order`.
    """

    def __init__(
        self,
        min_chars: int = 20,
        cascade_order: tuple[str, ...] = DEFAULT_ORDER,
        domain_overrides: dict[str, tuple[str, ...]] | None = None,
    ):
        self.min_chars = min_chars
        unknown = [
            n
            for order in [cascade_order, *(domain_overrides or {}).values()]
            for n in order
            if n not in _STRATEGIES
        ]
        if unknown:
            raise ValueError(f"unknown extractor strategies: {unknown}")
        if not cascade_order:
            raise ValueError("cascade_order must contain at least one extractor")
        self.cascade_order = cascade_order
        self.domain_overrides = {
            k: tuple(v) for k, v in (domain_overrides or {}).items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts: list[str] = []
        titles: list[str] = []
        extractors: list[str] = []
        reasons: list[str] = []
        domains = (
            batch["domain"].to_pylist()
            if "domain" in batch.column_names
            else [None] * batch.num_rows
        )
        for html, domain in zip(batch["html"].to_pylist(), domains):
            html = html or ""
            tm = _TITLE_RE.search(html)
            titles.append(normalize_whitespace(tm.group(1)) if tm else "")
            chosen = ""
            text = ""
            order = self.domain_overrides.get(domain, self.cascade_order)
            for name in order:
                out = _STRATEGIES[name](html)
                if out is not None and len(out) >= self.min_chars:
                    chosen, text = name, out
                    break
            texts.append(text)
            extractors.append(chosen)
            reasons.append("" if chosen else "below_min_length")
        batch = batch.append_column("text", pa.array(texts, pa.string()))
        batch = batch.append_column("title", pa.array(titles, pa.string()))
        batch = batch.append_column("extractor", pa.array(extractors, pa.string()))
        return batch.append_column("reject_reason", pa.array(reasons, pa.string()))


def extract_html(
    ds: "ray.data.Dataset",
    min_chars: int = 20,
    domain_overrides: dict[str, tuple[str, ...]] | None = None,
) -> "ray.data.Dataset":
    return ds.map_batches(
        HtmlExtractStage,
        fn_constructor_kwargs={
            "min_chars": min_chars,
            "domain_overrides": domain_overrides,
        },
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
