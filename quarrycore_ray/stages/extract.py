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


class HtmlExtractStage:
    """Per-row extraction cascade with a min-length quality gate.

    Output columns: text (extracted or ''), title, extractor (winning
    strategy name or ''), reject_reason ('' when accepted). The reject
    path mirrors the reference's quality-gated rejection (docs shorter
    than `min_chars` after every strategy are rejected, manager.py
    quality gate).
    """

    def __init__(self, min_chars: int = 20):
        self.min_chars = min_chars

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts: list[str] = []
        titles: list[str] = []
        extractors: list[str] = []
        reasons: list[str] = []
        for html in batch["html"].to_pylist():
            html = html or ""
            tm = _TITLE_RE.search(html)
            titles.append(normalize_whitespace(tm.group(1)) if tm else "")
            chosen = ""
            text = ""
            for name, fn in CASCADE:
                out = fn(html)
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


def extract_html(ds: "ray.data.Dataset", min_chars: int = 20) -> "ray.data.Dataset":
    return ds.map_batches(
        HtmlExtractStage,
        fn_constructor_kwargs={"min_chars": min_chars},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
