"""HTML metadata extraction (OpenGraph / Twitter Card / author / date).

Reference: `metadata/metadata_extractor.py:152-592` and the structured-
data/author/date sub-extractors (SURVEY.md §2.3) parse meta tags and
date patterns from HTML. Re-expressed as one vectorized batch pass with
compiled regexes (stateless; compile cost amortized at module import).
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data

from ..text import normalize_whitespace

_META_RE = re.compile(
    r"<meta\s+[^>]*?(?:name|property)\s*=\s*[\"']([^\"']+)[\"'][^>]*?"
    r"content\s*=\s*[\"']([^\"']*)[\"'][^>]*?>",
    re.IGNORECASE | re.DOTALL,
)
_META_RE_REV = re.compile(  # content before name
    r"<meta\s+[^>]*?content\s*=\s*[\"']([^\"']*)[\"'][^>]*?"
    r"(?:name|property)\s*=\s*[\"']([^\"']+)[\"'][^>]*?>",
    re.IGNORECASE | re.DOTALL,
)
_TITLE_RE = re.compile(r"<title\b[^>]*>(.*?)</title>", re.DOTALL | re.IGNORECASE)
_DATE_RE = re.compile(r"\b(\d{4})-(\d{2})-(\d{2})\b")

FIELDS = [
    ("og_title", ("og:title",)),
    ("og_description", ("og:description", "description")),
    ("og_image", ("og:image",)),
    ("twitter_card", ("twitter:card",)),
    ("author", ("author", "article:author")),
]


def parse_meta(html: str) -> dict[str, str]:
    html = html or ""
    tags: dict[str, str] = {}
    for name, content in _META_RE.findall(html):
        tags.setdefault(name.lower(), content)
    for content, name in _META_RE_REV.findall(html):
        tags.setdefault(name.lower(), content)
    out: dict[str, str] = {}
    for field, keys in FIELDS:
        out[field] = next((tags[k] for k in keys if k in tags), "")
    tm = _TITLE_RE.search(html)
    out["title"] = normalize_whitespace(tm.group(1)) if tm else ""
    dm = _DATE_RE.search(html)
    out["published_date"] = "-".join(dm.groups()) if dm else ""
    return out


def extract_metadata(batch: pa.Table, html_col: str = "html") -> pa.Table:
    rows = [parse_meta(h) for h in batch[html_col].to_pylist()]
    for field in [f for f, _ in FIELDS] + ["title", "published_date"]:
        batch = batch.append_column(
            field, pa.array([r[field] for r in rows], pa.string())
        )
    return batch


def metadata_stage(ds: "ray.data.Dataset", html_col: str = "html") -> "ray.data.Dataset":
    return ds.map_batches(
        lambda b: extract_metadata(b, html_col), batch_format="pyarrow"
    )
