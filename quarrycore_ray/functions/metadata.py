"""HTML metadata extraction (OpenGraph / Twitter Card / author / date /
Schema.org JSON-LD / DOM structure metrics).

Reference: `metadata/metadata_extractor.py:152-592` plus the
structured-data parser (`metadata/structured_data_parser.py:84+` —
JSON-LD `<script type="application/ld+json">` blocks, @type/name/
author/datePublished fields) and the DOM analyzer
(`metadata/dom_analyzer.py:202+` — node counts, depth, element
distribution, link density). Meta-tag fields use one vectorized regex
pass; JSON-LD and DOM metrics reuse the minimal DOM from
functions/structured.py.
"""

from __future__ import annotations

import json
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


# --- Schema.org JSON-LD (reference structured_data_parser.py:84+) ------------


def parse_json_ld(html: str) -> list[dict]:
    """All parseable JSON-LD objects from ld+json script blocks.

    A top-level list contributes each element; a top-level dict with
    `@graph` contributes the graph members (the reference flattens the
    same two shapes). Malformed JSON is skipped (fail-open).
    """
    from .structured import parse_html

    out: list[dict] = []
    for script in parse_html(html or "").find_all({"script"}):
        if script.attrs.get("type", "").lower() != "application/ld+json":
            continue
        try:
            data = json.loads(script.text(strip=False))
        except (ValueError, TypeError):
            continue
        items = data if isinstance(data, list) else [data]
        for item in items:
            if isinstance(item, dict):
                graph = item.get("@graph")
                if isinstance(graph, list):
                    out.extend(g for g in graph if isinstance(g, dict))
                else:
                    out.append(item)
    return out


def _author_name(author) -> str:
    if isinstance(author, str):
        return author
    if isinstance(author, dict):
        return str(author.get("name", ""))
    if isinstance(author, list) and author:
        return _author_name(author[0])
    return ""


def schema_org_fields(html: str) -> dict[str, str]:
    """Convenience columns from the first JSON-LD object:
    schema_type / schema_name / schema_author / schema_date_published."""
    objs = parse_json_ld(html)
    first = objs[0] if objs else {}
    return {
        "schema_type": str(first.get("@type", "")),
        "schema_name": str(first.get("name", first.get("headline", ""))),
        "schema_author": _author_name(first.get("author")),
        "schema_date_published": str(first.get("datePublished", "")),
    }


# --- DOM structure metrics (reference dom_analyzer.py:202+) -------------------

_DOM_COUNT_TAGS = {
    "n_paragraphs": {"p"},
    "n_headings": {"h1", "h2", "h3", "h4", "h5", "h6"},
    "n_images": {"img"},
    "n_scripts": {"script"},
    "n_tables": {"table"},
    "n_lists": {"ul", "ol"},
}


def dom_metrics(html: str) -> dict:
    """Structural metrics: node count, max depth, element distribution,
    text length, link density (anchor text chars / total text chars)."""
    from .structured import Node, parse_html

    root = parse_html(html or "")
    total_nodes = 0
    max_depth = 0
    counts = {k: 0 for k in _DOM_COUNT_TAGS}
    link_chars = 0
    stack: list[tuple[Node, int]] = [(root, 0)]
    while stack:
        node, depth = stack.pop()
        for c in node.children:
            if isinstance(c, Node):
                total_nodes += 1
                d = depth + 1
                max_depth = max(max_depth, d)
                for key, tags in _DOM_COUNT_TAGS.items():
                    if c.tag in tags:
                        counts[key] += 1
                if c.tag == "a":
                    link_chars += len(c.text())
                stack.append((c, d))
    text_len = len(normalize_whitespace(root.text()))
    return {
        "total_nodes": total_nodes,
        "max_depth": max_depth,
        **counts,
        "text_length": text_len,
        "link_density": round(link_chars / text_len, 6) if text_len else 0.0,
    }


# --- social metrics (reference social_metrics_extractor.py:216+) -------------

_HASHTAG_RE = re.compile(r"(?<!&)#\w{2,}")
_MENTION_RE = re.compile(r"@\w{2,}")
_ENGAGEMENT_RE = re.compile(
    r"([\d,]+)\s*(?:shares?|likes?|retweets?|upvotes?|comments?)\b", re.IGNORECASE
)


def social_metrics(html: str) -> dict:
    """Hashtag/mention counts, social-link count, and engagement totals.

    A deliberately lean port of the reference's SocialMetricsExtractor
    (platform regex patterns + hashtag/mention scan + sharing
    indicators): engagement counts come from visible-text patterns like
    "1,234 shares"; has_social_sharing mirrors the reference's
    "meaningful data" gate (engagement found OR social links present).
    """
    from .structured import extract_links, parse_html

    text = parse_html(html or "").text(strip=False)
    n_social_links = sum(
        1 for link in extract_links(html or "") if link["link_type"] == "social"
    )
    engagement = sum(
        int(m.group(1).replace(",", "")) for m in _ENGAGEMENT_RE.finditer(text)
    )
    return {
        "n_hashtags": len(_HASHTAG_RE.findall(text)),
        "n_mentions": len(_MENTION_RE.findall(text)),
        "n_social_links": n_social_links,
        "total_engagement": engagement,
        "has_social_sharing": engagement > 0 or n_social_links > 0,
    }


_SOCIAL_INT_COLS = ["n_hashtags", "n_mentions", "n_social_links", "total_engagement"]

_DOM_INT_COLS = [
    "total_nodes", "max_depth", "n_paragraphs", "n_headings", "n_images",
    "n_scripts", "n_tables", "n_lists", "text_length",
]
_SCHEMA_COLS = ["schema_type", "schema_name", "schema_author", "schema_date_published"]


def extract_metadata_full(batch: pa.Table, html_col: str = "html") -> pa.Table:
    """Meta tags + Schema.org JSON-LD + DOM metrics in one batch pass."""
    batch = extract_metadata(batch, html_col)
    htmls = batch[html_col].to_pylist()
    schema_rows = [schema_org_fields(h) for h in htmls]
    dom_rows = [dom_metrics(h) for h in htmls]
    for col in _SCHEMA_COLS:
        batch = batch.append_column(
            col, pa.array([r[col] for r in schema_rows], pa.string())
        )
    for col in _DOM_INT_COLS:
        batch = batch.append_column(
            col, pa.array([r[col] for r in dom_rows], pa.int64())
        )
    batch = batch.append_column(
        "link_density", pa.array([r["link_density"] for r in dom_rows], pa.float64())
    )
    social_rows = [social_metrics(h) for h in htmls]
    for col in _SOCIAL_INT_COLS:
        batch = batch.append_column(
            col, pa.array([r[col] for r in social_rows], pa.int64())
        )
    return batch.append_column(
        "has_social_sharing",
        pa.array([r["has_social_sharing"] for r in social_rows], pa.bool_()),
    )
