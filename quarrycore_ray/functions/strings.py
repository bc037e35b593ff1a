"""Scalar string utilities: slugify and URL decomposition.

Semantics ported (fresh implementation) from the reference's
dependency-free utilities:

- slugify: `/root/reference/src/quarrycore/utils/slugify.py:46-116` —
  unsafe chars -> replacement, collapse runs, strip, lowercase,
  Windows-reserved-name guard, length cap, "untitled" fallback.
- url_parts: the `urlparse`-based decomposition the reference's crawler
  and link classifier rely on (`crawler/http_client.py:40,233`,
  `extractor` link handling): scheme / netloc / path / registered
  domain, all via the stdlib.

Both ship as scalar functions plus vectorized Arrow batch wrappers so
they slot into `map_batches(..., batch_format="pyarrow")` stages.
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

import pyarrow as pa

_UNSAFE = re.compile(r"[^A-Za-z0-9\-]")

_WINDOWS_RESERVED = {
    "CON", "PRN", "AUX", "NUL",
    *(f"COM{i}" for i in range(1, 10)),
    *(f"LPT{i}" for i in range(1, 10)),
}


def slugify(
    text: str,
    replacement: str = "-",
    max_length: int | None = 200,
    lowercase: bool = True,
) -> str:
    """Filesystem-safe slug (reference utils/slugify.py:46-116)."""
    if not text or not text.strip():
        return "untitled"
    result = _UNSAFE.sub(replacement, text.strip())
    if len(replacement) == 1:
        result = re.sub(f"{re.escape(replacement)}+", replacement, result)
    result = result.strip(replacement)
    if lowercase:
        result = result.lower()
    parts = result.split(replacement)
    if parts and parts[0].upper() in _WINDOWS_RESERVED:
        parts.append("reserved")
        result = replacement.join(parts)
    if max_length and len(result) > max_length:
        result = result[:max_length].rstrip(replacement)
    return result or "untitled"


def slugify_job_id(job_id: str) -> str:
    """Checkpoint-safe job id (reference utils/slugify.py:119-140)."""
    return slugify(job_id, replacement="-", max_length=100, lowercase=True)


def url_parts(url: str) -> dict[str, str]:
    """Decompose a URL into scheme/netloc/path/query plus the registered
    domain (last two host labels — the heuristic the reference's link
    classifier uses for is_external / social-domain checks)."""
    p = urlparse(url or "")
    host = (p.netloc or "").split("@")[-1].split(":")[0].lower()
    labels = [l for l in host.split(".") if l]
    domain = ".".join(labels[-2:]) if len(labels) >= 2 else host
    return {
        "scheme": p.scheme.lower(),
        "netloc": p.netloc,
        "host": host,
        "domain": domain,
        "path": p.path,
        "query": p.query,
    }


# --- vectorized batch wrappers ----------------------------------------------


def slugify_column(
    batch: pa.Table, col: str, out_col: str = "slug", **kwargs
) -> pa.Table:
    vals = [slugify(v or "", **kwargs) for v in batch[col].to_pylist()]
    return batch.append_column(out_col, pa.array(vals, pa.string()))


def url_parts_columns(batch: pa.Table, col: str, prefix: str = "url_") -> pa.Table:
    parts = [url_parts(v or "") for v in batch[col].to_pylist()]
    for key in ("scheme", "host", "domain", "path"):
        batch = batch.append_column(
            f"{prefix}{key}", pa.array([p[key] for p in parts], pa.string())
        )
    return batch


# --- URL canonicalization (crawl-dedup normalization) -------------------------

#: tracking parameters dropped during canonicalization (the public
#: crawl-dedup set: unambiguous Google/Facebook/Mailchimp click
#: identifiers only — bare ``ref`` is a semantic routing parameter on
#: many real sites, e.g. GitHub ``?ref=branch``, so dropping it would
#: merge genuinely distinct pages)
TRACKING_PARAMS = {"fbclid", "gclid", "msclkid", "mc_cid", "mc_eid"}

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str) -> str:
    """Normalize a URL for duplicate detection (RFC 3986 §6 syntax-based
    normalization + the crawl-pipeline conventions Common-Crawl-style
    dedup uses): lowercase scheme and host, strip the default port,
    drop the fragment, drop tracking parameters (``utm_*`` and
    `TRACKING_PARAMS`), sort surviving query parameters bytewise, and
    strip one trailing slash from non-root paths (empty path becomes
    ``/``). Pure stdlib parse; userinfo is preserved verbatim.
    """
    p = urlparse(url or "")
    scheme = p.scheme.lower()
    netloc = p.netloc
    userinfo = ""
    if "@" in netloc:
        userinfo = netloc.rsplit("@", 1)[0] + "@"
    # urlparse's .hostname/.port handle bracketed IPv6 literals
    # ("[::1]:8080" -> host "::1", port 8080), which a naive
    # partition(":") on the netloc would mangle.
    try:
        host = (p.hostname or "").lower()
        port = "" if p.port is None else str(p.port)
    except ValueError:  # non-integer port: keep the raw netloc tail
        hostport = netloc.rsplit("@", 1)[-1]
        host, _, port = hostport.partition(":")
        host = host.lower()
    if port and port == _DEFAULT_PORTS.get(scheme, ""):
        port = ""
    if ":" in host:  # IPv6 literal must stay bracketed in the authority
        host = f"[{host}]"
    netloc = userinfo + host + (f":{port}" if port else "")
    path = p.path or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    kept = []
    for kv in p.query.split("&"):
        if not kv:
            continue
        k = kv.split("=", 1)[0]
        if k.startswith("utm_") or k in TRACKING_PARAMS:
            continue
        kept.append(kv)
    query = "&".join(sorted(kept))
    return f"{scheme}://{netloc}{path}" + (f"?{query}" if query else "")


def canonicalize_url_column(
    batch: pa.Table, col: str, out_col: str = "canon_url"
) -> pa.Table:
    vals = [canonicalize_url(v or "") for v in batch[col].to_pylist()]
    return batch.append_column(out_col, pa.array(vals, pa.string()))
