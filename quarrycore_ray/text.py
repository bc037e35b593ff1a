"""Text canonicalization and scalar string functions.

Re-expresses the reference's canonicalization layer
(`/root/reference/src/quarrycore/dedup/canonical.py`) as vectorized
batch functions. The reference canonicalizes HTML via
selectolax/bs4/regex fallbacks and then normalizes whitespace
(canonical.py:155-172: collapse all whitespace runs to single spaces,
strip). Our transcript input is already plain text, so the hot path is
`normalize_whitespace_array`; `canonicalize_html` implements the
regex-fallback HTML path (canonical.py:127-153) for HTML-shaped inputs.

Both are deterministic and idempotent — the invariants asserted by
`/root/reference/tests/unit/test_canonical_html.py`.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import pyarrow.compute as pc

_SCRIPT_RE = re.compile(r"<script\b[^<]*(?:(?!</script>)<[^<]*)*</script>", re.DOTALL | re.IGNORECASE)
_STYLE_RE = re.compile(r"<style\b[^<]*(?:(?!</style>)<[^<]*)*</style>", re.DOTALL | re.IGNORECASE)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_ENTITIES = [
    ("&nbsp;", " "),
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
]


def normalize_whitespace(text: str) -> str:
    """Collapse all whitespace runs to single spaces and strip.

    Mirrors `_normalize_whitespace` (reference canonical.py:155-172).
    """
    if not text:
        return ""
    return " ".join(text.split())


def normalize_whitespace_array(arr: pa.Array) -> pa.Array:
    """Vectorized whitespace normalization over an Arrow string array.

    Uses pyarrow's regex kernels so the batch never leaves Arrow:
    collapse `\\s+` -> " ", then trim outer whitespace.
    """
    collapsed = pc.replace_substring_regex(arr, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(collapsed)


def canonicalize_html(html: str) -> str:
    """HTML -> canonical text (regex path, reference canonical.py:127-153).

    Strips script/style blocks, comments, all tags, decodes the six
    common entities, then normalizes whitespace. Deterministic and
    idempotent.
    """
    if not html:
        return ""
    html = _SCRIPT_RE.sub("", html)
    html = _STYLE_RE.sub("", html)
    html = _COMMENT_RE.sub("", html)
    html = _TAG_RE.sub("", html)
    for src, dst in _ENTITIES:
        html = html.replace(src, dst)
    return normalize_whitespace(html)


def sha256_hex(text: str) -> str:
    """SHA-256 hex digest of UTF-8 text.

    The exact-dedup key, as in the reference exact layer
    (`/root/reference/src/quarrycore/dedup/hash_db.py:147-148`).
    """
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def sha256_hex_array(arr: pa.Array | list[str]) -> pa.Array:
    """Vectorized-ish SHA-256 over a string column (C-speed hashing)."""
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        texts = arr.to_pylist()
    else:
        texts = arr
    return pa.array(
        [hashlib.sha256((t or "").encode("utf-8")).hexdigest() for t in texts],
        type=pa.string(),
    )


# --- token-level helpers used by text-analysis operators ---------------------

_WORD_RE = re.compile(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]")


def regex_token_count(text: str) -> int:
    """BPE-ish token count: alnum runs + isolated punctuation marks."""
    return len(_WORD_RE.findall(text))


def rolling_fingerprint(text: str, window: int = 64, mod: int = 1 << 61) -> int:
    """Deterministic polynomial rolling-hash fingerprint of a document.

    A cheap content fingerprint (winnowing-style base hash) usable for
    grouping and change detection.
    """
    h = 0
    for ch in text[:window * 16]:
        h = (h * 1_000_003 + ord(ch)) % mod
    return h
