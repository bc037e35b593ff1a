"""HTML extraction cascade + quality gate.

Reference semantics: `ExtractorManager.extract` runs a quality-gated
cascade of extractors per document
(`/root/reference/src/quarrycore/extractor/manager.py:119-236`:
trafilatura -> readability -> soup, first result whose quality score
clears the bar wins; rejects get a reason). Those third-party libraries
aren't available here, so the cascade runs over our own strategies with
the same gate-and-fallthrough control flow and a reject-reason column:

1. ``dom`` — the same published boilerplate-removal recipe (Arc90
   Readability / JusText / Boilerpipe, Kohlschütter et al., WSDM 2010)
   walking a REAL tree from a minimal stack-based HTML builder
   (`_parse_html_tree`: void elements, implied end tags, stack
   unwinding on mismatched closes, rawtext scripts/styles). Candidate
   membership follows actual nesting, so malformed markup — unclosed
   links, misnested layout tables, sidebar divs swallowing siblings —
   is attributed to the right subtree (the reference's
   trafilatura/readability DOM parse precision, manager.py:119-236).
2. ``readability`` — the linear-scan variant of the same rules: drop
   unlikely-candidate containers (nav/header/footer/aside/form and
   class/id markers like sidebar/comment/advert), segment the
   remaining markup into text blocks at block-level tags, and keep
   blocks by length + link-density. On well-formed markup it matches
   ``dom`` exactly; kept as the zero-allocation fallback.
3. ``strict_body`` — body-scoped regex extraction.
4. ``lenient`` — whole-document regex fallback
   (`quarrycore_ray.text.canonicalize_html`, the port of the
   reference's regex path canonical.py:127-153; always succeeds).
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data

from ..config import fixed_probe_pool
from ..text import canonicalize_html, normalize_whitespace

_BODY_RE = re.compile(r"<body\b[^>]*>(.*?)</body>", re.DOTALL | re.IGNORECASE)
_TITLE_RE = re.compile(r"<title\b[^>]*>(.*?)</title>", re.DOTALL | re.IGNORECASE)

# --- readability-grade block extraction --------------------------------------

#: containers whose whole subtree is boilerplate by construction
_UNLIKELY_TAGS = frozenset(
    {"nav", "header", "footer", "aside", "form", "menu", "select",
     "script", "style", "noscript", "template", "iframe", "svg"}
)
#: Arc90's unlikelyCandidates class/id markers (public regex; trimmed to
#: the stable core — same spirit as readability.js `REGEXPS.unlikelyCandidates`)
_UNLIKELY_ATTR_RE = re.compile(
    r"combx|comment|community|disqus|extra|foot|header|menu|nav|remark|rss|"
    r"share|shoutbox|sidebar|sponsor|ad-break|advert|agegate|pagination|"
    r"pager|popup|related|social|banner|breadcrumb|cookie|subscribe|promo",
    re.IGNORECASE,
)
#: tags that end/start a text block (block-level elements)
_BLOCK_TAGS = frozenset(
    {"p", "div", "td", "th", "li", "dd", "dt", "h1", "h2", "h3", "h4",
     "h5", "h6", "article", "section", "blockquote", "pre", "table",
     "tr", "ul", "ol", "dl", "figure", "figcaption", "main", "body",
     "br", "hr"}
)
_TOKEN_RE = re.compile(r"<!--.*?-->|<[^>]*>|[^<]+", re.DOTALL)
_TAG_PARSE_RE = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9]*)")
_ATTR_RE = re.compile(
    r"(?:class|id)\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]+)", re.IGNORECASE
)

#: keep a block if it has at least this much normalized text ...
MIN_BLOCK_CHARS = 25
#: ... and at most this fraction of its characters inside links
MAX_LINK_DENSITY = 1.0 / 3.0


def _extract_readability(html: str) -> str | None:
    """Strategy 1: block segmentation + length/link-density classifier.

    One linear scan over the tag stream: a depth counter tracks
    unlikely-candidate subtrees (dropped wholesale), block-level tags
    delimit candidate text blocks, and per-block character counts split
    into link and non-link text. A block survives if its normalized
    text has >= MIN_BLOCK_CHARS chars and link density <=
    MAX_LINK_DENSITY (the published Boilerpipe/JusText decision rule).
    Returns None when nothing survives — the cascade gate then falls
    through to the regex strategies, mirroring the reference cascade's
    quality-gated fallthrough (manager.py:119-236).
    """
    blocks: list[str] = []
    cur: list[str] = []
    cur_link: int = 0
    link_depth = 0
    # drop mode: the outermost dropped element's tag name + same-name
    # nesting count (exit when the MATCHING close arrives, so nested
    # <div>s inside a class-marked <div class="sidebar"> cannot leak)
    drop_tag: str | None = None
    drop_nest = 0

    def flush() -> None:
        nonlocal cur, cur_link
        if cur:
            text = normalize_whitespace(canonicalize_html("".join(cur)))
            if len(text) >= MIN_BLOCK_CHARS:
                total = sum(len(t) for t in cur)
                density = cur_link / total if total else 1.0
                if density <= MAX_LINK_DENSITY:
                    blocks.append(text)
        cur = []
        cur_link = 0

    for m in _TOKEN_RE.finditer(html):
        tok = m.group(0)
        if tok.startswith("<!--"):
            continue
        if tok.startswith("<"):
            tm = _TAG_PARSE_RE.match(tok)
            if not tm:
                continue
            name = tm.group(1).lower()
            closing = tok.startswith("</")
            self_closing = tok.rstrip(">").rstrip().endswith("/")
            if drop_tag is not None:
                if name == drop_tag:
                    if closing:
                        drop_nest -= 1
                        if drop_nest == 0:
                            drop_tag = None
                    elif not self_closing:
                        drop_nest += 1
                continue
            unlikely = not closing and (
                name in _UNLIKELY_TAGS
                or (
                    name != "body"
                    and any(
                        _UNLIKELY_ATTR_RE.search(a)
                        for a in _ATTR_RE.findall(tok)
                    )
                )
            )
            if unlikely:
                flush()
                if not self_closing:
                    drop_tag, drop_nest = name, 1
                continue
            if name == "a":
                link_depth = max(0, link_depth + (-1 if closing else 1))
            if name in _BLOCK_TAGS:
                flush()
        else:
            if drop_tag is not None:
                continue
            cur.append(tok)
            if link_depth > 0:
                cur_link += len(tok)
    flush()
    if not blocks:
        return None
    return normalize_whitespace(" ".join(blocks))


# --- DOM-tree readability (strategy 0) ---------------------------------------

#: HTML void elements (WHATWG HTML spec §13.1.2): never take children,
#: never appear on the open-element stack
_VOID_TAGS = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input", "link",
     "meta", "param", "source", "track", "wbr"}
)

#: raw-text elements: their content is text until the matching close tag
_RAWTEXT_TAGS = frozenset({"script", "style"})

#: inline / paragraph elements implicitly closed by a block-level open
#: (the spec's "generate implied end tags" set plus the common inline
#: formatting elements — inline content can't contain blocks)
_IMPLIED_END_TAGS = frozenset(
    {"p", "a", "span", "b", "i", "em", "strong", "u", "small", "font",
     "code", "sub", "sup", "label"}
)


class _Node:
    """One element of the minimal DOM: tag name, the raw open-tag token
    (attributes are matched with the same regexes as the linear path),
    and children (nested `_Node`s or text chunks)."""

    __slots__ = ("tag", "tok", "children")

    def __init__(self, tag: str, tok: str):
        self.tag = tag
        self.tok = tok
        self.children: list["_Node | str"] = []


def _parse_html_tree(html: str) -> _Node:
    """Minimal stack-based HTML tree builder (public WHATWG rules,
    reduced to what boilerplate scoring needs):

    - void elements never open a scope; ``<x/>`` self-closing honored
    - a close tag pops the open-element stack to its MATCHING open
      element (everything unclosed in between is implicitly closed —
      the spec's "generate implied end tags" generalized); a close tag
      with no matching open element is ignored
    - implied end tags for the common offenders: a block-level open
      closes an open ``<p>``; ``<li>`` closes a previous ``<li>``;
      ``<td>``/``<th>`` close a previous cell; ``<tr>`` closes a
      previous row (and any open cell)

    This is what lets candidate scoring walk REAL nesting: an unclosed
    ``<div>`` inside a ``class="sidebar"`` container stays inside that
    subtree here, while the linear tag-counter would unbalance and drop
    (or keep) the rest of the document wholesale.
    """
    root = _Node("#root", "")
    stack = [root]
    raw_until: str | None = None
    for m in _TOKEN_RE.finditer(html):
        tok = m.group(0)
        if raw_until is not None:
            # inside <script>/<style>: only the matching close tag ends
            # it. Searched INSIDE the token, not just at its start — a
            # stray '<' in script text (`if (a < b)`) makes the
            # tokenizer swallow the close tag into one pseudo-tag token.
            if re.search(rf"</\s*{raw_until}\b", tok, re.IGNORECASE):
                raw_until = None
                if len(stack) > 1:
                    stack.pop()
            continue
        if tok.startswith("<!--"):
            continue
        if tok.startswith("<"):
            tm = _TAG_PARSE_RE.match(tok)
            if not tm:
                continue  # markup noise ("< 5" etc), same as the linear path
            name = tm.group(1).lower()
            if tok.startswith("</"):
                for i in range(len(stack) - 1, 0, -1):
                    if stack[i].tag == name:
                        del stack[i:]
                        break
                continue
            # implied end tags: a block-level open closes any open
            # inline/paragraph elements above it (inline elements can't
            # contain block content, WHATWG §13.2.6.4.7 "in body" —
            # this is what ends an UNCLOSED <a>'s scope at the next
            # block boundary instead of leaking link-ness forever)
            if name in _BLOCK_TAGS:
                while stack[-1].tag in _IMPLIED_END_TAGS:
                    stack.pop()
            if name == "li" and stack[-1].tag == "li":
                stack.pop()
            if name in ("td", "th") and stack[-1].tag in ("td", "th"):
                stack.pop()
            if name == "tr":
                while stack[-1].tag in ("td", "th", "tr"):
                    stack.pop()
            node = _Node(name, tok)
            stack[-1].children.append(node)
            self_closing = (
                name in _VOID_TAGS or tok.rstrip(">").rstrip().endswith("/")
            )
            if not self_closing:
                stack.append(node)
                if name in _RAWTEXT_TAGS:
                    raw_until = name
        else:
            stack[-1].children.append(tok)
    return root


def _extract_dom(html: str) -> str | None:
    """Strategy 0: the readability block classifier walking a REAL tree.

    Same decision rules as `_extract_readability` (unlikely-candidate
    subtrees dropped wholesale, text blocks delimited at block-level
    element boundaries, length + link-density keep rule), but candidate
    membership follows actual nesting from `_parse_html_tree`, so
    malformed markup — unclosed divs inside a sidebar, nested tables,
    inline nav islands — is attributed to the right subtree instead of
    whatever a linear same-name tag counter happens to pair up. On
    well-formed markup the two strategies produce identical output (the
    cascade's oracle relies on this).
    """
    root = _parse_html_tree(html)
    blocks: list[str] = []
    cur: list[str] = []
    cur_link = 0

    def flush() -> None:
        nonlocal cur, cur_link
        if cur:
            text = normalize_whitespace(canonicalize_html("".join(cur)))
            if len(text) >= MIN_BLOCK_CHARS:
                total = sum(len(t) for t in cur)
                density = cur_link / total if total else 1.0
                if density <= MAX_LINK_DENSITY:
                    blocks.append(text)
        cur = []
        cur_link = 0

    # iterative in-order walk (explicit stack — adversarial nesting
    # depth must not hit the interpreter recursion limit); each frame is
    # (node-or-text, link_depth, is_exit_event)
    work: list[tuple["_Node | str", int, bool]] = [(root, 0, False)]
    while work:
        item, link_depth, is_exit = work.pop()
        if is_exit:
            flush()
            continue
        if isinstance(item, str):
            cur.append(item)
            if link_depth > 0:
                cur_link += len(item)
            continue
        name = item.tag
        if name != "#root":
            if name in _RAWTEXT_TAGS:
                continue
            unlikely = name in _UNLIKELY_TAGS or (
                name != "body"
                and any(
                    _UNLIKELY_ATTR_RE.search(a)
                    for a in _ATTR_RE.findall(item.tok)
                )
            )
            if unlikely:
                flush()
                continue
            if name == "a":
                link_depth += 1
            if name in _BLOCK_TAGS:
                flush()
                work.append((item, link_depth, True))  # exit event
        for child in reversed(item.children):
            work.append((child, link_depth, False))
    flush()
    if not blocks:
        return None
    return normalize_whitespace(" ".join(blocks))


def _extract_strict(html: str) -> str | None:
    """Strategy 1: body-scoped extraction; None when no <body>."""
    m = _BODY_RE.search(html)
    if not m:
        return None
    return canonicalize_html(m.group(1))


def _extract_lenient(html: str) -> str | None:
    """Strategy 2: whole-document regex extraction (always succeeds)."""
    return canonicalize_html(html)


CASCADE = (
    ("dom", _extract_dom),
    ("readability", _extract_readability),
    ("strict_body", _extract_strict),
    ("lenient", _extract_lenient),
)

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
        concurrency=fixed_probe_pool(),
    )
