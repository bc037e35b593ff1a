"""Structured content extraction: tables, code blocks, links, images.

Re-expresses the reference's multi-strategy structured extractors
(`/root/reference/src/quarrycore/extractor/cascade_extractor.py:193-860`,
`extractor/content_processors.py:233-387` tables, `:475-560` code,
`:920-1020` links) as vectorized batch transforms producing Arrow
`list<struct>` columns (SURVEY.md §1.3) — the multimodal
`ExtractedContent` surface (reference protocols.py:202-242).

selectolax/bs4 are absent in this environment, so parsing uses a
minimal DOM built on the stdlib `html.parser` (tag tree + attrs +
text), which covers the reference's CSS-selector usage for these
extractors: table/tr/th/td/caption traversal, `<pre><code>` blocks,
anchor/img attribute reads.

Semantics ported from the reference:
- tables: caption, headers from the first row iff it contains at least
  one ``<th>`` with meaningful text (a deliberate tightening of the
  reference, which promotes ANY non-empty first row to a header),
  remaining rows as text cells, row/column counts, has_header
  (content_processors.py:263-355; cells are flattened to text — the
  reference's per-cell colspan/rowspan metadata is dropped as unused
  downstream).
- code blocks: ``<pre>``/standalone ``<code>`` with >= 10 chars
  (content_processors.py:518-520), language from ``language-*``/
  ``lang-*`` class else keyword patterns (:536-556).
- links: href resolution against a base URL, classification
  email/phone/download/source_code/social/documentation/navigation/
  anchor/content in the reference's precedence order (:958-1020),
  is_external by netloc.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from urllib.parse import urljoin, urlparse

import pyarrow as pa

# --- minimal DOM -------------------------------------------------------------

_VOID_TAGS = {
    "img", "br", "hr", "meta", "link", "input", "area", "base", "col",
    "embed", "source", "track", "wbr",
}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []
        self.parent = parent

    def text(self, strip: bool = True) -> str:
        parts: list[str] = []
        stack: list[Node | str] = list(self.children)
        i = 0
        while i < len(stack):
            c = stack[i]
            i += 1
            if isinstance(c, str):
                parts.append(c)
            else:
                stack[i:i] = c.children
        out = "".join(parts)
        return out.strip() if strip else out

    def find_all(self, tags: set[str]) -> list["Node"]:
        """Descendant elements with tag in `tags`, document order."""
        out: list[Node] = []
        stack: list[Node | str] = list(self.children)
        while stack:
            c = stack.pop(0)
            if isinstance(c, Node):
                if c.tag in tags:
                    out.append(c)
                stack[0:0] = c.children
        return out

    def find_first(self, tag: str) -> "Node | None":
        hits = self.find_all({tag})
        return hits[0] if hits else None

    def has_ancestor(self, tag: str) -> bool:
        p = self.parent
        while p is not None:
            if p.tag == tag:
                return True
            p = p.parent
        return False


class _DomBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        node = Node(tag, {k: (v or "") for k, v in attrs}, self.cur)
        self.cur.children.append(node)
        if tag not in _VOID_TAGS:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(Node(tag, {k: (v or "") for k, v in attrs}, self.cur))

    def handle_endtag(self, tag):
        # pop to the nearest matching open element (tolerates misnesting)
        n = self.cur
        while n is not self.root and n.tag != tag:
            n = n.parent
        if n is not self.root:
            self.cur = n.parent

    def handle_data(self, data):
        if data:
            self.cur.children.append(data)


def parse_html(html: str) -> Node:
    b = _DomBuilder()
    b.feed(html or "")
    return b.root


# --- tables (reference content_processors.py:233-355) ------------------------


def extract_tables(html: str) -> list[dict]:
    root = parse_html(html)
    out: list[dict] = []
    for t in root.find_all({"table"}):
        cap = t.find_first("caption")
        caption = cap.text() if cap else ""
        trs = t.find_all({"tr"})
        headers: list[str] = []
        has_header = False
        if trs:
            first_cells = [c for c in trs[0].find_all({"th", "td"})]
            cand = [c.text() for c in first_cells]
            if cand and any(cand) and any(c.tag == "th" for c in first_cells):
                headers = cand
                has_header = True
        rows: list[list[str]] = []
        for tr in trs[1 if has_header else 0:]:
            cells = [c.text() for c in tr.find_all({"th", "td"})]
            if cells:
                rows.append(cells)
        if not rows and not caption:
            continue  # reference: only tables with meaningful content
        n_cols = len(headers) if headers else max((len(r) for r in rows), default=0)
        out.append(
            {
                "caption": caption,
                "headers": headers,
                "rows": rows,
                "n_rows": len(rows),
                "n_cols": n_cols,
                "has_header": has_header,
            }
        )
    return out


# --- code blocks (reference content_processors.py:475-560) -------------------

_LANG_CLASS_RE = re.compile(r"(?:language|lang)-([A-Za-z0-9_+-]+)")
# keyword-pattern fallback, reference _detect_language_by_patterns shape
_LANG_PATTERNS = [
    ("python", re.compile(r"\bdef \w+\(|\bimport \w+|\bself\b")),
    ("javascript", re.compile(r"\bfunction\b|\bconst \w+ =|=>|\bvar \w+")),
    ("java", re.compile(r"\bpublic (?:static |class )|\bSystem\.out\b")),
    ("c", re.compile(r"#include\s*<|\bint main\(")),
    ("sql", re.compile(r"\bSELECT\b.*\bFROM\b", re.IGNORECASE | re.DOTALL)),
]

MIN_CODE_CHARS = 10  # reference: blocks under 10 chars are noise


def _detect_language(code: str, class_attr: str) -> str:
    m = _LANG_CLASS_RE.search(class_attr)
    if m:
        return m.group(1).lower()
    for lang, pat in _LANG_PATTERNS:
        if pat.search(code):
            return lang
    return "unknown"


def extract_code_blocks(html: str) -> list[dict]:
    root = parse_html(html)
    blocks: list[Node] = []
    for pre in root.find_all({"pre"}):
        blocks.append(pre)
    for code in root.find_all({"code"}):
        if not code.has_ancestor("pre"):
            blocks.append(code)
    out: list[dict] = []
    for b in blocks:
        # prefer the inner <code> element's class for language detection
        inner = b.find_first("code") if b.tag == "pre" else None
        content = b.text(strip=False).strip()
        if len(content) < MIN_CODE_CHARS:
            continue
        cls = (inner or b).attrs.get("class", "")
        if not cls and inner is None and b.tag == "pre":
            cls = b.attrs.get("class", "")
        out.append(
            {
                "content": content,
                "language": _detect_language(content, cls),
                "n_lines": len(content.split("\n")),
                "n_chars": len(content),
            }
        )
    return out


# --- links (reference content_processors.py:920-1020) ------------------------

_FILE_EXTS = (".pdf", ".doc", ".docx", ".xls", ".xlsx", ".ppt", ".pptx", ".zip", ".rar")
_SOURCE_DOMAINS = ("github.com", "gitlab.com", "bitbucket.org", "sourceforge.net")
_SOCIAL_DOMAINS = (
    "facebook.com", "twitter.com", "linkedin.com", "instagram.com", "youtube.com",
)
_NAV_KEYWORDS = ("home", "about", "contact", "menu", "next", "previous", "back")


def classify_link(href: str, text: str) -> str:
    """Reference `_classify_link` precedence, verbatim rules."""
    h = href.lower()
    t = text.lower()
    if h.startswith("mailto:"):
        return "email"
    if h.startswith("tel:"):
        return "phone"
    if any(ext in h for ext in _FILE_EXTS):
        return "download"
    if any(d in h for d in _SOURCE_DOMAINS):
        return "source_code"
    if any(d in h for d in _SOCIAL_DOMAINS):
        return "social"
    if "documentation" in t or "/docs/" in h or "manual" in t:
        return "documentation"
    if any(k in t for k in _NAV_KEYWORDS):
        return "navigation"
    if href.startswith("#"):
        return "anchor"
    return "content"


def extract_links(html: str, base_url: str = "") -> list[dict]:
    root = parse_html(html)
    base_domain = urlparse(base_url).netloc
    out: list[dict] = []
    for a in root.find_all({"a"}):
        href = a.attrs.get("href", "")
        if not href:
            continue
        raw = href
        if href.startswith("//"):
            href = "https:" + href
        elif not href.startswith(("http://", "https://", "mailto:", "tel:", "#")):
            href = urljoin(base_url, href)
        text = a.text()
        out.append(
            {
                "href": href,
                "text": text,
                "title": a.attrs.get("title", ""),
                "rel": a.attrs.get("rel", ""),
                "link_type": classify_link(raw, text),
                "is_external": urlparse(href).netloc != base_domain,
            }
        )
    return out


def extract_images(html: str) -> list[dict]:
    root = parse_html(html)
    return [
        {
            "src": img.attrs.get("src", ""),
            "alt": img.attrs.get("alt", ""),
            "title": img.attrs.get("title", ""),
        }
        for img in root.find_all({"img"})
        if img.attrs.get("src", "")
    ]


# --- Arrow batch stage --------------------------------------------------------

TABLE_T = pa.struct(
    [
        ("caption", pa.string()),
        ("headers", pa.list_(pa.string())),
        ("rows", pa.list_(pa.list_(pa.string()))),
        ("n_rows", pa.int64()),
        ("n_cols", pa.int64()),
        ("has_header", pa.bool_()),
    ]
)
CODE_T = pa.struct(
    [
        ("content", pa.string()),
        ("language", pa.string()),
        ("n_lines", pa.int64()),
        ("n_chars", pa.int64()),
    ]
)
LINK_T = pa.struct(
    [
        ("href", pa.string()),
        ("text", pa.string()),
        ("title", pa.string()),
        ("rel", pa.string()),
        ("link_type", pa.string()),
        ("is_external", pa.bool_()),
    ]
)
IMAGE_T = pa.struct([("src", pa.string()), ("alt", pa.string()), ("title", pa.string())])


def structured_extract_batch(
    batch: pa.Table, html_col: str = "html", base_url: str = ""
) -> pa.Table:
    """Append tables/code_blocks/links/images list<struct> columns.

    One DOM parse per row serves all four extractors (the reference
    re-parses per extractor; here the parse is hoisted).
    """
    htmls = batch[html_col].to_pylist()
    tables: list[list[dict]] = []
    codes: list[list[dict]] = []
    links: list[list[dict]] = []
    images: list[list[dict]] = []
    for h in htmls:
        h = h or ""
        tables.append(extract_tables(h))
        codes.append(extract_code_blocks(h))
        links.append(extract_links(h, base_url))
        images.append(extract_images(h))
    batch = batch.append_column("tables", pa.array(tables, pa.list_(TABLE_T)))
    batch = batch.append_column("code_blocks", pa.array(codes, pa.list_(CODE_T)))
    batch = batch.append_column("links", pa.array(links, pa.list_(LINK_T)))
    return batch.append_column("images", pa.array(images, pa.list_(IMAGE_T)))
