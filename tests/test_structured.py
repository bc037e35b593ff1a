"""Structured extraction + Schema.org/DOM-metric metadata tests.

Ports the semantic shapes of the reference's extractor/metadata
assertions (tables with caption/headers, code-language detection, link
classification, JSON-LD parsing) onto the Ray-native batch functions.
"""

import pyarrow as pa

from quarrycore_ray.functions.metadata import (
    dom_metrics,
    extract_metadata_full,
    parse_json_ld,
    schema_org_fields,
)
from quarrycore_ray.functions.structured import (
    classify_link,
    extract_code_blocks,
    extract_images,
    extract_links,
    extract_tables,
    structured_extract_batch,
)

PAGE = """
<html><head><title>T</title></head><body>
<p>intro paragraph text</p>
<table summary="s"><caption>Stats</caption>
  <tr><th>name</th><th>value</th></tr>
  <tr><td>alpha</td><td>1</td></tr>
  <tr><td>beta</td><td>2</td></tr>
</table>
<table><tr><td></td></tr></table>
<pre><code class="language-rust">fn main() { println!("hi"); }</code></pre>
<pre>def compute(x):
    return x + 1</pre>
<code>x</code>
<a href="/docs/guide">the manual</a>
<a href="mailto:a@b.c">mail</a>
<a href="https://github.com/o/r">repo</a>
<img src="/a.png" alt="A"/>
<img alt="no src"/>
</body></html>
"""


class TestTables:
    def test_table_fields(self):
        tables = extract_tables(PAGE)
        # the empty-cell table has no caption and rows with no text — but
        # cells exist, so it still counts rows; the first is the real one
        t = tables[0]
        assert t["caption"] == "Stats"
        assert t["headers"] == ["name", "value"]
        assert t["has_header"] is True
        assert t["rows"] == [["alpha", "1"], ["beta", "2"]]
        assert t["n_rows"] == 2 and t["n_cols"] == 2

    def test_headerless_table(self):
        tables = extract_tables("<table><tr><td>a</td><td>b</td></tr></table>")
        assert tables[0]["has_header"] is False
        assert tables[0]["headers"] == []
        assert tables[0]["n_rows"] == 1 and tables[0]["n_cols"] == 2

    def test_empty_table_skipped(self):
        assert extract_tables("<table></table>") == []


class TestCodeBlocks:
    def test_language_from_class_and_patterns(self):
        blocks = extract_code_blocks(PAGE)
        langs = [b["language"] for b in blocks]
        assert "rust" in langs  # class language-rust
        assert "python" in langs  # pattern: def ...(
        # the 1-char <code>x</code> is below MIN_CODE_CHARS
        assert all(b["n_chars"] >= 10 for b in blocks)

    def test_line_counts(self):
        blocks = extract_code_blocks("<pre>line1\nline2\nline3 is long</pre>")
        assert blocks[0]["n_lines"] == 3


class TestLinks:
    def test_classification_matrix(self):
        assert classify_link("mailto:x@y.z", "") == "email"
        assert classify_link("tel:+1555", "") == "phone"
        assert classify_link("https://x.com/f.pdf", "") == "download"
        assert classify_link("https://github.com/o/r", "") == "source_code"
        assert classify_link("https://twitter.com/u", "") == "social"
        assert classify_link("https://x.com/docs/intro", "") == "documentation"
        assert classify_link("https://x.com/p", "Back to Home") == "navigation"
        assert classify_link("#section", "jump") == "anchor"
        assert classify_link("https://x.com/article", "read this") == "content"

    def test_resolution_and_external(self):
        links = extract_links(PAGE, base_url="https://corpus.local/page")
        by_type = {link["link_type"]: link for link in links}
        assert by_type["documentation"]["href"] == "https://corpus.local/docs/guide"
        assert by_type["documentation"]["is_external"] is False
        assert by_type["source_code"]["is_external"] is True
        assert by_type["email"]["href"] == "mailto:a@b.c"


class TestImages:
    def test_src_required(self):
        imgs = extract_images(PAGE)
        assert len(imgs) == 1 and imgs[0]["alt"] == "A"


class TestBatchStage:
    def test_arrow_types_and_empty_rows(self):
        batch = pa.table({"doc_id": [1, 2], "html": [PAGE, ""]})
        out = structured_extract_batch(batch, base_url="https://corpus.local")
        assert out.num_rows == 2
        for col in ("tables", "code_blocks", "links", "images"):
            assert pa.types.is_list(out[col].type)
        empties = out.slice(1, 1)
        assert all(
            len(empties[c].to_pylist()[0]) == 0
            for c in ("tables", "code_blocks", "links", "images")
        )


LD_PAGE = """
<html><head>
<script type="application/ld+json">
{"@context": "https://schema.org", "@type": "Article",
 "headline": "Big News", "author": {"@type": "Person", "name": "Ada"},
 "datePublished": "2026-01-02"}
</script>
<script type="application/ld+json">not valid json</script>
<script type="application/ld+json">
{"@graph": [{"@type": "Organization", "name": "Acme"},
            {"@type": "WebSite", "name": "Acme Site"}]}
</script>
</head><body>
<h1>Big News</h1><p>some text here</p>
<a href="/more">more text link</a>
</body></html>
"""


class TestJsonLd:
    def test_objects_and_graph_flattening(self):
        objs = parse_json_ld(LD_PAGE)
        types = [o.get("@type") for o in objs]
        assert types == ["Article", "Organization", "WebSite"]

    def test_first_object_fields(self):
        f = schema_org_fields(LD_PAGE)
        assert f["schema_type"] == "Article"
        assert f["schema_name"] == "Big News"
        assert f["schema_author"] == "Ada"
        assert f["schema_date_published"] == "2026-01-02"

    def test_author_shapes(self):
        html = (
            '<script type="application/ld+json">'
            '{"@type": "Article", "author": ["First", "Second"]}</script>'
        )
        assert schema_org_fields(html)["schema_author"] == "First"


class TestDomMetrics:
    def test_counts_and_density(self):
        m = dom_metrics(LD_PAGE)
        assert m["n_headings"] == 1
        assert m["n_paragraphs"] == 1
        assert m["n_scripts"] == 3
        assert m["max_depth"] >= 3  # html > body > p
        assert m["total_nodes"] >= 8
        assert 0.0 < m["link_density"] < 1.0

    def test_empty(self):
        m = dom_metrics("")
        assert m["total_nodes"] == 0 and m["link_density"] == 0.0

    def test_full_batch_columns(self):
        batch = pa.table({"doc_id": [1], "html": [LD_PAGE]})
        out = extract_metadata_full(batch)
        assert out["schema_type"].to_pylist() == ["Article"]
        assert out["n_scripts"].to_pylist() == [3]
        assert out["og_title"].to_pylist() == [""]


class TestSocialMetrics:
    def test_counts_and_engagement(self):
        from quarrycore_ray.functions.metadata import social_metrics

        html = (
            "<html><body><p>Check #raydata and #arrow with @builder — "
            "1,234 shares and 56 likes so far</p>"
            '<a href="https://twitter.com/x">tweet</a></body></html>'
        )
        m = social_metrics(html)
        assert m["n_hashtags"] == 2
        assert m["n_mentions"] == 1
        assert m["n_social_links"] == 1
        assert m["total_engagement"] == 1290
        assert m["has_social_sharing"] is True

    def test_entity_refs_not_hashtags(self):
        from quarrycore_ray.functions.metadata import social_metrics

        m = social_metrics("<p>&#39;quoted&#39; plain text</p>")
        assert m["n_hashtags"] == 0
        assert m["has_social_sharing"] is False
