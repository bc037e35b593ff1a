"""Canonicalization invariants.

Mirrors `/root/reference/tests/unit/test_canonical_html.py`: script/style
removal, whitespace collapse (no double spaces in output), idempotence,
entity decode.
"""

import pyarrow as pa

from quarrycore_ray.text import (
    canonicalize_html,
    normalize_whitespace,
    normalize_whitespace_array,
    regex_token_count,
    sha256_hex,
    sha256_hex_array,
)


class TestNormalizeWhitespace:
    def test_collapse(self):
        assert normalize_whitespace("a  b\t\nc   d") == "a b c d"

    def test_strip(self):
        assert normalize_whitespace("  hello  ") == "hello"

    def test_no_double_spaces_in_output(self):
        out = normalize_whitespace("x" + " \n\t " * 10 + "y")
        assert "  " not in out

    def test_idempotent(self):
        s = "some   text\nwith\t\tmess"
        assert normalize_whitespace(normalize_whitespace(s)) == normalize_whitespace(s)

    def test_vectorized_matches_scalar(self):
        texts = ["a  b", " c\td ", "", "one", "multi\n\nline  text "]
        arr = normalize_whitespace_array(pa.array(texts))
        assert arr.to_pylist() == [normalize_whitespace(t) for t in texts]


class TestCanonicalizeHtml:
    def test_script_and_style_removed(self):
        html = "<html><script>var x=1;</script><style>.a{}</style><p>Keep me</p></html>"
        out = canonicalize_html(html)
        assert "var x" not in out and ".a{}" not in out and "Keep me" in out

    def test_comments_removed(self):
        assert "secret" not in canonicalize_html("<p>ok</p><!-- secret -->")

    def test_entities_decoded(self):
        assert canonicalize_html("a&nbsp;&amp;&lt;b&gt;") == "a &<b>"

    def test_whitespace_collapsed(self):
        assert "  " not in canonicalize_html("<p>a</p>\n\n<p>b</p>")

    def test_idempotent_on_plain_text(self):
        s = canonicalize_html("<div>some  plain text</div>")
        assert canonicalize_html(s) == s


class TestHashing:
    def test_sha256_known(self):
        import hashlib

        assert sha256_hex("abc") == hashlib.sha256(b"abc").hexdigest()

    def test_array_matches_scalar(self):
        texts = ["a", "", "hello world"]
        assert sha256_hex_array(pa.array(texts)).to_pylist() == [sha256_hex(t) for t in texts]


def test_regex_token_count():
    assert regex_token_count("ab, cd!") == 4
    assert regex_token_count("") == 0


class TestStrings:
    def test_slugify_reference_examples(self):
        from quarrycore_ray.functions.strings import slugify, slugify_job_id

        # reference docstring examples (utils/slugify.py:64-80,134-139)
        assert slugify("Hello World!") == "hello-world"
        assert slugify("file/path\\name:test") == "file-path-name-test"
        assert slugify("My File (v2.1).txt") == "my-file-v2-1-txt"
        assert slugify("CON") == "con-reserved"
        assert slugify("") == "untitled"
        assert slugify("!!!") == "untitled"
        assert slugify_job_id("job:2024/01/01-12:30:45") == "job-2024-01-01-12-30-45"
        assert len(slugify("x" * 500)) == 200

    def test_url_parts(self):
        from quarrycore_ray.functions.strings import url_parts

        p = url_parts("https://Sub.Example.COM:8080/a/b?q=1")
        assert p["scheme"] == "https"
        assert p["host"] == "sub.example.com"
        assert p["domain"] == "example.com"
        assert p["path"] == "/a/b"
        assert p["query"] == "q=1"
        assert url_parts("")["domain"] == ""

    def test_canonicalize_url(self):
        from quarrycore_ray.functions.strings import canonicalize_url

        assert (
            canonicalize_url("HTTPS://Example.COM:443/a/b/?utm_source=x&z=1&a=2#frag")
            == "https://example.com/a/b?a=2&z=1"
        )
        # IPv6 literals keep their brackets; default port still stripped
        assert canonicalize_url("https://[::1]:8080/") == "https://[::1]:8080/"
        assert canonicalize_url("https://[2001:DB8::1]:443/x/") == "https://[2001:db8::1]/x"
        # userinfo preserved verbatim, host lowercased
        assert canonicalize_url("http://u:p@Host.Org:80/q") == "http://u:p@host.org/q"
        # 'ref' is a semantic routing param and must survive
        assert (
            canonicalize_url("https://github.com/a/b?ref=main&fbclid=xyz")
            == "https://github.com/a/b?ref=main"
        )
        # non-integer port: raw netloc tail kept rather than crashing
        assert canonicalize_url("https://h:bad/p").startswith("https://h:bad")

    def test_batch_wrappers(self):
        import pyarrow as pa

        from quarrycore_ray.functions.strings import slugify_column, url_parts_columns

        batch = pa.table({"title": ["A B", None], "url": ["http://x.co/p", None]})
        out = slugify_column(batch, "title")
        assert out["slug"].to_pylist() == ["a-b", "untitled"]
        out2 = url_parts_columns(batch, "url")
        assert out2["url_domain"].to_pylist() == ["x.co", ""]
