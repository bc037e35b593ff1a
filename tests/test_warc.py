"""WARC/WET container roundtrip + Ray source (sources/warc.py)."""

import gzip

import pyarrow as pa
import pytest


def _rec(did, body=b"hello world", wtype="response", status=200):
    return {
        "warc_type": wtype,
        "url": f"https://s.example.org/doc/{did}",
        "date": f"2026-01-01T00:00:{did:02d}Z",
        "record_id": f"doc-{did}",
        "body": body,
        "status": status,
    }


class TestWarcRoundtrip:
    def test_response_roundtrip(self):
        from quarrycore_ray.sources.warc import build_warc_gz, parse_warc

        out = parse_warc(build_warc_gz([_rec(1, "héllo\nworld".encode())]))
        assert len(out) == 1
        r = out[0]
        assert r["url"].endswith("/doc/1")
        assert r["http_status"] == 200
        assert r["payload"] == "héllo\nworld".encode()
        assert r["warc_date"] == "2026-01-01T00:00:01Z"

    def test_conversion_and_empty_body(self):
        from quarrycore_ray.sources.warc import build_warc_gz, parse_warc

        out = parse_warc(
            build_warc_gz([_rec(2, b"", wtype="conversion"), _rec(3, b"x")])
        )
        assert [r["warc_type"] for r in out] == ["conversion", "response"]
        assert out[0]["payload"] == b"" and out[0]["http_status"] == 0
        assert out[1]["payload"] == b"x"

    def test_body_containing_crlfcrlf_is_framed_by_length(self):
        # the payload contains the separator sequence; Content-Length
        # framing must not split on it
        from quarrycore_ray.sources.warc import build_warc_gz, parse_warc

        body = b"a\r\n\r\nb\r\n\r\nWARC/1.0\r\n\r\nc"
        out = parse_warc(build_warc_gz([_rec(4, body)]))
        assert out[0]["payload"] == body

    def test_warcinfo_skipped(self):
        from quarrycore_ray.sources.warc import (
            _gzip_member,
            build_warc_gz,
            build_warc_record,
            parse_warc,
        )

        info = _gzip_member(
            build_warc_record(
                "warcinfo", "", "2026-01-01T00:00:00Z", b"robots: classic\r\n",
                "info-0", content_type="application/warc-fields",
            )
        )
        blob = info + build_warc_gz([_rec(5)])
        out = parse_warc(blob)
        assert len(out) == 1 and out[0]["url"].endswith("/doc/5")

    def test_deterministic_bytes(self):
        from quarrycore_ray.sources.warc import build_warc_gz

        assert build_warc_gz([_rec(6)]) == build_warc_gz([_rec(6)])

    def test_bad_header_raises(self):
        from quarrycore_ray.sources.warc import parse_warc

        with pytest.raises(ValueError):
            parse_warc(gzip.compress(b"NOT-A-WARC\r\n\r\n"))

    def test_non_200_status(self):
        from quarrycore_ray.sources.warc import build_warc_gz, parse_warc

        out = parse_warc(build_warc_gz([_rec(7, b"gone", status=404)]))
        assert out[0]["http_status"] == 404

    def test_malformed_records_fail_open(self):
        """Per-record damage (well-framed Content-Length, broken body)
        skips that record and records a reject; later records survive."""
        from quarrycore_ray.sources.warc import (
            build_warc_gz, build_warc_record, _gzip_member, parse_warc,
        )

        good = build_warc_gz([_rec(1)])
        # response block with NO CRLFCRLF header/body split
        bad1 = _gzip_member(
            build_warc_record(
                "response", "https://s.example.org/bad/1",
                "2026-01-01T00:00:00Z", b"HTTP/1.1 200 OK\r\nTruncated",
                "bad-1",
            )
        )
        # non-integer HTTP status line
        bad2 = _gzip_member(
            build_warc_record(
                "response", "https://s.example.org/bad/2",
                "2026-01-01T00:00:00Z",
                b"HTTP/1.1 ?? Weird\r\n\r\nbody", "bad-2",
            )
        )
        tail = build_warc_gz([_rec(9, b"tail")])
        rejects: list = []
        out = parse_warc(bad1 + good + bad2 + tail, rejects=rejects)
        assert [r["url"].rsplit("/", 1)[1] for r in out] == ["1", "9"]
        assert len(rejects) == 2
        assert "bad/1" in rejects[0]["url"] and "bad/2" in rejects[1]["url"]
        # without a rejects list, damage is still skipped silently
        assert len(parse_warc(bad1 + good)) == 1

    def test_framing_desync_still_raises(self):
        from quarrycore_ray.sources.warc import _gzip_member, parse_warc

        # missing Content-Length: offsets past this point are unknowable
        raw = b"WARC/1.0\r\nWARC-Type: conversion\r\n\r\nbody\r\n\r\n"
        with pytest.raises(ValueError, match="Content-Length"):
            parse_warc(_gzip_member(raw))
        # unterminated header block
        with pytest.raises(ValueError, match="unterminated"):
            parse_warc(_gzip_member(b"WARC/1.0\r\nWARC-Type: x"))


class TestWarcRaySource:
    def test_read_warc_files(self, tmp_path):
        from quarrycore_ray.sources.warc import build_warc_gz, read_warc

        for shard in range(3):
            recs = [_rec(shard * 10 + i) for i in range(4)]
            (tmp_path / f"shard{shard}.warc.gz").write_bytes(
                build_warc_gz(recs)
            )
        ds = read_warc(str(tmp_path))
        df = ds.to_pandas().sort_values("url").reset_index(drop=True)
        assert len(df) == 12
        assert set(df["http_status"]) == {200}
        assert all(p == b"hello world" for p in df["payload"])

    def test_read_warc_dead_letter_split(self, tmp_path):
        from quarrycore_ray.sources.warc import (
            build_warc_gz, build_warc_record, _gzip_member, read_warc,
        )
        from quarrycore_ray.stages.deadletter import split_dead_letter

        bad = _gzip_member(
            build_warc_record(
                "response", "https://s.example.org/bad/7",
                "2026-01-01T00:00:00Z", b"HTTP/1.1 200 OK\r\nno-split",
                "bad-7",
            )
        )
        (tmp_path / "mixed.warc.gz").write_bytes(
            build_warc_gz([_rec(1), _rec(2)]) + bad
        )
        clean, dead = split_dead_letter(
            read_warc(str(tmp_path), tag_errors=True)
        )
        cdf = clean.to_pandas()
        ddf = dead.to_pandas()
        assert len(cdf) == 2 and "_error" not in cdf.columns
        assert len(ddf) == 1
        assert ddf["url"].iloc[0].endswith("/bad/7")
        assert "offset" in ddf["_error"].iloc[0]

    def test_ingest_stats_schema(self):
        from quarrycore_ray.sources.warc import warc_ingest_stats

        df = warc_ingest_stats("/root/testdata/sf0.001").to_pandas()
        assert len(df) == 500
        assert (df["warc_type"] == "conversion").sum() > 0
        assert set(df.columns) == {
            "doc_id", "url", "warc_type", "warc_date", "http_status",
            "payload_bytes", "payload_md5",
        }


class TestWarcFuzzRoundtrip:
    def test_random_binary_payloads_roundtrip(self):
        """Property: build_warc_gz -> parse_warc is the identity on
        payload bytes for arbitrary binary bodies (CRLFCRLF inside
        bodies, empty bodies, high bytes) — Content-Length framing must
        never scan content."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from quarrycore_ray.sources.warc import build_warc_gz, parse_warc

        @settings(max_examples=60, deadline=None)
        @given(
            st.lists(
                st.tuples(
                    st.binary(max_size=300),
                    st.sampled_from(["response", "conversion"]),
                ),
                min_size=1,
                max_size=6,
            )
        )
        def check(bodies):
            recs = [
                {
                    "warc_type": wt,
                    "url": f"https://x.org/{i}",
                    "date": "2026-01-01T00:00:00Z",
                    "record_id": f"r-{i}",
                    "body": body,
                    "status": 200,
                }
                for i, (body, wt) in enumerate(bodies)
            ]
            out = parse_warc(build_warc_gz(recs))
            assert len(out) == len(recs)
            for r, o in zip(recs, out):
                assert o["payload"] == r["body"]
                assert o["warc_type"] == r["warc_type"]

        check()


class TestZeroRowBatch:
    """A zero-row input batch must yield the typed empty table, not an
    IndexError (Ray 2.49 happens to skip UDFs on empty blocks, but a
    direct caller — or a future Ray — hits __call__ directly)."""

    def test_plain(self):
        from quarrycore_ray.sources.warc import WARC_SCHEMA, WarcParseStage

        empty = pa.table({"bytes": pa.array([], pa.binary())})
        out = WarcParseStage()(empty)
        assert out.num_rows == 0
        assert out.schema.equals(WARC_SCHEMA)

    def test_tag_errors(self):
        from quarrycore_ray.sources.warc import WARC_SCHEMA, WarcParseStage
        from quarrycore_ray.stages.deadletter import ERROR_COL

        empty = pa.table({"bytes": pa.array([], pa.binary())})
        out = WarcParseStage(tag_errors=True)(empty)
        assert out.num_rows == 0
        assert out.column_names == WARC_SCHEMA.names + [ERROR_COL]
