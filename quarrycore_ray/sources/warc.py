"""WARC / WET web-archive ingestion (pure python, stdlib gzip).

The reference engine consumes crawl output produced by its own HTTP
crawler (`/root/reference/src/quarrycore/crawler/`); at 100 TB the
equivalent input arrives as WARC archives (ISO 28500 — the Common
Crawl container format: one gzip member per record, so readers can
split archives without decompressing the whole file) or the derived
WET text-conversion sidefiles. This module implements the container
from the public spec:

- ``build_warc_gz(records)``: deterministic writer — WARC/1.0 headers,
  one gzip member per record (``mtime=0``, fixed OS byte, so output is
  byte-stable), ``response`` records carrying a full HTTP/1.1 message
  and ``conversion`` records carrying bare text (the WET shape).
- ``parse_warc(blob)``: multi-member gzip decode + record framing by
  ``Content-Length`` (the only framing the spec allows — bodies are
  arbitrary bytes), HTTP header/body split for response records.
- ``read_warc(paths)``: the Ray Data source. Partitioning assumption:
  ONE archive file = one parse task (crawl archives ship as ~1 GB
  files; a 100 TB crawl is ~100k files, which is the parallelism axis
  — records inside a member chain can't be split without scanning).

Per-record Python is inherent to a byte-stream container (same
discipline as the image/audio codecs, `multimodal.py`); the cost sits
in an actor-pool ``map_batches`` stage so decode state (a reusable
scratch buffer) lives per actor, and downstream operators get a plain
Arrow table of (url, date, status, content_type, payload).
"""

from __future__ import annotations

import gzip
import io

import pyarrow as pa

import ray.data as rd

_CRLF2 = b"\r\n\r\n"

#: Arrow schema of parsed records (payload is raw bytes; text decode is
#: the consumer's call — charset sniffing belongs to the extract stage)
WARC_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_type", pa.string()),
        ("warc_date", pa.string()),
        ("http_status", pa.int64()),
        ("content_type", pa.string()),
        ("payload", pa.binary()),
    ]
)


def _gzip_member(raw: bytes) -> bytes:
    """One deterministic gzip member (mtime=0; gzip module emits OS=255
    ("unknown") for ``mtime=0`` streams via GzipFile with fixed args)."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", compresslevel=6, mtime=0) as gz:
        gz.write(raw)
    return buf.getvalue()


def build_warc_record(
    warc_type: str,
    url: str,
    date: str,
    block: bytes,
    record_id: str,
    content_type: str | None = None,
) -> bytes:
    """Serialize one uncompressed WARC/1.0 record (spec §4: named
    headers, CRLF line ends, Content-Length in bytes, two trailing
    CRLFs)."""
    if content_type is None:
        content_type = (
            "application/http; msgtype=response"
            if warc_type == "response"
            else "text/plain"
        )
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: <urn:uuid:{record_id}>\r\n"
        f"WARC-Date: {date}\r\n"
        + (f"WARC-Target-URI: {url}\r\n" if url else "")
        + f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(block)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return head + block + b"\r\n\r\n"


def http_response_block(
    body: bytes, status: int = 200, content_type: str = "text/plain; charset=utf-8"
) -> bytes:
    """A minimal deterministic HTTP/1.1 response message (the block of
    a WARC response record)."""
    reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently"}.get(
        status, "OK"
    )
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return head + body


def build_warc_gz(records: list[dict]) -> bytes:
    """records: dicts with keys (warc_type, url, date, record_id, and
    either ``body`` bytes for conversion records or ``body`` +
    ``status`` for response records). Returns the .warc.gz archive
    bytes — one gzip member per record, per the Common Crawl layout."""
    out = []
    for r in records:
        if r["warc_type"] == "response":
            block = http_response_block(r["body"], r.get("status", 200))
        else:
            block = r["body"]
        out.append(
            _gzip_member(
                build_warc_record(
                    r["warc_type"], r.get("url", ""), r["date"], block,
                    r["record_id"],
                )
            )
        )
    return b"".join(out)


def _gunzip_all(blob: bytes) -> bytes:
    """Decompress a multi-member gzip stream (GzipFile chains members)."""
    with gzip.GzipFile(fileobj=io.BytesIO(blob)) as gz:
        return gz.read()


def parse_warc(
    blob: bytes,
    gzipped: bool | None = None,
    rejects: list[dict] | None = None,
) -> list[dict]:
    """Parse a WARC byte stream into record dicts.

    Framing is Content-Length-only (bodies are arbitrary bytes, so
    scanning for separators would be wrong); response records split
    the HTTP message at the first CRLFCRLF and expose the status line
    and entity body. Unknown record types (warcinfo, request,
    metadata) are framed and skipped.

    Real crawl archives routinely contain truncated or odd records, so
    per-record damage is FAIL-OPEN: a record whose Content-Length frames
    correctly but whose body fails to parse (response block missing the
    CRLFCRLF header split, a non-integer HTTP status) is skipped — and
    recorded into ``rejects`` (offset, url, error) when a list is
    passed, so callers can route it to the dead-letter tier. Only a
    true framing desync aborts the archive: a non-WARC/ record start,
    a header block with no terminating CRLFCRLF, or a missing /
    non-integer Content-Length — past any of those the byte offsets of
    every later record are unknowable.

    ``gzipped=None`` sniffs the gzip magic — file readers (Arrow's
    ``open_input_stream`` under ``read_binary_files``) decompress
    ``.gz`` transparently, while in-pipeline blobs arrive compressed.
    """
    if gzipped is None:
        gzipped = blob[:2] == b"\x1f\x8b"
    data = _gunzip_all(blob) if gzipped else blob
    n = len(data)
    i = 0
    out: list[dict] = []
    while i < n:
        # skip inter-record CRLFs
        while i < n and data[i : i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        if data[i : i + 5] != b"WARC/":
            raise ValueError(f"bad WARC record header at offset {i}")
        try:
            he = data.index(_CRLF2, i)
        except ValueError:
            raise ValueError(
                f"unterminated WARC header block at offset {i}"
            ) from None
        headers: dict[str, str] = {}
        lines = data[i:he].decode("utf-8", errors="replace").split("\r\n")
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(
                f"missing/invalid Content-Length at offset {i} — framing desync"
            ) from None
        rec_off = i
        block = data[he + 4 : he + 4 + clen]
        i = he + 4 + clen
        wtype = headers.get("warc-type", "")
        url = headers.get("warc-target-uri", "")
        date = headers.get("warc-date", "")
        try:
            if wtype == "response":
                be = block.index(_CRLF2)
                http_head = block[:be].decode("utf-8", errors="replace")
                body = block[be + 4 :]
                status_line = http_head.split("\r\n")[0]
                status = int(status_line.split(" ")[1])
                ctype = ""
                for hl in http_head.split("\r\n")[1:]:
                    hk, _, hv = hl.partition(":")
                    if hk.strip().lower() == "content-type":
                        ctype = hv.strip()
                out.append(
                    {
                        "url": url, "warc_type": wtype, "warc_date": date,
                        "http_status": status, "content_type": ctype,
                        "payload": body,
                    }
                )
            elif wtype == "conversion":
                out.append(
                    {
                        "url": url, "warc_type": wtype, "warc_date": date,
                        "http_status": 0,
                        "content_type": headers.get("content-type", ""),
                        "payload": block,
                    }
                )
            # warcinfo / request / metadata records: framed and skipped
        except (ValueError, IndexError) as e:
            if rejects is not None:
                rejects.append(
                    {
                        "offset": rec_off,
                        "url": url,
                        "warc_type": wtype,
                        "error": f"{type(e).__name__}: {e}",
                    }
                )
    return out


def records_table(recs: list[dict]) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([r["url"] for r in recs], pa.string()),
            "warc_type": pa.array([r["warc_type"] for r in recs], pa.string()),
            "warc_date": pa.array([r["warc_date"] for r in recs], pa.string()),
            "http_status": pa.array(
                [r["http_status"] for r in recs], pa.int64()
            ),
            "content_type": pa.array(
                [r["content_type"] for r in recs], pa.string()
            ),
            "payload": pa.array([r["payload"] for r in recs], pa.binary()),
        }
    )


class WarcParseStage:
    """Actor-pool stage: (bytes blob per row) -> parsed record rows.

    ``tag_errors=True`` appends the repo's dead-letter ``_error``
    column (`stages/deadletter.ERROR_COL`): good records carry a null
    error, per-record parse rejects become rows with the reject
    metadata in (url, warc_type) and the message in ``_error``, ready
    for `split_dead_letter`. The default keeps the plain WARC_SCHEMA
    for existing consumers.
    """

    def __init__(self, tag_errors: bool = False):
        self.tag_errors = tag_errors

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.deadletter import ERROR_COL

        if batch.num_rows == 0:
            # Ray 2.49 skips UDFs on zero-row blocks (util.py), but a
            # direct caller — or a future Ray — must still get the
            # typed empty table rather than an IndexError on tables[0]
            empty = WARC_SCHEMA.empty_table()
            if self.tag_errors:
                empty = empty.append_column(
                    ERROR_COL, pa.array([], pa.string())
                )
            return empty
        tables = []
        for blob in batch["bytes"]:
            rejects: list[dict] | None = [] if self.tag_errors else None
            recs = parse_warc(blob.as_py(), rejects=rejects)
            tb = records_table(recs) if recs else WARC_SCHEMA.empty_table()
            if self.tag_errors:
                tb = tb.append_column(
                    ERROR_COL, pa.array([None] * tb.num_rows, pa.string())
                )
                if rejects:
                    dead = pa.table(
                        {
                            "url": pa.array(
                                [r["url"] for r in rejects], pa.string()
                            ),
                            "warc_type": pa.array(
                                [r["warc_type"] for r in rejects], pa.string()
                            ),
                            "warc_date": pa.array(
                                [""] * len(rejects), pa.string()
                            ),
                            "http_status": pa.array(
                                [0] * len(rejects), pa.int64()
                            ),
                            "content_type": pa.array(
                                [""] * len(rejects), pa.string()
                            ),
                            "payload": pa.array(
                                [b""] * len(rejects), pa.binary()
                            ),
                            ERROR_COL: pa.array(
                                [
                                    f"offset {r['offset']}: {r['error']}"
                                    for r in rejects
                                ],
                                pa.string(),
                            ),
                        }
                    )
                    tb = pa.concat_tables([tb, dead])
            if tb.num_rows or not tables:
                tables.append(tb)
        return pa.concat_tables(tables) if len(tables) > 1 else tables[0]


def read_warc(
    paths: str | list[str], tag_errors: bool = False
) -> "rd.Dataset":
    """Read .warc.gz archives into a (url, warc_type, warc_date,
    http_status, content_type, payload) Dataset. One archive = one
    parse unit; ray.data assigns archives to read tasks, the actor
    pool parses. ``batch_size=1`` keeps one ~1 GB archive per task
    heap at production archive sizes. With ``tag_errors=True`` the
    output carries the dead-letter ``_error`` column; fork it with
    `stages.deadletter.split_dead_letter`."""
    files = rd.read_binary_files(paths)
    return files.map_batches(
        WarcParseStage,
        fn_constructor_kwargs={"tag_errors": tag_errors},
        batch_format="pyarrow",
        batch_size=1,
        concurrency=(1, 8),
    )


def warc_ingest_stats(sf_dir: str) -> "rd.Dataset":
    """Ingestion-fidelity query THROUGH THE REAL CONTAINER: every
    document row is serialized into genuine .warc.gz archive bytes
    (one shard per input batch; doc_id % 3 == 0 rows as WET-style
    ``conversion`` records, the rest as HTTP ``response`` records),
    parsed back by the from-spec reader, and reported per record. The
    DuckDB oracle recomputes every field — URL, record type, date,
    status, byte length, payload MD5 — directly from `documents`, so a
    hash match proves byte-exact extraction through gzip + WARC
    framing + HTTP header split.

    Output: (doc_id, url, warc_type, warc_date, http_status,
    payload_bytes, payload_md5).
    """
    import datetime as _dt
    import hashlib

    import os

    _epoch = _dt.datetime(2026, 1, 1)

    def _to_archives(batch: pa.Table) -> pa.Table:
        recs = []
        for did, text, src in zip(
            batch["doc_id"].to_pylist(),
            batch["text"].to_pylist(),
            batch["source"].to_pylist(),
        ):
            date = (_epoch + _dt.timedelta(seconds=did)).strftime(
                "%Y-%m-%dT%H:%M:%SZ"
            )
            recs.append(
                {
                    "warc_type": "conversion" if did % 3 == 0 else "response",
                    "url": f"https://{src}.example.org/doc/{did}",
                    "date": date,
                    "record_id": f"doc-{did}",
                    "body": (text or "").encode("utf-8"),
                    "status": 200,
                }
            )
        return pa.table({"bytes": pa.array([build_warc_gz(recs)], pa.binary())})

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("url", pa.string()),
            ("warc_type", pa.string()),
            ("warc_date", pa.string()),
            ("http_status", pa.int64()),
            ("payload_bytes", pa.int64()),
            ("payload_md5", pa.string()),
        ]
    )

    def _stats(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        payloads = [p.as_py() for p in batch["payload"]]
        return pa.table(
            {
                "doc_id": pa.array(
                    [int(u.rsplit("/", 1)[1]) for u in batch["url"].to_pylist()],
                    pa.int64(),
                ),
                "url": batch["url"],
                "warc_type": batch["warc_type"],
                "warc_date": batch["warc_date"],
                "http_status": batch["http_status"],
                "payload_bytes": pa.array(
                    [len(p) for p in payloads], pa.int64()
                ),
                "payload_md5": pa.array(
                    [hashlib.md5(p).hexdigest() for p in payloads], pa.string()
                ),
            }
        )

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    archives = docs.map_batches(_to_archives, batch_format="pyarrow")
    parsed = archives.map_batches(
        WarcParseStage, batch_format="pyarrow", batch_size=1, concurrency=(1, 8)
    )
    return parsed.map_batches(_stats, batch_format="pyarrow")


def warc_oracle_sql() -> str:
    """DuckDB twin of `warc_ingest_stats` (strlen = UTF-8 bytes; md5
    hashes the same bytes the engine framed through the container)."""
    return """
        SELECT doc_id,
               'https://' || source || '.example.org/doc/' || doc_id AS url,
               CASE WHEN doc_id % 3 = 0 THEN 'conversion'
                    ELSE 'response' END AS warc_type,
               strftime(TIMESTAMP '2026-01-01 00:00:00' + to_seconds(doc_id),
                        '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
               CAST(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 200 END AS BIGINT)
                   AS http_status,
               CAST(strlen(text) AS BIGINT) AS payload_bytes,
               md5(text) AS payload_md5
        FROM documents
    """
