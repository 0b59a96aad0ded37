"""WARC (ISO 28500 / WARC/1.0) record parsing — the crawl-scale front door.

A WARC file is a concatenation of records; each record is

    WARC/1.0\r\n
    <header-name>: <value>\r\n ...
    \r\n
    <Content-Length bytes of block>
    \r\n\r\n

For ``WARC-Type: response`` records the block is a full HTTP response
(status line, headers, CRLFCRLF, body). Record boundaries are driven by
``Content-Length`` ONLY — blocks legally contain ``\r\n\r\n`` (any HTML
with blank lines does), so a split-on-blank-line "parser" silently
corrupts real crawls; this parser refuses loudly on any malformed record
instead of resynchronizing.

Reference parity: ossarga/cassandra-data-migrator is packaging-only (its
single source file is a Maven jar-swapper), so there is no upstream WARC
counterpart; this module follows the public WARC/1.0 spec and the common
warcio semantics. Kernel discipline matches operators/multimodal.py:
the mapInPandas closure inlines the parser (stdlib only — python workers
must not need this package importable); ``parse_warc_bytes`` is the
module-level reference implementation pinned byte-identical in tests.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame

_CRLF = b"\r\n"


def parse_warc_bytes(buf: bytes) -> list[dict]:
    """Reference WARC parser (driver/test side — the kernel inlines the
    same logic). Returns one dict per record: rec_type, target_uri,
    content_length, http_status, payload_len, payload_md5."""
    out = []
    i, n = 0, len(buf)
    while i < n:
        if not buf.startswith(b"WARC/1.0\r\n", i):
            raise ValueError(f"record at offset {i} missing WARC/1.0 version line")
        i += 10
        headers = {}
        while True:
            j = buf.find(_CRLF, i)
            if j < 0:
                raise ValueError("truncated WARC header block")
            line = buf[i:j]
            i = j + 2
            if not line:
                break
            k = line.find(b":")
            if k <= 0:
                raise ValueError(f"malformed WARC header line {line!r}")
            headers[line[:k].strip().lower()] = line[k + 1 :].strip()
        if b"content-length" not in headers:
            raise ValueError("WARC record missing Content-Length")
        cl = int(headers[b"content-length"])
        if i + cl > n:
            raise ValueError("WARC block overruns file (bad Content-Length)")
        block = buf[i : i + cl]
        i += cl
        if buf[i : i + 4] != b"\r\n\r\n":
            raise ValueError("WARC record missing trailing CRLFCRLF")
        i += 4
        rec_type = headers.get(b"warc-type", b"").decode("ascii")
        uri = headers.get(b"warc-target-uri")
        status = None
        payload = block
        if rec_type == "response":
            # block is an HTTP response: split headers/body on the FIRST
            # CRLFCRLF (the body may itself contain more)
            sep = block.find(b"\r\n\r\n")
            if sep < 0:
                raise ValueError("HTTP response block has no header terminator")
            head, payload = block[:sep], block[sep + 4 :]
            sl = head.split(_CRLF, 1)[0]
            parts = sl.split(b" ")
            if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
                raise ValueError(f"malformed HTTP status line {sl!r}")
            status = int(parts[1])
            for hline in head.split(_CRLF)[1:]:
                hk = hline.find(b":")
                if hk > 0 and hline[:hk].strip().lower() == b"content-length":
                    if int(hline[hk + 1 :].strip()) != len(payload):
                        raise ValueError("HTTP Content-Length != body length")
        out.append(
            {
                "rec_type": rec_type,
                "target_uri": uri.decode("ascii") if uri is not None else None,
                "content_length": cl,
                "http_status": status,
                "payload_len": len(payload),
                "payload_md5": hashlib.md5(payload).hexdigest(),
                "payload": payload,
            }
        )
    return out


WARC_RECORD_SCHEMA = (
    "rec_type string, target_uri string, content_length bigint, "
    "http_status int, payload_len bigint, payload_md5 string"
)
WARC_RECORD_PAYLOAD_SCHEMA = WARC_RECORD_SCHEMA + ", payload binary"


def warc_records(
    df: DataFrame, content_col: str = "content", with_payload: bool = False
) -> DataFrame:
    """Arrow-batched WARC record extraction over mapInPandas: each input
    row carries one whole WARC file (binary); output is one row per
    record with exact integer/string fields only (bit-reproducible, no
    floats). The closure inlines the parser — repo kernel convention:
    python workers must not need this package importable.
    tests/test_warc.py pins the inlined copy byte-identical to
    ``parse_warc_bytes``. ``with_payload=True`` additionally emits the
    raw record payload (the HTTP body for responses) — the column the
    streaming HTML/text pipeline consumes; the digest-only default keeps
    batch record audits from hauling page bytes through the shuffle."""

    def _batches(it: Iterator) -> Iterator:
        import hashlib as _hashlib

        import pandas as pd

        def parse(buf: bytes):
            recs = []
            i, n = 0, len(buf)
            while i < n:
                if not buf.startswith(b"WARC/1.0\r\n", i):
                    raise ValueError(
                        f"record at offset {i} missing WARC/1.0 version line"
                    )
                i += 10
                headers = {}
                while True:
                    j = buf.find(b"\r\n", i)
                    if j < 0:
                        raise ValueError("truncated WARC header block")
                    line = buf[i:j]
                    i = j + 2
                    if not line:
                        break
                    k = line.find(b":")
                    if k <= 0:
                        raise ValueError(f"malformed WARC header line {line!r}")
                    headers[line[:k].strip().lower()] = line[k + 1 :].strip()
                if b"content-length" not in headers:
                    raise ValueError("WARC record missing Content-Length")
                cl = int(headers[b"content-length"])
                if i + cl > n:
                    raise ValueError("WARC block overruns file (bad Content-Length)")
                block = buf[i : i + cl]
                i += cl
                if buf[i : i + 4] != b"\r\n\r\n":
                    raise ValueError("WARC record missing trailing CRLFCRLF")
                i += 4
                rec_type = headers.get(b"warc-type", b"").decode("ascii")
                uri = headers.get(b"warc-target-uri")
                status = None
                payload = block
                if rec_type == "response":
                    sep = block.find(b"\r\n\r\n")
                    if sep < 0:
                        raise ValueError("HTTP response block has no header terminator")
                    head, payload = block[:sep], block[sep + 4 :]
                    sl = head.split(b"\r\n", 1)[0]
                    parts = sl.split(b" ")
                    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
                        raise ValueError(f"malformed HTTP status line {sl!r}")
                    status = int(parts[1])
                    for hline in head.split(b"\r\n")[1:]:
                        hk = hline.find(b":")
                        if hk > 0 and hline[:hk].strip().lower() == b"content-length":
                            if int(hline[hk + 1 :].strip()) != len(payload):
                                raise ValueError("HTTP Content-Length != body length")
                rec = (
                    rec_type,
                    uri.decode("ascii") if uri is not None else None,
                    cl,
                    status,
                    len(payload),
                    _hashlib.md5(payload).hexdigest(),
                )
                recs.append(rec + (payload,) if with_payload else rec)
            return recs

        cols = (
            "rec_type",
            "target_uri",
            "content_length",
            "http_status",
            "payload_len",
            "payload_md5",
        ) + (("payload",) if with_payload else ())
        for pdf in it:
            out = {c: [] for c in cols}
            for payload in pdf["__warc"]:
                for rec in parse(bytes(payload)):
                    for c, v in zip(cols, rec):
                        out[c].append(v)
            frame = pd.DataFrame(out)
            # http_status is None for non-response records: keep it object
            # (Arrow maps None→null); a float64 NaN column would refuse the
            # int32 cast
            frame["http_status"] = frame["http_status"].astype("object")
            yield frame

    src = df.selectExpr(f"{content_col} as __warc")
    schema = WARC_RECORD_PAYLOAD_SCHEMA if with_payload else WARC_RECORD_SCHEMA
    return src.mapInPandas(_batches, schema=schema)


def split_gzip_members(buf: bytes) -> list[bytes]:
    """Split a per-record-gzipped WARC (.warc.gz, the Common Crawl
    convention: every record is its OWN gzip member, so readers can seek
    to member offsets without decompressing the file) into decompressed
    member payloads. Reference implementation (the kernel inlines the
    same loop); refuses loudly on trailing garbage or truncated members."""
    import zlib

    out = []
    rest = bytes(buf)
    while rest:
        if rest[:2] != b"\x1f\x8b":
            raise ValueError(
                f"gzip member magic missing at offset {len(buf) - len(rest)}"
            )
        d = zlib.decompressobj(wbits=31)
        try:
            data = d.decompress(rest) + d.flush()
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member: {e}") from None
        if not d.eof:
            raise ValueError("truncated gzip member")
        out.append(data)
        rest = d.unused_data
    return out


def warc_gzip_records(df: DataFrame, content_col: str = "content",
                      with_payload: bool = False) -> DataFrame:
    """``warc_records`` over per-record-gzipped WARC files (.warc.gz, the
    format 100 TB of Common Crawl actually arrives in): each input row is
    one whole .warc.gz; the kernel splits gzip MEMBERS (zlib multi-member
    walk — one member = one record by convention, validated: a member
    whose bytes hold anything but exactly one record refuses), inflates,
    and reuses the Content-Length-framed parser. Closure is stdlib-only
    and fully inlined (repo kernel convention); pinned against
    split_gzip_members + parse_warc_bytes by tests/test_warc.py."""

    def _batches(it: Iterator) -> Iterator:
        import hashlib as _hashlib
        import zlib as _zlib

        import pandas as pd

        def members(buf: bytes):
            out = []
            rest = bytes(buf)
            while rest:
                if rest[:2] != b"\x1f\x8b":
                    raise ValueError(
                        f"gzip member magic missing at offset {len(buf) - len(rest)}"
                    )
                d = _zlib.decompressobj(wbits=31)
                try:
                    data = d.decompress(rest) + d.flush()
                except _zlib.error as e:
                    raise ValueError(f"corrupt gzip member: {e}") from None
                if not d.eof:
                    raise ValueError("truncated gzip member")
                out.append(data)
                rest = d.unused_data
            return out

        def parse_one(buf: bytes):
            # one member = one record; the record parser's framing checks
            # guarantee nothing else fits
            if not buf.startswith(b"WARC/1.0\r\n"):
                raise ValueError("gzip member does not start a WARC record")
            i = 10
            n = len(buf)
            headers = {}
            while True:
                j = buf.find(b"\r\n", i)
                if j < 0:
                    raise ValueError("truncated WARC header block")
                line = buf[i:j]
                i = j + 2
                if not line:
                    break
                k = line.find(b":")
                if k <= 0:
                    raise ValueError(f"malformed WARC header line {line!r}")
                headers[line[:k].strip().lower()] = line[k + 1 :].strip()
            if b"content-length" not in headers:
                raise ValueError("WARC record missing Content-Length")
            cl = int(headers[b"content-length"])
            if i + cl > n:
                raise ValueError("WARC block overruns member (bad Content-Length)")
            block = buf[i : i + cl]
            i += cl
            if buf[i : i + 4] != b"\r\n\r\n" or i + 4 != n:
                raise ValueError(
                    "gzip member must hold exactly one CRLFCRLF-terminated record"
                )
            rec_type = headers.get(b"warc-type", b"").decode("ascii")
            uri = headers.get(b"warc-target-uri")
            status = None
            payload = block
            if rec_type == "response":
                sep = block.find(b"\r\n\r\n")
                if sep < 0:
                    raise ValueError("HTTP response block has no header terminator")
                head, payload = block[:sep], block[sep + 4 :]
                sl = head.split(b"\r\n", 1)[0]
                parts = sl.split(b" ")
                if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
                    raise ValueError(f"malformed HTTP status line {sl!r}")
                status = int(parts[1])
                for hline in head.split(b"\r\n")[1:]:
                    hk = hline.find(b":")
                    if hk > 0 and hline[:hk].strip().lower() == b"content-length":
                        if int(hline[hk + 1 :].strip()) != len(payload):
                            raise ValueError("HTTP Content-Length != body length")
            rec = (
                rec_type,
                uri.decode("ascii") if uri is not None else None,
                cl,
                status,
                len(payload),
                _hashlib.md5(payload).hexdigest(),
            )
            return rec + (payload,) if with_payload else rec

        cols = (
            "rec_type",
            "target_uri",
            "content_length",
            "http_status",
            "payload_len",
            "payload_md5",
        ) + (("payload",) if with_payload else ())
        for pdf in it:
            out = {c: [] for c in cols}
            for gz in pdf["__warc"]:
                for member in members(bytes(gz)):
                    for c, v in zip(cols, parse_one(member)):
                        out[c].append(v)
            frame = pd.DataFrame(out)
            frame["http_status"] = frame["http_status"].astype("object")
            yield frame

    src = df.selectExpr(f"{content_col} as __warc")
    schema = WARC_RECORD_PAYLOAD_SCHEMA if with_payload else WARC_RECORD_SCHEMA
    return src.mapInPandas(_batches, schema=schema)
