"""WARC (Web ARChive, ISO 28500) record parsing — the actual arrival
container of web-crawl corpora (Common Crawl ships WARC), completing the
real ingestion story: WARC member -> HTTP response payload ->
operators/html.py extraction -> text curation. The reference has no
crawl-side stage at all (its corpus arrives pre-extracted).

Public format facts only: a WARC file is a sequence of records, each a
version line (``WARC/1.0``), CRLF-separated named headers
(``WARC-Type``, ``WARC-Target-URI``, ``Content-Length``, ...), CRLF
CRLF, then exactly ``Content-Length`` payload bytes, then CRLF CRLF.
Common Crawl compresses each record as its OWN gzip member and
concatenates the members — the property that makes a .warc.gz splittable
at member boundaries, and exactly what :func:`iter_warc_records`
supports (multi-member gzip via zlib wbits=47, plus plain uncompressed
files). ``response`` records carry an HTTP/1.1 message; the HTTP status
line + headers are split off so the caller gets the entity body (the
HTML).

- :func:`iter_warc_records` — dicts of (headers, payload) per record;
  tolerant: a malformed record or truncated member ends the walk with
  whatever parsed, never raises.
- :func:`parse_warc` — typed file-level metadata (record counts by
  type, gzipped flag, total payload bytes).
- :func:`warc_html_payloads` — the Spark entry: DataFrame of one WARC
  blob per row -> exploded (uri, html) rows for response records, an
  Arrow-batched scan-stage pass.
- :func:`build_warc` — deterministic builder (warcinfo + request +
  response records, optional per-record gzip members) for
  builder-exercises-parser tests and the ``warc_extract_stats`` oracle.
"""

from __future__ import annotations

import zlib

_CRLF = b"\r\n"


# ------------------------------------------------------------- builder


def _gzip_member(data: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 31)  # wbits 31 = gzip wrap
    return co.compress(data) + co.flush()


def _record(rtype: str, headers: dict, payload: bytes) -> bytes:
    head = [b"WARC/1.0"]
    head.append(f"WARC-Type: {rtype}".encode())
    for k, v in headers.items():
        head.append(f"{k}: {v}".encode())
    head.append(f"Content-Length: {len(payload)}".encode())
    return (
        _CRLF.join(head) + _CRLF + _CRLF + payload + _CRLF + _CRLF
    )


def build_warc(
    pages: "list[tuple[str, str]]",
    gzip_members: bool = True,
    record_id_base: int = 0,
    chunked: bool = False,
) -> bytes:
    """A WARC file of (uri, html) response records.

    Layout per Common Crawl: a leading ``warcinfo`` record, then per
    page a ``request`` record (headers only) and a ``response`` record
    whose payload is a full HTTP/1.1 message carrying the HTML. With
    ``gzip_members`` each record is its own gzip member (the splittable
    .warc.gz layout); otherwise the records are plain concatenated.
    With ``chunked`` the HTTP responses use ``Transfer-Encoding:
    chunked`` (64-byte chunks + a trailer header) instead of
    Content-Length — the other framing real crawl records carry, so
    :func:`http_body`'s de-chunking is builder-exercised."""
    records = [
        _record(
            "warcinfo",
            {"WARC-Record-ID": f"<urn:test:{record_id_base}>"},
            b"software: data_engineering_etl_self_service_spark-tests\r\n",
        )
    ]
    for i, (uri, html) in enumerate(pages):
        records.append(
            _record(
                "request",
                {
                    "WARC-Target-URI": uri,
                    "WARC-Record-ID": f"<urn:test:{record_id_base}:{i}:q>",
                },
                f"GET {uri} HTTP/1.1\r\nHost: x\r\n\r\n".encode(),
            )
        )
        body = html.encode("utf-8")
        if chunked:
            framed = bytearray()
            for off in range(0, len(body), 64):
                piece = body[off : off + 64]
                framed += f"{len(piece):x}".encode() + _CRLF
                framed += piece + _CRLF
            framed += b"0" + _CRLF
            framed += b"X-Trailer: end" + _CRLF + _CRLF
            http = (
                b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html; charset=utf-8\r\n"
                b"Transfer-Encoding: chunked\r\n\r\n" + bytes(framed)
            )
        else:
            http = (
                b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html; charset=utf-8\r\n"
                + f"Content-Length: {len(body)}\r\n\r\n".encode()
                + body
            )
        records.append(
            _record(
                "response",
                {
                    "WARC-Target-URI": uri,
                    "WARC-Record-ID": f"<urn:test:{record_id_base}:{i}:r>",
                },
                http,
            )
        )
    if gzip_members:
        return b"".join(_gzip_member(r) for r in records)
    return b"".join(records)


# ------------------------------------------------------------- parsing


def _inflate_members(raw: bytes) -> bytes:
    """Concatenated gzip members -> concatenated plain bytes (wbits 47
    auto-detects zlib/gzip; loop per member). Truncated final member
    yields what decompressed so far."""
    out = bytearray()
    pos = 0
    while pos < len(raw):
        d = zlib.decompressobj(47)
        try:
            out += d.decompress(raw[pos:])
            out += d.flush()
        except zlib.error:
            break
        if not d.unused_data:
            break
        pos = len(raw) - len(d.unused_data)
    return bytes(out)


def iter_warc_records(raw: bytes):
    """Yield ``{"type", "uri", "headers", "payload"}`` per WARC record.

    Accepts plain or per-record-gzip input (sniffed by the 1f 8b magic).
    Tolerant by contract: a record whose version line, headers, or
    declared Content-Length doesn't parse ends the walk with whatever
    already parsed — one dirty member must not kill a 100 TB task."""
    try:
        if raw[:2] == b"\x1f\x8b":
            raw = _inflate_members(raw)
        pos = 0
        while pos < len(raw):
            # skip inter-record CRLFs
            while raw[pos : pos + 2] == _CRLF:
                pos += 2
            if not raw[pos : pos + 5] == b"WARC/":
                return
            hdr_end = raw.find(_CRLF + _CRLF, pos)
            if hdr_end < 0:
                return
            headers: dict[str, str] = {}
            for line in raw[pos:hdr_end].split(_CRLF)[1:]:
                k, sep, v = line.partition(b":")
                if sep:
                    headers[k.decode("latin-1").strip().lower()] = (
                        v.decode("latin-1").strip()
                    )
            try:
                length = int(headers.get("content-length", ""))
            except ValueError:
                return
            body_start = hdr_end + 4
            if body_start + length > len(raw):
                return  # truncated record
            yield {
                "type": headers.get("warc-type", ""),
                "uri": headers.get("warc-target-uri"),
                "headers": headers,
                "payload": raw[body_start : body_start + length],
            }
            pos = body_start + length
    except Exception:
        return


def http_body(payload: bytes) -> bytes:
    """Entity body of an HTTP/1.1 message payload: status line + headers
    split off and, when the headers declare ``Transfer-Encoding:
    chunked`` (which real Common Crawl response records do use), the
    chunked framing removed — hex size lines (with optional ;ext),
    per-chunk CRLFs, the 0-chunk terminator, and any trailer headers
    all stripped so only entity bytes reach the extractor. Returns the
    payload unchanged when it isn't an HTTP message, and falls back to
    the raw (framed) body on malformed chunk framing rather than
    raising — tolerant-parse like the rest of this module."""
    if not payload.startswith(b"HTTP/"):
        return payload
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0:
        return payload
    head, body = payload[:sep], payload[sep + 4 :]
    chunked = False
    for line in head.split(_CRLF)[1:]:
        k, s, v = line.partition(b":")
        if s and k.strip().lower() == b"transfer-encoding":
            # value may be a list, e.g. "gzip, chunked"
            encs = [e.strip().lower() for e in v.split(b",")]
            chunked = b"chunked" in encs
    if not chunked:
        return body
    out = bytearray()
    pos = 0
    while True:
        eol = body.find(_CRLF, pos)
        if eol < 0:
            return body  # malformed framing: surface the raw body
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return body
        pos = eol + 2
        if size == 0:
            return bytes(out)  # trailers (if any) intentionally dropped
        if pos + size > len(body):
            return body  # truncated chunk
        out += body[pos : pos + size]
        pos += size
        if body[pos : pos + 2] == _CRLF:
            pos += 2
        else:
            return body


def parse_warc(raw: bytes):
    """Typed WARC metadata → dict or None (not a WARC).

    Keys: gzipped, n_records, n_responses, n_requests, n_warcinfo,
    payload_bytes (sum of declared record payload lengths). Never
    raises on arbitrary bytes."""
    try:
        gz = raw[:2] == b"\x1f\x8b"
        plain = _inflate_members(raw) if gz else raw
        if not gz and plain[:5] != b"WARC/":
            return None
        if gz and plain[:5] != b"WARC/":
            return None
        counts = {"response": 0, "request": 0, "warcinfo": 0}
        n = 0
        total = 0
        for rec in iter_warc_records(raw):
            n += 1
            total += len(rec["payload"])
            if rec["type"] in counts:
                counts[rec["type"]] += 1
        return {
            "gzipped": gz,
            "n_records": n,
            "n_responses": counts["response"],
            "n_requests": counts["request"],
            "n_warcinfo": counts["warcinfo"],
            "payload_bytes": total,
        }
    except Exception:
        return None


# --------------------------------------------------------- Spark entry


def warc_html_payloads(df, warc_col: str = "warc", id_col: str = "doc_id"):
    """Explode WARC blobs into (id, uri, html) rows for every
    ``response`` record — the ingestion seam ahead of
    operators/html.py. One Arrow-batched mapInPandas pass in the scan
    stage (no exchange); at 100 TB, crawl shards are row-partitioned
    and added executors divide the decode directly."""
    def explode(it):
        import pandas as pd

        for pdf in it:
            ids, uris, htmls = [], [], []
            for i, blob in zip(pdf[id_col], pdf[warc_col]):
                for rec in iter_warc_records(
                    bytes(blob) if blob is not None else b""
                ):
                    if rec["type"] != "response":
                        continue
                    ids.append(int(i))
                    uris.append(rec["uri"] or "")
                    htmls.append(
                        http_body(rec["payload"]).decode("utf-8", "replace")
                    )
            yield pd.DataFrame(
                {id_col: ids, "uri": uris, "html": htmls}
            )

    return df.mapInPandas(
        explode, f"{id_col} long, uri string, html string"
    )
