"""WARC container parsing (operators/warc.py): record framing,
per-record gzip members, HTTP response splitting, malformed tolerance,
and the distributed explode into (uri, html) rows."""

import random

from data_engineering_etl_self_service_spark.operators.warc import (
    build_warc,
    http_body,
    iter_warc_records,
    parse_warc,
)


def test_warc_roundtrip_plain_and_gzip_members():
    """Both layouts — plain concatenated records and Common Crawl's
    one-gzip-member-per-record .warc.gz — walk to the same records:
    warcinfo + (request, response) per page, URIs and HTTP entity
    bodies (UTF-8 pages included) intact."""
    pages = [
        ("http://a.example/1", "<html><body><p>hello one</p></body></html>"),
        ("http://a.example/2", "<html><body><p>héllo two</p></body></html>"),
    ]
    for gz in (True, False):
        raw = build_warc(pages, gzip_members=gz)
        if gz:
            assert raw[:2] == b"\x1f\x8b"
        recs = list(iter_warc_records(raw))
        assert [r["type"] for r in recs] == [
            "warcinfo", "request", "response", "request", "response",
        ]
        resp = [r for r in recs if r["type"] == "response"]
        assert resp[0]["uri"] == "http://a.example/1"
        assert resp[0]["payload"].startswith(b"HTTP/1.1 200 OK")
        assert (
            "héllo two"
            in http_body(resp[1]["payload"]).decode("utf-8")
        )
        m = parse_warc(raw)
        assert m == {
            "gzipped": gz,
            "n_records": 5,
            "n_responses": 2,
            "n_requests": 2,
            "n_warcinfo": 1,
            "payload_bytes": sum(len(r["payload"]) for r in recs),
        }


def test_warc_content_length_is_honored_over_scanning():
    """A record body may contain WARC/1.0 and CRLF CRLF byte runs —
    framing must consume exactly Content-Length bytes, not scan for the
    next version line."""
    trap = "<p>fake\r\n\r\nWARC/1.0\r\nrecord inside body</p>"
    raw = build_warc(
        [("http://t/x", trap), ("http://t/y", "<p>after</p>")],
        gzip_members=False,
    )
    recs = [r for r in iter_warc_records(raw) if r["type"] == "response"]
    assert len(recs) == 2
    assert b"record inside body" in recs[0]["payload"]
    assert http_body(recs[1]["payload"]) == b"<p>after</p>"


def test_warc_malformed_never_raises():
    """Arbitrary bytes, truncations at every boundary, corrupt gzip
    members, and lying Content-Length end the walk with whatever parsed
    — never an exception (mapInPandas task-kill safety)."""
    pages = [("http://a/1", "<p>one</p>"), ("http://a/2", "<p>two</p>")]
    for gz in (True, False):
        raw = build_warc(pages, gzip_members=gz)
        for cut in range(0, len(raw), 23):
            list(iter_warc_records(raw[:cut]))
            parse_warc(raw[:cut])
    # a truncated gzip tail yields the complete leading records
    raw = build_warc(pages, gzip_members=True)
    partial = list(iter_warc_records(raw[: len(raw) - 10]))
    assert 0 < len(partial) <= 5
    # lying Content-Length (beyond EOF) stops cleanly
    plain = build_warc(pages, gzip_members=False)
    lying = plain.replace(b"Content-Length: 10", b"Content-Length: 99999", 1)
    list(iter_warc_records(lying))
    rng = random.Random(2)
    for _ in range(1500):
        b = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 120)))
        list(iter_warc_records(b))
        parse_warc(b)
        parse_warc(b"\x1f\x8b" + b)
        assert parse_warc(b"nope" + b) is None


def test_warc_explode_to_pages(spark):
    """warc_html_payloads explodes blobs into one (doc_id, uri, html)
    row per response record — multi-page members fan out, corrupt blobs
    contribute zero rows instead of failing the task."""
    from data_engineering_etl_self_service_spark.operators.warc import (
        warc_html_payloads,
    )

    two = build_warc(
        [("http://m/1", "<p>a</p>"), ("http://m/2", "<p>b</p>")],
        gzip_members=True,
    )
    one = build_warc([("http://m/3", "<p>c</p>")], gzip_members=False)
    df = spark.createDataFrame(
        [
            (1, bytearray(two)),
            (2, bytearray(one)),
            (3, bytearray(b"not a warc at all")),
        ],
        "doc_id long, warc binary",
    )
    rows = sorted(
        (r.doc_id, r.uri, r.html)
        for r in warc_html_payloads(df).collect()
    )
    assert rows == [
        (1, "http://m/1", "<p>a</p>"),
        (1, "http://m/2", "<p>b</p>"),
        (2, "http://m/3", "<p>c</p>"),
    ]


def test_http_body_dechunks_transfer_encoding():
    """Real Common Crawl response records can carry Transfer-Encoding:
    chunked; http_body must strip the hex size lines, per-chunk CRLFs,
    the 0-terminator, and trailer headers so only entity bytes reach
    the extractor."""
    body = ("lorem ipsum " * 40).encode()  # > 64 bytes -> many chunks
    for blob_chunked in (True, False):
        blob = build_warc(
            [("http://x/a", body.decode())], chunked=blob_chunked
        )
        recs = [r for r in iter_warc_records(blob) if r["type"] == "response"]
        assert len(recs) == 1
        assert http_body(recs[0]["payload"]) == body
    # chunk extension after ';' is ignored; list-valued TE handled
    framed = (
        b"HTTP/1.1 200 OK\r\n"
        b"Transfer-Encoding: gzip, chunked\r\n\r\n"
        b"5;name=v\r\nhello\r\n"
        b"1\r\n \r\n"
        b"5\r\nworld\r\n"
        b"0\r\n"
        b"X-Trailer: t\r\n\r\n"
    )
    assert http_body(framed) == b"hello world"


def test_http_body_malformed_chunked_falls_back_raw():
    """Malformed chunk framing (bad hex, truncated chunk, missing CRLF)
    surfaces the raw body instead of raising — tolerant-parse contract."""
    cases = [
        b"zz\r\nhello\r\n0\r\n\r\n",  # non-hex size
        b"ff\r\nshort\r\n0\r\n\r\n",  # declared > available
        b"5\r\nhelloX0\r\n\r\n",  # missing chunk-terminating CRLF
        b"5\r\nhello",  # truncated after data
    ]
    for raw_body in cases:
        payload = (
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            + raw_body
        )
        assert http_body(payload) == raw_body


def test_http_body_content_length_unaffected():
    payload = b"HTTP/1.1 200 OK\r\nContent-Length: 5\r\n\r\nhello"
    assert http_body(payload) == b"hello"
    assert http_body(b"not http at all") == b"not http at all"
