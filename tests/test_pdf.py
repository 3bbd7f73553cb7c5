"""PDF text extraction (operators/pdf.py): ISO 32000 object/stream
framing, FlateDecode, content-stream text operators, malformed-byte
tolerance, and the sniff-table integration."""

import random

from data_engineering_etl_self_service_spark.operators.pdf import (
    build_pdf,
    extract_pdf_text,
    parse_pdf,
)


def test_pdf_roundtrip_all_styles():
    """Every builder branch — raw vs FlateDecode streams x Tj literal /
    kerned TJ array / hex-string show ops — extracts back to the exact
    source text; parse_pdf counts pages/streams/filters per the layout
    formula (120 words per page)."""
    texts = [
        "hello world this is a simple test document with twelve words x",
        " ".join(f"w{i}" for i in range(400)),  # 4 pages
        "escape (these) chars \\ and (more) even nested \\( literals",
        "",
    ]
    for t in texts:
        for doc_id in range(6):  # covers all (compress, style) combos
            raw = build_pdf(t, doc_id)
            assert raw.startswith(b"%PDF-1.4")
            assert extract_pdf_text(raw) == " ".join(t.split())
            m = parse_pdf(raw)
            n_pages = max(1, -(-len(t.split()) // 120))
            assert m["version"] == "1.4"
            assert m["n_pages"] == n_pages
            assert m["n_streams"] == n_pages
            assert m["flate_streams"] == (
                n_pages if doc_id % 2 == 0 else 0
            )
            assert m["encrypted"] is False


def test_pdf_tj_kern_word_spacing():
    """TJ arrays replace space glyphs with kerning adjustments; a wide
    negative kern (<= -180/1000 em) must render as a word space, while
    small kerns must NOT split words."""
    raw = build_pdf("alpha beta gamma", 1)  # style 1 = kerned TJ
    assert b" TJ" in raw and b"-240" in raw
    assert extract_pdf_text(raw) == "alpha beta gamma"
    # hand-built: small kern inside a word, wide kern between words
    body = b"BT [(al) -20 (pha) -500 (beta)] TJ ET"
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(body)).encode()
        + b" >>\nstream\n"
        + body
        + b"\nendstream\nendobj\n"
    )
    assert extract_pdf_text(pdf) == "alpha beta"


def test_pdf_length_verified_framing_beats_keyword_collision():
    """Compressed stream bytes can legitimately contain 'endobj' /
    'endstream' runs — framing must trust a verified direct-integer
    /Length over keyword scanning (a keyword-only walk truncates the
    stream and loses the document; regression: sf0.001 doc 142)."""
    import zlib

    payload = b"BT (trap) Tj ET"
    data = zlib.compress(payload)
    # splice the keywords INTO valid deflate data by appending them
    # after a flush point zlib tolerates? Simpler: wrap a stream whose
    # data genuinely contains both keywords, raw (no filter), with an
    # exact /Length — the scan fallback would cut at the embedded
    # keyword, the verified-/Length path must not.
    tricky = b"BT (before) Tj ET endstream endobj BT (after) Tj ET"
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(tricky)).encode()
        + b" >>\nstream\n"
        + tricky
        + b"\nendstream\nendobj\n2 0 obj\n<< /Length "
        + str(len(data)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + data
        + b"\nendstream\nendobj\n"
    )
    assert extract_pdf_text(pdf) == "before after trap"
    m = parse_pdf(pdf)
    assert m["n_streams"] == 2 and m["flate_streams"] == 1


def test_pdf_flate_data_ending_in_newline_byte():
    """/Length-verified stream data must be passed to zlib EXACTLY —
    stripping a trailing 0x0A byte (the fallback path's EOL heuristic)
    corrupts deflate data that happens to end in one (regression:
    sf0.001 doc 334)."""
    import zlib

    # a zlib stream ends with its big-endian Adler32, so pick a text
    # whose checksum's low byte is 0x0A — the compressed form then ends
    # in a newline byte. Growing an 'a'-run steps the byte sum by 97
    # (coprime to 256), so every residue — including 0x0A — is reached
    # within 256 steps.
    for k in range(256):
        body = b"BT (x" + b"a" * k + b" y) Tj ET"
        if zlib.adler32(body) & 0xFF == 0x0A:
            data = zlib.compress(body)
            assert data.endswith(b"\n")
            expected = "x" + "a" * k + " y"
            break
    else:
        raise AssertionError("no trailing-0x0A deflate sample found")
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(data)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + data
        + b"\nendstream\nendobj\n"
    )
    assert extract_pdf_text(pdf) == expected


def test_pdf_malformed_never_raises():
    """Arbitrary bytes, truncations at every boundary, lying /Length,
    bogus filters, and an /Encrypt trailer: extract returns best-effort
    text (possibly ''), parse returns a dict or None — never an
    exception (mapInPandas task-kill safety)."""
    rng = random.Random(11)
    for _ in range(2000):
        b = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 150)))
        assert extract_pdf_text(b) is not None
        parse_pdf(b"%PDF-" + b)
        assert parse_pdf(b"nope" + b) is None
    raw = build_pdf(" ".join(f"w{i}" for i in range(300)), 0)
    for cut in range(0, len(raw), 251):
        extract_pdf_text(raw[:cut])
        parse_pdf(raw[:cut])
    # lying /Length falls back to the endstream scan, still extracts
    lying = raw.replace(b"/Length ", b"/Length 9", 1)
    assert extract_pdf_text(lying) != "" or True  # no raise is the bar
    # unknown filter skipped, not fatal
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 4 /Filter /DCTDecode >>\n"
        b"stream\nabcd\nendstream\nendobj\n"
    )
    assert extract_pdf_text(pdf) == ""
    enc = raw[:-6] + b"<< /Encrypt 9 0 R >>\n%%EOF\n"
    assert parse_pdf(enc)["encrypted"] is True


def test_pdf_sniff_integration():
    """decode_payload types %PDF- bytes as kind='pdf' (document format:
    media fields stay null; text lives in operators/pdf.py)."""
    from data_engineering_etl_self_service_spark.operators.multimodal import (
        decode_payload,
    )

    d = decode_payload(build_pdf("some words here", 0))
    assert d["kind"] == "pdf" and d["width"] is None
    d = decode_payload(b"%PDF-1.7\ngarbage")
    assert d["kind"] == "pdf"
