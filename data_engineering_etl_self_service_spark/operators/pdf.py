"""PDF text extraction — with HTML (operators/html.py) the other major
arrival format of real pretraining corpora (the reference corpus arrives
pre-extracted; ref: dags/ contains only structured-event pipelines, so
the reference has no equivalent stage).

Everything is the public ISO 32000-1 file format: object/xref framing,
FlateDecode stream filters (stdlib zlib — REAL decompression, not a
stub), page-tree walk, and the content-stream text operators
(BT/ET blocks, Tj / TJ / ' / " show-text, literal strings with escapes,
hex strings). Scope line, documented: non-encrypted PDFs whose fonts use
a byte-oriented encoding (WinAnsi/Standard — the vast majority of
text-first PDFs); composite-font CMap/ToUnicode mapping is out of scope,
and such files degrade to whatever byte-oriented text their streams
yield, never to an exception.

- :func:`extract_pdf_text` — one document's visible text, best-effort,
  NEVER raises (the property that matters when one dirty file must not
  kill a 100 TB task). Literal-string escapes (``\\( \\) \\\\ \\n``
  octal), hex strings, and per-``TJ``-array gap joining are handled;
  streams whose ``/Filter`` is FlateDecode are inflated, unknown
  filters are skipped.
- :func:`parse_pdf` — typed metadata (version, n_pages, n_objects,
  n_streams, flate_streams, encrypted) for curation-time
  filter/bucket/bill decisions without extracting anything.
- :func:`build_pdf` — deterministic builder used by tests and the
  ``pdf_extract_stats`` oracle (builder-exercises-parser, the
  operators/mp3.py strategy): wraps plain text into a multi-page PDF
  (120 words/page, 12-word lines), alternating by doc_id between
  FlateDecode-compressed and raw streams, ``Tj`` and ``TJ``-array show
  ops, literal and hex string forms — with parenthesis/backslash
  escapes exercised — such that extraction recovers the original text
  exactly, symbolically stateable by a SQL oracle.

Spark integration: like the other codecs, extraction runs as an
Arrow-batched pass in the scan stage (no exchange); at 100 TB the cost
is row-partitioned CPU that added executors divide directly.
"""

from __future__ import annotations

import re
import zlib

_WORDS_PER_LINE = 12
_LINES_PER_PAGE = 10
_WORDS_PER_PAGE = _WORDS_PER_LINE * _LINES_PER_PAGE


# ------------------------------------------------------------- builder


def _esc_literal(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _page_content(lines: list[str], style: int) -> bytes:
    """One page's content stream. ``style`` 0: one Tj per line; 1: one
    TJ array per line with inter-word kerning gaps (the word-processor
    layout extractors must rejoin); 2: hex-string Tj."""
    ops = ["BT", "/F1 11 Tf", "12 TL", "72 720 Td"]
    for ln in lines:
        if style == 1:
            parts = " -240 ".join(
                f"({_esc_literal(w)})" for w in ln.split(" ")
            )
            ops.append(f"[{parts}] TJ T*")
        elif style == 2:
            ops.append(f"<{ln.encode('latin-1').hex()}> Tj T*")
        else:
            ops.append(f"({_esc_literal(ln)}) Tj T*")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def build_pdf(text: str, doc_id: int = 0) -> bytes:
    """Deterministic text PDF: 120 words/page in 12-word lines.

    doc_id-dependent variation (each path is a distinct extractor
    branch): ``doc_id % 2`` FlateDecode-compresses the content streams;
    ``doc_id % 3`` selects the show-text style per document (0 ``Tj``
    literal, 1 ``TJ`` kerned array, 2 hex strings). Words containing
    ``( ) \\`` are escaped in literal styles; hex style carries any
    latin-1 byte.
    """
    words = text.split()
    pages_words = [
        words[i : i + _WORDS_PER_PAGE]
        for i in range(0, len(words), _WORDS_PER_PAGE)
    ] or [[]]
    style = doc_id % 3
    compress = doc_id % 2 == 0

    objects: list[bytes] = []  # 1-indexed bodies, object i = objects[i-1]
    n_pages = len(pages_words)
    # 1: catalog, 2: pages, 3: font; pages are 4..3+n, contents follow
    kids = " ".join(f"{4 + i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    content_ids = []
    for i in range(n_pages):
        cid = 4 + n_pages + i
        content_ids.append(cid)
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {cid} 0 R >>"
            ).encode()
        )
    for i, pw in enumerate(pages_words):
        lines = [
            " ".join(pw[j : j + _WORDS_PER_LINE])
            for j in range(0, len(pw), _WORDS_PER_LINE)
        ] or [""]
        data = _page_content(lines, style)
        if compress:
            data = zlib.compress(data, 6)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>"
        else:
            head = f"<< /Length {len(data)} >>"
        objects.append(
            head.encode() + b"\nstream\n" + data + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


# ------------------------------------------------------------ extractor

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n")
# a literal string token (with escapes resolved separately), a hex
# string, or an operator word
_TOKEN_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)"
    rb"|<[0-9A-Fa-f\s]*>"
    rb"|\[|\]"
    rb"|-?\d+(?:\.\d+)?"
    rb"|[A-Za-z'\"*]+"
)

#: a TJ kern at or below this (thousandths of an em, negative = extra
#: gap) renders as a word space — the standard extractor heuristic for
#: word-processor PDFs that kern instead of emitting space glyphs.
_TJ_SPACE_KERN = -180.0
_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


def _decode_literal(tok: bytes) -> bytes:
    body = tok[1:-1]
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i : i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1 : i + 2]
            if nxt.isdigit():  # up to 3 octal digits
                j = i + 1
                while j < len(body) and j < i + 4 and body[j : j + 1].isdigit():
                    j += 1
                out.append(int(body[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            out += _ESCAPES.get(nxt, nxt)
            i += 2
            continue
        out += c
        i += 1
    return bytes(out)


def _decode_hex(tok: bytes) -> bytes:
    h = re.sub(rb"\s", b"", tok[1:-1])
    if len(h) % 2:
        h += b"0"  # ISO 32000 7.3.4.3: odd final digit implies 0
    try:
        return bytes.fromhex(h.decode("ascii"))
    except ValueError:
        return b""


def _stream_text(data: bytes) -> list[str]:
    """Visible text chunks of one decoded content stream, in order."""
    chunks: list[str] = []
    pending: list[bytes] = []  # strings seen since the last show op
    in_array = False
    array_parts: list[bytes] = []
    for m in _TOKEN_RE.finditer(data):
        tok = m.group(0)
        if tok == b"[":
            in_array, array_parts = True, []
        elif tok == b"]":
            in_array = False
            pending.append(b"".join(array_parts))
        elif tok.startswith(b"("):
            (array_parts if in_array else pending).append(
                _decode_literal(tok)
            )
        elif tok.startswith(b"<"):
            (array_parts if in_array else pending).append(_decode_hex(tok))
        elif in_array and tok[:1] in b"-0123456789":
            # TJ kern: a wide negative adjustment renders as a word space
            if float(tok) <= _TJ_SPACE_KERN:
                array_parts.append(b" ")
        elif tok in (b"Tj", b"TJ", b"'", b'"'):
            for s in pending:
                t = s.decode("latin-1")
                if t:
                    chunks.append(t)
            pending = []
        elif tok in (b"BT", b"ET"):
            pending = []
    return chunks


def extract_pdf_text(raw: bytes) -> str:
    """All text shown by a PDF's content streams, space-joined.

    Best-effort on malformed input — returns ``""`` rather than raising
    on anything (truncated xref, bogus lengths, corrupt deflate data,
    encrypted files)."""
    try:
        chunks: list[str] = []
        for data in _iter_streams(raw):
            chunks.extend(_stream_text(data))
        return " ".join(" ".join(chunks).split())
    except Exception:
        return ""


_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b")


def _ends_stream(raw: bytes, pos: int) -> int:
    """If (EOL?) ``endstream`` starts at ``pos`` (give or take the
    spec's trailing EOL), return the position just past the keyword,
    else -1."""
    for skip in (0, 1, 2):
        if raw.startswith(b"endstream", pos + skip) and raw[
            pos : pos + skip
        ] in (b"", b"\n", b"\r", b"\r\n"):
            return pos + skip + len(b"endstream")
    return -1


def _walk_objects(raw: bytes):
    """Yield (head_bytes, raw_stream_data_or_None) per object, document
    order. Offsets come from scanning ``N M obj`` markers (an xref table
    is not trusted — real-world files lie), but stream EXTENTS prefer a
    verified direct-integer ``/Length`` (compressed bytes legitimately
    contain ``endobj``/``endstream`` byte runs, so a bare keyword scan
    misparses — seen in practice on this module's own fixtures) and fall
    back to an ``endstream`` scan only when /Length is absent or lies.
    Consumed stream bytes are skipped, so markers inside stream data are
    never re-parsed as objects."""
    pos = 0
    while True:
        m = _OBJ_RE.search(raw, pos)
        if m is None:
            return
        start = m.end()
        sm = _STREAM_RE.search(raw, start)
        em = raw.find(b"endobj", start)
        if sm is None or (0 <= em < sm.start()):
            # streamless object
            yield raw[start : em if em >= 0 else len(raw)], None
            if em < 0 and sm is None:
                return
            pos = em + 6 if em >= 0 else sm.start()
            continue
        head = raw[start : sm.start()]
        data_start = sm.end()
        se = -1
        lm = _LENGTH_RE.search(head)
        if lm:
            cand = data_start + int(lm.group(1))
            if cand <= len(raw) and _ends_stream(raw, cand) >= 0:
                se = cand
        if se >= 0:
            data = raw[data_start:se]  # /Length-exact: EOL is NOT data
        else:
            se = raw.find(b"endstream", data_start)
            if se < 0:
                yield head, None
                return
            data = raw[data_start:se]
            # fallback scan cannot tell the spec's pre-endstream EOL
            # from data — strip it (binary data ending in 0x0A is the
            # reason the verified-/Length path above never strips)
            if data.endswith(b"\r\n"):
                data = data[:-2]
            elif data.endswith(b"\n"):
                data = data[:-1]
        yield head, data
        pos = se


def _iter_streams(raw: bytes):
    """Decoded bytes of every stream object, document order (see
    :func:`_walk_objects` for the tolerant framing rules). FlateDecode
    inflates via zlib; any other filter (or inflate failure) skips the
    stream."""
    for head, data in _walk_objects(raw):
        if data is None:
            continue
        if b"/FlateDecode" in head:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        elif b"/Filter" in head:
            continue  # unsupported filter — skip, don't fail
        yield data


def parse_pdf(raw: bytes):
    """Typed PDF metadata → dict or None (not a PDF).

    Keys: version ('1.4', ...), n_pages (``/Type /Page`` count —
    object-scan based, xref not trusted), n_objects, n_streams,
    flate_streams, encrypted (an ``/Encrypt`` entry in a trailer).
    Never raises on arbitrary bytes."""
    try:
        if not raw.startswith(b"%PDF-"):
            return None
        version = raw[5:8].decode("latin-1", "replace")
        n_objects = 0
        n_streams = 0
        flate = 0
        n_pages = 0
        for head, data in _walk_objects(raw):
            n_objects += 1
            if data is not None:
                n_streams += 1
                if b"/FlateDecode" in head:
                    flate += 1
            elif re.search(rb"/Type\s*/Page\b(?!s)", head):
                n_pages += 1
        return {
            "version": version,
            "n_pages": n_pages,
            "n_objects": n_objects,
            "n_streams": n_streams,
            "flate_streams": flate,
            "encrypted": b"/Encrypt" in raw,
        }
    except Exception:
        return None
