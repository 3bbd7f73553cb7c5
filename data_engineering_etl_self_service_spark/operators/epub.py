"""EPUB text extraction — books are a core pretraining source and EPUB
(IDPF OCF/OPF, public spec) is their arrival format: a zip container
(operators/archive.py again) holding ``META-INF/container.xml`` → an
OPF package document → XHTML chapters, whose READING ORDER is the OPF
<spine>, not the zip member order.

`extract_epub` follows the real resolution chain: container.xml's
rootfile → OPF manifest (id → href) → spine idrefs → chapter XHTML
body text via ElementTree itertext (head/script skipped by walking
body only). `build_epub` deliberately stores chapters in REVERSE zip
order while the spine lists them forward — an extractor that walks zip
order instead of the spine scrambles the book, and the oracled
round-trip catches it. The container uses stored (uncompressed)
members throughout, satisfying OCF's stored-``mimetype``-first rule.

Malformed containers degrade (ok=False, best-effort text), never
raise.

Scale: one book per row, Arrow-batched per-row parse; shuffle-free,
linear.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

from .archive import build_zip, iter_zip_members

CHAPTER_TOKENS = 40
PARA_TOKENS = 20

OPF_NS = "http://www.idpf.org/2007/opf"
DC_NS = "http://purl.org/dc/elements/1.1/"
CONTAINER_NS = "urn:oasis:names:tc:opendocument:xmlns:container"

_CONTAINER = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    f'<container version="1.0" xmlns="{CONTAINER_NS}">'
    '<rootfiles><rootfile full-path="OEBPS/content.opf" '
    'media-type="application/oebps-package+xml"/></rootfiles></container>'
)


def _chapter_xhtml(k: int, tokens: "list[str]") -> str:
    paras = "".join(
        f"<p>{escape(' '.join(tokens[i : i + PARA_TOKENS]))}</p>"
        for i in range(0, len(tokens), PARA_TOKENS)
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<html xmlns="http://www.w3.org/1999/xhtml">'
        f"<head><title>ch{k}</title></head>"
        f"<body><h1>Chapter {k}</h1>{paras}</body></html>"
    )


def build_epub(text: str, doc_id: int) -> bytes:
    """Deterministic EPUB: 40-token chapters (20-token paragraphs),
    chapters zip-stored in REVERSE order, spine forward."""
    tokens = text.split(" ")
    chapters = [
        tokens[i : i + CHAPTER_TOKENS]
        for i in range(0, len(tokens), CHAPTER_TOKENS)
    ]
    manifest = "".join(
        f'<item id="c{k + 1}" href="ch{k + 1}.xhtml" '
        'media-type="application/xhtml+xml"/>'
        for k in range(len(chapters))
    )
    spine = "".join(
        f'<itemref idref="c{k + 1}"/>' for k in range(len(chapters))
    )
    opf = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<package xmlns="{OPF_NS}" version="3.0" unique-identifier="id">'
        f'<metadata xmlns:dc="{DC_NS}">'
        f"<dc:title>Book {doc_id}</dc:title>"
        f"<dc:identifier id=\"id\">corpus:{doc_id}</dc:identifier>"
        "</metadata>"
        f"<manifest>{manifest}</manifest><spine>{spine}</spine></package>"
    )
    members = [
        ("mimetype", b"application/epub+zip"),
        ("META-INF/container.xml", _CONTAINER.encode()),
        ("OEBPS/content.opf", opf.encode()),
    ] + [
        (
            f"OEBPS/ch{k + 1}.xhtml",
            _chapter_xhtml(k + 1, chapters[k]).encode(),
        )
        for k in reversed(range(len(chapters)))  # zip order != spine
    ]
    return build_zip(members, deflate=False)  # OCF stored-mimetype rule


def _body_text(xhtml: bytes) -> str:
    try:
        root = ET.fromstring(xhtml)
    except ET.ParseError:
        return ""
    body = root.find("{http://www.w3.org/1999/xhtml}body")
    if body is None:
        body = root.find("body")
    if body is None:
        return ""
    return " ".join(
        s.strip() for s in body.itertext() if s.strip()
    )


def extract_epub(raw: bytes) -> dict:
    """→ ``{ok, mimetype_ok, title, n_chapters, text}`` with chapters
    concatenated in SPINE order."""
    out = {
        "ok": False,
        "mimetype_ok": False,
        "title": None,
        "n_chapters": 0,
        "text": "",
    }
    parts = {}
    first = None
    for m in iter_zip_members(raw):
        if first is None:
            first = m
        parts[m["name"]] = m["payload"]
    if first is not None and first["name"] == "mimetype":
        out["mimetype_ok"] = (
            first["payload"] == b"application/epub+zip"
            and first["method"] == 0
        )
    container = parts.get("META-INF/container.xml")
    if container is None:
        return out
    try:
        croot = ET.fromstring(container)
    except ET.ParseError:
        return out
    rootfile = croot.find(f".//{{{CONTAINER_NS}}}rootfile")
    if rootfile is None:
        return out
    opf_path = rootfile.get("full-path", "")
    opf = parts.get(opf_path)
    if opf is None:
        return out
    try:
        proot = ET.fromstring(opf)
    except ET.ParseError:
        return out
    t = proot.find(f".//{{{DC_NS}}}title")
    out["title"] = t.text if t is not None else None
    base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
    hrefs = {
        item.get("id"): item.get("href")
        for item in proot.iter(f"{{{OPF_NS}}}item")
    }
    texts = []
    for ref in proot.iter(f"{{{OPF_NS}}}itemref"):
        href = hrefs.get(ref.get("idref"))
        if href is None:
            continue
        payload = parts.get(base + href)
        if payload is None:
            continue
        texts.append(_body_text(payload))
        out["n_chapters"] += 1
    out["text"] = " ".join(texts)
    out["ok"] = True
    return out
