"""DOCX (OOXML WordprocessingML, ECMA-376) text extraction — office
documents are a major pretraining-corpus arrival format, and a .docx is
"just" a zip of XML parts, so this composes the deterministic zip
machinery (operators/archive.py) with a stdlib-XML text extractor.

Builder side (`build_docx`) emits a minimal but structurally honest
package: ``[Content_Types].xml``, ``_rels/.rels`` with the
officeDocument relationship, and ``word/document.xml`` whose body is a
Heading-styled title paragraph, the text split into 12-token
paragraphs of 3-token runs (``xml:space="preserve"`` so run boundaries
carry their exact whitespace — the wrinkle real extractors get wrong),
and for every fourth document a 2x2 table whose cells are one-run
paragraphs. Extraction (`extract_docx_text`) walks ``w:p`` / ``w:r`` /
``w:t`` (+ ``w:tab``/``w:br``) in document order with
``xml.etree.ElementTree``, joins runs with nothing and paragraphs with
one space — so the original text must round-trip EXACTLY, which is what
the oracled query pins per document.

Malformed input degrades, never raises: a broken zip yields no parts, a
broken XML part yields an empty extraction with ``ok=False`` — the
100 TB dirty-corpus property shared by every decoder in this repo.

Scale: per-row Python inside Arrow batches, shuffle-free and linear;
documents are independent rows.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from .archive import build_zip, iter_zip_members

W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType='
    '"application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.wordprocessingml.'
    'document.main+xml"/></Types>'
)

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns='
    '"http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type='
    '"http://schemas.openxmlformats.org/officeDocument/2006/relationships/'
    'officeDocument" Target="word/document.xml"/></Relationships>'
)

PARA_TOKENS = 12
RUN_TOKENS = 3
TABLE_CELLS = ["r1c1", "r1c2", "r2c1", "r2c2"]


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _run(text: str) -> str:
    return f'<w:r><w:t xml:space="preserve">{_esc(text)}</w:t></w:r>'


def _para(tokens: "list[str]") -> str:
    runs = []
    for i in range(0, len(tokens), RUN_TOKENS):
        chunk = tokens[i : i + RUN_TOKENS]
        sep = " " if i + RUN_TOKENS < len(tokens) else ""
        runs.append(_run(" ".join(chunk) + sep))
    return "<w:p>" + "".join(runs) + "</w:p>"


def build_docx(text: str, doc_id: int) -> bytes:
    """Deterministic .docx wrapping ``text``: title paragraph
    ``Document <doc_id>``, 12-token body paragraphs of 3-token
    preserve-space runs, and a 2x2 table when ``doc_id % 4 == 0``."""
    tokens = text.split(" ")
    body = [
        '<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>'
        + _run(f"Document {doc_id}")
        + "</w:p>"
    ]
    for i in range(0, len(tokens), PARA_TOKENS):
        body.append(_para(tokens[i : i + PARA_TOKENS]))
    if doc_id % 4 == 0:
        cells = "".join(
            f"<w:tc><w:p>{_run(c)}</w:p></w:tc>" for c in TABLE_CELLS[:2]
        )
        cells2 = "".join(
            f"<w:tc><w:p>{_run(c)}</w:p></w:tc>" for c in TABLE_CELLS[2:]
        )
        body.append(f"<w:tbl><w:tr>{cells}</w:tr><w:tr>{cells2}</w:tr></w:tbl>")
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{W_NS}"><w:body>'
        + "".join(body)
        + "</w:body></w:document>"
    )
    return build_zip(
        [
            ("[Content_Types].xml", _CONTENT_TYPES.encode()),
            ("_rels/.rels", _RELS.encode()),
            ("word/document.xml", doc.encode()),
        ]
    )


def extract_docx_text(raw: bytes) -> dict:
    """Extract text from a .docx → ``{ok, text, n_paragraphs, n_runs,
    has_table, valid_package}``.

    Walks every ``w:p`` in document order (table-cell paragraphs
    included — they ARE paragraphs in WordprocessingML); within a
    paragraph, runs concatenate verbatim (``w:tab`` → tab, ``w:br`` →
    newline); paragraphs join with one space. Any structural failure
    returns ``ok=False`` with whatever was recovered.
    """
    out = {
        "ok": False,
        "text": "",
        "n_paragraphs": 0,
        "n_runs": 0,
        "has_table": False,
        "valid_package": False,
    }
    doc_xml = None
    for m in iter_zip_members(raw):
        if m["name"] == "word/document.xml":
            doc_xml = m["payload"]
        elif m["name"] == "_rels/.rels" and b"officeDocument" in m["payload"]:
            out["valid_package"] = True
    if doc_xml is None:
        return out
    try:
        root = ET.fromstring(doc_xml)
    except ET.ParseError:
        return out
    paras = []
    n_runs = 0
    for p in root.iter(f"{{{W_NS}}}p"):
        parts = []
        for r in p.iter(f"{{{W_NS}}}r"):
            n_runs += 1
            for el in r:
                tag = el.tag.rsplit("}", 1)[-1]
                if tag == "t":
                    parts.append(el.text or "")
                elif tag == "tab":
                    parts.append("\t")
                elif tag == "br":
                    parts.append("\n")
        paras.append("".join(parts))
    out["n_paragraphs"] = len(paras)
    out["n_runs"] = n_runs
    out["has_table"] = root.find(f".//{{{W_NS}}}tbl") is not None
    out["text"] = " ".join(paras)
    out["ok"] = True
    return out
