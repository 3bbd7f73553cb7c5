"""DOCX (operators/docx.py) and email/mbox (operators/mail.py)
ingestion: round-trips, structure arithmetic, stdlib interop, malformed
tolerance."""

from __future__ import annotations

import io
import zipfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_etl_self_service_spark.operators.docx import (
    build_docx,
    extract_docx_text,
)
from data_engineering_etl_self_service_spark.operators.mail import (
    EPOCH_BASE,
    EPOCH_STEP,
    build_eml,
    build_mbox,
    iter_mbox,
    parse_eml,
)

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]


def _text(n, seed=0):
    return " ".join(WORDS[(seed + i) % len(WORDS)] for i in range(n))


# ---------------------------------------------------------------- docx


@pytest.mark.parametrize("n_tokens", [1, 3, 12, 13, 29, 99])
@pytest.mark.parametrize("doc_id", [3, 4])
def test_docx_roundtrip_and_counts(n_tokens, doc_id):
    text = _text(n_tokens, doc_id)
    r = extract_docx_text(build_docx(text, doc_id))
    table = doc_id % 4 == 0
    exp = f"Document {doc_id} " + text + (
        " r1c1 r1c2 r2c1 r2c2" if table else ""
    )
    assert r["ok"] and r["valid_package"]
    assert r["text"] == exp
    paras_body = -(-n_tokens // 12)
    rem = n_tokens - 12 * (paras_body - 1)
    assert r["n_paragraphs"] == 1 + paras_body + (4 if table else 0)
    assert r["n_runs"] == 1 + 4 * (paras_body - 1) + -(-rem // 3) + (
        4 if table else 0
    )
    assert r["has_table"] == table


def test_docx_escapes_markup_chars():
    r = extract_docx_text(build_docx("a <b> & c", 1))
    assert "a <b> & c" in r["text"]


def test_docx_stdlib_zipfile_interop():
    raw = build_docx(_text(20), 7)
    zf = zipfile.ZipFile(io.BytesIO(raw))
    assert zf.testzip() is None
    assert set(zf.namelist()) == {
        "[Content_Types].xml",
        "_rels/.rels",
        "word/document.xml",
    }


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=400))
def test_docx_malformed_never_raises(raw):
    out = extract_docx_text(raw)
    assert out["ok"] is False or isinstance(out["text"], str)


def test_docx_broken_xml_degrades():
    import re

    raw = build_docx(_text(5), 2)
    # corrupt the document.xml payload: rebuild zip with truncated xml
    from data_engineering_etl_self_service_spark.operators.archive import (
        build_zip,
        iter_zip_members,
    )

    members = [
        (
            m["name"],
            m["payload"][:-10] if m["name"].endswith("document.xml") else m["payload"],
        )
        for m in iter_zip_members(raw)
    ]
    out = extract_docx_text(build_zip(members))
    assert out["ok"] is False
    assert out["valid_package"] is True
    assert re.fullmatch("", out["text"])


# ---------------------------------------------------------------- mail


@pytest.mark.parametrize("doc_id", [5, 6, 0, 7, 12, 16, 22])
def test_eml_roundtrip(doc_id):
    """Covers every builder arrival path: plain 7bit (5), alternative +
    base64 (6), alternative + attachment (0, 12), QP + attachment +
    alternative? (7 = QP only, 16 = base64 + attachment, 22 = QP)."""
    from data_engineering_etl_self_service_spark.operators.mail import (
        attachment_blob,
    )

    text = _text(10, doc_id)
    r = parse_eml(build_eml(text, doc_id))
    assert r["ok"]
    assert r["subject"] == f"msg {doc_id}"
    assert r["date_epoch"] == EPOCH_BASE + doc_id * EPOCH_STEP  # ids < EPOCH_MOD
    assert r["is_multipart"] == (doc_id % 3 == 0 or doc_id % 4 == 0)
    assert r["n_parts"] == 1 + (doc_id % 3 == 0) + (doc_id % 4 == 0)
    assert r["cte"] == {1: "base64", 2: "quoted-printable"}.get(
        doc_id % 5, "7bit"
    )
    assert r["body"] == text  # base64/QP wire encodings decode exactly
    if doc_id % 4 == 0:
        assert r["attachments"] == [attachment_blob(doc_id)]
        assert r["attachment_bytes"] == doc_id % 50 + 1
    else:
        assert r["n_attachments"] == 0


def test_eml_two_builders_parse_identical():
    """build_eml (direct MIME assembly, the hot path) and
    build_eml_stdlib (EmailMessage) must parse to IDENTICAL dicts for
    every arrival path — two independent producers, one parser. 60 ids
    covers the full (mod 3 × mod 4 × mod 5) path matrix."""
    from data_engineering_etl_self_service_spark.operators.mail import (
        build_eml_stdlib,
    )

    for doc_id in range(60):
        text = _text(8, doc_id)
        a = parse_eml(build_eml(text, doc_id))
        b = parse_eml(build_eml_stdlib(text, doc_id))
        assert a == b, (doc_id, {k: (a[k], b[k]) for k in a if a[k] != b[k]})
        assert a["body"] == text


def test_mbox_from_stuffing_roundtrip():
    tricky = "From the very start\n>From quoted depth one\nplain line"
    # doc_id 5 → 7bit: the tricky lines must hit the wire RAW (a base64
    # id would hide them from the stuffing logic entirely)
    m1 = build_eml(tricky, 5)
    m2 = build_eml(_text(4), 2)
    msgs = list(iter_mbox(build_mbox([m1, m2])))
    assert len(msgs) == 2
    assert parse_eml(msgs[0])["body"] == tricky
    assert parse_eml(msgs[1])["body"] == _text(4)


def test_mbox_stdlib_mailbox_interop(tmp_path):
    import mailbox

    box = build_mbox([build_eml(_text(6, s), s) for s in range(3)])
    p = tmp_path / "t.mbox"
    p.write_bytes(box)
    mb = mailbox.mbox(str(p))
    assert len(mb) == 3
    assert [m["Subject"] for m in mb] == ["msg 0", "msg 1", "msg 2"]


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=400))
def test_mail_malformed_never_raises(raw):
    parse_eml(raw)
    list(iter_mbox(raw))


def test_eml_huge_doc_id_date_in_range():
    """Scale-probe ids (1e9+) must not overflow the Date header."""
    from data_engineering_etl_self_service_spark.operators.mail import eml_epoch

    r = parse_eml(build_eml("x", 1_000_000_123))
    assert r["ok"] and r["date_epoch"] == eml_epoch(1_000_000_123)


def test_eml_malformed_date_keeps_body():
    raw = build_eml("recoverable body here", 5)
    bad = raw.replace(b"Date:", b"X-Old-Date:") + b""
    bad = b"Date: banana\n" + bad
    r = parse_eml(bad)
    assert r["ok"] and r["body"] == "recoverable body here"
    assert r["date_epoch"] is None


def test_eml_naive_date_is_utc(monkeypatch):
    import os
    import time

    raw = build_eml("x", 3)
    # strip the timezone from the Date header -> naive datetime
    import re

    naive = re.sub(rb"(Date: [^\r\n]*) GMT", rb"\1", raw)
    r = parse_eml(naive)
    assert r["date_epoch"] == EPOCH_BASE + 3 * EPOCH_STEP  # UTC, not local
