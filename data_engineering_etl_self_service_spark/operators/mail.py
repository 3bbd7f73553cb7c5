"""RFC 5322 email / mbox ingestion — mail archives (Enron, mailing
lists, support tickets) are a classic text-corpus arrival format. The
parser side is the stdlib :mod:`email` package (a REAL third-party-
grade parser, so the builder-exercises-parser queries are a genuine
two-implementation interop check, like audioop for ADPCM and DuckDB's
nfc_normalize for NFC); the builder side hand-packs messages so every
claimed field is known symbolically from (doc_id, text).

- :func:`build_eml` — a deterministic single message: From/To/Subject/
  Date/Message-ID headers; every third message is MIME multipart/
  alternative (text/plain + a text/html twin), the rest plain
  text/plain. The Date header encodes ``1000000000 + doc_id * 3600``
  epoch seconds, so date parsing round-trips to exact integers.
- :func:`build_mbox` / :func:`iter_mbox` — RFC 4155 ``From `` framing
  with From-stuffing (``>From`` quoting) on write and unstuffing on
  read, the wrinkle naive splitters get wrong.
- :func:`parse_eml` — headers + multipart walk + text/plain body via
  ``email.message_from_bytes``; malformed bytes degrade (``ok=False``),
  never raise.

Scale: messages are independent rows — Arrow-batched per-row Python,
shuffle-free and linear; an mbox shard splits at its (escaped) ``From ``
separators, so shards parallelize like WAV-IMA blocks.
"""

from __future__ import annotations

import email
import email.utils
from email.message import EmailMessage

EPOCH_BASE = 1_000_000_000
EPOCH_STEP = 3_600
EPOCH_MOD = 1_000_000  # keeps the Date within datetime range for any id


def eml_epoch(doc_id: int) -> int:
    """The deterministic Date epoch: ``doc_id`` folded mod
    ``EPOCH_MOD`` so arbitrarily large ids (e.g. replicated scale
    probes) stay inside the representable datetime range."""
    return EPOCH_BASE + (doc_id % EPOCH_MOD) * EPOCH_STEP


def attachment_blob(doc_id: int) -> bytes:
    """The deterministic attachment payload for messages where
    ``doc_id % 4 == 0``: ``doc_id % 50 + 1`` bytes, value pattern
    pinned so the parse side can verify an exact binary round-trip."""
    n = doc_id % 50 + 1
    return bytes((doc_id + k) % 256 for k in range(n))


def build_eml(text: str, doc_id: int) -> bytes:
    """Deterministic RFC 5322 message wrapping ``text``.

    Arrival-path coverage is all keyed off ``doc_id`` so the oracle can
    state every parsed field symbolically:

    - ``doc_id % 5``: the text/plain part's Content-Transfer-Encoding —
      1 → base64, 2 → quoted-printable, else 7bit (the three wire
      encodings real mail archives mix);
    - ``doc_id % 3 == 0``: multipart/alternative with a text/html twin;
    - ``doc_id % 4 == 0``: an application/octet-stream ATTACHMENT
      (promotes the message to multipart/mixed), payload =
      :func:`attachment_blob`.

    Assembles the MIME bytes directly (base64.encodebytes / quopri for
    the wire encodings): the stdlib EmailMessage builder spent ~87% of
    the oracled query's wall in policy machinery, and the PARSE side is
    the implementation under test — the builder only has to be a
    correct producer. :func:`build_eml_stdlib` keeps the EmailMessage
    construction and a test pins both builders parse-identical across
    the whole arrival-path matrix.
    """
    import base64
    import quopri

    cte = {1: "base64", 2: "quoted-printable"}.get(doc_id % 5, "7bit")
    raw = (text + "\n").encode("utf-8")
    if cte == "base64":
        body = base64.encodebytes(raw)
    elif cte == "quoted-printable":
        body = quopri.encodestring(raw)
    else:
        body = raw
    plain = (
        b'Content-Type: text/plain; charset="utf-8"\n'
        + f"Content-Transfer-Encoding: {cte}\n\n".encode()
        + body
    )
    if doc_id % 3 == 0:
        html = (
            b'Content-Type: text/html; charset="utf-8"\n'
            b"Content-Transfer-Encoding: 7bit\n\n"
            + f"<p>{text}</p>\n".encode("utf-8")
        )
        ba = f"==alt{doc_id}=="
        content = (
            f'Content-Type: multipart/alternative; boundary="{ba}"'
            f"\n\n--{ba}\n".encode()
            + plain
            + f"\n--{ba}\n".encode()
            + html
            + f"\n--{ba}--\n".encode()
        )
    else:
        content = plain
    if doc_id % 4 == 0:
        att = (
            b"Content-Type: application/octet-stream\n"
            b"Content-Transfer-Encoding: base64\n"
            b"Content-Disposition: attachment; "
            + f'filename="blob{doc_id}.bin"\n\n'.encode()
            + base64.encodebytes(attachment_blob(doc_id))
        )
        bm = f"==mix{doc_id}=="
        content = (
            f'Content-Type: multipart/mixed; boundary="{bm}"'
            f"\n\n--{bm}\n".encode()
            + content
            + f"\n--{bm}\n".encode()
            + att
            + f"\n--{bm}--\n".encode()
        )
    return (
        f"From: sender{doc_id % 7}@corpus.example\n"
        f"To: list{doc_id % 3}@corpus.example\n"
        f"Subject: msg {doc_id}\n"
        f"Date: {email.utils.formatdate(eml_epoch(doc_id), usegmt=True)}\n"
        f"Message-ID: <{doc_id}@corpus.example>\n"
        "MIME-Version: 1.0\n"
    ).encode() + content


def build_eml_stdlib(text: str, doc_id: int) -> bytes:
    """The EmailMessage-based twin of :func:`build_eml` — same message
    semantics through a second, independent MIME producer. Kept for the
    two-builder parity test (both must parse identically); the direct
    assembler above is the hot path."""
    msg = EmailMessage()
    msg["From"] = f"sender{doc_id % 7}@corpus.example"
    msg["To"] = f"list{doc_id % 3}@corpus.example"
    msg["Subject"] = f"msg {doc_id}"
    msg["Date"] = email.utils.formatdate(eml_epoch(doc_id), usegmt=True)
    msg["Message-ID"] = f"<{doc_id}@corpus.example>"
    # CTE is pinned EXPLICITLY for every path: set_content's default
    # auto-upgrades long lines (the fixture's single-line docs) to
    # quoted-printable, which would make the wire encoding depend on
    # text length instead of doc_id. 7bit is legal here — corpus lines
    # stay far below RFC 5322's 998-char limit.
    cte = {1: "base64", 2: "quoted-printable"}.get(doc_id % 5, "7bit")
    msg.set_content(text, cte=cte)
    if doc_id % 3 == 0:
        msg.add_alternative(f"<p>{text}</p>", subtype="html")
    if doc_id % 4 == 0:
        msg.add_attachment(
            attachment_blob(doc_id),
            maintype="application",
            subtype="octet-stream",
            filename=f"blob{doc_id}.bin",
        )
    return msg.as_bytes()


def parse_eml(raw: bytes) -> dict:
    """Parse a message → ``{ok, subject, sender, date_epoch,
    is_multipart, n_parts, body, cte, n_attachments, attachment_bytes,
    attachments}``; the body is the first text/plain part with trailing
    newline stripped (set_content appends one); ``cte`` is that part's
    Content-Transfer-Encoding (lower-cased, '7bit' default);
    attachments are the content-disposition=attachment leaves, DECODED
    (base64 undone), with their total byte count."""
    out = {
        "ok": False,
        "subject": None,
        "sender": None,
        "date_epoch": None,
        "is_multipart": False,
        "n_parts": 0,
        "body": "",
        "cte": None,
        "n_attachments": 0,
        "attachment_bytes": 0,
        "attachments": [],
    }
    try:
        msg = email.message_from_bytes(raw)
        out["subject"] = msg["Subject"]
        out["sender"] = msg["From"]
        # Date gets its OWN guard: a malformed Date header must not
        # discard the recoverable body/headers (review r6c). A tz-naive
        # Date is interpreted as UTC so date_epoch is identical on
        # every executor regardless of local timezone.
        try:
            if msg["Date"]:
                from datetime import timezone

                dt = email.utils.parsedate_to_datetime(msg["Date"])
                if dt.tzinfo is None:
                    dt = dt.replace(tzinfo=timezone.utc)
                out["date_epoch"] = int(dt.timestamp())
        except (ValueError, TypeError, OverflowError):
            pass
        out["is_multipart"] = msg.is_multipart()
        body = None
        n_parts = 0
        for part in msg.walk():
            if part.is_multipart():
                continue
            n_parts += 1
            if part.get_content_disposition() == "attachment":
                blob = part.get_payload(decode=True) or b""
                out["attachments"].append(blob)
                out["n_attachments"] += 1
                out["attachment_bytes"] += len(blob)
                continue
            if body is None and part.get_content_type() == "text/plain":
                payload = part.get_payload(decode=True)
                body = payload.decode(
                    part.get_content_charset() or "utf-8", "replace"
                )
                out["cte"] = str(
                    part.get("Content-Transfer-Encoding") or "7bit"
                ).lower()
        out["n_parts"] = n_parts
        out["body"] = (body or "").rstrip("\n")
        out["ok"] = True
    except Exception:
        pass
    return out


def build_mbox(messages: "list[bytes]") -> bytes:
    """RFC 4155 mbox: ``From `` separator line per message, body lines
    starting with ``From `` (or already-stuffed ``>+From ``) quoted."""
    out = bytearray()
    for raw in messages:
        out += b"From MAILER-DAEMON Thu Jan  1 00:00:00 1970\n"
        for line in raw.split(b"\n"):
            if line.lstrip(b">").startswith(b"From "):
                out += b">" + line + b"\n"
            else:
                out += line + b"\n"
        out += b"\n"
    return bytes(out)


def iter_mbox(raw: bytes):
    """Yield per-message bytes from an mbox, un-stuffing quoted
    ``>From `` lines. Tolerant: content before the first separator is
    ignored."""
    current: list[bytes] | None = None
    for line in raw.split(b"\n"):
        if line.startswith(b"From "):
            if current is not None:
                yield b"\n".join(current).rstrip(b"\n") + b"\n"
            current = []
        elif current is not None:
            if line.lstrip(b">").startswith(b"From ") and line.startswith(b">"):
                current.append(line[1:])
            else:
                current.append(line)
    if current is not None:
        yield b"\n".join(current).rstrip(b"\n") + b"\n"
