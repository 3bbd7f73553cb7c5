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


def build_eml(text: str, doc_id: int) -> bytes:
    """Deterministic RFC 5322 message wrapping ``text``."""
    msg = EmailMessage()
    msg["From"] = f"sender{doc_id % 7}@corpus.example"
    msg["To"] = f"list{doc_id % 3}@corpus.example"
    msg["Subject"] = f"msg {doc_id}"
    msg["Date"] = email.utils.formatdate(eml_epoch(doc_id), usegmt=True)
    msg["Message-ID"] = f"<{doc_id}@corpus.example>"
    if doc_id % 3 == 0:
        msg.set_content(text)
        msg.add_alternative(f"<p>{text}</p>", subtype="html")
    else:
        msg.set_content(text)
    return msg.as_bytes()


def parse_eml(raw: bytes) -> dict:
    """Parse a message → ``{ok, subject, sender, date_epoch,
    is_multipart, n_parts, body}``; the body is the first text/plain
    part with trailing newline stripped (set_content appends one)."""
    out = {
        "ok": False,
        "subject": None,
        "sender": None,
        "date_epoch": None,
        "is_multipart": False,
        "n_parts": 0,
        "body": "",
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
            if body is None and part.get_content_type() == "text/plain":
                payload = part.get_payload(decode=True)
                body = payload.decode(
                    part.get_content_charset() or "utf-8", "replace"
                )
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
