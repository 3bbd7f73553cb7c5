"""RSS 2.0 / Atom feed parsing — news and blog corpora arrive as
syndication feeds, and both dialects are public specs (RSS 2.0, RFC
4287 Atom). One parser covers both: sniff the root element, walk
channel/item vs feed/entry with stdlib ElementTree, parse RFC 822
pubDate (RSS) / ISO 8601 updated (Atom) to exact epoch integers.

`build_feed` is the builder-exercises-parser twin: per doc_id one feed
in the doc_id-selected dialect (even → RSS, odd → Atom) whose items are
10-token chunks of the text with arithmetic timestamps — every parsed
field is a pinned formula of (doc_id, text), see queries.py
feed_extract_stats.

Malformed XML or dates degrade (empty items / None epoch), never raise.

Scale: feeds are independent rows; Arrow-batched per-row parse,
shuffle-free and linear.
"""

from __future__ import annotations

import email.utils
import xml.etree.ElementTree as ET
from datetime import datetime, timezone
from xml.sax.saxutils import escape

ITEM_TOKENS = 10
EPOCH_BASE = 1_100_000_000
ATOM_NS = "http://www.w3.org/2005/Atom"


def feed_epoch(doc_id: int, k: int) -> int:
    return EPOCH_BASE + (doc_id % 1_000_000) * 60 + k * 60


def build_feed(text: str, doc_id: int) -> str:
    """Deterministic feed: RSS 2.0 for even doc_id, Atom for odd."""
    tokens = text.split(" ")
    chunks = [
        " ".join(tokens[i : i + ITEM_TOKENS])
        for i in range(0, len(tokens), ITEM_TOKENS)
    ]
    if doc_id % 2 == 0:
        items = "".join(
            f"<item><title>item {k}</title>"
            f"<link>http://corpus.example/{doc_id}/{k}</link>"
            f"<pubDate>{email.utils.formatdate(feed_epoch(doc_id, k), usegmt=True)}</pubDate>"
            f"<description>{escape(c)}</description></item>"
            for k, c in enumerate(chunks)
        )
        return (
            '<?xml version="1.0" encoding="UTF-8"?>'
            f'<rss version="2.0"><channel><title>Feed {doc_id}</title>'
            f"<link>http://corpus.example/{doc_id}</link>"
            f"<description>fixture</description>{items}</channel></rss>"
        )
    entries = "".join(
        f"<entry><title>item {k}</title>"
        f'<link href="http://corpus.example/{doc_id}/{k}"/>'
        f"<updated>{datetime.fromtimestamp(feed_epoch(doc_id, k), tz=timezone.utc).strftime('%Y-%m-%dT%H:%M:%SZ')}</updated>"
        f"<content>{escape(c)}</content></entry>"
        for k, c in enumerate(chunks)
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<feed xmlns="{ATOM_NS}"><title>Feed {doc_id}</title>'
        f"{entries}</feed>"
    )


def _epoch_rfc822(s: str):
    try:
        dt = email.utils.parsedate_to_datetime(s)
        if dt.tzinfo is None:  # unknown zone names parse naive: pin UTC
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp())
    except (ValueError, TypeError):
        return None


def _epoch_iso(s: str):
    try:
        dt = datetime.fromisoformat(s)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp())
    except (ValueError, TypeError):
        return None


def parse_feed(raw: str) -> dict:
    """Parse either dialect → ``{ok, dialect, title, items}`` with
    items ``[{title, epoch, text}]`` in document order."""
    out = {"ok": False, "dialect": None, "title": None, "items": []}
    try:
        root = ET.fromstring(raw)
    except ET.ParseError:
        return out
    tag = root.tag.rsplit("}", 1)[-1].lower()
    if tag == "rss":
        out["dialect"] = "rss"
        channel = root.find("channel")
        if channel is None:
            return out
        t = channel.find("title")
        out["title"] = t.text if t is not None else None
        for item in channel.findall("item"):
            ti = item.find("title")
            pd = item.find("pubDate")
            de = item.find("description")
            out["items"].append(
                {
                    "title": ti.text if ti is not None else None,
                    "epoch": _epoch_rfc822(pd.text) if pd is not None else None,
                    "text": (de.text or "") if de is not None else "",
                }
            )
        out["ok"] = True
    elif tag == "feed":
        out["dialect"] = "atom"
        ns = f"{{{ATOM_NS}}}" if root.tag.startswith("{") else ""
        t = root.find(f"{ns}title")
        out["title"] = t.text if t is not None else None
        for entry in root.findall(f"{ns}entry"):
            ti = entry.find(f"{ns}title")
            up = entry.find(f"{ns}updated")
            co = entry.find(f"{ns}content")
            out["items"].append(
                {
                    "title": ti.text if ti is not None else None,
                    "epoch": _epoch_iso(up.text) if up is not None else None,
                    "text": (co.text or "") if co is not None else "",
                }
            )
        out["ok"] = True
    return out
