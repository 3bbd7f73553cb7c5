"""RSS/Atom (operators/feeds.py) and EPUB (operators/epub.py):
dialect handling, date grammars, spine-order resolution, malformed
tolerance."""

from __future__ import annotations

import io
import zipfile

from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_etl_self_service_spark.operators.epub import (
    build_epub,
    extract_epub,
)
from data_engineering_etl_self_service_spark.operators.feeds import (
    build_feed,
    feed_epoch,
    parse_feed,
)


def _text(n):
    return " ".join(f"w{i}" for i in range(n))


# ---------------------------------------------------------------- feeds


def test_both_dialects_roundtrip_with_exact_epochs():
    for did in (10, 11):
        r = parse_feed(build_feed(_text(29), did))
        assert r["ok"]
        assert r["dialect"] == ("rss" if did % 2 == 0 else "atom")
        assert r["title"] == f"Feed {did}"
        assert " ".join(i["text"] for i in r["items"]) == _text(29)
        assert [i["epoch"] for i in r["items"]] == [
            feed_epoch(did, k) for k in range(len(r["items"]))
        ]


def test_feed_escaped_markup_in_description():
    r = parse_feed(build_feed("a <b> & c", 2))
    assert r["items"][0]["text"] == "a <b> & c"


def test_feed_bad_dates_degrade_deterministically():
    # unparseable date -> None; unknown zone -> parsed naive, pinned UTC
    # (executor-timezone independent, the mail.py discipline)
    raw = build_feed(_text(5), 4)
    r = parse_feed(raw.replace("GMT", "NOT-A-ZONE"))
    assert r["ok"] and r["items"][0]["epoch"] == feed_epoch(4, 0)
    import re

    broken = re.sub(r"<pubDate>[^<]*</pubDate>",
                    "<pubDate>banana</pubDate>", raw, count=1)
    r2 = parse_feed(broken)
    assert r2["ok"] and r2["items"][0]["epoch"] is None


def test_feed_malformed_xml():
    assert parse_feed("<rss><channel>")["ok"] is False
    assert parse_feed("<unknown/>")["ok"] is False


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=300))
def test_feed_parse_never_raises(raw):
    assert isinstance(parse_feed(raw), dict)


# ----------------------------------------------------------------- epub


def test_epub_spine_order_beats_zip_order():
    """Chapters are zip-stored reversed; a correct extractor follows
    the spine and reconstructs the book forward."""
    text = _text(99)  # 3 chapters
    raw = build_epub(text, 7)
    names = zipfile.ZipFile(io.BytesIO(raw)).namelist()
    assert names[0] == "mimetype"
    chapter_names = [n for n in names if n.endswith(".xhtml")]
    assert chapter_names == ["OEBPS/ch3.xhtml", "OEBPS/ch2.xhtml", "OEBPS/ch1.xhtml"]
    r = extract_epub(raw)
    toks = text.split(" ")
    exp = " ".join(
        f"Chapter {k + 1} " + " ".join(toks[k * 40 : (k + 1) * 40])
        for k in range(3)
    )
    assert r["text"] == exp and r["n_chapters"] == 3


def test_epub_mimetype_rule_and_title():
    r = extract_epub(build_epub(_text(10), 3))
    assert r["mimetype_ok"] and r["title"] == "Book 3"


def test_epub_missing_parts_degrade():
    assert extract_epub(b"not a zip")["ok"] is False
    # zip without container.xml
    from data_engineering_etl_self_service_spark.operators.archive import (
        build_zip,
    )

    raw = build_zip([("mimetype", b"application/epub+zip")], deflate=False)
    assert extract_epub(raw)["ok"] is False


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=300))
def test_epub_extract_never_raises(raw):
    assert isinstance(extract_epub(raw), dict)
