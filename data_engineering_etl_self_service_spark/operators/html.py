"""HTML/markup text extraction — the curation stage that precedes every
text operator in a real pretraining pipeline.

The reference has no HTML stage at all (its corpus arrives pre-extracted;
ref: dags/ contains only structured-event pipelines), but real web-scale
training data arrives as markup, so extraction is a first-class operator
here.  Everything is public-knowledge heuristics: tag stripping,
script/style/comment removal, entity decoding, and Readability-style
boilerplate pruning by semantic element + link density (Kohlschütter et
al., WSDM'10 "Boilerplate Detection using Shallow Text Features";
Mozilla Readability's link-density heuristic).

Two tiers, matching the two execution regimes:

- :func:`strip_html` — a pure JVM column expression (chained
  ``regexp_replace``): removes comments, ``<script>``/``<style>`` bodies,
  the whole ``<head>``, every remaining tag, decodes the common named
  entities, and collapses whitespace.  Zero Python in the hot path —
  whole-stage-codegen all the way; this is the 100 TB bulk path when
  "all visible text" is wanted.
- :func:`extract_main_text` (+ :func:`html_extract` for the DataFrame
  form) — an Arrow-batched stdlib ``HTMLParser`` pass that additionally
  drops boilerplate *blocks*: semantic chrome elements
  (nav/header/footer/aside) and any block whose anchor-text ratio
  exceeds ``max_link_density`` (menus and link farms in markup that
  lacks semantic tags).  Malformed input (unclosed tags, nested tables,
  bogus entities, stray ``<``) degrades to best-effort text — it NEVER
  raises, the property that matters when one dirty document must not
  kill a 100 TB task.

:func:`build_html` is the deterministic builder used by tests and the
``html_extract_stats`` oracle query (builder-exercises-parser, same
strategy as ``operators/mp3.py``): it wraps a plain text in a full page
(head/title/style/script, nav, header, article paragraphs, link-dense
aside, footer with entities) with doc_id-dependent malformations, such
that ``extract_main_text`` recovers the original text exactly and
``strip_html`` recovers it plus a fixed 17-token / 104-char boilerplate
suffix — both symbolically stateable by a SQL oracle.
"""

from __future__ import annotations

from html.parser import HTMLParser

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Semantic elements whose entire subtree is boilerplate (or non-content).
_DROP_ELEMENTS = {
    "script",
    "style",
    "head",
    "title",
    "nav",
    "header",
    "footer",
    "aside",
}

# Tags that begin a new text block for link-density scoring.
_BLOCK_TAGS = {
    "p",
    "div",
    "article",
    "section",
    "li",
    "ul",
    "ol",
    "td",
    "th",
    "tr",
    "table",
    "h1",
    "h2",
    "h3",
    "h4",
    "h5",
    "h6",
    "blockquote",
    "pre",
    "br",
    "body",
}


# ------------------------------------------------------------- builder


def build_html(text: str, doc_id: int = 0) -> str:
    """Wrap ``text`` in a deterministic full HTML page.

    doc_id-dependent malformations exercise the parser's tolerance:
    - ``doc_id % 3 == 0``: article paragraphs leave ``<p>`` unclosed;
    - ``doc_id % 5 == 0``: the article body is nested inside a 2-deep
      table (``<table><tr><td>``), itself inside another table cell;
    - ``doc_id % 7 == 0``: tags are UPPERCASE.

    Boilerplate token/char accounting (pinned by tests and the SQL
    oracle): nav 4 tokens / 21 chars, header 3 / 18, aside 6 / 37,
    footer 4 / 24 (after entity decode) — 17 tokens and 100 chars +
    4 joining spaces = 104 chars beyond the article text in the
    :func:`strip_html` output.
    """
    words = text.split()
    paras = [" ".join(words[i : i + 12]) for i in range(0, len(words), 12)]
    close_p = "" if doc_id % 3 == 0 else "</p>"
    body = "".join(f"<p class=\"t\">{p}{close_p}\n" for p in paras)
    if doc_id % 5 == 0:
        body = (
            "<table><tr><td><table border=1><tr><td>"
            + body
            + "</td></tr></table></td></tr></table>"
        )
    page = (
        "<!DOCTYPE html>\n"
        "<html>\n"
        f"<head><title>doc {doc_id}</title>"
        "<style>body {color: #000; margin: 0}</style>"
        "<script>var x = 1; if (x < 2) { x = '<p>not text</p>'; }</script>"
        "</head>\n"
        "<body>\n"
        "<!-- navigation chrome, contains <fake> tags & stray < brackets -->\n"
        '<nav><ul><li><a href="/">home</a></li>'
        '<li><a href="/about">about us</a></li>'
        '<li><a href="/contact">contact</a></li></ul></nav>\n'
        "<header><h1>site header banner</h1></header>\n"
        f"<article>\n{body}</article>\n"
        '<aside><a href="/x">sponsored link one</a> '
        '<a href="/y">sponsored link two</a></aside>\n'
        "<footer><p>copyright &amp; terms &lt;2024&gt;</p></footer>\n"
        "</body>\n</html>\n"
    )
    if doc_id % 7 == 0:
        # Uppercase every tag name (attributes/text untouched): parsers
        # must treat HTML tag names case-insensitively.
        import re

        page = re.sub(
            r"<(/?)([a-zA-Z][a-zA-Z0-9]*)",
            lambda m: "<" + m.group(1) + m.group(2).upper(),
            page,
        )
    return page


# --------------------------------------------- tier 1: pure expressions


def strip_html(col) -> Column:
    """All visible text of an HTML column, as a pure JVM expression.

    Chained ``regexp_replace``: comments, script/style elements, the
    whole head, every remaining tag -> space, common named/numeric
    entities decoded (``&amp;`` last, so ``&amp;lt;`` doesn't double-
    decode), whitespace collapsed and trimmed.  Case-insensitive,
    DOTALL.  Whole-stage codegen — no Python, no shuffle.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    c = F.regexp_replace(c, r"(?is)<head\b[^>]*>.*?</head\s*>", " ")
    c = F.regexp_replace(c, r"<[^>]*>", " ")
    for ent, ch in [
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&apos;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ]:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


# ------------------------------------- tier 2: Readability-style blocks


class _BlockExtractor(HTMLParser):
    """Collect text blocks with per-block anchor-char accounting.

    Unclosed tags are tolerated: drop-element and anchor nesting are
    non-negative counters, never a stack that can underflow.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[list[str]] = [[]]
        self.link_chars: list[int] = [0]
        self._drop = 0
        self._anchor = 0

    def _new_block(self) -> None:
        if self.blocks[-1]:
            self.blocks.append([])
            self.link_chars.append(0)

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_ELEMENTS:
            self._drop += 1
        elif tag == "a":
            self._anchor += 1
        elif tag in _BLOCK_TAGS:
            self._new_block()

    def handle_endtag(self, tag):
        if tag in _DROP_ELEMENTS:
            self._drop = max(0, self._drop - 1)
        elif tag == "a":
            self._anchor = max(0, self._anchor - 1)
        elif tag in _BLOCK_TAGS:
            self._new_block()

    def handle_data(self, data):
        if self._drop:
            return
        t = data.strip()
        if not t:
            return
        self.blocks[-1].append(t)
        if self._anchor:
            self.link_chars[-1] += len(t)


def extract_main_text(html: str, max_link_density: float = 0.33) -> str:
    """Main (article) text of one HTML document.

    Drops chrome subtrees (nav/header/footer/aside/script/style/head)
    and any remaining block whose anchor-text share is >=
    ``max_link_density`` — the Readability/boilerpipe link-density
    heuristic for markup without semantic tags.  Best-effort on
    malformed input; returns ``""`` rather than raising on anything.
    """
    try:
        p = _BlockExtractor()
        p.feed(html or "")
        p.close()
        kept: list[str] = []
        for chunks, lc in zip(p.blocks, p.link_chars):
            if not chunks:
                continue
            text = " ".join(" ".join(chunks).split())
            if len(text) > 0 and lc < max_link_density * len(text):
                kept.append(text)
        return " ".join(kept)
    except Exception:
        return ""


def html_extract(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "main_text",
    max_link_density: float = 0.33,
) -> DataFrame:
    """Add a Readability-style main-text column to ``df``.

    Arrow-batched scalar pandas_udf — a projection in the same stage as
    the scan (no exchange); at 100 TB the cost is row-partitioned CPU
    that added executors divide directly.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _extract(s):
        return s.map(lambda h: extract_main_text(h, max_link_density))

    return df.withColumn(out_col, _extract(F.col(html_col)))
