"""Markdown text extraction — README/docs/forum corpora (the GitHub
and StackExchange slices of every pretraining mix) arrive as Markdown;
stripping its formatting is the same pre-text-ops stage as HTML/LaTeX
extraction, with the same public-knowledge rules (CommonMark syntax).

Extraction rules, in order:

1. fenced code blocks (``` / ~~~) keep their CONTENT, lose the fences
   and the info string (code is corpus text; the fence is markup);
2. ATX headers lose the leading ``#``+ and optional closing hashes;
3. blockquote ``>`` markers strip (nested too);
4. list bullets (``-``/``*``/``+``) and ordered markers (``1.``) strip;
5. links/images ``[text](url)`` / ``![alt](url)`` unwrap to text/alt
   (the url drops — consistent with html extract_main_text's
   link-density discipline);
6. emphasis/code spans ``**x**`` / ``*x*`` / ``__x__`` / ``_x_`` /
   `` `x` `` unwrap innermost-first;
7. horizontal rules drop; whitespace collapses to single spaces.

`build_markdown` is the builder-exercises-parser twin: a title header,
15-token paragraphs where fixed token positions get bold/em/code/link
styling, every third paragraph blockquoted, a bullet list and a fenced
block on doc_id-selected documents — the extraction image is the pinned
string 'Document <id> ' + text (+ known list/fence tokens), so the
oracled query proves every rule in one boolean.

Scale: pure per-row regex work over Arrow batches; shuffle-free,
linear.
"""

from __future__ import annotations

import re

PARA_TOKENS = 15

_FENCE = re.compile(r"^(```|~~~)[^\n]*\n(.*?)\n\1[ \t]*$", re.S | re.M)
# closing hashes are markup only when whitespace-separated from the text
# (CommonMark 4.2) — '# C#' keeps its trailing '#'
_HEADER = re.compile(r"^#{1,6}[ \t]+(.*?)(?:[ \t]+#+)?[ \t]*$", re.M)
_BLOCKQUOTE = re.compile(r"^[ \t]*(?:>[ \t]?)+", re.M)
_BULLET = re.compile(r"^[ \t]*(?:[-*+]|\d{1,9}[.)])[ \t]+", re.M)
_IMAGE = re.compile(r"!\[([^\]]*)\]\([^)]*\)")
_LINK = re.compile(r"\[([^\]]*)\]\([^)]*\)")
# CommonMark 6.2: '*' MAY open/close intraword emphasis, '_' may NOT —
# snake_case_words must survive extraction verbatim
_STRONG_STAR = re.compile(r"\*\*(.+?)\*\*", re.S)
_STRONG_UNDER = re.compile(r"(?<!\w)__(.+?)__(?!\w)", re.S)
_EM_STAR = re.compile(r"\*([^*\s][^*]*?)\*")
_EM_UNDER = re.compile(r"(?<!\w)_([^_\s][^_]*?)_(?!\w)")
_CODE_SPAN = re.compile(r"`([^`]*)`")
_HRULE = re.compile(r"^[ \t]*(?:-{3,}|\*{3,}|_{3,})[ \t]*$", re.M)


def build_markdown(text: str, doc_id: int) -> str:
    """Deterministic Markdown wrapping ``text``: title header, 15-token
    paragraphs with positional styling (j%7==2 bold, j%7==4 em, j%7==6
    code span, first token of every paragraph a link), every third
    paragraph blockquoted; doc_id%3==0 adds a 3-item bullet list
    ('item a/b/c'), doc_id%4==0 a fenced block ('fenced sample
    <doc_id>') preceded by a horizontal rule."""
    tokens = text.split(" ")
    out = [f"# Document {doc_id}"]
    for p, i in enumerate(range(0, len(tokens), PARA_TOKENS)):
        chunk = []
        for j, tok in enumerate(tokens[i : i + PARA_TOKENS]):
            if j == 0:
                chunk.append(f"[{tok}](http://corpus.example/{doc_id})")
            elif j % 7 == 2:
                chunk.append(f"**{tok}**")
            elif j % 7 == 4:
                chunk.append(f"*{tok}*")
            elif j % 7 == 6:
                chunk.append(f"`{tok}`")
            else:
                chunk.append(tok)
        para = " ".join(chunk)
        if p % 3 == 2:
            para = "> " + para
        out.append(para)
    if doc_id % 3 == 0:
        out.append("- item a\n- item b\n- item c")
    if doc_id % 4 == 0:
        out.append("---")
        out.append(f"```python\nfenced sample {doc_id}\n```")
    return "\n\n".join(out) + "\n"


def extract_markdown_text(src: str) -> str:
    """CommonMark-rule plain-text extraction (rules in the module doc)."""
    src = _FENCE.sub(lambda m: m.group(2), src)
    src = _HRULE.sub(" ", src)
    src = _HEADER.sub(lambda m: m.group(1), src)
    src = _BLOCKQUOTE.sub("", src)
    src = _BULLET.sub("", src)
    src = _IMAGE.sub(lambda m: m.group(1), src)
    src = _LINK.sub(lambda m: m.group(1), src)
    for pat in (_STRONG_STAR, _STRONG_UNDER, _CODE_SPAN,
                _EM_STAR, _EM_UNDER):
        prev = None
        while prev != src:
            prev = src
            src = pat.sub(lambda m: m.group(1), src)
    return re.sub(r"\s+", " ", src).strip()
