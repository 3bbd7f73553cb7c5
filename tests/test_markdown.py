"""Markdown extraction (operators/markdown.py): each CommonMark rule in
isolation, nesting, fuzz."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_etl_self_service_spark.operators.markdown import (
    build_markdown,
    extract_markdown_text,
)


def test_fence_keeps_content_drops_fence_and_info():
    src = "before\n\n```python\ncode line one\ncode line two\n```\n\nafter"
    assert (
        extract_markdown_text(src) == "before code line one code line two after"
    )
    src2 = "~~~\ntilde fence\n~~~"
    assert extract_markdown_text(src2) == "tilde fence"


def test_headers_and_closing_hashes():
    assert extract_markdown_text("## Title ##\nbody") == "Title body"
    assert extract_markdown_text("###### deep\nx") == "deep x"


def test_blockquote_nested_and_bullets():
    assert extract_markdown_text("> > nested quote") == "nested quote"
    assert extract_markdown_text("- a\n* b\n+ c\n3. d\n12) e") == "a b c d e"


def test_links_images_emphasis_nesting():
    assert extract_markdown_text("[text](http://u)") == "text"
    assert extract_markdown_text("![alt words](img.png)") == "alt words"
    assert extract_markdown_text("**bold *and em* inside**") == "bold and em inside"
    assert extract_markdown_text("`code span`") == "code span"
    assert extract_markdown_text("__strong__ and _em_") == "strong and em"


def test_hrule_dropped_but_bullet_kept():
    assert extract_markdown_text("a\n\n---\n\nb") == "a b"
    # a 2-char dash line is NOT a rule
    assert extract_markdown_text("--") == "--"


def test_roundtrip_fixture_shapes():
    for n, did in [(1, 0), (15, 3), (16, 4), (99, 11), (45, 12)]:
        text = " ".join(f"w{i}" for i in range(n))
        got = extract_markdown_text(build_markdown(text, did))
        exp = f"Document {did} " + text
        if did % 3 == 0:
            exp += " item a item b item c"
        if did % 4 == 0:
            exp += f" fenced sample {did}"
        assert got == exp, (n, did)


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=300))
def test_extract_never_raises(src):
    assert isinstance(extract_markdown_text(src), str)


def test_commonmark_intraword_and_header_edge_rules():
    """Review r6c: '_' never matches intraword (snake_case survives),
    '*' does (CommonMark 6.2); closing header hashes need whitespace."""
    assert extract_markdown_text("snake_case_token here") == "snake_case_token here"
    # word-boundary __x__ IS strong emphasis per spec; intraword is not
    assert extract_markdown_text("__init__ method") == "init method"
    assert extract_markdown_text("dunder__init__name") == "dunder__init__name"
    assert extract_markdown_text("a*b*c") == "abc"  # '*' IS intraword markup
    assert extract_markdown_text("# C#") == "C#"
    assert extract_markdown_text("## Title ##") == "Title"
