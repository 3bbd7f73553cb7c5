"""LaTeX extraction (operators/latex.py): each detex rule in isolation,
the fixture precondition, malformed tolerance."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_etl_self_service_spark.catalog import load_table
from data_engineering_etl_self_service_spark.operators.latex import (
    build_latex,
    extract_latex_text,
)


def test_comments_stripped_escaped_percent_survives():
    assert extract_latex_text("a % comment\nb") == "a b"
    assert extract_latex_text(r"50\% off") == "50% off"


def test_display_and_inline_math_dropped():
    assert (
        extract_latex_text(
            "pre\n\\begin{equation}\nE=mc^2\n\\end{equation}\npost"
        )
        == "pre post"
    )
    assert extract_latex_text(r"x $a+b$ y") == "x y"
    assert (
        extract_latex_text("a \\begin{align*}x&=1\\\\y&=2\\end{align*} b")
        == "a b"
    )


def test_keep_arg_commands_unwrap_nested():
    assert extract_latex_text(r"\emph{\textbf{deep}} word") == "deep word"
    assert extract_latex_text(r"\section{Intro} body") == "Intro body"


def test_drop_commands_with_args():
    assert extract_latex_text(r"\documentclass[12pt]{article} x") == "x"
    assert extract_latex_text(r"\maketitle x \usepackage{foo}") == "x"


def test_roundtrip_many_shapes():
    for n, did in [(1, 0), (20, 1), (21, 5), (99, 12)]:
        text = " ".join(f"w{i}" for i in range(n))
        got = extract_latex_text(build_latex(text, did))
        toks = text.split(" ")
        m = -(-n // 20)
        exp = f"Document {did}" + "".join(
            f" Part {k + 1} " + " ".join(toks[k * 20 : (k + 1) * 20])
            for k in range(m)
        )
        assert got == exp


def test_fixture_sections_single_digit_precondition(spark, sf_dir):
    """extracted_chars' 7*m term assumes single-digit section numbers
    (m <= 9, i.e. <= 180 tokens per doc)."""
    from pyspark.sql import functions as F

    mx = (
        load_table(spark, sf_dir, "documents")
        .agg(F.max(F.size(F.split("text", " "))))
        .collect()[0][0]
    )
    assert mx <= 180


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=300))
def test_extract_never_raises(src):
    assert isinstance(extract_latex_text(src), str)
